"""Base class for configuration objects.

Capability parity with the reference config base
(reference ``routeformer/utils/config.py:7-33``): dict-style access,
``get`` with default, deep ``copy`` and ``override(**kwargs)`` that re-runs
``__post_init__`` so derived fields stay consistent.

The TPU build keeps configs as plain-Python dataclass-friendly objects that
are *never* traced — everything that reaches a jitted function is either a
static Python value hashed into the compilation cache or an explicit array
input. This is what keeps the train step one compiled XLA program.
"""

import copy
import dataclasses
from argparse import Namespace


class BaseConfig(Namespace):
    """Base class for configuration objects.

    Subclasses are typically ``@dataclass``-decorated and may define
    ``__post_init__`` to derive/validate fields; ``override`` re-runs it.
    """

    def __getitem__(self, item):
        """Get an attribute with dict-style access."""
        return getattr(self, item)

    def get(self, item, default=None):
        """Get an attribute with a default value."""
        return getattr(self, item, default)

    def __copy__(self):
        """Deep-copy (the reference intentionally deep-copies on copy())."""
        return copy.deepcopy(self)

    def copy(self):
        """Return a deep copy of this config."""
        return copy.deepcopy(self)

    def override(self, **kwargs):
        """Return a copy with the given fields overridden.

        ``__post_init__`` is re-run on the copy (if defined) so that derived
        fields and validation stay consistent with the new values.
        """
        copy_self = self.copy()
        for k, v in kwargs.items():
            setattr(copy_self, k, v)
        if hasattr(copy_self, "__post_init__"):
            copy_self.__post_init__()
        return copy_self

    def to_dict(self) -> dict:
        """Flatten to a plain dict (nested configs flattened recursively).

        Used for logging/checkpoint metadata (the reference relies on
        Lightning's ``save_hyperparameters`` for this role).
        """
        if dataclasses.is_dataclass(self):
            out = {}
            for f in dataclasses.fields(self):
                v = getattr(self, f.name, None)
                if isinstance(v, BaseConfig):
                    out[f.name] = v.to_dict()
                else:
                    out[f.name] = v
            return out
        return dict(self.__dict__)
