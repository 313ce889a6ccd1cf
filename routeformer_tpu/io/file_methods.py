"""Pupil Labs recording file reader (pldata / msgpack).

Capability parity with reference ``routeformer/io/file_methods.py`` (itself
a trimmed vendoring of pupil-labs' reader): ``load_object``,
``load_pldata_file`` returning ``PLData(data, timestamps, topics)``, and a
lazily-deserializing ``Serialized_Dict``. Re-implemented from the on-disk
format: a ``<topic>.pldata`` file is a msgpack stream of
``(topic, payload_bytes)`` pairs — each payload itself msgpack-encoded,
possibly containing ext-code-13 nested serialized dicts — alongside a
``<topic>_timestamps.npy``.

Writers are included so tests can build byte-exact fixtures.
"""

import collections
import os
from pathlib import Path
from typing import Iterable

import msgpack
import numpy as np

PLData = collections.namedtuple("PLData", ["data", "timestamps", "topics"])

MSGPACK_EXT_CODE = 13


class Serialized_Dict:
    """Dict-like wrapper that defers msgpack decoding until first access."""

    __slots__ = ("_ser_data", "_data")

    def __init__(self, python_dict=None, msgpack_bytes=None):
        if python_dict is not None:
            self._ser_data = msgpack.packb(
                python_dict, use_bin_type=True, default=self._pack_ext
            )
        elif msgpack_bytes is not None:
            self._ser_data = msgpack_bytes
        else:
            raise ValueError("Either python_dict or msgpack_bytes required")
        self._data = None

    @staticmethod
    def _pack_ext(obj):
        if isinstance(obj, Serialized_Dict):
            return msgpack.ExtType(MSGPACK_EXT_CODE, obj._ser_data)
        raise TypeError(f"cannot serialize {type(obj)}")

    @staticmethod
    def _unpack_ext(code, data):
        if code == MSGPACK_EXT_CODE:
            return Serialized_Dict(msgpack_bytes=data)
        return msgpack.ExtType(code, data)

    def _deser(self):
        if self._data is None:
            self._data = msgpack.unpackb(
                self._ser_data,
                use_list=False,
                raw=False,
                strict_map_key=False,
                ext_hook=self._unpack_ext,
            )
        return self._data

    @property
    def serialized(self) -> bytes:
        return self._ser_data

    def __getitem__(self, key):
        return self._deser()[key]

    def __contains__(self, key):
        return key in self._deser()

    def get(self, key, default=None):
        return self._deser().get(key, default)

    def keys(self):
        return self._deser().keys()

    def values(self):
        return self._deser().values()

    def items(self):
        return self._deser().items()

    def __iter__(self):
        return iter(self._deser())

    def __len__(self):
        return len(self._deser())

    def __repr__(self):
        return f"Serialized_Dict({self._deser()!r})"


def load_object(file_path):
    """msgpack-unpack one object from a file (reference file_methods.py:46-67)."""
    file_path = Path(file_path).expanduser()
    with file_path.open("rb") as fh:
        return msgpack.unpack(fh, strict_map_key=False)


def save_object(obj, file_path):
    """msgpack-pack one object to a file."""
    file_path = Path(file_path).expanduser()
    with file_path.open("wb") as fh:
        msgpack.pack(obj, fh, use_bin_type=True)


def load_pldata_file(directory, topic: str) -> PLData:
    """Load ``<topic>.pldata`` + ``<topic>_timestamps.npy``
    (reference file_methods.py:70-96)."""
    ts_file = os.path.join(directory, topic + "_timestamps.npy")
    msgpack_file = os.path.join(directory, topic + ".pldata")
    data = collections.deque()
    topics = collections.deque()
    data_ts = np.load(ts_file)
    with open(msgpack_file, "rb") as fh:
        unpacker = msgpack.Unpacker(fh, use_list=False, strict_map_key=False)
        try:
            for entry in unpacker:
                entry_topic, payload = entry
                data.append(Serialized_Dict(msgpack_bytes=payload))
                topics.append(entry_topic)
        except (TypeError, ValueError, msgpack.UnpackException) as e:
            # Corrupt/truncated stream (robustness contract: ValueError,
            # tests/test_parser_robustness.py). msgpack's own exceptions
            # mostly subclass ValueError already; Type/unpack errors come
            # from entries that are not (topic, payload) pairs.
            raise ValueError(f"{msgpack_file}: corrupt pldata stream: {e}") from e
    return PLData(data, data_ts, topics)


def save_pldata_file(
    data: Iterable[dict], timestamps: Iterable[float], directory, topic: str
):
    """Write a pldata file pair (fixture builder / recorder role)."""
    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    with open(directory / f"{topic}.pldata", "wb") as fh:
        packer = msgpack.Packer(use_bin_type=True)
        for datum in data:
            payload = msgpack.packb(datum, use_bin_type=True)
            fh.write(packer.pack((topic, payload)))
    np.save(directory / f"{topic}_timestamps.npy", np.asarray(list(timestamps)))
