"""GPS backbone configs.

Capability parity with reference
``routeformer/models/gps_backbone/config.py:8-127``: the base config carries
the task geometry (seq/label/pred lengths) and transformer hyperparameters;
``RouteformerConfig.__post_init__`` pushes derived fields (with_video,
encoder_hidden_size, ...) down into the ``init=False`` receiving fields; the
``enc_in``/``c_out`` properties compute I/O dims from the modality switches
with ``_enc_in``/``_c_out`` escape hatches.
"""

from dataclasses import dataclass, field
from typing import Optional

from routeformer_tpu.utils.config import BaseConfig


@dataclass
class GPSBackboneConfig(BaseConfig):
    """Config for GPS backbones (reference gps_backbone/config.py:8-75)."""

    seq_len: int
    label_len: int
    pred_len: int
    embed: str = "timeF"
    freq: str = "m"
    d_model: int = 128
    n_heads: int = 8
    e_layers: int = 2
    d_layers: int = 1
    d_ff: int = 512
    moving_avg: int = 25
    factor: int = 1
    distil: bool = True
    dropout: float = 0.1
    activation: str = "gelu"
    individual: bool = False
    # These are pushed down by RouteformerConfig.__post_init__ after init
    # (reference models/config.py:96-107). Defaults here allow standalone
    # backbone use (the reference leaves them unset until the parent runs).
    output_attention: bool = field(init=False, default=False)
    with_video: bool = field(init=False, default=False)
    with_gaze: bool = field(init=False, default=False)
    dense_prediction: bool = field(init=False, default=False)
    encoder_hidden_size: int = field(init=False, default=64)
    image_embedding_size: int = field(init=False, default=128)
    output_fps: int = field(init=False, default=5)
    dense_loss_ratio: float = field(init=False, default=0.25)
    discount_factor: dict = field(init=False, default_factory=lambda: {0: 0.9})
    smart_decoder: bool = field(init=False, default=False)
    # Small hack for side experiments (reference config.py:39-40)
    _enc_in: Optional[int] = None
    _c_out: Optional[int] = None

    @property
    def c_out(self) -> int:
        """Output dimension (reference config.py:42-53)."""
        if self._c_out is not None:
            return self._c_out
        out = 2
        if not self.dense_prediction:
            return out
        return self.enc_in - 3  # drop angle, norm (speed), acceleration

    @property
    def enc_in(self) -> int:
        """Input dimension (reference config.py:55-71)."""
        if self._enc_in is not None:
            return self._enc_in
        out = 2 + 3  # coords + angle, norm (speed), acceleration
        if not self.with_video:
            return out
        return out + self.encoder_hidden_size  # + encoded visual

    @property
    def dec_in(self) -> int:
        """Decoder input dimension (reference config.py:73-75)."""
        return self.enc_in


@dataclass
class PatchTSTBackboneConfig(GPSBackboneConfig):
    """Config for the PatchTST backbone (reference config.py:78-101)."""

    fc_dropout: float = 0.1
    head_dropout: float = 0.0
    patch_len_ratio: float = 0.25
    stride_ratio: float = 0.125
    padding_patch: str = "end"
    revin: bool = True
    affine: bool = False
    subtract_last: bool = False
    decomposition: bool = False
    kernel_size: int = 25

    @property
    def patch_len(self) -> int:
        return int(self.patch_len_ratio * self.seq_len)

    @property
    def stride(self) -> int:
        return int(self.stride_ratio * self.seq_len)


@dataclass
class FEDFormerBackboneConfig(GPSBackboneConfig):
    """Config for the FEDformer backbone (reference config.py:104-113)."""

    version: str = "Wavelets"
    mode_select: str = "random"
    modes: int = 32
    L: int = 0
    base: str = "legendre"
    cross_activation: str = "tanh"


@dataclass
class LinearBackboneConfig(GPSBackboneConfig):
    """Config for DLinear/NLinear backbones (reference config.py:116-120)."""

    kernel_size: int = 25
