"""Audio decode for the GEM dataset's ``with_audio`` path.

Capability parity with the reference's PyAV audio branch (reference
``routeformer/io/dataset.py:2128-2278``: decode the MP4's audio stream over
a pts window, concatenate the frames, average channels to mono). PyAV is
absent here; decode goes through a small native shim over the system ffmpeg
libraries (``native/audio.cpp``, the same decoder stack cv2 links), with
the reference's window semantics reproduced in C:

- window bounds in stream time_base: ``[floor(start/tb), ceil(end/tb)]``
- a frame belongs to the window iff ``start_pts <= pts <= end_pts``
- the last frame preceding ``start_pts`` is prepended when no frame lands
  exactly on it (reference :2362-2369)
- sample values keep their native scale, then channels are averaged and
  the result transposed to ``(T, 1)`` float32 (reference :2182-2190).

Per the repo's native-code convention, a pure-Python twin handles PCM
(sowt/twos) tracks through the :mod:`routeformer_tpu.io.mp4` demuxer at
the same chunk granularity ffmpeg's mov demuxer packetizes PCM — the
byte-parity test runs both paths on fixture recordings. Compressed codecs
(AAC — what real GoPro/Pupil recordings carry) require the native shim.
"""

import ctypes
import struct
from pathlib import Path
from typing import Dict, Optional

import numpy as np

from routeformer_tpu.utils.logging import get_logger

logger = get_logger("io.audio")

_EMPTY = {"audio": np.empty((0, 0), dtype=np.float32), "sample_rate": 0}

_NATIVE_PATH = (
    Path(__file__).resolve().parents[2] / "native" / "lib" / "librfaudio.so"
)
_lib = None
_lib_checked = False


def _native_lib():
    global _lib, _lib_checked
    if _lib_checked:
        return _lib
    _lib_checked = True
    try:
        lib = ctypes.CDLL(str(_NATIVE_PATH))
        lib.rf_audio_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_double, ctypes.c_double,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_longlong),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.rf_audio_decode.restype = ctypes.c_int
        lib.rf_audio_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
        if hasattr(lib, "rf_audio_encode_aac"):
            lib.rf_audio_encode_aac.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
                ctypes.c_longlong, ctypes.c_int,
            ]
            lib.rf_audio_encode_aac.restype = ctypes.c_int
        _lib = lib
    except OSError as e:  # pragma: no cover - build missing
        logger.warning(
            "native audio decoder unavailable (%s); only PCM tracks will "
            "decode (run `python native/build.py`)", e,
        )
        _lib = None
    return _lib


def _mono(frames: np.ndarray) -> np.ndarray:
    """(T, C) -> (T, 1) float32 channel mean (reference :2184-2186:
    concatenate along samples, mean over channels, transpose)."""
    return frames.astype(np.float32).mean(axis=1, keepdims=True)


def read_audio(
    path,
    start_sec: float = 0.0,
    end_sec: float = float("inf"),
    force_pure: bool = False,
) -> Dict[str, object]:
    """Mono audio of ``[start, end]`` as ``{"audio": (T, 1) float32,
    "sample_rate": int}`` — empty ``(0, 0)`` on any decode failure,
    matching the reference's fault tolerance (dataset.py:2186-2190)."""
    path = str(path)
    lib = None if force_pure else _native_lib()
    if lib is not None:
        out = ctypes.POINTER(ctypes.c_float)()
        n = ctypes.c_longlong()
        ch = ctypes.c_int()
        rate = ctypes.c_int()
        rc = lib.rf_audio_decode(
            path.encode(), float(start_sec), float(end_sec),
            ctypes.byref(out), ctypes.byref(n), ctypes.byref(ch),
            ctypes.byref(rate),
        )
        if rc != 0:
            logger.warning(
                "no audio decoded from %s in [%s, %s) (rc=%d)",
                path, start_sec, end_sec, rc,
            )
            return dict(_EMPTY)
        try:
            frames = np.ctypeslib.as_array(
                out, shape=(int(n.value), int(ch.value))
            ).copy()
        finally:
            lib.rf_audio_free(out)
        return {"audio": _mono(frames), "sample_rate": int(rate.value)}
    return _read_audio_pure(path, start_sec, end_sec)


def encode_aac(path, samples: np.ndarray, rate: int) -> bool:
    """Encode mono float32 ``samples`` as an AAC track in an MP4 (fixture /
    recorder role, like ``save_pldata_file``). Real GoPro/Pupil recordings
    carry AAC and no other encoder exists in this image, so tests use this
    to build byte-real compressed-audio fixtures. False when the native
    library (``python native/build.py``) is unavailable."""
    lib = _native_lib()
    if lib is None or not hasattr(lib, "rf_audio_encode_aac"):
        return False
    samples = np.ascontiguousarray(samples, dtype=np.float32).reshape(-1)
    rc = lib.rf_audio_encode_aac(
        str(path).encode(),
        samples.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(samples),
        int(rate),
    )
    if rc != 0:
        logger.warning("AAC encode of %s failed (rc=%d)", path, rc)
    return rc == 0


# --------------------------------------------------------------------- #
# pure-Python twin (PCM tracks only)
# --------------------------------------------------------------------- #

_PCM_CODECS = {"sowt": "<i2", "twos": ">i2"}


def _audio_track(mp4):
    for t in mp4.tracks:
        if t.handler == "soun":
            return t
    return None


def _stsd_audio_fields(entry: bytes):
    """(channels, sample_size_bits, sample_rate) from a raw audio sample
    entry (size/codec/reserved/dref, then the v0 audio fields).

    Raises ValueError on a truncated entry (robustness contract: malformed
    metadata never surfaces as struct.error, tests/test_parser_robustness)."""
    if len(entry) < 36:
        raise ValueError(f"truncated audio sample entry ({len(entry)} bytes)")
    channels, bits = struct.unpack(">HH", entry[24:28])
    rate = struct.unpack(">I", entry[32:36])[0] / 65536.0
    return channels, bits, rate


def _read_audio_pure(path, start_sec: float, end_sec: float):
    from routeformer_tpu.io.mp4 import MP4

    try:
        mp4 = MP4(path)
    except (OSError, ValueError) as e:
        logger.warning("could not open %s for audio: %s", path, e)
        return dict(_EMPTY)
    track = _audio_track(mp4)
    if track is None:
        logger.warning("no audio track in %s", path)
        return dict(_EMPTY)
    if track.codec not in _PCM_CODECS:
        raise RuntimeError(
            f"{path}: audio codec {track.codec!r} needs the native decoder "
            "(run `python native/build.py`); the pure-Python twin handles "
            "PCM (sowt/twos) only"
        )
    dtype = _PCM_CODECS[track.codec]
    try:
        channels, bits, _ = _stsd_audio_fields(track.stsd_entry)
    except ValueError as e:
        logger.warning("malformed audio sample entry in %s: %s", path, e)
        return dict(_EMPTY)
    if bits != 16 or channels < 1:
        raise RuntimeError(
            f"{path}: unsupported PCM layout ({bits}-bit, {channels}ch)"
        )
    rate = track.timescale  # PCM-in-MP4: media timescale == sample rate

    # Chunk-granularity window, mirroring ffmpeg's mov demuxer (one packet
    # per PCM chunk): chunk pts = its first sample index. (Do NOT resolve
    # per-sample offsets here — a real-length PCM track has tens of
    # millions of samples and the chunk loop below needs only stsc/stco.)
    if track.n_samples == 0 or not track.chunk_offsets:
        logger.warning("no audio samples in %s", path)
        return dict(_EMPTY)
    chunks = []  # (first_sample_idx, file_offset, n_frames)
    stsc = track.sample_to_chunk
    n_chunks = len(track.chunk_offsets)
    sample_idx = 0
    for entry_idx, (first_chunk, per_chunk) in enumerate(stsc):
        last_chunk = (
            stsc[entry_idx + 1][0] - 1
            if entry_idx + 1 < len(stsc) else n_chunks
        )
        for chunk in range(first_chunk, last_chunk + 1):
            if sample_idx >= track.n_samples:
                break
            n = min(per_chunk, track.n_samples - sample_idx)
            chunks.append(
                (sample_idx, track.chunk_offsets[chunk - 1], n)
            )
            sample_idx += n

    start_pts = int(np.floor(start_sec * rate))
    end_pts = (
        float("inf") if np.isinf(end_sec) else int(np.ceil(end_sec * rate))
    )
    selected = []
    preceding: Optional[tuple] = None
    for c in chunks:
        pts = c[0]
        if pts < start_pts:
            preceding = c
        elif pts <= end_pts:
            selected.append(c)
        else:
            break
    if (
        preceding is not None
        and start_pts > 0
        and not any(c[0] == start_pts for c in selected)
    ):
        selected.insert(0, preceding)
    if not selected:
        logger.warning(
            "no audio decoded from %s in [%s, %s)", path, start_sec, end_sec
        )
        return dict(_EMPTY)

    frame_bytes = 2 * channels
    parts = []
    with open(path, "rb") as f:
        for _, offset, n in selected:
            f.seek(offset)
            raw = f.read(n * frame_bytes)
            parts.append(
                np.frombuffer(raw, dtype=dtype).reshape(-1, channels)
            )
    return {
        "audio": _mono(np.concatenate(parts, axis=0)),
        "sample_rate": int(rate),
    }
