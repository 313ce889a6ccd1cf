"""ctypes bridge to the native (C++) GPMF GPS extractor.

The native walker (``native/gpmf.cpp``) replaces the Python KLV loop of
``io/gpmf.py`` on the hot dataset-index path; Python-side timestamp fixing
and dilution filtering are shared so both paths produce identical points
(parity asserted in tests). Falls back silently when the library has not
been built (``python native/build.py``).
"""

import ctypes
import datetime
import math
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

from routeformer_tpu.io.gpmf import GPSPoint, fix_timestamps
from routeformer_tpu.utils.logging import get_logger

logger = get_logger("io.gpmf_native")

_LIB_PATH = (
    Path(__file__).resolve().parent.parent.parent / "native" / "lib" / "libgpmf.so"
)
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.gpmf_extract_gps.restype = ctypes.c_long
        lib.gpmf_extract_gps.argtypes = [
            ctypes.c_char_p,
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_long,
        ]
        assert lib.gpmf_native_abi_version() == 2
        _lib = lib
        return lib
    except OSError as e:  # pragma: no cover
        logger.warning("could not load native gpmf library: %s", e)
        return None


def native_available() -> bool:
    return _load() is not None


def extract_gps_raw(data: bytes) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Raw extraction: (points (N, 5) [lat, lon, alt, speed, dop], times (N,))
    with NaN times for non-batch-head samples. None when the lib is
    unavailable OR the stream is non-canonical (the walker returns -1 and
    the caller must use the Python FSM for exact semantics)."""
    lib = _load()
    if lib is None:
        return None
    # GPS5 rows are 20 bytes; bound the output by the payload size.
    max_points = max(64, len(data) // 20 + 16)
    out = np.empty((max_points, 5), dtype=np.float64)
    out_time = np.empty(max_points, dtype=np.float64)
    n = lib.gpmf_extract_gps(
        data,
        len(data),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        out_time.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        max_points,
    )
    if n < 0:  # non-canonical stream: Python fallback
        return None
    return out[:n], out_time[:n]


def fix_timestamps_array(times: np.ndarray) -> np.ndarray:
    """Vectorized equivalent of ``gpmf.fix_timestamps``/``estimate_fps`` on
    posix-seconds arrays (NaN = missing): estimates the per-gap rate, drops
    stamps outside the 17.5-18.5 Hz plausibility window, fills missing stamps
    forward (and the head backward) at the estimated rate, 18.17 Hz default.
    """
    times = times.astype(np.float64).copy()
    n = len(times)
    if n == 0:
        return times

    valid_idx = np.flatnonzero(~np.isnan(times))
    # per-gap fps with the plausibility rejection (drops the EARLIER stamp,
    # matching the reference's behavior)
    fps_gap = np.full(max(len(valid_idx) - 1, 0), np.nan)
    if len(valid_idx) >= 2:
        counts = np.diff(valid_idx).astype(np.float64)
        dts = np.diff(times[valid_idx])
        with np.errstate(divide="ignore", invalid="ignore"):
            est = np.where(dts != 0, counts / dts, np.nan)
        bad = np.isnan(est) | (est > 18.5) | (est < 17.5)
        times[valid_idx[:-1][bad]] = np.nan
        fps_gap = np.where(bad, np.nan, est)

    # per-point fps: gap estimates spread over their ranges, 18.17 fallback
    fps = np.full(n, np.nan)
    if len(valid_idx) >= 2:
        reps = np.diff(valid_idx)
        fps[valid_idx[0] : valid_idx[-1]] = np.repeat(fps_gap, reps)
    # backward fill of NaN fps (reference fills from the next valid estimate)
    rev_valid = ~np.isnan(fps[::-1])
    rev_idx = np.where(rev_valid, np.arange(n), -1)
    rev_prev = np.maximum.accumulate(rev_idx)
    fps_rev = fps[::-1]
    filled_rev = np.where(rev_prev >= 0, fps_rev[np.maximum(rev_prev, 0)], 18.17)
    fps = filled_rev[::-1].copy()

    valid_idx = np.flatnonzero(~np.isnan(times))
    if valid_idx.size == 0:
        return times
    # forward fill from the previous valid stamp at the local rate
    arange = np.arange(n)
    prev = np.maximum.accumulate(np.where(~np.isnan(times), arange, -1))
    missing = np.isnan(times) & (prev >= 0)
    times[missing] = (
        times[np.maximum(prev, 0)][missing]
        + (arange - prev)[missing] / fps[missing]
    )
    # head backfill from the first valid stamp
    first = valid_idx[0]
    if first > 0:
        head = np.arange(first)
        times[head] = times[first] - (first - head) / fps[head]
    return times


def build_gps_arrays(
    data: bytes, dilution_threshold: float = 500.0
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Array-level fast path: returns (values (N, 4) [lat, lon, alt, speed],
    posix_times (N,), dilutions (N,)) filtered by dilution — no per-point
    Python objects. None when the native lib is unavailable."""
    raw = extract_gps_raw(data)
    if raw is None:
        return None
    values, times = raw
    times = fix_timestamps_array(times)
    keep = values[:, 4] < dilution_threshold
    return values[keep, :4], times[keep], values[keep, 4]


def build_gps_points_native(
    data: bytes, dilution_threshold: float = 500.0
) -> Optional[Tuple[List[GPSPoint], List[float]]]:
    """Native-path equivalent of ``gpmf.build_gps_points``; None if the
    library is unavailable."""
    raw = extract_gps_raw(data)
    if raw is None:
        return None
    values, times = raw

    points: List[GPSPoint] = []
    dilutions: List[float] = []
    for (lat, lon, alt, spd, dop), t in zip(values, times):
        stamp = (
            None
            if math.isnan(t)
            else datetime.datetime.fromtimestamp(
                t, datetime.timezone.utc
            ).replace(tzinfo=None)
        )
        points.append(GPSPoint(lat, lon, alt, stamp, spd))
        dilutions.append(float(dop))

    fix_timestamps(points)
    filtered_points, filtered_dilutions = [], []
    for p, d in zip(points, dilutions):
        if d < dilution_threshold:
            filtered_points.append(p)
            filtered_dilutions.append(d)
    return filtered_points, filtered_dilutions
