"""GPMF (GoPro Metadata Format) parser and GPS track extraction.

Capability parity with the reference's GPMF pipeline
(``routeformer/io/dataset.py:2387-2646``), which shells out to ffmpeg for
the data track and parses it with the ``gopro2gpx`` package. Here the KLV
stream parser is implemented from the public GPMF spec
(https://github.com/gopro/gpmf-parser) and the MP4 data track is demuxed in
pure Python (``io/mp4.py``) — no ffmpeg subprocess, no gopro2gpx.

Preserved behaviors:

- SCAL/GPSU/GPSF/GPSP/GPS5 finite-state machine with per-batch GPSU
  timestamps (reference ``_build_gps_points`` :2387-2442);
- skipping all-zero GPS5 points; infinite dilution when GPSF=0
  (``_parse_gps5_stream`` :2444-2468);
- missing-timestamp reconstruction from the ~18 Hz GPS rate with the
  17.5-18.5 Hz plausibility window and the 18.17 Hz fallback
  (``_fix_timestamps``/``_estimate_fps`` :2480-2586);
- dilution-of-precision filtering (``_filter_points_by_dilution`` :2470).
"""

import datetime
import math
import struct
from dataclasses import dataclass
from typing import Iterator, List, Optional, Tuple

import numpy as np

from routeformer_tpu.utils.logging import get_logger

logger = get_logger("io.gpmf")

# GPMF type characters -> struct format (per element).
_TYPE_FMT = {
    ord("b"): "b",
    ord("B"): "B",
    ord("s"): "h",
    ord("S"): "H",
    ord("l"): "l",
    ord("L"): "L",
    ord("f"): "f",
    ord("d"): "d",
    ord("j"): "q",
    ord("J"): "Q",
    ord("q"): "l",  # Q15.16 fixed point
    ord("Q"): "q",  # Q31.32 fixed point
}


@dataclass
class KLVItem:
    """One GPMF key-length-value item."""

    fourcc: str
    type_char: str
    data: object


@dataclass
class GPSPoint:
    latitude: float
    longitude: float
    altitude: float
    time: Optional[datetime.datetime]
    speed: float


def _parse_payload(type_byte: int, struct_size: int, repeat: int, payload: bytes):
    if type_byte == ord("c"):
        return payload[: struct_size * repeat].decode("latin-1").rstrip("\x00")
    if type_byte == ord("U"):
        # UTC date string: "yymmddhhmmss.sss"
        text = payload[: struct_size * repeat].decode("latin-1").rstrip("\x00")
        try:
            return datetime.datetime.strptime(text, "%y%m%d%H%M%S.%f")
        except ValueError:
            return None
    if type_byte == ord("F"):
        return [
            payload[i * 4 : (i + 1) * 4].decode("latin-1") for i in range(repeat)
        ]
    fmt = _TYPE_FMT.get(type_byte)
    if fmt is None:
        return payload[: struct_size * repeat]  # opaque
    elem_size = struct.calcsize(">" + fmt)
    per_row = struct_size // elem_size
    rows = []
    for r in range(repeat):
        chunk = payload[r * struct_size : (r + 1) * struct_size]
        vals = struct.unpack(">" + fmt * per_row, chunk[: elem_size * per_row])
        if type_byte == ord("q"):
            vals = tuple(v / 2**16 for v in vals)
        elif type_byte == ord("Q"):
            vals = tuple(v / 2**32 for v in vals)
        rows.append(vals[0] if per_row == 1 else vals)
    return rows[0] if repeat == 1 and type_byte not in (ord("f"), ord("d")) else rows


def parse_gpmf(data: bytes) -> Iterator[KLVItem]:
    """Iterate GPMF KLV items, descending into nested containers (type 0)."""
    pos = 0
    n = len(data)
    while pos + 8 <= n:
        fourcc = data[pos : pos + 4].decode("latin-1", errors="replace")
        type_byte = data[pos + 4]
        struct_size = data[pos + 5]
        repeat = struct.unpack(">H", data[pos + 6 : pos + 8])[0]
        length = struct_size * repeat
        padded = (length + 3) & ~3
        payload = data[pos + 8 : pos + 8 + length]
        if not fourcc.isprintable() or len(payload) < length:
            # resync: GPMF streams concatenated per-sample can have slack
            pos += 4
            continue
        if type_byte == 0:  # nested container
            yield from parse_gpmf(payload)
        else:
            yield KLVItem(fourcc, chr(type_byte), _parse_payload(
                type_byte, struct_size, repeat, payload
            ))
        pos += 8 + padded


def build_gps_points(
    data: bytes, dilution_threshold: float = 500.0, prefer_native: bool = True
) -> Tuple[List[GPSPoint], List[float]]:
    """GPMF byte stream -> dilution-filtered, timestamped GPS points.

    FSM over SCAL/GPSU/GPSF/GPSP/GPS5 (reference dataset.py:2387-2442).
    Dispatches to the C++ walker (``native/gpmf.cpp``) when built; this
    Python FSM is the reference implementation and fallback.
    """
    if prefer_native:
        try:
            from routeformer_tpu.io.gpmf_native import build_gps_points_native

            result = build_gps_points_native(data, dilution_threshold)
            if result is not None:
                return result
        except Exception as e:  # noqa: BLE001 — any native failure falls back
            logger.warning("native gpmf path failed (%s); using python", e)
    points: List[GPSPoint] = []
    dilutions: List[float] = []

    scal = (1.0, 1.0, 1.0, 1.0, 1.0)
    gpsu: Optional[datetime.datetime] = None
    gpsp: Optional[float] = None
    gpsfix = 0

    for item in parse_gpmf(data):
        if item.fourcc == "SCAL":
            vals = item.data if isinstance(item.data, list) else [item.data]
            flat = []
            for v in vals:
                flat.extend(v if isinstance(v, tuple) else (v,))
            scal = tuple(float(v) for v in flat)
        elif item.fourcc == "GPSU":
            gpsu = item.data if isinstance(item.data, datetime.datetime) else None
        elif item.fourcc == "GPSF":
            val = item.data[0] if isinstance(item.data, list) else item.data
            gpsfix = int(val)
        elif item.fourcc == "GPSP":
            val = item.data[0] if isinstance(item.data, list) else item.data
            gpsp = float(val)
        elif item.fourcc == "GPS5":
            rows = item.data if isinstance(item.data, list) else [item.data]
            for row in rows:
                if not isinstance(row, tuple) or len(row) < 5:
                    continue
                lat_r, lon_r, alt_r, spd2d_r, _spd3d_r = row[:5]
                if lat_r == lon_r == alt_r == 0:
                    logger.warning("Empty GPS data point, skipping")
                    continue
                lat = float(lat_r) / scal[0]
                lon = float(lon_r) / (scal[1] if len(scal) > 1 else scal[0])
                alt = float(alt_r) / (scal[2] if len(scal) > 2 else scal[0])
                spd = float(spd2d_r) / (scal[3] if len(scal) > 3 else scal[0])
                # GPSU stamps only the first point of each GPS5 batch.
                points.append(GPSPoint(lat, lon, alt, gpsu, spd))
                gpsu = None
                if gpsfix == 0:
                    dilutions.append(float("inf"))
                else:
                    dilutions.append(gpsp if gpsp is not None else float("inf"))

    fix_timestamps(points)
    filtered_points, filtered_dilutions = [], []
    for p, d in zip(points, dilutions):
        if d < dilution_threshold:
            filtered_points.append(p)
            filtered_dilutions.append(d)
    logger.info("GPS data points: %d (OK: %d)", len(points), len(filtered_points))
    return filtered_points, filtered_dilutions


def estimate_fps(timestamps: List[Optional[datetime.datetime]]) -> List[float]:
    """Per-point FPS estimate with the reference's plausibility window
    (17.5-18.5 Hz) and 18.17 Hz fallback (dataset.py:2527-2586).

    Mutates ``timestamps``: implausible stamps are dropped (set None).
    """
    fps_list: List[float] = []
    last_ts_idx = None
    for ts_idx, ts in enumerate(timestamps):
        if ts is not None:
            if last_ts_idx is not None:
                count = ts_idx - last_ts_idx
                total = (ts - timestamps[last_ts_idx]).total_seconds()
                est = count / total if total != 0 else math.nan
                if math.isnan(est) or est > 18.5 or est < 17.5:
                    logger.warning(
                        "Implausible fps %.3f between %s and %s; dropping stamp",
                        est, timestamps[last_ts_idx], ts,
                    )
                    timestamps[last_ts_idx] = None
                    fps_list.append(math.nan)
                else:
                    fps_list.append(est)
            else:
                fps_list.append(math.nan)
            last_ts_idx = ts_idx
        else:
            fps_list.append(math.nan)

    last_valid = None
    for fps in reversed(fps_list):
        if not math.isnan(fps):
            last_valid = fps
            break
    if last_valid is None:
        last_valid = 18.17  # GPMF default GPS rate
    for i in range(len(fps_list) - 1, -1, -1):
        if math.isnan(fps_list[i]):
            fps_list[i] = last_valid
        else:
            last_valid = fps_list[i]
    return fps_list


def fix_timestamps(points: List[GPSPoint]) -> List[GPSPoint]:
    """Interpolate missing per-point timestamps from batch GPSU stamps
    (reference dataset.py:2480-2525)."""
    timestamps = [p.time for p in points]
    fps_list = estimate_fps(timestamps)

    last_valid = None
    for i, ts in enumerate(timestamps):
        if ts is not None:
            last_valid = i
        elif last_valid is not None:
            timestamps[i] = timestamps[last_valid] + datetime.timedelta(
                seconds=(i - last_valid) / fps_list[i]
            )

    first_valid = None
    for i, ts in enumerate(timestamps):
        if ts is not None:
            first_valid = i
            break
    if first_valid is None:
        logger.warning("No valid timestamps found")
        return points
    for i in range(first_valid):
        timestamps[i] = timestamps[first_valid] - datetime.timedelta(
            seconds=(first_valid - i) / fps_list[i]
        )

    for i, ts in enumerate(timestamps):
        points[i].time = ts
    return points


def encode_gpmf(items: List[Tuple[str, str, bytes, int, int]]) -> bytes:
    """Encode raw KLV items (fourcc, type_char, payload, struct_size, repeat)
    — used by tests to build byte fixtures."""
    out = bytearray()
    for fourcc, type_char, payload, struct_size, repeat in items:
        out += fourcc.encode("latin-1")
        out += bytes([0 if type_char == "\x00" else ord(type_char)])
        out += bytes([struct_size])
        out += struct.pack(">H", repeat)
        padded = (len(payload) + 3) & ~3
        out += payload + b"\x00" * (padded - len(payload))
    return bytes(out)
