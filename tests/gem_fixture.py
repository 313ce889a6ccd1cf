"""Synthetic GEM recording builder for dataset tests.

Creates a byte-real GEM directory: GoPro MP4s (cv2-encoded video + an
injected GPMF ``gpmd`` telemetry track), a Pupil-Labs eye-tracker recording
(world.mp4, intrinsics msgpack, gaze.pldata) and corrected-GPS CSVs — all
clock-aligned, so GEMDataset exercises its full alignment/indexing path.
"""

import datetime
import json
import struct
from pathlib import Path

import numpy as np

from routeformer_tpu.io.file_methods import save_object, save_pldata_file
from routeformer_tpu.io.gpmf import encode_gpmf
from routeformer_tpu.io.mp4 import MP4
from routeformer_tpu.io.resample import inverse_gps_coordinates

T0 = 1_630_000_000.0  # epoch origin for all clocks
GPS_HZ = 18
VIDEO_FPS = 30.0
GAZE_HZ = 200


def make_trajectory(duration_s: float, seed: int = 0) -> np.ndarray:
    """Smooth driving trajectory in web-mercator meters at GPS_HZ."""
    rng = np.random.default_rng(seed)
    n = int(duration_s * GPS_HZ)
    heading = np.cumsum(rng.normal(0, 0.02, n)) + rng.uniform(0, 2 * np.pi)
    speed = np.clip(8 + np.cumsum(rng.normal(0, 0.05, n)), 2, 20) / GPS_HZ
    vel = np.stack([np.cos(heading), np.sin(heading)], -1) * speed[:, None]
    return np.array([900000.0, 5000000.0]) + np.cumsum(vel, axis=0)


def gpmf_stream(xy_m: np.ndarray, start_epoch: float) -> bytes:
    """Encode a trajectory as GPMF with one GPSU per second of GPS5 batches."""
    latlon = inverse_gps_coordinates(xy_m)
    scal = struct.pack(">lllll", 10000000, 10000000, 1000, 1000, 100)
    items = [
        ("SCAL", "l", scal, 4, 5),
        ("GPSF", "L", struct.pack(">L", 3), 4, 1),
        ("GPSP", "S", struct.pack(">H", 150), 2, 1),
    ]
    for batch_start in range(0, len(latlon), GPS_HZ):
        t = start_epoch + batch_start / GPS_HZ
        stamp = datetime.datetime.fromtimestamp(
            t, datetime.timezone.utc
        ).strftime("%y%m%d%H%M%S.%f")[:16]
        items.append(("GPSU", "U", stamp.encode(), 16, 1))
        rows = b""
        batch = latlon[batch_start : batch_start + GPS_HZ]
        for lat, lon in batch:
            rows += struct.pack(
                ">lllll",
                int(lat * 1e7), int(lon * 1e7), int(400 * 1000),
                int(5.0 * 1000), int(5.0 * 100),
            )
        items.append(("GPS5", "l", rows, 20, len(batch)))
    return encode_gpmf(items)


def write_video(path: Path, n_frames: int, hw=(48, 64), seed=0):
    import cv2

    rng = np.random.default_rng(seed)
    base = rng.integers(0, 255, size=(hw[0], hw[1], 3), dtype=np.uint8)
    writer = cv2.VideoWriter(
        str(path), cv2.VideoWriter_fourcc(*"mp4v"), VIDEO_FPS, (hw[1], hw[0])
    )
    assert writer.isOpened()
    for i in range(n_frames):
        frame = np.roll(base, shift=i, axis=1)
        writer.write(frame)
    writer.release()


def inject_gpmf_track(path: Path, payload: bytes):
    """Add a gpmd telemetry track to an existing MP4.

    The original moov is blanked to a ``free`` box (all sample offsets keep
    their positions); a new mdat with the GPMF payload and a merged moov
    (original body + the new trak) are appended.
    """
    data = bytearray(path.read_bytes())

    # locate the top-level moov
    pos = 0
    moov_pos = moov_size = None
    while pos + 8 <= len(data):
        size = struct.unpack(">I", data[pos : pos + 4])[0]
        btype = bytes(data[pos + 4 : pos + 8])
        if size == 0:
            size = len(data) - pos
        if btype == b"moov":
            moov_pos, moov_size = pos, size
            break
        pos += size
    assert moov_pos is not None, "no moov in fixture video"
    moov_body = bytes(data[moov_pos + 8 : moov_pos + moov_size])
    # blank it
    data[moov_pos + 4 : moov_pos + 8] = b"free"

    # append gpmf mdat
    mdat_offset = len(data)
    data += struct.pack(">I", 8 + len(payload)) + b"mdat" + payload
    payload_offset = mdat_offset + 8

    mp4 = MP4(path)  # durations from the original moov (still first? blanked)
    # read timescale/duration directly from the original body instead
    def full(btype, version_flags, body):
        return (
            struct.pack(">I", 8 + 4 + len(body))
            + btype
            + struct.pack(">I", version_flags)
            + body
        )

    def box(btype, body):
        return struct.pack(">I", 8 + len(body)) + btype + body

    timescale = 1000
    duration_s = max(1.0, len(payload) and 1.0)
    # estimate duration from the GPMF sample count: 1 sample total
    tkhd = full(
        b"tkhd", 7,
        struct.pack(">III", 0, 0, 99) + b"\x00" * 60 + struct.pack(">II", 0, 0),
    )
    mdhd = full(
        b"mdhd", 0,
        struct.pack(">IIII", 0, 0, timescale, int(duration_s * timescale))
        + b"\x00\x00\x00\x00",
    )
    hdlr = full(b"hdlr", 0, b"\x00" * 4 + b"meta" + b"\x00" * 12 + b"GoPro MET\x00")
    stsd = full(b"stsd", 0, struct.pack(">I", 1) + box(b"gpmd", b"\x00" * 8))
    stsz = full(b"stsz", 0, struct.pack(">III", 0, 1, len(payload)))
    stco = full(b"stco", 0, struct.pack(">II", 1, payload_offset))
    stsc = full(b"stsc", 0, struct.pack(">IIII", 1, 1, 1, 1))
    stts = full(b"stts", 0, struct.pack(">III", 1, 1, int(duration_s * timescale)))
    stbl = box(b"stbl", stsd + stsz + stco + stsc + stts)
    minf = box(b"minf", stbl)
    mdia = box(b"mdia", mdhd + hdlr + minf)
    trak = box(b"trak", tkhd + mdia)

    data += box(b"moov", moov_body + trak)
    path.write_bytes(bytes(data))
    del mp4


def audio_tone(duration_s: float, rate: int, seed: int = 0) -> np.ndarray:
    """Deterministic stereo int16 PCM: distinct tones per channel + noise,
    so window slicing and channel averaging are both observable."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(duration_s * rate)) / rate
    left = 12000 * np.sin(2 * np.pi * 440.0 * t)
    right = 9000 * np.sin(2 * np.pi * 660.0 * t)
    pcm = np.stack([left, right], axis=1)
    pcm += rng.normal(0, 150, size=pcm.shape)
    return np.clip(pcm, -32768, 32767).astype(np.int16)


def inject_pcm_audio_track(
    path: Path, pcm: np.ndarray, rate: int, frames_per_chunk: int = 1024
):
    """Add a 16-bit little-endian PCM ('sowt') audio track to an MP4.

    Same append strategy as :func:`inject_gpmf_track`: the current moov is
    blanked to ``free``, a new mdat with the PCM payload is appended, and a
    merged moov (old body + the audio trak) follows. Chunks hold
    ``frames_per_chunk`` PCM frames — the granularity ffmpeg's mov demuxer
    packetizes PCM at, which the pure-Python twin mirrors.
    """
    assert pcm.dtype == np.int16 and pcm.ndim == 2
    n, channels = pcm.shape
    payload = pcm.astype("<i2").tobytes()

    data = bytearray(path.read_bytes())
    pos = 0
    moov_pos = moov_size = None
    while pos + 8 <= len(data):
        size = struct.unpack(">I", data[pos : pos + 4])[0]
        btype = bytes(data[pos + 4 : pos + 8])
        if size == 0:
            size = len(data) - pos
        if btype == b"moov":
            moov_pos, moov_size = pos, size
            break
        pos += size
    assert moov_pos is not None, "no moov in fixture video"
    moov_body = bytes(data[moov_pos + 8 : moov_pos + moov_size])
    data[moov_pos + 4 : moov_pos + 8] = b"free"

    mdat_offset = len(data)
    data += struct.pack(">I", 8 + len(payload)) + b"mdat" + payload
    payload_offset = mdat_offset + 8

    def full(btype, version_flags, body):
        return (
            struct.pack(">I", 8 + 4 + len(body))
            + btype
            + struct.pack(">I", version_flags)
            + body
        )

    def box(btype, body):
        return struct.pack(">I", 8 + len(body)) + btype + body

    frame_bytes = 2 * channels
    n_chunks = (n + frames_per_chunk - 1) // frames_per_chunk
    chunk_offsets = [
        payload_offset + i * frames_per_chunk * frame_bytes
        for i in range(n_chunks)
    ]
    tkhd = full(
        b"tkhd", 7,
        struct.pack(">III", 0, 0, 98) + b"\x00" * 60 + struct.pack(">II", 0, 0),
    )
    mdhd = full(
        b"mdhd", 0,
        struct.pack(">IIII", 0, 0, rate, n) + b"\x00\x00\x00\x00",
    )
    hdlr = full(b"hdlr", 0, b"\x00" * 4 + b"soun" + b"\x00" * 12 + b"Audio\x00")
    # v0 AudioSampleEntry: reserved(6) dref(2) ver(2) rev(2) vendor(4)
    # channels(2) bits(2) compression(2) packet(2) rate(16.16)
    entry = (
        b"\x00" * 6 + struct.pack(">H", 1)
        + struct.pack(">HHIHHHH", 0, 0, 0, channels, 16, 0, 0)
        + struct.pack(">I", rate << 16)
    )
    stsd = full(b"stsd", 0, struct.pack(">I", 1) + box(b"sowt", entry))
    stsz = full(b"stsz", 0, struct.pack(">II", frame_bytes, n))
    stco = full(
        b"stco", 0,
        struct.pack(f">I{n_chunks}I", n_chunks, *chunk_offsets),
    )
    last_per = n - (n_chunks - 1) * frames_per_chunk
    if n_chunks > 1 and last_per != frames_per_chunk:
        stsc_body = struct.pack(
            ">IIIIIII", 2, 1, frames_per_chunk, 1, n_chunks, last_per, 1
        )
    else:
        stsc_body = struct.pack(">IIII", 1, 1, min(frames_per_chunk, n), 1)
    stsc = full(b"stsc", 0, stsc_body)
    stts = full(b"stts", 0, struct.pack(">III", 1, n, 1))
    stbl = box(b"stbl", stsd + stsz + stco + stsc + stts)
    smhd = full(b"smhd", 0, b"\x00" * 4)
    minf = box(b"minf", smhd + stbl)
    mdia = box(b"mdia", mdhd + hdlr + minf)
    trak = box(b"trak", tkhd + mdia)

    data += box(b"moov", moov_body + trak)
    path.write_bytes(bytes(data))


def build_gem_fixture(
    root: Path,
    duration_s: float = 20.0,
    subject: str = "001",
    hw=(48, 64),
    with_audio: bool = False,
    audio_rate: int = 48000,
):
    """Write a complete synthetic GEM recording under ``root``.

    ``hw`` sizes the GoPro/world frames — tests keep the tiny default;
    ``tools/bench_e2e.py`` uses larger frames for a realistic decode load.
    ``with_audio`` injects 16-bit PCM stereo tracks into all three videos
    (left/right/world) for the dataset's ``with_audio`` path.
    """
    root = Path(root)
    gopro = root / "01GoPro" / subject
    eye = root / "02EyeTracker" / subject
    gps_dir = root / "03CorrectedGPS" / subject
    for d in (gopro / "left", gopro / "right", eye, gps_dir):
        d.mkdir(parents=True, exist_ok=True)

    traj = make_trajectory(duration_s)
    n_frames = int(duration_s * VIDEO_FPS)

    # GoPro videos with GPMF tracks (GPS clock starts exactly at T0)
    payload = gpmf_stream(traj, T0)
    left = gopro / "left" / "GH010008.MP4"
    right = gopro / "right" / "GH010009.MP4"
    write_video(left, n_frames, hw=hw, seed=1)
    write_video(right, n_frames, hw=hw, seed=2)
    inject_gpmf_track(left, payload)
    inject_gpmf_track(right, payload)
    if with_audio:
        inject_pcm_audio_track(left, audio_tone(duration_s, audio_rate, 11), audio_rate)
        inject_pcm_audio_track(right, audio_tone(duration_s, audio_rate, 12), audio_rate)

    # Eye tracker: pupil-internal timestamps are near-zero relative values;
    # the posix anchor is start_time_gaze (= T0 here), added by the reader.
    # Gaze starts at 0 (covers the whole window); the world video lags by
    # 0.35 s and therefore defines the common origin (= T0 + 0.35).
    pupil_t0 = 0.0
    world_t0 = 0.35
    gaze_n = int(duration_s * GAZE_HZ)
    gaze_ts = pupil_t0 + np.arange(gaze_n) / GAZE_HZ
    rng = np.random.default_rng(3)
    gaze_entries = [
        {
            "topic": "gaze.pi",
            "norm_pos": (
                float(0.5 + 0.02 * np.sin(i / 50) + rng.normal(0, 0.001)),
                float(0.5 + 0.02 * np.cos(i / 70) + rng.normal(0, 0.001)),
            ),
            "timestamp": float(ts),
            "confidence": 0.99,
        }
        for i, ts in enumerate(gaze_ts)
    ]
    save_pldata_file(gaze_entries, gaze_ts, eye, "gaze")

    world = eye / "world.mp4"
    write_video(world, n_frames, hw=hw, seed=4)
    if with_audio:
        inject_pcm_audio_track(world, audio_tone(duration_s, audio_rate, 13), audio_rate)
    np.save(eye / "world_timestamps.npy", world_t0 + np.arange(n_frames) / VIDEO_FPS)

    save_object(
        {
            "(1088, 1080)": {
                "cam_type": "radial",
                "camera_matrix": [
                    [766.0, 0.0, 544.0],
                    [0.0, 766.0, 540.0],
                    [0.0, 0.0, 1.0],
                ],
                "dist_coefs": [[-0.1, 0.05, 0.0, 0.0, 0.0]],
            }
        },
        eye / "world.intrinsics",
    )

    start_ns = int((T0 - pupil_t0 + gaze_ts[0]) * 1e9)  # == T0 * 1e9
    (eye / "info.invisible.json").write_text(
        json.dumps({"start_time": start_ns, "duration": int(duration_s * 1e9)})
    )
    (eye / "info.player.json").write_text(
        json.dumps({"start_time_synced_s": start_ns / 1e9, "duration_s": duration_s})
    )

    # corrected GPS: ground-truth lat/lon at 2 Hz on the left-video clock
    latlon = inverse_gps_coordinates(traj)
    step = GPS_HZ // 2
    ms = (np.arange(len(latlon)) / GPS_HZ * 1000.0)[::step]
    rows = [
        f"{lat:.8f},{lon:.8f},{int(m)}"
        for (lat, lon), m in zip(latlon[::step], ms)
    ]
    (gps_dir / "GH010008_1.csv").write_text("\n".join(rows))

    return {"traj": traj, "duration": duration_s}
