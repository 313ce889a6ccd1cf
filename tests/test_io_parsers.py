"""Tests for host-side IO parsers: GPMF, MP4 demux, pldata, resampling."""

import datetime
import struct

import numpy as np
import pytest

from routeformer_tpu.io.gpmf import (
    GPSPoint,
    build_gps_points,
    encode_gpmf,
    estimate_fps,
    fix_timestamps,
    parse_gpmf,
)
from routeformer_tpu.io.file_methods import (
    Serialized_Dict,
    load_pldata_file,
    save_pldata_file,
)
from routeformer_tpu.io.resample import (
    convert_gps_coordinates,
    inverse_gps_coordinates,
    pchip_resample,
    smooth_resample,
)


def gps5_payload(points, scale=(10000000, 10000000, 1000, 1000, 100)):
    """Encode GPS5 rows as int32 big-endian with the given scales."""
    rows = b""
    for lat, lon, alt, s2d, s3d in points:
        rows += struct.pack(
            ">lllll",
            int(lat * scale[0]), int(lon * scale[1]), int(alt * scale[2]),
            int(s2d * scale[3]), int(s3d * scale[4]),
        )
    return rows


def make_gpmf_fixture():
    """A synthetic GPMF stream: SCAL + GPSU + GPSF + GPSP + GPS5 batch."""
    scal = struct.pack(">lllll", 10000000, 10000000, 1000, 1000, 100)
    gpsu = b"230515120000.000"  # 2023-05-15 12:00:00
    points = [
        (47.37, 8.54, 410.0, 5.5, 5.6),
        (47.3701, 8.5401, 410.1, 5.6, 5.7),
        (0.0, 0.0, 0.0, 0.0, 0.0),  # empty point, must be skipped
        (47.3702, 8.5402, 410.2, 5.7, 5.8),
    ]
    items = [
        ("SCAL", "l", scal, 4, 5),
        ("GPSF", "L", struct.pack(">L", 3), 4, 1),
        ("GPSP", "S", struct.pack(">H", 150), 2, 1),
        ("GPSU", "U", gpsu, 16, 1),
        ("GPS5", "l", gps5_payload(points), 20, len(points)),
    ]
    return encode_gpmf(items)


class TestGPMF:
    def test_parse_klv(self):
        data = make_gpmf_fixture()
        items = {i.fourcc: i for i in parse_gpmf(data)}
        assert "SCAL" in items and "GPS5" in items and "GPSU" in items
        assert isinstance(items["GPSU"].data, datetime.datetime)
        assert items["GPSU"].data.year == 2023

    def test_build_gps_points(self):
        points, dilutions = build_gps_points(make_gpmf_fixture(), dilution_threshold=500)
        assert len(points) == 3  # empty point skipped
        np.testing.assert_allclose(points[0].latitude, 47.37, atol=1e-6)
        np.testing.assert_allclose(points[0].longitude, 8.54, atol=1e-6)
        np.testing.assert_allclose(points[0].speed, 5.5, atol=1e-3)
        assert all(d == 150 for d in dilutions)
        # first point carries GPSU; the rest interpolated at fallback 18.17 Hz
        assert points[0].time is not None
        dt = (points[1].time - points[0].time).total_seconds()
        np.testing.assert_allclose(dt, 1 / 18.17, rtol=1e-3)

    def test_no_fix_gives_infinite_dilution(self):
        scal = struct.pack(">lllll", 10000000, 10000000, 1000, 1000, 100)
        items = [
            ("SCAL", "l", scal, 4, 5),
            ("GPSF", "L", struct.pack(">L", 0), 4, 1),  # no lock
            ("GPS5", "l", gps5_payload([(47.0, 8.0, 100.0, 1.0, 1.0)]), 20, 1),
        ]
        points, dil = build_gps_points(encode_gpmf(items), dilution_threshold=500)
        assert len(points) == 0  # inf dilution filtered out

    def test_nested_container(self):
        inner = encode_gpmf([("GPSF", "L", struct.pack(">L", 3), 4, 1)])
        outer = encode_gpmf([("DEVC", "\x00", inner, 1, len(inner))])
        items = list(parse_gpmf(outer))
        assert any(i.fourcc == "GPSF" for i in items)

    def test_fps_estimation_rejects_outliers(self):
        base = datetime.datetime(2023, 1, 1)
        # stamps at 18 Hz batches of 18, one bogus stamp
        ts = []
        for batch in range(4):
            ts.append(base + datetime.timedelta(seconds=batch))
            ts.extend([None] * 17)
        ts[18] = base + datetime.timedelta(seconds=100)  # bogus
        ts.append(base + datetime.timedelta(seconds=4))
        fps = estimate_fps(ts)
        assert ts[18] is None  # outlier removed
        assert all(17.5 <= f <= 18.5 for f in fps)


class TestMP4:
    def make_mp4(self, tmp_path, payload: bytes):
        """Construct a minimal MP4 with one 'meta'/gpmd track holding payload."""

        def box(btype, body):
            return struct.pack(">I", 8 + len(body)) + btype + body

        def full(btype, version_flags, body):
            return box(btype, struct.pack(">I", version_flags) + body)

        mdat = box(b"mdat", payload)
        # mdat will start after ftyp; compute offsets afterwards
        ftyp = box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
        data_offset = len(ftyp) + 8  # into mdat body

        mvhd = full(
            b"mvhd", 0,
            struct.pack(">IIII", 100, 100, 1000, 5000)  # ct, mt, timescale, dur
            + b"\x00" * 80,
        )
        tkhd = full(
            b"tkhd", 7,
            struct.pack(">III", 0, 0, 1)  # ct, mt, track_id
            + b"\x00" * 60
            + struct.pack(">II", 0, 0),  # width, height 16.16
        )
        mdhd = full(
            b"mdhd", 0, struct.pack(">IIII", 0, 0, 1000, 5000) + b"\x00\x00\x00\x00"
        )
        hdlr = full(
            b"hdlr", 0,
            b"\x00" * 4 + b"meta" + b"\x00" * 12 + b"GoPro MET\x00",
        )
        stsd = full(
            b"stsd", 0,
            struct.pack(">I", 1) + box(b"gpmd", b"\x00" * 8),
        )
        n = len(payload)
        stsz = full(b"stsz", 0, struct.pack(">III", 0, 1, n))
        stco = full(b"stco", 0, struct.pack(">II", 1, data_offset))
        stsc = full(b"stsc", 0, struct.pack(">IIII", 1, 1, 1, 1))
        stts = full(b"stts", 0, struct.pack(">III", 1, 1, 1000))
        stbl = box(b"stbl", stsd + stsz + stco + stsc + stts)
        minf = box(b"minf", stbl)
        mdia = box(b"mdia", mdhd + hdlr + minf)
        trak = box(b"trak", tkhd + mdia)
        moov = box(b"moov", mvhd + trak)

        path = tmp_path / "test.mp4"
        path.write_bytes(ftyp + mdat + moov)
        return path

    def test_gpmd_extraction(self, tmp_path):
        from routeformer_tpu.io.mp4 import MP4, read_gpmf_data

        payload = make_gpmf_fixture()
        path = self.make_mp4(tmp_path, payload)
        mp4 = MP4(path)
        assert mp4.timescale == 1000
        assert mp4.gpmd_track() is not None
        assert read_gpmf_data(path) == payload

    def test_end_to_end_gps_from_mp4(self, tmp_path):
        from routeformer_tpu.io.mp4 import read_gpmf_data

        path = self.make_mp4(tmp_path, make_gpmf_fixture())
        points, dil = build_gps_points(read_gpmf_data(path))
        assert len(points) == 3


class TestPLData:
    def test_roundtrip(self, tmp_path):
        data = [
            {"timestamp": 1.5, "confidence": 0.9, "norm_pos": (0.5, 0.5)},
            {"timestamp": 1.6, "confidence": 0.2, "norm_pos": (0.1, 0.9)},
        ]
        save_pldata_file(data, [1.5, 1.6], tmp_path, "gaze")
        loaded = load_pldata_file(tmp_path, "gaze")
        assert len(loaded.data) == 2
        np.testing.assert_allclose(loaded.timestamps, [1.5, 1.6])
        assert loaded.data[0]["confidence"] == 0.9
        assert tuple(loaded.data[1]["norm_pos"]) == (0.1, 0.9)
        assert loaded.topics[0] == "gaze"

    def test_serialized_dict_lazy(self):
        sd = Serialized_Dict(python_dict={"a": 1, "nested": {"b": 2}})
        assert sd._data is None  # not yet deserialized
        assert sd["a"] == 1
        assert sd["nested"]["b"] == 2


class TestResample:
    def test_web_mercator_known_points(self):
        out = convert_gps_coordinates(np.array([[0.0, 0.0], [45.0, 90.0]]))
        np.testing.assert_allclose(out[0], [0.0, 0.0], atol=1e-6)
        np.testing.assert_allclose(out[1, 0], 10018754.17, rtol=1e-6)
        np.testing.assert_allclose(out[1, 1], 5621521.49, rtol=1e-6)

    def test_web_mercator_roundtrip(self, rng):
        latlon = np.stack(
            [rng.uniform(-80, 80, 10), rng.uniform(-179, 179, 10)], axis=-1
        )
        back = inverse_gps_coordinates(convert_gps_coordinates(latlon))
        np.testing.assert_allclose(back, latlon, atol=1e-9)

    def test_pchip_resample_grid_and_fill(self):
        ts = np.array([1.0, 2.0, 3.0, 4.0])
        vals = np.stack([ts * 2, ts * -1], axis=-1)
        grid, out = pchip_resample(ts, vals, origin_time=0.0, duration=5.0, output_fps=2)
        assert grid[0] == 0.0 and grid[-1] >= 5.0
        # inside the support: linear data is reproduced
        inside = (grid >= 1.0) & (grid <= 4.0)
        np.testing.assert_allclose(out[inside, 0], grid[inside] * 2, atol=1e-8)
        # outside: ffill/bfill, no NaNs
        assert not np.isnan(out).any()
        np.testing.assert_allclose(out[0], vals[0], atol=1e-8)  # bfill
        np.testing.assert_allclose(out[-1], vals[-1], atol=1e-8)  # ffill

    def test_smooth_resample_weighted(self, rng):
        ts = np.linspace(0, 10, 100)
        clean = np.stack([np.sin(ts), np.cos(ts)], axis=-1)
        noisy = clean + rng.normal(0, 0.05, clean.shape)
        dil = np.full(100, 2.0)
        out = smooth_resample(ts, noisy, dil, start=1.0, end=9.0, output_fps=5)
        grid = np.arange(1.0, 9.0, 0.2)
        expected = np.stack([np.sin(grid), np.cos(grid)], axis=-1)
        err = np.abs(out - expected).mean()
        assert err < 0.05


class TestNativeGPMF:
    def test_native_matches_python(self):
        """The C++ walker must produce identical points to the Python FSM."""
        from routeformer_tpu.io.gpmf_native import (
            build_gps_points_native,
            native_available,
        )

        if not native_available():
            pytest.skip("native gpmf library not built")
        data = make_gpmf_fixture()
        py_points, py_dil = build_gps_points(data, 500, prefer_native=False)
        nat_points, nat_dil = build_gps_points_native(data, 500)
        assert len(py_points) == len(nat_points)
        for p, n in zip(py_points, nat_points):
            np.testing.assert_allclose(
                [p.latitude, p.longitude, p.altitude, p.speed],
                [n.latitude, n.longitude, n.altitude, n.speed],
                rtol=1e-12,
            )
            assert abs((p.time - n.time).total_seconds()) < 1e-3
        np.testing.assert_allclose(py_dil, nat_dil)

    def test_native_on_large_stream(self, rng):
        """Multi-batch stream parity + sanity on throughput path."""
        from routeformer_tpu.io.gpmf_native import (
            build_gps_points_native,
            native_available,
        )

        if not native_available():
            pytest.skip("native gpmf library not built")
        scal = struct.pack(">lllll", 10000000, 10000000, 1000, 1000, 100)
        items = [
            ("SCAL", "l", scal, 4, 5),
            ("GPSF", "L", struct.pack(">L", 3), 4, 1),
            ("GPSP", "S", struct.pack(">H", 120), 2, 1),
        ]
        base = datetime.datetime(2023, 5, 15, 12, 0, 0)
        for batch in range(50):
            t = base + datetime.timedelta(seconds=batch)
            items.append(
                ("GPSU", "U", t.strftime("%y%m%d%H%M%S.%f")[:16].encode(), 16, 1)
            )
            pts = [
                (47.0 + batch * 1e-4 + i * 1e-6, 8.0, 400.0, 5.0, 5.0)
                for i in range(18)
            ]
            items.append(("GPS5", "l", gps5_payload(pts), 20, 18))
        data = encode_gpmf(items)

        py_points, _ = build_gps_points(data, 500, prefer_native=False)
        nat_points, _ = build_gps_points_native(data, 500)
        assert len(py_points) == len(nat_points) == 900
        for p, n in zip(py_points[::97], nat_points[::97]):
            np.testing.assert_allclose(p.latitude, n.latitude, rtol=1e-12)
            assert abs((p.time - n.time).total_seconds()) < 1e-3

    def test_array_fast_path_parity(self):
        """build_gps_arrays (C++ walk + vectorized timestamp fix) must match
        the Python object path exactly."""
        from routeformer_tpu.io.gpmf_native import build_gps_arrays, native_available

        if not native_available():
            pytest.skip("native gpmf library not built")
        scal = struct.pack(">lllll", 10000000, 10000000, 1000, 1000, 100)
        items = [
            ("SCAL", "l", scal, 4, 5),
            ("GPSF", "L", struct.pack(">L", 3), 4, 1),
            ("GPSP", "S", struct.pack(">H", 120), 2, 1),
        ]
        base = datetime.datetime(2023, 5, 15, 12, 0, 0)
        for batch in range(20):
            t = base + datetime.timedelta(seconds=batch)
            items.append(
                ("GPSU", "U", t.strftime("%y%m%d%H%M%S.%f")[:16].encode(), 16, 1)
            )
            pts = [(47.0 + batch * 1e-4, 8.0, 400.0, 5.0, 5.0)] * 18
            items.append(("GPS5", "l", gps5_payload(pts), 20, 18))
        data = encode_gpmf(items)

        vals, times, dil = build_gps_arrays(data)
        py_points, py_dil = build_gps_points(data, prefer_native=False)
        assert len(vals) == len(py_points)
        py_t = np.array(
            [
                p.time.replace(tzinfo=datetime.timezone.utc).timestamp()
                for p in py_points
            ]
        )
        np.testing.assert_allclose(times, py_t, atol=2e-3)
        np.testing.assert_allclose(vals[:, 0], [p.latitude for p in py_points])
        np.testing.assert_allclose(dil, py_dil)
