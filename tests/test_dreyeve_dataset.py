"""End-to-end DreyeveDataset tests on a synthetic session fixture."""

import numpy as np
import pytest

from routeformer_tpu.io.dataset_dreyeve import DreyeveDataset
from routeformer_tpu.io.resample import inverse_gps_coordinates


def build_dreyeve_fixture(root, session_ids=(1, 2), duration_s=20.0, fps=30):
    """Write synthetic DR(eye)VE sessions: jpeg frames, etg_samples.txt,
    speed_course_coord.txt."""
    import cv2

    root.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    n_frames = int(duration_s * fps)

    for sid in session_ids:
        base = root / f"{sid:02d}"
        gar_dir = base / "video_garmin_frames"
        etg_dir = base / "video_etg_frames"
        gar_dir.mkdir(parents=True, exist_ok=True)
        etg_dir.mkdir(parents=True, exist_ok=True)

        img = rng.integers(0, 255, size=(36, 64, 3), dtype=np.uint8)
        for i in range(n_frames):
            frame = np.roll(img, i, axis=1)
            cv2.imwrite(str(gar_dir / f"{i:06d}.jpg"), frame)
            cv2.imwrite(str(etg_dir / f"{i:06d}.jpg"), frame[::-1])

        # gaze: ~2 ETG readings per garmin frame
        lines = ["frame_etg frame_gar X Y event_type timestamp"]
        for i in range(n_frames):
            for r in range(2):
                x = 540 + 100 * np.sin(i / 40) + rng.normal(0, 2)
                y = 360 + 80 * np.cos(i / 50) + rng.normal(0, 2)
                lines.append(f"{i} {i} {x:.2f} {y:.2f} Fixation {i * 33 + r * 16}")
        (base / "etg_samples.txt").write_text("\n".join(lines))

        # GPS: smooth trajectory at garmin frame rate (lat, lon degrees)
        heading = np.cumsum(rng.normal(0, 0.01, n_frames)) + sid
        speed = 8.0 / fps
        xy = np.array([100000.0 * sid, 5000000.0]) + np.cumsum(
            np.stack([np.cos(heading), np.sin(heading)], -1) * speed, axis=0
        )
        latlon = inverse_gps_coordinates(xy)
        rows = [
            f"{i}\t{8.0:.2f}\t{np.degrees(heading[i]):.2f}\t{latlon[i,0]:.8f}\t{latlon[i,1]:.8f}"
            for i in range(n_frames)
        ]
        (base / "speed_course_coord.txt").write_text("\n".join(rows))
    return root


@pytest.fixture(scope="module")
def dreyeve_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("dreyeve")
    return build_dreyeve_fixture(root)


def make_dataset(root, **kwargs):
    defaults = dict(
        root_dir=root,
        split=[1, 2],
        input_length=8,
        target_length=6,
        step_size=2,
        min_pci=0,
        output_fps=5,
        gopro_scaling_factor=0.5,
        front_scaling_factor=0.5,
        with_video=True,
    )
    defaults.update(kwargs)
    return DreyeveDataset(**defaults)


class TestDreyeveDataset:
    def test_metadata_join(self, dreyeve_root):
        ds = make_dataset(dreyeve_root, with_video=False)
        md = ds.metadata[1]
        assert "lat" in md.columns and "X" in md.columns
        assert len(md) > 500

    def test_windows_and_pci(self, dreyeve_root):
        ds = make_dataset(dreyeve_root, with_video=False)
        assert len(ds) >= 4  # 2 sessions x >= 2 windows
        assert all(np.isfinite(e["pci"]) for e in ds.data)

    def test_item_shapes(self, dreyeve_root):
        ds = make_dataset(dreyeve_root)
        item = ds[0]
        train, target = item["train"], item["target"]
        assert train["gps"].shape == (40, 2)
        assert target["gps"].shape == (30, 2)
        # 2 gaze readings per frame -> 80/60 points
        assert train["gaze"].shape == (80, 2)
        assert target["gaze"].shape == (60, 2)
        assert train["left_video"].shape[0] == 40
        assert train["front_video"].shape[0] == 40
        assert train["left_video"].dtype == np.float16
        # garmin crop: 15%..65% of scaled height 18 -> 9 rows
        assert train["left_video"].shape[1] == int(0.65 * 18) - int(0.15 * 18)

    def test_uint8_wire_format_matches_float16(self, dreyeve_root):
        ds_f16 = make_dataset(dreyeve_root)
        ds_u8 = make_dataset(dreyeve_root, video_dtype="uint8")
        a, b = ds_f16[0], ds_u8[0]
        for phase in ("train", "target"):
            for key in a[phase]:
                if "video" in key:
                    assert b[phase][key].dtype == np.uint8, key
                    np.testing.assert_array_equal(
                        a[phase][key],
                        b[phase][key].astype(np.float16) / 255.0,
                        err_msg=key,
                    )
                else:
                    np.testing.assert_array_equal(
                        a[phase][key], b[phase][key], err_msg=key
                    )

    def test_pci_cache(self, dreyeve_root, tmp_path):
        ds1 = make_dataset(
            dreyeve_root, with_video=False, use_cache=True, cache_dir=tmp_path
        )
        pci_files = list((tmp_path / "dreyeve_dataset").glob("pci_*.json"))
        assert pci_files
        ds2 = make_dataset(
            dreyeve_root, with_video=False, use_cache=True, cache_dir=tmp_path
        )
        np.testing.assert_allclose(
            [e["pci"] for e in ds1.data], [e["pci"] for e in ds2.data]
        )

    def test_memory_cache(self, dreyeve_root):
        ds = make_dataset(dreyeve_root, use_memory_cache=True)
        a = ds[0]
        assert 0 in ds.full_dataset
        # the MISS return must already be isolated from the stored nesting
        keys_before = set(ds.full_dataset[0]["train"].keys())
        a["train"].clear()
        assert set(ds.full_dataset[0]["train"].keys()) == keys_before
        a = ds[0]
        b = ds[0]
        # hit: arrays shared (no recompute), dicts shallow-copied so key
        # replacement by a consumer can't corrupt the cache; in-place
        # array writes raise (read-only)
        assert b is not a
        shared = [
            k for k in a["train"]
            if isinstance(a["train"][k], np.ndarray)
        ]
        assert shared and all(
            b["train"][k] is a["train"][k] for k in shared
        )
        with pytest.raises(ValueError):
            b["train"][shared[0]][...] = 0

    def test_pci_split_bins(self, dreyeve_root):
        ds = make_dataset(
            dreyeve_root, with_video=False, enable_pci_split=True,
            pci_split_n_samples_per_bin=2, split="train",
        )
        # data must still be reachable through the bin indexing
        item = ds[0]
        assert "train" in item

    def test_split_filtering(self, dreyeve_root):
        ds = make_dataset(dreyeve_root, with_video=False, split=[1])
        assert set(e["session_id"] for e in ds.data) == {1}


class TestDreyeveAviDecode:
    def test_use_frames_false(self, dreyeve_root, tmp_path):
        """Direct container decode must match the exploded-jpeg path within
        codec tolerance."""
        import cv2

        # build .avi files from the jpeg frames of session 1
        base = dreyeve_root / "01"
        for name, pattern in (
            ("video_garmin.avi", base / "video_garmin_frames"),
            ("video_etg.avi", base / "video_etg_frames"),
        ):
            files = sorted(pattern.glob("*.jpg"))
            first = cv2.imread(str(files[0]))
            writer = cv2.VideoWriter(
                str(base / name), cv2.VideoWriter_fourcc(*"MJPG"), 30,
                (first.shape[1], first.shape[0]),
            )
            assert writer.isOpened()
            for f in files:
                writer.write(cv2.imread(str(f)))
            writer.release()

        ds_frames = make_dataset(dreyeve_root, split=[1])
        ds_avi = make_dataset(dreyeve_root, split=[1], use_frames=False)
        a = ds_frames[0]["train"]["left_video"]
        b = ds_avi[0]["train"]["left_video"]
        assert a.shape == b.shape
        # MJPG recompression: images close but not identical
        assert np.abs(a.astype(np.float32) - b.astype(np.float32)).mean() < 0.05
