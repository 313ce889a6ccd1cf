"""End-to-end GEMDataset tests on a synthetic byte-real recording."""

import numpy as np
import pytest

from gem_fixture import GPS_HZ, T0, build_gem_fixture
from routeformer_tpu.io.dataset import GEMDataset


@pytest.fixture(scope="module")
def gem_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("gem")
    info = build_gem_fixture(root, duration_s=20.0)
    return root, info


def make_dataset(root, **kwargs):
    defaults = dict(
        root=root,
        split=["001"],
        input_length=8,
        target_length=6,
        step_size=2,
        min_pci=None,
        output_fps=5,
        crop_videos=True,
        undistort_videos=False,
        gopro_scaling_factor=0.5,
        front_scaling_factor=0.5,
        with_video=True,
        with_gaze=True,
    )
    defaults.update(kwargs)
    return GEMDataset(**defaults)


class TestGEMDatasetDiscovery:
    def test_metadata_and_alignment(self, gem_root):
        root, info = gem_root
        ds = make_dataset(root, with_video=False, with_gaze=False)
        meta = next(iter(ds.subject_sample_metadatas["001"].values()))
        # all clocks were built to coincide at T0
        assert abs(meta["origin_time"] - T0) < 1.0
        assert meta["duration"] > 10.0
        assert meta["left_offset"] < 1.0

    def test_indexer_windows(self, gem_root):
        root, info = gem_root
        ds = make_dataset(root, with_video=False, with_gaze=False)
        # duration ~19-20s -> starts at 0,2,4 (needs 14s chunks)
        assert len(ds) >= 2
        item = ds._indexer[0]
        assert item["subject"] == "001"
        assert np.isfinite(item["pci"])

    def test_pci_filter_reduces_samples(self, gem_root):
        root, _ = gem_root
        ds_all = make_dataset(root, with_video=False, with_gaze=False)
        ds_filtered = make_dataset(
            root, with_video=False, with_gaze=False, min_pci=1e9
        )
        assert len(ds_filtered) == 0
        assert len(ds_all) > 0

    def test_pci_cache_roundtrip(self, gem_root, tmp_path):
        root, _ = gem_root
        ds1 = make_dataset(
            root, with_video=False, with_gaze=False, cache_dir=tmp_path
        )
        pcis1 = [ds1._indexer[i]["pci"] for i in range(len(ds1))]
        ds2 = make_dataset(
            root, with_video=False, with_gaze=False, cache_dir=tmp_path
        )
        pcis2 = [ds2._indexer[i]["pci"] for i in range(len(ds2))]
        np.testing.assert_allclose(pcis1, pcis2)
        assert any(tmp_path.glob("gem_pci_*.json"))


class TestGEMDatasetItems:
    def test_gps_only_item(self, gem_root):
        root, info = gem_root
        ds = make_dataset(root, with_video=False, with_gaze=False)
        item = ds[0]
        assert set(item) >= {"train", "target", "pci"}
        assert item["train"]["gps"].shape == (40, 2)
        assert item["target"]["gps"].shape == (30, 2)
        # GPS positions must match the ground-truth trajectory coarsely:
        # corrected CSV was written from the same trajectory
        traj = info["traj"]
        d0 = np.linalg.norm(item["train"]["gps"][0] - traj[0])
        assert d0 < 30.0, d0

    def test_full_multimodal_item(self, gem_root):
        root, _ = gem_root
        ds = make_dataset(root)
        item = ds[0]
        train = item["train"]
        assert train["gps"].shape == (40, 2)
        # videos at 5 fps, cropped 0.3-0.7 (64 -> 25 px wide), scaled 0.5
        assert train["left_video"].shape[0] == 40
        assert train["right_video"].shape[0] == 40
        assert train["front_video"].shape[0] == 40
        assert train["left_video"].dtype == np.float16
        assert train["left_video"].ndim == 4 and train["left_video"].shape[-1] == 3
        # gaze at 200 Hz over 8 s
        assert train["gaze"].shape == (1600, 2)
        assert 0.0 <= float(np.nanmin(train["gaze"])) <= 1.0
        tgt = item["target"]
        assert tgt["gps"].shape == (30, 2)
        assert tgt["left_video"].shape[0] == 30
        assert tgt["gaze"].shape == (1200, 2)

    def test_tchw_output_format(self, gem_root):
        root, _ = gem_root
        ds = make_dataset(root, output_format="TCHW")
        item = ds[0]
        assert item["train"]["left_video"].shape[1] == 3  # channel-first

    def test_sample_cache_hit(self, gem_root, tmp_path):
        root, _ = gem_root
        ds = make_dataset(root, use_cache=True, cache_dir=tmp_path)
        import time

        t0 = time.time()
        a = ds[0]
        cold = time.time() - t0
        ds._sample_cache.flush()  # async writes: make the warm read a true hit
        t0 = time.time()
        b = ds[0]
        warm = time.time() - t0
        np.testing.assert_array_equal(a["train"]["gps"], b["train"]["gps"])
        assert warm < cold

    def test_uint8_wire_format_matches_float16(self, gem_root):
        root, _ = gem_root
        ds_f16 = make_dataset(root)
        ds_u8 = make_dataset(root, video_dtype="uint8")
        a, b = ds_f16[0], ds_u8[0]
        for phase in ("train", "target"):
            for key in a[phase]:
                if "video" in key:
                    assert b[phase][key].dtype == np.uint8, key
                    # on-device conversion twin must be bit-identical to
                    # the host conversion (reference dataset.py:1522)
                    np.testing.assert_array_equal(
                        a[phase][key],
                        b[phase][key].astype(np.float16) / 255.0,
                        err_msg=key,
                    )
                else:
                    np.testing.assert_array_equal(
                        a[phase][key], b[phase][key], err_msg=key
                    )

    def test_memory_cache_serves_identical_and_bounds(self, gem_root):
        root, _ = gem_root
        ds = make_dataset(root, use_memory_cache=True)
        a = ds[0]
        assert 0 in ds._memory_cache and ds._memory_cache_bytes > 0
        b = ds[0]
        # served from RAM: arrays shared (no recompute), dicts shallow-
        # copied so consumers replacing keys can't corrupt the cache
        assert b is not a
        assert b["train"]["gps"] is a["train"]["gps"]
        # a zero budget stores nothing but still serves correctly
        ds0 = make_dataset(root, use_memory_cache=True,
                           max_memory_cache_size=0)
        item = ds0[0]
        assert not ds0._memory_cache
        np.testing.assert_array_equal(
            item["train"]["gps"], a["train"]["gps"]
        )

    def test_memory_cache_immune_to_consumer_mutation(self, gem_root):
        """A consumer mutating its batch must not corrupt the cached
        sample for later epochs: in-place array writes raise (read-only),
        and key replacement only touches the consumer's shallow copy."""
        root, _ = gem_root
        ds = make_dataset(root, use_memory_cache=True)
        a = ds[0]
        golden = {k: np.array(v) for k, v in a["train"].items()}
        # the MISS return must already be isolated: mutating its nesting
        # (key replacement, deletion) must not touch the stored sample
        a["train"]["gps"] = np.zeros_like(a["train"]["gps"])
        del a["train"]["left_video"]
        b = ds[0]
        for k, v in golden.items():
            np.testing.assert_array_equal(b["train"][k], v, err_msg=k)
        with pytest.raises(ValueError):
            b["train"]["gps"][:] = 0.0  # in-place write -> read-only error
        b["train"]["gps"] = np.zeros_like(b["train"]["gps"])  # key swap: ok
        c = ds[0]
        for k, v in golden.items():
            np.testing.assert_array_equal(c["train"][k], v, err_msg=k)

    def test_uint8_wire_format_busts_cache(self, gem_root, tmp_path):
        root, _ = gem_root
        ds_u8 = make_dataset(root, video_dtype="uint8", use_cache=True,
                             cache_dir=tmp_path)
        _ = ds_u8[0]
        ds_u8._sample_cache.flush()
        ds_f16 = make_dataset(root, use_cache=True, cache_dir=tmp_path)
        item = ds_f16[0]  # must NOT serve the uint8-mode entry
        assert item["train"]["left_video"].dtype == np.float16


class TestStitchedStream:
    """stitch_videos=True end-to-end (reference dataset.py:1548-1604):
    the per-frame stitch path must survive any footage — including frames
    where homography estimation fails — without raising mid-epoch."""

    def test_stitched_video_present(self, gem_root):
        root, _ = gem_root
        ds = make_dataset(root, stitch_videos=True)
        item = ds[0]
        sv = item["train"]["stitched_video"]
        lv = item["train"]["left_video"]
        assert sv.shape[0] == lv.shape[0]
        # canvas is double the left-view width (THWC layout)
        assert sv.shape[-2] == 2 * lv.shape[-2]
        assert sv.dtype == np.float16
        assert np.isfinite(np.asarray(sv, np.float32)).all()
        assert ds.stitcher.last_method is not None

    def test_estimation_failure_never_raises_mid_epoch(self, gem_root,
                                                       monkeypatch):
        from routeformer_tpu.io.stitcher import ImageStitcher

        def always_fail(self, left, right):
            raise ValueError("forced: frames carry too little structure")

        monkeypatch.setattr(ImageStitcher, "estimate", always_fail)
        root, _ = gem_root
        ds = make_dataset(root, stitch_videos=True, use_cache=False)
        item = ds[0]  # must NOT raise — degrades to side-by-side
        # first frame: side-by-side; periodic retries then fail into
        # reuse-cached (reusing that side-by-side placement)
        assert ds.stitcher.last_method in ("side-by-side", "reuse-cached")
        sv = item["train"]["stitched_video"]
        assert np.isfinite(np.asarray(sv, np.float32)).all()
