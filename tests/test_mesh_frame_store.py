"""Mesh-sharded transfer tier (io/frame_store.py MeshFrameStoreRouter).

Round-3 VERDICT weak #4: the frame-store H2D dedup existed only
single-device; mesh runs silently fell back to full transfers. The sharded
tier keeps per-device rings (one per (stream, data-shard, model-replica))
and assembles the global batch-sharded array from per-device gathers —
byte-identical to a plain sharded device_put, shipping only novel frames.
Runs on the virtual 8-device CPU mesh (conftest).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from routeformer_tpu.io.frame_store import MeshFrameStoreRouter
from routeformer_tpu.parallel import make_mesh
from routeformer_tpu.parallel.mesh import DATA_AXIS


def windows_batch(rng, b=8, t=4, hw=(6, 8), n_unique=12, seed_frames=None):
    """Overlapping-window style batch built from a small pool of unique
    frames (adjacent rows share most frames, like GEM's 2 s steps)."""
    pool = (
        seed_frames
        if seed_frames is not None
        else rng.integers(0, 255, size=(n_unique, *hw, 3), dtype=np.uint8)
    )
    idx = (np.arange(b)[:, None] + np.arange(t)[None, :]) % pool.shape[0]
    return pool[idx], pool


class TestMeshFrameStore:
    def test_bit_identical_to_plain_device_put(self, rng):
        mesh = make_mesh(n_data=4, n_model=1)
        router = MeshFrameStoreRouter(mesh, budget_bytes=64e6)
        windows, _ = windows_batch(rng)
        got = router.put("left_video", windows)
        want = jax.device_put(
            windows, NamedSharding(mesh, P(DATA_AXIS, None, None, None, None))
        )
        assert got.sharding.is_equivalent_to(want.sharding, windows.ndim)
        np.testing.assert_array_equal(np.asarray(got), windows)

    def test_second_epoch_ships_nothing(self, rng):
        mesh = make_mesh(n_data=4, n_model=1)
        router = MeshFrameStoreRouter(mesh, budget_bytes=64e6)
        windows, _ = windows_batch(rng)
        router.put("left_video", windows)
        first = router.stats()["left_video" + str(windows.shape[2:])]
        out = router.put("left_video", windows)  # epoch 2: all resident
        second = router.stats()["left_video" + str(windows.shape[2:])]
        assert second["shipped"] == first["shipped"], "warm epoch re-shipped"
        np.testing.assert_array_equal(np.asarray(out), windows)

    def test_overlapping_batches_dedup_within_shard(self, rng):
        mesh = make_mesh(n_data=2, n_model=1)
        router = MeshFrameStoreRouter(mesh, budget_bytes=64e6)
        pool = rng.integers(0, 255, size=(10, 6, 8, 3), dtype=np.uint8)
        # batch 2: same pool shifted one frame -> mostly resident already
        w1, _ = windows_batch(rng, b=4, t=4, seed_frames=pool)
        w2 = pool[(np.arange(4)[:, None] + np.arange(4)[None, :] + 1) % 10]
        router.put("v", w1)
        s1 = router.stats()["v" + str(w1.shape[2:])]["shipped"]
        out = router.put("v", w2)
        s2 = router.stats()["v" + str(w1.shape[2:])]["shipped"]
        np.testing.assert_array_equal(np.asarray(out), w2)
        # each shard ships at most the truly-novel tail frames
        assert s2 - s1 <= 4, f"shipped {s2 - s1} frames for a 1-step shift"

    def test_model_axis_replication(self, rng):
        """(data=4, model=2): the batch shard must be present on both
        model replicas and values must round-trip exactly."""
        mesh = make_mesh(n_data=4, n_model=2)
        router = MeshFrameStoreRouter(mesh, budget_bytes=64e6)
        windows, _ = windows_batch(rng)
        got = router.put("left_video", windows)
        assert len(got.sharding.device_set) == 8
        np.testing.assert_array_equal(np.asarray(got), windows)
        # a jitted mean over the mesh consumes it without resharding
        out = jax.jit(
            lambda x: x.astype(jnp.float32).mean(),
            in_shardings=(got.sharding,),
        )(got)
        np.testing.assert_allclose(
            float(out), windows.astype(np.float32).mean(), rtol=1e-6
        )

    def test_indivisible_batch_rejected(self, rng):
        mesh = make_mesh(n_data=4, n_model=1)
        router = MeshFrameStoreRouter(mesh, budget_bytes=64e6)
        windows, _ = windows_batch(rng, b=6)
        with pytest.raises(ValueError, match="divisible"):
            router.put("left_video", windows)


class TestMeshLoaderIntegration:
    def _dataset(self, n=16):
        class Ds:
            def __len__(self):
                return n

            def __getitem__(self, i):
                rng = np.random.default_rng(i % 4)  # repeats across idx
                return {
                    "train": {
                        "left_video": rng.integers(
                            0, 255, size=(3, 6, 8, 3), dtype=np.uint8
                        ),
                        "gps": np.full((5, 2), float(i), np.float32),
                    },
                    "pci": np.float32(i),
                }

        return Ds()

    def test_loader_produces_sharded_batches(self):
        from routeformer_tpu.io.loader import DataLoader, default_collate

        mesh = make_mesh(n_data=4, n_model=1)
        loader = DataLoader(
            self._dataset(), batch_size=8, shuffle=False, num_threads=2,
            to_device=True, h2d_dedup=True, mesh=mesh,
        )
        loader.set_epoch(0)
        batches = list(loader)
        assert len(batches) == 2
        batch = batches[0]
        video = batch["train"]["left_video"]
        assert isinstance(video, jax.Array) and len(video.sharding.device_set) == 4
        # byte-identical to host collation of the SAME batch composition
        # (shard-stable ordering interleaves per-shard pools: batch 0 is
        # [0,4, 1,5, 2,6, 3,7], not [0..7])
        order = [int(i) for i in loader._indices()[:8]]
        host = default_collate([self._dataset()[i] for i in order])
        np.testing.assert_array_equal(
            np.asarray(video), host["train"]["left_video"]
        )
        np.testing.assert_array_equal(
            np.asarray(batch["train"]["gps"]), host["train"]["gps"]
        )
        assert isinstance(batch["pci"], jax.Array)
        # epoch 2 on the same data ships nothing new
        before = loader._frame_router.stats()
        loader.set_epoch(1)
        _ = list(loader)
        after = loader._frame_router.stats()
        for k in before:
            assert after[k]["shipped"] == before[k]["shipped"]

    def test_shuffled_epochs_stay_shard_stable(self):
        """Shard-stable batch composition (DistributedSampler semantics):
        a sample's data shard never changes across shuffled epochs, so the
        per-device rings stay disjoint — epoch 2+ ships ZERO frames even
        with shuffle=True."""
        from routeformer_tpu.io.loader import DataLoader

        mesh = make_mesh(n_data=4, n_model=1)
        loader = DataLoader(
            self._dataset(), batch_size=8, shuffle=True, num_threads=2,
            to_device=True, h2d_dedup=True, mesh=mesh,
        )
        loader.set_epoch(0)
        batches0 = list(loader)
        shipped_cold = {
            k: v["shipped"] for k, v in loader._frame_router.stats().items()
        }
        for epoch in (1, 2):
            loader.set_epoch(epoch)
            got = list(loader)
            assert len(got) == len(batches0)
        shipped_warm = {
            k: v["shipped"] for k, v in loader._frame_router.stats().items()
        }
        assert shipped_warm == shipped_cold, (
            f"shuffled warm epochs re-shipped: {shipped_cold} -> "
            f"{shipped_warm}"
        )
        # shuffle actually shuffles: epoch orders differ
        loader2 = DataLoader(
            self._dataset(), batch_size=8, shuffle=True, num_threads=2,
            to_device=True, h2d_dedup=True, mesh=mesh,
        )
        loader2.set_epoch(0)
        o0 = loader2._indices().tolist()
        loader2.set_epoch(1)
        o1 = loader2._indices().tolist()
        assert o0 != o1 and sorted(o0) == sorted(o1)

    def test_trainer_place_batch_is_noop_on_global_arrays(self, rng):
        """trainer._place_batch must pass loader-sharded arrays through
        without resharding or host round-trips."""
        from routeformer_tpu.train.trainer import ParallelTrainer

        mesh = make_mesh(n_data=4, n_model=1)
        router = MeshFrameStoreRouter(mesh, budget_bytes=64e6)
        windows, _ = windows_batch(rng)
        placed = router.put("left_video", windows)

        class T:  # only the bits _place_batch touches
            pass

        t = T()
        t.mesh = mesh
        out = ParallelTrainer._place_batch(t, {"left_video": placed})
        assert out["left_video"].sharding.is_equivalent_to(
            placed.sharding, windows.ndim
        )
        np.testing.assert_array_equal(np.asarray(out["left_video"]), windows)


class TestMeshFeatureMemo:
    """Mesh twin of the device feature memo: per-shard memos must produce
    features byte-identical to the single-device precomputer, as global
    P('data')-sharded arrays, and encode nothing on warm batches."""

    def _model(self, tmp_path):
        from flax import nnx

        from routeformer_tpu.models import RouteformerConfig
        from routeformer_tpu.models.gps_backbone import GPSBackboneConfig
        from routeformer_tpu.models.routeformer import Routeformer
        from routeformer_tpu.models.video_backbone import (
            SwinV2,
            TimmBackboneConfig,
        )

        cfg = RouteformerConfig(
            gps_backbone_config=GPSBackboneConfig(
                seq_len=20, label_len=20, pred_len=10, d_model=16, n_heads=4,
                e_layers=1, d_layers=1, d_ff=32, factor=4, dropout=0.0,
                activation="relu",
            ),
            video_backbone_config=TimmBackboneConfig(
                model_type="vit_tiny_test", cache_enabled=True,
                cache_dir=str(tmp_path), cache_dtype="float32",
                compute_dtype="float32",
            ),
            with_video=True, with_gaze=False,
            discount_factor={0: 0.97}, epsilon=1.0,
            encoder_hidden_size=16, encoder_heads=4, encoder_layers=1,
            encoder_d_ff=32, cross_modal_decoder_heads=4,
            cross_modal_decoder_layers=1, image_embedding_size=16,
            output_fps=5, video_fps=1, gaze_fps=1,
        )
        model = Routeformer(
            cfg, video_backbone=SwinV2,
            rngs=nnx.Rngs(0, dropout=1),
        )
        model.eval()
        return model

    def test_matches_single_device_memo(self, rng, tmp_path):
        from routeformer_tpu.models.video_backbone.cache import (
            DeviceVideoFeaturePrecomputer,
            MeshDeviceVideoFeaturePrecomputer,
        )

        mesh = make_mesh(n_data=4, n_model=1)
        model = self._model(tmp_path)
        batch = {
            "gps": rng.normal(size=(8, 20, 2)).astype(np.float32),
            "left_video": rng.uniform(size=(8, 20, 24, 32, 3)).astype(np.float32),
            "right_video": rng.uniform(size=(8, 20, 24, 32, 3)).astype(np.float32),
        }
        single = DeviceVideoFeaturePrecomputer(model)
        meshpre = MeshDeviceVideoFeaturePrecomputer(model, mesh)

        want = single(dict(batch))
        got = meshpre(dict(batch))
        assert set(want) == set(got)
        for k in got:
            if not k.endswith("_features"):
                continue
            assert len(got[k].sharding.device_set) == 4, k
            np.testing.assert_allclose(
                np.asarray(got[k]), np.asarray(want[k]), atol=1e-5, err_msg=k
            )
        # warm pass: zero encodes, identical output
        encoded = meshpre.stats()["encoded"]
        assert encoded > 0
        got2 = meshpre(dict(batch))
        assert meshpre.stats()["encoded"] == encoded
        np.testing.assert_array_equal(
            np.asarray(got2["left_video_features"]),
            np.asarray(got["left_video_features"]),
        )

    def test_rejects_tensor_parallel_mesh(self, tmp_path):
        from routeformer_tpu.models.video_backbone.cache import (
            MeshDeviceVideoFeaturePrecomputer,
        )

        mesh = make_mesh(n_data=4, n_model=2)
        with pytest.raises(ValueError, match="data-parallel"):
            MeshDeviceVideoFeaturePrecomputer(self._model(tmp_path), mesh)
