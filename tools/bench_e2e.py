"""End-to-end throughput: byte-real recording -> GEMDataset -> train step.

The north-star metric includes the input pipeline (the reference's hot loop
is the dataset ``__getitem__`` — video decode + undistort + windowing,
reference ``routeformer/io/dataset.py:1045-1136``), which ``bench.py``'s
synthetic-array step benchmark never exercises. This tool:

1. synthesizes a multi-clip byte-real GEM recording (MP4 with an injected
   GPMF GPS track, pldata gaze — ``tests/gem_fixture.py``), 270x480 @30fps
   so that 0.2-scaling lands on the 54x96 step geometry;
2. runs ``GEMDataset`` -> prefetching ``DataLoader`` -> flagship train step
   with host decode overlapping device compute;
3. reports cold (decode in the loop, sample cache filling) and warm (sample
   cache hits) end-to-end clips/sec plus the pipeline/step split, so the
   binding side is explicit.

Usage: python tools/bench_e2e.py  (TPU; ~first compile is slow)
"""

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

import jax  # noqa: E402

DEBUG = os.getenv("BENCH_E2E_DEBUG", "0") == "1"
if DEBUG:  # CPU smoke: tiny model, short recording
    jax.config.update("jax_platforms", "cpu")
else:
    # TPU only: the cache holds AOT results from the remote-compile host,
    # whose CPU features differ from this machine — loading them in a CPU
    # process SIGSEGVs (cpu_aot_loader feature mismatch).
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# Batch 16 = bench.py's step geometry, so step_only here matches the
# official cold number directly. (Also sidesteps a batch-8-specific TPU
# worker fault under the full-step schedule — see docs/PERF.md round 3;
# isolated-kernel probes pass at every batch-8 shape.)
BATCH = 4 if DEBUG else 16
DURATION_S = 60.0 if DEBUG else 240.0
FRAME_HW = (270, 480)  # 0.2 scaling -> (54, 96), the bench.py step geometry


def _emit(obj):
    """Progressive partial-result JSON line: the parent orchestrator
    (bench.py) merges these as they arrive, so a timeout mid-phase still
    lands the completed milestones in the official artifact."""
    print(json.dumps(obj), flush=True)


def build_recording(root: Path):
    from gem_fixture import build_gem_fixture

    t0 = time.perf_counter()
    build_gem_fixture(root, duration_s=DURATION_S, hw=FRAME_HW)
    return time.perf_counter() - t0


def make_dataset(root: Path, cache_dir):
    from routeformer_tpu.io.dataset import GEMDataset

    return GEMDataset(
        root=root,
        split=["001"],
        input_length=8,
        target_length=6,
        step_size=2,
        min_pci=None,
        output_fps=5,
        crop_videos=False,
        undistort_videos=False,
        gopro_scaling_factor=0.2,
        front_scaling_factor=0.2,
        with_video=True,
        with_gaze=True,
        use_cache=cache_dir is not None,
        cache_dir=cache_dir,
        # uint8 wire format (the driver default): halves the sample-cache
        # bytes and the tunnel H2D payload; the step dequantizes on-device
        video_dtype=os.getenv("VIDEO_DTYPE", "uint8"),
        # in-RAM tier over the zstd cache: warm epochs skip decompression
        # entirely (the pipeline_warm wall is zstd+pickle per the cold-
        # pipeline profile) — bounded, fits the bench fixture trivially
        use_memory_cache=os.getenv("USE_MEMORY_CACHE", "1") == "1",
    )


def measure() -> dict:
    """Run the end-to-end benchmark; returns the metrics dict.

    Importable from ``bench.py`` so the driver-captured artifact carries the
    north-star end-to-end numbers (round-2 VERDICT #3)."""
    import jax.numpy as jnp

    from __graft_entry__ import _build_model, _flagship_config
    from routeformer_tpu.io.loader import DataLoader
    from routeformer_tpu.optimizers import build_optimizer
    from routeformer_tpu.parallel import make_train_step
    from routeformer_tpu.train import TrainingLosses, routeformer_training_loss

    workdir = Path(tempfile.mkdtemp(prefix="bench_e2e_"))
    try:
        build_s = build_recording(workdir / "gem")
        dataset = make_dataset(workdir / "gem", workdir / "cache")
        loader = DataLoader(
            dataset, batch_size=BATCH, shuffle=False, num_threads=8,
            prefetch=2, to_device=True,
            # device frame store: overlapping windows + repeat epochs stop
            # re-shipping frames over the ~16 MB/s tunnel
            # (io/frame_store.py); batches are bit-identical either way
            h2d_dedup=os.getenv("H2D_DEDUP", "1") == "1",
        )
        n_batches = len(loader)
        assert n_batches >= 3, f"fixture too short: {n_batches} batches"

        if DEBUG:
            # tiny dims, dataset geometry (40-in/30-out @5 Hz)
            from routeformer_tpu.models.gps_backbone import GPSBackboneConfig

            cfg = _flagship_config(tiny=True).override(
                gps_backbone_config=GPSBackboneConfig(
                    seq_len=40, label_len=40, pred_len=30,
                    d_model=32, n_heads=4, e_layers=2, d_layers=1, d_ff=64,
                    factor=2, dropout=0.0, activation="relu", distil=True,
                ),
                output_fps=5, video_fps=1, gaze_fps=1,
            )
        else:
            cfg = _flagship_config()
        model = _build_model(cfg)
        tx = build_optimizer(
            learning_rate=1e-5, weight_decay=1e-4, video_backbone_lr=1e-6,
            warmup_epochs=2, max_epochs=200, gradient_clip_val=2.5,
        )
        losses = TrainingLosses.from_config(cfg)

        def loss_fn(m, inp, tgt, epoch):
            return routeformer_training_loss(m, inp, tgt, epoch, losses)

        # The steady phase's feature memo deep-copies the frozen backbone
        # state; build it BEFORE any step runs — the train step donates the
        # live model's buffers, after which nnx.split(model) reads deleted
        # arrays.
        steady_pre = None
        if os.getenv("E2E_STEADY", "1") == "1":
            from routeformer_tpu.models.video_backbone.cache import (
                DeviceVideoFeaturePrecomputer,
            )

            steady_pre = DeviceVideoFeaturePrecomputer(model)
        step_fn, params, state, opt_state = make_train_step(model, tx, loss_fn)
        epoch_idx = jnp.asarray(0)

        def to_device(batch):
            inp = {k: jnp.asarray(v) for k, v in batch["train"].items()}
            tgt = {k: jnp.asarray(v) for k, v in batch["target"].items()}
            return inp, tgt

        def run_epoch(epoch):
            """Returns (wall_s, n_clips, host_wait_s)."""
            nonlocal params, state, opt_state
            loader.set_epoch(epoch)
            t0 = time.perf_counter()
            host_wait = 0.0
            n = 0
            metrics = None
            for batch in loader:
                tw = time.perf_counter()
                inp, tgt = to_device(batch)
                host_wait += time.perf_counter() - tw
                params, state, opt_state, metrics = step_fn(
                    params, state, opt_state, inp, tgt, epoch_idx
                )
                n += inp["gps"].shape[0]
            jax.block_until_ready(metrics)
            return time.perf_counter() - t0, n, host_wait

        # pipeline-only rate (decode, cold cache): first epoch without steps
        t0 = time.perf_counter()
        n_clips = 0
        first_batch = None
        for batch in loader:
            if first_batch is None:
                first_batch = batch
            n_clips += batch["train"]["gps"].shape[0]
        pipeline_cold_s = time.perf_counter() - t0
        pipeline_cold = n_clips / pipeline_cold_s
        _emit({"pipeline_cold_clips_per_sec": round(pipeline_cold, 3)})
        if dataset._sample_cache is not None:
            dataset._sample_cache.flush()  # drain async writes: warm = true hits

        # warm pipeline (sample-cache hits)
        t0 = time.perf_counter()
        for batch in loader:
            pass
        pipeline_warm = n_clips / (time.perf_counter() - t0)
        _emit({"pipeline_warm_clips_per_sec": round(pipeline_warm, 3)})

        # compile + step-only rate on a resident batch
        inp, tgt = to_device(first_batch)
        for _ in range(2):
            params, state, opt_state, metrics = step_fn(
                params, state, opt_state, inp, tgt, epoch_idx
            )
        jax.block_until_ready(metrics)
        t0 = time.perf_counter()
        for _ in range(3):
            params, state, opt_state, metrics = step_fn(
                params, state, opt_state, inp, tgt, epoch_idx
            )
        jax.block_until_ready(metrics)
        step_only = 3 * BATCH / (time.perf_counter() - t0)
        _emit({"step_only_clips_per_sec": round(step_only, 3)})

        # overlapped end-to-end epochs (warm cache)
        wall, n, host_wait = run_epoch(2)
        e2e_warm = n / wall
        _emit({"e2e_warm_value": round(e2e_warm, 3)})

        # steady-state e2e: device feature memo
        # (USE_EMBEDDING_CACHE=device) — warm batches move zero video
        # bytes AND skip the backbone; the production epoch-2+ path
        e2e_steady = None
        steady_detail = None
        try:
            # bound the phase: on a degraded tunnel its one-time compiles
            # can exceed the parent bench's subprocess budget — the alarm
            # surfaces here and the warm/cold numbers still ship
            import signal

            def _timed_out(signum, frame):
                raise TimeoutError("steady phase exceeded E2E_STEADY_TIMEOUT")

            budget = int(os.getenv("E2E_STEADY_TIMEOUT", "3600"))
            old_handler = signal.signal(signal.SIGALRM, _timed_out)
            signal.alarm(budget)
            try:
                e2e_steady, steady_detail = _steady_phase(
                    dataset, steady_pre, step_fn, params, state, opt_state,
                    epoch_idx,
                )
            finally:
                signal.alarm(0)
                signal.signal(signal.SIGALRM, old_handler)
        except Exception as e:  # noqa: BLE001 — optional phase must not
            # sink the warm/cold numbers in the official artifact
            print(f"steady phase failed: {e}", file=sys.stderr)

        assert np.isfinite(float(metrics["total_loss"]))
        dedup_stats = (
            loader._frame_router.stats() if loader._frame_router else None
        )
        return {
            "metric": "flagship_e2e_clips_per_sec_per_chip",
            "e2e_warm_value": round(e2e_warm, 3),
            "pipeline_cold_clips_per_sec": round(pipeline_cold, 3),
            "pipeline_warm_clips_per_sec": round(pipeline_warm, 3),
            "step_only_clips_per_sec": round(step_only, 3),
            "host_wait_s_per_epoch": round(host_wait, 3),
            "binding_side": (
                "pipeline" if pipeline_warm < step_only else "step"
            ),
            "n_clips_per_epoch": n,
            "fixture_build_s": round(build_s, 1),
            "frame_hw": list(FRAME_HW),
            "h2d_dedup": dedup_stats,
            "e2e_steady_value": (
                round(e2e_steady, 3) if e2e_steady is not None else None
            ),
            "e2e_steady_detail": steady_detail,
        }
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def _steady_phase(dataset, pre, step_fn, params, state, opt_state, epoch_idx):
    """Steady-state e2e: device feature memo (USE_EMBEDDING_CACHE=device).

    Warm batches move zero video bytes AND skip the backbone — the
    production epoch-2+ path. ``pre`` is the DeviceVideoFeaturePrecomputer
    built before the first (donating) step. Returns (clips_per_sec,
    detail) or (None, None) when disabled."""
    import jax.numpy as jnp

    from routeformer_tpu.io.loader import DataLoader

    if pre is None:
        return None, None

    # Host-side ms/step breakdown accumulators (VERDICT round-4 #3: what
    # remains between e2e_steady and the resident-batch steady number).
    host_ms = {"memo_lookup": 0.0, "device_put": 0.0, "loader_wait": 0.0,
               "steps": 0}

    def memo_place(batch):
        """Feature-memo lookup + device placement. In the pipelined mode it
        runs inside the loader's producer stage (producers=2) so host work
        for batch n+1 overlaps the consumer's step on batch n; in the
        serial mode the consumer applies it inline and overlap comes only
        from jax async dispatch. Both are measured below (A/B in one
        process, same compiled step): the first pipelined on-chip run read
        60.96 vs the serial path's official 95.8 under a flapping service,
        so neither mode is assumed faster. (On a 1-CPU host the pipelined
        mode CANNOT win: producer threads and the dispatch loop share one
        core — measured serial 120.7 vs pipelined 113.6, round 5.)"""
        out = dict(batch)
        for phase in ("train", "target"):
            t0 = time.perf_counter()
            feats = pre(batch[phase])
            host_ms["memo_lookup"] += time.perf_counter() - t0
            t0 = time.perf_counter()
            out[phase] = {k: jnp.asarray(v) for k, v in feats.items()}
            host_ms["device_put"] += time.perf_counter() - t0
        return out

    host_loader = DataLoader(
        dataset, batch_size=BATCH, shuffle=False, num_threads=8, prefetch=3,
    )

    def steady_epoch(epoch, pipelined):
        nonlocal params, state, opt_state
        if pipelined:
            host_loader.set_batch_stage(memo_place, producers=2)
        else:
            host_loader.set_batch_stage(None)
        host_loader.set_epoch(epoch)
        t0 = time.perf_counter()
        n = 0
        m = None
        it = iter(host_loader)
        while True:
            tw = time.perf_counter()
            batch = next(it, None)
            host_ms["loader_wait"] += time.perf_counter() - tw
            if batch is None:
                break
            if not pipelined:
                batch = memo_place(batch)
            inp, tgt = batch["train"], batch["target"]
            params, state, opt_state, m = step_fn(
                params, state, opt_state, inp, tgt, epoch_idx
            )
            n += int(inp["gps"].shape[0])
            host_ms["steps"] += 1
        jax.block_until_ready(m)
        return time.perf_counter() - t0, n, m

    # epoch 3: encode every frame once + compile the backbone-free step
    # program (one-time costs, both cached)
    load_before = os.getloadavg()[0]
    warm_wall, n, _ = steady_epoch(3, pipelined=False)
    # the encode epoch runs the backbone inside pre() — exclude its cost
    # from the warm-lookup breakdown
    host_ms.update(memo_lookup=0.0, device_put=0.0, loader_wait=0.0,
                   steps=0)
    # best-of-two per mode: the steady epoch is ~2 s, so per-epoch service
    # jitter dominates single measurements
    serial = []
    pipelined = []
    for epoch in (4, 5):
        wall, n, m = steady_epoch(epoch, pipelined=False)
        serial.append(n / wall)
    # provisional emit: a driver-window kill during the pipelined A/B leg
    # still lands a steady number in the official artifact
    _emit({"e2e_steady_value": round(max(serial), 3)})
    for epoch in (6, 7):
        wall, n, m = steady_epoch(epoch, pipelined=True)
        pipelined.append(n / wall)
    assert np.isfinite(float(m["total_loss"]))
    best_serial = max(serial)
    best_pipelined = max(pipelined)
    return max(best_serial, best_pipelined), {
        "memo": pre.stats(),
        "encode_epoch_s": round(warm_wall, 2),
        "serial_clips_per_sec": [round(v, 2) for v in serial],
        "pipelined_clips_per_sec": [round(v, 2) for v in pipelined],
        "loader_mode": (
            "pipelined" if best_pipelined > best_serial else "serial"
        ),
        # 1-min loadavg bracketing the steady block (1-CPU host: any
        # concurrent process corrupts these dispatch-bound timings)
        "host_load": [round(load_before, 3), round(os.getloadavg()[0], 3)],
        # host-side ms/step split across ALL steady epochs (serial epochs
        # attribute memo/put inline; the remainder to the step number is
        # jitted dispatch+device time)
        "host_ms_per_step": {
            k: round(v / max(host_ms["steps"], 1) * 1e3, 2)
            for k, v in host_ms.items() if k != "steps"
        },
    }


def main():
    print(json.dumps(measure()))


if __name__ == "__main__":
    main()
