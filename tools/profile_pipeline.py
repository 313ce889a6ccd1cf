"""Cold input-pipeline profile: where a cache-cold GEMDataset pass spends
its time (decode / preprocess / gaze / resample / cache-write), single
thread, under cProfile.

The cold pipeline is the worst number in the repo (docs/PERF.md); this
tool attributes it. Runs on CPU (ROUTEFORMER_FORCE_CPU semantics applied
directly) so it can't disturb a TPU job — but don't run it concurrently
with a measurement, it saturates the host.

Usage: python tools/profile_pipeline.py [duration_s]
"""

import cProfile
import io
import pstats
import shutil
import sys
import tempfile
import time
from pathlib import Path

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

DURATION_S = float(sys.argv[1]) if len(sys.argv) > 1 else 60.0
FRAME_HW = (270, 480)


def main():
    from gem_fixture import build_gem_fixture

    from routeformer_tpu.io.dataset import GEMDataset

    workdir = Path(tempfile.mkdtemp(prefix="profile_pipeline_"))
    try:
        t0 = time.perf_counter()
        build_gem_fixture(workdir / "gem", duration_s=DURATION_S, hw=FRAME_HW)
        print(f"fixture: {time.perf_counter() - t0:.1f}s", flush=True)

        t0 = time.perf_counter()
        dataset = GEMDataset(
            root=workdir / "gem",
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
            use_cache=True,
            cache_dir=workdir / "cache",
        )
        print(
            f"dataset init: {time.perf_counter() - t0:.1f}s, "
            f"{len(dataset)} samples", flush=True
        )

        prof = cProfile.Profile()
        t0 = time.perf_counter()
        prof.enable()
        for i in range(len(dataset)):
            dataset[i]
        prof.disable()
        wall = time.perf_counter() - t0
        print(
            f"cold pass: {wall:.1f}s for {len(dataset)} samples "
            f"-> {len(dataset) / wall:.3f} samples/s (single thread)",
            flush=True,
        )

        s = io.StringIO()
        stats = pstats.Stats(prof, stream=s)
        stats.sort_stats("cumulative").print_stats(35)
        print(s.getvalue())

        s = io.StringIO()
        stats = pstats.Stats(prof, stream=s)
        stats.sort_stats("tottime").print_stats(25)
        print(s.getvalue())

        # warm pass (sample-cache hits) for the read-side split; drain the
        # async writer first so every warm read is a true hit
        if dataset._sample_cache is not None:
            dataset._sample_cache.flush()
        prof2 = cProfile.Profile()
        t0 = time.perf_counter()
        prof2.enable()
        for i in range(len(dataset)):
            dataset[i]
        prof2.disable()
        wall = time.perf_counter() - t0
        print(
            f"warm pass: {wall:.1f}s -> {len(dataset) / wall:.3f} samples/s "
            f"(single thread)", flush=True
        )
        s = io.StringIO()
        pstats.Stats(prof2, stream=s).sort_stats("tottime").print_stats(15)
        print(s.getvalue())
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
