"""Preflight validator for mounted GEM / DR(eye)VE dataset directories.

The real-data parity runbook (docs/USAGE.md, "Real-data parity runbook")
starts with this validator: it checks the directory layout, per-subject /
per-session required files, and (``--deep``) that the first recording of
each subject actually opens — video decodable, GPMF GPS track present,
pldata gaze readable — BEFORE a multi-hour index build or training run is
launched. Exit code 0 = ready; 1 = problems found (listed on stdout).

Layout expectations come from the dataset loaders themselves
(`routeformer_tpu/io/dataset.py:11-15`, reference dataset.py:98-252;
`routeformer_tpu/io/dataset_dreyeve.py:67-78`, reference
dataset_dreyeve.py:122-169):

GEM (ROUTEFORMER_DATASET_DIR):
  root/01GoPro/<subject>/{left|links}/GH0*.MP4
  root/01GoPro/<subject>/{right|rechts}/GH0*.MP4
  root/02EyeTracker/<subject>/{world.mp4 (world_001.mp4 for 009),
      world_timestamps.npy, gaze.pldata, gaze_timestamps.npy,
      info.invisible.json, info.player.json}
  root/03CorrectedGPS/<subject>/*.csv  (stem-matched to GoPro files)

DR(eye)VE (DREYEVE_DATASET_DIR):
  root/<NN>/{etg_samples.txt, speed_course_coord.txt,
      video_etg_frames/ + video_garmin_frames/  (or the source .avi files,
      from which ``DreyeveFileStructureSessionLibrary.build_frames()``
      explodes frames)}
  root/dr(eye)ve_design.txt  (session design table; optional but used for
      metadata joins)

Usage:
  python tools/validate_dataset.py gem [root] [--split train+val] [--deep]
  python tools/validate_dataset.py dreyeve [root] [--deep]

Defaults: root from ROUTEFORMER_DATASET_DIR / DREYEVE_DATASET_DIR.
"""

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


class Report:
    def __init__(self):
        self.problems = []
        self.notes = []

    def problem(self, msg: str):
        self.problems.append(msg)

    def note(self, msg: str):
        self.notes.append(msg)

    def finish(self, dataset: str, root) -> int:
        out = {
            "dataset": dataset,
            "root": str(root),
            "ok": not self.problems,
            "problems": self.problems,
            "notes": self.notes,
        }
        print(json.dumps(out, indent=2))
        return 0 if not self.problems else 1


def _gopro_videos(root: Path, subject: str, side: str):
    """MP4s under the english or german (links/rechts) side directory
    (dataset.py accepts both — io/dataset.py:299-306)."""
    alt = {"left": "links", "right": "rechts"}[side]
    vids = sorted((root / "01GoPro" / subject / side).glob("*.MP4"))
    vids += sorted((root / "01GoPro" / subject / alt).glob("*.MP4"))
    return vids


def validate_gem(root: Path, split: str, deep: bool) -> int:
    from routeformer_tpu.io.dataset import GEMDataset

    rep = Report()
    if not root.is_dir():
        rep.problem(f"root {root} is not a directory")
        return rep.finish("gem", root)
    for sub in ("01GoPro", "02EyeTracker", "03CorrectedGPS"):
        if not (root / sub).is_dir():
            rep.problem(f"missing top-level directory {sub}/")
    if rep.problems:
        return rep.finish("gem", root)

    subjects = (
        split.split(",")
        if split and split[0].isdigit()
        else GEMDataset.DATA_SPLIT[split or "train+val"]
    )
    rep.note(f"checking subjects {subjects}")

    for subject in subjects:
        left = _gopro_videos(root, subject, "left")
        right = _gopro_videos(root, subject, "right")
        if not left:
            rep.problem(f"{subject}: no left GoPro MP4s "
                        f"(01GoPro/{subject}/left/*.MP4)")
        if not right:
            rep.problem(f"{subject}: no right GoPro MP4s")
        if left and right and len(left) != len(right):
            rep.note(
                f"{subject}: {len(left)} left vs {len(right)} right MP4s "
                "(only stem-matched pairs are used)"
            )

        base = root / "02EyeTracker" / subject
        world = base / "world.mp4"
        world_ts = base / "world_timestamps.npy"
        if not world.exists() and subject == "009":
            # subject 009 names the world video differently
            # (io/dataset.py:340-342, reference :688-695)
            world = base / "world_001.mp4"
            world_ts = base / "world_001_timestamps.npy"
        for f in (
            world, world_ts,
            base / "gaze.pldata", base / "gaze_timestamps.npy",
            base / "info.invisible.json", base / "info.player.json",
        ):
            if not f.exists():
                rep.problem(f"{subject}: missing {f.relative_to(root)}")

        gps_dir = root / "03CorrectedGPS" / subject
        csvs = sorted(gps_dir.glob("*.csv"))
        if not csvs:
            rep.problem(f"{subject}: no corrected-GPS CSVs in "
                        f"03CorrectedGPS/{subject}/")
        elif left:
            matched = [
                c for c in csvs
                if any(c.stem.startswith(v.stem[:8]) for v in left + right)
            ]
            if not matched:
                rep.problem(
                    f"{subject}: none of the {len(csvs)} GPS CSVs "
                    "stem-match a GoPro MP4 (first 8 chars must agree)"
                )

        if deep and left and not rep.problems:
            _deep_check_gem(rep, root, subject, left[0], base)

    return rep.finish("gem", root)


def _deep_check_gem(rep: Report, root: Path, subject: str, mp4: Path,
                    eyetracker_base: Path):
    """Open the first recording of the subject for real."""
    import cv2
    import numpy as np

    cap = cv2.VideoCapture(str(mp4))
    try:
        ok, _ = cap.read()
        fps = cap.get(cv2.CAP_PROP_FPS)
        if not ok:
            rep.problem(f"{subject}: cv2 cannot decode {mp4.name}")
        elif abs(fps - 30.0) > 1.0:
            rep.note(f"{subject}: {mp4.name} fps={fps:.2f} (expected ~30)")
    finally:
        cap.release()

    try:
        from routeformer_tpu.io.gpmf import build_gps_points
        from routeformer_tpu.io.mp4 import MP4

        demux = MP4(mp4)
        track = demux.gpmd_track()
        if track is None:
            rep.problem(f"{subject}: {mp4.name} has no GPMF track")
        else:
            raw = demux.read_track(track, 0, 10)
            points, _ = build_gps_points(raw)
            if not points:
                rep.problem(f"{subject}: {mp4.name} has no GPMF GPS points")
            else:
                rep.note(
                    f"{subject}: {mp4.name} GPMF GPS points={len(points)}"
                )
    except Exception as e:  # noqa: BLE001 — report, don't crash preflight
        rep.problem(f"{subject}: GPMF extraction failed on {mp4.name}: {e}")

    try:
        from routeformer_tpu.io.file_methods import load_pldata_file

        data = load_pldata_file(eyetracker_base, "gaze")
        if not len(data.data):
            rep.problem(f"{subject}: gaze.pldata contains no records")
        ts = np.load(eyetracker_base / "gaze_timestamps.npy")
        if len(ts) != len(data.data):
            rep.note(
                f"{subject}: gaze timestamps ({len(ts)}) != pldata records "
                f"({len(data.data)})"
            )
    except Exception as e:  # noqa: BLE001
        rep.problem(f"{subject}: gaze.pldata unreadable: {e}")


def validate_dreyeve(root: Path, deep: bool) -> int:
    rep = Report()
    if not root.is_dir():
        rep.problem(f"root {root} is not a directory")
        return rep.finish("dreyeve", root)

    sessions = sorted(
        int(d.name) for d in root.iterdir() if d.is_dir() and d.name.isdigit()
    )
    if not sessions:
        rep.problem("no numeric session directories (root/<NN>/) found")
        return rep.finish("dreyeve", root)
    rep.note(f"{len(sessions)} sessions: {sessions[0]:02d}..{sessions[-1]:02d}")
    if not (root / "dr(eye)ve_design.txt").exists():
        rep.note("dr(eye)ve_design.txt missing (metadata joins disabled)")

    for sid in sessions:
        base = root / f"{sid:02d}"
        for f in ("etg_samples.txt", "speed_course_coord.txt"):
            if not (base / f).exists():
                rep.problem(f"{sid:02d}: missing {f}")
        frames = (base / "video_garmin_frames").is_dir() and (
            base / "video_etg_frames"
        ).is_dir()
        avis = (base / "video_garmin.avi").exists() and (
            base / "video_etg.avi"
        ).exists()
        if not frames and not avis:
            rep.problem(
                f"{sid:02d}: neither exploded frame dirs nor source .avi "
                "files present"
            )
        elif not frames:
            rep.note(
                f"{sid:02d}: only .avi present — run "
                "DreyeveFileStructureSessionLibrary(root).build_frames() "
                "first (one-time explode)"
            )
        if deep and frames:
            first = base / "video_garmin_frames" / "000000.jpg"
            if not first.exists():
                rep.problem(f"{sid:02d}: frame dir present but {first.name} "
                            "missing (frames must be 0-indexed %06d.jpg)")
    return rep.finish("dreyeve", root)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("dataset", choices=["gem", "dreyeve"])
    ap.add_argument("root", nargs="?", default=None)
    ap.add_argument("--split", default="train+val",
                    help="GEM: named split or comma-list of subjects")
    ap.add_argument("--deep", action="store_true",
                    help="open first recording per subject (decode, GPMF, "
                         "pldata)")
    args = ap.parse_args(argv)

    root = args.root or os.getenv(
        "ROUTEFORMER_DATASET_DIR" if args.dataset == "gem"
        else "DREYEVE_DATASET_DIR"
    )
    if not root:
        print(json.dumps({
            "ok": False,
            "problems": ["no root given and the dataset dir env var "
                         "is unset"],
        }))
        return 1
    root = Path(root)
    if args.dataset == "gem":
        return validate_gem(root, args.split, args.deep)
    return validate_dreyeve(root, args.deep)


if __name__ == "__main__":
    raise SystemExit(main())
