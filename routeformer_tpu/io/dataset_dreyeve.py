"""DR(eye)VE dataset.

Capability parity with reference ``routeformer/io/dataset_dreyeve.py``
(1227 lines): sessions of garmin + eye-tracking-glasses (ETG) recordings
pre-exploded to JPEG frames, ``etg_samples.txt`` gaze logs joined to
``speed_course_coord.txt`` GPS on the garmin frame id, PCI precompute with a
versioned JSON cache, optional PCI-balanced binned sampling, zstd item
cache and a size-bounded in-memory cache.

Preserved reference behaviors:

- gaze grouped per garmin frame keeping the first two readings (rows with
  fewer duplicated — :596-612), X/1080 Y/720 normalization and the
  (T, 2, 2) -> (2T, 2) flattening (:1036-1043);
- speed/course linear interpolation, lat/lon pchip 'inside' interpolation,
  web-mercator conversion before the join (:623-652);
- PCI computed over full-rate (30 Hz) windows with ``frequency=output_fps``
  (:843-886 — quirky but replicated);
- left-video crop of 15% top / 35% bottom (:1219-1227);
- PCI-balanced split bins (:506-543).

TPU-first: the per-window Python Fréchet loop becomes one vectorized
``estimate_pci_batch`` call; frames load through a thread pool; output
layout is THWC by default ("TCHW" available).
"""

import json
import random
import sys
from multiprocessing.pool import ThreadPool
from os import cpu_count
from pathlib import Path
from typing import Dict, List, Literal, Optional, Union

import numpy as np

from routeformer_tpu.io.cache import SampleCache
from routeformer_tpu.io.dataset import _copy_sample, _freeze_sample
from routeformer_tpu.io.resample import convert_gps_coordinates
from routeformer_tpu.score.pci import estimate_pci_batch
from routeformer_tpu.utils.logging import get_logger

logger = get_logger("io.dataset_dreyeve")


class DreyeveDesignScene:
    DOWNTOWN = "Downtown"
    HIGHWAY = "Highway"
    COUNTRYSIDE = "Countryside"


class DreyeveDesignWeather:
    SUNNY = "Sunny"
    CLOUDY = "Cloudy"
    RAINY = "Rainy"


class DreyeveDesignTime:
    MORNING = "Morning"
    EVENING = "Evening"
    NIGHT = "Night"


class DreyeveFileStructureSession:
    """Per-session paths (reference dataset_dreyeve.py:173-225)."""

    def __init__(self, root: Union[str, Path], session_id: int):
        self.session_id = session_id
        base = Path(root).resolve() / f"{session_id:02d}"
        self.mean_frame_fpath = base / "mean_frame.png"
        self.mean_gt_fpath = base / "mean_gt.png"
        self.etg_samples_fpath = base / "etg_samples.txt"
        self.speed_course_fpath = base / "speed_course_coord.txt"
        self.video_etg_fpath = base / "video_etg.avi"
        self.video_garmin_fpath = base / "video_garmin.avi"
        self.video_etg_frames_fpath = base / "video_etg_frames" / "{:06d}.jpg"
        self.video_garmin_frames_fpath = base / "video_garmin_frames" / "{:06d}.jpg"

    def build_frames(self):
        """Explode videos to jpeg frames (reference to_frames :158-169),
        via cv2 (PyAV is unavailable here)."""
        import cv2

        for video, pattern in (
            (self.video_etg_fpath, self.video_etg_frames_fpath),
            (self.video_garmin_fpath, self.video_garmin_frames_fpath),
        ):
            if not video.exists():
                continue
            pattern.parent.mkdir(parents=True, exist_ok=True)
            cap = cv2.VideoCapture(str(video))
            i = 0
            while True:
                ret, frame = cap.read()
                if not ret:
                    break
                cv2.imwrite(str(pattern).format(i), frame)
                i += 1
            cap.release()


class DreyeveFileStructureSessionLibrary:
    """All session structures + the design table (reference :252-293)."""

    def __init__(self, root: Union[str, Path]):
        self.root = Path(root).resolve()
        session_ids = sorted(
            int(d.name) for d in self.root.iterdir() if d.is_dir() and d.name.isdigit()
        )
        self.sessions = {
            i: DreyeveFileStructureSession(root, i) for i in session_ids
        }
        design_fpath = self.root / "dr(eye)ve_design.txt"
        self.data_design = None
        if design_fpath.exists():
            import pandas as pd

            self.data_design = pd.read_csv(
                design_fpath, sep="\t", header=None,
                names=["session_id", "time", "weather", "scene", "subject", "set"],
                index_col=None,
            )

    def __getitem__(self, key: int) -> DreyeveFileStructureSession:
        return self.sessions[key]

    def __iter__(self):
        return iter(self.sessions.values())

    def __len__(self):
        return len(self.sessions)

    def build_frames(self):
        for session in self.sessions.values():
            session.build_frames()


def _nbytes(obj) -> int:
    if isinstance(obj, np.ndarray):
        return obj.nbytes
    if isinstance(obj, dict):
        return sum(_nbytes(v) for v in obj.values())
    if isinstance(obj, (list, tuple)):
        return sum(_nbytes(v) for v in obj)
    return sys.getsizeof(obj)


class DreyeveDataset:
    """DR(eye)VE session dataset."""

    PCI_VERSION = 1
    DATA_CACHE_VERSION = 3.2
    DATA_SPLIT = {
        "train": list(range(1, 45)),
        "val": list(range(45, 60)),
        "train+val": list(range(1, 60)),
        "test": list(range(60, 75)),
    }

    def __init__(
        self,
        root_dir: Union[str, Path],
        split: Union[Literal["train", "val", "train+val", "test"], List[int]] = "train",
        input_length: float = 8,
        target_length: float = 6,
        step_size: float = 2,
        min_pci: Optional[float] = 0,
        max_pci: Optional[float] = None,
        output_fps: float = 5,
        gopro_scaling_factor: float = 1.0,
        front_scaling_factor: float = 1.0,
        output_format: str = "THWC",
        use_cache: bool = False,
        cache_dir: Optional[Union[str, Path]] = None,
        build_frames: bool = False,
        max_cache_size: int = int(10e9),
        use_frames: bool = True,
        use_memory_cache: bool = False,
        max_memory_cache_size: int = int(100e9),
        with_video: bool = True,
        crop_videos: bool = True,
        enable_pci_split: bool = False,
        pci_split_n_samples_per_bin: int = 200,
        max_length: Optional[int] = None,
        seed: int = 4242,
        filter_scene: Optional[List[str]] = None,
        video_dtype: str = "float16",
    ):
        random.seed(seed)
        self.index_column = "frame_gar"
        self.input_fps = 30
        self.output_fps = output_fps
        self.fps_divisor = int(self.input_fps // self.output_fps)
        assert (
            self.fps_divisor > 0 and self.input_fps % self.fps_divisor == 0
        ), "fps_divisor must divide output_fps"
        self.step_size = step_size
        self.min_pci = min_pci
        self.max_pci = max_pci
        self.with_video = with_video
        self.crop_videos = crop_videos
        if video_dtype not in ("float16", "uint8"):
            raise ValueError(
                f"video_dtype must be 'float16' or 'uint8', got {video_dtype}"
            )
        self.video_dtype = video_dtype
        self.use_frames = use_frames
        self.use_memory_cache = use_memory_cache
        self.max_memory_cache_size = max_memory_cache_size
        self.enable_pci_split = enable_pci_split
        self.filter_scene = filter_scene
        self.max_length = max_length
        self.gopro_scaling_factor = gopro_scaling_factor
        self.front_scaling_factor = front_scaling_factor
        self.output_format = output_format.upper()

        seq_length_in_seconds = input_length + target_length
        self.seq_length = int(self.input_fps / self.fps_divisor) * seq_length_in_seconds
        self.seq_length_input = int(self.input_fps / self.fps_divisor) * input_length
        self.seq_length_target = int(self.input_fps / self.fps_divisor) * target_length

        self.use_cache = use_cache
        self.cache_dpath = (
            Path(cache_dir) / "dreyeve_dataset" if cache_dir is not None else None
        )
        if self.use_cache:
            if self.cache_dpath is None:
                import tempfile

                self.cache_dpath = Path(tempfile.mkdtemp())
            self.cache_dpath.mkdir(parents=True, exist_ok=True)
        self.cache_metadata_fpath = (
            self.cache_dpath / "metadata.json" if self.cache_dpath else None
        )
        self.cache_pci_fpath = (
            self.cache_dpath
            / (f"pci_stepsize-{self.step_size}.json" if self.step_size != 1 else "pci.json")
            if self.cache_dpath
            else None
        )

        self._sample_cache = None
        if self.use_cache and with_video and self.cache_dpath is not None:
            self._sample_cache = SampleCache(
                self.cache_dpath / "items",
                params_repr=repr(
                    (
                        self.gopro_scaling_factor, self.front_scaling_factor,
                        self.output_format, self.step_size, self.seq_length_input,
                        self.seq_length_target, self.fps_divisor,
                        self.DATA_CACHE_VERSION,
                    )
                ),
                max_size_bytes=max_cache_size,
                async_writes=True,
            )

        self.split = split if isinstance(split, list) else self.DATA_SPLIT[split]
        self.fs_sessions = DreyeveFileStructureSessionLibrary(root_dir)
        assert len(self.fs_sessions) > 0, "No data found!"

        if build_frames or (
            self.with_video
            and self.use_frames
            and not next(iter(self.fs_sessions)).video_garmin_frames_fpath.parent.exists()
        ):
            logger.info("Building frames...")
            self.fs_sessions.build_frames()

        self.metadata = self._generate_metadata(filter_scene=self.filter_scene)
        step_size_frames = int(self.step_size * self.input_fps)
        self.data = self._build_data(
            self.metadata, self.seq_length, step_size_frames, self.fps_divisor
        )
        self.data = [e for e in self.data if e["pci"] >= (self.min_pci or 0)]

        self.data_bins = {}
        if self.enable_pci_split:
            self.data = sorted(self.data, key=lambda x: x["pci"])
            (self.data_bins, self.data_bins_keys, self.bin_epoch_size) = (
                self._build_pci_split(
                    10, 70, 60, pci_split_n_samples_per_bin,
                    split if isinstance(split, str) else "train", self.data,
                )
            )

        logger.info("Number of data entries: %d", len(self.data))
        self.full_dataset: Dict = {}
        self.memory_cache_size = 0
        self._return_info = False

    # ------------------------------------------------------------------ #

    def _build_pci_split(
        self, bin_step_size, max_bin, n_samples_per_bin_val, n_samples_per_bin,
        split, data,
    ):
        """PCI-balanced binned sampling (reference :506-543)."""
        bin_skip = (self.min_pci or 0) // bin_step_size
        bins: Dict[int, list] = {}
        for entry in data:
            if entry["pci"] <= max_bin:
                key = int(entry["pci"] // bin_step_size) - int(bin_skip)
            else:
                key = max_bin // bin_step_size - int(bin_skip)
            bins.setdefault(key, []).append(entry)

        bin_epoch_size = None
        if split == "train":
            bin_epoch_size = n_samples_per_bin * len(bins)
            for key in bins:
                random.shuffle(bins[key])
        elif split == "val":
            bin_min = min(n_samples_per_bin_val, min(len(v) for v in bins.values()))
            bin_epoch_size = bin_min * len(bins)
            for key in bins:
                random.shuffle(bins[key])
                bins[key] = bins[key][:bin_min]
        return bins, sorted(bins.keys()), bin_epoch_size

    def _generate_metadata(self, filter_scene=None):
        """Join per-frame gaze and GPS (reference :545-692)."""
        import pandas as pd

        metadata = {}
        for session in self.fs_sessions:
            gaze = pd.read_csv(
                session.etg_samples_fpath, sep=" ", header=None,
                names=["frame_etg", "frame_gar", "X", "Y", "event_type", "timestamp"],
                skiprows=1,
            )
            gaze["X"] = gaze["X"].interpolate()
            gaze["Y"] = gaze["Y"].interpolate()

            n_readings = 2

            def first_n(x):
                vals = x.iloc[:n_readings].tolist()
                return vals if len(vals) >= 2 else [x.iloc[0], x.iloc[0]]

            gaze = gaze.groupby("frame_gar", group_keys=True).agg(
                {
                    "frame_etg": "first",
                    "X": first_n,
                    "Y": first_n,
                    "event_type": first_n,
                    "timestamp": first_n,
                }
            ).reset_index()

            gps = pd.read_csv(
                session.speed_course_fpath, sep="\t", header=None,
                names=["frame", "speed", "course", "lat", "lon"], index_col=False,
            )
            gps[["lat", "lon"]] = convert_gps_coordinates(gps[["lat", "lon"]].values)
            gps["course"] = gps["course"].interpolate()
            gps["speed"] = gps["speed"].interpolate()
            gps["lat"] = gps["lat"].interpolate(limit_area="inside", method="pchip")
            gps["lon"] = gps["lon"].interpolate(limit_area="inside", method="pchip")
            gps = gps.dropna(subset=["lat", "lon"], how="any")

            metadata[session.session_id] = gaze.join(
                gps.set_index("frame"), on=self.index_column, how="inner"
            ).reset_index(drop=True)

        if filter_scene is not None and self.fs_sessions.data_design is not None:
            design = self.fs_sessions.data_design
            keep = design[design["scene"].isin(filter_scene)]["session_id"].tolist()
            metadata = {k: v for k, v in metadata.items() if k in keep}

        return {k: v for k, v in metadata.items() if k in self.split}

    def _build_data(self, metadata, seq_length, step_size_frames, fps_divisor=1):
        """Window index + PCI with the versioned json cache (reference
        :824-911); the PCI loop is vectorized into one batch call."""
        pci_dict = None
        should_rebuild = True
        if self.use_cache and self.cache_pci_fpath and self.cache_pci_fpath.exists():
            pci_dict = json.loads(self.cache_pci_fpath.read_text())
            should_rebuild = not (
                pci_dict.get("seq_length_full") == seq_length * fps_divisor
                and pci_dict.get("step_size") == step_size_frames
                and pci_dict.get("version") == self.PCI_VERSION
            )
        if should_rebuild or pci_dict is None:
            pci_dict = {
                "version": self.PCI_VERSION,
                "seq_length_full": seq_length * fps_divisor,
                "step_size": step_size_frames,
                "pci": {},
            }

        dirty = False
        data = []
        n_in_full = self.seq_length_input * fps_divisor
        n_tgt_full = self.seq_length_target * fps_divisor
        for session_id, session_metadata in metadata.items():
            skey = str(session_id)
            session_pci = pci_dict["pci"].setdefault(skey, {})
            n_frames = session_metadata.shape[0]
            starts = list(range(0, n_frames - seq_length * fps_divisor, step_size_frames))
            missing = [i for i in starts if str(i) not in session_pci]
            if missing:
                dirty = True
                latlon = session_metadata[["lat", "lon"]].to_numpy()
                inputs = np.stack([latlon[i : i + n_in_full] for i in missing])
                targets = np.stack(
                    [latlon[i + n_in_full : i + n_in_full + n_tgt_full] for i in missing]
                )
                pcis = estimate_pci_batch(
                    inputs, targets, curve_type="linear",
                    lookback_length=6, frequency=self.output_fps,
                )
                for i, p in zip(missing, pcis):
                    session_pci[str(i)] = float(p)

            for i in starts:
                pci = session_pci[str(i)]
                if (self.min_pci is not None and pci < self.min_pci) or (
                    self.max_pci is not None and pci > self.max_pci
                ):
                    continue
                data.append(
                    {
                        "pci": pci,
                        "session_id": session_id,
                        "start_index": i,
                        "seq_length": seq_length,
                        "fps_divisor": fps_divisor,
                    }
                )

        if self.use_cache and self.cache_pci_fpath and dirty:
            self.cache_pci_fpath.write_text(json.dumps(pci_dict))
        return data

    # ------------------------------------------------------------------ #

    def _read_frames(self, frame_fpath, frame_ids, scaling_factor=1.0):
        """Thread-pooled jpeg reads (reference __read_frames :925-951)."""
        import cv2

        def worker(frame_id):
            frame = cv2.imread(str(frame_fpath).format(frame_id))
            if frame is None:
                raise FileNotFoundError(str(frame_fpath).format(frame_id))
            if scaling_factor != 1.0:
                frame = cv2.resize(
                    frame,
                    (
                        int(frame.shape[1] * scaling_factor),
                        int(frame.shape[0] * scaling_factor),
                    ),
                    interpolation=cv2.INTER_AREA,
                )
            return cv2.cvtColor(frame, cv2.COLOR_BGR2RGB).astype(np.uint8)

        with ThreadPool(min(cpu_count() or 8, 16)) as pool:
            frames = pool.map(worker, list(frame_ids))
        return np.stack(frames, axis=0)  # THWC

    def _read_video_frames(self, video_fpath, frame_ids, scaling_factor=1.0):
        """Sequential container decode of specific frame indices
        (the reference's use_frames=False path)."""
        import cv2

        wanted = sorted(set(int(i) for i in frame_ids))
        cap = cv2.VideoCapture(str(video_fpath))
        if not cap.isOpened():
            raise FileNotFoundError(str(video_fpath))
        frames = {}
        try:
            cap.set(cv2.CAP_PROP_POS_FRAMES, wanted[0])
            pos = wanted[0]
            want_iter = iter(wanted)
            next_want = next(want_iter)
            while True:
                ret, frame = cap.read()
                if not ret:
                    break
                if pos == next_want:
                    if scaling_factor != 1.0:
                        frame = cv2.resize(
                            frame,
                            (
                                int(frame.shape[1] * scaling_factor),
                                int(frame.shape[0] * scaling_factor),
                            ),
                            interpolation=cv2.INTER_AREA,
                        )
                    frames[pos] = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB).astype(
                        np.uint8
                    )
                    try:
                        next_want = next(want_iter)
                    except StopIteration:
                        break
                pos += 1
        finally:
            cap.release()
        missing = [i for i in frame_ids if int(i) not in frames]
        if missing:
            raise ValueError(f"frames {missing[:5]}... missing in {video_fpath}")
        return np.stack([frames[int(i)] for i in frame_ids], axis=0)

    def _get_uncached_item(self, session_id, start_index, seq_length, fps_divisor):
        """(reference __get_uncached_item :1005-1114)"""
        md = self.metadata[session_id]
        window = slice(start_index, start_index + seq_length * fps_divisor, fps_divisor)
        gaze_data = np.array(
            [[item for item in entry] for entry in md[["X", "Y"]][window].values],
            dtype=np.float32,
        )  # (T, 2[XY], 2[readings])
        gps_data = md[["lat", "lon"]][window].to_numpy()

        gaze_data[:, 0] = gaze_data[:, 0] / 1080
        gaze_data[:, 1] = gaze_data[:, 1] / 720
        gaze_data = gaze_data.transpose(0, 2, 1)  # (T, readings, XY)
        gaze_seq_length_input = gaze_data.shape[1] * self.seq_length_input
        gaze_data = gaze_data.reshape(-1, 2)

        frames_gar = frames_etg = None
        if self.with_video:
            frame_ids_gar = list(md["frame_gar"][window])
            frame_ids_etg = list(md["frame_etg"][window])
            session = self.fs_sessions[session_id]
            if self.use_frames:
                frames_gar = self._read_frames(
                    session.video_garmin_frames_fpath, frame_ids_gar,
                    self.gopro_scaling_factor,
                )
                frames_etg = self._read_frames(
                    session.video_etg_frames_fpath, frame_ids_etg,
                    self.front_scaling_factor,
                )
            else:
                # decode directly from the .avi containers by frame index
                # (reference :1073-1093)
                frames_gar = self._read_video_frames(
                    session.video_garmin_fpath, frame_ids_gar,
                    self.gopro_scaling_factor,
                )
                frames_etg = self._read_video_frames(
                    session.video_etg_fpath, frame_ids_etg,
                    self.front_scaling_factor,
                )

        train = {
            "gps": gps_data[: self.seq_length_input],
            "gaze": gaze_data[:gaze_seq_length_input],
        }
        target = {
            "gps": gps_data[self.seq_length_input :],
            "gaze": gaze_data[gaze_seq_length_input:],
        }
        if self.with_video:
            train["left_video"] = frames_gar[: self.seq_length_input]
            train["front_video"] = frames_etg[: self.seq_length_input]
            target["left_video"] = frames_gar[self.seq_length_input :]
            target["front_video"] = frames_etg[self.seq_length_input :]
        return {"train": train, "target": target}

    def _postprocess(self, data):
        """f16 conversion + 15%/35% vertical crop (reference :1130-1141,
        :1219-1227). With ``video_dtype="uint8"`` frames stay uint8 on the
        wire and the jitted step converts on-device
        (ops/image.dequantize_videos) — bit-identical values."""
        if self.with_video:
            if self.video_dtype == "float16":
                for phase in ("train", "target"):
                    for key in ("left_video", "front_video"):
                        v = data[phase][key]
                        if v.dtype == np.uint8:
                            data[phase][key] = v.astype(np.float16) / 255.0
            if self.crop_videos:
                for phase in ("train", "target"):
                    v = data[phase]["left_video"]
                    h = v.shape[1]
                    data[phase]["left_video"] = v[:, int(0.15 * h) : int(0.65 * h)]
            if self.output_format == "TCHW":
                for phase in ("train", "target"):
                    for key in ("left_video", "front_video"):
                        data[phase][key] = data[phase][key].transpose(0, 3, 1, 2)
        return data

    # ------------------------------------------------------------------ #

    def __len__(self):
        length = len(self.data)
        if self.max_length is not None:
            length = min(length, self.max_length)
        if self.enable_pci_split and self.bin_epoch_size:
            length = min(length, self.bin_epoch_size)
        return length

    def __getitem__(self, idx):
        if self.enable_pci_split:
            bin_id = idx % len(self.data_bins)
            key = self.data_bins_keys[bin_id]
            entry_id = (idx // len(self.data_bins)) % len(self.data_bins[key])
            entry = self.data_bins[key][entry_id]
        else:
            entry = self.data[idx]

        if self.use_memory_cache and idx in self.full_dataset:
            # serve a shallow per-dict copy of the (read-only-array) cached
            # sample so downstream key replacement / in-place mutation can
            # never corrupt it for later epochs
            hit = _copy_sample(self.full_dataset[idx])
            return (hit, entry) if self._return_info else hit

        pci = entry["pci"]
        if self._sample_cache is not None:
            cached = self._sample_cache.fetch(repr(entry))
            if cached is not None:
                cached["pci"] = pci
                cached = self._postprocess(cached)
                return (cached, entry) if self._return_info else cached

        data = self._get_uncached_item(
            entry["session_id"], entry["start_index"],
            entry["seq_length"], entry["fps_divisor"],
        )
        data["pci"] = pci
        if self._sample_cache is not None:
            self._sample_cache.push(repr(entry), data)
        data = self._postprocess(data)

        if self.use_memory_cache:
            size = _nbytes(data)
            if self.memory_cache_size + size < self.max_memory_cache_size:
                self.full_dataset[idx] = _freeze_sample(data)
                self.memory_cache_size += size
                # serve a per-dict copy: the miss consumer's key replacement
                # must not corrupt the stored nesting (same as the hit path)
                data = _copy_sample(data)

        return (data, entry) if self._return_info else data

    def get_with_info(self, idx: int):
        self._return_info = True
        try:
            item, info = self.__getitem__(idx)
        finally:
            self._return_info = False
        return item, info
