"""Host-side video decode.

Capability parity with the reference's PyAV decode stack
(``routeformer/io/dataset.py:2128-2369``: ``_read_video`` with pts-window
seek, frame extraction, FPS down-sampling by slicing). PyAV/ffmpeg binaries
are absent in this environment; decode goes through OpenCV's
ffmpeg-backed ``VideoCapture`` (seek by ``CAP_PROP_POS_MSEC``), with the
same output contract: frames in the [start, end) second window, decimated
to ``output_fps`` by index slicing, RGB uint8.

Errors degrade to empty arrays with a warning, matching the reference's
fault tolerance (dataset.py:2156-2159, 2330-2333).
"""

import threading
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np

from routeformer_tpu.utils.logging import get_logger

logger = get_logger("io.video")


def read_video(
    path,
    start_sec: float = 0.0,
    end_sec: float = float("inf"),
    output_fps: Optional[float] = None,
) -> Dict[str, np.ndarray]:
    """Decode frames in [start_sec, end_sec), optionally decimated to
    ``output_fps``. Returns ``{"video": (T, H, W, 3) uint8 RGB, "fps": ...}``.
    """
    import cv2

    path = str(path)
    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        logger.warning("could not open video %s; returning empty tensor", path)
        return {"video": np.zeros((0, 0, 0, 3), dtype=np.uint8), "fps": 0.0}

    try:
        fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
        if start_sec > 0:
            cap.set(cv2.CAP_PROP_POS_MSEC, start_sec * 1000.0)

        # FPS reduction by slicing (reference dataset.py:2190-2199) — the
        # stride filter runs inside the decode loop so dropped frames skip
        # the BGR->RGB conversion and copy (5 of 6 frames at 30->5 Hz).
        stride = 1
        if output_fps is not None and output_fps < fps:
            stride = int(round(fps / output_fps))

        frames = []
        decoded = 0
        while True:
            pos_ms = cap.get(cv2.CAP_PROP_POS_MSEC)
            if stride > 1 and decoded % stride != 0:
                # grab() decodes without returning the frame buffer
                if not cap.grab():
                    break
                t = pos_ms / 1000.0
                if t >= end_sec:
                    break
                decoded += 1
                continue
            ret, frame = cap.read()
            if not ret:
                break
            t = pos_ms / 1000.0
            if t >= end_sec:
                break
            decoded += 1
            frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
    finally:
        cap.release()

    if not frames:
        logger.warning(
            "no frames decoded from %s in [%s, %s)", path, start_sec, end_sec
        )
        return {"video": np.zeros((0, 0, 0, 3), dtype=np.uint8), "fps": fps}

    return {"video": np.stack(frames), "fps": fps}


class WindowedVideoReader:
    """Shared sequential decoder for overlapping ``[start, end)`` windows.

    GEM samples are ~14 s windows at 2 s steps (reference
    ``io/dataset.py:967-1033``), so decoding every window independently
    re-decodes and re-preprocesses each source frame ~7× — the measured
    cold-pipeline wall (docs/PERF.md: 0.445 clips/s vs a 20.8 clips/s
    step). This reader decodes each frame ONCE per sequential pass:
    decimated frames — with the optional per-frame ``transform``
    (undistort/crop/resize/float16) applied at decode time, so that work
    is shared too — are kept in a bounded time-indexed buffer, overlapping
    windows are served by slicing, and the decoder only advances for the
    unseen tail.

    Parity contract: a served window is identical to
    ``transform(read_video(path, start, end, output_fps)["video"])``
    whenever the window start differs from the pass anchor by a whole
    number of source frames that is also a multiple of the decimation
    stride. Landing is inferred by *induction from the anchor*: the pass
    anchor was produced by a real ``cv2`` seek, and a start exactly ``k``
    frame periods later lands exactly ``k`` frames later (constant frame
    rate), so no model of cv2's seek rounding is needed — GEM windows
    (2 s steps at 30 fps / stride 6 = 60 frames apart, any constant clock
    offset) all ride one pass. An off-grid or backward start falls back to
    a fresh seek — exactly ``read_video``'s code path — so correctness
    never depends on grid alignment (tests/test_video_reader.py + the
    byte-real dataset tests).

    Thread-safe: DataLoader threads assembling different samples of the
    same recording serialize on this reader's lock and share its decode
    work; different videos (left/right/front) proceed in parallel.
    """

    def __init__(
        self,
        path,
        output_fps: Optional[float] = None,
        transform: Optional[Callable[[np.ndarray], np.ndarray]] = None,
        keep_past_sec: float = 32.0,
        max_jump_sec: Optional[float] = None,
    ):
        self.path = str(path)
        self.output_fps = output_fps
        self.transform = transform
        self.keep_past_sec = keep_past_sec
        # Forward-jump bound: an on-grid start further than this past the
        # buffered tail re-seeks instead of sequentially decoding (and
        # transforming + buffering) every intermediate frame — under
        # shuffled loading a jump minutes ahead would otherwise cost
        # unbounded transient RAM and be far slower than a keyframe seek.
        self.max_jump_sec = keep_past_sec if max_jump_sec is None else max_jump_sec
        self._lock = threading.Lock()
        self._cap = None
        self._fps: float = 0.0
        self._stride = 1
        self._decoded = 0  # frames decoded since the last seek
        self._eof = False
        # kept (post-decimation) frames of the current pass
        self._times: List[float] = []
        self._frames: List[np.ndarray] = []
        self._buf_start: Optional[float] = None  # seek target of this pass
        # recorded time of the pass's SECOND kept frame — the induction
        # reference. cv2's POS_MSEC lags the delivered frame by one source
        # period uniformly during sequential decode, but the very first
        # read of a 0-start pass reports 0 instead of -1/fps, so the first
        # frame's recorded time is NOT a safe reference; the second kept
        # frame always follows the uniform convention.
        self._induction_ref: Optional[float] = None
        self._kept = 0  # kept frames appended this pass
        self._max_start = -np.inf
        self.n_resets = 0  # observability: fresh seeks taken (incl. opens)

    # -------------------------------------------------------------- #

    def _open(self) -> bool:
        import cv2

        self._cap = cv2.VideoCapture(self.path)
        if not self._cap.isOpened():
            self._cap = None
            return False
        self._fps = self._cap.get(cv2.CAP_PROP_FPS) or 30.0
        self._stride = 1
        if self.output_fps is not None and self.output_fps < self._fps:
            self._stride = int(round(self._fps / self.output_fps))
        return True

    def _reset(self, start_sec: float) -> bool:
        """Fresh seek — the ``read_video`` code path."""
        import cv2

        if self._cap is not None:
            self._cap.release()
            self._cap = None
        if not self._open():
            return False
        if start_sec > 0:
            self._cap.set(cv2.CAP_PROP_POS_MSEC, start_sec * 1000.0)
        self._decoded = 0
        self._eof = False
        self._times.clear()
        self._frames.clear()
        self._buf_start = start_sec
        self._induction_ref = None
        self._kept = 0
        self.n_resets += 1
        return True

    def _decode_until(self, end_sec: float):
        """Advance the decoder until the next frame's time >= end_sec.

        Mirrors ``read_video``'s loop exactly (pos read before grab;
        decimation by decode counter), except the loop leaves the capture
        positioned for later extension instead of releasing it."""
        import cv2

        while not self._eof:
            pos_ms = self._cap.get(cv2.CAP_PROP_POS_MSEC)
            t = pos_ms / 1000.0
            if t >= end_sec:
                return
            if self._stride > 1 and self._decoded % self._stride != 0:
                if not self._cap.grab():
                    self._eof = True
                    return
                self._decoded += 1
                continue
            ret, frame = self._cap.read()
            if not ret:
                self._eof = True
                return
            self._decoded += 1
            frame = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
            if self.transform is not None:
                frame = self.transform(frame[None])[0]
            if self._kept == 1 and self._induction_ref is None:
                self._induction_ref = t
            self._kept += 1
            self._times.append(t)
            self._frames.append(frame)

    def _evict(self):
        cutoff = self._max_start - self.keep_past_sec
        drop = 0
        while drop < len(self._times) and self._times[drop] < cutoff:
            drop += 1
        if drop:
            del self._times[:drop]
            del self._frames[:drop]

    # -------------------------------------------------------------- #

    def read(self, start_sec: float, end_sec: float) -> Dict[str, np.ndarray]:
        """Frames of ``[start_sec, end_sec)`` with ``transform`` applied.

        Returns ``{"video": (T, ...), "fps": source_fps}`` like
        ``read_video`` (empty (0, 0, 0, 3) array when nothing decodes).
        """
        with self._lock:
            video = self._read_locked(start_sec, end_sec)
        if video is None or not len(video):
            logger.warning(
                "no frames decoded from %s in [%s, %s)",
                self.path, start_sec, end_sec,
            )
            return {
                "video": np.zeros((0, 0, 0, 3), dtype=np.uint8),
                "fps": self._fps,
            }
        return {"video": np.stack(video), "fps": self._fps}

    def _grid_landing(self, start_sec: float):
        """Where a fresh seek to ``start_sec`` would land in this pass's
        buffer, by induction from the anchor — ``"anchor"`` (serve from
        the buffer head), a predicted recorded time, or None (off-grid).

        The pass anchor came from a real cv2 seek to ``_buf_start``. At
        constant frame rate a seek target exactly ``k`` frame periods
        later delivers a frame exactly ``k`` frames later, whatever cv2's
        seek rounding rule is — so no model of that rule is needed. The
        landing is servable from this pass iff ``k`` is a non-negative
        whole number of frames AND a multiple of the decimation stride
        (same kept-frame phase). The predicted recorded time is computed
        from the pass's second kept frame (``_induction_ref``) because
        cv2's POS_MSEC convention for the first frame of a 0-start pass
        differs from the steady one-period lag."""
        if self._buf_start is None or not self._fps:
            return None
        k = (start_sec - self._buf_start) * self._fps
        k_round = round(k)
        if abs(k - k_round) > 0.01 or k_round < 0:
            return None
        if k_round % self._stride != 0:
            return None
        if k_round == 0:
            return "anchor"
        if self._induction_ref is None:
            return None
        return self._induction_ref + (k_round - self._stride) / self._fps

    def _read_locked(
        self, start_sec: float, end_sec: float
    ) -> Optional[List[np.ndarray]]:
        # Reuse the current pass only for requests whose fresh-seek landing
        # frame is predictable (on this pass's grid) and still buffered;
        # anything else — backward starts, off-grid starts, evicted
        # history — re-seeks: the read_video code path.
        frame_period = 1.0 / self._fps if self._fps else 0.0
        landing = self._grid_landing(start_sec)
        if landing is not None and landing != "anchor":
            # Far-forward jump guard: serving this landing would decode the
            # whole gap sequentially; past ``max_jump_sec`` of unseen tail a
            # fresh keyframe seek is strictly cheaper (and bounds transient
            # buffering). Tail = last decoded time, or the pass anchor when
            # nothing has been decoded yet.
            tail = self._times[-1] if self._times else self._buf_start
            if tail is not None and landing - tail > self.max_jump_sec:
                landing = None
        if landing == "anchor":
            # re-serving the pass's own start window: only valid while the
            # buffer head (the landing frame of the original seek) is
            # still there
            reusable = self._cap is not None and self._kept == len(self._times)
        else:
            reusable = (
                self._cap is not None
                and landing is not None
                and (
                    not self._times
                    or landing >= self._times[0] - frame_period / 2
                )
            )
        if not reusable:
            if not self._reset(start_sec):
                return None
            self._decode_until(end_sec)
            # fresh-seek semantics: everything cv2 delivered from the seek
            # point belongs to the window (read_video applies no lower
            # time bound)
            lo = 0
        elif landing == "anchor":
            self._decode_until(end_sec)
            lo = 0
        else:
            self._decode_until(end_sec)
            half = frame_period / 2
            lo = 0
            while lo < len(self._times) and self._times[lo] < landing - half:
                lo += 1
            if not (
                lo < len(self._times) and abs(self._times[lo] - landing) <= half
            ):
                # induction violated (variable frame rate / timestamp
                # jitter): fall back to the fresh-seek path
                if not self._reset(start_sec):
                    return None
                self._decode_until(end_sec)
                lo = 0

        hi = lo
        while hi < len(self._times) and self._times[hi] < end_sec:
            hi += 1

        self._max_start = max(self._max_start, start_sec)
        out = self._frames[lo:hi]
        self._evict()
        return out

    def close(self):
        with self._lock:
            if self._cap is not None:
                self._cap.release()
                self._cap = None
            self._times.clear()
            self._frames.clear()
