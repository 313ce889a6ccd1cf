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

from typing import Dict, Optional

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
