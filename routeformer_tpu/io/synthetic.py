"""Synthetic driving-data generator.

Produces batches with the exact structure the datasets emit (reference
``routeformer/io/dataset.py:1606-1650`` ``_train_target_split``: a
``{"train": {...}, "target": {...}}`` pair of GPS / video / gaze streams),
with *correlated* modalities so end-to-end learning is testable without the
real GEM/DR(eye)VE recordings:

- GPS: a smooth unicycle model (heading random-walk + smooth speed) in
  meters (web-mercator-like coordinates).
- video: per-frame gradient images whose horizontal phase tracks the
  *future* heading change, so the visual stream carries predictive signal.
- gaze: 2-D points biased toward the upcoming turn direction.

Used by tests, ``bench.py`` and ``__graft_entry__``; the real dataset
pipelines live in ``io/dataset.py`` / ``io/dataset_dreyeve.py``.
"""

from dataclasses import dataclass
from typing import Tuple

import numpy as np

from routeformer_tpu.score.pci import estimate_pci_batch


def _smooth_noise(rng, n, scale, smoothing=9):
    x = rng.normal(size=n + smoothing) * scale
    kernel = np.ones(smoothing) / smoothing
    return np.convolve(x, kernel, mode="valid")[:n]


def synthetic_trajectory(
    rng: np.random.Generator,
    total_len: int,
    fps: float = 5.0,
    base_speed: float = 8.0,
    turn_scale: float = 0.15,
) -> np.ndarray:
    """One smooth 2-D trajectory of ``total_len`` points, meters."""
    heading = np.cumsum(_smooth_noise(rng, total_len, turn_scale))
    heading += rng.uniform(0, 2 * np.pi)
    speed = np.clip(
        base_speed + np.cumsum(_smooth_noise(rng, total_len, 0.3)), 0.5, 30.0
    )
    step = speed / fps
    velocity = np.stack([np.cos(heading), np.sin(heading)], axis=-1) * step[:, None]
    origin = rng.uniform(-1e4, 1e4, size=2)
    return origin + np.cumsum(velocity, axis=0)


def _heading_frames(heading: np.ndarray, h: int, w: int, phase_gain: float = 4.0):
    """(T,) headings -> (T, h, w, 3) gradient frames whose phase follows the
    heading derivative (predictive visual signal)."""
    t = heading.shape[0]
    dheading = np.gradient(heading)
    xs = np.linspace(0, 2 * np.pi, w)[None, None, :]  # (1, 1, W)
    ys = np.linspace(0, 2 * np.pi, h)[None, :, None]  # (1, H, 1)
    phase = (dheading * phase_gain)[:, None, None]
    r = 0.5 + 0.5 * np.sin(xs + phase)
    g = 0.5 + 0.5 * np.cos(ys + phase * 2.0)
    b = np.broadcast_to(
        0.5 + 0.4 * np.sin(phase), (t, h, w)
    )
    frames = np.stack(
        [np.broadcast_to(r, (t, h, w)), np.broadcast_to(g, (t, h, w)), b], axis=-1
    )
    return frames.astype(np.float32)


def synthetic_batch(
    seed: int,
    batch_size: int,
    seq_len: int = 40,
    pred_len: int = 30,
    fps: float = 5.0,
    with_video: bool = False,
    with_gaze: bool = False,
    frame_hw: Tuple[int, int] = (24, 32),
    gaze_len: int = 200,
    dtype=np.float32,
) -> dict:
    """One ``{"train": ..., "target": ..., "pci": ...}`` batch."""
    rng = np.random.default_rng(seed)
    total = seq_len + pred_len
    h, w = frame_hw

    gps = np.stack(
        [synthetic_trajectory(rng, total, fps=fps) for _ in range(batch_size)]
    ).astype(dtype)

    train = {"gps": gps[:, :seq_len]}
    target = {"gps": gps[:, seq_len:]}

    if with_video or with_gaze:
        # recover headings from velocities for the frame generator
        vel = np.diff(gps, axis=1, prepend=gps[:, :1])
        heading = np.arctan2(vel[..., 1], vel[..., 0])

    if with_video:
        frames = np.stack(
            [_heading_frames(heading[i], h, w) for i in range(batch_size)]
        )
        left = frames
        right = np.roll(frames, shift=3, axis=3)  # shifted copy as "right"
        train["left_video"] = left[:, :seq_len]
        train["right_video"] = right[:, :seq_len]
        target["left_video"] = left[:, seq_len:]
        target["right_video"] = right[:, seq_len:]

    if with_gaze:
        front = np.stack(
            [_heading_frames(heading[i], h, w, phase_gain=2.0) for i in range(batch_size)]
        )
        train["front_video"] = front[:, :seq_len]
        target["front_video"] = front[:, seq_len:]
        # gaze at gaze_len samples over the train window, x biased by turn
        dh = np.gradient(heading[:, :seq_len], axis=1)
        idx = np.linspace(0, seq_len - 1, gaze_len).astype(int)
        gaze_x = 0.5 + 2.0 * dh[:, idx] + rng.normal(0, 0.05, (batch_size, gaze_len))
        gaze_y = 0.5 + rng.normal(0, 0.05, (batch_size, gaze_len))
        train["gaze"] = np.stack([gaze_x, gaze_y], axis=-1).astype(dtype)
        tidx = np.linspace(0, pred_len - 1, gaze_len).astype(int)
        dh_t = np.gradient(heading[:, seq_len:], axis=1)
        target["gaze"] = np.stack(
            [
                0.5 + 2.0 * dh_t[:, tidx] + rng.normal(0, 0.05, (batch_size, gaze_len)),
                0.5 + rng.normal(0, 0.05, (batch_size, gaze_len)),
            ],
            axis=-1,
        ).astype(dtype)

    pci = estimate_pci_batch(
        train["gps"].astype(np.float64),
        target["gps"].astype(np.float64),
        curve_type="linear",
        frequency=fps,
    )
    return {"train": train, "target": target, "pci": pci.astype(np.float32)}


@dataclass
class SyntheticDataset:
    """Indexable dataset of synthetic batches (one batch per index)."""

    n_batches: int
    batch_size: int
    seq_len: int = 40
    pred_len: int = 30
    fps: float = 5.0
    with_video: bool = False
    with_gaze: bool = False
    frame_hw: Tuple[int, int] = (24, 32)
    gaze_len: int = 200
    seed: int = 0

    def __len__(self) -> int:
        return self.n_batches

    def __getitem__(self, idx: int) -> dict:
        if not 0 <= idx < self.n_batches:
            raise IndexError(idx)
        return synthetic_batch(
            seed=self.seed * 100003 + idx,
            batch_size=self.batch_size,
            seq_len=self.seq_len,
            pred_len=self.pred_len,
            fps=self.fps,
            with_video=self.with_video,
            with_gaze=self.with_gaze,
            frame_hw=self.frame_hw,
            gaze_len=self.gaze_len,
        )
