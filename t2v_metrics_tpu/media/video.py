"""Host-side video decode and frame assembly.

Replaces the reference's decord/ffmpeg/OpenCV stack (reference:
t2v_metrics/models/vqascore_models/mm_utils.py:15-126 frame extraction +
concatenation; models/video_utils.py:31-73 decord/cv2 readers) with a single
OpenCV-based reader that returns batched RGB numpy arrays (no temp JPEG
round-trips — frames flow straight to the device pipeline).

Frame index selection parity:
  * ``step`` mode: ``i * (total // n)`` — reference mm_utils.py:26-30
    (used by the Score-level video->concat path);
  * ``linspace`` mode: ``round(linspace(0, total-1, n))`` — reference
    gemma3_model.py:83 style (model adapters).
"""

from __future__ import annotations

import os

import numpy as np


def _open_capture(video_path: str):
    import cv2

    cap = cv2.VideoCapture(str(video_path))
    if not cap.isOpened():
        raise IOError(f"cannot open video {video_path}")
    return cap, cv2


def video_info(video_path: str) -> dict:
    cap, cv2 = _open_capture(video_path)
    try:
        return {
            "total_frames": int(cap.get(cv2.CAP_PROP_FRAME_COUNT)),
            "fps": float(cap.get(cv2.CAP_PROP_FPS)) or 30.0,
            "width": int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)),
            "height": int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT)),
        }
    finally:
        cap.release()


def frame_indices(total: int, num_frames: int, mode: str = "linspace") -> np.ndarray:
    num_frames = min(num_frames, max(total, 1))
    if mode == "step":
        step = max(total // num_frames, 1)
        return np.arange(num_frames) * step
    return np.round(np.linspace(0, max(total - 1, 0), num_frames)).astype(np.int64)


def extract_frames(video_path: str, num_frames: int, mode: str = "step",
                   fps: float | None = None) -> list[np.ndarray]:
    """Decode frames as RGB uint8 HWC arrays.

    fps: if given, overrides num_frames with time-uniform sampling at that
    rate (Qwen-style video_fps sampling).

    Prefers the native libav sequential decoder (exact frame addressing,
    multithreaded) and falls back to OpenCV position-seek decode.
    """
    from . import native_loader

    if native_loader.native_available():
        info = native_loader.video_info(video_path)
        if info is not None and info["total_frames"] > 0:
            total = info["total_frames"]
            if fps is not None:
                n = max(int(total / max(info["fps"], 1e-6) * fps), 1)
                idx = frame_indices(total, n, "linspace")
            else:
                idx = frame_indices(total, num_frames, mode)
            out = native_loader.video_frames(video_path, idx.tolist())
            if out is not None and len(out):
                return [f for f in out]
    cap, cv2 = _open_capture(video_path)
    try:
        total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        native_fps = float(cap.get(cv2.CAP_PROP_FPS)) or 30.0
        if fps is not None:
            n = max(int(total / native_fps * fps), 1)
            idx = frame_indices(total, n, "linspace")
        else:
            idx = frame_indices(total, num_frames, mode)
        frames = []
        for i in idx:
            cap.set(cv2.CAP_PROP_POS_FRAMES, int(i))
            ok, frame = cap.read()
            if not ok:
                continue
            frames.append(frame[:, :, ::-1].copy())  # BGR -> RGB
        return frames
    finally:
        cap.release()


def concatenate_horizontal(frames: list[np.ndarray], dist: int = 10) -> np.ndarray:
    """Concatenate frames left-to-right on black, top-aligned (reference
    mm_utils.py:68-86)."""
    total_w = sum(f.shape[1] for f in frames) + dist * (len(frames) - 1)
    h = max(f.shape[0] for f in frames)
    out = np.zeros((h, total_w, 3), np.uint8)
    x = 0
    for f in frames:
        fh, fw = f.shape[:2]
        out[:fh, x:x + fw] = f
        x += fw + dist
    return out


def concatenate_vertical(frames: list[np.ndarray], dist: int = 10) -> np.ndarray:
    w = max(f.shape[1] for f in frames)
    total_h = sum(f.shape[0] for f in frames) + dist * (len(frames) - 1)
    out = np.zeros((total_h, w, 3), np.uint8)
    y = 0
    for f in frames:
        fh, fw = f.shape[:2]
        out[y:y + fh, :fw] = f
        y += fh + dist
    return out


def concatenate_grid(frames: list[np.ndarray], dist: int = 10,
                     output_size: tuple[int, int] = (1024, 1024)) -> np.ndarray:
    """Square grid collage with aspect-preserving per-cell resize
    (reference mm_utils.py:88-126)."""
    import cv2
    from math import ceil, sqrt

    n = len(frames)
    grid = max(2, ceil(sqrt(n)))
    cw = (output_size[0] - dist * (grid - 1)) // grid
    ch = (output_size[1] - dist * (grid - 1)) // grid
    out = np.zeros((output_size[1], output_size[0], 3), np.uint8)
    for i, f in enumerate(frames):
        ratio = f.shape[1] / f.shape[0]
        if ratio > cw / ch:
            nw, nh = cw, int(cw / ratio)
        else:
            nw, nh = int(ch * ratio), ch
        rs = cv2.resize(f, (nw, nh), interpolation=cv2.INTER_LANCZOS4)
        row, col = i // grid, i % grid
        x = col * (cw + dist) + (cw - nw) // 2
        y = row * (ch + dist) + (ch - nh) // 2
        out[y:y + nh, x:x + nw] = rs
    return out


def is_video_path(path) -> bool:
    from ..constants import VIDEO_EXTENSIONS

    return isinstance(path, str) and os.path.splitext(path)[1].lower() in VIDEO_EXTENSIONS
