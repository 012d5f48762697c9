"""Host-side image loading and model-specific preprocessing.

Mirrors the reference's loader semantics (reference:
t2v_metrics/models/model.py:10-14 — PIL open -> RGB, ``.npy`` files are
BGR float arrays flipped to RGB) but emits batched numpy arrays ready for a
single host->device transfer instead of per-sample torch tensors.

Resize parity: Pillow's exact two-pass quantized pipeline via
`ops.image.resize_np(..., quantize_uint8=True)`, so preprocessed pixels are
bit-comparable with the reference's CLIPImageProcessor output.
"""

from __future__ import annotations

import numpy as np
from PIL import Image

from ..ops.image import resize_np, resize_shortest_side
from ..constants import CLIP_MEAN, CLIP_STD


def image_loader(path) -> np.ndarray:
    """Load an image file (or pass through arrays/PIL) as uint8 RGB HWC."""
    if isinstance(path, np.ndarray):
        arr = path
    elif isinstance(path, Image.Image):
        arr = np.asarray(path.convert("RGB"))
    elif str(path).endswith(".npy"):
        arr = np.load(path)[:, :, [2, 1, 0]]  # BGR -> RGB (reference model.py:12-13)
        if arr.dtype != np.uint8:
            arr = np.clip(arr, 0, 255).astype(np.uint8)
    else:
        arr = np.asarray(Image.open(path).convert("RGB"))
    if arr.dtype != np.uint8:
        arr = np.clip(arr, 0, 255).astype(np.uint8)
    return arr


def expand2square_np(img: np.ndarray, fill_rgb) -> np.ndarray:
    """Pad to square with a background color, image centered (reference:
    mm_utils.py:128-139)."""
    h, w, c = img.shape
    if h == w:
        return img
    side = max(h, w)
    out = np.empty((side, side, c), dtype=img.dtype)
    out[:] = np.asarray(fill_rgb, dtype=img.dtype)
    if w > h:
        top = (side - h) // 2
        out[top:top + h, :, :] = img
    else:
        left = (side - w) // 2
        out[:, left:left + w, :] = img
    return out


def _pil_resize(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Host-path bicubic resize via Pillow's SIMD C kernels.

    This *is* the parity reference (the device matmul path in
    ops/image.py is tested against it); on host, Pillow is ~100x faster
    than naive numpy einsum, so the hot preprocessing path uses it.
    """
    return np.asarray(Image.fromarray(img).resize((out_w, out_h), Image.BICUBIC))


def clip_preprocess(img: np.ndarray, size: int, mean=CLIP_MEAN, std=CLIP_STD,
                    pad_square: bool = False,
                    raw_uint8: bool = False) -> np.ndarray:
    """uint8 HWC -> normalized float32 (size, size, 3).

    pad_square=True: LLaVA 'pad' aspect mode — expand2square with the
    mean color (x255) before resizing (CLIP-FlanT5's image_aspect_ratio,
    reference mm_utils.py:188).
    pad_square=False: torchvision Resize(shortest)+CenterCrop (OpenCLIP).
    raw_uint8=True: skip normalization and return uint8 — the engine
    normalizes in-jit on device (4x smaller host->device transfer).
    """
    if pad_square:
        fill = tuple(int(x * 255) for x in mean)
        img = expand2square_np(img, fill)
        out = _pil_resize(img, size, size)
    else:
        rh, rw = resize_shortest_side(img.shape[:2], size)
        out = _pil_resize(img, rh, rw)
        top = (rh - size) // 2
        left = (rw - size) // 2
        out = out[top:top + size, left:left + size]
    if raw_uint8:
        return out
    out = out.astype(np.float32) / 255.0
    return (out - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)


def load_batch(paths, size: int, mean=CLIP_MEAN, std=CLIP_STD,
               pad_square: bool = False, raw_uint8: bool = False) -> np.ndarray:
    """List of paths -> (N, size, size, 3) float32 (or uint8 with
    raw_uint8=True), one device transfer.

    JPEG files are decoded through the native multithreaded batch decoder
    (media/native) when built; everything else goes through PIL.
    """
    images = [None] * len(paths)
    jpeg_idx = [i for i, p in enumerate(paths)
                if isinstance(p, str) and p.lower().endswith((".jpg", ".jpeg"))]
    png_idx = [i for i, p in enumerate(paths)
               if isinstance(p, str) and p.lower().endswith(".png")]
    if jpeg_idx or png_idx:
        from . import native_loader

        if native_loader.native_available():
            if jpeg_idx:
                bufs = [open(paths[i], "rb").read() for i in jpeg_idx]
                for i, arr in zip(jpeg_idx,
                                  native_loader.decode_jpeg_batch(bufs)):
                    images[i] = arr
            if png_idx:
                bufs = [open(paths[i], "rb").read() for i in png_idx]
                for i, arr in zip(png_idx,
                                  native_loader.decode_png_batch(bufs)):
                    images[i] = arr
    for i, p in enumerate(paths):
        if images[i] is None:
            images[i] = image_loader(p)
    if raw_uint8 and len(images) > 3:
        # Native batched PIL-exact bicubic resize (media/native): bit-
        # identical to the PIL path below and ~4x cheaper on the host CPU
        # — on a 1-core pipeline host this keeps preprocessing off the
        # pipelined batch_forward critical path.
        from . import native_loader

        fill = tuple(int(x * 255) for x in mean)
        nat = native_loader.clip_resize_batch(
            images, size, mode=0 if pad_square else 1, fill=fill)
        if nat is not None:
            return nat
    if len(images) > 3:
        # PIL's resize releases the GIL -> thread-parallel preprocessing
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(8, len(images))) as ex:
            out = list(ex.map(
                lambda img: clip_preprocess(img, size, mean, std, pad_square,
                                            raw_uint8),
                images))
        return np.stack(out)
    return np.stack([
        clip_preprocess(img, size, mean, std, pad_square, raw_uint8)
        for img in images
    ])
