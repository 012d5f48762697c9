"""Image preprocessing ops: PIL-parity separable resize, crop, normalize, patchify.

The reference preprocesses with PIL/torchvision on the host, one image at a
time (reference: t2v_metrics/models/model.py:10-14 and each adapter's
processor).  Here resize is expressed as two dense interpolation-weight
matmuls ``W_h @ img @ W_w.T`` so a whole batch runs on the MXU in one fused
op, while reproducing Pillow's resampling exactly (Pillow computes separable
filter coefficients per output pixel; we materialize the same coefficients as
a matrix).  Weight matrices are cached per (in_size, out_size, filter).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Pillow-compatible filter kernels
# ---------------------------------------------------------------------------

def _bicubic_kernel(x: np.ndarray, a: float = -0.5) -> np.ndarray:
    """Catmull-Rom cubic kernel, identical to Pillow's BICUBIC filter."""
    x = np.abs(x)
    out = np.zeros_like(x)
    m1 = x < 1.0
    m2 = (x >= 1.0) & (x < 2.0)
    out[m1] = ((a + 2.0) * x[m1] - (a + 3.0)) * x[m1] * x[m1] + 1.0
    out[m2] = (((x[m2] - 5.0) * x[m2] + 8.0) * x[m2] - 4.0) * a
    return out


def _bilinear_kernel(x: np.ndarray) -> np.ndarray:
    x = np.abs(x)
    return np.clip(1.0 - x, 0.0, None)


def _lanczos_kernel(x: np.ndarray, a: int = 3) -> np.ndarray:
    y = np.sinc(x) * np.sinc(x / a)
    y[np.abs(x) >= a] = 0.0
    return y


_FILTERS = {
    "bicubic": (_bicubic_kernel, 2.0),
    "bilinear": (_bilinear_kernel, 1.0),
    "lanczos": (_lanczos_kernel, 3.0),
    "nearest": (None, 0.0),
}


@functools.lru_cache(maxsize=512)
def resize_weights(in_size: int, out_size: int, filter: str = "bicubic") -> np.ndarray:
    """(out_size, in_size) float32 row-stochastic interpolation matrix.

    Reproduces Pillow's ``precompute_coeffs``: output pixel centers at
    ``(i + 0.5) * scale``, filter support scaled by ``max(scale, 1)`` (i.e.
    antialiasing on downscale), window clipped to the image *before*
    normalization (Pillow renormalizes over the clipped window at borders).
    """
    if filter == "nearest":
        w = np.zeros((out_size, in_size), dtype=np.float32)
        scale = in_size / out_size
        idx = np.minimum((np.arange(out_size) * scale).astype(np.int64), in_size - 1)
        w[np.arange(out_size), idx] = 1.0
        return w

    kernel_fn, support = _FILTERS[filter]
    scale = in_size / out_size
    filterscale = max(scale, 1.0)
    support = support * filterscale

    weights = np.zeros((out_size, in_size), dtype=np.float64)
    for i in range(out_size):
        center = (i + 0.5) * scale
        lo = max(int(center - support + 0.5), 0)
        hi = min(int(center + support + 0.5), in_size)
        taps = np.arange(lo, hi, dtype=np.float64)
        w = kernel_fn((taps + 0.5 - center) / filterscale)
        s = w.sum()
        if s != 0:
            w = w / s
        weights[i, lo:hi] = w
    return weights.astype(np.float32)


def resize(img: jnp.ndarray, out_h: int, out_w: int, filter: str = "bicubic") -> jnp.ndarray:
    """Resize (..., H, W, C) float image with Pillow-parity separable filtering.

    Runs as two matmuls so batches hit the MXU.
    """
    h, w = img.shape[-3], img.shape[-2]
    wh = jnp.asarray(resize_weights(h, out_h, filter))
    ww = jnp.asarray(resize_weights(w, out_w, filter))
    # (..., H, W, C): contract H then W.
    out = jnp.einsum("oh,...hwc->...owc", wh, img)
    out = jnp.einsum("pw,...owc->...opc", ww, out)
    return out


@functools.lru_cache(maxsize=512)
def kron_resize_weights(in_size: int, out_size: int, channels: int,
                        filter: str = "bicubic") -> np.ndarray:
    """(out_size*C, in_size*C) block matrix kron(W, I_C): resizes the W axis
    of a channel-interleaved (..., H, W*C) image in one matmul."""
    w = resize_weights(in_size, out_size, filter)
    return np.kron(w, np.eye(channels, dtype=np.float32))


def resize_flat(img: jnp.ndarray, out_h: int, out_w: int, channels: int,
                filter: str = "bicubic") -> jnp.ndarray:
    """Resize a channel-flattened (..., H, W*C) image -> (..., out_h, out_w*C).

    TPU layout: a (..., H, W, 3) array wastes ~42/128 lanes (minor dim 3 is
    padded to the 128-lane tile), so resize matmuls on that form move and
    multiply mostly padding — measured ~4 s for a 128x512x512x3 batch on
    v5e vs ~40 ms on this flat form. The H pass contracts over H with the
    well-tiled W*C minor axis free; the W pass uses kron(W, I_C) so the
    channel interleave never has to be separated. Numerics are identical to
    `resize` (same coefficients, same contraction order).
    """
    h, wc = img.shape[-2], img.shape[-1]
    w_in = wc // channels
    wh = jnp.asarray(resize_weights(h, out_h, filter))
    kw = jnp.asarray(kron_resize_weights(w_in, out_w, channels, filter))
    out = jnp.einsum("oh,...hx->...ox", wh, img)
    return jnp.einsum("px,...ox->...op", kw, out)


def pad_square_flat(img: jnp.ndarray, channels: int, fill_rgb) -> jnp.ndarray:
    """pad_square for channel-flattened (..., H, W*C) images."""
    h, wc = img.shape[-2], img.shape[-1]
    w = wc // channels
    if h == w:
        return img
    side = max(h, w)
    fill = jnp.tile(jnp.asarray(fill_rgb, dtype=img.dtype), side)
    out = jnp.broadcast_to(fill, img.shape[:-2] + (side, side * channels))
    if w > h:
        top = (side - h) // 2
        return out.at[..., top:top + h, :].set(img)
    left = (side - w) // 2
    return out.at[..., :, left * channels:(left + w) * channels].set(img)


def center_crop_flat(img: jnp.ndarray, crop_h: int, crop_w: int,
                     channels: int) -> jnp.ndarray:
    """center_crop for channel-flattened (..., H, W*C) images."""
    h, wc = img.shape[-2], img.shape[-1]
    w = wc // channels
    top = (h - crop_h) // 2
    left = (w - crop_w) // 2
    return img[..., top:top + crop_h,
               left * channels:(left + crop_w) * channels]


def normalize_flat(img: jnp.ndarray, mean, std) -> jnp.ndarray:
    """Channel-normalize a (..., W*C) channel-flattened float image."""
    w = img.shape[-1] // len(mean)
    m = jnp.tile(jnp.asarray(mean, dtype=img.dtype), w)
    s = jnp.tile(jnp.asarray(std, dtype=img.dtype), w)
    return (img - m) / s


def patchify_flat(img: jnp.ndarray, patch: int, channels: int) -> jnp.ndarray:
    """(..., H, W*C) -> (..., H/p * W/p, p*p*C) patches, features ordered
    (ph, pw, c). Pair with a conv weight whose rows are permuted by
    `patch_perm(patch, channels)` (conv weights flatten as (c, ph, pw))."""
    *lead, h, wc = img.shape
    w = wc // channels
    gh, gw = h // patch, w // patch
    x = img.reshape(*lead, gh, patch, gw, patch * channels)
    x = jnp.swapaxes(x, -3, -2)
    return x.reshape(*lead, gh * gw, patch * patch * channels)


@functools.lru_cache(maxsize=64)
def patch_perm(patch: int, channels: int) -> np.ndarray:
    """Row permutation taking a (C, ph, pw)-flattened patch-embed weight to
    the (ph, pw, c) feature order emitted by `patchify_flat`."""
    idx = np.arange(channels * patch * patch).reshape(channels, patch, patch)
    return np.ascontiguousarray(np.transpose(idx, (1, 2, 0)).reshape(-1))


def resize_shortest_side(img_hw: tuple[int, int], target: int) -> tuple[int, int]:
    """Output (H, W) after resizing so the shortest side equals ``target``.

    Matches torchvision ``Resize(target)`` on a PIL image.
    """
    h, w = img_hw
    if h <= w:
        return target, max(1, int(round(w * target / h)))
    return max(1, int(round(h * target / w))), target


def pad_square(img: jnp.ndarray, fill_rgb) -> jnp.ndarray:
    """Pad (..., H, W, C) float image to square with a background color,
    image centered — device twin of media.images.expand2square_np
    (reference mm_utils.py:128-139). Static shapes; no-op when H == W."""
    h, w = img.shape[-3], img.shape[-2]
    if h == w:
        return img
    side = max(h, w)
    fill = jnp.asarray(fill_rgb, dtype=img.dtype)
    out = jnp.broadcast_to(fill, img.shape[:-3] + (side, side, img.shape[-1]))
    if w > h:
        top = (side - h) // 2
        return out.at[..., top:top + h, :, :].set(img)
    left = (side - w) // 2
    return out.at[..., :, left:left + w, :].set(img)


def center_crop(img: jnp.ndarray, crop_h: int, crop_w: int) -> jnp.ndarray:
    """Center-crop (..., H, W, C), matching torchvision CenterCrop."""
    h, w = img.shape[-3], img.shape[-2]
    top = (h - crop_h) // 2
    left = (w - crop_w) // 2
    return img[..., top : top + crop_h, left : left + crop_w, :]


def normalize(img: jnp.ndarray, mean, std) -> jnp.ndarray:
    """Channel-normalize a (..., C) float image in [0, 1]."""
    mean = jnp.asarray(mean, dtype=img.dtype)
    std = jnp.asarray(std, dtype=img.dtype)
    return (img - mean) / std


def to_float(img_uint8: jnp.ndarray) -> jnp.ndarray:
    return img_uint8.astype(jnp.float32) / 255.0


def patchify(img: jnp.ndarray, patch: int) -> jnp.ndarray:
    """(..., H, W, C) -> (..., H/p * W/p, p*p*C) patch flattening.

    Turns the ViT patch-embedding conv into a plain matmul (MXU-friendly):
    ``patchify(img, p) @ W`` where ``W`` is the flattened conv kernel.
    Flattening order matches a conv with kernel laid out (C, p, p) per
    output channel when the weight converter uses `convert.py`.
    """
    *lead, h, w, c = img.shape
    gh, gw = h // patch, w // patch
    x = img.reshape(*lead, gh, patch, gw, patch, c)
    # -> (..., gh, gw, c, patch_h, patch_w): match torch Conv2d weight
    # (out, C, kh, kw) flattened as C*kh*kw.
    x = jnp.moveaxis(x, (-4, -2), (-2, -1))  # (..., gh, gw, c, ph, pw)
    return x.reshape(*lead, gh * gw, c * patch * patch)


def smart_resize(height: int, width: int, factor: int = 28,
                 min_pixels: int = 56 * 56, max_pixels: int = 14 * 14 * 4 * 1280) -> tuple[int, int]:
    """Qwen-VL smart_resize geometry: snap H/W to multiples of ``factor``
    while keeping total pixels within [min_pixels, max_pixels] and preserving
    aspect ratio (reference behavior: qwen_vl_utils.process_vision_info used at
    t2v_metrics/models/vqascore_models/qwen2vl_model.py:201-203).
    """
    import math

    if max(height, width) / min(height, width) > 200:
        raise ValueError("absolute aspect ratio must be smaller than 200")
    h_bar = max(factor, round(height / factor) * factor)
    w_bar = max(factor, round(width / factor) * factor)
    if h_bar * w_bar > max_pixels:
        beta = math.sqrt((height * width) / max_pixels)
        h_bar = max(factor, math.floor(height / beta / factor) * factor)
        w_bar = max(factor, math.floor(width / beta / factor) * factor)
    elif h_bar * w_bar < min_pixels:
        beta = math.sqrt(min_pixels / (height * width))
        h_bar = math.ceil(height * beta / factor) * factor
        w_bar = math.ceil(width * beta / factor) * factor
    return h_bar, w_bar


# ---------------------------------------------------------------------------
# Host-side numpy variants (used by the media layer before device transfer)
# ---------------------------------------------------------------------------

def resize_np(img: np.ndarray, out_h: int, out_w: int, filter: str = "bicubic",
              quantize_uint8: bool = False) -> np.ndarray:
    """Numpy resize with the same weights (host path; PIL parity).

    ``quantize_uint8=True`` replicates Pillow's uint8 pipeline exactly:
    horizontal pass first, round-half-up + clip to [0, 255] between the two
    separable passes (Pillow's ``ImagingResampleHorizontal_8bpc`` emits a
    quantized intermediate image, clipping the cubic overshoot).
    """
    h, w = img.shape[-3], img.shape[-2]
    wh = resize_weights(h, out_h, filter)
    ww = resize_weights(w, out_w, filter)
    x = img.astype(np.float32)
    if quantize_uint8:
        x = np.einsum("pw,...hwc->...hpc", ww, x, optimize=True)  # horizontal
        x = np.clip(np.floor(x + 0.5), 0.0, 255.0)
        x = np.einsum("oh,...hpc->...opc", wh, x, optimize=True)  # vertical
        return np.clip(np.floor(x + 0.5), 0.0, 255.0)
    out = np.einsum("oh,...hwc->...owc", wh, x, optimize=True)
    return np.einsum("pw,...owc->...opc", ww, out, optimize=True)
