"""Fused Pallas normalization kernels.

The reference runs HF models under torch autocast, where LayerNorm is a
single fused CUDA kernel with fp32 statistics. XLA's default lowering of
the same computation materializes an fp32 copy of the bf16 activation in
HBM and re-reads it for each reduction — profiled at ~6x the roofline on
v5e for the CLIP ViT shapes (`convert_reduce_fusion`, ~170 ms of a 520 ms
encode). This kernel reads each bf16 tile once, computes mean/variance in
fp32 in VMEM, and writes the normalized bf16 tile back.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend optional at import time (CPU test envs)
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

_ROW_BLOCKS = (1024, 512, 256, 128, 64, 32, 16, 8)


def _pick_block(rows: int, d: int) -> int:
    """Largest row block dividing `rows` whose tile fits scoped VMEM: the
    kernel holds the bf16 in/out tiles plus fp32 intermediates, ~14 bytes
    per element — cap the tile at 2^20 elements (~14 MB of the 36 MB
    scoped-vmem budget; 1024x2048 tiles OOM'd at d_model=2048)."""
    return next(b for b in _ROW_BLOCKS
                if rows % b == 0 and b * d <= 1 << 20)

# Read once at import: this feeds trace-time kernel dispatch inside jitted
# callers, so a post-import change would silently not apply to already-
# compiled shapes (set before importing the package instead).
import os as _os
FUSED_LN = _os.environ.get("T2V_FUSED_LN", "1") == "1"
FUSED_RMS = _os.environ.get("T2V_FUSED_RMS", "0") == "1"  # see layers.rms_norm


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _fused_ok(x: jnp.ndarray) -> bool:
    """Tile-aligned 2D+ shapes on TPU: lane dim a 128 multiple, rows a
    multiple of 8 (so some row block divides them evenly)."""
    if not FUSED_LN or pltpu is None:
        return False
    if not _on_tpu() or x.ndim < 2:
        return False
    d = x.shape[-1]
    rows = 1
    for s in x.shape[:-1]:
        rows *= s
    return d % 128 == 0 and d <= 8192 and rows % 8 == 0 and rows >= 8


def _ln_kernel(x_ref, s_ref, b_ref, o_ref, *, eps, d):
    x = x_ref[...].astype(jnp.float32)          # (rows_blk, D)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps) * s_ref[0]
    if b_ref is not None:
        y = y + b_ref[0]
    o_ref[...] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def layer_norm_fused(x: jnp.ndarray, scale: jnp.ndarray,
                     bias: jnp.ndarray | None, eps: float = 1e-5,
                     interpret: bool = False) -> jnp.ndarray:
    """LayerNorm over the last axis; one HBM read + one write per element."""
    shape = x.shape
    d = shape[-1]
    rows = x.size // d
    xf = x.reshape(rows, d)
    blk = _pick_block(rows, d)

    s32 = scale.astype(jnp.float32).reshape(1, d)
    args = [xf, s32]
    in_specs = [
        pl.BlockSpec((blk, d), lambda i: (i, 0)),
        pl.BlockSpec((1, d), lambda i: (0, 0)),
    ]
    if bias is not None:
        args.append(bias.astype(jnp.float32).reshape(1, d))
        in_specs.append(pl.BlockSpec((1, d), lambda i: (0, 0)))

    def kernel(*refs):
        x_ref, s_ref = refs[0], refs[1]
        b_ref = refs[2] if bias is not None else None
        _ln_kernel(x_ref, s_ref, b_ref, refs[-1], eps=eps, d=d)

    out = pl.pallas_call(
        kernel,
        grid=(rows // blk,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((blk, d), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, d), x.dtype),
        interpret=interpret,
    )(*args)
    return out.reshape(shape)


def _rms_kernel(x_ref, s_ref, o_ref, *, eps, offset, cast_weight_dtype):
    x = x_ref[...].astype(jnp.float32)          # (rows_blk, D)
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    y = x * jax.lax.rsqrt(var + eps)
    s = s_ref[0]
    if cast_weight_dtype:
        # HF T5: the normalized fp32 value is cast back to the weight dtype
        # BEFORE the scale multiply — bit-parity requires the same rounding.
        y = y.astype(s.dtype)
    w = s + offset if offset else s
    o_ref[...] = (w * y).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("eps", "offset", "cast_weight_dtype",
                                    "interpret"))
def rms_norm_fused(x: jnp.ndarray, scale: jnp.ndarray, eps: float = 1e-6,
                   offset: float = 0.0, cast_weight_dtype: bool = True,
                   interpret: bool = False) -> jnp.ndarray:
    """RMSNorm over the last axis; one HBM read + one write per element.

    Same XLA-materialization story as LayerNorm: the default lowering of
    the fp32-statistics RMSNorm round-trips an fp32 copy of the bf16
    activation through HBM per reduction. T5's encoder runs 2 of these per
    layer over (B, S, d_model) — at the flagship chunk shape that fp32
    traffic is ~10% of encoder wall time (measured v5e).
    """
    shape = x.shape
    d = shape[-1]
    rows = x.size // d
    xf = x.reshape(rows, d)
    blk = _pick_block(rows, d)

    out = pl.pallas_call(
        functools.partial(_rms_kernel, eps=eps, offset=offset,
                          cast_weight_dtype=cast_weight_dtype),
        grid=(rows // blk,),
        in_specs=[pl.BlockSpec((blk, d), lambda i: (i, 0)),
                  pl.BlockSpec((1, d), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((blk, d), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, d), x.dtype),
        interpret=interpret,
    )(xf, scale.reshape(1, d))
    return out.reshape(shape)
