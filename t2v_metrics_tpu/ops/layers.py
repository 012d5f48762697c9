"""Shared neural-net layer primitives (functional, pytree params).

All layers are pure functions over parameter pytrees so that ``jit`` /
``NamedSharding`` compose trivially. Norm statistics and softmax run in fp32
regardless of activation dtype — required for score parity with the reference
(HF computes LayerNorm/softmax in fp32 under bf16 autocast).
"""

from __future__ import annotations

import os as _os

import jax
import jax.numpy as jnp

# Structural fusion barriers at residual joins (value-identity). The r4
# video trace showed the ViT down-projection dot fused with residual add
# + the NEXT layer's norm stats into kOutput fusions timing ~10 ms each
# (~6% MXU). A/B on chip (r5): barrier OFF 12.08 pairs/s vs ON 12.00 —
# the barrier does NOT help (the fused dot was not actually the bound;
# see NOTES_NEXT_ROUND.md video breakdown), so it defaults off and stays
# available for future layout experiments via T2V_FUSION_BARRIERS=1.
FUSION_BARRIERS = _os.environ.get("T2V_FUSION_BARRIERS", "0") == "1"


def layer_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray | None,
               eps: float = 1e-5) -> jnp.ndarray:
    """Standard LayerNorm with fp32 statistics.

    On TPU, tile-aligned shapes go through a fused Pallas kernel: XLA's
    lowering converts the whole bf16 activation to an fp32 HBM intermediate
    and re-reads it per reduction (profiled ~3.6 ms per (128,577,1024) LN
    on v5e vs ~0.4 ms roofline); the kernel keeps the fp32 form in VMEM.
    """
    from .norms import layer_norm_fused, _fused_ok

    if _fused_ok(x):
        return layer_norm_fused(x, scale, bias, eps)
    return layer_norm_xla(x, scale, bias, eps)


def layer_norm_xla(x: jnp.ndarray, scale: jnp.ndarray,
                   bias: jnp.ndarray | None, eps: float = 1e-5) -> jnp.ndarray:
    """Reference XLA LayerNorm (ground truth for the fused kernel)."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(dtype)


def rms_norm(x: jnp.ndarray, scale: jnp.ndarray, eps: float = 1e-6,
             offset: float = 0.0, cast_weight_dtype: bool = True) -> jnp.ndarray:
    """T5/Llama-style RMSNorm (no mean subtraction, no bias), fp32 accumulate.

    ``offset=1.0`` gives the Gemma convention ``x * (1 + scale)``.
    ``cast_weight_dtype``: HF T5 multiplies the normalized fp32 value after
    casting it back to the weight dtype; keep True for parity.
    """
    # Unlike LayerNorm, the XLA lowering of RMSNorm fuses into the
    # consuming matmul's operand read: swapping in the Pallas kernel
    # (norms.rms_norm_fused) measured *slower* at the flagship shapes
    # (T5 enc 1220 -> 1266 ms/chunk on v5e) because the pallas_call is a
    # fusion barrier. Kept available behind T2V_FUSED_RMS=1 for regimes
    # where the norm is not matmul-adjacent.
    from .norms import rms_norm_fused, _fused_ok, FUSED_RMS

    if FUSED_RMS and _fused_ok(x):
        return rms_norm_fused(x, scale, eps, offset, cast_weight_dtype)
    return rms_norm_xla(x, scale, eps, offset, cast_weight_dtype)


def rms_norm_xla(x: jnp.ndarray, scale: jnp.ndarray, eps: float = 1e-6,
                 offset: float = 0.0,
                 cast_weight_dtype: bool = True) -> jnp.ndarray:
    """Reference XLA RMSNorm (ground truth for the fused kernel)."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    y = x32 * jax.lax.rsqrt(var + eps)
    if cast_weight_dtype:
        y = y.astype(scale.dtype)
    w = scale + offset if offset else scale
    return (w * y).astype(dtype)


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """CLIP's QuickGELU: x * sigmoid(1.702 x)."""
    return x * jax.nn.sigmoid(1.702 * x)


def gelu_new(x: jnp.ndarray) -> jnp.ndarray:
    """HF 'gelu_new' / tanh-approximate GELU (used by FlanT5 gated MLP)."""
    return jax.nn.gelu(x, approximate=True)


def gelu_exact(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.gelu(x, approximate=False)


ACT_FNS = {
    "quick_gelu": quick_gelu,
    "gelu_new": gelu_new,
    "gelu": gelu_exact,
    "gelu_pytorch_tanh": gelu_new,
    "relu": jax.nn.relu,
    "silu": jax.nn.silu,
}


def linear(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray | None = None) -> jnp.ndarray:
    """x @ w (+ b). Weights stored (in, out)."""
    y = x @ w
    if b is not None:
        y = y + b
    return y


def softmax_fp32(logits: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Numerically-stable softmax computed in fp32, returned in fp32."""
    return jax.nn.softmax(logits.astype(jnp.float32), axis=axis)


def log_softmax_fp32(logits: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    return jax.nn.log_softmax(logits.astype(jnp.float32), axis=axis)


def split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """(..., S, H*D) -> (..., H, S, D)"""
    *lead, s, hd = x.shape
    x = x.reshape(*lead, s, num_heads, hd // num_heads)
    return jnp.moveaxis(x, -2, -3)


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    """(..., H, S, D) -> (..., S, H*D)"""
    x = jnp.moveaxis(x, -3, -2)
    *lead, s, h, d = x.shape
    return x.reshape(*lead, s, h * d)
