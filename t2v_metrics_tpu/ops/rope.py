"""Fused packed-QKV rotary embedding (Pallas, TPU).

Applies rotate-half RoPE to the q|k lane region of a packed (B, S, L)
qkv activation in ONE HBM read + ONE HBM write. The XLA lowering of the
same math (slice the qk region, upcast, rotate-half via split+concat,
multiply-add, downcast, re-concat with v) materializes ~4-5 full-tensor
passes per layer — profiled at ~1.3 ms/layer bf16 (~4 ms/layer via the
HF-style f32 chain) on the Qwen2.5-VL video vision tower, rivaling the
layer's matmuls. Reference behavior being matched: HF
modeling_qwen2_5_vl.py apply_rotary_pos_emb_vision /
apply_multimodal_rotary_pos_emb (reference repo consumes them via
qwen2vl_model.py:169-301).

Kernel math, on lane j of the packed row (D = head_dim, h = D // 2):
    rot[j]  = -x[j + h]   if j mod D <  h     (same head: j mod D + h < D)
            = +x[j - h]   if j mod D >= h
    out[j]  = x[j] * cos[j mod D] + rot[j] * sin[j mod D]   (f32, in VMEM)
for j < rot_heads * D; v lanes (j >= rot_heads * D) pass through. The
two shifted reads are whole-block lane rolls (pltpu.roll) — the roll's
wraparound lanes are never selected, and a +-h shift never crosses a
head boundary on the selected side. cos/sin arrive as (B, S, D) and are
lane-tiled in VMEM via pltpu.repeat.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Default on: exact-math replacement for the XLA chain (f32 compute in
# VMEM). T2V_ROPE_KERNEL=0 falls back to jnp (models/decoder.py).
ROPE_KERNEL = os.environ.get("T2V_ROPE_KERNEL", "1") == "1"

_BS = 128  # rows per block: every seq/patch bucket is a multiple

# Packed lane-width ceiling. The kernel's per-block f32 intermediates
# (x, lane-tiled cos/sin, two rolls, rot, out over a (_BS, L) block) grow
# linearly in L; Mosaic spills/streams them well past naive VMEM math,
# but compilation genuinely fails for very wide rows. Measured on v5e
# (2026-08): L=24576 compiles+runs, L=32768 fails in tpu_compile — so
# every shipped config (largest: qwen2.5-vl-72b decoder L=10240) is safe,
# and anything wider falls back to the jnp chain instead of crashing.
_MAX_LANES = int(os.environ.get("T2V_ROPE_MAX_LANES", 24576))


def _kernel(pk_ref, cos_ref, sin_ref, o_ref, *, d, rot_lanes):
    x = pk_ref[0].astype(jnp.float32)                  # (bs, L)
    L = x.shape[-1]
    reps = L // d
    c = pltpu.repeat(cos_ref[0].astype(jnp.float32), reps, axis=1)
    s = pltpu.repeat(sin_ref[0].astype(jnp.float32), reps, axis=1)
    h = d // 2
    left = pltpu.roll(x, shift=L - h, axis=1)          # x[j + h]
    right = pltpu.roll(x, shift=h, axis=1)             # x[j - h]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    rot = jnp.where(lane % d < h, -left, right)
    out = x * c + rot * s
    out = jnp.where(lane < rot_lanes, out, x)
    o_ref[0] = out.astype(o_ref.dtype)


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def use_kernel(b, s, L, rot_heads, d) -> bool:
    """Kernel legality + platform gate (callers keep the jnp chain as the
    fallback — models/decoder.py apply_rope_bshd)."""
    return (ROPE_KERNEL and _on_tpu() and s % _BS == 0 and L % d == 0
            and d % 2 == 0 and rot_heads * d <= L and L <= _MAX_LANES)


@functools.partial(jax.jit, static_argnames=("rot_heads", "d", "interpret"))
def rope_pack(packed: jnp.ndarray,      # (B, S, L) packed q|k|v rows
              cos: jnp.ndarray,         # (B, S, D)
              sin: jnp.ndarray,         # (B, S, D)
              rot_heads: int, d: int, interpret: bool = False) -> jnp.ndarray:
    b, s, L = packed.shape
    grid = (b, s // _BS)
    return pl.pallas_call(
        functools.partial(_kernel, d=d, rot_lanes=rot_heads * d),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, _BS, L), lambda bi, si: (bi, si, 0)),
            pl.BlockSpec((1, _BS, d), lambda bi, si: (bi, si, 0)),
            pl.BlockSpec((1, _BS, d), lambda bi, si: (bi, si, 0)),
        ],
        out_specs=pl.BlockSpec((1, _BS, L), lambda bi, si: (bi, si, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s, L), packed.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(packed, cos, sin)
