"""Pallas W8A8 matmul with the dequant epilogue fused into the dot.

EXPERIMENT, DEFAULT OFF (T2V_QUANT_KERNEL=1 to enable). Motivation: XLA
fuses *integer* elementwise consumers into an s8xs8 dot's output but NOT
the f32 dequant chain, which materializes the int32 accumulator in HBM —
measured 7.7 ms/iter of pure HBM traffic at the xxl shapes
(scripts/int8_microbench.py `f32_epilogue_overhead_ms`; the int-epilogue
variant reaches 334 TOPS = 85% of v5e int8 peak vs 282 with the f32
epilogue).

MEASURED OUTCOME (2026-08-19, v5e): inside Mosaic, `dot_general(s8, s8,
preferred int32)` does NOT hit the MXU's native int8 path — the chain
ran at 95.8 TOPS ≈ 394/4, i.e. exactly the int32 MXU rate, 3.5x slower
than XLA's int8 dot. Until Mosaic exposes native int8 MXU matmuls, the
XLA path (unfused epilogue and all) is strictly faster, so
ops/quant.int8_matmul keeps XLA as production and this kernel stays a
gated experiment with exact interpret-mode parity tests.

FOLLOW-UP (2026-08-20, v5e): a bf16-first XLA epilogue (convert the
int32 accumulator to bf16 before scaling, halving the unfused epilogue
bytes if the convert fused into the dot) recovers only 0.8 of the
8.5 ms epilogue+quant overhead at the xxl shapes (52.6 -> 51.7 ms vs
the 44.1 ms int-epilogue floor; `w8a8_bf16_epilogue_ms` in
scripts/int8_microbench.py) — the overhead is dominated by the dynamic
per-row activation-quant pass, not the dequant write, so the f32
epilogue stays production and no precision is traded away.

Design (standard K-innermost accumulation matmul, cf. pallas guide):
  grid = (M/bm, N/bn, K/bk), dimension_semantics (parallel, parallel,
  arbitrary). int32 accumulator tile (bm, bn) lives in VMEM scratch
  across the K steps; on the last K step the epilogue applies
  f32 row_scale (bm, 1) x col_scale (1, bn) and writes ONE bf16 tile.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

QUANT_KERNEL = os.environ.get("T2V_QUANT_KERNEL", "0") == "1"


def _kernel(x_ref, w_ref, xs_ref, ws_ref, o_ref, acc_ref, *, k_steps):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)

    @pl.when(ki == k_steps - 1)
    def _epilogue():
        # fused dequant: int32 -> f32, per-row x per-channel scales,
        # single bf16 tile write — the whole point of the kernel
        o_ref[:] = (acc_ref[:].astype(jnp.float32)
                    * xs_ref[:] * ws_ref[:]).astype(o_ref.dtype)


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def use_kernel(m: int, k: int, n: int) -> bool:
    """Legality gate: tile-aligned shapes only (callers fall back to the
    jnp chain)."""
    return (QUANT_KERNEL and _on_tpu()
            and m % 128 == 0 and k % 512 == 0 and n % 256 == 0)


@functools.partial(jax.jit,
                   static_argnames=("bm", "bk", "bn", "interpret"))
def quant_matmul(x_q: jnp.ndarray,      # (M, K) int8
                 w_q: jnp.ndarray,      # (K, N) int8
                 x_scale: jnp.ndarray,  # (M, 1) f32 per-row
                 w_scale: jnp.ndarray,  # (N,)  f32 per-channel
                 bm: int = 256, bk: int = 512, bn: int = 256,
                 interpret: bool = False) -> jnp.ndarray:
    M, K = x_q.shape
    K2, N = w_q.shape
    assert K == K2 and x_scale.shape == (M, 1) and w_scale.shape == (N,)
    k_steps = K // bk

    return pl.pallas_call(
        functools.partial(_kernel, k_steps=k_steps),
        grid=(M // bm, N // bn, k_steps),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda mi, ni, ki: (mi, ki)),
            pl.BlockSpec((bk, bn), lambda mi, ni, ki: (ki, ni)),
            pl.BlockSpec((bm, 1), lambda mi, ni, ki: (mi, 0)),
            pl.BlockSpec((1, bn), lambda mi, ni, ki: (0, ni)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda mi, ni, ki: (mi, ni)),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(x_q, w_q, x_scale, w_scale.reshape(1, N))
