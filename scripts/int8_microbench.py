"""int8-vs-bf16 matmul microbench on the real chip (round-5 quant gate).

Validates the premise of the W8A8 T5 path (VERDICT r4 item 2a): v5e's MXU
runs s8xs8->s32 at 2x the bf16 rate (394 vs 197 peak TOPS). Measures, at
the headline bench shapes (chunk=128 pairs x enc_seq=640 rows, xxl
widths), a forward (K->N) + back (N->K) matmul chain — the carry flows
through EVERY output element of both matmuls, so XLA cannot slice or DCE
any part of the measured work (an earlier version carried y[:, :K] and
XLA legally shrank the matmul to a quarter of its columns):

  * bf16 chain                  (the current production path)
  * full W8A8 chain: dynamic per-row activation quant + int8 dot + f32
    dequant epilogue each hop (what the production quant path pays)

Timing protocol per NOTES_NEXT_ROUND.md: lax.fori_loop chains with a
loop-carried dependency, distinct traced seed per repeat (the axon tunnel
caches byte-identical executions), one tiny fetch as the only sync point,
best of N repeats. TFLOPs counts BOTH matmuls (4*R*K*N per iter).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=128 * 640)
    ap.add_argument("--d-in", type=int, default=4096)
    ap.add_argument("--d-out", type=int, default=10240)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    from t2v_metrics_tpu.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    import jax
    import jax.numpy as jnp
    from jax import lax
    from t2v_metrics_tpu.ops import quant as Qz

    R, K, N = args.rows, args.d_in, args.d_out
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (R, K)), jnp.bfloat16)
    w_fwd = jnp.asarray(rng.normal(0, 0.02, (K, N)), jnp.bfloat16)
    w_bwd = jnp.asarray(rng.normal(0, 0.02, (N, K)), jnp.bfloat16)
    qw_fwd = Qz.quantize_weight(w_fwd)
    qw_bwd = Qz.quantize_weight(w_bwd)

    def timed(fn, *a, iters=args.iters, repeats=args.repeats):
        f = jax.jit(fn, static_argnames=("n",))
        out = f(*a, jnp.bfloat16(0), n=iters)
        np.asarray(out.ravel()[:1])
        best = float("inf")
        for r in range(repeats):
            t0 = time.perf_counter()
            out = f(*a, jnp.bfloat16(r + 1), n=iters)
            np.asarray(out.ravel()[:1])
            best = min(best, (time.perf_counter() - t0) / iters)
        return best

    def bf16_chain(x, wf, wb, seed, n):
        def body(_, carry):
            h = carry @ wf                       # (R, N)
            y = h @ wb                           # (R, K)
            return carry + y * (seed * 1e-30)
        return lax.fori_loop(0, n, body, x)[:1, :1]

    t_bf16 = timed(bf16_chain, x, w_fwd, w_bwd)

    def w8a8_chain(x, qf, qb, seed, n):
        def body(_, carry):
            h = Qz.int8_matmul(carry, qf["w_q"], qf["scale"])   # (R, N)
            y = Qz.int8_matmul(h, qb["w_q"], qb["scale"])       # (R, K)
            return carry + y * (seed * 1e-30)
        return lax.fori_loop(0, n, body, x)[:1, :1]

    t_w8a8 = timed(w8a8_chain, x, qw_fwd, qw_bwd)

    # epilogue isolation: same two int8 dots, but requantize between hops
    # with a cheap INT epilogue (shift+clip) instead of the production
    # f32 dequant -> bf16 -> per-row requant. The delta vs w8a8_chain is
    # what the f32 epilogue + activation quant passes cost — if it
    # tracks the extra HBM bytes, a Pallas fused-epilogue matmul kernel
    # recovers it.
    xq0 = jnp.asarray(np.random.default_rng(7).integers(-127, 128, (R, K)),
                      jnp.int8)

    def int_epi_chain(xq, qf, qb, seed, n):
        def body(_, carry):
            h32 = lax.dot_general(carry, qf["w_q"], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
            h8 = jnp.clip(h32 >> 12, -127, 127).astype(jnp.int8)
            y32 = lax.dot_general(h8, qb["w_q"], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
            y8 = jnp.clip(y32 >> 12, -127, 127).astype(jnp.int8)
            return jnp.where(seed > jnp.bfloat16(0), y8, carry)
        return lax.fori_loop(0, n, body, xq)[:1, :1].astype(jnp.bfloat16)

    t_intepi = timed(int_epi_chain, xq0, qw_fwd, qw_bwd)

    # bf16 epilogue variant: convert the accumulator to bf16 FIRST (a
    # pure convert may fuse into the dot output the way the integer
    # epilogue does), then scale in bf16 — halves the unfused epilogue
    # bytes if the convert fuses. Costs one extra bf16 rounding of the
    # accumulator (~2^-8 relative) on top of the inherent quant noise.
    def w8a8_bf16epi_chain(x, qf, qb, seed, n):
        def hop(v, q):
            cf = v.astype(jnp.float32)
            amax = jnp.max(jnp.abs(cf), axis=-1, keepdims=True)
            xs = jnp.maximum(amax, 1e-12) / 127.0
            xq = jnp.round(cf / xs).astype(jnp.int8)
            acc = lax.dot_general(xq, q["w_q"], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
            return (acc.astype(jnp.bfloat16)
                    * xs.astype(jnp.bfloat16)
                    * q["scale"].astype(jnp.bfloat16))

        def body(_, carry):
            y = hop(hop(carry, qf), qb)
            return carry + y * (seed * 1e-30)
        return lax.fori_loop(0, n, body, x)[:1, :1]

    t_bf16epi = timed(w8a8_bf16epi_chain, x, qw_fwd, qw_bwd)

    flops = 4.0 * R * K * N                      # two matmuls per iter
    out = {
        "shape": [R, K, N],
        "bf16_ms": round(t_bf16 * 1e3, 3),
        "bf16_tflops": round(flops / t_bf16 / 1e12, 1),
        "w8a8_e2e_ms": round(t_w8a8 * 1e3, 3),
        "w8a8_e2e_tops": round(flops / t_w8a8 / 1e12, 1),
        "w8a8_speedup_vs_bf16": round(t_bf16 / t_w8a8, 2),
        "int8_int_epilogue_ms": round(t_intepi * 1e3, 3),
        "int8_int_epilogue_tops": round(flops / t_intepi / 1e12, 1),
        "f32_epilogue_overhead_ms": round((t_w8a8 - t_intepi) * 1e3, 3),
        "w8a8_bf16_epilogue_ms": round(t_bf16epi * 1e3, 3),
        "w8a8_bf16_epilogue_tops": round(flops / t_bf16epi / 1e12, 1),
        "platform": jax.devices()[0].platform,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
