"""Attention: Pallas TPU flash kernel + XLA reference fallback.

The reference delegates attention to torch SDPA / flash-attn-2 CUDA kernels
(`attn_implementation='sdpa'` in every adapter registry dict, e.g. reference
t2v_metrics/models/vqascore_models/qwen2vl_model.py:54). Here the TPU-native
equivalent is an online-softmax (flash) kernel written in Pallas:

  * grid = (heads, q_blocks, batch, k_blocks), k innermost ("arbitrary"
    semantics) with running max / normalizer / accumulator in VMEM scratch;
  * supports an additive bias (T5 relative-position bias, broadcast over
    batch), a key-padding mask, and causal masking — all resolved inside the
    kernel so the full (Sq, Sk) score matrix is never materialized in HBM;
  * fp32 accumulation on the MXU (`preferred_element_type`), bf16 I/O.

`attention()` dispatches to the Pallas kernel on TPU and to a plain-XLA
reference implementation elsewhere (CPU tests, tiny shapes).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend is optional at import time (CPU test envs)
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

NEG_INF = -1e30

# Kernel-tuning env vars are read ONCE at import: everything below feeds
# trace-time dispatch decisions inside jitted callers, so changing them
# after a shape has compiled would silently have no effect — freezing them
# at import makes that semantics explicit (set the env var before importing
# the package to change kernel selection).
#   T2V_ATTN_IMPL: "" (per-call dispatch) | "reference" (force the XLA
#     dense path everywhere — e.g. for AOT GSPMD compiles, where Mosaic
#     kernels cannot be auto-partitioned) | "flash"
FLASH_SINGLEK = os.environ.get("T2V_FLASH_SINGLEK", "1") == "1"
# packed-qkv kernel entry (lane-offset views of one fused projection);
# T2V_FLASH_PACKED=0 falls back to slicing the packed array apart
FLASH_PACKED = os.environ.get("T2V_FLASH_PACKED", "1") == "1"
FLASH_BATCH_GROUP = int(os.environ.get("T2V_FLASH_BATCH_GROUP", "8"))
FLASH_QCAP = int(os.environ.get("T2V_FLASH_QCAP", "768"))
FLASH_KCAP = int(os.environ.get("T2V_FLASH_KCAP", "1024"))
ATTN_IMPL_OVERRIDE = os.environ.get("T2V_ATTN_IMPL", "")


# ---------------------------------------------------------------------------
# Reference (XLA) implementation — ground truth for tests and CPU path
# ---------------------------------------------------------------------------

def attention_reference(q, k, v, bias=None, kv_mask=None, causal=False,
                        scale=None, segment_ids=None, local_window=None,
                        bidir_ids=None):
    """Softmax attention with fp32 softmax.

    q: (B, H, Sq, D); k, v: (B, H, Sk, D)
    bias: additive, broadcastable to (B, H, Sq, Sk)
    kv_mask: (B, Sk) bool, True = attend
    segment_ids: (B, S) int; position i may only attend j when
      segment_ids[i] == segment_ids[j] (requires Sq == Sk). Used for
      block-diagonal window attention (Qwen ViT) and packed sequences.
    local_window: sliding-window size W (with causal=True): position i
      attends [i-W+1, i] (Gemma3 local layers).
    bidir_ids: (B, S) int, -1 outside blocks; positions sharing a
      non-negative id attend each other bidirectionally ON TOP of the
      causal mask (Gemma3 image-token blocks). Requires Sq == Sk.
    """
    d = q.shape[-1]
    if scale is None:
        scale = d ** -0.5
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    s = s * scale
    if bias is not None:
        s = s + bias.astype(jnp.float32)
    if kv_mask is not None:
        s = jnp.where(kv_mask[:, None, None, :], s, NEG_INF)
    if segment_ids is not None:
        same = segment_ids[:, :, None] == segment_ids[:, None, :]
        s = jnp.where(same[:, None], s, NEG_INF)
    if causal or local_window is not None:
        sq, sk = s.shape[-2], s.shape[-1]
        row = jax.lax.broadcasted_iota(jnp.int32, (sq, sk), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (sq, sk), 1)
        # Align the causal diagonal to the *end* of the kv sequence so that
        # q position i attends kv positions <= i + (sk - sq).
        keep = col - (sk - sq) <= row
        if local_window is not None:
            keep = keep & (col - (sk - sq) > row - local_window)
        keep = jnp.broadcast_to(keep[None, None], s.shape)
        if bidir_ids is not None:
            # HF Gemma3 semantics: the image-block or-mask overrides the
            # sliding window too (token_type_ids_mask_function is or'd into
            # both full and sliding masks with no distance constraint).
            same = ((bidir_ids[:, :, None] == bidir_ids[:, None, :])
                    & (bidir_ids[:, :, None] >= 0))
            keep = keep | same[:, None]
        s = jnp.where(keep, s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


# ---------------------------------------------------------------------------
# Pallas flash kernel
# ---------------------------------------------------------------------------

def _rel_bias_block(rel_vec, row, col, rel_cfg):
    """T5 relative-position bias computed IN-KERNEL.

    rel_vec: (num_buckets,) f32 — this head's bias-per-bucket column.
    row/col: (block_q, block_k) global q/k indices.
    rel_cfg: (bidirectional, num_buckets, max_distance, q_offset) static.

    Replaces streaming a materialized (H, S, S) fp32 bias from HBM into
    every grid program (for B pairs that re-read is B*H*S^2*4 bytes per
    layer — the dominant HBM cost of T5 attention) with ~num_buckets
    VPU selects per tile. Mirrors models/t5.py relative_position_bucket.
    """
    import numpy as np

    bidirectional, nb, max_distance, q_offset = rel_cfg
    rel = col - (row + q_offset)  # memory - query
    if bidirectional:
        half = nb // 2
        b0 = jnp.where(rel > 0, half, 0)
        r = jnp.abs(rel)
        nb_eff = half
    else:
        b0 = jnp.zeros_like(rel)
        r = jnp.maximum(-rel, 0)
        nb_eff = nb
    max_exact = nb_eff // 2
    rl = max_exact + (
        jnp.log(r.astype(jnp.float32) / max_exact + 1e-9)
        / np.log(max_distance / max_exact) * (nb_eff - max_exact)
    ).astype(jnp.int32)
    rl = jnp.minimum(rl, nb_eff - 1)
    bucket = b0 + jnp.where(r < max_exact, r, rl)
    bias = jnp.zeros(rel.shape, jnp.float32)
    for b in range(nb):  # static unroll: bucket-count selects on the VPU
        bias += jnp.where(bucket == b, rel_vec[b], 0.0)
    return bias


def _flash_kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, segq_ref, segk_ref,
                  rel_ref, bidirq_ref, bidirk_ref, o_ref, m_scr, l_scr,
                  acc_scr, base_scr, *, scale, causal, sq, sk, block_q,
                  block_k, local_window=None, rel_cfg=None, single_k=False,
                  batch_group=1):
    kb = pl.program_id(3)
    nk = pl.num_programs(3)

    if not single_k:
        @pl.when(kb == 0)
        def _init():
            m_scr[:] = jnp.full_like(m_scr, NEG_INF)
            l_scr[:] = jnp.zeros_like(l_scr)
            acc_scr[:] = jnp.zeros_like(acc_scr)

    qb = pl.program_id(1)
    row = qb * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
    col = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
    neg = jnp.float32(NEG_INF)

    # Masks that do not depend on the batch item — computed once per
    # program, shared by every g in the batch group.
    def _base_block():
        base = jnp.zeros((block_q, block_k), jnp.float32)
        if rel_ref is not None:
            # select this head's (num_buckets,) bias column without dynamic
            # VMEM indexing: one-hot over the head axis
            nh, nb_ = rel_ref.shape
            hsel = (jax.lax.broadcasted_iota(jnp.int32, (nh, nb_), 0)
                    == pl.program_id(0))
            rel_vec = jnp.sum(jnp.where(hsel, rel_ref[:], 0.0), axis=0)
            base = base + _rel_bias_block(rel_vec, row, col, rel_cfg)
        # Padding beyond true kv length.
        return jnp.where(col < sk, base, neg)

    if base_scr is not None:
        # The T5 rel-bias block is ~num_buckets VPU selects over the full
        # (block_q, block_k) tile — identical for every batch program of a
        # given (head, q-block). The batch axis (grid dim 2) is
        # "arbitrary" (sequential) and iterates directly inside (h, q) on
        # the single-k path, so computing it once at b == 0 and carrying
        # it in scratch drops ~15/16 of the bias work (measured ~12% of
        # T5 encoder time at the flagship chunk shape).
        @pl.when(pl.program_id(2) == 0)
        def _fill_base():
            base_scr[:] = _base_block()

        base = base_scr[:]
    else:
        base = _base_block()
    causal_keep = None
    if causal or local_window is not None:
        causal_keep = col - (sk - sq) <= row
        if local_window is not None:
            causal_keep = causal_keep & (col - (sk - sq) > row - local_window)

    if single_k:
        # Whole KV in one block: direct softmax, no scratch, no correction.
        # `batch_group` items are processed in one program (static unroll):
        # at the hot shapes (d=64, S 577..640) each item's work is ~2 us
        # while Mosaic's per-program cost is ~4 us — grouping amortizes it
        # (measured on v5e: ViT encode attention 13.1 -> see ops tests).
        for g in range(batch_group):
            q = q_ref[g, 0]  # (block_q, D)
            k = k_ref[g, 0]  # (block_k, D)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            s = s + base
            if bias_ref is not None:
                s = s + bias_ref[g if bias_ref.shape[0] > 1 else 0,
                                 0].astype(jnp.float32)
            if mask_ref is not None:
                s = jnp.where(mask_ref[g, 0][None, :] != 0, s, neg)
            if segq_ref is not None:
                same = segq_ref[g, 0][:, None] == segk_ref[g, 0][None, :]
                s = jnp.where(same, s, neg)
            if causal_keep is not None:
                keep = causal_keep
                if bidirq_ref is not None:
                    # bidirectional image-group overlay (Gemma3/PaliGemma):
                    # same non-negative group id attends both ways,
                    # overriding the causal/window structure (HF or-mask
                    # semantics)
                    bq = bidirq_ref[g, 0]
                    bk = bidirk_ref[g, 0]
                    same = (bq[:, None] == bk[None, :]) & (bq[:, None] >= 0)
                    keep = keep | same
                s = jnp.where(keep, s, neg)
            m_new = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - jnp.where(m_new <= neg, 0.0, m_new))
            p = jnp.where(s <= neg, 0.0, p)
            l = jnp.sum(p, axis=-1, keepdims=True)
            acc = jax.lax.dot_general(
                p.astype(v_ref.dtype), v_ref[g, 0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            o_ref[g, 0] = (acc / jnp.where(l == 0.0, 1.0, l)).astype(o_ref.dtype)
        return

    assert batch_group == 1, "batch_group>1 requires a single kv block"
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    s = s + base
    if bias_ref is not None:
        s = s + bias_ref[0, 0].astype(jnp.float32)
    if mask_ref is not None:
        s = jnp.where(mask_ref[0, 0][None, :] != 0, s, neg)
    if segq_ref is not None:
        same = segq_ref[0, 0][:, None] == segk_ref[0, 0][None, :]
        s = jnp.where(same, s, neg)
    if causal_keep is not None:
        keep = causal_keep
        if bidirq_ref is not None:
            bq = bidirq_ref[0, 0]
            bk = bidirk_ref[0, 0]
            same = (bq[:, None] == bk[None, :]) & (bq[:, None] >= 0)
            keep = keep | same
        s = jnp.where(keep, s, neg)

    m_prev = m_scr[:, :1]                              # (block_q, 1)
    m_cur = jnp.max(s, axis=-1, keepdims=True)          # (block_q, 1)
    m_new = jnp.maximum(m_prev, m_cur)
    # Guard fully-masked rows: exp(NEG_INF - NEG_INF) would be exp(0)=1.
    p = jnp.exp(s - jnp.where(m_new <= neg, 0.0, m_new))
    p = jnp.where(s <= neg, 0.0, p)
    alpha = jnp.exp(jnp.where(m_new <= neg, 0.0, m_prev - m_new))
    alpha = jnp.where(m_prev <= neg, 0.0, alpha)

    l_new = alpha * l_scr[:, :1] + jnp.sum(p, axis=-1, keepdims=True)
    acc = acc_scr[:] * alpha + jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0, 0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)
    acc_scr[:] = acc

    @pl.when(kb == nk - 1)
    def _finish():
        l = l_scr[:, :1]
        o_ref[0, 0] = (acc_scr[:] / jnp.where(l == 0.0, 1.0, l)).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(
    jax.jit,
    static_argnames=("causal", "scale", "block_q", "block_k", "interpret",
                     "local_window", "rel_cfg"))
def flash_attention(q, k, v, bias=None, kv_mask=None, causal=False,
                    scale=None, block_q=128, block_k=128, interpret=False,
                    segment_ids=None, local_window=None,
                    rel_bias=None, rel_cfg=None, bidir_ids=None):
    """Flash attention via Pallas. Same contract as `attention_reference`.

    rel_bias: (H, num_buckets) f32 per-head T5 relative-position bias
    columns, applied IN-KERNEL via `rel_cfg` = (bidirectional, num_buckets,
    max_distance, q_offset) — no (H, S, S) bias materialized in HBM.
    Requires sq == sk. Mutually exclusive with `bias`.
    """
    b, h, sq, d = q.shape
    sk = k.shape[2]
    if scale is None:
        scale = d ** -0.5

    # Keep D unpadded when it already satisfies TPU tiling (block last dim
    # equal to the full array dim is allowed) — padding 64->128 would double
    # the attention FLOPs for d_kv=64 models (T5, CLIP ViT).
    d_pad = _round_up(d, 8)  # block last dim == (padded) array dim is allowed
    sq_pad = _round_up(sq, block_q)
    sk_pad = _round_up(sk, block_k)

    qp = jnp.pad(q, ((0, 0), (0, 0), (0, sq_pad - sq), (0, d_pad - d)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, sk_pad - sk), (0, d_pad - d)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, sk_pad - sk), (0, d_pad - d)))

    # Batch grouping: G batch items per program (static in-kernel unroll).
    # At the hot shapes (d=64, one kv block) per-item compute is ~2 us vs
    # ~4 us Mosaic per-program overhead, so fewer/bigger programs win.
    # Only on the single-kv-block path (no flash scratch carry across kv
    # iterations needed) and only with a per-batch-broadcast bias.
    single_k = sk_pad // block_k == 1 and FLASH_SINGLEK
    group = 1
    if single_k and b > 1:
        group = next((g for g in (8, 4, 2, 1)
                      if g <= FLASH_BATCH_GROUP and b % g == 0), 1)

    # grid order (h, q, b, k): blocks whose index ignores b (the T5
    # bias / rel tables) keep the same index across consecutive b
    # iterations, so Mosaic reuses the VMEM copy instead of refetching
    # it B times from HBM
    grid = (h, sq_pad // block_q, b // group, sk_pad // block_k)

    in_specs = [
        pl.BlockSpec((group, 1, block_q, d_pad), lambda hi, qi, bi, ki: (bi, hi, qi, 0)),
        pl.BlockSpec((group, 1, block_k, d_pad), lambda hi, qi, bi, ki: (bi, hi, ki, 0)),
        pl.BlockSpec((group, 1, block_k, d_pad), lambda hi, qi, bi, ki: (bi, hi, ki, 0)),
    ]
    args = [qp, kp, vp]

    if bias is not None:
        bb, bh = bias.shape[0], bias.shape[1]
        biasp = jnp.pad(bias.astype(jnp.float32),
                        ((0, 0), (0, 0), (0, sq_pad - sq), (0, sk_pad - sk)))
        in_specs.append(pl.BlockSpec(
            (group if bb > 1 else 1, 1, block_q, block_k),
            lambda hi, qi, bi, ki, bb=bb, bh=bh: (bi if bb > 1 else 0,
                                                  hi if bh > 1 else 0, qi, ki)))
        args.append(biasp)
    else:
        in_specs.append(None)
        args.append(None)

    if kv_mask is not None:
        # (B, 1, Sk): keeps the last-two-dims TPU tiling constraint happy.
        maskp = jnp.pad(kv_mask.astype(jnp.int32),
                        ((0, 0), (0, sk_pad - sk)))[:, None, :]
        in_specs.append(pl.BlockSpec((group, 1, block_k),
                                     lambda hi, qi, bi, ki: (bi, 0, ki)))
        args.append(maskp)
    else:
        in_specs.append(None)
        args.append(None)

    if segment_ids is not None:
        assert sq == sk, "segment_ids requires square attention"
        # pad with -1 so padded positions never match a real segment
        segp = jnp.pad(segment_ids.astype(jnp.int32), ((0, 0), (0, sk_pad - sk)),
                       constant_values=-1)[:, None, :]
        in_specs.append(pl.BlockSpec((group, 1, block_q),
                                     lambda hi, qi, bi, ki: (bi, 0, qi)))
        args.append(segp)
        in_specs.append(pl.BlockSpec((group, 1, block_k),
                                     lambda hi, qi, bi, ki: (bi, 0, ki)))
        args.append(segp)
    else:
        in_specs.extend([None, None])
        args.extend([None, None])

    if rel_bias is not None:
        assert rel_cfg is not None and bias is None and sq == sk
        assert rel_bias.shape[0] == h
        # full-array block (equal-to-array dims satisfy TPU tiling); the
        # kernel selects its head's row with a vectorized one-hot
        in_specs.append(pl.BlockSpec(rel_bias.shape,
                                     lambda hi, qi, bi, ki: (0, 0)))
        args.append(rel_bias.astype(jnp.float32))
    else:
        in_specs.append(None)
        args.append(None)

    if bidir_ids is not None:
        assert sq == sk and (causal or local_window is not None), \
            "bidir_ids overlays a causal/window mask"
        bidp = jnp.pad(bidir_ids.astype(jnp.int32),
                       ((0, 0), (0, sk_pad - sk)),
                       constant_values=-1)[:, None, :]
        in_specs.append(pl.BlockSpec((group, 1, block_q),
                                     lambda hi, qi, bi, ki: (bi, 0, qi)))
        args.append(bidp)
        in_specs.append(pl.BlockSpec((group, 1, block_k),
                                     lambda hi, qi, bi, ki: (bi, 0, ki)))
        args.append(bidp)
    else:
        in_specs.extend([None, None])
        args.extend([None, None])

    real_specs = [s for s in in_specs if s is not None]
    real_args = [a for a in args if a is not None]

    # Cache the batch-independent bias/padding block across the b axis —
    # valid only on the single-k path, where b (sequential) iterates
    # directly inside a fixed (h, q, k) block index.
    cache_base = single_k and rel_bias is not None

    def kernel(*refs):
        it = iter(refs[: len(real_specs)])
        q_ref = next(it)
        k_ref = next(it)
        v_ref = next(it)
        bias_ref = next(it) if bias is not None else None
        mask_ref = next(it) if kv_mask is not None else None
        segq_ref = next(it) if segment_ids is not None else None
        segk_ref = next(it) if segment_ids is not None else None
        rel_ref = next(it) if rel_bias is not None else None
        bidirq_ref = next(it) if bidir_ids is not None else None
        bidirk_ref = next(it) if bidir_ids is not None else None
        scr = refs[len(real_specs):]
        o_ref, m_scr, l_scr, acc_scr = scr[:4]
        base_scr = scr[4] if cache_base else None
        _flash_kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, segq_ref,
                      segk_ref, rel_ref, bidirq_ref, bidirk_ref, o_ref,
                      m_scr, l_scr, acc_scr, base_scr, scale=scale,
                      causal=causal, sq=sq, sk=sk, block_q=block_q,
                      block_k=block_k, local_window=local_window,
                      rel_cfg=rel_cfg, single_k=single_k, batch_group=group)

    scratch = [
        pltpu.VMEM((block_q, 128), jnp.float32),
        pltpu.VMEM((block_q, 128), jnp.float32),
        pltpu.VMEM((block_q, d_pad), jnp.float32),
    ]
    if cache_base:
        scratch.append(pltpu.VMEM((block_q, block_k), jnp.float32))

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=real_specs,
        out_specs=pl.BlockSpec((group, 1, block_q, d_pad),
                               lambda hi, qi, bi, ki: (bi, hi, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, sq_pad, d_pad), q.dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary",
                                 "arbitrary"),
            # batch_group unrolls G items per program; the fp32 score
            # tiles push the stack past Mosaic's default 16M scoped-vmem
            # limit. v5e/v5p have 128M physical VMEM — allow up to half.
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(*real_args)
    return out[:, :, :sq, :d]


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


# ---------------------------------------------------------------------------
# Head-major ("flat") flash kernel: (B, S, H, D) in/out
# ---------------------------------------------------------------------------
#
# The per-head kernel above takes (B, H, S, D), which forces XLA to
# materialize a transpose of every q/k/v (and of the output) around the
# custom call — profiled at ~25% of ViT encode and ~10% of T5 score time
# on v5e (the `copy` ops framing each flash_attention in the trace). This
# variant reads the projection output layout directly: (B, S, H, D) is a
# free bitcast of the (B, S, H*D) matmul result. Each program loads one
# batch item's q block and FULL k/v for a group of `hg` heads and loops
# over the heads in-kernel, so no transposed copy ever exists in HBM.
# Single-kv-block shapes only (the hot paths: ViT T=640, T5 S=640).

def _flat_plan(sq: int, sk: int, heads: int, kv_heads: int | None, d: int,
               has_bias: bool, block_q: int = 768, packed: bool = False):
    """(bq, sk_pad, hg) geometry for the flat flash kernel; hg is None when
    no legal head grouping exists. SINGLE source of truth for both the
    attention_flat dispatch gate and flash_attention_flat itself — a drift
    between the two would turn qualifying shapes into runtime
    ValueErrors instead of reference-path fallbacks.

    packed: the q/k/v blocks are lane-offset views of ONE
    (B, S, (H+2KvH)*D) array, so the "block == full array last dim"
    legality escape never applies — every block lane width (hg*d for q,
    (hg/kv_rep)*d for k/v) must be a 128 multiple, and the k/v lane
    offsets (h*d, (h+kvh)*d) must land on k/v-block boundaries. A g==h
    group that is only legal unpacked (e.g. 1 head x d=64 in the tiny
    test configs) must disqualify the packed kernel, not ValueError at
    Mosaic lowering (caught by the driver entry() compile check, r4)."""
    nq = -(-sq // block_q)
    bq = _round_up(-(-sq // nq), 128) if sq > 128 else _round_up(max(sq, 8), 8)
    sk_pad = _round_up(sk, 128)
    kvh = kv_heads if kv_heads is not None else heads
    if kvh != heads:
        # GQA runs all heads in one program: bound the VMEM footprint
        # (q/o + k/v blocks double-buffered + two fp32 score tiles).
        est = ((2 * bq * heads * d * 2 + 2 * sk_pad * kvh * d * 2) * 2
               + bq * sk_pad * 4 * 2)
        hg = heads if heads % kvh == 0 and est <= 40 * 1024 * 1024 else None
    else:
        hg = _flat_head_group(heads, d, bq, sk_pad, has_bias)
    if packed and hg is not None:
        ku = (hg * kvh // heads) * d
        if ((hg * d) % 128 != 0 or ku % 128 != 0
                or (heads * d) % ku != 0 or ((heads + kvh) * d) % ku != 0):
            hg = None
    return bq, sk_pad, hg


def _flat_head_group(h: int, d: int, bq: int, sk_pad: int,
                     has_bias: bool) -> int | None:
    """Largest legal head group. Blocks are (1, rows, hg*d) slices of the
    (B, S, H*D) array, so hg*d must be a 128-lane multiple (or the full
    H*D). The fp32 bias block (hg, bq, sk_pad) — when present — and the
    kernel's scratch (q/k/v/o blocks double-buffered + two fp32 score
    tiles + the unrolled per-head accumulators) must stay within Mosaic's
    scoped-VMEM budget: an unbounded group turns into a compile-time
    stack OOM (observed at h=32, no bias: 71 MiB > the 64 MiB limit)."""
    candidates = [g for g in range(h, 0, -1)
                  if h % g == 0 and ((g * d) % 128 == 0 or g == h)]
    budget = 16 * 1024 * 1024
    for g in candidates:
        if has_bias and g * bq * sk_pad * 4 > budget:
            continue
        # scratch: 4 blocks (q/k/v/o, bf16, double-buffered) + 2 fp32
        # score tiles (s, s_next) + hg fp32 accumulators (bq, d). The
        # budget is calibrated against Mosaic's measured stack usage
        # (h=32/hg=32/no-bias allocates 71 MiB against this estimate's
        # 30 MiB), not the nominal 64 MiB limit.
        scratch = (4 * bq * g * d * 2 * 2 + 2 * bq * sk_pad * 4
                   + g * bq * d * 4)
        if scratch <= 24 * 1024 * 1024:
            return g
    return None


def _flash_flat_kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, segq_ref,
                       segk_ref, bidirq_ref, bidirk_ref, o_ref, *, scale,
                       causal, sq, sk, block_q, block_k, hg, d, kv_rep=1,
                       local_window=None):
    qb = pl.program_id(1)
    neg = jnp.float32(NEG_INF)
    # Build the additive mask as the SUM of independent penalty terms (0 or
    # NEG_INF each; finite, so sums stay finite) and keep it None when no
    # term contributes — every op here runs per score element on the VPU,
    # which is the kernel's bottleneck at d=64 (matmul roofline 2.2
    # ms/layer vs 6.9 ms measured before trimming). A mask-only case stays
    # a (1, block_k) row so the per-head add broadcasts instead of
    # materializing a (block_q, block_k) tile.
    def _acc(base, term):
        return term if base is None else base + term
    base = None
    if block_k != sk:
        col1 = jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1)
        base = _acc(base, jnp.where(col1 < sk, 0.0, neg))
    if mask_ref is not None:
        base = _acc(base, jnp.where(mask_ref[0, 0][None, :] != 0, 0.0, neg))
    if segq_ref is not None:
        same = segq_ref[0, 0][:, None] == segk_ref[0, 0][None, :]
        base = _acc(base, jnp.where(same, 0.0, neg))
    if causal or local_window is not None:
        row = qb * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        keep = col - (sk - sq) <= row
        if local_window is not None:
            keep = keep & (col - (sk - sq) > row - local_window)
        if bidirq_ref is not None:
            # bidirectional image-group overlay (Gemma3/PaliGemma): same
            # non-negative group id attends both ways, overriding the
            # causal/window structure (HF or-mask semantics)
            bq_ids = bidirq_ref[0, 0]
            bk_ids = bidirk_ref[0, 0]
            same = (bq_ids[:, None] == bk_ids[None, :]) & (bq_ids[:, None] >= 0)
            keep = keep | same
        base = _acc(base, jnp.where(keep, 0.0, neg))
    qblk = q_ref[0]                                  # (block_q, hg*D)
    kblk = k_ref[0]                                  # (block_k, (hg//rep)*D)
    vblk = v_ref[0]

    def qk(i):
        kv = i // kv_rep                             # GQA: static kv index
        s = jax.lax.dot_general(
            qblk[:, i * d:(i + 1) * d], kblk[:, kv * d:(kv + 1) * d],
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        if scale != 1.0:  # T5 uses scale 1; skip the (bq, bk) VPU multiply
            s = s * scale
        return s

    outs = []
    # Software-pipelined head loop: issue head i+1's QK^T (MXU) before head
    # i's softmax (VPU) so the units overlap — the kernel is VPU-bound at
    # d=64 (exp/max/sum over the full (bq, bk) tile per head, ~3x the
    # matmul roofline when serialized).
    ones_col = jnp.ones((block_k, 1), vblk.dtype)
    s_next = qk(0)
    for i in range(hg):
        kv = i // kv_rep
        s = s_next
        if i + 1 < hg:
            s_next = qk(i + 1)
        if base is not None:
            s = s + base
        if bias_ref is not None:
            s = s + bias_ref[0, i]
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - jnp.where(m <= neg, 0.0, m))
        # no post-exp mask select: masked scores sit at ~NEG_INF, and
        # exp(NEG_INF - m) underflows to exactly 0.0 for any finite m;
        # fully-masked rows (m == NEG_INF) zero out via the l == 0 guard.
        # The softmax denominator rides the AV matmul as a ones column on
        # v: d=64 < the MXU's 128 lanes, so the extra column is free and
        # the (block_q, block_k) VPU row-sum disappears.
        vext = jnp.concatenate(
            [vblk[:, kv * d:(kv + 1) * d], ones_col], axis=1)
        acc = jax.lax.dot_general(
            p.astype(vblk.dtype), vext,
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        l = acc[:, d:]
        acc = acc[:, :d]
        outs.append((acc / jnp.where(l == 0.0, 1.0, l)).astype(o_ref.dtype))
    o_ref[0] = outs[0] if hg == 1 else jnp.concatenate(outs, axis=-1)


@functools.partial(
    jax.jit,
    static_argnames=("heads", "kv_heads", "causal", "scale", "block_q",
                     "local_window", "interpret"))
def flash_attention_flat(q, k, v, heads, kv_heads=None, bias=None,
                         kv_mask=None, causal=False, scale=None, block_q=768,
                         segment_ids=None, local_window=None, bidir_ids=None,
                         interpret=False):
    """Flash attention over flat (B, S, H*D) inputs/outputs — the native
    layout of the qkv projections, so no transpose copies exist around the
    call. Whole KV in one block per program; bias must broadcast over
    batch (shape (1, H, Sq, Sk)).

    kv_heads < heads (GQA): k/v are (B, Sk, kv_heads*D) and each query
    head reads kv head h // rep by a static lane slice — the
    `jnp.repeat` materialization of k/v disappears entirely. Requires a
    single head group (the kv slice offset must be static)."""
    return _flash_flat_common(q, k, v, heads, kv_heads, bias, kv_mask,
                              causal, scale, block_q, segment_ids,
                              local_window, bidir_ids, interpret)


@functools.partial(
    jax.jit,
    static_argnames=("heads", "kv_heads", "causal", "scale", "block_q",
                     "local_window", "interpret"))
def flash_attention_flat_packed(qkv, heads, kv_heads=None, bias=None,
                                kv_mask=None, causal=False, scale=None,
                                block_q=768, segment_ids=None,
                                local_window=None, bidir_ids=None,
                                interpret=False):
    """Self-attention over a PACKED (B, S, (H + 2*KvH)*D) qkv projection —
    the output of one fused x @ [Wq|Wk|Wv] matmul. The kernel reads q, k
    and v as three lane-offset views of the same array via BlockSpec index
    maps, so the packed projection is never sliced apart in HBM: one big
    MXU-efficient matmul replaces three narrow ones with zero extra
    copies. Requires the k/v lane offsets to land on block boundaries
    (h*d divisible by the kv block lane width — always true for MHA; GQA
    runs single-group so offsets are whole kv blocks)."""
    return _flash_flat_common(qkv, None, None, heads, kv_heads, bias,
                              kv_mask, causal, scale, block_q, segment_ids,
                              local_window, bidir_ids, interpret)


def _flash_flat_common(q, k, v, heads, kv_heads, bias, kv_mask, causal,
                       scale, block_q, segment_ids, local_window, bidir_ids,
                       interpret):
    packed = k is None
    b, sq, hd = q.shape
    h = heads
    kvh = kv_heads if kv_heads is not None else h
    kv_rep = h // kvh
    if packed:
        d = hd // (h + 2 * kvh)
        sk = sq
    else:
        d = hd // h
        sk = k.shape[1]
    if scale is None:
        scale = d ** -0.5

    # same geometry the dispatch gate checked (_flat_plan)
    bq, sk_pad, hg = _flat_plan(sq, sk, h, kv_heads, d, bias is not None,
                                block_q=block_q, packed=packed)
    sq_pad = _round_up(sq, bq)
    if hg is None:
        raise ValueError("no legal head group for flat flash attention")

    grid = (h // hg, sq_pad // bq, b)
    ku = (hg // kv_rep) * d                       # k/v block lane width
    if packed:
        koff = (h * d) // ku
        voff = ((h + kvh) * d) // ku
        s_pad = max(sq_pad, sk_pad)
        qkvp = jnp.pad(q, ((0, 0), (0, s_pad - sq), (0, 0)))
        in_specs = [
            pl.BlockSpec((1, bq, hg * d), lambda gi, qi, bi: (bi, qi, gi)),
            pl.BlockSpec((1, sk_pad, ku),
                         lambda gi, qi, bi: (bi, 0, koff + gi)),
            pl.BlockSpec((1, sk_pad, ku),
                         lambda gi, qi, bi: (bi, 0, voff + gi)),
        ]
        args = [qkvp, qkvp, qkvp]
    else:
        qp = jnp.pad(q, ((0, 0), (0, sq_pad - sq), (0, 0)))
        kp = jnp.pad(k, ((0, 0), (0, sk_pad - sk), (0, 0)))
        vp = jnp.pad(v, ((0, 0), (0, sk_pad - sk), (0, 0)))
        in_specs = [
            pl.BlockSpec((1, bq, hg * d), lambda gi, qi, bi: (bi, qi, gi)),
            pl.BlockSpec((1, sk_pad, ku), lambda gi, qi, bi: (bi, 0, gi)),
            pl.BlockSpec((1, sk_pad, ku), lambda gi, qi, bi: (bi, 0, gi)),
        ]
        args = [qp, kp, vp]
    if bias is not None:
        assert bias.shape[0] == 1, "flat kernel: bias must broadcast batch"
        biasp = jnp.pad(bias.astype(jnp.float32),
                        ((0, 0), (0, 0), (0, sq_pad - sq), (0, sk_pad - sk)))
        # index ignores b (innermost grid axis): Mosaic keeps the block in
        # VMEM across consecutive batch programs instead of refetching
        in_specs.append(pl.BlockSpec((1, hg, bq, sk_pad),
                                     lambda gi, qi, bi: (0, gi, qi, 0)))
        args.append(biasp)
    else:
        in_specs.append(None)
        args.append(None)
    if kv_mask is not None:
        maskp = jnp.pad(kv_mask.astype(jnp.int32),
                        ((0, 0), (0, sk_pad - sk)))[:, None, :]
        in_specs.append(pl.BlockSpec((1, 1, sk_pad),
                                     lambda gi, qi, bi: (bi, 0, 0)))
        args.append(maskp)
    else:
        in_specs.append(None)
        args.append(None)

    def _qk_id_specs(ids):
        """(B, S) int array -> q-block and k-block specs + padded arg."""
        padded = jnp.pad(ids.astype(jnp.int32), ((0, 0), (0, sk_pad - sk)),
                         constant_values=-1)[:, None, :]
        return padded

    if segment_ids is not None:
        assert sq == sk, "segment_ids requires square attention"
        # pad with -1 so padded positions never match a real segment
        segp = _qk_id_specs(segment_ids)
        in_specs.append(pl.BlockSpec((1, 1, bq),
                                     lambda gi, qi, bi: (bi, 0, qi)))
        args.append(segp)
        in_specs.append(pl.BlockSpec((1, 1, sk_pad),
                                     lambda gi, qi, bi: (bi, 0, 0)))
        args.append(segp)
    else:
        in_specs.extend([None, None])
        args.extend([None, None])

    if bidir_ids is not None:
        assert sq == sk and (causal or local_window is not None), \
            "bidir_ids overlays a causal/window mask"
        bidp = _qk_id_specs(bidir_ids)
        in_specs.append(pl.BlockSpec((1, 1, bq),
                                     lambda gi, qi, bi: (bi, 0, qi)))
        args.append(bidp)
        in_specs.append(pl.BlockSpec((1, 1, sk_pad),
                                     lambda gi, qi, bi: (bi, 0, 0)))
        args.append(bidp)
    else:
        in_specs.extend([None, None])
        args.extend([None, None])

    real_specs = [s for s in in_specs if s is not None]
    real_args = [a for a in args if a is not None]

    def kernel(*refs):
        it = iter(refs[: len(real_specs)])
        q_ref = next(it)
        k_ref = next(it)
        v_ref = next(it)
        bias_ref = next(it) if bias is not None else None
        mask_ref = next(it) if kv_mask is not None else None
        segq_ref = next(it) if segment_ids is not None else None
        segk_ref = next(it) if segment_ids is not None else None
        bidirq_ref = next(it) if bidir_ids is not None else None
        bidirk_ref = next(it) if bidir_ids is not None else None
        _flash_flat_kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, segq_ref,
                           segk_ref, bidirq_ref, bidirk_ref,
                           refs[len(real_specs)], scale=scale,
                           causal=causal, sq=sq, sk=sk, block_q=bq,
                           block_k=sk_pad, hg=hg, d=d, kv_rep=kv_rep,
                           local_window=local_window)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=real_specs,
        out_specs=pl.BlockSpec((1, bq, hg * d),
                               lambda gi, qi, bi: (bi, qi, gi)),
        out_shape=jax.ShapeDtypeStruct((b, sq_pad, h * d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(*real_args)
    return out[:, :sq]


def attention_flat(q, k, v, heads, kv_heads=None, bias=None, kv_mask=None,
                   causal=False, scale=None, impl: str = "auto",
                   local_window=None, bidir_ids=None, segment_ids=None):
    """Attention over flat (B, S, H*D) inputs/outputs (k/v may be GQA
    (B, Sk, kv_heads*D)).

    Uses the flat flash kernel when the shape qualifies (TPU, one kv
    block, batch-broadcast bias, no window/overlay masks); otherwise
    reshapes/transposes to (B, H, S, D) and dispatches through
    `attention()` — numerically identical, just with the layout copies
    the flat kernel avoids."""
    if ATTN_IMPL_OVERRIDE:
        impl = ATTN_IMPL_OVERRIDE
    b, sq, hd = q.shape
    d = hd // heads
    kvh = kv_heads if kv_heads is not None else heads
    sk = k.shape[1]
    _, _, hg = _flat_plan(sq, sk, heads, kv_heads, d, bias is not None)
    hg_ok = hg is not None
    ok = (impl != "reference" and _on_tpu() and pltpu is not None
          and sq >= 128 and 128 <= sk <= 2048
          and (local_window is None or causal)
          and (bidir_ids is None
               or (sq == sk and (causal or local_window is not None)))
          and (segment_ids is None or sq == sk)
          and (bias is None or bias.shape[0] == 1)
          and hg_ok)
    if ok:
        return flash_attention_flat(q, k, v, heads, kv_heads=kv_heads,
                                    bias=bias, kv_mask=kv_mask,
                                    causal=causal, scale=scale,
                                    segment_ids=segment_ids,
                                    local_window=local_window,
                                    bidir_ids=bidir_ids)
    qh = q.reshape(b, sq, heads, d).transpose(0, 2, 1, 3)
    kh = k.reshape(b, sk, kvh, d).transpose(0, 2, 1, 3)
    vh = v.reshape(b, sk, kvh, d).transpose(0, 2, 1, 3)
    if kvh != heads:
        kh = jnp.repeat(kh, heads // kvh, axis=1)
        vh = jnp.repeat(vh, heads // kvh, axis=1)
    a = attention(qh, kh, vh, bias=bias, kv_mask=kv_mask, causal=causal,
                  scale=scale, impl=impl, local_window=local_window,
                  bidir_ids=bidir_ids, segment_ids=segment_ids)
    return a.transpose(0, 2, 1, 3).reshape(b, sq, hd)


def attention_flat_packed(qkv, heads, kv_heads=None, bias=None, kv_mask=None,
                          causal=False, scale=None, impl: str = "auto",
                          local_window=None, bidir_ids=None,
                          segment_ids=None):
    """Self-attention over a PACKED (B, S, (H + 2*KvH)*D) qkv projection —
    the output of one fused ``x @ [Wq|Wk|Wv]`` matmul (see
    `flash_attention_flat_packed`). One wide MXU-efficient projection
    replaces three narrow ones, and on the flash path the kernel reads
    q/k/v as lane-offset views so the packed array is never sliced apart
    in HBM. Off the flash path (CPU tests, disqualified shapes) the
    slices are real copies — only the cold path pays them."""
    if ATTN_IMPL_OVERRIDE:
        impl = ATTN_IMPL_OVERRIDE
    b, sq, total = qkv.shape
    kvh = kv_heads if kv_heads is not None else heads
    d = total // (heads + 2 * kvh)
    _, _, hg = _flat_plan(sq, sq, heads, kv_heads, d, bias is not None,
                          packed=True)
    ok = (FLASH_PACKED and impl != "reference" and _on_tpu()
          and pltpu is not None
          and 128 <= sq <= 2048
          and (local_window is None or causal)
          and (bidir_ids is None or causal or local_window is not None)
          and (bias is None or bias.shape[0] == 1)
          and hg is not None)
    if ok:
        return flash_attention_flat_packed(
            qkv, heads, kv_heads=kv_heads, bias=bias, kv_mask=kv_mask,
            causal=causal, scale=scale, segment_ids=segment_ids,
            local_window=local_window, bidir_ids=bidir_ids)
    q = qkv[..., : heads * d]
    k = qkv[..., heads * d:(heads + kvh) * d]
    v = qkv[..., (heads + kvh) * d:]
    return attention_flat(q, k, v, heads, kv_heads=kv_heads, bias=bias,
                          kv_mask=kv_mask, causal=causal, scale=scale,
                          impl=impl, local_window=local_window,
                          bidir_ids=bidir_ids, segment_ids=segment_ids)


def attention(q, k, v, bias=None, kv_mask=None, causal=False, scale=None,
              impl: str = "auto", segment_ids=None, local_window=None,
              bidir_ids=None, rel_bias=None, rel_cfg=None):
    """Dispatching attention op.

    impl: 'auto' (flash on TPU, reference elsewhere), 'flash', 'reference'.
    rel_bias/rel_cfg: T5 relative-position bias computed in-kernel on the
    flash path; on the reference path the caller's dense `bias` is used
    (pass both — the unused one is dead-code-eliminated under jit).
    """
    if ATTN_IMPL_OVERRIDE:
        impl = ATTN_IMPL_OVERRIDE
    if impl == "auto":
        # Flash pays off for longer sequences; tiny shapes keep XLA fusion.
        impl = "flash" if (_on_tpu() and q.shape[-2] * k.shape[-2] > 128 * 128
                           and pltpu is not None) else "reference"
        # Plain full bidirectional attention on short, non-tile-aligned
        # sequences (the ViT towers: T=257, thousands of tiny batchxhead
        # programs) loses to XLA's fused dense path: profiled on v5e, the
        # flash kernel + its pad-to-block HBM traffic took 32% of encode
        # time for ~4% of its FLOPs. Keep flash for masked/biased/longer
        # shapes where O(S^2) materialization or the mask structure pays.
        if (impl == "flash" and bias is None and rel_bias is None
                and not causal and local_window is None
                and segment_ids is None and bidir_ids is None
                and kv_mask is None and q.shape[-2] == k.shape[-2]
                and q.shape[-2] % 128 != 0 and q.shape[-2] <= 512):
            impl = "reference"
    if bidir_ids is not None and (impl != "flash"
                                  or not (causal or local_window)):
        # flash handles bidir only as an overlay on a causal/window mask
        return attention_reference(q, k, v, bias=bias, kv_mask=kv_mask,
                                   causal=causal, scale=scale,
                                   segment_ids=segment_ids,
                                   local_window=local_window,
                                   bidir_ids=bidir_ids)
    if impl == "flash":
        # Adaptive block sizes: per-program Mosaic launch overhead dominates
        # when the grid has many tiny programs; prefer few large tiles
        # (VMEM budget: q/k/v tiles + fp32 (block_q, block_k) scores).
        sq, sk = q.shape[-2], k.shape[-2]

        # 768 measured best on v5e at the flagship shapes (S=640: one big
        # q block beats two small ones — 57.2 vs 51.5 pairs/s device-only);
        # override with T2V_FLASH_QCAP/KCAP (read at import) for other regimes
        nq = -(-sq // FLASH_QCAP)
        block_q = (_round_up(-(-sq // nq), 128) if sq > 128
                   else _round_up(max(sq, 8), 8))
        nk = -(-sk // FLASH_KCAP)
        block_k = _round_up(-(-sk // nk), 128) if sk > 128 else _round_up(max(sk, 8), 128)
        if rel_bias is not None and q.shape[-2] == k.shape[-2]:
            return flash_attention(q, k, v, kv_mask=kv_mask,
                                   causal=causal, scale=scale,
                                   segment_ids=segment_ids,
                                   local_window=local_window,
                                   block_q=block_q, block_k=block_k,
                                   rel_bias=rel_bias, rel_cfg=rel_cfg)
        return flash_attention(q, k, v, bias=bias, kv_mask=kv_mask,
                               causal=causal, scale=scale,
                               segment_ids=segment_ids,
                               local_window=local_window,
                               block_q=block_q, block_k=block_k,
                               bidir_ids=bidir_ids)
    return attention_reference(q, k, v, bias=bias, kv_mask=kv_mask,
                               causal=causal, scale=scale,
                               segment_ids=segment_ids,
                               local_window=local_window)
