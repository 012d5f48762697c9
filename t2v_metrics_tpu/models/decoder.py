"""Generic decoder-only transformer (GQA + RoPE/M-RoPE), functional JAX.

Backbone for the Qwen-family language models (and structured so Gemma/Qwen3
variants are config switches). Matches HF Qwen2/Qwen2.5 semantics:

  * RMSNorm (pre-norm), fp32 stats;
  * grouped-query attention, q/k/v bias (Qwen2), o no bias;
  * rotary embeddings computed in fp32; Qwen2.5-VL's M-RoPE applies three
    position streams (t/h/w) interleaved over head-dim sections
    (HF apply_multimodal_rotary_pos_emb — mrope_section tiled x2, stream
    i%3 per section);
  * SwiGLU MLP, no bias; optional tied lm_head.

Supports an optional KV cache for greedy generation (static max-length
buffers + dynamic_update_slice, jit/while_loop friendly).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ..ops import layers as L
from ..ops import rope as rope_ops
from ..ops.attention import (attention, attention_flat,
                             attention_flat_packed)

Params = Any


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    vocab_size: int = 152064
    d_model: int = 3584
    layers: int = 28
    heads: int = 28
    kv_heads: int = 4
    head_dim: int = 128
    d_ff: int = 18944
    act: str = "silu"
    rms_eps: float = 1e-6
    rope_theta: float = 1000000.0
    mrope_section: tuple | None = (16, 24, 24)  # None -> standard 1D RoPE
    mrope_interleaved: bool = False  # Qwen3-VL interleaved THTHW... layout
    qkv_bias: bool = True
    tie_embeddings: bool = False
    # --- Gemma3-style options -------------------------------------------
    qk_norm: bool = False            # per-head RMSNorm on q/k
    q_scale: float | None = None     # attention scale override
    sandwich_norms: bool = False     # post-attn + pre/post-ffw norms
    rms_offset: float = 0.0          # 1.0 -> Gemma (1 + w) convention
    rms_cast_weight: bool = True     # False -> multiply in fp32 (Gemma)
    sliding_window: int | None = None
    layer_types: tuple | None = None  # per-layer 'sliding_attention'/'full_attention'
    local_rope_theta: float | None = None  # rope theta for sliding layers
    rope_scaling_factor: float | None = None  # linear scaling, global layers
    # --- MoE (Qwen3-VL-MoE-style) ---------------------------------------
    num_experts: int = 0                 # 0 -> dense MLP
    experts_per_tok: int = 8
    moe_d_ff: int = 0                    # per-expert intermediate size
    # True -> exact sort-based block dispatch + Pallas grouped GEMM
    # (ops/moe.py): E/k-fold fewer expert FLOPs than the dense einsum.
    # Default False: the dense path is the numerics oracle and wins for
    # tiny expert counts.
    moe_dispatch: bool = False
    moe_norm_topk: bool = True           # renormalize top-k router weights
    moe_shared_ff: int = 0               # >0: shared expert + sigmoid gate
                                         # (Qwen3-Omni talker MoE)


# ---------------------------------------------------------------------------
# RoPE
# ---------------------------------------------------------------------------

def rope_cos_sin(cfg: DecoderConfig, position_ids: jnp.ndarray,
                 theta: float | None = None, scaling: float | None = None):
    """position_ids: (B, S) or (3, B, S) for M-RoPE.

    Returns cos/sin of shape (B, S, head_dim) with M-RoPE sections already
    merged (so downstream application is uniform). ``scaling`` divides the
    inverse frequencies (HF linear rope scaling).
    """
    half = cfg.head_dim // 2
    theta = theta if theta is not None else cfg.rope_theta
    inv_freq = 1.0 / (theta ** (jnp.arange(0, half, dtype=jnp.float32) / half))
    if scaling:
        inv_freq = inv_freq / scaling
    if position_ids.ndim == 2:
        pos = position_ids[None].astype(jnp.float32)  # (1, B, S)
    else:
        pos = position_ids.astype(jnp.float32)        # (3, B, S)
    freqs = pos[..., None] * inv_freq                 # (streams, B, S, half)
    if position_ids.ndim == 3 and cfg.mrope_section is not None:
        if cfg.mrope_interleaved:
            # Qwen3-VL: overwrite T-stream freqs with H at indices
            # 1,4,7,..(<3*sec_h) and W at 2,5,8,..(<3*sec_w)
            out = freqs[0]
            for dim, offset in ((1, 1), (2, 2)):
                length = cfg.mrope_section[dim] * 3
                idx = jnp.arange(offset, length, 3)
                # index in two steps: mixing an int with an array index
                # would trigger numpy's front-moved advanced indexing
                out = out.at[..., idx].set(freqs[dim][..., idx])
            freqs = out[None]
        else:
            # Qwen2.5-VL: section i of the x2-tiled list from stream i%3
            # (applied on the duplicated emb below, so tile here over half)
            sections = list(cfg.mrope_section)
            parts = []
            start = 0
            for i, sec in enumerate(sections):
                parts.append(freqs[i % 3, :, :, start:start + sec])
                start += sec
            freqs = jnp.concatenate(parts, axis=-1)[None]
    emb = jnp.concatenate([freqs, freqs], axis=-1)    # (streams, B, S, dim)
    cos, sin = jnp.cos(emb), jnp.sin(emb)
    return cos[0], sin[0]


def _rotate_half(x):
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


# Rope compute dtype. The HF reference upcasts q/k to f32 around the
# rotation; with bf16 activations that materializes 2x-wide x
# intermediates and XLA emits the chain as ~5 full HBM passes per layer
# (profiled at ~2.4 ms/layer on the Qwen video vision tower — rivaling
# the layer's matmuls). Default mode: x stays in its activation dtype
# (the bulky tensor, read/written once in bf16), while cos/sin — the
# small (B,S,D) angle tables — stay f32 in the multiply, so the products
# and the sum run in f32 and only the FINAL result rounds to bf16. This
# preserves full angle precision (cos/sin are never rounded; matching
# the HF upcast to <=1 final-rounding ulp) without re-widening the HBM
# chain. T2V_ROPE_COMPUTE=f32 restores the fully materialized-f32 chain.
import os as _os

_ROPE_F32 = _os.environ.get("T2V_ROPE_COMPUTE", "activation") == "f32"


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x: (B, H, S, D); cos/sin: (B, S, D)."""
    c = cos[:, None].astype(jnp.float32)
    s = sin[:, None].astype(jnp.float32)
    xc = x.astype(jnp.float32) if _ROPE_F32 else x
    # bf16 x * f32 cos promotes to f32: products + sum in f32, one
    # rounding at the end
    return ((xc * c) + (_rotate_half(xc) * s)).astype(x.dtype)


def apply_rope_bshd(x: jnp.ndarray, cos: jnp.ndarray,
                    sin: jnp.ndarray) -> jnp.ndarray:
    """x: (B, S, H, D) — head-major layout; cos/sin: (B, S, D)."""
    c = cos[:, :, None].astype(jnp.float32)
    s = sin[:, :, None].astype(jnp.float32)
    xc = x.astype(jnp.float32) if _ROPE_F32 else x
    return ((xc * c) + (_rotate_half(xc) * s)).astype(x.dtype)


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------

def _attn(p, cfg: DecoderConfig, x, cos, sin, mask, cache_layer=None,
          cache_pos=None, local_window=None, bidir_ids=None):
    b, s, _ = x.shape
    h, kvh, d = cfg.heads, cfg.kv_heads, cfg.head_dim
    scale = cfg.q_scale if cfg.q_scale is not None else None

    if cache_layer is None:
        # Prefill: ONE packed qkv matmul — the narrow GQA k/v projections
        # (kvh*d lanes) are MXU-inefficient on their own; packed they ride
        # the wide q matmul. qk-norm and rope are per-(position, head), so
        # they apply to the q|k lane region of the packed (B,S,H+KvH,D)
        # view in one fused elementwise pass; the flash kernel then reads
        # q/k/v as lane-offset views with no slice copies
        # (ops/attention.py flash_attention_flat_packed).
        w_qkv = jnp.concatenate([p["q"]["w"], p["k"]["w"], p["v"]["w"]],
                                axis=1)
        bs_ = [p["q"].get("b"), p["k"].get("b"), p["v"].get("b")]
        b_qkv = (jnp.concatenate(bs_)
                 if all(bb is not None for bb in bs_) else None)
        packed = L.linear(x, w_qkv, b_qkv)
        if not cfg.qk_norm and rope_ops.use_kernel(
                b, s, packed.shape[-1], h + kvh, d):
            # fused rope on the q|k lane region: 1 HBM read + 1 write
            # (the jnp chain below is ~4 full-tensor passes per layer)
            pk = rope_ops.rope_pack(packed, cos, sin, h + kvh, d)
        else:
            qk = packed[..., : (h + kvh) * d].reshape(b, s, h + kvh, d)
            if cfg.qk_norm:
                sc = jnp.concatenate(
                    [jnp.broadcast_to(p["q_norm"]["scale"], (h, d)),
                     jnp.broadcast_to(p["k_norm"]["scale"], (kvh, d))])
                qk = L.rms_norm(qk, sc, cfg.rms_eps, offset=cfg.rms_offset,
                                cast_weight_dtype=cfg.rms_cast_weight)
            qk = apply_rope_bshd(qk, cos, sin)
            pk = jnp.concatenate(
                [qk.reshape(b, s, -1), packed[..., (h + kvh) * d:]], axis=-1)
        out = attention_flat_packed(pk, h, kv_heads=kvh, kv_mask=mask,
                                    causal=True, scale=scale,
                                    local_window=local_window,
                                    bidir_ids=bidir_ids)
        return L.linear(out, p["o"]["w"], p["o"].get("b")), None

    q = L.linear(x, p["q"]["w"], p["q"].get("b"))
    k = L.linear(x, p["k"]["w"], p["k"].get("b"))
    v = L.linear(x, p["v"]["w"], p["v"].get("b"))
    # Head-major (B, S, H, D): free bitcast of the projection output.
    # Norms + rope are per-(position, head) so they apply in this layout;
    # GQA k/v stay at kv_heads width (no jnp.repeat).
    q = q.reshape(b, s, cfg.heads, cfg.head_dim)
    k = k.reshape(b, s, cfg.kv_heads, cfg.head_dim)
    if cfg.qk_norm:
        q = L.rms_norm(q, p["q_norm"]["scale"], cfg.rms_eps,
                       offset=cfg.rms_offset,
                       cast_weight_dtype=cfg.rms_cast_weight)
        k = L.rms_norm(k, p["k_norm"]["scale"], cfg.rms_eps,
                       offset=cfg.rms_offset,
                       cast_weight_dtype=cfg.rms_cast_weight)
    q = apply_rope_bshd(q, cos, sin)
    k = apply_rope_bshd(k, cos, sin)

    # Flat KV cache: (B, max_len, kv_heads*D) — the projections' native
    # layout, so appending is a plain dynamic_update_slice (no transpose
    # copies) and GQA reads each kv head by reshape (no jnp.repeat
    # materializing heads/kv_heads copies of the cache every step).
    kvd = cfg.kv_heads * cfg.head_dim
    ck = jax.lax.dynamic_update_slice(cache_layer["k"], k.reshape(b, s, kvd),
                                      (0, cache_pos, 0))
    cv = jax.lax.dynamic_update_slice(cache_layer["v"], v.reshape(b, s, kvd),
                                      (0, cache_pos, 0))
    new_cache = {"k": ck, "v": cv}

    # cached path: the chunk occupies cache slots [cache_pos,
    # cache_pos+s); causal structure is expressed as an additive bias
    # against absolute cache positions (works for both multi-token
    # prefill and single-token steps), combined with the validity mask.
    # local_window masks cache slots older than the sliding window, and
    # bidir_ids here is the CACHE-ALIGNED (B, max_len) image-group array
    # (-1 for text): same-group slots attend bidirectionally, overriding
    # both causality and the window (HF Gemma3 or-mask semantics).
    max_len = ck.shape[1]
    rows = cache_pos + jnp.arange(s)
    cols = jnp.arange(max_len)
    keep = cols[None, :] <= rows[:, None]            # (s, max_len)
    if local_window is not None:
        keep = keep & (cols[None, :] > rows[:, None] - local_window)
    if bidir_ids is not None:
        row_b = jax.lax.dynamic_slice_in_dim(bidir_ids, cache_pos, s,
                                             axis=1)  # (B, s)
        same = ((row_b[:, :, None] == bidir_ids[:, None, :])
                & (row_b[:, :, None] >= 0))           # (B, s, max_len)
        keep = keep[None] | same
    if mask is not None:
        keep = (keep if keep.ndim == 3 else keep[None]) & mask[:, None, :]
    elif keep.ndim == 2:
        keep = keep[None]
    bias = jnp.where(keep, 0.0, -1e30)               # (B|1, s, max_len)

    # grouped attention in the flat layout: head h = kv*rep + r, matching
    # the head-major projection order, so a (kvh, rep) reshape of q lines
    # every query head up with its kv head. Numerics mirror
    # attention_reference exactly (fp32 scores + softmax, p cast to v
    # dtype, fp32 PV accumulation).
    rep = cfg.heads // cfg.kv_heads
    d = cfg.head_dim
    if scale is None:
        scale = d ** -0.5
    q5 = q.reshape(b, s, cfg.kv_heads, rep, d)
    k5 = ck.reshape(b, max_len, cfg.kv_heads, d)
    v5 = cv.reshape(b, max_len, cfg.kv_heads, d)
    scores = jnp.einsum("bskrd,bmkd->bskrm", q5, k5,
                        preferred_element_type=jnp.float32)
    scores = scores * scale + bias[:, :, None, None, :]
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bskrm,bmkd->bskrd", probs.astype(v5.dtype), v5,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    out = out.reshape(b, s, cfg.heads * cfg.head_dim)
    return L.linear(out, p["o"]["w"], p["o"].get("b")), new_cache


def _mlp(p, cfg: DecoderConfig, x):
    if "moe" in p:
        if cfg.moe_dispatch:
            from ..ops.moe import moe_mlp_dispatch

            return moe_mlp_dispatch(p["moe"], cfg, x)
        return _moe_mlp(p["moe"], cfg, x)
    h = L.ACT_FNS[cfg.act](x @ p["gate"]["w"]) * (x @ p["up"]["w"])
    return h @ p["down"]["w"]


def _moe_mlp(p, cfg: DecoderConfig, x):
    """Top-k routed SwiGLU experts (HF Qwen3VLMoe semantics: fp32 softmax
    router, top-k renormalized, packed gate_up (E, H, 2I) / down (E, I, H)).

    Dense-einsum formulation: every token runs every expert and zero router
    weights mask the rest — exact, compiler-friendly, and the right shape
    for expert-sharded (EP) meshes; a sorted-dispatch kernel is the planned
    optimization for very large expert counts.
    """
    b, s, h = x.shape
    xt = x.reshape(-1, h)
    t = xt.shape[0]
    logits = xt @ p["router"]["w"]                        # (T, E)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    topv, topi = jax.lax.top_k(probs, cfg.experts_per_tok)
    if cfg.moe_norm_topk:
        topv = topv / topv.sum(-1, keepdims=True)
    w = jnp.zeros_like(probs)
    w = w.at[jnp.arange(t)[:, None], topi].set(topv)      # (T, E)
    gu = jnp.einsum("th,ehi->tei", xt, p["gate_up"])      # (T, E, 2I)
    g, u = jnp.split(gu, 2, axis=-1)
    act = L.ACT_FNS[cfg.act](g) * u
    out = jnp.einsum("tei,eih->teh", act, p["down"])      # (T, E, H)
    out = (out * w[..., None].astype(out.dtype)).sum(axis=1)
    if "shared" in p:  # Qwen3-Omni talker: shared expert, sigmoid-gated
        sh = (L.ACT_FNS[cfg.act](xt @ p["shared"]["gate"]["w"])
              * (xt @ p["shared"]["up"]["w"])) @ p["shared"]["down"]["w"]
        gate = jax.nn.sigmoid(xt @ p["shared_gate"]["w"])
        out = out + gate.astype(out.dtype) * sh
    return out.reshape(b, s, h).astype(x.dtype)


def forward(params: Params, cfg: DecoderConfig, embeds: jnp.ndarray,
            position_ids: jnp.ndarray, attn_mask: jnp.ndarray | None = None,
            cache=None, cache_pos=None, bidir_ids=None, deepstack=None,
            want_hidden: bool = False, capture_layer: int | None = None,
            logit_positions: jnp.ndarray | None = None):
    """embeds: (B, S, D). Returns (logits fp32, new_cache).

    Without cache: full causal self-attention (teacher-forced scoring).
    With cache: appends this chunk's k/v at cache_pos; attn_mask must be the
    (B, max_len) validity mask of the cache after insertion.
    bidir_ids: optional image-group overlay (Gemma3 image blocks /
    PaliGemma prefix): positions sharing a non-negative group id attend
    each other bidirectionally. Shape (B, S) without cache; with cache it
    must be the CACHE-ALIGNED (B, max_len) array (generated slots = -1).
    deepstack: optional list of (B, S, D) residuals added to the hidden
    state after layers 0..len-1 (Qwen3-VL deepstack visual features,
    already scattered to visual positions, zero elsewhere).
    logit_positions: optional (B, A) int — compute lm-head logits ONLY at
    these sequence positions: logits come back (B, A, vocab). Scoring
    needs 1-8 answer positions of a 1k+ prefill; the full-seq head matmul
    plus its fp32 (B, S, vocab) logits in HBM (~2.5 GB at the video bench
    shape) would otherwise dwarf the gather it saves. Identical numerics:
    the head is per-row, so gathering rows before it equals gathering
    logits after it.
    """

    def _norm(x, p):
        return L.rms_norm(x, p["scale"], cfg.rms_eps, offset=cfg.rms_offset,
                          cast_weight_dtype=cfg.rms_cast_weight)

    cos_g, sin_g = rope_cos_sin(cfg, position_ids,
                                scaling=cfg.rope_scaling_factor)
    if cfg.local_rope_theta is not None:
        cos_l, sin_l = rope_cos_sin(cfg, position_ids,
                                    theta=cfg.local_rope_theta)
    else:
        cos_l, sin_l = cos_g, sin_g

    x = embeds
    captured = embeds if capture_layer == 0 else None
    new_cache = []
    for i, blk in enumerate(params["blocks"]):
        sliding = (cfg.layer_types is not None
                   and cfg.layer_types[i % len(cfg.layer_types)] == "sliding_attention")
        cos, sin = (cos_l, sin_l) if sliding else (cos_g, sin_g)
        window = cfg.sliding_window if sliding else None
        h = _norm(x, blk["ln1"])
        a, nc = _attn(blk["attn"], cfg, h, cos, sin, attn_mask,
                      None if cache is None else cache[i], cache_pos,
                      local_window=window, bidir_ids=bidir_ids)
        if cfg.sandwich_norms:
            a = _norm(a, blk["ln1_post"])
        x = x + a
        h = _norm(x, blk["ln_ff_pre"] if cfg.sandwich_norms else blk["ln2"])
        m = _mlp(blk["mlp"], cfg, h)
        if cfg.sandwich_norms:
            m = _norm(m, blk["ln_ff_post"])
        x = x + m
        if deepstack is not None and i < len(deepstack):
            x = x + deepstack[i].astype(x.dtype)
        if capture_layer is not None and capture_layer == i + 1:
            # HF hidden_states[k] = output of layer k (embeddings at k=0);
            # captured AFTER the deepstack residual (see talker docstring)
            captured = x
        new_cache.append(nc)
    x = _norm(x, params["ln_final"])
    xh = x
    if logit_positions is not None:
        xh = jnp.take_along_axis(x, logit_positions[..., None], axis=1,
                                 mode="clip")
    if cfg.tie_embeddings:
        logits = xh @ params["embed"].T
    else:
        logits = xh @ params["lm_head"]
    logits = logits.astype(jnp.float32)
    out_cache = new_cache if cache is not None else None
    extras = []
    if want_hidden:  # post-final-norm hidden (talker -> code predictor)
        extras.append(x)
    if capture_layer is not None:
        extras.append(captured)
    if extras:
        return (logits, out_cache, *extras)
    return logits, out_cache


def init_cache(cfg: DecoderConfig, batch: int, max_len: int, dtype=jnp.bfloat16):
    """Flat (B, max_len, kv_heads*head_dim) KV cache — the projection
    layout, appended with no transposes and read GQA-style with no
    jnp.repeat (see _attn cached path)."""
    kvd = cfg.kv_heads * cfg.head_dim
    return [{"k": jnp.zeros((batch, max_len, kvd), dtype),
             "v": jnp.zeros((batch, max_len, kvd), dtype)}
            for _ in range(cfg.layers)]


# ---------------------------------------------------------------------------
# Init (tests)
# ---------------------------------------------------------------------------

def init_decoder(key, cfg: DecoderConfig, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, cfg.layers + 2)

    def lin(k, din, dout, bias):
        p = {"w": (jax.random.normal(k, (din, dout)) * din ** -0.5).astype(dtype)}
        p["b"] = jnp.zeros((dout,), dtype) if bias else None
        return p

    blocks = []
    inner = cfg.heads * cfg.head_dim
    kv_inner = cfg.kv_heads * cfg.head_dim
    for i in range(cfg.layers):
        sub = jax.random.split(ks[i], 7)
        if cfg.num_experts:
            mlp = {"moe": {
                "router": {"w": (jax.random.normal(sub[4], (cfg.d_model, cfg.num_experts))
                                 * cfg.d_model ** -0.5).astype(dtype)},
                "gate_up": (jax.random.normal(
                    sub[5], (cfg.num_experts, cfg.d_model, 2 * cfg.moe_d_ff))
                    * cfg.d_model ** -0.5).astype(dtype),
                "down": (jax.random.normal(
                    sub[6], (cfg.num_experts, cfg.moe_d_ff, cfg.d_model))
                    * cfg.moe_d_ff ** -0.5).astype(dtype),
            }}
        else:
            mlp = {
                "gate": lin(sub[4], cfg.d_model, cfg.d_ff, False),
                "up": lin(sub[5], cfg.d_model, cfg.d_ff, False),
                "down": lin(sub[6], cfg.d_ff, cfg.d_model, False),
            }
        attn = {
            "q": lin(sub[0], cfg.d_model, inner, cfg.qkv_bias),
            "k": lin(sub[1], cfg.d_model, kv_inner, cfg.qkv_bias),
            "v": lin(sub[2], cfg.d_model, kv_inner, cfg.qkv_bias),
            "o": lin(sub[3], inner, cfg.d_model, False),
        }
        if cfg.qk_norm:
            attn["q_norm"] = {"scale": jnp.ones((cfg.head_dim,), dtype)}
            attn["k_norm"] = {"scale": jnp.ones((cfg.head_dim,), dtype)}
        blocks.append({
            "ln1": {"scale": jnp.ones((cfg.d_model,), dtype)},
            "attn": attn,
            "ln2": {"scale": jnp.ones((cfg.d_model,), dtype)},
            "mlp": mlp,
        })
    out = {
        "embed": (jax.random.normal(ks[-2], (cfg.vocab_size, cfg.d_model)) * 0.02).astype(dtype),
        "blocks": blocks,
        "ln_final": {"scale": jnp.ones((cfg.d_model,), dtype)},
    }
    if not cfg.tie_embeddings:
        out["lm_head"] = (jax.random.normal(ks[-1], (cfg.d_model, cfg.vocab_size)) * 0.02).astype(dtype)
    return out
