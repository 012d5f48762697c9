"""T5 / FlanT5 encoder-decoder in functional JAX.

Backbone for the CLIP-FlanT5 VQAScore flagship (reference architecture:
CLIP ViT-L/14-336 features spliced into the FlanT5 *encoder* input, answer
scored from the decoder — reference t2v_metrics/models/vqascore_models/
mm_utils.py:142-241, V_3.0_README.md:110-125).

Parity-critical T5 conventions (matched against HF T5ForConditionalGeneration):
  * RMSNorm (no mean subtraction/bias), eps 1e-6, weight multiply in weight
    dtype after fp32 normalization;
  * NO 1/sqrt(d) attention scaling (scale=1.0);
  * relative-position bias only in layer 0 of encoder (bidirectional buckets)
    and decoder (causal buckets), shared by subsequent layers; cross-attention
    has no bias;
  * FlanT5: gated gelu_new MLP (wi_0 * gelu, wi_1), untied lm_head;
    tied-embedding models scale decoder output by d_model**-0.5.

Scoring runs the decoder teacher-forced over the whole answer in one pass
(parallel over answer tokens) instead of the reference's generate() loop —
the single biggest algorithmic win for TPU scoring.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import layers as L
from ..ops import quant as Q
from ..ops.attention import (attention, attention_flat,
                             attention_flat_packed)

Params = Any

# In-kernel T5 rel-pos bias (ops/attention.py _rel_bias_block). Measured on
# v5e: the per-tile bucket math + num_buckets selects cost more VPU time
# than the streamed dense bias costs in HBM reads at the bench shapes
# (37.5 vs 52.2 pairs/s), so the dense path stays the default; flip for
# long-sequence / HBM-bound regimes.
INKERNEL_REL_BIAS = False


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 512
    d_kv: int = 64
    d_ff: int = 1024
    num_heads: int = 6
    enc_layers: int = 8
    dec_layers: int = 8
    num_buckets: int = 32
    max_distance: int = 128
    eps: float = 1e-6
    gated: bool = True
    act: str = "gelu_new"
    tie_word_embeddings: bool = False
    decoder_start_token_id: int = 0
    pad_token_id: int = 0


# FlanT5 sizes (HF config values).
T5_CONFIGS = {
    "flan-t5-small": T5Config(d_model=512, d_kv=64, d_ff=1024, num_heads=6,
                              enc_layers=8, dec_layers=8),
    "flan-t5-base": T5Config(d_model=768, d_kv=64, d_ff=2048, num_heads=12,
                             enc_layers=12, dec_layers=12),
    "flan-t5-large": T5Config(d_model=1024, d_kv=64, d_ff=2816, num_heads=16,
                              enc_layers=24, dec_layers=24),
    "flan-t5-xl": T5Config(d_model=2048, d_kv=64, d_ff=5120, num_heads=32,
                           enc_layers=24, dec_layers=24),
    "flan-t5-xxl": T5Config(d_model=4096, d_kv=64, d_ff=10240, num_heads=64,
                            enc_layers=24, dec_layers=24),
}


# ---------------------------------------------------------------------------
# Relative position bias
# ---------------------------------------------------------------------------

def relative_position_bucket(relative_position: jnp.ndarray, bidirectional: bool,
                             num_buckets: int, max_distance: int) -> jnp.ndarray:
    """HF T5's bucketing of relative positions (memory_pos - query_pos)."""
    rel = relative_position
    buckets = jnp.zeros_like(rel)
    if bidirectional:
        num_buckets //= 2
        buckets = buckets + (rel > 0).astype(jnp.int32) * num_buckets
        rel = jnp.abs(rel)
    else:
        rel = -jnp.minimum(rel, 0)
    max_exact = num_buckets // 2
    is_small = rel < max_exact
    rel_large = max_exact + (
        jnp.log(rel.astype(jnp.float32) / max_exact + 1e-9)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    rel_large = jnp.minimum(rel_large, num_buckets - 1)
    return buckets + jnp.where(is_small, rel, rel_large)


def compute_position_bias(rel_emb: jnp.ndarray, qlen: int, klen: int,
                          bidirectional: bool, num_buckets: int,
                          max_distance: int, q_offset: int = 0) -> jnp.ndarray:
    """rel_emb: (num_buckets, heads) -> bias (1, heads, qlen, klen)."""
    ctx = jnp.arange(qlen)[:, None] + q_offset
    mem = jnp.arange(klen)[None, :]
    buckets = relative_position_bucket(mem - ctx, bidirectional, num_buckets,
                                       max_distance)
    bias = rel_emb[buckets]  # (qlen, klen, heads)
    return jnp.transpose(bias, (2, 0, 1))[None]


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------

def _t5_attention(p: Params, x: jnp.ndarray, kv: jnp.ndarray, heads: int,
                  bias=None, kv_mask=None, causal=False,
                  rel_bias=None, rel_cfg=None) -> jnp.ndarray:
    if rel_bias is None:
        # Head-major path: the flat flash kernel consumes the (B, S, H*D)
        # projection layout directly — no split/merge_heads transpose
        # copies (~10% of score time on v5e).
        if x is kv:
            # self-attention: ONE packed qkv matmul (d_model -> 3*inner)
            # beats three narrow ones on the MXU (~80% -> ~92% measured),
            # and the flash kernel reads the packed output in place.
            # Q.mm_packed keeps the same packing under int8 weights.
            a = attention_flat_packed(
                Q.mm_packed(x, [p["q"], p["k"], p["v"]]), heads, bias=bias,
                kv_mask=kv_mask, causal=causal, scale=1.0)
        else:
            # cross-attention: SEPARATE k/v matmuls. Packing k|v into one
            # wide matmul was tried (round 3) and A/B'd on chip at the
            # bench shapes: the packed projection hits ~96% roofline but
            # the two lane slices it forces on the (B, S, 2*inner) output
            # cost more than the width gain — device-only 70.0 vs 73.8
            # pairs/s with separate projections (scripts/device_ab.py,
            # r4 bisect). Narrow d_model->inner matmuls at S=640 already
            # run ~91% on the MXU.
            a = attention_flat(Q.mm(x, p["q"]), Q.mm(kv, p["k"]),
                               Q.mm(kv, p["v"]), heads, bias=bias,
                               kv_mask=kv_mask, causal=causal, scale=1.0)
        return Q.mm(a, p["o"])
    q = L.split_heads(Q.mm(x, p["q"]), heads)
    k = L.split_heads(Q.mm(kv, p["k"]), heads)
    v = L.split_heads(Q.mm(kv, p["v"]), heads)
    a = attention(q, k, v, bias=bias, kv_mask=kv_mask, causal=causal,
                  scale=1.0, rel_bias=rel_bias, rel_cfg=rel_cfg)
    return Q.mm(L.merge_heads(a), p["o"])


def _t5_mlp(p: Params, x: jnp.ndarray, cfg: T5Config) -> jnp.ndarray:
    if cfg.gated:
        if "w_q" in p["wi_0"]:
            # quantized: ONE packed wi_0|wi_1 matmul — shares the per-row
            # activation quant pass between the two projections (the quant
            # pass is the W8A8 path's main overhead) and doubles the GEMM
            # width. The (.., 2*d_ff) slices are contiguous lane halves.
            hh = Q.mm_packed(x, [p["wi_0"], p["wi_1"]])
            d_ff = hh.shape[-1] // 2
            h = L.ACT_FNS[cfg.act](hh[..., :d_ff]) * hh[..., d_ff:]
        else:
            h = L.ACT_FNS[cfg.act](Q.mm(x, p["wi_0"])) * Q.mm(x, p["wi_1"])
    else:
        h = jax.nn.relu(Q.mm(x, p["wi"]))
    return Q.mm(h, p["wo"])


def _enc_block(p: Params, x, cfg: T5Config, bias, kv_mask,
               rel_bias=None, rel_cfg=None):
    h = L.rms_norm(x, p["ln1"]["scale"], cfg.eps)
    x = x + _t5_attention(p["attn"], h, h, cfg.num_heads, bias=bias,
                          kv_mask=kv_mask, rel_bias=rel_bias, rel_cfg=rel_cfg)
    h = L.rms_norm(x, p["ln2"]["scale"], cfg.eps)
    x = x + _t5_mlp(p["mlp"], h, cfg)
    return x


def _dec_block(p: Params, x, enc, cfg: T5Config, self_bias, enc_mask,
               self_mask, rel_bias=None, rel_cfg=None):
    h = L.rms_norm(x, p["ln1"]["scale"], cfg.eps)
    x = x + _t5_attention(p["attn"], h, h, cfg.num_heads, bias=self_bias,
                          kv_mask=self_mask, causal=True,
                          rel_bias=rel_bias, rel_cfg=rel_cfg)
    h = L.rms_norm(x, p["ln_cross"]["scale"], cfg.eps)
    x = x + _t5_attention(p["cross"], h, enc, cfg.num_heads, kv_mask=enc_mask)
    h = L.rms_norm(x, p["ln2"]["scale"], cfg.eps)
    x = x + _t5_mlp(p["mlp"], h, cfg)
    return x


# ---------------------------------------------------------------------------
# Encoder / decoder
# ---------------------------------------------------------------------------

def encode(params: Params, cfg: T5Config, input_embeds: jnp.ndarray,
           mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """input_embeds: (B, S, d_model) — token embeds, possibly with image
    features spliced in (CLIP-FlanT5). mask: (B, S) bool."""
    enc = params["encoder"]
    rel_emb = enc["blocks"][0]["attn"]["rel_bias"]  # (buckets, heads)
    # dense bias feeds the reference path; the flash path recomputes the
    # bias in-kernel from rel_emb (dead code under jit on the other path)
    bias = compute_position_bias(
        rel_emb, input_embeds.shape[1], input_embeds.shape[1], True,
        cfg.num_buckets, cfg.max_distance)
    rel_cfg = (True, cfg.num_buckets, cfg.max_distance, 0)
    rb = rel_emb.T if INKERNEL_REL_BIAS else None
    # sequence-parallel annotation hooks (no-ops off an "sp" mesh):
    # GSPMD shards norms/MLP along S and all-gathers only around attention
    from ..parallel.sp import shard_seq
    x = shard_seq(input_embeds)
    for blk in enc["blocks"]:
        x = shard_seq(_enc_block(blk, x, cfg, bias, mask,
                                 rel_bias=rb, rel_cfg=rel_cfg))
    return L.rms_norm(x, enc["ln_final"]["scale"], cfg.eps)


def decode(params: Params, cfg: T5Config, decoder_ids: jnp.ndarray,
           enc_hidden: jnp.ndarray, enc_mask: jnp.ndarray | None = None,
           dec_mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Teacher-forced decoder pass. Returns logits (B, S_dec, vocab) fp32."""
    dec = params["decoder"]
    x = params["shared_emb"][decoder_ids]
    rel_emb = dec["blocks"][0]["attn"]["rel_bias"]
    bias = compute_position_bias(
        rel_emb, decoder_ids.shape[1], decoder_ids.shape[1], False,
        cfg.num_buckets, cfg.max_distance)
    rel_cfg = (False, cfg.num_buckets, cfg.max_distance, 0)
    rb = rel_emb.T if INKERNEL_REL_BIAS else None
    for blk in dec["blocks"]:
        x = _dec_block(blk, x, enc_hidden, cfg, bias, enc_mask, dec_mask,
                       rel_bias=rb, rel_cfg=rel_cfg)
    x = L.rms_norm(x, dec["ln_final"]["scale"], cfg.eps)
    if cfg.tie_word_embeddings:
        x = x * (cfg.d_model ** -0.5)
        logits = x @ params["shared_emb"].T
    else:
        logits = x @ params["lm_head"]
    return logits.astype(jnp.float32)


def embed_tokens(params: Params, ids: jnp.ndarray) -> jnp.ndarray:
    return params["shared_emb"][ids]


# ---------------------------------------------------------------------------
# Cached incremental decoding (generate)
# ---------------------------------------------------------------------------

def init_dec_cache(params: Params, cfg: T5Config, batch: int, max_len: int):
    """Self-attn KV cache + per-layer cross-attn k/v computed ONCE from the
    encoder output (the O(L^2) re-decode killer for generate)."""
    dtype = params["shared_emb"].dtype
    kv = cfg.num_heads * cfg.d_kv
    return [{"k": jnp.zeros((batch, max_len, kv), dtype),
             "v": jnp.zeros((batch, max_len, kv), dtype)}
            for _ in range(len(params["decoder"]["blocks"]))]


def cross_kv(params: Params, cfg: T5Config, enc_hidden: jnp.ndarray):
    """Per-layer cross-attention keys/values from the encoder hidden."""
    out = []
    for blk in params["decoder"]["blocks"]:
        out.append((Q.mm(enc_hidden, blk["cross"]["k"]),
                    Q.mm(enc_hidden, blk["cross"]["v"])))
    return out


def decode_step(params: Params, cfg: T5Config, tok_ids: jnp.ndarray,
                cache, cpos, cross_kvs, enc_mask=None):
    """One incremental decoder step.

    tok_ids: (B, 1) current decoder input token; cache: init_dec_cache
    pytree; cpos: scalar position (0 = decoder_start token);
    cross_kvs: cross_kv() output. Returns (logits (B, vocab) fp32,
    new cache).
    """
    dec = params["decoder"]
    x = params["shared_emb"][tok_ids]                     # (B, 1, D)
    rel_emb = dec["blocks"][0]["attn"]["rel_bias"]
    max_len = cache[0]["k"].shape[1]
    # bias row for query position cpos against keys 0..max_len-1
    ctx = jnp.full((1,), 1, jnp.int32) * cpos
    mem = jnp.arange(max_len)
    buckets = relative_position_bucket(mem[None, :] - ctx[:, None], False,
                                       cfg.num_buckets, cfg.max_distance)
    bias = jnp.transpose(rel_emb[buckets], (2, 0, 1))[None]  # (1,H,1,max_len)
    key_valid = mem <= cpos
    bias = jnp.where(key_valid[None, None, None, :], bias, -1e30)

    new_cache = []
    for blk, cl, (ck, cv) in zip(dec["blocks"], cache, cross_kvs):
        h = L.rms_norm(x, blk["ln1"]["scale"], cfg.eps)
        q = L.split_heads(Q.mm(h, blk["attn"]["q"]), cfg.num_heads)
        k1 = Q.mm(h, blk["attn"]["k"])
        v1 = Q.mm(h, blk["attn"]["v"])
        nk = jax.lax.dynamic_update_slice(cl["k"], k1, (0, cpos, 0))
        nv = jax.lax.dynamic_update_slice(cl["v"], v1, (0, cpos, 0))
        new_cache.append({"k": nk, "v": nv})
        a = attention(q, L.split_heads(nk, cfg.num_heads),
                      L.split_heads(nv, cfg.num_heads), bias=bias,
                      scale=1.0, impl="reference")
        x = x + Q.mm(L.merge_heads(a), blk["attn"]["o"])
        h = L.rms_norm(x, blk["ln_cross"]["scale"], cfg.eps)
        q = L.split_heads(Q.mm(h, blk["cross"]["q"]), cfg.num_heads)
        a = attention(q, L.split_heads(ck, cfg.num_heads),
                      L.split_heads(cv, cfg.num_heads), kv_mask=enc_mask,
                      scale=1.0, impl="reference")
        x = x + Q.mm(L.merge_heads(a), blk["cross"]["o"])
        h = L.rms_norm(x, blk["ln2"]["scale"], cfg.eps)
        x = x + _t5_mlp(blk["mlp"], h, cfg)
    x = L.rms_norm(x, dec["ln_final"]["scale"], cfg.eps)
    if cfg.tie_word_embeddings:
        x = x * (cfg.d_model ** -0.5)
        logits = x @ params["shared_emb"].T
    else:
        logits = x @ params["lm_head"]
    return logits[:, 0].astype(jnp.float32), new_cache


def answer_log_probs(params: Params, cfg: T5Config,
                     input_embeds: jnp.ndarray, enc_mask: jnp.ndarray,
                     answer_ids: jnp.ndarray, answer_mask: jnp.ndarray) -> jnp.ndarray:
    """log P(answer | encoder input), teacher-forced, per sequence.

    answer_ids: (B, A) answer token ids (incl. final </s>), right-padded.
    Returns (B,) mean per-token log-prob over real answer tokens (the
    reference's geometric-mean rule: exp(mean log p) — reference
    qwen2vl_model.py:289 and the v3.0 T5 loss-based scoring are both
    exp(mean log-likelihood)).
    """
    enc_hidden = encode(params, cfg, input_embeds, enc_mask)
    # shift right: decoder input = [start] + answer[:-1]
    start = jnp.full((answer_ids.shape[0], 1), cfg.decoder_start_token_id,
                     dtype=answer_ids.dtype)
    dec_in = jnp.concatenate([start, answer_ids[:, :-1]], axis=1)
    logits = decode(params, cfg, dec_in, enc_hidden, enc_mask)
    logp = jax.nn.log_softmax(logits, axis=-1)
    tok_logp = jnp.take_along_axis(logp, answer_ids[..., None], axis=-1,
                                   mode="clip")[..., 0]
    tok_logp = tok_logp * answer_mask
    return tok_logp.sum(-1) / jnp.maximum(answer_mask.sum(-1), 1)


# ---------------------------------------------------------------------------
# Init (tests / from-scratch)
# ---------------------------------------------------------------------------

def _init_t5_attn(key, cfg: T5Config, rel_bias_buckets: int | None, dtype):
    inner = cfg.num_heads * cfg.d_kv
    ks = jax.random.split(key, 5)
    p = {
        "q": {"w": (jax.random.normal(ks[0], (cfg.d_model, inner)) * 0.02).astype(dtype), "b": None},
        "k": {"w": (jax.random.normal(ks[1], (cfg.d_model, inner)) * 0.02).astype(dtype), "b": None},
        "v": {"w": (jax.random.normal(ks[2], (cfg.d_model, inner)) * 0.02).astype(dtype), "b": None},
        "o": {"w": (jax.random.normal(ks[3], (inner, cfg.d_model)) * 0.02).astype(dtype), "b": None},
    }
    if rel_bias_buckets:
        p["rel_bias"] = (jax.random.normal(ks[4], (rel_bias_buckets, cfg.num_heads)) * 0.02).astype(dtype)
    return p


def _init_t5_mlp(key, cfg: T5Config, dtype):
    ks = jax.random.split(key, 3)
    if cfg.gated:
        return {
            "wi_0": {"w": (jax.random.normal(ks[0], (cfg.d_model, cfg.d_ff)) * 0.02).astype(dtype), "b": None},
            "wi_1": {"w": (jax.random.normal(ks[1], (cfg.d_model, cfg.d_ff)) * 0.02).astype(dtype), "b": None},
            "wo": {"w": (jax.random.normal(ks[2], (cfg.d_ff, cfg.d_model)) * 0.02).astype(dtype), "b": None},
        }
    return {
        "wi": {"w": (jax.random.normal(ks[0], (cfg.d_model, cfg.d_ff)) * 0.02).astype(dtype), "b": None},
        "wo": {"w": (jax.random.normal(ks[2], (cfg.d_ff, cfg.d_model)) * 0.02).astype(dtype), "b": None},
    }


def init_t5(key, cfg: T5Config, dtype=jnp.float32) -> Params:
    keys = jax.random.split(key, cfg.enc_layers + cfg.dec_layers + 3)
    enc_blocks = []
    for i in range(cfg.enc_layers):
        ks = jax.random.split(keys[i], 2)
        enc_blocks.append({
            "ln1": {"scale": jnp.ones((cfg.d_model,), dtype)},
            "attn": _init_t5_attn(ks[0], cfg, cfg.num_buckets if i == 0 else None, dtype),
            "ln2": {"scale": jnp.ones((cfg.d_model,), dtype)},
            "mlp": _init_t5_mlp(ks[1], cfg, dtype),
        })
    dec_blocks = []
    for i in range(cfg.dec_layers):
        ks = jax.random.split(keys[cfg.enc_layers + i], 3)
        dec_blocks.append({
            "ln1": {"scale": jnp.ones((cfg.d_model,), dtype)},
            "attn": _init_t5_attn(ks[0], cfg, cfg.num_buckets if i == 0 else None, dtype),
            "ln_cross": {"scale": jnp.ones((cfg.d_model,), dtype)},
            "cross": _init_t5_attn(ks[1], cfg, None, dtype),
            "ln2": {"scale": jnp.ones((cfg.d_model,), dtype)},
            "mlp": _init_t5_mlp(ks[2], cfg, dtype),
        })
    return {
        "shared_emb": (jax.random.normal(keys[-3], (cfg.vocab_size, cfg.d_model)) * 0.02).astype(dtype),
        "encoder": {"blocks": enc_blocks,
                    "ln_final": {"scale": jnp.ones((cfg.d_model,), dtype)}},
        "decoder": {"blocks": dec_blocks,
                    "ln_final": {"scale": jnp.ones((cfg.d_model,), dtype)}},
        "lm_head": None if cfg.tie_word_embeddings else
                   (jax.random.normal(keys[-1], (cfg.d_model, cfg.vocab_size)) * 0.02).astype(dtype),
    }


def greedy_decode(params: Params, cfg: T5Config, enc_hidden: jnp.ndarray,
                  enc_mask: jnp.ndarray, max_new_tokens: int,
                  eos_id: int = 1, pad_id: int = 0) -> jnp.ndarray:
    """Batched greedy decode entirely on device (lax.fori_loop over cached
    decode_step — zero per-token host round-trips; the reference's
    model.generate equivalent for CLIP-FlanT5, reference mm_utils.py:182-241
    loader + HF generate in clip_t5_model.py).

    Returns (B, max_new_tokens) int32, pad_id after EOS. EOS itself is not
    emitted into the output (matches tokenizer.decode(skip_special) flow).
    """
    from jax import lax

    B = enc_hidden.shape[0]
    ckv = cross_kv(params, cfg, enc_hidden)
    cache = init_dec_cache(params, cfg, B, max_new_tokens + 1)
    tokens = jnp.full((B, max_new_tokens), pad_id, jnp.int32)
    done = jnp.zeros((B,), bool)
    tok = jnp.full((B, 1), cfg.decoder_start_token_id, jnp.int32)

    def body(step, carry):
        tok, cache, tokens, done = carry
        logits, cache = decode_step(params, cfg, tok, cache, step, ckv,
                                    enc_mask)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        emit = jnp.where(done | (nxt == eos_id), pad_id, nxt)
        tokens = lax.dynamic_update_slice(tokens, emit[:, None], (0, step))
        done = done | (nxt == eos_id)
        return (nxt[:, None], cache, tokens, done)

    _, _, tokens, _ = lax.fori_loop(0, max_new_tokens, body,
                                    (tok, cache, tokens, done))
    return tokens
