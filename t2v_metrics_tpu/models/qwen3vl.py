"""Qwen3-VL: deepstack ViT + interleaved-M-RoPE qk-norm decoder.

Reference adapter surface (t2v_metrics/models/vqascore_models/
qwen3vl_model.py): 12 Qwen3-VL variants incl. MoE + 3 Qwen3.5 (:9-146);
forward/trace/generate mirror Qwen2VL (:278-643); two-step input prep with
image_patch_size and thinking disabled for qwen3.5 (:226-272).

Architecture (HF Qwen3VLForConditionalGeneration semantics):
  * vision: Conv3d(+bias) patch embed as matmul, bilinear-interpolated
    learned position embeddings (48x48 table), full attention per image
    (no windowing — a notable simplification vs Qwen2.5-VL), LayerNorm
    blocks with plain-GELU-tanh MLP, and a LayerNorm PatchMerger;
    "deepstack" mergers tap intermediate layers (e.g. 8/16/24) and their
    features are added to the LLM hidden state after early decoder layers;
  * text: Qwen3 decoder — per-head RMSNorm on q/k before rope, no attn
    bias, interleaved M-RoPE (T stream overwritten by H at 1,4,7,... and
    W at 2,5,8,...);
  * rope index: same walk as Qwen2.5-VL but video t-index is the raw frame
    index (timestamps are encoded as text, not positions).

MoE variants (30b-a3b, 235b-a22b) are registered as planned-but-unbuilt;
dense variants are fully supported.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import layers as L
from ..ops.attention import attention_flat, attention_flat_packed
from . import decoder as dec
from . import qwen2vl as q2

Params = Any


@dataclasses.dataclass(frozen=True)
class Qwen3VisionConfig:
    hidden: int = 1152
    depth: int = 27
    heads: int = 16
    patch_size: int = 16
    temporal_patch_size: int = 2
    merge_size: int = 2
    d_ff: int = 4304
    out_hidden: int = 3584
    num_position_embeddings: int = 2304
    deepstack_indexes: tuple = (8, 16, 24)
    act: str = "gelu_pytorch_tanh"
    ln_eps: float = 1e-6
    # rope-index compat: qwen3 videos use raw frame indices (timestamps are
    # text), i.e. tokens_per_second=1 in the qwen2-style index builder
    tokens_per_second: int = 1

    @property
    def head_dim(self) -> int:
        return self.hidden // self.heads

    @property
    def patch_dim(self) -> int:
        return 3 * self.temporal_patch_size * self.patch_size ** 2

    @property
    def merge_unit(self) -> int:
        return self.merge_size ** 2

    @property
    def grid_side(self) -> int:
        return int(self.num_position_embeddings ** 0.5)


@dataclasses.dataclass(frozen=True)
class Qwen3VLConfig:
    vision: Qwen3VisionConfig
    text: dec.DecoderConfig
    image_token_id: int = 151655
    video_token_id: int = 151656
    vision_start_token_id: int = 151652
    vision_end_token_id: int = 151653


def _q3_text(d_model, layers, heads, kv_heads, d_ff, vocab=151936,
             head_dim=128, rope_theta=5_000_000.0):
    return dec.DecoderConfig(
        vocab_size=vocab, d_model=d_model, layers=layers, heads=heads,
        kv_heads=kv_heads, head_dim=head_dim, d_ff=d_ff, rope_theta=rope_theta,
        mrope_section=(24, 20, 20), mrope_interleaved=True, qkv_bias=False,
        qk_norm=True)


QWEN3_VL_MODELS = {
    # dense variants of the reference registry (qwen3vl_model.py:9-146);
    # dims follow the Qwen3 dense family
    "qwen3-vl-2b": {"hf": "Qwen/Qwen3-VL-2B-Instruct", "fps": 8.0,
                    "config": None, "dims": (2048, 28, 16, 8, 6144)},
    "qwen3-vl-4b": {"hf": "Qwen/Qwen3-VL-4B-Instruct", "fps": 8.0,
                    "config": None, "dims": (2560, 36, 32, 8, 9728)},
    "qwen3-vl-8b": {"hf": "Qwen/Qwen3-VL-8B-Instruct", "fps": 8.0,
                    "config": None, "dims": (4096, 36, 32, 8, 12288)},
    "qwen3-vl-32b": {"hf": "Qwen/Qwen3-VL-32B-Instruct", "fps": 8.0,
                     "config": None, "dims": (5120, 64, 64, 8, 25600)},
    # MoE variants (reference qwen3vl_model.py:28-45); dense-einsum experts,
    # EP-shardable over the packed expert axis
    "qwen3-vl-30b-a3b": {"hf": "Qwen/Qwen3-VL-30B-A3B-Instruct", "fps": 8.0,
                         "config": None,
                         "moe_dims": (2048, 48, 32, 4, 128, 8, 768)},
    "qwen3-vl-235b-a22b": {"hf": "Qwen/Qwen3-VL-235B-A22B-Instruct", "fps": 8.0,
                           "config": None,
                           "moe_dims": (4096, 94, 64, 4, 128, 8, 1536)},
    # Qwen3.5 (reference qwen3vl_model.py:119-146): same inference pattern
    # as Qwen3-VL but the chat template closes an empty thinking block
    # (enable_thinking=False, :242). Dims provisional — no public HF config
    # at the reference checkout; structured as Qwen3-VL dense.
    "qwen3.5-4b": {"hf": "Qwen/Qwen3.5-4B", "fps": 8.0, "config": None,
                   "dims": (2560, 36, 32, 8, 9728), "enable_thinking": False},
    "qwen3.5-9b": {"hf": "Qwen/Qwen3.5-9B", "fps": 8.0, "config": None,
                   "dims": (4096, 40, 32, 8, 12288), "enable_thinking": False},
    "qwen3.5-27b": {"hf": "Qwen/Qwen3.5-27B", "fps": 8.0, "config": None,
                    "dims": (5120, 64, 64, 8, 25600),
                    "enable_thinking": False},
    "qwen3-vl-test": {"hf": None, "fps": 8.0, "config": "test", "dims": None},
    "qwen3-vl-moe-test": {"hf": None, "fps": 8.0, "config": "moe-test",
                          "dims": None},
}

# -thinking variants (reference qwen3vl_model.py:19-118): identical
# architecture, different checkpoints. Registered programmatically so the
# name list matches the reference one-for-one.
for _base, _hf in [("qwen3-vl-2b", "Qwen/Qwen3-VL-2B-Thinking"),
                   ("qwen3-vl-4b", "Qwen/Qwen3-VL-4B-Thinking"),
                   ("qwen3-vl-8b", "Qwen/Qwen3-VL-8B-Thinking"),
                   ("qwen3-vl-32b", "Qwen/Qwen3-VL-32B-Thinking"),
                   ("qwen3-vl-30b-a3b", "Qwen/Qwen3-VL-30B-A3B-Thinking"),
                   ("qwen3-vl-235b-a22b", "Qwen/Qwen3-VL-235B-A22B-Thinking")]:
    QWEN3_VL_MODELS[f"{_base}-thinking"] = dict(QWEN3_VL_MODELS[_base],
                                                hf=_hf)


def resolve_config(name: str) -> Qwen3VLConfig:
    spec = QWEN3_VL_MODELS[name]
    if spec["config"] == "moe-test":
        base = resolve_config("qwen3-vl-test")
        return dataclasses.replace(
            base, text=dataclasses.replace(base.text, num_experts=4,
                                           experts_per_tok=2, moe_d_ff=32))
    if spec.get("moe_dims"):
        d_model, layers, heads, kv, n_exp, topk, moe_ff = spec["moe_dims"]
        return Qwen3VLConfig(
            vision=Qwen3VisionConfig(out_hidden=d_model),
            text=dataclasses.replace(
                _q3_text(d_model, layers, heads, kv, d_ff=0),
                num_experts=n_exp, experts_per_tok=topk, moe_d_ff=moe_ff,
                moe_dispatch=True))
    if spec["config"] == "test":
        return Qwen3VLConfig(
            vision=Qwen3VisionConfig(hidden=32, depth=3, heads=4, patch_size=4,
                                     d_ff=64, out_hidden=48,
                                     num_position_embeddings=16,
                                     deepstack_indexes=(0, 1)),
            text=dec.DecoderConfig(
                vocab_size=512, d_model=48, layers=3, heads=4, kv_heads=2,
                head_dim=16, d_ff=96, rope_theta=5_000_000.0,
                mrope_section=(4, 2, 2), mrope_interleaved=True,
                qkv_bias=False, qk_norm=True),
            image_token_id=501, video_token_id=502,
            vision_start_token_id=503, vision_end_token_id=504)
    d_model, layers, heads, kv, d_ff = spec["dims"]
    return Qwen3VLConfig(
        vision=Qwen3VisionConfig(out_hidden=d_model),
        text=_q3_text(d_model, layers, heads, kv, d_ff))


# ---------------------------------------------------------------------------
# Host geometry
# ---------------------------------------------------------------------------

def pos_embed_interp(grid_thw: tuple, cfg: Qwen3VisionConfig):
    """Bilinear interpolation of the learned pos-embed table: returns
    (idx (4, S_spatial), weights (4, S_spatial)) — device code gathers and
    blends, then the result is tiled over t and permuted into merge-group
    order (HF fast_pos_embed_interpolate)."""
    t, h, w = grid_thw
    side = cfg.grid_side
    h_idx = np.linspace(0, side - 1, h)
    w_idx = np.linspace(0, side - 1, w)
    hf_, wf_ = h_idx.astype(np.int64), w_idx.astype(np.int64)
    hc = np.clip(hf_ + 1, None, side - 1)
    wc = np.clip(wf_ + 1, None, side - 1)
    dh, dw = h_idx - hf_, w_idx - wf_
    idx = np.stack([
        (hf_[:, None] * side + wf_[None, :]).ravel(),
        (hf_[:, None] * side + wc[None, :]).ravel(),
        (hc[:, None] * side + wf_[None, :]).ravel(),
        (hc[:, None] * side + wc[None, :]).ravel(),
    ])
    wts = np.stack([
        ((1 - dh)[:, None] * (1 - dw)[None, :]).ravel(),
        ((1 - dh)[:, None] * dw[None, :]).ravel(),
        (dh[:, None] * (1 - dw)[None, :]).ravel(),
        (dh[:, None] * dw[None, :]).ravel(),
    ]).astype(np.float32)
    # permutation into merge-group order (t, h/m, w/m, m, m)
    m = cfg.merge_size
    perm = np.arange(h * w).reshape(h // m, m, w // m, m)
    perm = perm.transpose(0, 2, 1, 3).ravel()
    return idx, wts, perm


def vision_geometry(grid_thw: tuple, cfg: Qwen3VisionConfig):
    """Rotary position ids in merge-group order (HF rot_pos_emb)."""
    t, h, w = grid_thw
    m = cfg.merge_size
    rows = (np.arange(h // m)[:, None, None, None] * m
            + np.arange(m)[None, None, :, None])
    cols = (np.arange(w // m)[None, :, None, None] * m
            + np.arange(m)[None, None, None, :])
    rows = np.broadcast_to(rows, (h // m, w // m, m, m)).reshape(-1)
    cols = np.broadcast_to(cols, (h // m, w // m, m, m)).reshape(-1)
    pos_hw = np.stack([rows, cols], axis=-1)
    return np.tile(pos_hw, (t, 1)).astype(np.int32)


# ---------------------------------------------------------------------------
# Device: vision tower
# ---------------------------------------------------------------------------

def _merger(p, cfg: Qwen3VisionConfig, x, postshuffle: bool):
    mu = cfg.merge_unit
    if postshuffle:
        x = x.reshape(-1, mu * cfg.hidden)
        x = L.layer_norm(x, p["norm"]["scale"], p["norm"]["bias"], cfg.ln_eps)
    else:
        x = L.layer_norm(x, p["norm"]["scale"], p["norm"]["bias"], cfg.ln_eps)
        x = x.reshape(-1, mu * cfg.hidden)
    x = L.linear(x, p["fc1"]["w"], p["fc1"]["b"])
    x = L.ACT_FNS["gelu"](x)
    return L.linear(x, p["fc2"]["w"], p["fc2"]["b"])


def vision_tower(params: Params, cfg: Qwen3VisionConfig,
                 patches: jnp.ndarray,     # (S, patch_dim) merge-group order
                 pos_hw: jnp.ndarray,      # (S, 2)
                 pe_idx: jnp.ndarray,      # (4, S_spatial)
                 pe_w: jnp.ndarray,        # (4, S_spatial)
                 pe_perm: jnp.ndarray,     # (S_spatial,)
                 seg: jnp.ndarray,         # (S,) image segment ids, -1 pad
                 grid_t: int):
    """-> (merged feats (S/mu, out), deepstack feats (n_ds, S/mu, out))."""
    patches = patches.astype(params["patch_w"].dtype)  # bf16 MXU path
    x = patches @ params["patch_w"] + params["patch_b"]

    pe = jnp.einsum("ksd,ks->sd", params["pos_emb"][pe_idx], pe_w)
    pe = pe[pe_perm]
    pe = jnp.tile(pe, (grid_t, 1))
    pad = x.shape[0] - pe.shape[0]
    if pad > 0:
        pe = jnp.concatenate([pe, jnp.zeros((pad, pe.shape[1]), pe.dtype)])
    x = x + pe.astype(x.dtype)

    half = cfg.head_dim // 2
    inv = 1.0 / (10000.0 ** (jnp.arange(0, half, 2, dtype=jnp.float32) / half))
    freqs = pos_hw.astype(jnp.float32)[..., None] * inv
    freqs = freqs.reshape(pos_hw.shape[0], -1)
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    cos, sin = jnp.cos(emb)[None], jnp.sin(emb)[None]

    x = x[None]
    deepstack = []
    for i, blk in enumerate(params["blocks"]):
        h = L.layer_norm(x, blk["ln1"]["scale"], blk["ln1"]["bias"], cfg.ln_eps)
        # ONE packed qkv matmul; rope applies on the q|k lane region of
        # the packed (B,S,2H,D) view, and the flash kernel reads q/k/v as
        # lane-offset views — no slice copies, no (B,H,S,D) transposes
        # (see ops/attention.py flash_attention_flat_packed)
        w_qkv = jnp.concatenate([blk["attn"]["q"]["w"], blk["attn"]["k"]["w"],
                                 blk["attn"]["v"]["w"]], axis=1)
        b_qkv = jnp.concatenate([blk["attn"]["q"]["b"], blk["attn"]["k"]["b"],
                                 blk["attn"]["v"]["b"]])
        packed = L.linear(h, w_qkv, b_qkv)
        b, s, _ = packed.shape
        hd = cfg.heads * cfg.head_dim
        qk = dec.apply_rope_bshd(
            packed[..., : 2 * hd].reshape(b, s, 2 * cfg.heads, cfg.head_dim),
            cos, sin)
        pk = jnp.concatenate([qk.reshape(b, s, -1), packed[..., 2 * hd:]],
                             axis=-1)
        a = attention_flat_packed(pk, cfg.heads, segment_ids=seg[None])
        x = x + L.linear(a, blk["attn"]["o"]["w"], blk["attn"]["o"]["b"])
        h = L.layer_norm(x, blk["ln2"]["scale"], blk["ln2"]["bias"], cfg.ln_eps)
        h = L.ACT_FNS[cfg.act](L.linear(h, blk["mlp"]["fc1"]["w"], blk["mlp"]["fc1"]["b"]))
        x = x + L.linear(h, blk["mlp"]["fc2"]["w"], blk["mlp"]["fc2"]["b"])
        if i in cfg.deepstack_indexes:
            di = cfg.deepstack_indexes.index(i)
            deepstack.append(_merger(params["deepstack"][di], cfg, x[0], True))

    out = _merger(params["merger"], cfg, x[0], False)
    return out, deepstack


def splice_and_answer_dists(params: Params, cfg: Qwen3VLConfig,
                            ids, stacked_feats, vis_mask, vis_slot,
                            position_ids, attn_mask, ans_pos,
                            temperature: float = 1.0) -> jnp.ndarray:
    """Teacher-forced per-answer-token softmax dists (B, A, V), deepstack
    residuals included (forward_with_trace_teacher_forcing path).

    stacked_feats: (B, 1+n_ds, T, D) — main level + deepstack levels."""
    main = stacked_feats[:, 0]
    tok = params["decoder"]["embed"][ids]
    vis = jnp.take_along_axis(main, vis_slot[..., None], axis=1)
    embeds = jnp.where(vis_mask[..., None], vis.astype(tok.dtype), tok)
    ds_list = []
    for level in range(1, stacked_feats.shape[1]):
        d = jnp.take_along_axis(stacked_feats[:, level],
                                vis_slot[..., None], axis=1)
        ds_list.append(jnp.where(vis_mask[..., None], d, 0.0))
    logits, _ = dec.forward(params["decoder"], cfg.text, embeds, position_ids,
                            attn_mask, deepstack=ds_list or None,
                            logit_positions=ans_pos)  # (B, A, V)
    return jax.nn.softmax(logits / temperature, axis=-1)


def splice_and_score(params: Params, cfg: Qwen3VLConfig,
                     ids, vis_feats, deepstack_feats, vis_mask, vis_slot,
                     position_ids, attn_mask, ans_ids, ans_pos, ans_mask,
                     temperature: float = 1.0) -> jnp.ndarray:
    """Teacher-forced mean log P(answer), with deepstack residuals.

    deepstack_feats: (n_ds, B, T, D) per-level features aligned with
    vis_feats' slots.
    """
    tok = params["decoder"]["embed"][ids]
    vis = jnp.take_along_axis(vis_feats, vis_slot[..., None], axis=1)
    embeds = jnp.where(vis_mask[..., None], vis.astype(tok.dtype), tok)
    ds_list = []
    for level in range(deepstack_feats.shape[0]):
        d = jnp.take_along_axis(deepstack_feats[level], vis_slot[..., None], axis=1)
        ds_list.append(jnp.where(vis_mask[..., None], d, 0.0))
    logits, _ = dec.forward(params["decoder"], cfg.text, embeds, position_ids,
                            attn_mask, deepstack=ds_list,
                            logit_positions=ans_pos)  # (B, A, V)
    logp = jax.nn.log_softmax(logits / temperature, axis=-1)
    tok_logp = jnp.take_along_axis(logp, ans_ids[..., None], axis=-1)[..., 0]
    tok_logp = tok_logp * ans_mask
    return tok_logp.sum(-1) / jnp.maximum(ans_mask.sum(-1), 1)


# ---------------------------------------------------------------------------
# Init / convert
# ---------------------------------------------------------------------------

def init_qwen3vl(key, cfg: Qwen3VLConfig, dtype=jnp.float32) -> Params:
    kv, kd = jax.random.split(key)
    v = cfg.vision
    ks = jax.random.split(kv, v.depth + 6)

    def lin(k, din, dout):
        return {"w": (jax.random.normal(k, (din, dout)) * din ** -0.5).astype(dtype),
                "b": jnp.zeros((dout,), dtype)}

    def ln(dim):
        return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}

    blocks = []
    for i in range(v.depth):
        sub = jax.random.split(ks[i], 6)
        blocks.append({
            "ln1": ln(v.hidden),
            "attn": {"q": lin(sub[0], v.hidden, v.hidden),
                     "k": lin(sub[1], v.hidden, v.hidden),
                     "v": lin(sub[2], v.hidden, v.hidden),
                     "o": lin(sub[3], v.hidden, v.hidden)},
            "ln2": ln(v.hidden),
            "mlp": {"fc1": lin(sub[4], v.hidden, v.d_ff),
                    "fc2": lin(sub[5], v.d_ff, v.hidden)},
        })

    def merger(k, postshuffle):
        k1, k2 = jax.random.split(k)
        mi = v.hidden * v.merge_unit
        return {"norm": ln(mi if postshuffle else v.hidden),
                "fc1": lin(k1, mi, mi),
                "fc2": lin(k2, mi, v.out_hidden)}

    params = {
        "vision": {
            "patch_w": (jax.random.normal(ks[-5], (v.patch_dim, v.hidden))
                        * v.patch_dim ** -0.5).astype(dtype),
            "patch_b": jnp.zeros((v.hidden,), dtype),
            "pos_emb": (jax.random.normal(ks[-4], (v.num_position_embeddings,
                                                   v.hidden)) * 0.02).astype(dtype),
            "blocks": blocks,
            "merger": merger(ks[-3], False),
            "deepstack": [merger(k, True) for k in
                          jax.random.split(ks[-2], len(v.deepstack_indexes))],
        },
        "decoder": dec.init_decoder(kd, cfg.text, dtype),
    }
    for blk in params["decoder"]["blocks"]:
        blk["attn"]["q_norm"] = {"scale": jnp.ones((cfg.text.head_dim,), dtype)}
        blk["attn"]["k_norm"] = {"scale": jnp.ones((cfg.text.head_dim,), dtype)}
    return params


def convert_qwen3vl(sd, cfg: Qwen3VLConfig, dtype=jnp.bfloat16) -> Params:
    from .convert import t2np

    def J(name, transpose=False):
        arr = t2np(sd[name])
        return jnp.asarray(arr.T if transpose else arr, dtype)

    vp = "model.visual" if any(k.startswith("model.visual") for k in sd) else "visual"
    tp = ("model.language_model" if any(k.startswith("model.language_model") for k in sd)
          else "model")
    v = cfg.vision
    conv = t2np(sd[f"{vp}.patch_embed.proj.weight"])

    def merger(prefix):
        return {"norm": {"scale": J(f"{prefix}.norm.weight"),
                         "bias": J(f"{prefix}.norm.bias")},
                "fc1": {"w": J(f"{prefix}.linear_fc1.weight", True),
                        "b": J(f"{prefix}.linear_fc1.bias")},
                "fc2": {"w": J(f"{prefix}.linear_fc2.weight", True),
                        "b": J(f"{prefix}.linear_fc2.bias")}}

    vision = {
        "patch_w": jnp.asarray(conv.reshape(conv.shape[0], -1).T, dtype),
        "patch_b": J(f"{vp}.patch_embed.proj.bias"),
        "pos_emb": J(f"{vp}.pos_embed.weight"),
        "blocks": [],
        "merger": merger(f"{vp}.merger"),
        "deepstack": [merger(f"{vp}.deepstack_merger_list.{i}")
                      for i in range(len(v.deepstack_indexes))],
    }
    for i in range(v.depth):
        b = f"{vp}.blocks.{i}"
        qkv_w = t2np(sd[f"{b}.attn.qkv.weight"])
        qkv_b = t2np(sd[f"{b}.attn.qkv.bias"])
        qw, kw, vw = np.split(qkv_w, 3, axis=0)
        qb, kb, vb = np.split(qkv_b, 3, axis=0)
        vision["blocks"].append({
            "ln1": {"scale": J(f"{b}.norm1.weight"), "bias": J(f"{b}.norm1.bias")},
            "attn": {
                "q": {"w": jnp.asarray(qw.T, dtype), "b": jnp.asarray(qb, dtype)},
                "k": {"w": jnp.asarray(kw.T, dtype), "b": jnp.asarray(kb, dtype)},
                "v": {"w": jnp.asarray(vw.T, dtype), "b": jnp.asarray(vb, dtype)},
                "o": {"w": J(f"{b}.attn.proj.weight", True),
                      "b": J(f"{b}.attn.proj.bias")},
            },
            "ln2": {"scale": J(f"{b}.norm2.weight"), "bias": J(f"{b}.norm2.bias")},
            "mlp": {"fc1": {"w": J(f"{b}.mlp.linear_fc1.weight", True),
                            "b": J(f"{b}.mlp.linear_fc1.bias")},
                    "fc2": {"w": J(f"{b}.mlp.linear_fc2.weight", True),
                            "b": J(f"{b}.mlp.linear_fc2.bias")}},
        })

    blocks = []
    for i in range(cfg.text.layers):
        b = f"{tp}.layers.{i}"
        if f"{b}.mlp.experts.gate_up_proj" in sd:
            mlp = {"moe": {
                "router": {"w": J(f"{b}.mlp.gate.weight", True)},
                "gate_up": J(f"{b}.mlp.experts.gate_up_proj"),  # (E, H, 2I)
                "down": J(f"{b}.mlp.experts.down_proj"),        # (E, I, H)
            }}
        else:
            mlp = {
                "gate": {"w": J(f"{b}.mlp.gate_proj.weight", True), "b": None},
                "up": {"w": J(f"{b}.mlp.up_proj.weight", True), "b": None},
                "down": {"w": J(f"{b}.mlp.down_proj.weight", True), "b": None},
            }
        blocks.append({
            "ln1": {"scale": J(f"{b}.input_layernorm.weight")},
            "attn": {
                "q": {"w": J(f"{b}.self_attn.q_proj.weight", True), "b": None},
                "k": {"w": J(f"{b}.self_attn.k_proj.weight", True), "b": None},
                "v": {"w": J(f"{b}.self_attn.v_proj.weight", True), "b": None},
                "o": {"w": J(f"{b}.self_attn.o_proj.weight", True), "b": None},
                "q_norm": {"scale": J(f"{b}.self_attn.q_norm.weight")},
                "k_norm": {"scale": J(f"{b}.self_attn.k_norm.weight")},
            },
            "ln2": {"scale": J(f"{b}.post_attention_layernorm.weight")},
            "mlp": mlp,
        })
    decoder = {
        "embed": J(f"{tp}.embed_tokens.weight"),
        "blocks": blocks,
        "ln_final": {"scale": J(f"{tp}.norm.weight")},
    }
    if not cfg.text.tie_embeddings:
        decoder["lm_head"] = J("lm_head.weight", True)
    return {"vision": vision, "decoder": decoder}
