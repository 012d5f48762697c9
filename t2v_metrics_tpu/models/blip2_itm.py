"""BLIP-2 ITM: the reference v3.0 ITMScore family, TPU-native.

The legacy ITMScore metric (removed in the v3.1 checkout, targeted by
BASELINE §0.1 alongside CLIPScore/CLIP-FlanT5) scores image-text matching
probability with BLIP-2's Q-Former ITM head:

  EVA-ViT vision tower (class token, packed qkv with [q, 0, v] bias) ->
  32 learned query tokens + text, BERT-style post-LN Q-Former with
  cross-attention (queries -> image) every `cross_attention_frequency`
  layers and separate query/text FFNs -> 2-class itm_head averaged over
  query positions -> P(match) = softmax(...)[1].

HF weight layout: Blip2ForImageTextRetrieval (Salesforce/blip2-itm-vit-g,
blip2-itm-vit-g-coco).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import layers as L
from ..ops.attention import attention

Params = Any


@dataclasses.dataclass(frozen=True)
class Blip2VisionConfig:
    image_size: int = 224
    patch_size: int = 14
    width: int = 1408
    layers: int = 39
    heads: int = 16
    mlp_dim: int = 6144
    ln_eps: float = 1e-6


@dataclasses.dataclass(frozen=True)
class QFormerConfig:
    vocab_size: int = 30523
    hidden: int = 768
    layers: int = 12
    heads: int = 12
    mlp_dim: int = 3072
    cross_attention_frequency: int = 2
    max_position_embeddings: int = 512
    ln_eps: float = 1e-12


@dataclasses.dataclass(frozen=True)
class Blip2ITMConfig:
    vision: Blip2VisionConfig
    qformer: QFormerConfig
    num_query_tokens: int = 32


BLIP2_ITM_MODELS = {
    # v3.0 ITMScore registry names -> HF retrieval checkpoints
    "blip2-itm": {"hf": "Salesforce/blip2-itm-vit-g",
                  "config": Blip2ITMConfig(Blip2VisionConfig(), QFormerConfig())},
    "blip2-itm-coco": {"hf": "Salesforce/blip2-itm-vit-g-coco",
                       "config": Blip2ITMConfig(Blip2VisionConfig(image_size=364),
                                                QFormerConfig())},
    "blip2-itm-test": {"hf": None,
                       "config": Blip2ITMConfig(
                           Blip2VisionConfig(image_size=28, patch_size=14,
                                             width=32, layers=2, heads=4,
                                             mlp_dim=64),
                           QFormerConfig(vocab_size=256, hidden=32, layers=2,
                                         heads=4, mlp_dim=64,
                                         cross_attention_frequency=2,
                                         max_position_embeddings=64),
                           num_query_tokens=4)},
}


# ---------------------------------------------------------------------------
# Vision tower (EVA-style ViT)
# ---------------------------------------------------------------------------

def vision_tower(p: Params, cfg: Blip2VisionConfig, pixels: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 3) -> (B, 1+P, width) with final post-LN."""
    from ..ops.image import patchify

    b = pixels.shape[0]
    x = patchify(pixels, cfg.patch_size) @ p["patch_w"] + p["patch_b"]
    cls = jnp.broadcast_to(p["class_emb"], (b, 1, cfg.width)).astype(x.dtype)
    x = jnp.concatenate([cls, x], axis=1)
    x = x + p["pos_emb"][: x.shape[1]]
    for blk in p["blocks"]:
        h = L.layer_norm(x, blk["ln1"]["scale"], blk["ln1"]["bias"], cfg.ln_eps)
        q = L.split_heads(L.linear(h, blk["attn"]["q"]["w"], blk["attn"]["q"]["b"]), cfg.heads)
        k = L.split_heads(L.linear(h, blk["attn"]["k"]["w"], blk["attn"]["k"]["b"]), cfg.heads)
        v = L.split_heads(L.linear(h, blk["attn"]["v"]["w"], blk["attn"]["v"]["b"]), cfg.heads)
        a = attention(q, k, v)
        x = x + L.linear(L.merge_heads(a), blk["attn"]["o"]["w"], blk["attn"]["o"]["b"])
        h = L.layer_norm(x, blk["ln2"]["scale"], blk["ln2"]["bias"], cfg.ln_eps)
        h = L.ACT_FNS["gelu"](L.linear(h, blk["mlp"]["fc1"]["w"], blk["mlp"]["fc1"]["b"]))
        x = x + L.linear(h, blk["mlp"]["fc2"]["w"], blk["mlp"]["fc2"]["b"])
    return L.layer_norm(x, p["ln_post"]["scale"], p["ln_post"]["bias"], cfg.ln_eps)


# ---------------------------------------------------------------------------
# Q-Former
# ---------------------------------------------------------------------------

def _bert_attn(p, cfg: QFormerConfig, x, kv, mask):
    q = L.split_heads(L.linear(x, p["q"]["w"], p["q"]["b"]), cfg.heads)
    k = L.split_heads(L.linear(kv, p["k"]["w"], p["k"]["b"]), cfg.heads)
    v = L.split_heads(L.linear(kv, p["v"]["w"], p["v"]["b"]), cfg.heads)
    a = attention(q, k, v, kv_mask=mask)
    a = L.merge_heads(a)
    out = L.linear(a, p["o"]["w"], p["o"]["b"])
    return L.layer_norm(out + x, p["ln"]["scale"], p["ln"]["bias"], cfg.ln_eps)


def _bert_ffn(p, cfg: QFormerConfig, x):
    h = L.ACT_FNS["gelu"](L.linear(x, p["fc1"]["w"], p["fc1"]["b"]))
    out = L.linear(h, p["fc2"]["w"], p["fc2"]["b"])
    return L.layer_norm(out + x, p["ln"]["scale"], p["ln"]["bias"], cfg.ln_eps)


def qformer(p: Params, cfg: QFormerConfig, embeds: jnp.ndarray,
            attn_mask: jnp.ndarray, image_embeds: jnp.ndarray,
            query_length: int) -> jnp.ndarray:
    """Post-LN BERT encoder with query-only cross-attention and split FFNs.

    embeds: (B, Q+T, H) pre-layernormed inputs; attn_mask (B, Q+T) bool;
    image_embeds (B, S_img, width).
    """
    x = embeds
    for i, blk in enumerate(p["layers"]):
        x = _bert_attn(blk["self"], cfg, x, x, attn_mask)
        xq, xt = x[:, :query_length], x[:, query_length:]
        if blk.get("cross") is not None:
            xq = _bert_attn(blk["cross"], cfg, xq, image_embeds, None)
        xq = _bert_ffn(blk["ffn_query"], cfg, xq)
        if xt.shape[1]:
            xt = _bert_ffn(blk["ffn_text"], cfg, xt)
        x = jnp.concatenate([xq, xt], axis=1)
    return x


def itm_scores(params: Params, cfg: Blip2ITMConfig, pixels: jnp.ndarray,
               ids: jnp.ndarray, text_mask: jnp.ndarray) -> jnp.ndarray:
    """(B images paired with B texts) -> (B,) P(match).

    pixels: (B, H, W, 3); ids: (B, T); text_mask: (B, T) bool.
    """
    qf = cfg.qformer
    image_embeds = vision_tower(params["vision"], cfg.vision, pixels)

    b, t = ids.shape
    nq = cfg.num_query_tokens
    word = params["qformer"]["word_emb"][ids]
    pos = params["qformer"]["pos_emb"][:t]
    text = word + pos
    query = jnp.broadcast_to(params["query_tokens"], (b, nq, qf.hidden))
    embeds = jnp.concatenate([query.astype(text.dtype), text], axis=1)
    embeds = L.layer_norm(embeds, params["qformer"]["ln_emb"]["scale"],
                          params["qformer"]["ln_emb"]["bias"], qf.ln_eps)
    mask = jnp.concatenate([jnp.ones((b, nq), bool), text_mask], axis=1)
    out = qformer(params["qformer"], qf, embeds, mask, image_embeds, nq)
    logits = L.linear(out[:, :nq], params["itm_head"]["w"], params["itm_head"]["b"])
    logits = logits.mean(axis=1)  # (B, 2)
    return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)[:, 1]


# ---------------------------------------------------------------------------
# Init / convert
# ---------------------------------------------------------------------------

def init_blip2_itm(key, cfg: Blip2ITMConfig, dtype=jnp.float32) -> Params:
    kv, kq, kt, kh = jax.random.split(key, 4)
    v = cfg.vision
    qf = cfg.qformer
    ks = jax.random.split(kv, v.layers + 4)
    patch_dim = 3 * v.patch_size ** 2

    def lin(k, din, dout):
        return {"w": (jax.random.normal(k, (din, dout)) * din ** -0.5).astype(dtype),
                "b": jnp.zeros((dout,), dtype)}

    def ln(dim):
        return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}

    vis_blocks = []
    for i in range(v.layers):
        sub = jax.random.split(ks[i], 6)
        vis_blocks.append({
            "ln1": ln(v.width),
            "attn": {"q": lin(sub[0], v.width, v.width),
                     "k": lin(sub[1], v.width, v.width),
                     "v": lin(sub[2], v.width, v.width),
                     "o": lin(sub[3], v.width, v.width)},
            "ln2": ln(v.width),
            "mlp": {"fc1": lin(sub[4], v.width, v.mlp_dim),
                    "fc2": lin(sub[5], v.mlp_dim, v.width)},
        })
    vision = {
        "class_emb": (jax.random.normal(ks[-4], (v.width,)) * 0.02).astype(dtype),
        "patch_w": (jax.random.normal(ks[-3], (patch_dim, v.width))
                    * patch_dim ** -0.5).astype(dtype),
        "patch_b": jnp.zeros((v.width,), dtype),
        "pos_emb": (jax.random.normal(ks[-2], ((v.image_size // v.patch_size) ** 2 + 1,
                                               v.width)) * 0.02).astype(dtype),
        "blocks": vis_blocks,
        "ln_post": ln(v.width),
    }

    kqs = jax.random.split(kq, qf.layers + 2)
    layers = []
    for i in range(qf.layers):
        sub = jax.random.split(kqs[i], 14)
        def bert_attn(offset, kv_dim):
            return {"q": lin(sub[offset], qf.hidden, qf.hidden),
                    "k": lin(sub[offset + 1], kv_dim, qf.hidden),
                    "v": lin(sub[offset + 2], kv_dim, qf.hidden),
                    "o": lin(sub[offset + 3], qf.hidden, qf.hidden),
                    "ln": ln(qf.hidden)}
        layer = {"self": bert_attn(0, qf.hidden),
                 "cross": (bert_attn(4, v.width)
                           if i % qf.cross_attention_frequency == 0 else None),
                 "ffn_query": {"fc1": lin(sub[8], qf.hidden, qf.mlp_dim),
                               "fc2": lin(sub[9], qf.mlp_dim, qf.hidden),
                               "ln": ln(qf.hidden)},
                 "ffn_text": {"fc1": lin(sub[10], qf.hidden, qf.mlp_dim),
                              "fc2": lin(sub[11], qf.mlp_dim, qf.hidden),
                              "ln": ln(qf.hidden)}}
        layers.append(layer)
    qformer_p = {
        "word_emb": (jax.random.normal(kqs[-2], (qf.vocab_size, qf.hidden)) * 0.02).astype(dtype),
        "pos_emb": (jax.random.normal(kqs[-1], (qf.max_position_embeddings, qf.hidden)) * 0.02).astype(dtype),
        "ln_emb": ln(qf.hidden),
        "layers": layers,
    }
    return {
        "vision": vision,
        "qformer": qformer_p,
        "query_tokens": (jax.random.normal(kt, (cfg.num_query_tokens, qf.hidden))
                         * 0.02).astype(dtype),
        "itm_head": lin(kh, qf.hidden, 2),
    }


def convert_blip2_itm(sd, cfg: Blip2ITMConfig, dtype=jnp.float32) -> Params:
    from .convert import t2np

    def J(name, transpose=False):
        arr = t2np(sd[name])
        return jnp.asarray(arr.T if transpose else arr, dtype)

    def lin(prefix):
        return {"w": J(f"{prefix}.weight", True), "b": J(f"{prefix}.bias")}

    def ln(prefix):
        return {"scale": J(f"{prefix}.weight"), "bias": J(f"{prefix}.bias")}

    v = cfg.vision
    conv = t2np(sd["vision_model.embeddings.patch_embedding.weight"])
    vis_blocks = []
    for i in range(v.layers):
        b = f"vision_model.encoder.layers.{i}"
        qkv_w = t2np(sd[f"{b}.self_attn.qkv.weight"])   # (3W, W)
        qkv_b = t2np(sd[f"{b}.self_attn.qkv.bias"])     # [q, 0, v]
        qw, kw, vw = np.split(qkv_w, 3, axis=0)
        qb, kb, vb = np.split(qkv_b, 3, axis=0)
        vis_blocks.append({
            "ln1": ln(f"{b}.layer_norm1"),
            "attn": {
                "q": {"w": jnp.asarray(qw.T, dtype), "b": jnp.asarray(qb, dtype)},
                "k": {"w": jnp.asarray(kw.T, dtype), "b": jnp.asarray(kb, dtype)},
                "v": {"w": jnp.asarray(vw.T, dtype), "b": jnp.asarray(vb, dtype)},
                "o": lin(f"{b}.self_attn.projection"),
            },
            "ln2": ln(f"{b}.layer_norm2"),
            "mlp": {"fc1": lin(f"{b}.mlp.fc1"), "fc2": lin(f"{b}.mlp.fc2")},
        })
    vision = {
        "class_emb": jnp.asarray(
            t2np(sd["vision_model.embeddings.class_embedding"]).reshape(-1), dtype),
        "patch_w": jnp.asarray(conv.reshape(conv.shape[0], -1).T, dtype),
        "patch_b": jnp.asarray(
            t2np(sd["vision_model.embeddings.patch_embedding.bias"]), dtype),
        "pos_emb": jnp.asarray(
            t2np(sd["vision_model.embeddings.position_embedding"])[0], dtype),
        "blocks": vis_blocks,
        "ln_post": ln("vision_model.post_layernorm"),
    }

    qf = cfg.qformer
    layers = []
    for i in range(qf.layers):
        b = f"qformer.encoder.layer.{i}"
        layer = {
            "self": {
                "q": lin(f"{b}.attention.attention.query"),
                "k": lin(f"{b}.attention.attention.key"),
                "v": lin(f"{b}.attention.attention.value"),
                "o": lin(f"{b}.attention.output.dense"),
                "ln": ln(f"{b}.attention.output.LayerNorm"),
            },
            "cross": None,
            "ffn_query": {"fc1": lin(f"{b}.intermediate_query.dense"),
                          "fc2": lin(f"{b}.output_query.dense"),
                          "ln": ln(f"{b}.output_query.LayerNorm")},
            "ffn_text": ({"fc1": lin(f"{b}.intermediate.dense"),
                          "fc2": lin(f"{b}.output.dense"),
                          "ln": ln(f"{b}.output.LayerNorm")}
                         if f"{b}.intermediate.dense.weight" in sd else None),
        }
        if f"{b}.crossattention.attention.query.weight" in sd:
            layer["cross"] = {
                "q": lin(f"{b}.crossattention.attention.query"),
                "k": lin(f"{b}.crossattention.attention.key"),
                "v": lin(f"{b}.crossattention.attention.value"),
                "o": lin(f"{b}.crossattention.output.dense"),
                "ln": ln(f"{b}.crossattention.output.LayerNorm"),
            }
        layers.append(layer)
    qformer_p = {
        "word_emb": J("embeddings.word_embeddings.weight"),
        "pos_emb": J("embeddings.position_embeddings.weight"),
        "ln_emb": ln("qformer.layernorm"),
        "layers": layers,
    }
    return {
        "vision": vision,
        "qformer": qformer_p,
        "query_tokens": jnp.asarray(t2np(sd["query_tokens"]), dtype)[0],
        "itm_head": lin("itm_head"),
    }
