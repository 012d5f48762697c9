"""SigLIP vision tower (functional JAX).

Used by PaliGemma (224/448/896, patch 14; reference
t2v_metrics/models/vqascore_models/paligemma_model.py:10-41) and Gemma3
(896px tower pooled to 256 soft tokens; reference gemma3_model.py).

Architecture (HF SiglipVisionModel): conv patch embed (with bias), learned
position embeddings, NO class token, pre-LN blocks (LayerNorm, not RMSNorm),
gelu_pytorch_tanh MLP, final post-LN. Patch conv is expressed as
patchify-matmul like the CLIP tower.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ..ops import layers as L
from ..ops.attention import attention_flat, attention_flat_packed
from ..ops.image import patchify

Params = Any


@dataclasses.dataclass(frozen=True)
class SiglipVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    width: int = 1152
    layers: int = 27
    heads: int = 16
    mlp_dim: int = 4304
    ln_eps: float = 1e-6
    act: str = "gelu_pytorch_tanh"

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


def vision_tower(p: Params, cfg: SiglipVisionConfig,
                 pixels: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 3) normalized -> (B, num_patches, width)."""
    pixels = pixels.astype(p["patch_w"].dtype)  # bf16 MXU path (HF casts)
    x = patchify(pixels, cfg.patch_size) @ p["patch_w"] + p["patch_b"]
    x = x + p["pos_emb"]
    for blk in p["blocks"]:
        h = L.layer_norm(x, blk["ln1"]["scale"], blk["ln1"]["bias"], cfg.ln_eps)
        # flat flash kernel consumes the projection layout directly — no
        # split/merge_heads transpose copies; q/k/v run as ONE packed
        # width->3*width matmul read in place by the kernel via
        # lane-offset views (see ops/attention.py)
        w_qkv = jnp.concatenate([blk["attn"]["q"]["w"], blk["attn"]["k"]["w"],
                                 blk["attn"]["v"]["w"]], axis=1)
        b_qkv = jnp.concatenate([blk["attn"]["q"]["b"], blk["attn"]["k"]["b"],
                                 blk["attn"]["v"]["b"]])
        a = attention_flat_packed(L.linear(h, w_qkv, b_qkv), cfg.heads)
        x = x + L.linear(a, blk["attn"]["o"]["w"], blk["attn"]["o"]["b"])
        h = L.layer_norm(x, blk["ln2"]["scale"], blk["ln2"]["bias"], cfg.ln_eps)
        h = L.ACT_FNS[cfg.act](L.linear(h, blk["mlp"]["fc1"]["w"], blk["mlp"]["fc1"]["b"]))
        x = x + L.linear(h, blk["mlp"]["fc2"]["w"], blk["mlp"]["fc2"]["b"])
    return L.layer_norm(x, p["ln_post"]["scale"], p["ln_post"]["bias"], cfg.ln_eps)


def init_siglip(key, cfg: SiglipVisionConfig, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, cfg.layers + 3)
    patch_dim = 3 * cfg.patch_size ** 2

    def lin(k, din, dout):
        return {"w": (jax.random.normal(k, (din, dout)) * din ** -0.5).astype(dtype),
                "b": jnp.zeros((dout,), dtype)}

    def ln():
        return {"scale": jnp.ones((cfg.width,), dtype),
                "bias": jnp.zeros((cfg.width,), dtype)}

    blocks = []
    for i in range(cfg.layers):
        sub = jax.random.split(ks[i], 6)
        blocks.append({
            "ln1": ln(),
            "attn": {"q": lin(sub[0], cfg.width, cfg.width),
                     "k": lin(sub[1], cfg.width, cfg.width),
                     "v": lin(sub[2], cfg.width, cfg.width),
                     "o": lin(sub[3], cfg.width, cfg.width)},
            "ln2": ln(),
            "mlp": {"fc1": lin(sub[4], cfg.width, cfg.mlp_dim),
                    "fc2": lin(sub[5], cfg.mlp_dim, cfg.width)},
        })
    return {
        "patch_w": (jax.random.normal(ks[-3], (patch_dim, cfg.width))
                    * patch_dim ** -0.5).astype(dtype),
        "patch_b": jnp.zeros((cfg.width,), dtype),
        "pos_emb": (jax.random.normal(ks[-2], (cfg.num_patches, cfg.width))
                    * 0.02).astype(dtype),
        "blocks": blocks,
        "ln_post": {"scale": jnp.ones((cfg.width,), dtype),
                    "bias": jnp.zeros((cfg.width,), dtype)},
    }


def convert_siglip(sd, num_layers: int, dtype=jnp.float32,
                   prefix="vision_model") -> Params:
    """HF SiglipVisionModel state dict -> our pytree."""
    from .convert import t2np, _lin, _ln

    conv_w = t2np(sd[f"{prefix}.embeddings.patch_embedding.weight"])
    width = conv_w.shape[0]
    out = {
        "patch_w": jnp.asarray(conv_w.reshape(width, -1).T, dtype),
        "patch_b": jnp.asarray(
            t2np(sd[f"{prefix}.embeddings.patch_embedding.bias"]), dtype),
        "pos_emb": jnp.asarray(
            t2np(sd[f"{prefix}.embeddings.position_embedding.weight"]), dtype),
        "blocks": [],
        "ln_post": _ln(sd, f"{prefix}.post_layernorm", dtype),
    }
    for i in range(num_layers):
        b = f"{prefix}.encoder.layers.{i}"
        out["blocks"].append({
            "ln1": _ln(sd, f"{b}.layer_norm1", dtype),
            "attn": {"q": _lin(sd, f"{b}.self_attn.q_proj", dtype),
                     "k": _lin(sd, f"{b}.self_attn.k_proj", dtype),
                     "v": _lin(sd, f"{b}.self_attn.v_proj", dtype),
                     "o": _lin(sd, f"{b}.self_attn.out_proj", dtype)},
            "ln2": _ln(sd, f"{b}.layer_norm2", dtype),
            "mlp": {"fc1": _lin(sd, f"{b}.mlp.fc1", dtype),
                    "fc2": _lin(sd, f"{b}.mlp.fc2", dtype)},
        })
    return out
