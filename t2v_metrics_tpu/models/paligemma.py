"""PaliGemma scorer (SigLIP + Gemma-2B prefix-LM decoder), TPU-native.

Reference adapter (t2v_metrics/models/vqascore_models/paligemma_model.py):
224/448/896 mix registry (:10-41); ``video_mode="concat"`` — videos route
through the Score-level frame-concat path (:44-46); the score is the
probability of ONLY the first answer token from the first generated step's
full-vocab softmax (:106-113) — no geometric mean.

Architecture (HF PaliGemmaForConditionalGeneration):
  * SigLIP tower -> linear projector -> features / sqrt(d_model);
  * Gemma-2B decoder (MQA kv_heads=1, head_dim 256, GeGLU, (1+w) RMSNorm,
    sqrt(d)-scaled embeddings, tied head);
  * prefix-LM attention: image tokens + prompt are fully bidirectional,
    generated tokens causal (realized with the bidir_ids overlay).

Note on the reference's ``tokenizer.encode(answer)[0]``: the Gemma
tokenizer prepends BOS, so the intended first *content* token is used here
(first non-BOS id).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

from . import decoder as dec
from . import siglip

Params = Any


@dataclasses.dataclass(frozen=True)
class PaliGemmaConfig:
    vision: siglip.SiglipVisionConfig
    text: dec.DecoderConfig
    image_token_id: int = 257152
    bos_token_id: int = 2

    @property
    def num_image_tokens(self) -> int:
        return self.vision.num_patches


def _gemma2b_text(vocab=257216):
    return dec.DecoderConfig(
        vocab_size=vocab, d_model=2048, layers=18, heads=8, kv_heads=1,
        head_dim=256, d_ff=16384, act="gelu_pytorch_tanh",
        rope_theta=10_000.0, mrope_section=None, qkv_bias=False,
        tie_embeddings=True, rms_offset=1.0, rms_cast_weight=False)


def _siglip(size):
    return siglip.SiglipVisionConfig(image_size=size, patch_size=14,
                                     width=1152, layers=27, heads=16,
                                     mlp_dim=4304)


PALIGEMMA_MODELS = {
    "paligemma-3b-mix-224": {
        "hf": "google/paligemma-3b-mix-224",
        "config": PaliGemmaConfig(vision=_siglip(224), text=_gemma2b_text()),
    },
    "paligemma-3b-mix-448": {
        "hf": "google/paligemma-3b-mix-448",
        "config": PaliGemmaConfig(vision=_siglip(448), text=_gemma2b_text()),
    },
    "paligemma-3b-mix-896": {
        "hf": "google/paligemma-3b-mix-896",
        "config": PaliGemmaConfig(vision=_siglip(896), text=_gemma2b_text()),
    },
    "paligemma-test": {
        "hf": None,
        "config": PaliGemmaConfig(
            vision=siglip.SiglipVisionConfig(image_size=28, patch_size=14,
                                             width=32, layers=2, heads=4,
                                             mlp_dim=64),
            text=dec.DecoderConfig(
                vocab_size=512, d_model=48, layers=2, heads=4, kv_heads=1,
                head_dim=16, d_ff=96, act="gelu_pytorch_tanh",
                rope_theta=10_000.0, mrope_section=None, qkv_bias=False,
                tie_embeddings=True, rms_offset=1.0, rms_cast_weight=False),
            image_token_id=500, bos_token_id=2),
    },
}


def image_features(params: Params, cfg: PaliGemmaConfig,
                   pixels: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 3) -> (B, num_patches, d_model), scaled by 1/sqrt(d)."""
    feats = siglip.vision_tower(params["vision"], cfg.vision, pixels)
    proj = feats @ params["projector"]["w"] + params["projector"]["b"]
    return proj / (cfg.text.d_model ** 0.5)


def first_token_distribution(params: Params, cfg: PaliGemmaConfig,
                             ids, vis_feats, vis_mask, vis_slot,
                             position_ids, attn_mask, prefix_mask,
                             logit_pos) -> jnp.ndarray:
    """fp32 softmax over the vocab at the first generated step.

    prefix_mask: (B, S) True on image+prompt positions (bidirectional
    prefix-LM block). logit_pos: (B,) index of the last prompt token.
    """
    embed = params["decoder"]["embed"]
    scale = jnp.asarray(cfg.text.d_model ** 0.5, embed.dtype)
    tok = embed[ids] * scale
    vis = jnp.take_along_axis(vis_feats, vis_slot[..., None], axis=1)
    embeds = jnp.where(vis_mask[..., None], vis.astype(tok.dtype), tok)
    bidir = jnp.where(prefix_mask, 0, -1)
    logits, _ = dec.forward(params["decoder"], cfg.text, embeds, position_ids,
                            attn_mask, bidir_ids=bidir,
                            logit_positions=logit_pos[:, None])  # (B, 1, V)
    return jax.nn.softmax(logits[:, 0], axis=-1)


def init_paligemma(key, cfg: PaliGemmaConfig, dtype=jnp.float32) -> Params:
    kv, kp, kd = jax.random.split(key, 3)
    params = {
        "vision": siglip.init_siglip(kv, cfg.vision, dtype),
        "projector": {
            "w": (jax.random.normal(kp, (cfg.vision.width, cfg.text.d_model))
                  * cfg.vision.width ** -0.5).astype(dtype),
            "b": jnp.zeros((cfg.text.d_model,), dtype),
        },
        "decoder": dec.init_decoder(kd, cfg.text, dtype),
    }
    for blk in params["decoder"]["blocks"]:
        blk["ln1"]["scale"] = jnp.zeros((cfg.text.d_model,), dtype)
        blk["ln2"]["scale"] = jnp.zeros((cfg.text.d_model,), dtype)
    params["decoder"]["ln_final"]["scale"] = jnp.zeros((cfg.text.d_model,), dtype)
    return params


def convert_paligemma(sd, cfg: PaliGemmaConfig, dtype=jnp.bfloat16) -> Params:
    from .convert import t2np

    def J(name, transpose=False):
        arr = t2np(sd[name])
        return jnp.asarray(arr.T if transpose else arr, dtype)

    vp = ("model.vision_tower.vision_model"
          if any(k.startswith("model.vision_tower") for k in sd)
          else "vision_tower.vision_model")
    tp = ("model.language_model" if any(k.startswith("model.language_model.layers")
                                        for k in sd) else "language_model.model")
    mp = ("model.multi_modal_projector"
          if any(k.startswith("model.multi_modal_projector") for k in sd)
          else "multi_modal_projector")

    blocks = []
    for i in range(cfg.text.layers):
        b = f"{tp}.layers.{i}"
        blocks.append({
            "ln1": {"scale": J(f"{b}.input_layernorm.weight")},
            "ln2": {"scale": J(f"{b}.post_attention_layernorm.weight")},
            "attn": {
                "q": {"w": J(f"{b}.self_attn.q_proj.weight", True), "b": None},
                "k": {"w": J(f"{b}.self_attn.k_proj.weight", True), "b": None},
                "v": {"w": J(f"{b}.self_attn.v_proj.weight", True), "b": None},
                "o": {"w": J(f"{b}.self_attn.o_proj.weight", True), "b": None},
            },
            "mlp": {
                "gate": {"w": J(f"{b}.mlp.gate_proj.weight", True), "b": None},
                "up": {"w": J(f"{b}.mlp.up_proj.weight", True), "b": None},
                "down": {"w": J(f"{b}.mlp.down_proj.weight", True), "b": None},
            },
        })
    return {
        "vision": siglip.convert_siglip(sd, cfg.vision.layers, dtype, prefix=vp),
        "projector": {"w": J(f"{mp}.linear.weight", True),
                      "b": J(f"{mp}.linear.bias")},
        "decoder": {
            "embed": J(f"{tp}.embed_tokens.weight"),
            "blocks": blocks,
            "ln_final": {"scale": J(f"{tp}.norm.weight")},
        },
    }
