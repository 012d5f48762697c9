"""Gemma 3 multimodal scorer (SigLIP tower + Gemma3 decoder), TPU-native.

Reference adapter behavior (t2v_metrics/models/vqascore_models/
gemma3_model.py): 4b/12b/27b-it registry (:9-34); videos become
``num_frames=10`` evenly-spaced frames with interleaved
"Frame at {t}s:" text (:72-128); P(answer) scoring (:169-238).

Architecture (HF Gemma3ForConditionalGeneration semantics):
  * SigLIP-400M tower (896px, patch 14) -> 4x4 average pool to 256 soft
    tokens -> RMSNorm -> linear projection into the LLM width;
  * Gemma3 decoder: sandwich norms, (1+w) RMSNorm multiplied in fp32,
    qk-norm, query_pre_attn_scalar scaling, 5-local:1-global sliding
    pattern (window 1024, local rope theta 10k, global 1M with linear
    scaling 8), sqrt(d)-scaled embeddings (bf16-rounded, matching HF),
    tied lm head;
  * image-token blocks attend bidirectionally on top of the causal mask.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import layers as L
from . import decoder as dec
from . import siglip

Params = Any


@dataclasses.dataclass(frozen=True)
class Gemma3Config:
    vision: siglip.SiglipVisionConfig
    text: dec.DecoderConfig
    mm_tokens_per_image: int = 256
    image_token_id: int = 262144
    boi_token_id: int = 255999
    eoi_token_id: int = 256000


def _gemma3_text(d_model, layers, heads, kv_heads, head_dim, d_ff,
                 q_scalar, vocab=262208):
    pattern = tuple("full_attention" if (i + 1) % 6 == 0 else "sliding_attention"
                    for i in range(layers))
    return dec.DecoderConfig(
        vocab_size=vocab, d_model=d_model, layers=layers, heads=heads,
        kv_heads=kv_heads, head_dim=head_dim, d_ff=d_ff,
        act="gelu_pytorch_tanh", rope_theta=1_000_000.0,
        mrope_section=None, qkv_bias=False, tie_embeddings=True,
        qk_norm=True, q_scale=q_scalar ** -0.5, sandwich_norms=True,
        rms_offset=1.0, rms_cast_weight=False, sliding_window=1024,
        layer_types=pattern, local_rope_theta=10_000.0,
        rope_scaling_factor=8.0)


_SIGLIP_896 = siglip.SiglipVisionConfig(image_size=896, patch_size=14,
                                        width=1152, layers=27, heads=16,
                                        mlp_dim=4304)

GEMMA3_MODELS = {
    # reference registry gemma3_model.py:9-34 (bf16, sdpa)
    "gemma-3-4b-it": {
        "hf": "google/gemma-3-4b-it",
        "config": Gemma3Config(
            vision=_SIGLIP_896,
            text=_gemma3_text(2560, 34, 8, 4, 256, 10240, q_scalar=256)),
    },
    "gemma-3-12b-it": {
        "hf": "google/gemma-3-12b-it",
        "config": Gemma3Config(
            vision=_SIGLIP_896,
            text=_gemma3_text(3840, 48, 16, 8, 256, 15360, q_scalar=256)),
    },
    "gemma-3-27b-it": {
        "hf": "google/gemma-3-27b-it",
        "config": Gemma3Config(
            vision=_SIGLIP_896,
            text=_gemma3_text(5376, 62, 32, 16, 128, 21504, q_scalar=168)),
    },
    "gemma-3-test": {
        "hf": None,
        "config": Gemma3Config(
            vision=siglip.SiglipVisionConfig(image_size=28, patch_size=14,
                                             width=32, layers=2, heads=4,
                                             mlp_dim=64),
            text=dec.DecoderConfig(
                vocab_size=512, d_model=48, layers=3, heads=4, kv_heads=2,
                head_dim=16, d_ff=96, act="gelu_pytorch_tanh",
                rope_theta=1_000_000.0, mrope_section=None, qkv_bias=False,
                tie_embeddings=True, qk_norm=True, q_scale=16 ** -0.5,
                sandwich_norms=True, rms_offset=1.0, rms_cast_weight=False,
                sliding_window=8,
                layer_types=("sliding_attention", "full_attention",
                             "sliding_attention"),
                local_rope_theta=10_000.0, rope_scaling_factor=8.0),
            mm_tokens_per_image=1, image_token_id=501, boi_token_id=502,
            eoi_token_id=503),
    },
}


def image_features(params: Params, cfg: Gemma3Config,
                   pixels: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 3) -> (B, mm_tokens_per_image, d_model) soft tokens."""
    feats = siglip.vision_tower(params["vision"], cfg.vision, pixels)
    b, s, w = feats.shape
    pp = cfg.vision.image_size // cfg.vision.patch_size
    tps = int(cfg.mm_tokens_per_image ** 0.5)
    k = pp // tps
    # 4x4 average pool over the patch grid (HF Gemma3MultiModalProjector)
    x = feats.reshape(b, pp // k, k, pp // k, k, w).mean(axis=(2, 4))
    x = x.reshape(b, tps * tps, w)
    x = L.rms_norm(x, params["projector"]["norm"]["scale"], cfg.vision.ln_eps,
                   offset=1.0, cast_weight_dtype=False)
    return x @ params["projector"]["proj"]


def image_group_ids(vis_mask: jnp.ndarray) -> jnp.ndarray:
    """(B, S) bool image-token mask -> (B, S) per-contiguous-block group
    ids, -1 on text. HF Gemma3 restricts bidirectional attention to the
    SAME image block (modeling_gemma3 token_type_ids_mask_function:
    image_group_ids = cumsum(new_image_start) - 1)."""
    m = vis_mask.astype(jnp.int32)
    prev = jnp.pad(m, ((0, 0), (1, 0)))[:, :-1]
    starts = m * (1 - prev)
    gid = jnp.cumsum(starts, axis=1) - 1
    return jnp.where(vis_mask, gid, -1)


def splice_and_score(params: Params, cfg: Gemma3Config,
                     ids, vis_feats, vis_mask, vis_slot, position_ids,
                     attn_mask, ans_ids, ans_pos, ans_mask,
                     temperature: float = 1.0) -> jnp.ndarray:
    """Teacher-forced mean log P(answer tokens); each image block attends
    bidirectionally within itself (per-block group ids from vis_mask)."""
    embed = params["decoder"]["embed"]
    scale = jnp.asarray(cfg.text.d_model ** 0.5, embed.dtype)  # bf16-rounded
    tok = embed[ids] * scale
    vis = jnp.take_along_axis(vis_feats, vis_slot[..., None], axis=1)
    embeds = jnp.where(vis_mask[..., None], vis.astype(tok.dtype), tok)
    bidir = image_group_ids(vis_mask)
    logits, _ = dec.forward(params["decoder"], cfg.text, embeds, position_ids,
                            attn_mask, bidir_ids=bidir,
                            logit_positions=ans_pos)  # (B, A, V)
    logp = jax.nn.log_softmax(logits / temperature, axis=-1)
    tok_logp = jnp.take_along_axis(logp, ans_ids[..., None], axis=-1)[..., 0]
    tok_logp = tok_logp * ans_mask
    return tok_logp.sum(-1) / jnp.maximum(ans_mask.sum(-1), 1)


def init_gemma3(key, cfg: Gemma3Config, dtype=jnp.float32) -> Params:
    kv, kp, kd = jax.random.split(key, 3)
    params = {
        "vision": siglip.init_siglip(kv, cfg.vision, dtype),
        "projector": {
            "norm": {"scale": jnp.zeros((cfg.vision.width,), dtype)},
            "proj": (jax.random.normal(kp, (cfg.vision.width, cfg.text.d_model))
                     * cfg.vision.width ** -0.5).astype(dtype),
        },
        "decoder": dec.init_decoder(kd, cfg.text, dtype),
    }
    # add gemma-specific norm params
    for blk in params["decoder"]["blocks"]:
        blk["attn"]["q_norm"] = {"scale": jnp.zeros((cfg.text.head_dim,), dtype)}
        blk["attn"]["k_norm"] = {"scale": jnp.zeros((cfg.text.head_dim,), dtype)}
        blk["ln1_post"] = {"scale": jnp.zeros((cfg.text.d_model,), dtype)}
        blk["ln_ff_pre"] = {"scale": jnp.zeros((cfg.text.d_model,), dtype)}
        blk["ln_ff_post"] = {"scale": jnp.zeros((cfg.text.d_model,), dtype)}
        blk["ln1"]["scale"] = jnp.zeros((cfg.text.d_model,), dtype)
        blk["ln2"]["scale"] = jnp.zeros((cfg.text.d_model,), dtype)
    params["decoder"]["ln_final"]["scale"] = jnp.zeros((cfg.text.d_model,), dtype)
    return params


def convert_gemma3(sd, cfg: Gemma3Config, dtype=jnp.bfloat16) -> Params:
    """HF Gemma3ForConditionalGeneration state dict -> our pytree."""
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

    vision = siglip.convert_siglip(sd, cfg.vision.layers, dtype, prefix=vp)

    blocks = []
    for i in range(cfg.text.layers):
        b = f"{tp}.layers.{i}"
        blocks.append({
            "ln1": {"scale": J(f"{b}.input_layernorm.weight")},
            "ln1_post": {"scale": J(f"{b}.post_attention_layernorm.weight")},
            "ln_ff_pre": {"scale": J(f"{b}.pre_feedforward_layernorm.weight")},
            "ln_ff_post": {"scale": J(f"{b}.post_feedforward_layernorm.weight")},
            "ln2": {"scale": J(f"{b}.post_attention_layernorm.weight")},  # unused
            "attn": {
                "q": {"w": J(f"{b}.self_attn.q_proj.weight", True), "b": None},
                "k": {"w": J(f"{b}.self_attn.k_proj.weight", True), "b": None},
                "v": {"w": J(f"{b}.self_attn.v_proj.weight", True), "b": None},
                "o": {"w": J(f"{b}.self_attn.o_proj.weight", True), "b": None},
                "q_norm": {"scale": J(f"{b}.self_attn.q_norm.weight")},
                "k_norm": {"scale": J(f"{b}.self_attn.k_norm.weight")},
            },
            "mlp": {
                "gate": {"w": J(f"{b}.mlp.gate_proj.weight", True), "b": None},
                "up": {"w": J(f"{b}.mlp.up_proj.weight", True), "b": None},
                "down": {"w": J(f"{b}.mlp.down_proj.weight", True), "b": None},
            },
        })
    return {
        "vision": vision,
        "projector": {
            "norm": {"scale": J(f"{mp}.mm_soft_emb_norm.weight")},
            "proj": J(f"{mp}.mm_input_projection_weight"),
        },
        "decoder": {
            "embed": J(f"{tp}.embed_tokens.weight"),
            "blocks": blocks,
            "ln_final": {"scale": J(f"{tp}.norm.weight")},
        },
    }
