"""LLaVA-1.5 VQAScore scorer (v3.0 legacy zoo).

The reference's v3.0 line shipped llava-v1.5-7b/13b as VQAScore models
(reference V_3.0_README.md:28-75); v3.1 removed them but the BASELINE
rebuild restores the whole zoo. Architecture (HF llava-hf/llava-1.5-*-hf):

  * CLIP ViT-L/14-336 vision tower, penultimate-layer patch features with
    CLS dropped — the same tower + feature tap as CLIP-FlanT5 (reference
    mm_utils.py:182-241 builds both through ``initialize_vision_modules``);
  * 2-layer MLP projector (1024 -> d_model, GELU);
  * Vicuna/Llama decoder (MHA, SwiGLU, RoPE theta 10k, untied head);
  * vicuna_v1 conversation: ``{SYSTEM_MSG} USER: <image>\\n{q} ASSISTANT:``
    with the answer scored teacher-forced (exp of mean answer-token
    log-prob — the same geometric-mean rule as every other family).

Prompt splicing follows the reference's ``tokenizer_image_token``
(mm_utils.py:142-160): split on ``<image>``, tokenize chunks (BOS only on
the first), placeholder positions carry IMAGE_TOKEN_INDEX.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ..ops import layers as L
from . import clip as jclip
from . import decoder as dec

Params = Any

_CLIP_L_336 = jclip.CLIP_ARCHS["ViT-L-14-336"][0]


@dataclasses.dataclass(frozen=True)
class LlavaConfig:
    vision: jclip.CLIPVisionConfig
    text: dec.DecoderConfig
    image_aspect_ratio: str = "pad"   # LLaVA-1.5 expand2square preprocessing

    @property
    def num_image_tokens(self) -> int:
        return (self.vision.image_size // self.vision.patch_size) ** 2


def _llama_text(d_model, layers, heads, d_ff, vocab=32000):
    return dec.DecoderConfig(
        vocab_size=vocab, d_model=d_model, layers=layers, heads=heads,
        kv_heads=heads, head_dim=d_model // heads, d_ff=d_ff,
        rms_eps=1e-5, rope_theta=10_000.0, mrope_section=None,
        qkv_bias=False, tie_embeddings=False)


LLAVA_MODELS = {
    # v3.0 zoo names (V_3.0_README.md:28-75); HF ports by llava-hf
    "llava-v1.5-7b": {
        "hf": "llava-hf/llava-1.5-7b-hf",
        "config": LlavaConfig(_CLIP_L_336, _llama_text(4096, 32, 32, 11008)),
    },
    "llava-v1.5-13b": {
        "hf": "llava-hf/llava-1.5-13b-hf",
        "config": LlavaConfig(_CLIP_L_336, _llama_text(5120, 40, 40, 13824)),
    },
    "llava-test": {
        "hf": None,
        "config": LlavaConfig(
            jclip.CLIPVisionConfig(image_size=28, patch_size=14, width=32,
                                   layers=2, heads=4, mlp_dim=64,
                                   proj_dim=24),
            _llama_text(48, 2, 4, 96, vocab=512)),
    },
}


def image_features(params: Params, cfg: LlavaConfig,
                   pixels: jnp.ndarray) -> jnp.ndarray:
    """(M, H, W, 3) -> (M, num_image_tokens, d_model)."""
    feats = jclip.vision_tower(params["vision"], cfg.vision, pixels,
                               feature_layer=-2)
    h = L.linear(feats, params["projector"]["fc1"]["w"],
                 params["projector"]["fc1"]["b"])
    h = L.ACT_FNS["gelu"](h)
    return L.linear(h, params["projector"]["fc2"]["w"],
                    params["projector"]["fc2"]["b"])


def splice_and_score(params: Params, cfg: LlavaConfig,
                     ids, vis_feats, vis_mask, vis_slot, position_ids,
                     attn_mask, ans_ids, ans_pos, ans_mask,
                     temperature: float = 1.0) -> jnp.ndarray:
    """Teacher-forced mean log P(answer tokens) for spliced prompts.

    ids: (B, S) token ids (0 at image slots); vis_feats (B, T, D);
    vis_mask/vis_slot (B, S); ans_pos indexes the logit position
    PREDICTING each answer token (prompt_len - 1 + i).
    """
    tok = params["decoder"]["embed"][ids]
    vis = jnp.take_along_axis(vis_feats, vis_slot[..., None], axis=1)
    embeds = jnp.where(vis_mask[..., None], vis.astype(tok.dtype), tok)
    logits, _ = dec.forward(params["decoder"], cfg.text, embeds,
                            position_ids, attn_mask,
                            logit_positions=ans_pos)  # (B, A, V)
    logp = jax.nn.log_softmax(logits / temperature, axis=-1)
    tok_logp = jnp.take_along_axis(logp, ans_ids[..., None], axis=-1)[..., 0]
    tok_logp = tok_logp * ans_mask
    return tok_logp.sum(-1) / jnp.maximum(ans_mask.sum(-1), 1)


def init_llava(key, cfg: LlavaConfig, dtype=jnp.float32) -> Params:
    kv, k1, k2, kd = jax.random.split(key, 4)
    vw = cfg.vision.width
    dm = cfg.text.d_model
    return {
        "vision": jclip.init_vision(kv, cfg.vision, dtype),
        "projector": {
            "fc1": {"w": (jax.random.normal(k1, (vw, dm))
                          * vw ** -0.5).astype(dtype),
                    "b": jnp.zeros((dm,), dtype)},
            "fc2": {"w": (jax.random.normal(k2, (dm, dm))
                          * dm ** -0.5).astype(dtype),
                    "b": jnp.zeros((dm,), dtype)},
        },
        "decoder": dec.init_decoder(kd, cfg.text, dtype),
    }


def convert_llava(sd, cfg: LlavaConfig, dtype=jnp.bfloat16) -> Params:
    """HF llava-hf/llava-1.5-*-hf state dict -> pytree.

    Key layout: ``vision_tower.vision_model.*``,
    ``multi_modal_projector.linear_{1,2}.*``,
    ``language_model.model.*`` / ``language_model.lm_head`` (transformers
    <4.52 nests them under ``model.`` instead — both accepted).
    """
    from .convert import convert_clip_vision, t2np

    def find_prefix(cands):
        for c in cands:
            if any(k.startswith(c) for k in sd):
                return c
        raise KeyError(f"none of {cands} found in state dict")

    vt = find_prefix(["vision_tower.vision_model",
                      "model.vision_tower.vision_model"])
    proj = find_prefix(["multi_modal_projector", "model.multi_modal_projector"])
    lm = find_prefix(["language_model.model", "model.language_model",
                      "language_model"])
    head_keys = ["lm_head.weight", "language_model.lm_head.weight",
                 "model.lm_head.weight"]
    head = next(k for k in head_keys if k in sd)

    J = lambda name: jnp.asarray(t2np(sd[name]), dtype)
    JT = lambda name: jnp.asarray(t2np(sd[name]).T, dtype)

    t = cfg.text
    blocks = []
    for i in range(t.layers):
        b = f"{lm}.layers.{i}"
        blocks.append({
            "ln1": {"scale": J(f"{b}.input_layernorm.weight")},
            "attn": {
                "q": {"w": JT(f"{b}.self_attn.q_proj.weight"), "b": None},
                "k": {"w": JT(f"{b}.self_attn.k_proj.weight"), "b": None},
                "v": {"w": JT(f"{b}.self_attn.v_proj.weight"), "b": None},
                "o": {"w": JT(f"{b}.self_attn.o_proj.weight"), "b": None},
            },
            "ln2": {"scale": J(f"{b}.post_attention_layernorm.weight")},
            "mlp": {
                "gate": {"w": JT(f"{b}.mlp.gate_proj.weight"), "b": None},
                "up": {"w": JT(f"{b}.mlp.up_proj.weight"), "b": None},
                "down": {"w": JT(f"{b}.mlp.down_proj.weight"), "b": None},
            },
        })
    return {
        "vision": convert_clip_vision(sd, cfg.vision.layers, dtype,
                                      prefix=vt),
        "projector": {
            "fc1": {"w": JT(f"{proj}.linear_1.weight"),
                    "b": J(f"{proj}.linear_1.bias")},
            "fc2": {"w": JT(f"{proj}.linear_2.weight"),
                    "b": J(f"{proj}.linear_2.bias")},
        },
        "decoder": {
            "embed": J(f"{lm}.embed_tokens.weight"),
            "blocks": blocks,
            "ln_final": {"scale": J(f"{lm}.norm.weight")},
            "lm_head": JT(head),
        },
    }
