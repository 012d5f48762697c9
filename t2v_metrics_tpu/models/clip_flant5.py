"""CLIP-FlanT5: the VQAScore paper's flagship scorer, TPU-native.

Architecture (reconstructed from the surviving v3.1 evidence — reference
t2v_metrics/models/vqascore_models/mm_utils.py:182-241 (vision tower + MLP
projector assembly), t2v_metrics/constants.py:3-8 (prompt constants),
V_3.0_README.md:110-125 (templates, VisualGPTScore mode)):

  CLIP ViT-L/14-336 vision tower -> hidden_states[-2] patch features (576
  tokens, CLS dropped) -> 2-layer GELU MLP projector to d_model -> spliced
  into the FlanT5 *encoder* token embeddings at the ``<image>`` position ->
  answer scored from the decoder, teacher-forced.

Score = exp(mean log P(answer tokens)) — the geometric-mean rule shared by
every local adapter in the reference (e.g. qwen2vl_model.py:289).

TPU shape strategy: a scoring batch is (P pairs, S_enc tokens) where
S_enc = 576 image slots + text tokens, padded to a bucket. Image features
are computed once per *unique image* (M) and gathered per pair — the
reference recomputes the vision tower for every (image, text) pair
(reference score.py:104-106); skipping that is the single biggest win.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ..ops import layers as L
from . import clip as jclip
from . import t5 as jt5
from ..constants import SYSTEM_MSG, DEFAULT_IMAGE_TOKEN

Params = Any


@dataclasses.dataclass(frozen=True)
class CLIPT5Config:
    t5: jt5.T5Config
    vision: jclip.CLIPVisionConfig
    num_image_tokens: int = 576
    conversation: str = "t5_chat"
    image_aspect_ratio: str = "pad"  # expand2square with CLIP-mean fill

    @property
    def d_model(self) -> int:
        return self.t5.d_model


CLIP_T5_CONFIGS = {
    # reference model zoo: clip-flant5-xxl / -xl (V_3.0_README.md:110-125)
    "clip-flant5-xxl": CLIPT5Config(
        t5=jt5.T5_CONFIGS["flan-t5-xxl"],
        vision=jclip.CLIP_ARCHS["ViT-L-14-336"][0]),
    "clip-flant5-xl": CLIPT5Config(
        t5=jt5.T5_CONFIGS["flan-t5-xl"],
        vision=jclip.CLIP_ARCHS["ViT-L-14-336"][0]),
}


def format_question(question: str, conversation_style: str = "t5_chat") -> str:
    """LLaVA-style prompt formatting for CLIP-FlanT5.

    Reconstructed from the v3.0 line (SYSTEM_MSG/DEFAULT_IMAGE_TOKEN
    constants survive at reference constants.py:3-8). ``t5_chat`` is the
    style shipped with clip-flant5-xl/xxl.
    """
    if conversation_style in ("plain", "t5_plain"):
        return DEFAULT_IMAGE_TOKEN + question
    if conversation_style == "t5_chat":
        return (SYSTEM_MSG + " USER: " + DEFAULT_IMAGE_TOKEN + "\n"
                + question + " ASSISTANT: ")
    if conversation_style == "t5_chat_no_system":
        return "USER: " + DEFAULT_IMAGE_TOKEN + "\n" + question + " ASSISTANT: "
    raise NotImplementedError(conversation_style)


def format_answer(answer: str, conversation_style: str = "t5_chat") -> str:
    if conversation_style in ("plain", "t5_plain"):
        return answer + "\n"
    return answer


# ---------------------------------------------------------------------------
# Params
# ---------------------------------------------------------------------------

def init_clip_t5(key, cfg: CLIPT5Config, dtype=jnp.float32) -> Params:
    kv, kp1, kp2, kt = jax.random.split(key, 4)
    vw = cfg.vision.width
    dm = cfg.d_model
    return {
        "vision": jclip.init_vision(kv, cfg.vision, dtype),
        "projector": {
            "fc1": {"w": (jax.random.normal(kp1, (vw, dm)) * vw ** -0.5).astype(dtype),
                    "b": jnp.zeros((dm,), dtype)},
            "fc2": {"w": (jax.random.normal(kp2, (dm, dm)) * dm ** -0.5).astype(dtype),
                    "b": jnp.zeros((dm,), dtype)},
        },
        "t5": jt5.init_t5(kt, cfg.t5, dtype),
    }


def convert_clip_t5(sd, cfg: CLIPT5Config, dtype=jnp.bfloat16) -> Params:
    """HF CLIP-FlanT5 checkpoint (LLaVA-style key layout) -> pytree.

    Expects keys: ``encoder.* / decoder.* / shared.* / lm_head.*`` (T5),
    ``encoder.vision_tower.vision_tower.vision_model.*`` or
    ``vision_tower.vision_tower.vision_model.*`` (CLIP tower), and
    ``encoder.mm_projector.{0,2}.*`` (2-layer MLP, reference
    mm_utils.py:222 ``initialize_vision_modules``).
    """
    from .convert import convert_clip_vision, convert_t5, t2np

    vt_prefix = None
    for cand in ("encoder.vision_tower.vision_tower.vision_model",
                 "vision_tower.vision_tower.vision_model",
                 "model.vision_tower.vision_tower.vision_model"):
        if any(k.startswith(cand) for k in sd):
            vt_prefix = cand
            break
    if vt_prefix is None:
        raise KeyError("no vision tower found in state dict")
    proj_prefix = None
    for cand in ("encoder.mm_projector", "mm_projector", "model.mm_projector"):
        if any(k.startswith(cand) for k in sd):
            proj_prefix = cand
            break
    return {
        "vision": convert_clip_vision(sd, cfg.vision.layers, dtype, prefix=vt_prefix),
        "projector": {
            "fc1": {"w": jnp.asarray(t2np(sd[f"{proj_prefix}.0.weight"]).T, dtype),
                    "b": jnp.asarray(t2np(sd[f"{proj_prefix}.0.bias"]), dtype)},
            "fc2": {"w": jnp.asarray(t2np(sd[f"{proj_prefix}.2.weight"]).T, dtype),
                    "b": jnp.asarray(t2np(sd[f"{proj_prefix}.2.bias"]), dtype)},
        },
        "t5": convert_t5(sd, cfg.t5.enc_layers, cfg.t5.dec_layers, dtype,
                         gated=cfg.t5.gated),
    }


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def image_features(params: Params, cfg: CLIPT5Config, pixels: jnp.ndarray) -> jnp.ndarray:
    """(M, H, W, 3) -> (M, num_image_tokens, d_model) projected patch feats."""
    feats = jclip.vision_tower(params["vision"], cfg.vision, pixels, feature_layer=-2)
    h = L.linear(feats, params["projector"]["fc1"]["w"], params["projector"]["fc1"]["b"])
    h = L.ACT_FNS["gelu"](h)
    return L.linear(h, params["projector"]["fc2"]["w"], params["projector"]["fc2"]["b"])


def _pair_embeds(params, feats, ids, img_mask, img_slot, pair_image, pair_text):
    """Assemble per-pair encoder embeddings.

    feats: (M, T, D) image features; ids/img_mask/img_slot: (N, S) per-text
    arrays; pair_image/pair_text: (P,) index maps. Gathering text rows on
    device keeps the host->device transfer at O(N*S) instead of O(P*S).
    """
    ids_p = ids[pair_text]                                 # (P, S)
    tok = params["t5"]["shared_emb"][ids_p]                # (P, S, D)
    img = jnp.take_along_axis(feats[pair_image], img_slot[pair_text][..., None], axis=1)
    return jnp.where(img_mask[pair_text][..., None], img.astype(tok.dtype), tok)


def score_pairs(params: Params, cfg: CLIPT5Config,
                feats: jnp.ndarray,        # (M, T, D) from image_features()
                ids: jnp.ndarray,          # (N, S) token ids, 0 at image slots/pad
                img_mask: jnp.ndarray,     # (N, S) bool: position is an image slot
                img_slot: jnp.ndarray,     # (N, S) int32: which of the T features
                enc_mask: jnp.ndarray,     # (N, S) bool: valid position
                ans_ids: jnp.ndarray,      # (N, A)
                ans_mask: jnp.ndarray,     # (N, A) float
                pair_image: jnp.ndarray,   # (P,) int32
                pair_text: jnp.ndarray,    # (P,) int32
                ) -> jnp.ndarray:
    """Returns (P,) mean answer-token log-probs (see module docstring)."""
    embeds = _pair_embeds(params, feats, ids, img_mask, img_slot,
                          pair_image, pair_text)
    return jt5.answer_log_probs(params["t5"], cfg.t5, embeds,
                                enc_mask[pair_text],
                                ans_ids[pair_text], ans_mask[pair_text])


def first_token_distribution(params: Params, cfg: CLIPT5Config,
                             feats, ids, img_mask, img_slot, enc_mask,
                             pair_image, pair_text) -> jnp.ndarray:
    """fp32 softmax over the vocab at the first decoder step (trace support)."""
    embeds = _pair_embeds(params, feats, ids, img_mask, img_slot,
                          pair_image, pair_text)
    enc_hidden = jt5.encode(params["t5"], cfg.t5, embeds, enc_mask[pair_text])
    start = jnp.full((pair_text.shape[0], 1), cfg.t5.decoder_start_token_id, jnp.int32)
    logits = jt5.decode(params["t5"], cfg.t5, start, enc_hidden, enc_mask[pair_text])
    return jax.nn.softmax(logits[:, 0], axis=-1)
