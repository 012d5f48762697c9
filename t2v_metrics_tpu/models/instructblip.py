"""InstructBLIP (FlanT5) VQAScore scorer (v3.0 legacy zoo).

The reference's v3.0 line shipped instructblip-flant5-xl/xxl as VQAScore
models (reference V_3.0_README.md:28-75). Architecture (HF
``Salesforce/instructblip-flan-t5-*``):

  * EVA ViT-g vision tower (shared with the BLIP-2 ITM stack,
    models/blip2_itm.py);
  * instruction-aware Q-Former: 32 learned query tokens + the tokenized
    instruction run through a BERT encoder whose queries cross-attend the
    image features — exactly the blip2_itm.qformer with
    ``query_length = num_query_tokens`` and the instruction as the text
    segment;
  * language projection (qformer hidden -> T5 d_model);
  * FlanT5 encoder-decoder: encoder input = [projected queries] + prompt
    embeddings; the answer is scored teacher-forced from the decoder —
    jt5.answer_log_probs, the same rule as CLIP-FlanT5.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ..ops import layers as L
from . import blip2_itm as b2
from . import t5 as jt5

Params = Any


@dataclasses.dataclass(frozen=True)
class InstructBlipConfig:
    vision: b2.Blip2VisionConfig
    qformer: b2.QFormerConfig
    t5: jt5.T5Config
    num_query_tokens: int = 32


_T5_XL = jt5.T5Config(vocab_size=32128, d_model=2048, d_kv=64, d_ff=5120,
                      num_heads=32, enc_layers=24, dec_layers=24)
_T5_XXL = jt5.T5Config(vocab_size=32128, d_model=4096, d_kv=64, d_ff=10240,
                       num_heads=64, enc_layers=24, dec_layers=24)

INSTRUCTBLIP_MODELS = {
    # v3.0 zoo names (V_3.0_README.md:28-75)
    "instructblip-flant5-xl": {
        "hf": "Salesforce/instructblip-flan-t5-xl",
        "tokenizer": "google/flan-t5-xl",
        "config": InstructBlipConfig(b2.Blip2VisionConfig(),
                                     b2.QFormerConfig(), _T5_XL),
    },
    "instructblip-flant5-xxl": {
        "hf": "Salesforce/instructblip-flan-t5-xxl",
        "tokenizer": "google/flan-t5-xxl",
        "config": InstructBlipConfig(b2.Blip2VisionConfig(),
                                     b2.QFormerConfig(), _T5_XXL),
    },
    "instructblip-test": {
        "hf": None,
        "tokenizer": None,
        "config": InstructBlipConfig(
            b2.Blip2VisionConfig(image_size=28, patch_size=14, width=32,
                                 layers=2, heads=4, mlp_dim=64),
            b2.QFormerConfig(vocab_size=256, hidden=32, layers=2, heads=4,
                             mlp_dim=64, cross_attention_frequency=2,
                             max_position_embeddings=64),
            jt5.T5Config(vocab_size=512, d_model=64, d_kv=16, d_ff=128,
                         num_heads=4, enc_layers=2, dec_layers=2),
            num_query_tokens=4),
    },
}


def query_features(params: Params, cfg: InstructBlipConfig,
                   pixels: jnp.ndarray, qf_ids: jnp.ndarray,
                   qf_mask: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 3) + instruction tokens -> (B, nq, t5.d_model).

    HF InstructBlipQFormerModel: query tokens and instruction embeddings
    are concatenated into one self-attention stream; queries (and only
    queries) cross-attend the frozen image features every
    ``cross_attention_frequency`` layers; the query outputs pass through
    ``language_projection``.
    """
    qf = cfg.qformer
    image_embeds = b2.vision_tower(params["vision"], cfg.vision, pixels)

    b, t = qf_ids.shape
    nq = cfg.num_query_tokens
    word = params["qformer"]["word_emb"][qf_ids]
    pos = params["qformer"]["pos_emb"][:t]
    text = word + pos
    query = jnp.broadcast_to(params["query_tokens"], (b, nq, qf.hidden))
    embeds = jnp.concatenate([query.astype(text.dtype), text], axis=1)
    embeds = L.layer_norm(embeds, params["qformer"]["ln_emb"]["scale"],
                          params["qformer"]["ln_emb"]["bias"], qf.ln_eps)
    mask = jnp.concatenate([jnp.ones((b, nq), bool), qf_mask], axis=1)
    out = b2.qformer(params["qformer"], qf, embeds, mask, image_embeds, nq)
    return L.linear(out[:, :nq], params["proj"]["w"], params["proj"]["b"])


def score_pairs(params: Params, cfg: InstructBlipConfig,
                pixels: jnp.ndarray, qf_ids: jnp.ndarray,
                qf_mask: jnp.ndarray, ids: jnp.ndarray,
                enc_mask: jnp.ndarray, ans_ids: jnp.ndarray,
                ans_mask: jnp.ndarray) -> jnp.ndarray:
    """(B,) mean answer-token log-probs (paired images/prompts).

    Encoder input = [32 projected query features] + prompt token embeds
    (HF InstructBlipForConditionalGeneration.forward concatenation order).
    """
    q_feats = query_features(params, cfg, pixels, qf_ids, qf_mask)
    tok = jt5.embed_tokens(params["t5"], ids)
    enc_in = jnp.concatenate([q_feats.astype(tok.dtype), tok], axis=1)
    b = ids.shape[0]
    nq = cfg.num_query_tokens
    full_mask = jnp.concatenate([jnp.ones((b, nq), bool), enc_mask], axis=1)
    return jt5.answer_log_probs(params["t5"], cfg.t5, enc_in, full_mask,
                                ans_ids, ans_mask)


def init_instructblip(key, cfg: InstructBlipConfig,
                      dtype=jnp.float32) -> Params:
    kb, kt, kp = jax.random.split(key, 3)
    base = b2.init_blip2_itm(
        kb, b2.Blip2ITMConfig(cfg.vision, cfg.qformer,
                              cfg.num_query_tokens), dtype)
    return {
        "vision": base["vision"],
        "qformer": base["qformer"],
        "query_tokens": base["query_tokens"],
        "proj": {"w": (jax.random.normal(kp, (cfg.qformer.hidden,
                                              cfg.t5.d_model))
                       * cfg.qformer.hidden ** -0.5).astype(dtype),
                 "b": jnp.zeros((cfg.t5.d_model,), dtype)},
        "t5": jt5.init_t5(kt, cfg.t5, dtype),
    }


def convert_instructblip(sd, cfg: InstructBlipConfig,
                         dtype=jnp.bfloat16) -> Params:
    """HF InstructBlipForConditionalGeneration state dict -> pytree.

    Key layout: ``vision_model.*`` / ``qformer.*`` / ``query_tokens`` /
    ``language_projection.*`` / ``language_model.*`` (T5). The Q-Former
    embedding keys live under ``qformer.embeddings.*`` (unlike the
    blip2-itm retrieval checkpoints, whose embeddings are top-level).
    """
    import numpy as np

    from .convert import convert_t5, t2np

    itm_cfg = b2.Blip2ITMConfig(cfg.vision, cfg.qformer,
                                cfg.num_query_tokens)
    # map instructblip qformer embedding keys onto the blip2-itm layout
    sd2 = dict(sd)
    for src, dst in [("qformer.embeddings.word_embeddings.weight",
                      "embeddings.word_embeddings.weight"),
                     ("qformer.embeddings.position_embeddings.weight",
                      "embeddings.position_embeddings.weight"),
                     ("qformer.embeddings.layernorm.weight",
                      "qformer.layernorm.weight"),
                     ("qformer.embeddings.layernorm.bias",
                      "qformer.layernorm.bias")]:
        if src in sd2:
            sd2[dst] = sd2[src]
    if "itm_head.weight" not in sd2:  # not an ITM checkpoint: dummy head
        hid = cfg.qformer.hidden

        class _Z:
            def __init__(self, shape):
                self._a = np.zeros(shape, np.float32)

            def detach(self):
                return self

            def cpu(self):
                return self

            def numpy(self):
                return self._a

        sd2["itm_head.weight"] = _Z((2, hid))
        sd2["itm_head.bias"] = _Z((2,))
    base = b2.convert_blip2_itm(sd2, itm_cfg, dtype)
    return {
        "vision": base["vision"],
        "qformer": base["qformer"],
        "query_tokens": base["query_tokens"],
        "proj": {"w": jnp.asarray(t2np(sd["language_projection.weight"]).T,
                                  dtype),
                 "b": jnp.asarray(t2np(sd["language_projection.bias"]),
                                  dtype)},
        "t5": convert_t5(sd, cfg.t5.enc_layers, cfg.t5.dec_layers, dtype,
                         gated=cfg.t5.gated, prefix="language_model."),
    }
