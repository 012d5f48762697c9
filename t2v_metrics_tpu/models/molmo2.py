"""Molmo2 scorer — built from the reference adapter's observable contract.

Reference (t2v_metrics/models/vqascore_models/molmo2_model.py):
  * registry molmo2-4b / molmo2-7b (allenai/Molmo2-O-7B) / molmo2-8b,
    loaded with ``trust_remote_code=True`` (:8-41);
  * NATIVE video support — video paths are passed straight through as
    ``{"type": "video", "video": path}`` content dicts and the model
    samples frames internally (:80-101);
  * scoring: greedy generate (max_new_tokens=1), P(answer) scored
    end-aligned with an eos/bos/pad trailing-special offset, geometric
    mean (:146-214) — the same rollout rule as Gemma 4;
  * generate: decode the continuation with skip_special_tokens (:220-262).

GOLDEN-PARITY BLOCKER (documented per round-2 plan): Molmo2 ships only as
``trust_remote_code`` checkpoints — transformers 4.57 has no Molmo2 class
and the remote code is unreachable in a zero-egress environment. The
architecture here follows the published Molmo lineage (CLIP ViT-L/14-336
tower -> 2x2 patch pooling -> MLP connector -> decoder LLM) with
PROVISIONAL dims; adapter behavior is contract-tested on tiny random
weights. Internal video sampling uses uniform frames (count below) as the
stand-in for the model's own sampler.
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

# frames sampled internally for "native" video inputs (provisional)
NATIVE_VIDEO_FRAMES = 8


@dataclasses.dataclass(frozen=True)
class Molmo2Config:
    vision: jclip.CLIPVisionConfig
    text: dec.DecoderConfig
    pool: int = 2               # 2x2 patch pooling before the connector
    image_token_id: int = 152064

    @property
    def tokens_per_image(self) -> int:
        side = self.vision.image_size // self.vision.patch_size // self.pool
        return side * side


def _text(d_model, layers, heads, kv_heads, d_ff, vocab=152192):
    # OLMo-2-lineage decoder: no qkv bias, qk-norm, standard 1D RoPE
    return dec.DecoderConfig(
        vocab_size=vocab, d_model=d_model, layers=layers, heads=heads,
        kv_heads=kv_heads, head_dim=d_model // heads, d_ff=d_ff,
        rope_theta=500_000.0, mrope_section=None, qkv_bias=False,
        qk_norm=True)


_CLIP_L_336 = jclip.CLIP_ARCHS["ViT-L-14-336"][0]

MOLMO2_MODELS = {
    # reference molmo2_model.py:8-41; dims PROVISIONAL (see module doc)
    "molmo2-4b": {"hf": "allenai/Molmo2-4B",
                  "config": Molmo2Config(_CLIP_L_336,
                                         _text(2560, 36, 32, 8, 9728))},
    "molmo2-7b": {"hf": "allenai/Molmo2-O-7B",
                  "config": Molmo2Config(_CLIP_L_336,
                                         _text(4096, 32, 32, 32, 11008))},
    "molmo2-8b": {"hf": "allenai/Molmo2-8B",
                  "config": Molmo2Config(_CLIP_L_336,
                                         _text(4096, 36, 32, 8, 12288))},
    "molmo2-test": {"hf": None,
                    "config": Molmo2Config(
                        jclip.CLIPVisionConfig(image_size=28, patch_size=14,
                                               width=32, layers=2, heads=4,
                                               mlp_dim=64, proj_dim=24),
                        dec.DecoderConfig(vocab_size=512, d_model=48,
                                          layers=2, heads=4, kv_heads=2,
                                          head_dim=16, d_ff=96,
                                          rope_theta=500_000.0,
                                          mrope_section=None, qkv_bias=False,
                                          qk_norm=True),
                        pool=1, image_token_id=500)},
}


def image_features(params: Params, cfg: Molmo2Config,
                   pixels: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 3) -> (B, tokens_per_image, d_model)."""
    feats = jclip.vision_tower(params["vision"], cfg.vision, pixels,
                               feature_layer=-2)  # patch feats, CLS dropped
    b, n, w = feats.shape
    side = int(n ** 0.5)
    k = cfg.pool
    x = feats.reshape(b, side // k, k, side // k, k, w).mean(axis=(2, 4))
    x = x.reshape(b, -1, w)
    h = L.linear(x, params["connector"]["fc1"]["w"],
                 params["connector"]["fc1"]["b"])
    h = L.ACT_FNS["gelu"](h)
    return L.linear(h, params["connector"]["fc2"]["w"],
                    params["connector"]["fc2"]["b"])


def init_molmo2(key, cfg: Molmo2Config, dtype=jnp.float32) -> Params:
    kv, k1, k2, kd = jax.random.split(key, 4)
    vw = cfg.vision.width
    dm = cfg.text.d_model
    params = {
        "vision": jclip.init_vision(kv, cfg.vision, dtype),
        "connector": {
            "fc1": {"w": (jax.random.normal(k1, (vw, dm)) * vw ** -0.5).astype(dtype),
                    "b": jnp.zeros((dm,), dtype)},
            "fc2": {"w": (jax.random.normal(k2, (dm, dm)) * dm ** -0.5).astype(dtype),
                    "b": jnp.zeros((dm,), dtype)},
        },
        "decoder": dec.init_decoder(kd, cfg.text, dtype),
    }
    if cfg.text.qk_norm:
        for blk in params["decoder"]["blocks"]:
            blk["attn"]["q_norm"] = {"scale": jnp.ones((cfg.text.head_dim,), dtype)}
            blk["attn"]["k_norm"] = {"scale": jnp.ones((cfg.text.head_dim,), dtype)}
    return params
