"""Gemma 4 scorer — built from the reference adapter's observable contract.

Reference (t2v_metrics/models/vqascore_models/gemma4_model.py):
  * registry gemma-4-12b-it / gemma-4-31b-it (:10-24), loaded via
    ``AutoModelForMultimodalLM`` with ``dtype="auto"`` (:46-52);
  * videos -> num_frames=10 interleaved "Frame at {t}s:" frames exactly
    like Gemma 3 (:62-106);
  * scoring generates ``max_new_tokens=5`` greedily and scores the answer
    tokens from the END of the rollout — the model may emit an empty
    thinking block first even with ``enable_thinking=False`` (:158-228,
    comment :164-172); trailing specials come from ``all_special_ids``
    (:202);
  * ``generate`` decodes WITHOUT skipping specials and strips the thinking
    block via ``processor.parse_response`` (:276-281).

GOLDEN-PARITY BLOCKER (documented per round-2 plan): there is no public
Gemma 4 implementation in transformers 4.57 — ``AutoModelForMultimodalLM``
with these checkpoints requires a newer/unreleased class, and no config or
weights are inspectable in a zero-egress environment. The architecture
here is therefore the Gemma 3 lineage (SigLIP tower + sandwich-norm
decoder, models/gemma3.py) with PROVISIONAL dims, and the adapter-level
behavior (rollout scoring, thinking-block handling) is tested at the
contract level against tiny random weights instead of HF goldens.
"""

from __future__ import annotations

import re

from . import decoder as dec
from . import siglip
from .gemma3 import (Gemma3Config, _gemma3_text, _SIGLIP_896, init_gemma3,
                     convert_gemma3, image_features, splice_and_score,
                     image_group_ids)

# Gemma4 reuses the Gemma3 bundle; aliases keep call sites uniform.
Gemma4Config = Gemma3Config
init_gemma4 = init_gemma3
convert_gemma4 = convert_gemma3

GEMMA4_MODELS = {
    # reference gemma4_model.py:10-24; dims PROVISIONAL (see module doc)
    "gemma-4-12b-it": {
        "hf": "google/gemma-4-12B-it",
        "config": Gemma4Config(
            vision=_SIGLIP_896,
            text=_gemma3_text(3840, 48, 16, 8, 256, 15360, q_scalar=256)),
    },
    "gemma-4-31b-it": {
        "hf": "google/gemma-4-31B-it",
        "config": Gemma4Config(
            vision=_SIGLIP_896,
            text=_gemma3_text(5376, 70, 32, 16, 128, 23040, q_scalar=168)),
    },
    "gemma-4-test": {
        "hf": None,
        "config": Gemma4Config(
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


_THINK_PATTERNS = (
    # harmony-style channel blocks (reference comment gemma4_model.py:170:
    # "<|channel>thought\n<channel|>") and <think> blocks
    re.compile(r"<\|channel\|?>\s*thought.*?(?:<\|?channel\|?>|$)",
               re.DOTALL),
    re.compile(r"<think>.*?</think>", re.DOTALL),
)


def parse_response(raw: str) -> str:
    """Strip thinking blocks from a raw decode — the TPU-side equivalent of
    the reference's ``processor.parse_response`` (gemma4_model.py:276-281).
    Best-effort: the exact processor behavior is not public (see module
    docstring); both observed marker syntaxes are handled."""
    out = raw
    for pat in _THINK_PATTERNS:
        out = pat.sub("", out)
    return out.strip()
