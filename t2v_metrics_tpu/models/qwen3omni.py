"""Qwen3-Omni (thinker) scorer: audio + vision + MoE text, TPU-native.

Reference adapter surface (t2v_metrics/models/vqascore_models/
qwen3omni_model.py): three 30B-A3B MoE variants (:12-43),
``allows_audio=True`` (:50), ``audio_paths`` content (:85-118),
audio-in-video probing (:140-148). The talker/speech-generation stack
(``return_audio`` wav output) is out of scope for scoring and not built.

Composition (HF Qwen3OmniMoeThinkerForConditionalGeneration semantics):
  * audio tower: models/qwen3omni_audio.py (Whisper-style windowed encoder);
  * vision tower: identical structure to Qwen3-VL (deepstack, interpolated
    pos embeds) — models/qwen3vl.py is reused;
  * text: MoE decoder with interleaved M-RoPE; audio tokens take plain
    sequential positions (HF get_rope_index :335-345).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

from . import decoder as dec
from . import qwen3vl as q3
from . import qwen3omni_audio as qa

Params = Any


@dataclasses.dataclass(frozen=True)
class Qwen3OmniConfig:
    audio: qa.AudioEncoderConfig
    vision: q3.Qwen3VisionConfig
    text: dec.DecoderConfig
    audio_token_id: int = 151646
    audio_start_token_id: int = 151647
    audio_end_token_id: int = 151648
    image_token_id: int = 151655
    video_token_id: int = 151656
    vision_start_token_id: int = 151652
    vision_end_token_id: int = 151653


def _omni_text_30b():
    # Qwen3-Omni 30B-A3B thinker: MoE, 128 experts top-8
    return dataclasses.replace(
        dec.DecoderConfig(vocab_size=152064, d_model=2048, layers=48,
                          heads=32, kv_heads=4, head_dim=128, d_ff=0,
                          rope_theta=1_000_000.0, mrope_section=(24, 20, 20),
                          mrope_interleaved=True, qkv_bias=False, qk_norm=True),
        num_experts=128, experts_per_tok=8, moe_d_ff=768,
        moe_dispatch=True)


QWEN3_OMNI_MODELS = {
    # registry mirrors reference qwen3omni_model.py:12-43
    "qwen3-omni-30b-a3b": {
        "hf": "Qwen/Qwen3-Omni-30B-A3B-Instruct",
        "config": None},
    "qwen3-omni-30b-a3b-thinking": {
        "hf": "Qwen/Qwen3-Omni-30B-A3B-Thinking",
        "config": None},
    "qwen3-omni-30b-a3b-captioner": {
        "hf": "Qwen/Qwen3-Omni-30B-A3B-Captioner",
        "config": None},
    "qwen3-omni-test": {"hf": None, "config": "test"},
}


def resolve_config(name: str) -> Qwen3OmniConfig:
    spec = QWEN3_OMNI_MODELS[name]
    if spec["config"] == "test":
        return Qwen3OmniConfig(
            audio=qa.AudioEncoderConfig(d_model=32, layers=2, heads=4,
                                        ffn_dim=64, num_mel_bins=32,
                                        n_window=8, n_window_infer=32,
                                        downsample_hidden=12, output_dim=48),
            vision=q3.Qwen3VisionConfig(hidden=32, depth=2, heads=4,
                                        patch_size=4, d_ff=64, out_hidden=48,
                                        num_position_embeddings=16,
                                        deepstack_indexes=(0,)),
            text=dataclasses.replace(
                dec.DecoderConfig(vocab_size=512, d_model=48, layers=2,
                                  heads=4, kv_heads=2, head_dim=16, d_ff=0,
                                  rope_theta=1_000_000.0,
                                  mrope_section=(4, 2, 2),
                                  mrope_interleaved=True, qkv_bias=False,
                                  qk_norm=True),
                num_experts=4, experts_per_tok=2, moe_d_ff=32),
            audio_token_id=505, audio_start_token_id=506,
            audio_end_token_id=507, image_token_id=501, video_token_id=502,
            vision_start_token_id=503, vision_end_token_id=504)
    return Qwen3OmniConfig(audio=qa.AudioEncoderConfig(),
                           vision=q3.Qwen3VisionConfig(out_hidden=2048),
                           text=_omni_text_30b())


def resolve_talker_config():
    """Talker config for the 30B-A3B checkpoints (HF
    Qwen3OmniMoeTalkerConfig defaults: 20-layer 1024-wide MoE with 128
    experts top-8 and a shared expert; 5-layer code predictor; 16-
    quantizer Code2Wav at 24 kHz)."""
    import dataclasses as dc

    from . import qwen3omni_talker as tk

    text = dc.replace(
        dec.DecoderConfig(vocab_size=3072, d_model=1024, layers=20,
                          heads=16, kv_heads=2, head_dim=64, d_ff=0,
                          rope_theta=10000.0, mrope_section=(24, 20, 20),
                          mrope_interleaved=True, qkv_bias=False,
                          qk_norm=True),
        num_experts=128, experts_per_tok=8, moe_d_ff=384,
        moe_shared_ff=2048, moe_norm_topk=False)
    predictor = dec.DecoderConfig(
        vocab_size=2048, d_model=1024, layers=5, heads=16, kv_heads=8,
        head_dim=128, d_ff=3072, rope_theta=10000.0, mrope_section=None,
        qkv_bias=False, qk_norm=True)
    return tk.TalkerConfig(text=text, predictor=predictor,
                           code2wav=tk.Code2WavConfig())


def splice_and_score(params: Params, cfg: Qwen3OmniConfig,
                     ids, splice_feats, splice_mask, splice_slot,
                     position_ids, attn_mask, ans_ids, ans_pos, ans_mask,
                     deepstack_feats=None, vis_mask=None,
                     temperature: float = 1.0) -> jnp.ndarray:
    """Teacher-forced mean log P(answer).

    splice_feats holds the concatenated (vision + audio) feature rows per
    sequence; deepstack_feats (n_ds, B, T, D), aligned with splice slots,
    adds the vision deepstack residuals at the VISION positions only
    (vis_mask) — audio rows in those levels must be zero.
    """
    tok = params["decoder"]["embed"][ids]
    spl = jnp.take_along_axis(splice_feats, splice_slot[..., None], axis=1)
    embeds = jnp.where(splice_mask[..., None], spl.astype(tok.dtype), tok)
    ds_list = None
    if deepstack_feats is not None:
        ds_list = []
        for level in range(deepstack_feats.shape[0]):
            d = jnp.take_along_axis(deepstack_feats[level],
                                    splice_slot[..., None], axis=1)
            ds_list.append(jnp.where(vis_mask[..., None], d, 0.0))
    logits, _ = dec.forward(params["decoder"], cfg.text, embeds, position_ids,
                            attn_mask, deepstack=ds_list,
                            logit_positions=ans_pos)  # (B, A, V)
    logp = jax.nn.log_softmax(logits / temperature, axis=-1)
    tok_logp = jnp.take_along_axis(logp, ans_ids[..., None], axis=-1)[..., 0]
    tok_logp = tok_logp * ans_mask
    return tok_logp.sum(-1) / jnp.maximum(ans_mask.sum(-1), 1)


def init_qwen3omni(key, cfg: Qwen3OmniConfig, dtype=jnp.float32) -> Params:
    ka, kv, kd = jax.random.split(key, 3)
    q3cfg = q3.Qwen3VLConfig(vision=cfg.vision, text=cfg.text)
    vl = q3.init_qwen3vl(kv, q3cfg, dtype)
    return {"audio": qa.init_audio_encoder(ka, cfg.audio, dtype),
            "vision": vl["vision"],
            "decoder": vl["decoder"]}


def convert_qwen3omni(sd, cfg: Qwen3OmniConfig, dtype=jnp.bfloat16) -> Params:
    """HF thinker state dict (``thinker.audio_tower.* / thinker.visual.* /
    thinker.model.*``) -> our pytree."""
    prefix = "thinker." if any(k.startswith("thinker.") for k in sd) else ""

    audio = qa.convert_audio_encoder(sd, cfg.audio, dtype,
                                     prefix=f"{prefix}audio_tower.")

    # vision: rename merger_list -> deepstack_merger_list for the qwen3vl
    # converter, and remap text prefixes
    remapped = {}
    for k, v in sd.items():
        if not k.startswith(prefix):
            continue
        kk = k[len(prefix):]
        if kk.startswith("visual.merger_list"):
            kk = kk.replace("visual.merger_list", "visual.deepstack_merger_list")
        remapped[kk] = v
    q3cfg = q3.Qwen3VLConfig(vision=cfg.vision, text=cfg.text)
    vl = q3.convert_qwen3vl(remapped, q3cfg, dtype)
    return {"audio": audio, "vision": vl["vision"], "decoder": vl["decoder"]}
