"""Qwen3-Omni talker: speech output (codec generation + vocoder), JAX.

Reference behavior (t2v_metrics/models/vqascore_models/qwen3omni_model.py
:483-548): ``generate(return_audio=True, speaker=...)`` returns a 24 kHz
waveform alongside the text. Architecture follows HF
Qwen3OmniMoeForConditionalGeneration (transformers 4.57,
models/qwen3_omni_moe/modeling_qwen3_omni_moe.py):

  1. the THINKER generates the text; its input embeddings plus the hidden
     state at ``accept_hidden_layer`` condition the talker;
  2. the TALKER (MoE decoder with a shared expert + sigmoid shared gate,
     Qwen3-style qk-norm attention, M-RoPE positions) autoregressively
     emits the first codec-codebook token per frame via ``codec_head``;
  3. the CODE PREDICTOR (small dense decoder with per-group embedding
     tables and lm heads) fills in the remaining ``num_code_groups - 1``
     residual codebook tokens for the frame; the next talker input embed
     is the SUM of all the frame's codec-group embeddings plus the next
     trailing text hidden (or the tts-pad embed once text is exhausted);
  4. CODE2WAV decodes the (groups, frames) code matrix to a waveform:
     summed code embeddings -> sliding-window transformer -> ConvNeXt
     upsampling -> SnakeBeta/transposed-conv decoder blocks, chunked with
     left context.

Every submodule here is golden-parity-tested against tiny random HF
models (tests/test_talker_parity.py); code2wav + greedy talker decoding
are deterministic, so the full speech path is compared end-to-end.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import layers as L
from ..ops.attention import attention
from . import decoder as dec

Params = Any


# ---------------------------------------------------------------------------
# Configs
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class Code2WavConfig:
    codebook_size: int = 2048
    num_quantizers: int = 16
    hidden_size: int = 1024
    num_hidden_layers: int = 8
    num_attention_heads: int = 16
    num_key_value_heads: int = 16
    intermediate_size: int = 3072
    sliding_window: int = 72
    rope_theta: float = 10000.0
    rms_norm_eps: float = 1e-5
    layer_scale_initial_scale: float = 0.01
    upsampling_ratios: tuple = (2, 2)
    upsample_rates: tuple = (5, 4, 3, 2)
    decoder_dim: int = 1536
    act: str = "silu"

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def total_upsample(self) -> int:
        return int(np.prod(self.upsample_rates + self.upsampling_ratios))


@dataclasses.dataclass(frozen=True)
class TalkerConfig:
    text: dec.DecoderConfig            # MoE decoder (+ shared expert)
    predictor: dec.DecoderConfig       # dense code-predictor decoder
    code2wav: Code2WavConfig
    num_code_groups: int = 32
    thinker_hidden_size: int = 2048
    accept_hidden_layer: int = 18
    codec_eos_token_id: int = 4198
    codec_nothink_id: int = 4203
    codec_think_bos_id: int = 4204
    codec_think_eos_id: int = 4205
    codec_pad_id: int = 4196
    codec_bos_id: int = 4197
    speaker_id: tuple = (("ethan", 4199), ("chelsie", 4200), ("aiden", 4202))
    # thinker-side special ids (chat structure + tts specials)
    im_start_token_id: int = 151644
    system_token_id: int = 8948
    user_token_id: int = 872
    assistant_token_id: int = 77091
    tts_bos_token_id: int = 151672
    tts_eos_token_id: int = 151673
    tts_pad_token_id: int = 151671
    # the last `suppress_band` codec-vocab ids are special tokens the
    # talker must not emit (HF suppresses vocab-1024..vocab except eos)
    suppress_band: int = 1024


# ---------------------------------------------------------------------------
# Code2Wav
# ---------------------------------------------------------------------------

def _causal_conv1d(x, w, b, stride=1, dilation=1, groups=1):
    """HF Qwen3OmniMoeCausalConvNet: left 'causal' pad of
    (effective_kernel - stride) plus right pad to a full output frame.

    x: (B, C_in, T); w: (C_out, C_in/groups, K) torch layout.
    """
    k_eff = (w.shape[-1] - 1) * dilation + 1
    padding = k_eff - stride
    t = x.shape[-1]
    n_frames = (t - k_eff + padding) / stride + 1
    ideal = (int(np.ceil(n_frames)) - 1) * stride + (k_eff - padding)
    extra = ideal - t
    xp = jnp.pad(x, ((0, 0), (0, 0), (padding, max(extra, 0))))
    out = jax.lax.conv_general_dilated(
        xp, w, window_strides=(stride,), padding="VALID",
        rhs_dilation=(dilation,), feature_group_count=groups,
        dimension_numbers=("NCH", "OIH", "NCH"))
    if b is not None:
        out = out + b[None, :, None]
    return out


def _causal_trans_conv1d(x, w, b, stride):
    """HF Qwen3OmniMoeCausalTransConvNet: ConvTranspose1d then trim
    ceil(K - stride) from BOTH ends (left_pad == right_pad in HF).

    w: (C_in, C_out, K) torch ConvTranspose1d layout.
    """
    out = jax.lax.conv_transpose(
        x, w, strides=(stride,), padding="VALID",
        dimension_numbers=("NCH", "IOH", "NCH"))
    if b is not None:
        out = out + b[None, :, None]
    pad = int(np.ceil(w.shape[-1] - stride))
    return out[..., pad: out.shape[-1] - pad]


def _snake_beta(x, alpha, beta, eps=1e-9):
    """x + 1/exp(beta) * sin^2(x * exp(alpha)); params per channel."""
    a = jnp.exp(alpha)[None, :, None]
    b = jnp.exp(beta)[None, :, None]
    return x + (1.0 / (b + eps)) * jnp.sin(x * a) ** 2


def _convnext_block(p, x, eps=1e-6):
    """(B, C, T) ConvNeXt: depthwise causal conv -> LN -> MLP, layer-scaled."""
    h = _causal_conv1d(x, p["dw"]["w"], p["dw"]["b"], groups=x.shape[1])
    h = jnp.transpose(h, (0, 2, 1))
    h = L.layer_norm(h, p["norm"]["scale"], p["norm"]["bias"], eps)
    h = L.ACT_FNS["gelu"](h @ p["fc1"]["w"] + p["fc1"]["b"])
    h = h @ p["fc2"]["w"] + p["fc2"]["b"]
    h = h * p["gamma"]
    return x + jnp.transpose(h, (0, 2, 1))


def _c2w_transformer(p, cfg: Code2WavConfig, x):
    """Sliding-window causal transformer over (B, T, H) code embeddings."""
    pos = jnp.arange(x.shape[1])[None]
    cos, sin = dec.rope_cos_sin(
        dataclasses.replace(dec.DecoderConfig(), head_dim=cfg.head_dim,
                            rope_theta=cfg.rope_theta, mrope_section=None),
        pos)
    for blk in p["blocks"]:
        h = L.rms_norm(x, blk["ln1"]["scale"], cfg.rms_norm_eps)
        b, s, _ = h.shape
        q = L.linear(h, blk["attn"]["q"]["w"], blk["attn"]["q"].get("b"))
        k = L.linear(h, blk["attn"]["k"]["w"], blk["attn"]["k"].get("b"))
        v = L.linear(h, blk["attn"]["v"]["w"], blk["attn"]["v"].get("b"))
        nh, nkv = cfg.num_attention_heads, cfg.num_key_value_heads
        q = q.reshape(b, s, nh, cfg.head_dim).transpose(0, 2, 1, 3)
        k = k.reshape(b, s, nkv, cfg.head_dim).transpose(0, 2, 1, 3)
        v = v.reshape(b, s, nkv, cfg.head_dim).transpose(0, 2, 1, 3)
        q = dec.apply_rope(q, cos, sin)
        k = dec.apply_rope(k, cos, sin)
        k = jnp.repeat(k, nh // nkv, axis=1)
        v = jnp.repeat(v, nh // nkv, axis=1)
        a = attention(q, k, v, causal=True, local_window=cfg.sliding_window)
        a = a.transpose(0, 2, 1, 3).reshape(b, s, nh * cfg.head_dim)
        a = L.linear(a, blk["attn"]["o"]["w"], blk["attn"]["o"].get("b"))
        x = x + a * blk["scale_attn"]
        h = L.rms_norm(x, blk["ln2"]["scale"], cfg.rms_norm_eps)
        m = (L.ACT_FNS[cfg.act](h @ blk["mlp"]["gate"]["w"])
             * (h @ blk["mlp"]["up"]["w"])) @ blk["mlp"]["down"]["w"]
        x = x + m * blk["scale_mlp"]
    return L.rms_norm(x, p["ln_final"]["scale"], cfg.rms_norm_eps)


def code2wav(p, cfg: Code2WavConfig, codes: jnp.ndarray) -> jnp.ndarray:
    """codes: (B, num_quantizers, T) -> waveform (B, 1, T * total_upsample),
    clamped to [-1, 1] (HF Qwen3OmniMoeCode2Wav.forward)."""
    offset = (jnp.arange(cfg.num_quantizers) * cfg.codebook_size)[None, :, None]
    hidden = p["code_embedding"][codes + offset].mean(axis=1)   # (B, T, H)
    hidden = _c2w_transformer(p["pre_transformer"], cfg, hidden)
    hidden = jnp.transpose(hidden, (0, 2, 1))                   # (B, H, T)
    for up in p["upsample"]:
        hidden = _causal_trans_conv1d(hidden, up["tconv"]["w"],
                                      up["tconv"]["b"], up["factor"])
        hidden = _convnext_block(up["convnext"], hidden)
    wav = _causal_conv1d(hidden, p["dec_pre"]["w"], p["dec_pre"]["b"])
    for blk in p["dec_blocks"]:
        wav = _snake_beta(wav, blk["snake"]["alpha"], blk["snake"]["beta"])
        wav = _causal_trans_conv1d(wav, blk["tconv"]["w"], blk["tconv"]["b"],
                                   blk["stride"])
        for ru in blk["res_units"]:
            r = _snake_beta(wav, ru["snake1"]["alpha"], ru["snake1"]["beta"])
            r = _causal_conv1d(r, ru["conv1"]["w"], ru["conv1"]["b"],
                               dilation=ru["dilation"])
            r = _snake_beta(r, ru["snake2"]["alpha"], ru["snake2"]["beta"])
            r = _causal_conv1d(r, ru["conv2"]["w"], ru["conv2"]["b"])
            wav = wav + r
    wav = _snake_beta(wav, p["dec_snake"]["alpha"], p["dec_snake"]["beta"])
    wav = _causal_conv1d(wav, p["dec_post"]["w"], p["dec_post"]["b"])
    return jnp.clip(wav, -1.0, 1.0)


def chunked_decode(p, cfg: Code2WavConfig, codes: np.ndarray,
                   chunk_size: int = 300,
                   left_context_size: int = 25) -> np.ndarray:
    """HF chunked_decode: decode in chunks with left context, trim the
    context's samples from each chunk."""
    wavs = []
    start = 0
    t = codes.shape[-1]
    up = cfg.total_upsample
    while start < t:
        end = min(start + chunk_size, t)
        ctx = left_context_size if start - left_context_size > 0 else start
        chunk = jnp.asarray(codes[..., start - ctx: end])
        wav = np.asarray(code2wav(p, cfg, chunk))
        wavs.append(wav[..., ctx * up:])
        start = end
    return np.concatenate(wavs, axis=-1)


# ---------------------------------------------------------------------------
# Converters (HF state dict -> pytrees)
# ---------------------------------------------------------------------------

def convert_code2wav(sd, cfg: Code2WavConfig, dtype=jnp.float32,
                     prefix: str = "code2wav.") -> Params:
    from .convert import t2np

    def J(name, transpose=False):
        arr = t2np(sd[prefix + name])
        return jnp.asarray(arr.T if transpose else arr, dtype)

    def has(name):
        return prefix + name in sd

    def lin(name):
        return {"w": J(f"{name}.weight", True),
                "b": J(f"{name}.bias") if has(f"{name}.bias") else None}

    blocks = []
    for i in range(cfg.num_hidden_layers):
        b = f"pre_transformer.layers.{i}"
        blocks.append({
            "ln1": {"scale": J(f"{b}.input_layernorm.weight")},
            "ln2": {"scale": J(f"{b}.post_attention_layernorm.weight")},
            "attn": {"q": lin(f"{b}.self_attn.q_proj"),
                     "k": lin(f"{b}.self_attn.k_proj"),
                     "v": lin(f"{b}.self_attn.v_proj"),
                     "o": lin(f"{b}.self_attn.o_proj")},
            "mlp": {"gate": lin(f"{b}.mlp.gate_proj"),
                    "up": lin(f"{b}.mlp.up_proj"),
                    "down": lin(f"{b}.mlp.down_proj")},
            "scale_attn": J(f"{b}.self_attn_layer_scale.scale"),
            "scale_mlp": J(f"{b}.mlp_layer_scale.scale"),
        })
    pre = {"blocks": blocks,
           "ln_final": {"scale": J("pre_transformer.norm.weight")}}

    upsample = []
    for i, factor in enumerate(cfg.upsampling_ratios):
        upsample.append({
            "factor": int(factor),
            "tconv": {"w": J(f"upsample.{i}.0.conv.weight"),
                      "b": J(f"upsample.{i}.0.conv.bias")},
            "convnext": {
                "dw": {"w": J(f"upsample.{i}.1.dwconv.conv.weight"),
                       "b": J(f"upsample.{i}.1.dwconv.conv.bias")},
                "norm": {"scale": J(f"upsample.{i}.1.norm.weight"),
                         "bias": J(f"upsample.{i}.1.norm.bias")},
                "fc1": {"w": J(f"upsample.{i}.1.pwconv1.weight", True),
                        "b": J(f"upsample.{i}.1.pwconv1.bias")},
                "fc2": {"w": J(f"upsample.{i}.1.pwconv2.weight", True),
                        "b": J(f"upsample.{i}.1.pwconv2.bias")},
                "gamma": J("upsample.{}.1.gamma".format(i)),
            },
        })

    dec_blocks = []
    for i, rate in enumerate(cfg.upsample_rates):
        b = f"decoder.{i + 1}.block"
        res_units = []
        for j, dilation in enumerate((1, 3, 9)):
            r = f"{b}.{j + 2}"
            res_units.append({
                "dilation": dilation,
                "snake1": {"alpha": J(f"{r}.act1.alpha"),
                           "beta": J(f"{r}.act1.beta")},
                "conv1": {"w": J(f"{r}.conv1.conv.weight"),
                          "b": J(f"{r}.conv1.conv.bias")},
                "snake2": {"alpha": J(f"{r}.act2.alpha"),
                           "beta": J(f"{r}.act2.beta")},
                "conv2": {"w": J(f"{r}.conv2.conv.weight"),
                          "b": J(f"{r}.conv2.conv.bias")},
            })
        dec_blocks.append({
            "stride": int(rate),
            "snake": {"alpha": J(f"{b}.0.alpha"), "beta": J(f"{b}.0.beta")},
            "tconv": {"w": J(f"{b}.1.conv.weight"), "b": J(f"{b}.1.conv.bias")},
            "res_units": res_units,
        })

    n_dec = len(cfg.upsample_rates)
    return {
        "code_embedding": J("code_embedding.weight"),
        "pre_transformer": pre,
        "upsample": upsample,
        "dec_pre": {"w": J("decoder.0.conv.weight"),
                    "b": J("decoder.0.conv.bias")},
        "dec_blocks": dec_blocks,
        "dec_snake": {"alpha": J(f"decoder.{n_dec + 1}.alpha"),
                      "beta": J(f"decoder.{n_dec + 1}.beta")},
        "dec_post": {"w": J(f"decoder.{n_dec + 2}.conv.weight"),
                     "b": J(f"decoder.{n_dec + 2}.conv.bias")},
    }


# ---------------------------------------------------------------------------
# Talker decoder + code predictor (converters)
# ---------------------------------------------------------------------------

def convert_talker(sd, cfg: TalkerConfig, dtype=jnp.float32,
                   prefix: str = "talker.") -> Params:
    """HF Qwen3OmniMoeTalkerForConditionalGeneration state dict -> pytree.

    Layout: model.codec_embedding + model.layers.{i} (Qwen3 qk-norm attn +
    sparse MoE with shared expert), codec_head, text/hidden projections,
    and the code predictor (dense decoder + per-group embeds/heads).
    """
    from .convert import t2np

    def J(name, transpose=False):
        arr = t2np(sd[prefix + name])
        return jnp.asarray(arr.T if transpose else arr, dtype)

    tcfg = cfg.text
    blocks = []
    for i in range(tcfg.layers):
        b = f"model.layers.{i}"
        experts_gu, experts_dn = [], []
        for e in range(tcfg.num_experts):
            ep = f"{b}.mlp.experts.{e}"
            g = t2np(sd[prefix + f"{ep}.gate_proj.weight"]).T
            u = t2np(sd[prefix + f"{ep}.up_proj.weight"]).T
            experts_gu.append(np.concatenate([g, u], axis=1))
            experts_dn.append(t2np(sd[prefix + f"{ep}.down_proj.weight"]).T)
        blocks.append({
            "ln1": {"scale": J(f"{b}.input_layernorm.weight")},
            "ln2": {"scale": J(f"{b}.post_attention_layernorm.weight")},
            "attn": {
                "q": {"w": J(f"{b}.self_attn.q_proj.weight", True), "b": None},
                "k": {"w": J(f"{b}.self_attn.k_proj.weight", True), "b": None},
                "v": {"w": J(f"{b}.self_attn.v_proj.weight", True), "b": None},
                "o": {"w": J(f"{b}.self_attn.o_proj.weight", True), "b": None},
                "q_norm": {"scale": J(f"{b}.self_attn.q_norm.weight")},
                "k_norm": {"scale": J(f"{b}.self_attn.k_norm.weight")},
            },
            "mlp": {"moe": {
                "router": {"w": J(f"{b}.mlp.gate.weight", True)},
                "gate_up": jnp.asarray(np.stack(experts_gu), dtype),
                "down": jnp.asarray(np.stack(experts_dn), dtype),
                "shared": {
                    "gate": {"w": J(f"{b}.mlp.shared_expert.gate_proj.weight", True)},
                    "up": {"w": J(f"{b}.mlp.shared_expert.up_proj.weight", True)},
                    "down": {"w": J(f"{b}.mlp.shared_expert.down_proj.weight", True)},
                },
                "shared_gate": {"w": J(f"{b}.mlp.shared_expert_gate.weight", True)},
            }},
        })
    talker_dec = {
        "embed": J("model.codec_embedding.weight"),
        "blocks": blocks,
        "ln_final": {"scale": J("model.norm.weight")},
        "lm_head": J("codec_head.weight", True),
    }

    pcfg = cfg.predictor
    pblocks = []
    for i in range(pcfg.layers):
        b = f"code_predictor.model.layers.{i}"
        pblocks.append({
            "ln1": {"scale": J(f"{b}.input_layernorm.weight")},
            "ln2": {"scale": J(f"{b}.post_attention_layernorm.weight")},
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
    pred_d = int(J("code_predictor.model.norm.weight").shape[0])
    predictor = {
        # per-group embedding tables + heads (num_code_groups - 1 each)
        "group_embeds": [J(f"code_predictor.model.codec_embedding.{g}.weight")
                         for g in range(cfg.num_code_groups - 1)],
        "decoder": {
            "embed": J("code_predictor.model.codec_embedding.0.weight"),
            "blocks": pblocks,
            "ln_final": {"scale": J("code_predictor.model.norm.weight")},
            # dummy head: the per-group heads above are applied by the
            # caller on the post-norm hidden; dec.forward just needs a
            # lm_head leaf to trace
            "lm_head": jnp.zeros((pred_d, 1), dtype),
        },
        "heads": [J(f"code_predictor.lm_head.{g}.weight", True)
                  for g in range(cfg.num_code_groups - 1)],
    }

    def _mlp2(name):
        return {"fc1": {"w": J(f"{name}.linear_fc1.weight", True),
                        "b": J(f"{name}.linear_fc1.bias")},
                "fc2": {"w": J(f"{name}.linear_fc2.weight", True),
                        "b": J(f"{name}.linear_fc2.bias")}}

    return {
        "decoder": talker_dec,
        "predictor": predictor,
        "text_projection": _mlp2("text_projection"),
        "hidden_projection": _mlp2("hidden_projection"),
    }


def resize_mlp(p, x, act="silu"):
    """Qwen3OmniMoeTalkerResizeMLP: fc2(act(fc1(x)))."""
    h = L.ACT_FNS[act](x @ p["fc1"]["w"] + p["fc1"]["b"])
    return h @ p["fc2"]["w"] + p["fc2"]["b"]


# ---------------------------------------------------------------------------
# Sampling (HF logits-processor semantics)
# ---------------------------------------------------------------------------

def sample_logits(logits: np.ndarray, rng, do_sample: bool,
                  top_k: int = 50, top_p: float = 1.0,
                  temperature: float = 1.0, prev_ids=(),
                  repetition_penalty: float = 1.0,
                  suppress=()) -> int:
    """One HF-generation-style sampling step over (V,) fp32 logits."""
    lg = np.asarray(logits, np.float32).copy()
    if repetition_penalty != 1.0 and len(prev_ids):
        ids = np.asarray(sorted(set(int(i) for i in prev_ids)))
        sel = lg[ids]
        lg[ids] = np.where(sel > 0, sel / repetition_penalty,
                           sel * repetition_penalty)
    if len(suppress):
        lg[np.asarray(list(suppress))] = -np.inf
    if not do_sample:
        return int(np.argmax(lg))
    if temperature != 1.0:
        lg = lg / temperature
    if top_k and top_k < lg.shape[-1]:
        kth = np.partition(lg, -top_k)[-top_k]
        lg = np.where(lg < kth, -np.inf, lg)
    if top_p < 1.0:
        order = np.argsort(lg)[::-1]
        p = np.exp(lg[order] - np.max(lg))
        p = p / p.sum()
        cum = np.cumsum(p)
        cut = int(np.searchsorted(cum, top_p) + 1)
        mask = np.full_like(lg, -np.inf)
        mask[order[:cut]] = lg[order[:cut]]
        lg = mask
    p = np.exp(lg - np.max(lg))
    p = p / p.sum()
    return int(rng.choice(lg.shape[-1], p=p))


# ---------------------------------------------------------------------------
# Speech generation (thinker outputs -> waveform)
# ---------------------------------------------------------------------------

def build_talker_inputs(cfg: TalkerConfig, params, thinker_ids: np.ndarray,
                        thinker_embed, thinker_hidden, multimodal_mask,
                        thinker_embed_table, speaker: str, prompt_len: int):
    """Segment the thinker sequence by <|im_start|> roles and assemble the
    talker prefill (HF generate :100-160 + the two _get_talker_* helpers).

    thinker_ids: (T,) full sequence (prompt + generated);
    thinker_embed/thinker_hidden: (1, T, D_th) layer-0 / accept-layer
    hiddens; multimodal_mask: (T,) bool. Returns (embeds (1, L, D),
    talker_input_ids (1, L), trailing_text_hidden, tts_pad_embed).
    """
    speakers = dict(cfg.speaker_id)
    speaker_id = speakers.get(speaker.lower())
    if speaker_id is None:
        raise NotImplementedError(f"Speaker {speaker} not implemented")

    tts_ids = np.asarray([[cfg.tts_bos_token_id, cfg.tts_eos_token_id,
                           cfg.tts_pad_token_id]])
    tts = resize_mlp(params["text_projection"],
                     thinker_embed_table[jnp.asarray(tts_ids)])
    tts_bos, tts_eos, tts_pad = tts[:, 0:1], tts[:, 1:2], tts[:, 2:3]

    im_starts = np.flatnonzero(thinker_ids[:prompt_len]
                               == cfg.im_start_token_id)
    bounds = np.concatenate([im_starts, [len(thinker_ids)]])

    embeds, ids_out = [], []
    trailing = None
    for i in range(len(bounds) - 1):
        lo, hi = int(bounds[i]), int(bounds[i + 1])
        role = int(thinker_ids[lo + 1])
        if role == cfg.system_token_id:
            continue
        if role == cfg.user_token_id:
            mm = multimodal_mask[lo:hi]
            text_part = resize_mlp(params["text_projection"],
                                   thinker_embed[:, lo:hi])
            if mm.any():
                mm_part = resize_mlp(params["hidden_projection"],
                                     thinker_hidden[:, lo:hi])
                part = jnp.where(jnp.asarray(mm)[None, :, None], mm_part,
                                 text_part)
            else:
                part = text_part
            embeds.append(part)
            ids_out.append(thinker_ids[lo:hi])
        elif role == cfg.assistant_token_id and i == len(bounds) - 2:
            ah = resize_mlp(params["text_projection"],
                            thinker_embed[:, lo:hi])
            text_hidden = jnp.concatenate(
                [ah[:, :3], jnp.broadcast_to(tts_pad, (1, 4, tts_pad.shape[-1])),
                 tts_bos, ah[:, 3:4]], axis=1)
            codec_specials = jnp.asarray([[cfg.codec_nothink_id,
                                           cfg.codec_think_bos_id,
                                           cfg.codec_think_eos_id,
                                           speaker_id, cfg.codec_pad_id,
                                           cfg.codec_bos_id]])
            codec_hidden = jnp.concatenate(
                [jnp.zeros((1, 3, text_hidden.shape[-1]), text_hidden.dtype),
                 params["decoder"]["embed"][codec_specials]], axis=1)
            trailing = jnp.concatenate([ah[:, 4:], tts_eos], axis=1)
            embeds.append(text_hidden + codec_hidden)
            ids_out.append(np.full((text_hidden.shape[1],),
                                   cfg.tts_pad_token_id, np.int64))
        else:  # history assistant turns ignored (HF does the same)
            continue
    talker_embeds = jnp.concatenate(embeds, axis=1)
    talker_ids = np.concatenate(ids_out)[None]
    return talker_embeds, talker_ids, trailing, tts_pad


class TalkerSession:
    """Jitted talker + code-predictor generation for one TalkerConfig.

    Per frame: the talker emits the first codebook token; the code
    predictor, conditioned on the talker's post-norm hidden of that step
    plus the token's codec embedding, fills the remaining groups; the
    next talker input is the SUM of the frame's group embeddings plus the
    next trailing text hidden (tts-pad once the text is exhausted).
    """

    def __init__(self, cfg: TalkerConfig, params):
        self.cfg = cfg
        self.params = params
        tcfg, pcfg = cfg.text, cfg.predictor
        self._t_prefill = jax.jit(lambda p, e, pos, v, c: dec.forward(
            p, tcfg, e, pos, v, cache=c, cache_pos=0, want_hidden=True))
        self._t_step = jax.jit(lambda p, e, pos, v, c, cp: dec.forward(
            p, tcfg, e, pos, v, cache=c, cache_pos=cp, want_hidden=True))
        self._p_prefill = jax.jit(lambda p, e, pos, v, c: dec.forward(
            p, pcfg, e, pos, v, cache=c, cache_pos=0, want_hidden=True))
        self._p_step = jax.jit(lambda p, e, pos, v, c, cp: dec.forward(
            p, pcfg, e, pos, v, cache=c, cache_pos=cp, want_hidden=True))

    def predict_residuals(self, past_hidden, last_id_hidden, rng,
                          do_sample: bool = True, top_k: int = 50,
                          top_p: float = 0.8):
        """Fill the num_code_groups-1 residual codebook tokens for one
        frame (HF prepare_inputs_for_generation inner generate: prefill on
        [past_hidden, codec_embed(first code)], per-group embeds/heads)."""
        cfg = self.cfg
        pred = self.params["predictor"]
        g = cfg.num_code_groups - 1
        max_len = g + 1
        embeds = jnp.concatenate([past_hidden, last_id_hidden], axis=1)
        embeds = embeds.astype(pred["group_embeds"][0].dtype)
        cache = dec.init_cache(cfg.predictor, 1, max_len, dtype=embeds.dtype)
        valid = np.zeros((1, max_len), bool)
        valid[0, :2] = True
        _, cache, hidden = self._p_prefill(
            pred["decoder"], embeds, jnp.arange(2)[None],
            jnp.asarray(valid), cache)
        lg = np.asarray(hidden[0, -1] @ pred["heads"][0], np.float32)

        toks, embeds_out = [], []
        for gs in range(1, g + 1):
            tok = sample_logits(lg, rng, do_sample, top_k, top_p)
            toks.append(tok)
            emb = pred["group_embeds"][gs - 1][jnp.asarray([[tok]])]
            embeds_out.append(emb)
            if gs == g:
                break
            cpos = 1 + gs
            valid[0, cpos] = True
            _, cache, hidden = self._p_step(
                pred["decoder"], emb.astype(embeds.dtype),
                jnp.asarray([[cpos]]), jnp.asarray(valid), cache, cpos)
            lg = np.asarray(hidden[0, -1] @ pred["heads"][gs], np.float32)
        return toks, embeds_out

    def generate_codes(self, talker_embeds, talker_pos, trailing, tts_pad,
                       max_new_tokens: int = 4096, do_sample: bool = True,
                       top_k: int = 50, top_p: float = 1.0,
                       temperature: float = 0.9,
                       repetition_penalty: float = 1.05, rng=None,
                       predictor_do_sample: bool = True) -> np.ndarray:
        """Autoregressive codec generation -> (num_code_groups, frames)."""
        if rng is None:
            rng = np.random.default_rng()
        cfg = self.cfg
        params = self.params
        vocab = cfg.text.vocab_size
        suppress = [i
                    for i in range(max(vocab - cfg.suppress_band, 0), vocab)
                    if i != cfg.codec_eos_token_id]

        n = talker_embeds.shape[1]
        max_len = n + max_new_tokens
        cache = dec.init_cache(cfg.text, 1, max_len,
                               dtype=talker_embeds.dtype)
        valid = np.zeros((1, max_len), bool)
        valid[0, :n] = True

        logits, cache, hidden = self._t_prefill(
            params["decoder"], talker_embeds, talker_pos,
            jnp.asarray(valid), cache)
        pos_np = np.asarray(talker_pos)
        if pos_np.ndim == 3:
            last_pos = int(pos_np[:, 0, n - 1].max())
        else:
            last_pos = int(pos_np[0, n - 1])
        lg = np.asarray(logits[0, n - 1], np.float32)
        hid = hidden[:, n - 1: n]

        gen, frames = [], []
        for t in range(max_new_tokens):
            tok = sample_logits(lg, rng, do_sample, top_k, top_p,
                                temperature, prev_ids=gen,
                                repetition_penalty=repetition_penalty,
                                suppress=suppress)
            gen.append(tok)
            if tok == cfg.codec_eos_token_id:
                break

            last_id_hidden = params["decoder"]["embed"][jnp.asarray([[tok]])]
            residuals, resid_embeds = self.predict_residuals(
                hid, last_id_hidden, rng, do_sample=predictor_do_sample)
            frames.append([tok] + residuals)

            emb = last_id_hidden
            for e in resid_embeds:
                emb = emb + e
            if t < trailing.shape[1]:
                emb = emb + trailing[:, t:t + 1]
            else:
                emb = emb + tts_pad

            cpos = n + t
            valid[0, cpos] = True
            if pos_np.ndim == 3:
                pos1 = jnp.full((3, 1, 1), last_pos + 1 + t, jnp.int32)
            else:
                pos1 = jnp.full((1, 1), last_pos + 1 + t, jnp.int32)
            logits, cache, hidden = self._t_step(
                params["decoder"], emb.astype(talker_embeds.dtype), pos1,
                jnp.asarray(valid), cache, cpos)
            lg = np.asarray(logits[0, 0], np.float32)
            hid = hidden[:, 0:1]
        if not frames:
            return np.zeros((cfg.num_code_groups, 0), np.int64)
        return np.asarray(frames, np.int64).T  # (groups, frames)
