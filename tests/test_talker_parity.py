"""Golden parity for the Qwen3-Omni talker stack (speech output) against
tiny random HF modules: Code2Wav vocoder, talker MoE decoder, code
predictor, and the deterministic end-to-end speech path."""

import numpy as np
import pytest
import torch
import jax.numpy as jnp

from t2v_metrics_tpu.models import qwen3omni_talker as tk


def _tiny_c2w_cfgs():
    from transformers.models.qwen3_omni_moe.configuration_qwen3_omni_moe import (
        Qwen3OmniMoeCode2WavConfig)

    hf_cfg = Qwen3OmniMoeCode2WavConfig(
        codebook_size=32, hidden_size=32, num_attention_heads=4,
        num_key_value_heads=2, sliding_window=8, intermediate_size=64,
        num_hidden_layers=2, num_quantizers=3,
        upsample_rates=(2, 2), upsampling_ratios=(2,), decoder_dim=16,
        rope_theta=10000.0)
    cfg = tk.Code2WavConfig(
        codebook_size=32, num_quantizers=3, hidden_size=32,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        intermediate_size=64, sliding_window=8, rope_theta=10000.0,
        upsampling_ratios=(2,), upsample_rates=(2, 2), decoder_dim=16)
    return hf_cfg, cfg


def test_code2wav_parity():
    from transformers.models.qwen3_omni_moe.modeling_qwen3_omni_moe import (
        Qwen3OmniMoeCode2Wav)

    torch.manual_seed(0)
    hf_cfg, cfg = _tiny_c2w_cfgs()
    hf = Qwen3OmniMoeCode2Wav(hf_cfg).eval()
    sd = {f"code2wav.{k}": v for k, v in hf.state_dict().items()}
    params = tk.convert_code2wav(sd, cfg)

    rng = np.random.default_rng(0)
    codes = rng.integers(0, 32, (1, 3, 12))
    with torch.no_grad():
        ref = hf(torch.from_numpy(codes)).numpy()
    ours = np.asarray(tk.code2wav(params, cfg, jnp.asarray(codes)))
    assert ours.shape == ref.shape, (ours.shape, ref.shape)
    np.testing.assert_allclose(ours, ref, atol=3e-4, rtol=0)  # [-1,1] waveform; fp32 conv-stack accumulation-order noise (oneDNN vs XLA)


def test_code2wav_chunked_decode_parity():
    from transformers.models.qwen3_omni_moe.modeling_qwen3_omni_moe import (
        Qwen3OmniMoeCode2Wav)

    torch.manual_seed(1)
    hf_cfg, cfg = _tiny_c2w_cfgs()
    hf = Qwen3OmniMoeCode2Wav(hf_cfg).eval()
    sd = {f"code2wav.{k}": v for k, v in hf.state_dict().items()}
    params = tk.convert_code2wav(sd, cfg)

    rng = np.random.default_rng(1)
    codes = rng.integers(0, 32, (1, 3, 23))
    with torch.no_grad():
        ref = hf.chunked_decode(torch.from_numpy(codes), chunk_size=10,
                                left_context_size=3).numpy()
    ours = tk.chunked_decode(params, cfg, codes, chunk_size=10,
                             left_context_size=3)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=3e-4, rtol=0)  # [-1,1] waveform; fp32 conv-stack accumulation-order noise (oneDNN vs XLA)


def _tiny_talker():
    from transformers.models.qwen3_omni_moe.configuration_qwen3_omni_moe import (
        Qwen3OmniMoeTalkerConfig)
    from transformers.models.qwen3_omni_moe.modeling_qwen3_omni_moe import (
        Qwen3OmniMoeTalkerForConditionalGeneration)
    from t2v_metrics_tpu.models import decoder as dec
    import dataclasses

    torch.manual_seed(3)
    hf_cfg = Qwen3OmniMoeTalkerConfig(
        text_config=dict(vocab_size=64, hidden_size=32, intermediate_size=64,
                         num_hidden_layers=2, num_attention_heads=4,
                         num_key_value_heads=2, moe_intermediate_size=16,
                         shared_expert_intermediate_size=24, num_experts=4,
                         num_experts_per_tok=2, norm_topk_prob=False,
                         rope_theta=10000.0, attention_bias=False,
                         rope_scaling={"rope_type": "default",
                                       "mrope_section": [2, 1, 1]},
                         decoder_sparse_step=1, mlp_only_layers=[]),
        code_predictor_config=dict(vocab_size=48, hidden_size=32,
                                   intermediate_size=64, num_hidden_layers=2,
                                   num_attention_heads=4,
                                   num_key_value_heads=2, head_dim=8,
                                   num_code_groups=4,
                                   layer_types=["full_attention"] * 2),
        num_code_groups=4, thinker_hidden_size=40, accept_hidden_layer=1,
        codec_eos_token_id=60, codec_nothink_id=54, codec_think_bos_id=55,
        codec_think_eos_id=56, codec_pad_id=52, codec_bos_id=53,
        speaker_id={"ethan": 57}, spatial_merge_size=2)
    hf = Qwen3OmniMoeTalkerForConditionalGeneration(hf_cfg).eval()

    from t2v_metrics_tpu.models import qwen3omni_talker as tk2

    text = dataclasses.replace(
        dec.DecoderConfig(vocab_size=64, d_model=32, layers=2, heads=4,
                          kv_heads=2, head_dim=8, d_ff=0,
                          rope_theta=10000.0, mrope_section=(2, 1, 1),
                          mrope_interleaved=True,
                          qkv_bias=False, qk_norm=True),
        num_experts=4, experts_per_tok=2, moe_d_ff=16, moe_norm_topk=False,
        moe_shared_ff=24)
    pred = dec.DecoderConfig(vocab_size=48, d_model=32, layers=2, heads=4,
                             kv_heads=2, head_dim=8, d_ff=64,
                             rope_theta=10000.0, mrope_section=None,
                             qkv_bias=False, qk_norm=True)
    cfg = tk2.TalkerConfig(
        text=text, predictor=pred, code2wav=None, num_code_groups=4,
        thinker_hidden_size=40, accept_hidden_layer=1,
        codec_eos_token_id=60, codec_nothink_id=54, codec_think_bos_id=55,
        codec_think_eos_id=56, codec_pad_id=52, codec_bos_id=53,
        speaker_id=(("ethan", 57),))
    sd = {f"talker.{k}": v for k, v in hf.state_dict().items()}
    params = tk2.convert_talker(sd, cfg)
    return hf, cfg, params


def test_talker_decoder_parity():
    """Talker MoE decoder (shared expert + sigmoid gate, qk-norm attn) and
    codec head vs HF, teacher-forced."""
    from t2v_metrics_tpu.models import decoder as dec
    import jax

    hf, cfg, params = _tiny_talker()
    rng = np.random.default_rng(0)
    s = 7
    embeds = rng.standard_normal((1, s, 32)).astype(np.float32)
    pos3 = torch.arange(s).view(1, 1, -1).expand(3, 1, -1)
    with torch.no_grad():
        out = hf.model(inputs_embeds=torch.from_numpy(embeds),
                       position_ids=pos3)
        ref = hf.codec_head(out.last_hidden_state).numpy()
    pos = jnp.broadcast_to(jnp.arange(s)[None, None], (3, 1, s))
    logits, _ = dec.forward(params["decoder"], cfg.text,
                            jnp.asarray(embeds), pos,
                            jnp.ones((1, s), bool))
    np.testing.assert_allclose(np.asarray(logits), ref, atol=3e-5, rtol=1e-4)


def test_code_predictor_parity():
    """Code predictor: prefill head-0 logits and a cached step with
    per-group embedding + head selection vs HF."""
    hf, cfg, params = _tiny_talker()
    rng = np.random.default_rng(1)
    pair = rng.standard_normal((1, 2, 32)).astype(np.float32)

    with torch.no_grad():
        ref0 = hf.code_predictor(
            inputs_embeds=torch.from_numpy(pair)).logits.numpy()

    from t2v_metrics_tpu.models import qwen3omni_talker as tk2

    sess = tk2.TalkerSession(cfg, params)
    import jax.numpy as jnp2
    from t2v_metrics_tpu.models import decoder as dec

    cache = dec.init_cache(cfg.predictor, 1, 5, dtype=jnp2.float32)
    valid = np.zeros((1, 5), bool)
    valid[0, :2] = True
    _, cache, hidden = sess._p_prefill(
        params["predictor"]["decoder"], jnp2.asarray(pair),
        jnp2.arange(2)[None], jnp2.asarray(valid), cache)
    ours0 = np.asarray(hidden @ params["predictor"]["heads"][0])
    np.testing.assert_allclose(ours0, ref0, atol=3e-5, rtol=1e-4)

    # one decode step: embed group 0 token, head 1
    tok = 7
    with torch.no_grad():
        out = hf.code_predictor(
            inputs_embeds=torch.cat(
                [torch.from_numpy(pair),
                 hf.code_predictor.model.codec_embedding[0](
                     torch.tensor([[tok]]))], dim=1))
        h = out.logits  # generation_steps = seq-2 = 1 -> head[1]
        ref1 = h.numpy()[:, -1]
    emb = params["predictor"]["group_embeds"][0][jnp2.asarray([[tok]])]
    valid[0, 2] = True
    _, cache, hidden = sess._p_step(
        params["predictor"]["decoder"], emb, jnp2.asarray([[2]]),
        jnp2.asarray(valid), cache, 2)
    ours1 = np.asarray(hidden[:, 0] @ params["predictor"]["heads"][1])
    np.testing.assert_allclose(ours1, ref1, atol=3e-5, rtol=1e-4)
