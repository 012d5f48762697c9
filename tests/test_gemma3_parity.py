"""Golden parity: our Gemma3 (SigLIP + sandwich-norm decoder) vs tiny
random HF Gemma3ForConditionalGeneration."""

import numpy as np
import pytest
import torch
import jax.numpy as jnp

from transformers import Gemma3ForConditionalGeneration
from transformers.models.gemma3.configuration_gemma3 import Gemma3Config as HFGemma3Config

from t2v_metrics_tpu.models import gemma3 as g3
from t2v_metrics_tpu.models import siglip
from t2v_metrics_tpu.models import decoder as dec


IMG = 28  # 2x2 patch grid with patch 14 -> mm_tokens 4 (pool k=1)


@pytest.fixture(scope="module")
def setup():
    torch.manual_seed(0)
    hf_cfg = HFGemma3Config(
        text_config=dict(
            vocab_size=512, hidden_size=48, intermediate_size=96,
            num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
            head_dim=16, hidden_activation="gelu_pytorch_tanh",
            max_position_embeddings=512, rms_norm_eps=1e-6,
            rope_theta=1_000_000.0, rope_local_base_freq=10_000.0,
            rope_scaling={"rope_type": "linear", "factor": 8.0},
            query_pre_attn_scalar=16, sliding_window=8,
            layer_types=["sliding_attention", "full_attention",
                         "sliding_attention"],
            attention_bias=False, tie_word_embeddings=True,
        ),
        vision_config=dict(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, image_size=IMG, patch_size=14,
            hidden_act="gelu_pytorch_tanh", layer_norm_eps=1e-6,
        ),
        mm_tokens_per_image=4,
        image_token_index=501, boi_token_index=502, eoi_token_index=503,
    )
    hf = Gemma3ForConditionalGeneration(hf_cfg).eval()

    cfg = g3.Gemma3Config(
        vision=siglip.SiglipVisionConfig(image_size=IMG, patch_size=14,
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
        mm_tokens_per_image=4, image_token_id=501, boi_token_id=502,
        eoi_token_id=503)
    params = g3.convert_gemma3(hf.state_dict(), cfg, dtype=jnp.float32)
    return hf, cfg, params


def test_siglip_tower_parity(setup):
    hf, cfg, params = setup
    rng = np.random.default_rng(0)
    px = rng.standard_normal((2, 3, IMG, IMG), dtype=np.float32)
    with torch.no_grad():
        ref = hf.model.vision_tower(
            pixel_values=torch.from_numpy(px)).last_hidden_state.numpy()
    ours = np.asarray(siglip.vision_tower(
        params["vision"], cfg.vision, jnp.asarray(px.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(ours, ref, atol=3e-5)


def test_image_features_parity(setup):
    hf, cfg, params = setup
    rng = np.random.default_rng(1)
    px = rng.standard_normal((1, 3, IMG, IMG), dtype=np.float32)
    with torch.no_grad():
        ref = hf.model.get_image_features(torch.from_numpy(px)).numpy()
    ours = np.asarray(g3.image_features(params, cfg,
                                        jnp.asarray(px.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(ours, ref, atol=3e-5)


def test_text_only_logits_parity(setup):
    hf, cfg, params = setup
    ids = np.array([[2, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]])  # > window
    with torch.no_grad():
        ref = hf(input_ids=torch.from_numpy(ids)).logits.numpy()
    embed = params["decoder"]["embed"]
    scale = jnp.asarray(cfg.text.d_model ** 0.5, embed.dtype)
    embeds = embed[jnp.asarray(ids)] * scale
    pos = jnp.asarray(np.arange(ids.shape[1])[None])
    logits, _ = dec.forward(params["decoder"], cfg.text, embeds, pos,
                            jnp.ones(ids.shape, bool))
    np.testing.assert_allclose(np.asarray(logits), ref, atol=3e-4)


def test_multimodal_score_matches_hf_loss(setup):
    hf, cfg, params = setup
    rng = np.random.default_rng(2)
    px = rng.standard_normal((1, 3, IMG, IMG), dtype=np.float32)
    n_vis = 4
    prompt = [2, 10, 502, *([501] * n_vis), 503, 11, 12]
    answer = [20, 21]
    ids = np.array([prompt + answer])
    token_type = np.array([[1 if t == 501 else 0 for t in ids[0]]])
    with torch.no_grad():
        out = hf(input_ids=torch.from_numpy(ids),
                 pixel_values=torch.from_numpy(px),
                 token_type_ids=torch.from_numpy(token_type)).logits
        logp = torch.log_softmax(out.float(), dim=-1)
        ref = np.mean([logp[0, len(prompt) - 1 + i, t].item()
                       for i, t in enumerate(answer)])

    feats = g3.image_features(params, cfg, jnp.asarray(px.transpose(0, 2, 3, 1)))
    vis_mask = ids == 501
    vis_slot = np.zeros_like(ids)
    vis_slot[vis_mask] = np.arange(n_vis)
    lp = g3.splice_and_score(
        params, cfg, jnp.asarray(ids), feats,
        jnp.asarray(vis_mask), jnp.asarray(vis_slot),
        jnp.asarray(np.arange(ids.shape[1])[None]),
        jnp.ones(ids.shape, bool),
        jnp.asarray([answer]),
        jnp.asarray([[len(prompt) - 1 + i for i in range(len(answer))]]),
        jnp.ones((1, len(answer)), jnp.float32))
    np.testing.assert_allclose(float(np.asarray(lp)[0]), ref, atol=1e-5)


# full-fidelity suite: run with plain `pytest`; the quick tier
# (`pytest -m 'not slow'`, ~2 min) covers the API/data/ops layers
pytestmark = pytest.mark.slow
