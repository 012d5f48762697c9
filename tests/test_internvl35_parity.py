"""Golden parity for the InternVL3.5 line (Qwen3 / Qwen3-MoE backbones,
reference internvl_model.py:66-187) against tiny random HF models, plus
registry name parity with the reference family list."""

import numpy as np
import pytest
import torch
import jax.numpy as jnp

from transformers import InternVLForConditionalGeneration
from transformers.models.internvl.configuration_internvl import InternVLConfig as HFIVLConfig

from t2v_metrics_tpu.models import internvl as ivl

IMG = 28


def _vision_cfg(use_qk_norm=False, norm_type="layer_norm"):
    return dict(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                num_attention_heads=4, image_size=[IMG, IMG],
                patch_size=[14, 14], hidden_act="gelu", layer_norm_eps=1e-6,
                use_absolute_position_embeddings=True,
                layer_scale_init_value=0.1, use_qk_norm=use_qk_norm,
                norm_type=norm_type)


def _score_parity(hf, cfg, params, answer_tok=11):
    rng = np.random.default_rng(1)
    px = rng.standard_normal((1, 3, IMG, IMG), dtype=np.float32)
    n_vis = cfg.tokens_per_tile
    prompt = [5, 6, *([500] * n_vis), 7, 8]
    ids = np.array([prompt + [answer_tok]])
    with torch.no_grad():
        out = hf(input_ids=torch.from_numpy(ids),
                 pixel_values=torch.from_numpy(px)).logits
        ref = torch.log_softmax(out.float(), -1)[0, len(prompt) - 1,
                                                 answer_tok].item()
    feats = ivl.image_features(params, cfg,
                               jnp.asarray(px.transpose(0, 2, 3, 1)))
    vis_mask = ids == 500
    vis_slot = np.zeros_like(ids)
    vis_slot[vis_mask] = np.arange(n_vis)
    lp = ivl.splice_and_score(
        params, cfg, jnp.asarray(ids),
        feats.reshape(1, -1, cfg.text.d_model),
        jnp.asarray(vis_mask), jnp.asarray(vis_slot),
        jnp.asarray(np.arange(ids.shape[1])[None]),
        jnp.ones(ids.shape, bool), jnp.asarray([[answer_tok]]),
        jnp.asarray([[len(prompt) - 1]]), jnp.ones((1, 1), jnp.float32))
    np.testing.assert_allclose(float(np.asarray(lp)[0]), ref, atol=2e-5)


def test_internvl35_dense_parity():
    """Qwen3 backbone: no qkv bias, per-head q/k RMSNorm."""
    torch.manual_seed(0)
    hf_cfg = HFIVLConfig(
        vision_config=_vision_cfg(),
        text_config=dict(model_type="qwen3", vocab_size=512, hidden_size=48,
                         intermediate_size=96, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2,
                         head_dim=16, hidden_act="silu", rms_norm_eps=1e-6,
                         rope_theta=1_000_000.0,
                         max_position_embeddings=512,
                         tie_word_embeddings=False,
                         attention_bias=False),
        image_token_id=500, downsample_ratio=0.5,
        vision_feature_layer=-1, vision_feature_select_strategy="default",
        projector_hidden_act="gelu")
    hf = InternVLForConditionalGeneration(hf_cfg).eval()
    cfg = ivl.INTERNVL_MODELS["internvl3.5-test"]["config"]
    params = ivl.convert_internvl(hf.state_dict(), cfg)
    _score_parity(hf, cfg, params)


def test_internvl35_moe_parity():
    """Qwen3-MoE backbone (30b-a3b / 241b-a28b): per-expert HF modules
    packed into our (E, H, 2I)/(E, I, H) einsum layout, plus the
    InternViT-6B-style RMSNorm + flattened qk-norm tower."""
    torch.manual_seed(1)
    hf_cfg = HFIVLConfig(
        vision_config=_vision_cfg(use_qk_norm=True, norm_type="rms_norm"),
        text_config=dict(model_type="qwen3_moe", vocab_size=512,
                         hidden_size=48, intermediate_size=96,
                         moe_intermediate_size=32, num_experts=4,
                         num_experts_per_tok=2, norm_topk_prob=True,
                         num_hidden_layers=2, num_attention_heads=4,
                         num_key_value_heads=2, head_dim=16,
                         hidden_act="silu", rms_norm_eps=1e-6,
                         rope_theta=1_000_000.0,
                         max_position_embeddings=512,
                         tie_word_embeddings=False, attention_bias=False,
                         decoder_sparse_step=1, mlp_only_layers=[]),
        image_token_id=500, downsample_ratio=0.5,
        vision_feature_layer=-1, vision_feature_select_strategy="default",
        projector_hidden_act="gelu")
    hf = InternVLForConditionalGeneration(hf_cfg).eval()
    cfg = ivl.INTERNVL_MODELS["internvl3.5-moe-test"]["config"]
    params = ivl.convert_internvl(hf.state_dict(), cfg)
    _score_parity(hf, cfg, params)


def test_registry_name_parity_with_reference():
    """Registry lists the reference's InternVL + Qwen3-VL names
    one-for-one (reference internvl_model.py:18-187,
    qwen3vl_model.py:9-146)."""
    import t2v_metrics_tpu as t2v

    names = set(t2v.list_all_models())
    ref_internvl = {
        "internvl3-8b", "internvl3-14b", "internvl3-78b",
        "internvl3.5-1b", "internvl3.5-2b", "internvl3.5-4b",
        "internvl3.5-8b", "internvl3.5-14b", "internvl3.5-30b-a3b",
        "internvl3.5-38b", "internvl3.5-241b-a28b"}
    ref_qwen3vl = {
        "qwen3-vl-235b-a22b", "qwen3-vl-235b-a22b-thinking",
        "qwen3-vl-30b-a3b", "qwen3-vl-30b-a3b-thinking",
        "qwen3-vl-32b", "qwen3-vl-32b-thinking",
        "qwen3-vl-8b", "qwen3-vl-8b-thinking",
        "qwen3-vl-4b", "qwen3-vl-4b-thinking",
        "qwen3-vl-2b", "qwen3-vl-2b-thinking",
        "qwen3.5-4b", "qwen3.5-9b", "qwen3.5-27b"}
    assert ref_internvl <= names, ref_internvl - names
    assert ref_qwen3vl <= names, ref_qwen3vl - names


def test_qwen35_thinking_template():
    """qwen3.5 prompts close an empty thinking block
    (reference qwen3vl_model.py:242 enable_thinking=False)."""
    import t2v_metrics_tpu as t2v
    from t2v_metrics_tpu.models import qwen3vl as q3
    from t2v_metrics_tpu.models.qwen3vl_adapter import Qwen3VLAdapter

    cfg = q3.resolve_config("qwen3-vl-test")
    ad = Qwen3VLAdapter("qwen3.5-4b", config=cfg, init="random")
    ids = ad._build_ids("Is this a cat?", 4, False)
    suffix = ad._encode_text("<think>\n\n</think>\n\n")
    assert ids[-len(suffix):] == suffix

    ad2 = Qwen3VLAdapter("qwen3-vl-test", init="random")
    ids2 = ad2._build_ids("Is this a cat?", 4, False)
    assert ids2[-len(suffix):] != suffix


# full-fidelity suite: run with plain `pytest`; the quick tier
# (`pytest -m 'not slow'`, ~2 min) covers the API/data/ops layers
pytestmark = pytest.mark.slow
