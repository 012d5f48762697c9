"""Golden parity: our functional CLIP vs HF transformers CLIPModel (random
tiny weights, CPU). Gate for BASELINE config 1 (CLIPScore parity ≤1e-3)."""

import numpy as np
import pytest
import jax.numpy as jnp
import torch

from transformers import CLIPConfig, CLIPModel, CLIPTextConfig as HFTextCfg, CLIPVisionConfig as HFVisionCfg

from t2v_metrics_tpu.models import clip as jclip
from t2v_metrics_tpu.models.convert import convert_clip


@pytest.fixture(scope="module")
def tiny_pair():
    torch.manual_seed(0)
    hf_cfg = CLIPConfig(
        text_config=dict(
            vocab_size=99, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4, max_position_embeddings=16,
            hidden_act="quick_gelu", eos_token_id=98,
        ),
        vision_config=dict(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, image_size=32, patch_size=8,
            hidden_act="quick_gelu",
        ),
        projection_dim=24,
    )
    hf = CLIPModel(hf_cfg).eval()
    vcfg = jclip.CLIPVisionConfig(image_size=32, patch_size=8, width=32, layers=2,
                                  heads=4, mlp_dim=64, proj_dim=24)
    tcfg = jclip.CLIPTextConfig(vocab_size=99, context_length=16, width=32, layers=2,
                                heads=4, mlp_dim=64, proj_dim=24)
    params = convert_clip(hf.state_dict(), 2, 2)
    return hf, params, vcfg, tcfg


def test_vision_parity(tiny_pair):
    hf, params, vcfg, _ = tiny_pair
    rng = np.random.default_rng(0)
    px = rng.standard_normal((2, 3, 32, 32), dtype=np.float32)
    with torch.no_grad():
        ref = hf.get_image_features(pixel_values=torch.from_numpy(px)).numpy()
    ours = np.asarray(jclip.vision_tower(params["vision"], vcfg,
                                         jnp.asarray(px.transpose(0, 2, 3, 1))) )
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_vision_feature_layer(tiny_pair):
    """LLaVA-style hidden_states[-2][:, 1:] extraction."""
    hf, params, vcfg, _ = tiny_pair
    rng = np.random.default_rng(1)
    px = rng.standard_normal((1, 3, 32, 32), dtype=np.float32)
    with torch.no_grad():
        hs = hf.vision_model(pixel_values=torch.from_numpy(px),
                             output_hidden_states=True).hidden_states
    ref = hs[-2][:, 1:].numpy()
    ours = np.asarray(jclip.vision_tower(params["vision"], vcfg,
                                         jnp.asarray(px.transpose(0, 2, 3, 1)),
                                         feature_layer=-2))
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_text_parity(tiny_pair):
    hf, params, _, tcfg = tiny_pair
    rng = np.random.default_rng(2)
    ids = rng.integers(1, 90, (3, 16))
    ids[:, -1] = 98  # EOT = highest id present
    with torch.no_grad():
        ref = hf.get_text_features(input_ids=torch.from_numpy(ids)).numpy()
    ours = np.asarray(jclip.text_tower(params["text"], tcfg, jnp.asarray(ids)))
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_score_matrix(tiny_pair):
    hf, params, vcfg, tcfg = tiny_pair
    rng = np.random.default_rng(3)
    px = rng.standard_normal((2, 3, 32, 32), dtype=np.float32)
    ids = rng.integers(1, 90, (3, 16))
    ids[:, 5] = 98
    ids[:, 6:] = 0
    with torch.no_grad():
        imf = hf.get_image_features(pixel_values=torch.from_numpy(px))
        txf = hf.get_text_features(input_ids=torch.from_numpy(ids))
        imf = imf / imf.norm(dim=-1, keepdim=True)
        txf = txf / txf.norm(dim=-1, keepdim=True)
        ref = (imf @ txf.T).numpy()
    ours = np.asarray(jclip.clip_scores(params, vcfg, tcfg,
                                        jnp.asarray(px.transpose(0, 2, 3, 1)),
                                        jnp.asarray(ids)))
    assert ours.shape == (2, 3)
    np.testing.assert_allclose(ours, ref, atol=1e-3)
