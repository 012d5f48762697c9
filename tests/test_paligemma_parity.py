"""Golden parity: our PaliGemma vs tiny random HF
PaliGemmaForConditionalGeneration (prefix-LM mask, first-token scoring)."""

import numpy as np
import pytest
import torch
import jax.numpy as jnp

from transformers import PaliGemmaForConditionalGeneration
from transformers.models.paligemma.configuration_paligemma import PaliGemmaConfig as HFPGConfig

from t2v_metrics_tpu.models import paligemma as pg
from t2v_metrics_tpu.models import siglip
from t2v_metrics_tpu.models import decoder as dec

IMG = 28


@pytest.fixture(scope="module")
def setup():
    torch.manual_seed(0)
    hf_cfg = HFPGConfig(
        text_config=dict(
            model_type="gemma", vocab_size=512, hidden_size=48,
            intermediate_size=96, num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=1, head_dim=16,
            hidden_activation="gelu_pytorch_tanh", rms_norm_eps=1e-6,
            rope_theta=10_000.0, attention_bias=False,
            tie_word_embeddings=True, max_position_embeddings=512,
        ),
        vision_config=dict(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, image_size=IMG, patch_size=14,
            hidden_act="gelu_pytorch_tanh", layer_norm_eps=1e-6,
            projection_dim=48,
        ),
        image_token_index=500, bos_token_id=2, pad_token_id=0,
        projection_dim=48,
    )
    hf = PaliGemmaForConditionalGeneration(hf_cfg).eval()

    cfg = pg.PALIGEMMA_MODELS["paligemma-test"]["config"]
    params = pg.convert_paligemma(hf.state_dict(), cfg, dtype=jnp.float32)
    return hf, cfg, params


def test_image_features_parity(setup):
    hf, cfg, params = setup
    rng = np.random.default_rng(0)
    px = rng.standard_normal((1, 3, IMG, IMG), dtype=np.float32)
    with torch.no_grad():
        ref = hf.model.get_image_features(torch.from_numpy(px)).numpy()
    ours = np.asarray(pg.image_features(params, cfg,
                                        jnp.asarray(px.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(ours, ref, atol=3e-5)


def test_first_token_distribution_parity(setup):
    hf, cfg, params = setup
    rng = np.random.default_rng(1)
    px = rng.standard_normal((1, 3, IMG, IMG), dtype=np.float32)
    n_vis = cfg.num_image_tokens  # 4
    ids = np.array([[*([500] * n_vis), 2, 7, 8, 9]])  # img tokens + bos + text
    token_type = np.zeros_like(ids)  # HF infers prefix from image tokens

    with torch.no_grad():
        out = hf(input_ids=torch.from_numpy(ids),
                 pixel_values=torch.from_numpy(px))
        ref = torch.softmax(out.logits[0, -1].float(), dim=-1).numpy()

    feats = pg.image_features(params, cfg, jnp.asarray(px.transpose(0, 2, 3, 1)))
    vis_mask = ids == 500
    vis_slot = np.zeros_like(ids)
    vis_slot[vis_mask] = np.arange(n_vis)
    prefix_mask = np.ones_like(ids, bool)  # whole input is the prefix
    dist = pg.first_token_distribution(
        params, cfg, jnp.asarray(ids), feats,
        jnp.asarray(vis_mask), jnp.asarray(vis_slot),
        jnp.asarray(np.arange(ids.shape[1])[None]),
        jnp.ones(ids.shape, bool), jnp.asarray(prefix_mask),
        jnp.asarray([ids.shape[1] - 1]))
    ours = np.asarray(dist)[0]
    np.testing.assert_allclose(ours, ref, atol=1e-4)
    assert int(np.argmax(ours)) == int(np.argmax(ref))


# full-fidelity suite: run with plain `pytest`; the quick tier
# (`pytest -m 'not slow'`, ~2 min) covers the API/data/ops layers
pytestmark = pytest.mark.slow
