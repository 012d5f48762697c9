"""Golden parity: our BLIP-2 ITM vs tiny random HF
Blip2ForImageTextRetrieval."""

import numpy as np
import pytest
import torch
import jax.numpy as jnp

from transformers import Blip2ForImageTextRetrieval
from transformers.models.blip_2.configuration_blip_2 import Blip2Config

from t2v_metrics_tpu.models import blip2_itm as bitm

IMG = 28


@pytest.fixture(scope="module")
def setup():
    torch.manual_seed(0)
    hf_cfg = Blip2Config(
        vision_config=dict(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=2, num_attention_heads=4,
                           image_size=IMG, patch_size=14, hidden_act="gelu"),
        qformer_config=dict(vocab_size=256, hidden_size=32,
                            intermediate_size=64, num_hidden_layers=2,
                            num_attention_heads=4, cross_attention_frequency=2,
                            max_position_embeddings=64, hidden_act="gelu",
                            use_qformer_text_input=True),
        num_query_tokens=4, image_token_index=None,
    )
    hf = Blip2ForImageTextRetrieval(hf_cfg).eval()
    cfg = bitm.BLIP2_ITM_MODELS["blip2-itm-test"]["config"]
    params = bitm.convert_blip2_itm(hf.state_dict(), cfg)
    return hf, cfg, params


def test_vision_tower_parity(setup):
    hf, cfg, params = setup
    rng = np.random.default_rng(0)
    px = rng.standard_normal((2, 3, IMG, IMG), dtype=np.float32)
    with torch.no_grad():
        ref = hf.vision_model(torch.from_numpy(px)).last_hidden_state.numpy()
    ours = np.asarray(bitm.vision_tower(params["vision"], cfg.vision,
                                        jnp.asarray(px.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(ours, ref, atol=3e-5)


def test_itm_score_parity(setup):
    hf, cfg, params = setup
    rng = np.random.default_rng(1)
    px = rng.standard_normal((2, 3, IMG, IMG), dtype=np.float32)
    ids = np.array([[101, 7, 8, 9, 102, 0, 0],
                    [101, 12, 13, 102, 0, 0, 0]])
    mask = (ids != 0).astype(np.int64)
    with torch.no_grad():
        out = hf(pixel_values=torch.from_numpy(px),
                 input_ids=torch.from_numpy(ids),
                 attention_mask=torch.from_numpy(mask),
                 use_image_text_matching_head=True)
        ref = torch.softmax(out.logits_per_image.float(), dim=1)[:, 1].numpy()
    ours = np.asarray(bitm.itm_scores(params, cfg,
                                      jnp.asarray(px.transpose(0, 2, 3, 1)),
                                      jnp.asarray(ids), jnp.asarray(mask) > 0))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


# full-fidelity suite: run with plain `pytest`; the quick tier
# (`pytest -m 'not slow'`, ~2 min) covers the API/data/ops layers
pytestmark = pytest.mark.slow
