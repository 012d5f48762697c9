"""Golden parity: our InternVL vs tiny random HF
InternVLForConditionalGeneration (layer-scale ViT, pixel shuffle,
projector, full scoring)."""

import numpy as np
import pytest
import torch
import jax.numpy as jnp

from transformers import InternVLForConditionalGeneration
from transformers.models.internvl.configuration_internvl import InternVLConfig as HFIVLConfig

from t2v_metrics_tpu.models import internvl as ivl

IMG = 28


@pytest.fixture(scope="module")
def setup():
    torch.manual_seed(0)
    hf_cfg = HFIVLConfig(
        vision_config=dict(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=2, num_attention_heads=4,
                           image_size=[IMG, IMG], patch_size=[14, 14],
                           hidden_act="gelu", layer_norm_eps=1e-6,
                           use_absolute_position_embeddings=True,
                           layer_scale_init_value=0.1, use_qk_norm=False,
                           norm_type="layer_norm"),
        text_config=dict(model_type="qwen2", vocab_size=512, hidden_size=48,
                         intermediate_size=96, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2,
                         hidden_act="silu", rms_norm_eps=1e-6,
                         rope_theta=1_000_000.0, max_position_embeddings=512,
                         tie_word_embeddings=False),
        image_token_id=500, downsample_ratio=0.5,
        vision_feature_layer=-1, vision_feature_select_strategy="default",
        projector_hidden_act="gelu",
    )
    hf = InternVLForConditionalGeneration(hf_cfg).eval()
    cfg = ivl.INTERNVL_MODELS["internvl3-test"]["config"]
    params = ivl.convert_internvl(hf.state_dict(), cfg)
    return hf, cfg, params


def test_image_features_parity(setup):
    hf, cfg, params = setup
    rng = np.random.default_rng(0)
    px = rng.standard_normal((2, 3, IMG, IMG), dtype=np.float32)
    with torch.no_grad():
        ref = hf.model.get_image_features(torch.from_numpy(px)).numpy()
    ours = np.asarray(ivl.image_features(params, cfg,
                                         jnp.asarray(px.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(ours, ref, atol=3e-5)


def test_full_scoring_parity(setup):
    hf, cfg, params = setup
    rng = np.random.default_rng(1)
    px = rng.standard_normal((1, 3, IMG, IMG), dtype=np.float32)
    n_vis = cfg.tokens_per_tile  # 1x1 tile -> (28/14*0.5)^2 = 1
    prompt = [5, 6, *([500] * n_vis), 7, 8]
    answer = [11]
    ids = np.array([prompt + answer])
    with torch.no_grad():
        out = hf(input_ids=torch.from_numpy(ids),
                 pixel_values=torch.from_numpy(px)).logits
        logp = torch.log_softmax(out.float(), dim=-1)
        ref = logp[0, len(prompt) - 1, answer[0]].item()

    feats = ivl.image_features(params, cfg, jnp.asarray(px.transpose(0, 2, 3, 1)))
    vis_mask = ids == 500
    vis_slot = np.zeros_like(ids)
    vis_slot[vis_mask] = np.arange(n_vis)
    lp = ivl.splice_and_score(
        params, cfg, jnp.asarray(ids), feats.reshape(1, -1, cfg.text.d_model),
        jnp.asarray(vis_mask), jnp.asarray(vis_slot),
        jnp.asarray(np.arange(ids.shape[1])[None]),
        jnp.ones(ids.shape, bool),
        jnp.asarray([answer]),
        jnp.asarray([[len(prompt) - 1]]),
        jnp.ones((1, 1), jnp.float32))
    np.testing.assert_allclose(float(np.asarray(lp)[0]), ref, atol=1e-5)


def test_dynamic_preprocess_tiles():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (300, 600, 3), dtype=np.uint8)  # 2:1 aspect
    tiles = ivl.dynamic_preprocess(img, max_num=12, image_size=448)
    assert all(t.shape == (448, 448, 3) for t in tiles)
    assert 2 <= len(tiles) <= 13  # ratio tiles + thumbnail
    # square image, max 1 tile -> no thumbnail
    sq = rng.integers(0, 255, (200, 200, 3), dtype=np.uint8)
    tiles = ivl.dynamic_preprocess(sq, max_num=1, image_size=448)
    assert len(tiles) == 1


def test_internvl_adapter_end_to_end(tmp_path):
    import t2v_metrics_tpu as t2v
    from PIL import Image
    import cv2

    rng = np.random.default_rng(5)
    img = str(tmp_path / "i.png")
    Image.fromarray(rng.integers(0, 255, (40, 60, 3), dtype=np.uint8)).save(img)
    vid = str(tmp_path / "v.mp4")
    vw = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"mp4v"), 10.0, (64, 48))
    for _ in range(12):
        vw.write(rng.integers(0, 255, (48, 64, 3), dtype=np.uint8))
    vw.release()

    scorer = t2v.VQAScore(model="internvl3-test")
    s = scorer(images=[img], texts=["a cat"])
    assert s.shape == (1, 1) and 0.0 <= s[0, 0] <= 1.0
    sv = scorer(images=[vid], texts=["a blob"], num_segments=4)
    assert sv.shape == (1, 1) and 0.0 <= sv[0, 0] <= 1.0
    assert "internvl3-8b" in t2v.list_all_models()


# full-fidelity suite: run with plain `pytest`; the quick tier
# (`pytest -m 'not slow'`, ~2 min) covers the API/data/ops layers
pytestmark = pytest.mark.slow
