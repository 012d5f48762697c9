"""Golden parity for the remaining v3.0 legacy scorers: LLaVA-1.5 and
InstructBLIP vs tiny random HF models (LlavaForConditionalGeneration /
InstructBlipForConditionalGeneration)."""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from t2v_metrics_tpu.models import llava as lv
from t2v_metrics_tpu.models import instructblip as ib

IMG = 28


# ---------------------------------------------------------------------------
# LLaVA-1.5
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def llava_setup():
    from transformers import LlavaConfig, LlavaForConditionalGeneration

    torch.manual_seed(0)
    hf_cfg = LlavaConfig(
        vision_config=dict(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=2, num_attention_heads=4,
                           image_size=IMG, patch_size=14, projection_dim=24),
        text_config=dict(model_type="llama", vocab_size=512, hidden_size=48,
                         intermediate_size=96, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=4,
                         rms_norm_eps=1e-5, rope_theta=10000.0,
                         tie_word_embeddings=False, max_position_embeddings=256),
        image_token_index=500,
        vision_feature_layer=-2,
        vision_feature_select_strategy="default",
    )
    hf = LlavaForConditionalGeneration(hf_cfg).eval()
    cfg = lv.LLAVA_MODELS["llava-test"]["config"]
    params = lv.convert_llava(hf.state_dict(), cfg, dtype=jnp.float32)
    return hf, cfg, params


def test_llava_image_features_parity(llava_setup):
    hf, cfg, params = llava_setup
    rng = np.random.default_rng(0)
    px = rng.standard_normal((2, 3, IMG, IMG), dtype=np.float32)
    with torch.no_grad():
        hv = hf.vision_tower(torch.from_numpy(px),
                             output_hidden_states=True)
        # vision_feature_layer=-2, select strategy "default" (drop CLS)
        ref = hf.multi_modal_projector(
            hv.hidden_states[-2][:, 1:]).numpy()
    ours = np.asarray(lv.image_features(params, cfg,
                                        jnp.asarray(px.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(ours, ref, atol=3e-5)


def test_llava_answer_scores_parity(llava_setup):
    """Full spliced-prompt answer scoring must match HF logits."""
    hf, cfg, params = llava_setup
    rng = np.random.default_rng(1)
    b = 2
    px = rng.standard_normal((b, 3, IMG, IMG), dtype=np.float32)
    t_img = cfg.num_image_tokens

    # prompt: BOS, text, [image]*t_img, text..., answer (2 tokens)
    prompt = [1, 7, 8] + [500] * t_img + [9, 10, 11]
    ans = [12, 13]
    full = prompt + ans
    ids = np.tile(np.array(full), (b, 1))

    with torch.no_grad():
        out = hf(input_ids=torch.from_numpy(ids),
                 pixel_values=torch.from_numpy(px),
                 attention_mask=torch.ones_like(torch.from_numpy(ids)))
        logp = torch.log_softmax(out.logits.float(), dim=-1).numpy()
    n = len(prompt)
    ref = np.stack([
        np.mean([logp[j, n - 1 + i, a] for i, a in enumerate(ans)])
        for j in range(b)])

    feats = lv.image_features(params, cfg,
                              jnp.asarray(px.transpose(0, 2, 3, 1)))
    s = len(full)
    ids_j = np.array(ids)
    vis_mask = ids_j == 500
    vis_slot = np.zeros_like(ids_j)
    vis_slot[vis_mask] = np.tile(np.arange(t_img), b)
    ids_masked = np.where(vis_mask, 0, ids_j)
    ans_ids = np.tile(np.array(ans), (b, 1))
    ans_pos = np.tile(n - 1 + np.arange(len(ans)), (b, 1))
    ours = np.asarray(lv.splice_and_score(
        params, cfg, jnp.asarray(ids_masked), feats,
        jnp.asarray(vis_mask), jnp.asarray(vis_slot),
        jnp.asarray(np.tile(np.arange(s), (b, 1))),
        jnp.ones((b, s), bool), jnp.asarray(ans_ids), jnp.asarray(ans_pos),
        jnp.ones((b, len(ans)), np.float32)))
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_llava_adapter_contract():
    """Adapter end-to-end on random weights: shapes, [0,1] scores, and a
    non-empty generate (reference test.py five-case contract)."""
    import t2v_metrics_tpu as t2v

    scorer = t2v.VQAScore(model="llava-test", init="random",
                          dtype=jnp.float32)
    rng = np.random.default_rng(0)
    imgs = [rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)
            for _ in range(2)]
    out = scorer(images=imgs, texts=["a cat", "a dog"])
    assert out.shape == (2, 2)
    assert np.all((out >= 0) & (out <= 1))
    gen = scorer.model.generate([imgs[0]], ["What is this?"],
                                max_new_tokens=4)
    assert len(gen) == 1 and isinstance(gen[0], str)


# ---------------------------------------------------------------------------
# InstructBLIP
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def iblip_setup():
    from transformers import (InstructBlipConfig,
                              InstructBlipForConditionalGeneration)

    torch.manual_seed(1)
    hf_cfg = InstructBlipConfig(
        vision_config=dict(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=2, num_attention_heads=4,
                           image_size=IMG, patch_size=14, hidden_act="gelu"),
        qformer_config=dict(vocab_size=256, hidden_size=32,
                            intermediate_size=64, num_hidden_layers=2,
                            num_attention_heads=4,
                            cross_attention_frequency=2,
                            max_position_embeddings=64, hidden_act="gelu"),
        text_config=dict(model_type="t5", vocab_size=512, d_model=64,
                         d_kv=16, d_ff=128, num_heads=4, num_layers=2,
                         num_decoder_layers=2, tie_word_embeddings=False,
                         is_gated_act=True, dense_act_fn="gelu_new",
                         feed_forward_proj="gated-gelu",
                         decoder_start_token_id=0, pad_token_id=0),
        num_query_tokens=4,
    )
    hf = InstructBlipForConditionalGeneration(hf_cfg).eval()
    # the ctor drops the kwarg in this transformers version
    hf.config.image_token_id = 510
    cfg = ib.INSTRUCTBLIP_MODELS["instructblip-test"]["config"]
    params = ib.convert_instructblip(hf.state_dict(), cfg,
                                     dtype=jnp.float32)
    return hf, cfg, params


def test_instructblip_score_parity(iblip_setup):
    hf, cfg, params = iblip_setup
    rng = np.random.default_rng(2)
    b = 2
    px = rng.standard_normal((b, 3, IMG, IMG), dtype=np.float32)
    qf_ids = np.array([[101, 5, 6, 102, 0], [101, 9, 102, 0, 0]])
    qf_mask = qf_ids != 0
    qf_mask[:, 0] = True
    ids = np.array([[21, 22, 23, 1, 0], [31, 32, 1, 0, 0]])
    enc_mask = ids != 0
    ans = np.array([[41, 1], [42, 1]])

    # modern HF splices query outputs at image-token positions in
    # input_ids (the processor leads the prompt with num_query_tokens of
    # them) — equivalent to our prepend layout when they lead
    nq = 4
    hf_ids = np.concatenate([np.full((b, nq), 510, np.int64), ids], axis=1)
    hf_mask = np.concatenate([np.ones((b, nq), np.int64),
                              enc_mask.astype(np.int64)], axis=1)
    dec_in = np.concatenate([np.zeros((b, 1), np.int64), ans[:, :-1]],
                            axis=1)
    with torch.no_grad():
        out = hf(pixel_values=torch.from_numpy(px),
                 qformer_input_ids=torch.from_numpy(qf_ids),
                 qformer_attention_mask=torch.from_numpy(
                     qf_mask.astype(np.int64)),
                 input_ids=torch.from_numpy(hf_ids),
                 attention_mask=torch.from_numpy(hf_mask),
                 decoder_input_ids=torch.from_numpy(dec_in))
        logp = torch.log_softmax(out.logits.float(), dim=-1).numpy()
    ref = np.stack([np.mean([logp[j, i, a] for i, a in enumerate(ans[j])])
                    for j in range(b)])

    ours = np.asarray(ib.score_pairs(
        params, cfg, jnp.asarray(px.transpose(0, 2, 3, 1)),
        jnp.asarray(qf_ids), jnp.asarray(qf_mask), jnp.asarray(ids),
        jnp.asarray(enc_mask), jnp.asarray(ans),
        jnp.ones_like(ans, dtype=np.float32)))
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_instructblip_adapter_contract():
    import t2v_metrics_tpu as t2v

    scorer = t2v.VQAScore(model="instructblip-test", init="random",
                          dtype=jnp.float32)
    rng = np.random.default_rng(3)
    imgs = [rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)
            for _ in range(2)]
    out = scorer(images=imgs, texts=["a cat", "a dog"])
    assert out.shape == (2, 2)
    assert np.all((out >= 0) & (out <= 1))
    gen = scorer.model.generate([imgs[0]], ["What is this?"],
                                max_new_tokens=4)
    assert len(gen) == 1 and isinstance(gen[0], str)


def test_registry_lists_legacy_models():
    import t2v_metrics_tpu as t2v

    names = t2v.list_all_models()
    for m in ("llava-v1.5-7b", "llava-v1.5-13b",
              "instructblip-flant5-xl", "instructblip-flant5-xxl"):
        assert m in names, m


# full-fidelity suite: run with plain `pytest`; the quick tier
# (`pytest -m 'not slow'`, ~2 min) covers the API/data/ops layers
pytestmark = pytest.mark.slow
