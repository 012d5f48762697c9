"""Golden parity: our Qwen3-VL vs tiny random HF
Qwen3VLForConditionalGeneration (vision + deepstack, interleaved M-RoPE,
qk-norm decoder, full scoring)."""

import numpy as np
import pytest
import torch
import jax.numpy as jnp

from transformers import Qwen3VLForConditionalGeneration
from transformers.models.qwen3_vl.configuration_qwen3_vl import Qwen3VLConfig as HFQ3Config

from t2v_metrics_tpu.models import qwen3vl as q3
from t2v_metrics_tpu.models import qwen2vl as q2
from t2v_metrics_tpu.models import decoder as dec


@pytest.fixture(scope="module")
def setup():
    torch.manual_seed(0)
    hf_cfg = HFQ3Config(
        text_config=dict(
            vocab_size=512, hidden_size=48, intermediate_size=96,
            num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
            head_dim=16, hidden_act="silu", max_position_embeddings=512,
            rms_norm_eps=1e-6, rope_theta=5_000_000.0, attention_bias=False,
            rope_scaling={"rope_type": "default", "mrope_section": [4, 2, 2],
                          "mrope_interleaved": True},
            tie_word_embeddings=False,
        ),
        vision_config=dict(
            depth=3, hidden_size=32, intermediate_size=64, num_heads=4,
            patch_size=4, temporal_patch_size=2, spatial_merge_size=2,
            out_hidden_size=48, num_position_embeddings=16,
            deepstack_visual_indexes=[0, 1], hidden_act="gelu_pytorch_tanh",
        ),
        image_token_id=501, video_token_id=502, vision_start_token_id=503,
        vision_end_token_id=504,
    )
    hf = Qwen3VLForConditionalGeneration(hf_cfg).eval()
    cfg = q3.resolve_config("qwen3-vl-test")
    params = q3.convert_qwen3vl(hf.state_dict(), cfg, dtype=jnp.float32)
    return hf, cfg, params


def _patches(cfg, h_img, w_img, seed=0):
    rng = np.random.default_rng(seed)
    frames = rng.standard_normal((1, 3, h_img, w_img)).astype(np.float32)
    # same flatten as qwen2.5 processor (shared layout)
    fake = q2.QwenVisionConfig(patch_size=cfg.vision.patch_size,
                               temporal_patch_size=cfg.vision.temporal_patch_size,
                               merge_size=cfg.vision.merge_size)
    return q2.frames_to_patches(frames, fake)


def _run_vision(cfg, params, patches, grid):
    pos_hw = q3.vision_geometry(grid, cfg.vision)
    pe_idx, pe_w, pe_perm = q3.pos_embed_interp(grid, cfg.vision)
    seg = np.zeros(patches.shape[0], np.int32)
    return q3.vision_tower(params["vision"], cfg.vision,
                           jnp.asarray(patches), jnp.asarray(pos_hw),
                           jnp.asarray(pe_idx), jnp.asarray(pe_w),
                           jnp.asarray(pe_perm), jnp.asarray(seg),
                           grid_t=grid[0])


def test_vision_tower_and_deepstack_parity(setup):
    hf, cfg, params = setup
    patches, grid = _patches(cfg, 16, 24)
    with torch.no_grad():
        ref, ref_ds = hf.model.visual(torch.from_numpy(patches),
                                      torch.tensor([list(grid)]))
    ours, ours_ds = _run_vision(cfg, params, patches, grid)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=3e-5)
    assert len(ours_ds) == len(ref_ds) == 2
    for a, b in zip(ours_ds, ref_ds):
        np.testing.assert_allclose(np.asarray(a), b.numpy(), atol=3e-5)


def test_full_scoring_parity(setup):
    hf, cfg, params = setup
    patches, grid = _patches(cfg, 16, 16, seed=3)
    n_vis = grid[0] * (grid[1] // 2) * (grid[2] // 2)
    prompt = [5, 6, 503, *([501] * n_vis), 504, 7, 8]
    answer = [11, 12]
    ids = np.array([prompt + answer])
    with torch.no_grad():
        out = hf(input_ids=torch.from_numpy(ids),
                 pixel_values=torch.from_numpy(patches),
                 image_grid_thw=torch.tensor([list(grid)])).logits
        logp = torch.log_softmax(out.float(), dim=-1)
        ref = np.mean([logp[0, len(prompt) - 1 + i, t].item()
                       for i, t in enumerate(answer)])

    feats, ds = _run_vision(cfg, params, patches, grid)
    # rope index: qwen3 uses raw frame t-index -> tokens_per_second=1, spg=1
    q2cfg = q2.Qwen2VLConfig(
        vision=q2.QwenVisionConfig(merge_size=2, tokens_per_second=1),
        text=cfg.text, image_token_id=501, video_token_id=502,
        vision_start_token_id=503)
    pos = q2.build_rope_index(ids[0], [grid], q2cfg)[:, None, :]
    vis_mask = ids == 501
    vis_slot = np.zeros_like(ids)
    vis_slot[vis_mask] = np.arange(n_vis)
    lp = q3.splice_and_score(
        params, cfg, jnp.asarray(ids), feats[None],
        jnp.stack([d[None] for d in ds]),
        jnp.asarray(vis_mask), jnp.asarray(vis_slot), jnp.asarray(pos),
        jnp.ones(ids.shape, bool),
        jnp.asarray([answer]),
        jnp.asarray([[len(prompt) - 1 + i for i in range(len(answer))]]),
        jnp.ones((1, len(answer)), jnp.float32))
    np.testing.assert_allclose(float(np.asarray(lp)[0]), ref, atol=2e-5)


def test_moe_parity():
    """Our dense-einsum MoE vs tiny random HF Qwen3VLMoe text model."""
    from transformers import Qwen3VLMoeForConditionalGeneration
    from transformers.models.qwen3_vl_moe.configuration_qwen3_vl_moe import Qwen3VLMoeConfig

    torch.manual_seed(0)
    hf_cfg = Qwen3VLMoeConfig(
        text_config=dict(
            vocab_size=512, hidden_size=48, intermediate_size=96,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            head_dim=16, hidden_act="silu", max_position_embeddings=512,
            rms_norm_eps=1e-6, rope_theta=5_000_000.0, attention_bias=False,
            rope_scaling={"rope_type": "default", "mrope_section": [4, 2, 2],
                          "mrope_interleaved": True},
            num_experts=4, num_experts_per_tok=2, moe_intermediate_size=32,
            decoder_sparse_step=1, mlp_only_layers=[], norm_topk_prob=True,
            tie_word_embeddings=False,
        ),
        vision_config=dict(
            depth=2, hidden_size=32, intermediate_size=64, num_heads=4,
            patch_size=4, temporal_patch_size=2, spatial_merge_size=2,
            out_hidden_size=48, num_position_embeddings=16,
            deepstack_visual_indexes=[0], hidden_act="gelu_pytorch_tanh",
        ),
        image_token_id=501, video_token_id=502, vision_start_token_id=503,
        vision_end_token_id=504,
    )
    hf = Qwen3VLMoeForConditionalGeneration(hf_cfg).eval()
    from t2v_metrics_tpu.models import decoder as jdec

    cfg_text = jdec.DecoderConfig(
        vocab_size=512, d_model=48, layers=2, heads=4, kv_heads=2,
        head_dim=16, d_ff=0, rope_theta=5_000_000.0,
        mrope_section=(4, 2, 2), mrope_interleaved=True, qkv_bias=False,
        qk_norm=True, num_experts=4, experts_per_tok=2, moe_d_ff=32)
    cfg = q3.Qwen3VLConfig(
        vision=q3.Qwen3VisionConfig(hidden=32, depth=2, heads=4, patch_size=4,
                                   d_ff=64, out_hidden=48,
                                   num_position_embeddings=16,
                                   deepstack_indexes=(0,)),
        text=cfg_text, image_token_id=501, video_token_id=502,
        vision_start_token_id=503, vision_end_token_id=504)
    params = q3.convert_qwen3vl(hf.state_dict(), cfg, dtype=jnp.float32)

    ids = np.array([[5, 6, 7, 8, 9, 10]])
    with torch.no_grad():
        ref = hf.model.language_model(
            input_ids=torch.from_numpy(ids)).last_hidden_state
        ref_logits = (hf.lm_head(ref)).float().numpy()
    embeds = params["decoder"]["embed"][jnp.asarray(ids)]
    pos = np.tile(np.arange(6)[None, None], (3, 1, 1))
    logits, _ = jdec.forward(params["decoder"], cfg_text, embeds,
                             jnp.asarray(pos), jnp.ones(ids.shape, bool))
    np.testing.assert_allclose(np.asarray(logits), ref_logits, atol=2e-4)


# full-fidelity suite: run with plain `pytest`; the quick tier
# (`pytest -m 'not slow'`, ~2 min) covers the API/data/ops layers
pytestmark = pytest.mark.slow
