"""Golden parity: our Qwen2.5-VL vs tiny random HF
Qwen2_5_VLForConditionalGeneration (vision tower, rope index, full logits)."""

import numpy as np
import pytest
import torch
import jax.numpy as jnp

from transformers import Qwen2_5_VLForConditionalGeneration
from transformers.models.qwen2_5_vl.configuration_qwen2_5_vl import Qwen2_5_VLConfig

from t2v_metrics_tpu.models import qwen2vl as q
from t2v_metrics_tpu.models import decoder as dec


@pytest.fixture(scope="module")
def setup():
    torch.manual_seed(0)
    hf_cfg = Qwen2_5_VLConfig(
        text_config=dict(
            vocab_size=600, hidden_size=48, intermediate_size=96,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            head_dim=12, hidden_act="silu", max_position_embeddings=512,
            rms_norm_eps=1e-6,  # released Qwen2.5-VL checkpoints use 1e-6
            rope_theta=1000000.0,
            rope_scaling={"type": "mrope", "mrope_section": [2, 2, 2]},
            tie_word_embeddings=False,
        ),
        vision_config=dict(
            depth=4, hidden_size=32, intermediate_size=64, num_heads=4,
            patch_size=4, temporal_patch_size=2, spatial_merge_size=2,
            window_size=16, fullatt_block_indexes=[1, 3], out_hidden_size=48,
            hidden_act="silu", tokens_per_second=2,
        ),
        image_token_id=591, video_token_id=592, vision_start_token_id=593,
        vision_end_token_id=594,
    )
    hf = Qwen2_5_VLForConditionalGeneration(hf_cfg).eval()

    cfg = q.Qwen2VLConfig(
        vision=q.QwenVisionConfig(hidden=32, depth=4, heads=4, patch_size=4,
                                  window_size=16, fullatt_block_indexes=(1, 3),
                                  d_ff=64, out_hidden=48),
        text=dec.DecoderConfig(vocab_size=600, d_model=48, layers=2, heads=4,
                               kv_heads=2, head_dim=12, d_ff=96,
                               mrope_section=(2, 2, 2)),
        image_token_id=591, video_token_id=592, vision_start_token_id=593)
    params = q.convert_qwen2vl(hf.state_dict(), cfg, dtype=jnp.float32)
    return hf, cfg, params


def _fake_image_patches(cfg, h_img, w_img, seed=0):
    rng = np.random.default_rng(seed)
    frames = rng.standard_normal((1, 3, h_img, w_img)).astype(np.float32)
    return q.frames_to_patches(frames, cfg.vision)


def test_vision_tower_parity(setup):
    hf, cfg, params = setup
    patches, grid = _fake_image_patches(cfg, 16, 24)
    with torch.no_grad():
        ref = hf.model.visual(torch.from_numpy(patches),
                              torch.tensor([list(grid)])).numpy()

    geom = q.vision_geometry(grid, cfg.vision)
    s = patches.shape[0]
    full_seg = np.zeros((s,), np.int32)
    ours = np.asarray(q.vision_tower(
        params["vision"], cfg.vision,
        jnp.asarray(patches[geom["perm"]]),
        jnp.asarray(geom["pos_hw"]),
        jnp.asarray(geom["win_seg"]),
        jnp.asarray(full_seg),
        jnp.asarray(geom["reverse"])))
    np.testing.assert_allclose(ours, ref, atol=3e-5)


def test_rope_index_parity(setup):
    hf, cfg, params = setup
    grid = (1, 4, 6)
    n_vis = (4 // 2) * (6 // 2)
    ids = np.array([[5, 6, 593, *( [591] * n_vis ), 594, 7, 8, 9]])
    ref_pos, ref_delta = hf.model.get_rope_index(
        torch.from_numpy(ids), image_grid_thw=torch.tensor([list(grid)]))
    ours = q.build_rope_index(ids[0], [grid], cfg)
    np.testing.assert_array_equal(ours, ref_pos[:, 0].numpy())


def test_full_logits_parity(setup):
    hf, cfg, params = setup
    patches, grid = _fake_image_patches(cfg, 16, 24, seed=3)
    n_vis = (grid[1] // 2) * (grid[2] // 2) * grid[0]
    ids = np.array([[5, 6, 593, *([591] * n_vis), 594, 7, 8, 9, 10]])
    with torch.no_grad():
        ref = hf(input_ids=torch.from_numpy(ids),
                 pixel_values=torch.from_numpy(patches),
                 image_grid_thw=torch.tensor([list(grid)])).logits.numpy()

    geom = q.vision_geometry(grid, cfg.vision)
    feats = q.vision_tower(
        params["vision"], cfg.vision,
        jnp.asarray(patches[geom["perm"]]),
        jnp.asarray(geom["pos_hw"]),
        jnp.asarray(geom["win_seg"]),
        jnp.asarray(np.zeros(patches.shape[0], np.int32)),
        jnp.asarray(geom["reverse"]))             # (n_vis, D)

    pos = q.build_rope_index(ids[0], [grid], cfg)[:, None, :]  # (3,1,S)
    tok = params["decoder"]["embed"][jnp.asarray(ids)]
    vis_mask = (ids == 591)
    # splice features at the vision positions
    embeds = np.array(tok)
    embeds[0, vis_mask[0]] = np.asarray(feats)
    logits, _ = dec.forward(params["decoder"], cfg.text, jnp.asarray(embeds),
                            jnp.asarray(pos),
                            jnp.ones(ids.shape, bool))
    np.testing.assert_allclose(np.asarray(logits), ref, atol=2e-4)


def test_splice_and_score_matches_hf_loss(setup):
    hf, cfg, params = setup
    patches, grid = _fake_image_patches(cfg, 16, 16, seed=4)
    n_vis = (grid[1] // 2) * (grid[2] // 2)
    prompt = [5, 6, 593, *([591] * n_vis), 594, 7, 8]
    answer = [11, 12]
    ids = np.array([prompt + answer])
    s = ids.shape[1]
    with torch.no_grad():
        out = hf(input_ids=torch.from_numpy(ids),
                 pixel_values=torch.from_numpy(patches),
                 image_grid_thw=torch.tensor([list(grid)])).logits
        logp = torch.log_softmax(out.float(), dim=-1)
        ref = np.mean([logp[0, len(prompt) - 1 + i, t].item()
                       for i, t in enumerate(answer)])

    geom = q.vision_geometry(grid, cfg.vision)
    feats = q.vision_tower(
        params["vision"], cfg.vision,
        jnp.asarray(patches[geom["perm"]]),
        jnp.asarray(geom["pos_hw"]), jnp.asarray(geom["win_seg"]),
        jnp.asarray(np.zeros(patches.shape[0], np.int32)),
        jnp.asarray(geom["reverse"]))
    pos = q.build_rope_index(ids[0], [grid], cfg)[:, None, :]
    vis_mask = (ids == 591)
    vis_slot = np.zeros_like(ids)
    vis_slot[vis_mask] = np.arange(n_vis)
    lp = q.splice_and_score(
        params, cfg, jnp.asarray(ids), feats[None],
        jnp.asarray(vis_mask), jnp.asarray(vis_slot), jnp.asarray(pos),
        jnp.ones(ids.shape, bool),
        jnp.asarray([answer]),
        jnp.asarray([[len(prompt) - 1 + i for i in range(len(answer))]]),
        jnp.ones((1, len(answer)), jnp.float32))
    np.testing.assert_allclose(float(np.asarray(lp)[0]), ref, atol=1e-5)


# full-fidelity suite: run with plain `pytest`; the quick tier
# (`pytest -m 'not slow'`, ~2 min) covers the API/data/ops layers
pytestmark = pytest.mark.slow


def test_dense_window_path_matches_segment_path():
    """The tile-composed dense-window tower (vision_tower tiled=True with
    _padded_geometry's composed perm/pos/segs/reverse) must agree with the
    segment-masked window-order path on a RAGGED grid (edge windows
    smaller than the window capacity, bin-packed several per tile)."""
    import jax
    import jax.numpy as jnp
    from t2v_metrics_tpu.models import qwen2vl as q
    from t2v_metrics_tpu.models.qwen2vl_adapter import (_padded_geometry,
                                                        _bucket,
                                                        PATCH_BUCKETS)

    cfg = q.QWEN2_VL_MODELS["qwen2.5-vl-test"]["config"].vision
    params = q.init_qwen2vl(
        jax.random.PRNGKey(3),
        q.QWEN2_VL_MODELS["qwen2.5-vl-test"]["config"], jnp.float32)["vision"]
    # grid 6x10 merged -> 3x5 merged tokens... choose a grid whose merged
    # dims are NOT multiples of ws=2: llm_h=3, llm_w=5 -> ragged windows
    grid = (1, 6, 10)
    s = int(np.prod(grid))
    sb = _bucket(s, PATCH_BUCKETS)
    geom, pos_hw, win_seg, full_seg, reverse, tiled = _padded_geometry(
        cfg, grid, s, sb)
    assert tiled
    rng = np.random.default_rng(7)
    patches = rng.standard_normal((s, cfg.patch_dim)).astype(np.float32)

    # reference: window-order rows, segment-masked windowed attention
    pw = patches[geom["perm"]]
    ref = q.vision_tower(params, cfg, jnp.asarray(pw),
                         jnp.asarray(geom["pos_hw"]),
                         jnp.asarray(geom["win_seg"]),
                         jnp.asarray(np.zeros(s, np.int32)),
                         jnp.asarray(geom["reverse"]))
    out = q.vision_tower(params, cfg,
                         jnp.asarray(patches[geom["perm_tile"]]),
                         jnp.asarray(pos_hw), jnp.asarray(win_seg),
                         jnp.asarray(full_seg), jnp.asarray(reverse),
                         tiled=True)
    np.testing.assert_allclose(np.asarray(out)[: s // cfg.merge_unit],
                               np.asarray(ref)[: s // cfg.merge_unit],
                               atol=2e-5, rtol=2e-5)
