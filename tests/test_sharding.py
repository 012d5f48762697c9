"""GSPMD sharding tests on the virtual 8-device CPU mesh: TP partition
specs must compile + execute for every local model family (BASELINE
config 5: qwen3-vl sharded over ICI)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from t2v_metrics_tpu.parallel import mesh as pmesh


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8
    return pmesh.make_mesh(dp=2, tp=4)


def test_qwen3vl_tp_scoring(mesh):
    from t2v_metrics_tpu.models import qwen3vl as q3
    from t2v_metrics_tpu.models import qwen2vl as q2

    cfg = q3.resolve_config("qwen3-vl-test")
    params = q3.init_qwen3vl(jax.random.PRNGKey(0), cfg)
    params = pmesh.shard_params(params, mesh)

    rng = np.random.default_rng(0)
    fake = q2.QwenVisionConfig(patch_size=4, temporal_patch_size=2, merge_size=2)
    frames = rng.standard_normal((1, 3, 16, 16)).astype(np.float32)
    patches, grid = q2.frames_to_patches(frames, fake)
    pos_hw = q3.vision_geometry(grid, cfg.vision)
    pe_idx, pe_w, pe_perm = q3.pos_embed_interp(grid, cfg.vision)

    with mesh:
        feats, ds = jax.jit(
            lambda p, *a: q3.vision_tower(p["vision"], cfg.vision, *a,
                                          grid_t=1))(
            params, jnp.asarray(patches), jnp.asarray(pos_hw),
            jnp.asarray(pe_idx), jnp.asarray(pe_w), jnp.asarray(pe_perm),
            jnp.asarray(np.zeros(patches.shape[0], np.int32)))

        n_vis = int(np.prod(grid)) // 4
        b = 2
        prompt = [5, 6, 503, *([501] * n_vis), 504, 7, 8]
        ids = np.tile(np.array(prompt + [11, 12]), (b, 1))
        rope_cfg = q2.Qwen2VLConfig(
            vision=q2.QwenVisionConfig(merge_size=2, tokens_per_second=1),
            text=cfg.text, image_token_id=501, video_token_id=502,
            vision_start_token_id=503)
        pos = np.repeat(
            q2.build_rope_index(ids[0], [grid], rope_cfg)[:, None, :], b, axis=1)
        vis_mask = ids == 501
        vis_slot = np.zeros_like(ids)
        vis_slot[vis_mask] = np.tile(np.arange(n_vis), b)

        dps = NamedSharding(mesh, P("dp"))
        out = jax.jit(lambda p, *a: q3.splice_and_score(p, cfg, *a))(
            params,
            jax.device_put(jnp.asarray(ids), dps),
            jax.device_put(feats[None].repeat(b, 0), dps),
            jnp.stack([d[None].repeat(b, 0) for d in ds]),
            jax.device_put(jnp.asarray(vis_mask), dps),
            jax.device_put(jnp.asarray(vis_slot), dps),
            jnp.asarray(pos),
            jax.device_put(jnp.ones(ids.shape, bool), dps),
            jnp.asarray([[11, 12]] * b),
            jnp.asarray([[len(prompt) - 1, len(prompt)]] * b),
            jnp.ones((b, 2), jnp.float32))
        out.block_until_ready()
    assert out.shape == (b,)
    assert np.all(np.isfinite(np.asarray(out)))


def test_gemma3_tp_scoring(mesh):
    from t2v_metrics_tpu.models import gemma3 as g3

    cfg = g3.GEMMA3_MODELS["gemma-3-test"]["config"]
    params = g3.init_gemma3(jax.random.PRNGKey(1), cfg)
    params = pmesh.shard_params(params, mesh)

    rng = np.random.default_rng(1)
    px = rng.standard_normal((2, 28, 28, 3)).astype(np.float32)
    with mesh:
        feats = jax.jit(lambda p, x: g3.image_features(p, cfg, x))(params,
                                                                   jnp.asarray(px))
        n_vis = cfg.mm_tokens_per_image
        ids = np.tile(np.array([2, 10, 502, *([501] * n_vis), 503, 11, 12, 20]),
                      (2, 1))
        vis_mask = ids == 501
        vis_slot = np.zeros_like(ids)
        vis_slot[vis_mask] = np.tile(np.arange(n_vis), 2)
        out = jax.jit(lambda p, *a: g3.splice_and_score(p, cfg, *a))(
            params, jnp.asarray(ids), feats,
            jnp.asarray(vis_mask), jnp.asarray(vis_slot),
            jnp.asarray(np.tile(np.arange(ids.shape[1]), (2, 1))),
            jnp.ones(ids.shape, bool),
            jnp.asarray([[20]] * 2),
            jnp.asarray([[ids.shape[1] - 2]] * 2),
            jnp.ones((2, 1), jnp.float32))
        out.block_until_ready()
    assert np.all(np.isfinite(np.asarray(out)))


def test_tp_matches_single_device():
    """Sharded scoring must be numerically identical to unsharded."""
    from t2v_metrics_tpu.models import clip_flant5 as cft5
    from t2v_metrics_tpu.models.adapters import CLIP_T5_MODELS

    cfg = CLIP_T5_MODELS["clip-flant5-test"]["config"]
    params = cft5.init_clip_t5(jax.random.PRNGKey(3), cfg)

    rng = np.random.default_rng(3)
    px = rng.standard_normal((2, 56, 56, 3)).astype(np.float32)
    feats_ref = cft5.image_features(params, cfg, jnp.asarray(px))

    mesh = pmesh.make_mesh(dp=1, tp=4)
    sharded = pmesh.shard_params(params, mesh)
    with mesh:
        feats_tp = jax.jit(lambda p, x: cft5.image_features(p, cfg, x))(
            sharded, jnp.asarray(px))
    np.testing.assert_allclose(np.asarray(feats_tp), np.asarray(feats_ref),
                               atol=2e-4)


def test_moe_ep_sharding(mesh):
    """Expert-sharded MoE decoder must match unsharded numerics."""
    from t2v_metrics_tpu.models import qwen3vl as q3
    from t2v_metrics_tpu.models import decoder as dec

    cfg = q3.resolve_config("qwen3-vl-moe-test")
    params = q3.init_qwen3vl(jax.random.PRNGKey(5), cfg)
    ids = np.array([[5, 6, 7, 8]])
    embeds = params["decoder"]["embed"][jnp.asarray(ids)]
    pos = jnp.asarray(np.tile(np.arange(4)[None, None], (3, 1, 1)))
    ref, _ = dec.forward(params["decoder"], cfg.text, embeds, pos,
                         jnp.ones(ids.shape, bool))

    sharded = pmesh.shard_params(params, mesh)
    with mesh:
        out, _ = jax.jit(lambda p, e: dec.forward(
            p["decoder"], cfg.text, e, pos, jnp.ones(ids.shape, bool)))(
            sharded, embeds)
        out.block_until_ready()
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_moe_dedicated_ep_axis():
    """(dp, ep, tp) mesh: expert tensors shard over the dedicated ep axis,
    dense weights over tp, and the sharded MoE decoder matches unsharded
    numerics (reference MoE checkpoints qwen3vl_model.py:28-45)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from t2v_metrics_tpu.models import qwen3vl as q3
    from t2v_metrics_tpu.models import decoder as dec

    cfg = q3.resolve_config("qwen3-vl-moe-test")
    params = q3.init_qwen3vl(jax.random.PRNGKey(7), cfg)
    ids = np.array([[5, 6, 7, 8], [9, 10, 11, 12]])
    embeds = params["decoder"]["embed"][jnp.asarray(ids)]
    pos = jnp.asarray(np.tile(np.arange(4)[None, None], (3, 2, 1)))
    ref, _ = dec.forward(params["decoder"], cfg.text, embeds, pos,
                         jnp.ones(ids.shape, bool))

    mesh = pmesh.make_mesh(dp=1, ep=2, tp=4)
    assert mesh.axis_names == ("dp", "ep", "tp")
    sharded = pmesh.shard_params(params, mesh)
    # the packed expert tensors must actually carry the ep axis
    gu = sharded["decoder"]["blocks"][0]["mlp"]["moe"]["gate_up"]
    assert gu.sharding.spec == P("ep", None, None)
    qw = sharded["decoder"]["blocks"][0]["attn"]["q"]["w"]
    assert qw.sharding.spec == P(None, "tp")
    with mesh:
        out, _ = jax.jit(lambda p, e: dec.forward(
            p["decoder"], cfg.text, e, pos, jnp.ones(ids.shape, bool)))(
            sharded, embeds)
        out.block_until_ready()
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_multihost_mesh_matches_single_device():
    """("dcn", "dp", "tp") mesh (multi-host scaffolding, SURVEY.md §2.4):
    process-spanning data sharding + ICI TP must reproduce single-device
    scores exactly."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from t2v_metrics_tpu.models import clip_flant5 as cft5
    import __graft_entry__ as ge

    cfg = ge._small_cfg()
    params = cft5.init_clip_t5(jax.random.PRNGKey(0), cfg)
    inputs = ge._example_inputs(cfg, m=4, n=2)

    def step(params, pixels, ids, img_mask, img_slot, enc_mask,
             ans_ids, ans_mask, pair_image, pair_text):
        feats = cft5.image_features(params, cfg, pixels)
        return cft5.score_pairs(params, cfg, feats, ids, img_mask, img_slot,
                                enc_mask, ans_ids, ans_mask,
                                pair_image, pair_text)

    ref = np.asarray(step(params, *inputs))

    mesh3 = pmesh.make_multihost_mesh(dcn=2, dp=2, tp=2)
    sharded = pmesh.shard_params(params, mesh3)
    repl = NamedSharding(mesh3, P())
    data = pmesh.data_sharding(mesh3, 1)
    assert data.spec == P(("dcn", "dp"))
    placed = [jax.device_put(inputs[0], NamedSharding(mesh3, P(("dcn", "dp"))))]
    placed += [jax.device_put(x, repl) for x in inputs[1:7]]
    placed += [jax.device_put(x, NamedSharding(mesh3, P(("dcn", "dp"))))
               for x in inputs[7:]]
    with mesh3:
        out = jax.jit(step)(sharded, *placed)
        out.block_until_ready()
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4)


@pytest.mark.parametrize("tp", [4, 8])
def test_xxl_tp_aot_compiles_and_fits_v5e(tp):
    """clip-flant5-xxl (11B, BASELINE config 3) AOT-compiles under tp=4
    and tp=8 GSPMD with abstract weights — no 21 GiB host allocation — and
    the per-device footprint fits a 16 GiB v5e chip at both slice sizes.

    This is the deploy-plan check for the xxl flagship: the reference runs
    it on a 40 GB A100 (reference mm_utils.py:182-241 load path); the TPU
    plan is a v5e-4 or v5e-8 TP slice. Sharded argument bytes must be
    ~1/tp of the replicated total (proves the partitioner actually split
    the big matmuls instead of replicating them).

    This CPU-backend compile overstates temps by exactly the fp32 copies
    of every bf16 weight that CPU matmuls materialize (temps ~= 2x args);
    the real v5e topology compile (parallel/deploy.py, run by the driver
    dryrun gate) measures temps at ~0.1 GiB: tp=4 -> 5.63 GiB/device,
    tp=8 -> 3.03 GiB/device. Both bounds are asserted here: args fit the
    budget directly, and raw temps stay within the known 2x artifact.
    """
    from t2v_metrics_tpu.models.adapters import CLIP_T5_MODELS
    from t2v_metrics_tpu.parallel import deploy

    cfg = CLIP_T5_MODELS["clip-flant5-xxl"]["config"]
    m = deploy.aot_scoring_memory(cfg, jax.devices(), tp)
    total = m["params_total"]
    assert total > 20 * 2**30  # it really is the 11B config
    # params/tp <= args < params/tp * 1.35 (replicated norms/biases + inputs)
    assert total / tp <= m["args"] < total / tp * 1.35, m["args"]
    # TPU estimate: args + activation temps (CPU fp32 weight copies = 2x
    # args are a CPU-only artifact, see deploy.py docstring)
    tpu_est = m["args"] + max(0, m["temps"] - 2 * m["args"])
    assert tpu_est < 15 * 2**30, f"{tpu_est/2**30:.2f} GiB > v5e HBM budget"
    # and the raw temps must not exceed the artifact by more than ~3 GiB —
    # genuine activations plus the per-layer packed-QKV weight concats
    # (w_qkv = [Wq|Wk|Wv] materializes ~0.1 GiB/layer on this CPU compile;
    # the real v5e:2x4 topology compile measures total temps at 1.5 GiB,
    # see parallel/deploy.py output in the driver dryrun gate). Catches a
    # real activation-memory regression.
    assert m["temps"] < 2 * m["args"] + 3 * 2**30, m["temps"]


# full-fidelity suite: run with plain `pytest`; the quick tier
# (`pytest -m 'not slow'`, ~2 min) covers the API/data/ops layers
pytestmark = pytest.mark.slow


@pytest.mark.parametrize("tp", [4, 8])
def test_qwen7b_tp_aot_compiles_and_fits_v5e(tp):
    """qwen2.5-vl-7b (BASELINE config 4's registry default — reference
    qwen2vl_model.py:47-91) AOT-compiles TP-sharded with abstract weights
    and its per-device footprint fits a 16 GiB v5e at tp=4 and tp=8: the
    deploy plan for the model the single-chip bench substitutes with 3b
    (whose bf16 weights alone exceed one chip). Same CPU-backend fp32
    temp-copy adjustment as the xxl check."""
    from t2v_metrics_tpu.models.qwen2vl import QWEN2_VL_MODELS
    from t2v_metrics_tpu.parallel import deploy

    cfg = QWEN2_VL_MODELS["qwen2.5-vl-7b"]["config"]
    m = deploy.aot_qwen_scoring_memory(cfg, jax.devices(), tp)
    total = m["params_total"]
    assert total > 14 * 2**30  # ~8.3B params bf16 incl. vision tower
    assert m["args"] < total / tp * 1.6, m["args"]
    tpu_est = m["args"] + max(0, m["temps"] - 2 * m["args"])
    assert tpu_est < 15 * 2**30, f"{tpu_est/2**30:.2f} GiB > v5e budget"
