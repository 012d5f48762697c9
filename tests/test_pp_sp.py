"""Pipeline (pp) and sequence (sp) parallelism on the virtual 8-device
CPU mesh: the GPipe T5-encoder schedule and the sp activation shardings
must reproduce single-device numerics exactly.

These are the TPU-native replacements for the reference's layer-wise
``device_map="auto"`` split (reference qwen2vl_model.py:120): PP turns
the layer ranges into concurrently-computing stages; SP bounds per-chip
activation memory for long-context (video) prompts.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from t2v_metrics_tpu.models import t5 as jt5
from t2v_metrics_tpu.parallel import mesh as pmesh
from t2v_metrics_tpu.parallel import pipeline as ppipe


@pytest.fixture(scope="module")
def t5_setup():
    cfg = jt5.T5Config(vocab_size=128, d_model=32, d_kv=8, num_heads=4,
                       d_ff=64, enc_layers=4, dec_layers=2,
                       num_buckets=8, max_distance=16)
    params = jt5.init_t5(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    B, S = 8, 24
    embeds = jnp.asarray(rng.standard_normal((B, S, cfg.d_model)),
                         jnp.float32)
    mask = jnp.asarray(rng.random((B, S)) > 0.1)
    return cfg, params, embeds, mask


@pytest.mark.parametrize("pp,n_micro", [(4, 4), (2, 8)])
def test_pipeline_encode_matches_dense(t5_setup, pp, n_micro):
    cfg, params, embeds, mask = t5_setup
    ref = jt5.encode(params, cfg, embeds, mask)

    mesh = Mesh(np.asarray(jax.devices()[:pp]), ("pp",))
    out = jax.jit(lambda p, e, m: ppipe.pipeline_encode(
        p, cfg, e, m, mesh, n_micro=n_micro))(params, embeds, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_pipeline_encode_rejects_bad_split(t5_setup):
    cfg, params, embeds, mask = t5_setup
    mesh = Mesh(np.asarray(jax.devices()[:3]), ("pp",))
    with pytest.raises(ValueError, match="not divisible"):
        ppipe.pipeline_encode(params, cfg, embeds, mask, mesh)


def test_sp_mesh_axes():
    mesh = pmesh.make_mesh(dp=2, sp=2, tp=2)
    assert mesh.axis_names == ("dp", "sp", "tp")
    mesh = pmesh.make_mesh(dp=1, sp=4, ep=1, tp=2)
    assert mesh.axis_names == ("dp", "sp", "tp")


def test_sp_encode_matches_single_device(t5_setup):
    """T5 encode under a ("dp","sp","tp") mesh with activations sharded
    along the token axis must match the unsharded result (GSPMD inserts
    the attention all-gathers)."""
    cfg, params, embeds, mask = t5_setup
    ref = jt5.encode(params, cfg, embeds, mask)

    mesh = pmesh.make_mesh(dp=2, sp=2, tp=2)
    sharded = pmesh.shard_params(params, mesh)
    data = NamedSharding(mesh, P("dp", "sp", None))
    e = jax.device_put(embeds, data)
    m = jax.device_put(mask, NamedSharding(mesh, P("dp", "sp")))
    with mesh:
        out = jax.jit(lambda p, e, m: jt5.encode(p, cfg, e, m))(sharded, e, m)
        out.block_until_ready()
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_sp_full_score_path(t5_setup):
    """answer_log_probs (the scoring hot path) under sp activation
    sharding: end-to-end scores equal the unsharded ones."""
    cfg, params, embeds, mask = t5_setup
    rng = np.random.default_rng(3)
    B = embeds.shape[0]
    ans = jnp.asarray(rng.integers(2, 120, (B, 4)), jnp.int32)
    amask = jnp.asarray(rng.random((B, 4)) > 0.2, jnp.float32)
    ref = jt5.answer_log_probs(params, cfg, embeds, mask, ans, amask)

    mesh = pmesh.make_mesh(dp=2, sp=2, tp=2)
    sharded = pmesh.shard_params(params, mesh)
    e = jax.device_put(embeds, NamedSharding(mesh, P("dp", "sp", None)))
    with mesh:
        out = jax.jit(lambda p, e: jt5.answer_log_probs(
            p, cfg, e, mask, ans, amask))(sharded, e)
        out.block_until_ready()
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)
