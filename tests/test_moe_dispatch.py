"""Exact block-dispatch MoE (ops/moe.py): plan invariants, grouped-GEMM
kernel parity (interpret mode), and end-to-end equality with the dense
einsum oracle path."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from t2v_metrics_tpu.ops import moe
from t2v_metrics_tpu.models import decoder as dec


def test_plan_groups_invariants():
    rng = np.random.default_rng(0)
    e, bm = 7, 8
    expert_ids = jnp.asarray(rng.integers(0, e, (50,)))
    order, dest, block_expert, p_rows = moe.plan_groups(expert_ids, e, bm)
    order, dest, block_expert = map(np.asarray, (order, dest, block_expert))
    assert p_rows % bm == 0
    # every assignment gets a unique slot
    assert len(set(dest.tolist())) == 50
    # each slot's block expert matches the assignment's expert
    eids = np.asarray(expert_ids)
    for i in range(50):
        assert block_expert[dest[i] // bm] == eids[order[i]]


@pytest.mark.parametrize("shape", [(4, 32, 24, 16), (8, 64, 40, 128)])
def test_grouped_matmul_interpret_matches_reference(shape):
    e, h, i, bm = shape
    rng = np.random.default_rng(1)
    nb = 6
    xg = jnp.asarray(rng.standard_normal((nb * bm, h)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((e, h, i)), jnp.float32)
    be = jnp.asarray(rng.integers(0, e, (nb,)), jnp.int32)
    ref = moe.grouped_matmul_reference(xg, w, be, bm)
    out = moe.grouped_matmul(xg, w, be, block_m=bm, block_i=128,
                             interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def _tiny_moe_cfg(dispatch=False):
    return dataclasses.replace(
        dec.DecoderConfig(vocab_size=64, d_model=32, layers=1, heads=4,
                          kv_heads=2, head_dim=8, d_ff=0,
                          mrope_section=None, qkv_bias=False),
        num_experts=6, experts_per_tok=2, moe_d_ff=16,
        moe_dispatch=dispatch)


def _moe_params(cfg, key=0):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(key), 3)
    return {"moe": {
        "router": {"w": jax.random.normal(k1, (cfg.d_model, cfg.num_experts))
                   * cfg.d_model ** -0.5},
        "gate_up": jax.random.normal(
            k2, (cfg.num_experts, cfg.d_model, 2 * cfg.moe_d_ff)) * 0.1,
        "down": jax.random.normal(
            k3, (cfg.num_experts, cfg.moe_d_ff, cfg.d_model)) * 0.1,
    }}


def test_dispatch_equals_dense_einsum():
    cfg = _tiny_moe_cfg()
    p = _moe_params(cfg)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 9, cfg.d_model)), jnp.float32)
    dense = dec._moe_mlp(p["moe"], cfg, x)
    disp = moe.moe_mlp_dispatch(p["moe"], cfg, x, block_m=8)
    np.testing.assert_allclose(np.asarray(disp), np.asarray(dense),
                               rtol=2e-5, atol=2e-6)


def test_decoder_forward_flag_equality():
    """dec.forward with moe_dispatch=True must equal the dense path."""
    cfg = _tiny_moe_cfg(dispatch=False)
    cfg_d = dataclasses.replace(cfg, moe_dispatch=True)
    params = dec.init_decoder(jax.random.PRNGKey(5), cfg)
    ids = np.array([[3, 9, 21, 4, 8]])
    embeds = params["embed"][jnp.asarray(ids)]
    pos = jnp.arange(5)[None]
    mask = jnp.ones((1, 5), bool)
    ref, _ = dec.forward(params, cfg, embeds, pos, mask)
    out, _ = dec.forward(params, cfg_d, embeds, pos, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_skewed_routing_no_drops():
    """All tokens route to ONE expert: the block-aligned plan must not
    drop anything (capacity-factor dispatch would)."""
    cfg = _tiny_moe_cfg()
    p = _moe_params(cfg)
    # bias the router so expert 3 dominates both top-k slots can't happen
    # (top-k picks distinct experts) — so force via huge logit on 3 and 4
    p["moe"]["router"]["w"] = p["moe"]["router"]["w"].at[:, 3].add(50.0)
    p["moe"]["router"]["w"] = p["moe"]["router"]["w"].at[:, 4].add(49.0)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 33, cfg.d_model)), jnp.float32)
    dense = dec._moe_mlp(p["moe"], cfg, x)
    disp = moe.moe_mlp_dispatch(p["moe"], cfg, x, block_m=8)
    np.testing.assert_allclose(np.asarray(disp), np.asarray(dense),
                               rtol=2e-5, atol=2e-6)


# full-fidelity suite: run with plain `pytest`; the quick tier
# (`pytest -m 'not slow'`, ~2 min) covers the API/data/ops layers
pytestmark = pytest.mark.slow
