"""Pipeline parallelism (PP): GPipe-style stage split of the T5 encoder.

This is the TPU-native analog of the reference's only model-split
mechanism — HF accelerate's layer-wise ``device_map="auto"`` (reference
qwen2vl_model.py:120,128), which places contiguous layer ranges on
different GPUs and runs them *sequentially*. On TPU the same layer
ranges become pipeline stages over a ``pp`` mesh axis driven under
``shard_map`` (manual mode): every device holds L/pp encoder layers,
microbatches stream through the stages, and activations hop one ICI
neighbor per step via ``lax.ppermute``. Unlike device_map, all stages
compute concurrently — utilization is ``n_micro / (n_micro + pp - 1)``
(the GPipe bubble), approaching 1 as the microbatch count grows.

Schedule (scan over ``t`` in ``[0, n_micro + pp - 1)``):
  stage 0 ingests microbatch ``t``; stage ``s`` processes microbatch
  ``t - s``; the last stage writes finished microbatches into the output
  buffer, which a masked ``psum`` replicates at the end.

Weights are stacked per stage — pytree leaves get a leading (pp, L/pp)
axis sharded ``P("pp")`` — so each device materializes only its own
layers: an 11B encoder's pipeline slice fits chips its full weights
would not. Layers within a stage run under ``lax.scan`` (one trace,
XLA-friendly). Pallas kernels are legal here: shard_map is manual mode,
each device runs its local program (unlike GSPMD auto-partitioning,
which cannot split Mosaic kernels).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..models import t5 as jt5
from ..ops import layers as L


def stack_encoder_blocks(params):
    """Stack the per-layer encoder block pytrees into one pytree with a
    leading L axis. Block 0's ``rel_bias`` (the only non-uniform leaf —
    HF T5 stores the shared relative-position table on layer 0 only) is
    split out and returned separately."""
    blocks = params["encoder"]["blocks"]
    b0 = dict(blocks[0])
    a0 = dict(b0["attn"])
    rel_emb = a0.pop("rel_bias")
    b0["attn"] = a0
    uniform = [b0] + [dict(b) for b in blocks[1:]]
    stacked = jax.tree.map(
        lambda *xs: None if xs[0] is None else jnp.stack(xs), *uniform,
        is_leaf=lambda x: x is None)
    return stacked, rel_emb


def pipeline_encode(params, cfg: jt5.T5Config, input_embeds: jnp.ndarray,
                    mask: jnp.ndarray | None, mesh: Mesh,
                    n_micro: int | None = None) -> jnp.ndarray:
    """T5 ``encode`` (t5.py:175) over a ``pp`` mesh axis, GPipe schedule.

    input_embeds: (B, S, D) with B divisible by n_micro (default: pp).
    Returns the post-final-LN hidden states, numerically equal to
    ``jt5.encode`` on the dense attention path.
    """
    try:
        from jax import shard_map
    except ImportError:  # pragma: no cover — older jax
        from jax.experimental.shard_map import shard_map

    pp = mesh.shape["pp"]
    lyrs = cfg.enc_layers
    if lyrs % pp:
        raise ValueError(f"enc_layers {lyrs} not divisible by pp {pp}")
    lps = lyrs // pp
    n_micro = n_micro or pp
    B, S, D = input_embeds.shape
    if B % n_micro:
        raise ValueError(f"batch {B} not divisible by n_micro {n_micro}")
    mb = B // n_micro

    stacked, rel_emb = stack_encoder_blocks(params)
    staged = jax.tree.map(
        lambda x: None if x is None else
        x.reshape((pp, lps) + x.shape[1:]), stacked,
        is_leaf=lambda x: x is None)
    bias = jt5.compute_position_bias(rel_emb, S, S, True, cfg.num_buckets,
                                     cfg.max_distance)

    micro = input_embeds.reshape(n_micro, mb, S, D)
    mmask = (jnp.ones((n_micro, mb, S), bool) if mask is None
             else mask.reshape(n_micro, mb, S))

    staged_specs = jax.tree.map(
        lambda x: None if x is None else P(*(("pp",) + (None,) * (x.ndim - 1))),
        staged, is_leaf=lambda x: x is None)

    def stage_fn(st, micro, mmask, bias):
        st = jax.tree.map(lambda x: None if x is None else x[0], st,
                          is_leaf=lambda x: x is None)
        sid = jax.lax.axis_index("pp")
        steps = n_micro + pp - 1

        def run_stage(x, kvm):
            def body(c, blk):
                return jt5._enc_block(blk, c, cfg, bias, kvm), None
            y, _ = jax.lax.scan(body, x, st)
            return y

        def step(carry, t):
            x, out = carry
            idx = jnp.clip(t - sid, 0, n_micro - 1)     # my microbatch
            inp = jnp.where(sid == 0, micro[jnp.clip(t, 0, n_micro - 1)], x)
            y = run_stage(inp, mmask[idx])
            live = (t - sid >= 0) & (t - sid < n_micro) & (sid == pp - 1)
            upd = jnp.where(live, y, jax.lax.dynamic_index_in_dim(
                out, idx, keepdims=False))
            out = jax.lax.dynamic_update_index_in_dim(out, upd, idx, 0)
            x_next = jax.lax.ppermute(
                y, "pp", [(i, (i + 1) % pp) for i in range(pp)])
            return (x_next, out), None

        x0 = jnp.zeros((mb, S, D), micro.dtype)
        out0 = jnp.zeros((n_micro, mb, S, D), micro.dtype)
        (x, out), _ = jax.lax.scan(step, (x0, out0), jnp.arange(steps))
        # replicate the last stage's finished buffer to every device
        out = jax.lax.psum(
            jnp.where(sid == pp - 1, out, jnp.zeros_like(out)), "pp")
        return out

    import inspect
    no_repcheck = ({"check_vma": False}
                   if "check_vma" in inspect.signature(shard_map).parameters
                   else {"check_rep": False})
    sharded = shard_map(
        stage_fn, mesh=mesh,
        in_specs=(staged_specs, P(), P(), P()),
        out_specs=P(), **no_repcheck)
    out = sharded(staged, micro, mmask, bias)
    out = out.reshape(B, S, D)
    return L.rms_norm(out, params["encoder"]["ln_final"]["scale"], cfg.eps)
