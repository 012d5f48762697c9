"""Device mesh + GSPMD partition specs.

The reference's only multi-device mechanism is HF accelerate's layer-wise
``device_map="auto"`` split (reference qwen2vl_model.py:120,128 et al.).
The TPU-native replacement is tensor parallelism over ICI via GSPMD: weights
carry `NamedSharding`s, XLA inserts the collectives (see SURVEY.md §2.4).

Axes:
  * ``dp`` — data: shards the pair/image batch dimension (DCN or ICI),
  * ``tp`` — tensor: shards attention heads / MLP hidden of every
    transformer in the bundle (T5 encoder+decoder, CLIP ViT, projector).

Spec assignment is path-based over the param pytree: `w` leaves of q/k/v
and up-projections shard their output dim on ``tp``; o/down-projections
shard their input dim; embeddings and norms replicate.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int = 1, tp: int | None = None, devices=None,
              ep: int = 1, sp: int = 1) -> Mesh:
    """Create a (dp, tp) mesh — with optional ``sp`` / ``ep`` axes in
    between: ("dp"[, "sp"][, "ep"], "tp").

    tp=None uses all remaining devices. The ``ep`` axis carries expert
    parallelism for MoE checkpoints (qwen3-vl-30b-a3b / 235b-a22b,
    reference qwen3vl_model.py:28-45): the packed expert tensors shard
    their leading E axis over ep while dense weights shard over tp, so a
    235B MoE spreads experts across chips without fragmenting the dense
    matmuls. The ``sp`` axis carries sequence parallelism for long-context
    activations (see parallel/sp.py). Both sit between dp and tp so their
    collectives ride the inner (faster) ICI dimensions together with tp.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if tp is None:
        tp = n // (dp * ep * sp)
    assert dp * sp * ep * tp <= n, f"mesh {dp}x{sp}x{ep}x{tp} > {n} devices"
    shape = [dp] + ([sp] if sp > 1 else []) + ([ep] if ep > 1 else []) + [tp]
    names = ["dp"] + (["sp"] if sp > 1 else []) + \
        (["ep"] if ep > 1 else []) + ["tp"]
    arr = np.asarray(devices[: int(np.prod(shape))]).reshape(shape)
    return Mesh(arr, tuple(names))


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """Multi-host entry: jax.distributed.initialize (SURVEY.md §2.4).

    On TPU pods the arguments are discovered from the environment; pass
    them explicitly for CPU/GPU test rigs. Idempotent."""
    import jax.distributed as jdist

    try:
        jdist.initialize(coordinator_address=coordinator_address,
                         num_processes=num_processes,
                         process_id=process_id)
    except RuntimeError as e:  # already initialized
        if "already" not in str(e).lower():
            raise


def make_multihost_mesh(dcn: int | None = None, dp: int = 1,
                        tp: int | None = None, devices=None) -> Mesh:
    """("dcn", "dp", "tp") mesh: the leading DCN axis spans hosts (slower
    interconnect — data-parallel only: per-host batch shards, score
    all-gather), dp/tp ride ICI within a host.

    dcn=None uses jax.process_count(). On a single host this still builds
    a 3-axis mesh (dcn splits the local devices), which is exactly what
    the virtual-device dryrun validates: shardings and collectives compile
    identically whether the dcn axis maps to DCN or ICI.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dcn is None:
        dcn = max(jax.process_count(), 1)
    if tp is None:
        tp = n // (dcn * dp)
    assert dcn * dp * tp <= n, f"mesh {dcn}x{dp}x{tp} > {n} devices"
    arr = np.asarray(devices[: dcn * dp * tp]).reshape(dcn, dp, tp)
    return Mesh(arr, ("dcn", "dp", "tp"))


# Param-name -> (out-sharded?) rules. Matched against the joined pytree path.
_COL_SHARDED = ("attn/q/w", "attn/k/w", "attn/v/w", "cross/q/w", "cross/k/w",
                "cross/v/w", "mlp/fc1/w", "mlp/wi_0/w", "mlp/wi_1/w",
                "mlp/wi/w", "mlp/gate/w", "mlp/up/w",
                "projector/fc1/w", "lm_head", "patch_w")
_ROW_SHARDED = ("attn/o/w", "cross/o/w", "mlp/fc2/w", "mlp/wo/w",
                "mlp/down/w", "projector/fc2/w")
_HEAD_SHARDED = ("rel_bias",)  # (buckets, heads): shard heads
_COL_BIAS = ("attn/q/b", "attn/k/b", "attn/v/b", "mlp/fc1/b",
             "mlp/gate/b", "mlp/up/b", "projector/fc1/b")


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def partition_specs(params, tp_axis: str = "tp", ep_axis: str | None = None):
    """Pytree of PartitionSpec matching `params` (TP sharding rules).

    ep_axis: mesh axis for the packed expert dimension of MoE tensors;
    defaults to the tp axis (expert-sharded TP) when the mesh has no
    dedicated ep axis."""

    def spec_for(path, leaf):
        s = _path_str(path)
        if leaf is None or np.ndim(leaf) == 0:
            return P()
        # W8A8 leaves (ops/quant.py): "<proj>/w_q" shards exactly like the
        # bf16 "<proj>/w" it replaces; the per-output-channel "<proj>/scale"
        # follows the weight's N axis (col-sharded projections split N ->
        # scale splits too; row-sharded projections keep N whole -> scale
        # replicated). Note RMSNorm leaves are ".../lnX/scale" — they never
        # sit under a projection dict, so the w_q sibling check below
        # cannot confuse them.
        if s.endswith("/w_q"):
            base = s[:-4] + "/w"
            if any(base.endswith(k) for k in _COL_SHARDED):
                return P(None, tp_axis)
            if any(base.endswith(k) for k in _ROW_SHARDED):
                return P(tp_axis, None)
            return P(None, None)
        if s.endswith("/scale") and np.ndim(leaf) == 1:
            base = s[:-6] + "/w"
            if any(base.endswith(k) for k in _COL_SHARDED):
                return P(tp_axis)
            if any(base.endswith(k) for k in _ROW_SHARDED):
                return P()
        # expert parallelism: shard the packed expert axis of MoE tensors
        if s.endswith("moe/gate_up") or s.endswith("moe/down"):
            return P(ep_axis or tp_axis, None, None)
        if any(s.endswith(k) for k in _COL_SHARDED):
            return P(None, tp_axis) if np.ndim(leaf) == 2 else P(tp_axis)
        if any(s.endswith(k) for k in _ROW_SHARDED):
            return P(tp_axis, None) if np.ndim(leaf) == 2 else P()
        if any(s.endswith(k) for k in _HEAD_SHARDED):
            return P(None, tp_axis)
        if any(s.endswith(k) for k in _COL_BIAS):
            return P(tp_axis)
        return P(*([None] * np.ndim(leaf)))

    return jax.tree_util.tree_map_with_path(spec_for, params,
                                            is_leaf=lambda x: x is None)


def abstract_sharded_params(params, mesh: Mesh, tp_axis: str = "tp"):
    """Pytree of ShapeDtypeStruct with TP shardings attached.

    `params` may be real arrays or ShapeDtypeStructs (e.g. from
    jax.eval_shape over an init fn). Use for AOT-compiling / memory-planning
    models too large to materialize on the host — jit(...).lower(abstract)
    .compile() runs the full GSPMD partitioner without allocating weights.
    """
    specs = partition_specs(params, tp_axis,
                            ep_axis="ep" if "ep" in mesh.axis_names else None)
    return jax.tree.map(
        lambda x, s: None if x is None else jax.ShapeDtypeStruct(
            x.shape, x.dtype, sharding=NamedSharding(mesh, s)),
        params, specs, is_leaf=lambda x: x is None)


def shard_params(params, mesh: Mesh, tp_axis: str = "tp"):
    """Place a param pytree onto the mesh with TP shardings (+ EP for MoE
    expert tensors when the mesh has an ``ep`` axis)."""
    specs = partition_specs(params, tp_axis,
                            ep_axis="ep" if "ep" in mesh.axis_names else None)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)) if x is not None else None,
        params, specs, is_leaf=lambda x: x is None)


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def data_sharding(mesh: Mesh, ndim: int):
    """Shard the leading (batch) dim over the data axes (dcn+dp when the
    mesh spans hosts, else dp)."""
    data_axes = tuple(a for a in ("dcn", "dp") if a in mesh.axis_names)
    return NamedSharding(mesh, P(*((data_axes,) + (None,) * (ndim - 1))))
