"""Sequence parallelism (SP): shard the token axis of activations.

The reference has no SP equivalent — its only multi-device mechanism is
HF accelerate's layer-wise ``device_map="auto"`` (reference
qwen2vl_model.py:120), which splits *weights*, never activations. The
TPU-native design shards long-context activations (B, S, D) along S over
an ``sp`` mesh axis with ``with_sharding_constraint``; GSPMD then
partitions every elementwise op, norm, and per-token matmul along S for
free and inserts all-gathers only where a full sequence is genuinely
needed (attention keys/values). This bounds per-chip activation HBM for
long video prompts (thousands of vision tokens per pair) without touching
model code beyond the annotation hooks.

Usage: build a mesh with an ``sp`` axis (``make_mesh(dp=1, sp=4, tp=2)``),
enter it (``with mesh:``), and run the normal scoring step. The
``shard_seq`` hooks inside the encoders are no-ops when the ambient mesh
has no ``sp`` axis, so single-device and TP-only paths are unaffected.

Note: GSPMD cannot auto-partition Mosaic (Pallas) kernels, so SP runs
attention on the XLA dense path (set ``T2V_ATTN_IMPL=reference``, or rely
on the automatic fallback off-TPU). Pallas under SP would require a
manual shard_map ring — see parallel/pipeline.py for the manual-mode
pattern.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def current_mesh() -> Mesh | None:
    """The ambient ``with mesh:`` context's mesh, or None."""
    try:
        from jax._src.mesh import thread_resources
        m = thread_resources.env.physical_mesh
        return m if m.devices.size else None
    except Exception:  # pragma: no cover — private-API drift
        return None


def shard_seq(x: jax.Array, seq_axis: int = 1):
    """Constrain activation ``x`` to be sharded along ``seq_axis`` over the
    ambient mesh's ``sp`` axis (and the batch dim over ``dp``). No-op when
    there is no ambient mesh or it has no ``sp`` axis."""
    mesh = current_mesh()
    if mesh is None or "sp" not in mesh.axis_names or x.ndim < 2:
        return x
    spec = [None] * x.ndim
    if "dp" in mesh.axis_names:
        spec[0] = "dp"
    spec[seq_axis] = "sp"
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(*spec)))
