"""Fast random materialization of large param trees on device.

Bench/offline helper: leaf-by-leaf `jax.random.*` calls dispatch one
remote program per leaf — ~1400 tunnel round-trips (~8 min) for the 11B
xxl tree. `materialize_like` groups leaves by (shape, dtype, kind) and
fills each group with ONE stacked device call (chunked at ~1 GiB so the
transient stack never spikes HBM), then slices — ~20 calls, seconds.

Kinds (magnitudes mimic the production inits):
  * int8 leaves               -> uniform int8 grid
  * 1-D float32 ("scale")     -> uniform(2e-4, 3.5e-4): per-channel quant
                                 scales sized so int8*scale has ~the 0.02
                                 init std (int8 uniform std ~73)
  * other 1-D ("ones")        -> ones (norm scales / biases)
  * everything else           -> N(0, 0.02)

Throughput benches only — numerics are irrelevant beyond staying finite
through deep stacks (norm-reset residual streams keep them bounded).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _kind(leaf) -> str:
    if leaf.dtype == jnp.int8:
        return "int8"
    if leaf.ndim == 1 and leaf.dtype == jnp.float32:
        return "scale"
    if leaf.ndim == 1:
        return "ones"
    return "normal"


def materialize_like(shapes_tree, key, max_call_bytes: int = 1 << 30):
    """Random tree matching a `jax.eval_shape` result. Returns
    (params, n_device_calls)."""
    leaves, treedef = jax.tree_util.tree_flatten(shapes_tree)
    groups = {}
    for i, l in enumerate(leaves):
        groups.setdefault((l.shape, str(l.dtype), _kind(l)), []).append(i)
    vals = [None] * len(leaves)
    ncalls = 0
    for j, ((shape, _, kind), idxs) in enumerate(sorted(groups.items())):
        dt = leaves[idxs[0]].dtype
        leaf_bytes = int(np.prod(shape)) * dt.itemsize
        per_call = max(1, max_call_bytes // max(leaf_bytes, 1))
        for c0 in range(0, len(idxs), per_call):
            chunk = idxs[c0:c0 + per_call]
            k = jax.random.fold_in(key, j * 1000 + c0)
            n = len(chunk)
            ncalls += 1
            if kind == "int8":
                arr = jax.random.randint(k, (n, *shape), -127, 128,
                                         jnp.int8)
            elif kind == "scale":
                arr = jax.random.uniform(k, (n, *shape), jnp.float32,
                                         2e-4, 3.5e-4)
            elif kind == "ones":
                arr = jnp.ones((n, *shape), dt)
            else:
                arr = jax.random.normal(k, (n, *shape), dt) * 0.02
            for t, i in enumerate(chunk):
                vals[i] = arr[t]
            # force the slices out and the stack freed before the next
            # chunk (keeps the transient bounded)
            jax.block_until_ready(vals[chunk[-1]])
            del arr
    return jax.tree_util.tree_unflatten(treedef, vals), ncalls
