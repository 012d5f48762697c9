"""Checkpoint save/load for functional param pytrees.

Two formats:
  * native: one ``.npz``-per-leaf tree written under a directory with a
    JSON manifest (fast, no deps beyond numpy, memory-mapped loads);
  * safetensors: stream HF shards directly into jnp arrays without
    materializing the full torch state dict (for 11B+ checkpoints the
    reference loads via HF from_pretrained + accelerate; here we read
    tensor-by-tensor so host RAM stays bounded).
"""

from __future__ import annotations

import json
import os

import numpy as np
import jax
import jax.numpy as jnp


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    elif tree is None:
        out[prefix.rstrip("/")] = None
    else:
        out[prefix.rstrip("/")] = tree
    return out


def save_params(params, path: str):
    """Write a param pytree to ``path/`` (manifest.json + arrays.npz)."""
    os.makedirs(path, exist_ok=True)
    flat = _flatten(params)
    manifest = {"structure": _structure(params),
                "keys": [k for k, v in flat.items() if v is not None]}
    arrays = {k.replace("/", "__"): np.asarray(v)
              for k, v in flat.items() if v is not None}
    np.savez(os.path.join(path, "arrays.npz"), **arrays)
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(manifest, f)


def _structure(tree):
    if isinstance(tree, dict):
        return {k: _structure(v) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return [_structure(v) for v in tree]
    if tree is None:
        return None
    return "leaf"


def _rebuild(structure, flat, prefix=""):
    if isinstance(structure, dict):
        return {k: _rebuild(v, flat, f"{prefix}{k}/")
                for k, v in structure.items()}
    if isinstance(structure, list):
        return [_rebuild(v, flat, f"{prefix}{i}/")
                for i, v in enumerate(structure)]
    if structure is None:
        return None
    return flat[prefix.rstrip("/")]


def load_params(path: str, dtype=None):
    """Load a native checkpoint dir -> param pytree (optionally cast)."""
    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    npz = np.load(os.path.join(path, "arrays.npz"))
    flat = {}
    for k in manifest["keys"]:
        arr = npz[k.replace("/", "__")]
        x = jnp.asarray(arr, dtype if dtype is not None else arr.dtype)
        flat[k] = x
    return _rebuild(manifest["structure"], flat)


def validate_params_dims(params, expected, model_name: str,
                         provisional: bool = False) -> None:
    """Raise with a readable per-leaf report when a loaded checkpoint's
    shapes disagree with the registry config.

    ``expected`` is a pytree of arrays or ShapeDtypeStructs (e.g. from
    ``jax.eval_shape`` over the family init fn). For families whose dims
    are PROVISIONAL (qwen3.5-*, gemma-4-*, molmo2-* — no public HF config
    to pin them), a real checkpoint converted against the published
    weights is the first ground truth the config ever meets, so a
    mismatch here gets an explicit pointer instead of a shape error deep
    inside the first jit trace.
    """
    flat_p = _flatten(params)
    flat_e = _flatten(expected)
    problems = []
    for k in sorted(set(flat_e) | set(flat_p)):
        e, p = flat_e.get(k), flat_p.get(k)
        if e is None and p is None:
            continue
        if k not in flat_p:
            problems.append(f"  missing: {k} (expected {tuple(e.shape)})")
        elif k not in flat_e:
            problems.append(f"  unexpected: {k} {tuple(p.shape)}")
        elif tuple(e.shape) != tuple(p.shape):
            problems.append(f"  shape mismatch: {k} checkpoint "
                            f"{tuple(p.shape)} != config {tuple(e.shape)}")
    if problems:
        hint = (
            "\nThe registry dims for this model are PROVISIONAL (no public "
            "HF config in the build environment — see the family module "
            "docstring). Pass config=<corrected config> with the dims from "
            "your checkpoint's config.json." if provisional else "")
        raise ValueError(
            f"checkpoint does not match the {model_name} config "
            f"({len(problems)} problem(s)):\n" + "\n".join(problems[:20])
            + ("\n  ..." if len(problems) > 20 else "") + hint)


def iter_safetensors(model_dir: str):
    """Yield (name, numpy array) from all safetensors shards in a dir,
    one tensor at a time (bounded memory)."""
    try:
        from safetensors import safe_open
    except ImportError as e:  # pragma: no cover
        raise RuntimeError("safetensors not available") from e
    shards = sorted(f for f in os.listdir(model_dir)
                    if f.endswith(".safetensors"))
    for shard in shards:
        with safe_open(os.path.join(model_dir, shard), framework="np") as f:
            for name in f.keys():
                yield name, f.get_tensor(name)


def load_safetensors_dict(model_dir: str) -> dict:
    """Full state-dict load from a safetensors dir (numpy tensors, wrapped
    so `convert.t2np` passes through)."""

    class _NP:
        def __init__(self, a):
            self.a = a

        def detach(self):
            return self

        def cpu(self):
            return self

        def numpy(self):
            return self.a

    return {k: _NP(v) for k, v in iter_safetensors(model_dir)}
