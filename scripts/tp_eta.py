"""Derive the TP-over-ICI efficiency (eta) from compiled HLO collectives.

VERDICT r4 weak #3 / item 4: the 0.85 eta in the tp4 projections was an
assumption. This script replaces it with arithmetic:

  1. GSPMD-partition the FULL xxl scoring step at tp=4 exactly as
     parallel/deploy.py does (abstract weights, no HBM) — on the real v5e
     topology descriptor when the tunnel is alive, else the virtual CPU
     mesh (the partitioner's collective placement is identical; only
     codegen differs).
  2. Parse the compiled HLO for every cross-device collective
     (all-reduce / all-gather / reduce-scatter / collective-permute) and
     sum the bytes each moves per executed step.
  3. Convert bytes -> seconds with the documented v5e ICI model: a tp=4
     1D ring rides 2 of the chip's 4 ICI links; each link moves 50 GB/s
     per direction (400 Gbps), so ring algorithmic bandwidth per chip is
     ~100 GB/s and an all-reduce of B bytes costs 2(p-1)/p * B / 100e9 s.
  4. eta = t_compute / (t_compute + t_coll * (1 - overlap)) where
     t_compute is the measured single-chip chunk time / tp, reported for
     overlap in {0, 0.5, 0.8} (XLA overlaps async collectives with the
     next layer's GEMMs; 0.5 is the conservative production default).

Collective bytes scale linearly in the pair axis, so the step compiles at
a reduced npairs and bytes are scaled to the headline chunk — documented
in the output.

Prints one JSON line; bench.py merges it as `tp4_eta_derivation`.
"""

import argparse
import json
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")
# GSPMD cannot auto-partition Mosaic custom-calls; the dense paths place
# the same collectives (they come from the weight shardings, not the
# attention impl)
os.environ["T2V_ATTN_IMPL"] = "reference"
os.environ["T2V_FUSED_LN"] = "0"
# guarantee >=8 virtual CPU devices for the fallback mesh (must precede
# jax import)
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

_DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
                "s8": 1, "u8": 1, "pred": 1, "f64": 8, "s64": 8}

# e.g. `%all-reduce.1 = f32[8,512]{1,0} all-reduce(%dot.1), ...` — the
# layout braces between shape and op name are optional, and async
# collectives appear as <op>-start
_COLL_RE = re.compile(
    r"=\s*(\w+)\[([\d,]*)\](?:\{[^}]*\})?\s*"
    r"(all-reduce|all-gather|reduce-scatter|collective-permute)"
    r"(?:-start)?\(")


def collective_bytes(hlo_text: str) -> dict:
    """Sum output bytes per collective kind from HLO text."""
    out = {}
    for m in _COLL_RE.finditer(hlo_text):
        dt, dims, kind = m.group(1), m.group(2), m.group(3)
        n = int(np.prod([int(d) for d in dims.split(",") if d])) if dims \
            else 1
        out[kind] = out.get(kind, 0) + n * _DTYPE_BYTES.get(dt, 4)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tp", type=int, default=4)
    ap.add_argument("--npairs", type=int, default=8,
                    help="pairs compiled (bytes scale linearly to --chunk)")
    ap.add_argument("--chunk", type=int, default=128)
    ap.add_argument("--enc-seq", type=int, default=640)
    ap.add_argument("--ans-len", type=int, default=4)
    ap.add_argument("--single-chip-chunk-ms", type=float, default=5134.7,
                    help="measured single-chip-equiv ms/chunk from "
                         "xxl_piecewise (bf16)")
    args = ap.parse_args()

    from t2v_metrics_tpu.compile_cache import enable_persistent_cache
    enable_persistent_cache()

    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from t2v_metrics_tpu.models import clip_flant5 as cft5
    from t2v_metrics_tpu.models.adapters import CLIP_T5_MODELS
    from t2v_metrics_tpu.parallel import mesh as pmesh
    from t2v_metrics_tpu.parallel import deploy

    cfg = CLIP_T5_MODELS["clip-flant5-xxl"]["config"]
    tp = args.tp

    devices = deploy._topology_devices("v5e:2x4")
    topo_label = "v5e:2x4"
    if devices is None:
        devices = [d for d in jax.devices() if d.platform == "cpu"]
        topo_label = "cpu-fallback (collective placement is identical; "\
                     "GSPMD partitions before codegen)"

    shapes = jax.eval_shape(
        lambda k: cft5.init_clip_t5(k, cfg, dtype=jnp.bfloat16),
        jax.random.PRNGKey(0))
    mesh = Mesh(np.asarray(devices[:tp]).reshape(1, tp), ("dp", "tp"))
    specs = pmesh.partition_specs(shapes)
    p_abs = jax.tree.map(
        lambda x, s: None if x is None else jax.ShapeDtypeStruct(
            x.shape, x.dtype, sharding=NamedSharding(mesh, s)),
        shapes, specs, is_leaf=lambda x: x is None)
    repl = NamedSharding(mesh, P())
    sds = lambda shape, dt: jax.ShapeDtypeStruct(shape, dt, sharding=repl)
    img = cfg.vision.image_size
    n, npairs, S, A = 4, args.npairs, args.enc_seq, args.ans_len
    compiled = jax.jit(deploy._scoring_fn(cfg)).lower(
        p_abs,
        sds((n, img, img, 3), jnp.float32),
        sds((n, S), jnp.int32), sds((n, S), jnp.bool_),
        sds((n, S), jnp.int32), sds((n, S), jnp.bool_),
        sds((n, A), jnp.int32), sds((n, A), jnp.float32),
        sds((npairs,), jnp.int32), sds((npairs,), jnp.int32)).compile()

    hlo = compiled.as_text()
    bytes_by_kind = collective_bytes(hlo)
    total_compiled = sum(bytes_by_kind.values())
    scale = args.chunk / npairs
    total_chunk = total_compiled * scale

    # v5e ICI ring model (documented in the module docstring)
    link_gbps_onedir = 400.0
    links_in_ring = 2
    ring_bw = links_in_ring * link_gbps_onedir / 8 * 1e9   # 100 GB/s
    t_coll = 2 * (tp - 1) / tp * total_chunk / ring_bw

    t_comp = args.single_chip_chunk_ms / 1e3 / tp
    etas = {f"overlap_{o}": round(t_comp / (t_comp + t_coll * (1 - o)), 3)
            for o in (0.0, 0.5, 0.8)}

    print(json.dumps({
        "tp": tp,
        "topology": topo_label,
        "compiled_npairs": npairs, "scaled_to_chunk": args.chunk,
        "collective_bytes_by_kind_per_chunk": {
            k: int(v * scale) for k, v in bytes_by_kind.items()},
        "total_collective_gb_per_chunk": round(total_chunk / 1e9, 3),
        "ici_model": f"tp{tp} 1D ring over {links_in_ring} of 4 ICI links, "
                     f"{link_gbps_onedir:.0f} Gbps/link/direction -> "
                     f"{ring_bw / 1e9:.0f} GB/s ring bandwidth per chip; "
                     f"t = 2(p-1)/p * bytes / bw",
        "t_collective_ms_per_chunk": round(t_coll * 1e3, 1),
        "t_compute_ms_per_chunk_per_chip": round(t_comp * 1e3, 1),
        "eta_by_overlap": etas,
        "eta_recommended": etas["overlap_0.5"],
        "note": "replaces the flat 0.85 assumption (VERDICT r4 item 4); "
                "bytes are exact from the partitioned HLO, bandwidth and "
                "overlap are the documented model above",
    }))


if __name__ == "__main__":
    main()
