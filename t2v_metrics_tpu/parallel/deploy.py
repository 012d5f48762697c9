"""AOT deploy planning: prove a model fits a TPU slice before owning one.

The reference sizes deployments by GPU-memory folklore ("40GB+ GPUs for the
largest VQAScore models", reference V_3.0_README.md:127-129). The TPU-native
equivalent is exact: GSPMD-partition the full scoring step against a *device-
less topology descriptor* (PJRT AOT compile) with abstract weights — no
HBM, no 21 GiB host allocation — and read per-device HBM demand from
``compiled.memory_analysis()``.

Run as a module for the clip-flant5-xxl flagship report (BASELINE config 3):

    T2V_ATTN_IMPL=reference T2V_FUSED_LN=0 \
        python -m t2v_metrics_tpu.parallel.deploy

The env vars force the XLA dense paths at trace time: Mosaic (Pallas)
kernels cannot be auto-partitioned by GSPMD, and the dense paths are a
memory upper bound on the kernels they replace (flash attention exists to
use *less* HBM). Measured on the real v5e topology (2026-08): tp=4 ->
5.63 GiB/device, tp=8 -> 3.03 GiB/device for the 21.4 GiB bf16 xxl bundle.

When no TPU topology is available (CPU-only CI), falls back to a virtual
CPU device mesh. The CPU backend materializes fp32 copies of every bf16
weight for its matmuls (temps ~= 2x args — a CPU-only artifact; TPU MXUs
consume bf16 natively, and the v5e topology compile above measures temps
at ~0.1 GiB), so the fallback reports an adjusted estimate alongside the
raw numbers.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from . import mesh as pmesh

V5E_HBM_BUDGET_GIB = 15.0  # 16 GiB chip minus runtime/framework reserve


def _scoring_fn(cfg):
    from ..models import clip_flant5 as cft5

    def fn(params, pixels, ids, img_mask, img_slot, enc_mask, ans_ids,
           ans_mask, pair_image, pair_text):
        feats = cft5.image_features(params, cfg, pixels)
        return cft5.score_pairs(params, cfg, feats, ids, img_mask, img_slot,
                                enc_mask, ans_ids, ans_mask,
                                pair_image, pair_text)

    return fn


def aot_scoring_memory(cfg, devices, tp: int, *, dtype=jnp.bfloat16,
                       n: int = 4, npairs: int = 4, S: int = 256,
                       A: int = 16) -> dict:
    """AOT-lower the CLIP-T5 scoring step over a (1, tp) mesh of `devices`
    (real, virtual, or topology-descriptor devices) and return per-device
    memory demand in bytes: {"args", "temps", "params_total"}."""
    from ..models import clip_flant5 as cft5

    shapes = jax.eval_shape(
        lambda k: cft5.init_clip_t5(k, cfg, dtype=dtype),
        jax.random.PRNGKey(0))
    total = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(shapes))
    mesh = Mesh(np.asarray(devices[:tp]).reshape(1, tp), ("dp", "tp"))
    specs = pmesh.partition_specs(shapes)
    p_abs = jax.tree.map(
        lambda x, s: None if x is None else jax.ShapeDtypeStruct(
            x.shape, x.dtype, sharding=NamedSharding(mesh, s)),
        shapes, specs, is_leaf=lambda x: x is None)
    repl = NamedSharding(mesh, P())
    sds = lambda shape, dt: jax.ShapeDtypeStruct(shape, dt, sharding=repl)
    img = cfg.vision.image_size
    compiled = jax.jit(_scoring_fn(cfg)).lower(
        p_abs,
        sds((n, img, img, 3), jnp.float32),
        sds((n, S), jnp.int32), sds((n, S), jnp.bool_),
        sds((n, S), jnp.int32), sds((n, S), jnp.bool_),
        sds((n, A), jnp.int32), sds((n, A), jnp.float32),
        sds((npairs,), jnp.int32), sds((npairs,), jnp.int32)).compile()
    ma = compiled.memory_analysis()
    return {"args": ma.argument_size_in_bytes,
            "temps": ma.temp_size_in_bytes,
            "params_total": total}


def aot_qwen_scoring_memory(cfg, devices, tp: int, *, dtype=jnp.bfloat16,
                            b: int = 4, S: int = 1024, T: int = 256,
                            A: int = 4) -> dict:
    """AOT-lower the Qwen2.5-VL decoder scoring step (splice_and_score —
    the memory-dominant program of BASELINE config 4) over a (1, tp) mesh
    with abstract sharded weights; returns per-device bytes like
    `aot_scoring_memory`. The vision tower is a ~0.7 GiB bf16 add-on and
    is accounted in params_total but not lowered (its activations are
    far below the decoder prefill's)."""
    from ..models import qwen2vl as q2

    shapes = jax.eval_shape(
        lambda k: q2.init_qwen2vl(k, cfg, dtype=dtype), jax.random.PRNGKey(0))
    total = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(shapes))
    mesh = Mesh(np.asarray(devices[:tp]).reshape(1, tp), ("dp", "tp"))
    specs = pmesh.partition_specs(shapes)
    p_abs = jax.tree.map(
        lambda x, s: None if x is None else jax.ShapeDtypeStruct(
            x.shape, x.dtype, sharding=NamedSharding(mesh, s)),
        shapes, specs, is_leaf=lambda x: x is None)
    repl = NamedSharding(mesh, P())
    sds = lambda shape, dt: jax.ShapeDtypeStruct(shape, dt, sharding=repl)
    compiled = jax.jit(
        lambda p, *a: q2.splice_and_score(p, cfg, *a)).lower(
        p_abs,
        sds((b, S), jnp.int32),
        sds((b, T, cfg.text.d_model), dtype),
        sds((b, S), jnp.bool_), sds((b, S), jnp.int32),
        sds((3, b, S), jnp.int32), sds((b, S), jnp.bool_),
        sds((b, A), jnp.int32), sds((b, A), jnp.int32),
        sds((b, A), jnp.float32)).compile()
    ma = compiled.memory_analysis()
    return {"args": ma.argument_size_in_bytes,
            "temps": ma.temp_size_in_bytes,
            "params_total": total}


def xxl_deploy_report(tp_sizes=(4, 8), topology_name: str = "v5e:2x4",
                      budget_gib: float = V5E_HBM_BUDGET_GIB) -> list[dict]:
    """Per-device HBM report for clip-flant5-xxl at each TP slice size.

    Tries the real TPU topology descriptor first (exact v5e compiler
    output); falls back to a virtual CPU mesh with the fp32-weight-copy
    adjustment documented in the module docstring.
    """
    from ..models.adapters import CLIP_T5_MODELS

    cfg = CLIP_T5_MODELS["clip-flant5-xxl"]["config"]
    return _deploy_report(cfg, aot_scoring_memory, tp_sizes, topology_name,
                          budget_gib)


def qwen7b_deploy_report(tp_sizes=(4, 8), topology_name: str = "v5e:2x4",
                         budget_gib: float = V5E_HBM_BUDGET_GIB) -> list[dict]:
    """Per-device HBM report for qwen2.5-vl-7b (BASELINE config 4's
    registry default) at each TP slice size."""
    from ..models.qwen2vl import QWEN2_VL_MODELS

    cfg = QWEN2_VL_MODELS["qwen2.5-vl-7b"]["config"]
    return _deploy_report(cfg, aot_qwen_scoring_memory, tp_sizes,
                          topology_name, budget_gib)


_TOPO_PROBE_CACHE: dict = {}


def _topology_devices(topology_name: str, timeout_s: int = 240):
    """TPU topology devices, or None. Hermeticity rules (VERDICT r3: a
    libtpu client/terminal version skew crashed the whole multichip gate):

    * The PJRT plugin init inside get_topology_desc HANGS (not raises)
      when the TPU tunnel is down — probe in a killable subprocess.
    * The probe runs the FULL mini AOT pipeline (topology desc -> jit
      lower -> compile -> memory_analysis) with eager dispatch pinned to
      CPU, so *any* TPU-side failure mode (libtpu skew, Mosaic lowering,
      AOT serialization) flips the verdict to cpu-fallback instead of
      surfacing later in-process.
    * The verdict is memoized per topology: with a dead tunnel each probe
      burns its full timeout, and the deploy report runs once per family.
    """
    import subprocess
    import sys
    if os.environ.get("T2V_TPU_TOPO_SKIP") == "1":
        # the multichip gate's parent probe already found the tunnel dead
        return None
    if topology_name not in _TOPO_PROBE_CACHE:
        probe = (
            "import jax; jax.config.update('jax_platforms', 'cpu')\n"
            "import jax.numpy as jnp\n"
            "from jax.experimental import topologies\n"
            "topo = topologies.get_topology_desc(platform='tpu', "
            f"topology_name='{topology_name}')\n"
            "devs = topo.devices\n"
            "from jax.sharding import Mesh, NamedSharding, PartitionSpec\n"
            "import numpy as np\n"
            "mesh = Mesh(np.asarray(devs[:2]).reshape(1, 2), ('dp', 'tp'))\n"
            "s = NamedSharding(mesh, PartitionSpec(None, 'tp'))\n"
            "x = jax.ShapeDtypeStruct((128, 256), jnp.bfloat16, sharding=s)\n"
            "c = jax.jit(lambda a: (a @ a.T).sum()).lower(x).compile()\n"
            "ma = c.memory_analysis()\n"
            "assert ma.argument_size_in_bytes > 0\n"
            "print('TOPO_OK')\n")
        try:
            r = subprocess.run([sys.executable, "-c", probe],
                               capture_output=True, text=True,
                               timeout=timeout_s)
            _TOPO_PROBE_CACHE[topology_name] = (
                r.returncode == 0 and "TOPO_OK" in r.stdout)
            if not _TOPO_PROBE_CACHE[topology_name]:
                print(f"deploy: TPU topology probe failed "
                      f"(rc={r.returncode}); using cpu-fallback. tail: "
                      f"{r.stderr.strip().splitlines()[-1] if r.stderr.strip() else ''}",
                      file=sys.stderr)
        except Exception as e:
            print(f"deploy: TPU topology probe error {type(e).__name__}; "
                  f"using cpu-fallback", file=sys.stderr)
            _TOPO_PROBE_CACHE[topology_name] = False
    if not _TOPO_PROBE_CACHE[topology_name]:
        return None
    from jax.experimental import topologies
    return topologies.get_topology_desc(
        platform="tpu", topology_name=topology_name).devices


def _deploy_report(cfg, aot_fn, tp_sizes, topology_name, budget_gib):
    devices = _topology_devices(topology_name)
    backend = topology_name
    if devices is None:
        devices = [d for d in jax.devices() if d.platform == "cpu"]
        backend = "cpu-fallback"

    out = []
    for tp in tp_sizes:
        if len(devices) < tp:
            out.append({"tp": tp, "skipped": f"only {len(devices)} devices"})
            continue
        m = aot_fn(cfg, devices, tp)
        per_dev = m["args"] + m["temps"]
        if backend == "cpu-fallback":
            # CPU matmuls upcast every bf16 weight to fp32 (2x bf16 bytes
            # of temps) — absent on TPU (v5e topology measures ~0.1 GiB
            # temps). Report both raw and adjusted.
            adj = m["args"] + max(0, m["temps"] - 2 * m["args"])
        else:
            adj = per_dev
        rec = {"tp": tp, "backend": backend,
               "params_gib": m["params_total"] / 2**30,
               "args_gib": m["args"] / 2**30,
               "temps_gib": m["temps"] / 2**30,
               "per_device_gib": per_dev / 2**30,
               "per_device_gib_tpu_estimate": adj / 2**30,
               "fits_v5e": adj / 2**30 < budget_gib}
        out.append(rec)
    return out


def main():
    import sys

    for label, report in (("clip-flant5-xxl", xxl_deploy_report),
                          ("qwen2.5-vl-7b", qwen7b_deploy_report)):
        try:
            recs = report()
        except Exception as e:
            # Real-topology AOT path failed past the probe (e.g. libtpu
            # client/terminal skew mid-upgrade, VERDICT r3). The deploy
            # plan is a CORRECTNESS gate — degrade to the hermetic
            # CPU-fallback report with a warning rather than failing it.
            print(f"deploy_plan {label}: TPU topology path failed "
                  f"({type(e).__name__}: {str(e)[:300]}); retrying on "
                  f"cpu-fallback", file=sys.stderr)
            os.environ["T2V_TPU_TOPO_SKIP"] = "1"
            _TOPO_PROBE_CACHE.clear()
            recs = report()
        for rec in recs:
            if "skipped" in rec:
                print(f"deploy_plan {label} tp={rec['tp']}: skipped "
                      f"({rec['skipped']})")
                continue
            print(f"deploy_plan {label} tp={rec['tp']} "
                  f"[{rec['backend']}]: params {rec['params_gib']:.1f} GiB "
                  f"bf16, per-device HBM "
                  f"{rec['per_device_gib_tpu_estimate']:.2f} GiB "
                  f"(args {rec['args_gib']:.2f} + temps {rec['temps_gib']:.2f}"
                  f"{' raw, cpu fp32-copy artifact adjusted out' if rec['backend'] == 'cpu-fallback' else ''}) — "
                  f"{'fits' if rec['fits_v5e'] else 'DOES NOT FIT'} "
                  f"16 GiB v5e")
            assert rec["fits_v5e"]


if __name__ == "__main__":
    main()
