"""Kernel self-test plumbing (ops/kernel_probe.py).

The probe's kernel executions need a real TPU; what CPU CI can pin down:
the fallback decision table, the subprocess protocol (a cpu-platform probe
must be a no-op), the geometry legality of every probe case (so the probe
cannot trivially ValueError on chip), and the reference-side comparison
code each case runs.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from t2v_metrics_tpu.ops import kernel_probe as kp


def test_decide_fallbacks_table():
    ok = {c: "ok maxdiff=1e-3" for c in kp.CASES}
    assert kp._decide_fallbacks({"platform": "tpu", **ok}) == []
    # non-tpu: never touch anything, whatever the statuses say
    assert kp._decide_fallbacks({"platform": "cpu"}) == []
    assert kp._decide_fallbacks(
        {"platform": "cpu", "flat": "FAIL x"}) == []
    # one packed case failing disables only the packed entry
    r = {"platform": "tpu", **ok, "packed_segment": "MISMATCH maxdiff=1"}
    assert kp._decide_fallbacks(r) == ["no_packed"]
    # the base flat kernel failing disables all pallas attention
    r = {"platform": "tpu", **ok, "flat": "FAIL Mosaic"}
    assert kp._decide_fallbacks(r) == ["no_flash", "no_packed"]
    # fused LN independent of attention
    r = {"platform": "tpu", **ok, "fused_ln": "FAIL x"}
    assert kp._decide_fallbacks(r) == ["no_fused_ln"]
    # W8A8 fused-epilogue matmul kernel independent of the rest
    r = {"platform": "tpu", **ok, "quant_matmul": "FAIL Mosaic"}
    assert kp._decide_fallbacks(r) == ["no_quant_kernel"]
    # a probe crash drops later cases -> missing counts as failure
    r = {"platform": "tpu", "packed_bias": "ok maxdiff=1e-3"}
    acts = kp._decide_fallbacks(r)
    assert "no_packed" in acts and "no_flash" in acts \
        and "no_fused_ln" in acts and "no_quant_kernel" in acts


def test_apply_fallbacks_flips_live_constants(monkeypatch):
    from t2v_metrics_tpu.ops import attention as A
    from t2v_metrics_tpu.ops import norms as N

    monkeypatch.setattr(A, "FLASH_PACKED", True)
    monkeypatch.setattr(A, "ATTN_IMPL_OVERRIDE", "")
    monkeypatch.setattr(N, "FUSED_LN", True)
    monkeypatch.setenv("T2V_FLASH_PACKED", "1")
    kp._apply_fallbacks(["no_packed", "no_flash", "no_fused_ln"])
    assert A.FLASH_PACKED is False
    assert A.ATTN_IMPL_OVERRIDE == "reference"
    assert N.FUSED_LN is False
    assert os.environ["T2V_FLASH_PACKED"] == "0"
    assert os.environ["T2V_ATTN_IMPL"] == "reference"
    assert os.environ["T2V_FUSED_LN"] == "0"


def test_probe_cases_have_legal_geometry():
    """Every attention probe case must pass _flat_plan (hg not None) or
    the on-chip probe would report a spurious ValueError failure."""
    from t2v_metrics_tpu.ops.attention import _flat_plan

    shapes = {
        "packed_bias": (640, 32, None, 64, True),
        "packed_causal_gqa": (512, 16, 2, 128, False),
        "packed_segment": (256, 16, None, 64, False),
        "flat": (256, 16, None, 64, False),
    }
    for name, (s, h, kvh, d, has_bias) in shapes.items():
        bq, sk_pad, hg = _flat_plan(s, s, h, kvh, d, has_bias)
        assert hg is not None, f"{name}: no legal head group"


def test_probe_subprocess_cpu_noop():
    """On a cpu backend the probe prints the platform line and nothing
    else. (The env var alone can't pin the platform here: this image's
    sitecustomize force-registers the axon TPU plugin at jax import, so
    the child resets jax_platforms in-process the way
    __graft_entry__._reexec_with_virtual_devices does.)"""
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = ("import jax; jax.config.update('jax_platforms', 'cpu'); "
            "from t2v_metrics_tpu.ops.kernel_probe import main; main()")
    r = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=300, cwd=repo, env=env)
    lines = [json.loads(x) for x in r.stdout.splitlines()
             if x.startswith("{")]
    assert lines and lines[0] == {"platform": "cpu"}
    assert len(lines) == 1


def test_reference_side_of_each_case_runs():
    """The XLA reference computation each probe case compares against must
    execute on CPU (exercises the exact shapes/kwargs the probe passes)."""
    import jax.numpy as jnp

    from t2v_metrics_tpu.ops import attention as A

    for name in ("packed_bias", "packed_causal_gqa", "packed_segment",
                 "flat"):
        cfgs = {
            "packed_bias": dict(h=32, kvh=None, d=64, s=640, bias=True,
                                causal=False, seg=False),
            "packed_causal_gqa": dict(h=16, kvh=2, d=128, s=512, bias=False,
                                      causal=True, seg=False),
            "packed_segment": dict(h=16, kvh=None, d=64, s=256, bias=False,
                                   causal=False, seg=True),
            "flat": dict(h=16, kvh=None, d=64, s=256, bias=False,
                         causal=False, seg=False),
        }
        c = cfgs[name]
        h, d, s = c["h"], c["d"], c["s"]
        kvh = c["kvh"] if c["kvh"] is not None else h
        qkv = jnp.asarray(kp._mk((1, s, (h + 2 * kvh) * d), 3)) \
            .astype(jnp.bfloat16)
        bias = jnp.asarray(kp._mk((1, h, s, s), 4)) if c["bias"] else None
        seg = None
        if c["seg"]:
            seg = jnp.asarray(np.concatenate(
                [np.zeros(s - 64, np.int32),
                 np.full(64, -1, np.int32)])[None])
        q = qkv[..., : h * d]
        k = qkv[..., h * d:(h + kvh) * d]
        v = qkv[..., (h + kvh) * d:]
        ref = A.attention_flat(q, k, v, h, kv_heads=c["kvh"], bias=bias,
                               causal=c["causal"], segment_ids=seg,
                               impl="reference")
        assert ref.shape == (1, s, h * d)
        assert bool(jnp.all(jnp.isfinite(ref.astype(jnp.float32))))
