import pytest
"""Validate the driver entry points on the virtual 8-device CPU mesh."""

import sys
import pathlib

import jax

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def test_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (4,)


def test_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_deploy_plan_hermetic_on_tpu_failure(monkeypatch):
    """VERDICT r3 item 1: a TPU-side deploy failure (libtpu skew, tunnel
    death, AOT crash) must degrade to the CPU-fallback report instead of
    failing the multichip correctness gate. Simulates the r3 crash by
    failing the first deploy subprocess and asserts the gate retries with
    the forced-hermetic topology skip and succeeds."""
    import __graft_entry__ as ge

    real = ge._run_deploy_subprocess
    calls = []

    def flaky(env):
        calls.append(dict(env))
        if env.get("T2V_TPU_TOPO_SKIP") != "1":
            class R:
                returncode = 1
                stdout = ""
                stderr = ("jax.errors.JaxRuntimeError: FAILED_PRECONDITION: "
                          "libtpu version mismatch (simulated r3 skew)")
            return R()
        return real(env)

    monkeypatch.setattr(ge, "_run_deploy_subprocess", flaky)
    ge.dryrun_deploy_plan(8)  # must NOT raise
    assert len(calls) == 2
    assert calls[1]["T2V_TPU_TOPO_SKIP"] == "1"


# full-fidelity suite: run with plain `pytest`; the quick tier
# (`pytest -m 'not slow'`, ~2 min) covers the API/data/ops layers
pytestmark = pytest.mark.slow
