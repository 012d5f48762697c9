"""Staged batch_forward stress test (deep pipeline + staging-ring safety).

The threaded prep/dispatch/drain pipeline in Score._batch_forward_staged
writes each chunk's pixels into a shared staging ring
(engine._device_resize_batch(slot=...)) and relies on FIFO drain order to
prove a slot's H2D transfer completed before reuse. These tests drive
enough chunks through the pipeline to cycle every ring slot several times
and assert bit-equality with the fully synchronous path — slot-reuse
corruption, mis-ordered drains, or ramp-plan bookkeeping errors all show
up as score mismatches or misplaced rows.
"""

import os

import numpy as np
import pytest

import t2v_metrics_tpu as t2v
from t2v_metrics_tpu.score import Score


@pytest.fixture(scope="module")
def scorer():
    import jax.numpy as jnp
    return t2v.VQAScore(model="clip-flant5-test", init="random",
                        dtype=jnp.float32, max_pairs_per_call=8)


def _dataset(rng, n, img_side=64, texts_per=1):
    out = []
    for i in range(n):
        out.append({
            "images": [rng.integers(0, 255, (img_side, img_side, 3),
                                    dtype=np.uint8)],
            "texts": [f"sample {i} text {j}" for j in range(texts_per)],
        })
    return out


def test_staged_matches_synchronous_many_chunks(scorer, monkeypatch):
    """>= 16 chunks of distinct data: threaded staged pipeline must equal
    the thread-free path bit-for-bit (same jit programs, same inputs)."""
    rng = np.random.default_rng(0)
    data = _dataset(rng, 130)  # 17 chunks at batch_size 8 (last one ragged)

    monkeypatch.setenv("T2V_PIPELINE_THREAD", "0")
    ref = scorer.batch_forward(data, batch_size=8)
    monkeypatch.setenv("T2V_PIPELINE_THREAD", "1")
    out = scorer.batch_forward(data, batch_size=8)
    assert out.shape == (130, 1, 1)
    np.testing.assert_array_equal(out, ref)


def test_staged_varied_shapes_exercise_ring_keying(scorer, monkeypatch):
    """Chunk image shapes vary (64 / 96 / 48 px sources) so the staging
    ring keys (shape, slot) change across chunks — exercises the
    per-shape buffer ring and the device-preproc shape gate."""
    rng = np.random.default_rng(1)
    data = []
    for side in (64, 96, 48, 64, 96, 48, 64, 96, 48, 64, 96, 48):
        data.extend(_dataset(rng, 8, img_side=side))

    monkeypatch.setenv("T2V_PIPELINE_THREAD", "0")
    ref = scorer.batch_forward(data, batch_size=8)
    monkeypatch.setenv("T2V_PIPELINE_THREAD", "1")
    out = scorer.batch_forward(data, batch_size=8)
    np.testing.assert_array_equal(out, ref)


def test_staged_deep_pipeline_envs(scorer, monkeypatch):
    """Depth/prep-ahead overrides (incl. a ring smaller than the chunk
    count by several laps) keep results identical."""
    rng = np.random.default_rng(2)
    data = _dataset(rng, 96)

    monkeypatch.setenv("T2V_PIPELINE_THREAD", "0")
    ref = scorer.batch_forward(data, batch_size=8)
    for depth, ahead in ((1, 1), (2, 3), (6, 2)):
        monkeypatch.setenv("T2V_PIPELINE_THREAD", "1")
        monkeypatch.setenv("T2V_PIPELINE_DEPTH", str(depth))
        monkeypatch.setenv("T2V_PIPELINE_PREP_AHEAD", str(ahead))
        out = scorer.batch_forward(data, batch_size=8)
        np.testing.assert_array_equal(out, ref)


def test_ramp_plan_covers_and_orders():
    plan = Score._chunk_plan(1000, 128)
    assert plan[0][0] == 0 and plan[-1][1] == 1000
    for (a, b), (c, d) in zip(plan, plan[1:]):
        assert b == c and a < b
    # default ramp splits the head of the stream into 32/32/64
    sizes = [b - a for a, b in plan]
    assert sizes[:3] == [32, 32, 64]

    # no ramp when the dataset fits one chunk or batch is small
    assert Score._chunk_plan(100, 128) == [(0, 100)]
    sizes_small = [b - a for a, b in Score._chunk_plan(100, 16)]
    assert sizes_small == [16] * 6 + [4]


def test_ramp_applies_in_staged_run(scorer, monkeypatch):
    """Ramp sub-chunks must land rows in the right place. Different chunk
    sizes compile different bucket programs (different fusion orders), so
    this is allclose rather than bit-equal — a misrouted row would be off
    by O(1), not O(1e-6)."""
    rng = np.random.default_rng(3)
    data = _dataset(rng, 40)
    monkeypatch.setenv("T2V_PIPELINE_THREAD", "0")
    ref = scorer.batch_forward(data, batch_size=8)
    monkeypatch.setenv("T2V_PIPELINE_THREAD", "1")
    monkeypatch.setenv("T2V_PIPELINE_RAMP", "2,2,4")
    out = scorer.batch_forward(data, batch_size=8)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_on_drain_callback_monotonic(scorer, monkeypatch):
    rng = np.random.default_rng(4)
    data = _dataset(rng, 48)
    seen = []
    monkeypatch.setenv("T2V_PIPELINE_THREAD", "1")
    scorer.batch_forward(data, batch_size=8, on_drain=seen.append)
    assert seen == sorted(seen) and seen[-1] == 48


# full-fidelity suite: run with plain `pytest`; the quick tier
# (`pytest -m 'not slow'`, ~2 min) covers the API/data/ops layers
pytestmark = pytest.mark.slow
