"""Statistics golden tests: our vectorized implementations vs the reference
modules (imported directly from /root/reference — pure numpy, no GPU)."""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/reference")

from t2v_metrics_tpu.benchmarks import stats

ref_tau = pytest.importorskip("tau_optimization")


def _ref_kendall():
    import importlib
    import dataset as ref_dataset  # /root/reference/dataset.py
    return ref_dataset


@pytest.fixture(scope="module")
def ref_ds():
    return _ref_kendall()


@pytest.mark.parametrize("variant", ["b", "c", "23", "acc23"])
def test_kendall_variants_match_reference(ref_ds, variant):
    rng = np.random.default_rng(0)
    for trial in range(5):
        n = 20
        gold = rng.integers(0, 5, n).astype(float)
        metric = rng.random(n)
        if trial % 2:  # introduce metric ties
            metric = np.round(metric, 1)
        ours = stats.kendall_variants(gold, metric, variant=variant)[0]
        ref = ref_ds.KendallVariants(gold, metric, variant=variant)[0]
        np.testing.assert_allclose(ours, ref, atol=1e-12)


def test_kendall_epsilon_matches_reference(ref_ds):
    rng = np.random.default_rng(1)
    gold = rng.integers(0, 3, 30).astype(float)
    metric = rng.random(30)
    for eps in [0.05, 0.2]:
        ours = stats.kendall_variants(gold, metric, variant="acc23", epsilon=eps)[0]
        ref = ref_ds.KendallVariants(gold, metric, variant="acc23", epsilon=eps)[0]
        np.testing.assert_allclose(ours, ref, atol=1e-12)


@pytest.mark.parametrize("fn_name", ["tau_23", "acc_23", "acc_ignore_tie"])
def test_tau_optimization_matches_reference(fn_name):
    rng = np.random.default_rng(2)
    metric = rng.random((6, 8))
    human = rng.integers(0, 4, (6, 8)).astype(float)
    ours = stats.tau_optimization(metric, human, fn_name)
    ref = ref_tau.tau_optimization(metric, human,
                                   getattr(ref_tau.TauSufficientStats, fn_name))
    np.testing.assert_allclose(ours.best_tau, ref.best_tau, atol=1e-12)
    np.testing.assert_allclose(ours.best_threshold, ref.best_threshold, atol=1e-12)
    np.testing.assert_allclose(ours.taus, ref.taus, atol=1e-12)
    np.testing.assert_allclose(ours.thresholds, ref.thresholds, atol=1e-12)


def test_tau_optimization_vector_input():
    rng = np.random.default_rng(3)
    metric = rng.random(15)
    human = rng.integers(0, 3, 15).astype(float)
    ours = stats.tau_optimization(metric, human, "acc_23")
    ref = ref_tau.tau_optimization(metric, human, ref_tau.TauSufficientStats.acc_23)
    np.testing.assert_allclose(ours.best_tau, ref.best_tau, atol=1e-12)


def test_calc_metric_variants(ref_ds):
    rng = np.random.default_rng(4)
    gold = rng.integers(0, 5, (4, 6)).astype(float)
    metric = rng.random((4, 6))
    for variant in ["pairwise_acc_with_tie_optimization",
                    "tau_with_tie_optimization", "pairwise_acc_ignore_tie"]:
        ours = stats.calc_metric(gold, metric, variant=variant)
        ref = ref_ds.calc_metric(gold, metric, variant=variant)
        np.testing.assert_allclose(ours[0], ref[0], atol=1e-12)
        np.testing.assert_allclose(ours[1], ref[1], atol=1e-12)
    for variant in ["tau_b", "tau_c"]:
        ours = stats.calc_metric(gold, metric, variant=variant)
        ref = ref_ds.calc_metric(gold, metric, variant=variant)
        np.testing.assert_allclose(ours, ref, atol=1e-12)


def test_winoground_acc(ref_ds):
    rng = np.random.default_rng(5)
    scores = rng.random((10, 2, 2))
    ours = stats.get_winoground_acc(stats.get_winoground_scores(scores))
    ref = ref_ds.get_winoground_acc(ref_ds.get_winoground_scores(scores))
    assert ours == ref


def test_pearson(ref_ds):
    rng = np.random.default_rng(6)
    a, b = rng.random(50), rng.random(50)
    np.testing.assert_allclose(stats.calc_pearson(a, b),
                               ref_ds.calc_pearson(a, b), atol=1e-12)
