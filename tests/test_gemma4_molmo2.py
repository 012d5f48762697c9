"""Contract tests for the Gemma 4 and Molmo2 adapters.

No public HF implementations exist for either family (see
models/gemma4.py / models/molmo2.py docstrings), so these assert the
reference adapters' OBSERVABLE contracts on tiny random weights:
end-aligned rollout scoring, thinking-block stripping, native-video
passthrough, registry parity.
"""

import numpy as np
import pytest

import t2v_metrics_tpu as t2v
from t2v_metrics_tpu.models.generation import score_rollout


@pytest.fixture(scope="module")
def image(tmp_path_factory):
    from PIL import Image

    p = tmp_path_factory.mktemp("assets") / "img.png"
    rng = np.random.default_rng(0)
    Image.fromarray(rng.integers(0, 255, (64, 96, 3), dtype=np.uint8)).save(p)
    return str(p)


@pytest.fixture(scope="module")
def video(tmp_path_factory):
    import cv2

    p = str(tmp_path_factory.mktemp("assets") / "vid.mp4")
    vw = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"mp4v"), 10.0, (64, 48))
    rng = np.random.default_rng(1)
    for _ in range(10):
        vw.write(rng.integers(0, 255, (48, 64, 3), dtype=np.uint8))
    vw.release()
    return p


def test_registry_parity():
    names = set(t2v.list_all_models())
    assert {"gemma-4-12b-it", "gemma-4-31b-it",
            "molmo2-4b", "molmo2-7b", "molmo2-8b"} <= names


@pytest.mark.parametrize("name", ["gemma-4-test", "molmo2-test"])
def test_score_contract(name, image):
    scorer = t2v.VQAScore(model=name)
    s = scorer(images=[image], texts=["a photo"])
    assert s.shape == (1, 1) and 0.0 <= float(s[0, 0]) <= 1.0
    m = scorer(images=[image, image], texts=["a cat", "a dog"])
    assert m.shape == (2, 2)


@pytest.mark.parametrize("name", ["gemma-4-test", "molmo2-test"])
def test_video_and_generate(name, image, video):
    scorer = t2v.VQAScore(model=name)
    sv = scorer(images=[video], texts=["a moving scene"])
    assert sv.shape == (1, 1) and 0.0 <= float(sv[0, 0]) <= 1.0
    out = scorer.model.generate(images=[image], texts=["Describe."],
                                max_new_tokens=4)
    assert isinstance(out[0], str)


def test_score_rollout_end_alignment():
    """The reference rule (gemma4_model.py:185-228): answer scored from the
    END of the rollout, one-step offset when the last token is special."""
    v = np.zeros(16, np.float32)

    def dist(tok, p):
        d = v.copy()
        d[tok] = p
        d[0] = 1.0 - p
        return d

    # rollout: [think, think, YES(7), eos(1)]; answer = [7]; eos special
    dists = [dist(3, .9), dist(4, .9), dist(7, .8), dist(1, .9)]
    gen = [3, 4, 7, 1]
    p = score_rollout(dists, gen, [7], special_ids={1})
    assert abs(p - 0.8) < 1e-6
    # no trailing special: score the last step directly
    p2 = score_rollout(dists[:3], [3, 4, 7], [7], special_ids={1})
    assert abs(p2 - 0.8) < 1e-6
    # multi-token answer [5, 7] with eos offset -> positions -3, -2
    dists3 = [dist(5, .5), dist(7, .25), dist(1, .9)]
    p3 = score_rollout(dists3, [5, 7, 1], [5, 7], special_ids={1})
    assert abs(p3 - (0.5 * 0.25) ** 0.5) < 1e-6


def test_gemma4_parse_response():
    from t2v_metrics_tpu.models.gemma4 import parse_response

    assert parse_response("<think>hmm</think>Yes") == "Yes"
    assert parse_response("plain answer") == "plain answer"
    assert parse_response("<|channel|>thought\nblah<|channel|>Yes") == "Yes"


def test_molmo2_native_video_passthrough(video):
    """Videos reach the adapter as raw paths (reference
    molmo2_model.py:80-101): load_images must not transform them."""
    scorer = t2v.VQAScore(model="molmo2-test")
    assert scorer.model.load_images([video]) == [video]
    assert scorer.model.allows_video


@pytest.mark.parametrize("name", ["gemma-4-test", "molmo2-test"])
def test_batched_rollout_scoring_matches_sequential(name, image, video):
    """The batched rollout scorer (gathered answer probs in the device
    loop) must match the per-pair rollout scores."""
    scorer = t2v.VQAScore(model=name)
    ad = scorer.model
    imgs = [image, video, image]
    txts = ["a cat", "a moving scene", "a dog"]
    # a random model can emit eos as its very first token, in which case
    # the (reference-matching) scorer raises — both paths must agree on
    # either the score or that rejection, per sample
    def run(fn):
        try:
            return float(fn()[0])
        except ValueError as e:
            return str(e)

    seq = [run(lambda i=i, t=t: ad.forward([i], [t], max_new_tokens=4))
           for i, t in zip(imgs, txts)]
    try:
        batched = list(ad.forward(imgs, txts, max_new_tokens=4))
    except ValueError as e:
        # batched raises as a unit; every sequential sample must have the
        # same rejection for the comparison to be meaningful
        assert any(isinstance(s, str) for s in seq)
        return
    for b, s_ in zip(batched, seq):
        assert not isinstance(s_, str), "sequential rejected, batched scored"
        np.testing.assert_allclose(b, s_, rtol=2e-5, atol=2e-7)


def test_checkpoint_dims_guard():
    """Provisional-dims families must reject a checkpoint whose shapes
    disagree with the registry config, with a readable per-leaf report
    (models/checkpoint.py:validate_params_dims)."""
    import jax
    import pytest
    from t2v_metrics_tpu.models import molmo2 as m2
    from t2v_metrics_tpu.models.checkpoint import validate_params_dims

    cfg = m2.MOLMO2_MODELS["molmo2-test"]["config"]
    params = m2.init_molmo2(jax.random.PRNGKey(0), cfg)
    expected = jax.eval_shape(lambda: m2.init_molmo2(jax.random.PRNGKey(0),
                                                     cfg))
    validate_params_dims(params, expected, "molmo2-test")  # clean pass

    import jax.numpy as jnp
    bad = dict(params)
    bad["connector"] = dict(params["connector"])
    bad["connector"]["fc1"] = {"w": jnp.zeros((7, 7)), "b": jnp.zeros((7,))}
    del bad["decoder"]["blocks"][0]["attn"]["q_norm"]
    with pytest.raises(ValueError) as ei:
        validate_params_dims(bad, expected, "molmo2-test", provisional=True)
    msg = str(ei.value)
    assert "shape mismatch" in msg and "connector/fc1/w" in msg
    assert "missing" in msg and "q_norm" in msg
    assert "PROVISIONAL" in msg


# full-fidelity suite: run with plain `pytest`; the quick tier
# (`pytest -m 'not slow'`, ~2 min) covers the API/data/ops layers
pytestmark = pytest.mark.slow
