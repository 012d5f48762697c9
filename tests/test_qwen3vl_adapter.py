"""Behavioral tests for the Qwen3-VL adapter (tiny random weights)."""

import numpy as np
import pytest
from PIL import Image

import t2v_metrics_tpu as t2v


@pytest.fixture(scope="module")
def media(tmp_path_factory):
    d = tmp_path_factory.mktemp("media")
    rng = np.random.default_rng(0)
    img = str(d / "img.png")
    Image.fromarray(rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)).save(img)
    import cv2
    vid = str(d / "vid.mp4")
    vw = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"mp4v"), 10.0, (64, 48))
    for _ in range(16):
        vw.write(rng.integers(0, 255, (48, 64, 3), dtype=np.uint8))
    vw.release()
    return img, vid


@pytest.fixture(scope="module")
def scorer():
    return t2v.VQAScore(model="qwen3-vl-test")


def test_registry():
    models = t2v.list_all_models()
    assert "qwen3-vl-8b" in models  # BASELINE config 5 model
    assert "qwen3-vl-32b" in models


def test_image_scoring(scorer, media):
    img, _ = media
    s = scorer(images=[img], texts=["a photo of a cat"])
    assert s.shape == (1, 1)
    assert 0.0 <= s[0, 0] <= 1.0


def test_video_scoring(scorer, media):
    _, vid = media
    s = scorer(images=[vid], texts=["a moving blob"])
    assert s.shape == (1, 1)
    assert 0.0 <= s[0, 0] <= 1.0


def test_matrix_and_trace(scorer, media):
    img, _ = media
    full = scorer(images=[img, img], texts=["cat", "dog"])
    assert full.shape == (2, 2)
    np.testing.assert_allclose(full[0], full[1], rtol=1e-4)

    scores, traces = scorer.model.forward_with_trace(
        [img], ["a cat"], score_position="start")
    assert len(traces) == 1
    assert "token_details" in traces[0]


# full-fidelity suite: run with plain `pytest`; the quick tier
# (`pytest -m 'not slow'`, ~2 min) covers the API/data/ops layers
pytestmark = pytest.mark.slow
