"""Behavioral tests for the Gemma3 and PaliGemma adapters (tiny random
weights): image + video scoring, concat routing, matrix consistency."""

import numpy as np
import pytest
from PIL import Image

import t2v_metrics_tpu as t2v


@pytest.fixture(scope="module")
def media(tmp_path_factory):
    d = tmp_path_factory.mktemp("media")
    rng = np.random.default_rng(0)
    img = str(d / "img.png")
    Image.fromarray(rng.integers(0, 255, (40, 56, 3), dtype=np.uint8)).save(img)
    import cv2
    vid = str(d / "vid.mp4")
    vw = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"mp4v"), 10.0, (64, 48))
    for _ in range(15):
        vw.write(rng.integers(0, 255, (48, 64, 3), dtype=np.uint8))
    vw.release()
    return img, vid


def test_registry_lists_gemma_models():
    models = t2v.list_all_models()
    assert "gemma-3-4b-it" in models
    assert "paligemma-3b-mix-448" in models


@pytest.fixture(scope="module")
def gemma(media):
    return t2v.VQAScore(model="gemma-3-test")


@pytest.fixture(scope="module")
def pali(media):
    return t2v.VQAScore(model="paligemma-test")


def test_gemma3_image_scoring(gemma, media):
    img, _ = media
    s = gemma(images=[img], texts=["a cat"])
    assert s.shape == (1, 1)
    assert 0.0 <= s[0, 0] <= 1.0


def test_gemma3_video_interleaved_frames(gemma, media):
    _, vid = media
    s = gemma(images=[vid], texts=["a moving blob"], num_frames=3)
    assert s.shape == (1, 1)
    assert 0.0 <= s[0, 0] <= 1.0


def test_gemma3_matrix(gemma, media):
    img, _ = media
    full = gemma(images=[img, img], texts=["cat", "dog"])
    assert full.shape == (2, 2)
    np.testing.assert_allclose(full[0], full[1], rtol=1e-4)


def test_paligemma_image_scoring(pali, media):
    img, _ = media
    s = pali(images=[img], texts=["a cat"])
    assert s.shape == (1, 1)
    assert 0.0 <= s[0, 0] <= 1.0


def test_paligemma_video_concat_routing(pali, media):
    """video_mode='concat': videos become horizontal frame concats."""
    _, vid = media
    s = pali(images=[vid], texts=["a blob"], num_frames=3)
    assert s.shape == (1, 1)
    assert 0.0 <= s[0, 0] <= 1.0


# full-fidelity suite: run with plain `pytest`; the quick tier
# (`pytest -m 'not slow'`, ~2 min) covers the API/data/ops layers
pytestmark = pytest.mark.slow
