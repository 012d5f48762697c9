"""Behavioral API suite — port of the reference's test.py contract
(reference test.py:106-144: shape (M,N), scores in [0,1], multi-pair
consistency) using tiny random-weight models, plus TPU-specific checks
(matrix path == pairwise path)."""

import numpy as np
import pytest
from PIL import Image

import t2v_metrics_tpu as t2v


@pytest.fixture(scope="module")
def img_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(3):
        p = d / f"img{i}.png"
        Image.fromarray(rng.integers(0, 255, (64, 48, 3), dtype=np.uint8)).save(p)
        paths.append(str(p))
    return paths


@pytest.fixture(scope="module")
def vqa(img_files):
    return t2v.VQAScore(model="clip-flant5-test")


@pytest.fixture(scope="module")
def clipscore():
    return t2v.CLIPScore(model="clipscore-test")


def test_list_all_models():
    models = t2v.list_all_models()
    assert "clip-flant5-test" in models
    assert "clip-flant5-xxl" in models
    assert "clipscore-test" in models
    assert "openai:ViT-B-32" in models


def test_single_pair_shape_and_range(vqa, img_files):
    scores = vqa(images=[img_files[0]], texts=["a photo of a cat"])
    assert scores.shape == (1, 1)
    assert 0.0 <= scores[0, 0] <= 1.0


def test_singleton_normalization(vqa, img_files):
    s1 = vqa(images=img_files[0], texts="a dog")
    s2 = vqa(images=[img_files[0]], texts=["a dog"])
    assert s1.shape == s2.shape == (1, 1)
    np.testing.assert_allclose(s1, s2, rtol=1e-5)


def test_multi_pair_matrix(vqa, img_files):
    scores = vqa(images=img_files[:2], texts=["a cat", "a dog sitting"])
    assert scores.shape == (2, 2)
    assert np.all(scores >= 0) and np.all(scores <= 1)


def test_matrix_matches_independent_calls(vqa, img_files):
    """score(imgs, texts)[i,j] must equal score([img_i],[text_j])."""
    texts = ["a cat", "a dog"]
    full = vqa(images=img_files[:2], texts=texts)
    for i in range(2):
        for j in range(2):
            single = vqa(images=[img_files[i]], texts=[texts[j]])
            np.testing.assert_allclose(full[i, j], single[0, 0], rtol=1e-4,
                                       atol=1e-6)


def test_question_answer_templates(vqa, img_files):
    s_default = vqa(images=[img_files[0]], texts=["a cat"])
    s_custom = vqa(images=[img_files[0]], texts=["a cat"],
                   question_template='Is this "{}"?',
                   answer_template="Yes")
    assert s_default.shape == s_custom.shape
    # different prompts -> different scores (with overwhelming probability)
    assert abs(float(s_default[0, 0]) - float(s_custom[0, 0])) > 1e-9


def test_visualgptscore_mode(vqa, img_files):
    """P(caption|image) mode: question_template='', answer_template='{}'
    (reference V_3.0_README.md:209-233)."""
    s = vqa(images=[img_files[0]], texts=["a cat on a mat"],
            question_template="", answer_template="{}")
    assert s.shape == (1, 1)
    assert 0.0 <= s[0, 0] <= 1.0


def test_batch_forward(vqa, img_files):
    class DS:
        def __init__(self, files):
            self.files = files

        def __len__(self):
            return 3

        def __getitem__(self, i):
            return {"images": [self.files[i % len(self.files)]],
                    "texts": ["text a", "text b"]}

    scores = vqa.batch_forward(DS(img_files), batch_size=2)
    assert scores.shape == (3, 1, 2)
    assert np.all(scores >= 0) and np.all(scores <= 1)


def test_clipscore_matrix(clipscore, img_files):
    scores = clipscore(images=img_files[:2], texts=["a cat", "a dog", "x"])
    assert scores.shape == (2, 3)
    assert np.all(scores >= -1) and np.all(scores <= 1)


def test_clipscore_matches_independent(clipscore, img_files):
    texts = ["a cat", "a dog"]
    full = clipscore(images=img_files[:2], texts=texts)
    single = clipscore(images=[img_files[1]], texts=[texts[0]])
    np.testing.assert_allclose(full[1, 0], single[0, 0], rtol=1e-4, atol=1e-6)


def test_get_score_model(img_files):
    scorer = t2v.get_score_model("clip-flant5-test")
    assert isinstance(scorer, t2v.VQAScore)
    scorer2 = t2v.get_score_model("clipscore-test")
    assert isinstance(scorer2, t2v.CLIPScore)


def test_unknown_model_raises():
    with pytest.raises((ValueError, AssertionError)):
        t2v.VQAScore(model="no-such-model")


def test_numpy_array_input(vqa):
    rng = np.random.default_rng(1)
    arr = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
    s = vqa(images=[arr], texts=["a blob"])
    assert s.shape == (1, 1)
