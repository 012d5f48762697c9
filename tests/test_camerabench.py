"""CameraBench harness tests: Stage-2 evaluators on canned JSON (the
documented offline-test contract), mini end-to-end Stage 1, caption
metrics sanity."""

import json

import numpy as np
import pytest

from t2v_metrics_tpu.camerabench import binary_classification_evaluation as bce
from t2v_metrics_tpu.camerabench import binary_classification_vlm_scores as bcs
from t2v_metrics_tpu.camerabench import vqa_and_retrieval_evaluation as vre
from t2v_metrics_tpu.camerabench import caption_evaluation as ce


def test_binary_eval_on_canned_scores(tmp_path):
    scores = {
        "metadata": {"model_name": "m", "split_name": "pan_left"},
        "scores": [
            {"video_path": "a.mp4", "question": "q", "ground_truth_label": "Yes",
             "method": "m", "score": 0.9, "error": None},
            {"video_path": "b.mp4", "question": "q", "ground_truth_label": "No",
             "method": "m", "score": 0.1, "error": None},
            {"video_path": "c.mp4", "question": "q", "ground_truth_label": "Yes",
             "method": "m", "score": 0.8, "error": None},
            {"video_path": "d.mp4", "question": "q", "ground_truth_label": "No",
             "method": "m", "score": 0.7, "error": "decode failed"},  # skipped
        ],
    }
    f = tmp_path / "classification_scores_m_pan_left.json"
    json.dump(scores, open(f, "w"))
    result = bce.evaluate_single_file(str(f), quiet=True)
    assert result["num_samples"] == 3  # error entry excluded
    assert result["average_precision"] == 1.0  # perfectly separable
    assert result["roc_auc"] == 1.0
    assert bce.discover_score_files(tmp_path) == [f]


def test_vqa_retrieval_eval_on_canned_scores(tmp_path):
    def entry(yes, no, error=None):
        keys = ("pos_text_pos_image", "pos_text_neg_image",
                "neg_text_pos_image", "neg_text_neg_image")
        return {"pos_video": "p.mp4", "neg_video": "n.mp4",
                "pos_question": "q+", "neg_question": "q-", "method": "m",
                "yes_scores": dict(zip(keys, yes)),
                "no_scores": dict(zip(keys, no)), "error": error}

    # perfect sample: yes wins where it should, no wins where it should
    perfect = entry([0.9, 0.1, 0.1, 0.9], [0.1, 0.9, 0.9, 0.1])
    # fully wrong sample
    wrong = entry([0.1, 0.9, 0.9, 0.1], [0.9, 0.1, 0.1, 0.9])
    data = {"metadata": {"model_name": "m", "skill_name": "motion"},
            "scores": [perfect, wrong]}
    f = tmp_path / "vqa_retrieval_scores_m_motion.json"
    json.dump(data, open(f, "w"))
    result = vre.evaluate_single_file(str(f), quiet=True)
    assert result["vqa"]["binary_acc"] == 0.5
    assert result["vqa"]["question_acc"] == 0.5
    # retrieval from yes-scores: perfect passes, wrong fails
    assert result["retrieval"]["text"] == 0.5
    assert result["retrieval"]["image"] == 0.5
    assert result["retrieval"]["group"] == 0.5


def test_stage1_end_to_end(tmp_path):
    """Mini Stage-1 run: tiny Qwen model over a synthetic video split."""
    import cv2

    rng = np.random.default_rng(0)
    vid = tmp_path / "videos" / "v0.mp4"
    vid.parent.mkdir()
    vw = cv2.VideoWriter(str(vid), cv2.VideoWriter_fourcc(*"mp4v"), 10.0, (64, 48))
    for _ in range(12):
        vw.write(rng.integers(0, 255, (48, 64, 3), dtype=np.uint8))
    vw.release()

    data = [
        {"image": "v0.mp4", "question": "Does the camera pan left?", "label": "Yes"},
        {"image": "missing.mp4", "question": "Does it zoom?", "label": "No"},
    ]
    results = bcs.generate_vqa_scores(data, "qwen2.5-vl-test",
                                      str(tmp_path / "videos"))
    assert results[0]["error"] is None
    assert 0.0 <= results[0]["score"] <= 1.0
    assert results[1]["error"] is not None and results[1]["score"] == 0.0

    out = tmp_path / "classification_scores_test_split.json"
    bcs.save_scores(results, out, {"model_name": "qwen2.5-vl-test",
                                   "split_name": "split"})
    ev = bce.evaluate_single_file(str(out), quiet=True)
    assert ev["num_samples"] == 1


class TestCaptionMetrics:
    def test_identical_caption_scores_high(self):
        c = "the camera pans left across the room"
        assert ce.bleu_2(c, [c]) == pytest.approx(1.0)
        assert ce.rouge_l(c, [c]) == pytest.approx(1.0)
        assert ce.meteor(c, [c]) == pytest.approx(0.9995, abs=1e-3)
        assert ce.spice_like(c, [c]) == pytest.approx(1.0)

    def test_unrelated_caption_scores_low(self):
        c = "a dog eats breakfast"
        r = ["the camera zooms out quickly"]
        assert ce.bleu_2(c, r) == 0.0
        assert ce.rouge_l(c, r) < 0.2
        assert ce.spice_like(c, r) == 0.0

    def test_cider_ranks_match_higher(self):
        # distinct reference docs so idf > 0 (idf is 0 for n-grams present
        # in every reference set — standard CIDEr behavior)
        cands = ["camera pans left", "dog eats food"]
        refs = [["camera pans left slowly"], ["a bird flies over water"]]
        scores = ce.cider(cands, refs)
        assert scores[0] > scores[1]
        assert scores[0] > 0

    def test_evaluate_captions(self):
        entries = [
            {"generated_caption": "camera pans left",
             "reference_caption": "camera pans left", "error": None},
            {"generated_caption": None, "reference_caption": "x",
             "error": "failed"},
        ]
        out = ce.evaluate_captions(entries)
        assert out["num_samples"] == 1
        assert out["bleu_2"] > 0.9

    def test_judge_with_mock_client(self):
        import types

        class C:
            class chat:
                class completions:
                    @staticmethod
                    def create(**kw):
                        msg = types.SimpleNamespace(content="85")
                        return types.SimpleNamespace(
                            choices=[types.SimpleNamespace(message=msg)])

        assert ce.gpt4o_judge("a", "b", client=C()) == 0.85


def test_caption_generation_end_to_end(tmp_path):
    """caption_generation with the tiny Qwen model over a synthetic video."""
    import json
    import cv2
    from t2v_metrics_tpu.camerabench import caption_generation as cg

    rng = np.random.default_rng(3)
    vids = tmp_path / "videos"
    vids.mkdir()
    vw = cv2.VideoWriter(str(vids / "v.mp4"),
                         cv2.VideoWriter_fourcc(*"mp4v"), 10.0, (64, 48))
    for _ in range(10):
        vw.write(rng.integers(0, 255, (48, 64, 3), dtype=np.uint8))
    vw.release()

    assert cg.parse_model_spec("m:ckpt") == ("m", "ckpt")
    assert cg.parse_model_spec("m") == ("m", None)

    samples = [{"video": "v.mp4", "caption": "a moving blob"},
               {"video": "missing.mp4", "caption": "x"}]
    results = cg.generate_captions(samples, "qwen2.5-vl-test", str(vids),
                                   max_new_tokens=4)
    assert results[0]["error"] is None
    assert isinstance(results[0]["generated_caption"], str)
    assert results[1]["error"] is not None
