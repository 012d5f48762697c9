"""Dataset-class tests over synthetic on-disk fixtures (no downloads)."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from t2v_metrics_tpu.benchmarks import datasets as ds
from t2v_metrics_tpu.benchmarks.stats import get_winoground_acc, get_winoground_scores


def _img(path):
    Image.fromarray(np.random.default_rng(0).integers(
        0, 255, (16, 16, 3), dtype=np.uint8)).save(path)


@pytest.fixture()
def winoground_dir(tmp_path):
    root = tmp_path
    d = root / "winoground"
    (d / "images").mkdir(parents=True)
    rows = []
    examples = []
    tags = {}
    for i in range(4):
        _img(d / "images" / f"ex_{i}_img_0.png")
        _img(d / "images" / f"ex_{i}_img_1.png")
        rows.append({"id": i, "image_0": f"images/ex_{i}_img_0.png",
                     "image_1": f"images/ex_{i}_img_1.png",
                     "caption_0": f"cap0 {i}", "caption_1": f"cap1 {i}"})
        examples.append({"id": i, "num_main_preds": 1 + i % 2,
                         "collapsed_tag": "Relation" if i % 2 else "Object"})
        tags[str(i)] = ["Unusual Image"] if i == 0 else []
    import pandas as pd

    pd.DataFrame(rows).to_csv(d / "metadata.csv", index=False)
    with open(d / "examples.jsonl", "w") as f:
        for ex in examples:
            f.write(json.dumps(ex) + "\n")
    json.dump(tags, open(d / "why_winoground_hard.json", "w"))
    return str(root)


def test_winoground(winoground_dir):
    w = ds.Winoground(root_dir=winoground_dir)
    assert len(w) == 4
    item = w[0]
    assert len(item["images"]) == 2 and len(item["texts"]) == 2
    assert os.path.exists(item["images"][0])

    rng = np.random.default_rng(1)
    scores = rng.random((4, 2, 2))
    results = w.evaluate_scores(scores)
    expect = get_winoground_acc(get_winoground_scores(scores))
    assert results["all"] == expect
    assert "Object" in results and "1 Main Pred" in results


def test_eqben(tmp_path):
    base = tmp_path / "eqben_vllm"
    (base / "images" / "eqbensd").mkdir(parents=True)
    (base / "images" / "eqbenag").mkdir(parents=True)
    meta = []
    for i, sub in enumerate(["eqbensd", "eqbenag"]):
        _img(base / "images" / sub / f"a{i}.png")
        _img(base / "images" / sub / f"b{i}.png")
        meta.append({"image0": f"{sub}/a{i}.png", "image1": f"{sub}/b{i}.png",
                     "caption0": "c0", "caption1": "c1"})
    json.dump(meta, open(base / "all_select.json", "w"))
    e = ds.EqBen_Mini(root_dir=str(tmp_path))
    assert len(e) == 2
    assert e.subset_indices["eqbensd"] == [0]
    scores = np.random.default_rng(0).random((2, 2, 2))
    res = e.evaluate_scores(scores)
    assert "eqbensd" in res and "all" in res


def test_naturalbench(tmp_path):
    d = tmp_path / "NaturalBench-Retrieval" / "images"
    d.mkdir(parents=True)
    meta = []
    for i in range(3):
        _img(d / f"i{i}_0.png")
        _img(d / f"i{i}_1.png")
        meta.append({"index": i, "image_0": f"i{i}_0.png",
                     "image_1": f"i{i}_1.png",
                     "caption_0": "x", "caption_1": "y"})
    json.dump(meta, open(tmp_path / "NaturalBench-Retrieval" / "metadata.json", "w"))
    n = ds.NaturalBench_Retrieval(root_dir=str(tmp_path))
    assert len(n) == 3
    res = n.evaluate_scores(np.random.default_rng(0).random((3, 2, 2)))
    assert set(res["all"]) == {"text", "image", "group"}


def test_genai_bench_image(tmp_path, monkeypatch):
    root = tmp_path
    d = root / "GenAI-Image-1600"
    prompts = {f"{i:05d}": {"prompt": f"prompt {i}",
                            "models": {m: [3 + (i % 3), 4]
                                       for m in ds.GenAIBench_Image.MODELS}}
               for i in range(4)}
    for m in ds.GenAIBench_Image.MODELS:
        (d / m).mkdir(parents=True)
        for p in prompts:
            _img(d / m / f"{p}.jpeg")
    json.dump(prompts, open(d / "genai_image.json", "w"))
    json.dump({"basic": [0, 1], "advanced": [2, 3]},
              open(d / "genai_skills.json", "w"))

    g = ds.GenAIBench_Image(root_dir=str(root), num_prompts=1600)
    assert len(g) == 4 * 6
    item = g[0]
    assert len(item["images"]) == 1

    rng = np.random.default_rng(2)
    scores = rng.random((24, 1, 1))
    res = g.evaluate_scores(scores)
    assert "alignment" in res and "pairwise_acc" in res["alignment"]
    skill = g.evaluate_scores_per_skill(scores)
    assert set(skill) == {"basic", "advanced"}


def test_pickapic(tmp_path):
    root = tmp_path
    d = root / "pickapic_v1"
    (d / "imgs").mkdir(parents=True)
    n_total = max(ds.Pickapic_v1.SELECTED_IDXS) + 1
    all_data = []
    for i in range(n_total):
        all_data.append({"id": i, "caption": f"c{i}",
                         "label_0": int(i % 2 == 0), "label_1": int(i % 2 == 1),
                         "image_0": "imgs/a.png", "image_1": "imgs/b.png"})
    _img(d / "imgs" / "a.png")
    _img(d / "imgs" / "b.png")
    json.dump(all_data, open(d / "test_captions.json", "w"))
    p = ds.Pickapic_v1(root_dir=str(root))
    assert len(p) == 100
    scores = np.zeros((100, 2, 1))
    scores[:, 0, 0] = 1.0  # always prefer image_0
    acc, probs = p.evaluate_scores(scores)
    expected = np.mean([d_["label_0"] == 1 for d_ in p.dataset])
    np.testing.assert_allclose(acc, expected)


def test_genai_ranking_correlation_math(tmp_path):
    d = tmp_path / "GenAI-Image-Ranking-800"
    (d / "DALLE_3").mkdir(parents=True)
    prompts = {}
    for i in range(3):
        pid = f"{i:05d}"
        prompts[pid] = {"id": pid, "prompt": f"p{i}",
                        "models": {"DALLE_3": {str(j): [float(j % 5 + 1)]
                                               for j in range(1, 10)}}}
        for j in range(1, 10):
            _img(d / "DALLE_3" / f"{int(pid):05d}_{j:02d}.jpeg")
    json.dump(prompts, open(d / "human_rating.json", "w"))
    g = ds.GenAIBench_Ranking(root_dir=str(tmp_path), gen_model="DALLE_3")
    assert len(g) == 27
    # scores proportional to human -> perfect ranking accuracy
    scores = np.array([[ [im["human_score"] / 5.0] ] for im in g.images])
    res = g.evaluate_scores(scores)
    assert res["ranking_accuracy"].mean() == 1.0


def test_tifa160(tmp_path):
    import pandas as pd

    os.makedirs(tmp_path / "tifa160", exist_ok=True)
    # synthetic datasets/ files
    dsdir = tmp_path / "datasets"
    dsdir.mkdir()
    keys = ["0_mini_dalle", "1_mini_dalle"]
    dataset = {k: {"text": f"t{k}", "text_id": k.split("_")[0],
                   "image_path": f"{k}.jpg"} for k in keys}
    json.dump(dataset, open(dsdir / "tifa160.json", "w"))
    anns = pd.DataFrame({
        "model_type": ["mini-dalle", "mini-dalle", "mini-dalle"],
        "source_id": ["0", "0", "1"],
        "answer": [3, 5, 2],
    })
    anns.to_csv(dsdir / "dsg_tifa160_anns.csv", index=False)
    for k in keys:
        _img(tmp_path / "tifa160" / f"{k}.jpg")

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        t = ds.TIFA160_DSG(root_dir=str(tmp_path), download=False)
        assert len(t) == 2
        assert t.dsg_items["0_mini_dalle"]["human_avg"] == 4.0
        scores = np.array([[[0.9]], [[0.2]]])
        res = t.evaluate_scores(scores)
        assert "pearson_no_grouping" in res
    finally:
        os.chdir(cwd)


def test_missing_data_raises(tmp_path):
    with pytest.raises(RuntimeError):
        ds.ensure_downloaded(str(tmp_path / "nope"),
                             lambda: None, "TestData")


def test_video_utils_and_fastchat(tmp_path):
    """Legacy aux surface: clip sampling math, Apollo budget, conversation
    templates."""
    from t2v_metrics_tpu.media import video_utils as vu
    from t2v_metrics_tpu.models import fastchat_utils as fc

    clip_idx, all_idx, ts = vu.calculate_sample_indices(
        clip_duration=2.0, frames_per_clip=4, total_frames=120,
        original_fps=30.0, video_duration=4.0)
    assert len(clip_idx) == 2
    assert all(len(c) == 4 for c in clip_idx)
    assert max(all_idx) < 120
    assert len(ts) == 2 and ts[0][0] <= ts[0][1]

    loader = vu.ApolloMMLoader(clip_duration=2.0, frames_per_clip=4,
                               num_repeat_token=16, model_max_length=64)
    # long video must be subsampled to fit the token budget
    assert loader.effective_sampling_ratio(1000.0) < 0.01

    sq = vu.pad_to_center_square(np.zeros((10, 20, 3), np.uint8), (5, 5, 5))
    assert sq.shape == (1, 20, 20, 3)
    assert sq[0, 0, 0, 0] == 5

    conv = fc.get_conv_template("internvl2_5")
    conv.append_message(conv.roles[0], "hello <image>")
    conv.append_message(conv.roles[1], None)
    prompt = conv.get_prompt()
    assert prompt.endswith("<|im_start|>assistant\n")
    assert "hello <image><|im_end|>" in prompt
    assert fc.get_conv_template("Hermes-2").stop_str == "<|endoftext|>"
