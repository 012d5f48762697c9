"""End-to-end CLI test: genai_image_eval on a synthetic GenAI-Bench fixture
with the tiny CLIP-FlanT5 model (exercises batch_forward, caching, skill
tables, correlation)."""

import json
import sys

import numpy as np
import pytest
from PIL import Image

from t2v_metrics_tpu.benchmarks import datasets as ds


@pytest.fixture()
def genai_root(tmp_path):
    d = tmp_path / "GenAI-Image-1600"
    rng = np.random.default_rng(0)
    prompts = {f"{i:05d}": {"prompt": f"prompt {i}",
                            "models": {m: [3 + (i % 3), 4]
                                       for m in ds.GenAIBench_Image.MODELS}}
               for i in range(3)}
    for m in ds.GenAIBench_Image.MODELS:
        (d / m).mkdir(parents=True)
        for p in prompts:
            Image.fromarray(rng.integers(0, 255, (24, 24, 3), dtype=np.uint8)
                            ).save(d / m / f"{p}.jpeg")
    json.dump(prompts, open(d / "genai_image.json", "w"))
    json.dump({"basic": [0, 1], "advanced": [2],
               "attribute": [0], "scene": [1], "spatial relation": [2],
               "action relation": [0], "part relation": [1],
               "counting": [2], "comparison": [0], "differentiation": [1],
               "negation": [2], "universal": [0]},
              open(d / "genai_skills.json", "w"))
    return tmp_path


def test_genai_image_eval_cli(genai_root, tmp_path, monkeypatch, capsys):
    from t2v_metrics_tpu.cli import genai_image_eval

    result_dir = tmp_path / "results"
    argv = ["genai_image_eval",
            "--root_dir", str(genai_root),
            "--model", "clip-flant5-test",
            "--num_prompts", "1600",
            "--batch_size", "4",
            "--result_dir", str(result_dir)]
    monkeypatch.setattr(sys, "argv", argv)
    genai_image_eval.main()
    out = capsys.readouterr().out
    assert "Tag Group: overall" in out
    assert "Overall Alignment Performance" in out
    assert (result_dir / "clip-flant5-test_1600_prompts.npz").exists()
    assert (result_dir / "clip-flant5-test_1600_per_skill.json").exists()

    # second run must hit the cache
    monkeypatch.setattr(sys, "argv", argv)
    genai_image_eval.main()
    out = capsys.readouterr().out
    assert "already exists. Skipping." in out


def test_eval_cli_flags():
    from t2v_metrics_tpu.cli import eval as eval_cli

    # flags parse without executing the heavy loop
    import argparse
    assert callable(eval_cli.main)
    assert callable(eval_cli.config)
