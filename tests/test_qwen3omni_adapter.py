"""Behavioral tests for the Qwen3-Omni adapter: audio-only, image+audio,
and video scoring with tiny random weights (audio-tower parity is covered
in test_qwen3omni_audio.py)."""

import wave

import numpy as np
import pytest
from PIL import Image

import t2v_metrics_tpu as t2v


@pytest.fixture(scope="module")
def media(tmp_path_factory):
    d = tmp_path_factory.mktemp("omni")
    rng = np.random.default_rng(0)
    img = str(d / "img.png")
    Image.fromarray(rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)).save(img)

    wav = str(d / "a.wav")
    sr = 16000
    tone = (0.2 * np.sin(2 * np.pi * 440 * np.arange(sr // 2) / sr)
            * 32767).astype(np.int16)
    with wave.open(wav, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(tone.tobytes())

    import cv2
    vid = str(d / "v.mp4")
    vw = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"mp4v"), 10.0, (64, 48))
    for _ in range(12):
        vw.write(rng.integers(0, 255, (48, 64, 3), dtype=np.uint8))
    vw.release()
    return img, wav, vid


@pytest.fixture(scope="module")
def scorer():
    return t2v.VQAScore(model="qwen3-omni-test")


def test_registry():
    models = t2v.list_all_models()
    assert "qwen3-omni-30b-a3b" in models
    assert "qwen3-omni-30b-a3b-thinking" in models
    assert "qwen3-omni-30b-a3b-captioner" in models


def test_image_scoring(scorer, media):
    img, _, _ = media
    s = scorer(images=[img], texts=["a photo"])
    assert s.shape == (1, 1)
    assert 0.0 <= s[0, 0] <= 1.0


def test_audio_scoring(scorer, media):
    img, wav, _ = media
    s = scorer(images=[img], texts=["a tone playing"], audio_paths=[wav])
    assert s.shape == (1, 1)
    assert 0.0 <= s[0, 0] <= 1.0
    # audio must change the score vs image-only
    s0 = scorer(images=[img], texts=["a tone playing"])
    assert abs(float(s[0, 0]) - float(s0[0, 0])) > 1e-9


def test_audio_only_scoring(scorer, media):
    _, wav, _ = media
    s = scorer.model.forward([None], ["a tone"], audio_paths=[wav])
    assert s.shape == (1,)
    assert 0.0 <= s[0] <= 1.0


def test_video_scoring(scorer, media):
    _, _, vid = media
    s = scorer(images=[vid], texts=["a moving blob"])
    assert s.shape == (1, 1)
    assert 0.0 <= s[0, 0] <= 1.0


def test_allows_audio_attr(scorer):
    assert scorer.model.allows_audio is True


def test_forward_with_trace(tmp_path):
    """Omni trace contract (reference supports_trace; schema
    README.md:335-360) — previously inherited a Qwen2VL path that could
    not assemble omni inputs."""
    from PIL import Image
    import t2v_metrics_tpu as t2v

    rng = np.random.default_rng(0)
    img = str(tmp_path / "i.png")
    Image.fromarray(rng.integers(0, 255, (40, 60, 3), dtype=np.uint8)).save(img)

    scorer = t2v.VQAScore(model="qwen3-omni-test")
    probs, traces = scorer.model.forward_with_trace([img], ["a cat"])
    assert probs.shape == (1,) and 0.0 <= float(probs[0]) <= 1.0
    t = traces[0]
    assert set(t) >= {"generated_text", "generated_length", "score_position",
                      "scored_indices", "probability", "token_details"}
    assert len(t["token_details"][0]["top_alternatives"]) == 5
    assert abs(t["probability"] - float(probs[0])) < 1e-9


def test_batched_generate_matches_sequential(tmp_path):
    """Omni batched decode (deepstack prefill + M-RoPE steps in the device
    loop) matches the per-sequence path token for token."""
    from PIL import Image
    import t2v_metrics_tpu as t2v

    rng = np.random.default_rng(0)
    imgs = []
    for i in range(3):
        p = str(tmp_path / f"i{i}.png")
        Image.fromarray(rng.integers(0, 255, (40, 60, 3),
                                     dtype=np.uint8)).save(p)
        imgs.append(p)
    txts = ["Describe this.", "What sound?", "Any cats?"]
    scorer = t2v.VQAScore(model="qwen3-omni-test")
    ad = scorer.model
    for p_, t_ in zip(imgs, txts):  # warm the lazy vocab
        ad._assemble_content(p_, None, t_)
    seq = [ad.generate(images=[i], texts=[t], max_new_tokens=4)[0]
           for i, t in zip(imgs, txts)]
    batched = ad.generate(images=imgs, texts=txts, max_new_tokens=4)
    assert batched == seq, (batched, seq)


# full-fidelity suite: run with plain `pytest`; the quick tier
# (`pytest -m 'not slow'`, ~2 min) covers the API/data/ops layers
pytestmark = pytest.mark.slow
