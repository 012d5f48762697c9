"""Live smoke suite — port of the reference's test.py (reference
test.py:1-313): five behavioral cases per model (single-image score,
single-video score, 2x2 multi-pair matrix, generate-from-image,
generate-from-video), sequential, stops on first failure with a full
traceback. Model groups are gated by env vars:

  T2V_TEST_MODELS     comma-separated local models (default: tiny test
                      configs so the suite runs without weights)
  OPENAI_API_KEY      enables the GPT group
  GOOGLE_CLOUD_PROJECT / GEMINI_API_KEY   enable the Gemini groups

Usage: python test.py
"""

import contextlib
import os
import sys
import traceback

import numpy as np

import t2v_metrics_tpu as t2v

IMAGE = os.environ.get("T2V_TEST_IMAGE")
VIDEO = os.environ.get("T2V_TEST_VIDEO")


def _ensure_assets(tmp="./_test_assets"):
    """Create synthetic image/video assets when none are provided."""
    global IMAGE, VIDEO
    os.makedirs(tmp, exist_ok=True)
    if IMAGE is None:
        from PIL import Image

        IMAGE = os.path.join(tmp, "img.png")
        rng = np.random.default_rng(0)
        Image.fromarray(rng.integers(0, 255, (96, 128, 3),
                                     dtype=np.uint8)).save(IMAGE)
    if VIDEO is None:
        import cv2

        VIDEO = os.path.join(tmp, "vid.mp4")
        vw = cv2.VideoWriter(VIDEO, cv2.VideoWriter_fourcc(*"mp4v"), 10.0,
                             (128, 96))
        rng = np.random.default_rng(1)
        for _ in range(20):
            vw.write(rng.integers(0, 255, (96, 128, 3), dtype=np.uint8))
        vw.release()


def check(name, fn):
    try:
        fn()
        print(f"  PASS {name}")
    except Exception:
        print(f"  FAIL {name}")
        traceback.print_exc()
        sys.exit(1)


def run_model(model_name, **kwargs):
    print(f"\n=== {model_name} ===")
    scorer = t2v.get_score_model(model_name, **kwargs)
    adapter = scorer.model

    # VQAScore is a probability in [0,1]; CLIPScore is a cosine in [-1,1]
    lo = -1.0 if isinstance(scorer, t2v.CLIPScore) else 0.0

    def single_image_score():
        s = scorer(images=[IMAGE], texts=["a photo of something"])
        assert s.shape == (1, 1), s.shape
        assert lo <= float(s[0, 0]) <= 1.0, s

    def single_video_score():
        s = scorer(images=[VIDEO], texts=["a moving scene"])
        assert s.shape == (1, 1), s.shape
        assert lo <= float(s[0, 0]) <= 1.0, s

    def multi_pair_score():
        s = scorer(images=[IMAGE, IMAGE], texts=["a cat", "a dog"])
        assert s.shape == (2, 2), s.shape
        assert np.all(s >= lo) and np.all(s <= 1)

    def generate_from_image():
        out = adapter.generate(images=[IMAGE], texts=["Describe this."],
                               max_new_tokens=8)
        assert isinstance(out[0], str)

    def generate_from_video():
        out = adapter.generate(images=[VIDEO], texts=["Describe this."],
                               max_new_tokens=8)
        assert isinstance(out[0], str)

    check("single_image_score", single_image_score)
    allows_video = (getattr(adapter, "allows_video", False)
                    or getattr(adapter, "video_mode", "") == "concat")
    if allows_video:
        check("single_video_score", single_video_score)
    else:
        print("  SKIP single_video_score (video not supported)")
    check("multi_pair_score", multi_pair_score)
    # Every local VQA adapter must support generate (reference
    # test.py:147-174 asserts it for all local models; CLIP/ITM metric
    # models have no generate in the reference either).
    if isinstance(scorer, t2v.VQAScore):
        check("generate_from_image", generate_from_image)
        if getattr(adapter, "allows_video", False):
            check("generate_from_video", generate_from_video)
    elif hasattr(adapter, "generate"):
        check("generate_from_image", generate_from_image)


@contextlib.contextmanager
def suppress_env(var):
    """Temporarily hide an env var (reference test.py:93-100)."""
    old = os.environ.pop(var, None)
    try:
        yield
    finally:
        if old is not None:
            os.environ[var] = old


def main():
    _ensure_assets()
    local = os.environ.get(
        "T2V_TEST_MODELS",
        "clip-flant5-test,clipscore-test,qwen2.5-vl-test,qwen3-vl-test,"
        "gemma-3-test,gemma-4-test,paligemma-test,internvl3-test,"
        "molmo2-test,qwen3-omni-test").split(",")
    for name in [m.strip() for m in local if m.strip()]:
        run_model(name)

    if os.environ.get("OPENAI_API_KEY"):
        run_model("gpt-4o")
    else:
        print("\nSKIP GPT group (no OPENAI_API_KEY)")

    if os.environ.get("GOOGLE_CLOUD_PROJECT"):
        run_model("gemini-2.5-flash")
    else:
        print("SKIP Gemini Vertex group (no GOOGLE_CLOUD_PROJECT)")

    if os.environ.get("GEMINI_API_KEY"):
        with suppress_env("GOOGLE_CLOUD_PROJECT"):
            print("\n=== gemini-2.5-flash (API key, generate-only) ===")
            scorer = t2v.get_score_model("gemini-2.5-flash")
            out = scorer.model.generate(images=[IMAGE], texts=["Describe."])
            print("  generate:", out[0][:60])
    else:
        print("SKIP Gemini API-key group (no GEMINI_API_KEY)")

    print("\nAll selected groups passed.")


if __name__ == "__main__":
    main()
