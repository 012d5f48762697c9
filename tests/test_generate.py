"""generate() behavioral coverage for every local family (reference
test.py:147-174 asserts generate works for all local models).

Tiny random configs — asserts shape/type contracts and KV-cache
consistency (cached greedy first step == teacher-forced argmax), not
text quality.
"""

import numpy as np
import pytest

import t2v_metrics_tpu as t2v


@pytest.fixture(scope="module")
def image(tmp_path_factory):
    from PIL import Image

    p = tmp_path_factory.mktemp("assets") / "img.png"
    rng = np.random.default_rng(0)
    Image.fromarray(rng.integers(0, 255, (96, 128, 3), dtype=np.uint8)).save(p)
    return str(p)


@pytest.fixture(scope="module")
def video(tmp_path_factory):
    import cv2

    p = str(tmp_path_factory.mktemp("assets") / "vid.mp4")
    vw = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"mp4v"), 10.0, (64, 48))
    rng = np.random.default_rng(1)
    for _ in range(12):
        vw.write(rng.integers(0, 255, (48, 64, 3), dtype=np.uint8))
    vw.release()
    return p


LOCAL_VQA = [
    "clip-flant5-test",
    "qwen2.5-vl-test",
    "qwen3-vl-test",
    "gemma-3-test",
    "paligemma-test",
    "internvl3-test",
    "qwen3-omni-test",
]


@pytest.mark.parametrize("name", LOCAL_VQA)
def test_generate_from_image(name, image):
    scorer = t2v.VQAScore(model=name)
    out = scorer.model.generate(images=[image], texts=["Describe this."],
                                max_new_tokens=4)
    assert isinstance(out, list) and len(out) == 1
    assert isinstance(out[0], str)


@pytest.mark.parametrize("name", ["gemma-3-test", "internvl3-test",
                                  "qwen3-omni-test"])
def test_generate_from_video(name, video):
    scorer = t2v.VQAScore(model=name)
    out = scorer.model.generate(images=[video], texts=["Describe this."],
                                max_new_tokens=3)
    assert isinstance(out[0], str)


def test_gemma3_cached_prefill_matches_teacher_forced(image):
    """The KV-cached prefill path (sliding windows + per-image-block bidir
    overlay against cache positions) must produce the same first-token
    argmax as the teacher-forced scoring path."""
    import jax.numpy as jnp
    import jax

    scorer = t2v.VQAScore(model="gemma-3-test")
    ad = scorer.model
    cfg = ad.config
    from t2v_metrics_tpu.models import gemma3 as g3

    ids, px = ad._assemble(image, "Is this a photo?")
    n = len(ids)
    s = n  # no padding: teacher-forced comparison on exact length
    ids_arr = np.zeros((1, s), np.int64)
    ids_arr[0, :n] = ids
    vis_mask = ids_arr == cfg.image_token_id
    vis_slot = np.zeros((1, s), np.int64)
    vis_slot[vis_mask] = np.arange(vis_mask.sum())
    f = ad._vision_jit(ad.params, jnp.asarray(px))
    f = np.asarray(f, np.float32).reshape(1, -1, cfg.text.d_model)

    # teacher-forced full forward logits at the last prompt position
    embed = ad.params["decoder"]["embed"]
    scale = jnp.asarray(cfg.text.d_model ** 0.5, embed.dtype)
    tok = embed[jnp.asarray(ids_arr)] * scale
    vis = jnp.take_along_axis(jnp.asarray(f, embed.dtype),
                              jnp.asarray(vis_slot)[..., None], axis=1)
    embeds = jnp.where(jnp.asarray(vis_mask)[..., None], vis, tok)
    from t2v_metrics_tpu.models import decoder as dec

    bidir = g3.image_group_ids(jnp.asarray(vis_mask))
    logits_tf, _ = dec.forward(ad.params["decoder"], cfg.text, embeds,
                               jnp.arange(s)[None],
                               jnp.ones((1, s), bool), bidir_ids=bidir)
    tf_top = int(jnp.argmax(logits_tf[0, n - 1]))

    # cached path via generate machinery
    from t2v_metrics_tpu.models.generation import CachedLM

    lm = CachedLM(cfg.text, embed_scale=cfg.text.d_model ** 0.5)
    bidir_full = np.full((1, s + 4), -1, np.int32)
    bidir_full[0, :s] = np.asarray(bidir)[0]
    gen, dists = lm.greedy(ad.params["decoder"], embeds,
                           np.arange(s)[None], n, 4, bidir_full=bidir_full)
    assert gen[0] == tf_top
    np.testing.assert_allclose(
        dists[0], np.asarray(jax.nn.softmax(logits_tf[0, n - 1])),
        rtol=2e-4, atol=2e-5)


def test_paligemma_generate_includes_prompt(image):
    scorer = t2v.VQAScore(model="paligemma-test")
    out = scorer.model.generate(images=[image], texts=["caption en"],
                                max_new_tokens=3)
    assert isinstance(out[0], str)


def test_nucleus_sampling(image):
    """do_sample + temperature produces valid output; top_p=tiny collapses
    to greedy (the nucleus keeps only the argmax)."""
    import numpy as np
    from t2v_metrics_tpu.models.generation import _nucleus_sample

    rng = np.random.default_rng(0)
    dist = np.array([0.7, 0.2, 0.07, 0.03], np.float32)
    # tiny top_p -> only the top token survives
    assert all(_nucleus_sample(dist, 0.01, rng) == 0 for _ in range(5))
    # top_p=0.9 -> tokens 0..2 possible, token 3 never
    draws = {_nucleus_sample(dist, 0.9, rng) for _ in range(200)}
    assert 3 not in draws and 0 in draws

    scorer = t2v.VQAScore(model="gemma-3-test")
    out = scorer.model.generate(images=[image], texts=["Describe."],
                                max_new_tokens=4, do_sample=True,
                                temperature=0.8, top_p=0.95)
    assert isinstance(out[0], str)
    out2 = scorer.model.generate(images=[image], texts=["Describe."],
                                 max_new_tokens=4, temperature=0.0)
    assert isinstance(out2[0], str)


def test_internvl_batched_generate_matches_sequential(image, video):
    """The device-side batched greedy loop must produce exactly the
    per-sequence greedy outputs."""
    scorer = t2v.VQAScore(model="internvl3-test")
    ad = scorer.model
    imgs = [image, video, image]
    txts = ["Describe this.", "What moves?", "Any cats?"]
    # SimpleT5Tokenizer's vocab is lazy — tokenize every prompt up front so
    # decode strings are stable across the two passes (the generated token
    # IDS are what's being compared; the lazy vocab must not shift decodes)
    for p, t in zip(imgs, txts):
        ad._assemble_gen(p, t, 16)
    seq = [ad.generate(images=[i], texts=[t], max_new_tokens=5)[0]
           for i, t in zip(imgs, txts)]
    batched = ad.generate(images=imgs, texts=txts, max_new_tokens=5)
    assert batched == seq, (batched, seq)


def test_gemma3_batched_generate_matches_sequential(image, video):
    """Gemma3's batched path (bidir image-group overlays in the device-side
    loop) must match per-sequence greedy token-for-token."""
    scorer = t2v.VQAScore(model="gemma-3-test")
    ad = scorer.model
    imgs = [image, video, image]
    txts = ["Describe this.", "What moves?", "Any cats?"]
    for p, t in zip(imgs, txts):  # warm the lazy vocab (stable decodes)
        ad._assemble(p, t, 10)
    seq = [ad.generate(images=[i], texts=[t], max_new_tokens=5)[0]
           for i, t in zip(imgs, txts)]
    batched = ad.generate(images=imgs, texts=txts, max_new_tokens=5)
    assert batched == seq, (batched, seq)


def test_camerabench_caption_generation_batched(tmp_path):
    """The caption harness batches valid samples and keeps per-sample
    error entries for missing files."""
    import cv2
    from t2v_metrics_tpu.camerabench.caption_generation import generate_captions

    rng = np.random.default_rng(0)
    for name in ("a.mp4", "b.mp4"):
        vw = cv2.VideoWriter(str(tmp_path / name),
                             cv2.VideoWriter_fourcc(*"mp4v"), 10.0, (64, 48))
        for _ in range(8):
            vw.write(rng.integers(0, 255, (48, 64, 3), dtype=np.uint8))
        vw.release()
    samples = [{"video": "a.mp4", "caption": "x"},
               {"video": "nope.mp4", "caption": "y"},
               {"video": "b.mp4", "caption": "z"}]
    results = generate_captions(samples, "internvl3-test", str(tmp_path),
                                max_new_tokens=3)
    assert results[0]["generated_caption"] and results[0]["error"] is None
    assert results[1]["error"] and results[1]["generated_caption"] is None
    assert results[2]["generated_caption"] and results[2]["error"] is None
    # order preserved
    assert [r["video_path"] for r in results] == ["a.mp4", "nope.mp4", "b.mp4"]


def test_qwen_batched_generate_matches_host_loop(image, video):
    """Qwen2.5-VL + Qwen3-VL (deepstack) batched greedy must equal the
    per-sequence host-loop tokens (the sampling fallback path)."""
    for name in ["qwen2.5-vl-test", "qwen3-vl-test"]:
        scorer = t2v.VQAScore(model=name)
        ad = scorer.model
        imgs = [image, video, image]
        txts = ["Describe this.", "What moves?", "Any cats?"]
        arrays, plens = ad._prepare_pairs(imgs, txts, None)
        ids, feats, vis_mask, vis_slot, pos, attn = arrays
        seq = []
        decode = ad.tokenizer.decode
        for j in range(3):
            gen, _ = ad._greedy_steps(ids[j], feats[j], vis_mask[j],
                                      vis_slot[j], pos[:, j], plens[j], 5)
            if gen and ad.eos_token_id is not None \
                    and gen[-1] == ad.eos_token_id:
                gen = gen[:-1]
            seq.append(decode(gen).strip())
        batched = ad.generate(images=imgs, texts=txts, max_new_tokens=5)
        assert batched == seq, (name, batched, seq)


def test_molmo2_batched_generate_matches_host_loop(image, video):
    from t2v_metrics_tpu.models.generation import decode_text

    scorer = t2v.VQAScore(model="molmo2-test")
    ad = scorer.model
    imgs = [image, video, image]
    txts = ["Describe this.", "What moves?", "Any cats?"]
    seq = []
    for p, t in zip(imgs, txts):
        gen, _ = ad._rollout(p, t, 5, 1.0)
        seq.append(decode_text(ad.tokenizer, gen, ad._special_ids()))
    batched = ad.generate(images=imgs, texts=txts, max_new_tokens=5)
    assert batched == seq, (batched, seq)


# full-fidelity suite: run with plain `pytest`; the quick tier
# (`pytest -m 'not slow'`, ~2 min) covers the API/data/ops layers
pytestmark = pytest.mark.slow
