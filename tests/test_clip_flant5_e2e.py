"""End-to-end golden parity for CLIP-FlanT5 VQAScore.

Replicates the reference scoring pipeline in torch (tiny random HF
CLIPVisionModel + MLP projector + T5, LLaVA-style image-token splicing,
P(answer) = exp(-loss) — reference mm_utils.py:142-241 semantics) and
asserts our batched TPU engine reproduces the scores to ≤1e-3 (BASELINE
parity gate) — actually to ~1e-5 in fp32.
"""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from transformers import CLIPVisionConfig as HFVC, CLIPVisionModel
from transformers import T5Config as HFT5C, T5ForConditionalGeneration

from t2v_metrics_tpu.models import clip_flant5 as cft5
from t2v_metrics_tpu.models import clip as jclip
from t2v_metrics_tpu.models import t5 as jt5
from t2v_metrics_tpu.models.convert import convert_clip_vision, convert_t5
from t2v_metrics_tpu.engine.scoring import CLIPT5Engine
from t2v_metrics_tpu.tokenization import SimpleT5Tokenizer, splice_image_tokens_t5
from t2v_metrics_tpu.constants import IMAGE_TOKEN_INDEX


IMG_SIZE, PATCH = 28, 14  # 4 image tokens
N_IMG_TOK = (IMG_SIZE // PATCH) ** 2


@pytest.fixture(scope="module")
def setup():
    torch.manual_seed(0)
    hf_vis = CLIPVisionModel(HFVC(
        hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, image_size=IMG_SIZE, patch_size=PATCH,
        hidden_act="quick_gelu")).eval()
    d_model = 48
    proj = torch.nn.Sequential(
        torch.nn.Linear(32, d_model), torch.nn.GELU(),
        torch.nn.Linear(d_model, d_model)).eval()
    hf_t5 = T5ForConditionalGeneration(HFT5C(
        vocab_size=200, d_model=d_model, d_kv=12, d_ff=96, num_layers=2,
        num_decoder_layers=2, num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=20, dropout_rate=0.0,
        feed_forward_proj="gated-gelu", tie_word_embeddings=False,
        decoder_start_token_id=0, pad_token_id=0, eos_token_id=1)).eval()

    cfg = cft5.CLIPT5Config(
        t5=jt5.T5Config(vocab_size=200, d_model=d_model, d_kv=12, d_ff=96,
                        num_heads=4, enc_layers=2, dec_layers=2, num_buckets=8,
                        max_distance=20),
        vision=jclip.CLIPVisionConfig(image_size=IMG_SIZE, patch_size=PATCH,
                                      width=32, layers=3, heads=4, mlp_dim=64,
                                      proj_dim=32),
        num_image_tokens=N_IMG_TOK)

    vis_sd = {f"vision_model.{k}" if not k.startswith("vision_model") else k: v
              for k, v in hf_vis.state_dict().items()}
    params = {
        "vision": convert_clip_vision(vis_sd, 3),
        "projector": {
            "fc1": {"w": jnp.asarray(proj[0].weight.detach().numpy().T),
                    "b": jnp.asarray(proj[0].bias.detach().numpy())},
            "fc2": {"w": jnp.asarray(proj[2].weight.detach().numpy().T),
                    "b": jnp.asarray(proj[2].bias.detach().numpy())},
        },
        "t5": convert_t5(hf_t5.state_dict(), 2, 2),
    }
    tok = SimpleT5Tokenizer(200)
    # pre-populate vocab deterministically
    for w in ("Does this figure show a photo of cat dog bird ? Please answer "
              "yes no . Yes No USER: ASSISTANT: A chat between curious human "
              "and an artificial intelligence assistant. The gives helpful, "
              "detailed, polite answers to the human's questions. Is").split():
        tok._id(w)
    engine = CLIPT5Engine(params, cfg, tok)
    return hf_vis, proj, hf_t5, cfg, tok, engine


def torch_reference_score(hf_vis, proj, hf_t5, tok, pixels_hwc, question,
                          answer):
    """The reference's per-pair scoring, in torch."""
    px = torch.from_numpy(pixels_hwc.transpose(2, 0, 1)[None])
    with torch.no_grad():
        hs = hf_vis(pixel_values=px, output_hidden_states=True).hidden_states
        feats = proj(hs[-2][:, 1:])  # (1, T, D)

        spliced = splice_image_tokens_t5(question, tok)
        emb = hf_t5.get_input_embeddings()
        parts, img_at = [], spliced.index(IMAGE_TOKEN_INDEX)
        pre = torch.tensor(spliced[:img_at])[None]
        post = torch.tensor(spliced[img_at + 1:])[None]
        embeds = torch.cat([emb(pre), feats, emb(post)], dim=1)

        ans_ids = torch.tensor(tok(answer).input_ids)[None]
        out = hf_t5(inputs_embeds=embeds, labels=ans_ids)
    return float(np.exp(-out.loss.item()))


def _rand_pixels(seed):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((IMG_SIZE, IMG_SIZE, 3), dtype=np.float32)


def test_pair_scores_match_reference(setup):
    hf_vis, proj, hf_t5, cfg, tok, engine = setup
    pixels = [_rand_pixels(i) for i in range(2)]
    texts = ["a photo of cat", "a photo of dog"]

    qt = 'Does this figure show "{}"? Please answer yes or no.'
    questions = [cft5.format_question(qt.format(t), cfg.conversation) for t in texts]
    answers = [cft5.format_answer("Yes", cfg.conversation) for _ in texts]

    ref = np.array([[torch_reference_score(hf_vis, proj, hf_t5, tok, px, q, a)
                     for q, a in zip(questions, answers)] for px in pixels])

    # our path: bypass file loading by feeding pixels via a monkeypatched
    # encode (engine.encode_images expects paths); use internal API directly.
    feats = engine._encode(engine.params, jnp.asarray(np.stack(pixels)))
    arrays = engine._build_text_arrays(questions, answers)
    dev = tuple(jnp.asarray(a) for a in arrays)
    pair_image = jnp.asarray(np.repeat(np.arange(2, dtype=np.int32), 2))
    pair_text = jnp.asarray(np.tile(np.arange(2, dtype=np.int32), 2))
    logp = engine._score(engine.params, feats, *dev,
                         pair_image=pair_image, pair_text=pair_text)
    ours = np.exp(np.asarray(logp)).reshape(2, 2)

    np.testing.assert_allclose(ours, ref, atol=1e-3)  # BASELINE gate
    np.testing.assert_allclose(ours, ref, atol=5e-5)  # actual fp32 parity


def test_multitoken_answer_geometric_mean(setup):
    hf_vis, proj, hf_t5, cfg, tok, engine = setup
    px = _rand_pixels(7)
    q = cft5.format_question('Describe "<x>"', cfg.conversation)
    a = "a photo of cat"  # multi-token answer (VisualGPTScore mode)
    ref = torch_reference_score(hf_vis, proj, hf_t5, tok, px, q, a)

    feats = engine._encode(engine.params, jnp.asarray(px[None]))
    arrays = engine._build_text_arrays([q], [a])
    dev = tuple(jnp.asarray(x) for x in arrays)
    logp = engine._score(engine.params, feats, *dev,
                         pair_image=jnp.asarray([0], jnp.int32),
                         pair_text=jnp.asarray([0], jnp.int32))
    np.testing.assert_allclose(float(np.exp(np.asarray(logp)[0])), ref, atol=5e-5)


def test_first_token_distribution_sums_to_one(setup):
    _, _, _, cfg, tok, engine = setup
    px = _rand_pixels(9)
    q = cft5.format_question("Is this cat ?", cfg.conversation)
    feats = engine._encode(engine.params, jnp.asarray(px[None]))
    ids, img_mask, img_slot, enc_mask, _, _ = engine._build_text_arrays([q], ["Yes"])
    dist = engine._first_tok(engine.params, feats, jnp.asarray(ids),
                             jnp.asarray(img_mask), jnp.asarray(img_slot),
                             jnp.asarray(enc_mask),
                             pair_image=jnp.asarray([0], jnp.int32),
                             pair_text=jnp.asarray([0], jnp.int32))
    np.testing.assert_allclose(np.asarray(dist).sum(), 1.0, atol=1e-5)


# full-fidelity suite: run with plain `pytest`; the quick tier
# (`pytest -m 'not slow'`, ~2 min) covers the API/data/ops layers
pytestmark = pytest.mark.slow
