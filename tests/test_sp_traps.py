"""T5 SentencePiece trap tests against a REAL Unigram+Metaspace tokenizer.

The byte-level BPE traps (test_tokenizer_traps.py) cover the Qwen side;
T5's SentencePiece side has its own traps (reference
mm_utils.py:142-179 t5_tokenizer_image_token, V_3.0_README.md:110-125):

  * the vocabulary distinguishes word-start pieces ("▁Yes") from mid-word
    pieces ("Yes") — the scored answer id must be the "▁Yes" variant that
    teacher-forced decoding of the answer string actually produces;
  * T5 has NO BOS: the splice must never insert one;
  * each <image>-split chunk is tokenized separately WITH special tokens,
    which appends </s> to *every* chunk — a quirk the pretrained
    CLIP-FlanT5 weights expect (reference mm_utils.py:160-179).

No pretrained vocab exists in this zero-egress sandbox (and no
`sentencepiece` lib; the UnigramTrainer prunes word pieces at toy-corpus
scale), so the Unigram vocab is CONSTRUCTED explicitly with HF
`tokenizers` — the same Rust Unigram/Viterbi + Metaspace inference path
every fast T5 tokenizer runs, with piece log-probs arranged so the
word-start/mid-word trap is genuinely expressible and exercised.
"""

import json

import numpy as np
import pytest


@pytest.fixture(scope="module")
def sp_dir(tmp_path_factory):
    from tokenizers import (Tokenizer, decoders, models, pre_tokenizers,
                            processors)

    d = tmp_path_factory.mktemp("t5_sp")
    # Explicit Unigram vocab: specials first (T5 layout: pad=0, </s>=1),
    # then BOTH trap variants per answer word — the word-start piece
    # ("▁Yes") and the mid-word piece ("Yes") — then word pieces for the
    # VQA prompt, then a single-char fallback alphabet. Multi-char pieces
    # get higher log-prob than their char decomposition so Viterbi picks
    # them whenever they fit.
    words = ["Yes", "No", "USER:", "ASSISTANT:", "Does", "this", "figure",
             "show", "a", "photo", "of", "cat", "Please", "answer", "yes",
             "or", "no.", "Is", "describe", "the", "scene", "hello"]
    alphabet = sorted(set(
        "▁abcdefghijklmnopqrstuvwxyz"
        "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
        ".,:;?!\"'()<>/-_\n"))
    vocab = [("<pad>", 0.0), ("</s>", 0.0), ("<unk>", -20.0)]
    for w in words:
        vocab.append(("▁" + w, -6.0))
        vocab.append((w, -7.0))  # mid-word variant, slightly less likely
    vocab += [(c, -12.0) for c in alphabet]
    tok = Tokenizer(models.Unigram(vocab=vocab, unk_id=2))
    tok.pre_tokenizer = pre_tokenizers.Metaspace(replacement="▁")
    tok.decoder = decoders.Metaspace(replacement="▁")
    eos_id = tok.token_to_id("</s>")
    tok.post_processor = processors.TemplateProcessing(
        single="$A </s>", pair="$A </s> $B </s>",
        special_tokens=[("</s>", eos_id)])
    tok.save(str(d / "tokenizer.json"))
    with open(d / "tokenizer_config.json", "w") as f:
        json.dump({"tokenizer_class": "PreTrainedTokenizerFast",
                   "eos_token": "</s>", "pad_token": "<pad>",
                   "unk_token": "<unk>", "model_max_length": 2048}, f)
    return str(d)


@pytest.fixture(scope="module")
def tok(sp_dir):
    from t2v_metrics_tpu.tokenization import load_hf_tokenizer

    return load_hf_tokenizer(sp_dir)


def test_sp_vocab_has_the_trap(tok):
    """Both the word-start ('▁Yes') and mid-word ('Yes') pieces must exist
    and be DIFFERENT ids — otherwise the trap is not expressible."""
    for word in ("Yes", "No"):
        start = tok.convert_tokens_to_ids("▁" + word)
        mid = tok.convert_tokens_to_ids(word)
        unk = tok.unk_token_id
        assert start not in (None, unk), f"▁{word} missing from vocab"
        assert mid not in (None, unk), f"mid-word {word} missing from vocab"
        assert start != mid


def test_sp_answer_id_is_word_start_variant(tok):
    """tok('Yes') must yield the ▁Yes piece (+ </s>), matching what
    teacher-forced decoding of the answer string produces — NOT the
    mid-word 'Yes' piece."""
    ids = tok("Yes").input_ids
    assert ids == [tok.convert_tokens_to_ids("▁Yes"), tok.eos_token_id]
    # and in generation context ("ASSISTANT: Yes") the same piece appears
    ctx = tok("ASSISTANT: Yes", add_special_tokens=False).input_ids
    assert ctx[-1] == tok.convert_tokens_to_ids("▁Yes")
    assert tok.convert_tokens_to_ids("Yes") not in ctx


def test_sp_no_bos(tok):
    """T5 has no BOS (reference t5_tokenizer_image_token has no BOS
    handling at all, unlike the LLaVA variant, mm_utils.py:142-179)."""
    assert tok.bos_token_id is None
    ids = tok("hello").input_ids
    assert ids[-1] == tok.eos_token_id
    assert tok.pad_token_id not in ids and len(ids) >= 2


def test_splice_appends_eos_per_chunk(tok):
    """The reference quirk: splitting on <image> tokenizes each chunk with
    special tokens, so </s> lands after EVERY chunk, with the -200 image
    marker between chunks (reference mm_utils.py:160-179)."""
    from t2v_metrics_tpu.constants import IMAGE_TOKEN_INDEX
    from t2v_metrics_tpu.tokenization import splice_image_tokens_t5

    prompt = "USER: <image>\nIs this a cat? ASSISTANT: "
    out = splice_image_tokens_t5(prompt, tok)
    eos = tok.eos_token_id
    marker = [i for i, t in enumerate(out) if t == IMAGE_TOKEN_INDEX]
    assert len(marker) == 1
    # chunk 1 = "USER: " ends with </s> right before the image marker
    assert out[marker[0] - 1] == eos
    # chunk 2 ends with </s> at the very end
    assert out[-1] == eos
    assert out.count(eos) == 2
    # byte-equality with tokenizing the chunks directly
    pre, post = prompt.split("<image>")
    assert out == (tok(pre).input_ids + [IMAGE_TOKEN_INDEX]
                   + tok(post).input_ids)


@pytest.fixture(scope="module")
def scorer(sp_dir):
    import jax.numpy as jnp
    import t2v_metrics_tpu as t2v

    return t2v.VQAScore(model="clip-flant5-test", init="random",
                        tokenizer=sp_dir, dtype=jnp.float32)


def test_clip_flant5_scoring_with_real_sp(scorer):
    """End-to-end VQAScore through the CLIP-FlanT5 path with the trained
    SP tokenizer: shape/range hold and the engine's answer ids are exactly
    [▁Yes, </s>] — the teacher-forcing-consistent pair."""
    tok = scorer.model.engine.tokenizer
    assert tok.__class__.__name__ in ("PreTrainedTokenizerFast",
                                      "T5TokenizerFast")

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (64, 56, 3), dtype=np.uint8)
    s = scorer(images=[img], texts=["a photo of a cat"])
    assert s.shape == (1, 1) and 0.0 <= float(s[0, 0]) <= 1.0

    eng = scorer.model.engine
    arrays = eng._build_text_arrays(
        ["USER: <image>\nIs this a cat? ASSISTANT: "], ["Yes"])
    ans_ids, ans_mask = arrays[4], arrays[5]
    id_yes = tok.convert_tokens_to_ids("▁Yes")
    assert ans_ids[0, 0] == id_yes
    assert ans_ids[0, 1] == tok.eos_token_id
    assert ans_mask[0, :2].tolist() == [1.0, 1.0]
    # the scored ids must NOT be the mid-word piece
    assert tok.convert_tokens_to_ids("Yes") not in ans_ids[0].tolist()


def test_visualgptscore_mode_with_real_sp(scorer):
    """VisualGPTScore P(caption|image) mode (reference
    V_3.0_README.md:209-233): empty question template, answer = caption —
    the caption's SP pieces are the scored sequence."""
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (64, 56, 3), dtype=np.uint8)
    s = scorer(images=[img], texts=["a photo of a cat"],
               question_template="", answer_template="{}")
    assert s.shape == (1, 1) and 0.0 <= float(s[0, 0]) <= 1.0


def test_generate_decodes_metaspace(scorer):
    """Greedy generate must decode through the Metaspace decoder to plain
    text (no literal ▁ characters in user-facing output)."""
    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (64, 56, 3), dtype=np.uint8)
    out = scorer.model.generate(images=[img], texts=["describe the scene"])
    assert isinstance(out[0], str)
    assert "▁" not in out[0]
