"""Answer-token BPE traps against a REAL byte-level BPE tokenizer.

The reference documents the core correctness trap of answer-token scoring
(reference token_test_qwen3vl.py:20-94): with byte-level BPE vocabularies
"Yes" and " Yes" are DIFFERENT single tokens, and the scored id must be
the variant that greedy generation actually emits in the chat context
(which ends "...assistant\n", so the no-leading-space variant).

The zero-egress sandbox has no pretrained vocab, so prior rounds only ever
exercised the whitespace SimpleT5Tokenizer — which cannot express the
trap. Here a byte-level BPE is TRAINED locally (tokenizers Rust lib, same
backend as every HF fast tokenizer) with both variants in-vocab, and the
Qwen scoring/trace paths run against it end to end.
"""

import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def bpe_dir(tmp_path_factory):
    from tokenizers import (Tokenizer, decoders, models, pre_tokenizers,
                            trainers)

    d = tmp_path_factory.mktemp("qwen_bpe")
    tok = Tokenizer(models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    corpus = (
        ["system\nYou are a helpful assistant.\nuser\nassistant\n"] * 40
        + ['Does this figure show "a photo of a cat"? '
           "Please answer Yes or No."] * 40
        # newline-adjacent (generation context) AND space-prefixed forms,
        # so BOTH merge chains land in the vocab
        + ["assistant\nYes", "assistant\nNo", "Answer: Yes", "Answer: No",
           "Yes", "No", " Yes", " No"] * 60)
    trainer = trainers.BpeTrainer(
        vocab_size=470,
        special_tokens=["<|im_start|>", "<|im_end|>", "<|endoftext|>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet())
    tok.train_from_iterator(corpus, trainer)
    tok.save(str(d / "tokenizer.json"))
    with open(d / "tokenizer_config.json", "w") as f:
        json.dump({"tokenizer_class": "PreTrainedTokenizerFast",
                   "eos_token": "<|im_end|>", "pad_token": "<|endoftext|>",
                   "model_max_length": 4096}, f)
    return str(d)


@pytest.fixture(scope="module")
def scorer(bpe_dir):
    import jax.numpy as jnp
    import t2v_metrics_tpu as t2v

    # tokenizer as a PATH exercises the cold-path string plumb
    return t2v.VQAScore(model="qwen2.5-vl-test", init="random",
                        tokenizer=bpe_dir, dtype=jnp.float32)


def test_bpe_has_the_trap(scorer):
    """The trained vocab must genuinely contain the trap: distinct
    single-token 'Yes' vs ' Yes' (and No)."""
    tok = scorer.model.tokenizer
    assert tok.__class__.__name__ == "PreTrainedTokenizerFast"
    for word in ("Yes", "No"):
        plain = tok.encode(word, add_special_tokens=False)
        spaced = tok.encode(" " + word, add_special_tokens=False)
        assert len(plain) == 1, (word, plain)
        assert len(spaced) == 1, (word, spaced)
        assert plain != spaced, word


def test_scored_id_matches_generation_context(scorer):
    """The id the scoring path uses must be the variant generation emits:
    the chat template ends '...assistant\\n', and byte-level BPE after a
    newline yields the NO-space token."""
    tok = scorer.model.tokenizer
    ad = scorer.model
    id_yes = tok.encode("Yes", add_special_tokens=False)[0]
    id_sp_yes = tok.encode(" Yes", add_special_tokens=False)[0]
    assert ad._encode_text("Yes") == [id_yes]
    # in-context check: tokenize the real template tail — the token that
    # follows "assistant\n" is the no-space variant
    ctx = tok.encode("assistant\nYes", add_special_tokens=False)
    assert ctx[-1] == id_yes and id_sp_yes not in ctx


def test_chat_prompt_roundtrip(scorer):
    """Special tokens stay atomic through the real fast tokenizer and the
    prompt decodes back to the chat string with vision span inserted."""
    ad = scorer.model
    tok = ad.tokenizer
    ids = ad._build_ids("Is this a cat?", n_vis=4, is_video=False)
    text = tok.decode([i for i in ids if i < 500])
    assert text.startswith("<|im_start|>system")
    assert "Is this a cat?" in text and text.endswith("assistant\n")
    assert ids.count(ad.config.image_token_id) == 4
    im_start = tok.encode("<|im_start|>", add_special_tokens=False)
    assert len(im_start) == 1 and ids[0] == im_start[0]


def test_score_and_trace_with_real_bpe(scorer):
    """End-to-end scoring + rollout trace + teacher-forcing trace with the
    real BPE: shapes/ranges hold, the traced expected token is the
    no-space 'Yes', and teacher forcing agrees with the rollout
    probability at the scored position (reference
    test_teacher_vs_rollout.py asserted <1e-6)."""
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (64, 56, 3), dtype=np.uint8)

    s = scorer(images=[img], texts=["a photo of a cat"])
    assert s.shape == (1, 1) and 0.0 <= float(s[0, 0]) <= 1.0

    ad = scorer.model
    tok = ad.tokenizer
    id_yes = tok.encode("Yes", add_special_tokens=False)[0]

    probs, traces = ad.forward_with_trace([img], ["a photo of a cat"],
                                          score_position="start")
    det = traces[0]["token_details"][0]
    assert det["expected_token_id"] == id_yes
    assert det["expected_token_text"] == "Yes"

    probs_tf, traces_tf = ad.forward_with_trace_teacher_forcing(
        [img], ["a photo of a cat"])
    det_tf = traces_tf[0]["token_details"][0]
    assert det_tf["expected_token_id"] == id_yes
    # rollout position 0 distribution == teacher-forced first answer step
    np.testing.assert_allclose(det_tf["probability"], det["probability"],
                               atol=1e-6)
    np.testing.assert_allclose(float(s[0, 0]), probs_tf[0], atol=1e-5)


def test_qwen3vl_adapter_same_contract(bpe_dir):
    """qwen3-vl shares the trap-sensitive encode path; pin it too."""
    import jax.numpy as jnp
    import t2v_metrics_tpu as t2v

    scorer = t2v.VQAScore(model="qwen3-vl-test", init="random",
                          tokenizer=bpe_dir, dtype=jnp.float32)
    tok = scorer.model.tokenizer
    assert tok.__class__.__name__ == "PreTrainedTokenizerFast"
    id_yes = tok.encode("Yes", add_special_tokens=False)[0]
    assert scorer.model._encode_text("Yes") == [id_yes]
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (48, 48, 3), dtype=np.uint8)
    s = scorer(images=[img], texts=["a dog on grass"])
    assert s.shape == (1, 1) and 0.0 <= float(s[0, 0]) <= 1.0
