"""Golden parity: our functional T5 vs HF T5ForConditionalGeneration (tiny
random weights, gated-gelu FlanT5 config). Gate for BASELINE config 2."""

import numpy as np
import pytest
import jax.numpy as jnp
import torch

from transformers import T5Config as HFT5Config, T5ForConditionalGeneration

from t2v_metrics_tpu.models import t5 as jt5
from t2v_metrics_tpu.models.convert import convert_t5


@pytest.fixture(scope="module")
def tiny_pair():
    torch.manual_seed(0)
    hf_cfg = HFT5Config(
        vocab_size=120, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_decoder_layers=2, num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=20, dropout_rate=0.0,
        feed_forward_proj="gated-gelu", tie_word_embeddings=False,
        decoder_start_token_id=0, pad_token_id=0, eos_token_id=1,
    )
    hf = T5ForConditionalGeneration(hf_cfg).eval()
    cfg = jt5.T5Config(vocab_size=120, d_model=32, d_kv=8, d_ff=64, num_heads=4,
                       enc_layers=2, dec_layers=2, num_buckets=8, max_distance=20,
                       tie_word_embeddings=False)
    params = convert_t5(hf.state_dict(), 2, 2)
    return hf, params, cfg


def test_bucket_parity():
    from transformers.models.t5.modeling_t5 import T5Attention

    rel = torch.arange(-20, 21)[None, :] - 0  # memory - query
    for bidir, nb, md in [(True, 8, 20), (False, 8, 20), (True, 32, 128)]:
        ref = T5Attention._relative_position_bucket(rel, bidirectional=bidir,
                                                    num_buckets=nb, max_distance=md)
        ours = jt5.relative_position_bucket(jnp.asarray(rel.numpy()), bidir, nb, md)
        np.testing.assert_array_equal(np.asarray(ours), ref.numpy())


def test_encoder_parity(tiny_pair):
    hf, params, cfg = tiny_pair
    rng = np.random.default_rng(0)
    ids = rng.integers(2, 100, (2, 9))
    mask = np.ones((2, 9), dtype=np.int64)
    mask[1, 6:] = 0
    with torch.no_grad():
        ref = hf.encoder(input_ids=torch.from_numpy(ids),
                         attention_mask=torch.from_numpy(mask)).last_hidden_state.numpy()
    emb = jt5.embed_tokens(params, jnp.asarray(ids))
    ours = np.asarray(jt5.encode(params, cfg, emb, jnp.asarray(mask) > 0))
    # padded positions may differ (HF zeroes nothing; both are garbage there)
    np.testing.assert_allclose(ours[0], ref[0], atol=3e-5)
    np.testing.assert_allclose(ours[1, :6], ref[1, :6], atol=3e-5)


def test_full_logits_parity(tiny_pair):
    hf, params, cfg = tiny_pair
    rng = np.random.default_rng(1)
    ids = rng.integers(2, 100, (2, 7))
    dec_ids = rng.integers(2, 100, (2, 4))
    with torch.no_grad():
        ref = hf(input_ids=torch.from_numpy(ids),
                 decoder_input_ids=torch.from_numpy(dec_ids)).logits.numpy()
    emb = jt5.embed_tokens(params, jnp.asarray(ids))
    enc = jt5.encode(params, cfg, emb, None)
    ours = np.asarray(jt5.decode(params, cfg, jnp.asarray(dec_ids), enc, None))
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_answer_log_probs_match_hf_loss(tiny_pair):
    hf, params, cfg = tiny_pair
    rng = np.random.default_rng(2)
    ids = rng.integers(2, 100, (1, 7))
    answer = rng.integers(2, 100, (1, 3))
    with torch.no_grad():
        out = hf(input_ids=torch.from_numpy(ids),
                 labels=torch.from_numpy(answer))
    # HF loss = mean CE over answer tokens -> our mean logp = -loss
    emb = jt5.embed_tokens(params, jnp.asarray(ids))
    lp = jt5.answer_log_probs(params, cfg, emb,
                              jnp.ones(ids.shape, bool),
                              jnp.asarray(answer), jnp.ones(answer.shape, jnp.float32))
    np.testing.assert_allclose(np.asarray(lp)[0], -out.loss.item(), atol=1e-4)


def test_tied_embeddings_scaling():
    """Tied models scale decoder output by d_model**-0.5 before lm head."""
    torch.manual_seed(1)
    hf_cfg = HFT5Config(
        vocab_size=50, d_model=16, d_kv=4, d_ff=32, num_layers=1,
        num_decoder_layers=1, num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=20, dropout_rate=0.0,
        feed_forward_proj="relu", tie_word_embeddings=True,
        decoder_start_token_id=0, pad_token_id=0,
    )
    hf = T5ForConditionalGeneration(hf_cfg).eval()
    cfg = jt5.T5Config(vocab_size=50, d_model=16, d_kv=4, d_ff=32, num_heads=4,
                       enc_layers=1, dec_layers=1, num_buckets=8, max_distance=20,
                       gated=False, tie_word_embeddings=True)
    params = convert_t5(hf.state_dict(), 1, 1, gated=False)
    ids = np.array([[3, 4, 5]])
    dec = np.array([[0, 7]])
    with torch.no_grad():
        ref = hf(input_ids=torch.from_numpy(ids),
                 decoder_input_ids=torch.from_numpy(dec)).logits.numpy()
    emb = jt5.embed_tokens(params, jnp.asarray(ids))
    enc = jt5.encode(params, cfg, emb, None)
    ours = np.asarray(jt5.decode(params, cfg, jnp.asarray(dec), enc, None))
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_cached_decode_matches_teacher_forced():
    """decode_step (self-attn KV cache + precomputed cross k/v) must
    reproduce the teacher-forced decode() logits step for step."""
    import jax
    from t2v_metrics_tpu.models import t5 as jt5

    cfg = jt5.T5Config(vocab_size=96, d_model=32, d_kv=8, d_ff=64,
                       num_heads=4, enc_layers=2, dec_layers=2,
                       num_buckets=8, max_distance=20)
    params = jt5.init_t5(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    enc_embeds = jnp.asarray(rng.standard_normal((1, 12, cfg.d_model)),
                             jnp.float32)
    enc_mask = jnp.ones((1, 12), bool)
    enc_hidden = jt5.encode(params, cfg, enc_embeds, enc_mask)

    dec_ids = np.array([[cfg.decoder_start_token_id, 5, 9, 33, 7]])
    full = jt5.decode(params, cfg, jnp.asarray(dec_ids), enc_hidden, enc_mask)

    ckv = jt5.cross_kv(params, cfg, enc_hidden)
    cache = jt5.init_dec_cache(params, cfg, 1, 8)
    for step in range(dec_ids.shape[1]):
        logits, cache = jt5.decode_step(
            params, cfg, jnp.asarray(dec_ids[:, step:step + 1]), cache,
            step, ckv, enc_mask)
        np.testing.assert_allclose(np.asarray(logits[0]),
                                   np.asarray(full[0, step]),
                                   rtol=2e-5, atol=2e-5)
