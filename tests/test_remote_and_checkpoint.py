"""Remote-adapter scoring rules (mocked clients) + checkpoint round-trip."""

import types

import numpy as np
import pytest
import jax.numpy as jnp
from PIL import Image

import t2v_metrics_tpu as t2v
from t2v_metrics_tpu.remote.gpt4v import GPT4VAdapter
from t2v_metrics_tpu.remote.gemini import find_first_output_token_index
from t2v_metrics_tpu.models import checkpoint as ckpt


def _fake_completion(top_tokens):
    """Build a chat-completions response with given (token, logprob) top list."""
    top = [types.SimpleNamespace(token=t, logprob=lp) for t, lp in top_tokens]
    first = types.SimpleNamespace(token=top_tokens[0][0],
                                  logprob=top_tokens[0][1], top_logprobs=top)
    choice = types.SimpleNamespace(
        message=types.SimpleNamespace(content=top_tokens[0][0]),
        logprobs=types.SimpleNamespace(content=[first]))
    return types.SimpleNamespace(choices=[choice])


class _FakeClient:
    def __init__(self, responses):
        self.responses = list(responses)
        self.calls = 0
        outer = self

        class _Completions:
            def create(self, **kw):
                outer.calls += 1
                r = outer.responses.pop(0)
                if isinstance(r, Exception):
                    raise r
                return r

        self.chat = types.SimpleNamespace(completions=_Completions())


@pytest.fixture()
def img(tmp_path):
    p = tmp_path / "x.png"
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(p)
    return str(p)


def _adapter(responses):
    return GPT4VAdapter("gpt-4o", client=_FakeClient(responses))


def test_gpt_target_in_topk(img):
    a = _adapter([_fake_completion([("Yes", np.log(0.9)), ("No", np.log(0.1))])])
    s = a.forward([img], ["a cat"])
    np.testing.assert_allclose(s, [0.9], rtol=1e-5)


def test_gpt_opposite_fallback(img):
    # target Yes absent; No present with P=0.8 -> score 1-0.8=0.2
    a = _adapter([_fake_completion([("No", np.log(0.8)), ("Maybe", np.log(0.1))])])
    s = a.forward([img], ["a cat"])
    np.testing.assert_allclose(s, [0.2], rtol=1e-5)


def test_gpt_neither_scores_zero(img):
    a = _adapter([_fake_completion([("Hm", np.log(0.5)), ("Eh", np.log(0.2))])])
    s = a.forward([img], ["a cat"])
    np.testing.assert_allclose(s, [0.0])


def test_gpt_retry_then_success(img):
    ok = _fake_completion([("Yes", np.log(0.7))])
    a = _adapter([RuntimeError("boom"), ok])
    s = a.forward([img], ["a cat"])
    np.testing.assert_allclose(s, [0.7], rtol=1e-5)
    assert a.client.calls == 2


def test_gpt_double_failure_scores_zero(img):
    a = _adapter([RuntimeError("boom"), RuntimeError("boom2")])
    s = a.forward([img], ["a cat"])
    np.testing.assert_allclose(s, [0.0])


def test_gpt_text_only():
    a = _adapter([_fake_completion([("Yes", np.log(0.6))])])
    s = a.forward(None, ["a cat"])
    np.testing.assert_allclose(s, [0.6], rtol=1e-5)


def test_gemini_thinking_skip():
    T = lambda tok: types.SimpleNamespace(token=tok)
    chosen = [T("<ctrl94>"), T("thought"), T("<ctrl95>"), T("Yes")]
    assert find_first_output_token_index(chosen) == 3
    assert find_first_output_token_index([T("Yes")]) == 0
    assert find_first_output_token_index([T("<ctrl94>"), T("x")]) is None


def test_remote_models_listed():
    models = t2v.list_all_models()
    assert "gpt-4o" in models
    assert "gemini-2.5-pro" in models


def test_checkpoint_roundtrip(tmp_path):
    params = {
        "a": {"w": jnp.arange(6.0).reshape(2, 3), "b": None},
        "blocks": [{"s": jnp.ones(4)}, {"s": jnp.zeros(4)}],
    }
    ckpt.save_params(params, str(tmp_path / "ck"))
    loaded = ckpt.load_params(str(tmp_path / "ck"))
    np.testing.assert_array_equal(np.asarray(loaded["a"]["w"]),
                                  np.asarray(params["a"]["w"]))
    assert loaded["a"]["b"] is None
    assert len(loaded["blocks"]) == 2
    np.testing.assert_array_equal(np.asarray(loaded["blocks"][1]["s"]),
                                  np.zeros(4))


def test_checkpoint_into_adapter(tmp_path):
    """Adapters accept checkpoint= dirs written by save_params."""
    from t2v_metrics_tpu.models import clip_flant5 as cft5
    from t2v_metrics_tpu.models.adapters import CLIP_T5_MODELS
    import jax

    cfg = CLIP_T5_MODELS["clip-flant5-test"]["config"]
    params = cft5.init_clip_t5(jax.random.PRNGKey(7), cfg)
    ckpt.save_params(params, str(tmp_path / "ck"))
    scorer = t2v.VQAScore(model="clip-flant5-test",
                          checkpoint=str(tmp_path / "ck"))
    img = np.zeros((32, 32, 3), np.uint8)
    s = scorer(images=[img], texts=["hello"])
    assert s.shape == (1, 1)


def test_itmscore_facade(img):
    """ITMScore end-to-end with the tiny BLIP-2 config."""
    scorer = t2v.ITMScore(model="blip2-itm-test")
    s = scorer(images=[img], texts=["a cat"])
    assert s.shape == (1, 1)
    assert 0.0 <= s[0, 0] <= 1.0
    full = scorer(images=[img, img], texts=["a cat", "a dog"])
    assert full.shape == (2, 2)
    np.testing.assert_allclose(full[0], full[1], rtol=1e-5)
    assert "blip2-itm" in t2v.list_all_models()
