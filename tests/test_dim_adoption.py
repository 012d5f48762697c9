"""Checkpoint dim auto-adoption for the provisional-dims families.

VERDICT r4 item 8 / reference qwen3vl_model.py:119-146: HF rebuilds the
model from the checkpoint's own config.json, so a registry guess can never
shape-error. Our native path gets the same property by inferring every
shape-determined dim from the loaded param tree (models/checkpoint.py
adopt_decoder_dims / adopt_vision_dims): loading a differently-sized
checkpoint ADAPTS (with a warning naming each adopted field) or fails with
the exact field list — never with a shape error inside the first jit trace.
"""

import dataclasses
import warnings

import numpy as np
import pytest
import jax

import t2v_metrics_tpu as t2v
from t2v_metrics_tpu.models import checkpoint as ckpt_mod
from t2v_metrics_tpu.models import decoder as dec


def _bigger_gemma4_cfg():
    from t2v_metrics_tpu.models import gemma4 as g4

    base = g4.GEMMA4_MODELS["gemma-4-test"]["config"]
    # a "real checkpoint" sized differently from the registry guess on
    # every shape-inferable axis class: depth, width, ff, heads, vocab
    return dataclasses.replace(
        base,
        text=dataclasses.replace(base.text, layers=4, d_ff=128, vocab_size=600,
                                 heads=6, kv_heads=3, head_dim=8,
                                 layer_types=None, sliding_window=None),
        vision=dataclasses.replace(base.vision, layers=3, mlp_dim=80))


def test_adopt_decoder_dims_unit():
    cfg_ckpt = _bigger_gemma4_cfg()
    from t2v_metrics_tpu.models import gemma4 as g4

    params = g4.init_gemma4(jax.random.PRNGKey(0), cfg_ckpt)
    reg = g4.GEMMA4_MODELS["gemma-4-test"]["config"]
    new_text, changed = ckpt_mod.adopt_decoder_dims(params["decoder"],
                                                    reg.text)
    assert set(changed) == {"layers", "d_ff", "vocab_size", "heads",
                            "kv_heads", "head_dim"}
    assert new_text.layers == 4 and new_text.d_ff == 128
    assert new_text.heads == 6 and new_text.kv_heads == 3
    assert new_text.head_dim == 8  # from the per-head q_norm scale
    # layer_types tracks the adopted layer count
    assert new_text.layer_types is None or len(new_text.layer_types) == 4

    new_vis, vchanged = ckpt_mod.adopt_vision_dims(params["vision"],
                                                   reg.vision)
    assert set(vchanged) == {"layers", "mlp_dim"}
    assert new_vis.layers == 3 and new_vis.mlp_dim == 80

    # identical shapes -> no change, same object
    same, ch = ckpt_mod.adopt_decoder_dims(params["decoder"], new_text)
    assert ch == {} and same is new_text


def test_gemma4_adapter_adopts_checkpoint_dims(tmp_path):
    """End to end: save a differently-sized checkpoint, load it through the
    adapter, and score — the adapter must adopt and run, warning once."""
    from t2v_metrics_tpu.models import gemma4 as g4

    cfg_ckpt = _bigger_gemma4_cfg()
    params = g4.init_gemma4(jax.random.PRNGKey(1), cfg_ckpt)
    d = str(tmp_path / "gemma4_big")
    ckpt_mod.save_params(params, d)

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        scorer = t2v.VQAScore(model="gemma-4-test", checkpoint=d)
    msgs = [str(x.message) for x in w if "adopted checkpoint dims" in
            str(x.message)]
    assert msgs and "text.layers (3, 4) -> 4" not in msgs[0]  # readable fmt
    assert "text.layers 3 -> 4" in msgs[0]
    assert scorer.model.config.text.layers == 4
    assert scorer.model.config.vision.mlp_dim == 80

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (56, 56, 3), dtype=np.uint8)
    s = scorer(images=[img], texts=["a photo of a cat"])
    assert s.shape == (1, 1) and np.isfinite(np.asarray(s)).all()


def test_molmo2_adapter_adopts_checkpoint_dims(tmp_path):
    from t2v_metrics_tpu.models import molmo2 as m2

    reg = m2.MOLMO2_MODELS["molmo2-test"]["config"]
    cfg_ckpt = dataclasses.replace(
        reg, text=dataclasses.replace(reg.text, layers=3, d_ff=112))
    params = m2.init_molmo2(jax.random.PRNGKey(2), cfg_ckpt)
    d = str(tmp_path / "molmo2_big")
    ckpt_mod.save_params(params, d)

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        scorer = t2v.VQAScore(model="molmo2-test", checkpoint=d)
    assert any("adopted checkpoint dims" in str(x.message) for x in w)
    assert scorer.model.config.text.layers == 3
    assert scorer.model.config.text.d_ff == 112

    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
    s = scorer(images=[img], texts=["a dog on grass"])
    assert s.shape == (1, 1) and np.isfinite(np.asarray(s)).all()


def test_unadoptable_divergence_fails_with_field_list(tmp_path):
    """A checkpoint whose shapes are internally inconsistent with ANY
    config (here: one block's d_ff differs from block 0's, which drives
    the adoption) must fail with the per-leaf field list, not a jit-time
    shape error."""
    from t2v_metrics_tpu.models import gemma4 as g4

    cfg = g4.GEMMA4_MODELS["gemma-4-test"]["config"]
    params = g4.init_gemma4(jax.random.PRNGKey(3), cfg)
    blk = params["decoder"]["blocks"][1]
    blk["mlp"]["gate"]["w"] = blk["mlp"]["gate"]["w"][:, :-16]
    d = str(tmp_path / "gemma4_bad")
    ckpt_mod.save_params(params, d)

    with pytest.raises(ValueError) as ei:
        t2v.VQAScore(model="gemma-4-test", checkpoint=d)
    msg = str(ei.value)
    assert "shape mismatch" in msg and "blocks/1/mlp/gate/w" in msg
    assert "PROVISIONAL" in msg


def test_config_json_outranks_registry_and_shapes(tmp_path):
    """VERDICT r4 item 8: a staged checkpoint carrying config.json pins
    fields NO shape can recover (rms_eps, rope_theta, sliding_window) —
    those must override the registry — and its stated architecture keys
    win even where shape inference also applies."""
    import json
    from t2v_metrics_tpu.models import gemma4 as g4

    cfg_ckpt = _bigger_gemma4_cfg()
    params = g4.init_gemma4(jax.random.PRNGKey(5), cfg_ckpt)
    d = str(tmp_path / "gemma4_cj")
    ckpt_mod.save_params(params, d)
    with open(f"{d}/config.json", "w") as f:
        json.dump({"text_config": {
            "rms_norm_eps": 3.25e-5,         # NOT shape-inferable
            "rope_theta": 123456.0,          # NOT shape-inferable
            "sliding_window": 24,            # NOT shape-inferable
            "num_hidden_layers": 4,          # agrees with shapes
            "hidden_act": "silu",
        }, "vision_config": {"intermediate_size": 80}}, f)

    with warnings.catch_warnings(record=True):
        warnings.simplefilter("always")
        scorer = t2v.VQAScore(model="gemma-4-test", checkpoint=d)
    tc = scorer.model.config.text
    assert tc.rms_eps == 3.25e-5
    assert tc.rope_theta == 123456.0
    assert tc.sliding_window == 24
    assert tc.layers == 4                     # shape + config.json agree
    assert scorer.model.config.vision.mlp_dim == 80

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (56, 56, 3), dtype=np.uint8)
    s = scorer(images=[img], texts=["a photo of a cat"])
    assert s.shape == (1, 1) and np.isfinite(np.asarray(s)).all()


def test_adopt_config_json_unit():
    cfg = dec.DecoderConfig(rms_eps=1e-6, rope_theta=1e6)
    new, changed = ckpt_mod.adopt_config_json(
        {"rms_norm_eps": 1e-5, "rope_theta": 10000.0,
         "layer_types": ["full_attention", "sliding_attention"],
         "unknown_key": 7, "head_dim": None},
        cfg, ckpt_mod._HF_DECODER_KEYS)
    assert new.rms_eps == 1e-5 and new.rope_theta == 10000.0
    assert new.layer_types == ("full_attention", "sliding_attention")
    assert set(changed) == {"rms_eps", "rope_theta", "layer_types"}
    # no-op dict -> same object
    same, ch = ckpt_mod.adopt_config_json({}, cfg, ckpt_mod._HF_DECODER_KEYS)
    assert same is cfg and ch == {}
