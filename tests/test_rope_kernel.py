"""Fused packed-QKV rope kernel (ops/rope.py): interpret-mode parity vs
the jnp rotate-half chain, dispatch legality, and probe fallback wiring.

Reference semantics being matched: HF apply_rotary_pos_emb_vision /
apply_multimodal_rotary_pos_emb (consumed by the reference's
qwen2vl_model.py:169-301 scoring path).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from t2v_metrics_tpu.ops import rope as R
from t2v_metrics_tpu.models import decoder as dec


def _cos_sin(pos, d):
    half = d // 2
    inv = 1.0 / (10000.0 ** (np.arange(0, half, dtype=np.float32) / half))
    fr = pos[..., None] * inv
    emb = np.concatenate([fr, fr], axis=-1)
    return jnp.asarray(np.cos(emb)), jnp.asarray(np.sin(emb))


def _ref(packed, cos, sin, rot_heads, d):
    b, s, _ = packed.shape
    qk = packed[..., : rot_heads * d].reshape(b, s, rot_heads, d)
    qk = dec.apply_rope_bshd(qk, cos, sin)
    return jnp.concatenate(
        [qk.reshape(b, s, -1), packed[..., rot_heads * d:]], axis=-1)


@pytest.mark.parametrize("b,s,h,kvh,d", [
    (2, 256, 16, 16, 80),   # Qwen ViT class (MHA, d=80)
    (1, 128, 8, 2, 128),    # GQA decoder prefill class
    (2, 128, 4, 4, 64),
])
def test_rope_pack_matches_jnp_chain(b, s, h, kvh, d):
    rng = np.random.default_rng(0)
    L = (h + 2 * kvh) * d
    pk = jnp.asarray(rng.standard_normal((b, s, L)), jnp.float32)
    cos, sin = _cos_sin(rng.integers(0, 512, (b, s)).astype(np.float32), d)
    out = R.rope_pack(pk, cos, sin, h + kvh, d, interpret=True)
    want = _ref(pk, cos, sin, h + kvh, d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-5)


def test_rope_pack_v_region_untouched():
    rng = np.random.default_rng(1)
    h, kvh, d, b, s = 4, 2, 64, 1, 128
    L = (h + 2 * kvh) * d
    pk = jnp.asarray(rng.standard_normal((b, s, L)), jnp.float32)
    cos, sin = _cos_sin(rng.integers(0, 64, (b, s)).astype(np.float32), d)
    out = R.rope_pack(pk, cos, sin, h + kvh, d, interpret=True)
    np.testing.assert_array_equal(np.asarray(out[..., (h + kvh) * d:]),
                                  np.asarray(pk[..., (h + kvh) * d:]))


def test_use_kernel_gates(monkeypatch):
    # force the platform + enable gates open so every refusal below is a
    # real shape-legality decision, not the CPU short-circuit
    monkeypatch.setattr(R, "_on_tpu", lambda: True)
    monkeypatch.setattr(R, "ROPE_KERNEL", True)
    assert R.use_kernel(1, 256, 1024, 8, 64)          # legal GQA shape
    assert not R.use_kernel(1, 255, 1024, 8, 64)      # seq not mult of 128
    assert not R.use_kernel(1, 256, 1000, 8, 64)      # L not mult of d
    assert not R.use_kernel(1, 256, 1024, 8, 63)      # odd head_dim
    assert not R.use_kernel(1, 256, 1024, 20, 64)     # rot region > L
    # lane-width ceiling (measured Mosaic compile boundary on v5e):
    # 72b-class L=10240 is inside, pathological widths are refused
    assert R.use_kernel(1, 256, 10240, 80, 128)
    assert not R.use_kernel(1, 256, 32768, 224, 128)
    monkeypatch.setattr(R, "ROPE_KERNEL", False)
    assert not R.use_kernel(1, 256, 1024, 8, 64)      # env kill-switch


def test_probe_fallback_disables_rope_kernel():
    from t2v_metrics_tpu.ops.kernel_probe import _decide_fallbacks

    ok = {c: "ok maxdiff=1e-5" for c in
          ("packed_bias", "packed_causal_gqa", "packed_segment", "flat",
           "fused_ln", "quant_matmul")}
    res = {"platform": "tpu", **ok, "rope_pack": "MISMATCH maxdiff=1.0"}
    assert _decide_fallbacks(res) == ["no_rope_kernel"]
    res["rope_pack"] = "ok maxdiff=2e-3"
    assert _decide_fallbacks(res) == []
