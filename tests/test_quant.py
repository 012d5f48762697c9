"""W8A8 int8 quant path: exactness on the int8 grid, score-parity gate,
engine integration (VERDICT r4 item 2a — the quantization-error gate the
xxl >=5x path requires)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from t2v_metrics_tpu.ops import quant as Q


def test_weight_roundtrip_exact_on_grid():
    # weights already on the int8 grid with per-channel scales must
    # survive quantize->dequantize exactly
    rng = np.random.default_rng(0)
    scale = rng.uniform(1e-3, 2e-3, (16,)).astype(np.float32)
    w_int = rng.integers(-127, 128, (32, 16))
    w_int[0] = 127  # pin per-column absmax to 127 so scales roundtrip
    w = jnp.asarray(w_int * scale[None, :], jnp.float32)
    qw = Q.quantize_weight(w)
    deq = qw["w_q"].astype(jnp.float32) * qw["scale"][None, :]
    np.testing.assert_allclose(np.asarray(deq), np.asarray(w), rtol=1e-6)


def test_int8_matmul_exact_on_grid():
    # activations AND weights on the grid -> int32 accumulation is exact,
    # so the quantized matmul must equal the f32 reference to rounding
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.integers(-127, 128, (8, 32)), jnp.float32)
    w_int = rng.integers(-127, 128, (32, 16))
    w_int[0] = 127  # pin per-column absmax so weight grid == int8 grid
    w = jnp.asarray(w_int, jnp.float32) * 1e-2
    # pin per-row absmax so activation grid == int8 grid
    x = x.at[:, 0].set(127.0)
    out = Q.int8_matmul(x, Q.quantize_weight(w)["w_q"],
                        Q.quantize_weight(w)["scale"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(x @ w),
                               rtol=1e-5, atol=1e-5)


def test_mm_dispatch():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(0, 1, (4, 8)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.1, (8, 6)), jnp.float32)
    assert np.allclose(np.asarray(Q.mm(x, {"w": w})), np.asarray(x @ w))
    qout = np.asarray(Q.mm(x, Q.quantize_weight(w)))
    # ~1% relative error bound for random gaussians under W8A8
    ref = np.asarray(x @ w)
    assert np.abs(qout - ref).max() <= 0.02 * np.abs(ref).max() + 1e-3


def test_mm_packed_matches_separate():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(0, 1, (4, 8)), jnp.float32)
    ws = [Q.quantize_weight(jnp.asarray(rng.normal(0, 0.1, (8, 6)),
                                        jnp.float32)) for _ in range(3)]
    packed = np.asarray(Q.mm_packed(x, ws))
    sep = np.concatenate([np.asarray(Q.mm(x, w)) for w in ws], axis=-1)
    # per-row activation scale is shared across the pack -> identical
    np.testing.assert_allclose(packed, sep, rtol=1e-6, atol=1e-6)


def _tiny_cfg():
    from t2v_metrics_tpu.models import clip_flant5 as cft5
    from t2v_metrics_tpu.models import clip as jclip
    from t2v_metrics_tpu.models import t5 as jt5
    return cft5.CLIPT5Config(
        t5=jt5.T5Config(vocab_size=200, d_model=48, d_kv=12, d_ff=96,
                        num_heads=4, enc_layers=2, dec_layers=2,
                        num_buckets=8, max_distance=20),
        vision=jclip.CLIPVisionConfig(image_size=28, patch_size=14,
                                      width=32, layers=3, heads=4,
                                      mlp_dim=64, proj_dim=32),
        num_image_tokens=4)


def _tiny_scorer(**kw):
    import t2v_metrics_tpu as t2v
    return t2v.VQAScore(model="clip-flant5-xl", init="random",
                        config=_tiny_cfg(), dtype=jnp.float32, seed=7, **kw)


def test_quantized_score_parity_gate():
    """The parity gate: int8-quantized scores vs f32 scores on the tiny
    golden config. Bound is the documented W8A8 tolerance — scores are
    probabilities in [0, 1]; the BASELINE parity bar is <=1e-3 absolute
    and the gate enforces it on this model."""
    import numpy as np
    from PIL import Image

    rng = np.random.default_rng(4)
    imgs = [Image.fromarray(rng.integers(0, 255, (48, 64, 3), dtype=np.uint8))
            for _ in range(2)]
    texts = ["a red cube", "two dogs playing"]

    ref = _tiny_scorer()(imgs, texts)
    qs = _tiny_scorer(quant="int8")(imgs, texts)
    assert qs.shape == ref.shape == (2, 2, 1) or qs.shape == ref.shape
    err = np.abs(np.asarray(qs, np.float64) - np.asarray(ref, np.float64))
    assert err.max() <= 1e-3, f"quant score error {err.max():.2e} > 1e-3"


def test_quantize_t5_params_selective():
    """Only projection/MLP weights quantize; embeddings, lm_head, norms,
    rel_bias stay untouched — and the quantized tree still scores."""
    from t2v_metrics_tpu.models import clip_flant5 as cft5
    cfg = _tiny_cfg()
    params = cft5.init_clip_t5(jax.random.PRNGKey(0), cfg, jnp.float32)
    qt5 = Q.quantize_t5_params(params["t5"])
    blk = qt5["encoder"]["blocks"][0]
    assert "w_q" in blk["attn"]["q"] and "w" not in blk["attn"]["q"]
    assert "w_q" in blk["mlp"]["wi_0"]
    assert blk["ln1"]["scale"].dtype == jnp.float32  # norm untouched
    assert qt5["shared_emb"].dtype == jnp.float32
    if "lm_head" in qt5:
        assert not isinstance(qt5["lm_head"], dict)
    dblk = qt5["decoder"]["blocks"][0]
    assert "w_q" in dblk["cross"]["k"]


def test_quant_sharding_specs():
    """w_q/scale leaves get the same TP layout as the bf16 weights they
    replace (col-sharded projections split scale over tp; row-sharded
    keep scale replicated)."""
    from jax.sharding import PartitionSpec as P
    from t2v_metrics_tpu.models import clip_flant5 as cft5
    from t2v_metrics_tpu.parallel import mesh as pmesh

    cfg = _tiny_cfg()
    params = cft5.init_clip_t5(jax.random.PRNGKey(0), cfg, jnp.float32)
    params["t5"] = Q.quantize_t5_params(params["t5"])
    specs = pmesh.partition_specs(params)
    blk = specs["t5"]["encoder"]["blocks"][0]
    assert blk["attn"]["q"]["w_q"] == P(None, "tp")
    assert blk["attn"]["q"]["scale"] == P("tp")
    assert blk["attn"]["o"]["w_q"] == P("tp", None)
    assert blk["attn"]["o"]["scale"] == P()
    assert blk["mlp"]["wi_0"]["w_q"] == P(None, "tp")
    assert blk["mlp"]["wo"]["w_q"] == P("tp", None)
    # RMSNorm scales unaffected by the quant rules (replicated either way)
    from jax.sharding import PartitionSpec as PS
    assert blk["ln1"]["scale"] in (PS(), PS(None))


def test_quant_matmul_kernel_interpret_parity():
    """Pallas fused-epilogue W8A8 matmul == the jnp dequant chain
    (interpret mode; the TPU path is numerically the same program)."""
    from t2v_metrics_tpu.ops import quant_matmul as qk

    rng = np.random.default_rng(9)
    M, K, N = 256, 512, 256
    x_q = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)
    w_q = jnp.asarray(rng.integers(-127, 128, (K, N)), jnp.int8)
    xs = jnp.asarray(rng.uniform(1e-3, 2e-3, (M, 1)), jnp.float32)
    ws = jnp.asarray(rng.uniform(1e-3, 2e-3, (N,)), jnp.float32)

    ref = (jax.lax.dot_general(x_q, w_q, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
           .astype(jnp.float32) * xs * ws).astype(jnp.bfloat16)
    out = qk.quant_matmul(x_q, w_q, xs, ws, bm=128, bk=256, bn=128,
                          interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_quant_matmul_use_kernel_gate(monkeypatch):
    from t2v_metrics_tpu.ops import quant_matmul as qk
    monkeypatch.setattr(qk, "_on_tpu", lambda: True)
    monkeypatch.setattr(qk, "QUANT_KERNEL", True)
    assert qk.use_kernel(61440, 4096, 12288)    # xxl qkv at chunk 96
    assert qk.use_kernel(384, 10240, 4096)      # decoder wo at chunk 96
    assert not qk.use_kernel(100, 4096, 4096)   # ragged rows
    assert not qk.use_kernel(256, 100, 256)     # ragged K
    monkeypatch.setattr(qk, "QUANT_KERNEL", False)
    assert not qk.use_kernel(61440, 4096, 12288)


def test_vit_quant_score_parity():
    """int8+vit mode (T5 AND CLIP vision tower quantized): scores still
    within the BASELINE 1e-3 gate on the tiny golden config."""
    from PIL import Image

    rng = np.random.default_rng(6)
    imgs = [Image.fromarray(rng.integers(0, 255, (48, 64, 3),
                                         dtype=np.uint8))]
    ref = _tiny_scorer()(imgs, ["a red cube"])
    qs = _tiny_scorer(quant="int8+vit")(imgs, ["a red cube"])
    err = np.abs(np.asarray(qs, np.float64) - np.asarray(ref, np.float64))
    assert err.max() <= 1e-3, f"int8+vit score error {err.max():.2e}"


def test_quantize_clip_vision_selective():
    from t2v_metrics_tpu.models import clip as jclip
    cfg = _tiny_cfg().vision
    vis = jclip.init_vision(jax.random.PRNGKey(3), cfg, jnp.float32)
    qv = Q.quantize_clip_vision_params(vis)
    blk = qv["blocks"][0]
    assert "w_q" in blk["attn"]["q"] and "b" in blk["attn"]["q"]
    assert "w_q" in blk["mlp"]["fc1"]
    assert blk["ln1"]["scale"].dtype == jnp.float32
    assert not isinstance(qv["patch_w"], dict)   # patch embed untouched
    # quantized tower still runs and matches the f32 tower loosely
    rng = np.random.default_rng(4)
    px = jnp.asarray(rng.standard_normal(
        (1, cfg.image_size, cfg.image_size, 3)), jnp.float32)
    a = np.asarray(jclip.vision_tower(vis, cfg, px))
    b = np.asarray(jclip.vision_tower(qv, cfg, px))
    assert np.abs(a - b).max() <= 0.05 * max(1.0, np.abs(a).max())
