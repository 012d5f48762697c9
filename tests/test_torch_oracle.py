"""Independent torch oracles for the contract-only model families.

Gemma 4 and Molmo2 have no public HF implementation to golden-test against
(reference gemma4_model.py loads an unreleased ``AutoModelForMultimodalLM``
class; molmo2_model.py needs trust_remote_code — both unreachable in a
zero-egress env). These tests implement the documented architectures a
second time, from scratch, in torch — two independent implementations
agreeing on random weights pins the math far harder than contract tests.

Covered decoder semantics (the gemma-4-test / molmo2-test configs):
  * pre-norm and Gemma sandwich norms (post-attn + pre/post-ffw);
  * RMSNorm with the Gemma (1 + w) offset and fp32-multiply convention,
    and the OLMo2/Qwen cast-to-weight-dtype convention;
  * GQA with per-head qk-norm, q_scale override;
  * per-layer sliding/full attention with distinct local/global rope
    thetas and linear rope scaling on global layers;
  * bidirectional image-block overlay (Gemma3/4 image tokens);
  * SwiGLU MLP, tied embeddings;
  * Molmo2 vision: CLIP ViT penultimate-layer features (HF CLIPVisionModel
    semantics), kxk patch pooling, 2-layer MLP connector.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from t2v_metrics_tpu.models import decoder as dec


def _t(a):
    return torch.from_numpy(np.asarray(a, np.float32))


def _torch_rms(x, scale, eps, offset, cast_weight):
    v = x.pow(2).mean(-1, keepdim=True)
    y = x * torch.rsqrt(v + eps)
    # fp32 test weights: the cast conventions coincide; keep the branch to
    # document intent
    w = scale + offset if offset else scale
    return w * y


def _torch_rope(pos, head_dim, theta, scaling=None):
    half = head_dim // 2
    inv = 1.0 / (theta ** (torch.arange(half, dtype=torch.float32) / half))
    if scaling:
        inv = inv / scaling
    freqs = pos.float()[..., None] * inv          # (B, S, half)
    emb = torch.cat([freqs, freqs], dim=-1)
    return emb.cos(), emb.sin()


def _rot_half(x):
    x1, x2 = x.chunk(2, dim=-1)
    return torch.cat([-x2, x1], dim=-1)


def torch_decoder_logits(params, cfg, embeds, position_ids, bidir_ids=None):
    """Independent torch implementation of dec.forward (no cache)."""
    x = _t(embeds)                                 # (B, S, D)
    pos = _t(position_ids)
    b, s, _ = x.shape

    cos_g, sin_g = _torch_rope(pos, cfg.head_dim, cfg.rope_theta,
                               cfg.rope_scaling_factor)
    if cfg.local_rope_theta is not None:
        cos_l, sin_l = _torch_rope(pos, cfg.head_dim, cfg.local_rope_theta)
    else:
        cos_l, sin_l = cos_g, sin_g

    def rms(y, p):
        return _torch_rms(y, _t(p["scale"]), cfg.rms_eps, cfg.rms_offset,
                          cfg.rms_cast_weight)

    for i, blk in enumerate(params["blocks"]):
        sliding = (cfg.layer_types is not None
                   and cfg.layer_types[i % len(cfg.layer_types)]
                   == "sliding_attention")
        cos, sin = (cos_l, sin_l) if sliding else (cos_g, sin_g)
        window = cfg.sliding_window if sliding else None

        h = rms(x, blk["ln1"])
        ap = blk["attn"]
        q = h @ _t(ap["q"]["w"])
        k = h @ _t(ap["k"]["w"])
        v = h @ _t(ap["v"]["w"])
        if ap["q"].get("b") is not None:
            q = q + _t(ap["q"]["b"])
            k = k + _t(ap["k"]["b"])
            v = v + _t(ap["v"]["b"])
        q = q.view(b, s, cfg.heads, cfg.head_dim)
        k = k.view(b, s, cfg.kv_heads, cfg.head_dim)
        v = v.view(b, s, cfg.kv_heads, cfg.head_dim)
        if cfg.qk_norm:
            q = _torch_rms(q, _t(ap["q_norm"]["scale"]), cfg.rms_eps,
                           cfg.rms_offset, cfg.rms_cast_weight)
            k = _torch_rms(k, _t(ap["k_norm"]["scale"]), cfg.rms_eps,
                           cfg.rms_offset, cfg.rms_cast_weight)
        q = q * cos[:, :, None] + _rot_half(q) * sin[:, :, None]
        k = k * cos[:, :, None] + _rot_half(k) * sin[:, :, None]

        rep = cfg.heads // cfg.kv_heads
        k = k.repeat_interleave(rep, dim=2)
        v = v.repeat_interleave(rep, dim=2)
        q = q.permute(0, 2, 1, 3)                  # (B, H, S, D)
        k = k.permute(0, 2, 1, 3)
        v = v.permute(0, 2, 1, 3)
        scale = cfg.q_scale if cfg.q_scale is not None else cfg.head_dim ** -0.5
        scores = (q @ k.transpose(-1, -2)) * scale

        ii = torch.arange(s)[:, None]
        jj = torch.arange(s)[None, :]
        keep = jj <= ii
        if window is not None:
            keep = keep & (jj > ii - window)
        keep = keep.expand(b, s, s).clone()
        if bidir_ids is not None:
            bi = torch.from_numpy(np.asarray(bidir_ids))
            same = (bi[:, :, None] == bi[:, None, :]) & (bi[:, :, None] >= 0)
            keep |= same
        scores = scores.masked_fill(~keep[:, None], -1e30)
        a = torch.softmax(scores, dim=-1) @ v
        a = a.permute(0, 2, 1, 3).reshape(b, s, cfg.heads * cfg.head_dim)
        a = a @ _t(ap["o"]["w"])
        if cfg.sandwich_norms:
            a = rms(a, blk["ln1_post"])
        x = x + a

        h = rms(x, blk["ln_ff_pre"] if cfg.sandwich_norms else blk["ln2"])
        mp = blk["mlp"]
        if cfg.act == "silu":
            act = torch.nn.functional.silu(h @ _t(mp["gate"]["w"]))
        else:  # gelu_pytorch_tanh
            act = torch.nn.functional.gelu(h @ _t(mp["gate"]["w"]),
                                           approximate="tanh")
        m = (act * (h @ _t(mp["up"]["w"]))) @ _t(mp["down"]["w"])
        if cfg.sandwich_norms:
            m = rms(m, blk["ln_ff_post"])
        x = x + m

    x = rms(x, params["ln_final"])
    if cfg.tie_embeddings:
        logits = x @ _t(params["embed"]).T
    else:
        logits = x @ _t(params["lm_head"])
    return logits


def test_gemma4_decoder_matches_torch_oracle():
    """gemma-4-test text stack (sandwich norms, qk-norm with (1+w) fp32
    convention, sliding/full layer types, local theta, rope scaling,
    q_scale, tied embeddings, image-block bidir overlay)."""
    from t2v_metrics_tpu.models.gemma4 import GEMMA4_MODELS, init_gemma4

    full_cfg = GEMMA4_MODELS["gemma-4-test"]["config"]
    cfg = full_cfg.text
    params = init_gemma4(jax.random.PRNGKey(0), full_cfg)["decoder"]
    for blk in params["blocks"]:
        blk["attn"]["q_norm"] = {"scale": jnp.full((cfg.head_dim,), 0.5)}
        blk["attn"]["k_norm"] = {"scale": jnp.full((cfg.head_dim,), -0.25)}

    rng = np.random.default_rng(0)
    b, s = 2, 12
    embeds = rng.standard_normal((b, s, cfg.d_model)).astype(np.float32)
    pos = np.tile(np.arange(s), (b, 1)).astype(np.int32)
    bidir = np.full((b, s), -1, np.int32)
    bidir[:, 3:7] = 0   # an image block attends bidirectionally

    ref = torch_decoder_logits(params, cfg, embeds, pos, bidir).numpy()
    out, _ = dec.forward(params, cfg, jnp.asarray(embeds), jnp.asarray(pos),
                         jnp.ones((b, s), bool), bidir_ids=jnp.asarray(bidir))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=2e-4)


def test_qwen2_style_decoder_matches_torch_oracle():
    """Qwen2 conventions (qkv bias, no qk-norm, cast-weight RMS, untied
    head) — the baseline the other variants toggle away from."""
    cfg = dec.DecoderConfig(vocab_size=256, d_model=32, layers=2, heads=4,
                            kv_heads=2, head_dim=8, d_ff=64,
                            rope_theta=10_000.0, mrope_section=None)
    params = dec.init_decoder(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(1)
    b, s = 2, 9
    embeds = rng.standard_normal((b, s, cfg.d_model)).astype(np.float32)
    pos = np.tile(np.arange(s), (b, 1)).astype(np.int32)

    ref = torch_decoder_logits(params, cfg, embeds, pos).numpy()
    out, _ = dec.forward(params, cfg, jnp.asarray(embeds), jnp.asarray(pos),
                         jnp.ones((b, s), bool))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=2e-4)


# ---------------------------------------------------------------------------
# Molmo2: torch CLIP tower + pooling connector + OLMo2-style decoder
# ---------------------------------------------------------------------------

def torch_clip_penultimate(params, vcfg, pixels):
    """HF CLIPVisionModel semantics up to hidden_states[-2], from scratch:
    conv patch embed + cls + learned pos, pre-LN, pre-norm blocks with
    quick_gelu MLP. pixels: (B, H, W, 3) float32 (already normalized)."""
    x = _t(pixels).permute(0, 3, 1, 2)             # (B, 3, H, W)
    p_ = vcfg.patch_size
    # patch_w rows are (C, ph, pw)-flattened (ops/image.py:patchify) — the
    # torch Conv2d weight convention directly
    w = _t(params["patch_w"]).T.reshape(-1, 3, p_, p_)
    feat = torch.nn.functional.conv2d(x, w, stride=vcfg.patch_size)
    b, wd, gh, gw = feat.shape
    feat = feat.reshape(b, wd, gh * gw).permute(0, 2, 1)   # (B, T, W)
    cls = _t(params["class_emb"]).reshape(1, 1, wd).expand(b, 1, wd)
    h = torch.cat([cls, feat], dim=1)
    h = h + _t(params["pos_emb"])

    def ln(y, p):
        return torch.nn.functional.layer_norm(
            y, (wd,), _t(p["scale"]), _t(p["bias"]), 1e-5)

    h = ln(h, params["ln_pre"])
    heads = vcfg.heads
    hd = wd // heads
    n_blocks = len(params["blocks"])
    for i, blk in enumerate(params["blocks"]):
        if i == n_blocks - 1:
            break  # hidden_states[-2]: output of the L-1'th block
        r = ln(h, blk["ln1"])
        ap = blk["attn"]
        q = (r @ _t(ap["q"]["w"]) + _t(ap["q"]["b"]))
        k = (r @ _t(ap["k"]["w"]) + _t(ap["k"]["b"]))
        v = (r @ _t(ap["v"]["w"]) + _t(ap["v"]["b"]))
        t_ = q.shape[1]
        q = q.view(b, t_, heads, hd).permute(0, 2, 1, 3)
        k = k.view(b, t_, heads, hd).permute(0, 2, 1, 3)
        v = v.view(b, t_, heads, hd).permute(0, 2, 1, 3)
        s = (q @ k.transpose(-1, -2)) * hd ** -0.5
        a = torch.softmax(s, dim=-1) @ v
        a = a.permute(0, 2, 1, 3).reshape(b, t_, wd)
        h = h + (a @ _t(ap["o"]["w"]) + _t(ap["o"]["b"]))
        r = ln(h, blk["ln2"])
        g = r @ _t(blk["mlp"]["fc1"]["w"]) + _t(blk["mlp"]["fc1"]["b"])
        g = g * torch.sigmoid(1.702 * g)           # quick_gelu
        h = h + (g @ _t(blk["mlp"]["fc2"]["w"]) + _t(blk["mlp"]["fc2"]["b"]))
    return h[:, 1:]                                 # drop CLS


def test_molmo2_features_match_torch_oracle():
    from t2v_metrics_tpu.models import molmo2 as m2

    cfg = m2.MOLMO2_MODELS["molmo2-test"]["config"]
    params = m2.init_molmo2(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(2)
    px = rng.standard_normal((2, cfg.vision.image_size,
                              cfg.vision.image_size, 3)).astype(np.float32)

    feats = torch_clip_penultimate(params["vision"], cfg.vision, px)
    b, n, w = feats.shape
    side = int(n ** 0.5)
    k = cfg.pool
    pooled = feats.reshape(b, side // k, k, side // k, k, w).mean(dim=(2, 4))
    pooled = pooled.reshape(b, -1, w)
    h = pooled @ _t(params["connector"]["fc1"]["w"]) \
        + _t(params["connector"]["fc1"]["b"])
    h = torch.nn.functional.gelu(h)                # exact gelu
    ref = (h @ _t(params["connector"]["fc2"]["w"])
           + _t(params["connector"]["fc2"]["b"])).numpy()

    out = m2.image_features(params, cfg, jnp.asarray(px))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=2e-4)


def test_molmo2_decoder_matches_torch_oracle():
    """OLMo2-lineage decoder (qk-norm, no biases, rope 500k, GQA)."""
    from t2v_metrics_tpu.models import molmo2 as m2

    cfg = m2.MOLMO2_MODELS["molmo2-test"]["config"].text
    params = m2.init_molmo2(jax.random.PRNGKey(3),
                            m2.MOLMO2_MODELS["molmo2-test"]["config"])
    rng = np.random.default_rng(3)
    b, s = 2, 10
    embeds = rng.standard_normal((b, s, cfg.d_model)).astype(np.float32)
    pos = np.tile(np.arange(s), (b, 1)).astype(np.int32)

    ref = torch_decoder_logits(params["decoder"], cfg, embeds, pos).numpy()
    out, _ = dec.forward(params["decoder"], cfg, jnp.asarray(embeds),
                         jnp.asarray(pos), jnp.ones((b, s), bool))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=2e-4)


# full-fidelity suite: run with plain `pytest`; the quick tier
# (`pytest -m 'not slow'`, ~2 min) covers the API/data/ops layers
pytestmark = pytest.mark.slow
