"""Numerics tests for core ops: resize parity with PIL, attention kernels."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from PIL import Image

from t2v_metrics_tpu.ops import image as image_ops
from t2v_metrics_tpu.ops.attention import attention_reference, flash_attention


class TestResize:
    @pytest.mark.parametrize("in_size,out_size", [(512, 224), (137, 224), (336, 336), (224, 336)])
    def test_pil_bicubic_parity(self, in_size, out_size):
        rng = np.random.default_rng(0)
        img = rng.integers(0, 256, (in_size, in_size, 3), dtype=np.uint8)
        pil = Image.fromarray(img).resize((out_size, out_size), Image.BICUBIC)
        ours = image_ops.resize_np(img.astype(np.float32), out_size, out_size,
                                   "bicubic", quantize_uint8=True)
        # PIL uses fixed-point coefficients; allow 1 LSB on a few pixels.
        diff = np.abs(ours - np.asarray(pil, dtype=np.float32))
        assert diff.max() <= 1.0
        assert (diff > 0).mean() < 0.02

    def test_weights_row_stochastic(self):
        w = image_ops.resize_weights(512, 224)
        np.testing.assert_allclose(w.sum(axis=1), 1.0, atol=1e-5)

    def test_device_resize_matches_np(self):
        rng = np.random.default_rng(1)
        img = rng.random((2, 64, 48, 3), dtype=np.float32)
        a = image_ops.resize_np(img, 32, 32)
        b = np.asarray(image_ops.resize(jnp.asarray(img), 32, 32))
        np.testing.assert_allclose(a, b, atol=1e-4)

    def test_shortest_side(self):
        assert image_ops.resize_shortest_side((480, 640), 224) == (224, 299)
        assert image_ops.resize_shortest_side((640, 480), 224) == (299, 224)

    def test_center_crop(self):
        img = jnp.arange(5 * 6 * 1, dtype=jnp.float32).reshape(5, 6, 1)
        out = image_ops.center_crop(img, 3, 4)
        assert out.shape == (3, 4, 1)
        assert out[0, 0, 0] == img[1, 1, 0]

    def test_patchify_shape(self):
        img = jnp.zeros((2, 32, 32, 3))
        p = image_ops.patchify(img, 16)
        assert p.shape == (2, 4, 768)

    def test_patchify_matches_conv(self):
        # patchify(img) @ W_flat == Conv2d(img, W) for torch layout (O, C, kh, kw)
        import torch

        rng = np.random.default_rng(2)
        img = rng.random((1, 3, 8, 8), dtype=np.float32)  # NCHW for torch
        w = rng.random((5, 3, 4, 4), dtype=np.float32)
        conv = torch.nn.functional.conv2d(torch.from_numpy(img), torch.from_numpy(w), stride=4)
        conv = conv.permute(0, 2, 3, 1).reshape(1, -1, 5).numpy()  # (1, 4, 5)

        img_hwc = jnp.asarray(img.transpose(0, 2, 3, 1))
        patches = image_ops.patchify(img_hwc, 4)  # (1, 4, 48)
        ours = patches @ jnp.asarray(w.reshape(5, -1).T)
        np.testing.assert_allclose(np.asarray(ours), conv, atol=1e-4)

    def test_smart_resize(self):
        h, w = image_ops.smart_resize(480, 640)
        assert h % 28 == 0 and w % 28 == 0

    def test_resize_flat_matches_resize(self):
        rng = np.random.default_rng(5)
        img = rng.random((2, 40, 56, 3), dtype=np.float32)
        a = np.asarray(image_ops.resize(jnp.asarray(img), 24, 32))
        flat = jnp.asarray(img.reshape(2, 40, 56 * 3))
        b = np.asarray(image_ops.resize_flat(flat, 24, 32, 3))
        np.testing.assert_allclose(a.reshape(2, 24, 32 * 3), b, atol=1e-5)

    def test_pad_crop_normalize_flat(self):
        rng = np.random.default_rng(6)
        img = rng.random((2, 30, 20, 3), dtype=np.float32)
        flat = jnp.asarray(img.reshape(2, 30, 60))
        fill = [0.3, 0.5, 0.7]
        a = np.asarray(image_ops.pad_square(jnp.asarray(img), fill))
        b = np.asarray(image_ops.pad_square_flat(flat, 3, fill))
        np.testing.assert_allclose(a.reshape(2, 30, 90), b, atol=1e-6)
        a = np.asarray(image_ops.center_crop(jnp.asarray(img), 16, 12))
        b = np.asarray(image_ops.center_crop_flat(flat, 16, 12, 3))
        np.testing.assert_allclose(a.reshape(2, 16, 36), b, atol=1e-6)
        mean, std = [0.1, 0.2, 0.3], [0.5, 0.6, 0.7]
        a = np.asarray(image_ops.normalize(jnp.asarray(img), mean, std))
        b = np.asarray(image_ops.normalize_flat(flat, mean, std))
        np.testing.assert_allclose(a.reshape(2, 30, 60), b, atol=1e-6)

    def test_patchify_flat_with_perm_matches_patchify(self):
        rng = np.random.default_rng(7)
        img = rng.random((2, 8, 12, 3), dtype=np.float32)
        w = rng.random((3 * 4 * 4, 5), dtype=np.float32)
        a = np.asarray(image_ops.patchify(jnp.asarray(img), 4) @ jnp.asarray(w))
        flat = jnp.asarray(img.reshape(2, 8, 36))
        perm = image_ops.patch_perm(4, 3)
        b = np.asarray(image_ops.patchify_flat(flat, 4, 3) @ jnp.asarray(w[perm]))
        np.testing.assert_allclose(a, b, atol=1e-5)


class TestAttention:
    def _rand(self, *shape):
        return jnp.asarray(np.random.default_rng(0).standard_normal(shape, dtype=np.float32))

    def test_reference_vs_naive(self):
        q = self._rand(2, 3, 5, 8)
        k = self._rand(2, 3, 7, 8)
        v = self._rand(2, 3, 7, 8)
        out = attention_reference(q, k, v)
        s = np.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(8)
        p = jax.nn.softmax(jnp.asarray(s), axis=-1)
        expect = np.einsum("bhqk,bhkd->bhqd", p, v)
        np.testing.assert_allclose(np.asarray(out), expect, atol=1e-5)

    def test_flash_matches_reference(self):
        q = self._rand(1, 2, 130, 16)
        k = self._rand(1, 2, 200, 16)
        v = self._rand(1, 2, 200, 16)
        ref = attention_reference(q, k, v)
        out = flash_attention(q, k, v, block_q=128, block_k=128, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_flash_causal_and_mask(self):
        q = self._rand(2, 2, 64, 8)
        k = self._rand(2, 2, 64, 8)
        v = self._rand(2, 2, 64, 8)
        mask = jnp.asarray(np.random.default_rng(1).random((2, 64)) > 0.3)
        ref = attention_reference(q, k, v, kv_mask=mask, causal=True)
        out = flash_attention(q, k, v, kv_mask=mask, causal=True,
                              block_q=64, block_k=64, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_flash_with_bias(self):
        q = self._rand(1, 4, 32, 8)
        k = self._rand(1, 4, 48, 8)
        v = self._rand(1, 4, 48, 8)
        bias = self._rand(1, 4, 32, 48)
        ref = attention_reference(q, k, v, bias=bias, scale=1.0)
        out = flash_attention(q, k, v, bias=bias, scale=1.0,
                              block_q=32, block_k=32, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_flash_t5_style_broadcast_bias(self):
        # bias batch dim 1, broadcast over batch 2 (T5 relative position bias)
        q = self._rand(2, 2, 16, 8)
        k = self._rand(2, 2, 16, 8)
        v = self._rand(2, 2, 16, 8)
        bias = self._rand(1, 2, 16, 16)
        ref = attention_reference(q, k, v, bias=bias, scale=1.0)
        out = flash_attention(q, k, v, bias=bias, scale=1.0,
                              block_q=16, block_k=16, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


class TestSegmentAttention:
    def _rand(self, *shape):
        return jnp.asarray(np.random.default_rng(3).standard_normal(shape, dtype=np.float32))

    def test_segment_ids_reference(self):
        q = self._rand(1, 2, 8, 4)
        seg = jnp.asarray([[0, 0, 0, 1, 1, 2, 2, 2]])
        out = attention_reference(q, q, q, segment_ids=seg)
        # block 0 must equal attention over only its own slice
        sub = attention_reference(q[:, :, :3], q[:, :, :3], q[:, :, :3])
        np.testing.assert_allclose(np.asarray(out[:, :, :3]), np.asarray(sub), atol=1e-5)

    def test_flash_segment_matches_reference(self):
        q = self._rand(2, 2, 96, 8)
        seg = jnp.asarray(np.random.default_rng(4).integers(0, 3, (2, 96)))
        ref = attention_reference(q, q, q, segment_ids=seg)
        out = flash_attention(q, q, q, segment_ids=seg, block_q=32, block_k=32,
                              interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


class TestInKernelRelBias:
    """Flash kernel's in-kernel T5 relative-position bias must match the
    reference path's materialized bias exactly (same bucket formula)."""

    @pytest.mark.parametrize("bidirectional", [True, False])
    @pytest.mark.parametrize("s", [48, 160])
    def test_matches_dense_bias(self, bidirectional, s):
        import numpy as np
        from t2v_metrics_tpu.ops.attention import (attention_reference,
                                                   flash_attention)
        from t2v_metrics_tpu.models.t5 import compute_position_bias

        rng = np.random.default_rng(0)
        h, d, nb, md = 4, 32, 32, 128
        q = jnp.asarray(rng.standard_normal((2, h, s, d), dtype=np.float32))
        k = jnp.asarray(rng.standard_normal((2, h, s, d), dtype=np.float32))
        v = jnp.asarray(rng.standard_normal((2, h, s, d), dtype=np.float32))
        rel_emb = jnp.asarray(rng.standard_normal((nb, h), dtype=np.float32))

        dense = compute_position_bias(rel_emb, s, s, bidirectional, nb, md)
        ref = attention_reference(q, k, v, bias=dense, scale=1.0,
                                  causal=not bidirectional)
        out = flash_attention(q, k, v, scale=1.0, causal=not bidirectional,
                              rel_bias=rel_emb.T,
                              rel_cfg=(bidirectional, nb, md, 0),
                              block_q=32, block_k=32, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_kv_mask_combination(self):
        import numpy as np
        from t2v_metrics_tpu.ops.attention import (attention_reference,
                                                   flash_attention)
        from t2v_metrics_tpu.models.t5 import compute_position_bias

        rng = np.random.default_rng(1)
        h, d, s, nb, md = 2, 16, 64, 32, 128
        q = jnp.asarray(rng.standard_normal((1, h, s, d), dtype=np.float32))
        k = jnp.asarray(rng.standard_normal((1, h, s, d), dtype=np.float32))
        v = jnp.asarray(rng.standard_normal((1, h, s, d), dtype=np.float32))
        rel_emb = jnp.asarray(rng.standard_normal((nb, h), dtype=np.float32))
        mask = np.ones((1, s), bool)
        mask[0, 40:] = False

        dense = compute_position_bias(rel_emb, s, s, True, nb, md)
        ref = attention_reference(q, k, v, bias=dense, scale=1.0,
                                  kv_mask=jnp.asarray(mask))
        out = flash_attention(q, k, v, scale=1.0,
                              kv_mask=jnp.asarray(mask), rel_bias=rel_emb.T,
                              rel_cfg=(True, nb, md, 0),
                              block_q=32, block_k=32, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)


class TestFlashBidirOverlay:
    """Bidirectional image-group overlay inside the flash kernel
    (Gemma3/PaliGemma scoring moves off the XLA fallback)."""

    @pytest.mark.parametrize("window", [None, 16])
    def test_matches_reference(self, window):
        import numpy as np
        from t2v_metrics_tpu.ops.attention import (attention_reference,
                                                   flash_attention)

        rng = np.random.default_rng(0)
        b, h, s, d = 2, 2, 96, 16
        q = jnp.asarray(rng.standard_normal((b, h, s, d), dtype=np.float32))
        k = jnp.asarray(rng.standard_normal((b, h, s, d), dtype=np.float32))
        v = jnp.asarray(rng.standard_normal((b, h, s, d), dtype=np.float32))
        # two image blocks per row + text elsewhere
        bidir = np.full((b, s), -1, np.int32)
        bidir[:, 8:24] = 0
        bidir[:, 40:56] = 1
        kv_mask = np.ones((b, s), bool)
        # cut must leave every query row >= 1 valid in-window key: rows past
        # the cut are fully masked otherwise (flash yields 0, reference a
        # meaningless uniform average — both garbage, not comparable)
        kv_mask[1, 88:] = False

        ref = attention_reference(q, k, v, causal=True,
                                  kv_mask=jnp.asarray(kv_mask),
                                  local_window=window,
                                  bidir_ids=jnp.asarray(bidir))
        out = flash_attention(q, k, v, causal=True,
                              kv_mask=jnp.asarray(kv_mask),
                              local_window=window,
                              bidir_ids=jnp.asarray(bidir),
                              block_q=32, block_k=32, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_dispatch_uses_flash_on_causal_bidir(self):
        """attention() must not force the reference path for causal+bidir
        when flash is requested."""
        import numpy as np
        from t2v_metrics_tpu.ops import attention as A

        rng = np.random.default_rng(1)
        q = jnp.asarray(rng.standard_normal((1, 2, 64, 16), dtype=np.float32))
        bidir = np.full((1, 64), -1, np.int32)
        bidir[0, 4:12] = 0
        called = {}
        orig = A.flash_attention

        def spy(*a, **kw):
            called["flash"] = True
            kw["interpret"] = True
            return orig(*a, **kw)

        A.flash_attention = spy
        try:
            out = A.attention(q, q, q, causal=True,
                              bidir_ids=jnp.asarray(bidir), impl="flash")
        finally:
            A.flash_attention = orig
        assert called.get("flash"), "causal+bidir fell back to reference"
        ref = A.attention_reference(q, q, q, causal=True,
                                    bidir_ids=jnp.asarray(bidir))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)


class TestDevicePreprocess:
    """On-device preprocessing fast path (engine ships source-res uint8)."""

    def test_pad_square_matches_host(self):
        from t2v_metrics_tpu.media.images import expand2square_np

        rng = np.random.default_rng(0)
        for h, w in [(100, 73), (73, 100), (64, 64)]:
            img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
            fill = (122, 116, 104)
            host = expand2square_np(img, fill)
            dev = image_ops.pad_square(
                jnp.asarray(img, jnp.float32) / 255.0,
                [f / 255.0 for f in fill])
            np.testing.assert_allclose(np.asarray(dev) * 255.0,
                                       host.astype(np.float32), atol=1e-4)

    def test_engine_device_preprocess_matches_pil(self):
        """encode_images on same-shape uint8 arrays routes pad+resize to the
        device and must match the host PIL path up to PIL's per-pass uint8
        rounding (the device path stays in float)."""
        import t2v_metrics_tpu as t2v
        from t2v_metrics_tpu.engine import scoring as S

        scorer = t2v.VQAScore(model="clip-flant5-test", init="random")
        eng = scorer.model.engine
        rng = np.random.default_rng(7)
        imgs = [rng.integers(0, 255, (100, 73, 3), dtype=np.uint8)
                for _ in range(4)]

        assert S._device_resize_batch(imgs) is not None
        # mixed shapes / dtypes / paths fall back to the host path
        assert S._device_resize_batch(
            imgs + [rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)]) is None
        assert S._device_resize_batch(["a.jpg"]) is None
        assert S._device_resize_batch(
            [i.astype(np.float32) for i in imgs]) is None

        fast = np.asarray(eng.encode_images(imgs))
        orig = S._device_resize_batch
        try:
            S._device_resize_batch = lambda images, **kw: None
            host = np.asarray(eng.encode_images(imgs))
        finally:
            S._device_resize_batch = orig
        scale = np.abs(host).max()
        assert np.abs(fast - host).max() / scale < 0.02  # uint8 rounding

    def test_clip_engine_device_preprocess(self):
        """CLIPScore path: shortest-side resize + center crop on device."""
        import t2v_metrics_tpu as t2v
        from t2v_metrics_tpu.engine import scoring as S

        scorer = t2v.CLIPScore(model="clipscore-test", init="random")
        eng = scorer.model.engine
        rng = np.random.default_rng(3)
        imgs = [rng.integers(0, 255, (96, 80, 3), dtype=np.uint8)
                for _ in range(3)]
        texts = ["a dog", "a cat"]
        fast = eng.score_matrix(imgs, texts)
        orig = S._device_resize_batch
        try:
            S._device_resize_batch = lambda images, **kw: None
            host = eng.score_matrix(imgs, texts)
        finally:
            S._device_resize_batch = orig
        np.testing.assert_allclose(fast, host, atol=5e-3)


class TestFusedLayerNorm:
    """Pallas fused LayerNorm (ops/norms.py) vs the XLA reference."""

    def test_matches_xla(self):
        from t2v_metrics_tpu.ops.layers import layer_norm_xla
        from t2v_metrics_tpu.ops.norms import layer_norm_fused

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(4, 16, 256)).astype(np.float32)
                        * 3.0, jnp.bfloat16)
        scale = jnp.asarray(rng.normal(size=(256,)), jnp.bfloat16)
        bias = jnp.asarray(rng.normal(size=(256,)), jnp.bfloat16)
        ref = layer_norm_xla(x, scale, bias, 1e-5)
        fused = layer_norm_fused(x, scale, bias, 1e-5, interpret=True)
        np.testing.assert_allclose(np.asarray(fused, np.float32),
                                   np.asarray(ref, np.float32),
                                   atol=2e-2, rtol=2e-2)

    def test_no_bias_and_odd_rows(self):
        from t2v_metrics_tpu.ops.layers import layer_norm_xla
        from t2v_metrics_tpu.ops.norms import layer_norm_fused

        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(24, 128)), jnp.float32)
        scale = jnp.asarray(rng.normal(size=(128,)), jnp.float32)
        ref = layer_norm_xla(x, scale, None, 1e-6)
        fused = layer_norm_fused(x, scale, None, 1e-6, interpret=True)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)


class TestFusedRMSNorm:
    """Pallas fused RMSNorm (ops/norms.py) vs the XLA reference — must be
    bit-identical including the HF T5 cast-to-weight-dtype-before-scale
    rounding (parity-critical: T5 runs 2 per encoder layer)."""

    @pytest.mark.parametrize("cast_wd", [True, False])
    def test_matches_xla_bf16(self, cast_wd):
        from t2v_metrics_tpu.ops.layers import rms_norm_xla
        from t2v_metrics_tpu.ops.norms import rms_norm_fused

        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(size=(8, 16, 256)).astype(np.float32)
                        * 3.0, jnp.bfloat16)
        scale = jnp.asarray(rng.normal(size=(256,)), jnp.bfloat16)
        ref = rms_norm_xla(x, scale, 1e-6, 0.0, cast_wd)
        fused = rms_norm_fused(x, scale, 1e-6, 0.0, cast_wd, interpret=True)
        np.testing.assert_array_equal(np.asarray(fused, np.float32),
                                      np.asarray(ref, np.float32))

    def test_gemma_offset(self):
        from t2v_metrics_tpu.ops.layers import rms_norm_xla
        from t2v_metrics_tpu.ops.norms import rms_norm_fused

        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(size=(16, 128)), jnp.float32)
        scale = jnp.asarray(rng.normal(size=(128,)) * 0.1, jnp.float32)
        ref = rms_norm_xla(x, scale, 1e-6, 1.0, False)
        fused = rms_norm_fused(x, scale, 1e-6, 1.0, False, interpret=True)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                                   atol=1e-6, rtol=1e-6)


class TestFlatFlashAttention:
    """Head-major (B,S,H,D) flash kernel vs the (B,H,S,D) reference."""

    def _check(self, B=2, S=160, H=8, D=32, Sk=None, bias=False,
               kv_mask=False, causal=False):
        from t2v_metrics_tpu.ops.attention import (attention_reference,
                                                   flash_attention_flat)
        Sk = Sk or S
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.normal(size=(B, S, H * D)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(B, Sk, H * D)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(B, Sk, H * D)), jnp.float32)
        b = (jnp.asarray(rng.normal(size=(1, H, S, Sk)), jnp.float32)
             if bias else None)
        m = (jnp.asarray(rng.random((B, Sk)) > 0.2) if kv_mask else None)
        heads = lambda x, s: x.reshape(B, s, H, D).transpose(0, 2, 1, 3)
        ref = attention_reference(heads(q, S), heads(k, Sk), heads(v, Sk),
                                  bias=b, kv_mask=m, causal=causal)
        out = flash_attention_flat(q, k, v, H, bias=b, kv_mask=m,
                                   causal=causal, interpret=True)
        ref_flat = ref.transpose(0, 2, 1, 3).reshape(B, S, H * D)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref_flat),
                                   atol=2e-5, rtol=2e-5)

    def test_plain(self):
        self._check()

    def test_bias(self):
        self._check(bias=True)

    def test_kv_mask(self):
        self._check(kv_mask=True)

    def test_causal_bias_mask(self):
        self._check(bias=True, kv_mask=True, causal=True)

    def test_odd_seq_pad(self):
        self._check(S=137, Sk=137, kv_mask=True)

    def test_head_group_split(self):
        # H=16 with a bias big enough to force hg=8 grouping
        self._check(S=256, H=16, bias=True)

    def test_gqa_kv_heads(self):
        # grouped-query attention: kv lane-slicing must match repeat
        from t2v_metrics_tpu.ops.attention import (attention_reference,
                                                   flash_attention_flat)
        B, S, H, KV, D = 2, 160, 8, 2, 32
        rng = np.random.default_rng(3)
        q = jnp.asarray(rng.normal(size=(B, S, H * D)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(B, S, KV * D)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(B, S, KV * D)), jnp.float32)
        m = jnp.asarray(rng.random((B, S)) > 0.2).at[:, 0].set(True)
        heads = lambda x, n: x.reshape(B, S, n, D).transpose(0, 2, 1, 3)
        kr = jnp.repeat(heads(k, KV), H // KV, axis=1)
        vr = jnp.repeat(heads(v, KV), H // KV, axis=1)
        ref = attention_reference(heads(q, H), kr, vr, kv_mask=m,
                                  causal=True)
        out = flash_attention_flat(q, k, v, H, kv_heads=KV, kv_mask=m,
                                   causal=True, interpret=True)
        ref_flat = ref.transpose(0, 2, 1, 3).reshape(B, S, H * D)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref_flat),
                                   atol=2e-5, rtol=2e-5)

    def test_segment_ids(self):
        from t2v_metrics_tpu.ops.attention import (attention_reference,
                                                   flash_attention_flat)
        B, S, H, D = 1, 160, 4, 32
        rng = np.random.default_rng(5)
        q = jnp.asarray(rng.normal(size=(B, S, H * D)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(B, S, H * D)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(B, S, H * D)), jnp.float32)
        seg = jnp.asarray((np.arange(S) // 40)[None])  # 4 windows
        heads = lambda x: x.reshape(B, S, H, D).transpose(0, 2, 1, 3)
        ref = attention_reference(heads(q), heads(k), heads(v),
                                  segment_ids=seg)
        out = flash_attention_flat(q, k, v, H, segment_ids=seg,
                                   interpret=True)
        ref_flat = ref.transpose(0, 2, 1, 3).reshape(B, S, H * D)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref_flat),
                                   atol=2e-5, rtol=2e-5)

    def test_local_window_bidir(self):
        # Gemma3 sliding layer + image-block overlay through the flat kernel
        from t2v_metrics_tpu.ops.attention import (attention_reference,
                                                   flash_attention_flat)
        B, S, H, D = 2, 160, 4, 32
        rng = np.random.default_rng(7)
        q = jnp.asarray(rng.normal(size=(B, S, H * D)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(B, S, H * D)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(B, S, H * D)), jnp.float32)
        bid = np.full((B, S), -1)
        bid[:, 40:72] = 0   # one image block
        bid[1, 90:122] = 1
        bid = jnp.asarray(bid)
        heads = lambda x: x.reshape(B, S, H, D).transpose(0, 2, 1, 3)
        ref = attention_reference(heads(q), heads(k), heads(v), causal=True,
                                  local_window=48, bidir_ids=bid)
        out = flash_attention_flat(q, k, v, H, causal=True, local_window=48,
                                   bidir_ids=bid, interpret=True)
        ref_flat = ref.transpose(0, 2, 1, 3).reshape(B, S, H * D)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref_flat),
                                   atol=2e-5, rtol=2e-5)


class TestPackedFlashAttention:
    """Packed-qkv flash kernel (lane-offset views of one array) vs the
    unpacked flat kernel and the reference path."""

    def _mk(self, B, S, H, KV, D, seed=0):
        rng = np.random.default_rng(seed)
        q = rng.normal(size=(B, S, H * D)).astype(np.float32)
        k = rng.normal(size=(B, S, KV * D)).astype(np.float32)
        v = rng.normal(size=(B, S, KV * D)).astype(np.float32)
        packed = jnp.asarray(np.concatenate([q, k, v], axis=-1))
        return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), packed

    def test_mha_bias_mask(self):
        from t2v_metrics_tpu.ops.attention import (flash_attention_flat,
                                                   flash_attention_flat_packed)
        B, S, H, D = 2, 256, 8, 32
        rng = np.random.default_rng(1)
        q, k, v, packed = self._mk(B, S, H, H, D)
        bias = jnp.asarray(rng.normal(size=(1, H, S, S)), jnp.float32)
        mask = jnp.asarray(rng.random((B, S)) > 0.2)
        ref = flash_attention_flat(q, k, v, H, bias=bias, kv_mask=mask,
                                   scale=1.0, interpret=True)
        out = flash_attention_flat_packed(packed, H, bias=bias, kv_mask=mask,
                                          scale=1.0, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_mha_head_groups(self):
        # big bias forces hg < H: the packed k/v lane offsets must stay
        # block-aligned across groups
        from t2v_metrics_tpu.ops.attention import (flash_attention_flat,
                                                   flash_attention_flat_packed)
        B, S, H, D = 1, 256, 16, 32
        rng = np.random.default_rng(2)
        q, k, v, packed = self._mk(B, S, H, H, D, seed=2)
        bias = jnp.asarray(rng.normal(size=(1, H, S, S)), jnp.float32)
        ref = flash_attention_flat(q, k, v, H, bias=bias, interpret=True)
        out = flash_attention_flat_packed(packed, H, bias=bias,
                                          interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_gqa(self):
        from t2v_metrics_tpu.ops.attention import (flash_attention_flat,
                                                   flash_attention_flat_packed)
        # D=64 keeps the packed k/v lane width (KV/rep groups) a 128
        # multiple — the packed kernel's legality rule on real TPUs
        # (_flat_plan packed=True); D=32 here would be interpret-only
        B, S, H, KV, D = 2, 160, 8, 2, 64
        q, k, v, packed = self._mk(B, S, H, KV, D, seed=3)
        m = jnp.asarray(np.random.default_rng(3).random((B, S)) > 0.2
                        ).at[:, 0].set(True)
        ref = flash_attention_flat(q, k, v, H, kv_heads=KV, kv_mask=m,
                                   causal=True, interpret=True)
        out = flash_attention_flat_packed(packed, H, kv_heads=KV, kv_mask=m,
                                          causal=True, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_packed_legality_gate(self):
        # Lane-offset views of the packed array can never use the "block
        # == full array last dim" legality escape: 1 head x d=64 is legal
        # unpacked but must DISQUALIFY packed (the r4 driver entry()
        # compile check caught this as a Mosaic lowering ValueError).
        from t2v_metrics_tpu.ops.attention import _flat_plan
        assert _flat_plan(128, 128, 1, None, 64, False)[2] == 1
        assert _flat_plan(128, 128, 1, None, 64, False, packed=True)[2] is None
        # GQA whose kv block lane width is 64 (< 128): interpret-only
        assert _flat_plan(160, 160, 8, 2, 32, False, packed=True)[2] is None
        # legal packed GQA: kv lane width (8/4 groups x 64) = 128
        assert _flat_plan(160, 160, 8, 2, 64, False, packed=True)[2] == 8

    def test_dispatch_fallback_slices(self):
        # off-TPU the attention_flat_packed dispatcher must slice the
        # packed projection and agree with the separate-q/k/v path
        from t2v_metrics_tpu.ops.attention import (attention_flat,
                                                   attention_flat_packed)
        B, S, H, D = 2, 96, 4, 16
        q, k, v, packed = self._mk(B, S, H, H, D, seed=4)
        ref = attention_flat(q, k, v, H)
        out = attention_flat_packed(packed, H)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)
