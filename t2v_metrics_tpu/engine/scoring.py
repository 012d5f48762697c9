"""Scoring engines: host batch assembly + jit-cached device functions.

Replaces the reference's per-pair Python loop (reference score.py:104-106 —
vision encode + prefill re-run for every (image, text) pair) with:

  1. one vision-tower pass per unique image (M), cached as (M, T, D) feats;
  2. one batched teacher-forced encoder+decoder pass per chunk of pairs,
     shapes padded to buckets so XLA compiles a handful of programs total;
  3. fp32 log-softmax on device; only the (P,) score vector returns to host.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..constants import DEFAULT_QUESTION_TEMPLATE, DEFAULT_ANSWER_TEMPLATE, IMAGE_TOKEN_INDEX
from ..media.images import load_batch
from ..models import clip_flant5 as cft5
from ..models import clip as jclip
from ..models import t5 as jt5
from ..tokenization import splice_image_tokens_t5
from ..parallel import mesh as pmesh


def _bucket(n: int, buckets) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1] if n <= buckets[-1] else ((n + 63) // 64) * 64


# Device-side preprocess pays only while the extra pixels shipped are cheap:
# on the axon tunnel (~20-45 MB/s H2D) transfer bytes dominate, so sources
# larger than ~the model input size go through the host-resize path (PIL
# pipeline, threaded), which ships the small resized uint8 batch instead.
_DEVICE_RESIZE_MAX_SIDE = int(
    __import__("os").environ.get("T2V_DEVICE_PREPROC_MAX_SIDE", "384"))


def _device_resize_batch(images, slot: int | None = None) -> np.ndarray | None:
    """(N, H, W*3) channel-flattened uint8 stack if every image is a
    same-shape uint8 HWC array no larger than _DEVICE_RESIZE_MAX_SIDE; else
    None (host path).

    Shipping source-resolution pixels lets _encode_fn run the whole
    preprocess (pad/resize/normalize) on device, collapsing host work per
    chunk to a memcpy — the PIL resize was the dominant host cost in the
    pipelined batch_forward. The (H, W*C) flattening is free on the host
    (same bytes) and critical on the TPU: a minor dim of 3 pads to the
    128-lane tile, making resize matmuls ~40x slower (measured ~4 s vs
    ~40 ms per 128x512x512 chunk on v5e).

    slot: staging-ring index, or None for a caller-owned fresh buffer.
    With an integer slot the returned array is a *shared ring buffer* that
    the staged batch_forward pipeline reuses (its FIFO drain order proves
    the H2D transfer finished before the slot is overwritten — see
    Score._batch_forward_staged). Direct callers (forward_pairwise,
    encode_images) get slot=None: a private allocation, safe to pass to
    jnp.asarray regardless of outstanding transfers. Reusing a warm ring
    buffer matters because a fresh np.stack page-faults through ~100 MB
    (measured 0.55 s/chunk vs ~0.05 s into a warm buffer)."""
    import os
    if os.environ.get("T2V_DEVICE_PREPROC", "1") != "1":
        return None
    if not images:
        return None
    first = images[0]
    if not (isinstance(first, np.ndarray) and first.dtype == np.uint8
            and first.ndim == 3 and first.shape[2] == 3
            and max(first.shape[:2]) <= _DEVICE_RESIZE_MAX_SIDE):
        return None
    for im in images[1:]:
        if not (isinstance(im, np.ndarray) and im.dtype == np.uint8
                and im.shape == first.shape):
            return None
    h, w, c = first.shape
    shape = (len(images), h, w * c)
    if slot is None:
        buf = np.empty(shape, np.uint8)
    else:
        buf = _STAGING.get((shape, slot))
        if buf is None:
            buf = _STAGING[(shape, slot)] = np.empty(shape, np.uint8)
    view = buf.reshape(len(images), h, w, c)
    for j, im in enumerate(images):
        view[j] = im
    return buf


_STAGING: dict = {}


ENC_BUCKETS = (640, 704, 768, 896, 1024, 1280, 1536, 2048)
ANS_BUCKETS = (4, 8, 16, 32, 64)
IMG_BUCKETS = (1, 2, 4, 8, 16, 32, 64)
TXT_BUCKETS = (1, 2, 4, 8, 16, 32, 64, 128)


class CLIPT5Engine:
    """Device engine for CLIP-FlanT5 VQAScore.

    Parameters live on device (optionally TP-sharded over a mesh); all
    public methods take host data and return numpy.
    """

    def __init__(self, params, cfg: cft5.CLIPT5Config, tokenizer,
                 mesh=None, max_pairs_per_call: int = 128):
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.mesh = mesh
        self.max_pairs = max_pairs_per_call
        if mesh is not None:
            params = pmesh.shard_params(params, mesh)
        self.params = params

        # cfg is a static dataclass — close over it rather than tracing it.
        # pixels arrive uint8 (4x smaller transfer); normalization happens
        # in-jit and the result is cast to the weight dtype so the ViT runs
        # on the bf16 MXU path. uint8 batches at a non-target size get the
        # FULL preprocess in-jit (pad-to-square / shortest-side resize via
        # the PIL-parity separable matmuls in ops/image.py) — the host then
        # only decodes and stacks, which removes the per-chunk PIL resize
        # from the pipeline's critical path.
        from ..constants import CLIP_MEAN, CLIP_STD
        from ..ops import image as jimage

        def _encode_fn(params, pixels):
            if pixels.dtype == jnp.uint8 and pixels.ndim == 3:
                # channel-flattened (B, H, W*3): the whole preprocess runs
                # on well-tiled arrays (see _device_resize_batch docstring)
                S = cfg.vision.image_size
                x = pixels.astype(jnp.float32) / 255.0
                h, w = x.shape[-2], x.shape[-1] // 3
                if h != S or w != S:
                    if cfg.image_aspect_ratio == "pad":
                        # PIL fills with tuple(int(m*255)) — match exactly.
                        fill = [int(m * 255) / 255.0 for m in CLIP_MEAN]
                        x = jimage.pad_square_flat(x, 3, fill)
                        x = jimage.resize_flat(x, S, S, 3)
                    else:
                        rh, rw = jimage.resize_shortest_side((h, w), S)
                        x = jimage.resize_flat(x, rh, rw, 3)
                        x = jimage.center_crop_flat(x, S, S, 3)
                    # PIL clamps each resize pass to uint8 range
                    x = jnp.clip(x, 0.0, 1.0)
                x = jimage.normalize_flat(x, CLIP_MEAN, CLIP_STD)
            elif pixels.dtype == jnp.uint8:
                S = cfg.vision.image_size
                x = pixels.astype(jnp.float32) / 255.0
                if x.shape[-3] != S or x.shape[-2] != S:
                    if cfg.image_aspect_ratio == "pad":
                        fill = [int(m * 255) / 255.0 for m in CLIP_MEAN]
                        x = jimage.pad_square(x, fill)
                        x = jimage.resize(x, S, S)
                    else:
                        rh, rw = jimage.resize_shortest_side(
                            (x.shape[-3], x.shape[-2]), S)
                        x = jimage.resize(x, rh, rw)
                        x = jimage.center_crop(x, S, S)
                    x = jnp.clip(x, 0.0, 1.0)
                x = ((x - jnp.asarray(CLIP_MEAN, jnp.float32))
                     / jnp.asarray(CLIP_STD, jnp.float32))
            else:
                x = pixels
            return cft5.image_features(params, cfg, x)

        self._encode = jax.jit(_encode_fn)
        self._score = jax.jit(
            lambda params, feats, ids, img_mask, img_slot, enc_mask, ans_ids,
                   ans_mask, pair_image, pair_text:
            cft5.score_pairs(params, cfg, feats, ids, img_mask, img_slot,
                             enc_mask, ans_ids, ans_mask, pair_image, pair_text))
        self._first_tok = jax.jit(
            lambda params, feats, ids, img_mask, img_slot, enc_mask,
                   pair_image, pair_text:
            cft5.first_token_distribution(params, cfg, feats, ids, img_mask,
                                          img_slot, enc_mask, pair_image,
                                          pair_text))
        self._encode_hidden = jax.jit(
            lambda params, feats, ids, img_mask, img_slot, enc_mask,
                   pair_image, pair_text:
            jt5.encode(params["t5"], cfg.t5,
                       cft5._pair_embeds(params, feats, ids, img_mask,
                                         img_slot, pair_image, pair_text),
                       enc_mask[pair_text]))
        self._decode_logits = jax.jit(
            lambda params, dec_ids, enc_hidden, enc_mask:
            jt5.decode(params["t5"], cfg.t5, dec_ids, enc_hidden, enc_mask))
        self._cross_kv = jax.jit(
            lambda params, enc_hidden: jt5.cross_kv(params["t5"], cfg.t5,
                                                    enc_hidden))
        self._dec_step = jax.jit(
            lambda params, tok, cache, cpos, ckv, enc_mask:
            jt5.decode_step(params["t5"], cfg.t5, tok, cache, cpos, ckv,
                            enc_mask))
        self._greedy = jax.jit(
            lambda params, enc_hidden, enc_mask, max_new, eos:
            jt5.greedy_decode(params["t5"], cfg.t5, enc_hidden, enc_mask,
                              max_new, eos),
            static_argnames=("max_new", "eos"))

    # -- host-side assembly -------------------------------------------------

    def _build_text_arrays(self, questions, answers):
        """Tokenize + splice questions; bucket-pad; return numpy arrays."""
        T = self.cfg.num_image_tokens
        spliced = [splice_image_tokens_t5(q, self.tokenizer) for q in questions]
        ans_tok = [self.tokenizer(a).input_ids for a in answers]

        enc_lens = [len(s) - 1 + T for s in spliced]
        S = _bucket(max(enc_lens), ENC_BUCKETS)
        A = _bucket(max(len(a) for a in ans_tok), ANS_BUCKETS)
        n = len(questions)

        ids = np.zeros((n, S), np.int32)
        img_mask = np.zeros((n, S), bool)
        img_slot = np.zeros((n, S), np.int32)
        enc_mask = np.zeros((n, S), bool)
        ans_ids = np.zeros((n, A), np.int32)
        ans_mask = np.zeros((n, A), np.float32)

        for j, (toks, ans) in enumerate(zip(spliced, ans_tok)):
            pos = 0
            for t in toks:
                if t == IMAGE_TOKEN_INDEX:
                    img_mask[j, pos:pos + T] = True
                    img_slot[j, pos:pos + T] = np.arange(T)
                    pos += T
                else:
                    ids[j, pos] = t
                    pos += 1
            enc_mask[j, :pos] = True
            ans_ids[j, :len(ans)] = ans
            ans_mask[j, :len(ans)] = 1.0
        return ids, img_mask, img_slot, enc_mask, ans_ids, ans_mask

    def encode_images(self, images) -> jnp.ndarray:
        """images: list of paths/arrays -> (M, T, D) device features.

        M is bucket-padded (repeat-last) to bound recompilation. Same-shape
        uint8 array batches skip the host PIL resize entirely — pixels ship
        at source resolution and _encode_fn resizes on the MXU (one compile
        per distinct source shape; capped at 1024px so a 128-image chunk
        stays ~100 MB on the wire).
        """
        pad_square = self.cfg.image_aspect_ratio == "pad"
        pixels = _device_resize_batch(images)
        if pixels is not None:
            return self._encode_pixels(pixels, len(images))
        pixels = load_batch(images, self.cfg.vision.image_size,
                            pad_square=pad_square, raw_uint8=True)
        return self._encode_pixels(pixels, len(images))

    def _encode_pixels(self, pixels: np.ndarray, m: int) -> jnp.ndarray:
        mb = _bucket(m, IMG_BUCKETS)
        if mb > m:
            pixels = np.concatenate(
                [pixels, np.repeat(pixels[-1:], mb - m, axis=0)])
        feats = self._encode(self.params, pixels=jnp.asarray(pixels))
        return feats[:m]

    # -- scoring ------------------------------------------------------------

    def score_matrix(self, images, texts,
                     question_template: str | None = None,
                     answer_template: str | None = None) -> np.ndarray:
        """(M images) x (N texts) -> (M, N) float32 scores = exp(mean logp)."""
        qt = question_template or DEFAULT_QUESTION_TEMPLATE
        at = answer_template or DEFAULT_ANSWER_TEMPLATE
        questions = [cft5.format_question(qt.format(t), self.cfg.conversation)
                     for t in texts]
        answers = [cft5.format_answer(at.format(t), self.cfg.conversation)
                   for t in texts]
        logp = self._score_pairs_all(images, questions, answers)
        return np.exp(logp)

    def _score_pairs_all(self, images, questions, answers) -> np.ndarray:
        m, n = len(images), len(questions)
        feats = self.encode_images(images)
        arrays = self._build_text_arrays(questions, answers)
        nb = _bucket(n, TXT_BUCKETS)
        arrays = tuple(np.concatenate([a, np.repeat(a[-1:], nb - n, axis=0)])
                       if nb > n else a for a in arrays)
        dev = tuple(jnp.asarray(a) for a in arrays)

        pair_image = np.repeat(np.arange(m, dtype=np.int32), n)
        pair_text = np.tile(np.arange(n, dtype=np.int32), m)
        p = m * n

        chunk = min(self.max_pairs, p)
        out = np.empty((p,), np.float32)
        for lo in range(0, p, chunk):
            hi = min(lo + chunk, p)
            pi = pair_image[lo:hi]
            pt = pair_text[lo:hi]
            if hi - lo < chunk:  # pad last chunk
                pad = chunk - (hi - lo)
                pi = np.concatenate([pi, np.repeat(pi[-1:], pad)])
                pt = np.concatenate([pt, np.repeat(pt[-1:], pad)])
            logp = self._score(self.params, feats, *dev,
                               pair_image=jnp.asarray(pi),
                               pair_text=jnp.asarray(pt))
            out[lo:hi] = np.asarray(logp, np.float32)[: hi - lo]
        return out.reshape(m, n)

    def forward_pairwise(self, images, texts, question_template=None,
                         answer_template=None) -> np.ndarray:
        """Reference adapter contract: len(images)==len(texts) paired scoring
        -> (P,) scores (reference vqa_model.py:9-18)."""
        dev, n = self.forward_pairwise_device(images, texts,
                                              question_template,
                                              answer_template)
        return np.asarray(dev, np.float32)[:n]

    def forward_pairwise_device(self, images, texts, question_template=None,
                                answer_template=None):
        """Async variant: returns (device scores array, valid count) WITHOUT
        synchronizing — jax async dispatch lets the caller overlap the next
        chunk's host preprocessing with this chunk's device compute
        (batch_forward pipelining)."""
        return self.forward_device_prepared(
            self.prepare_pairs(images, texts, question_template,
                               answer_template))

    def prepare_pairs(self, images, texts, question_template=None,
                      answer_template=None, slot: int | None = None):
        """Pure-host stage of pairwise scoring: decode/resize pixels,
        tokenize/splice texts, bucket-pad — NO device work. The returned
        dict feeds `forward_device_prepared`. Splitting host prep from the
        H2D transfer lets batch_forward run them in separate pipeline
        stages: measured on the axon tunnel, resize (~1.0 s) + transfer
        (~1.1 s) serialized in one worker matches the device compute
        (~2.1 s/chunk) and stalls the pipeline, while two stages hide both.

        slot: staging-ring index for pipelined callers (the staged
        batch_forward passes chunk_index % ring and guarantees by drain
        order that the slot's previous transfer completed), or None
        (default) for a private buffer safe under any call pattern."""
        assert len(images) == len(texts)
        qt = question_template or DEFAULT_QUESTION_TEMPLATE
        at = answer_template or DEFAULT_ANSWER_TEMPLATE
        # Deduplicate images so repeated [img]*N calls still encode once.
        uniq, inv = [], []
        seen = {}
        for im in images:
            key = id(im) if not isinstance(im, (str, bytes)) else im
            if key not in seen:
                seen[key] = len(uniq)
                uniq.append(im)
            inv.append(seen[key])
        questions = [cft5.format_question(qt.format(t), self.cfg.conversation)
                     for t in texts]
        answers = [cft5.format_answer(at.format(t), self.cfg.conversation)
                   for t in texts]
        arrays = self._build_text_arrays(questions, answers)
        n = len(texts)
        nb = _bucket(n, TXT_BUCKETS)
        arrays = tuple(np.concatenate([a, np.repeat(a[-1:], nb - n, axis=0)])
                       if nb > n else a for a in arrays)
        pair_image = np.asarray(inv, np.int32)
        pair_text = np.arange(n, dtype=np.int32)
        if nb > n:
            pair_image = np.concatenate([pair_image,
                                         np.repeat(pair_image[-1:], nb - n)])
            pair_text = np.concatenate([pair_text,
                                        np.repeat(pair_text[-1:], nb - n)])

        pixels = _device_resize_batch(uniq, slot=slot)
        if pixels is None:
            pixels = load_batch(uniq, self.cfg.vision.image_size,
                                pad_square=self.cfg.image_aspect_ratio == "pad",
                                raw_uint8=True)
        m = len(uniq)
        mb = _bucket(m, IMG_BUCKETS)
        if mb > m:
            pixels = np.concatenate(
                [pixels, np.repeat(pixels[-1:], mb - m, axis=0)])
        return {"pixels": pixels, "m": m, "arrays": arrays,
                "pair_image": pair_image, "pair_text": pair_text, "n": n}

    def forward_device_prepared(self, prep):
        """Transfer + dispatch stage: the only stage touching the device.
        Returns (device scores array, valid count) without synchronizing."""
        feats = self._encode(self.params,
                             pixels=jnp.asarray(prep["pixels"]))[: prep["m"]]
        dev = tuple(jnp.asarray(a) for a in prep["arrays"])
        logp = self._score(self.params, feats, *dev,
                           pair_image=jnp.asarray(prep["pair_image"]),
                           pair_text=jnp.asarray(prep["pair_text"]))
        return jnp.exp(logp), prep["n"]


    def generate(self, images, texts, max_new_tokens: int = 128,
                 **_) -> list[str]:
        """Batched greedy T5 decode conditioned on the images (the v3.0
        CLIP-FlanT5 LLaVA-style generate). One encoder pass for the whole
        batch, then a single device-side lax.fori_loop decode
        (jt5.greedy_decode) — zero per-token host round-trips.
        """
        assert len(images) == len(texts)
        cfg = self.cfg
        eos = getattr(self.tokenizer, "eos_token_id", 1)
        n = len(texts)
        questions = [cft5.format_question(t, cfg.conversation) for t in texts]
        feats = self.encode_images(images)
        arrays = self._build_text_arrays(questions, [""] * n)
        nb = _bucket(n, TXT_BUCKETS)
        if nb > n:
            arrays = tuple(np.concatenate([a, np.repeat(a[-1:], nb - n,
                                                        axis=0)])
                           for a in arrays)
            feats = jnp.concatenate([feats,
                                     jnp.repeat(feats[-1:], nb - n, axis=0)])
        ids, img_mask, img_slot, enc_mask = (jnp.asarray(a)
                                             for a in arrays[:4])
        idx = jnp.arange(nb, dtype=jnp.int32)
        enc_hidden = self._encode_hidden(self.params, feats, ids, img_mask,
                                         img_slot, enc_mask, idx, idx)
        tokens = np.asarray(self._greedy(self.params, enc_hidden, enc_mask,
                                         max_new=max_new_tokens, eos=eos))
        outs = []
        for row in tokens[:n]:
            gen = [int(t) for t in row if t != 0]
            try:
                outs.append(self.tokenizer.decode(
                    gen, skip_special_tokens=True).strip())
            except TypeError:
                outs.append(self.tokenizer.decode(gen).strip())
        return outs


class CLIPEngine:
    """CLIPScore engine: batched dual-encoder cosine similarity."""

    def __init__(self, params, vcfg: jclip.CLIPVisionConfig,
                 tcfg: jclip.CLIPTextConfig, tokenizer, mesh=None):
        self.vcfg, self.tcfg = vcfg, tcfg
        self.tokenizer = tokenizer
        if mesh is not None:
            params = pmesh.shard_params(params, mesh)
        self.params = params

        from ..constants import CLIP_MEAN, CLIP_STD
        from ..ops import image as jimage

        def _img_fn(params, pixels):
            if pixels.dtype == jnp.uint8 and pixels.ndim == 3:
                # channel-flattened (B, H, W*3) — OpenCLIP eval transform
                # (Resize shortest + CenterCrop) on well-tiled arrays
                S = vcfg.image_size
                x = pixels.astype(jnp.float32) / 255.0
                h, w = x.shape[-2], x.shape[-1] // 3
                if h != S or w != S:
                    rh, rw = jimage.resize_shortest_side((h, w), S)
                    x = jimage.resize_flat(x, rh, rw, 3)
                    x = jimage.center_crop_flat(x, S, S, 3)
                    x = jnp.clip(x, 0.0, 1.0)
                x = jimage.normalize_flat(x, CLIP_MEAN, CLIP_STD)
            elif pixels.dtype == jnp.uint8:
                S = vcfg.image_size
                x = pixels.astype(jnp.float32) / 255.0
                if x.shape[-3] != S or x.shape[-2] != S:
                    rh, rw = jimage.resize_shortest_side(
                        (x.shape[-3], x.shape[-2]), S)
                    x = jimage.resize(x, rh, rw)
                    x = jimage.center_crop(x, S, S)
                    x = jnp.clip(x, 0.0, 1.0)
                x = ((x - jnp.asarray(CLIP_MEAN, jnp.float32))
                     / jnp.asarray(CLIP_STD, jnp.float32))
            else:
                x = pixels
            return jclip.encode_image(params, vcfg, x)

        self._img = jax.jit(_img_fn)
        self._txt = jax.jit(lambda params, ids: jclip.encode_text(params, tcfg, ids))

    def _tokenize(self, texts) -> np.ndarray:
        ctx = self.tcfg.context_length
        out = np.zeros((len(texts), ctx), np.int32)
        for i, t in enumerate(texts):
            ids = self.tokenizer(t).input_ids[:ctx]
            out[i, : len(ids)] = ids
        return out

    def score_matrix(self, images, texts, **_) -> np.ndarray:
        from ..constants import CLIP_MEAN, CLIP_STD

        pixels = _device_resize_batch(images)
        if pixels is None:
            pixels = load_batch(images, self.vcfg.image_size, CLIP_MEAN,
                                CLIP_STD, raw_uint8=True)
        m = len(images)
        mb = _bucket(m, IMG_BUCKETS)
        if mb > m:
            pixels = np.concatenate([pixels, np.repeat(pixels[-1:], mb - m, axis=0)])
        ids = self._tokenize(texts)
        n = len(texts)
        nb = _bucket(n, TXT_BUCKETS)
        if nb > n:
            ids = np.concatenate([ids, np.repeat(ids[-1:], nb - n, axis=0)])
        imf = np.asarray(self._img(self.params, pixels=jnp.asarray(pixels)),
                         np.float32)[:m]
        txf = np.asarray(self._txt(self.params, ids=jnp.asarray(ids)),
                         np.float32)[:n]
        return imf @ txf.T

    def forward_pairwise(self, images, texts, **_) -> np.ndarray:
        assert len(images) == len(texts)
        # Deduplicate so batch_forward-flattened [img]*N batches encode each
        # repeated image/text once (mirrors CLIPT5Engine.forward_pairwise).
        def dedupe(items):
            uniq, inv, seen = [], [], {}
            for it in items:
                key = it if isinstance(it, (str, bytes)) else id(it)
                if key not in seen:
                    seen[key] = len(uniq)
                    uniq.append(it)
                inv.append(seen[key])
            return uniq, np.asarray(inv)

        uimg, iinv = dedupe(images)
        utxt, tinv = dedupe(texts)
        scores = self.score_matrix(uimg, utxt)
        return scores[iinv, tinv].copy()
