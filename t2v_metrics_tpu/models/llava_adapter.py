"""LLaVA-1.5 adapter (v3.0 legacy zoo — reference V_3.0_README.md:28-75).

Scoring mirrors the reference LLaVA pipeline: expand2square pad + CLIP
preprocessing, vicuna_v1 conversation with ``<image>`` splicing
(reference mm_utils.py:142-160 ``tokenizer_image_token``), and the
exp(mean answer-token log-prob) rule shared by the whole zoo.
"""

from __future__ import annotations

import os
import warnings

import numpy as np
import jax
import jax.numpy as jnp

from ..constants import (CLIP_MEAN, CLIP_STD, DEFAULT_ANSWER_TEMPLATE,
                         DEFAULT_QUESTION_TEMPLATE, IMAGE_TOKEN_INDEX,
                         SYSTEM_MSG)
from ..media.images import image_loader, load_batch
from ..tokenization import SimpleT5Tokenizer, load_hf_tokenizer, splice_image_tokens
from . import llava as lv
from .adapters import VQAScoreModel, _default_dtype


def _bucket(n, buckets):
    for b in buckets:
        if n <= b:
            return b
    return ((n + 63) // 64) * 64


SEQ_BUCKETS = (640, 704, 768, 1024, 1536, 2048)
PAIR_BUCKETS = (1, 2, 4, 8, 16, 32, 64, 128)
IMG_BUCKETS = (1, 2, 4, 8, 16, 32, 64)


class LlavaAdapter(VQAScoreModel):
    """llava-v1.5-7b / 13b. Image-only (video routes through the Score
    facade's frame-concat path, like the other v3.0 image models)."""

    video_mode = "concat"
    allows_image = True
    allows_video = False

    def load_model(self):
        spec = lv.LLAVA_MODELS[self.model_name]
        self.config: lv.LlavaConfig = self.kwargs.get("config") or spec["config"]
        cfg = self.config
        dtype = self.kwargs.get("dtype") or _default_dtype()

        params = self.kwargs.get("params")
        if params is None:
            ckpt = self.kwargs.get("checkpoint")
            if ckpt and os.path.isdir(ckpt):
                params = self._load_checkpoint(ckpt, cfg, dtype)
            elif self.kwargs.get("init") == "random" or spec["hf"] is None:
                params = lv.init_llava(
                    jax.random.PRNGKey(self.kwargs.get("seed", 0)), cfg,
                    dtype)
            else:
                params = self._load_from_hf(spec["hf"], cfg, dtype)
        self.params = params

        tok = self.kwargs.get("tokenizer")
        if isinstance(tok, str):
            tok = load_hf_tokenizer(tok)
        if tok is None and spec["hf"] is not None:
            try:
                tok = load_hf_tokenizer(spec["hf"])
            except Exception:
                warnings.warn(f"tokenizer {spec['hf']} unavailable "
                              "(offline?); using SimpleT5Tokenizer "
                              "placeholder")
        if tok is None:
            tok = SimpleT5Tokenizer(cfg.text.vocab_size)
        self.tokenizer = tok
        self.eos_token_id = getattr(tok, "eos_token_id", None)

        from ..ops import image as jimage

        def encode_fn(p, pixels):
            x = pixels.astype(jnp.float32) / 255.0
            x = ((x - jnp.asarray(CLIP_MEAN, jnp.float32))
                 / jnp.asarray(CLIP_STD, jnp.float32))
            return lv.image_features(p, cfg, x)

        self._encode_jit = jax.jit(encode_fn)
        self._score_jit = jax.jit(
            lambda p, *a, temperature: lv.splice_and_score(
                p, cfg, *a, temperature=temperature),
            static_argnames=("temperature",))

    def _load_checkpoint(self, path, cfg, dtype):
        import glob

        from .checkpoint import load_params, load_safetensors_dict

        if glob.glob(os.path.join(path, "*.safetensors")):
            return lv.convert_llava(load_safetensors_dict(path), cfg, dtype)
        return load_params(path, dtype=dtype)

    def _load_from_hf(self, repo, cfg, dtype):
        try:
            from ..tokenization import hub_reachable
            if not hub_reachable():
                raise RuntimeError("hub unreachable")
            import torch
            from transformers import LlavaForConditionalGeneration
            hf = LlavaForConditionalGeneration.from_pretrained(
                repo, cache_dir=self.cache_dir, torch_dtype=torch.float32)
            return lv.convert_llava(hf.state_dict(), cfg, dtype)
        except Exception as e:
            raise RuntimeError(
                f"cannot load {repo}: {e}. Pass init='random' or "
                "checkpoint=<dir> in offline environments.") from e

    # ------------------------------------------------------------------

    def _prompt(self, question: str) -> str:
        # vicuna_v1 conversation (reference constants.py SYSTEM_MSG +
        # LLaVA conv_vicuna_v1: sep " " between turns)
        return f"{SYSTEM_MSG} USER: <image>\n{question} ASSISTANT:"

    def _encode_images(self, images):
        pixels = load_batch([image_loader(im) if isinstance(im, str) else im
                             for im in images],
                            self.config.vision.image_size,
                            pad_square=self.config.image_aspect_ratio == "pad",
                            raw_uint8=True)
        m = len(images)
        mb = _bucket(m, IMG_BUCKETS)
        if mb > m:
            pixels = np.concatenate(
                [pixels, np.repeat(pixels[-1:], mb - m, axis=0)])
        return self._encode_jit(self.params, jnp.asarray(pixels))[:m]

    def forward(self, images, texts,
                question_template: str = DEFAULT_QUESTION_TEMPLATE,
                answer_template: str = DEFAULT_ANSWER_TEMPLATE,
                temperature: float = 1.0, **kw) -> np.ndarray:
        assert len(images) == len(texts)
        cfg = self.config
        t_img = cfg.num_image_tokens

        uniq, inv, seen = [], [], {}
        for im in images:
            key = im if isinstance(im, (str, bytes)) else id(im)
            if key not in seen:
                seen[key] = len(uniq)
                uniq.append(im)
            inv.append(seen[key])
        feats = self._encode_images(uniq)                   # (M, T, D)

        tok = self.tokenizer
        spliced = [splice_image_tokens(self._prompt(
            question_template.format(t)), tok) for t in texts]
        ans_tok = [tok.encode(" " + answer_template.format(t),
                              add_special_tokens=False)
                   if not isinstance(tok, SimpleT5Tokenizer)
                   else tok.encode(answer_template.format(t),
                                   add_special_tokens=False)
                   for t in texts]

        p = len(texts)
        pb = _bucket(p, PAIR_BUCKETS)
        lens = [sum(t_img if x == IMAGE_TOKEN_INDEX else 1 for x in sp)
                for sp in spliced]
        s = _bucket(max(l + len(a) for l, a in zip(lens, ans_tok)),
                    SEQ_BUCKETS)
        a_max = max(len(a) for a in ans_tok)

        ids = np.zeros((pb, s), np.int64)
        vis_mask = np.zeros((pb, s), bool)
        vis_slot = np.zeros((pb, s), np.int64)
        attn = np.zeros((pb, s), bool)
        ans_ids = np.zeros((pb, a_max), np.int64)
        ans_pos = np.zeros((pb, a_max), np.int64)
        ans_mask = np.zeros((pb, a_max), np.float32)
        for j, (sp, a) in enumerate(zip(spliced, ans_tok)):
            posn = 0
            for x in sp:
                if x == IMAGE_TOKEN_INDEX:
                    vis_mask[j, posn:posn + t_img] = True
                    vis_slot[j, posn:posn + t_img] = np.arange(t_img)
                    posn += t_img
                else:
                    ids[j, posn] = x
                    posn += 1
            ids[j, posn:posn + len(a)] = a
            ans_ids[j, : len(a)] = a
            ans_pos[j, : len(a)] = posn - 1 + np.arange(len(a))
            ans_mask[j, : len(a)] = 1.0
            attn[j, : posn + len(a)] = True
        if pb > p:  # pad rows repeat the last real row
            for arr in (ids, vis_mask, vis_slot, attn, ans_ids, ans_pos,
                        ans_mask):
                arr[p:] = arr[p - 1]

        feats_p = np.zeros((pb,), np.int64)
        feats_p[:p] = inv
        pos = np.tile(np.arange(s), (pb, 1))

        logp = self._score_jit(
            self.params, jnp.asarray(ids),
            jnp.asarray(np.asarray(feats, np.float32)[feats_p]),
            jnp.asarray(vis_mask), jnp.asarray(vis_slot), jnp.asarray(pos),
            jnp.asarray(attn), jnp.asarray(ans_ids), jnp.asarray(ans_pos),
            jnp.asarray(ans_mask), temperature=float(temperature))
        return np.exp(np.asarray(logp, np.float32))[:p]

    def score_matrix(self, images, texts, **kw) -> np.ndarray:
        m, n = len(images), len(texts)
        flat_imgs = [im for im in images for _ in range(n)]
        flat_txts = list(texts) * m
        return self.forward(flat_imgs, flat_txts, **kw).reshape(m, n)

    def generate(self, images, texts, max_new_tokens: int = 128,
                 **kw) -> list[str]:
        """Greedy generation with the shared device-side step loop."""
        from .generation import CachedLM

        cfg = self.config
        t_img = cfg.num_image_tokens
        feats = np.asarray(self._encode_images(list(images)), np.float32)
        tok = self.tokenizer
        spliced = [splice_image_tokens(self._prompt(t), tok) for t in texts]

        b = len(texts)
        lens = [sum(t_img if x == IMAGE_TOKEN_INDEX else 1 for x in sp)
                for sp in spliced]
        s = _bucket(max(lens), SEQ_BUCKETS)
        embed = np.asarray(self.params["decoder"]["embed"], np.float32)
        embeds = np.zeros((b, s, cfg.text.d_model), np.float32)
        for j, sp in enumerate(spliced):
            posn = 0
            for x in sp:
                if x == IMAGE_TOKEN_INDEX:
                    embeds[j, posn:posn + t_img] = feats[j]
                    posn += t_img
                else:
                    embeds[j, posn] = embed[x]
                    posn += 1
        pos = np.tile(np.arange(s + max_new_tokens), (b, 1))[:, :s]

        if not hasattr(self, "_lm"):
            self._lm = CachedLM(cfg.text)
        dt = self.params["decoder"]["embed"].dtype
        tokens, lengths = self._lm.greedy_batch(
            self.params["decoder"], jnp.asarray(embeds, dt),
            jnp.asarray(pos), np.asarray(lens, np.int64), max_new_tokens,
            eos_id=self.eos_token_id)
        outs = []
        for j in range(b):
            seq = [int(t) for t in tokens[j, : lengths[j]]
                   if self.eos_token_id is None or t != self.eos_token_id]
            try:
                outs.append(tok.decode(seq, skip_special_tokens=True).strip())
            except TypeError:
                outs.append(tok.decode(seq).strip())
        return outs


LLAVA_MODELS = lv.LLAVA_MODELS
