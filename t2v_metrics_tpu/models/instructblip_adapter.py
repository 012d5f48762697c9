"""InstructBLIP adapter (v3.0 legacy zoo — reference V_3.0_README.md:28-75).

The question is used twice, as in HF InstructBlipProcessor: tokenized with
the BERT qformer tokenizer as the Q-Former instruction, and with the T5
tokenizer as the language-model prompt. Scoring is exp(mean answer-token
log-prob) from the teacher-forced T5 decoder (jt5.answer_log_probs — the
same path CLIP-FlanT5 uses). Image preprocessing mirrors
BlipImageProcessor: direct bicubic resize to (S, S) + CLIP-stat
normalization (same as the BLIP-2 ITM adapter).
"""

from __future__ import annotations

import warnings

import numpy as np
import jax
import jax.numpy as jnp
from PIL import Image

from ..constants import (CLIP_MEAN, CLIP_STD, DEFAULT_ANSWER_TEMPLATE,
                         DEFAULT_QUESTION_TEMPLATE)
from ..media.images import image_loader
from ..tokenization import SimpleT5Tokenizer, load_hf_tokenizer
from . import instructblip as ib
from .adapters import VQAScoreModel, _default_dtype


class InstructBlipAdapter(VQAScoreModel):
    video_mode = "concat"
    allows_image = True
    allows_video = False

    def load_model(self):
        spec = ib.INSTRUCTBLIP_MODELS[self.model_name]
        self.config: ib.InstructBlipConfig = (self.kwargs.get("config")
                                              or spec["config"])
        dtype = self.kwargs.get("dtype") or _default_dtype()
        cfg = self.config

        params = self.kwargs.get("params")
        if params is None:
            if self.kwargs.get("init") == "random" or spec["hf"] is None:
                params = ib.init_instructblip(
                    jax.random.PRNGKey(self.kwargs.get("seed", 0)), cfg,
                    dtype)
            else:
                params = self._load_from_hf(spec["hf"], cfg, dtype)
        self.params = params

        # dual tokenizers: BERT for the Q-Former instruction, T5 for the LM
        self.qf_tokenizer = self.kwargs.get("qf_tokenizer")
        self.tokenizer = self.kwargs.get("tokenizer")
        if isinstance(self.tokenizer, str):  # local dir (cold path)
            self.tokenizer = load_hf_tokenizer(self.tokenizer)
        if self.tokenizer is None and spec["tokenizer"] is not None:
            try:
                self.tokenizer = load_hf_tokenizer(spec["tokenizer"])
            except Exception:
                warnings.warn(f"tokenizer {spec['tokenizer']} unavailable "
                              "(offline?); using SimpleT5Tokenizer "
                              "placeholder")
        if self.qf_tokenizer is None and spec["hf"] is not None:
            try:
                self.qf_tokenizer = load_hf_tokenizer(
                    spec["hf"], subfolder="qformer_tokenizer")
            except Exception:
                pass
        if self.tokenizer is None:
            self.tokenizer = SimpleT5Tokenizer(cfg.t5.vocab_size)
        if self.qf_tokenizer is None:
            self.qf_tokenizer = SimpleT5Tokenizer(cfg.qformer.vocab_size)

        self._score_jit = jax.jit(
            lambda p, *a: ib.score_pairs(p, cfg, *a))

    def _load_from_hf(self, repo, cfg, dtype):
        try:
            from ..tokenization import hub_reachable
            if not hub_reachable():
                raise RuntimeError("hub unreachable")
            import torch
            from transformers import InstructBlipForConditionalGeneration
            hf = InstructBlipForConditionalGeneration.from_pretrained(
                repo, cache_dir=self.cache_dir, torch_dtype=torch.float32)
            return ib.convert_instructblip(hf.state_dict(), cfg, dtype)
        except Exception as e:
            raise RuntimeError(
                f"cannot load {repo}: {e}. Pass init='random' in offline "
                "environments.") from e

    def _preprocess(self, img: np.ndarray) -> np.ndarray:
        size = self.config.vision.image_size
        out = np.asarray(Image.fromarray(img).resize((size, size),
                                                     Image.BICUBIC))
        out = out.astype(np.float32) / 255.0
        return ((out - np.asarray(CLIP_MEAN, np.float32))
                / np.asarray(CLIP_STD, np.float32))

    def forward(self, images, texts,
                question_template: str = DEFAULT_QUESTION_TEMPLATE,
                answer_template: str = DEFAULT_ANSWER_TEMPLATE,
                **kw) -> np.ndarray:
        assert len(images) == len(texts)
        pixels = np.stack([
            self._preprocess(image_loader(p) if isinstance(p, str) else p)
            for p in images])
        questions = [question_template.format(t) for t in texts]
        answers = [answer_template.format(t) for t in texts]

        def pad_batch(encoded):
            t_max = max(len(e) for e in encoded)
            ids = np.zeros((len(encoded), t_max), np.int64)
            mask = np.zeros((len(encoded), t_max), bool)
            for j, e in enumerate(encoded):
                ids[j, : len(e)] = e
                mask[j, : len(e)] = True
            return ids, mask

        qf_ids, qf_mask = pad_batch(
            [self.qf_tokenizer(q).input_ids for q in questions])
        ids, enc_mask = pad_batch(
            [self.tokenizer(q).input_ids for q in questions])
        ans = [self.tokenizer(a).input_ids for a in answers]
        a_max = max(len(a) for a in ans)
        ans_ids = np.zeros((len(ans), a_max), np.int64)
        ans_mask = np.zeros((len(ans), a_max), np.float32)
        for j, a in enumerate(ans):
            ans_ids[j, : len(a)] = a
            ans_mask[j, : len(a)] = 1.0

        logp = self._score_jit(self.params, jnp.asarray(pixels),
                               jnp.asarray(qf_ids), jnp.asarray(qf_mask),
                               jnp.asarray(ids), jnp.asarray(enc_mask),
                               jnp.asarray(ans_ids), jnp.asarray(ans_mask))
        return np.exp(np.asarray(logp, np.float32))

    def score_matrix(self, images, texts, **kw) -> np.ndarray:
        m, n = len(images), len(texts)
        flat_imgs = [im for im in images for _ in range(n)]
        return self.forward(flat_imgs, list(texts) * m, **kw).reshape(m, n)

    def generate(self, images, texts, max_new_tokens: int = 64,
                 **kw) -> list[str]:
        """Greedy T5 decode conditioned on [queries] + prompt."""
        cfg = self.config
        pixels = np.stack([
            self._preprocess(image_loader(p) if isinstance(p, str) else p)
            for p in images])
        qf_ids, qf_mask = self._pad([self.qf_tokenizer(t).input_ids
                                     for t in texts])
        ids, enc_mask = self._pad([self.tokenizer(t).input_ids
                                   for t in texts])
        from . import t5 as jt5

        q_feats = ib.query_features(self.params, cfg, jnp.asarray(pixels),
                                    jnp.asarray(qf_ids),
                                    jnp.asarray(qf_mask))
        tok = jt5.embed_tokens(self.params["t5"], jnp.asarray(ids))
        enc_in = jnp.concatenate([q_feats.astype(tok.dtype), tok], axis=1)
        b = ids.shape[0]
        nq = cfg.num_query_tokens
        full_mask = jnp.concatenate(
            [jnp.ones((b, nq), bool), jnp.asarray(enc_mask)], axis=1)
        enc_hidden = jt5.encode(self.params["t5"], cfg.t5, enc_in, full_mask)
        eos = getattr(self.tokenizer, "eos_token_id", 1) or 1
        tokens = np.asarray(jt5.greedy_decode(
            self.params["t5"], cfg.t5, enc_hidden, full_mask,
            max_new_tokens=max_new_tokens, eos_id=eos))
        outs = []
        for row in tokens:
            gen = [int(t) for t in row if t not in (0, eos)]
            try:
                outs.append(self.tokenizer.decode(
                    gen, skip_special_tokens=True).strip())
            except TypeError:
                outs.append(self.tokenizer.decode(gen).strip())
        return outs

    @staticmethod
    def _pad(encoded):
        t_max = max(len(e) for e in encoded)
        ids = np.zeros((len(encoded), t_max), np.int64)
        mask = np.zeros((len(encoded), t_max), bool)
        for j, e in enumerate(encoded):
            ids[j, : len(e)] = e
            mask[j, : len(e)] = True
        return ids, mask


INSTRUCTBLIP_MODELS = ib.INSTRUCTBLIP_MODELS
