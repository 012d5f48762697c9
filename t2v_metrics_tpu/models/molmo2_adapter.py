"""Molmo2 adapter: native-video content dicts + end-aligned P(answer).

Behavior contract from reference molmo2_model.py: video paths pass
through untouched (the model samples frames internally, :80-101); scoring
generates greedily (max_new_tokens=1 default) and scores the answer
end-aligned with the eos/bos/pad trailing-special rule (:168-214);
generate decodes the continuation with specials skipped (:220-262).
See models/molmo2.py for the documented golden-parity blocker.
"""

from __future__ import annotations

import warnings

import numpy as np
import jax
import jax.numpy as jnp

from ..constants import VIDEO_EXTENSIONS, CLIP_MEAN, CLIP_STD
from ..media.images import image_loader
from ..tokenization import SimpleT5Tokenizer, load_hf_tokenizer
from .adapters import VQAScoreModel, _default_dtype
from .generation import CachedLM, decode_text, score_rollout
from . import molmo2 as m2

DEFAULT_QUESTION = 'Does this figure show "{}"? Please answer Yes or No.'
DEFAULT_ANSWER = "Yes"

SEQ_BUCKETS = (64, 128, 256, 512, 1024, 2048, 4096)


def _bucket(n, buckets=SEQ_BUCKETS):
    for b in buckets:
        if n <= b:
            return b
    return ((n + 255) // 256) * 256


def _clip_preprocess(img: np.ndarray, size: int) -> np.ndarray:
    from PIL import Image

    out = np.asarray(Image.fromarray(img).resize((size, size), Image.BICUBIC))
    out = out.astype(np.float32) / 255.0
    return (out - np.asarray(CLIP_MEAN, np.float32)) / np.asarray(CLIP_STD, np.float32)


class Molmo2Adapter(VQAScoreModel):
    video_mode = "direct"
    allows_image = True
    allows_video = True  # native video: paths pass straight through

    def load_model(self):
        spec = m2.MOLMO2_MODELS[self.model_name]
        self.config: m2.Molmo2Config = self.kwargs.get("config") or spec["config"]
        dtype = self.kwargs.get("dtype") or _default_dtype()
        cfg = self.config

        params = self.kwargs.get("params")
        if params is None:
            ckpt = self.kwargs.get("checkpoint")
            if ckpt:
                from .checkpoint import load_with_adopted_dims

                params, cfg = load_with_adopted_dims(
                    ckpt, cfg, m2.init_molmo2, self.model_name, dtype=dtype)
                self.config = cfg
            elif self.kwargs.get("init") == "random" or spec["hf"] is None:
                params = m2.init_molmo2(
                    jax.random.PRNGKey(self.kwargs.get("seed", 0)), cfg, dtype)
            else:
                raise RuntimeError(
                    f"no public HF implementation for {self.model_name} "
                    "(Molmo2 is trust_remote_code-only); pass "
                    "checkpoint=<converted dir> or init='random'. See "
                    "models/molmo2.py docstring.")
        self.params = params

        tok = self.kwargs.get("tokenizer")
        if isinstance(tok, str):  # local tokenizer dir (cold path)
            tok = load_hf_tokenizer(tok)
        if tok is None and spec["hf"] is not None:
            try:
                tok = load_hf_tokenizer(spec["hf"])
            except Exception:
                warnings.warn(f"tokenizer {spec['hf']} unavailable (offline?); "
                              "using SimpleT5Tokenizer placeholder")
        if tok is None:
            tok = SimpleT5Tokenizer(cfg.text.vocab_size)
        self.tokenizer = tok

        self._vision_jit = jax.jit(lambda p, px: m2.image_features(p, cfg, px))
        self._lm = CachedLM(cfg.text)

    def load_images(self, images):
        return images

    def _encode_text(self, text):
        return self.tokenizer.encode(text, add_special_tokens=False)

    def _eos_ids(self):
        return {getattr(self.tokenizer, "eos_token_id", None)} - {None}

    def _special_ids(self):
        ids = set()
        for attr in ("eos_token_id", "bos_token_id", "pad_token_id"):
            v = getattr(self.tokenizer, attr, None)
            if v is not None:
                ids.add(int(v))
        return ids

    def _frames_for(self, path):
        """image path -> 1 frame; video path -> NATIVE_VIDEO_FRAMES uniform
        frames (the reference passes videos through for the model's own
        sampler, molmo2_model.py:80-101 — uniform sampling is the
        documented provisional stand-in)."""
        if isinstance(path, str) and path.lower().endswith(VIDEO_EXTENSIONS):
            from ..media.video import extract_frames

            return extract_frames(path, m2.NATIVE_VIDEO_FRAMES,
                                  mode="linspace")
        return [image_loader(path)]

    def _rollout(self, path, question, max_new_tokens, temperature=1.0,
                 sample=False, top_p=0.9):
        cfg = self.config
        frames = self._frames_for(path)
        px = np.stack([_clip_preprocess(f, cfg.vision.image_size)
                       for f in frames])
        f = self._vision_jit(self.params, jnp.asarray(px))  # (F, T, D)
        f = np.asarray(f, np.float32).reshape(-1, cfg.text.d_model)
        n_vis = f.shape[0]

        ids = (self._encode_text("User: ")
               + [cfg.image_token_id] * n_vis
               + self._encode_text("\n" + question + " Assistant:"))
        n = len(ids)
        s = _bucket(n)
        ids_arr = np.zeros((1, s), np.int64)
        ids_arr[0, :n] = ids
        vis_mask = ids_arr == cfg.image_token_id
        vis_mask[0, n:] = False
        vis_slot = np.zeros((1, s), np.int64)
        vis_slot[vis_mask] = np.arange(vis_mask.sum())
        feats = np.zeros((1, max(n_vis, 1), cfg.text.d_model), np.float32)
        feats[0, :n_vis] = f

        embed = self.params["decoder"]["embed"]
        tok = embed[jnp.asarray(ids_arr)]
        vis = jnp.take_along_axis(jnp.asarray(feats, embed.dtype),
                                  jnp.asarray(vis_slot)[..., None], axis=1)
        embeds = jnp.where(jnp.asarray(vis_mask)[..., None], vis, tok)
        pos = np.broadcast_to(np.arange(s)[None], (1, s)).copy()
        return self._lm.greedy(self.params["decoder"], embeds, pos, n,
                               max_new_tokens, eos_ids=self._eos_ids(),
                               temperature=temperature, sample=sample,
                               top_p=top_p)

    def forward(self, images, texts, fps=None,
                question_template: str = DEFAULT_QUESTION,
                answer_template: str = DEFAULT_ANSWER,
                max_new_tokens: int = 1,
                temperature: float = 1.0, **kw) -> np.ndarray:
        assert len(images) == len(texts)
        questions = [question_template.format(t) for t in texts]
        answers = [answer_template.format(t) for t in texts]
        special = self._special_ids()
        if len(images) > 1:
            return self._forward_batched(images, questions, answers,
                                         max_new_tokens, temperature,
                                         special)
        probs = []
        for path, question, answer in zip(images, questions, answers):
            gen, dists = self._rollout(path, question, max_new_tokens,
                                       temperature)
            ans = self._encode_text(answer)
            probs.append(score_rollout(dists, gen, ans, special))
        return np.asarray(probs, np.float32)

    def _assemble_arrays(self, path, question):
        """(ids list, flat feats) for one sample."""
        cfg = self.config
        frames = self._frames_for(path)
        px = np.stack([_clip_preprocess(f, cfg.vision.image_size)
                       for f in frames])
        f = self._vision_jit(self.params, jnp.asarray(px))
        f = np.asarray(f, np.float32).reshape(-1, cfg.text.d_model)
        ids = (self._encode_text("User: ")
               + [cfg.image_token_id] * f.shape[0]
               + self._encode_text("\n" + question + " Assistant:"))
        return ids, f

    def _forward_batched(self, images, questions, answers, max_new_tokens,
                         temperature, special) -> np.ndarray:
        """Batched rollout scoring (one device-side loop per chunk)."""
        from .generation import score_rollout as _sr

        cfg = self.config
        samples = [self._assemble_arrays(p_, q_)
                   for p_, q_ in zip(images, questions)]
        ans_tok = [self._encode_text(a) for a in answers]
        bsz = len(samples)
        s = _bucket(max(len(i) for i, _ in samples))
        t_max = max(f.shape[0] for _, f in samples)
        a_max = max(len(a) for a in ans_tok)
        ids_arr = np.zeros((bsz, s), np.int64)
        vis_mask = np.zeros((bsz, s), bool)
        vis_slot = np.zeros((bsz, s), np.int64)
        feats = np.zeros((bsz, max(t_max, 1), cfg.text.d_model), np.float32)
        n_prompts = np.zeros((bsz,), np.int32)
        gather = np.zeros((bsz, a_max), np.int32)
        for j, ((ids, f), ans) in enumerate(zip(samples, ans_tok)):
            n = len(ids)
            ids_arr[j, :n] = ids
            vm = ids_arr[j] == cfg.image_token_id
            vm[n:] = False
            vis_mask[j] = vm
            vis_slot[j][vm] = np.arange(vm.sum())
            feats[j, : f.shape[0]] = f
            n_prompts[j] = n
            gather[j, : len(ans)] = ans

        embed = self.params["decoder"]["embed"]
        tok = embed[jnp.asarray(ids_arr)]
        vis = jnp.take_along_axis(jnp.asarray(feats, embed.dtype),
                                  jnp.asarray(vis_slot)[..., None], axis=1)
        embeds = jnp.where(jnp.asarray(vis_mask)[..., None], vis, tok)
        pos = np.broadcast_to(np.arange(s)[None], (bsz, s)).copy()
        eos = self._eos_ids()
        tokens, lengths, probs = self._lm.greedy_batch(
            self.params["decoder"], embeds, pos, n_prompts, max_new_tokens,
            eos_id=min(eos) if eos else None, gather_ids=gather,
            temperature=temperature)
        out = []
        for j, ans in enumerate(ans_tok):
            length = int(lengths[j])
            gen = tokens[j, :length].tolist()
            dists = [probs[j, t] for t in range(length)]
            out.append(_sr(dists, gen, list(range(len(ans))), special))
        return np.asarray(out, np.float32)

    def score_matrix(self, images, texts, **kw) -> np.ndarray:
        m, n = len(images), len(texts)
        flat_imgs = [im for im in images for _ in range(n)]
        return self.forward(flat_imgs, list(texts) * m, **kw).reshape(m, n)

    def generate(self, images, texts, fps=None, max_new_tokens: int = 1024,
                 temperature: float = 0.0, do_sample=None,
                 top_p: float = 0.9, **kw) -> list[str]:
        assert len(images) == len(texts)
        if do_sample is None:
            do_sample = temperature > 0
        sample = bool(do_sample and temperature > 0)
        if not sample:
            return self._generate_batched(images, texts, max_new_tokens)
        outs = []
        for path, text in zip(images, texts):
            gen, _ = self._rollout(path, text, max_new_tokens,
                                   temperature if sample else 1.0,
                                   sample=sample, top_p=top_p)
            outs.append(decode_text(self.tokenizer, gen, self._special_ids()))
        return outs

    def _generate_batched(self, images, texts, max_new_tokens) -> list[str]:
        """Batched greedy decode via CachedLM.greedy_batch — same assembly
        as _forward_batched, without the answer-gather head."""
        cfg = self.config
        samples = [self._assemble_arrays(p_, q_)
                   for p_, q_ in zip(images, texts)]
        bsz = len(samples)
        s = _bucket(max(len(i) for i, _ in samples))
        t_max = max(f.shape[0] for _, f in samples)
        ids_arr = np.zeros((bsz, s), np.int64)
        vis_mask = np.zeros((bsz, s), bool)
        vis_slot = np.zeros((bsz, s), np.int64)
        feats = np.zeros((bsz, max(t_max, 1), cfg.text.d_model), np.float32)
        n_prompts = np.zeros((bsz,), np.int32)
        for j, (ids, f) in enumerate(samples):
            n = len(ids)
            ids_arr[j, :n] = ids
            vm = ids_arr[j] == cfg.image_token_id
            vm[n:] = False
            vis_mask[j] = vm
            vis_slot[j][vm] = np.arange(vm.sum())
            feats[j, : f.shape[0]] = f
            n_prompts[j] = n
        embed = self.params["decoder"]["embed"]
        tok = embed[jnp.asarray(ids_arr)]
        vis = jnp.take_along_axis(jnp.asarray(feats, embed.dtype),
                                  jnp.asarray(vis_slot)[..., None], axis=1)
        embeds = jnp.where(jnp.asarray(vis_mask)[..., None], vis, tok)
        pos = np.broadcast_to(np.arange(s)[None], (bsz, s)).copy()
        eos = self._eos_ids()
        tokens, lengths = self._lm.greedy_batch(
            self.params["decoder"], embeds, pos, n_prompts, max_new_tokens,
            eos_id=min(eos) if eos else None)
        return [decode_text(self.tokenizer, tokens[j, : lengths[j]].tolist(),
                            self._special_ids())
                for j in range(bsz)]
