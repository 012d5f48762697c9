"""Gemma3 and PaliGemma scoring adapters.

Gemma3 (reference gemma3_model.py): videos -> num_frames=10 evenly-spaced
frames with interleaved "Frame at {t}s:" text (:72-128); teacher-forced
P(answer) scoring. PaliGemma (reference paligemma_model.py): image-only
(video_mode="concat"); score = P(first answer token) at the first generated
step (:106-113); prefix-LM bidirectional attention over image+prompt.
"""

from __future__ import annotations

import warnings

import numpy as np
import jax
import jax.numpy as jnp

from ..constants import VIDEO_EXTENSIONS, SIGLIP_MEAN, SIGLIP_STD
from ..media.images import image_loader
from ..tokenization import SimpleT5Tokenizer, load_hf_tokenizer
from .adapters import VQAScoreModel, _default_dtype, _require_hub
from .generation import CachedLM, decode_text, score_rollout
from . import gemma3 as g3
from . import gemma4 as g4
from . import paligemma as pg

DEFAULT_QUESTION = 'Does this figure show "{}"? Please answer Yes or No.'
DEFAULT_ANSWER = "Yes"

SEQ_BUCKETS = (64, 128, 256, 512, 1024, 2048, 4096)


def _bucket(n, buckets=SEQ_BUCKETS):
    for b in buckets:
        if n <= b:
            return b
    return ((n + 255) // 256) * 256


def _siglip_preprocess(img: np.ndarray, size: int) -> np.ndarray:
    from PIL import Image

    out = np.asarray(Image.fromarray(img).resize((size, size), Image.BICUBIC))
    out = out.astype(np.float32) / 255.0
    return (out - np.asarray(SIGLIP_MEAN, np.float32)) / np.asarray(SIGLIP_STD, np.float32)


class _GemmaBase(VQAScoreModel):
    """Shared machinery: tokenizer fallback, vision jit, frame extraction."""

    def _setup_tokenizer(self, hf_repo, vocab_size):
        tok = self.kwargs.get("tokenizer")
        if tok is None and hf_repo is not None:
            try:
                tok = load_hf_tokenizer(hf_repo)
            except Exception:
                warnings.warn(f"tokenizer {hf_repo} unavailable (offline?); "
                              "using SimpleT5Tokenizer placeholder")
        if tok is None:
            tok = SimpleT5Tokenizer(vocab_size)
        self.tokenizer = tok

    def _encode_text(self, text):
        return self.tokenizer.encode(text, add_special_tokens=False)

    def _eos_ids(self):
        ids = set()
        t = getattr(self.tokenizer, "eos_token_id", None)
        if t is not None:
            ids.add(int(t))
        conv = getattr(self.tokenizer, "convert_tokens_to_ids", None)
        if conv is not None:
            for tok in ("<end_of_turn>",):
                try:
                    i = conv(tok)
                except Exception:
                    continue
                if isinstance(i, int) and i >= 0:
                    ids.add(i)
        return ids

    @staticmethod
    def _group_ids_np(vis_mask: np.ndarray) -> np.ndarray:
        """(S,) bool -> per-contiguous-block group ids, -1 on text
        (host mirror of gemma3.image_group_ids)."""
        m = vis_mask.astype(np.int32)
        starts = m * (1 - np.concatenate([[0], m[:-1]]))
        gid = np.cumsum(starts) - 1
        return np.where(vis_mask, gid, -1).astype(np.int32)

    def _extract_frames(self, video_path, num_frames=10):
        """(timestamp, rgb frame) pairs, linspace indices
        (reference gemma3_model.py:72-94)."""
        import cv2

        cap = cv2.VideoCapture(str(video_path))
        total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
        idx = np.linspace(0, total - 1, num_frames, dtype=int)
        frames = []
        for i in idx:
            cap.set(cv2.CAP_PROP_POS_FRAMES, int(i))
            ok, frame = cap.read()
            if ok:
                frames.append((round(i / fps, 2), frame[:, :, ::-1].copy()))
        cap.release()
        return frames


class Gemma3Adapter(_GemmaBase):
    video_mode = "direct"
    allows_image = True
    allows_video = True

    def load_model(self):
        spec = g3.GEMMA3_MODELS[self.model_name]
        self.config: g3.Gemma3Config = self.kwargs.get("config") or spec["config"]
        dtype = self.kwargs.get("dtype") or _default_dtype()
        cfg = self.config

        params = self.kwargs.get("params")
        if params is None:
            if self.kwargs.get("init") == "random" or spec["hf"] is None:
                params = g3.init_gemma3(
                    jax.random.PRNGKey(self.kwargs.get("seed", 0)), cfg, dtype)
            else:
                params = self._load_from_hf(spec["hf"], cfg, dtype)
        self.params = params
        self._setup_tokenizer(spec["hf"], cfg.text.vocab_size)

        self._vision_jit = jax.jit(
            lambda p, px: g3.image_features(p, cfg, px))
        self._score_jit = jax.jit(
            lambda p, *a, temperature: g3.splice_and_score(
                p, cfg, *a, temperature=temperature),
            static_argnames=("temperature",))

    def _load_from_hf(self, repo, cfg, dtype):
        try:
            _require_hub(repo)
            import torch
            from transformers import Gemma3ForConditionalGeneration
            hf = Gemma3ForConditionalGeneration.from_pretrained(
                repo, cache_dir=self.cache_dir, torch_dtype=torch.float32)
            return g3.convert_gemma3(hf.state_dict(), cfg, dtype)
        except Exception as e:
            raise RuntimeError(
                f"cannot load {repo}: {e}. Pass init='random' in offline "
                "environments.") from e

    def load_images(self, images, num_frames: int = 10):
        return images

    def _image_block_ids(self):
        cfg = self.config
        return ([cfg.boi_token_id]
                + [cfg.image_token_id] * cfg.mm_tokens_per_image
                + [cfg.eoi_token_id])

    def _assemble(self, path, question, num_frames=10):
        """Prompt ids + pixel stack for one (visual, question) pair
        (reference gemma3_model.py:100-128 interleaved frame content)."""
        cfg = self.config
        pixels, ids = [], []
        ids += self._encode_text("<start_of_turn>user\n")
        is_video = isinstance(path, str) and path.lower().endswith(VIDEO_EXTENSIONS)
        if is_video:
            for ts, frame in self._extract_frames(path, num_frames):
                ids += self._encode_text(f"Frame at {ts}s:")
                ids += self._image_block_ids()
                pixels.append(_siglip_preprocess(frame, cfg.vision.image_size))
        else:
            ids += self._image_block_ids()
            pixels.append(_siglip_preprocess(image_loader(path),
                                             cfg.vision.image_size))
        ids += self._encode_text(question + "<end_of_turn>\n"
                                 "<start_of_turn>model\n")
        return ids, np.stack(pixels)

    def forward(self, images, texts, num_frames: int = 10,
                question_template: str = DEFAULT_QUESTION,
                answer_template: str = DEFAULT_ANSWER,
                temperature: float = 1.0, **kw) -> np.ndarray:
        assert len(images) == len(texts)
        cfg = self.config
        questions = [question_template.format(t) for t in texts]
        answers = [answer_template.format(t) for t in texts]

        per_pair = []
        for path, question, answer in zip(images, questions, answers):
            ids, pixels = self._assemble(path, question, num_frames)
            ans = self._encode_text(answer)
            per_pair.append((ids, ans, pixels))

        p = len(per_pair)
        s = _bucket(max(len(i) + len(a) for i, a, _ in per_pair))
        a_max = max(len(a) for _, a, _ in per_pair)
        t_tok = cfg.mm_tokens_per_image
        t_max = max(px.shape[0] for _, _, px in per_pair) * t_tok

        ids_arr = np.zeros((p, s), np.int64)
        vis_mask = np.zeros((p, s), bool)
        vis_slot = np.zeros((p, s), np.int64)
        attn = np.zeros((p, s), bool)
        ans_ids = np.zeros((p, a_max), np.int64)
        ans_pos = np.zeros((p, a_max), np.int64)
        ans_mask = np.zeros((p, a_max), np.float32)
        feats = np.zeros((p, max(t_max, 1), cfg.text.d_model), np.float32)

        for j, (ids, ans, px) in enumerate(per_pair):
            f = self._vision_jit(self.params, jnp.asarray(px))  # (F, T, D)
            f = np.asarray(f, np.float32).reshape(-1, cfg.text.d_model)
            feats[j, : f.shape[0]] = f
            n = len(ids)
            ids_arr[j, :n] = ids
            ids_arr[j, n:n + len(ans)] = ans
            attn[j, :n + len(ans)] = True
            vm = ids_arr[j] == cfg.image_token_id
            vm[n:] = False
            vis_mask[j] = vm
            vis_slot[j][vm] = np.arange(vm.sum())
            ans_ids[j, : len(ans)] = ans
            ans_pos[j, : len(ans)] = n - 1 + np.arange(len(ans))
            ans_mask[j, : len(ans)] = 1.0

        pos = np.broadcast_to(np.arange(s)[None], (p, s)).copy()
        logp = self._score_jit(
            self.params, jnp.asarray(ids_arr), jnp.asarray(feats),
            jnp.asarray(vis_mask), jnp.asarray(vis_slot), jnp.asarray(pos),
            jnp.asarray(attn), jnp.asarray(ans_ids), jnp.asarray(ans_pos),
            jnp.asarray(ans_mask), temperature=float(temperature))
        return np.exp(np.asarray(logp, np.float32))

    def score_matrix(self, images, texts, **kw) -> np.ndarray:
        m, n = len(images), len(texts)
        flat_imgs = [im for im in images for _ in range(n)]
        return self.forward(flat_imgs, list(texts) * m, **kw).reshape(m, n)

    def generate(self, images, texts, num_frames: int = 10, fps=None,
                 max_new_tokens: int = 1024, temperature: float = 0.0,
                 do_sample=None, top_p: float = 0.9, **kw) -> list[str]:
        """Free-form continuation (reference gemma3_model.py:244-286).
        Greedy KV-cached decode; sampling kwargs accepted for API compat."""
        assert len(images) == len(texts)
        cfg = self.config
        if not hasattr(self, "_lm"):
            self._lm = CachedLM(cfg.text, embed_scale=cfg.text.d_model ** 0.5)
        eos = self._eos_ids()
        if do_sample is None:
            do_sample = temperature > 0
        if len(images) > 1 and not do_sample:
            return self._generate_batched(images, texts, num_frames,
                                          max_new_tokens, eos)
        outs = []
        for path, text in zip(images, texts):
            ids, px = self._assemble(path, text, num_frames)
            f = self._vision_jit(self.params, jnp.asarray(px))
            f = np.asarray(f, np.float32).reshape(-1, cfg.text.d_model)
            n = len(ids)
            s = _bucket(n)
            ids_arr = np.zeros((1, s), np.int64)
            ids_arr[0, :n] = ids
            vis_mask = ids_arr == cfg.image_token_id
            vis_mask[0, n:] = False
            vis_slot = np.zeros((1, s), np.int64)
            vis_slot[vis_mask] = np.arange(vis_mask.sum())
            feats = np.zeros((1, max(f.shape[0], 1), cfg.text.d_model),
                             np.float32)
            feats[0, : f.shape[0]] = f

            embed = self.params["decoder"]["embed"]
            scale = jnp.asarray(cfg.text.d_model ** 0.5, embed.dtype)
            tok = embed[jnp.asarray(ids_arr)] * scale
            vis = jnp.take_along_axis(jnp.asarray(feats, embed.dtype),
                                      jnp.asarray(vis_slot)[..., None], axis=1)
            embeds = jnp.where(jnp.asarray(vis_mask)[..., None], vis, tok)

            bidir_full = np.full((1, s + max_new_tokens), -1, np.int32)
            bidir_full[0, :s] = self._group_ids_np(vis_mask[0])
            pos = np.broadcast_to(np.arange(s)[None], (1, s)).copy()
            gen, _ = self._lm.greedy(
                self.params["decoder"], embeds, pos, n, max_new_tokens,
                eos_ids=eos, bidir_full=bidir_full,
                sample=bool(do_sample and temperature > 0),
                temperature=temperature if do_sample and temperature > 0 else 1.0,
                top_p=top_p)
            outs.append(decode_text(self.tokenizer, gen, eos))
        return outs

    def _generate_batched(self, images, texts, num_frames, max_new_tokens,
                          eos) -> list[str]:
        """Device-side batched greedy decode (lax.fori_loop; zero per-token
        host round-trips) with per-row image-block bidirectional groups."""
        cfg = self.config
        samples = []
        for path, text in zip(images, texts):
            ids, px = self._assemble(path, text, num_frames)
            f = self._vision_jit(self.params, jnp.asarray(px))
            samples.append((ids, np.asarray(f, np.float32).reshape(
                -1, cfg.text.d_model)))
        bsz = len(samples)
        s = _bucket(max(len(i) for i, _ in samples))
        t_max = max(f.shape[0] for _, f in samples)
        ids_arr = np.zeros((bsz, s), np.int64)
        vis_mask = np.zeros((bsz, s), bool)
        vis_slot = np.zeros((bsz, s), np.int64)
        feats = np.zeros((bsz, max(t_max, 1), cfg.text.d_model), np.float32)
        n_prompts = np.zeros((bsz,), np.int32)
        bidir_full = np.full((bsz, s + max_new_tokens), -1, np.int32)
        for j, (ids, f) in enumerate(samples):
            n = len(ids)
            ids_arr[j, :n] = ids
            vm = ids_arr[j] == cfg.image_token_id
            vm[n:] = False
            vis_mask[j] = vm
            vis_slot[j][vm] = np.arange(vm.sum())
            feats[j, : f.shape[0]] = f
            n_prompts[j] = n
            bidir_full[j, :s] = self._group_ids_np(vm)

        embed = self.params["decoder"]["embed"]
        scale = jnp.asarray(cfg.text.d_model ** 0.5, embed.dtype)
        tok = embed[jnp.asarray(ids_arr)] * scale
        vis = jnp.take_along_axis(jnp.asarray(feats, embed.dtype),
                                  jnp.asarray(vis_slot)[..., None], axis=1)
        embeds = jnp.where(jnp.asarray(vis_mask)[..., None], vis, tok)
        pos = np.broadcast_to(np.arange(s)[None], (bsz, s)).copy()
        eos_id = min(eos) if eos else None
        tokens, lengths = self._lm.greedy_batch(
            self.params["decoder"], embeds, pos, n_prompts, max_new_tokens,
            eos_id=eos_id, bidir_full=bidir_full)
        return [decode_text(self.tokenizer,
                            tokens[j, : lengths[j]].tolist(), eos)
                for j in range(bsz)]


class PaliGemmaAdapter(_GemmaBase):
    video_mode = "concat"
    allows_image = True
    allows_video = False

    def load_model(self):
        spec = pg.PALIGEMMA_MODELS[self.model_name]
        self.config: pg.PaliGemmaConfig = self.kwargs.get("config") or spec["config"]
        dtype = self.kwargs.get("dtype") or _default_dtype()
        cfg = self.config

        params = self.kwargs.get("params")
        if params is None:
            if self.kwargs.get("init") == "random" or spec["hf"] is None:
                params = pg.init_paligemma(
                    jax.random.PRNGKey(self.kwargs.get("seed", 0)), cfg, dtype)
            else:
                params = self._load_from_hf(spec["hf"], cfg, dtype)
        self.params = params
        self._setup_tokenizer(spec["hf"], cfg.text.vocab_size)

        self._vision_jit = jax.jit(lambda p, px: pg.image_features(p, cfg, px))
        self._dist_jit = jax.jit(
            lambda p, *a: pg.first_token_distribution(p, cfg, *a))

    def _load_from_hf(self, repo, cfg, dtype):
        try:
            _require_hub(repo)
            import torch
            from transformers import PaliGemmaForConditionalGeneration
            hf = PaliGemmaForConditionalGeneration.from_pretrained(
                repo, cache_dir=self.cache_dir, torch_dtype=torch.float32)
            return pg.convert_paligemma(hf.state_dict(), cfg, dtype)
        except Exception as e:
            raise RuntimeError(
                f"cannot load {repo}: {e}. Pass init='random' in offline "
                "environments.") from e

    def load_images(self, images):
        return images

    def _first_answer_token(self, answer: str) -> int:
        ids = self._encode_text(answer)
        # reference uses tokenizer.encode(answer)[0]; the Gemma tokenizer
        # prepends BOS there — we take the first content token
        return ids[0]

    def forward(self, images, texts,
                question_template: str = DEFAULT_QUESTION,
                answer_template: str = DEFAULT_ANSWER, **kw) -> np.ndarray:
        assert len(images) == len(texts)
        cfg = self.config
        n_vis = cfg.num_image_tokens
        questions = [question_template.format(t) for t in texts]
        answers = [answer_template.format(t) for t in texts]

        per_pair = []
        for path, question in zip(images, questions):
            px = _siglip_preprocess(image_loader(path), cfg.vision.image_size)
            ids = ([cfg.image_token_id] * n_vis + [cfg.bos_token_id]
                   + self._encode_text(question + "\n"))
            per_pair.append((ids, px))

        p = len(per_pair)
        s = _bucket(max(len(i) for i, _ in per_pair))
        ids_arr = np.zeros((p, s), np.int64)
        attn = np.zeros((p, s), bool)
        vis_mask = np.zeros((p, s), bool)
        vis_slot = np.zeros((p, s), np.int64)
        prefix = np.zeros((p, s), bool)
        logit_pos = np.zeros((p,), np.int64)
        pixels = np.stack([px for _, px in per_pair])
        for j, (ids, _) in enumerate(per_pair):
            n = len(ids)
            ids_arr[j, :n] = ids
            attn[j, :n] = True
            prefix[j, :n] = True
            vis_mask[j, :n_vis] = True
            vis_slot[j, :n_vis] = np.arange(n_vis)
            logit_pos[j] = n - 1

        feats = self._vision_jit(self.params, jnp.asarray(pixels))
        pos = np.broadcast_to(np.arange(s)[None], (p, s)).copy()
        dist = self._dist_jit(self.params, jnp.asarray(ids_arr), feats,
                              jnp.asarray(vis_mask), jnp.asarray(vis_slot),
                              jnp.asarray(pos), jnp.asarray(attn),
                              jnp.asarray(prefix), jnp.asarray(logit_pos))
        dist = np.asarray(dist, np.float32)
        return np.asarray([dist[j, self._first_answer_token(a)]
                           for j, a in enumerate(answers)], np.float32)

    def score_matrix(self, images, texts, **kw) -> np.ndarray:
        m, n = len(images), len(texts)
        flat_imgs = [im for im in images for _ in range(n)]
        return self.forward(flat_imgs, list(texts) * m, **kw).reshape(m, n)

    def generate(self, images, texts, max_new_tokens: int = 2048,
                 **kw) -> list[str]:
        """Free-form generation (reference paligemma_model.py:117-139).

        Image+prompt tokens form the bidirectional prefix; generated
        tokens are causal. The reference decodes the WHOLE output ids
        (prompt included, specials skipped), so the returned string starts
        with the prompt text - matched here.
        """
        assert len(images) == len(texts)
        cfg = self.config
        n_vis = cfg.num_image_tokens
        if not hasattr(self, "_lm"):
            self._lm = CachedLM(cfg.text, embed_scale=cfg.text.d_model ** 0.5)
        eos = {getattr(self.tokenizer, "eos_token_id", None)} - {None}
        outs = []
        for path, text in zip(images, texts):
            px = _siglip_preprocess(image_loader(path), cfg.vision.image_size)
            text_ids = self._encode_text(text + "\n")
            ids = [cfg.image_token_id] * n_vis + [cfg.bos_token_id] + text_ids
            n = len(ids)
            s = _bucket(n)
            ids_arr = np.zeros((1, s), np.int64)
            ids_arr[0, :n] = ids
            vis_mask = np.zeros((1, s), bool)
            vis_mask[0, :n_vis] = True
            vis_slot = np.zeros((1, s), np.int64)
            vis_slot[0, :n_vis] = np.arange(n_vis)

            feats = self._vision_jit(self.params, jnp.asarray(px[None]))
            embed = self.params["decoder"]["embed"]
            scale = jnp.asarray(cfg.text.d_model ** 0.5, embed.dtype)
            tok = embed[jnp.asarray(ids_arr)] * scale
            fpad = jnp.zeros((1, max(s - n_vis, 0), feats.shape[-1]),
                             feats.dtype)
            vis = jnp.concatenate([feats, fpad], axis=1)
            vis = jnp.take_along_axis(vis.astype(embed.dtype),
                                      jnp.asarray(vis_slot)[..., None], axis=1)
            embeds = jnp.where(jnp.asarray(vis_mask)[..., None], vis, tok)

            # prefix-LM: the whole prompt is one bidirectional group
            bidir_full = np.full((1, s + max_new_tokens), -1, np.int32)
            bidir_full[0, :n] = 0
            pos = np.broadcast_to(np.arange(s)[None], (1, s)).copy()
            gen, _ = self._lm.greedy(self.params["decoder"], embeds, pos, n,
                                     max_new_tokens, eos_ids=eos,
                                     bidir_full=bidir_full)
            outs.append(decode_text(self.tokenizer, text_ids + gen, eos))
        return outs


class Gemma4Adapter(Gemma3Adapter):
    """Gemma 4 (reference gemma4_model.py). Same media pipeline as Gemma 3;
    scoring is a 5-token greedy ROLLOUT scored end-aligned (the model may
    emit an empty thinking block before the answer even with thinking
    disabled, reference :164-172). See models/gemma4.py for the documented
    golden-parity blocker."""

    def load_model(self):
        spec = g4.GEMMA4_MODELS[self.model_name]
        self.config = self.kwargs.get("config") or spec["config"]
        dtype = self.kwargs.get("dtype") or _default_dtype()
        cfg = self.config

        params = self.kwargs.get("params")
        if params is None:
            ckpt = self.kwargs.get("checkpoint")
            if ckpt:
                from .checkpoint import load_with_adopted_dims

                params, cfg = load_with_adopted_dims(
                    ckpt, cfg, g4.init_gemma4, self.model_name, dtype=dtype)
                self.config = cfg
            elif self.kwargs.get("init") == "random" or spec["hf"] is None:
                params = g4.init_gemma4(
                    jax.random.PRNGKey(self.kwargs.get("seed", 0)), cfg, dtype)
            else:
                raise RuntimeError(
                    f"no public HF implementation for {self.model_name} "
                    "(transformers 4.57 has no Gemma4 class); pass "
                    "checkpoint=<converted dir> or init='random'. See "
                    "models/gemma4.py docstring.")
        self.params = params
        self._setup_tokenizer(spec["hf"], cfg.text.vocab_size)

        self._vision_jit = jax.jit(lambda p, px: g4.image_features(p, cfg, px))
        self._score_jit = jax.jit(
            lambda p, *a, temperature: g4.splice_and_score(
                p, cfg, *a, temperature=temperature),
            static_argnames=("temperature",))

    def _special_ids(self):
        all_ids = getattr(self.tokenizer, "all_special_ids", None)
        if all_ids:
            return set(int(i) for i in all_ids)
        return self._eos_ids()

    def _rollout(self, path, question, num_frames, max_new_tokens,
                 temperature=1.0, sample=False, top_p=0.9):
        """Shared greedy rollout: returns (gen ids, per-step dists)."""
        cfg = self.config
        if not hasattr(self, "_lm"):
            self._lm = CachedLM(cfg.text, embed_scale=cfg.text.d_model ** 0.5)
        ids, px = self._assemble(path, question, num_frames)
        f = self._vision_jit(self.params, jnp.asarray(px))
        f = np.asarray(f, np.float32).reshape(-1, cfg.text.d_model)
        n = len(ids)
        s = _bucket(n)
        ids_arr = np.zeros((1, s), np.int64)
        ids_arr[0, :n] = ids
        vis_mask = ids_arr == cfg.image_token_id
        vis_mask[0, n:] = False
        vis_slot = np.zeros((1, s), np.int64)
        vis_slot[vis_mask] = np.arange(vis_mask.sum())
        feats = np.zeros((1, max(f.shape[0], 1), cfg.text.d_model), np.float32)
        feats[0, : f.shape[0]] = f

        embed = self.params["decoder"]["embed"]
        scale = jnp.asarray(cfg.text.d_model ** 0.5, embed.dtype)
        tok = embed[jnp.asarray(ids_arr)] * scale
        vis = jnp.take_along_axis(jnp.asarray(feats, embed.dtype),
                                  jnp.asarray(vis_slot)[..., None], axis=1)
        embeds = jnp.where(jnp.asarray(vis_mask)[..., None], vis, tok)
        bidir_full = np.full((1, s + max_new_tokens), -1, np.int32)
        bidir_full[0, :s] = self._group_ids_np(vis_mask[0])
        pos = np.broadcast_to(np.arange(s)[None], (1, s)).copy()
        return self._lm.greedy(self.params["decoder"], embeds, pos, n,
                               max_new_tokens, eos_ids=self._eos_ids(),
                               temperature=temperature,
                               bidir_full=bidir_full, sample=sample,
                               top_p=top_p)

    def forward(self, images, texts, num_frames: int = 10, fps=None,
                question_template: str = DEFAULT_QUESTION,
                answer_template: str = DEFAULT_ANSWER,
                max_new_tokens: int = 5,  # buffer for empty thinking block
                temperature: float = 1.0, **kw) -> np.ndarray:
        assert len(images) == len(texts)
        questions = [question_template.format(t) for t in texts]
        answers = [answer_template.format(t) for t in texts]
        special = self._special_ids()
        if len(images) > 1:
            return self._forward_batched(images, questions, answers,
                                         num_frames, max_new_tokens,
                                         temperature, special)
        probs = []
        for path, question, answer in zip(images, questions, answers):
            gen, dists = self._rollout(path, question, num_frames,
                                       max_new_tokens, temperature)
            ans = self._encode_text(answer)
            probs.append(score_rollout(dists, gen, ans, special))
        return np.asarray(probs, np.float32)

    def _forward_batched(self, images, questions, answers, num_frames,
                         max_new_tokens, temperature, special) -> np.ndarray:
        """Batched rollout SCORING: one device-side greedy loop per chunk
        with per-step answer-token probabilities gathered in-graph — the
        per-pair path pays a host round-trip per generated token."""
        cfg = self.config
        if not hasattr(self, "_lm"):
            self._lm = CachedLM(cfg.text, embed_scale=cfg.text.d_model ** 0.5)
        samples, ans_tok = [], []
        for path, q_, a_ in zip(images, questions, answers):
            ids, px = self._assemble(path, q_, num_frames)
            f = self._vision_jit(self.params, jnp.asarray(px))
            samples.append((ids, np.asarray(f, np.float32).reshape(
                -1, cfg.text.d_model)))
            ans_tok.append(self._encode_text(a_))

        bsz = len(samples)
        s = _bucket(max(len(i) for i, _ in samples))
        t_max = max(f.shape[0] for _, f in samples)
        a_max = max(len(a) for a in ans_tok)
        ids_arr = np.zeros((bsz, s), np.int64)
        vis_mask = np.zeros((bsz, s), bool)
        vis_slot = np.zeros((bsz, s), np.int64)
        feats = np.zeros((bsz, max(t_max, 1), cfg.text.d_model), np.float32)
        n_prompts = np.zeros((bsz,), np.int32)
        bidir_full = np.full((bsz, s + max_new_tokens), -1, np.int32)
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
            bidir_full[j, :s] = self._group_ids_np(vm)
            gather[j, : len(ans)] = ans

        embed = self.params["decoder"]["embed"]
        scale = jnp.asarray(cfg.text.d_model ** 0.5, embed.dtype)
        tok = embed[jnp.asarray(ids_arr)] * scale
        vis = jnp.take_along_axis(jnp.asarray(feats, embed.dtype),
                                  jnp.asarray(vis_slot)[..., None], axis=1)
        embeds = jnp.where(jnp.asarray(vis_mask)[..., None], vis, tok)
        pos = np.broadcast_to(np.arange(s)[None], (bsz, s)).copy()
        eos = self._eos_ids()
        tokens, lengths, probs = self._lm.greedy_batch(
            self.params["decoder"], embeds, pos, n_prompts, max_new_tokens,
            eos_id=min(eos) if eos else None, bidir_full=bidir_full,
            gather_ids=gather, temperature=temperature)

        out = []
        for j, ans in enumerate(ans_tok):
            length = int(lengths[j])
            gen = tokens[j, :length].tolist()
            # probs[j, t, i] = P(answer token i) at step t -> reuse the
            # end-aligned rule with identity answer indices
            dists = [probs[j, t] for t in range(length)]
            out.append(score_rollout(dists, gen, list(range(len(ans))),
                                     special))
        return np.asarray(out, np.float32)

    def generate(self, images, texts, num_frames: int = 10, fps=None,
                 max_new_tokens: int = 1024, temperature: float = 0.0,
                 do_sample=None, top_p: float = 0.9, **kw) -> list[str]:
        """Greedy generate; thinking blocks stripped like the reference's
        processor.parse_response (gemma4_model.py:276-281)."""
        assert len(images) == len(texts)
        if do_sample is None:
            do_sample = temperature > 0
        sample = bool(do_sample and temperature > 0)
        outs = []
        for path, text in zip(images, texts):
            gen, _ = self._rollout(path, text, num_frames, max_new_tokens,
                                   temperature if sample else 1.0,
                                   sample=sample, top_p=top_p)
            eos = self._eos_ids()
            raw_ids = [i for i in gen if i not in eos]
            decode = getattr(self.tokenizer, "decode", lambda x: str(x))
            outs.append(g4.parse_response(decode(raw_ids)))
        return outs
