"""InternVL adapter: tile pipeline + conversation prompts + P(first token).

Reference behaviors (internvl_model.py): ImageNet-normalized dynamic tiles
(max 12 + thumbnail); video -> 32 uniformly-sampled segments, 1 tile each
(:293-322); prompt built from the fastchat conversation template with
``<img>`` + ``<IMG_CONTEXT>``*N + ``</img>`` expansion (:344-377); score =
P(first answer token) (:383-432).
"""

from __future__ import annotations

import warnings

import numpy as np
import jax
import jax.numpy as jnp

from ..constants import VIDEO_EXTENSIONS
from ..media.images import image_loader
from ..tokenization import SimpleT5Tokenizer, load_hf_tokenizer
from .adapters import VQAScoreModel, _default_dtype, _require_hub
from .fastchat_utils import get_conv_template
from .generation import CachedLM, decode_text
from . import internvl as ivl


class InternVLAdapter(VQAScoreModel):
    video_mode = "direct"
    allows_image = True
    allows_video = True

    conversation_template = "internvl2_5"

    def load_model(self):
        spec = ivl.INTERNVL_MODELS[self.model_name]
        self.config: ivl.InternVLConfig = self.kwargs.get("config") or spec["config"]
        dtype = self.kwargs.get("dtype") or _default_dtype()
        cfg = self.config

        params = self.kwargs.get("params")
        if params is None:
            if self.kwargs.get("init") == "random" or spec["hf"] is None:
                params = ivl.init_internvl(
                    jax.random.PRNGKey(self.kwargs.get("seed", 0)), cfg, dtype)
            else:
                params = self._load_from_hf(spec["hf"], cfg, dtype)
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

        self._vision_jit = jax.jit(lambda p, px: ivl.image_features(p, cfg, px))
        self._score_jit = jax.jit(
            lambda p, *a, temperature: ivl.splice_and_score(
                p, cfg, *a, temperature=temperature),
            static_argnames=("temperature",))

    def _load_from_hf(self, repo, cfg, dtype):
        try:
            _require_hub(repo)
            import torch
            from transformers import InternVLForConditionalGeneration
            hf = InternVLForConditionalGeneration.from_pretrained(
                repo, cache_dir=self.cache_dir, torch_dtype=torch.float32)
            return ivl.convert_internvl(hf.state_dict(), cfg, dtype)
        except Exception as e:
            raise RuntimeError(
                f"cannot load {repo}: {e}. Pass init='random' in offline "
                "environments.") from e

    def load_images(self, images, num_segments: int = 32):
        return images

    def _tiles_for(self, path, num_segments=32):
        cfg = self.config
        size = cfg.vision.image_size
        if isinstance(path, str) and path.lower().endswith(VIDEO_EXTENSIONS):
            # 32 uniformly-sampled frames, 1 tile each (reference :293-322)
            from ..media.video import extract_frames

            frames = extract_frames(path, num_segments, mode="linspace")
            from PIL import Image

            tiles = [np.asarray(Image.fromarray(f).resize((size, size),
                                                          Image.BICUBIC))
                     for f in frames]
        else:
            tiles = ivl.dynamic_preprocess(image_loader(path),
                                           max_num=cfg.max_tiles,
                                           image_size=size)
        return ivl.preprocess_tiles(tiles)

    def _encode_text(self, text):
        return self.tokenizer.encode(text, add_special_tokens=False)

    def _build_ids(self, question, n_tiles):
        cfg = self.config
        n_ctx = cfg.tokens_per_tile * n_tiles
        conv = get_conv_template(self.conversation_template)
        conv.append_message(conv.roles[0], "<image>\n" + question)
        conv.append_message(conv.roles[1], None)
        prompt = conv.get_prompt()
        pre, post = prompt.split("<image>")
        return (self._encode_text(pre + cfg.img_start_token)
                + [cfg.image_token_id] * n_ctx
                + self._encode_text(cfg.img_end_token + post))

    def forward(self, images, texts,
                question_template: str = 'Does this figure show "{}"? Please answer Yes or No.',
                answer_template: str = "Yes", num_segments: int = 32,
                temperature: float = 1.0, **kw) -> np.ndarray:
        assert len(images) == len(texts)
        cfg = self.config
        questions = [question_template.format(t) for t in texts]
        answers = [answer_template.format(t) for t in texts]

        per_pair = []
        for path, question in zip(images, questions):
            tiles = self._tiles_for(path, num_segments)
            ids = self._build_ids(question, tiles.shape[0])
            per_pair.append((ids, tiles))

        p = len(per_pair)
        s = max(len(i) for i, _ in per_pair) + 4
        d = cfg.text.d_model
        tok_per_tile = cfg.tokens_per_tile
        t_max = max(t.shape[0] for _, t in per_pair) * tok_per_tile

        ids_arr = np.zeros((p, s), np.int64)
        vis_mask = np.zeros((p, s), bool)
        vis_slot = np.zeros((p, s), np.int64)
        attn = np.zeros((p, s), bool)
        ans_ids = np.zeros((p, 1), np.int64)
        ans_pos = np.zeros((p, 1), np.int64)
        feats = np.zeros((p, max(t_max, 1), d), np.float32)
        for j, ((ids, tiles), answer) in enumerate(zip(per_pair, answers)):
            f = self._vision_jit(self.params, jnp.asarray(tiles))
            f = np.asarray(f, np.float32).reshape(-1, d)
            feats[j, : f.shape[0]] = f
            n = len(ids)
            ids_arr[j, :n] = ids
            attn[j, :n] = True
            vm = ids_arr[j] == cfg.image_token_id
            vm[n:] = False
            vis_mask[j] = vm
            vis_slot[j][vm] = np.arange(vm.sum())
            # P(first answer token) only (reference :383-432)
            ans = self._encode_text(answer)
            ans_ids[j, 0] = ans[0]
            ans_pos[j, 0] = n - 1

        pos = np.broadcast_to(np.arange(s)[None], (p, s)).copy()
        logp = self._score_jit(
            self.params, jnp.asarray(ids_arr), jnp.asarray(feats),
            jnp.asarray(vis_mask), jnp.asarray(vis_slot), jnp.asarray(pos),
            jnp.asarray(attn), jnp.asarray(ans_ids), jnp.asarray(ans_pos),
            jnp.ones((p, 1), jnp.float32), temperature=float(temperature))
        return np.exp(np.asarray(logp, np.float32))

    def score_matrix(self, images, texts, **kw) -> np.ndarray:
        m, n = len(images), len(texts)
        flat_imgs = [im for im in images for _ in range(n)]
        return self.forward(flat_imgs, list(texts) * m, **kw).reshape(m, n)

    # ------------------------------------------------------------------
    # generation (reference internvl_model.py:438-481)
    # ------------------------------------------------------------------

    def _eos_ids(self):
        """Conversation separator is the generation stop (reference
        internvl_model.py:356-360: eos = convert_tokens_to_ids(sep))."""
        ids = set()
        t = getattr(self.tokenizer, "eos_token_id", None)
        if t is not None:
            ids.add(int(t))
        conv = get_conv_template(self.conversation_template)
        c2i = getattr(self.tokenizer, "convert_tokens_to_ids", None)
        if c2i is not None and conv.sep:
            try:
                i = c2i(conv.sep)
                if isinstance(i, int) and i >= 0:
                    ids.add(i)
            except Exception:
                pass
        return ids

    def _build_ids_multi(self, prompt: str, tiles_per_block: list[int]):
        """Conversation prompt with one <image> placeholder per block, each
        expanded to <img> + <IMG_CONTEXT>*tokens_per_tile*tiles + </img>
        (reference _build_inputs, internvl_model.py:344-377)."""
        cfg = self.config
        conv = get_conv_template(self.conversation_template)
        conv.append_message(conv.roles[0], prompt)
        conv.append_message(conv.roles[1], None)
        query = conv.get_prompt()
        chunks = query.split("<image>")
        assert len(chunks) == len(tiles_per_block) + 1
        ids = self._encode_text(chunks[0])
        for chunk, tiles in zip(chunks[1:], tiles_per_block):
            ids += self._encode_text(cfg.img_start_token)
            ids += [cfg.image_token_id] * (cfg.tokens_per_tile * tiles)
            ids += self._encode_text(cfg.img_end_token + chunk)
        return ids

    def generate(self, images, texts, num_frames: int = 16,
                 max_new_tokens: int = 1024, do_sample=None,
                 temperature: float = 0.0, **kw) -> list[str]:
        """Greedy continuation. Videos become 'Frame{i}: <image>' blocks of
        one tile each; images a single dynamically-tiled <image>."""
        assert len(images) == len(texts)
        cfg = self.config
        if not hasattr(self, "_lm"):
            self._lm = CachedLM(cfg.text)
        eos = self._eos_ids()
        if do_sample is None:
            do_sample = temperature > 0
        if len(images) > 1 and not do_sample:
            return self._generate_batched(images, texts, num_frames,
                                          max_new_tokens, eos)
        outs = []
        for path, question in zip(images, texts):
            is_video = isinstance(path, str) and \
                path.lower().endswith(VIDEO_EXTENSIONS)
            tiles = self._tiles_for(path, num_frames)
            if is_video:
                blocks = [1] * tiles.shape[0]
                prompt = "".join(f"Frame{i+1}: <image>\n"
                                 for i in range(len(blocks))) + question
            else:
                blocks = [tiles.shape[0]]
                prompt = "<image>\n" + question
            ids = self._build_ids_multi(prompt, blocks)

            f = self._vision_jit(self.params, jnp.asarray(tiles))
            f = np.asarray(f, np.float32).reshape(-1, cfg.text.d_model)
            n = len(ids)
            s = max(n, 8)
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
            tok = embed[jnp.asarray(ids_arr)]
            vis = jnp.take_along_axis(jnp.asarray(feats, embed.dtype),
                                      jnp.asarray(vis_slot)[..., None], axis=1)
            embeds = jnp.where(jnp.asarray(vis_mask)[..., None], vis, tok)
            pos = np.broadcast_to(np.arange(s)[None], (1, s)).copy()
            gen, _ = self._lm.greedy(
                self.params["decoder"], embeds, pos, n, max_new_tokens,
                eos_ids=eos, sample=bool(do_sample and temperature > 0),
                temperature=temperature if do_sample and temperature > 0 else 1.0)
            outs.append(decode_text(self.tokenizer, gen, eos))
        return outs

    def _assemble_gen(self, path, question, num_frames):
        """(ids, flat feats) for one generate sample."""
        cfg = self.config
        is_video = isinstance(path, str) and \
            path.lower().endswith(VIDEO_EXTENSIONS)
        tiles = self._tiles_for(path, num_frames)
        if is_video:
            blocks = [1] * tiles.shape[0]
            prompt = "".join(f"Frame{i+1}: <image>\n"
                             for i in range(len(blocks))) + question
        else:
            blocks = [tiles.shape[0]]
            prompt = "<image>\n" + question
        ids = self._build_ids_multi(prompt, blocks)
        f = self._vision_jit(self.params, jnp.asarray(tiles))
        return ids, np.asarray(f, np.float32).reshape(-1, cfg.text.d_model)

    def _generate_batched(self, images, texts, num_frames, max_new_tokens,
                          eos) -> list[str]:
        """Device-side batched greedy decode (one jitted fori_loop, zero
        per-token host round-trips) — the CameraBench caption-generation
        fast path."""
        from .generation import decode_text

        cfg = self.config
        samples = [self._assemble_gen(p, t, num_frames)
                   for p, t in zip(images, texts)]
        bsz = len(samples)
        s = max(max(len(i) for i, _ in samples), 8)
        d = cfg.text.d_model
        t_max = max(f.shape[0] for _, f in samples)
        ids_arr = np.zeros((bsz, s), np.int64)
        vis_mask = np.zeros((bsz, s), bool)
        vis_slot = np.zeros((bsz, s), np.int64)
        feats = np.zeros((bsz, max(t_max, 1), d), np.float32)
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
        eos_id = min(eos) if eos else None
        tokens, lengths = self._lm.greedy_batch(
            self.params["decoder"], embeds, pos, n_prompts, max_new_tokens,
            eos_id=eos_id)
        return [decode_text(self.tokenizer,
                            tokens[j, : lengths[j]].tolist(), eos)
                for j in range(bsz)]
