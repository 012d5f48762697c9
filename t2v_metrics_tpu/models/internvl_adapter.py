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
from .adapters import VQAScoreModel, _default_dtype
from .fastchat_utils import get_conv_template
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
