"""ITMScore adapter (BLIP-2 image-text matching; reference v3.0 family).

forward(images, texts) -> per-pair P(match) from the Q-Former itm_head
(softmax class 1). Image preprocessing mirrors Blip2ImageProcessor:
direct bicubic resize to (size, size), CLIP-stat normalization.
"""

from __future__ import annotations

import warnings

import numpy as np
import jax
import jax.numpy as jnp
from PIL import Image

from ..constants import CLIP_MEAN, CLIP_STD
from ..media.images import image_loader
from ..tokenization import SimpleT5Tokenizer, load_hf_tokenizer
from .adapters import ScoreModel, _default_dtype, _require_hub
from . import blip2_itm as bitm


class Blip2ITMAdapter(ScoreModel):
    video_mode = "concat"
    allows_image = True
    allows_video = False

    def load_model(self):
        spec = bitm.BLIP2_ITM_MODELS[self.model_name]
        self.config: bitm.Blip2ITMConfig = self.kwargs.get("config") or spec["config"]
        dtype = self.kwargs.get("dtype") or _default_dtype()
        cfg = self.config

        params = self.kwargs.get("params")
        if params is None:
            if self.kwargs.get("init") == "random" or spec["hf"] is None:
                params = bitm.init_blip2_itm(
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
            tok = SimpleT5Tokenizer(cfg.qformer.vocab_size)
        self.tokenizer = tok

        self._score_jit = jax.jit(
            lambda p, px, ids, mask: bitm.itm_scores(p, cfg, px, ids, mask))

    def _load_from_hf(self, repo, cfg, dtype):
        try:
            _require_hub(repo)
            import torch
            from transformers import Blip2ForImageTextRetrieval
            hf = Blip2ForImageTextRetrieval.from_pretrained(
                repo, cache_dir=self.cache_dir, torch_dtype=torch.float32)
            return bitm.convert_blip2_itm(hf.state_dict(), cfg, dtype)
        except Exception as e:
            raise RuntimeError(
                f"cannot load {repo}: {e}. Pass init='random' in offline "
                "environments.") from e

    def _preprocess(self, img: np.ndarray) -> np.ndarray:
        size = self.config.vision.image_size
        out = np.asarray(Image.fromarray(img).resize((size, size), Image.BICUBIC))
        out = out.astype(np.float32) / 255.0
        return (out - np.asarray(CLIP_MEAN, np.float32)) / np.asarray(CLIP_STD, np.float32)

    def load_images(self, images):
        return images

    def forward(self, images, texts, **kw) -> np.ndarray:
        assert len(images) == len(texts)
        pixels = np.stack([self._preprocess(image_loader(p)) for p in images])
        tok = self.tokenizer
        encoded = [tok.encode(t, add_special_tokens=True) if hasattr(tok, "encode")
                   else tok(t).input_ids for t in texts]
        t_max = max(len(e) for e in encoded)
        ids = np.zeros((len(texts), t_max), np.int64)
        mask = np.zeros((len(texts), t_max), bool)
        for j, e in enumerate(encoded):
            ids[j, : len(e)] = e
            mask[j, : len(e)] = True
        scores = self._score_jit(self.params, jnp.asarray(pixels),
                                 jnp.asarray(ids), jnp.asarray(mask))
        return np.asarray(scores, np.float32)

    def score_matrix(self, images, texts, **kw) -> np.ndarray:
        m, n = len(images), len(texts)
        flat_imgs = [im for im in images for _ in range(n)]
        return self.forward(flat_imgs, list(texts) * m, **kw).reshape(m, n)
