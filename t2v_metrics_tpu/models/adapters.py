"""Model adapters: the registry-facing classes behind VQAScore/CLIPScore.

Mirrors the reference adapter contract (reference:
t2v_metrics/models/model.py:16-47 — abstract ScoreModel with
load_model/load_images/forward; vqascore_models/vqa_model.py:9-18 — adds
question_template/answer_template) while delegating compute to the batched
TPU engines in `engine/scoring.py`.

Class attributes `video_mode` / `allows_image` / `allows_video` /
`allows_audio` / `supports_trace` drive Score-level routing exactly like the
reference (score.py:70-101).
"""

from __future__ import annotations

import os
import warnings

import numpy as np
import jax
import jax.numpy as jnp

from ..constants import (HF_CACHE_DIR, DEFAULT_QUESTION_TEMPLATE,
                         DEFAULT_ANSWER_TEMPLATE)
from ..engine.scoring import CLIPT5Engine, CLIPEngine
from ..tokenization import SimpleT5Tokenizer, load_hf_tokenizer
from . import clip as jclip
from . import clip_flant5 as cft5
from . import t5 as jt5


class ScoreModel:
    """Abstract adapter (reference model.py:16-27)."""

    video_mode = "direct"
    allows_image = True
    allows_video = False
    allows_audio = False
    supports_trace = False

    def __init__(self, model_name: str, device: str = "tpu",
                 cache_dir: str = HF_CACHE_DIR, **kwargs):
        self.model_name = model_name
        self.device = device
        self.cache_dir = cache_dir
        os.makedirs(cache_dir, exist_ok=True)
        self.kwargs = kwargs
        self.load_model()

    def load_model(self):
        raise NotImplementedError

    def load_images(self, images):
        raise NotImplementedError

    def forward(self, images, texts, **kwargs):
        raise NotImplementedError


class VQAScoreModel(ScoreModel):
    """Adds the template contract (reference vqa_model.py:9-18)."""

    def forward(self, images, texts,
                question_template: str = DEFAULT_QUESTION_TEMPLATE,
                answer_template: str = DEFAULT_ANSWER_TEMPLATE,
                **kwargs):
        raise NotImplementedError


def _default_dtype():
    return jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32


# ---------------------------------------------------------------------------
# CLIP-FlanT5
# ---------------------------------------------------------------------------

# Tiny configs for tests / smoke runs (no pretrained weights needed).
_TEST_T5 = jt5.T5Config(vocab_size=512, d_model=64, d_kv=16, d_ff=128,
                        num_heads=4, enc_layers=2, dec_layers=2)
_TEST_VISION = jclip.CLIPVisionConfig(image_size=56, patch_size=14, width=32,
                                      layers=2, heads=4, mlp_dim=64, proj_dim=32)

CLIP_T5_MODELS = {
    "clip-flant5-xxl": {
        "config": cft5.CLIP_T5_CONFIGS["clip-flant5-xxl"],
        "hf_repo": "zhiqiulin/clip-flant5-xxl",
        "tokenizer": "google/flan-t5-xxl",
    },
    "clip-flant5-xl": {
        "config": cft5.CLIP_T5_CONFIGS["clip-flant5-xl"],
        "hf_repo": "zhiqiulin/clip-flant5-xl",
        "tokenizer": "google/flan-t5-xl",
    },
    "clip-flant5-test": {
        "config": cft5.CLIPT5Config(t5=_TEST_T5, vision=_TEST_VISION,
                                    num_image_tokens=16),
        "hf_repo": None,
        "tokenizer": None,
    },
}


def _require_hub(repo: str) -> None:
    """Fast-fail weight loads in offline environments (one DNS probe
    instead of ~40s of HF urllib retries per model). A local directory or
    a warm HF cache entry still loads offline."""
    import os

    from ..tokenization import hub_reachable

    if os.path.isdir(repo) or hub_reachable():
        return
    try:  # cached snapshots load fine offline — check before failing
        from huggingface_hub import try_to_load_from_cache

        from ..constants import HF_CACHE_DIR

        for cache_dir in (None, HF_CACHE_DIR):
            hit = try_to_load_from_cache(repo, "config.json",
                                         cache_dir=cache_dir)
            if isinstance(hit, str):
                return
    except Exception:
        pass
    raise RuntimeError(
        f"hub unreachable and {repo!r} is neither a local directory nor "
        "cached")


class CLIPT5Adapter(VQAScoreModel):
    """CLIP-FlanT5 VQAScore adapter (flagship; BASELINE configs 2-3).

    kwargs:
      checkpoint: local dir with converted/safetensors weights
      init: 'random' to build random weights (bench/offline)
      dtype: jnp dtype for params
      mesh: jax.sharding.Mesh for TP/DP sharding
      seed: PRNG seed for random init
      quant: 'int8' for W8A8 dynamic-quantized T5 matmuls (2x MXU rate on
        v5e; parity gated by tests/test_quant.py) — also via T2V_QUANT=int8
    """

    video_mode = "concat"
    allows_image = True
    allows_video = False

    def load_model(self):
        name = self.model_name
        spec = CLIP_T5_MODELS[name]
        cfg: cft5.CLIPT5Config = self.kwargs.get("config") or spec["config"]
        self.config = cfg
        dtype = self.kwargs.get("dtype") or _default_dtype()
        mesh = self.kwargs.get("mesh")

        params = self.kwargs.get("params")
        if params is None:
            ckpt = self.kwargs.get("checkpoint")
            if ckpt and os.path.isdir(ckpt):
                params = self._load_checkpoint(ckpt, cfg, dtype)
            elif self.kwargs.get("init") == "random" or spec["hf_repo"] is None:
                params = cft5.init_clip_t5(
                    jax.random.PRNGKey(self.kwargs.get("seed", 0)), cfg, dtype)
            else:
                params = self._load_from_hf(spec["hf_repo"], cfg, dtype)

        tokenizer = self.kwargs.get("tokenizer")
        if isinstance(tokenizer, str):  # local tokenizer dir (cold path)
            tokenizer = load_hf_tokenizer(tokenizer)
        if tokenizer is None:
            if spec["tokenizer"]:
                try:
                    tokenizer = load_hf_tokenizer(spec["tokenizer"])
                except Exception:
                    warnings.warn(
                        f"could not load tokenizer {spec['tokenizer']} "
                        "(offline?); falling back to SimpleT5Tokenizer — "
                        "scores will NOT match pretrained weights")
                    tokenizer = SimpleT5Tokenizer(cfg.t5.vocab_size)
            else:
                tokenizer = SimpleT5Tokenizer(cfg.t5.vocab_size)

        quant = self.kwargs.get("quant") or os.environ.get("T2V_QUANT")
        if quant in ("int8", "int8+vit"):
            from ..ops.quant import (quantize_clip_vision_params,
                                     quantize_t5_params)
            params = dict(params)
            params["t5"] = quantize_t5_params(params["t5"])
            if quant == "int8+vit":
                params["vision"] = quantize_clip_vision_params(
                    params["vision"])
        elif quant:
            raise ValueError(
                f"unknown quant mode {quant!r} ('int8' or 'int8+vit')")

        self.engine = CLIPT5Engine(
            params, cfg, tokenizer, mesh=mesh,
            max_pairs_per_call=self.kwargs.get("max_pairs_per_call", 128))

    def _load_checkpoint(self, path, cfg, dtype):
        """Local checkpoint dir: either a native npz tree (manifest.json)
        or an HF-style multi-shard safetensors layout streamed tensor-by-
        tensor (BASELINE cold path — no hub, bounded host RAM)."""
        import glob

        from .checkpoint import load_params, load_safetensors_dict

        if glob.glob(os.path.join(path, "*.safetensors")):
            sd = load_safetensors_dict(path)
            return cft5.convert_clip_t5(sd, cfg, dtype)
        if not os.path.exists(os.path.join(path, "manifest.json")):
            raise RuntimeError(
                f"{path!r} is neither an HF safetensors checkpoint "
                "(*.safetensors) nor a native npz tree (manifest.json)")
        return load_params(path, dtype=dtype)

    def _load_from_hf(self, repo, cfg, dtype):
        try:
            _require_hub(repo)
            import torch
            from transformers import AutoModelForSeq2SeqLM
            hf = AutoModelForSeq2SeqLM.from_pretrained(
                repo, cache_dir=self.cache_dir, torch_dtype=torch.float32,
                trust_remote_code=True)
            return cft5.convert_clip_t5(hf.state_dict(), cfg, dtype)
        except Exception as e:
            raise RuntimeError(
                f"cannot load {repo}: {e}. In offline environments pass "
                "checkpoint=<dir> or init='random'.") from e

    def load_images(self, images):
        return images  # engine handles decode+preprocess batched

    def forward(self, images, texts,
                question_template: str = DEFAULT_QUESTION_TEMPLATE,
                answer_template: str = DEFAULT_ANSWER_TEMPLATE,
                **kwargs) -> np.ndarray:
        """Pairwise scores, len(images)==len(texts) -> (P,)."""
        return self.engine.forward_pairwise(
            images, texts, question_template, answer_template)

    def forward_device(self, images, texts,
                       question_template: str = DEFAULT_QUESTION_TEMPLATE,
                       answer_template: str = DEFAULT_ANSWER_TEMPLATE,
                       **kwargs):
        """Async pairwise scoring: (device array, count) with no host sync —
        lets batch_forward overlap host prep with device compute."""
        return self.engine.forward_pairwise_device(
            images, texts, question_template, answer_template)

    def prepare_pairs(self, images, texts,
                      question_template: str = DEFAULT_QUESTION_TEMPLATE,
                      answer_template: str = DEFAULT_ANSWER_TEMPLATE,
                      slot: int | None = None, **kwargs):
        """Host-only stage of pairwise scoring (decode/resize/tokenize);
        feeds forward_device_prepared. batch_forward runs this in its own
        pipeline stage so host resize overlaps the H2D transfer."""
        return self.engine.prepare_pairs(images, texts, question_template,
                                         answer_template, slot=slot)

    def forward_device_prepared(self, prep):
        """Transfer + dispatch stage for a prepare_pairs dict."""
        return self.engine.forward_device_prepared(prep)

    def score_matrix(self, images, texts,
                     question_template: str = DEFAULT_QUESTION_TEMPLATE,
                     answer_template: str = DEFAULT_ANSWER_TEMPLATE,
                     **kwargs) -> np.ndarray:
        """(M, N) matrix with one vision encode per image (TPU fast path)."""
        return self.engine.score_matrix(
            images, texts, question_template, answer_template)

    def generate(self, images, texts, max_new_tokens: int = 128,
                 **kwargs) -> list[str]:
        """Greedy continuation (v3.0 CLIP-FlanT5 LLaVA-style generate)."""
        return self.engine.generate(images, texts,
                                    max_new_tokens=max_new_tokens)


# ---------------------------------------------------------------------------
# CLIPScore (OpenCLIP cosine similarity)
# ---------------------------------------------------------------------------

_TEST_CLIP_V = jclip.CLIPVisionConfig(image_size=32, patch_size=8, width=32,
                                      layers=2, heads=4, mlp_dim=64, proj_dim=24)
_TEST_CLIP_T = jclip.CLIPTextConfig(vocab_size=256, context_length=16, width=32,
                                    layers=2, heads=4, mlp_dim=64, proj_dim=24)

CLIP_SCORE_MODELS = {
    # OpenCLIP names: "pretrain_tag:Arch" (reference V_3.0_README.md:66-75)
    "openai:ViT-B-32": {"arch": "ViT-B-32", "hf_repo": "openai/clip-vit-base-patch32"},
    "openai:ViT-B-16": {"arch": "ViT-B-16", "hf_repo": "openai/clip-vit-base-patch16"},
    "openai:ViT-L-14": {"arch": "ViT-L-14", "hf_repo": "openai/clip-vit-large-patch14"},
    "openai:ViT-L-14-336": {"arch": "ViT-L-14-336", "hf_repo": "openai/clip-vit-large-patch14-336"},
    "clipscore-test": {"arch": None, "hf_repo": None},
}


def resolve_clipscore_name(name: str):
    """Accept any ``pretrain_tag:Arch`` OpenCLIP-style name whose Arch is a
    known architecture (reference: CLIPScore names any OpenCLIP checkpoint,
    V_3.0_README.md:66-75)."""
    if name in CLIP_SCORE_MODELS:
        return CLIP_SCORE_MODELS[name]
    if ":" in name:
        tag, arch = name.split(":", 1)
        if arch in jclip.CLIP_ARCHS:
            return {"arch": arch, "hf_repo": None if tag != "openai" else
                    CLIP_SCORE_MODELS.get(f"openai:{arch}", {}).get("hf_repo")}
    return None


class CLIPScoreAdapter(ScoreModel):
    """CLIPScore = cosine similarity of CLIP image/text embeddings
    (reference CLIPScore family, V_3.0_README.md:66-75). BASELINE config 1."""

    video_mode = "concat"

    def load_model(self):
        spec = resolve_clipscore_name(self.model_name)
        if spec is None:
            raise ValueError(f"unknown CLIPScore model {self.model_name!r}")
        if spec["arch"]:
            vcfg, tcfg = jclip.CLIP_ARCHS[spec["arch"]]
        else:
            vcfg, tcfg = _TEST_CLIP_V, _TEST_CLIP_T
        vcfg = self.kwargs.get("vision_config") or vcfg
        tcfg = self.kwargs.get("text_config") or tcfg
        self.vcfg, self.tcfg = vcfg, tcfg
        dtype = self.kwargs.get("dtype") or _default_dtype()

        params = self.kwargs.get("params")
        if params is None:
            if self.kwargs.get("init") == "random" or spec["hf_repo"] is None:
                params = jclip.init_clip(
                    jax.random.PRNGKey(self.kwargs.get("seed", 0)),
                    vcfg, tcfg, dtype)
            else:
                params = self._load_from_hf(spec["hf_repo"], vcfg, tcfg, dtype)

        tokenizer = self.kwargs.get("tokenizer")
        if tokenizer is None:
            if spec["hf_repo"] is None:
                tokenizer = SimpleT5Tokenizer(tcfg.vocab_size)
            else:
                try:
                    tokenizer = load_hf_tokenizer(spec["hf_repo"])
                except Exception:
                    warnings.warn("CLIP tokenizer unavailable (offline?); "
                                  "using SimpleT5Tokenizer placeholder")
                    tokenizer = SimpleT5Tokenizer(tcfg.vocab_size)

        self.engine = CLIPEngine(params, vcfg, tcfg, tokenizer,
                                 mesh=self.kwargs.get("mesh"))

    def _load_from_hf(self, repo, vcfg, tcfg, dtype):
        try:
            _require_hub(repo)
            from transformers import CLIPModel
            from .convert import convert_clip
            hf = CLIPModel.from_pretrained(repo, cache_dir=self.cache_dir)
            return convert_clip(hf.state_dict(), vcfg.layers, tcfg.layers, dtype)
        except Exception as e:
            raise RuntimeError(
                f"cannot load {repo}: {e}. Pass init='random' or params= "
                "in offline environments.") from e

    def load_images(self, images):
        return images

    def forward(self, images, texts, **kwargs) -> np.ndarray:
        return self.engine.forward_pairwise(images, texts)

    def score_matrix(self, images, texts, **kwargs) -> np.ndarray:
        return self.engine.score_matrix(images, texts)
