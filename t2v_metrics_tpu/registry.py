"""Model registry: name -> adapter dispatch.

Mirrors the reference registry layer (reference:
t2v_metrics/models/vqascore_models/__init__.py:14-54) with the v3.0 legacy
scorers (CLIP-FlanT5, CLIPScore) restored per BASELINE.json.

Families are registered lazily so importing the package never pulls heavy
model code.
"""

from __future__ import annotations

from typing import Callable


_VQA_FAMILIES: list[tuple[Callable[[], dict], Callable]] = []
_CLIP_FAMILIES: list[tuple[Callable[[], dict], Callable]] = []
_ITM_FAMILIES: list[tuple[Callable[[], dict], Callable]] = []


def _register_builtin():
    if _VQA_FAMILIES:
        return

    def clip_t5_names():
        from .models.adapters import CLIP_T5_MODELS
        return CLIP_T5_MODELS

    def clip_t5_build(name, device, cache_dir, **kw):
        from .models.adapters import CLIPT5Adapter
        return CLIPT5Adapter(name, device, cache_dir, **kw)

    _VQA_FAMILIES.append((clip_t5_names, clip_t5_build))

    def qwen2vl_names():
        from .models.qwen2vl import QWEN2_VL_MODELS
        return QWEN2_VL_MODELS

    def qwen2vl_build(name, device, cache_dir, **kw):
        from .models.qwen2vl_adapter import Qwen2VLAdapter
        return Qwen2VLAdapter(name, device, cache_dir, **kw)

    _VQA_FAMILIES.append((qwen2vl_names, qwen2vl_build))

    def qwen3vl_names():
        from .models.qwen3vl import QWEN3_VL_MODELS
        return QWEN3_VL_MODELS

    def qwen3vl_build(name, device, cache_dir, **kw):
        from .models.qwen3vl_adapter import Qwen3VLAdapter
        return Qwen3VLAdapter(name, device, cache_dir, **kw)

    _VQA_FAMILIES.append((qwen3vl_names, qwen3vl_build))

    def gemma3_names():
        from .models.gemma3 import GEMMA3_MODELS
        return GEMMA3_MODELS

    def gemma3_build(name, device, cache_dir, **kw):
        from .models.gemma_adapters import Gemma3Adapter
        return Gemma3Adapter(name, device, cache_dir, **kw)

    _VQA_FAMILIES.append((gemma3_names, gemma3_build))

    def paligemma_names():
        from .models.paligemma import PALIGEMMA_MODELS
        return PALIGEMMA_MODELS

    def paligemma_build(name, device, cache_dir, **kw):
        from .models.gemma_adapters import PaliGemmaAdapter
        return PaliGemmaAdapter(name, device, cache_dir, **kw)

    _VQA_FAMILIES.append((paligemma_names, paligemma_build))

    def gemma4_names():
        from .models.gemma4 import GEMMA4_MODELS
        return GEMMA4_MODELS

    def gemma4_build(name, device, cache_dir, **kw):
        from .models.gemma_adapters import Gemma4Adapter
        return Gemma4Adapter(name, device, cache_dir, **kw)

    _VQA_FAMILIES.append((gemma4_names, gemma4_build))

    def molmo2_names():
        from .models.molmo2 import MOLMO2_MODELS
        return MOLMO2_MODELS

    def molmo2_build(name, device, cache_dir, **kw):
        from .models.molmo2_adapter import Molmo2Adapter
        return Molmo2Adapter(name, device, cache_dir, **kw)

    _VQA_FAMILIES.append((molmo2_names, molmo2_build))

    def qwen3omni_names():
        from .models.qwen3omni import QWEN3_OMNI_MODELS
        return QWEN3_OMNI_MODELS

    def qwen3omni_build(name, device, cache_dir, **kw):
        from .models.qwen3omni_adapter import Qwen3OmniAdapter
        return Qwen3OmniAdapter(name, device, cache_dir, **kw)

    _VQA_FAMILIES.append((qwen3omni_names, qwen3omni_build))

    def internvl_names():
        from .models.internvl import INTERNVL_MODELS
        return INTERNVL_MODELS

    def internvl_build(name, device, cache_dir, **kw):
        from .models.internvl_adapter import InternVLAdapter
        return InternVLAdapter(name, device, cache_dir, **kw)

    _VQA_FAMILIES.append((internvl_names, internvl_build))

    def llava_names():
        from .models.llava import LLAVA_MODELS
        return LLAVA_MODELS

    def llava_build(name, device, cache_dir, **kw):
        from .models.llava_adapter import LlavaAdapter
        return LlavaAdapter(name, device, cache_dir, **kw)

    _VQA_FAMILIES.append((llava_names, llava_build))

    def instructblip_names():
        from .models.instructblip import INSTRUCTBLIP_MODELS
        return INSTRUCTBLIP_MODELS

    def instructblip_build(name, device, cache_dir, **kw):
        from .models.instructblip_adapter import InstructBlipAdapter
        return InstructBlipAdapter(name, device, cache_dir, **kw)

    _VQA_FAMILIES.append((instructblip_names, instructblip_build))

    def gpt4v_names():
        from .remote.gpt4v import GPT4V_MODELS
        return GPT4V_MODELS

    def gpt4v_build(name, device, cache_dir, **kw):
        from .remote.gpt4v import GPT4VAdapter
        return GPT4VAdapter(name, device, cache_dir, **kw)

    _VQA_FAMILIES.append((gpt4v_names, gpt4v_build))

    def gemini_names():
        from .remote.gemini import GEMINI_MODELS
        return GEMINI_MODELS

    def gemini_build(name, device, cache_dir, **kw):
        from .remote.gemini import GeminiAdapter
        return GeminiAdapter(name, device, cache_dir, **kw)

    _VQA_FAMILIES.append((gemini_names, gemini_build))

    def clipscore_names():
        from .models.adapters import CLIP_SCORE_MODELS
        return CLIP_SCORE_MODELS

    def clipscore_build(name, device, cache_dir, **kw):
        from .models.adapters import CLIPScoreAdapter
        return CLIPScoreAdapter(name, device, cache_dir, **kw)

    _CLIP_FAMILIES.append((clipscore_names, clipscore_build))

    def itm_names():
        from .models.blip2_itm import BLIP2_ITM_MODELS
        return BLIP2_ITM_MODELS

    def itm_build(name, device, cache_dir, **kw):
        from .models.itm_adapter import Blip2ITMAdapter
        return Blip2ITMAdapter(name, device, cache_dir, **kw)

    _ITM_FAMILIES.append((itm_names, itm_build))


def list_all_vqascore_models() -> list[str]:
    _register_builtin()
    out = []
    for names_fn, _ in _VQA_FAMILIES:
        try:
            out.extend(names_fn().keys())
        except ImportError:
            pass
    return out


def list_all_clipscore_models() -> list[str]:
    _register_builtin()
    out = []
    for names_fn, _ in _CLIP_FAMILIES:
        out.extend(names_fn().keys())
    return out


def list_all_itmscore_models() -> list[str]:
    _register_builtin()
    out = []
    for names_fn, _ in _ITM_FAMILIES:
        out.extend(names_fn().keys())
    return out


def get_vqascore_model(model_name: str, device: str = "tpu",
                       cache_dir: str | None = None, **kwargs):
    _register_builtin()
    from .constants import HF_CACHE_DIR
    cache_dir = cache_dir or HF_CACHE_DIR
    for names_fn, build_fn in _VQA_FAMILIES:
        try:
            if model_name in names_fn():
                return build_fn(model_name, device, cache_dir, **kwargs)
        except ImportError:
            continue
    raise ValueError(f"unknown VQAScore model {model_name!r}; "
                     f"available: {list_all_vqascore_models()}")


def get_clipscore_model(model_name: str, device: str = "tpu",
                        cache_dir: str | None = None, **kwargs):
    _register_builtin()
    from .constants import HF_CACHE_DIR
    cache_dir = cache_dir or HF_CACHE_DIR
    for names_fn, build_fn in _CLIP_FAMILIES:
        if model_name in names_fn():
            return build_fn(model_name, device, cache_dir, **kwargs)
    # any "pretrain_tag:Arch" OpenCLIP-style name with a known architecture
    from .models.adapters import resolve_clipscore_name, CLIPScoreAdapter
    if resolve_clipscore_name(model_name) is not None:
        return CLIPScoreAdapter(model_name, device, cache_dir, **kwargs)
    raise ValueError(f"unknown CLIPScore model {model_name!r}; "
                     f"available: {list_all_clipscore_models()}")


def get_itmscore_model(model_name: str, device: str = "tpu",
                       cache_dir: str | None = None, **kwargs):
    _register_builtin()
    from .constants import HF_CACHE_DIR
    cache_dir = cache_dir or HF_CACHE_DIR
    for names_fn, build_fn in _ITM_FAMILIES:
        if model_name in names_fn():
            return build_fn(model_name, device, cache_dir, **kwargs)
    raise ValueError(f"unknown ITMScore model {model_name!r}; "
                     f"available: {list_all_itmscore_models()}")
