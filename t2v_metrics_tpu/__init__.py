"""t2v_metrics_tpu — TPU-native text-to-visual evaluation metrics.

A ground-up JAX/XLA/Pallas rebuild of the `t2v_metrics` evaluation library
(VQAScore / CLIPScore / ITMScore and the GenAI-Bench + CameraBench harnesses).
Public surface mirrors the reference package
(reference: t2v_metrics/__init__.py:26-33):

    import t2v_metrics_tpu as t2v
    scorer = t2v.VQAScore(model="clip-flant5-xxl")
    scores = scorer(images=["image.png"], texts=["a photo of a cat"])

Unlike the reference, importing does not require an ffmpeg binary: video
decode is OpenCV-based and only checked when a video is actually scored.
"""

from .score import Score, VQAScore, CLIPScore, ITMScore
from .registry import (
    list_all_vqascore_models,
    list_all_clipscore_models,
    list_all_itmscore_models,
)
from . import constants

__version__ = "0.1.0"


def list_all_models() -> list[str]:
    """All registered scoring models (reference __init__.py:26-27)."""
    return (list_all_vqascore_models() + list_all_clipscore_models()
            + list_all_itmscore_models())


def get_score_model(model: str = "clip-flant5-xxl", device: str = "tpu",
                    cache_dir: str | None = None, **kwargs):
    """Instantiate the right Score facade for a model name
    (reference __init__.py:29-33)."""
    if model in list_all_vqascore_models():
        return VQAScore(model, device, cache_dir, **kwargs)
    if model in list_all_clipscore_models():
        return CLIPScore(model, device, cache_dir, **kwargs)
    if model in list_all_itmscore_models():
        return ITMScore(model, device, cache_dir, **kwargs)
    raise ValueError(f"unknown model {model!r}; available: {list_all_models()}")
