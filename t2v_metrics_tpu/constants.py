"""Package-wide constants.

Mirrors the reference constant surface (reference: t2v_metrics/constants.py:1-8)
but adds TPU-side defaults. The LLaVA/CLIP-FlanT5 prompt constants are part of
the scoring contract: prompts are spliced on DEFAULT_IMAGE_TOKEN and image
placeholder positions use IMAGE_TOKEN_INDEX.
"""

import os

# Where converted JAX checkpoints and HF downloads live.
HF_CACHE_DIR = os.environ.get("T2V_TPU_CACHE", "./hf_cache/")

# CLIP-FlanT5 / LLaVA-era prompt constants (reference: t2v_metrics/constants.py:3-8)
CONTEXT_LEN = 2048
SYSTEM_MSG = (
    "A chat between a curious human and an artificial intelligence assistant. "
    "The assistant gives helpful, detailed, and polite answers to the human's questions."
)
IGNORE_INDEX = -100
IMAGE_TOKEN_INDEX = -200
DEFAULT_IMAGE_TOKEN = "<image>"

# Default VQAScore templates (reference: V_3.0_README.md:110-125, vqa_model.py:9-18)
DEFAULT_QUESTION_TEMPLATE = 'Does this figure show "{}"? Please answer yes or no.'
DEFAULT_ANSWER_TEMPLATE = "Yes"

# Preprocessing constants.
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
SIGLIP_MEAN = (0.5, 0.5, 0.5)
SIGLIP_STD = (0.5, 0.5, 0.5)

# Video file extensions routed through the video path
# (reference: t2v_metrics/score.py:72).
VIDEO_EXTENSIONS = (".mp4", ".avi", ".mov", ".mkv", ".webm")
