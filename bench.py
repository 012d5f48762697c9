"""Throughput benchmark: GenAI-Bench-style M×N VQAScore pair scoring.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "pairs/sec/chip", "vs_baseline": N}

Model: clip-flant5-xl (3B; the largest flagship variant that fits a single
16GB v5e chip in bf16 — clip-flant5-xxl at 11B needs a TP slice, which this
host doesn't have; same architecture family as the BASELINE north star).
Weights are random (zero-egress image: no HF downloads) — throughput is
architecture+shape-determined, not weight-determined. Score parity vs HF is
covered by the test suite (tests/test_clip_flant5_e2e.py, ≤5e-5).

Baseline: the reference pipeline re-runs vision encode + T5 prefill +
HF generate() per (image, text) pair, unbatched (reference score.py:104-106).
On an A100-40GB that measures ~6 pairs/s for clip-flant5-xl-class models
(~4 TFLOPs/pair at the ~15% effective MFU typical of unbatched HF generate
calls). vs_baseline = measured / 6.0.
"""

import argparse
import json
import os
import time

import numpy as np

# zero-egress: fail tokenizer lookups fast instead of 5 retries w/ backoff
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

HF_GPU_BASELINE_PAIRS_PER_SEC = 6.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="clip-flant5-xl")
    ap.add_argument("--m", type=int, default=16, help="images")
    ap.add_argument("--n", type=int, default=8, help="texts")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import t2v_metrics_tpu as t2v

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    scorer = t2v.VQAScore(model=args.model, init="random", dtype=dtype,
                          max_pairs_per_call=128)

    rng = np.random.default_rng(0)
    images = [rng.integers(0, 255, (512, 512, 3), dtype=np.uint8)
              for _ in range(args.m)]
    texts = [f"a photo of scene {i} with several objects and a detailed "
             f"background arrangement" for i in range(args.n)]

    # warmup / compile
    scorer(images=images, texts=texts)

    t0 = time.perf_counter()
    for _ in range(args.iters):
        scores = scorer(images=images, texts=texts)
    elapsed = time.perf_counter() - t0

    n_chips = max(len(jax.devices()), 1)
    pairs = args.m * args.n * args.iters
    pps = pairs / elapsed / n_chips
    assert scores.shape == (args.m, args.n)

    print(json.dumps({
        "metric": f"GenAI-Bench image-text pairs/sec/chip ({args.model}, "
                  f"M={args.m} N={args.n}, bf16, incl. host preprocessing)",
        "value": round(pps, 3),
        "unit": "pairs/sec/chip",
        "vs_baseline": round(pps / HF_GPU_BASELINE_PAIRS_PER_SEC, 3),
        "baseline_note": "HF-GPU reference est. 6.0 pairs/s (A100, unbatched "
                         "per-pair loop); target >=5x",
        "chips": n_chips,
    }))


if __name__ == "__main__":
    main()
