"""Device-only A/B harness for kernel knobs (VERDICT r3 item 2).

Measures the pure device scoring rate (inputs pre-staged, encode+score
looped, one host fetch per result) for the headline clip-flant5-xl shape —
the exact device-only protocol of bench.py — under a given set of kernel
env knobs. Run one subprocess per knob setting (knobs are frozen at package
import, see ops/attention.py:36-50):

    python scripts/device_ab.py --label packed=1
    T2V_FLASH_PACKED=0 python scripts/device_ab.py --label packed=0

Prints one JSON line per run: {"label", "device_only_pairs_per_sec",
"per_repeat", "mfu", ...}. Takes the best repeat: the bench host is a
single shared vCPU with heavy steal, and the axon tunnel adds ~32 ms RTT
per sync — max-of-repeats isolates the device number.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--label", default="default")
    ap.add_argument("--model", default="clip-flant5-xl")
    ap.add_argument("--chunk", type=int, default=128)
    ap.add_argument("--iters", type=int, default=8,
                    help="device passes per repeat (pipelined, one fetch each)")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--profile", default=None,
                    help="write a jax.profiler trace of one repeat here")
    args = ap.parse_args()

    from t2v_metrics_tpu.compile_cache import enable_persistent_cache
    enable_persistent_cache()

    import jax
    import jax.numpy as jnp
    import t2v_metrics_tpu as t2v
    import bench
    from t2v_metrics_tpu.media.images import load_batch
    from t2v_metrics_tpu.models import clip_flant5 as cft5
    from t2v_metrics_tpu.constants import (DEFAULT_QUESTION_TEMPLATE,
                                           DEFAULT_ANSWER_TEMPLATE)

    scorer = t2v.VQAScore(model=args.model, init="random",
                          dtype=jnp.bfloat16, max_pairs_per_call=args.chunk)
    eng = scorer.model.engine

    rng = np.random.default_rng(0)
    imgs = [rng.integers(0, 256, (512, 512, 3), dtype=np.uint8)
            for _ in range(args.chunk)]
    txts = [f"a photo of scene {i} with several objects and a detailed "
            f"background arrangement" for i in range(args.chunk)]
    pixels = jnp.asarray(load_batch(imgs, eng.cfg.vision.image_size,
                                    pad_square=True, raw_uint8=True))
    questions = [cft5.format_question(DEFAULT_QUESTION_TEMPLATE.format(t),
                                      eng.cfg.conversation) for t in txts]
    answers = [cft5.format_answer(DEFAULT_ANSWER_TEMPLATE.format(t),
                                  eng.cfg.conversation) for t in txts]
    arrays = eng._build_text_arrays(questions, answers)
    dev = tuple(jnp.asarray(a) for a in arrays)
    enc_seq, ans_len = arrays[0].shape[1], arrays[4].shape[1]

    idxs = [jnp.asarray(np.roll(np.arange(args.chunk, dtype=np.int32), k))
            for k in range(args.iters + 1)]

    def device_pass(k):
        feats = eng._encode(eng.params, pixels=pixels)
        return eng._score(eng.params, feats, *dev, pair_image=idxs[k],
                          pair_text=idxs[k])

    np.asarray(device_pass(args.iters))  # warm + sync

    per_repeat = []
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        outs = [device_pass(k) for k in range(args.iters)]
        for o in outs:
            np.asarray(o)
        per_repeat.append(args.chunk * args.iters
                          / (time.perf_counter() - t0))

    if args.profile:
        with jax.profiler.trace(args.profile):
            outs = [device_pass(k) for k in range(args.iters)]
            for o in outs:
                np.asarray(o)

    best = max(per_repeat)
    fpp = bench.flops_per_pair(eng.cfg, enc_seq, ans_len)
    peak = bench._peak_tflops(jax.devices()[0])
    print(json.dumps({
        "label": args.label,
        "knobs": {k: os.environ.get(k, "<default>") for k in
                  ("T2V_FLASH_PACKED", "T2V_FLASH_SINGLEK", "T2V_ATTN_IMPL",
                   "T2V_FUSED_LN")},
        "device_only_pairs_per_sec": round(best, 3),
        "per_repeat": [round(p, 3) for p in per_repeat],
        "mfu": round(best * fpp / (peak * 1e12), 3),
        "flops_per_pair_g": round(fpp / 1e9, 1),
        "enc_seq": enc_seq, "chunk": args.chunk, "iters": args.iters,
        "platform": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
