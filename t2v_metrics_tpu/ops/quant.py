"""W8A8 dynamic-quantized matmul path for the T5 score engine.

Why: the clip-flant5-xxl north star (BASELINE config 3, reference
`genai_image_eval.py:22` default model) is FLOPs-bound at 0.96 MFU in
bf16, and v5e's bf16 roofline (197 TFLOPS) caps the single-chip-equivalent
rate below the >=5x target. The MXU runs s8xs8->s32 at 394 TOPS — 2x —
so quantizing the weight matmuls (where ~96% of the xxl FLOPs live)
raises the roofline enough to clear the target.

Scheme (standard LLM W8A8, cf. LLM.int8 / SmoothQuant lineage):
  * weights: symmetric per-output-channel int8, scale = absmax/127 —
    quantized ONCE at load time (`quantize_t5_params`)
  * activations: symmetric per-row (per-token) int8, quantized
    dynamically inside the matmul — absmax reduce + scale + round is an
    elementwise VPU pass O(rows*K), negligible vs the O(rows*K*N) matmul
  * accumulate in int32 on the MXU, dequantize in the f32 epilogue
    (row_scale x col_scale), cast back to the activation dtype

Kept in bf16 deliberately: the lm_head + fp32 log_softmax (the score's
numeric output), layer norms, relative-position bias, attention itself
(flash kernel), and all embeddings. Only q/k/v/o projections (self and
cross) and the MLP wi*/wo matmuls quantize.

Enable per-engine via VQAScore(quant="int8") or env T2V_QUANT=int8.
Parity is gated by tests/test_quant.py: quantized score vs f32 score on
the tiny golden config must stay within the documented tolerance, and
pure-roundtrip cases (weights/activations already on the int8 grid) must
be exact.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

# A quantized linear is a dict leaf {"w_q": int8 (K, N), "scale": f32 (N,)}
# living where the bf16 leaf {"w": (K, N)} would. `mm` dispatches on the
# key so every call site stays a one-liner and un-quantized params flow
# through unchanged.


def quantize_weight(w: jnp.ndarray) -> dict:
    """Symmetric per-output-channel int8 quantization of a (K, N) weight."""
    wf = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=0)                      # (N,)
    scale = jnp.maximum(absmax, 1e-12) / 127.0
    w_q = jnp.round(wf / scale[None, :]).astype(jnp.int8)
    return {"w_q": w_q, "scale": scale}


def _quantize_rows(x: jnp.ndarray):
    """Dynamic symmetric per-row int8: (..., K) -> int8 (..., K), f32 scale
    (..., 1)."""
    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    xs = jnp.maximum(absmax, 1e-12) / 127.0
    x_q = jnp.round(xf / xs).astype(jnp.int8)
    return x_q, xs


def int8_matmul(x: jnp.ndarray, w_q: jnp.ndarray,
                scale: jnp.ndarray) -> jnp.ndarray:
    """x (..., K) @ int8 w_q (K, N) with f32 per-channel scale (N,)."""
    x_q, xs = _quantize_rows(x)
    from . import quant_matmul as qk

    K, N = w_q.shape
    M = x_q.size // K
    if x.dtype == jnp.bfloat16 and qk.use_kernel(M, K, N):
        # Pallas path: dequant epilogue fused into the dot — the XLA
        # epilogue materializes the int32 accumulator in HBM (measured
        # ~16% of the int8 path, scripts/int8_microbench.py). bm adapts
        # to the row count (decoder answer rows are 128-granular).
        bm = 256 if M % 256 == 0 else 128
        out = qk.quant_matmul(x_q.reshape(M, K), w_q,
                              xs.reshape(M, 1).astype(jnp.float32),
                              scale, bm=bm)
        return out.reshape(*x.shape[:-1], N)
    acc = lax.dot_general(x_q, w_q,
                          (((x.ndim - 1,), (0,)), ((), ())),
                          preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * xs * scale).astype(x.dtype)


def mm(x: jnp.ndarray, p: dict) -> jnp.ndarray:
    """Linear through a param leaf: bf16 `{"w"}` or quantized
    `{"w_q","scale"}`. The single matmul indirection all T5 weight-matmul
    call sites route through."""
    if "w_q" in p:
        return int8_matmul(x, p["w_q"], p["scale"])
    return x @ p["w"]


def mm_packed(x: jnp.ndarray, ps: list[dict]) -> jnp.ndarray:
    """ONE wide matmul over horizontally packed leaves [p_q, p_k, p_v].

    bf16: concatenates the weights (the packed-QKV MXU win, see
    models/t5.py). Quantized: concatenates int8 weights and per-channel
    scales — per-row activation quant is shared across the pack, so the
    packed int8 matmul is exactly equivalent to three separate ones.
    Mixed packs are not supported (quantize_t5_params quantizes q/k/v
    together or not at all).
    """
    if "w_q" in ps[0]:
        w_q = jnp.concatenate([p["w_q"] for p in ps], axis=1)
        scale = jnp.concatenate([p["scale"] for p in ps], axis=0)
        return int8_matmul(x, w_q, scale)
    return x @ jnp.concatenate([p["w"] for p in ps], axis=1)


def linear(x: jnp.ndarray, p: dict) -> jnp.ndarray:
    """Linear with optional bias through a bf16 or quantized leaf."""
    y = mm(x, p)
    b = p.get("b")
    return y if b is None else y + b


def linear_packed(x: jnp.ndarray, ps: list[dict]) -> jnp.ndarray:
    """mm_packed with the packed bias (all-or-none across the pack)."""
    y = mm_packed(x, ps)
    bs = [p.get("b") for p in ps]
    if bs[0] is None:
        return y
    return y + jnp.concatenate(bs)


_QUANT_LEAVES = ("q", "k", "v", "o", "wi", "wi_0", "wi_1", "wo")


def quantize_linear(leaf: dict) -> dict:
    """Quantize a {"w", "b"?} linear leaf, carrying the bias through."""
    out = quantize_weight(leaf["w"])
    if leaf.get("b") is not None:
        out["b"] = leaf["b"]
    return out


def quantize_clip_vision_params(vis: dict) -> dict:
    """Quantize a CLIP/SigLIP-style vision tower's attention and MLP
    linears (models/clip.py layout). Patch embedding, position embedding,
    layer norms, and the output projection stay in the original dtype —
    they are a tiny FLOPs fraction and the most numerically sensitive."""
    out = dict(vis)
    blocks = []
    for blk in vis["blocks"]:
        b = dict(blk)
        b["attn"] = {k: (quantize_linear(v) if k in ("q", "k", "v", "o")
                         else v) for k, v in blk["attn"].items()}
        b["mlp"] = {k: (quantize_linear(v) if k in ("fc1", "fc2") else v)
                    for k, v in blk["mlp"].items()}
        blocks.append(b)
    out["blocks"] = blocks
    return out


def quantize_t5_params(t5_params: dict) -> dict:
    """Quantize every attention-projection / MLP weight leaf of a T5
    param tree in place (returns a new tree; embeddings, lm_head, norms,
    rel_bias stay bf16)."""
    def qblock(blk: dict) -> dict:
        out = {}
        for name, sub in blk.items():
            if (name in ("attn", "cross", "mlp") and isinstance(sub, dict)):
                out[name] = {
                    k: (quantize_weight(v["w"])
                        if k in _QUANT_LEAVES and isinstance(v, dict)
                        and "w" in v else v)
                    for k, v in sub.items()}
            else:
                out[name] = sub
        return out

    out = dict(t5_params)
    for side in ("encoder", "decoder"):
        if side in out:
            s = dict(out[side])
            s["blocks"] = [qblock(b) for b in s["blocks"]]
            out[side] = s
    return out
