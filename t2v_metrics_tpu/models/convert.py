"""HF checkpoint → JAX pytree converters.

Converts HuggingFace `state_dict` tensors (torch, CPU) or safetensors files
into this package's functional parameter pytrees. Used both by the production
checkpoint loader and by the golden-parity tests (tiny random HF models →
convert → compare logits).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def t2np(t) -> np.ndarray:
    """torch tensor -> numpy (no copy when possible)."""
    return t.detach().cpu().numpy()


def _lin(sd, prefix, dtype):
    """torch Linear (out,in) -> {w:(in,out), b}."""
    out = {"w": jnp.asarray(t2np(sd[prefix + ".weight"]).T, dtype)}
    if prefix + ".bias" in sd:
        out["b"] = jnp.asarray(t2np(sd[prefix + ".bias"]), dtype)
    else:
        out["b"] = None
    return out


def _ln(sd, prefix, dtype):
    return {"scale": jnp.asarray(t2np(sd[prefix + ".weight"]), dtype),
            "bias": jnp.asarray(t2np(sd[prefix + ".bias"]), dtype)}


# ---------------------------------------------------------------------------
# CLIP
# ---------------------------------------------------------------------------

def _clip_block(sd, p, dtype):
    return {
        "ln1": _ln(sd, f"{p}.layer_norm1", dtype),
        "attn": {
            "q": _lin(sd, f"{p}.self_attn.q_proj", dtype),
            "k": _lin(sd, f"{p}.self_attn.k_proj", dtype),
            "v": _lin(sd, f"{p}.self_attn.v_proj", dtype),
            "o": _lin(sd, f"{p}.self_attn.out_proj", dtype),
        },
        "ln2": _ln(sd, f"{p}.layer_norm2", dtype),
        "mlp": {
            "fc1": _lin(sd, f"{p}.mlp.fc1", dtype),
            "fc2": _lin(sd, f"{p}.mlp.fc2", dtype),
        },
    }


def convert_clip_vision(sd, num_layers: int, dtype=jnp.float32, prefix="vision_model"):
    """HF CLIPVisionModel(+projection) state dict -> our vision pytree.

    The conv patch embedding (width, 3, p, p) flattens to a
    (3*p*p, width) matmul weight matching `ops.image.patchify` layout.
    """
    conv_w = t2np(sd[f"{prefix}.embeddings.patch_embedding.weight"])  # (W, 3, p, p)
    width = conv_w.shape[0]
    patch_w = conv_w.reshape(width, -1).T  # (3*p*p, W)
    out = {
        "class_emb": jnp.asarray(t2np(sd[f"{prefix}.embeddings.class_embedding"]), dtype),
        "patch_w": jnp.asarray(patch_w, dtype),
        "pos_emb": jnp.asarray(t2np(sd[f"{prefix}.embeddings.position_embedding.weight"]), dtype),
        "ln_pre": _ln(sd, f"{prefix}.pre_layrnorm", dtype),
        "blocks": [_clip_block(sd, f"{prefix}.encoder.layers.{i}", dtype)
                   for i in range(num_layers)],
        "ln_post": _ln(sd, f"{prefix}.post_layernorm", dtype),
    }
    if "visual_projection.weight" in sd:
        out["proj"] = jnp.asarray(t2np(sd["visual_projection.weight"]).T, dtype)
    else:
        out["proj"] = None
    return out


def convert_clip_text(sd, num_layers: int, dtype=jnp.float32, prefix="text_model"):
    out = {
        "tok_emb": jnp.asarray(t2np(sd[f"{prefix}.embeddings.token_embedding.weight"]), dtype),
        "pos_emb": jnp.asarray(t2np(sd[f"{prefix}.embeddings.position_embedding.weight"]), dtype),
        "blocks": [_clip_block(sd, f"{prefix}.encoder.layers.{i}", dtype)
                   for i in range(num_layers)],
        "ln_final": _ln(sd, f"{prefix}.final_layer_norm", dtype),
    }
    if "text_projection.weight" in sd:
        out["proj"] = jnp.asarray(t2np(sd["text_projection.weight"]).T, dtype)
    else:
        out["proj"] = None
    return out


def convert_clip(sd, vision_layers: int, text_layers: int, dtype=jnp.float32):
    """Full HF CLIPModel state dict -> {vision, text, logit_scale}."""
    return {
        "vision": convert_clip_vision(sd, vision_layers, dtype),
        "text": convert_clip_text(sd, text_layers, dtype),
        "logit_scale": jnp.asarray(t2np(sd["logit_scale"]), jnp.float32),
    }


# ---------------------------------------------------------------------------
# T5 (FlanT5 encoder-decoder)
# ---------------------------------------------------------------------------

def _t5_attn(sd, p, dtype):
    out = {
        "q": {"w": jnp.asarray(t2np(sd[f"{p}.q.weight"]).T, dtype), "b": None},
        "k": {"w": jnp.asarray(t2np(sd[f"{p}.k.weight"]).T, dtype), "b": None},
        "v": {"w": jnp.asarray(t2np(sd[f"{p}.v.weight"]).T, dtype), "b": None},
        "o": {"w": jnp.asarray(t2np(sd[f"{p}.o.weight"]).T, dtype), "b": None},
    }
    rel = f"{p}.relative_attention_bias.weight"
    if rel in sd:
        out["rel_bias"] = jnp.asarray(t2np(sd[rel]), dtype)  # (num_buckets, heads)
    return out


def _t5_rms(sd, p, dtype):
    return {"scale": jnp.asarray(t2np(sd[p + ".weight"]), dtype)}


def _t5_mlp(sd, p, dtype, gated: bool):
    if gated:
        return {
            "wi_0": {"w": jnp.asarray(t2np(sd[f"{p}.wi_0.weight"]).T, dtype), "b": None},
            "wi_1": {"w": jnp.asarray(t2np(sd[f"{p}.wi_1.weight"]).T, dtype), "b": None},
            "wo": {"w": jnp.asarray(t2np(sd[f"{p}.wo.weight"]).T, dtype), "b": None},
        }
    return {
        "wi": {"w": jnp.asarray(t2np(sd[f"{p}.wi.weight"]).T, dtype), "b": None},
        "wo": {"w": jnp.asarray(t2np(sd[f"{p}.wo.weight"]).T, dtype), "b": None},
    }


def convert_t5(sd, num_layers_enc: int, num_layers_dec: int, dtype=jnp.float32,
               gated: bool = True, prefix: str = ""):
    """HF T5ForConditionalGeneration state dict -> our T5 pytree.

    Layout mirrors HF module paths: encoder.block.N.layer.0 = self-attn,
    layer.1 = mlp; decoder layer.0 self-attn, layer.1 cross-attn, layer.2 mlp.
    """
    P = prefix
    enc_blocks = []
    for i in range(num_layers_enc):
        b = f"{P}encoder.block.{i}"
        enc_blocks.append({
            "ln1": _t5_rms(sd, f"{b}.layer.0.layer_norm", dtype),
            "attn": _t5_attn(sd, f"{b}.layer.0.SelfAttention", dtype),
            "ln2": _t5_rms(sd, f"{b}.layer.1.layer_norm", dtype),
            "mlp": _t5_mlp(sd, f"{b}.layer.1.DenseReluDense", dtype, gated),
        })
    dec_blocks = []
    for i in range(num_layers_dec):
        b = f"{P}decoder.block.{i}"
        dec_blocks.append({
            "ln1": _t5_rms(sd, f"{b}.layer.0.layer_norm", dtype),
            "attn": _t5_attn(sd, f"{b}.layer.0.SelfAttention", dtype),
            "ln_cross": _t5_rms(sd, f"{b}.layer.1.layer_norm", dtype),
            "cross": _t5_attn(sd, f"{b}.layer.1.EncDecAttention", dtype),
            "ln2": _t5_rms(sd, f"{b}.layer.2.layer_norm", dtype),
            "mlp": _t5_mlp(sd, f"{b}.layer.2.DenseReluDense", dtype, gated),
        })
    out = {
        "shared_emb": jnp.asarray(t2np(sd[f"{P}shared.weight"]), dtype),
        "encoder": {
            "blocks": enc_blocks,
            "ln_final": _t5_rms(sd, f"{P}encoder.final_layer_norm", dtype),
        },
        "decoder": {
            "blocks": dec_blocks,
            "ln_final": _t5_rms(sd, f"{P}decoder.final_layer_norm", dtype),
        },
    }
    lm_head = f"{P}lm_head.weight"
    if lm_head in sd:
        out["lm_head"] = jnp.asarray(t2np(sd[lm_head]).T, dtype)
    else:  # tied embeddings
        out["lm_head"] = None
    return out
