"""Parity at REAL model dimensions (VERDICT r4 item 3, slow tier).

Every other golden-parity suite builds tiny HF models (hidden_size 32-48,
tiny bucket counts). A real-config quirk — relative-attention bucket
counts at (32, 128), head_dim=128 code paths, layer-norm behavior at
d_model=2048, the 336px/14px ViT geometry with 577 tokens — would be
invisible there. These tests build the TRUE configs with random torch
weights (layer counts reduced to 2+2: parity bugs are per-layer, not
per-depth; CPU time bounds the rest) and assert the BASELINE <=1e-3 score
parity.

True dims covered:
  * clip-flant5-xl: d_model=2048, d_kv=64, d_ff=5120, heads=32,
    rel-attn buckets 32 / max_distance 128, vocab 32128, gated-gelu,
    untied head (google/flan-t5-xl config.json), ViT-L/14-336
    (width 1024, 16 heads, mlp 4096, 577 tokens, penultimate layer
    features) + 2-layer 1024->2048 projector.
  * qwen2.5-vl-3b: head_dim=128 (the kernel-relevant size), d_model=2048,
    16 q heads / 2 kv heads, d_ff=11008, M-RoPE sections (16,24,24),
    true ViT geometry (hidden 1280, 16 heads, d_ff 3420, patch 14,
    window 112, merge 2, out 2048) (Qwen/Qwen2.5-VL-3B-Instruct
    config.json).
"""

import numpy as np
import pytest
import torch
import jax.numpy as jnp

pytestmark = pytest.mark.slow

from t2v_metrics_tpu.models import clip_flant5 as cft5
from t2v_metrics_tpu.models import clip as jclip
from t2v_metrics_tpu.models import t5 as jt5
from t2v_metrics_tpu.models import qwen2vl as q
from t2v_metrics_tpu.models import decoder as dec
from t2v_metrics_tpu.models.convert import convert_clip_vision, convert_t5
from t2v_metrics_tpu.engine.scoring import CLIPT5Engine
from t2v_metrics_tpu.tokenization import SimpleT5Tokenizer, splice_image_tokens_t5
from t2v_metrics_tpu.constants import IMAGE_TOKEN_INDEX


def test_clip_flant5_xl_true_dims():
    from transformers import CLIPVisionConfig as HFVC, CLIPVisionModel
    from transformers import T5Config as HFT5C, T5ForConditionalGeneration

    torch.manual_seed(0)
    IMG, PATCH, WIDTH = 336, 14, 1024
    n_tok = (IMG // PATCH) ** 2  # 576 (post-CLS)
    hf_vis = CLIPVisionModel(HFVC(
        hidden_size=WIDTH, intermediate_size=4096, num_hidden_layers=2,
        num_attention_heads=16, image_size=IMG, patch_size=PATCH,
        hidden_act="quick_gelu")).eval()
    D = 2048
    proj = torch.nn.Sequential(
        torch.nn.Linear(WIDTH, D), torch.nn.GELU(),
        torch.nn.Linear(D, D)).eval()
    hf_t5 = T5ForConditionalGeneration(HFT5C(
        vocab_size=32128, d_model=D, d_kv=64, d_ff=5120, num_layers=2,
        num_decoder_layers=2, num_heads=32,
        relative_attention_num_buckets=32,
        relative_attention_max_distance=128, dropout_rate=0.0,
        feed_forward_proj="gated-gelu", tie_word_embeddings=False,
        decoder_start_token_id=0, pad_token_id=0, eos_token_id=1)).eval()

    cfg = cft5.CLIPT5Config(
        t5=jt5.T5Config(vocab_size=32128, d_model=D, d_kv=64, d_ff=5120,
                        num_heads=32, enc_layers=2, dec_layers=2,
                        num_buckets=32, max_distance=128),
        vision=jclip.CLIPVisionConfig(image_size=IMG, patch_size=PATCH,
                                      width=WIDTH, layers=2, heads=16,
                                      mlp_dim=4096, proj_dim=WIDTH),
        num_image_tokens=n_tok)

    vis_sd = {f"vision_model.{k}" if not k.startswith("vision_model") else k: v
              for k, v in hf_vis.state_dict().items()}
    params = {
        "vision": convert_clip_vision(vis_sd, 2),
        "projector": {
            "fc1": {"w": jnp.asarray(proj[0].weight.detach().numpy().T),
                    "b": jnp.asarray(proj[0].bias.detach().numpy())},
            "fc2": {"w": jnp.asarray(proj[2].weight.detach().numpy().T),
                    "b": jnp.asarray(proj[2].bias.detach().numpy())},
        },
        "t5": convert_t5(hf_t5.state_dict(), 2, 2),
    }
    tok = SimpleT5Tokenizer(32128)
    for w in ("Does this figure show a photo of cat ? Please answer yes "
              "no . Yes").split():
        tok._id(w)
    engine = CLIPT5Engine(params, cfg, tok)

    rng = np.random.default_rng(1)
    px = rng.standard_normal((IMG, IMG, 3)).astype(np.float32)
    qtext = cft5.format_question(
        'Does this figure show "a photo of cat"? Please answer yes or no.',
        cfg.conversation)
    ans = cft5.format_answer("Yes", cfg.conversation)

    # torch oracle (reference per-pair semantics, mm_utils.py:142-241)
    pt = torch.from_numpy(px.transpose(2, 0, 1)[None])
    with torch.no_grad():
        hs = hf_vis(pixel_values=pt, output_hidden_states=True).hidden_states
        feats = proj(hs[-2][:, 1:])
        spliced = splice_image_tokens_t5(qtext, tok)
        emb = hf_t5.get_input_embeddings()
        at = spliced.index(IMAGE_TOKEN_INDEX)
        embeds = torch.cat([emb(torch.tensor(spliced[:at])[None]), feats,
                            emb(torch.tensor(spliced[at + 1:])[None])], dim=1)
        ans_ids = torch.tensor(tok(ans).input_ids)[None]
        out = hf_t5(inputs_embeds=embeds, labels=ans_ids)
    ref = float(np.exp(-out.loss.item()))

    feats_j = engine._encode(engine.params, jnp.asarray(px[None]))
    arrays = engine._build_text_arrays([qtext], [ans])
    dev = tuple(jnp.asarray(a) for a in arrays)
    logp = engine._score(engine.params, feats_j, *dev,
                         pair_image=jnp.asarray([0], jnp.int32),
                         pair_text=jnp.asarray([0], jnp.int32))
    ours = float(np.exp(np.asarray(logp)[0]))
    assert abs(ours - ref) <= 1e-3, (ours, ref)   # BASELINE gate
    assert abs(ours - ref) <= 1e-4, (ours, ref)   # fp32 reality


def test_qwen25vl_3b_true_dims():
    from transformers import Qwen2_5_VLForConditionalGeneration
    from transformers.models.qwen2_5_vl.configuration_qwen2_5_vl import (
        Qwen2_5_VLConfig)

    torch.manual_seed(0)
    # true 3B dims, 2 decoder layers, 4 ViT layers (1 full-attn index)
    hf_cfg = Qwen2_5_VLConfig(
        text_config=dict(
            vocab_size=2000, hidden_size=2048, intermediate_size=11008,
            num_hidden_layers=2, num_attention_heads=16,
            num_key_value_heads=2, head_dim=128, hidden_act="silu",
            max_position_embeddings=128000, rms_norm_eps=1e-6,
            rope_theta=1000000.0,
            rope_scaling={"type": "mrope", "mrope_section": [16, 24, 24]},
            tie_word_embeddings=False,
        ),
        vision_config=dict(
            depth=4, hidden_size=1280, intermediate_size=3420, num_heads=16,
            patch_size=14, temporal_patch_size=2, spatial_merge_size=2,
            window_size=112, fullatt_block_indexes=[3],
            out_hidden_size=2048, hidden_act="silu", tokens_per_second=2,
        ),
        image_token_id=1591, video_token_id=1592,
        vision_start_token_id=1593, vision_end_token_id=1594,
    )
    hf = Qwen2_5_VLForConditionalGeneration(hf_cfg).eval()

    cfg = q.Qwen2VLConfig(
        vision=q.QwenVisionConfig(hidden=1280, depth=4, heads=16,
                                  patch_size=14, window_size=112,
                                  fullatt_block_indexes=(3,), d_ff=3420,
                                  out_hidden=2048),
        text=dec.DecoderConfig(vocab_size=2000, d_model=2048, layers=2,
                               heads=16, kv_heads=2, head_dim=128,
                               d_ff=11008, mrope_section=(16, 24, 24)),
        image_token_id=1591, video_token_id=1592,
        vision_start_token_id=1593)
    params = q.convert_qwen2vl(hf.state_dict(), cfg, dtype=jnp.float32)

    # one 112x140 image -> grid (1, 8, 10), 20 merged visual tokens
    rng = np.random.default_rng(2)
    frames = rng.standard_normal((1, 3, 112, 140)).astype(np.float32)
    patches, grid = q.frames_to_patches(frames, cfg.vision)

    with torch.no_grad():
        ref_vis = hf.model.visual(torch.from_numpy(patches),
                                  torch.tensor([list(grid)])).numpy()
    geom = q.vision_geometry(grid, cfg.vision)
    full_seg = np.zeros((patches.shape[0],), np.int32)
    ours_vis = np.asarray(q.vision_tower(
        params["vision"], cfg.vision,
        jnp.asarray(patches[geom["perm"]]),
        jnp.asarray(geom["pos_hw"]),
        jnp.asarray(geom["win_seg"]),
        jnp.asarray(full_seg),
        jnp.asarray(geom["reverse"])))
    np.testing.assert_allclose(ours_vis, ref_vis, atol=2e-4)

    # full logits parity through splice + M-RoPE decoder at head_dim 128
    n_vis = grid[0] * (grid[1] // 2) * (grid[2] // 2)
    ids = np.array([[5, 6, 1593, *([1591] * n_vis), 1594, 7, 8, 9, 10]])
    with torch.no_grad():
        ref = hf(input_ids=torch.from_numpy(ids),
                 pixel_values=torch.from_numpy(patches),
                 image_grid_thw=torch.tensor([list(grid)])).logits.numpy()

    pos = q.build_rope_index(ids[0], [grid], cfg)[:, None, :]  # (3,1,S)
    tok = params["decoder"]["embed"][jnp.asarray(ids)]
    vis_mask = (ids == 1591)
    embeds = np.array(tok)
    embeds[0, vis_mask[0]] = ours_vis
    import jax as _jax
    logits, _ = dec.forward(params["decoder"], cfg.text,
                            jnp.asarray(embeds), jnp.asarray(pos),
                            jnp.ones(ids.shape, bool))
    np.testing.assert_allclose(np.asarray(logits), ref, atol=2e-3,
                               rtol=2e-3)