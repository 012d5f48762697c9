"""Qwen3-VL adapter: subclasses the Qwen2.5-VL adapter — same scoring /
trace / generate contract (reference qwen3vl_model.py:278-643 mirrors
qwen2vl) with Qwen3's vision encoding (deepstack, no windowing) swapped in.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..constants import VIDEO_EXTENSIONS
from ..media.images import image_loader
from ..tokenization import SimpleT5Tokenizer, load_hf_tokenizer
from .adapters import _default_dtype, _require_hub
from .qwen2vl_adapter import Qwen2VLAdapter, _bucket, PATCH_BUCKETS
from . import qwen2vl as q2
from . import qwen3vl as q3
from . import decoder as dec


class Qwen3VLAdapter(Qwen2VLAdapter):
    supports_trace = True

    def load_model(self):
        spec = q3.QWEN3_VL_MODELS[self.model_name]
        self.config = self.kwargs.get("config") or q3.resolve_config(self.model_name)
        self.fps_default = spec.get("fps", 8.0)
        # qwen3.5: the chat template closes an empty thinking block when
        # enable_thinking=False (reference qwen3vl_model.py:242) — the
        # assistant turn starts after "<think>\n\n</think>\n\n"
        self._assistant_suffix = ("<think>\n\n</think>\n\n"
                                  if spec.get("enable_thinking") is False
                                  else "")
        dtype = self.kwargs.get("dtype") or _default_dtype()
        cfg = self.config

        params = self.kwargs.get("params")
        if params is None:
            ckpt = self.kwargs.get("checkpoint")
            if ckpt and spec["hf"] is not None:
                params = self._load_from_hf(ckpt, cfg, dtype)
            elif self.kwargs.get("init") == "random" or spec["hf"] is None:
                params = q3.init_qwen3vl(
                    jax.random.PRNGKey(self.kwargs.get("seed", 0)), cfg, dtype)
            else:
                params = self._load_from_hf(spec["hf"], cfg, dtype)
            cfg = self.config  # _load_from_hf may adopt checkpoint dims
        self.params = params

        tok = self.kwargs.get("tokenizer")
        if isinstance(tok, str):  # local tokenizer dir (cold path)
            tok = load_hf_tokenizer(tok)
        if tok is None and spec["hf"] is not None:
            try:
                tok = load_hf_tokenizer(spec["hf"])
            except Exception:
                import warnings

                warnings.warn(f"tokenizer {spec['hf']} unavailable (offline?); "
                              "using SimpleT5Tokenizer placeholder")
        if tok is None:
            tok = SimpleT5Tokenizer(cfg.text.vocab_size)
        self.tokenizer = tok
        self.eos_token_id = getattr(tok, "eos_token_id", None)

        self._vision_jit = jax.jit(
            lambda p, patches, pos_hw, pe_idx, pe_w, pe_perm, seg, grid_t:
            q3.vision_tower(p["vision"], cfg.vision, patches, pos_hw, pe_idx,
                            pe_w, pe_perm, seg, grid_t=grid_t),
            static_argnames=("grid_t",))
        self._score_jit = jax.jit(
            lambda p, *a, temperature: q3.splice_and_score(
                p, cfg, *a, temperature=temperature),
            static_argnames=("temperature",))
        self._tf_dists_jit = jax.jit(
            lambda p, *a, temperature: q3.splice_and_answer_dists(
                p, cfg, *a, temperature=temperature),
            static_argnames=("temperature",))
        self._logits_jit = jax.jit(
            lambda p, embeds, pos, mask: dec.forward(
                p["decoder"], cfg.text, embeds, pos, mask)[0])
        self._prefill_jit = jax.jit(
            lambda p, embeds, pos, mask, cache, deepstack=None: dec.forward(
                p["decoder"], cfg.text, embeds, pos, mask,
                cache=cache, cache_pos=0, deepstack=deepstack))
        self._step_jit = jax.jit(
            lambda p, emb1, pos1, mask, cache, cpos: dec.forward(
                p["decoder"], cfg.text, emb1, pos1, mask,
                cache=cache, cache_pos=cpos))

    def _load_from_hf(self, repo, cfg, dtype):
        try:
            _require_hub(repo)
            import torch
            from transformers import Qwen3VLForConditionalGeneration
            hf = Qwen3VLForConditionalGeneration.from_pretrained(
                repo, cache_dir=self.cache_dir, torch_dtype=torch.float32)
            if self.model_name.startswith("qwen3.5"):
                # The registry dims for qwen3.5 are PROVISIONAL (no public
                # HF config at the reference checkout, models/qwen3vl.py
                # registry comment). The checkpoint's own config.json is
                # ground truth — ADOPT its dims over the registry values
                # (VERDICT r4 item 8; the reference gets this for free via
                # from_pretrained, qwen3vl_model.py:119-146) so the convert
                # below never shape-errors on a registry guess.
                import dataclasses
                import warnings

                tc = hf.config.text_config
                got = {"d_model": tc.hidden_size,
                       "layers": tc.num_hidden_layers,
                       "heads": tc.num_attention_heads,
                       "kv_heads": tc.num_key_value_heads,
                       "d_ff": tc.intermediate_size,
                       "vocab_size": tc.vocab_size,
                       "head_dim": getattr(
                           tc, "head_dim",
                           tc.hidden_size // tc.num_attention_heads),
                       "rope_theta": getattr(tc, "rope_theta",
                                             cfg.text.rope_theta)}
                diff = {k: (getattr(cfg.text, k), v) for k, v in got.items()
                        if getattr(cfg.text, k) != v}
                if diff:
                    warnings.warn(
                        f"{self.model_name}: adopted checkpoint dims over "
                        f"the provisional registry values: "
                        + ", ".join(f"text.{k} {o} -> {n}"
                                    for k, (o, n) in sorted(diff.items())))
                    cfg = dataclasses.replace(
                        cfg, text=dataclasses.replace(
                            cfg.text, **{k: v for k, (_, v) in diff.items()}))
                    self.config = cfg
            return q3.convert_qwen3vl(hf.state_dict(), cfg, dtype)
        except Exception as e:
            raise RuntimeError(
                f"cannot load {repo}: {e}. Pass init='random' in offline "
                "environments.") from e

    def _build_ids(self, question, n_vis, is_video):
        ids = super()._build_ids(question, n_vis, is_video)
        if self._assistant_suffix:
            ids = ids + self._encode_text(self._assistant_suffix)
        return ids

    def _image_patches(self, img):
        cfg2 = q2.QwenVisionConfig(
            patch_size=self.config.vision.patch_size,
            temporal_patch_size=self.config.vision.temporal_patch_size,
            merge_size=self.config.vision.merge_size)
        return q2.image_to_patches(img, cfg2)

    def _encode_visual(self, path, fps=None):
        cfg = self.config
        fps = fps if fps is not None else self.fps_default
        is_video = isinstance(path, str) and path.lower().endswith(VIDEO_EXTENSIONS)
        if is_video:
            frames, spg_t = self._load_video_frames(path, fps)
            cfg2 = q2.QwenVisionConfig(patch_size=cfg.vision.patch_size,
                                       temporal_patch_size=cfg.vision.temporal_patch_size,
                                       merge_size=cfg.vision.merge_size)
            patches, grid = q2.frames_to_patches(frames, cfg2)
        else:
            patches, grid = self._image_patches(image_loader(path))
            spg_t = 1.0
        pos_hw = q3.vision_geometry(grid, cfg.vision)
        pe_idx, pe_w, pe_perm = q3.pos_embed_interp(grid, cfg.vision)
        s = patches.shape[0]
        sb = _bucket(s, PATCH_BUCKETS)
        pad = sb - s
        if pad:
            patches = np.concatenate(
                [patches, np.zeros((pad, patches.shape[1]), np.float32)])
            pos_hw = np.concatenate([pos_hw, np.zeros((pad, 2), np.int32)])
        seg = np.concatenate([np.zeros(s, np.int32), np.full(pad, -1, np.int32)])
        feats, ds = self._vision_jit(self.params, jnp.asarray(patches),
                                     jnp.asarray(pos_hw), jnp.asarray(pe_idx),
                                     jnp.asarray(pe_w), jnp.asarray(pe_perm),
                                     jnp.asarray(seg), grid_t=int(grid[0]))
        mu = cfg.vision.merge_unit
        n = s // mu
        # stash deepstack levels with the main feats: (1 + n_ds, T, D)
        stacked = jnp.concatenate([feats[None, :n]]
                                  + [d[None, :n] for d in ds], axis=0)
        return stacked, grid, is_video, spg_t

    def _prepare_pairs(self, visuals, questions, fps=None):
        """Level-aware variant of the parent: feats rows are
        (1+n_ds, T, D) stacks."""
        from .qwen2vl_adapter import SEQ_BUCKETS

        cfg = self.config
        uniq, inv = [], []
        seen = {}
        for v in visuals:
            key = v if isinstance(v, (str, bytes)) else id(v)
            if key not in seen:
                seen[key] = len(uniq)
                uniq.append(v)
            inv.append(seen[key])
        encoded = [self._encode_visual(v, fps) for v in uniq]

        p = len(visuals)
        ids_list, grids, spgs, vids = [], [], [], []
        for j in range(p):
            stacked, grid, is_video, spg = encoded[inv[j]]
            mu = cfg.vision.merge_unit
            n_vis = int(np.prod(grid)) // mu
            ids_list.append(self._build_ids(questions[j], n_vis, is_video))
            grids.append(grid)
            spgs.append(spg)
            vids.append(is_video)

        s = _bucket(max(len(x) + 8 for x in ids_list), SEQ_BUCKETS)
        levels = encoded[0][0].shape[0]
        t_max = max(e[0].shape[1] for e in encoded)
        d = encoded[0][0].shape[2]
        ids = np.zeros((p, s), np.int64)
        vis_mask = np.zeros((p, s), bool)
        vis_slot = np.zeros((p, s), np.int64)
        attn = np.zeros((p, s), bool)
        pos = np.zeros((3, p, s), np.int64)
        feats_arr = np.zeros((p, levels, max(t_max, 1), d), np.float32)
        prompt_lens = []
        for j, toks in enumerate(ids_list):
            n = len(toks)
            arr = np.asarray(toks)
            ids[j, :n] = arr
            attn[j, :n] = True
            vm = np.isin(arr, [cfg.image_token_id, cfg.video_token_id])
            vis_mask[j, :n] = vm
            vis_slot[j, :n][vm] = np.arange(vm.sum())
            pos[:, j, :n] = q2.build_rope_index(
                arr, [grids[j]], cfg,
                second_per_grid_ts=[spgs[j]] if vids[j] else None)
            f = np.asarray(encoded[inv[j]][0], np.float32)
            feats_arr[j, :, : f.shape[1]] = f
            prompt_lens.append(n)
        return (ids, feats_arr, vis_mask, vis_slot, pos, attn), prompt_lens

    def forward(self, images, texts, **kw) -> np.ndarray:
        dev, n = self.forward_device(images, texts, **kw)
        return np.asarray(dev, np.float32)[:n]

    def forward_device(self, images, texts, fps=None,
                       question_template: str = 'Does this figure show "{}"? Please answer Yes or No.',
                       answer_template: str = "Yes", max_new_tokens: int = 1,
                       temperature: float = 1.0, debug: bool = False, **kw):
        # Same batched flow as Qwen2.5-VL, but feats carry deepstack levels:
        # feats_arr rows are (1+n_ds, T, D); split before scoring.
        assert len(images) == len(texts)
        questions = [question_template.format(t) for t in texts]
        answers = [answer_template.format(t) for t in texts]
        arrays, prompt_lens = self._prepare_pairs(images, questions, fps)
        ids, feats, vis_mask, vis_slot, pos, attn = arrays
        # feats: (P, 1+n_ds, T, D) -> main (P,T,D) + deepstack (n_ds,P,T,D)
        main = feats[:, 0]
        deepstack = np.moveaxis(feats[:, 1:], 1, 0)

        ans_tok = [self._encode_text(a) for a in answers]
        a_max = max(len(a) for a in ans_tok)
        p = len(images)
        s = ids.shape[1]
        full_ids = ids.copy()
        ans_ids = np.zeros((p, a_max), np.int64)
        ans_pos = np.zeros((p, a_max), np.int64)
        ans_mask = np.zeros((p, a_max), np.float32)
        for j, (a, n) in enumerate(zip(ans_tok, prompt_lens)):
            full_ids[j, n:n + len(a)] = a
            attn[j, n:n + len(a)] = True
            ans_ids[j, : len(a)] = a
            ans_pos[j, : len(a)] = n - 1 + np.arange(len(a))
            ans_mask[j, : len(a)] = 1.0
            last = pos[:, j, n - 1].max()
            for i in range(len(a)):
                pos[:, j, n + i] = last + 1 + i

        logp = self._score_jit(
            self.params, jnp.asarray(full_ids), jnp.asarray(main),
            jnp.asarray(deepstack), jnp.asarray(vis_mask),
            jnp.asarray(vis_slot), jnp.asarray(pos), jnp.asarray(attn),
            jnp.asarray(ans_ids), jnp.asarray(ans_pos), jnp.asarray(ans_mask),
            temperature=float(temperature))
        return jnp.exp(logp.astype(jnp.float32)), len(images)

    def _split_feats_batched(self, feats):
        # (P, 1+n_ds, T, D) -> main (P, T, D) + deepstack (n_ds, P, T, D)
        return feats[:, 0], np.moveaxis(feats[:, 1:], 1, 0)

    def _greedy_steps(self, ids_row, feats, vis_mask, vis_slot, pos_row,
                      n_prompt, max_new_tokens, temperature=1.0,
                      deepstack=None, **kw):
        """Greedy steps with the deepstack residuals applied at prefill.

        feats here is the stacked (1+n_ds, T, D) array per sequence; the
        main level drives the splice; deepstack levels are scattered to
        the visual positions (zero elsewhere) and added after early
        decoder layers, exactly as in the scoring path."""
        main = feats[0]
        vm = jnp.asarray(vis_mask[None])[..., None]
        slot = jnp.asarray(vis_slot[None])[..., None]
        ds_list = []
        for lvl in range(1, feats.shape[0]):
            d = jnp.take_along_axis(jnp.asarray(feats[lvl][None]), slot,
                                    axis=1)
            ds_list.append(jnp.where(vm, d, 0.0))
        return super()._greedy_steps(ids_row, main, vis_mask, vis_slot,
                                     pos_row, n_prompt, max_new_tokens,
                                     temperature,
                                     deepstack=ds_list or None, **kw)
