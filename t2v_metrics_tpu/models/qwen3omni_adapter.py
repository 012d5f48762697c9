"""Qwen3-Omni adapter: audio(+vision) VQAScore scoring.

Reference contract (qwen3omni_model.py): ``allows_audio=True``;
``audio_paths`` (list per sample) adds audio content blocks (:85-118);
videos may carry their own audio track (``use_audio_in_video``, :150-181 —
here gated on the native/libav side and disabled when no demuxer is
available). The talker (speech output) is not built.

Scoring: teacher-forced P(answer) with audio features spliced at
``<|audio|>`` positions (sequential rope positions, HF get_rope_index
:335-345) and Qwen3-VL-style vision splicing for images/videos.
"""

from __future__ import annotations

import warnings

import numpy as np
import jax
import jax.numpy as jnp

from ..constants import VIDEO_EXTENSIONS
from ..tokenization import SimpleT5Tokenizer, load_hf_tokenizer
from .adapters import _default_dtype, _require_hub
from .qwen2vl_adapter import Qwen2VLAdapter, _bucket, SEQ_BUCKETS
from . import qwen2vl as q2
from . import qwen3omni as qo
from . import qwen3omni_audio as qa
from . import qwen3vl as q3
from . import decoder as dec


def load_audio_mel(path, cfg: qa.AudioEncoderConfig) -> np.ndarray:
    """Audio source -> (mel_bins, T) Whisper-style log-mel features.

    The native libav decoder handles ANY container — audio files and the
    audio tracks of videos (use_audio_in_video) — resampled to mono 16 kHz
    (reference uses librosa/process_mm_info at 16 kHz). Falls back to the
    stdlib wave module for .wav when the native library is unavailable.
    """
    from ..media import native_loader

    audio = native_loader.decode_audio(path, 16000)
    if audio is None:
        import wave

        with wave.open(str(path), "rb") as w:
            sr = w.getframerate()
            n = w.getnframes()
            raw = np.frombuffer(w.readframes(n), dtype=np.int16)
            if w.getnchannels() > 1:
                raw = raw.reshape(-1, w.getnchannels()).mean(axis=1)
            audio = raw.astype(np.float32) / 32768.0
        if sr != 16000:  # naive resample (linear) — parity path uses 16k
            idx = np.linspace(0, len(audio) - 1, int(len(audio) * 16000 / sr))
            audio = np.interp(idx, np.arange(len(audio)),
                              audio).astype(np.float32)

    import os

    if os.environ.get("T2V_DEVICE_MEL", "1") == "1" and len(audio) >= 400:
        try:  # DFT-as-matmul log-mel on the TPU (qwen3omni_audio.py)
            return qa.log_mel_device(np.asarray(audio, np.float32),
                                     n_mels=cfg.num_mel_bins)
        except Exception:  # pragma: no cover — host fallback below
            pass

    from transformers import WhisperFeatureExtractor

    fe = WhisperFeatureExtractor(feature_size=cfg.num_mel_bins,
                                 sampling_rate=16000, hop_length=160,
                                 n_fft=400, chunk_length=30)
    out = fe(audio, sampling_rate=16000, padding="do_not_pad",
             return_tensors="np", do_normalize=False)
    return out["input_features"][0]


class Qwen3OmniAdapter(Qwen2VLAdapter):
    video_mode = "direct"
    allows_image = True
    allows_video = True
    allows_audio = True
    supports_trace = True

    def load_model(self):
        spec = qo.QWEN3_OMNI_MODELS[self.model_name]
        self.config = self.kwargs.get("config") or qo.resolve_config(self.model_name)
        self.fps_default = 8.0
        # reference qwen3omni_model.py:57/:65 — ctor default True; videos
        # with an audio track get their audio demuxed and scored too
        self.use_audio_in_video = self.kwargs.get("use_audio_in_video", True)
        dtype = self.kwargs.get("dtype") or _default_dtype()
        cfg = self.config

        params = self.kwargs.get("params")
        if params is None:
            if self.kwargs.get("init") == "random" or spec["hf"] is None:
                params = qo.init_qwen3omni(
                    jax.random.PRNGKey(self.kwargs.get("seed", 0)), cfg, dtype)
            else:
                params = self._load_from_hf(spec["hf"], cfg, dtype)
        self.params = params

        tok = self.kwargs.get("tokenizer")
        if isinstance(tok, str):  # local tokenizer dir (cold path)
            tok = load_hf_tokenizer(tok)
        if tok is None and spec["hf"] is not None:
            try:
                tok = load_hf_tokenizer(spec["hf"])
            except Exception:
                warnings.warn(f"tokenizer {spec['hf']} unavailable (offline?)")
        if tok is None:
            tok = SimpleT5Tokenizer(cfg.text.vocab_size)
        self.tokenizer = tok
        self.eos_token_id = getattr(tok, "eos_token_id", None)

        self._audio_jit = jax.jit(
            lambda p, chunks, valid, seg: qa.audio_encoder(
                p["audio"], cfg.audio, chunks, valid, seg))
        cfg_v = cfg.vision
        self._vision_jit = jax.jit(
            lambda p, patches, pos_hw, pe_idx, pe_w, pe_perm, seg, grid_t:
            q3.vision_tower(p["vision"], cfg_v, patches, pos_hw, pe_idx,
                            pe_w, pe_perm, seg, grid_t=grid_t),
            static_argnames=("grid_t",))
        self._score_jit = jax.jit(
            lambda p, *a, deepstack_feats, vis_mask, temperature:
            qo.splice_and_score(p, cfg, *a, deepstack_feats=deepstack_feats,
                                vis_mask=vis_mask, temperature=temperature),
            static_argnames=("temperature",))

    def _load_from_hf(self, repo, cfg, dtype):
        try:
            _require_hub(repo)
            import torch
            from transformers import Qwen3OmniMoeForConditionalGeneration
            hf = Qwen3OmniMoeForConditionalGeneration.from_pretrained(
                repo, cache_dir=self.cache_dir, torch_dtype=torch.float32)
            sd = hf.state_dict()
            if any(k.startswith("talker.") for k in sd) \
                    and "talker_params" not in self.kwargs:
                # speech output available: convert the talker + vocoder too
                from . import qwen3omni_talker as tk

                tcfg = qo.resolve_talker_config()
                self.kwargs["talker_config"] = tcfg
                self.kwargs["talker_params"] = tk.convert_talker(sd, tcfg,
                                                                 dtype)
                self.kwargs["code2wav_params"] = tk.convert_code2wav(
                    sd, tcfg.code2wav, dtype)
            return qo.convert_qwen3omni(sd, cfg, dtype)
        except Exception as e:
            raise RuntimeError(
                f"cannot load {repo}: {e}. Pass init='random' in offline "
                "environments.") from e

    def _encode_audio(self, path):
        cfg = self.config
        mel = load_audio_mel(path, cfg.audio)
        chunk_lens, valid, seg, total = qa.audio_geometry(mel.shape[1], cfg.audio)
        cf = cfg.audio.chunk_frames
        chunks = np.zeros((len(chunk_lens), cfg.audio.num_mel_bins, cf),
                          np.float32)
        off = 0
        for i, l in enumerate(chunk_lens):
            chunks[i, :, :l] = mel[:, off:off + l]
            off += l
        out = self._audio_jit(self.params, jnp.asarray(chunks),
                              jnp.asarray(valid), jnp.asarray(seg))
        return np.asarray(out, np.float32)[np.flatnonzero(valid.reshape(-1))]

    def _encode_image_feats(self, path):
        """image/video path -> (main feats (T, D), n_vis, is_video)."""
        cfg = self.config
        is_video = isinstance(path, str) and path.lower().endswith(VIDEO_EXTENSIONS)
        cfg2 = q2.QwenVisionConfig(patch_size=cfg.vision.patch_size,
                                   temporal_patch_size=cfg.vision.temporal_patch_size,
                                   merge_size=cfg.vision.merge_size)
        if is_video:
            frames, _ = self._load_video_frames(path, self.fps_default)
            patches, grid = q2.frames_to_patches(frames, cfg2)
        else:
            from ..media.images import image_loader

            patches, grid = q2.image_to_patches(image_loader(path), cfg2)
        pos_hw = q3.vision_geometry(grid, cfg.vision)
        pe_idx, pe_w, pe_perm = q3.pos_embed_interp(grid, cfg.vision)
        seg = np.zeros(patches.shape[0], np.int32)
        feats, ds = self._vision_jit(
            self.params, jnp.asarray(patches), jnp.asarray(pos_hw),
            jnp.asarray(pe_idx), jnp.asarray(pe_w), jnp.asarray(pe_perm),
            jnp.asarray(seg), grid_t=int(grid[0]))
        return (np.asarray(feats, np.float32),
                [np.asarray(d, np.float32) for d in ds], grid, is_video)

    def _assemble_content(self, path, audio, question):
        """Chat-template ids + (token, feats, deepstack, grid, is_video)
        content blocks for one sample (reference qwen3omni_model.py:85-118
        content dicts + :150-181 input prep).

        use_audio_in_video: when the visual is a video carrying an audio
        track (native libav probe — reference :140-148 uses PyAV), the
        track is demuxed and an audio block follows the vision block (the
        reference's processor interleaves by timestamp; block-level
        placement is the documented simplification)."""
        cfg = self.config
        feats_list, ids = [], []
        ids += self._encode_text("<|im_start|>system\nYou are a helpful "
                                 "assistant.<|im_end|>\n<|im_start|>user\n")
        if path is not None:
            vfeats, vds, grid, is_video = self._encode_image_feats(path)
            n_vis = vfeats.shape[0]
            tok = cfg.video_token_id if is_video else cfg.image_token_id
            ids += [cfg.vision_start_token_id] + [tok] * n_vis \
                + [cfg.vision_end_token_id]
            feats_list.append((tok, vfeats, vds, grid, is_video))
            if is_video and audio is None and self.use_audio_in_video:
                from ..media import native_loader

                if native_loader.has_audio(path):
                    audio = path  # demux the video's own track below
        if audio is not None:
            afeats = self._encode_audio(audio)
            ids += [cfg.audio_start_token_id] \
                + [cfg.audio_token_id] * afeats.shape[0] \
                + [cfg.audio_end_token_id]
            feats_list.append((cfg.audio_token_id, afeats, None, None, False))
        ids += self._encode_text(f"{question}<|im_end|>\n"
                                 "<|im_start|>assistant\n")
        return ids, feats_list

    def forward(self, images, texts, audio_paths=None, fps=None,
                question_template: str = 'Does this figure show "{}"? Please answer Yes or No.',
                answer_template: str = "Yes", temperature: float = 1.0,
                **kw) -> np.ndarray:
        assert len(images) == len(texts)
        cfg = self.config
        questions = [question_template.format(t) for t in texts]
        answers = [answer_template.format(t) for t in texts]
        audio_paths = audio_paths or [None] * len(texts)

        per_pair = []
        for path, audio, question, answer in zip(images, audio_paths,
                                                 questions, answers):
            ids, feats_list = self._assemble_content(path, audio, question)
            ans = self._encode_text(answer)
            per_pair.append((ids, ans, feats_list))

        p = len(per_pair)
        s = _bucket(max(len(i) + len(a) for i, a, _ in per_pair), SEQ_BUCKETS)
        d = cfg.text.d_model
        n_ds = len(cfg.vision.deepstack_indexes)
        t_max = max(sum(f.shape[0] for _, f, _, _, _ in fl) or 1
                    for _, _, fl in per_pair)
        ids_arr = np.zeros((p, s), np.int64)
        splice_mask = np.zeros((p, s), bool)
        vis_mask = np.zeros((p, s), bool)
        splice_slot = np.zeros((p, s), np.int64)
        attn = np.zeros((p, s), bool)
        pos = np.zeros((3, p, s), np.int64)
        a_max = max(len(a) for _, a, _ in per_pair)
        ans_ids = np.zeros((p, a_max), np.int64)
        ans_pos = np.zeros((p, a_max), np.int64)
        ans_mask = np.zeros((p, a_max), np.float32)
        feats = np.zeros((p, t_max, d), np.float32)
        deepstack = np.zeros((n_ds, p, t_max, d), np.float32)

        for j, (ids, ans, feats_list) in enumerate(per_pair):
            n = len(ids)
            arr = np.asarray(ids)
            ids_arr[j, :n] = arr
            ids_arr[j, n:n + len(ans)] = ans
            attn[j, :n + len(ans)] = True
            row = 0
            grids = [g for _, _, _, g, _ in feats_list if g is not None]
            spgs = [1.0] * len(grids)
            for tok, f, ds, _, _ in feats_list:
                mask = ids_arr[j] == tok
                mask[n:] = False
                splice_mask[j] |= mask
                if ds is not None:  # vision rows carry deepstack levels
                    vis_mask[j] |= mask
                    for lvl, dsf in enumerate(ds):
                        deepstack[lvl, j, row:row + f.shape[0]] = dsf
                splice_slot[j][mask] = row + np.arange(mask.sum())
                feats[j, row:row + f.shape[0]] = f
                row += f.shape[0]
            rope_cfg = q2.Qwen2VLConfig(
                vision=q2.QwenVisionConfig(
                    merge_size=cfg.vision.merge_size, tokens_per_second=1),
                text=cfg.text, image_token_id=cfg.image_token_id,
                video_token_id=cfg.video_token_id,
                vision_start_token_id=cfg.vision_start_token_id)
            pos[:, j, :n] = q2.build_rope_index(arr, grids, rope_cfg,
                                                second_per_grid_ts=spgs)
            last = pos[:, j, n - 1].max()
            for i in range(len(ans)):
                pos[:, j, n + i] = last + 1 + i
            ans_ids[j, : len(ans)] = ans
            ans_pos[j, : len(ans)] = n - 1 + np.arange(len(ans))
            ans_mask[j, : len(ans)] = 1.0

        logp = self._score_jit(
            self.params, jnp.asarray(ids_arr), jnp.asarray(feats),
            jnp.asarray(splice_mask), jnp.asarray(splice_slot),
            jnp.asarray(pos), jnp.asarray(attn), jnp.asarray(ans_ids),
            jnp.asarray(ans_pos), jnp.asarray(ans_mask),
            deepstack_feats=jnp.asarray(deepstack),
            vis_mask=jnp.asarray(vis_mask),
            temperature=float(temperature))
        return np.exp(np.asarray(logp, np.float32))

    def score_matrix(self, images, texts, audio_paths=None, **kw) -> np.ndarray:
        m, n = len(images), len(texts)
        flat_imgs = [im for im in images for _ in range(n)]
        flat_audio = None
        if audio_paths is not None:
            flat_audio = [a for a in audio_paths for _ in range(n)]
        return self.forward(flat_imgs, list(texts) * m,
                            audio_paths=flat_audio, **kw).reshape(m, n)

    # ------------------------------------------------------------------
    # generation (reference qwen3omni_model.py:483-548; text only — the
    # talker/speech stack is not built, return_audio raises)
    # ------------------------------------------------------------------

    def generate(self, images, texts, audio_paths=None, fps=None,
                 max_new_tokens: int = 256, return_audio: bool = False,
                 speaker: str = "Ethan", save_audio_path=None,
                 **kw) -> list[str]:
        assert len(images) == len(texts)
        if return_audio:
            return self._generate_with_audio(
                images, texts, audio_paths, max_new_tokens, speaker,
                save_audio_path, **kw)
        from .generation import CachedLM, decode_text

        cfg = self.config
        if not hasattr(self, "_lm"):
            self._lm = CachedLM(cfg.text)
        eos = {self.eos_token_id} - {None}
        c2i = getattr(self.tokenizer, "convert_tokens_to_ids", None)
        if c2i is not None:
            try:
                i = c2i("<|im_end|>")
                if isinstance(i, int) and i >= 0:
                    eos.add(i)
            except Exception:
                pass
        audio_paths = audio_paths or [None] * len(texts)

        if len(images) > 1:
            return self._generate_batched(images, audio_paths, texts,
                                          max_new_tokens, eos)
        outs = []
        for path, audio, text in zip(images, audio_paths, texts):
            gen, _ = self._rollout_sample(path, audio, text, max_new_tokens,
                                          eos)
            outs.append(decode_text(self.tokenizer, gen, eos))
        return outs

    def _generate_batched(self, images, audio_paths, texts, max_new_tokens,
                          eos) -> list[str]:
        """Device-side batched greedy decode with deepstack prefill and
        M-RoPE step positions (zero per-token host round-trips)."""
        from .generation import CachedLM, decode_text

        cfg = self.config
        if not hasattr(self, "_lm"):
            self._lm = CachedLM(cfg.text)
        n_ds = len(cfg.vision.deepstack_indexes)
        assembled = [self._assemble_content(p_, a_, t_)
                     for p_, a_, t_ in zip(images, audio_paths, texts)]
        bsz = len(assembled)
        s = _bucket(max(len(i) for i, _ in assembled), SEQ_BUCKETS)
        d = cfg.text.d_model
        t_max = max(max(sum(f.shape[0] for _, f, *_ in fl), 1)
                    for _, fl in assembled)
        ids_arr = np.zeros((bsz, s), np.int64)
        splice_mask = np.zeros((bsz, s), bool)
        vis_mask = np.zeros((bsz, s), bool)
        splice_slot = np.zeros((bsz, s), np.int64)
        feats = np.zeros((bsz, t_max, d), np.float32)
        deepstack = np.zeros((n_ds, bsz, t_max, d), np.float32)
        pos = np.zeros((3, bsz, s), np.int64)
        n_prompts = np.zeros((bsz,), np.int32)
        for j, (ids, feats_list) in enumerate(assembled):
            n = len(ids)
            ids_arr[j, :n] = ids
            n_prompts[j] = n
            row = 0
            grids = [g for _, _, _, g, _ in feats_list if g is not None]
            for tok, f, ds, _, _ in feats_list:
                mask = ids_arr[j] == tok
                mask[n:] = False
                splice_mask[j] |= mask
                if ds is not None:
                    vis_mask[j] |= mask
                    for lvl, dsf in enumerate(ds):
                        deepstack[lvl, j, row:row + f.shape[0]] = dsf
                splice_slot[j][mask] = row + np.arange(mask.sum())
                feats[j, row:row + f.shape[0]] = f
                row += f.shape[0]
            rope_cfg = q2.Qwen2VLConfig(
                vision=q2.QwenVisionConfig(
                    merge_size=cfg.vision.merge_size, tokens_per_second=1),
                text=cfg.text, image_token_id=cfg.image_token_id,
                video_token_id=cfg.video_token_id,
                vision_start_token_id=cfg.vision_start_token_id)
            pos[:, j, :n] = q2.build_rope_index(
                np.asarray(ids), grids, rope_cfg,
                second_per_grid_ts=[1.0] * len(grids))
            pos[:, j, n:] = pos[:, j, n - 1].max()

        embed = self.params["decoder"]["embed"]
        tok_emb = embed[jnp.asarray(ids_arr)]
        spl = jnp.take_along_axis(jnp.asarray(feats, embed.dtype),
                                  jnp.asarray(splice_slot)[..., None], axis=1)
        embeds = jnp.where(jnp.asarray(splice_mask)[..., None], spl, tok_emb)
        vm = jnp.asarray(vis_mask)[..., None]
        ds_list = []
        for lvl in range(n_ds):
            dsl = jnp.take_along_axis(jnp.asarray(deepstack[lvl], embed.dtype),
                                      jnp.asarray(splice_slot)[..., None],
                                      axis=1)
            ds_list.append(jnp.where(vm, dsl, 0.0))
        tokens, lengths = self._lm.greedy_batch(
            self.params["decoder"], embeds, pos, n_prompts, max_new_tokens,
            eos_id=min(eos) if eos else None, deepstack=ds_list or None)
        return [decode_text(self.tokenizer,
                            tokens[j, : lengths[j]].tolist(), eos)
                for j in range(bsz)]

    def _rollout_sample(self, path, audio, text, max_new_tokens, eos,
                        temperature: float = 1.0):
        """One sample -> KV-cached greedy rollout (gen ids, step dists):
        content assembly + deepstack prefill + M-RoPE steps."""
        import numpy as np
        import jax.numpy as jnp

        cfg = self.config
        if not hasattr(self, "_lm"):
            from .generation import CachedLM

            self._lm = CachedLM(cfg.text)
        n_ds = len(cfg.vision.deepstack_indexes)
        ids, feats_list = self._assemble_content(path, audio, text)
        n = len(ids)
        s = _bucket(n, SEQ_BUCKETS)
        d = cfg.text.d_model
        t_max = max(sum(f.shape[0] for _, f, _, _, _ in feats_list), 1)

        ids_arr = np.zeros((1, s), np.int64)
        ids_arr[0, :n] = ids
        splice_mask = np.zeros((1, s), bool)
        vis_mask = np.zeros((1, s), bool)
        splice_slot = np.zeros((1, s), np.int64)
        feats = np.zeros((1, t_max, d), np.float32)
        deepstack = np.zeros((n_ds, 1, t_max, d), np.float32)
        row = 0
        grids = [g for _, _, _, g, _ in feats_list if g is not None]
        for tok, f, ds, _, _ in feats_list:
            mask = ids_arr[0] == tok
            mask[n:] = False
            splice_mask[0] |= mask
            if ds is not None:
                vis_mask[0] |= mask
                for lvl, dsf in enumerate(ds):
                    deepstack[lvl, 0, row:row + f.shape[0]] = dsf
            splice_slot[0][mask] = row + np.arange(mask.sum())
            feats[0, row:row + f.shape[0]] = f
            row += f.shape[0]

        rope_cfg = q2.Qwen2VLConfig(
            vision=q2.QwenVisionConfig(
                merge_size=cfg.vision.merge_size, tokens_per_second=1),
            text=cfg.text, image_token_id=cfg.image_token_id,
            video_token_id=cfg.video_token_id,
            vision_start_token_id=cfg.vision_start_token_id)
        pos = np.zeros((3, 1, s), np.int64)
        pos[:, 0, :n] = q2.build_rope_index(
            np.asarray(ids), grids, rope_cfg,
            second_per_grid_ts=[1.0] * len(grids))
        last = pos[:, 0, n - 1].max()
        pos[:, 0, n:] = last  # pads (invalid slots)

        embed = self.params["decoder"]["embed"]
        tok_emb = embed[jnp.asarray(ids_arr)]
        spl = jnp.take_along_axis(jnp.asarray(feats, embed.dtype),
                                  jnp.asarray(splice_slot)[..., None],
                                  axis=1)
        embeds = jnp.where(jnp.asarray(splice_mask)[..., None], spl,
                           tok_emb)
        ds_list = []
        vm = jnp.asarray(vis_mask)[..., None]
        for lvl in range(n_ds):
            dsl = jnp.take_along_axis(
                jnp.asarray(deepstack[lvl], embed.dtype),
                jnp.asarray(splice_slot)[..., None], axis=1)
            ds_list.append(jnp.where(vm, dsl, 0.0))

        return self._lm.greedy(self.params["decoder"], embeds, pos, n,
                               max_new_tokens, eos_ids=eos,
                               temperature=temperature,
                               deepstack=ds_list or None)

    def forward_with_trace(self, images, texts, audio_paths=None, fps=None,
                           question_template: str = 'Does this figure show "{}"? Please answer Yes or No.',
                           answer_template: str = "Yes",
                           max_new_tokens: int = 1, temperature: float = 1.0,
                           score_position: str = "end", debug: bool = False):
        """Reference trace contract for the omni family
        (qwen3omni_model.py supports_trace; schema README.md:335-360)."""
        from .generation import CachedLM, trace_from_rollout

        assert len(images) == len(texts)
        cfg = self.config
        if not hasattr(self, "_lm"):
            self._lm = CachedLM(cfg.text)
        questions = [question_template.format(t) for t in texts]
        answers = [answer_template.format(t) for t in texts]
        audio_paths = audio_paths or [None] * len(texts)
        eos = {self.eos_token_id} - {None}
        decode = getattr(self.tokenizer, "decode", lambda x: str(x))
        lm_probs, traces = [], []
        for path, audio, q_, a_ in zip(images, audio_paths, questions,
                                       answers):
            gen, dists = self._rollout_sample(path, audio, q_,
                                              max_new_tokens, eos,
                                              temperature)
            gm, trace = trace_from_rollout(gen, dists,
                                           self._encode_text(a_), eos,
                                           decode, score_position)
            lm_probs.append(gm)
            traces.append(trace)
        import numpy as np

        return np.asarray(lm_probs, np.float32), traces

    # ------------------------------------------------------------------
    # speech output (talker + code2wav; reference qwen3omni_model.py
    # :483-548 — return_audio/speaker/save_audio_path, 24 kHz wav)
    # ------------------------------------------------------------------

    def _talker_session(self):
        from . import qwen3omni_talker as tk
        from .qwen3omni_talker import TalkerSession

        if getattr(self, "_talker", None) is not None:
            return self._talker
        tcfg = self.kwargs.get("talker_config")
        tparams = self.kwargs.get("talker_params")
        if tcfg is None or tparams is None:
            raise RuntimeError(
                "talker weights not loaded: pass talker_config= and "
                "talker_params= (convert with "
                "qwen3omni_talker.convert_talker/convert_code2wav from the "
                "HF checkpoint's talker.*/code2wav.* tensors)")
        c2w_params = self.kwargs.get("code2wav_params")
        self._talker = (TalkerSession(tcfg, tparams), tcfg, c2w_params)
        return self._talker

    def _thinker_rollout_with_hiddens(self, path, audio, text,
                                      max_new_tokens, eos, accept_layer):
        """Greedy thinker rollout that also returns, per token (prompt +
        generated), the layer-0 embeddings and the accept-layer hidden
        (captured AFTER the deepstack residual — the layer-boundary value
        the talker conditions on)."""
        import jax
        from . import decoder as dec2

        cfg = self.config
        ids, feats_list = self._assemble_content(path, audio, text)
        n = len(ids)
        s = _bucket(n, SEQ_BUCKETS)
        n_ds = len(cfg.vision.deepstack_indexes)
        d = cfg.text.d_model
        t_max = max(sum(f.shape[0] for _, f, *_ in feats_list), 1)
        ids_arr = np.zeros((1, s), np.int64)
        ids_arr[0, :n] = ids
        splice_mask = np.zeros((1, s), bool)
        vis_mask = np.zeros((1, s), bool)
        splice_slot = np.zeros((1, s), np.int64)
        feats = np.zeros((1, t_max, d), np.float32)
        deepstack = np.zeros((n_ds, 1, t_max, d), np.float32)
        row = 0
        grids = [g for _, _, _, g, _ in feats_list if g is not None]
        mm_ids = {cfg.image_token_id, cfg.video_token_id, cfg.audio_token_id}
        for tok, f, ds, _, _ in feats_list:
            mask = ids_arr[0] == tok
            mask[n:] = False
            splice_mask[0] |= mask
            if ds is not None:
                vis_mask[0] |= mask
                for lvl, dsf in enumerate(ds):
                    deepstack[lvl, 0, row:row + f.shape[0]] = dsf
            splice_slot[0][mask] = row + np.arange(mask.sum())
            feats[0, row:row + f.shape[0]] = f
            row += f.shape[0]
        rope_cfg = q2.Qwen2VLConfig(
            vision=q2.QwenVisionConfig(merge_size=cfg.vision.merge_size,
                                       tokens_per_second=1),
            text=cfg.text, image_token_id=cfg.image_token_id,
            video_token_id=cfg.video_token_id,
            vision_start_token_id=cfg.vision_start_token_id)
        pos = np.zeros((3, 1, s), np.int64)
        pos[:, 0, :n] = q2.build_rope_index(
            np.asarray(ids), grids, rope_cfg,
            second_per_grid_ts=[1.0] * len(grids))
        last_pos = int(pos[:, 0, n - 1].max())

        embed = self.params["decoder"]["embed"]
        tok_emb = embed[jnp.asarray(ids_arr)]
        spl = jnp.take_along_axis(jnp.asarray(feats, embed.dtype),
                                  jnp.asarray(splice_slot)[..., None], axis=1)
        embeds = jnp.where(jnp.asarray(splice_mask)[..., None], spl, tok_emb)
        vm = jnp.asarray(vis_mask)[..., None]
        ds_list = []
        for lvl in range(n_ds):
            dsl = jnp.take_along_axis(
                jnp.asarray(deepstack[lvl], embed.dtype),
                jnp.asarray(splice_slot)[..., None], axis=1)
            ds_list.append(jnp.where(vm, dsl, 0.0))

        if not hasattr(self, "_spk_prefill"):
            tcfg_ = cfg.text
            self._spk_prefill = jax.jit(
                lambda p, e, po, v, c, ds, al: dec2.forward(
                    p["decoder"], tcfg_, e, po, v, cache=c, cache_pos=0,
                    deepstack=ds, capture_layer=al),
                static_argnames=("al",))
            self._spk_step = jax.jit(
                lambda p, e, po, v, c, cp, al: dec2.forward(
                    p["decoder"], tcfg_, e, po, v, cache=c, cache_pos=cp,
                    capture_layer=al),
                static_argnames=("al",))

        max_len = s + max_new_tokens
        cache = dec.init_cache(cfg.text, 1, max_len, dtype=embed.dtype)
        valid = np.zeros((1, max_len), bool)
        valid[0, :n] = True
        logits, cache, cap = self._spk_prefill(
            self.params, embeds, jnp.asarray(pos), jnp.asarray(valid),
            cache, ds_list or None, accept_layer)

        all_ids = list(ids)
        emb_rows = [np.asarray(embeds[0, :n], np.float32)]
        hid_rows = [np.asarray(cap[0, :n], np.float32)]
        nxt = int(jnp.argmax(logits[0, n - 1]))
        for t in range(max_new_tokens):
            all_ids.append(nxt)
            e1 = embed[jnp.asarray([[nxt]])]
            emb_rows.append(np.asarray(e1[0], np.float32))
            if nxt in eos:
                # HF collects hidden states for every generated token incl.
                # eos; its embed suffices for the talker text projection
                hid_rows.append(np.asarray(e1[0], np.float32) * 0)
                break
            cpos = s + t
            valid[0, cpos] = True
            pos1 = jnp.full((3, 1, 1), last_pos + 1 + t, jnp.int32)
            logits, cache, cap1 = self._spk_step(
                self.params, e1, pos1, jnp.asarray(valid), cache, cpos,
                accept_layer)
            hid_rows.append(np.asarray(cap1[0], np.float32))
            nxt = int(jnp.argmax(logits[0, 0]))
        else:
            pass
        thinker_ids = np.asarray(all_ids)
        thinker_embed = np.concatenate(emb_rows, axis=0)[None]
        thinker_hidden = np.concatenate(hid_rows, axis=0)[None]
        mm_mask = np.isin(thinker_ids, list(mm_ids))
        gen_ids = all_ids[n:]
        return (thinker_ids, thinker_embed, thinker_hidden, mm_mask, n,
                gen_ids, grids)

    def _generate_with_audio(self, images, texts, audio_paths,
                             max_new_tokens, speaker, save_audio_path,
                             **kw):
        """generate(return_audio=True): thinker rollout -> talker codec
        generation -> code2wav -> (texts, waveforms at 24 kHz)."""
        from . import qwen3omni_talker as tk
        from .generation import decode_text

        sess, tcfg, c2w_params = self._talker_session()
        audio_paths = audio_paths or [None] * len(texts)
        eos = {self.eos_token_id} - {None}
        rng = np.random.default_rng(self.kwargs.get("seed", 0))
        embed_table = self.params["decoder"]["embed"]

        out_texts, out_wavs = [], []
        for path, audio, text in zip(images, audio_paths, texts):
            (t_ids, t_embed, t_hidden, mm_mask, n_prompt, gen_ids,
             grids) = self._thinker_rollout_with_hiddens(
                path, audio, text, max_new_tokens, eos,
                tcfg.accept_hidden_layer)
            out_texts.append(decode_text(self.tokenizer, gen_ids, eos))

            talker_embeds, talker_ids, trailing, tts_pad = \
                tk.build_talker_inputs(tcfg, sess.params, t_ids,
                                       jnp.asarray(t_embed),
                                       jnp.asarray(t_hidden), mm_mask,
                                       embed_table, speaker, n_prompt)
            # sequential 3D positions over the talker prompt (the talker's
            # multimodal rope applies when grids are present; text parts
            # are sequential — build with the same walker)
            lt = talker_embeds.shape[1]
            rope_cfg = q2.Qwen2VLConfig(
                vision=q2.QwenVisionConfig(
                    merge_size=self.config.vision.merge_size,
                    tokens_per_second=1),
                text=tcfg.text, image_token_id=self.config.image_token_id,
                video_token_id=self.config.video_token_id,
                vision_start_token_id=self.config.vision_start_token_id)
            pos = np.zeros((3, 1, lt), np.int64)
            pos[:, 0] = q2.build_rope_index(
                np.asarray(talker_ids[0]), grids, rope_cfg,
                second_per_grid_ts=[1.0] * len(grids))
            codes = sess.generate_codes(
                talker_embeds.astype(jnp.float32), jnp.asarray(pos),
                trailing, tts_pad,
                max_new_tokens=kw.get("talker_max_new_tokens", 512),
                do_sample=kw.get("talker_do_sample", True),
                temperature=kw.get("talker_temperature", 0.9),
                top_k=kw.get("talker_top_k", 50),
                top_p=kw.get("talker_top_p", 1.0),
                repetition_penalty=kw.get("talker_repetition_penalty", 1.05),
                rng=rng,
                predictor_do_sample=kw.get("talker_do_sample", True))
            if codes.shape[1] == 0 or c2w_params is None:
                wav = np.zeros((0,), np.float32)
            else:
                wav = tk.chunked_decode(c2w_params, tcfg.code2wav,
                                        codes[None])[0, 0]
            out_wavs.append(wav)
            if save_audio_path:
                import wave as wavemod

                with wavemod.open(str(save_audio_path), "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(24000)
                    w.writeframes(
                        np.clip(wav * 32767, -32768, 32767)
                        .astype(np.int16).tobytes())
        return out_texts, out_wavs
