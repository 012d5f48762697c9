"""Shared KV-cached greedy generation over the common decoder stack.

Every local reference adapter exposes ``generate()`` (reference
gemma3_model.py:244-286, paligemma_model.py:117-139,
internvl_model.py:438-481, qwen3omni_model.py:483-548 — all delegate to HF
``model.generate``).  The TPU-native equivalent is one engine over
``models/decoder.forward``'s cache path:

  * one bucketed prefill writes the prompt's k/v into a static-size cache
    (deepstack residuals and bidirectional image-group overlays supported,
    so Gemma3/PaliGemma prefix-LM and Qwen3-Omni prompts prefill exactly);
  * each step is a single-token decode against absolute cache positions
    (sliding-window layers mask old slots; new tokens are causal).

Greedy only (reference smoke tests run do_sample=False); sampling kwargs
are accepted by the adapters for API compatibility.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from . import decoder as dec


class CachedLM:
    """Jitted prefill/step pair for one DecoderConfig.

    embed_scale: multiplier applied to token embeddings (Gemma's sqrt(d),
    bf16-rounded by using the embed dtype). Vision/audio features are
    spliced by the caller into the prefill embeds.
    """

    def __init__(self, cfg: dec.DecoderConfig, embed_scale: float | None = None):
        self.cfg = cfg
        self.embed_scale = embed_scale

        def fwd(p, embeds, pos, valid, cache, cpos, bidir, deepstack):
            return dec.forward(p, cfg, embeds, pos, valid, cache=cache,
                               cache_pos=cpos, bidir_ids=bidir,
                               deepstack=deepstack)

        self._fwd = jax.jit(fwd)

    def greedy_batch(self, params_dec, embeds, pos, n_prompts,
                     max_new_tokens: int, eos_id: int | None = None,
                     bidir_full=None, deepstack=None, gather_ids=None,
                     temperature: float = 1.0):
        """Batched greedy generation with a DEVICE-SIDE step loop.

        The per-sequence `greedy` path syncs to the host every token (one
        tunnel/PCIe round-trip per step); this runs prefill + a
        lax.fori_loop of single-token steps entirely under one jit — zero
        host round-trips until the final (B, max_new_tokens) token matrix
        is read back. Greedy only (sampling stays on the host path).

        embeds: (B, S, D); pos: (B, S) or (3, B, S); n_prompts: (B,) int;
        bidir_full: optional (B, S + max_new_tokens) cache-aligned groups.
        gather_ids: optional (B, G) token ids — additionally returns the
        fp32 softmax probability (at `temperature`) of each of those ids
        at every step, shape (B, max_new_tokens, G). Batched rollout
        SCORING (Gemma4/Molmo2 end-aligned answer probs) rides this with
        no extra host round-trips.
        Returns (tokens (B, max_new_tokens) np.int32, lengths (B,) np.int32
        counting tokens up to and including eos[, probs]).
        """
        b, s, _ = embeds.shape
        if not hasattr(self, "_batch_runs"):
            self._batch_runs = {}
        g = None if gather_ids is None else np.asarray(gather_ids).shape[1]
        key = (b, s, max_new_tokens, pos.ndim, bidir_full is not None,
               deepstack is not None, g, float(temperature))
        if key not in self._batch_runs:
            self._batch_runs[key] = self._build_batch_greedy(
                b, s, max_new_tokens, pos_ndim=np.asarray(pos).ndim,
                use_bidir=bidir_full is not None,
                use_deepstack=deepstack is not None, gather_g=g,
                temperature=float(temperature))
        run = self._batch_runs[key]

        valid0 = np.zeros((b, s + max_new_tokens), bool)
        for j, n in enumerate(np.asarray(n_prompts)):
            valid0[j, :int(n)] = True
        eos = -1 if eos_id is None else int(eos_id)
        bid = (jnp.asarray(np.asarray(bidir_full, np.int32))
               if bidir_full is not None else None)
        gids = (jnp.asarray(np.asarray(gather_ids, np.int32))
                if gather_ids is not None else None)
        out = run(params_dec, jnp.asarray(embeds), jnp.asarray(pos),
                  jnp.asarray(valid0), jnp.asarray(n_prompts, jnp.int32),
                  jnp.asarray(eos, jnp.int32), bid, deepstack, gids)
        tokens, probs = out if gather_ids is not None else (out, None)
        tokens = np.asarray(tokens, np.int32)
        lengths = np.full((b,), max_new_tokens, np.int32)
        for j in range(b):
            hits = np.flatnonzero(tokens[j] == eos)
            if eos >= 0 and hits.size:
                lengths[j] = hits[0] + 1
        if gather_ids is not None:
            return tokens, lengths, np.asarray(probs, np.float32)
        return tokens, lengths

    def _build_batch_greedy(self, b, s, max_new, pos_ndim, use_bidir,
                            use_deepstack, gather_g=None, temperature=1.0):
        cfg = self.cfg
        scale = self.embed_scale

        def run(params, embeds, pos, valid0, n_prompts, eos_id, bidir,
                deepstack, gather_ids):
            max_len = s + max_new
            cache = dec.init_cache(cfg, b, max_len, dtype=embeds.dtype)
            logits, cache = dec.forward(
                params, cfg, embeds, pos, valid0, cache=cache, cache_pos=0,
                bidir_ids=bidir, deepstack=deepstack)
            # last prompt logit per row
            logit_pos = n_prompts - 1                       # (B,)
            first = jnp.take_along_axis(
                logits, logit_pos[:, None, None], axis=1)[:, 0]
            tok0 = jnp.argmax(first, axis=-1).astype(jnp.int32)
            if pos_ndim == 2:
                last_pos = jnp.take_along_axis(pos, logit_pos[:, None],
                                               axis=1)[:, 0]
            else:
                last_pos = jnp.max(jnp.take_along_axis(
                    pos, logit_pos[None, :, None], axis=2)[:, :, 0], axis=0)

            emb_table = params["embed"]

            def embed_tok(t):  # (B,) -> (B, 1, D)
                e = emb_table[t][:, None]
                if scale is not None:
                    e = e * jnp.asarray(scale, e.dtype)
                return e

            def gprobs(step_logits):  # (B, V) -> (B, G) fp32 probs
                d = jax.nn.softmax(step_logits.astype(jnp.float32)
                                   / temperature, axis=-1)
                return jnp.take_along_axis(d, gather_ids, axis=-1)

            tokens0 = jnp.zeros((b, max_new), jnp.int32)
            tokens0 = tokens0.at[:, 0].set(tok0)
            done0 = (tok0 == eos_id)
            if gather_g is not None:
                probs0 = jnp.zeros((b, max_new, gather_g), jnp.float32)
                probs0 = probs0.at[:, 0].set(gprobs(first))
            else:
                probs0 = jnp.zeros((b, 1, 1), jnp.float32)  # unused

            def body(step, carry):
                cache, valid, tokens, probs, cur, done = carry
                cpos = s + step - 1  # cache slot of the token generated at step-1
                valid = valid.at[:, cpos].set(True)
                if pos_ndim == 2:
                    pos1 = (last_pos + step)[:, None]
                else:
                    pos1 = jnp.broadcast_to((last_pos + step)[None, :, None],
                                            (3, b, 1))
                logits, cache = dec.forward(
                    params, cfg, embed_tok(cur), pos1, valid,
                    cache=cache, cache_pos=cpos, bidir_ids=bidir)
                nxt = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)
                nxt = jnp.where(done, eos_id, nxt)
                tokens = tokens.at[:, step].set(nxt)
                if gather_g is not None:
                    probs = probs.at[:, step].set(gprobs(logits[:, 0]))
                done = done | (nxt == eos_id)
                return cache, valid, tokens, probs, nxt, done

            _, _, tokens, probs, _, _ = jax.lax.fori_loop(
                1, max_new, body,
                (cache, valid0, tokens0, probs0, tok0, done0))
            if gather_g is not None:
                return tokens, probs
            return tokens

        return jax.jit(run)

    def _embed_token(self, params_dec, tok: int) -> jnp.ndarray:
        emb = params_dec["embed"][tok][None, None]
        if self.embed_scale is not None:
            emb = emb * jnp.asarray(self.embed_scale, emb.dtype)
        return emb

    def greedy(self, params_dec, embeds, pos, n_prompt: int,
               max_new_tokens: int, eos_ids=(), temperature: float = 1.0,
               bidir_full=None, deepstack=None, sample: bool = False,
               top_p: float = 0.9, rng=None):
        """Generate up to max_new_tokens (greedy, or nucleus sampling when
        sample=True — the reference adapters' do_sample/temperature/top_p
        contract, e.g. gemma3_model.py:261-277).

        embeds: (1, S, D) prefill embeddings (S >= n_prompt, padded ok);
        pos: (1, S) int positions or (3, 1, S) M-RoPE streams;
        bidir_full: optional (1, S + max_new_tokens) cache-aligned group ids
        (-1 on text/generated slots);
        deepstack: optional list of (1, S, D) residuals (prefill only).

        Returns (generated ids, list of fp32 softmax dists per step).
        """
        s = embeds.shape[1]
        max_len = s + max_new_tokens
        cache = dec.init_cache(self.cfg, 1, max_len, dtype=embeds.dtype)
        valid = np.zeros((1, max_len), bool)
        valid[0, :n_prompt] = True

        bidir = None
        if bidir_full is not None:
            bidir = jnp.asarray(np.asarray(bidir_full, np.int32))
            assert bidir.shape == (1, max_len), \
                f"bidir_full must be cache-aligned (1, {max_len})"

        pos_np = np.asarray(pos)
        if pos_np.ndim == 2:
            last_pos = int(pos_np[0, n_prompt - 1])
            mk_pos = lambda v: jnp.full((1, 1), v, jnp.int32)
        else:
            last_pos = int(pos_np[:, 0, n_prompt - 1].max())
            mk_pos = lambda v: jnp.full((3, 1, 1), v, jnp.int32)

        logits, cache = self._fwd(params_dec, jnp.asarray(embeds),
                                  jnp.asarray(pos), jnp.asarray(valid),
                                  cache, 0, bidir, deepstack)
        t = max(float(temperature), 1e-6)
        dist = jax.nn.softmax(logits[0, n_prompt - 1] / t)

        eos_ids = {e for e in eos_ids if e is not None}
        if sample and rng is None:
            rng = np.random.default_rng()
        gen, dists = [], []
        for step in range(max_new_tokens):
            dists.append(np.asarray(dist, np.float32))
            if sample:
                nxt = int(_nucleus_sample(dists[-1], top_p, rng))
            else:
                nxt = int(np.argmax(dists[-1]))
            gen.append(nxt)
            if nxt in eos_ids or step == max_new_tokens - 1:
                break
            cpos = s + step
            valid[0, cpos] = True
            emb1 = self._embed_token(params_dec, nxt)
            logits, cache = self._fwd(params_dec, emb1,
                                      mk_pos(last_pos + 1 + step),
                                      jnp.asarray(valid), cache, cpos,
                                      bidir, None)
            dist = jax.nn.softmax(logits[0, 0] / t)
        return gen, dists


def _nucleus_sample(dist: np.ndarray, top_p: float, rng) -> int:
    """Top-p (nucleus) sampling over an fp32 softmax distribution (HF
    semantics: keep the smallest prefix of descending-prob tokens whose
    cumulative mass reaches top_p, renormalize, sample)."""
    order = np.argsort(dist)[::-1]
    sorted_p = dist[order]
    cum = np.cumsum(sorted_p)
    cut = int(np.searchsorted(cum, top_p) + 1)
    keep = order[:cut]
    p = dist[keep] / dist[keep].sum()
    return int(rng.choice(keep, p=p))


def trace_from_rollout(gen, dists, answer_ids, special_ids, decode,
                       score_position: str = "end"):
    """Reference trace contract (qwen2vl_model.py:303-493): score the
    answer tokens at the start or end of a greedy rollout and return
    (geometric-mean prob, trace dict with per-token top-5 alternatives)."""
    assert score_position in ("start", "end")
    n_ans = len(answer_ids)
    ans = list(answer_ids)
    if score_position == "start":
        start, offset = 0, 0
    else:
        offset = 1 if (gen and gen[-1] in special_ids) else 0
        if offset:
            n_ans = min(n_ans, len(dists) - 1)
        start = max(len(gen) - n_ans - offset, 0)
    n_ans = min(n_ans, len(dists) - start)
    ans = ans[:n_ans]

    joint = 1.0
    details = []
    for i in range(n_ans):
        dist = dists[start + i]
        tid = ans[i]
        prob = float(dist[tid])
        joint *= prob
        top = np.argsort(dist)[::-1][:5]
        details.append({
            "position": start + i,
            "expected_token_id": tid,
            "expected_token_text": decode([tid]),
            "probability": prob,
            "top_alternatives": [
                {"token_id": int(t), "token_text": decode([int(t)]),
                 "probability": float(dist[t])} for t in top],
        })
    gm = joint ** (1.0 / max(n_ans, 1))
    trace = {
        "generated_text": decode(gen),
        "generated_length": len(gen),
        "score_position": score_position,
        "score_start_idx": start,
        "scored_indices": list(range(start, start + n_ans)),
        "scored_tokens_text": decode(gen[start:start + n_ans]),
        "probability": gm,
        "token_details": details,
    }
    return gm, trace


def score_rollout(dists, gen, answer_ids, special_ids,
                  warn=print) -> float:
    """End-aligned rollout scoring (reference gemma4_model.py:185-228 and
    molmo2_model.py:168-214 share this exact rule).

    The model generates a few tokens (possibly an empty thinking block
    before the answer); the answer tokens are scored from the END of the
    generated sequence, skipping one trailing special token. Returns the
    geometric-mean probability.
    """
    n_ans = len(answer_ids)
    offset = 0
    if gen and gen[-1] in special_ids:
        n_ans = min(n_ans, len(dists) - 1)
        offset = 1
        if n_ans <= 0:
            raise ValueError(
                "No content tokens to score after removing special tokens")
    if len(dists) < n_ans:
        warn(f"  Warning: Generated {len(dists)} tokens but need "
             f"{n_ans}, adjusting")
        n_ans = len(dists)
    ans = answer_ids[:n_ans]
    joint = 1.0
    for i in range(n_ans):
        pos = len(dists) - (n_ans - i + offset)
        joint *= float(dists[pos][ans[i]])
    return joint ** (1.0 / max(n_ans, 1))


def decode_text(tokenizer, ids, eos_ids=()) -> str:
    """Decode generated ids, stripping eos/special tokens like the
    reference's skip_special_tokens=True decode."""
    ids = [i for i in ids if i not in set(e for e in eos_ids if e is not None)]
    try:
        return tokenizer.decode(ids, skip_special_tokens=True).strip()
    except TypeError:
        return tokenizer.decode(ids).strip()
