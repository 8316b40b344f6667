"""On-device decoding: greedy/sampling and beam search with static shapes.

TPU re-design of pasero/decoding.py:906-1646. Everything the reference does
with dynamic python control flow becomes fixed-shape jitted programs:

- prompts are LEFT-aligned so all rows write the KV cache at the same slot;
  per-row position offsets keep RoPE/ALiBi correct (decoding.py handles
  left-padded batches with per-sample offsets too, modules.py:996-1013);
- the sampling loop is a ``lax.while_loop`` with a finished mask — no batch
  shrinking (the reference re-indexes finished_ids, decoding.py:1449-1540);
- beam search keeps 2*beam candidates per step (fairseq-style EOS harvest,
  decoding.py:1427-1530), finalizing EOS hypotheses into a fixed (B, beam)
  buffer; scores are length-normalized by (len+1)^p at the end
  (decoding.py:1639);
- top-k/top-p/temperature/repeat-penalty/blacklist/stop-sequences match the
  reference's sampling semantics (decoding.py:1005-1222).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e9


def left_align(tokens: np.ndarray, mask: np.ndarray, pad_idx: int):
    """Right-padded prompt rows -> left-padded (right-aligned) rows."""
    tokens = np.asarray(tokens)
    mask = np.asarray(mask, dtype=bool)
    out_tokens = np.full_like(tokens, pad_idx)
    out_mask = np.zeros_like(mask)
    P = tokens.shape[1]
    for i in range(tokens.shape[0]):
        ids = tokens[i, mask[i]]
        if len(ids):
            out_tokens[i, P - len(ids):] = ids
            out_mask[i, P - len(ids):] = True
    return out_tokens, out_mask


def _apply_sampling_filters(logits, tokens_so_far, cfg_static, rng):
    """temperature / repeat penalty / top-k / top-p -> sampled token + logprob."""
    (temperature, top_k, top_p, repeat_penalty, greedy) = cfg_static
    logprobs = jax.nn.log_softmax(logits, axis=-1)

    if repeat_penalty != 1.0:
        V = logits.shape[-1]
        seen = jax.vmap(lambda row: jnp.zeros(V, bool).at[row].set(True))(
            tokens_so_far)
        penalized = jnp.where(logits < 0, logits * repeat_penalty,
                              logits / repeat_penalty)
        logits = jnp.where(seen, penalized, logits)

    if greedy:
        token = jnp.argmax(logits, axis=-1)
        return token, jnp.take_along_axis(logprobs, token[:, None], 1)[:, 0]

    scaled = logits / max(temperature, 1e-6)
    if top_k and top_k > 0:
        kth = jnp.sort(scaled, axis=-1)[:, -top_k][:, None]
        scaled = jnp.where(scaled < kth, NEG_INF, scaled)
    if top_p and top_p < 1.0:
        sorted_logits = jnp.sort(scaled, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep the smallest set of tokens with cumulative prob >= top_p
        cutoff_idx = jnp.sum(cum < top_p, axis=-1)
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx[:, None], 1)
        scaled = jnp.where(scaled < cutoff, NEG_INF, scaled)
    token = jax.random.categorical(rng, scaled, axis=-1)
    return token, jnp.take_along_axis(logprobs, token[:, None], 1)[:, 0]


def _stop_sequence_hit(tokens, length, stop_sequences):
    """True where the generated suffix matches any stop sequence.
    tokens: (B, L) buffer; length: (B,) current total length (left-aligned
    from position 0 in the buffer)."""
    if not stop_sequences:
        return jnp.zeros(tokens.shape[0], bool)
    length = jnp.broadcast_to(jnp.asarray(length), (tokens.shape[0],))
    hits = jnp.zeros(tokens.shape[0], bool)
    L = tokens.shape[1]
    for seq in stop_sequences:
        seq = jnp.asarray(seq)
        n = seq.shape[0]
        # gather the last n tokens before `length`
        idx = jnp.clip(length[:, None] - n + jnp.arange(n)[None, :], 0, L - 1)
        window = jnp.take_along_axis(tokens, idx, axis=1)
        match = jnp.all(window == seq[None, :], axis=1) & (length >= n)
        hits |= match
    return hits



def _member_list(params):
    """Ensembles pass a list of parameter trees (decoding.py:1704-1777)."""
    return list(params) if isinstance(params, (list, tuple)) else [params]


def _use_fused_head(model) -> bool:
    """Greedy paths may use the fused Pallas vocab head (argmax + logprob
    without fp32 (B, V) logits in HBM).  PASERO_FUSED_HEAD: 1 forces it
    (CPU interpret-mode tests), 0 disables; auto (default) keeps it OFF.
    Evidence: the round-4 A/B (2026-08-20) read a win in the 1B llama
    regime, but the round-5 re-run (2026-08-21, best-of-3 each) has the
    materialized head ahead at BOTH scales and precisions — llama_1b
    greedy 2017 vs 1852 tok/s bf16 and 2583 vs 2435 int8 (PERFORMANCE.md
    1B section), transformer-base 67k vs 63k.  The per-step (B, V) fp32
    round-trip the kernel saves (~1 MB at B=8) is simply too small next
    to its per-call overhead; the kernel remains available for the
    regime it was built for (huge-vocab, larger-batch heads) via the env
    flag."""
    import os
    env = os.environ.get("PASERO_FUSED_HEAD", "auto")
    if not getattr(model, "supports_fused_head", False):
        return False
    return env == "1"


def _members_apply(model, param_list, cache_list, tokens, *, average, **kwargs):
    """Apply every ensemble member; return (scores, caches).

    With one member, raw logits pass through (temperature semantics identical
    to the reference); with several, members' log-probs are averaged
    (geometric mean of probabilities, like the reference's EnsembleModel).
    """
    outs, caches = [], []
    for i, p in enumerate(param_list):
        variables = {"params": p}
        if cache_list is not None:
            variables["cache"] = cache_list[i]
        logits, mutated = model.apply(variables, tokens,
                                      method=type(model).decode_step,
                                      mutable=["cache"], **kwargs)
        logits = logits[:, -1].astype(jnp.float32) if logits.ndim == 3 else logits
        outs.append(jax.nn.log_softmax(logits, -1) if average else logits)
        caches.append(mutated["cache"])
    if average:
        return sum(outs) / len(outs), tuple(caches)
    return outs[0], tuple(caches)


def sample_decode(
    model, params, prompt, prompt_mask, *,
    max_new: int, eos_idx: int, pad_idx: int,
    encoder_out=None, encoder_mask=None,
    temperature: float = 1.0, top_k: int = 0, top_p: float = 1.0,
    repeat_penalty: float = 1.0, greedy: bool = True,
    min_lengths=None, blacklist: tuple = (), stop_sequences: tuple = (),
    rng: Optional[jax.Array] = None,
):
    """Greedy / sampling generation (decoding.py sample_on_the_fly).

    prompt: (B, P) LEFT-padded int32; prompt_mask: (B, P) bool.
    Returns dict with tokens (B, max_new), scores (B, max_new), lengths (B,).
    """
    B, P = prompt.shape
    L = P + max_new  # cache length
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    prompt_len = prompt_mask.sum(axis=1).astype(jnp.int32)
    cfg_static = (temperature, top_k, top_p, repeat_penalty, greedy)

    positions = (jnp.arange(P)[None, :] - (P - prompt_len)[:, None]).astype(jnp.int32)
    pad_valid = jnp.concatenate(
        [prompt_mask, jnp.ones((B, max_new), bool)], axis=1)  # (B, L)

    param_list = _member_list(params)
    average = len(param_list) > 1
    # fused greedy head: token+logprob come straight from the Pallas vocab
    # head (fused_head_argmax) and the fp32 (B, V) logits never exist — only
    # when nothing downstream needs the full distribution.
    fuse_head = (greedy and repeat_penalty == 1.0 and not blacklist
                 and min_lengths is None and not average
                 and _use_fused_head(model))

    def fused_apply(p, cache, tokens, **kwargs):
        variables = {"params": p}
        if cache is not None:
            variables["cache"] = cache
        (tok, lp), mutated = model.apply(
            variables, tokens, method=type(model).decode_step,
            mutable=["cache"], head="argmax", **kwargs)
        return tok[:, -1], lp[:, -1], (mutated["cache"],)

    # process the prompt block, creating + filling the KV cache(s)
    prompt_kwargs = dict(encoder_out=encoder_out, encoder_mask=encoder_mask,
                         positions=positions,
                         tgt_mask=jnp.ones((B, P), bool),
                         self_kv_mask=pad_valid)
    if fuse_head:
        tok0, lp0, cache = fused_apply(param_list[0], None, prompt,
                                       **prompt_kwargs)
        last_logits = (tok0, lp0)
    else:
        last_logits, cache = _members_apply(
            model, param_list, None, prompt, average=average, **prompt_kwargs)

    dummy_encoder = (jnp.zeros((B, 1, encoder_out.shape[-1]), encoder_out.dtype)
                     if encoder_out is not None else None)

    blacklist_arr = jnp.asarray(list(blacklist), jnp.int32) if blacklist else None

    def mask_logits(logits, step):
        if blacklist_arr is not None:
            logits = logits.at[:, blacklist_arr].set(NEG_INF)
        if min_lengths is not None:
            too_short = step < jnp.asarray(min_lengths)
            logits = jnp.where(too_short[:, None] &
                               (jnp.arange(logits.shape[-1]) == eos_idx)[None, :],
                               NEG_INF, logits)
        return logits

    def cond(carry):
        step, _, _, _, _, finished, _, _ = carry
        return (step < max_new) & ~jnp.all(finished)

    def body(carry):
        (step, cache, logits, tokens_buf, scores_buf, finished, finish_step,
         rng) = carry
        rng, sample_rng = jax.random.split(rng)
        if fuse_head:
            token, logprob = logits     # precomputed by the fused head
        else:
            logits = mask_logits(logits, step)
            token, logprob = _apply_sampling_filters(
                logits, tokens_buf, cfg_static, sample_rng)
        token = jnp.where(finished, pad_idx, token).astype(jnp.int32)
        logprob = jnp.where(finished, 0.0, logprob)
        tokens_buf = tokens_buf.at[:, step].set(token)
        scores_buf = scores_buf.at[:, step].set(logprob)

        hit_stop = _stop_sequence_hit(tokens_buf, step + 1,
                                      stop_sequences)
        now_finished = finished | (token == eos_idx) | hit_stop
        # record the step a row finishes (EOS *or* stop sequence), so lengths
        # don't report max_new for stop-sequence-terminated rows
        finish_step = jnp.where(now_finished & ~finished, step + 1,
                                finish_step)
        finished = now_finished

        pos = (prompt_len + step)[:, None]
        step_kwargs = dict(encoder_out=dummy_encoder,
                           encoder_mask=encoder_mask, positions=pos,
                           tgt_mask=jnp.ones((B, 1), bool),
                           self_kv_mask=pad_valid)
        if fuse_head:
            ntok, nlp, new_cache = fused_apply(param_list[0], cache[0],
                                               token[:, None], **step_kwargs)
            new_logits = (ntok, nlp)
        else:
            new_logits, new_cache = _members_apply(
                model, param_list, cache, token[:, None], average=average,
                **step_kwargs)
        return (step + 1, new_cache, new_logits,
                tokens_buf, scores_buf, finished, finish_step, rng)

    init = (jnp.zeros((), jnp.int32), cache, last_logits,
            jnp.full((B, max_new), pad_idx, jnp.int32),
            jnp.zeros((B, max_new), jnp.float32),
            jnp.zeros((B,), bool),
            jnp.full((B,), max_new, jnp.int32), rng)

    (step, cache, _, tokens_buf, scores_buf, finished, finish_step,
     _) = jax.lax.while_loop(cond, body, init)
    lengths = jnp.minimum(finish_step, max_new)
    valid = jnp.arange(max_new)[None] < lengths[:, None]
    tokens_buf = jnp.where(valid, tokens_buf, pad_idx)
    scores_buf = jnp.where(valid, scores_buf, 0.0)
    return {"tokens": tokens_buf, "scores": scores_buf, "lengths": lengths}


# ---------------------------------------------------------------------------
# beam search
# ---------------------------------------------------------------------------

def _flatten_beam(x):
    return x.reshape((-1,) + x.shape[2:])


def _unflatten_beam(x, B, K):
    return x.reshape((B, K) + x.shape[1:])


def _gather_beams(tree, beam_indices, B, K):
    """Reorder the beam dimension of every (B*K, ...) array in the tree.

    Beam reorder is the hot non-forward op of the search loop, so two
    optimizations matter here:
    - cross-attention caches are beam-INVARIANT (every beam of a sentence
      holds the same encoder K/V), so permuting within a sentence's block is
      a no-op — skip them entirely (half the cache bytes);
    - the self-attention K/V reorder is one flat (B*K, B*K) one-hot matmul
      over ALL rows: the permutation streams through the MXU at full HBM
      bandwidth instead of the scatter/gather unit.  Flat, not per-sentence
      (B, K, K) batched: K=5 would pad to the 128x128 MXU tile on BOTH
      matmul dims (~650x wasted FLOPs — measured 2x slower end-to-end);
      B*K rows pad to the next 128 multiple only once.
    """
    import os
    method = os.environ.get("PASERO_BEAM_GATHER", "onehot")
    flat_idx = (jnp.arange(B)[:, None] * K + beam_indices).reshape(-1)

    def gather(path, x):
        # scalar bookkeeping entries (cache_index, cross_filled) are shared
        if x.ndim == 0 or x.shape[0] != B * K:
            return x
        if "cross_attn" in jax.tree_util.keystr(path):
            return x
        if method == "onehot" and x.ndim >= 2 and \
                jnp.issubdtype(x.dtype, jnp.floating):
            onehot = jax.nn.one_hot(flat_idx, B * K, dtype=x.dtype)
            out = onehot @ x.reshape(B * K, -1)
            return out.reshape(x.shape)
        return jnp.take(x, flat_idx, axis=0)

    return jax.tree_util.tree_map_with_path(gather, tree)


def _topk_wide(x, k, block=256):
    """Exact top-k over a wide axis via block-max filtering.

    TPU ``top_k`` over a (R, 32k) vocab axis runs ~5x above its read
    roofline (profiled: 0.54 ms of a 3.7 ms beam step).  This computes a
    per-256-block max (a roofline-speed VPU reduce), takes the k blocks
    with the largest maxima, and runs the final top-k over only k*256
    candidates.  Exactness: any global top-k element's block max is >= the
    global k-th value, and every excluded block's max is <= the k selected
    maxima — so the k largest VALUES always survive filtering (on exact
    value ties the winning index may differ from lax.top_k's lowest-index
    rule, as with any tournament reduction).
    """
    R, V = x.shape
    nb = V // block
    if V % block or nb < 4 or k * block >= V:
        return jax.lax.top_k(x, k)          # nothing to win
    xb = x.reshape(R, nb, block)
    _, bidx = jax.lax.top_k(xb.max(axis=-1), k)            # (R, k)
    cand = jnp.take_along_axis(xb, bidx[:, :, None], axis=1)
    vals, flat = jax.lax.top_k(cand.reshape(R, k * block), k)
    sel_block = jnp.take_along_axis(bidx, flat // block, axis=1)
    return vals, sel_block * block + flat % block


def beam_search(
    model, params, prompt, prompt_mask, *,
    beam_size: int, max_new: int, eos_idx: int, pad_idx: int,
    encoder_out=None, encoder_mask=None, len_penalty: float = 1.0,
    min_lengths=None, blacklist: tuple = (), lineage: Optional[bool] = None,
):
    """fairseq-style beam search (decoding.py:1224-1646), fixed shapes.

    prompt (B, P) LEFT-padded (forced tokens are teacher-forced for every
    beam). Returns tokens (B, beam, max_new), scores (B, beam) normalized,
    positional_scores (B, beam, max_new), lengths (B, beam) — hypotheses
    sorted best-first.
    """
    B, P = prompt.shape
    K = beam_size
    V_neg = NEG_INF
    prompt_len = prompt_mask.sum(axis=1).astype(jnp.int32)

    # no-reorder beam attention (attention.lineage_attention): instead of
    # permuting the self-attention KV cache at every step, track each logical
    # beam's physical cache row per slot and resolve the lineage inside
    # attention.  Measured on a v5e chip (scripts/bench_decode.py,
    # transformer-base B=64 beam-5): with candidate selection fused into
    # the model call (round 4) lineage wins at EVERY cache length — 20.3k
    # vs 17.6k tok/s at 65 slots, 10.0k vs 3.9k at 320 (the permute's
    # cache reshuffle scales with cache bytes; lineage's masked softmax is
    # a constant ~0.27 ms/layer) — so it is the default whenever the model
    # supports it.  lineage=False forces the permute path (the LSTM hybrid
    # has no beam_lineage hook and always permutes).
    if lineage is None:
        lineage = True
    use_lineage = (lineage and K > 1
                   and getattr(model, "supports_beam_lineage", False))

    # expand to B*K rows
    def expand(x):
        if x is None:
            return None
        return jnp.repeat(x, K, axis=0)

    prompt_k = expand(prompt)
    prompt_mask_k = expand(prompt_mask)
    encoder_out_k = expand(encoder_out)
    encoder_mask_k = expand(encoder_mask)
    prompt_len_k = expand(prompt_len)

    positions = (jnp.arange(P)[None, :]
                 - (P - prompt_len_k)[:, None]).astype(jnp.int32)
    pad_valid_k = jnp.concatenate(
        [prompt_mask_k, jnp.ones((B * K, max_new), bool)], axis=1)
    param_list = _member_list(params)
    average = len(param_list) > 1

    dummy_encoder = (jnp.zeros((B * K, 1, encoder_out.shape[-1]),
                               encoder_out.dtype)
                     if encoder_out is not None else None)
    blacklist_arr = jnp.asarray(list(blacklist), jnp.int32) if blacklist else None

    # live state
    live_scores0 = jnp.tile(jnp.array([0.0] + [V_neg] * (K - 1)), (B, 1))

    def select_candidates(scores, step):
        """Per-row top-2K candidate selection, fused against the model call.

        ``scores`` is the raw (B*K, V) fp32 logits (single member) or the
        averaged log-probs (ensembles).  Selecting on raw logits is exact:
        within a row both the log-softmax normalizer and the running beam
        score are CONSTANT shifts, so the top-2K *indices* are unchanged —
        the lse is subtracted from only the 2K survivors afterwards.  This
        keeps the fp32 (B*K, V) log-probs (41 MB at the bench shape) out of
        HBM and — because selection now happens in the same loop iteration
        as the model call that produced the logits — out of the while-loop
        carry entirely (profiled: the logprobs carry + log_softmax + the
        (B, K, V) candidate add were ~0.5 ms of a 3.65 ms step at B=64 K=5).
        """
        lse = (None if average
               else jax.scipy.special.logsumexp(scores, axis=-1, keepdims=True))
        if blacklist_arr is not None:
            scores = scores.at[:, blacklist_arr].set(V_neg)
        if min_lengths is not None:
            too_short = jnp.repeat(step < jnp.asarray(min_lengths), K)
            eos_col = (jnp.arange(scores.shape[-1]) == eos_idx)
            scores = jnp.where(too_short[:, None] & eos_col[None, :],
                               V_neg, scores)
        vals, idx = _topk_wide(scores, 2 * K)               # (B*K, 2K)
        if lse is not None:
            vals = vals - lse
            if blacklist_arr is not None or min_lengths is not None:
                # restore the masked-token invariant: blacklist/min-length
                # masking happened in *logit* space, so a masked token that
                # survives into the top-2K would carry V_neg - lse here
                # rather than exactly V_neg.  Clamp it back so downstream
                # comparisons (e.g. the `fin_scores <= V_neg/2` fallback)
                # keep their exact-NEG_INF assumption.
                vals = jnp.where(vals < V_neg * 0.5, V_neg, vals)
        return vals, idx

    last_scores, cache = _members_apply(
        model, param_list, None, prompt_k, average=average,
        encoder_out=encoder_out_k, encoder_mask=encoder_mask_k,
        positions=positions, tgt_mask=jnp.ones((B * K, P), bool),
        self_kv_mask=pad_valid_k)
    sel0 = select_candidates(last_scores.astype(jnp.float32),
                             jnp.zeros((), jnp.int32))

    def norm(score, length):
        return score / ((length.astype(jnp.float32) + 1.0) ** len_penalty)

    def cond(carry):
        (step, _, _, _, _, live_scores, fin_scores, _, _, _, _) = carry
        # stop when no live beam can beat the worst finalized hypothesis
        best_possible = norm(jnp.max(live_scores, axis=1),
                             jnp.full((B,), max_new))
        worst_final = jnp.min(fin_scores, axis=1)
        improvable = best_possible > worst_final
        return (step < max_new) & jnp.any(improvable)

    def body(carry):
        (step, cache, sel, tokens_buf, pos_scores_buf, live_scores,
         fin_scores, fin_tokens, fin_pos_scores, fin_lengths,
         lineage_buf) = carry
        # sel: per-row top-2K (log-prob values, vocab indices) of the
        # previous model call's distribution — see select_candidates
        sel_vals, row_idx = sel                              # (B*K, 2K)
        row_scores = (live_scores.reshape(B * K, 1) + sel_vals)
        # second selection stage: top-2K of the K*2K survivors per sentence
        # (the one-stage top_k over (B, K*V) needed a layout-changing copy
        # of the 84 MB candidate tensor plus a wider partial-reduce —
        # ~1.2 of the 4.4 ms/call at B=64 K=5 V=32k, profiled on v5e)
        top_scores, pos = jax.lax.top_k(row_scores.reshape(B, K * 2 * K),
                                        2 * K)               # (B, 2K)
        beam_idx = pos // (2 * K)
        token_idx = jnp.take_along_axis(row_idx.reshape(B, K * 2 * K), pos,
                                        axis=1)

        is_eos = token_idx == eos_idx
        # -- finalize EOS candidates into the fixed-size buffers ------------
        eos_norm = jnp.where(is_eos, norm(top_scores, step + 1), V_neg)
        # merge current finalized (B, K) with eos candidates (B, 2K): take top K
        merged_scores = jnp.concatenate([fin_scores, eos_norm], axis=1)
        take_scores, take_idx = jax.lax.top_k(merged_scores, K)

        # build candidate finalized tokens
        cand_tokens = jnp.take_along_axis(
            _unflatten_beam(tokens_buf, B, K), beam_idx[..., None], axis=1)
        cand_tokens = cand_tokens.at[:, :, step].set(
            jnp.where(is_eos, token_idx, pad_idx))
        cand_pos = jnp.take_along_axis(
            _unflatten_beam(pos_scores_buf, B, K), beam_idx[..., None], axis=1)
        step_logprob = top_scores - jnp.take_along_axis(
            live_scores, beam_idx, axis=1)
        cand_pos = cand_pos.at[:, :, step].set(step_logprob)
        cand_lengths = jnp.full((B, 2 * K), step + 1)

        all_tokens = jnp.concatenate([fin_tokens, cand_tokens], axis=1)
        all_pos = jnp.concatenate([fin_pos_scores, cand_pos], axis=1)
        all_lengths = jnp.concatenate([fin_lengths, cand_lengths], axis=1)
        fin_scores = take_scores
        fin_tokens = jnp.take_along_axis(all_tokens, take_idx[..., None], axis=1)
        fin_pos_scores = jnp.take_along_axis(all_pos, take_idx[..., None], axis=1)
        fin_lengths = jnp.take_along_axis(all_lengths, take_idx, axis=1)

        # -- keep the best K non-EOS candidates as the live beams -----------
        live_cand = jnp.where(is_eos, V_neg, top_scores)
        new_live_scores, live_idx = jax.lax.top_k(live_cand, K)  # (B, K)
        new_beam_idx = jnp.take_along_axis(beam_idx, live_idx, axis=1)
        new_token = jnp.take_along_axis(token_idx, live_idx, axis=1)
        new_step_logprob = jnp.take_along_axis(step_logprob, live_idx, axis=1)

        tokens_buf = _unflatten_beam(tokens_buf, B, K)
        tokens_buf = jnp.take_along_axis(tokens_buf, new_beam_idx[..., None], 1)
        tokens_buf = tokens_buf.at[:, :, step].set(new_token)
        tokens_buf = _flatten_beam(tokens_buf)
        pos_scores_buf = _unflatten_beam(pos_scores_buf, B, K)
        pos_scores_buf = jnp.take_along_axis(pos_scores_buf,
                                             new_beam_idx[..., None], 1)
        pos_scores_buf = pos_scores_buf.at[:, :, step].set(new_step_logprob)
        pos_scores_buf = _flatten_beam(pos_scores_buf)

        extra = {}
        if use_lineage:
            # logical beam k's history = parent's history; the KV row the
            # next model call writes at slot P+step belongs to beam k itself
            lineage = jnp.take_along_axis(lineage_buf, new_beam_idx[..., None],
                                          axis=1)
            own = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32)[None, :, None],
                                   (B, K, 1))
            lineage = jax.lax.dynamic_update_slice(lineage, own, (0, 0, P + step))
            extra["beam_lineage"] = lineage
        else:
            cache = _gather_beams(cache, new_beam_idx, B, K)
            lineage = lineage_buf

        pos = (prompt_len_k + step)[:, None]
        new_scores, new_cache = _members_apply(
            model, param_list, cache, _flatten_beam(new_token)[:, None],
            average=average, encoder_out=dummy_encoder,
            encoder_mask=encoder_mask_k, positions=pos,
            tgt_mask=jnp.ones((B * K, 1), bool), self_kv_mask=pad_valid_k,
            **extra)
        new_sel = select_candidates(new_scores.astype(jnp.float32), step + 1)
        return (step + 1, new_cache, new_sel, tokens_buf,
                pos_scores_buf, new_live_scores, fin_scores, fin_tokens,
                fin_pos_scores, fin_lengths, lineage)

    # lineage starts as identity: prompt rows are identical across beams
    lineage0 = (jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32)[None, :, None],
                                 (B, K, P + max_new))
                if use_lineage else jnp.zeros((1, 1, 1), jnp.int32))
    init = (
        jnp.zeros((), jnp.int32), cache, sel0,
        jnp.full((B * K, max_new), pad_idx, jnp.int32),
        jnp.zeros((B * K, max_new), jnp.float32),
        live_scores0,
        jnp.full((B, K), V_neg),                      # finalized scores (normalized)
        jnp.full((B, K, max_new), pad_idx, jnp.int32),
        jnp.zeros((B, K, max_new), jnp.float32),
        jnp.zeros((B, K), jnp.int32),
        lineage0,
    )
    (step, cache, _, tokens_buf, pos_scores_buf, live_scores,
     fin_scores, fin_tokens, fin_pos_scores, fin_lengths,
     _) = jax.lax.while_loop(cond, body, init)

    # if some rows never produced EOS, fall back to the best live beams
    no_final = fin_scores <= V_neg / 2
    live_norm = norm(live_scores, jnp.full_like(live_scores, max_new))
    fin_scores = jnp.where(no_final, live_norm, fin_scores)
    live_tokens = _unflatten_beam(tokens_buf, B, K)
    live_pos = _unflatten_beam(pos_scores_buf, B, K)
    fin_tokens = jnp.where(no_final[..., None], live_tokens, fin_tokens)
    fin_pos_scores = jnp.where(no_final[..., None], live_pos, fin_pos_scores)
    fin_lengths = jnp.where(no_final, max_new, fin_lengths)

    order = jnp.argsort(-fin_scores, axis=1)
    fin_scores = jnp.take_along_axis(fin_scores, order, axis=1)
    fin_tokens = jnp.take_along_axis(fin_tokens, order[..., None], axis=1)
    fin_pos_scores = jnp.take_along_axis(fin_pos_scores, order[..., None], axis=1)
    fin_lengths = jnp.take_along_axis(fin_lengths, order, axis=1)
    return {"tokens": fin_tokens, "scores": fin_scores,
            "positional_scores": fin_pos_scores, "lengths": fin_lengths}


# ---------------------------------------------------------------------------
# speculative greedy decoding (prompt-lookup drafts)
# ---------------------------------------------------------------------------

def _lookup_draft(lookup, lookup_valid, last, prev, K):
    """Draft K tokens by n-gram matching against `lookup` (B, Ls).

    Finds the most recent position j with lookup[j] == last (preferring
    bigram matches where lookup[j-1] == prev) and proposes the K tokens that
    followed it. Samples without a match draft `last` repeated — a bad draft
    only wastes verification compute, never changes the output.
    """
    B, Ls = lookup.shape
    match = (lookup == last[:, None]) & lookup_valid
    prev_ok = jnp.concatenate(
        [jnp.ones((B, 1), bool), lookup[:, :-1] == prev[:, None]], axis=1)
    bigram = match & prev_ok
    use = jnp.where(bigram.any(axis=1, keepdims=True), bigram, match)
    j = Ls - 1 - jnp.argmax(use[:, ::-1], axis=1)            # last True
    has = use.any(axis=1)
    idx = j[:, None] + 1 + jnp.arange(K)[None]               # (B, K)
    ok = has[:, None] & (idx < Ls)
    idx_c = jnp.clip(idx, 0, Ls - 1)
    draft = jnp.take_along_axis(lookup, idx_c, axis=1)
    ok &= jnp.take_along_axis(lookup_valid, idx_c, axis=1)
    return jnp.where(ok, draft, last[:, None]).astype(jnp.int32)


def _rewind_cache(cache, new_index):
    """Reset the scalar write index (and relative-bias step) of every layer
    cache after a partially-accepted speculative chunk; stale K/V beyond the
    index are masked out by the cache validity check and overwritten by the
    next chunk."""
    def fix(path, x):
        name = jax.tree_util.keystr(path)
        if "cache_index" in name or "bias_step" in name:
            return jnp.asarray(new_index, x.dtype)
        return x
    return jax.tree_util.tree_map_with_path(fix, cache)


def speculative_greedy_decode(
    model, params, prompt, prompt_mask, *,
    max_new: int, eos_idx: int, pad_idx: int,
    encoder_out=None, encoder_mask=None,
    lookup=None, lookup_mask=None, draft_len: int = 6,
):
    """Greedy decoding with prompt-lookup speculation — EXACT greedy output.

    A capability the reference lacks: each loop iteration verifies a chunk of
    ``draft_len`` drafted tokens (n-gram continuation from the source /
    prompt / generated prefix) in ONE batched decoder forward and accepts the
    longest batch-common correct prefix plus one bonus token, so copy-heavy
    output (translation, summarization, code) advances several tokens per
    model call. Rejected positions rewind the KV-cache write index; accepted
    tokens are bit-identical to plain greedy decoding.

    prompt: (B, P) LEFT-padded. lookup: optional (B, Ls) token source for
    drafting (defaults to the prompt). The model must be built with
    ``self_cache_len >= P + max_new + draft_len + 1``.
    """
    B, P = prompt.shape
    K = draft_len
    W = max_new + K + 1
    prompt_len = prompt_mask.sum(axis=1).astype(jnp.int32)
    pad_valid = jnp.concatenate([prompt_mask, jnp.ones((B, W), bool)], axis=1)

    if lookup is None:
        lookup, lookup_mask = prompt, prompt_mask
    if lookup_mask is None:
        lookup_mask = jnp.ones(lookup.shape, bool)

    positions0 = (jnp.arange(P)[None, :]
                  - (P - prompt_len)[:, None]).astype(jnp.int32)
    fuse_head = _use_fused_head(model)
    prompt_kwargs = dict(encoder_out=encoder_out, encoder_mask=encoder_mask,
                         positions=positions0,
                         tgt_mask=jnp.ones((B, P), bool),
                         self_kv_mask=pad_valid)
    if fuse_head:
        (tokp, lpp), mutated = model.apply(
            {"params": params}, prompt, method=type(model).decode_step,
            mutable=["cache"], head="argmax", **prompt_kwargs)
        cache = mutated["cache"]
        t0, lp0 = tokp[:, -1].astype(jnp.int32), lpp[:, -1]
    else:
        last_logits, caches = _members_apply(
            model,
            [params] if not isinstance(params, (list, tuple)) else list(params),
            None, prompt, average=False, **prompt_kwargs)
        cache = caches[0]
        t0 = jnp.argmax(last_logits, axis=-1).astype(jnp.int32)
        lp0 = jnp.take_along_axis(jax.nn.log_softmax(last_logits, -1),
                                  t0[:, None], axis=1)[:, 0]

    dummy_encoder = (jnp.zeros((B, 1, encoder_out.shape[-1]), encoder_out.dtype)
                     if encoder_out is not None else None)

    tokens_buf0 = jnp.full((B, W), pad_idx, jnp.int32).at[:, 0].set(t0)
    scores_buf0 = jnp.zeros((B, W), jnp.float32).at[:, 0].set(lp0)
    finished0 = t0 == eos_idx
    prev0 = jnp.where(prompt_len > 0,
                      prompt[jnp.arange(B), -1], pad_idx).astype(jnp.int32)

    def cond(carry):
        step, *_, finished, _ncalls = carry
        return (step < max_new) & ~jnp.all(finished)

    def body(carry):
        (step, cache, tokens_buf, scores_buf, last, prev, finished,
         ncalls) = carry
        gen_valid = jnp.broadcast_to(jnp.arange(W)[None, :] < step, (B, W))
        full_lookup = jnp.concatenate([lookup, tokens_buf], axis=1)
        full_valid = jnp.concatenate([lookup_mask, gen_valid], axis=1)
        draft = _lookup_draft(full_lookup, full_valid, last, prev, K)

        chunk = jnp.concatenate([last[:, None], draft], axis=1)   # (B, K+1)
        positions = (prompt_len[:, None] + step - 1
                     + jnp.arange(K + 1)[None]).astype(jnp.int32)
        step_kwargs = dict(
            method=type(model).decode_step, mutable=["cache"],
            encoder_out=dummy_encoder, encoder_mask=encoder_mask,
            positions=positions, tgt_mask=jnp.ones((B, K + 1), bool),
            self_kv_mask=pad_valid)
        if fuse_head:
            # every emitted token IS the greedy token (accepted drafts match
            # greedy by construction; the bonus is greedy at a_min), so the
            # fused head's (argmax, logprob) pair is all verification needs
            (greedy, greedy_lp), mutated = model.apply(
                {"params": params, "cache": cache}, chunk, head="argmax",
                **step_kwargs)
            greedy = greedy.astype(jnp.int32)                     # (B, K+1)
        else:
            logits, mutated = model.apply(
                {"params": params, "cache": cache}, chunk, **step_kwargs)
            logits = logits.astype(jnp.float32)                   # (B, K+1, V)
            greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            greedy_lp = jnp.take_along_axis(
                jax.nn.log_softmax(logits, axis=-1),
                greedy[..., None], axis=-1)[..., 0]

        hit = jnp.cumprod(
            (draft == greedy[:, :K]).astype(jnp.int32), axis=1)
        a = hit.sum(axis=1)                                       # (B,)
        a = jnp.where(finished, K, a)
        a_min = jnp.min(a)                                        # batch-sync

        # emitted = accepted drafts [0, a_min) + one bonus token at a_min
        # (greedy continuation of the accepted prefix — correct for every
        # sample because all accepted >= a_min drafts agree with greedy)
        cols = jnp.arange(K + 1)[None]
        draft_p = jnp.pad(draft, ((0, 0), (0, 1)))               # (B, K+1)
        bonus_col = jnp.take_along_axis(
            greedy, jnp.broadcast_to(a_min[None, None], (B, 1)), axis=1)
        emitted = jnp.where(cols < a_min, draft_p, bonus_col)
        emitted = jnp.where(cols <= a_min, emitted, pad_idx)
        emitted = jnp.where(finished[:, None], pad_idx, emitted).astype(jnp.int32)

        # emitted == greedy at every col <= a_min, so its logprob is the
        # greedy token's logprob at that position
        emit_lp = jnp.where((cols <= a_min) & ~finished[:, None],
                            greedy_lp, 0.0)

        tokens_buf = jax.lax.dynamic_update_slice(
            tokens_buf, emitted, (0, step))
        scores_buf = jax.lax.dynamic_update_slice(
            scores_buf, emit_lp, (0, step))

        new_finished = finished | (emitted == eos_idx).any(axis=1)
        bonus = emitted[:, a_min]
        new_prev = jnp.where(a_min > 0, emitted[:, a_min - 1], last)
        cache = _rewind_cache(mutated["cache"], P + step + a_min)
        return (step + a_min + 1, cache, tokens_buf, scores_buf,
                bonus.astype(jnp.int32), new_prev.astype(jnp.int32),
                new_finished, ncalls + 1)

    init = (jnp.ones((), jnp.int32), cache, tokens_buf0, scores_buf0,
            t0, prev0, finished0, jnp.ones((), jnp.int32))
    (step, cache, tokens_buf, scores_buf, _, _, finished,
     ncalls) = jax.lax.while_loop(cond, body, init)

    tokens_buf = tokens_buf[:, :max_new]
    scores_buf = scores_buf[:, :max_new]
    lengths = jnp.argmax(
        jnp.concatenate([tokens_buf == eos_idx,
                         jnp.ones((B, 1), bool)], axis=1), axis=1) + 1
    lengths = jnp.minimum(lengths, max_new)
    valid = jnp.arange(max_new)[None] < lengths[:, None]
    tokens_buf = jnp.where(valid, tokens_buf, pad_idx)
    scores_buf = jnp.where(valid, scores_buf, 0.0)
    return {"tokens": tokens_buf, "scores": scores_buf, "lengths": lengths,
            "model_calls": ncalls}
