"""Jitted KV-cached beam search, batched over ragged prompts.

The reference model carries HF ``generate`` plumbing for beam decoding —
``prepare_inputs_for_generation`` and ``_reorder_cache``
(src/model.py:620-652, 739-745) — but its Manager never invokes it
(SURVEY.md §5 generation row: "beam optional"). This is the TPU-native
equivalent: fixed-size KV cache expanded to batch*beams, one
single-token forward per step inside ``lax.while_loop``, beam
hypotheses reordered by gathering the cache along the beam axis (the
``_reorder_cache`` index_select, done as one static gather).

Ragged prompts use the SAME left-padded layout as infer/generate.py:
every row's last real token sits at physical slot Lp-1, per-row logical
positions ride in explicit position_ids, and pads stay masked out of
attention — so one compiled program serves a whole ragged batch (one
compile per prompt bucket instead of one per distinct length,
VERDICT r1 weak #5).

Scoring follows the standard HF beam semantics: accumulated token
log-probabilities; finished beams are frozen by forcing eos at zero
added score; final ranking by score / length**length_penalty.
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ergm_tpu.core.config import ModelConfig
from ergm_tpu.models import gpt2

_NEG = -1e9


class BeamState(NamedTuple):
    tokens: jnp.ndarray    # [B, W, T]
    scores: jnp.ndarray    # [B, W] summed logprobs
    cache: gpt2.KVCache    # batch dim = B*W
    mask: jnp.ndarray      # [B*W, T] attention mask over the buffer
    cur: jnp.ndarray       # [] physical slot
    last: jnp.ndarray      # [B, W]
    finished: jnp.ndarray  # [B, W]


class BeamOutput(NamedTuple):
    tokens: jnp.ndarray          # [B, max_len] best hypothesis per row
    lengths: jnp.ndarray         # [B] physical length (first eos at/after Lp, +1)
    emotion_logits: jnp.ndarray  # [B, num_emotions] from the prefill last token


def _gather_beams(x, beam_idx, B, W):
    """x [L?, B*W, ...] cache array -> gathered along the beam axis."""
    shape = x.shape
    xr = x.reshape(shape[0], B, W, *shape[2:])
    out = jnp.take_along_axis(
        xr, beam_idx.reshape(1, B, W, *([1] * (len(shape) - 2))), axis=2)
    return out.reshape(shape)


def beam_search(
    params,
    config: ModelConfig,
    input_ids: jnp.ndarray,  # [B, Lp]; left-padded when prompt_mask given
    input_len: Optional[int] = None,  # uniform true prompt length (static)
    *,
    num_beams: int,
    max_len: int,
    eos_id: int,
    sp2_id: int,
    length_penalty: float = 1.0,
    token_type_ids: Optional[jnp.ndarray] = None,
    prompt_mask: Optional[jnp.ndarray] = None,  # [B, Lp] 1=real (left-pad mode)
    imgs: Optional[jnp.ndarray] = None,
    auds: Optional[jnp.ndarray] = None,
    caption_ids: Optional[jnp.ndarray] = None,
    caption_mask: Optional[jnp.ndarray] = None,  # [B, Lc] 1=real caption token
    logical_cap: Optional[int] = None,
) -> BeamOutput:
    """Uniform mode: pass ``input_len``. Batched ragged mode: pass a
    left-aligned-pad ``prompt_mask`` (mirrors generate()'s layout).

    ``max_len`` sizes the physical buffer; ``logical_cap`` (default
    max_len) bounds each row's LOGICAL sequence length — a short-prompt
    row may grow more physical slots than a long-prompt one."""
    if (input_len is None) == (prompt_mask is None):
        raise ValueError("pass exactly one of input_len / prompt_mask")
    if logical_cap is None:
        logical_cap = max_len

    if input_len is not None:
        input_ids = input_ids[:, :input_len]
        if token_type_ids is not None:
            token_type_ids = token_type_ids[:, :input_len]
        prompt_mask = jnp.ones(input_ids.shape, jnp.float32)
    B, Lp = input_ids.shape
    W = num_beams
    prompt_mask = prompt_mask.astype(jnp.float32)
    caption_len = caption_ids.shape[1] if caption_ids is not None else 0

    # buffer-wide attention mask + logical positions (generate()'s layout)
    mask = jnp.zeros((B, max_len), jnp.float32)
    mask = lax.dynamic_update_slice(mask, prompt_mask, (0, 0))
    prompt_pos = jnp.maximum(jnp.cumsum(prompt_mask, axis=-1) - 1, 0).astype(jnp.int32)
    row_len = jnp.sum(prompt_mask, axis=-1).astype(jnp.int32)  # [B]

    cache = gpt2.init_kv_cache(config, B, max_len, caption_len=caption_len)
    out = gpt2.forward(params, config, input_ids, token_type_ids=token_type_ids,
                       position_ids=prompt_pos, attention_mask=mask,
                       imgs=imgs, auds=auds, caption_ids=caption_ids,
                       encoder_attention_mask=caption_mask, cache=cache,
                       prefix_prefill=True, compute_logits="last")
    emotion_logits = out.emotion_logits
    logp0 = jax.nn.log_softmax(out.logits[:, -1].astype(jnp.float32), axis=-1)  # [B, V]
    V = logp0.shape[-1]

    # expand the cache across beams: [L, B, ...] -> [L, B*W, ...].
    # Every array field must ride along (incl. the int8 quantization
    # scales), so map over the whole NamedTuple rather than naming fields.
    def expand(x):
        if x is None:
            return None
        return jnp.repeat(x, W, axis=1)

    cache = gpt2.KVCache(index=out.cache.index, **{
        f: expand(getattr(out.cache, f))
        for f in gpt2.KVCache._fields if f != "index"})

    # beam-expanded row data for the per-step forwards
    mask_bw = jnp.repeat(mask, W, axis=0)          # [B*W, T]
    row_len_bw = jnp.repeat(row_len, W, axis=0)    # [B*W]
    beam_cap_mask = (None if caption_mask is None
                     else jnp.repeat(caption_mask, W, axis=0))

    # first expansion: top-W tokens of beam 0; rows already at their
    # logical cap are forced to eos immediately
    top_scores, top_tok = lax.top_k(logp0, W)  # [B, W]
    full0 = (row_len >= logical_cap)[:, None]
    top_tok = jnp.where(full0, eos_id, top_tok)

    tokens = jnp.full((B, W, max_len), eos_id, jnp.int32)
    tokens = tokens.at[:, :, :Lp].set(input_ids[:, None, :])
    tokens = tokens.at[:, :, Lp].set(top_tok) if Lp < max_len else tokens
    mask_bw = mask_bw.at[:, Lp].set(1.0) if Lp < max_len else mask_bw
    finished = (top_tok == eos_id) | full0
    state = BeamState(tokens=tokens, scores=top_scores, cache=cache,
                      mask=mask_bw, cur=jnp.asarray(min(Lp + 1, max_len), jnp.int32),
                      last=top_tok, finished=finished)

    eos_onehot = jax.nn.one_hot(eos_id, V, dtype=jnp.float32)

    def cond(s: BeamState):
        return jnp.logical_and(s.cur < max_len, ~jnp.all(s.finished))

    def body(s: BeamState):
        step_ids = s.last.reshape(B * W, 1)
        step_tt = jnp.full((B * W, 1), sp2_id, jnp.int32)
        # s.last sits at physical slot cur-1 -> logical row_len + (cur-1-Lp)
        step_pos = (row_len_bw + (s.cur - 1 - Lp))[:, None]
        step_pos = jnp.minimum(step_pos, config.n_positions - 1)
        o = gpt2.forward(params, config, step_ids, token_type_ids=step_tt,
                         position_ids=step_pos, attention_mask=s.mask,
                         encoder_attention_mask=beam_cap_mask, cache=s.cache)
        logp = jax.nn.log_softmax(o.logits[:, -1].astype(jnp.float32), axis=-1)
        logp = logp.reshape(B, W, V)
        # rows at their logical cap may only emit eos from here on
        at_cap = (row_len + (s.cur - Lp)) >= logical_cap  # [B]
        freeze = s.finished | at_cap[:, None]
        # finished/capped beams may only emit eos, at no additional cost
        logp = jnp.where(freeze[:, :, None],
                         jnp.where(eos_onehot[None, None, :] > 0, 0.0, _NEG),
                         logp)
        cand = s.scores[:, :, None] + logp  # [B, W, V]
        flat_scores, flat_idx = lax.top_k(cand.reshape(B, W * V), W)
        beam_idx = flat_idx // V  # [B, W]
        tok = flat_idx % V

        tokens = jnp.take_along_axis(s.tokens, beam_idx[:, :, None], axis=1)
        tokens = tokens.at[:, :, s.cur].set(tok)
        finished = jnp.take_along_axis(s.finished, beam_idx, axis=1) | (tok == eos_id)

        new_cache = gpt2.KVCache(index=o.cache.index, **{
            f: (None if getattr(o.cache, f) is None
                else _gather_beams(getattr(o.cache, f), beam_idx, B, W))
            for f in gpt2.KVCache._fields if f != "index"})
        mask = s.mask.at[:, s.cur].set(1.0)
        return BeamState(tokens=tokens, scores=flat_scores, cache=new_cache,
                         mask=mask, cur=s.cur + 1, last=tok, finished=finished)

    state = lax.while_loop(cond, body, state)

    # per-beam generated length: first eos at/after slot Lp (inclusive)
    pos = jnp.arange(max_len)[None, None, :]
    is_stop = (state.tokens == eos_id) & (pos >= Lp)
    any_stop = jnp.any(is_stop, axis=-1)
    first_stop = jnp.argmax(is_stop, axis=-1)
    lengths = jnp.where(any_stop, first_stop + 1, max_len)  # [B, W]

    gen_len = jnp.maximum((lengths - Lp).astype(jnp.float32), 1.0)
    final = state.scores / gen_len ** length_penalty
    best = jnp.argmax(final, axis=-1)  # [B]
    best_tokens = jnp.take_along_axis(state.tokens, best[:, None, None], axis=1)[:, 0]
    best_lengths = jnp.take_along_axis(lengths, best[:, None], axis=1)[:, 0]
    return BeamOutput(tokens=best_tokens, lengths=best_lengths,
                      emotion_logits=emotion_logits)


@functools.lru_cache(maxsize=None)
def _jitted_beam_search(config, num_beams, max_len, logical_cap, eos_id,
                        sp2_id, length_penalty):
    """jit-wrapped ``beam_search`` for the host batch entry point (an
    eager call executes the prefill op-by-op — ~seconds of host round
    trips through tunneled transports; see generate._jitted_generate)."""
    def fn(params, ids, mask, tts, imgs, auds, cap_ids, cap_mask):
        return beam_search(
            params, config, ids, prompt_mask=mask, num_beams=num_beams,
            max_len=max_len, logical_cap=logical_cap, eos_id=eos_id,
            sp2_id=sp2_id, length_penalty=length_penalty,
            token_type_ids=tts, imgs=imgs, auds=auds,
            caption_ids=cap_ids, caption_mask=cap_mask)
    return jax.jit(fn)


def beam_search_batch(
    params,
    config: ModelConfig,
    prompts: Sequence[Sequence[int]],
    *,
    num_beams: int,
    max_len: int,
    eos_id: int,
    sp2_id: int,
    token_types: Optional[Sequence[Sequence[int]]] = None,
    imgs: Optional[np.ndarray] = None,
    auds: Optional[np.ndarray] = None,
    captions: Optional[Sequence[Optional[Sequence[int]]]] = None,
    max_new_tokens: Optional[int] = None,
    length_penalty: float = 1.0,
    prompt_bucket: int = 64,
    caption_bucket: int = 32,
    mesh=None,
) -> Tuple[List[List[int]], np.ndarray]:
    """Host-level batched beam decode over ragged prompts (the beam
    counterpart of generate_batch): left-pads to a bucketed width, runs
    ONE jitted beam_search for the whole batch, returns per-sample
    continuation ids (eos included when emitted) + emotion logits.
    ``mesh``: SPMD decode (see generate_batch) — batch padded to the
    data-axis multiple, inputs batch-sharded, extra rows dropped."""
    from ergm_tpu.infer.generate import _mesh_batch_placement, pack_ragged_batch

    ids, mask, tts, cap_ids, cap_mask, buffer_len = pack_ragged_batch(
        prompts, eos_id=eos_id, sp2_id=sp2_id, n_positions=config.n_positions,
        max_len=max_len, token_types=token_types, captions=captions,
        prompt_bucket=prompt_bucket, caption_bucket=caption_bucket,
        max_new_tokens=max_new_tokens)
    B, Lp = ids.shape
    cap = min(max_len, config.n_positions)

    dev, ctx, (ids, mask, tts, cap_ids, cap_mask, imgs, auds) = \
        _mesh_batch_placement(mesh, (ids, mask, tts, cap_ids, cap_mask,
                                     imgs, auds))
    bs = _jitted_beam_search(config, num_beams, buffer_len, cap, eos_id,
                             sp2_id, length_penalty)
    with ctx:
        out = bs(params, dev(ids), dev(mask),
                 dev(tts) if token_types is not None else None,
                 dev(imgs), dev(auds), dev(cap_ids), dev(cap_mask))
        tokens = np.asarray(out.tokens)
        lengths = np.asarray(out.lengths)
        emo = np.asarray(out.emotion_logits)
    results: List[List[int]] = []
    for b in range(B):  # B excludes mesh fill rows
        results.append(tokens[b, Lp:lengths[b]].tolist())
    return results, emo[:B]
