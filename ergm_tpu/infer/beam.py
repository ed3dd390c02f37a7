"""Jitted KV-cached beam search.

The reference model carries HF ``generate`` plumbing for beam decoding —
``prepare_inputs_for_generation`` and ``_reorder_cache``
(src/model.py:620-652, 739-745) — but its Manager never invokes it
(SURVEY.md §5 generation row: "beam optional"). This is the TPU-native
equivalent: fixed-size KV cache expanded to batch*beams, one
single-token forward per step inside ``lax.while_loop``, beam
hypotheses reordered by gathering the cache along the beam axis (the
``_reorder_cache`` index_select, done as one static gather).

Scoring follows the standard HF beam semantics: accumulated token
log-probabilities; finished beams are frozen by forcing eos at zero
added score; final ranking by score / length**length_penalty.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ergm_tpu.core.config import ModelConfig
from ergm_tpu.models import gpt2

_NEG = -1e9


class BeamState(NamedTuple):
    tokens: jnp.ndarray    # [B, W, T]
    scores: jnp.ndarray    # [B, W] summed logprobs
    cache: gpt2.KVCache    # batch dim = B*W
    cur: jnp.ndarray       # [] physical slot
    last: jnp.ndarray      # [B, W]
    finished: jnp.ndarray  # [B, W]


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
    input_ids: jnp.ndarray,  # [B, Lp], uniform true length = input_len
    input_len: int,
    *,
    num_beams: int,
    max_len: int,
    eos_id: int,
    sp2_id: int,
    length_penalty: float = 1.0,
    token_type_ids: Optional[jnp.ndarray] = None,
    imgs: Optional[jnp.ndarray] = None,
    auds: Optional[jnp.ndarray] = None,
    caption_ids: Optional[jnp.ndarray] = None,
):
    """Returns (best_tokens [B, max_len], best_lengths [B])."""
    B = input_ids.shape[0]
    W = num_beams
    prompt = input_ids[:, :input_len]
    tt = token_type_ids[:, :input_len] if token_type_ids is not None else None
    caption_len = caption_ids.shape[1] if caption_ids is not None else 0

    cache = gpt2.init_kv_cache(config, B, max_len, caption_len=caption_len)
    out = gpt2.forward(params, config, prompt, token_type_ids=tt,
                       imgs=imgs, auds=auds, caption_ids=caption_ids, cache=cache)
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

    # first expansion: top-W tokens of beam 0
    top_scores, top_tok = lax.top_k(logp0, W)  # [B, W]

    tokens = jnp.full((B, W, max_len), eos_id, jnp.int32)
    tokens = tokens.at[:, :, :input_len].set(prompt[:, None, :])
    tokens = tokens.at[:, :, input_len].set(top_tok)
    finished = top_tok == eos_id
    state = BeamState(tokens=tokens, scores=top_scores, cache=cache,
                      cur=jnp.asarray(input_len + 1, jnp.int32),
                      last=top_tok, finished=finished)

    eos_onehot = jax.nn.one_hot(eos_id, V, dtype=jnp.float32)

    def cond(s: BeamState):
        return jnp.logical_and(s.cur < max_len, ~jnp.all(s.finished))

    def body(s: BeamState):
        step_ids = s.last.reshape(B * W, 1)
        step_tt = jnp.full((B * W, 1), sp2_id, jnp.int32)
        o = gpt2.forward(params, config, step_ids, token_type_ids=step_tt,
                         cache=s.cache)
        logp = jax.nn.log_softmax(o.logits[:, -1].astype(jnp.float32), axis=-1)
        logp = logp.reshape(B, W, V)
        # finished beams may only emit eos, at no additional cost
        logp = jnp.where(s.finished[:, :, None],
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
        return BeamState(tokens=tokens, scores=flat_scores, cache=new_cache,
                         cur=s.cur + 1, last=tok, finished=finished)

    state = lax.while_loop(cond, body, state)

    # per-beam generated length: first eos at/after input_len (inclusive)
    pos = jnp.arange(max_len)[None, None, :]
    is_stop = (state.tokens == eos_id) & (pos >= input_len)
    any_stop = jnp.any(is_stop, axis=-1)
    first_stop = jnp.argmax(is_stop, axis=-1)
    lengths = jnp.where(any_stop, first_stop + 1, max_len)  # [B, W]

    gen_len = jnp.maximum((lengths - input_len).astype(jnp.float32), 1.0)
    final = state.scores / gen_len ** length_penalty
    best = jnp.argmax(final, axis=-1)  # [B]
    best_tokens = jnp.take_along_axis(state.tokens, best[:, None, None], axis=1)[:, 0]
    best_lengths = jnp.take_along_axis(lengths, best[:, None], axis=1)[:, 0]
    return best_tokens, best_lengths
