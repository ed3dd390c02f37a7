"""Self-speculative decoding for B=1 serving latency.

Single-request decode on TPU is per-op-LATENCY bound (~12 us/op x ~70
ops/token — README B=1 breakdown), not bandwidth bound, so the only
lever left is emitting MORE THAN ONE token per sequential step chain.
Speculative decoding (Leviathan et al. 2023) does exactly that:

- a cheap DRAFT model proposes ``gamma`` tokens autoregressively,
- the TARGET model scores all gamma+1 positions in ONE forward (for a
  latency-bound step this costs barely more than a single-token step:
  the op count is identical, only the tiny matmuls widen),
- a rejection test accepts a prefix of the proposals and emits one
  corrected/bonus token, so each macro-step yields 1..gamma+1 tokens
  from the EXACT target distribution (greedy mode: byte-identical to
  plain greedy decode; sampling mode: the standard rejection-sampling
  identity over the nucleus-filtered distributions).

Two draft sources (``mode``):

- ``"draft"`` — SELF-speculative: the first ``draft_layers`` blocks of
  the same model (the scan-stacked param pytree slices for free —
  ``draft_params``), sharing wte/wpe/ln_f — no second model to train,
  load, or keep resident (cf. LayerSkip/Draft&Verify-style early exit).
- ``"ngram"`` — PROMPT-LOOKUP decoding (a.k.a. n-gram drafting): the
  proposals are the ``gamma`` tokens that followed the most recent
  earlier occurrence of the last ``ngram_n`` emitted tokens in the
  prompt+generation buffer. NO draft forwards at all — the macro step
  is one verify forward plus a tiny vector match — so break-even
  acceptance is ~0 and every accepted token is pure win. Dialogue
  continuations repeat their context often (names, entities, phrases),
  which is exactly when lookups hit. Proposals enter the SAME exact
  rejection test (as a delta distribution: accept token x with prob
  p(x), residual = p with x removed, renormalized), so the output
  distribution is byte-identical greedy / exact-sampling regardless of
  match quality.

KV-cache bookkeeping: both caches are fixed buffers with a scalar
``index``. A verify step writes gamma+1 entries; on rejection the new
index is simply rolled back to ``old + accepted + 1``. Stale entries
above the rolled-back index are invisible (the unwritten-tail mask in
models/gpt2.py masks keys >= index + L) and are overwritten by the next
step's write window before they could become visible. Restricted to
B=1: acceptance length is per-row, and the cache index is per-cache —
larger batches fall back to ``generate`` (where batching already
amortizes the latency floor anyway).

Reference anchor: this serves the reference's interactive use case
(infer.sh batch=1, src/main.py:253-282) — same sampling semantics,
multiple tokens per sequential dependency chain.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ergm_tpu.core.config import ModelConfig
from ergm_tpu.infer.generate import GenerateOutput, top_p_filter
from ergm_tpu.models import gpt2


def draft_params(params, config: ModelConfig, draft_layers: int):
    """(draft_params, draft_config): the first ``draft_layers`` blocks of
    the scan-stacked param pytree (leading block-stack dim sliced — a
    view, no copy under jit), sharing embeddings/ln_f/heads."""
    if not 0 < draft_layers < config.n_layer:
        raise ValueError(f"draft_layers must be in (0, {config.n_layer})")
    dp = dict(params)
    dp["blocks"] = jax.tree_util.tree_map(lambda x: x[:draft_layers],
                                          params["blocks"])
    return dp, config.replace(n_layer=draft_layers)


class _SpecState(NamedTuple):
    tokens: jnp.ndarray      # [1, T] physical buffer
    mask: jnp.ndarray        # [1, T] 1 on real slots (left-pad mode); [1,1] dummy otherwise
    t_cache: gpt2.KVCache
    d_cache: gpt2.KVCache
    cur: jnp.ndarray         # [] int32: next write slot (pending at cur-1)
    pending: jnp.ndarray     # [1, 1] last emitted, not yet fed to target
    done: jnp.ndarray        # [] bool
    rng: jax.Array
    accepted: jnp.ndarray    # [] int32 total accepted draft tokens (stats)
    steps: jnp.ndarray       # [] int32 macro steps (stats)


def _filtered(logits: jnp.ndarray, top_p: float) -> jnp.ndarray:
    """Nucleus-filtered probabilities [B, V] (reference top-p math)."""
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return top_p_filter(probs, top_p)


def speculative_generate(
    params,
    config: ModelConfig,
    input_ids: jnp.ndarray,   # [1, Lp] prompt (left-padded if mask given)
    input_len: Optional[int] = None,
    *,
    max_len: int,             # logical cap incl. prompt (ref max_len)
    eos_id: int,
    sp2_id: int,
    draft_layers: int = 3,
    gamma: int = 4,
    mode: str = "draft",
    ngram_n: int = 3,
    top_p: float = 0.95,
    greedy: bool = False,
    rng: Optional[jax.Array] = None,
    token_type_ids: Optional[jnp.ndarray] = None,
    prompt_mask: Optional[jnp.ndarray] = None,  # [1, Lp] 1=real (left-pad)
    max_new_tokens: Optional[int] = None,
    imgs: Optional[jnp.ndarray] = None,
    auds: Optional[jnp.ndarray] = None,
    caption_ids: Optional[jnp.ndarray] = None,
    caption_mask: Optional[jnp.ndarray] = None,
) -> GenerateOutput:
    """Speculative counterpart of ``generate``.

    Pass exactly one of ``input_len`` (uniform prompt length, the lean
    serving path — no mask ops in the latency-bound step) or
    ``prompt_mask`` (left-padded bucketed prompts, one compiled program
    per bucket; requires static ``max_new_tokens``).

    Greedy mode emits the BYTE-IDENTICAL sequence plain greedy decode
    would (tested); sampling mode draws from the same nucleus-filtered
    target distribution via exact rejection sampling. Returns the same
    GenerateOutput contract; use ``speculative_stats`` for acceptance
    numbers when benchmarking.
    """
    out, state = _speculative_run(
        params, config, input_ids, input_len, max_len=max_len, eos_id=eos_id,
        sp2_id=sp2_id, draft_layers=draft_layers, gamma=gamma, mode=mode,
        ngram_n=ngram_n, top_p=top_p,
        greedy=greedy, rng=rng, token_type_ids=token_type_ids,
        prompt_mask=prompt_mask, max_new_tokens=max_new_tokens, imgs=imgs,
        auds=auds, caption_ids=caption_ids, caption_mask=caption_mask)
    return out


def speculative_stats(*args, **kwargs):
    """Like speculative_generate but also returns (accepted, macro_steps,
    proposed) device scalars for acceptance-rate measurement."""
    out, state = _speculative_run(*args, **kwargs)
    return out, (state.accepted, state.steps, state.steps * kwargs.get("gamma", 4))


def _speculative_run(
    params, config, input_ids, input_len=None, *, max_len, eos_id, sp2_id,
    draft_layers=3, gamma=4, mode="draft", ngram_n=3, top_p=0.95,
    greedy=False, rng=None,
    token_type_ids=None, prompt_mask=None, max_new_tokens=None, imgs=None,
    auds=None, caption_ids=None, caption_mask=None,
):
    if mode not in ("draft", "ngram"):
        raise ValueError(f"mode must be 'draft' or 'ngram', got {mode!r}")
    ngram = mode == "ngram"
    if ngram and not 0 < ngram_n <= 8:
        raise ValueError(f"ngram_n must be in [1, 8], got {ngram_n}")
    if rng is None:
        rng = jax.random.PRNGKey(0)
    B = input_ids.shape[0]
    if B != 1:
        raise ValueError("speculative decode is a B=1 serving path; "
                         "batched serving uses generate()")
    if (input_len is None) == (prompt_mask is None):
        raise ValueError("pass exactly one of input_len / prompt_mask")
    masked = prompt_mask is not None
    if masked and max_new_tokens is None:
        raise ValueError("prompt_mask mode needs a static max_new_tokens "
                         "(the buffer cannot size itself off a traced "
                         "prompt length)")
    c = config
    dparams, dcfg = (None, None) if ngram \
        else draft_params(params, c, draft_layers)
    cap = min(max_len, c.n_positions)

    if masked:
        Lp = input_ids.shape[1]
        pm = prompt_mask.astype(jnp.float32)
        row_len = jnp.sum(pm, axis=-1).astype(jnp.int32)[0]  # [] logical len
        max_new = int(max_new_tokens)
    else:
        input_ids = input_ids[:, :input_len]
        if token_type_ids is not None:
            token_type_ids = token_type_ids[:, :input_len]
        Lp = input_len
        row_len = jnp.asarray(Lp, jnp.int32)
        max_new = int(max_new_tokens) if max_new_tokens is not None \
            else max(cap - Lp, 1)
    # physical buffer: prompt + generable + one macro-step of slack so the
    # fixed-width gamma+1 write windows never clamp at the end
    T = Lp + max_new + gamma + 1

    caption_len = caption_ids.shape[1] if caption_ids is not None else 0
    t_cache = gpt2.init_kv_cache(c, B, T, caption_len=caption_len)
    d_cache = None if ngram \
        else gpt2.init_kv_cache(dcfg, B, T, caption_len=caption_len)

    if masked:
        mask0 = jnp.zeros((B, T), jnp.float32)
        mask0 = lax.dynamic_update_slice(mask0, pm, (0, 0))
        prompt_pos = jnp.maximum(jnp.cumsum(pm, axis=-1) - 1, 0).astype(jnp.int32)
        pre = dict(position_ids=prompt_pos, attention_mask=mask0)
    else:
        mask0 = jnp.zeros((B, 1), jnp.float32)  # unused placeholder
        pre = {}

    common = dict(token_type_ids=token_type_ids, imgs=imgs, auds=auds,
                  caption_ids=caption_ids, encoder_attention_mask=caption_mask)
    t_out = gpt2.forward(params, c, input_ids, cache=t_cache,
                         prefix_prefill=True, compute_logits="last",
                         **pre, **common)
    d_cache0 = None
    if not ngram:
        d_out = gpt2.forward(dparams, dcfg, input_ids, cache=d_cache,
                             prefix_prefill=True, compute_logits=False,
                             **pre, **common)
        d_cache0 = d_out.cache
    emotion_logits = t_out.emotion_logits

    def sample_from(probs, key):
        return jax.random.categorical(
            key, jnp.log(jnp.maximum(probs, 1e-20)), axis=-1)

    rng, key = jax.random.split(rng)
    if greedy:
        first = jnp.argmax(t_out.logits[:, -1], axis=-1)
    else:
        first = sample_from(_filtered(t_out.logits[:, -1], top_p), key)

    tokens = jnp.full((B, T), eos_id, jnp.int32)
    tokens = lax.dynamic_update_slice(tokens, input_ids.astype(jnp.int32), (0, 0))
    tokens = tokens.at[:, Lp].set(first.astype(jnp.int32))
    if masked:
        mask0 = mask0.at[:, Lp].set(1.0)
    done0 = (first[0] == eos_id) | (row_len + 1 >= cap) | (max_new <= 1)

    state = _SpecState(
        tokens=tokens, mask=mask0, t_cache=t_out.cache, d_cache=d_cache0,
        cur=jnp.asarray(Lp + 1, jnp.int32),
        pending=first[:, None].astype(jnp.int32),
        done=done0, rng=rng,
        accepted=jnp.zeros((), jnp.int32), steps=jnp.zeros((), jnp.int32))

    step_tt = jnp.full((B, 1), sp2_id, jnp.int32)
    ver_tt = jnp.full((B, gamma + 1), sp2_id, jnp.int32)
    step_common = dict(encoder_attention_mask=caption_mask)
    kpos_t = jnp.arange(T)[None, :]

    def cond(s: _SpecState):
        # overshoot into the gamma+1 buffer slack is fine: lengths are
        # clamped to the logical cap afterwards, so the emitted sequence
        # matches plain decode exactly up to the cap
        emitted = s.cur - Lp
        logical = row_len + emitted
        return ~s.done & (emitted < max_new) & (logical < cap)

    def body(s: _SpecState):
        # logical position of the pending token (physical slot cur-1)
        base = row_len + (s.cur - 1 - Lp)
        if masked:
            # in-flight window [cur-1, cur+gamma): visible during this
            # macro step; only accepted slots are persisted into s.mask
            win = ((kpos_t >= s.cur - 1) & (kpos_t < s.cur + gamma)
                   ).astype(jnp.float32)
            step_mask = jnp.maximum(s.mask, win)

            def step_kw(i, width):
                pos = (base + i + jax.lax.broadcasted_iota(
                    jnp.int32, (B, width), 1))
                return dict(position_ids=jnp.minimum(pos, c.n_positions - 1),
                            attention_mask=step_mask)
        else:
            def step_kw(i, width):
                return {}

        rng = s.rng
        if ngram:
            # -- prompt-lookup draft: propose the gamma tokens that
            # followed the most recent earlier occurrence of the last
            # ngram_n emitted tokens. Pure vector math on the [T] buffer
            # — no draft forwards, no draft cache. A miss proposes the
            # eos fill past `cur`, which the verify step simply rejects
            # (exactness never depends on proposal quality).
            dc = None
            tok = s.tokens[0]
            ctx = lax.dynamic_slice(tok, (s.cur - ngram_n,), (ngram_n,))
            nwin = T - ngram_n + 1
            m = jnp.ones((nwin,), bool)
            for k in range(ngram_n):
                m = m & (tok[k:nwin + k] == ctx[k])
            starts = jnp.arange(nwin)
            # continuation must begin strictly before cur (this also
            # excludes the query n-gram itself, whose start is cur-ngram_n)
            m = m & (starts + ngram_n < s.cur)
            has = jnp.any(m)
            j = jnp.argmax(jnp.where(m, starts, -1))
            src = jnp.where(has, j + ngram_n, s.cur)
            d_vec = lax.dynamic_slice(tok, (src,), (gamma,)).astype(jnp.int32)
            drafts = [d_vec[g][None] for g in range(gamma)]
            # the proposal distribution is a delta at each proposed token:
            # accept x with prob p(x); residual = p minus x, renormalized
            qs = (None if greedy
                  else [jax.nn.one_hot(d_vec[g], c.vocab_size,
                                       dtype=jnp.float32)[None]
                        for g in range(gamma)])
        else:
            # -- model draft phase: gamma proposals + one extra cache-fill
            # step so the draft cache holds K/V for every proposal (needed
            # when all gamma are accepted and the next pending is the
            # bonus token)
            dc = s.d_cache
            x = s.pending
            drafts = []
            qs = []
            for g in range(gamma + 1):
                o = gpt2.forward(dparams, dcfg, x, token_type_ids=step_tt,
                                 cache=dc, compute_logits=(g < gamma),
                                 **step_kw(g, 1), **step_common)
                dc = o.cache
                if g == gamma:
                    break  # cache-fill only; no proposal from this step
                if greedy:
                    d = jnp.argmax(o.logits[:, -1], axis=-1)
                    qs.append(None)
                else:
                    q = _filtered(o.logits[:, -1], top_p)  # [1, V]
                    rng, key = jax.random.split(rng)
                    d = sample_from(q, key)
                    qs.append(q)
                drafts.append(d.astype(jnp.int32))
                x = d[:, None].astype(jnp.int32)

        d_vec = jnp.stack([d[0] for d in drafts])  # [gamma]

        # -- verify: one target forward over [pending, d_1..d_gamma]
        ver_in = jnp.concatenate([s.pending] + [d[:, None] for d in drafts],
                                 axis=1)  # [1, gamma+1]
        t_o = gpt2.forward(params, c, ver_in, token_type_ids=ver_tt,
                           cache=s.t_cache, **step_kw(0, gamma + 1),
                           **step_common)
        t_logits = t_o.logits[0]  # [gamma+1, V]; row i -> dist after ver_in[i]

        if greedy:
            t_choice = jnp.argmax(t_logits, axis=-1)  # [gamma+1]
            ok = t_choice[:gamma] == d_vec
            a = jnp.sum(jnp.cumprod(ok.astype(jnp.int32)))  # leading accepts
            correction = t_choice[a]
            rng_out = rng
        else:
            p_all = _filtered(t_logits, top_p)  # [gamma+1, V]
            q_all = jnp.concatenate(qs, axis=0)  # [gamma, V]
            p_d = p_all[jnp.arange(gamma), d_vec]
            q_d = q_all[jnp.arange(gamma), d_vec]
            rng, ukey, ckey = jax.random.split(rng, 3)
            u = jax.random.uniform(ukey, (gamma,))
            ok = u * q_d < p_d  # accept with prob min(1, p/q)
            a = jnp.sum(jnp.cumprod(ok.astype(jnp.int32)))
            # residual distribution at the first rejected position; the
            # all-accepted case samples the bonus token from p_gamma
            resid = jnp.maximum(p_all[jnp.minimum(a, gamma)] -
                                jnp.where(a < gamma, q_all[jnp.minimum(a, gamma - 1)], 0.0),
                                0.0)
            resid_sum = jnp.sum(resid)
            resid = jnp.where(resid_sum > 0, resid / resid_sum,
                              p_all[jnp.minimum(a, gamma)])
            correction = sample_from(resid[None], ckey)[0]
            rng_out = rng

        # -- emit d_1..d_a then the correction token; suppress past eos
        emit = jnp.where(jnp.arange(gamma + 1) < a,
                         jnp.concatenate([d_vec, jnp.zeros((1,), jnp.int32)]),
                         0)
        emit = emit.at[a].set(correction.astype(jnp.int32))
        emit = jnp.where(jnp.arange(gamma + 1) <= a, emit, eos_id)
        # truncate at the first eos among the emitted prefix
        is_eos = (emit == eos_id) & (jnp.arange(gamma + 1) <= a)
        hit_eos = jnp.any(is_eos)
        first_eos = jnp.argmax(is_eos)
        n_emit = jnp.where(hit_eos, first_eos + 1, a + 1)
        emit = jnp.where(jnp.arange(gamma + 1) < n_emit, emit, eos_id)

        tokens = lax.dynamic_update_slice(s.tokens, emit[None], (0, s.cur))
        new_cur = s.cur + n_emit
        done = hit_eos  # caps are re-checked by cond each iteration
        if masked:
            accept_win = ((kpos_t >= s.cur) & (kpos_t < new_cur)
                          ).astype(jnp.float32)
            new_mask = jnp.maximum(s.mask, accept_win)
        else:
            new_mask = s.mask
        # cache rollback: keep entries for [pending, d_1..d_{n_emit-1}]
        t_cache = t_o.cache._replace(index=s.t_cache.index + n_emit)
        d_cache = None if ngram else dc._replace(index=s.d_cache.index + n_emit)
        pending = lax.dynamic_slice(emit, (n_emit - 1,), (1,))[None]

        return _SpecState(tokens=tokens, mask=new_mask, t_cache=t_cache,
                          d_cache=d_cache,
                          cur=new_cur, pending=pending.astype(jnp.int32),
                          done=done, rng=rng_out,
                          accepted=s.accepted + a, steps=s.steps + 1)

    state = lax.while_loop(cond, body, state)

    pos = jnp.arange(T)[None, :]
    is_stop = (state.tokens == eos_id) & (pos >= Lp)
    any_stop = jnp.any(is_stop, axis=-1)
    first_stop = jnp.argmax(is_stop, axis=-1)
    lengths = jnp.where(any_stop, first_stop + 1, state.cur)
    lengths = jnp.minimum(lengths, Lp + jnp.maximum(cap - row_len, 0))
    lengths = jnp.minimum(lengths, Lp + max_new)
    out = GenerateOutput(tokens=state.tokens, lengths=lengths,
                         emotion_logits=emotion_logits)
    return out, state
