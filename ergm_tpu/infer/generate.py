"""KV-cached nucleus-sampling generation, fully jitted and batched.

Replaces the reference decode loop (src/main.py:253-282) which re-runs
the entire prefix through the model for every generated token, with no
KV cache, one sample at a time (SURVEY.md §2.4.11). Here:

- the prompt is prefilled once into a fixed-size KV cache,
- each subsequent token is one single-position step inside a
  ``lax.while_loop`` (static shapes, compiled once per prompt bucket),
- variable-length prompts in one batch are LEFT-padded: every row's last
  real token lands at the same physical slot, so one program serves the
  whole batch; per-row logical positions ride in explicit position_ids
  and pads stay masked out of attention forever,
- top-p filtering reproduces the reference math exactly
  (src/main.py:259-270): sort descending, cumsum, shift the cutoff mask
  right by one so the first super-threshold token is kept, renormalize,
  sample,
- generated tokens carry the sp2 token type (src/main.py:277-279) and
  rows stop at eos (src/main.py:274) or when the buffer fills.
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


def top_p_filter(probs: jnp.ndarray, top_p: float) -> jnp.ndarray:
    """Exact reference semantics (src/main.py:261-267): keep the smallest
    prefix of descending-sorted tokens whose cumulative probability
    exceeds top_p, always keeping the first; zero the rest; renormalize.

    Full-vocab sort + scatter — the parity/oracle form. The decode loop
    uses ``sample_top_p`` (top-k in sorted space) instead: a full 50k
    sort + scatter per generated token is the single slowest op on TPU.
    """
    sorted_idx = jnp.argsort(probs, axis=-1)[..., ::-1]
    sorted_probs = jnp.take_along_axis(probs, sorted_idx, axis=-1)
    cumsum = jnp.cumsum(sorted_probs, axis=-1)
    remove = cumsum > top_p
    # shift right: first token always kept (src/main.py:264-265)
    remove = jnp.concatenate(
        [jnp.zeros_like(remove[..., :1]), remove[..., :-1]], axis=-1)
    kept = jnp.where(remove, 0.0, sorted_probs)
    kept = kept / jnp.maximum(jnp.sum(kept, axis=-1, keepdims=True), 1e-20)
    # scatter back to vocab order (src/main.py:269)
    b_idx = jnp.arange(probs.shape[0])[:, None]
    return jnp.zeros_like(probs).at[b_idx, sorted_idx].set(kept)


def sample_top_p(logits: jnp.ndarray, key, top_p: float,
                 top_k: int = 64, approx: bool = True) -> jnp.ndarray:
    """Sample from the top-p nucleus without a full-vocab sort.

    The k most probable tokens are found with ``lax.approx_max_k``
    (TPU PartialReduce; ablation on v5e: the exact ``lax.top_k`` was the
    single most expensive op of the whole decode step — 1.3 ms of a
    4.1 ms step at B=128/V=50k — and approx_max_k recovers nearly all of
    it; recall for each true top-k token is >= 0.95, and on CPU it
    falls back to exact). Pass ``approx=False`` for the exact partial
    sort.

    The nucleus cutoff (identical math to src/main.py:261-267) is then
    applied in sorted space with TRUE probabilities — a fused full-vocab
    ``logsumexp`` normalizer, never a materialized softmax — and the
    sampled index gathered back, no 50k scatter. Whenever the top-k
    prefix holds at least ``top_p`` probability mass (the usual case for
    trained-LM distributions at the reference's top_p=0.8), the kept set
    equals the reference's exactly; if not, the filter conservatively
    keeps all k (mass shortfall <= 1 - cumsum[k-1]). Pass top_k=0 to
    generate() for the exact full-sort parity mode.
    """
    logits = logits.astype(jnp.float32)
    k = min(top_k, logits.shape[-1])
    if approx and k < logits.shape[-1]:
        lvals, idx = jax.lax.approx_max_k(logits, k, recall_target=0.95)
    else:
        lvals, idx = jax.lax.top_k(logits, k)  # descending
    logz = jax.nn.logsumexp(logits, axis=-1, keepdims=True)
    vals = jnp.exp(lvals - logz)  # true probabilities of the top-k
    cumsum = jnp.cumsum(vals, axis=-1)
    remove = cumsum > top_p
    remove = jnp.concatenate(
        [jnp.zeros_like(remove[..., :1]), remove[..., :-1]], axis=-1)
    kept = jnp.where(remove, 0.0, vals)
    choice = jax.random.categorical(key, jnp.log(jnp.maximum(kept, 1e-20)), axis=-1)
    return jnp.take_along_axis(idx, choice[..., None], axis=-1)[..., 0]


class GenState(NamedTuple):
    tokens: jnp.ndarray   # [B, T] physical token buffer
    mask: jnp.ndarray     # [B, T] 1 on real (non-pad, written) positions
    cache: gpt2.KVCache
    cur: jnp.ndarray      # [] int32 physical write slot
    last: jnp.ndarray     # [B, 1] last sampled token
    done: jnp.ndarray     # [B] bool eos emitted
    rng: jax.Array


class GenerateOutput(NamedTuple):
    tokens: jnp.ndarray          # [B, T] physical buffer (prompt + continuation)
    lengths: jnp.ndarray         # [B] physical length incl. prompt slot count
    emotion_logits: jnp.ndarray  # [B, num_emotions] from the prefill last token


def generate(
    params,
    config: ModelConfig,
    input_ids: jnp.ndarray,      # [B, Lp] prompts; left-padded if mask given
    input_len: Optional[int] = None,  # uniform true prompt length (static)
    *,
    max_len: int,                # physical buffer / logical cap (ref max_len)
    eos_id: int,
    sp2_id: int,
    top_p: float = 0.95,
    rng: Optional[jax.Array] = None,
    token_type_ids: Optional[jnp.ndarray] = None,
    prompt_mask: Optional[jnp.ndarray] = None,  # [B, Lp] 1=real (left-pad mode)
    imgs: Optional[jnp.ndarray] = None,
    auds: Optional[jnp.ndarray] = None,
    caption_ids: Optional[jnp.ndarray] = None,
    caption_mask: Optional[jnp.ndarray] = None,  # [B, Lc] 1=real caption token
    greedy: bool = False,
    temperature: float = 1.0,  # logit divisor before top-p (1.0 = reference)
    logical_cap: Optional[int] = None,
    sample_top_k: int = 64,  # 0 => exact full-sort nucleus (parity mode)
    sample_approx: bool = True,  # False => exact top-k (lax.top_k)
) -> GenerateOutput:
    """Uniform mode: pass ``input_len`` (all rows share a true length).
    Batched mode: pass left-aligned-pad ``prompt_mask`` (pads at the left,
    every row's last real token at physical slot Lp-1).

    ``max_len`` sizes the physical buffer; ``logical_cap`` (default
    max_len) bounds each row's logical sequence length — the reference's
    max_len stop condition (src/main.py:255)."""
    if logical_cap is None:
        logical_cap = max_len
    if rng is None:
        rng = jax.random.PRNGKey(0)
    if (input_len is None) == (prompt_mask is None):
        raise ValueError("pass exactly one of input_len / prompt_mask")

    if input_len is not None:
        input_ids = input_ids[:, :input_len]
        if token_type_ids is not None:
            token_type_ids = token_type_ids[:, :input_len]
        prompt_mask = jnp.ones(input_ids.shape, jnp.float32)
    B, Lp = input_ids.shape
    prompt_mask = prompt_mask.astype(jnp.float32)

    caption_len = caption_ids.shape[1] if caption_ids is not None else 0
    cache = gpt2.init_kv_cache(config, B, max_len, caption_len=caption_len)

    # full-width mask over the physical buffer; tail starts masked
    mask = jnp.zeros((B, max_len), jnp.float32)
    mask = lax.dynamic_update_slice(mask, prompt_mask, (0, 0))
    # logical positions: pads clipped to 0, real tokens 0..len-1
    prompt_pos = jnp.maximum(jnp.cumsum(prompt_mask, axis=-1) - 1, 0).astype(jnp.int32)
    row_len = jnp.sum(prompt_mask, axis=-1).astype(jnp.int32)  # [B]

    out = gpt2.forward(params, config, input_ids,
                       token_type_ids=token_type_ids,
                       position_ids=prompt_pos,
                       attention_mask=mask,
                       imgs=imgs, auds=auds, caption_ids=caption_ids,
                       encoder_attention_mask=caption_mask,
                       cache=cache, prefix_prefill=True,
                       # only the final position is sampled: the dense
                       # [B, Lp, V] f32 prefill logits (6.6 GB at the
                       # B=256 bench shape) were pure waste
                       compute_logits="last")
    emotion_logits = out.emotion_logits

    def sample(logits, key):
        if greedy:
            return jnp.argmax(logits, axis=-1)
        if temperature != 1.0:
            # scale BEFORE the nucleus cutoff (standard semantics: the
            # tempered distribution defines the top-p set). The
            # reference sampler is temperature-free (src/main.py:259-270
            # divides by nothing), so 1.0 is parity.
            logits = logits / jnp.maximum(temperature, 1e-6)
        if sample_top_k:
            return sample_top_p(logits, key, top_p, top_k=sample_top_k,
                                approx=sample_approx)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        filtered = top_p_filter(probs, top_p)
        return jax.random.categorical(key, jnp.log(jnp.maximum(filtered, 1e-20)), axis=-1)

    rng, key = jax.random.split(rng)
    first = sample(out.logits[:, -1, :], key)  # [B]

    tokens = jnp.full((B, max_len), eos_id, jnp.int32)
    tokens = lax.dynamic_update_slice(tokens, input_ids.astype(jnp.int32), (0, 0))
    # rows whose logical length already hit the cap cannot grow
    full0 = row_len >= logical_cap
    done0 = (first == eos_id) | full0
    tokens = tokens.at[:, Lp].set(jnp.where(full0, eos_id, first)) if Lp < max_len else tokens
    mask = mask.at[:, Lp].set(1.0) if Lp < max_len else mask

    state = GenState(tokens=tokens, mask=mask, cache=out.cache,
                     cur=jnp.asarray(min(Lp + 1, max_len), jnp.int32),
                     last=first[:, None].astype(jnp.int32), done=done0, rng=rng)

    def cond(s: GenState):
        return jnp.logical_and(s.cur < max_len, ~jnp.all(s.done))

    def body(s: GenState):
        step_tt = jnp.full((B, 1), sp2_id, jnp.int32)  # src/main.py:277-279
        # s.last sits at physical slot cur-1 -> logical row_len + (cur-1-Lp)
        step_pos = (row_len + (s.cur - 1 - Lp))[:, None]
        step_pos = jnp.minimum(step_pos, config.n_positions - 1)
        o = gpt2.forward(params, config, s.last, token_type_ids=step_tt,
                         position_ids=step_pos, attention_mask=s.mask,
                         encoder_attention_mask=caption_mask,
                         cache=s.cache)
        rng, key = jax.random.split(s.rng)
        nxt = sample(o.logits[:, -1, :], key)
        # rows at their logical cap stop too (ref max_len bound)
        at_cap = (row_len + (s.cur - Lp)) >= logical_cap
        nxt = jnp.where(s.done | at_cap, eos_id, nxt)
        tokens = s.tokens.at[:, s.cur].set(nxt)
        mask = s.mask.at[:, s.cur].set(1.0)
        done = s.done | (nxt == eos_id)
        return GenState(tokens=tokens, mask=mask, cache=o.cache,
                        cur=s.cur + 1, last=nxt[:, None].astype(jnp.int32),
                        done=done, rng=rng)

    state = lax.while_loop(cond, body, state)

    # physical length: first eos at/after slot Lp (+1), else max_len
    pos = jnp.arange(max_len)[None, :]
    is_stop = (state.tokens == eos_id) & (pos >= Lp)
    any_stop = jnp.any(is_stop, axis=-1)
    first_stop = jnp.argmax(is_stop, axis=-1)
    lengths = jnp.where(any_stop, first_stop + 1, max_len)
    return GenerateOutput(tokens=state.tokens, lengths=lengths,
                          emotion_logits=emotion_logits)


def _bucket(n: int, multiple: int) -> int:
    return ((n + multiple - 1) // multiple) * multiple


def pack_ragged_batch(
    prompts: Sequence[Sequence[int]],
    *,
    eos_id: int,
    sp2_id: int,
    n_positions: int,
    max_len: int,
    token_types: Optional[Sequence[Sequence[int]]] = None,
    captions: Optional[Sequence[Optional[Sequence[int]]]] = None,
    prompt_bucket: int = 64,
    caption_bucket: int = 32,
    max_new_tokens: Optional[int] = None,
):
    """Shared ragged-batch packing for generate_batch / beam_search_batch:
    left-pad prompts (every row's last real token at physical slot Lp-1),
    right-pad captions, and size the decode buffer.

    Returns (ids, mask, tts, cap_ids, cap_mask, buffer_len) as numpy
    arrays (cap_* are None when no sample carries a caption)."""
    B = len(prompts)
    lens = [len(p) for p in prompts]
    Lp = _bucket(max(lens), prompt_bucket)
    ids = np.full((B, Lp), eos_id, np.int32)
    mask = np.zeros((B, Lp), np.float32)
    tts = np.full((B, Lp), sp2_id, np.int32)
    for b, p in enumerate(prompts):
        ids[b, Lp - len(p):] = p
        mask[b, Lp - len(p):] = 1.0
        if token_types is not None:
            tts[b, Lp - len(p):] = token_types[b]
    cap_ids = cap_mask = None
    if captions is not None and any(c is not None and len(c) for c in captions):
        Lc = _bucket(max(len(c) if c else 1 for c in captions), caption_bucket)
        cap_ids = np.full((B, Lc), eos_id, np.int32)
        # caption-less rows keep an all-zero mask: the model zeroes their
        # cross-attn residual entirely (gpt2._capless_row_gate)
        cap_mask = np.zeros((B, Lc), np.float32)
        for b, c in enumerate(captions):
            if c is not None and len(c):
                cap_ids[b, :len(c)] = c
                cap_mask[b, :len(c)] = 1.0
    cap = min(max_len, n_positions)
    new_cap = max_new_tokens if max_new_tokens is not None else max(cap - min(lens), 0)
    buffer_len = Lp + max(new_cap, 1)
    return ids, mask, tts, cap_ids, cap_mask, buffer_len


@functools.lru_cache(maxsize=None)
def _jitted_generate(config, max_len, eos_id, sp2_id, top_p, greedy,
                     logical_cap, sample_top_k, sample_approx):
    """jit-wrapped ``generate`` for the host-level batch entry points.

    Calling ``generate`` eagerly executes its prefill forward op-by-op —
    harmless on a local device, but through a tunneled transport every
    eager op is a host round trip: measured ~2.3 s of pure overhead per
    ``generate_batch`` call at B=64 (the jitted program itself runs in
    0.44 s). Keyed on the hashable config + scalar statics; absent
    optional arrays pass as None (jit treats None as pytree structure,
    so presence/absence retraces correctly)."""
    def fn(params, ids, mask, tts, imgs, auds, cap_ids, cap_mask, rng):
        return generate(
            params, config, ids, prompt_mask=mask, max_len=max_len,
            eos_id=eos_id, sp2_id=sp2_id, top_p=top_p, rng=rng,
            token_type_ids=tts, imgs=imgs, auds=auds,
            caption_ids=cap_ids, caption_mask=cap_mask, greedy=greedy,
            logical_cap=logical_cap, sample_top_k=sample_top_k,
            sample_approx=sample_approx)
    return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def _jitted_speculative(config, max_len, max_new, eos_id, sp2_id, top_p,
                        greedy, draft_layers, gamma, mode, ngram_n):
    """jit-wrapped ``speculative_generate`` (same eager-overhead story
    as ``_jitted_generate`` — the CLI's B=1 route goes through here)."""
    from ergm_tpu.infer.speculative import speculative_generate

    def fn(params, ids, mask, tts, imgs, auds, cap_ids, cap_mask, rng):
        return speculative_generate(
            params, config, ids, prompt_mask=mask, max_len=max_len,
            max_new_tokens=max_new, eos_id=eos_id, sp2_id=sp2_id,
            top_p=top_p, greedy=greedy, draft_layers=draft_layers,
            gamma=gamma, mode=mode, ngram_n=ngram_n, rng=rng,
            token_type_ids=tts, imgs=imgs, auds=auds,
            caption_ids=cap_ids, caption_mask=cap_mask)
    return jax.jit(fn)


def _mesh_batch_placement(mesh, arrays):
    """Shared SPMD-decode placement for ``generate_batch`` and
    ``beam.beam_search_batch``: pad each array's leading (batch) dim up
    to a multiple of the mesh data axis by repeating the final row
    (callers slice fill rows off with the ORIGINAL batch size), and
    return ``(dev, ctx, arrays)`` — ``dev`` places host arrays with
    batch sharding, ``ctx`` is the mesh context. With ``mesh=None``:
    plain device placement, null context."""
    from contextlib import nullcontext

    if mesh is None:
        return (lambda x: None if x is None else jnp.asarray(x),
                nullcontext(), arrays)
    from ergm_tpu.core.mesh import batch_sharding

    B = arrays[0].shape[0]
    dp = int(mesh.shape.get("data", 1))
    padded = ((B + dp - 1) // dp) * dp
    if padded > B:
        def pad_rows(x):
            if x is None:
                return None
            x = np.asarray(x)
            return np.concatenate([x, np.repeat(x[-1:], padded - B, axis=0)],
                                  axis=0)

        arrays = tuple(pad_rows(x) for x in arrays)
    sh = batch_sharding(mesh)
    return (lambda x: None if x is None else jax.device_put(jnp.asarray(x), sh),
            mesh, arrays)


def generate_batch(
    params,
    config: ModelConfig,
    prompts: Sequence[Sequence[int]],
    *,
    max_len: int,
    eos_id: int,
    sp2_id: int,
    top_p: float = 0.95,
    rng: Optional[jax.Array] = None,
    token_types: Optional[Sequence[Sequence[int]]] = None,
    imgs: Optional[np.ndarray] = None,
    auds: Optional[np.ndarray] = None,
    captions: Optional[Sequence[Optional[Sequence[int]]]] = None,
    greedy: bool = False,
    prompt_bucket: int = 64,
    caption_bucket: int = 32,
    max_new_tokens: Optional[int] = None,
    sample_top_k: int = 64,
    sample_approx: bool = True,
    mesh=None,
    draft_layers: int = 0,
    spec_gamma: int = 4,
    spec_mode: str = "auto",
    spec_ngram: int = 3,
) -> Tuple[List[List[int]], np.ndarray]:
    """Host-level batched decode over ragged prompts.

    Left-pads prompts to a bucketed width, runs one jitted generate for
    the whole batch, and returns per-sample continuation token lists
    (eos included when emitted, like src/main.py:272-274) plus emotion
    logits from the prompt's final token. ``captions``: per-sample
    marker-wrapped caption ids for cross-attention conditioning
    (src/model.py:460-463); right-padded to a bucketed width and masked.

    ``mesh``: decode SPMD over a device mesh — the batch is padded to a
    multiple of the ``data`` axis, batch-dim inputs are sharded over it,
    and the jitted program runs under the mesh so tensor-parallel param
    shardings (core/mesh.py specs) drive XLA's collectives. Extra padded
    rows are dropped from the returned results.
    """
    ids, mask, tts, cap_ids, cap_mask, buffer_len = pack_ragged_batch(
        prompts, eos_id=eos_id, sp2_id=sp2_id, n_positions=config.n_positions,
        max_len=max_len, token_types=token_types, captions=captions,
        prompt_bucket=prompt_bucket, caption_bucket=caption_bucket,
        max_new_tokens=max_new_tokens)
    B, Lp = ids.shape
    cap = min(max_len, config.n_positions)

    if spec_mode == "auto":
        # Measured default policy (VERDICT r4 #8; B1_LATENCY.json +
        # results/spec_bench.jsonl): greedy B=1 turns prompt-lookup
        # drafting ON — it wins even at ZERO acceptance (25.46 vs
        # 27.48 ms/request random-init; 9.94 vs 11.59 trained) because
        # the draft is free and the verify batches gamma+1 positions.
        # SAMPLED requests keep spec OFF: under top-p the rejection
        # sampler's measured acceptance was 0.0 and the macro step
        # costs ~1.6x the plain step (18.44 vs 11.59 ms trained).
        # Explicit draft_layers still routes to the layer-draft path
        # (bigger wins on trained models, 5.76 vs 12.0 ms, but needs a
        # model whose early layers predict its own output).
        if draft_layers:
            spec_mode = "draft"
        elif greedy and B == 1 and mesh is None:
            spec_mode = "ngram"
        else:
            spec_mode = "none"
    if spec_mode != "none" and (draft_layers or spec_mode == "ngram"):
        # B=1 single-device requests route to speculative decoding
        # (multi-token steps; infer/speculative.py): self-drafted from
        # the first draft_layers blocks, or prompt-lookup n-gram drafted
        # when spec_mode='ngram' (no draft model at all). Sampling there
        # is full-vocab nucleus (the 'full_sort' reference semantics) —
        # sample_top_k/sample_approx don't apply.
        if B == 1 and mesh is None:
            spec = _jitted_speculative(
                config, cap, buffer_len - Lp, eos_id, sp2_id, top_p, greedy,
                draft_layers, spec_gamma, spec_mode, spec_ngram)
            out = spec(
                params, jnp.asarray(ids), jnp.asarray(mask),
                jnp.asarray(tts) if token_types is not None else None,
                None if imgs is None else jnp.asarray(imgs),
                None if auds is None else jnp.asarray(auds),
                None if cap_ids is None else jnp.asarray(cap_ids),
                None if cap_mask is None else jnp.asarray(cap_mask),
                rng if rng is not None else jax.random.PRNGKey(0))
            tokens = np.asarray(out.tokens)
            length = int(np.asarray(out.lengths)[0])
            return [tokens[0, Lp:length].tolist()], np.asarray(out.emotion_logits)
        import warnings

        warnings.warn(
            f"speculative decode (draft_layers={draft_layers}, "
            f"spec_mode={spec_mode}) is a B=1 single-device path; this "
            f"call has B={B}"
            f"{' and a mesh' if mesh is not None else ''} — falling back "
            f"to standard batched decode")

    dev, ctx, (ids, mask, tts, cap_ids, cap_mask, imgs, auds) = \
        _mesh_batch_placement(mesh, (ids, mask, tts, cap_ids, cap_mask,
                                     imgs, auds))
    gen = _jitted_generate(config, buffer_len, eos_id, sp2_id, top_p, greedy,
                           cap, sample_top_k, sample_approx)
    with ctx:
        out = gen(params, dev(ids), dev(mask),
                  dev(tts) if token_types is not None else None,
                  dev(imgs), dev(auds), dev(cap_ids), dev(cap_mask),
                  rng if rng is not None else jax.random.PRNGKey(0))
        tokens = np.asarray(out.tokens)
        lengths = np.asarray(out.lengths)
        emo = np.asarray(out.emotion_logits)
    results: List[List[int]] = []
    for b in range(B):  # B excludes mesh fill rows by construction
        results.append(tokens[b, Lp:lengths[b]].tolist())
    return results, emo[:B]
