"""Continuous-batching serving loop (static-slot, TPU-native).

The reference serves requests one at a time (infer.sh batch=1,
src/main.py:253-282); ``generate_batch`` amortizes cost across a batch
but is head-of-line blocked: the whole batch decodes until its LAST
request finishes, and new requests wait for the next batch. This module
adds the production pattern between those: **continuous batching** over
a fixed set of decode slots (the static-shape TPU analogue of vLLM-style
serving — one compiled decode program, requests join and leave at block
boundaries).

Design (everything static-shaped for XLA):

- ONE shared KV cache ``[L, S, H, T, Dh]`` over ``S`` slots with
  **per-slot write cursors** (``cache.index`` is an [S] vector): slot
  i's tokens live contiguously at physical positions ``[0, index[i])``
  — physical position == logical position. Every decode step scatters
  each row's new K/V at its own cursor; causality/visibility is just
  ``kpos <= index[i]``, so no attention-mask array is carried at all.
  (The round-3 original used one shared scalar cursor — all slots
  writing at the same physical position — which burned KV reads
  proportional to GLOBAL elapsed steps plus a ``max_prompt`` offset,
  needed a [S, T] mask array to hide inter-request junk, and had to
  stop-the-world "defrag" whenever the cursor hit the cache end.
  Measured at the reference serving shapes the per-step KV read is the
  entire serving cost — phases_s in results/server_bench.jsonl — so
  cursor-proportional reads were the throughput gap vs static batching.)
- **Grouped admission**: queued prompts are prefilled TOGETHER (one
  batched left-padded prefill per (prompt-bucket, group-bucket) — the
  same trick real serving systems use), then ONE ``join`` program per
  group left-aligns each row (gather) and scatters it into its slot at
  ``[0, len)``.
- **Decode**: one jitted program advances ALL slots ``sync_every``
  steps per host round trip. The host fetches exactly once per block
  (block tokens + per-slot first tokens + emotion logits as one
  device_get): per-call fetches cost ~30 ms through tunneled
  transports — the same measurement that drives the Trainer's deferred
  metric fetch — so admission/bookkeeping NEVER fetches. Finished rows
  keep decoding junk until the next sync (their cursor writes past
  their content; out-of-capacity writes drop); the host discards tokens
  past eos and frees the slot. Idle slots burn compute — the
  static-slot trade.
- **Bucketed physical capacity**: decode reads the WHOLE KV buffer
  every step (at S=64 slots x T=512 that is ~5x the weight bytes), so
  capacity is allocated on a ``cache_grow_step`` ladder tracking
  ``max(active row length) + sync_every``: pad-copied UP a rung as the
  longest row approaches it, slice-copied DOWN when the need drops to
  half the current rung (hysteresis against thrash). Per-slot cursors
  make the need independent of elapsed time — a drained or short-row
  server reads a small cache forever, with no defrag events at all.
  One decode/join specialization compiles per rung.

- **SPMD**: given a ``jax.sharding.Mesh``, params carry the TP
  partition specs (``model`` axis) and every per-slot state array is
  sharded over the ``data`` axis — each device prefills/decodes S/dp
  slots, so a data axis scales serving throughput instead of
  replicating the whole batch per chip. Greedy output is
  mesh-invariant (tested on data-only and data x model meshes).

Greedy decode through the server is byte-identical to ``generate``
(tested with staggered admissions and forced capacity grows/shrinks);
sampling uses the same top-k-in-sorted-space nucleus sampler as
``generate``.

Reference anchor: serves the capability of src/main.py:253-282 at
production request rates; no reference counterpart exists.
"""

from __future__ import annotations

import dataclasses
import numbers as _numbers
import os as _os
import time as _time
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ergm_tpu.core.config import ModelConfig
from ergm_tpu.infer.generate import sample_top_p
from ergm_tpu.models import gpt2


@dataclass
class Request:
    """One generation request (prompt ids + optional tri-modal inputs)."""
    prompt_ids: List[int]
    token_type_ids: Optional[List[int]] = None
    img: Optional[np.ndarray] = None
    aud: Optional[np.ndarray] = None
    caption_ids: Optional[List[int]] = None
    max_new_tokens: int = 128
    greedy: bool = False
    top_p: float = 0.95
    # sampling temperature (logit divisor, applied before the top-p
    # cutoff). 1.0 = the reference's temperature-free sampler
    # (src/main.py:259-270); greedy rows ignore it.
    temperature: float = 1.0
    seed: int = 0
    # stop sequences: token-id sequences that end generation when the
    # emitted stream ends with one (the matched sequence stays in the
    # output, like eos). [[ids...], ...]; a flat [ids...] is accepted
    # as one sequence. Matching is exact on token ids — text stops must
    # be encoded client-side and can miss occurrences split across BPE
    # token boundaries. Host-side at block harvest: no device cost, and
    # the slot frees like any finished row.
    stop: Optional[List[List[int]]] = None
    # return per-token logprobs of the emitted tokens (under the FULL
    # untempered softmax, not renormalized to the nucleus — the usual
    # serving-API semantics). Costs one log-softmax per decode step and
    # a tiny [K, S] fetch per block while any logprobs row is active,
    # and disables the speculative fast path for those blocks.
    logprobs: bool = False
    # streaming: called once per harvested block with
    # (request_id, new_tokens, done) — new_tokens are the tokens this
    # block added (eos included if emitted; junk past eos already
    # discarded). Granularity is the block (sync_every tokens), the
    # server's one host round trip per block — per-token callbacks
    # would force a fetch per step, the exact cost the block design
    # removes. In pipelined mode callbacks run one block late (the
    # finish-detection lag documented on step()).
    stream_cb: Optional[Callable[[int, List[int], bool], None]] = None
    # Multi-turn session continuation (incremental prefill): requests
    # sharing a session_id keep their slot's KV between turns. Send the
    # FULL dialogue prompt each turn; when it extends the session's
    # consumed tokens (previous prompt + previous reply), the server
    # prefills only the NEW tokens against the retained cache — turn
    # cost becomes O(turn length), not O(history). On prefix mismatch
    # (or eviction under slot pressure) it falls back to a full
    # prefill, so session_id is purely a latency hint, never a
    # correctness knob. token_type_ids, if given, applies to the new
    # tokens; the original turn's caption/modality state is retained.
    session_id: Optional[str] = None
    # Length-tiered pools (server long_slots > 0): override the
    # automatic routing (expected final length vs long_threshold).
    # "long" pins the request to the long pool — use it for the FIRST
    # turn of a session expected to grow past the threshold, since
    # session rows stay in the pool that admitted them; "short"
    # forces the short pool. None = route by length.
    pool: Optional[str] = None


_MAX_STOP_SEQS = 16
_MAX_STOP_LEN = 64


def _norm_stop(stop) -> Optional[List[List[int]]]:
    """Normalize a stop spec to [[ids...], ...]: a flat [ids...] means
    one sequence; empty sequences are rejected (they would match every
    position). Malformed shapes raise ValueError (the CLI serve loop
    catches ValueError per request; a TypeError from iterating an int
    would kill the whole run). Count/length are capped: _done scans
    every sequence tail per harvested token per slot, so an unbounded
    client-supplied list would inflate host-side harvest cost."""
    if isinstance(stop, np.ndarray):  # tokenizer output; 1-D = one seq
        stop = stop.tolist()
    if not stop:
        return None
    if all(isinstance(t, _numbers.Integral) and not isinstance(t, bool)
           for t in stop):
        # flat [ids...] (Python ints OR numpy integer scalars straight
        # from a tokenizer) means one sequence
        stop = [[int(t) for t in stop]]
    if len(stop) > _MAX_STOP_SEQS:
        raise ValueError(f"too many stop sequences ({len(stop)} > "
                         f"{_MAX_STOP_SEQS})")
    out = []
    for seq in stop:
        if isinstance(seq, (int, bool)) or isinstance(seq, str):
            raise ValueError("stop must be [ids...] or [[ids...], ...]")
        try:
            seq = [int(t) for t in seq]
        except (TypeError, ValueError):
            raise ValueError("stop must be [ids...] or [[ids...], ...]")
        if not seq:
            raise ValueError("empty stop sequence")
        if len(seq) > _MAX_STOP_LEN:
            raise ValueError(f"stop sequence too long ({len(seq)} > "
                             f"{_MAX_STOP_LEN} tokens)")
        out.append(seq)
    return out


def request_from_json(payload, tokenizer=None, *, default_max_new: int = 128,
                      default_top_p: float = 0.95,
                      default_seed: int = 0) -> Request:
    """Build a Request from one user JSON object — the shared parser of
    the batch serve mode (cli --requests_file) and the HTTP front end
    (infer/http_server.py), so both surfaces accept the same fields
    with the same defaults."""
    if "prompt" in payload:
        ids = [int(t) for t in payload["prompt"]]
    elif "text" in payload:
        if tokenizer is None:
            raise ValueError("text requests need a tokenizer "
                             "(--tokenizer_dir)")
        ids = tokenizer.encode(payload["text"])
    else:
        raise ValueError("request needs 'prompt' or 'text'")
    caps = payload.get("caption_ids")
    if caps is None and payload.get("caption"):
        if tokenizer is None:
            raise ValueError("'caption' text needs a tokenizer; pass "
                             "'caption_ids' otherwise")
        caps = tokenizer.encode(payload["caption"])
    sid = payload.get("session_id")
    pool = payload.get("pool")
    if pool is not None and pool not in ("short", "long"):
        raise ValueError("pool must be 'short' or 'long'")
    temp = float(payload.get("temperature", 1.0))
    if temp < 0.0:
        raise ValueError("temperature must be >= 0")
    return Request(
        stop=_norm_stop(payload.get("stop")),
        logprobs=bool(payload.get("logprobs", False)),
        prompt_ids=ids, caption_ids=caps,
        max_new_tokens=int(payload.get("max_new_tokens", default_max_new)),
        # temperature 0 IS greedy (the usual API convention)
        greedy=bool(payload.get("greedy", False)) or temp == 0.0,
        temperature=temp if temp > 0.0 else 1.0,
        top_p=float(payload.get("top_p", default_top_p)),
        seed=int(payload.get("seed", default_seed)),
        session_id=str(sid) if sid is not None else None,
        pool=pool)


@dataclass
class Result:
    request_id: int
    tokens: List[int]            # continuation only (eos included if emitted)
    emotion_logits: np.ndarray   # [num_emotions] from the prompt's last token
    steps_waited: int            # server steps between submit and admission
    latency_s: float = 0.0       # submit -> finish wall clock
    # per-token logprobs parallel to ``tokens`` (Request.logprobs=True)
    logprobs: Optional[List[float]] = None


@dataclass
class _Slot:
    request_id: int = -1
    req: Optional[Request] = None
    generated: List[int] = field(default_factory=list)
    lps: List[float] = field(default_factory=list)  # logprobs, if requested
    has_first: bool = False      # first token harvested from the block fetch
    submitted_step: int = 0
    submitted_wall: float = 0.0
    admitted_step: int = 0
    active: bool = False
    phys_len: int = 0            # host mirror of the device cursor
    admitted_block: int = 0      # first decode block this row rides in
    # session parking (multi-turn continuation): a finished slot whose
    # request carried a session_id keeps its KV content for the next
    # turn instead of freeing
    parked: bool = False
    session: Optional[str] = None
    token_log: List[int] = field(default_factory=list)  # consumed + emitted
    last_use: int = 0            # block counter, for LRU eviction
    # chunked prefill in progress: the slot holds a partial prompt
    # ([0, phys_len) real K/V) and is neither free nor decoding yet
    prefilling: bool = False


def _bucket(n: int, multiple: int) -> int:
    return max(((n + multiple - 1) // multiple) * multiple, multiple)


def _group_bucket(n: int, cap: int = 64) -> int:
    """Always the full cap: one group size means ONE compiled
    prefill/join program per prompt bucket (variable group sizes were
    measured to trace+compile a fresh program pair per distinct
    (free-slot-count, bucket) combo — seconds each through the tunnel's
    remote-compile path). Pad rows cost one wasted prefill row."""
    return cap


class ContinuousServer:
    """Static-slot continuous batching over one compiled decode program.

    Usage::

        srv = ContinuousServer(params, cfg, slots=8, eos_id=..., sp2_id=...)
        rid = srv.submit(Request(prompt_ids=[...], max_new_tokens=32))
        results = srv.run_until_drained()   # or step() incrementally
    """

    # max requests prefilled/joined per program call: large groups make
    # admission cost O(requests / 64) device calls — on par with static
    # batching's prefill granularity
    GROUP_CAP = 64

    def __init__(self, params, config: ModelConfig, *, slots: int,
                 eos_id: int, sp2_id: int,
                 max_prompt: int = 256, cache_len: Optional[int] = None,
                 caption_len: int = 32, prompt_bucket: int = 64,
                 sync_every: int = 8, modality_dim: Optional[int] = None,
                 mesh=None, cache_grow_step: int = 32,
                 pipeline: bool = False,
                 spec_gamma: int = 0, spec_ngram: int = 3,
                 prefill_chunk: int = 0,
                 long_slots: int = 0,
                 long_threshold: Optional[int] = None,
                 adaptive_block: bool = True,
                 admit_policy: str = "fifo"):
        c = config
        # SPMD serving: pass a jax.sharding.Mesh and params already
        # placed with the TP partition specs (core/mesh.shard_params);
        # every program then runs under the mesh so XLA inserts the
        # tensor-parallel collectives — same route run_infer uses. A
        # ``data`` axis shards the SLOT dimension of all device state
        # (each device decodes S/dp slots); without that the data axis
        # would only replicate the whole batch onto every chip.
        self.mesh = mesh
        self.params = params
        self.cfg = c
        self.S = slots
        self.eos_id = eos_id
        self.sp2_id = sp2_id
        self.prompt_bucket = prompt_bucket
        self.max_prompt = _bucket(max_prompt, prompt_bucket)
        self.T = min(cache_len or c.n_positions, c.n_positions)
        if self.max_prompt >= self.T:
            raise ValueError(f"max_prompt {self.max_prompt} must be < cache "
                             f"length {self.T}")
        self.caption_len = caption_len if c.use_cross_attention else 0
        self.sync_every = sync_every
        # Finish-aware block sizing (round 4, VERDICT r3 next #2): the
        # remaining budget of every active row is KNOWN, so a block of
        # sync_every steps is wasteful when many rows end mid-block
        # (their slots junk-decode instead of refilling — slot_util
        # 0.675 on the mixed offline bench). Each dispatch picks the
        # block length n from a small ladder {sync, sync/2, sync/4}
        # maximizing useful-tokens per wall second,
        #   score(n) = sum_i min(remaining_i, n) / (rt + n * t_step),
        # with rt (fixed per-block host+dispatch overhead) and t_step
        # (per-token device time) fit online from observed block walls.
        # Synchronous mode only (pipelined walls overlap, so the fit
        # would be garbage); spec blocks keep sync_every macro steps.
        self.adaptive_block = adaptive_block and not pipeline
        # admission order. "fifo" preserves arrival order (latency-fair,
        # the online default). "sorted" admits length-sorted cohorts
        # (stable sort by output budget, largest first): co-resident
        # rows finish at the same block boundary, so slots refill
        # together instead of junk-decoding until the block's longest
        # row ends — the offline-regime lever for the slot_util 0.708
        # gap (VERDICT r4 next #4). Starvation-prone under continuous
        # arrivals; use for drain-the-queue batch workloads.
        if admit_policy not in ("fifo", "sorted"):
            raise ValueError(f"unknown admit_policy {admit_policy!r}")
        self.admit_policy = admit_policy
        ladder = sorted({sync_every, max(sync_every // 2, 1),
                         max(sync_every // 4, 1)}, reverse=True)
        self._block_ladder = [n for n in ladder if n >= 1]
        self.mod_dim = modality_dim or c.modality_dim
        # int4 KV serves through the SAME staged block decode as int8
        # (round 5): the packed-nibble layout halves head_dim (the
        # minor axis), so every per-slot-cursor scatter — join's
        # window write, the extension-prefill row write, flush_staging
        # — indexes only batch/time axes and is layout-safe; decode
        # attention unpacks the main cache in place
        # (models/gpt2.py _self_attention_cached staged path). Greedy
        # parity with generate's int4 path:
        # tests/test_server.py::test_int4_kv_server_matches_generate.
        if c.cross_kv_dtype == "int8":
            raise ValueError(
                "cross_kv_dtype='int8' is a generate-path option; the "
                "server's chunked-prefill cache merge does not carry the "
                "cross scales (use 'auto' here)")
        # int8 KV in the server runs the STAGED block decode (round 4):
        # steps write bf16 staging at a uniform index and ONE per-block
        # flush quantizes+scatters — the per-step int8 scatter that
        # measured ~80x the bf16 step in round 3 is gone. Greedy output
        # stays byte-identical to generate's int8 path
        # (tests/test_server.py::test_int8_kv_server_matches_generate).
        # Bucketed PHYSICAL cache capacity: decode reads the whole KV
        # buffer every step (at S=64, T=512 the cache is ~5x the weight
        # bytes — the dominant read). With per-slot cursors the needed
        # capacity is max(active length) + sync_every, so the cache is
        # allocated at the smallest rung of a grow_step ladder covering
        # that, pad-copied up a rung when the longest row approaches it,
        # and slice-copied down when the need falls to half the rung.
        # Each rung compiles its own decode/join specialization —
        # bounded by len(ladder) programs. 0 disables (single rung at
        # cache_len).
        self.grow_step = cache_grow_step
        # throughput mode: overlap each block's host round trip with the
        # next block's device compute (see step())
        self.pipeline = pipeline
        # speculative serving (prompt-lookup drafting, greedy blocks
        # only): each of the block's sync_every MACRO steps drafts
        # spec_gamma tokens per slot from the most recent earlier
        # occurrence of the last spec_ngram emitted tokens (a device
        # token buffer [S, T]), verifies all gamma+1 positions in ONE
        # forward, and advances each slot's cursor by its accepted
        # prefix + 1 — per-slot variable advance, 1..gamma+1 tokens per
        # macro step from the EXACT greedy distribution (the same
        # rejection identity infer/speculative.py uses at B=1). Blocks
        # with any sampled row fall back to the plain decode program
        # (the token buffer then goes stale for those steps — exactness
        # is unaffected, only lookup acceptance degrades).
        # chunked prefill (Sarathi-style): admit a long prompt in
        # prefill_chunk-token slices, one slice per server step, so the
        # decode-latency hiccup concurrent streams see is bounded by one
        # CHUNK-wide forward instead of a full prompt-wide group prefill
        # (measured 466 ms for a single 896-token admission at the
        # always-64-row group bucket vs ~45 ms steady blocks —
        # results/prefill_interference.jsonl). The first chunk rides the
        # normal prefill/join path (it carries the modality injection
        # and caption K/V); later chunks ride the session-extension
        # program, which prefills a delta against the LIVE cache with
        # per-row shifted-causal visibility. Side effect: fresh prompts
        # and session deltas may exceed max_prompt (only chunks ever
        # prefill). 0 disables (single-shot admission, the default).
        self.prefill_chunk = int(prefill_chunk)
        if self.prefill_chunk:
            if self.prefill_chunk < self.EXT_BUCKET:
                raise ValueError(f"prefill_chunk must be >= {self.EXT_BUCKET}")
            if self.prefill_chunk > self.max_prompt:
                raise ValueError(
                    f"prefill_chunk {self.prefill_chunk} must be <= "
                    f"max_prompt {self.max_prompt} (the first chunk rides "
                    f"the prefill path)")
        # Length-tiered slot pools: one long LIVE row raises a shared
        # cache's capacity rung and every slot then reads the wide cache
        # (the documented offline collapse on mixed long-prompt traffic,
        # 97 -> 25 utt/s). With ``long_slots=K``, the last K slots form a
        # LONG pool with its OWN cache buffer and rung; requests route
        # by expected final length (prompt + max_new - 1, known at
        # submit) against ``long_threshold`` (default: max_prompt).
        # The decode block runs one forward per non-empty pool inside
        # the same program — short rows keep reading a narrow cache
        # while long rows pay for their own width (measured 10.7 ->
        # 4.4 ms/step at S=56@192+8@1024 vs one 64@1024 pool,
        # scripts/tier_probe.py). Short requests overflow into idle
        # long slots when the short pool is full; long requests never
        # take short slots (they would widen the narrow rung). Session
        # rows are pinned to the pool that admitted their first turn —
        # route conversations expected to grow with Request.pool="long".
        self.long_slots = int(long_slots)
        if self.long_slots:
            if not (0 < self.long_slots < slots):
                raise ValueError(
                    f"long_slots {long_slots} must be in (0, slots)")
            self.long_threshold = int(long_threshold
                                      if long_threshold is not None
                                      else self.max_prompt)
            self.groups = ((0, slots - self.long_slots),
                           (slots - self.long_slots, self.long_slots))
        else:
            self.long_threshold = None
            self.groups = ((0, slots),)
        # Per-pool KV cache dtype (VERDICT r4 #6): kv_cache_dtype="auto"
        # with length-tiered pools resolves to the measured per-regime
        # choice — bf16 for the short pool (int8 measured 0.73-0.77x
        # there) and int8 STAGED for the long pool(s), where quantized
        # KV wins (the long mix; +46% generate-path at T=1024). An
        # explicit dtype still applies to every pool. Each pool's
        # programs trace with its own config, so the decode block mixes
        # a per-step-scatter bf16 pool with a staged int8 pool.
        # Under speculative serving "auto" resolves to bf16 everywhere:
        # the spec macro step has no staged quantized write (see the
        # spec_gamma guard below), and auto means "pick for me".
        if (c.kv_cache_dtype == "auto" and len(self.groups) > 1
                and not spec_gamma):
            self.gcfgs = tuple(
                [c] + [c.replace(kv_cache_dtype="int8")]
                * (len(self.groups) - 1))
        else:
            self.gcfgs = tuple(c for _ in self.groups)
        self.spec_gamma = int(spec_gamma)
        self.spec_ngram = int(spec_ngram)
        if self.spec_gamma:
            if pipeline:
                raise ValueError(
                    "spec_gamma with pipeline=True is unsupported: the "
                    "host cursor mirror is only exact after a harvest, "
                    "which pipelining defers past the next dispatch")
            if self.spec_ngram < 1:
                raise ValueError("spec_ngram must be >= 1")
            if self.spec_ngram + self.spec_gamma >= self.T:
                raise ValueError("spec_ngram + spec_gamma must be < cache_len")
            if any(gc.kv_cache_dtype in ("int8", "int4")
                   for gc in self.gcfgs):
                # the staged block decode (one per-block quantize+flush)
                # only covers _decode_fn; the spec macro-step writes
                # variable-length accepted prefixes per slot, which the
                # uniform-index staging cannot express — it would fall
                # back to the per-step quantized scatter that measured
                # ~80x the bf16 step (round 3). Refuse rather than run
                # silently at that cost.
                raise ValueError(
                    "spec_gamma > 0 requires kv_cache_dtype='auto'/'bf16' "
                    "in the server: the speculative decode path has no "
                    "staged quantized-cache write (the per-step int8 "
                    "scatter it would use measured ~80x the bf16 step)")

        self._prefill_cache: Dict[tuple, object] = {}
        self._join_cache: Dict[tuple, object] = {}
        self._decode_cache: Dict[int, object] = {}
        self._shardings = self._state_shardings()
        self._init_state(0)

    @property
    def phase_seconds(self) -> Dict[str, float]:
        """Accumulated wall time per server phase since the last reset
        (host-side timers only; ``block_wait`` is the decode block's
        compute + result-transfer wait, the rest are host/dispatch
        costs). Zeroed by ``reset`` so benches read steady state."""
        return dict(self._phase)

    # -- physical cache capacity -------------------------------------------

    def _phys_for(self, need: int) -> int:
        """Smallest capacity rung >= ``need``: a multiple of
        ``grow_step``, capped at the logical cache length ``T``."""
        if not self.grow_step or self.grow_step >= self.T:
            return self.T
        return min(_bucket(need, self.grow_step), self.T)

    def _grow_cache(self, g: int, new_phys: int) -> None:
        """Pad-copy pool ``g``'s KV cache up to the next rung. One
        device copy of the live prefix — O(Sg * Tphys) bytes, amortized
        over the decode steps the new headroom buys."""
        delta = new_phys - self.Tphys[g]
        if delta <= 0:
            return
        self.grows += 1
        t0 = _time.time()

        def pad_t(a):  # k/v/scales: [L, Sg, H, T, *] — T is axis 3
            return jnp.pad(a, [(0, 0)] * 3 + [(0, delta), (0, 0)])

        self._resize(g, pad_t, new_phys)
        self._tick("grow", t0)

    def _shrink_cache(self, g: int, new_phys: int) -> None:
        """Slice-copy pool ``g``'s KV cache down to a smaller rung once
        the longest active row no longer needs the headroom (per-slot
        cursors: every active row's content lives in [0, its length)).
        Idle/finished rows may carry stale cursors past the new
        capacity — their junk writes drop and their state is fully
        rewritten at the next join."""
        if new_phys >= self.Tphys[g]:
            return
        self.shrinks += 1
        t0 = _time.time()
        self._resize(g, lambda a: a[:, :, :, :new_phys, :], new_phys)
        self._tick("shrink", t0)

    def _resize(self, g: int, fn, new_phys: int) -> None:
        c = self.caches[g]
        repl = {"k": fn(c.k), "v": fn(c.v)}
        if c.k_scale is not None:
            repl["k_scale"] = fn(c.k_scale)
            repl["v_scale"] = fn(c.v_scale)
        self.caches[g] = c._replace(**repl)
        self.Tphys[g] = new_phys
        self._place_state()

    def _slot_group(self, i: int) -> int:
        """Pool index of slot ``i`` (groups are contiguous ranges)."""
        return (1 if self.long_slots and i >= self.groups[1][0] else 0)

    def _group_slots(self, g: int):
        off, size = self.groups[g]
        return range(off, off + size)

    def _capacity_need(self, g: int) -> int:
        """Physical capacity pool ``g`` needs this block: the longest
        active row's cursor (host mirror, exact at block boundaries)
        plus one block of writes. A speculative block writes up to
        gamma+1 positions per macro step (verify windows of rejected
        proposals included — a dropped write that later turned out
        accepted would leave the cursor pointing at zeros, so the rung
        must cover the worst case)."""
        rows = [self.slots[i] for i in self._group_slots(g)]
        lens = [s.phys_len for s in rows if s.active]
        # parked session content must survive capacity shrinks (its KV
        # above the rung would be sliced away); no +block term — parked
        # rows' junk writes past capacity drop harmlessly. The same
        # holds for a chunk-prefilling row's partial content.
        parked = [len(s.token_log) for s in rows if s.parked]
        pre = [s.phys_len for s in rows if s.prefilling]
        return max((max(lens) if lens else 0) + self._per_block_writes() + 1,
                   max(parked) if parked else 0,
                   max(pre) if pre else 0)

    def _per_block_writes(self) -> int:
        return self.sync_every * ((self.spec_gamma + 1) if self.spec_gamma
                                  else 1)

    # -- public API -------------------------------------------------------

    def _state_shardings(self):
        """Slot-axis (data-parallel) shardings for the device state.
        With a mesh whose ``data`` axis is >1, every per-slot array is
        sharded over it so each device decodes S/dp slots (composing
        with TP over ``model`` on the head axis when present)."""
        if self.mesh is None:
            return None
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh = self.mesh
        dp = int(mesh.shape.get("data", 1))
        if dp <= 1:
            return None
        if self.S % dp:
            raise ValueError(
                f"slots={self.S} must be divisible by the mesh data axis "
                f"({dp}) to shard the serving batch over it; pick "
                f"divisible slots or a smaller data axis")
        if any(size % dp for _off, size in self.groups):
            raise ValueError(
                f"each slot pool must be divisible by the mesh data axis "
                f"({dp}); got pool sizes "
                f"{[size for _o, size in self.groups]}")
        tp = ("model" if "model" in mesh.axis_names
              and int(mesh.shape["model"]) > 1 else None)
        return {
            "kv": NamedSharding(mesh, P(None, "data", tp)),   # [L,S,H,T,*]
            "cross": NamedSharding(mesh, P(None, "data", None, tp)),
            "row": NamedSharding(mesh, P("data")),            # [S, ...]
            "rep": NamedSharding(mesh, P()),
        }

    def _place_state(self) -> None:
        """Commit the device state to the slot-sharded layout (no-op
        without a data axis); the jitted programs preserve it, so decode
        genuinely splits the slots across the mesh."""
        sh = self._shardings
        if sh is None:
            return
        put = jax.device_put
        for g, c in enumerate(self.caches):
            kv = {f: put(getattr(c, f), sh["kv"])
                  for f in ("k", "v", "k_scale", "v_scale")
                  if getattr(c, f) is not None}
            cross = {f: put(getattr(c, f), sh["cross"])
                     for f in ("ck", "cv") if getattr(c, f) is not None}
            # the per-slot cursor vector shards over the data axis too
            self.caches[g] = c._replace(index=put(c.index, sh["row"]),
                                        **kv, **cross)
        for name in ("last", "cap_mask", "greedy_row",
                     "top_p_row", "temp_row", "first_tok", "first_lp",
                     "emo_slot", "tokens"):
            if getattr(self, name, None) is not None:
                setattr(self, name, put(getattr(self, name), sh["row"]))
        self.rng = put(self.rng, sh["rep"])

    def _init_state(self, seed: int) -> None:
        """(Re)initialize queue/result bookkeeping and all device state
        (host NEVER fetches outside the per-block harvest). The cache's
        [S] index vector holds each slot's write cursor == its logical
        length; joins reset a slot's cursor, decode advances all."""
        c = self.cfg
        self.queue = []
        self.results = {}
        self._phase: Dict[str, float] = {}
        self.slots = [_Slot() for _ in range(self.S)]
        self.sessions: Dict[str, int] = {}  # session_id -> PARKED slot idx
        # slot -> in-progress chunked admission: remaining delta ids/tts
        # (absolute ``base`` start), consumed ``off``, request bookkeeping
        self._chunks: Dict[int, dict] = {}
        self._next_id = 0
        self.server_step = 0
        self.block_len_hist: Dict[int, int] = {}  # n -> dispatch count
        self.grows = 0
        self.shrinks = 0
        self._inflight = None
        self._block_ctr = 0
        t0 = self._phys_for(self.prompt_bucket
                            + self._per_block_writes() + 1)
        self.Tphys = [t0 for _ in self.groups]
        self.caches = [
            gpt2.init_kv_cache(self.gcfgs[gi], size, t0,
                               caption_len=self.caption_len,
                               per_row_index=True)
            for gi, (_off, size) in enumerate(self.groups)]
        self.last = jnp.full((self.S, 1), self.eos_id, jnp.int32)
        self.cap_mask = jnp.zeros((self.S, max(self.caption_len, 1)),
                                  jnp.float32)
        # ONE carried rng chain, split once per decode step for the whole
        # batch (a per-slot key vector forced a vmapped per-row sampler —
        # 64 tiny approx-top-k + RNG ops per step, measured 17.8 ms/step
        # vs 3.5 for the batched form). Request.seed feeds the prefill
        # group key; sampled streams are scheduler-dependent by design.
        self.rng = jax.random.PRNGKey(seed)
        self.greedy_row = jnp.zeros((self.S,), bool)
        self.top_p_row = jnp.full((self.S,), 0.95, jnp.float32)
        self.temp_row = jnp.ones((self.S,), jnp.float32)
        self.first_tok = jnp.full((self.S,), self.eos_id, jnp.int32)
        self.first_lp = jnp.zeros((self.S,), jnp.float32)
        self.emo_slot = jnp.zeros((self.S, c.num_emotions), jnp.float32)
        # speculative serving: device token buffer — tokens[s, p] is the
        # token CONSUMED at logical position p of slot s (prompt written
        # by the join; decode macro steps write the pending token +
        # proposals at the cursor). Sized at the LOGICAL cap (static
        # across capacity rungs; S x T int32 is tiny).
        self.tokens = (jnp.full((self.S, self.T), self.eos_id, jnp.int32)
                       if self.spec_gamma else None)
        self.spec_proposed = 0
        self.spec_accepted = 0
        self._place_state()

    def _tick(self, name: str, t0: float) -> float:
        now = _time.time()
        self._phase[name] = self._phase.get(name, 0.0) + (now - t0)
        return now

    def reset(self, seed: int = 0) -> None:
        """Drain all state (queue, results, slots, device buffers) while
        KEEPING the compiled prefill/join/decode programs — a warm
        restart for back-to-back serving sessions (and the honest way
        to benchmark steady-state serving separately from compiles)."""
        self._init_state(seed)

    def _session_delta(self, req: Request) -> Optional[int]:
        """If ``req`` continues a currently PARKED session (its prompt
        extends the session's consumed tokens), return the delta length
        it would prefill (including the re-fed final token); else None."""
        sid = req.session_id
        if not sid or sid not in self.sessions:
            return None
        log = self.slots[self.sessions[sid]].token_log
        if not log or len(req.prompt_ids) < len(log):
            return None
        if list(req.prompt_ids[:len(log)]) != log:
            return None
        return len(req.prompt_ids) - len(log) + 1

    def submit(self, req: Request) -> int:
        # normalize into a COPY — the caller's Request object is never
        # mutated, so callers may reuse or introspect it after submit
        changes: dict = {"stop": _norm_stop(req.stop)}
        # mirror request_from_json for library callers constructing
        # Request directly: temperature 0 IS greedy (the usual API
        # convention) — without this, temperature=0.0 would divide
        # logits by a tiny clamp (near-argmax via the sampler, consuming
        # rng and missing the all-greedy specialization)
        if req.temperature <= 0.0:
            if req.temperature < 0.0:
                raise ValueError("temperature must be >= 0")
            changes["greedy"] = True
            changes["temperature"] = 1.0
        req = dataclasses.replace(req, **changes)
        if len(req.prompt_ids) > self.max_prompt and not self.prefill_chunk:
            # session continuations only prefill the DELTA, so the full
            # dialogue history may exceed the prefill bucket — as long
            # as a matching parked session exists right now (it is
            # protected from eviction while this request is queued).
            # With chunked prefill on, ANY prompt admits in chunks, so
            # max_prompt stops being an admission limit entirely.
            d = self._session_delta(req)
            if d is None or d > self.max_prompt:
                raise ValueError(
                    f"prompt length {len(req.prompt_ids)} exceeds "
                    f"max_prompt {self.max_prompt}"
                    + (" (no matching parked session to extend)"
                       if req.session_id else ""))
        # the row occupies [0, prompt + max_new - 1) of its slot (the
        # final sampled token is never written back)
        if len(req.prompt_ids) + req.max_new_tokens - 1 > self.T:
            raise ValueError(
                f"prompt ({len(req.prompt_ids)}) + max_new_tokens "
                f"({req.max_new_tokens}) cannot fit the serving cache "
                f"(cache_len {self.T}); raise cache_len or lower "
                f"max_new_tokens")
        rid = self._next_id
        self._next_id += 1
        self.queue.append((rid, req, self.server_step, _time.time()))
        return rid

    def _fit_capacity(self) -> None:
        for g in range(len(self.groups)):
            need = self._phys_for(self._capacity_need(g))
            if need > self.Tphys[g]:
                self._grow_cache(g, need)
            elif need * 2 <= self.Tphys[g]:
                # hysteresis: only reclaim once the need drops to half
                # the rung, so a long row finishing doesn't thrash
                # grow/shrink
                self._shrink_cache(g, need)

    def step(self) -> List[Result]:
        """One server iteration: admit into free slots, fit the capacity
        rung, run a decode block, harvest completions. Returns results
        finished this call.

        With ``pipeline=True`` the order changes to dispatch-first: the
        block runs on device WHILE the host fetches the PREVIOUS
        block's tokens, does its bookkeeping, and stages admissions for
        the next block — hiding the per-block host round trip (~30 ms
        on tunneled transports) behind device compute. The cost is one
        block of finish-detection lag (a finished row junk-decodes one
        extra block before its slot frees), so it is the THROUGHPUT
        mode; the default synchronous order is the latency mode."""
        if not self.pipeline:
            self._admit()
            self._advance_chunks(
                drain=not any(s.active for s in self.slots))
            if not any(s.active for s in self.slots):
                return []
            self._fit_capacity()
            inflight = self._dispatch_block()
            return self._harvest(inflight)

        # pipelined: dispatch over the state staged last iteration
        nxt = (self._dispatch_block()
               if any(s.active for s in self.slots) else None)
        finished = []
        if self._inflight is not None:
            # transfer + host bookkeeping overlap the dispatched block
            finished = self._harvest(self._inflight)
        self._inflight = nxt
        # admissions (and capacity ops) enqueue AFTER the in-flight
        # block: the new rows join the NEXT dispatch
        self._admit()
        self._advance_chunks(drain=not any(s.active for s in self.slots))
        if any(s.active for s in self.slots):
            self._fit_capacity()
        return finished

    def cancel(self, request_id: int) -> bool:
        """Abandon a request wherever it currently lives — queued, mid
        chunked admission, actively decoding, or finished with an
        unread result — and free its slot at the host level (a decode
        block already dispatched with the row simply has it skipped at
        harvest, like a finished row; the device keeps junk-stepping it
        until the block ends, which is the same cost a completed row
        pays). Returns False when the id is unknown (never issued, or
        already delivered). Call from the thread that owns the server,
        like every other mutating method."""
        for i, (rid, _req, _sub, _wall) in enumerate(self.queue):
            if rid == request_id:
                del self.queue[i]
                return True
        for slot, st in list(self._chunks.items()):
            if st["rid"] == request_id:
                del self._chunks[slot]
                s = self.slots[slot]
                s.prefilling = False
                s.req = None
                s.request_id = -1
                s.phys_len = 0
                return True
        for s in self.slots:
            if s.active and s.request_id == request_id:
                s.active = False
                s.req = None
                s.request_id = -1
                s.generated = []
                s.lps = []
                return True
        return self.results.pop(request_id, None) is not None

    def busy(self) -> bool:
        """Work that needs another ``step()``: queued requests, active
        decode rows, or an in-progress chunked admission (whose slot is
        ``prefilling``, not active, and whose request has already left
        the queue — drive loops that only check queue/active would
        stall it forever). A pipelined in-flight block is NOT counted:
        ``flush()`` harvests that without stepping."""
        return bool(self.queue or self._chunks
                    or any(s.active for s in self.slots))

    def flush(self) -> List[Result]:
        """Harvest a still-in-flight pipelined block (no-op otherwise)."""
        if self._inflight is None:
            return []
        finished = self._harvest(self._inflight)
        self._inflight = None
        return finished

    def run_until_drained(self, max_iters: int = 10_000) -> Dict[int, Result]:
        for _ in range(max_iters):
            if not self.busy() and self._inflight is None:
                break
            self.step()
        self.flush()
        return self.results

    # -- admission / prefill ---------------------------------------------

    def _ctx(self):
        from contextlib import nullcontext

        return self.mesh if self.mesh is not None else nullcontext()

    # packed per-group metadata rows ([_META_ROWS, gb] int32 — ONE host
    # transfer instead of several; every host->device put is a round trip
    # on tunneled transports)
    _META = ("slot", "valid", "length", "greedy", "seed", "ctr")

    @staticmethod
    def _pmask_from_len(length, pb):
        """[G] lengths -> [G, pb] left-pad masks (derived in-jit; saves
        a [G, pb] transfer per group)."""
        j = jax.lax.broadcasted_iota(jnp.int32, (length.shape[0], pb), 1)
        return (j >= (pb - length)[:, None]).astype(jnp.float32)

    def _prefill_fn(self, pb: int, gb: int, g: int = 0):
        if (pb, gb, g) in self._prefill_cache:
            return self._prefill_cache[(pb, gb, g)]
        c, cl = self.gcfgs[g], self.caption_len
        sp2 = self.sp2_id

        @jax.jit
        def prefill(params, ids, meta, topp, temps, tts, img, aud,
                    cap_ids, cap_mask):
            length = meta[2]
            # group sampler key from the lead request's seed + admission
            # counter (derived in-jit; host-side key math costs a fetch)
            key = jax.random.fold_in(
                jax.random.PRNGKey(meta[4, 0]), meta[5, 0])
            cache = gpt2.init_kv_cache(c, gb, pb, caption_len=cl)
            pmask = self._pmask_from_len(length, pb)
            pos = jnp.maximum(jnp.cumsum(pmask, axis=-1) - 1, 0).astype(jnp.int32)
            out = gpt2.forward(
                params, c, ids,
                token_type_ids=tts if tts is not None
                else jnp.full((gb, pb), sp2, jnp.int32),
                position_ids=pos,
                attention_mask=pmask, cache=cache,
                imgs=img, auds=aud,
                caption_ids=cap_ids if cl and cap_ids is not None else None,
                encoder_attention_mask=cap_mask
                if cl and cap_mask is not None else None,
                prefix_prefill=True,  # fresh cache: index == 0
                # uniform right-aligned prompts: only the final position
                # is sampled — skip the [gb, pb, V] f32 logits
                compute_logits="last")
            logits = out.logits[:, -1, :]
            greedy_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            sampled = sample_top_p(
                logits / jnp.maximum(temps, 1e-6)[:, None], key,
                topp[:, None]).astype(jnp.int32)
            # first-token logprobs under the untempered full softmax
            lsm = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            lp_g = jnp.take_along_axis(lsm, greedy_tok[:, None], -1)[:, 0]
            lp_s = jnp.take_along_axis(lsm, sampled[:, None], -1)[:, 0]
            return (out.cache, greedy_tok, sampled, lp_g, lp_s,
                    out.emotion_logits)

        self._prefill_cache[(pb, gb, g)] = prefill
        return prefill

    def _join_fn(self, pb: int, gb: int, g: int = 0):
        """ONE program scattering a gb-row prefilled cache into gb slots
        — each row LEFT-ALIGNED into [0, len) of its slot (a
        take_along_axis gather undoes the prefill bucket's left-pad) —
        and updating every per-slot state row, including the slot's
        write cursor. Admission costs two device calls per group total.

        All updates are VECTORIZED scatters over the slot axis (pad rows
        carry slot index S, dropped by ``mode="drop"``): an unrolled
        per-row loop built a ~1000-op jaxpr whose trace+compile cost
        seconds per (pb, gb) combo.

        With tiered pools, ``g`` is the pool whose cache this join
        writes: meta carries GLOBAL slot indices; the cache scatter uses
        pool-LOCAL ones (global - pool offset), the per-slot row-state
        scatters stay global."""
        if (pb, gb, g) in self._join_cache:
            return self._join_cache[(pb, gb, g)]
        cl = self.caption_len
        spec = bool(self.spec_gamma)
        off = self.groups[g][0]
        S_all = self.S

        @jax.jit
        def join(cache, last, cap_mask_all,
                 greedy_all, topp_all, temp_all, first_all, first_lp_all,
                 emo_all, temp, emotion, greedy_tok, sampled_tok,
                 lp_g, lp_s, meta, topp_g, temps_g, cap_mask_g,
                 tokens_all, ids_g):
            (slots_g, valid_i, length_g, greedy_i, _seeds_g, _ctr_g) = meta
            valid_g = valid_i.astype(bool)
            greedy_flags_g = greedy_i.astype(bool)
            first = jnp.where(greedy_flags_g, greedy_tok, sampled_tok)
            # pad/invalid rows scatter to slot Sg (out of bounds -> drop);
            # cache scatters are pool-local, row-state scatters global
            slot_idx = jnp.where(valid_g, slots_g - off,
                                 cache.k.shape[1])
            glob_idx = jnp.where(valid_g, slots_g, S_all)

            # left-align: temp row g holds its prompt right-aligned at
            # [pb - len, pb); gather it to [0, len) (positions >= len
            # duplicate the last key — junk beyond the cursor, masked)
            src = jnp.clip(
                (pb - length_g)[:, None]
                + jax.lax.broadcasted_iota(jnp.int32, (gb, pb), 1),
                0, pb - 1)

            def scat_window(big, small):
                # big [L, S, H, T, Dm] <- small [L, gb, H, pb, Dm] rows,
                # left-aligned into the static [0, pb) window
                small = jnp.take_along_axis(
                    small, src[None, :, None, :, None], axis=3)
                win = big[:, :, :, :pb, :]
                win = win.at[:, slot_idx].set(small, mode="drop")
                return big.at[:, :, :, :pb, :].set(win)

            cache = cache._replace(
                k=scat_window(cache.k, temp.k),
                v=scat_window(cache.v, temp.v),
                index=cache.index.at[slot_idx].set(length_g, mode="drop"))
            if temp.k_scale is not None:
                cache = cache._replace(
                    k_scale=scat_window(cache.k_scale, temp.k_scale),
                    v_scale=scat_window(cache.v_scale, temp.v_scale))
            if cl and temp.ck is not None:
                cache = cache._replace(
                    ck=cache.ck.at[:, slot_idx].set(temp.ck, mode="drop"),
                    cv=cache.cv.at[:, slot_idx].set(temp.cv, mode="drop"))

            if spec:
                # token buffer: left-aligned prompt ids at [0, len)
                # (clip-duplicated tail junk is never read: lookups only
                # match windows strictly below the cursor)
                ids_aligned = jnp.take_along_axis(ids_g, src, axis=1)
                twin = tokens_all[:, :pb]
                twin = twin.at[glob_idx].set(ids_aligned, mode="drop")
                tokens_all = tokens_all.at[:, :pb].set(twin)

            last = last.at[glob_idx, 0].set(first, mode="drop")
            greedy_all = greedy_all.at[glob_idx].set(greedy_flags_g,
                                                     mode="drop")
            topp_all = topp_all.at[glob_idx].set(topp_g, mode="drop")
            temp_all = temp_all.at[glob_idx].set(temps_g, mode="drop")
            first_all = first_all.at[glob_idx].set(first, mode="drop")
            first_lp = jnp.where(greedy_flags_g, lp_g, lp_s)
            first_lp_all = first_lp_all.at[glob_idx].set(first_lp,
                                                         mode="drop")
            # emotion logits are defined at the PROMPT's last token
            # (Result contract)
            emo_all = emo_all.at[glob_idx].set(
                emotion.astype(emo_all.dtype), mode="drop")
            if cl:
                cap_mask_all = cap_mask_all.at[glob_idx].set(cap_mask_g,
                                                             mode="drop")
            return (cache, last, cap_mask_all,
                    greedy_all, topp_all, temp_all, first_all,
                    first_lp_all, emo_all, tokens_all)

        self._join_cache[(pb, gb, g)] = join
        return join

    def _admit_group(self, entries: List[tuple], pb: int, g: int = 0):
        """entries: (slot_idx, rid, req, submit_step, submit_wall), all
        in pool ``g``. One prefill + one join for the whole group; host
        transfers: ids + packed meta + top_p (+ optional
        tts/modality/caption arrays only when some request carries
        them)."""
        t0 = _time.time()
        G = len(entries)
        gb = _group_bucket(G, self.GROUP_CAP)
        cl = self.caption_len
        ids = np.full((gb, pb), self.eos_id, np.int32)
        meta = np.zeros((len(self._META), gb), np.int32)
        self._admit_ctr = getattr(self, "_admit_ctr", 0) + 1
        meta[5] = self._admit_ctr
        topp = np.full((gb,), 0.95, np.float32)
        temps = np.ones((gb,), np.float32)
        any_tts = any(e[2].token_type_ids is not None for e in entries)
        any_mod = any(e[2].img is not None or e[2].aud is not None
                      for e in entries)
        any_cap = cl and any(e[2].caption_ids for e in entries)
        tts = np.full((gb, pb), self.sp2_id, np.int32) if any_tts else None
        img = np.zeros((gb, self.mod_dim), np.float32) if any_mod else None
        aud = np.zeros((gb, self.mod_dim), np.float32) if any_mod else None
        cap_ids = np.full((gb, cl), self.eos_id, np.int32) if any_cap else None
        cap_mask = np.zeros((gb, max(cl, 1)), np.float32)

        for r, (slot_idx, rid, req, sub, wall) in enumerate(entries):
            ids_list = list(req.prompt_ids)
            Lp = len(ids_list)
            ids[r, pb - Lp:] = ids_list
            if req.token_type_ids is not None:
                tt = list(req.token_type_ids)
                tt = tt + [self.sp2_id] * (Lp - len(tt))
                tts[r, pb - Lp:] = tt[:Lp]
            if req.img is not None:
                img[r] = req.img
            if req.aud is not None:
                aud[r] = req.aud
            if cl and req.caption_ids:
                n = min(len(req.caption_ids), cl)
                cap_ids[r, :n] = req.caption_ids[:n]
                cap_mask[r, :n] = 1.0
            meta[:4, r] = (slot_idx, 1, Lp, int(bool(req.greedy)))
            meta[4, r] = req.seed
            topp[r] = float(req.top_p)
            temps[r] = float(req.temperature)
        # pad rows duplicate zeros with valid=0

        def put(x):
            return None if x is None else jnp.asarray(x)

        prefill = self._prefill_fn(pb, gb, g)
        ids_dev = jnp.asarray(ids)
        meta_dev, topp_dev, temps_dev, cap_mask_dev = (jnp.asarray(meta),
                                                       jnp.asarray(topp),
                                                       jnp.asarray(temps),
                                                       jnp.asarray(cap_mask))
        with self._ctx():
            temp, greedy_tok, sampled_tok, lp_g, lp_s, emotion = prefill(
                self.params, ids_dev, meta_dev, topp_dev, temps_dev,
                put(tts), put(img), put(aud), put(cap_ids),
                cap_mask_dev if any_cap else None)

            join = self._join_fn(pb, gb, g)
            (self.caches[g], self.last, self.cap_mask,
             self.greedy_row, self.top_p_row, self.temp_row,
             self.first_tok, self.first_lp, self.emo_slot,
             self.tokens) = join(
                self.caches[g], self.last, self.cap_mask,
                self.greedy_row, self.top_p_row, self.temp_row,
                self.first_tok, self.first_lp, self.emo_slot,
                temp, emotion, greedy_tok, sampled_tok, lp_g, lp_s,
                meta_dev, topp_dev, temps_dev, cap_mask_dev,
                self.tokens, ids_dev if self.spec_gamma else None)

        for slot_idx, rid, req, sub, wall in entries:
            s = self.slots[slot_idx]
            s.request_id = rid
            s.req = req
            s.submitted_step = sub
            s.submitted_wall = wall
            s.active = True
            s.admitted_step = self.server_step
            s.admitted_block = self._block_ctr
            s.generated = []
            s.lps = []
            s.has_first = False
            s.phys_len = len(req.prompt_ids)
        self._tick("admit", t0)

    EXT_BUCKET = 16  # delta-width quantum for session-extension prefills

    def _extend_fn(self, pbd: int, g: int = 0):
        """Session-continuation program: ONE forward over pool ``g``'s
        Sg slots, pbd positions wide, against the LIVE pool cache — each
        extending row's delta attends to its retained history via the
        per-row shifted-causal visibility (kpos <= start + j, the same
        mechanism the speculative verify uses), writes K/V at
        [start, start+dlen), and resets its cursor to start+dlen.
        Non-extending rows run junk at their own cursor (written ABOVE
        their content — invisible, overwritten by later decode steps,
        dropped past capacity), so no gather/scatter of cache rows is
        needed at all. Per-slot row state stays GLOBAL: the program
        slices its pool's rows at a static offset and writes the slice
        back."""
        key = (self.Tphys[g], "ext", pbd, g)
        if key in self._decode_cache:
            return self._decode_cache[key]
        c, cl = self.gcfgs[g], self.caption_len
        off, Sg = self.groups[g]
        spec = bool(self.spec_gamma)
        b_ix = jnp.arange(Sg)

        @jax.jit
        def extend(params, cache, last_all, greedy_g_all, topp_all,
                   temp_all, first_all, first_lp_all, emo_all,
                   tokens_g_all, cap_mask_all, ids, tts, meta, topp_g,
                   temps_g):
            ext = meta[0].astype(bool)
            start, dlen = meta[1], meta[2]
            greedy_i = meta[3].astype(bool)
            orig_index = cache.index
            vis = jnp.where(ext, start, orig_index)
            pos = jnp.minimum(vis[:, None] + jnp.arange(pbd)[None, :],
                              c.n_positions - 1)
            out = gpt2.forward(
                params, c, ids, token_type_ids=tts, position_ids=pos,
                cache=cache._replace(index=vis),
                encoder_attention_mask=(cap_mask_all[off:off + Sg]
                                        if cl else None),
                seq_lengths=jnp.clip(dlen, 1, pbd),
                # per-row last positions vary (ragged deltas): gather
                # the [Sg, D] last-hidden rows and run lm_head on them
                # instead of materializing [Sg, pbd, V] f32 logits
                compute_logits=False)
            cache = out.cache._replace(
                index=jnp.where(ext, start + dlen, orig_index))
            jlast = jnp.clip(dlen - 1, 0, pbd - 1)
            h_last = jnp.take_along_axis(
                out.hidden, jlast[:, None, None], axis=1)  # [Sg, 1, D]
            logits = gpt2.lm_logits(params, h_last)[:, 0]  # [Sg, V]
            gkey = jax.random.fold_in(
                jax.random.PRNGKey(jnp.sum(meta[4])), meta[5, 0])
            sampled = sample_top_p(
                logits / jnp.maximum(temps_g, 1e-6)[:, None], gkey,
                topp_g[:, None]).astype(jnp.int32)
            first = jnp.where(greedy_i,
                              jnp.argmax(logits, -1).astype(jnp.int32),
                              sampled)
            lsm = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            first_lp = jnp.take_along_axis(lsm, first[:, None], -1)[:, 0]
            last = last_all[off:off + Sg]
            greedy_all = greedy_g_all[off:off + Sg]
            topp_slice = topp_all[off:off + Sg]
            temp_slice = temp_all[off:off + Sg]
            first_slice = first_all[off:off + Sg]
            flp_slice = first_lp_all[off:off + Sg]
            emo_slice = emo_all[off:off + Sg]
            last = jnp.where(ext[:, None], first[:, None], last)
            greedy_all = jnp.where(ext, greedy_i, greedy_all)
            topp_slice = jnp.where(ext, topp_g, topp_slice)
            temp_slice = jnp.where(ext, temps_g, temp_slice)
            first_slice = jnp.where(ext, first, first_slice)
            flp_slice = jnp.where(ext, first_lp, flp_slice)
            emo_slice = jnp.where(ext[:, None],
                                  out.emotion_logits.astype(emo_all.dtype),
                                  emo_slice)
            last_all = last_all.at[off:off + Sg].set(last)
            greedy_g_all = greedy_g_all.at[off:off + Sg].set(greedy_all)
            topp_all = topp_all.at[off:off + Sg].set(topp_slice)
            temp_all = temp_all.at[off:off + Sg].set(temp_slice)
            first_all = first_all.at[off:off + Sg].set(first_slice)
            first_lp_all = first_lp_all.at[off:off + Sg].set(flp_slice)
            emo_all = emo_all.at[off:off + Sg].set(emo_slice)
            if spec:
                tokens_all = tokens_g_all[off:off + Sg]
                j = jnp.arange(pbd)[None, :]
                t_ix = jnp.clip(start[:, None] + j, 0,
                                tokens_all.shape[1] - 1)
                cur = tokens_all[b_ix[:, None], t_ix]
                neww = jnp.where(ext[:, None] & (j < dlen[:, None]),
                                 ids, cur)
                tokens_all = tokens_all.at[b_ix[:, None], t_ix].set(neww)
                tokens_g_all = tokens_g_all.at[off:off + Sg].set(tokens_all)
            return (cache, last_all, greedy_g_all, topp_all, temp_all,
                    first_all, first_lp_all, emo_all, tokens_g_all)

        self._decode_cache[key] = extend
        return extend

    def _admit_ext_group(self, entries: List[dict], pbd: int, g: int = 0):
        """entries: dicts with slot/start/ids/tts/req/rid/sub/wall/final,
        all in pool ``g``. One device call extends every row in the
        group against the LIVE pool cache: session continuations re-feed
        the parked final token (its K/V write was not guaranteed at park
        time) followed by the prompt's new tokens; chunked admissions
        feed their next prompt slice. A non-final chunk leaves the slot
        in ``prefilling`` (the program's sampled outputs are mid-prompt
        garbage that the next chunk overwrites); the final chunk
        activates the slot for decode, so its sampled first token and
        emotion logits are the real ones."""
        t0 = _time.time()
        off, Sg = self.groups[g]
        cl = self.caption_len
        ids = np.full((Sg, pbd), self.eos_id, np.int32)
        tts = np.full((Sg, pbd), self.sp2_id, np.int32)
        meta = np.zeros((6, Sg), np.int32)  # ext, start, dlen, greedy, seed, ctr
        self._admit_ctr = getattr(self, "_admit_ctr", 0) + 1
        meta[5] = self._admit_ctr
        topp = np.full((Sg,), 0.95, np.float32)
        temps = np.ones((Sg,), np.float32)
        for e in entries:
            i, d = e["slot"] - off, len(e["ids"])
            ids[i, :d] = e["ids"]
            if e["tts"] is not None:
                tts[i, :d] = e["tts"][:d]
            meta[0, i] = 1
            meta[1, i] = e["start"]
            meta[2, i] = d
            meta[3, i] = int(bool(e["req"].greedy))
            meta[4, i] = e["req"].seed
            topp[i] = float(e["req"].top_p)
            temps[i] = float(e["req"].temperature)
        extend = self._extend_fn(pbd, g)
        with self._ctx():
            (self.caches[g], self.last, self.greedy_row, self.top_p_row,
             self.temp_row, self.first_tok, self.first_lp, self.emo_slot,
             self.tokens) = extend(
                self.params, self.caches[g], self.last, self.greedy_row,
                self.top_p_row, self.temp_row, self.first_tok,
                self.first_lp, self.emo_slot, self.tokens,
                self.cap_mask if cl else None,
                jnp.asarray(ids), jnp.asarray(tts), jnp.asarray(meta),
                jnp.asarray(topp), jnp.asarray(temps))
        for e in entries:
            s = self.slots[e["slot"]]
            s.request_id = e["rid"]
            s.req = e["req"]
            s.submitted_step = e["sub"]
            s.submitted_wall = e["wall"]
            if e["final"]:
                s.active = True
                s.prefilling = False
                s.admitted_step = self.server_step
                s.admitted_block = self._block_ctr
                s.generated = []
                s.lps = []
                s.has_first = False
                s.phys_len = len(e["req"].prompt_ids)
                self._chunks.pop(e["slot"], None)
            else:
                s.prefilling = True
                s.phys_len = e["start"] + len(e["ids"])
        self._tick("admit_ext", t0)

    def _advance_chunks(self, drain: bool) -> None:
        """Push the next slice of every in-progress chunked admission —
        ONE chunk per server step, which is exactly the interference
        bound: concurrent decode streams see at most one chunk-wide
        extension forward between blocks. With ``drain`` (nothing is
        decoding), loop until every chunk is done — interleaving buys
        nothing when no other stream is running."""
        while self._chunks:
            by_pbd: Dict[tuple, List[dict]] = {}  # (pbd, pool) -> entries
            for slot, st in list(self._chunks.items()):
                if st.pop("skip_once", None):
                    # fresh chunked admission: chunk 1 already ran this
                    # step via the prefill path — keep the one-chunk-
                    # per-step interference bound
                    continue
                ids, off = st["ids"], st["off"]
                dlen = min(self.prefill_chunk, len(ids) - off)
                e = {"slot": slot, "start": st["base"] + off,
                     "ids": ids[off:off + dlen],
                     "tts": (st["tts"][off:off + dlen]
                             if st["tts"] is not None else None),
                     "req": st["req"], "rid": st["rid"], "sub": st["sub"],
                     "wall": st["wall"],
                     "final": off + dlen == len(ids)}
                st["off"] = off + dlen
                by_pbd.setdefault(
                    (_bucket(dlen, self.EXT_BUCKET),
                     self._slot_group(slot)), []).append(e)
            for g in range(len(self.groups)):
                need = self._capacity_need(g)
                for (_pbd, eg), entries in by_pbd.items():
                    if eg == g:
                        need = max(need, max(e["start"] + len(e["ids"])
                                             for e in entries)
                                   + self._per_block_writes() + 1)
                need = self._phys_for(need)
                if need > self.Tphys[g]:
                    self._grow_cache(g, need)
            for (pbd, g), entries in by_pbd.items():
                self._admit_ext_group(entries, pbd, g)
            if not drain:
                break

    def _route(self, req: Request) -> int:
        """Pool a fresh admission prefers: the long pool iff the row's
        expected FINAL length (prompt + max_new - 1, known at submit)
        exceeds long_threshold, or the request pins itself with
        Request.pool."""
        if not self.long_slots:
            return 0
        if req.pool == "long":
            return 1
        if req.pool == "short":
            return 0
        return (1 if len(req.prompt_ids) + req.max_new_tokens - 1
                > self.long_threshold else 0)

    def _take_free_slot(self, protected, taken, g: int = 0) -> Optional[int]:
        """A truly free slot, or an LRU-evicted parked one (sessions a
        queued request still references are protected — a continuation
        already admitted past submit() must find its prefix intact).
        ``taken`` holds slots already assigned in THIS admission pass
        (they are only marked active after their group program runs).

        Pool policy: prefer pool ``g``; SHORT requests overflow into
        idle long slots when the short pool is exhausted (an idle long
        pool sits at a low rung, so they cost little there), but long
        requests never take short slots — one long row would widen the
        narrow rung every short slot reads. Free slots anywhere beat
        evicting a parked session."""
        pools = [g]
        if self.long_slots and g == 0:
            pools.append(1)
        for p in pools:
            for i in self._group_slots(p):
                s = self.slots[i]
                if (not s.active and not s.parked and not s.prefilling
                        and i not in taken):
                    taken.add(i)
                    return i
        for p in pools:
            cands = [(self.slots[i].last_use, i) for i in self._group_slots(p)
                     if self.slots[i].parked
                     and self.slots[i].session not in protected
                     and i not in taken]
            if cands:
                _, idx = min(cands)
                self._unpark(idx)
                taken.add(idx)
                return idx
        return None

    def _session_ext_entry(self, slot_idx, rid, req, sub, wall, log, d):
        """The generalized extension entry for a session continuation:
        delta = the re-fed parked final token + the prompt's new tokens
        (the new tokens keep their request token types; the re-fed
        token keeps sp2 — it was generated)."""
        delta = [log[-1]] + list(req.prompt_ids[len(log):])
        if req.token_type_ids is not None:
            tt = list(req.token_type_ids)[-(d - 1):] if d > 1 else []
            dtts = [self.sp2_id] + tt
            dtts += [self.sp2_id] * (len(delta) - len(dtts))
        else:
            dtts = None
        return {"slot": slot_idx, "start": len(log) - 1, "ids": delta,
                "tts": dtts, "req": req, "rid": rid, "sub": sub,
                "wall": wall, "final": True}

    def _admit(self):
        if not self.queue:
            return
        if self.admit_policy == "sorted" and len(self.queue) > 1:
            self.queue.sort(key=lambda q: -q[1].max_new_tokens)
        by_pb: Dict[tuple, List[tuple]] = {}   # (pb, pool) fresh prefills
        by_ext: Dict[tuple, List[dict]] = {}   # (pbd, pool) session deltas
        deferred: List[tuple] = []
        claimed: set = set()  # sessions extended in THIS pass
        taken: set = set()    # slots assigned in THIS pass
        chunk_first: List[tuple] = []  # (slot, real req) of chunked fresh
        protected = {q[1].session_id for q in self.queue if q[1].session_id}
        for rid, req, sub, wall in self.queue:
            sid = req.session_id
            if sid and (sid in claimed or any(
                    (s.active or s.prefilling) and s.req is not None
                    and s.req.session_id == sid for s in self.slots)):
                # the session's previous turn is still decoding (or
                # chunk-prefilling); its continuation waits for the park
                deferred.append((rid, req, sub, wall))
                continue
            d = self._session_delta(req)
            if d is not None and (d <= self.max_prompt or self.prefill_chunk):
                slot_idx = self.sessions[sid]
                s = self.slots[slot_idx]
                log = list(s.token_log)
                self._unpark(slot_idx)  # claimed for the continuation
                claimed.add(sid)
                taken.add(slot_idx)
                e = self._session_ext_entry(slot_idx, rid, req, sub, wall,
                                            log, d)
                if self.prefill_chunk and d > self.prefill_chunk:
                    # long continuation delta: admit it in chunks too
                    self._chunks[slot_idx] = {
                        "rid": rid, "req": req, "sub": sub, "wall": wall,
                        "ids": e["ids"], "tts": e["tts"], "off": 0,
                        "base": e["start"]}
                    s.prefilling = True  # reserved before the 1st chunk
                    s.req = req
                    continue
                by_ext.setdefault(
                    (_bucket(d, self.EXT_BUCKET),
                     self._slot_group(slot_idx)), []).append(e)
                continue
            if sid and sid in self.sessions:
                # prefix mismatch (conversation diverged/restarted):
                # the parked content is useless — free it for reuse
                self._unpark(self.sessions[sid])
            slot_idx = self._take_free_slot(protected, taken,
                                            self._route(req))
            if slot_idx is None:
                deferred.append((rid, req, sub, wall))
                continue
            grp = self._slot_group(slot_idx)
            Lp = len(req.prompt_ids)
            if self.prefill_chunk and Lp > self.prefill_chunk:
                # chunked fresh admission: chunk 1 rides the prefill
                # path (it carries the modality injection and caption
                # K/V); the rest rides the extension program
                C = self.prefill_chunk
                if req.token_type_ids is not None:
                    full_tt = (list(req.token_type_ids)
                               + [self.sp2_id] * Lp)[:Lp]
                else:
                    full_tt = None
                pseudo = dataclasses.replace(
                    req, prompt_ids=list(req.prompt_ids[:C]),
                    token_type_ids=(full_tt[:C] if full_tt is not None
                                    else None))
                self._chunks[slot_idx] = {
                    "rid": rid, "req": req, "sub": sub, "wall": wall,
                    "ids": list(req.prompt_ids), "tts": full_tt,
                    "off": C, "base": 0, "skip_once": True}
                chunk_first.append((slot_idx, req))
                by_pb.setdefault((_bucket(C, self.prompt_bucket), grp),
                                 []).append((slot_idx, rid, pseudo, sub, wall))
                continue
            pb = _bucket(Lp, self.prompt_bucket)
            by_pb.setdefault((pb, grp), []).append(
                (slot_idx, rid, req, sub, wall))
        self.queue = deferred
        if not by_pb and not by_ext:
            return
        # joins write the static [0, pb) window, extensions write up to
        # the full continuation length — capacity must cover both
        # BEFORE the first program runs
        for g in range(len(self.groups)):
            need = self._capacity_need(g)
            pbs = [pb for (pb, pg) in by_pb if pg == g]
            if pbs:
                need = max(need, max(pbs) + self._per_block_writes() + 1)
            for (_pbd, pg), entries in by_ext.items():
                if pg == g:
                    need = max(need,
                               max(e["start"] + len(e["ids"])
                                   for e in entries)
                               + self._per_block_writes() + 1)
            need = self._phys_for(need)
            if need > self.Tphys[g]:
                self._grow_cache(g, need)
        for (pb, g), entries in by_pb.items():
            for i in range(0, len(entries), self.GROUP_CAP):
                self._admit_group(entries[i:i + self.GROUP_CAP], pb, g)
        for (pbd, g), entries in by_ext.items():
            self._admit_ext_group(entries, pbd, g)
        for slot_idx, req in chunk_first:
            # the group program prefilled chunk 1 and activated the
            # slot; demote it back to prefilling until the last chunk
            s = self.slots[slot_idx]
            s.active = False
            s.prefilling = True
            s.req = req  # the REAL request (the group saw the pseudo)

    # -- decode -----------------------------------------------------------

    def _pick_block_len(self) -> int:
        """Drain-aware block length. A general finish-aware scorer
        (useful tokens per wall second over the ladder, online-fit
        costs) was built and MEASURED WORSE on the offline mix (85.8 vs
        95.8 utt/s, results/server_bench.jsonl adaptive A/B): shrinking
        mid-stream blocks reclaims junk slots but fragments admission
        into more refill waves, each paying a full padded prefill
        program — the prefill fragmentation out-costs the junk saved.
        What survives is the DRAIN case: with an empty queue and no
        pending chunks there is nothing to refill, so the final blocks
        of a burst shrink to the smallest ladder length covering the
        longest remaining budget — pure junk-step saving (stop
        sequences only end rows earlier, so remaining is a safe upper
        bound)."""
        if not self.adaptive_block or self.queue or self._chunks:
            return self.sync_every
        max_rem = 0
        for s in self.slots:
            if s.active:
                r = s.req.max_new_tokens - len(s.generated)
                if not s.has_first:
                    r -= 1  # the prefill token arrives at this harvest
                max_rem = max(max_rem, r)
        if max_rem <= 0:
            # every active slot is only awaiting its prefill-token
            # harvest — the whole block is junk steps, so dispatch the
            # smallest ladder entry, not a maximal block
            return self._block_ladder[-1]
        for n in reversed(self._block_ladder):  # smallest first
            if n >= max_rem:
                return n
        return self.sync_every

    def _decode_fn(self, all_greedy: bool, actives: tuple,
                   want_lp: bool = False, block_len: Optional[int] = None):
        # one specialization per (capacity rungs, included pools,
        # all-greedy) triple: when every active row is greedy the block
        # skips the nucleus sampler entirely (an approx-top-k +
        # full-vocab logsumexp per step — measured ~20% of the
        # all-greedy step; ``generate`` has the same greedy
        # specialization, so benches were asymmetric). Pools with no
        # active row are EXCLUDED: their cache/last pass through
        # untouched, so a tiered server with no long rows runs exactly
        # the single-pool program over the short pool.
        # The rng chain is not consumed by greedy blocks; sampled
        # streams are scheduler-dependent by design either way.
        if block_len is None:
            block_len = self.sync_every
        key = (tuple(self.Tphys), actives, all_greedy, want_lp, block_len)
        if key in self._decode_cache:
            return self._decode_cache[key]
        c, S, cl = self.cfg, self.S, self.caption_len
        gcfgs = self.gcfgs
        K = block_len
        groups = self.groups
        inc = [g for g in range(len(groups)) if actives[g]]

        @jax.jit
        def decode_block(params, caches, last, cap_mask,
                         rng, greedy_row, top_p_row, temp_row):
            def body(i, st):
                caches, last, rng, toks, lps = st
                logits_parts = []
                new_caches = list(caches)
                for g in inc:
                    off, Sg = groups[g]
                    cache = caches[g]
                    # per-slot cursors: cache.index[i] IS slot i's
                    # logical length; visibility (kpos <= index) is
                    # enforced inside the cached attention — no mask
                    # array at all. Quantized caches write K/V into the
                    # staging buffers at the uniform step index i (see
                    # KVCache.sk); the flush below commits them to the
                    # main cache once per block. bf16 caches scatter
                    # per step (sk=None; measured faster, see below).
                    pos = jnp.minimum(cache.index,
                                      c.n_positions - 1)[:, None]
                    out = gpt2.forward(
                        params, gcfgs[g], last[off:off + Sg],
                        token_type_ids=jnp.full((Sg, 1), self.sp2_id,
                                                jnp.int32),
                        position_ids=pos, cache=cache, stage_index=i,
                        encoder_attention_mask=(cap_mask[off:off + Sg]
                                                if cl else None))
                    logits_parts.append(out.logits[:, -1, :])
                    new_caches[g] = out.cache
                logits = jnp.concatenate(logits_parts, axis=0)
                if all_greedy:
                    nxt = jnp.argmax(logits, -1)
                else:
                    rng, sub = jax.random.split(rng)
                    # ONE batched sampler call with per-row top_p
                    # (vmapping per-slot keys ran 64 tiny top-k/RNG ops
                    # per step)
                    topp_inc = jnp.concatenate(
                        [top_p_row[groups[g][0]:groups[g][0] + groups[g][1]]
                         for g in inc])
                    temp_inc = jnp.concatenate(
                        [temp_row[groups[g][0]:groups[g][0] + groups[g][1]]
                         for g in inc])
                    greedy_inc = jnp.concatenate(
                        [greedy_row[groups[g][0]:groups[g][0] + groups[g][1]]
                         for g in inc])
                    sampled = sample_top_p(
                        logits / jnp.maximum(temp_inc, 1e-6)[:, None],
                        sub, topp_inc[:, None])
                    nxt = jnp.where(greedy_inc, jnp.argmax(logits, -1),
                                    sampled)
                nxt = nxt.astype(jnp.int32)
                if want_lp:
                    # emitted-token logprobs (untempered full softmax);
                    # a separate specialization so logprob-free traffic
                    # never pays the log_softmax
                    lsm = jax.nn.log_softmax(
                        logits.astype(jnp.float32), axis=-1)
                    lp = jnp.take_along_axis(lsm, nxt[:, None], -1)[:, 0]
                # scatter included pools' tokens back to global slot
                # order; excluded pools keep their pending token
                nxt_full = last[:, 0]
                lp_full = jnp.zeros((S,), jnp.float32)
                row0 = 0
                for g in inc:
                    off, Sg = groups[g]
                    nxt_full = nxt_full.at[off:off + Sg].set(
                        nxt[row0:row0 + Sg])
                    if want_lp:
                        lp_full = lp_full.at[off:off + Sg].set(
                            lp[row0:row0 + Sg])
                    row0 += Sg
                toks = toks.at[i].set(nxt_full)
                if want_lp:
                    lps = lps.at[i].set(lp_full)
                return (tuple(new_caches), nxt_full[:, None], rng, toks,
                        lps)

            toks = jnp.zeros((K, S), jnp.int32)
            lps0 = jnp.zeros((K, S), jnp.float32)
            # staged block decode for QUANTIZED caches: per-group
            # staging buffers, flushed into the main cache once after
            # the K steps — quantizing once per block instead of the
            # per-step int8 scatter that measured ~80x the bf16 step
            # (round 3's server-int8 blocker, now gone). bf16 caches
            # keep the per-step row scatter: the staged path's
            # per-layer-step concat of main+staging K/V materializes a
            # copy of the whole cache, measured WORSE than the scatter
            # it saves (74.4 vs 95.8 utt/s offline S=64,
            # results/server_bench.jsonl staged A/B).
            # ERGM_SERVER_STAGED=1/0 overrides the gate for A/B runs
            _ov = _os.environ.get("ERGM_SERVER_STAGED")
            staged_gs = [g for g in inc
                         if (gcfgs[g].kv_cache_dtype in ("int8", "int4")
                             if _ov is None
                             else _ov not in ("0", "false"))]
            caches = list(caches)
            for g in staged_gs:
                off, Sg = groups[g]
                sshape = (c.n_layer, Sg, c.n_head, K, c.head_dim)
                caches[g] = caches[g]._replace(
                    sk=jnp.zeros(sshape, c.compute_dtype),
                    sv=jnp.zeros(sshape, c.compute_dtype))
            st = (tuple(caches), last, rng, toks, lps0)
            caches, last, rng, toks, lps0 = lax.fori_loop(0, K, body, st)
            if staged_gs:
                caches = [gpt2.flush_staging(ch, K, gcfgs[gi])
                          for gi, ch in enumerate(caches)]
            return tuple(caches), last, rng, toks, lps0

        self._decode_cache[key] = decode_block
        return decode_block

    def _spec_decode_fn(self, actives: tuple):
        """One specialization per capacity rung: sync_every MACRO steps,
        each = device prompt-lookup draft (gamma proposals per slot from
        the most recent earlier occurrence of the last spec_ngram
        tokens) + ONE verify forward over gamma+1 positions + exact
        greedy acceptance. Per-slot cursors advance by the accepted
        prefix + 1 (1..gamma+1), so emitted tokens are ALWAYS a prefix
        of the verify argmaxes y — the host just takes cnt[m, s] tokens
        of y[m, s]."""
        key = (tuple(self.Tphys), actives, "spec")
        if key in self._decode_cache:
            return self._decode_cache[key]
        c, cl = self.cfg, self.caption_len
        M, G, N = self.sync_every, self.spec_gamma, self.spec_ngram
        Tcap = self.T
        W = Tcap - N - G  # candidate window starts (static)
        groups = self.groups
        inc = [g for g in range(len(groups)) if actives[g]]
        S = self.S

        @jax.jit
        def spec_block(params, caches, last, tokens, cap_mask):
            def macro(m, st):
                caches, last, tokens, out_toks, out_cnt = st
                new_caches = list(caches)
                for g in inc:
                    off, Sg = groups[g]
                    cache = caches[g]
                    b_ix = jnp.arange(Sg)
                    tok_g = tokens[off:off + Sg]          # [Sg, T]
                    last_g = last[off:off + Sg]           # [Sg, 1]
                    idx = cache.index                     # [Sg]
                    # record the pending token at its position
                    tok_g = tok_g.at[b_ix, jnp.clip(idx, 0, Tcap - 1)].set(
                        last_g[:, 0])
                    # lookup key: the last N consumed tokens (ends at idx)
                    key_pos = jnp.clip(
                        idx[:, None] - (N - 1) + jnp.arange(N)[None, :],
                        0, Tcap - 1)
                    kkey = tok_g[b_ix[:, None], key_pos]  # [Sg, N]
                    eq = jnp.ones((Sg, W), bool)
                    for j in range(N):
                        eq &= tok_g[:, j:j + W] == kkey[:, j:j + 1]
                    tpos = jnp.arange(W)[None, :]
                    # window must END strictly before this occurrence
                    eq &= tpos + N - 1 < idx[:, None]
                    eq &= (idx >= N)[:, None]
                    found = jnp.any(eq, axis=1)
                    t_star = jnp.where(
                        found, W - 1 - jnp.argmax(eq[:, ::-1], axis=1), 0)
                    prop_pos = t_star[:, None] + N + jnp.arange(G)[None, :]
                    props = tok_g[b_ix[:, None], prop_pos]  # [Sg, G]
                    # no match: propose the pending token repeated (free
                    # to verify; rejection keeps exactness)
                    props = jnp.where(found[:, None], props, last_g)
                    tok_g = tok_g.at[
                        b_ix[:, None],
                        jnp.clip(idx[:, None] + 1 + jnp.arange(G)[None, :],
                                 0, Tcap - 1)].set(props)
                    # ONE verify forward over [pending, props]
                    inp = jnp.concatenate([last_g, props], axis=1)
                    pos = jnp.minimum(
                        idx[:, None] + jnp.arange(G + 1)[None, :],
                        c.n_positions - 1)
                    out = gpt2.forward(
                        params, c, inp,
                        token_type_ids=jnp.full((Sg, G + 1), self.sp2_id,
                                                jnp.int32),
                        position_ids=pos, cache=cache,
                        encoder_attention_mask=(cap_mask[off:off + Sg]
                                                if cl else None))
                    y = jnp.argmax(out.logits, -1).astype(jnp.int32)
                    match = props == y[:, :G]
                    a = jnp.where(jnp.all(match, axis=1), G,
                                  jnp.argmin(match.astype(jnp.int32),
                                             axis=1))
                    cnt = a + 1  # emitted = y[:, :cnt]
                    new_last = jnp.take_along_axis(y, a[:, None], axis=1)
                    # roll the cursor back to the accepted prefix (the
                    # junk K/V above it is invisible, overwritten later)
                    new_caches[g] = out.cache._replace(index=idx + cnt)
                    tokens = tokens.at[off:off + Sg].set(tok_g)
                    last = last.at[off:off + Sg].set(new_last)
                    out_toks = out_toks.at[m, off:off + Sg].set(y)
                    out_cnt = out_cnt.at[m, off:off + Sg].set(
                        cnt.astype(jnp.int32))
                return (tuple(new_caches), last, tokens, out_toks, out_cnt)

            out_toks = jnp.zeros((M, S, G + 1), jnp.int32)
            out_cnt = jnp.zeros((M, S), jnp.int32)
            st = (caches, last, tokens, out_toks, out_cnt)
            return lax.fori_loop(0, M, macro, st)

        self._decode_cache[key] = spec_block
        return spec_block

    def _dispatch_block(self):
        """Enqueue one decode block; returns the in-flight handle
        (block id + kind + device arrays). For plain blocks the per-slot
        cursor mirrors advance here (the device cursors move whether or
        not the host has harvested yet); speculative blocks advance a
        VARIABLE per-slot amount, so their mirrors update at harvest
        from the fetched counts (spec mode is synchronous-only, so the
        mirror is exact again before the next dispatch)."""
        all_greedy = all(s.req.greedy for s in self.slots if s.active)
        want_lp = any(s.active and s.req.logprobs for s in self.slots)
        # spec macro steps have no per-token logit fetch path; logprob
        # rows ride the plain block instead (same fallback shape as the
        # mixed-sampler case)
        spec = bool(self.spec_gamma) and all_greedy and not want_lp
        # pools with no active row are excluded from the block program
        # (their cache/last pass through untouched)
        actives = tuple(any(self.slots[i].active for i in self._group_slots(g))
                        for g in range(len(self.groups)))
        t0 = _time.time()
        caches = tuple(self.caches)
        if spec:
            n = self.sync_every
            decode = self._spec_decode_fn(actives)
            with self._ctx():
                (caches, self.last, self.tokens, toks, cnts) = decode(
                    self.params, caches, self.last, self.tokens,
                    self.cap_mask if self.caption_len else None)
            lps = None
        else:
            n = self._pick_block_len()
            decode = self._decode_fn(all_greedy, actives, want_lp, n)
            with self._ctx():
                (caches, self.last, self.rng, toks, lps) = decode(
                    self.params, caches, self.last,
                    self.cap_mask if self.caption_len else None,
                    self.rng, self.greedy_row, self.top_p_row,
                    self.temp_row)
            cnts = None
            if not want_lp:
                lps = None
        self.caches = list(caches)
        self.block_len_hist[n] = self.block_len_hist.get(n, 0) + 1
        self._tick("block_dispatch", t0)
        block_id = self._block_ctr
        self._block_ctr += 1
        self.server_step += 1
        if not spec:
            for s in self.slots:
                if s.active:
                    s.phys_len += n
        return (block_id, spec, toks, cnts, lps, self.first_tok,
                self.first_lp, self.emo_slot, n)

    def _harvest(self, inflight) -> List[Result]:
        """Fetch one block's outputs (the block's ONE host round trip)
        and do the token bookkeeping. Skips slots admitted after the
        block was dispatched (pipelined mode: their tokens start in the
        NEXT block)."""
        block_id, spec, toks, cnts, lps, first_tok, first_lp = inflight[:7]
        emo_slot, blk_n = inflight[7:9]
        t0 = _time.time()
        toks_h, cnts_h, lps_h, first_h, flp_h, emo_h = jax.device_get(
            (toks, cnts, lps, first_tok, first_lp, emo_slot))
        t0 = self._tick("block_wait", t0)
        finished = []
        for i, s in enumerate(self.slots):
            if not s.active or s.admitted_block > block_id:
                continue
            n_before = len(s.generated)
            track_lp = s.req.logprobs and lps_h is not None
            if not s.has_first:
                s.generated = [int(first_h[i])]
                s.lps = [float(flp_h[i])] if s.req.logprobs else []
                s.has_first = True
            if spec:
                for m in range(self.sync_every):
                    c = int(cnts_h[m, i])
                    s.phys_len += c
                    self.spec_proposed += self.spec_gamma
                    self.spec_accepted += c - 1
                    for k in range(c):
                        if self._done(s):
                            break
                        s.generated.append(int(toks_h[m, i, k]))
            else:
                for k in range(blk_n):
                    if self._done(s):
                        break
                    s.generated.append(int(toks_h[k, i]))
                    if track_lp:
                        s.lps.append(float(lps_h[k, i]))
            done = self._done(s)
            if s.req.stream_cb is not None:
                new = s.generated[n_before:]
                if new or done:
                    s.req.stream_cb(s.request_id, new, done)
            if done:
                finished.append(self._finish(i, emo_h[i]))
        self._tick("harvest", t0)
        return finished

    def _done(self, s: _Slot) -> bool:
        if not s.generated:
            return False
        if (s.generated[-1] == self.eos_id
                or len(s.generated) >= s.req.max_new_tokens
                or (len(s.req.prompt_ids) + len(s.generated)
                    >= self.cfg.n_positions)):
            return True
        if s.req.stop:
            g = s.generated
            for seq in s.req.stop:
                n = len(seq)
                if n and len(g) >= n and g[-n:] == seq:
                    return True
        return False

    def _finish(self, slot_idx: int, emotion: np.ndarray) -> Result:
        s = self.slots[slot_idx]
        res = Result(request_id=s.request_id, tokens=list(s.generated),
                     emotion_logits=np.asarray(emotion),
                     steps_waited=s.admitted_step - s.submitted_step,
                     latency_s=_time.time() - s.submitted_wall,
                     logprobs=(list(s.lps[:len(s.generated)])
                               if s.req is not None and s.req.logprobs
                               else None))
        self.results[s.request_id] = res
        s.active = False
        if s.req is not None and s.req.session_id:
            # park: keep the slot's KV for the session's next turn. The
            # LAST emitted token's K/V write is not guaranteed (it may
            # sit pending when the block ends), so the continuation
            # re-feeds it — token_log records everything consumed OR
            # emitted; cache reliably holds token_log[:-1].
            sid = s.req.session_id
            old = self.sessions.get(sid)
            if old is not None and old != slot_idx:
                self._unpark(old)  # same session finished again elsewhere
            s.parked = True
            s.session = sid
            s.token_log = list(s.req.prompt_ids) + list(s.generated)
            s.phys_len = len(s.token_log)
            s.last_use = self._block_ctr
            self.sessions[sid] = slot_idx
        s.req = None
        s.generated = []
        s.lps = []
        s.has_first = False
        return res

    def _unpark(self, slot_idx: int) -> None:
        s = self.slots[slot_idx]
        if s.session is not None:
            self.sessions.pop(s.session, None)
        s.parked = False
        s.session = None
        s.token_log = []
