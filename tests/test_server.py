"""Continuous-batching server tests (ergm_tpu/infer/server.py).

Load-bearing property: greedy decode THROUGH THE SERVER — requests
joining mid-stream into slots with per-slot write cursors, across
capacity-rung grows and shrinks — emits byte-identical continuations to
plain ``generate`` on the same prompts. The left-aligning join gather,
per-row cursor scatter writes, tail-mask visibility, and position ids
are all on that path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ergm_tpu.core.config import ModelConfig
from ergm_tpu.infer.generate import generate
from ergm_tpu.infer.server import ContinuousServer, Request
from ergm_tpu.models import gpt2

VOCAB, EOS, SP2 = 64, 60, 61


def make_cfg(**kw):
    base = dict(vocab_size=VOCAB, n_positions=256, n_embd=32, n_layer=2,
                n_head=4, use_cross_attention=False, dtype="float32",
                embd_pdrop=0.0, attn_pdrop=0.0, resid_pdrop=0.0)
    base.update(kw)
    return ModelConfig(**base)


@pytest.fixture(scope="module")
def setup():
    cfg = make_cfg()
    params = gpt2.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def oracle_greedy(params, cfg, prompt, max_new, **kw):
    """Plain-generate greedy continuation for one prompt."""
    ids = jnp.asarray(np.asarray(prompt)[None], jnp.int32)
    tts = jnp.full_like(ids, SP2)
    out = generate(params, cfg, ids, len(prompt),
                   max_len=min(len(prompt) + max_new, cfg.n_positions),
                   eos_id=EOS, sp2_id=SP2, greedy=True,
                   token_type_ids=tts, rng=jax.random.PRNGKey(0), **kw)
    toks = np.asarray(out.tokens[0])
    return toks[len(prompt):int(out.lengths[0])].tolist(), \
        np.asarray(out.emotion_logits[0])


def test_greedy_matches_generate(setup):
    cfg, params = setup
    rng = np.random.default_rng(0)
    prompts = [rng.integers(0, 50, (n,)).tolist()
               for n in (5, 11, 17, 8, 23, 14)]
    srv = ContinuousServer(params, cfg, slots=2, eos_id=EOS, sp2_id=SP2,
                           max_prompt=32, prompt_bucket=16, sync_every=4)
    rids = [srv.submit(Request(prompt_ids=p, max_new_tokens=8, greedy=True))
            for p in prompts]
    results = srv.run_until_drained()
    assert set(results) == set(rids)
    for rid, p in zip(rids, prompts):
        want, emo = oracle_greedy(params, cfg, p, 8)
        got = results[rid].tokens
        assert got == want, (p, got, want)
        np.testing.assert_allclose(results[rid].emotion_logits, emo,
                                   atol=1e-4)
    # 6 requests through 2 slots: later requests must have queued
    assert any(results[r].steps_waited > 0 for r in rids)


def test_tight_cache_preserves_greedy(setup):
    """Rows running close to the cache capacity (prompt + budget near
    cache_len, finished rows junk-writing past their content) stay
    byte-identical to plain generate — the per-slot-cursor analogue of
    the old defrag-survival test (there is no defrag anymore: each
    row's content lives contiguously at [0, len))."""
    cfg, params = setup
    rng = np.random.default_rng(1)
    prompts = [rng.integers(0, 50, (n,)).tolist() for n in (7, 13, 9, 19)]
    srv = ContinuousServer(params, cfg, slots=2, eos_id=EOS, sp2_id=SP2,
                           max_prompt=32, prompt_bucket=16, sync_every=4,
                           cache_len=40)
    rids = [srv.submit(Request(prompt_ids=p, max_new_tokens=16, greedy=True))
            for p in prompts]
    results = srv.run_until_drained()
    for rid, p in zip(rids, prompts):
        want, emo = oracle_greedy(params, cfg, p, 16)
        assert results[rid].tokens == want, (p, results[rid].tokens, want)
        np.testing.assert_allclose(results[rid].emotion_logits, emo,
                                   atol=1e-4)


def test_cache_growth_preserves_greedy(setup):
    """Bucketed physical cache capacity: the server starts at the
    smallest rung of the cache_grow_step ladder, pad-copies up as the
    longest active row approaches each rung, and slice-copies back down
    once the need halves — all invisible in the emitted tokens (greedy
    byte-identical to plain generate)."""
    cfg, params = setup
    rng = np.random.default_rng(10)
    prompts = [rng.integers(0, 50, (n,)).tolist()
               for n in (7, 12, 9, 31, 6, 11, 13, 8)]
    srv = ContinuousServer(params, cfg, slots=2, eos_id=EOS, sp2_id=SP2,
                           max_prompt=32, prompt_bucket=16, sync_every=4,
                           cache_len=96, cache_grow_step=16)
    # smallest rung covering prompt_bucket + one block, not the full T
    assert srv.Tphys == [32] and srv.T == 96
    budgets = [16, 16, 16, 48, 16, 16, 16, 16]
    rids = [srv.submit(Request(prompt_ids=p, max_new_tokens=b, greedy=True))
            for p, b in zip(prompts, budgets)]
    results = srv.run_until_drained()
    assert srv.grows > 0, "test must exercise the grow path"
    assert srv.shrinks > 0, "test must exercise the shrink path"
    for rid, p, b in zip(rids, prompts, budgets):
        want, emo = oracle_greedy(params, cfg, p, b)
        assert results[rid].tokens == want, (p, results[rid].tokens, want)
        np.testing.assert_allclose(results[rid].emotion_logits, emo,
                                   atol=1e-4)


def test_trimodal_greedy_matches_generate():
    cfg = make_cfg(use_cross_attention=True)
    params = gpt2.init_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(2)
    prompt = rng.integers(0, 50, (9,)).tolist()
    img = rng.standard_normal(cfg.modality_dim).astype(np.float32)
    aud = rng.standard_normal(cfg.modality_dim).astype(np.float32)
    caps = rng.integers(0, 50, (6,)).tolist()

    srv = ContinuousServer(params, cfg, slots=2, eos_id=EOS, sp2_id=SP2,
                           max_prompt=32, prompt_bucket=16, sync_every=4,
                           caption_len=8)
    rid = srv.submit(Request(prompt_ids=prompt, img=img, aud=aud,
                             caption_ids=caps, max_new_tokens=8, greedy=True))
    # a captionless request shares the batch (capless-row gate coverage)
    rid2 = srv.submit(Request(prompt_ids=prompt, max_new_tokens=8,
                              greedy=True))
    results = srv.run_until_drained()

    ids = jnp.asarray(np.asarray(prompt)[None], jnp.int32)
    tts = jnp.full_like(ids, SP2)
    cap_ids = np.full((1, 8), EOS, np.int32)
    cap_ids[0, :6] = caps
    cap_mask = np.zeros((1, 8), np.float32)
    cap_mask[0, :6] = 1.0
    out = generate(params, cfg, ids, len(prompt), max_len=len(prompt) + 8,
                   eos_id=EOS, sp2_id=SP2, greedy=True, token_type_ids=tts,
                   imgs=jnp.asarray(img[None]), auds=jnp.asarray(aud[None]),
                   caption_ids=jnp.asarray(cap_ids),
                   caption_mask=jnp.asarray(cap_mask),
                   rng=jax.random.PRNGKey(0))
    want = np.asarray(out.tokens[0])[len(prompt):int(out.lengths[0])].tolist()
    assert results[rid].tokens == want

    out2 = generate(params, cfg, ids, len(prompt), max_len=len(prompt) + 8,
                    eos_id=EOS, sp2_id=SP2, greedy=True, token_type_ids=tts,
                    rng=jax.random.PRNGKey(0))
    want2 = np.asarray(out2.tokens[0])[len(prompt):int(out2.lengths[0])].tolist()
    assert results[rid2].tokens == want2


def test_sampling_completes_and_is_in_vocab(setup):
    cfg, params = setup
    rng = np.random.default_rng(3)
    prompts = [rng.integers(0, 50, (8,)).tolist() for _ in range(4)]
    srv = ContinuousServer(params, cfg, slots=2, eos_id=EOS, sp2_id=SP2,
                           max_prompt=32, prompt_bucket=16, sync_every=4)
    rids = [srv.submit(Request(prompt_ids=p, max_new_tokens=12,
                               top_p=0.9, seed=n))
            for n, p in enumerate(prompts)]
    results = srv.run_until_drained()
    for rid in rids:
        toks = results[rid].tokens
        assert 1 <= len(toks) <= 12
        assert all(0 <= t < VOCAB for t in toks)
        if EOS in toks:
            assert toks.index(EOS) == len(toks) - 1


def test_incremental_submission(setup):
    """Requests submitted while the server is mid-stream join without
    disturbing in-flight decodes (the core continuous-batching claim)."""
    cfg, params = setup
    rng = np.random.default_rng(4)
    p1 = rng.integers(0, 50, (10,)).tolist()
    p2 = rng.integers(0, 50, (15,)).tolist()
    srv = ContinuousServer(params, cfg, slots=2, eos_id=EOS, sp2_id=SP2,
                           max_prompt=32, prompt_bucket=16, sync_every=2)
    r1 = srv.submit(Request(prompt_ids=p1, max_new_tokens=12, greedy=True))
    srv.step()
    srv.step()
    r2 = srv.submit(Request(prompt_ids=p2, max_new_tokens=6, greedy=True))
    results = srv.run_until_drained()
    w1, _ = oracle_greedy(params, cfg, p1, 12)
    w2, _ = oracle_greedy(params, cfg, p2, 6)
    assert results[r1].tokens == w1
    assert results[r2].tokens == w2


def test_prompt_too_long_rejected(setup):
    cfg, params = setup
    srv = ContinuousServer(params, cfg, slots=1, eos_id=EOS, sp2_id=SP2,
                           max_prompt=16, prompt_bucket=16)
    with pytest.raises(ValueError, match="max_prompt"):
        srv.submit(Request(prompt_ids=list(range(40))))


def test_budget_exceeding_cache_rejected(setup):
    """A request whose prompt + max_new_tokens cannot fit the cache
    must be rejected at submit, not discovered mid-run."""
    cfg, params = setup
    srv = ContinuousServer(params, cfg, slots=1, eos_id=EOS, sp2_id=SP2,
                           max_prompt=32, prompt_bucket=16, sync_every=4,
                           cache_len=64)
    with pytest.raises(ValueError, match="cache"):
        srv.submit(Request(prompt_ids=[1] * 7, max_new_tokens=60))
    # the same request with a fitting budget is accepted
    srv.submit(Request(prompt_ids=[1] * 7, max_new_tokens=16, greedy=True))
    res = srv.run_until_drained()
    assert len(res) == 1


def test_int8_kv_server_matches_generate(setup):
    """The server's join scatters the int8 cache's quantization scales
    too; greedy through the int8 cache must match plain generate on the
    same int8 cache config."""
    cfg, params = setup
    qcfg = cfg.replace(kv_cache_dtype="int8")
    rng = np.random.default_rng(6)
    prompts = [rng.integers(0, 50, (n,)).tolist() for n in (6, 12, 9)]
    srv = ContinuousServer(params, qcfg, slots=2, eos_id=EOS, sp2_id=SP2,
                           max_prompt=32, prompt_bucket=16, sync_every=4)
    rids = [srv.submit(Request(prompt_ids=p, max_new_tokens=8, greedy=True))
            for p in prompts]
    results = srv.run_until_drained()
    for rid, p in zip(rids, prompts):
        want, _ = oracle_greedy(params, qcfg, p, 8)
        assert results[rid].tokens == want, (p, results[rid].tokens, want)


def test_int4_kv_server_matches_generate(setup):
    """int4 packed-nibble KV through the server's staged block decode
    (round 5): packing halves head_dim (the minor axis), so the join
    window scatter, staged flush, and per-row extension writes are all
    layout-safe. Greedy must match generate on the same int4 config."""
    cfg, params = setup
    qcfg = cfg.replace(kv_cache_dtype="int4")
    rng = np.random.default_rng(16)
    prompts = [rng.integers(0, 50, (n,)).tolist() for n in (6, 12, 9, 15)]
    srv = ContinuousServer(params, qcfg, slots=2, eos_id=EOS, sp2_id=SP2,
                           max_prompt=32, prompt_bucket=16, sync_every=4)
    rids = [srv.submit(Request(prompt_ids=p, max_new_tokens=8, greedy=True))
            for p in prompts]
    results = srv.run_until_drained()
    for rid, p in zip(rids, prompts):
        want, _ = oracle_greedy(params, qcfg, p, 8)
        assert results[rid].tokens == want, (p, results[rid].tokens, want)


def test_spec_gamma_rejects_quantized_kv(setup):
    """The speculative serve path has no staged quantized-cache write;
    the constructor must refuse int8/int4 KV with spec_gamma > 0 rather
    than silently run the ~80x per-step scatter (ADVICE r4 medium)."""
    cfg, params = setup
    for dt in ("int8", "int4"):
        with pytest.raises(ValueError, match="spec_gamma"):
            ContinuousServer(params, cfg.replace(kv_cache_dtype=dt),
                             slots=2, eos_id=EOS, sp2_id=SP2, max_prompt=32,
                             prompt_bucket=16, sync_every=4, spec_gamma=3)


def _serve_greedy(params, cfg, prompts, mesh, slots=2):
    srv = ContinuousServer(params, cfg, slots=slots, eos_id=EOS, sp2_id=SP2,
                           max_prompt=32, prompt_bucket=16, sync_every=4,
                           mesh=mesh)
    rids = [srv.submit(Request(prompt_ids=pr, max_new_tokens=8, greedy=True))
            for pr in prompts]
    res = srv.run_until_drained()
    return srv, [res[r].tokens for r in rids]


def test_mesh_tp_server_matches_single_device(setup):
    """Continuous serving over a data x model mesh (TP partition specs on
    the params, slot axis sharded over data) emits the same greedy
    continuations as single-device — the multi-chip route for the
    serving subsystem."""
    from ergm_tpu.core.mesh import make_mesh, shard_params

    cfg, params = setup
    rng = np.random.default_rng(8)
    prompts = [rng.integers(0, 50, (n,)).tolist() for n in (6, 13, 9)]

    _, single = _serve_greedy(params, cfg, prompts, None)
    mesh = make_mesh((2, 2), ("data", "model"))
    sharded = shard_params(params, mesh)
    _, meshed = _serve_greedy(sharded, cfg, prompts, mesh)
    assert meshed == single


def test_mesh_dp_server_shards_slots(setup):
    """A data-only mesh shards the server's slot axis (real DP serving,
    not per-chip replication): same greedy output, and the KV cache /
    per-slot state stay sharded over 'data' after admission + decode."""
    from ergm_tpu.core.mesh import make_mesh

    cfg, params = setup
    rng = np.random.default_rng(9)
    prompts = [rng.integers(0, 50, (n,)).tolist() for n in (6, 13, 9, 17, 5)]

    _, single = _serve_greedy(params, cfg, prompts, None, slots=4)
    mesh = make_mesh((4,), ("data",))
    rep = jax.device_put(
        params, jax.NamedSharding(mesh, jax.sharding.PartitionSpec()))
    srv, meshed = _serve_greedy(rep, cfg, prompts, mesh, slots=4)
    assert meshed == single
    # state committed AND preserved through prefill/join/decode programs
    for arr in (srv.caches[0].k, srv.caches[0].index, srv.emo_slot):
        spec = arr.sharding.spec
        assert "data" in str(spec), (arr.shape, spec)
    shard_rows = {s.data.shape
                  for s in srv.caches[0].index.addressable_shards}
    assert shard_rows == {(1,)}  # 4 slots / 4 devices

    with pytest.raises(ValueError, match="divisible by the mesh data"):
        ContinuousServer(rep, cfg, slots=3, eos_id=EOS, sp2_id=SP2,
                         max_prompt=32, mesh=mesh)


def test_pipelined_mode_matches_generate(setup):
    """pipeline=True (throughput mode: dispatch block N+1 before
    harvesting block N) must stay byte-identical to plain generate —
    including requests submitted mid-stream, which join one block later
    than in synchronous mode."""
    cfg, params = setup
    rng = np.random.default_rng(11)
    prompts = [rng.integers(0, 50, (n,)).tolist()
               for n in (5, 11, 17, 8, 23, 14)]
    srv = ContinuousServer(params, cfg, slots=2, eos_id=EOS, sp2_id=SP2,
                           max_prompt=32, prompt_bucket=16, sync_every=4,
                           pipeline=True)
    r0 = srv.submit(Request(prompt_ids=prompts[0], max_new_tokens=8,
                            greedy=True))
    srv.step()
    srv.step()
    rids = [r0] + [srv.submit(Request(prompt_ids=p, max_new_tokens=8,
                                      greedy=True)) for p in prompts[1:]]
    results = srv.run_until_drained()
    assert set(results) == set(rids)
    for rid, p in zip(rids, prompts):
        want, emo = oracle_greedy(params, cfg, p, 8)
        assert results[rid].tokens == want, (p, results[rid].tokens, want)
        np.testing.assert_allclose(results[rid].emotion_logits, emo,
                                   atol=1e-4)


@pytest.mark.parametrize("pipeline", [False, True])
def test_stream_callback(setup, pipeline):
    """Request.stream_cb receives block-granular chunks that concatenate
    exactly to the final Result.tokens, with done=True exactly once, in
    both the synchronous and pipelined orders."""
    cfg, params = setup
    rng = np.random.default_rng(3)
    prompts = [rng.integers(0, 50, (n,)).tolist() for n in (6, 13, 21)]
    srv = ContinuousServer(params, cfg, slots=2, eos_id=EOS, sp2_id=SP2,
                           max_prompt=32, prompt_bucket=16, sync_every=4,
                           pipeline=pipeline)
    chunks: dict = {}

    def cb(rid, new, done):
        chunks.setdefault(rid, []).append((list(new), done))

    rids = [srv.submit(Request(prompt_ids=p, max_new_tokens=7, greedy=True,
                               stream_cb=cb))
            for p in prompts]
    results = srv.run_until_drained()
    assert set(chunks) == set(rids)
    for rid in rids:
        streamed = [t for new, _ in chunks[rid] for t in new]
        assert streamed == results[rid].tokens
        dones = [done for _, done in chunks[rid]]
        assert dones[-1] and not any(dones[:-1])
        # block granularity: every chunk but the last is <= sync_every
        # and only the first may carry the extra prefill token
        assert all(len(new) <= 4 + 1 for new, _ in chunks[rid])


def test_spec_serving_matches_generate(setup):
    """Speculative serving (prompt-lookup drafts + one verify forward
    per macro step, per-slot variable cursor advance) must stay
    byte-identical to plain generate — across staggered admissions,
    repetitive prompts (high acceptance) and random prompts (all-reject
    path), and a row whose budget exactly fills the cache."""
    cfg, params = setup
    rng = np.random.default_rng(5)
    rep = rng.integers(0, 50, (4,)).tolist() * 5
    prompts = [rng.integers(0, 50, (n,)).tolist() for n in (5, 11, 17)] \
        + [rep, rep[:12] + rep[:8]]
    srv = ContinuousServer(params, cfg, slots=2, eos_id=EOS, sp2_id=SP2,
                           max_prompt=32, prompt_bucket=16, sync_every=3,
                           spec_gamma=4, spec_ngram=3)
    r0 = srv.submit(Request(prompt_ids=prompts[0], max_new_tokens=10,
                            greedy=True))
    srv.step()
    rids = [r0] + [srv.submit(Request(prompt_ids=p, max_new_tokens=10,
                                      greedy=True)) for p in prompts[1:]]
    results = srv.run_until_drained()
    for rid, p in zip(rids, prompts):
        want, emo = oracle_greedy(params, cfg, p, 10)
        assert results[rid].tokens == want, (p, results[rid].tokens, want)
        np.testing.assert_allclose(results[rid].emotion_logits, emo,
                                   atol=1e-4)
    # the repetitive prompts must actually exercise acceptance
    assert srv.spec_accepted > 0 and srv.spec_proposed > 0

    # budget exactly filling the cache (prompt + max_new - 1 == T)
    srv.reset()
    p = rng.integers(0, 50, (17,)).tolist()
    budget = cfg.n_positions - 17 + 1
    rid = srv.submit(Request(prompt_ids=p, max_new_tokens=budget,
                             greedy=True))
    res = srv.run_until_drained()[rid]
    want, _ = oracle_greedy(params, cfg, p, budget)
    assert res.tokens == want


def test_spec_serving_mixed_sampler_fallback(setup):
    """A sampled request mid-stream flips blocks onto the plain decode
    program (token buffer goes stale); greedy rows must STILL match
    generate byte-exactly once spec blocks resume."""
    cfg, params = setup
    rng = np.random.default_rng(9)
    rep = rng.integers(0, 50, (5,)).tolist() * 4
    g1, g2 = rep, rng.integers(0, 50, (13,)).tolist()
    srv = ContinuousServer(params, cfg, slots=2, eos_id=EOS, sp2_id=SP2,
                           max_prompt=32, prompt_bucket=16, sync_every=2,
                           spec_gamma=3, spec_ngram=2)
    ra = srv.submit(Request(prompt_ids=g1, max_new_tokens=12, greedy=True))
    rb = srv.submit(Request(prompt_ids=rng.integers(0, 50, (7,)).tolist(),
                            max_new_tokens=4, greedy=False, top_p=0.9,
                            seed=3))
    srv.step()  # mixed block -> plain fallback
    rc = srv.submit(Request(prompt_ids=g2, max_new_tokens=8, greedy=True))
    results = srv.run_until_drained()
    for rid, p, n in ((ra, g1, 12), (rc, g2, 8)):
        want, _ = oracle_greedy(params, cfg, p, n)
        assert results[rid].tokens == want, (results[rid].tokens, want)
    assert len(results[rb].tokens) <= 4


def test_spec_pipeline_conflict(setup):
    cfg, params = setup
    with pytest.raises(ValueError, match="pipeline"):
        ContinuousServer(params, cfg, slots=2, eos_id=EOS, sp2_id=SP2,
                         max_prompt=32, pipeline=True, spec_gamma=4)


def test_mesh_spec_serving_matches_single_device(setup):
    """Speculative serving on a data x model mesh (token buffer sharded
    over the slot axis, lookup/verify/accept all under the mesh) must
    emit the same greedy continuations as single-device spec serving —
    and the same as plain generate."""
    import gc

    from ergm_tpu.core.mesh import make_mesh, shard_params

    # This test compiles the suite's largest sharded programs at the
    # END of a ~250-test single-process run; the XLA CPU compiler has
    # twice segfaulted here under that accumulated load (hundreds of
    # live executables + tracing caches) while passing in isolation
    # every time. Dropping the caches before compiling is cheap
    # insurance against the upstream crash.
    jax.clear_caches()
    gc.collect()

    cfg, params = setup
    rng = np.random.default_rng(12)
    rep = rng.integers(0, 50, (4,)).tolist() * 4
    prompts = [rng.integers(0, 50, (n,)).tolist() for n in (6, 13, 9)] + [rep]

    def serve(p, mesh):
        srv = ContinuousServer(p, cfg, slots=4, eos_id=EOS, sp2_id=SP2,
                               max_prompt=32, prompt_bucket=16, sync_every=3,
                               spec_gamma=3, spec_ngram=2, mesh=mesh)
        rids = [srv.submit(Request(prompt_ids=pr, max_new_tokens=8,
                                   greedy=True)) for pr in prompts]
        res = srv.run_until_drained()
        return srv, [res[r].tokens for r in rids]

    _, single = serve(params, None)
    mesh = make_mesh((2, 2), ("data", "model"))
    srv, meshed = serve(shard_params(params, mesh), mesh)
    assert meshed == single
    assert "data" in str(srv.tokens.sharding.spec)
    for toks, pr in zip(single, prompts):
        want, _ = oracle_greedy(params, cfg, pr, 8)
        assert toks == want


@pytest.mark.parametrize("seed,kw", [
    (0, dict(slots=3, sync_every=3)),
    (1, dict(slots=2, sync_every=2, spec_gamma=2, spec_ngram=2)),
    (2, dict(slots=3, sync_every=4, pipeline=True)),
    (3, dict(slots=2, sync_every=3, prefill_chunk=16)),
    # length-tiered pools, alone and composed with the other modes
    (4, dict(slots=4, sync_every=3, long_slots=2, long_threshold=24)),
    (5, dict(slots=4, sync_every=2, long_slots=2, long_threshold=20,
             spec_gamma=2, spec_ngram=2)),
    (6, dict(slots=4, sync_every=3, long_slots=1, long_threshold=24,
             prefill_chunk=16)),
    (7, dict(slots=4, sync_every=4, long_slots=2, long_threshold=24,
             pipeline=True)),
])
def test_randomized_admission_stress(setup, seed, kw):
    """Property check over a RANDOM admission schedule: any interleaving
    of submissions and server iterations — arbitrary prompt lengths,
    budgets, queue depths, idle steps on a drained server, capacity
    grows/shrinks along the way — must emit byte-identical greedy
    continuations to plain ``generate``, in all three serving modes
    (plain, speculative, pipelined). The scenario tests pin specific
    mechanisms; this pins their composition under schedules nobody
    hand-picked."""
    cfg, params = setup
    rng = np.random.default_rng(100 + seed)
    reqs = []
    for _ in range(10):
        n = int(rng.integers(3, 29))
        # bias some prompts toward repetition so ngram lookup actually
        # accepts (and per-slot advances diverge) in the spec scenario
        if rng.random() < 0.4:
            unit = rng.integers(0, 50, (max(n // 3, 1),)).tolist()
            p = (unit * 4)[:n]
        else:
            p = rng.integers(0, 50, (n,)).tolist()
        reqs.append((p, int(rng.integers(1, 15))))

    srv = ContinuousServer(params, cfg, eos_id=EOS, sp2_id=SP2,
                           max_prompt=32, prompt_bucket=16,
                           cache_grow_step=16, **kw)
    rids = {}
    pending = list(reqs)
    while pending or rids.keys() - srv.results.keys():
        k = int(rng.integers(0, 4))
        for p, budget in pending[:k]:
            rids[srv.submit(Request(prompt_ids=p, max_new_tokens=budget,
                                    greedy=True))] = (p, budget)
        pending = pending[k:]
        for _ in range(int(rng.integers(0, 3))):  # 0 = idle bookkeeping turn
            srv.step()
    results = srv.run_until_drained()
    assert set(results) >= set(rids)
    for rid, (p, budget) in rids.items():
        want, _ = oracle_greedy(params, cfg, p, budget)
        assert results[rid].tokens == want, (seed, p, budget,
                                             results[rid].tokens, want)


def test_session_continuation_matches_full_prefill(setup):
    """Multi-turn sessions: turn 2 sends the FULL dialogue prompt with
    the same session_id; the server prefills only the delta against the
    retained slot KV, and the greedy continuation is byte-identical to
    a fresh full-prompt generate."""
    cfg, params = setup
    rng = np.random.default_rng(21)
    srv = ContinuousServer(params, cfg, slots=2, eos_id=EOS, sp2_id=SP2,
                           max_prompt=32, prompt_bucket=16, sync_every=3)
    p1 = rng.integers(0, 50, (11,)).tolist()
    r1 = srv.submit(Request(prompt_ids=p1, max_new_tokens=8, greedy=True,
                            session_id="alice"))
    res1 = srv.run_until_drained()[r1]
    assert srv.slots[srv.sessions["alice"]].parked

    # turn 2: history + reply + new user utterance
    p2 = p1 + res1.tokens + rng.integers(0, 50, (7,)).tolist()
    r2 = srv.submit(Request(prompt_ids=p2, max_new_tokens=8, greedy=True,
                            session_id="alice"))
    res2 = srv.run_until_drained()[r2]
    assert "admit_ext" in srv._phase  # the extension path actually ran
    want, emo = oracle_greedy(params, cfg, p2, 8)
    assert res2.tokens == want, (res2.tokens, want)
    np.testing.assert_allclose(res2.emotion_logits, emo, atol=1e-3)

    # turn 3: history may exceed max_prompt — only the delta prefills
    p3 = p2 + res2.tokens + rng.integers(0, 50, (5,)).tolist()
    assert len(p3) > 32
    r3 = srv.submit(Request(prompt_ids=p3, max_new_tokens=6, greedy=True,
                            session_id="alice"))
    res3 = srv.run_until_drained()[r3]
    want3, _ = oracle_greedy(params, cfg, p3, 6)
    assert res3.tokens == want3


def test_session_prefix_mismatch_falls_back(setup):
    """A diverged prompt (conversation restarted) must not reuse stale
    KV: the server evicts the parked content and full-prefills."""
    cfg, params = setup
    rng = np.random.default_rng(22)
    srv = ContinuousServer(params, cfg, slots=2, eos_id=EOS, sp2_id=SP2,
                           max_prompt=32, prompt_bucket=16, sync_every=3)
    p1 = rng.integers(0, 50, (9,)).tolist()
    srv.submit(Request(prompt_ids=p1, max_new_tokens=6, greedy=True,
                       session_id="bob"))
    srv.run_until_drained()
    # divergent turn 2 (different opening tokens)
    p2 = rng.integers(0, 50, (13,)).tolist()
    r2 = srv.submit(Request(prompt_ids=p2, max_new_tokens=6, greedy=True,
                            session_id="bob"))
    res2 = srv.run_until_drained()[r2]
    want, _ = oracle_greedy(params, cfg, p2, 6)
    assert res2.tokens == want
    # the session parked again with the NEW history
    log = srv.slots[srv.sessions["bob"]].token_log
    assert log == p2 + res2.tokens


def test_session_eviction_under_slot_pressure(setup):
    """Parked sessions yield their slots (LRU) to fresh traffic; an
    evicted session's next turn falls back to a full prefill and stays
    correct."""
    cfg, params = setup
    rng = np.random.default_rng(23)
    srv = ContinuousServer(params, cfg, slots=2, eos_id=EOS, sp2_id=SP2,
                           max_prompt=32, prompt_bucket=16, sync_every=3)
    p1 = rng.integers(0, 50, (8,)).tolist()
    r1 = srv.submit(Request(prompt_ids=p1, max_new_tokens=6, greedy=True,
                            session_id="carol"))
    res1 = srv.run_until_drained()[r1]
    assert "carol" in srv.sessions
    # 4 fresh requests through 2 slots evict the parked session
    fresh = [srv.submit(Request(prompt_ids=rng.integers(0, 50, (7,)).tolist(),
                                max_new_tokens=6, greedy=True))
             for _ in range(4)]
    srv.run_until_drained()
    assert "carol" not in srv.sessions
    # next turn still correct, via full prefill
    p2 = p1 + res1.tokens + rng.integers(0, 50, (4,)).tolist()
    r2 = srv.submit(Request(prompt_ids=p2, max_new_tokens=6, greedy=True,
                            session_id="carol"))
    res2 = srv.run_until_drained()[r2]
    want, _ = oracle_greedy(params, cfg, p2, 6)
    assert res2.tokens == want


def test_session_continuation_spec_mode(setup):
    """Session extension under speculative serving: the device token
    buffer gets the delta (lookup windows stay consistent) and greedy
    output still matches the oracle."""
    cfg, params = setup
    rng = np.random.default_rng(24)
    srv = ContinuousServer(params, cfg, slots=2, eos_id=EOS, sp2_id=SP2,
                           max_prompt=32, prompt_bucket=16, sync_every=3,
                           spec_gamma=2, spec_ngram=2)
    unit = rng.integers(0, 50, (4,)).tolist()
    p1 = (unit * 3)[:10]  # repetitive: lookup actually accepts
    r1 = srv.submit(Request(prompt_ids=p1, max_new_tokens=8, greedy=True,
                            session_id="dave"))
    res1 = srv.run_until_drained()[r1]
    p2 = p1 + res1.tokens + unit
    r2 = srv.submit(Request(prompt_ids=p2, max_new_tokens=8, greedy=True,
                            session_id="dave"))
    res2 = srv.run_until_drained()[r2]
    want, _ = oracle_greedy(params, cfg, p2, 8)
    assert res2.tokens == want


def test_chunked_prefill_matches_generate(setup):
    """Chunked prefill (prefill_chunk): long prompts admit in chunk-wide
    slices interleaved with decode blocks — greedy output and emotion
    logits stay byte-identical to plain generate, including for short
    prompts below the chunk size that ride the normal path."""
    cfg, params = setup
    rng = np.random.default_rng(30)
    prompts = [rng.integers(0, 50, (n,)).tolist()
               for n in (70, 9, 100, 33, 5)]
    srv = ContinuousServer(params, cfg, slots=3, eos_id=EOS, sp2_id=SP2,
                           max_prompt=128, prompt_bucket=16, sync_every=3,
                           prefill_chunk=32)
    rids = [srv.submit(Request(prompt_ids=p, max_new_tokens=8, greedy=True))
            for p in prompts]
    results = srv.run_until_drained()
    assert set(results) == set(rids)
    for rid, p in zip(rids, prompts):
        want, emo = oracle_greedy(params, cfg, p, 8)
        assert results[rid].tokens == want, (len(p), results[rid].tokens,
                                             want)
        np.testing.assert_allclose(results[rid].emotion_logits, emo,
                                   atol=1e-3)
    assert "admit_ext" in srv._phase  # chunks actually rode the extension


def test_chunked_prefill_interleaves_with_decode(setup):
    """A long prompt arriving while other streams decode admits one
    chunk per step — the concurrent stream's output is unaffected and
    the long request still matches the oracle."""
    cfg, params = setup
    rng = np.random.default_rng(31)
    short = rng.integers(0, 50, (7,)).tolist()
    long_p = rng.integers(0, 50, (90,)).tolist()
    srv = ContinuousServer(params, cfg, slots=3, eos_id=EOS, sp2_id=SP2,
                           max_prompt=128, prompt_bucket=16, sync_every=3,
                           prefill_chunk=32)
    r_short = srv.submit(Request(prompt_ids=short, max_new_tokens=20,
                                 greedy=True))
    srv.step()  # the short stream is mid-decode...
    r_long = srv.submit(Request(prompt_ids=long_p, max_new_tokens=8,
                                greedy=True))
    # the long prompt needs ceil(90/32)=3 chunks: prefilling must span
    # multiple steps while the short stream keeps decoding
    srv.step()
    assert any(s.prefilling for s in srv.slots)
    results = srv.run_until_drained()
    want_s, _ = oracle_greedy(params, cfg, short, 20)
    want_l, _ = oracle_greedy(params, cfg, long_p, 8)
    assert results[r_short].tokens == want_s
    assert results[r_long].tokens == want_l
    assert not any(s.prefilling for s in srv.slots)


def test_chunked_prefill_lifts_max_prompt(setup):
    """With chunking, prompts beyond max_prompt admit (only chunks ever
    prefill); without it, submit still rejects loudly."""
    cfg, params = setup
    rng = np.random.default_rng(32)
    p = rng.integers(0, 50, (120,)).tolist()
    plain = ContinuousServer(params, cfg, slots=2, eos_id=EOS, sp2_id=SP2,
                             max_prompt=48, prompt_bucket=16, sync_every=3)
    with pytest.raises(ValueError, match="max_prompt"):
        plain.submit(Request(prompt_ids=p, max_new_tokens=6, greedy=True))
    srv = ContinuousServer(params, cfg, slots=2, eos_id=EOS, sp2_id=SP2,
                           max_prompt=48, prompt_bucket=16, sync_every=3,
                           prefill_chunk=32)
    rid = srv.submit(Request(prompt_ids=p, max_new_tokens=6, greedy=True))
    res = srv.run_until_drained()[rid]
    want, _ = oracle_greedy(params, cfg, p, 6)
    assert res.tokens == want


def test_chunked_prefill_trimodal(setup):
    """Chunk 1 rides the prefill path and must carry the modality
    injection and caption K/V; later chunks cross-attend to the caption
    cache written by the join."""
    cfg = make_cfg(use_cross_attention=True)
    params = gpt2.init_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(33)
    prompt = rng.integers(0, 50, (60,)).tolist()
    img = rng.standard_normal(cfg.modality_dim).astype(np.float32)
    aud = rng.standard_normal(cfg.modality_dim).astype(np.float32)
    caps = rng.integers(0, 50, (6,)).tolist()
    srv = ContinuousServer(params, cfg, slots=2, eos_id=EOS, sp2_id=SP2,
                           max_prompt=96, prompt_bucket=16, sync_every=3,
                           caption_len=8, prefill_chunk=32)
    rid = srv.submit(Request(prompt_ids=prompt, img=img, aud=aud,
                             caption_ids=caps, max_new_tokens=8,
                             greedy=True))
    res = srv.run_until_drained()[rid]

    ids = jnp.asarray(np.asarray(prompt)[None], jnp.int32)
    tts = jnp.full_like(ids, SP2)
    cap_ids = np.full((1, 8), EOS, np.int32)
    cap_ids[0, :6] = caps
    cap_mask = np.zeros((1, 8), np.float32)
    cap_mask[0, :6] = 1.0
    out = generate(params, cfg, ids, len(prompt), max_len=len(prompt) + 8,
                   eos_id=EOS, sp2_id=SP2, greedy=True, token_type_ids=tts,
                   imgs=jnp.asarray(img[None]), auds=jnp.asarray(aud[None]),
                   caption_ids=jnp.asarray(cap_ids),
                   caption_mask=jnp.asarray(cap_mask),
                   rng=jax.random.PRNGKey(0))
    want = np.asarray(out.tokens[0])[len(prompt):int(out.lengths[0])].tolist()
    assert res.tokens == want


def test_chunked_session_continuation(setup):
    """A session turn whose DELTA exceeds the chunk size admits the
    delta in chunks against the retained KV; output matches the
    full-history oracle, and the session parks again afterwards."""
    cfg, params = setup
    rng = np.random.default_rng(34)
    srv = ContinuousServer(params, cfg, slots=2, eos_id=EOS, sp2_id=SP2,
                           max_prompt=48, prompt_bucket=16, sync_every=3,
                           prefill_chunk=32)
    p1 = rng.integers(0, 50, (11,)).tolist()
    r1 = srv.submit(Request(prompt_ids=p1, max_new_tokens=6, greedy=True,
                            session_id="erin"))
    res1 = srv.run_until_drained()[r1]
    # turn 2: a 70-token user message -> delta ~77 > chunk 32 (and >
    # max_prompt 48: chunking also lifts the delta cap)
    p2 = p1 + res1.tokens + rng.integers(0, 50, (70,)).tolist()
    r2 = srv.submit(Request(prompt_ids=p2, max_new_tokens=8, greedy=True,
                            session_id="erin"))
    res2 = srv.run_until_drained()[r2]
    want, emo = oracle_greedy(params, cfg, p2, 8)
    assert res2.tokens == want, (res2.tokens, want)
    np.testing.assert_allclose(res2.emotion_logits, emo, atol=1e-3)
    assert srv.slots[srv.sessions["erin"]].parked


def test_chunked_prefill_pipelined(setup):
    """Chunked admission under the pipelined serving order."""
    cfg, params = setup
    rng = np.random.default_rng(35)
    prompts = [rng.integers(0, 50, (n,)).tolist() for n in (80, 12, 50)]
    srv = ContinuousServer(params, cfg, slots=2, eos_id=EOS, sp2_id=SP2,
                           max_prompt=96, prompt_bucket=16, sync_every=3,
                           prefill_chunk=32, pipeline=True)
    rids = [srv.submit(Request(prompt_ids=p, max_new_tokens=8, greedy=True))
            for p in prompts]
    results = srv.run_until_drained()
    for rid, p in zip(rids, prompts):
        want, _ = oracle_greedy(params, cfg, p, 8)
        assert results[rid].tokens == want, (len(p),)


def test_cancel_in_every_state(setup):
    """``cancel`` abandons a request wherever it lives — queued, active
    mid-decode, mid chunked admission, finished-unread — frees the slot
    for later admissions, and never perturbs concurrent streams'
    output."""
    cfg, params = setup
    rng = np.random.default_rng(38)
    mk = lambda n: rng.integers(0, 50, (n,)).tolist()
    keep1, keep2, act, queued, chunked = (mk(n) for n in (9, 13, 11, 7, 80))
    srv = ContinuousServer(params, cfg, slots=2, eos_id=EOS, sp2_id=SP2,
                           max_prompt=96, prompt_bucket=16, sync_every=3,
                           prefill_chunk=32)
    r_keep1 = srv.submit(Request(prompt_ids=keep1, max_new_tokens=12,
                                 greedy=True))
    r_act = srv.submit(Request(prompt_ids=act, max_new_tokens=12,
                               greedy=True))
    srv.step()  # both decoding
    r_q = srv.submit(Request(prompt_ids=queued, max_new_tokens=4,
                             greedy=True))
    assert srv.cancel(r_q)           # still queued
    assert not srv.cancel(r_q)       # idempotent: now unknown
    assert srv.cancel(r_act)         # active mid-decode -> slot freed
    # freed slot admits a chunked prompt; cancel it mid-admission
    r_chunk = srv.submit(Request(prompt_ids=chunked, max_new_tokens=4,
                                 greedy=True))
    srv.step()
    assert srv._chunks and any(s.prefilling for s in srv.slots)
    assert srv.cancel(r_chunk)
    assert not srv._chunks and not any(s.prefilling for s in srv.slots)
    # the slot is reusable and the surviving stream is oracle-exact
    r_keep2 = srv.submit(Request(prompt_ids=keep2, max_new_tokens=6,
                                 greedy=True))
    results = srv.run_until_drained()
    assert set(results) == {r_keep1, r_keep2}
    for rid, (p, b) in ((r_keep1, (keep1, 12)), (r_keep2, (keep2, 6))):
        want, _ = oracle_greedy(params, cfg, p, b)
        assert results[rid].tokens == want
    # finished-unread: cancel pops the result
    assert srv.cancel(r_keep1) and r_keep1 not in srv.results


def test_chunked_prefill_spec_mode(setup):
    """Chunked admission composes with speculative serving: every chunk
    rides the extension program, which must also write the slice into
    the device token buffer the n-gram lookup drafts from — a stale
    buffer would only cost acceptance, but a WRONG one could draft
    garbage that verify must reject; greedy output stays oracle-exact
    either way, and repetitive prompts must still accept drafts."""
    cfg, params = setup
    rng = np.random.default_rng(37)
    unit = rng.integers(0, 50, (8,)).tolist()
    rep = (unit * 12)[:90]          # 3 chunks of 32, highly repetitive
    plain = rng.integers(0, 50, (70,)).tolist()
    srv = ContinuousServer(params, cfg, slots=2, eos_id=EOS, sp2_id=SP2,
                           max_prompt=128, prompt_bucket=16, sync_every=3,
                           prefill_chunk=32, spec_gamma=2, spec_ngram=2)
    rids = {srv.submit(Request(prompt_ids=p, max_new_tokens=10,
                               greedy=True)): p for p in (rep, plain)}
    results = srv.run_until_drained()
    assert set(results) == set(rids)
    for rid, p in rids.items():
        want, _ = oracle_greedy(params, cfg, p, 10)
        assert results[rid].tokens == want, (len(p),)
    # the repetitive prompt must actually exercise the drafting path
    assert srv.spec_proposed > 0 and srv.spec_accepted > 0


def test_busy_covers_chunked_admission(setup):
    """Liveness regression (round-3 review): a chunk-prefilling slot is
    neither active nor queued — a drive loop gating step() on
    ``queue or any(active)`` stalls the chunked request forever once the
    last concurrent decode stream finishes. ``busy()`` must stay True
    while chunks are in flight, and a busy()-gated loop must drain."""
    cfg, params = setup
    rng = np.random.default_rng(36)
    short = rng.integers(0, 50, (6,)).tolist()
    long_p = rng.integers(0, 50, (110,)).tolist()
    srv = ContinuousServer(params, cfg, slots=2, eos_id=EOS, sp2_id=SP2,
                           max_prompt=128, prompt_bucket=16, sync_every=2,
                           prefill_chunk=16)
    r_short = srv.submit(Request(prompt_ids=short, max_new_tokens=2,
                                 greedy=True))
    r_long = srv.submit(Request(prompt_ids=long_p, max_new_tokens=4,
                                greedy=True))
    results = {}
    hit_chunk_only_state = False
    for _ in range(200):
        if not srv.busy():
            results.update({r.request_id: r for r in srv.flush()})
            break
        if (srv._chunks and not srv.queue
                and not any(s.active for s in srv.slots)):
            # the exact state the buggy gate deadlocked on
            hit_chunk_only_state = True
        for r in srv.step():
            results[r.request_id] = r
    assert hit_chunk_only_state, (
        "test setup no longer reaches the chunks-only state; shrink the "
        "short budget or grow the long prompt")
    assert set(results) == {r_short, r_long}
    want_l, _ = oracle_greedy(params, cfg, long_p, 4)
    assert results[r_long].tokens == want_l


# -- length-tiered slot pools -------------------------------------------


def test_tiered_pools_isolate_long_rows(setup):
    """One long LIVE row must not widen the cache every short slot
    reads: with long_slots, the long request grows only the LONG pool's
    rung while the short pool stays at its narrow rung — and greedy
    output through both pools stays byte-identical to generate."""
    cfg, params = setup
    rng = np.random.default_rng(30)
    shorts = [rng.integers(0, 50, (n,)).tolist() for n in (7, 12, 9)]
    long_p = rng.integers(0, 50, (120,)).tolist()
    srv = ContinuousServer(params, cfg, slots=4, eos_id=EOS, sp2_id=SP2,
                           max_prompt=128, prompt_bucket=16, sync_every=4,
                           cache_grow_step=16, long_slots=1,
                           long_threshold=64)
    r_long = srv.submit(Request(prompt_ids=long_p, max_new_tokens=24,
                                greedy=True))
    r_shorts = [srv.submit(Request(prompt_ids=p, max_new_tokens=8,
                                   greedy=True)) for p in shorts]
    results = {}
    saw_tier_split = False
    for _ in range(100):
        if not srv.busy():
            break
        for r in srv.step():
            results[r.request_id] = r
        if srv.Tphys[1] >= 128 and srv.Tphys[0] <= 32:
            saw_tier_split = True
    assert saw_tier_split, (srv.Tphys, "long row widened the short pool")
    assert srv._slot_group(3) == 1  # slot 3 is the long pool
    want, emo = oracle_greedy(params, cfg, long_p, 24)
    assert results[r_long].tokens == want
    for rid, p in zip(r_shorts, shorts):
        want, _ = oracle_greedy(params, cfg, p, 8)
        assert results[rid].tokens == want


def test_tiered_short_overflow_and_long_defers(setup):
    """Pool policy: short requests overflow into idle long slots when
    the short pool is full; long requests never take short slots (they
    wait instead)."""
    cfg, params = setup
    rng = np.random.default_rng(31)
    shorts = [rng.integers(0, 50, (n,)).tolist() for n in (6, 9)]
    longs = [rng.integers(0, 50, (70,)).tolist() for _ in range(2)]
    srv = ContinuousServer(params, cfg, slots=2, eos_id=EOS, sp2_id=SP2,
                           max_prompt=96, prompt_bucket=16, sync_every=2,
                           cache_grow_step=16, long_slots=1,
                           long_threshold=48)
    # two shorts into a 1-slot short pool: the second must overflow
    # into the idle long slot and both admit in the first step
    rids = [srv.submit(Request(prompt_ids=p, max_new_tokens=4, greedy=True))
            for p in shorts]
    srv.step()
    assert all(s.active for s in srv.slots), "overflow into long slot"
    results = srv.run_until_drained()
    for rid, p in zip(rids, shorts):
        want, _ = oracle_greedy(params, cfg, p, 4)
        assert results[rid].tokens == want

    srv.reset()
    # two longs into a 1-slot long pool: the second must WAIT (the
    # short slot stays free for short traffic)
    rids = [srv.submit(Request(prompt_ids=p, max_new_tokens=4, greedy=True))
            for p in longs]
    srv.step()
    active = [i for i, s in enumerate(srv.slots) if s.active]
    assert active == [1], (active, "long request must not take slot 0")
    results = srv.run_until_drained()
    assert results[rids[1]].steps_waited > 0
    for rid, p in zip(rids, longs):
        want, _ = oracle_greedy(params, cfg, p, 4)
        assert results[rid].tokens == want


def test_tiered_pool_hint_and_sessions(setup):
    """Request.pool='long' pins a short first turn into the long pool;
    its session continuations then extend there (pinned to the pool
    that admitted them), staying byte-identical to a fresh generate of
    the full history."""
    cfg, params = setup
    rng = np.random.default_rng(32)
    opener = rng.integers(0, 50, (10,)).tolist()
    srv = ContinuousServer(params, cfg, slots=3, eos_id=EOS, sp2_id=SP2,
                           max_prompt=96, prompt_bucket=16, sync_every=4,
                           cache_grow_step=16, long_slots=1,
                           long_threshold=48)
    r1 = srv.submit(Request(prompt_ids=opener, max_new_tokens=6,
                            greedy=True, session_id="s", pool="long"))
    res = srv.run_until_drained()
    assert srv.slots[2].parked and srv.slots[2].session == "s"
    history = opener + res[r1].tokens
    turn2 = history + rng.integers(0, 50, (8,)).tolist()
    r2 = srv.submit(Request(prompt_ids=turn2, max_new_tokens=6,
                            greedy=True, session_id="s"))
    res = srv.run_until_drained()
    want, _ = oracle_greedy(params, cfg, turn2, 6)
    assert res[r2].tokens == want


def test_temperature_near_zero_matches_greedy(setup):
    """Per-row temperature (logit divisor before the nucleus cutoff):
    a temp->0 sampled row with top_p=1.0 concentrates all nucleus mass
    on the argmax, so its stream is byte-identical to a greedy request
    on the same prompt — while a hot-temperature row shares the same
    decode blocks and greedy rows ignore temperature entirely."""
    cfg, params = setup
    rng = np.random.default_rng(33)
    p = rng.integers(0, 50, (9,)).tolist()
    q = rng.integers(0, 50, (13,)).tolist()
    srv = ContinuousServer(params, cfg, slots=3, eos_id=EOS, sp2_id=SP2,
                           max_prompt=32, prompt_bucket=16, sync_every=4)
    r_cold = srv.submit(Request(prompt_ids=p, max_new_tokens=8,
                                temperature=1e-4, top_p=1.0, seed=5))
    r_hot = srv.submit(Request(prompt_ids=q, max_new_tokens=8,
                               temperature=3.0, top_p=1.0, seed=7))
    r_greedy = srv.submit(Request(prompt_ids=p, max_new_tokens=8,
                                  greedy=True, temperature=9.0))
    results = srv.run_until_drained()
    want, _ = oracle_greedy(params, cfg, p, 8)
    assert results[r_cold].tokens == want, (results[r_cold].tokens, want)
    assert results[r_greedy].tokens == want
    toks = results[r_hot].tokens
    assert 1 <= len(toks) <= 8 and all(0 <= t < VOCAB for t in toks)


def test_temperature_session_extension(setup):
    """Temperature is carried by the session-extension (incremental
    prefill) admission program too, not just full-prefill joins."""
    cfg, params = setup
    rng = np.random.default_rng(34)
    p1 = rng.integers(0, 50, (11,)).tolist()
    srv = ContinuousServer(params, cfg, slots=2, eos_id=EOS, sp2_id=SP2,
                           max_prompt=32, prompt_bucket=16, sync_every=3)
    r1 = srv.submit(Request(prompt_ids=p1, max_new_tokens=6, greedy=True,
                            session_id="t"))
    res1 = srv.run_until_drained()[r1]
    p2 = p1 + res1.tokens + rng.integers(0, 50, (5,)).tolist()
    r2 = srv.submit(Request(prompt_ids=p2, max_new_tokens=6,
                            temperature=1e-4, top_p=1.0, session_id="t"))
    res2 = srv.run_until_drained()[r2]
    assert "admit_ext" in srv._phase  # the extension path actually ran
    want, _ = oracle_greedy(params, cfg, p2, 6)
    assert res2.tokens == want, (res2.tokens, want)


def test_temperature_request_parsing():
    """request_from_json: temperature field, 0 => greedy (API
    convention), negative rejected."""
    from ergm_tpu.infer.server import request_from_json
    r = request_from_json({"prompt": [1, 2], "temperature": 0.7})
    assert r.temperature == pytest.approx(0.7) and not r.greedy
    r0 = request_from_json({"prompt": [1, 2], "temperature": 0})
    assert r0.greedy and r0.temperature == 1.0
    with pytest.raises(ValueError):
        request_from_json({"prompt": [1, 2], "temperature": -0.5})


def test_stop_sequences(setup):
    """Per-request stop sequences end generation when the output ends
    with one; the match stays in the output (like eos) and no token
    past it is emitted or streamed."""
    cfg, params = setup
    rng = np.random.default_rng(35)
    p = rng.integers(0, 50, (9,)).tolist()
    full, _ = oracle_greedy(params, cfg, p, 8)
    assert len(full) >= 4  # the greedy stream is long enough to cut

    def cut(stream, seqs):
        # earliest end position whose tail matches a stop sequence
        for e in range(1, len(stream) + 1):
            if any(e >= len(q) and stream[e - len(q):e] == q for q in seqs):
                return stream[:e]
        return stream

    srv = ContinuousServer(params, cfg, slots=2, eos_id=EOS, sp2_id=SP2,
                           max_prompt=32, prompt_bucket=16, sync_every=4)
    chunks = []
    # 2-token stop drawn from the stream; flat list = one sequence
    r_two = srv.submit(Request(prompt_ids=p, max_new_tokens=8, greedy=True,
                               stop=full[1:3]))
    # 1-token stop on the FIRST token (prefill-emitted)
    r_first = srv.submit(Request(prompt_ids=p, max_new_tokens=8,
                                 greedy=True, stop=[[full[0]]],
                                 stream_cb=lambda rid, new, done:
                                     chunks.append(list(new))))
    # non-matching stop: full stream
    r_none = srv.submit(Request(prompt_ids=p, max_new_tokens=8,
                                greedy=True, stop=[[VOCAB - 1]]))
    res = srv.run_until_drained()
    assert res[r_two].tokens == cut(full, [full[1:3]])
    assert res[r_first].tokens == full[:1]
    assert res[r_none].tokens == full
    assert sum(chunks, []) == full[:1]  # nothing streamed past the stop


def test_stop_parsing_and_validation():
    from ergm_tpu.infer.server import request_from_json
    r = request_from_json({"prompt": [1, 2], "stop": [5, 6]})
    assert r.stop == [[5, 6]]
    r = request_from_json({"prompt": [1, 2], "stop": [[5], [6, 7]]})
    assert r.stop == [[5], [6, 7]]
    assert request_from_json({"prompt": [1, 2]}).stop is None
    with pytest.raises(ValueError):
        request_from_json({"prompt": [1, 2], "stop": [[]]})
    # malformed shapes raise ValueError (not TypeError — the CLI serve
    # loop only catches ValueError per request), and the count/length
    # caps bound host-side harvest cost against untrusted clients
    from ergm_tpu.infer.server import _norm_stop
    with pytest.raises(ValueError, match="ids"):
        _norm_stop([5, [6, 7]])  # mixed flat/nested
    with pytest.raises(ValueError, match="ids"):
        _norm_stop([["a", "b"]])
    with pytest.raises(ValueError, match="too many"):
        _norm_stop([[1]] * 17)
    with pytest.raises(ValueError, match="too long"):
        _norm_stop([list(range(65))])
    assert _norm_stop([[1]] * 16) == [[1]] * 16
    # numpy integer scalars (tokenizer output) behave like Python ints
    # in the flat-list form (ADVICE r4: np.int64 failed the isinstance
    # check, so the flat list was treated as nested and raised)
    assert _norm_stop([np.int64(5), np.int64(6)]) == [[5, 6]]
    assert _norm_stop(np.array([5, 6])) == [[5, 6]]


def test_submit_does_not_mutate_request(setup):
    """submit() normalizes into a copy: callers may reuse or introspect
    their Request after submission (ADVICE r4)."""
    cfg, params = setup
    srv = ContinuousServer(params, cfg, slots=2, eos_id=EOS, sp2_id=SP2,
                           max_prompt=32, prompt_bucket=16, sync_every=4)
    req = Request(prompt_ids=[1, 2, 3], max_new_tokens=4,
                  temperature=0.0, stop=[5, 6])
    srv.submit(req)
    assert req.temperature == 0.0 and req.greedy is False
    assert req.stop == [5, 6]
    srv.run_until_drained()


def test_stop_sequences_spec_mode(setup):
    """Stop sequences on the SPECULATIVE serving path: a stop that hits
    mid-macro-step truncates the harvested stream at the match, nothing
    streams past it, and the slot is reusable afterwards (ADVICE r3:
    the spec path shares _done but had no coverage)."""
    cfg, params = setup
    rng = np.random.default_rng(41)
    p = rng.integers(0, 50, (9,)).tolist()
    full, _ = oracle_greedy(params, cfg, p, 10)
    assert len(full) >= 5

    srv = ContinuousServer(params, cfg, slots=2, eos_id=EOS, sp2_id=SP2,
                           max_prompt=32, prompt_bucket=16, sync_every=4,
                           spec_gamma=3, spec_ngram=2)
    chunks = []
    # stop on tokens [2:4] of the stream — inside the first or second
    # speculative macro step, never at a block boundary
    r_mid = srv.submit(Request(prompt_ids=p, max_new_tokens=10, greedy=True,
                               stop=full[2:4],
                               stream_cb=lambda rid, new, done:
                                   chunks.append(list(new))))
    r_none = srv.submit(Request(prompt_ids=p, max_new_tokens=10,
                                greedy=True, stop=[[VOCAB - 1]]))
    res = srv.run_until_drained()
    assert res[r_mid].tokens == full[:4]
    assert res[r_none].tokens == full
    assert sum(chunks, []) == full[:4]
    # the freed slot admits and completes a fresh request exactly
    r_next = srv.submit(Request(prompt_ids=p, max_new_tokens=6, greedy=True))
    assert srv.run_until_drained()[r_next].tokens == full[:6]


def test_submit_normalizes_temperature(setup):
    """Library callers constructing Request(temperature=0.0) directly
    get true greedy (same as request_from_json's conversion), and a
    negative temperature raises (ADVICE r3)."""
    cfg, params = setup
    rng = np.random.default_rng(42)
    p = rng.integers(0, 50, (7,)).tolist()
    srv = ContinuousServer(params, cfg, slots=2, eos_id=EOS, sp2_id=SP2,
                           max_prompt=32, prompt_bucket=16, sync_every=3)
    rid = srv.submit(Request(prompt_ids=p, max_new_tokens=6,
                             temperature=0.0))
    res = srv.run_until_drained()[rid]
    want, _ = oracle_greedy(params, cfg, p, 6)
    assert res.tokens == want
    with pytest.raises(ValueError, match="temperature"):
        srv.submit(Request(prompt_ids=p, max_new_tokens=4,
                           temperature=-0.5))


def _oracle_lsm(params, cfg, seq):
    """log-softmax logits over one plain forward of ``seq``."""
    ids = jnp.asarray(np.asarray(seq)[None], jnp.int32)
    tts = jnp.full_like(ids, SP2)
    out = jax.jit(lambda pr, i, t: gpt2.forward(pr, cfg, i,
                                                token_type_ids=t))(
        params, ids, tts)
    return np.asarray(jax.nn.log_softmax(
        out.logits[0].astype(jnp.float32), axis=-1))


def test_logprobs_match_oracle(setup):
    """Request.logprobs: emitted-token logprobs equal a plain forward's
    log-softmax at each position; rows that did not ask get None and
    their streams are unchanged by the logprob specialization."""
    cfg, params = setup
    rng = np.random.default_rng(36)
    p = rng.integers(0, 50, (9,)).tolist()
    q = rng.integers(0, 50, (12,)).tolist()
    srv = ContinuousServer(params, cfg, slots=2, eos_id=EOS, sp2_id=SP2,
                           max_prompt=32, prompt_bucket=16, sync_every=4)
    r_lp = srv.submit(Request(prompt_ids=p, max_new_tokens=6, greedy=True,
                              logprobs=True))
    r_plain = srv.submit(Request(prompt_ids=q, max_new_tokens=6,
                                 greedy=True))
    res = srv.run_until_drained()
    assert res[r_plain].logprobs is None
    assert res[r_plain].tokens == oracle_greedy(params, cfg, q, 6)[0]
    toks, lps = res[r_lp].tokens, res[r_lp].logprobs
    assert toks == oracle_greedy(params, cfg, p, 6)[0]
    assert len(lps) == len(toks)
    lsm = _oracle_lsm(params, cfg, p + toks)
    for k, t in enumerate(toks):
        assert abs(lps[k] - float(lsm[len(p) - 1 + k, t])) < 1e-3, k


def test_logprobs_session_extension(setup):
    """The session-extension admission program carries the first
    token's logprob too."""
    cfg, params = setup
    rng = np.random.default_rng(37)
    p1 = rng.integers(0, 50, (10,)).tolist()
    srv = ContinuousServer(params, cfg, slots=2, eos_id=EOS, sp2_id=SP2,
                           max_prompt=32, prompt_bucket=16, sync_every=3)
    r1 = srv.submit(Request(prompt_ids=p1, max_new_tokens=5, greedy=True,
                            session_id="lp"))
    res1 = srv.run_until_drained()[r1]
    p2 = p1 + res1.tokens + rng.integers(0, 50, (4,)).tolist()
    r2 = srv.submit(Request(prompt_ids=p2, max_new_tokens=5, greedy=True,
                            logprobs=True, session_id="lp"))
    res2 = srv.run_until_drained()[r2]
    assert "admit_ext" in srv._phase
    toks, lps = res2.tokens, res2.logprobs
    assert len(lps) == len(toks)
    lsm = _oracle_lsm(params, cfg, p2 + toks)
    for k, t in enumerate(toks):
        assert abs(lps[k] - float(lsm[len(p2) - 1 + k, t])) < 1e-3, k


def test_logprobs_request_parsing():
    from ergm_tpu.infer.server import request_from_json
    assert request_from_json({"prompt": [1], "logprobs": True}).logprobs
    assert not request_from_json({"prompt": [1]}).logprobs


def test_sorted_admission_policy(setup):
    """admit_policy='sorted' (offline cohort lever, VERDICT r4 #4):
    same results as fifo — only the admission ORDER changes — and
    budget-homogeneous cohorts actually co-reside."""
    cfg, params = setup
    rng = np.random.default_rng(11)
    prompts = [rng.integers(0, 50, (int(n),)).tolist()
               for n in rng.integers(4, 12, (8,))]
    budgets = [3, 9, 4, 8, 3, 9, 4, 8]

    def run(policy):
        srv = ContinuousServer(params, cfg, slots=2, eos_id=EOS,
                               sp2_id=SP2, max_prompt=32, prompt_bucket=16,
                               sync_every=4, admit_policy=policy)
        rids = [srv.submit(Request(prompt_ids=p, max_new_tokens=b,
                                   greedy=True))
                for p, b in zip(prompts, budgets)]
        res = srv.run_until_drained()
        return [res[r].tokens for r in rids]

    assert run("sorted") == run("fifo")
    with pytest.raises(ValueError, match="admit_policy"):
        ContinuousServer(params, cfg, slots=2, eos_id=EOS, sp2_id=SP2,
                         max_prompt=32, prompt_bucket=16, sync_every=4,
                         admit_policy="nope")


def test_kv_auto_mixed_pools_parity(setup):
    """kv_cache_dtype='auto' + tiered pools (VERDICT r4 #6): the short
    pool serves bf16 KV, the long pool int8 staged KV, in the SAME
    decode block. Short rows must match the bf16 generate oracle, long
    rows the int8 oracle."""
    cfg, params = setup
    srv = ContinuousServer(params, cfg, slots=4, eos_id=EOS, sp2_id=SP2,
                           max_prompt=32, prompt_bucket=16, sync_every=4,
                           long_slots=2, long_threshold=24)
    assert srv.gcfgs[0].kv_cache_dtype == "auto"
    assert srv.gcfgs[1].kv_cache_dtype == "int8"
    rng = np.random.default_rng(21)
    shorts = [rng.integers(0, 50, (n,)).tolist() for n in (6, 11)]
    longs = [rng.integers(0, 50, (n,)).tolist() for n in (30, 27)]
    rids = {}
    for p in shorts:
        rids[srv.submit(Request(prompt_ids=p, max_new_tokens=6,
                                greedy=True))] = (p, "auto")
    for p in longs:
        rids[srv.submit(Request(prompt_ids=p, max_new_tokens=6,
                                greedy=True))] = (p, "int8")
    results = srv.run_until_drained()
    for rid, (p, kv) in rids.items():
        want, _ = oracle_greedy(params, cfg.replace(kv_cache_dtype=kv),
                                p, 6)
        assert results[rid].tokens == want, (kv, p, results[rid].tokens,
                                             want)
