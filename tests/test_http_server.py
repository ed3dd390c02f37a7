"""HTTP front end over the continuous-batching server
(ergm_tpu/infer/http_server.py): concurrent localhost clients, greedy
oracle equality, block streaming, health and error surfaces."""

import json
import threading
import time
import urllib.error
import urllib.request

import jax
import numpy as np
import pytest

from ergm_tpu.core.config import ModelConfig
from ergm_tpu.infer.http_server import ServerFrontend
from ergm_tpu.infer.server import ContinuousServer
from ergm_tpu.models import gpt2

VOCAB, EOS, SP2 = 64, 60, 61


@pytest.fixture(scope="module")
def frontend():
    cfg = ModelConfig(vocab_size=VOCAB, n_positions=256, n_embd=32, n_layer=2,
                      n_head=4, use_cross_attention=False, dtype="float32",
                      embd_pdrop=0.0, attn_pdrop=0.0, resid_pdrop=0.0)
    params = gpt2.init_params(jax.random.PRNGKey(0), cfg)
    srv = ContinuousServer(params, cfg, slots=2, eos_id=EOS, sp2_id=SP2,
                           max_prompt=32, prompt_bucket=16, sync_every=3)
    fe = ServerFrontend(srv, port=0).start()
    yield fe, cfg, params
    fe.close()


def _post(fe, payload, timeout=300):
    req = urllib.request.Request(
        f"http://{fe.host}:{fe.port}/generate",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    return urllib.request.urlopen(req, timeout=timeout)


def _oracle(params, cfg, prompt, max_new):
    from ergm_tpu.infer.generate import generate
    import jax.numpy as jnp

    ids = jnp.asarray(np.asarray(prompt)[None], jnp.int32)
    out = generate(params, cfg, ids, len(prompt),
                   max_len=min(len(prompt) + max_new, cfg.n_positions),
                   eos_id=EOS, sp2_id=SP2, greedy=True,
                   token_type_ids=jnp.full_like(ids, SP2),
                   rng=jax.random.PRNGKey(0))
    return np.asarray(out.tokens[0])[len(prompt):int(out.lengths[0])].tolist()


def test_concurrent_requests_match_oracle(frontend):
    fe, cfg, params = frontend
    rng = np.random.default_rng(0)
    prompts = [rng.integers(0, 50, (n,)).tolist() for n in (5, 11, 17, 8)]
    outs = [None] * len(prompts)

    def worker(i):
        with _post(fe, {"prompt": prompts[i], "max_new_tokens": 8,
                        "greedy": True}) as r:
            outs[i] = json.loads(r.read())

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(len(prompts))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for p, o in zip(prompts, outs):
        assert o["tokens"] == _oracle(params, cfg, p, 8)
        assert 0 <= o["emotion_id"] < 7
        assert o["latency_s"] > 0


def test_streaming_chunks_concatenate(frontend):
    fe, cfg, params = frontend
    rng = np.random.default_rng(1)
    p = rng.integers(0, 50, (9,)).tolist()
    rows = []
    with _post(fe, {"prompt": p, "max_new_tokens": 10, "greedy": True,
                    "stream": True}) as r:
        for line in r:
            rows.append(json.loads(line))
    assert rows[-1]["done"] is True and "emotion_id" in rows[-1]
    toks = [t for row in rows[:-1] for t in row["tokens"]]
    assert not rows[-1].get("tokens")
    assert toks == _oracle(params, cfg, p, 10)
    # block granularity: more than one chunk for a 10-token budget at
    # sync_every=3
    assert len(rows) > 2


def test_health_and_errors(frontend):
    fe, _, _ = frontend
    with urllib.request.urlopen(
            f"http://{fe.host}:{fe.port}/health", timeout=60) as r:
        h = json.loads(r.read())
    assert h["slots"] == 2 and h["served"] >= 1

    # no prompt/text -> 400 at parse time
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(fe, {"max_new_tokens": 4})
    assert e.value.code == 400
    # prompt too long for the cache -> 400 from submit-side validation
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(fe, {"prompt": list(range(40)), "max_new_tokens": 4})
    assert e.value.code == 400
    # text without a tokenizer -> 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(fe, {"text": "hello"})
    assert e.value.code == 400


def test_chunked_admission_stays_live():
    """Liveness regression (round-3 review): the HTTP drive loop gates
    stepping on ``srv.busy()``, which must include in-progress chunked
    admissions — a chunk-prefilling slot is neither active nor queued,
    so the old ``queue or any(active)`` gate hung the chunked request
    forever once the concurrent short stream finished. Also checks
    /health exposes the ``prefilling`` count."""
    cfg = ModelConfig(vocab_size=VOCAB, n_positions=256, n_embd=32, n_layer=2,
                      n_head=4, use_cross_attention=False, dtype="float32",
                      embd_pdrop=0.0, attn_pdrop=0.0, resid_pdrop=0.0)
    params = gpt2.init_params(jax.random.PRNGKey(0), cfg)
    srv = ContinuousServer(params, cfg, slots=2, eos_id=EOS, sp2_id=SP2,
                           max_prompt=128, prompt_bucket=16, sync_every=2,
                           prefill_chunk=16)
    fe = ServerFrontend(srv, port=0).start()
    try:
        with urllib.request.urlopen(
                f"http://{fe.host}:{fe.port}/health", timeout=30) as r:
            assert "prefilling" in json.loads(r.read())
        rng = np.random.default_rng(40)
        short = rng.integers(0, 50, (6,)).tolist()
        long_p = rng.integers(0, 50, (110,)).tolist()  # 7 chunks of 16
        outs = {}

        def worker(name, prompt, budget):
            with _post(fe, {"prompt": prompt, "max_new_tokens": budget,
                            "greedy": True}, timeout=600) as r:
                outs[name] = json.loads(r.read())

        ts = threading.Thread(target=worker, args=("short", short, 6))
        tl = threading.Thread(target=worker, args=("long", long_p, 4))
        ts.start()
        tl.start()
        ts.join(timeout=600)
        tl.join(timeout=600)
        assert not ts.is_alive() and not tl.is_alive(), \
            "chunked request hung: drive loop stopped stepping"
        assert outs["long"]["tokens"] == _oracle(params, cfg, long_p, 4)
        assert outs["short"]["tokens"] == _oracle(params, cfg, short, 6)
    finally:
        fe.close()


def test_stream_disconnect_cancels_request():
    """A streaming client that disconnects mid-response must CANCEL its
    request (the slot stops decoding a response nobody reads) without
    perturbing concurrent streams. Uses a raw socket so the test
    controls the disconnect instant."""
    import socket

    cfg = ModelConfig(vocab_size=VOCAB, n_positions=256, n_embd=32, n_layer=2,
                      n_head=4, use_cross_attention=False, dtype="float32",
                      embd_pdrop=0.0, attn_pdrop=0.0, resid_pdrop=0.0)
    params = gpt2.init_params(jax.random.PRNGKey(0), cfg)
    srv = ContinuousServer(params, cfg, slots=2, eos_id=EOS, sp2_id=SP2,
                           max_prompt=32, prompt_bucket=16, sync_every=2)
    fe = ServerFrontend(srv, port=0).start()
    try:
        rng = np.random.default_rng(41)
        doomed = rng.integers(0, 50, (8,)).tolist()
        survivor = rng.integers(0, 50, (11,)).tolist()
        payload = json.dumps({"prompt": doomed, "max_new_tokens": 200,
                              "greedy": True, "stream": True}).encode()
        sock = socket.create_connection((fe.host, fe.port), timeout=120)
        sock.sendall(b"POST /generate HTTP/1.0\r\n"
                     b"Content-Type: application/json\r\n"
                     + f"Content-Length: {len(payload)}\r\n\r\n".encode()
                     + payload)
        sock.recv(1)  # first byte of the streamed response has arrived
        sock.close()  # client walks away mid-stream
        # a concurrent (blocking) request keeps the driver stepping and
        # must be oracle-exact despite the neighbor's disconnect
        with _post(fe, {"prompt": survivor, "max_new_tokens": 8,
                        "greedy": True}) as r:
            out = json.loads(r.read())
        assert out["tokens"] == _oracle(params, cfg, survivor, 8)
        deadline = time.time() + 120
        while time.time() < deadline:
            with urllib.request.urlopen(
                    f"http://{fe.host}:{fe.port}/health", timeout=30) as r:
                h = json.loads(r.read())
            if h["cancelled"] == 1 and h["active"] == 0:
                break
            time.sleep(0.1)
        assert h["cancelled"] == 1, h
        assert h["active"] == 0, f"cancelled slot still decoding: {h}"
        assert not fe._replies and not fe._streamed  # bookkeeping drained
    finally:
        fe.close()


def test_stream_text_delta_utf8_block_boundary():
    """Byte-level BPE can split a multi-byte UTF-8 character across a
    block boundary; per-block decoding would emit U+FFFD on both sides.
    The running-prefix delta must emit each character exactly once,
    holding back incomplete tails."""
    class ByteTok:  # one token = one byte, like byte-level BPE's worst case
        def decode(self, toks):
            return bytes(toks).decode("utf-8", errors="replace")

    fe = ServerFrontend.__new__(ServerFrontend)
    fe.tok = ByteTok()
    fe.eos_id = 999
    fe._streamed = {}
    s = "héllo wörld"
    data = list(s.encode())  # é/ö are 2 bytes each
    # feed in 3-byte blocks: the é split lands mid-character
    emitted = ""
    for i in range(0, len(data), 3):
        emitted += fe._stream_text_delta(7, data[:i + 3])
    # final flush: what _deliver sends with the done row
    emitted += ByteTok().decode(data)[fe._streamed.pop(7, 0):]
    assert emitted == s
    assert "�" not in emitted
