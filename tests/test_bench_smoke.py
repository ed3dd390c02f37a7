"""Smoke-test the driver-facing entry scripts in subprocesses: bench.py
must print exactly one valid JSON line on stdout, and __graft_entry__
must expose its two contract functions."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_prints_one_json_line(tmp_path):
    env = dict(os.environ,
               JAX_PLATFORM_NAME="cpu", JAX_PLATFORMS="cpu",
               BENCH_BATCH="2", BENCH_PROMPT="16", BENCH_NEW_TOKENS="4",
               BENCH_MODEL="gpt2", BENCH_REPS="1",
               TRAIN_BENCH_BATCH="2", TRAIN_BENCH_SEQ="32",
               TRAIN_BENCH_MODEL="gpt2", TRAIN_BENCH_REPS="1",
               TRAIN_BENCH_CHAIN="1",
               BENCH_B1_PROMPT="16", BENCH_B1_NEW="4",
               BENCH_B1_CHAIN="1", BENCH_B1_REPS="1")
    env["TRAIN_BENCH_OUT"] = str(tmp_path / "TRAIN_BENCH.json")
    env["B1_LATENCY_OUT"] = str(tmp_path / "B1_LATENCY.json")
    # the subprocess runs from tmp_path; make the repo importable there
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # tiny geometry so the CPU run stays fast
    code = (
        "import ergm_tpu.core.config as c;"
        "c.GPT2_SIZES['gpt2'] = dict(n_layer=2, n_head=4, n_embd=64);"
        "import runpy, sys; sys.argv=['bench.py'];"
        f"runpy.run_path(r'{os.path.join(REPO, 'bench.py')}', run_name='__main__')"
    )
    # isolate the baseline file so the smoke run can't touch the real anchor
    cwd = str(tmp_path)
    proc = subprocess.run([sys.executable, "-c", code], env=env, cwd=cwd,
                          capture_output=True, text=True, timeout=500)
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [l for l in proc.stdout.strip().splitlines() if l.strip()]
    assert len(lines) == 1, proc.stdout
    payload = json.loads(lines[0])
    # the driver contract requires these four keys; extras (compile_s
    # records cold-start variance) are allowed
    assert set(payload) >= {"metric", "value", "unit", "vs_baseline"}
    assert payload["value"] > 0
    # the side artifact carries the training number + MFU for the driver
    train_path = str(tmp_path / "TRAIN_BENCH.json")
    assert os.path.exists(train_path), proc.stderr[-2000:]
    with open(train_path) as f:
        train = json.load(f)
    assert train["metric"] == "trimodal_train_tokens_per_sec_per_chip"
    assert train["value"] > 0 and "model_tflops" in train
    # B=1 latency artifact (int8 weight-only serving config)
    with open(str(tmp_path / "B1_LATENCY.json")) as f:
        b1 = json.load(f)
    assert b1["metric"] == "trimodal_b1_request_latency_ms"
    assert b1["value"] > 0 and "w=int8" in b1["unit"]


def test_graft_entry_contract():
    import __graft_entry__ as g

    assert callable(g.entry)
    assert callable(g.dryrun_multichip)
