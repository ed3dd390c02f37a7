"""CLI end-to-end: load_data -> train -> infer on the synthetic fixture,
through the same entry points train.sh/infer.sh/load_data.sh call."""

import json
import os

import numpy as np
import pytest

from ergm_tpu.cli.load_data import main as load_data_main
from ergm_tpu.cli.main import build_argparser, main as cli_main


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    ws = tmp_path_factory.mktemp("ws")
    data_root = ws / "data"
    load_data_main([
        "--source=synthetic", f"--data_dir={data_root}", "--model_type=tiny",
        "--num_dialogues=4", "--turns=3",
    ])
    assert (data_root / "tiny" / "multi_train_data.pkl").exists()
    assert (data_root / "tiny" / "tokenizer_meta.json").exists()
    return ws


def _run_cli(ws, extra):
    cwd = os.getcwd()
    os.chdir(ws)
    try:
        cli_main(extra)
    finally:
        os.chdir(cwd)


def _patch_tiny_model(monkeypatch):
    """Route model_type 'tiny' to a small test config."""
    from ergm_tpu.core import config as config_mod

    monkeypatch.setitem(config_mod.GPT2_SIZES, "tiny",
                        dict(n_layer=2, n_head=4, n_embd=32))


def test_train_then_infer(workspace, monkeypatch):
    _patch_tiny_model(monkeypatch)
    common = [
        "--data_dir=data", "--model_type=tiny", "--batch_size=4",
        "--max_len=64", "--dtype=float32", "--mesh_shape=1", "--lr=1e-3",
    ]
    _run_cli(workspace, ["--mode=train", "--num_epochs=2", "--valid_prefix=valid",
                         "--layers=0", *common])  # --layers accepted, ignored
    ckpts = os.listdir(workspace / "saved_models" / "tiny")
    assert any(c.startswith("best_ckpt_epoch=") for c in ckpts)

    _run_cli(workspace, ["--mode=infer", "--ckpt_name=best", "--valid_prefix=valid",
                         "--top_p=0.8", *common])
    results = [f for f in os.listdir(workspace / "data" / "tiny")
               if f.endswith("_evaluation_results.txt")]
    assert results, "evaluation results file missing"
    text = (workspace / "data" / "tiny" / results[0]).read_text()
    assert "dist_1" in text and "ppl" in text and "emotion_acc" in text


def test_argparser_has_reference_flags():
    p = build_argparser()
    args = p.parse_args([
        "--mode=train", "--seed=0", "--data_dir=data", "--train_prefix=train",
        "--valid_prefix=test", "--model_type=gpt2", "--bos_token=<bos>",
        "--sp1_token=<sp1>", "--sp2_token=<sp2>", "--gpu=0", "--lr=1e-5",
        "--warmup_ratio=0.0", "--batch_size=8", "--num_workers=0",
        "--num_epochs=100", "--max_len=1024", "--max_turns=35",
        "--top_p=0.8", "--ckpt_dir=saved_models", "--output_dir=outputs",
        "--layers=0",  # the reference's phantom flag (SURVEY.md §2.4.7)
    ])
    assert args.model_type == "gpt2"
    assert args.max_turns == 35


def test_compilation_cache_helper(tmp_path, monkeypatch):
    """enable_compilation_cache points JAX at a persistent dir, honors
    JAX_COMPILATION_CACHE_DIR, and ERGM_NO_COMPILE_CACHE opts out."""
    import jax

    from ergm_tpu.utils.compilation_cache import enable_compilation_cache

    before = jax.config.jax_compilation_cache_dir
    try:
        monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", str(tmp_path / "cc"))
        monkeypatch.delenv("ERGM_NO_COMPILE_CACHE", raising=False)
        path = enable_compilation_cache()
        assert path == str(tmp_path / "cc")
        assert jax.config.jax_compilation_cache_dir == path
        import os as _os
        assert _os.path.isdir(path)

        monkeypatch.setenv("ERGM_NO_COMPILE_CACHE", "1")
        assert enable_compilation_cache() is None
    finally:
        jax.config.update("jax_compilation_cache_dir", before)


def test_infer_multichip_mesh_matches_single_device(workspace, monkeypatch):
    """--mesh_shape reaches serving (VERDICT r2 missing #2): --mode=infer
    on a data=4 x model=2 mesh of the 8 virtual CPU devices produces
    text identical to single-device serving, through the real CLI."""
    _patch_tiny_model(monkeypatch)
    common = [
        "--data_dir=data", "--model_type=tiny", "--batch_size=4",
        "--max_len=64", "--dtype=float32", "--lr=1e-3", "--valid_prefix=valid",
    ]
    ckpt = ["--ckpt_dir=mesh_models"]
    _run_cli(workspace, ["--mode=train", "--num_epochs=1", "--mesh_shape=1",
                         *ckpt, *common])

    def generations(mesh_args):
        _run_cli(workspace, ["--mode=infer", "--ckpt_name=best", "--top_p=0.8",
                             "--seed=3", *mesh_args, *ckpt, *common])
        path = workspace / "data" / "tiny" / "best_generations.txt"
        text = path.read_text()
        path.unlink()
        return text

    single = generations(["--mesh_shape=1"])
    meshed = generations(["--mesh_shape=4,2", "--mesh_axes=data,model"])
    assert "GPT-2:" in single
    assert meshed == single


def test_remat_policy_and_mu_dtype_reach_the_trainer(tmp_path):
    """--remat_policy / --adam_mu_dtype flow argparse -> TrainConfig ->
    the Trainer's ModelConfig/optimizer (the measured big-model recipes
    must be reachable from train.sh, not only from bench scripts)."""
    from ergm_tpu.cli.main import args_to_config, build_argparser
    from ergm_tpu.data.assembly import read_meta
    from ergm_tpu.data.synthetic import write_synthetic_dataset
    from ergm_tpu.train.trainer import Trainer

    d = tmp_path / "data"
    write_synthetic_dataset(str(d), prefixes=("train", "valid"),
                            num_dialogues=4, turns_per_dialogue=3,
                            base_vocab_size=64)
    args = build_argparser().parse_args([
        "--mode=train", f"--data_dir={d}", "--valid_prefix=valid",
        "--remat_policy=full", "--adam_mu_dtype=bfloat16",
        "--dtype=float32", "--batch_size=2", "--num_epochs=1",
        "--mesh_shape=1",
        f"--ckpt_dir={tmp_path / 'ck'}", f"--output_dir={tmp_path / 'out'}",
    ])
    cfg = args_to_config(args)
    assert cfg.remat_policy == "full" and cfg.adam_mu_dtype == "bfloat16"
    tr = Trainer(cfg)
    assert tr.mcfg.remat_policy == "full"


def test_serve_mode(workspace, monkeypatch):
    """--mode=serve: the continuous-batching server over a JSONL
    requests file, through the real CLI entry point."""
    _patch_tiny_model(monkeypatch)
    reqs = workspace / "requests.jsonl"
    out = workspace / "responses.jsonl"
    rng = np.random.default_rng(0)
    with open(reqs, "w") as f:
        for n in (5, 9, 14, 7, 11):
            f.write(json.dumps({
                "prompt": rng.integers(0, 50, (n,)).tolist(),
                "max_new_tokens": 6, "greedy": True}) + "\n")
    _run_cli(workspace, [
        "--mode=serve", "--data_dir=data", "--model_type=tiny",
        "--batch_size=2", "--max_len=64", "--dtype=float32",
        "--serve_sync=2", f"--requests_file={reqs}",
        f"--serve_output={out}",
    ])
    rows = [json.loads(l) for l in open(out) if l.strip()]
    assert len(rows) == 5
    assert [r["index"] for r in rows] == [0, 1, 2, 3, 4]
    for r in rows:
        assert 1 <= len(r["tokens"]) <= 6
        assert 0 <= r["emotion_id"] < 7
        assert r["latency_s"] >= 0

    # --serve_pipeline (throughput mode) must produce identical greedy
    # output through the same CLI surface
    out_pipe = workspace / "responses_pipe.jsonl"
    _run_cli(workspace, [
        "--mode=serve", "--data_dir=data", "--model_type=tiny",
        "--batch_size=2", "--max_len=64", "--dtype=float32",
        "--serve_sync=2", "--serve_pipeline", f"--requests_file={reqs}",
        f"--serve_output={out_pipe}",
    ])
    rows_pipe = [json.loads(l) for l in open(out_pipe) if l.strip()]
    assert [(r["index"], r["tokens"], r["emotion_id"]) for r in rows_pipe] \
        == [(r["index"], r["tokens"], r["emotion_id"]) for r in rows]

    # --serve_spec_gamma (speculative serving): same exact greedy output
    out_spec = workspace / "responses_spec.jsonl"
    _run_cli(workspace, [
        "--mode=serve", "--data_dir=data", "--model_type=tiny",
        "--batch_size=2", "--max_len=64", "--dtype=float32",
        "--serve_sync=2", "--serve_spec_gamma=3", "--serve_spec_ngram=2",
        f"--requests_file={reqs}", f"--serve_output={out_spec}",
    ])
    rows_spec = [json.loads(l) for l in open(out_spec) if l.strip()]
    assert [(r["index"], r["tokens"], r["emotion_id"]) for r in rows_spec] \
        == [(r["index"], r["tokens"], r["emotion_id"]) for r in rows]

    # --serve_long_slots (length-tiered pools): same exact greedy output
    out_tier = workspace / "responses_tier.jsonl"
    _run_cli(workspace, [
        "--mode=serve", "--data_dir=data", "--model_type=tiny",
        "--batch_size=3", "--max_len=64", "--dtype=float32",
        "--serve_sync=2", "--serve_long_slots=1",
        "--serve_long_threshold=12",
        f"--requests_file={reqs}", f"--serve_output={out_tier}",
    ])
    rows_tier = [json.loads(l) for l in open(out_tier) if l.strip()]
    assert [(r["index"], r["tokens"], r["emotion_id"]) for r in rows_tier] \
        == [(r["index"], r["tokens"], r["emotion_id"]) for r in rows]

    # tiering WITHOUT an explicit threshold: the CLI derives a
    # workload-quantile default (the library default, max_prompt, is
    # the longest prompt's bucket here and would route everything
    # short — review finding). Output must still be exact.
    out_tier_auto = workspace / "responses_tier_auto.jsonl"
    _run_cli(workspace, [
        "--mode=serve", "--data_dir=data", "--model_type=tiny",
        "--batch_size=3", "--max_len=64", "--dtype=float32",
        "--serve_sync=2", "--serve_long_slots=1",
        f"--requests_file={reqs}", f"--serve_output={out_tier_auto}",
    ])
    rows_ta = [json.loads(l) for l in open(out_tier_auto) if l.strip()]
    assert [(r["index"], r["tokens"], r["emotion_id"]) for r in rows_ta] \
        == [(r["index"], r["tokens"], r["emotion_id"]) for r in rows]


def test_serve_mode_chunked_rejection(workspace, monkeypatch):
    """--serve_prefill_chunk through the CLI: long prompts admit in
    chunks, and a request that cannot fit the model context is REJECTED
    as an error row in the output file instead of killing the run
    mid-file (round-3 review finding)."""
    from ergm_tpu.core import config as config_mod

    monkeypatch.setitem(config_mod.GPT2_SIZES, "tiny",
                        dict(n_layer=2, n_head=4, n_embd=32,
                             n_positions=128))
    rng = np.random.default_rng(7)
    reqs = workspace / "requests_chunked.jsonl"
    out = workspace / "responses_chunked.jsonl"
    with open(reqs, "w") as f:
        for n in (9, 100, 200, 30):  # 100 > chunk; 200 + 6 > n_positions
            f.write(json.dumps({
                "prompt": rng.integers(0, 50, (n,)).tolist(),
                "max_new_tokens": 6, "greedy": True}) + "\n")
    _run_cli(workspace, [
        "--mode=serve", "--data_dir=data", "--model_type=tiny",
        "--batch_size=2", "--max_len=64", "--dtype=float32",
        "--serve_sync=2", "--serve_prefill_chunk=16",
        f"--requests_file={reqs}", f"--serve_output={out}",
    ])
    rows = [json.loads(l) for l in open(out) if l.strip()]
    assert [r["index"] for r in rows] == [0, 1, 2, 3]
    assert "error" in rows[2] and "cache_len" in rows[2]["error"]
    for r in (rows[0], rows[1], rows[3]):
        assert 1 <= len(r["tokens"]) <= 6
        assert 0 <= r["emotion_id"] < 7
