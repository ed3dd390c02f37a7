"""CLI — flag-compatible with the reference (src/main.py:339-361), so the
``train.sh`` / ``infer.sh`` surface carries over unchanged, plus TPU-native
knobs (mesh shape, dtype, remat, tokenizer dir).

Dispatch mirrors src/main.py:367-396: ``--mode=train`` runs the Trainer;
``--mode=infer`` requires a checkpoint, runs the batched KV-cached test
pass, evaluates (dist-1/2, BERTScore when a local scorer model is
available, PPL, emotion accuracy), prints, and writes
``{ckpt_name}_evaluation_results.txt`` into the data dir
(src/main.py:393-396).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Optional

from ergm_tpu.core.config import ModelConfig, TrainConfig


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="ERGM-TPU train/infer CLI")
    # reference flags (src/main.py:339-361), names and defaults preserved
    p.add_argument("--seed", type=int, default=0, help="The random seed.")
    p.add_argument("--mode", type=str, required=True,
                   choices=["train", "infer", "interact", "serve"],
                   help="train/infer match the reference surface; interact "
                        "adds a live dialogue REPL on a trained checkpoint; "
                        "serve runs the continuous-batching server over a "
                        "JSONL requests file (infer/server.py).")
    p.add_argument("--data_dir", type=str, default="data")
    p.add_argument("--train_prefix", type=str, default="train")
    p.add_argument("--valid_prefix", type=str, default="valid")
    p.add_argument("--model_type", type=str, default="gpt2")
    p.add_argument("--bos_token", type=str, default="<bos>")
    p.add_argument("--sp1_token", type=str, default="<sp1>")
    p.add_argument("--sp2_token", type=str, default="<sp2>")
    p.add_argument("--gpu", type=str, default="0",
                   help="Accepted for reference CLI compatibility; device "
                        "selection is JAX's job here.")
    p.add_argument("--lr", type=float, default=2e-5)
    p.add_argument("--warmup_ratio", type=float, default=0.1)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--num_workers", type=int, default=0)
    p.add_argument("--num_epochs", type=int, default=100)
    p.add_argument("--max_len", type=int, default=1024)
    p.add_argument("--max_turns", type=int, default=10)
    p.add_argument("--top_p", type=float, default=0.95)
    p.add_argument("--ckpt_dir", type=str, default="saved_models")
    p.add_argument("--output_dir", type=str, default="outputs")
    p.add_argument("--ckpt_name", type=str, default=None)
    # the reference's train.sh passes --layers=0 against an argparse that
    # lacks the flag and dies (SURVEY.md §2.4.7); accept and ignore it
    p.add_argument("--layers", type=int, default=None, help=argparse.SUPPRESS)
    # TPU-native additions
    p.add_argument("--mesh_shape", type=str, default="-1",
                   help="Comma-separated mesh shape, e.g. '8' or '4,2'.")
    p.add_argument("--mesh_axes", type=str, default="data",
                   help="Comma-separated axis names matching --mesh_shape.")
    p.add_argument("--dtype", type=str, default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--remat", dest="remat", action="store_true", default=True,
                   help="Per-block rematerialization (default on; measured "
                        "faster end-to-end by unlocking larger batches).")
    p.add_argument("--no_remat", dest="remat", action="store_false")
    p.add_argument("--remat_policy", type=str, default=None,
                   choices=["full", "dots", "mlp", "mlp_only"],
                   help="Rematerialization policy (default mlp). Measured "
                        "single-chip recipes: gpt2 B=48 mlp; gpt2-medium "
                        "B=12 mlp + --adam_mu_dtype=bfloat16; gpt2-large "
                        "B=12 full + --adam_mu_dtype=bfloat16.")
    p.add_argument("--tokenizer_dir", type=str, default=None,
                   help="Dir with GPT-2 vocab.json/merges.txt for text decode.")
    p.add_argument("--init_params", type=str, default=None,
                   help="Orbax params dir to initialize from "
                        "(see ergm_tpu.cli.convert_ckpt).")
    p.add_argument("--prompt_mode", type=str, default="reference",
                   choices=["reference", "history"],
                   help="Infer prompts: 'reference' replicates src/main.py:316 "
                        "(full non-eos prefix); 'history' prompts with the "
                        "masked-history prefix only.")
    p.add_argument("--bert_model_dir", type=str, default=None,
                   help="Local HF encoder dir for BERTScore (no downloads).")
    p.add_argument("--bert_layer", type=int, default=None,
                   help="Hidden layer for BERTScore embeddings. Default: "
                        "the official scorer's per-model layer when the "
                        "model is recognized (e.g. 17 for roberta-large), "
                        "else the last layer.")
    p.add_argument("--bert_idf", action="store_true",
                   help="idf-weight BERTScore tokens (computed over the "
                        "reference corpus, like the official scorer).")
    p.add_argument("--bert_baselines", type=str, default=None,
                   help="BERTScore rescaling baselines: either a path to "
                        "an official bert_score rescale-baseline csv "
                        "(LAYER,P,R,F1 rows; the layer row in use is "
                        "selected automatically) or comma-separated P,R,F1 "
                        "numbers, e.g. '0.83,0.83,0.83'.")
    p.add_argument("--require_bertscore", action="store_true",
                   help="Fail the run if BERTScore cannot be computed "
                        "instead of skipping the metric.")
    p.add_argument("--num_beams", type=int, default=1,
                   help=">1 decodes with beam search instead of nucleus "
                        "sampling during inference.")
    p.add_argument("--sampler", type=str, default="full_sort",
                   choices=["approx", "exact", "full_sort"],
                   help="Nucleus sampler. Default 'full_sort' "
                        "(reference-identical full-vocab top-p) — measured "
                        "necessary for faithful quality metrics whenever "
                        "the nucleus exceeds 64 tokens "
                        "(results/sampler_quality.jsonl). 'approx' "
                        "(approx_max_k top-64) is the serving-throughput "
                        "option; 'exact' the exact top-64 middle ground.")
    p.add_argument("--kv_cache", type=str, default="auto",
                   choices=["auto", "int8"],
                   help="Decode KV-cache storage; int8 trades ~1e-2-level "
                        "sampling drift for ~1.24x decode throughput.")
    p.add_argument("--weight_dtype", type=str, default="auto",
                   choices=["auto", "int8"],
                   help="Serving weight storage; int8 (weight-only, "
                        "per-out-channel scales) halves weight-read HBM "
                        "traffic — the small-batch decode bottleneck.")
    p.add_argument("--keep_best", type=int, default=None,
                   help="Retain only the N lowest-PPL checkpoints "
                        "(default: keep all, like the reference).")
    p.add_argument("--limit", type=int, default=None,
                   help="Debug: use only the first N dialogues "
                        "(the reference's [:1] slice, made explicit).")
    p.add_argument("--draft_layers", type=int, default=0,
                   help="B=1 serving: >0 enables self-speculative decoding "
                        "with a draft built from the first N transformer "
                        "blocks (greedy output identical; sampling exact "
                        "via rejection sampling).")
    p.add_argument("--spec_gamma", type=int, default=4,
                   help="Speculative proposals per macro step.")
    p.add_argument("--spec_mode", type=str, default="auto",
                   choices=["auto", "none", "draft", "ngram"],
                   help="Speculative draft source: 'draft' = first "
                        "--draft_layers blocks of the model; 'ngram' = "
                        "prompt-lookup (propose the continuation of the "
                        "last n-gram's most recent earlier occurrence — "
                        "zero draft compute, wins whenever dialogue "
                        "repeats its context). Both are exact. 'auto' "
                        "(default) applies the measured policy: greedy "
                        "B=1 -> ngram on; sampled -> off "
                        "(B1_LATENCY.json, results/spec_bench.jsonl).")
    p.add_argument("--spec_ngram", type=int, default=3,
                   help="Lookup n-gram length for --spec_mode=ngram.")
    p.add_argument("--requests_file", type=str, default=None,
                   help="serve mode: JSONL requests — {'prompt': [ids...]} "
                        "or {'text': '...'} (text needs --tokenizer_dir); "
                        "optional max_new_tokens/top_p/temperature/"
                        "greedy/seed/stop/logprobs/"
                        "caption_ids/arrival_s/session_id/pool per line "
                        "(session_id: multi-turn continuation — the next "
                        "turn's full prompt prefills only its new tokens "
                        "against the session's retained KV).")
    p.add_argument("--serve_http", type=int, default=None, metavar="PORT",
                   help="serve mode: run an online HTTP endpoint on "
                        "localhost:PORT instead of a batch requests file "
                        "(POST /generate with prompt|text + stream flag, "
                        "GET /health; infer/http_server.py).")
    p.add_argument("--serve_output", type=str, default=None,
                   help="serve mode: output JSONL (default "
                        "<requests_file>.responses.jsonl).")
    p.add_argument("--serve_sync", type=int, default=8,
                   help="serve mode: decode steps per host sync block.")
    p.add_argument("--serve_spec_gamma", type=int, default=0,
                   help="serve mode: speculative serving — draft this many "
                        "tokens per macro step via device prompt-lookup "
                        "(n-gram) and verify them in one forward; per-slot "
                        "cursors advance by the accepted prefix + 1. Exact "
                        "greedy output; blocks with sampled rows fall back "
                        "to plain decode. 0 disables.")
    p.add_argument("--serve_spec_ngram", type=int, default=3,
                   help="serve mode: lookup n-gram length for "
                        "--serve_spec_gamma.")
    p.add_argument("--serve_prefill_chunk", type=int, default=0,
                   help="serve mode: admit prompts in chunks of this many "
                        "tokens (one chunk per decode block), bounding the "
                        "decode-latency hiccup a long prompt's admission "
                        "injects into concurrent streams; also lifts the "
                        "max-prompt admission cap (only chunks ever "
                        "prefill). 0 disables (single-shot admission).")
    p.add_argument("--serve_long_slots", type=int, default=0,
                   help="serve mode: length-tiered slot pools — reserve "
                        "this many slots as a LONG pool with its own KV "
                        "cache and capacity rung, so one long request no "
                        "longer widens the cache every short slot reads "
                        "(requests route by prompt + max_new_tokens - 1 "
                        "— the final KV cursor — vs "
                        "--serve_long_threshold, or per-request "
                        "'pool': 'long'|'short'). 0 disables.")
    p.add_argument("--serve_long_threshold", type=int, default=None,
                   help="serve mode: expected final length above which a "
                        "request routes to the long pool. Default: with "
                        "--requests_file, the (1 - K/S) quantile of the "
                        "file's expected final lengths (max_prompt — the "
                        "library default — is the LONGEST prompt's bucket "
                        "there, which would route everything short); with "
                        "--serve_http, max_prompt, with a warning.")
    p.add_argument("--serve_admit_policy", type=str, default=None,
                   choices=["fifo", "sorted"],
                   help="serve mode admission order: fifo (latency-fair) "
                        "or sorted (length-sorted cohorts -- co-resident "
                        "rows finish together). Default: sorted for batch "
                        "--requests_file runs (measured +22%% offline and "
                        "1.04x static, matrix2_summary_r5), fifo for "
                        "--serve_http (sorted starves under live "
                        "arrivals).")
    p.add_argument("--serve_pipeline", action="store_true",
                   help="serve mode: throughput mode — dispatch each decode "
                        "block before harvesting the previous one, hiding "
                        "the per-block host round trip behind device "
                        "compute (costs one block of finish-detection lag; "
                        "default synchronous order is the latency mode).")
    p.add_argument("--attn_pdrop", type=float, default=None,
                   help="Attention-probability dropout (default 0.1, the "
                        "reference's regularization; runs in-kernel on the "
                        "fused block-attention path — see PARITY.md).")
    p.add_argument("--resid_pdrop", type=float, default=None,
                   help="Residual dropout override (default 0.1).")
    p.add_argument("--embd_pdrop", type=float, default=None,
                   help="Embedding dropout override (default 0.1).")
    p.add_argument("--adam_mu_dtype", type=str, default=None,
                   choices=["bfloat16", "float32"],
                   help="Adam first-moment storage dtype; bfloat16 halves "
                        "the momentum buffer (HBM headroom for larger "
                        "batches under remat).")
    p.add_argument("--grad_accum_steps", type=int, default=1,
                   help="Average gradients over k micro-batches per "
                        "optimizer update (effective batch k*batch_size "
                        "past the single-chip HBM frontier).")
    p.add_argument("--length_grouped", type=int, default=0,
                   help="K > 1: sort examples by length within megabatches "
                        "of K*batch_size (batch order reshuffled) so "
                        "similar-length rows share a bucket — ~2x less pad "
                        "compute on real dialogue data. 0 = reference-like "
                        "uniform shuffle.")
    p.add_argument("--pad_multiple", type=int, default=128,
                   help="Bucket quantum for batch sequence lengths; 64 with "
                        "--length_grouped recovers more pad waste at the "
                        "cost of up to 2x compiled shapes.")
    p.add_argument("--shard_opt_state", action="store_true",
                   help="ZeRO-1: shard AdamW's fp32 moments over the mesh "
                        "data axis instead of replicating them per chip "
                        "(the memory that gates gpt2-xl under pure data "
                        "parallelism). Requires a multi-device 'data' "
                        "mesh axis.")
    p.add_argument("--save_on_preempt", type=int, default=1, choices=[0, 1],
                   help="1 (default): on SIGTERM (spot/preemptible VM "
                        "preemption) save an emergency checkpoint at the "
                        "next step-block boundary and exit; resume with "
                        "--ckpt_name=preempt. A second SIGTERM exits "
                        "immediately.")
    return p


def args_to_config(args) -> TrainConfig:
    mesh_shape = tuple(int(x) for x in str(args.mesh_shape).split(","))
    mesh_axes = tuple(str(args.mesh_axes).split(","))
    return TrainConfig(
        seed=args.seed, mode=args.mode, data_dir=args.data_dir,
        train_prefix=args.train_prefix, valid_prefix=args.valid_prefix,
        model_type=args.model_type, bos_token=args.bos_token,
        sp1_token=args.sp1_token, sp2_token=args.sp2_token,
        lr=args.lr, warmup_ratio=args.warmup_ratio, batch_size=args.batch_size,
        num_workers=args.num_workers, num_epochs=args.num_epochs,
        max_len=args.max_len, max_turns=args.max_turns, top_p=args.top_p,
        ckpt_dir=args.ckpt_dir, output_dir=args.output_dir,
        ckpt_name=args.ckpt_name, mesh_shape=mesh_shape,
        mesh_axis_names=mesh_axes, dtype=args.dtype, remat=args.remat,
        tokenizer_dir=args.tokenizer_dir, init_params=args.init_params,
        keep_best=args.keep_best,
        attn_pdrop=args.attn_pdrop, resid_pdrop=args.resid_pdrop,
        embd_pdrop=args.embd_pdrop, adam_mu_dtype=args.adam_mu_dtype,
        remat_policy=args.remat_policy,
        grad_accum_steps=args.grad_accum_steps,
        length_grouped=args.length_grouped, pad_multiple=args.pad_multiple,
        save_on_preempt=bool(args.save_on_preempt),
        shard_opt_state=args.shard_opt_state,
    )


def _load_tokenizer(tokenizer_dir: str, st):
    """Load the decode tokenizer WITH the special-token registry attached
    (a raw GPT-2 vocab/merges dir lacks <bos>/<sp1>/... — generated
    special ids would silently vanish from decode otherwise), and check
    the resulting vocab against the ids recorded at data-build time."""
    import warnings

    from ergm_tpu.tokenizer.bpe import load_or_train_default

    tok = load_or_train_default(tokenizer_dir)
    if len(tok) != st.vocab_size:
        warnings.warn(
            f"tokenizer vocab ({len(tok)}) != tokenizer_meta.json vocab "
            f"({st.vocab_size}); decoded text may be wrong — rebuild the "
            f"data or pass the tokenizer dir used at load_data time")
    return tok


def _serving_mesh(cfg: TrainConfig, batch_size: int = 0,
                  long_slots: int = 0):
    """Build the inference mesh from --mesh_shape/--mesh_axes (the same
    surface the Trainer honors — VERDICT r2 missing #2: serving must
    reach the mesh too). Returns None for a single-device mesh, where
    plain placement avoids sharding overhead.

    With the DEFAULT shape (-1 = all devices), a batch size not
    divisible by the device count shrinks the data axis to the largest
    divisor instead of failing — the implicit default must never error;
    an EXPLICIT --mesh_shape is strict. ``long_slots`` (tiered serving
    pools) adds the constraint that BOTH pools divide the data axis."""
    import jax

    from ergm_tpu.core.mesh import make_mesh

    shape, axes = cfg.mesh_shape, cfg.mesh_axis_names
    if tuple(shape) == (-1,):
        if not batch_size:
            # B=1 interact: pure DP over all devices only pads the batch;
            # multi-chip interact is an explicit --mesh_shape choice (TP)
            return None
        n = len(jax.devices())
        dp = n
        while dp > 1 and (batch_size % dp or (
                long_slots and ((batch_size - long_slots) % dp
                                or long_slots % dp))):
            dp -= 1
        # honor a user-supplied multi-name --mesh_axes (trailing axes get
        # size 1): shape=(dp,) with axes=('data','model') would otherwise
        # crash the Mesh constructor with a shape/names mismatch
        shape = (dp,) + (1,) * (len(axes) - 1)
    mesh = make_mesh(shape, axes)
    if mesh.devices.size <= 1:
        return None
    dp = mesh.shape.get("data", 1)
    if batch_size and batch_size % dp:
        raise ValueError(
            f"batch_size={batch_size} must be divisible by the mesh data "
            f"axis ({dp} devices); pick a divisible batch size or a "
            f"smaller --mesh_shape")
    return mesh


def _place_params(params, mesh):
    """Shard (TP specs) or replicate serving params over the mesh."""
    import jax

    from ergm_tpu.core.mesh import replicated, shard_params

    if mesh is None:
        return jax.device_put(params)
    if "model" in mesh.axis_names:
        return shard_params(params, mesh)
    return jax.device_put(params, replicated(mesh))


def run_infer(cfg: TrainConfig, args) -> dict:
    import jax

    from ergm_tpu.data.assembly import read_meta
    from ergm_tpu.data.dataset import DialogueDataset
    from ergm_tpu.evaluation.evaluate import Evaluator
    from ergm_tpu.infer.runner import run_test
    from ergm_tpu.models import gpt2
    from ergm_tpu.train import checkpoint as ckpt_lib

    st = read_meta(cfg.data_dir)
    mcfg = ModelConfig.from_model_type(cfg.model_type, vocab_size=st.vocab_size,
                                       dtype=cfg.dtype,
                                       kv_cache_dtype=getattr(args, "kv_cache", "auto"),
                                       weight_dtype=getattr(args, "weight_dtype", "auto"))
    max_len = min(cfg.max_len, mcfg.n_positions)
    dataset = DialogueDataset(cfg.valid_prefix, cfg.data_dir, sp1_id=st.sp1_id,
                              sp2_id=st.sp2_id, eos_id=st.eos_id,
                              max_len=max_len, limit=args.limit)

    path = ckpt_lib.find_checkpoint(cfg.ckpt_dir, cfg.ckpt_name)
    if path is None:
        print(f"Cannot find checkpoint {cfg.ckpt_name!r} under {cfg.ckpt_dir}")
        sys.exit(1)
    template = gpt2.init_params(jax.random.PRNGKey(0), mcfg)
    params = gpt2.params_for_inference(ckpt_lib.restore_params(path, template), mcfg)
    mesh = _serving_mesh(cfg, cfg.batch_size)
    params = _place_params(params, mesh)
    if mesh is not None:
        print(f"Serving over mesh {dict(mesh.shape)}")

    tokenizer = None
    if cfg.tokenizer_dir:
        tokenizer = _load_tokenizer(cfg.tokenizer_dir, st)

    res = run_test(
        params, mcfg, dataset, batch_size=cfg.batch_size, eos_id=st.eos_id,
        sp2_id=st.sp2_id, max_len=max_len, top_p=cfg.top_p, seed=cfg.seed,
        tokenizer=tokenizer, prompt_mode=args.prompt_mode,
        num_beams=args.num_beams, sampler=getattr(args, "sampler", "full_sort"),
        mesh=mesh, draft_layers=getattr(args, "draft_layers", 0),
        spec_gamma=getattr(args, "spec_gamma", 4),
        spec_mode=getattr(args, "spec_mode", "auto"),
        spec_ngram=getattr(args, "spec_ngram", 3))
    hyps, refs, true_labels, losses, preds, contexts = (
        res.hypotheses, res.references, res.true_labels, res.losses,
        res.pred_labels, res.contexts)

    from ergm_tpu.infer.runner import write_generations

    gen_path = os.path.join(cfg.data_dir, f"{cfg.ckpt_name}_generations.txt")
    write_generations(gen_path, contexts, refs, hyps)
    print(f"Sample generations written to {gen_path}")

    baselines = None
    if getattr(args, "bert_baselines", None):
        if os.path.exists(args.bert_baselines):
            baselines = args.bert_baselines  # official baseline csv path
        else:
            p_, r_, f_ = (float(x) for x in args.bert_baselines.split(","))
            baselines = {"precision": p_, "recall": r_, "f1": f_}
    evaluator = Evaluator(bert_model_dir=args.bert_model_dir,
                          bert_layer=getattr(args, "bert_layer", None),
                          bert_idf=getattr(args, "bert_idf", False),
                          bert_baselines=baselines,
                          require_bertscore=getattr(args, "require_bertscore", False))
    metrics = evaluator.evaluate_all(hyps, refs, true_label_ids=true_labels,
                                     losses=losses, pred_label_ids=preds,
                                     loss_token_counts=res.loss_tokens)

    print("\n--- Final Evaluation Results ---")
    for k, v in metrics.items():
        print(f"{k.upper():<12}: {v:.4f}" if isinstance(v, float) else f"{k.upper():<12}: {v}")
    print("--------------------------------")
    out_path = os.path.join(cfg.data_dir, f"{cfg.ckpt_name}_evaluation_results.txt")
    with open(out_path, "w", encoding="utf-8") as f:
        for k, v in metrics.items():
            f.write(f"{k}: {v}\n")
        # record the decode configuration so published numbers are
        # reproducible (the approx sampler deviates from the reference's
        # exact full-vocab top-p whenever the nucleus exceeds top-64)
        f.write(f"sampler: {getattr(args, 'sampler', 'approx')}\n")
        f.write(f"num_beams: {args.num_beams}\n")
        f.write(f"top_p: {cfg.top_p}\n")
        f.write(f"kv_cache: {getattr(args, 'kv_cache', 'auto')}\n")
        f.write(f"weight_dtype: {getattr(args, 'weight_dtype', 'auto')}\n")
        if getattr(args, "draft_layers", 0) or \
                getattr(args, "spec_mode", "auto") == "ngram":
            f.write(f"spec_mode: {getattr(args, 'spec_mode', 'auto')}\n")
            f.write(f"draft_layers: {args.draft_layers}\n")
            f.write(f"spec_gamma: {getattr(args, 'spec_gamma', 4)}\n")
            if getattr(args, "spec_mode", "auto") == "ngram":
                f.write(f"spec_ngram: {getattr(args, 'spec_ngram', 3)}\n")
    print(f"Results written to {out_path}")
    return metrics


def main(argv: Optional[list] = None):
    args = build_argparser().parse_args(argv)
    # path suffixing with the model type (src/main.py:364-365)
    args.data_dir = os.path.join(args.data_dir, args.model_type)
    args.ckpt_dir = os.path.join(args.ckpt_dir, args.model_type)
    cfg = args_to_config(args)

    # warm starts replay jitted programs from disk (14.8 -> 3.3 s
    # measured for the gpt2 train step on v5e); ERGM_NO_COMPILE_CACHE=1
    # opts out
    from ergm_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()

    # multi-host bootstrap from launcher env (ERGM_COORDINATOR /
    # ERGM_NUM_PROCESSES / ERGM_PROCESS_ID) — must run before any mesh
    # or device access so jax.devices() is the GLOBAL list
    from ergm_tpu.parallel.distributed import initialize_from_env

    dist = initialize_from_env()
    if dist is not None:
        print(f"multi-host: process {dist['process_index']}/"
              f"{dist['process_count']}, {dist['local_devices']} local / "
              f"{dist['global_devices']} global devices")

    if args.mode == "train":
        from ergm_tpu.train.trainer import Trainer

        Trainer(cfg, limit=args.limit).train()
    elif args.mode == "interact":
        run_interact(cfg, args)
    elif args.mode == "serve":
        run_serve(cfg, args)
    else:
        assert cfg.ckpt_name is not None, \
            "Please specify the trained checkpoint using --ckpt_name."
        run_infer(cfg, args)


def run_serve(cfg: TrainConfig, args):
    """--mode=serve: the continuous-batching server (infer/server.py)
    over a JSONL requests file. Each input line becomes a Request;
    lines with "arrival_s" are admitted on a real-time clock (online
    serving), others queue immediately. One JSON line per completed
    request goes to --serve_output: index, continuation token ids (and
    text when a tokenizer is available), predicted emotion id, latency.
    """
    import time as _t

    import jax
    import numpy as np

    from ergm_tpu.data.assembly import read_meta
    from ergm_tpu.infer.server import ContinuousServer, Request
    from ergm_tpu.models import gpt2
    from ergm_tpu.train import checkpoint as ckpt_lib

    assert args.requests_file or args.serve_http is not None, \
        "serve mode needs --requests_file (batch) or --serve_http PORT (online)"
    st = read_meta(cfg.data_dir)
    mcfg = ModelConfig.from_model_type(
        cfg.model_type, vocab_size=st.vocab_size, dtype=cfg.dtype,
        weight_dtype=getattr(args, "weight_dtype", "auto"),
        kv_cache_dtype=getattr(args, "kv_cache", "auto"))
    params = gpt2.init_params(jax.random.PRNGKey(cfg.seed), mcfg)
    path = ckpt_lib.find_checkpoint(cfg.ckpt_dir, cfg.ckpt_name)         if cfg.ckpt_name else None
    if path:
        print(f"Loading checkpoint {path}")
        params = ckpt_lib.restore_params(path, params)
    else:
        print("WARNING: no checkpoint found; responses come from random init")
    params = gpt2.params_for_inference(params, mcfg)
    mesh = _serving_mesh(cfg, cfg.batch_size,
                         long_slots=args.serve_long_slots)
    params = _place_params(params, mesh)
    if mesh is not None:
        print(f"Serving over mesh {dict(mesh.shape)}")
    tokenizer = (_load_tokenizer(cfg.tokenizer_dir, st)
                 if cfg.tokenizer_dir else None)

    if args.serve_http is not None:  # port 0 = ephemeral, still truthy intent
        from ergm_tpu.infer.http_server import ServerFrontend

        max_prompt = max(
            64, (min(cfg.max_len, mcfg.n_positions - args.serve_sync - 1)
                 // 64) * 64)
        if args.serve_long_slots and args.serve_long_threshold is None:
            print(f"WARNING: --serve_long_slots without "
                  f"--serve_long_threshold defaults the threshold to "
                  f"max_prompt={max_prompt}; requests only route long "
                  f"above that. Set the threshold to your short-traffic "
                  f"ceiling (or send per-request 'pool' hints) so the "
                  f"tier actually separates your workload.")
        srv = ContinuousServer(
            params, mcfg, slots=cfg.batch_size, eos_id=st.eos_id,
            sp2_id=st.sp2_id, max_prompt=max_prompt,
            cache_len=mcfg.n_positions, sync_every=args.serve_sync,
            mesh=mesh, pipeline=args.serve_pipeline,
            spec_gamma=args.serve_spec_gamma,
            spec_ngram=args.serve_spec_ngram,
            prefill_chunk=args.serve_prefill_chunk,
            long_slots=args.serve_long_slots,
            long_threshold=args.serve_long_threshold,
            admit_policy=args.serve_admit_policy or "fifo")
        fe = ServerFrontend(srv, tokenizer=tokenizer, port=args.serve_http,
                            default_top_p=cfg.top_p,
                            default_seed=cfg.seed).start()
        print(f"Serving HTTP on http://{fe.host}:{fe.port} "
              f"(POST /generate, GET /health; Ctrl-C to stop)")
        fe.serve_forever()
        return

    raw = []
    with open(args.requests_file) as f:
        for line in f:
            line = line.strip()
            if line:
                raw.append(json.loads(line))
    from ergm_tpu.infer.server import request_from_json

    reqs = [(request_from_json(r, tokenizer, default_top_p=cfg.top_p,
                               default_seed=cfg.seed),
             float(r.get("arrival_s", 0.0))) for r in raw]

    longest = max((len(q.prompt_ids) for q, _ in reqs), default=64)
    longest = ((longest + 63) // 64) * 64
    max_prompt = longest
    if args.serve_prefill_chunk:
        # chunked admission lifts the prompt cap (only chunks ever
        # prefill); max_prompt just sizes the first-chunk bucket and
        # must stay below the cache length
        chunk_b = ((args.serve_prefill_chunk + 63) // 64) * 64
        max_prompt = min(max(longest, chunk_b), max(
            64, ((mcfg.n_positions - args.serve_sync - 2) // 64) * 64))
    elif longest + args.serve_sync >= mcfg.n_positions:
        raise ValueError(
            f"longest request prompt buckets to {longest} tokens, but "
            f"serving needs prompt + sync_every < n_positions "
            f"({mcfg.n_positions}); shorten the prompt, or pass "
            f"--serve_prefill_chunk to admit long prompts in chunks")
    # logical cache length: with per-slot cursors the physical rung
    # tracks max(active length), so a full-context cache costs nothing
    # until requests actually grow into it — no workload tuning needed.
    # --max_len below n_positions still caps it (submit rejects
    # requests that cannot fit, loudly).
    cache_len = min(mcfg.n_positions,
                    max(cfg.max_len, longest + args.serve_sync + 1,
                        max_prompt + 1))
    long_threshold = args.serve_long_threshold
    if args.serve_long_slots and long_threshold is None:
        # Workload-aware default. The library default (max_prompt) is
        # the LONGEST prompt's bucket here, which would route every
        # request short and silently no-op the tier. Route roughly the
        # long-pool slot share of traffic long: the (1 - K/S) quantile
        # of expected final lengths (prompt + max_new - 1, the final KV
        # cursor), bucketed down so the short rung stays narrow.
        exp = sorted(len(q.prompt_ids) + q.max_new_tokens - 1
                     for q, _ in reqs)
        if exp:
            frac = 1.0 - args.serve_long_slots / max(cfg.batch_size, 1)
            q_ix = min(int(len(exp) * frac), len(exp) - 1)
            long_threshold = max(64, (exp[q_ix] // 64) * 64)
            print(f"--serve_long_threshold not set; using "
                  f"{long_threshold} (the {100 * frac:.0f}th percentile "
                  f"of expected final lengths in the requests file)")
    srv = ContinuousServer(
        params, mcfg, slots=cfg.batch_size, eos_id=st.eos_id,
        sp2_id=st.sp2_id, max_prompt=max_prompt, cache_len=cache_len,
        sync_every=args.serve_sync, mesh=mesh,
        pipeline=args.serve_pipeline,
        spec_gamma=args.serve_spec_gamma,
        spec_ngram=args.serve_spec_ngram,
        prefill_chunk=args.serve_prefill_chunk,
        long_slots=args.serve_long_slots,
        long_threshold=long_threshold,
        # batch file-serving is the offline regime: length-sorted
        # cohorts measured +22% (plain) / +33% (8%-long mix) and put
        # the server ABOVE same-session static on both
        # (matrix2_summary_r5)
        admit_policy=args.serve_admit_policy or "sorted")

    order = sorted(range(len(reqs)), key=lambda i: reqs[i][1])
    rid_to_idx = {}
    rejected = {}  # index -> error message (bad single request ≠ dead run)
    t0 = _t.time()
    nxt = 0
    while len(srv.results) < len(reqs) - len(rejected):
        now = _t.time() - t0
        while nxt < len(reqs) and reqs[order[nxt]][1] <= now:
            idx = order[nxt]
            try:
                rid_to_idx[srv.submit(reqs[idx][0])] = idx
            except ValueError as e:
                # e.g. prompt + budget exceeds the model context: record
                # the rejection and keep serving the rest of the file
                rejected[idx] = str(e)
                print(f"WARNING: request {idx} rejected: {e}")
            nxt += 1
        if not srv.busy():
            srv.flush()  # a pipelined in-flight block still harvests
            _t.sleep(0.002)
            continue
        srv.step()
    wall = _t.time() - t0

    out_path = args.serve_output or args.requests_file + ".responses.jsonl"
    rows = [{"index": idx, "error": msg} for idx, msg in rejected.items()]
    for rid, res in srv.results.items():
        row = {"index": rid_to_idx[rid], "tokens": res.tokens,
               "emotion_id": int(np.argmax(res.emotion_logits)),
               "latency_s": round(res.latency_s, 3)}
        if res.logprobs is not None:
            row["logprobs"] = [round(x, 5) for x in res.logprobs]
        if tokenizer is not None:
            stop = res.tokens[:-1] if (res.tokens and
                                       res.tokens[-1] == st.eos_id) \
                else res.tokens
            row["text"] = tokenizer.decode(stop)
        rows.append(row)
    with open(out_path, "w") as f:
        for row in sorted(rows, key=lambda r: r["index"]):
            f.write(json.dumps(row) + "\n")
    print(f"Served {len(reqs)} requests in {wall:.1f}s "
          f"({len(reqs) / max(wall, 1e-9):.1f} req/s) -> {out_path}")
    if srv.spec_proposed:
        print(f"speculative: {srv.spec_accepted}/{srv.spec_proposed} drafts "
              f"accepted ({srv.spec_accepted / srv.spec_proposed:.0%})")


def run_interact(cfg: TrainConfig, args=None):
    import jax

    from ergm_tpu.data.assembly import read_meta
    from ergm_tpu.infer.interact import run_repl
    from ergm_tpu.models import gpt2
    from ergm_tpu.train import checkpoint as ckpt_lib

    assert cfg.tokenizer_dir, "interact mode needs --tokenizer_dir"
    st = read_meta(cfg.data_dir)
    mcfg = ModelConfig.from_model_type(cfg.model_type, vocab_size=st.vocab_size,
                                       dtype=cfg.dtype,
                                       weight_dtype=getattr(args, "weight_dtype", "auto"))
    params = gpt2.init_params(jax.random.PRNGKey(cfg.seed), mcfg)
    path = ckpt_lib.find_checkpoint(cfg.ckpt_dir, cfg.ckpt_name)
    if path:
        print(f"Loading checkpoint {path}")
        params = ckpt_lib.restore_params(path, params)
    else:
        print("WARNING: no checkpoint found; replies come from random init")
    params = gpt2.params_for_inference(params, mcfg)
    mesh = _serving_mesh(cfg)
    params = _place_params(params, mesh)
    if mesh is not None:
        print(f"Serving over mesh {dict(mesh.shape)}")
    tokenizer = _load_tokenizer(cfg.tokenizer_dir, st)
    run_repl(params, mcfg, st, tokenizer, max_len=cfg.max_len,
             max_turns=cfg.max_turns, top_p=cfg.top_p, seed=cfg.seed,
             mesh=mesh, draft_layers=getattr(args, "draft_layers", 0),
             spec_gamma=getattr(args, "spec_gamma", 4),
             spec_mode=getattr(args, "spec_mode", "auto"),
             spec_ngram=getattr(args, "spec_ngram", 3))


if __name__ == "__main__":
    main()
