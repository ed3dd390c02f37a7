"""Shared train-and-compare harness for quality ablations.

Protocol (used by attn_pdrop_ablation.py and mu_dtype_ablation.py —
extracted so the scripts that claim to "mirror the protocol" share it
by construction): write ONE synthetic dialogue dataset, then for each
arm x seed train the tiny reference-shaped model (4 layers, cross-attn,
fp32) to convergence and record best valid PPL + final valid emotion
accuracy; append one JSON row per run and a mean/std summary line to
the caller's results jsonl.

Env knobs shared by every ablation: ABLATION_SEEDS (csv, default
"0,1,2"), ABLATION_EPOCHS (default 10).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SEEDS = [int(s) for s in os.environ.get("ABLATION_SEEDS", "0,1,2").split(",")]
EPOCHS = int(os.environ.get("ABLATION_EPOCHS", 10))


def _run_one(data_dir: str, seed: int, arm, arm_key: str, arm_label,
             model_kw, train_kw) -> dict:
    from ergm_tpu.core.config import ModelConfig, TrainConfig
    from ergm_tpu.data.assembly import read_meta
    from ergm_tpu.train.trainer import Trainer

    st = read_meta(data_dir)
    mcfg = ModelConfig(
        vocab_size=st.vocab_size, n_positions=128, n_embd=64, n_layer=4,
        n_head=4, use_cross_attention=True, dtype="float32",
        embd_pdrop=0.1, resid_pdrop=0.1, attn_pdrop=0.0,
        **(model_kw(arm) if model_kw else {}))
    with tempfile.TemporaryDirectory() as ckpt:
        cfg = TrainConfig(
            seed=seed, data_dir=data_dir, ckpt_dir=ckpt, output_dir="",
            batch_size=8, num_epochs=EPOCHS, lr=3e-3, max_len=128,
            warmup_ratio=0.1, dtype="float32", mesh_shape=(1,),
            valid_prefix="valid", prng_impl="threefry2x32",
            **(train_kw(arm) if train_kw else {}))
        tr = Trainer(cfg, model_config=mcfg)
        tr.train()
        _, _, v_acc = tr.validation()
        return {"seed": seed, arm_key: arm_label(arm),
                "best_valid_ppl": tr.best_ppl, "final_valid_emotion_acc": v_acc}


def run_quality_ablation(out_path: str, arm_key: str, arms, *,
                         model_kw=None, train_kw=None, arm_label=None,
                         summary_tag=None) -> None:
    """Run the arms x seeds grid and emit rows + summary.

    ``model_kw(arm)`` / ``train_kw(arm)``: extra kwargs merged into the
    tiny ModelConfig / TrainConfig for that arm. ``arm_label(arm)``:
    the value recorded in the row under ``arm_key`` (default: the arm
    itself). ``summary_tag(label)``: suffix used in the summary keys
    (default: the label, giving e.g. ``ppl_mean_bfloat16``).
    """
    from ergm_tpu.data.synthetic import write_synthetic_dataset

    arm_label = arm_label or (lambda a: a)
    summary_tag = summary_tag or (lambda label: label)
    tmp = tempfile.mkdtemp(prefix=f"{arm_key}_ablation_")
    write_synthetic_dataset(tmp, prefixes=("train", "valid"),
                            num_dialogues=32, turns_per_dialogue=6,
                            base_vocab_size=256, seed=7)
    rows = []
    with open(out_path, "a") as f:
        for arm in arms:
            for seed in SEEDS:
                row = _run_one(tmp, seed, arm, arm_key, arm_label,
                               model_kw, train_kw)
                rows.append(row)
                print(json.dumps(row), flush=True)
                f.write(json.dumps(row) + "\n")
                f.flush()
        summary = {}
        for arm in arms:
            label = arm_label(arm)
            tag = summary_tag(label)
            ppls = [r["best_valid_ppl"] for r in rows if r[arm_key] == label]
            accs = [r["final_valid_emotion_acc"] for r in rows
                    if r[arm_key] == label]
            summary[f"ppl_mean_{tag}"] = round(float(np.mean(ppls)), 4)
            summary[f"ppl_std_{tag}"] = round(float(np.std(ppls)), 4)
            summary[f"acc_mean_{tag}"] = round(float(np.mean(accs)), 2)
        summary["epochs"] = EPOCHS
        summary["seeds"] = SEEDS
        print(json.dumps({"summary": summary}), flush=True)
        f.write(json.dumps({"summary": summary}) + "\n")
