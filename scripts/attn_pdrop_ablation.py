"""Quality ablation: attention-probability dropout 0.1 vs 0.0.

Context (VERDICT r2 #1): the reference trains with attn_pdrop=0.1 (HF
default; reference src/model.py:101,142), but attention-prob dropout
disqualifies the Pallas flash kernel (no in-kernel PRNG), silently
dropping training onto XLA attention with a materialized [B,H,L,L]
tensor. Before making attn_pdrop=0.0 the shipped default, this script
measures what that costs in QUALITY: train the synthetic dialogue task
to convergence under both settings (every other regularizer unchanged:
resid/embd dropout stay 0.1), several seeds each, and compare best
valid PPL + best valid emotion accuracy.

    JAX_PLATFORMS=cpu python scripts/attn_pdrop_ablation.py

Appends one JSON line per run + a summary line to
results/attn_pdrop_ablation.jsonl.
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
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "results", "attn_pdrop_ablation.jsonl")


def run_one(data_dir: str, seed: int, attn_pdrop: float) -> dict:
    from ergm_tpu.core.config import ModelConfig, TrainConfig
    from ergm_tpu.data.assembly import read_meta
    from ergm_tpu.train.trainer import Trainer

    st = read_meta(data_dir)
    mcfg = ModelConfig(
        vocab_size=st.vocab_size, n_positions=128, n_embd=64, n_layer=4,
        n_head=4, use_cross_attention=True, dtype="float32",
        embd_pdrop=0.1, resid_pdrop=0.1, attn_pdrop=attn_pdrop)
    with tempfile.TemporaryDirectory() as ckpt:
        cfg = TrainConfig(
            seed=seed, data_dir=data_dir, ckpt_dir=ckpt, output_dir="",
            batch_size=8, num_epochs=EPOCHS, lr=3e-3, max_len=128,
            warmup_ratio=0.1, dtype="float32", mesh_shape=(1,),
            valid_prefix="valid", prng_impl="threefry2x32")
        tr = Trainer(cfg, model_config=mcfg)
        tr.train()
        _, _, v_acc = tr.validation()
        return {"seed": seed, "attn_pdrop": attn_pdrop,
                "best_valid_ppl": tr.best_ppl, "final_valid_emotion_acc": v_acc}


def main():
    from ergm_tpu.data.synthetic import write_synthetic_dataset

    tmp = tempfile.mkdtemp(prefix="attn_pdrop_ablation_")
    write_synthetic_dataset(tmp, prefixes=("train", "valid"),
                            num_dialogues=32, turns_per_dialogue=6,
                            base_vocab_size=256, seed=7)
    rows = []
    with open(OUT, "a") as f:
        for drop in (0.1, 0.0):
            for seed in SEEDS:
                row = run_one(tmp, seed, drop)
                rows.append(row)
                print(json.dumps(row), flush=True)
                f.write(json.dumps(row) + "\n")
                f.flush()
        summary = {}
        for drop in (0.1, 0.0):
            ppls = [r["best_valid_ppl"] for r in rows if r["attn_pdrop"] == drop]
            accs = [r["final_valid_emotion_acc"] for r in rows if r["attn_pdrop"] == drop]
            summary[f"ppl_mean_drop{drop}"] = round(float(np.mean(ppls)), 4)
            summary[f"ppl_std_drop{drop}"] = round(float(np.std(ppls)), 4)
            summary[f"acc_mean_drop{drop}"] = round(float(np.mean(accs)), 2)
        summary["epochs"] = EPOCHS
        summary["seeds"] = SEEDS
        print(json.dumps({"summary": summary}), flush=True)
        f.write(json.dumps({"summary": summary}) + "\n")


if __name__ == "__main__":
    main()
