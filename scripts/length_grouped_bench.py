"""Length-grouped batching benchmark (run on the TPU).

Measures the REAL-DATA training win of --length_grouped: a MELD-like
mixed-length synthetic dataset (windows 10..~370 tokens — the length
spread the reference's corpora produce, vs the full-length rows
train_bench.py uses) trained through the actual Trainer for 2 epochs
per variant. Epoch 1 pays bucket compiles; epoch 2 is the steady state
reported here.

Variants: uniform shuffle at pad_multiple=128 (the reference-like
default), grouped K=32 at 128, grouped K=32 at 64.

Reported per variant: steady-epoch wall seconds, pad efficiency
(real/padded tokens), padded tok/s, valid PPL after 2 epochs (quality
sanity — same data, same step count). Appends one JSON line per
variant to results/length_grouped_bench.jsonl.

Env: LG_DIALOGUES / LG_TURNS / LG_BATCH / LG_MODEL.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIALOGUES = int(os.environ.get("LG_DIALOGUES", 400))
TURNS = int(os.environ.get("LG_TURNS", 16))
BATCH = int(os.environ.get("LG_BATCH", 48))
MODEL = os.environ.get("LG_MODEL", "gpt2")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "results", "length_grouped_bench.jsonl")

VARIANTS = [  # (length_grouped, pad_multiple)
    (0, 128),
    (32, 128),
    (32, 64),
]
if os.environ.get("LG_VARIANTS"):  # e.g. "32:64,0:128" to rerun a subset
    VARIANTS = [tuple(int(x) for x in v.split(":"))
                for v in os.environ["LG_VARIANTS"].split(",")]


def main():
    import contextlib
    import io
    import tempfile

    from ergm_tpu.core.config import TrainConfig
    from ergm_tpu.data.synthetic import write_synthetic_dataset
    from ergm_tpu.train.trainer import Trainer
    from ergm_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    data_dir = tempfile.mkdtemp(prefix="lg_bench_")
    st = write_synthetic_dataset(
        data_dir, prefixes=("train", "valid"),
        num_dialogues=DIALOGUES, turns_per_dialogue=TURNS,
        utter_len=range(10, 23), base_vocab_size=50000)
    results = []
    for grouped, pad in VARIANTS:
        cfg = TrainConfig(
            data_dir=data_dir,
            ckpt_dir=os.path.join(data_dir, f"ckpt_{grouped}_{pad}"),
            output_dir=os.path.join(data_dir, f"out_{grouped}_{pad}"),
            batch_size=BATCH, num_epochs=2, lr=1e-4, max_len=1024,
            seed=0, model_type=MODEL, valid_prefix="valid",
            length_grouped=grouped, pad_multiple=pad)
        # Let the Trainer build the ModelConfig: an explicit one would
        # bypass the remat=cfg.remat default (ModelConfig.remat is
        # False) and the B=48 step OOMs v5e without remat.
        tr = Trainer(cfg)
        # epoch logs go to stdout; capture to parse pad eff + tok/s
        buf = io.StringIO()
        t0 = time.time()
        with contextlib.redirect_stdout(buf):
            tr.train()
            v_loss, v_ppl, _ = tr.validation()
        wall = time.time() - t0
        log = buf.getvalue()
        sys.stderr.write(log)
        epochs = [ln for ln in log.splitlines() if ln.startswith("Epoch ")]
        import re

        steady = epochs[-1]
        m = re.search(r"\| ([\d.]+)s \| ([\d,]+) tok/s.*pad eff (\d+)%",
                      steady)
        assert m, f"unparseable epoch line: {steady!r}"
        row = {
            "variant": f"grouped={grouped},pad={pad}",
            "model": MODEL, "batch": BATCH,
            "dialogues": DIALOGUES, "turns": TURNS,
            "epoch2_s": float(m.group(1)),
            "padded_tok_s": float(m.group(2).replace(",", "")),
            "pad_eff": int(m.group(3)) / 100.0,
            "valid_ppl_after": v_ppl,
            "total_wall_s": wall,
        }
        results.append(row)
        print(json.dumps(row))
        with open(OUT, "a") as f:
            f.write(json.dumps(row) + "\n")
    if len(results) >= 2 and results[0]["epoch2_s"] and results[-1]["epoch2_s"]:
        print(f"steady-epoch speedup grouped/64 vs uniform/128: "
              f"{results[0]['epoch2_s'] / results[-1]['epoch2_s']:.2f}x")


if __name__ == "__main__":
    main()
