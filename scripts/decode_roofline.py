"""Roofline attribution of the B=256 decode step (VERDICT r3 next #1).

The decode headline has been flat at ~460 utt/s (4.35 ms/step at B=256)
for three rounds. This script produces the same per-component
attribution the train step got: it runs the decode_ablation variants at
the HEADLINE config (B=256, prompt=128, new=128, int8 KV, bf16
weights), derives per-component ms by subtraction, and emits a roofline
table against the v5e bounds (197 TFLOP/s bf16 MXU, ~819 GB/s HBM):

  component      derived from             analytic bound
  sampler        full - greedy            ~0 (top-64 approx over [B,V])
  lm_head        greedy - fixed           max(77 MB read, 25.7 GF)
  self-attn      fixed - noattn           KV int8 read 1.21 GB -> 1.48 ms
  cross-attn     (fixed - nocross') ...   ck/cv bf16 read 302 MB -> 0.37 ms
  matmul trunk   noattn - bound           weights 279 MB / 70.5 GF

Rows append to results/decode_roofline.jsonl. Run AFTER
scripts/decode_ablation.py has produced B=256 rows (or let this script
invoke them itself with AB_BATCH=256).

Usage: python scripts/decode_roofline.py [--measure]
  --measure: run the five ablation variants at B=256 first (TPU, slow)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ABL = os.path.join(REPO, "results", "decode_ablation.jsonl")
OUT = os.path.join(REPO, "results", "decode_roofline.jsonl")

VARIANTS = ["int8-full", "int8-greedy", "int8-fixed", "int8-noattn",
            "int8-nocross"]

# analytic bounds for one decode step at the headline config ----------------
B, H, D, L, T, Dm, V, Lc = 256, 12, 64, 12, 256, 768, 50271, 32
BW, MXU = 819e9, 197e12
W_LAYER = (3 + 1 + 1 + 1 + 8) * Dm * Dm      # qkv, proj, cross-q, cross-proj, mlp
W_TRUNK = W_LAYER * L + 2 * Dm * 1024        # + wpe (wte counted in lm_head)
W_LMHEAD = V * Dm
KV_BYTES = 2 * L * B * H * T * D             # int8 K+V, full buffer per step
KV_SCALE = 2 * L * B * H * T * 4             # f32 per-(token, head) scales
CROSS_BYTES = 2 * L * B * Lc * Dm * 2        # bf16 merged-head ck/cv
BOUNDS = {
    "sampler": 2 * B * V * 4 / BW,           # read f32 logits twice (top-k+lse)
    "lm_head": max(W_LMHEAD * 2 / BW, 2 * W_LMHEAD * B / MXU) + B * V * 4 / BW,
    "self_attention": (KV_BYTES + KV_SCALE) / BW,
    "cross_attention": CROSS_BYTES / BW,
    "matmul_trunk": max(W_TRUNK * 2 / BW, 2 * W_TRUNK * B / MXU),
}


def measure():
    env = dict(os.environ, AB_BATCH="256", AB_CHAIN="2", AB_REPS="2")
    subprocess.run([sys.executable,
                    os.path.join(REPO, "scripts", "decode_ablation.py"),
                    *VARIANTS], env=env, check=True)


def latest_rows():
    rows = {}
    with open(ABL) as f:
        for line in f:
            d = json.loads(line)
            if d.get("variant") in VARIANTS and d.get("B") == 256 \
                    and d.get("weight") in ("auto", None):
                rows[d["variant"]] = d  # latest wins
    missing = [v for v in VARIANTS if v not in rows]
    if missing:
        raise SystemExit(f"no B=256 rows for {missing}; run with --measure")
    return rows


def main():
    if "--measure" in sys.argv:
        measure()
    rows = latest_rows()
    ms = {v: rows[v]["step_ms"] for v in VARIANTS}
    comp = {
        "sampler": ms["int8-full"] - ms["int8-greedy"],
        "lm_head": ms["int8-greedy"] - ms["int8-fixed"],
        "self_attention": ms["int8-fixed"] - ms["int8-noattn"],
        # nocross removes cross-attn from the FULL variant
        "cross_attention": ms["int8-full"] - ms["int8-nocross"],
        # what remains of the fixed-token loop once attention is gone:
        # matmul trunk + embeds + cache quantize/write + loop overhead
        "trunk_and_overhead": ms["int8-noattn"],
    }
    table = []
    for name, t in comp.items():
        bound = BOUNDS.get(name if name != "trunk_and_overhead"
                           else "matmul_trunk")
        table.append({
            "component": name, "measured_ms": round(t, 3),
            "bound_ms": round(bound * 1e3, 3),
            "x_above_bound": round(t / (bound * 1e3), 2) if bound else None,
        })
    step = ms["int8-full"]
    ideal = sum(b for b in BOUNDS.values()) * 1e3
    row = {"round": 4, "study": "decode_roofline", "B": B, "T": T,
           "config": "headline: gpt2, int8 kv, bf16 w, prompt=128, new=128",
           "step_ms": step, "utt_per_s": round(B / (step * 1e-3) / 128, 1),
           "components": table,
           "roofline_step_ms": round(ideal, 2),
           "headroom_x": round(step / ideal, 2),
           "bounds_basis": "v5e 197 TFLOP/s bf16, 819 GB/s HBM; "
                           "KV int8 full-buffer read per step"}
    print(json.dumps(row, indent=1))
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
