#!/bin/bash
# gpt2-medium hardware dress rehearsal (VERDICT r3 next #5).
#
# The reference's PUBLISHED training config is gpt2-medium
# (/root/reference/train.sh:7); rounds 1-3 rehearsed the full user
# surface at gpt2 only. This runs the complete pipeline at the
# reference's own model size on the TPU chip:
#
#   load_data.sh (synthetic captioned dataset, reference pickle schema)
#   -> train.sh  (gpt2-medium, 2 epochs, reference flag surface)
#   -> infer.sh  (sampled eval producing the reference-format results file)
#   -> --mode=serve (continuous batching over a mixed request file)
#   -> opportunistic validations (real-weights / bert_score attempts)
#
# Writes everything under REHEARSAL_DIR (default /tmp/rehearsal_medium)
# and appends a summary row to results/rehearsal_medium.jsonl. Runtime
# on one v5e chip is dominated by medium train-step compiles + 2 epochs.
set -euo pipefail
cd "$(dirname "$0")/.."

export MODEL_TYPE=${MODEL_TYPE:-gpt2-medium}
export DATA_DIR=${REHEARSAL_DIR:-/tmp/rehearsal_medium}/data
RDIR=${REHEARSAL_DIR:-/tmp/rehearsal_medium}
EPOCHS=${NUM_EPOCHS:-2}
BATCH=${BATCH_SIZE:-8}   # reference train.sh:10 batch size
LOG="$RDIR/rehearsal.log"
mkdir -p "$RDIR" "$DATA_DIR"
echo "rehearsal dir: $RDIR (model $MODEL_TYPE, epochs $EPOCHS, batch $BATCH)" | tee "$LOG"

step() { echo "=== $(date +%H:%M:%S) $*" | tee -a "$LOG"; }

step "load_data (synthetic captioned dataset, reference schema)"
./load_data.sh --source=synthetic --captions --num_dialogues=48 \
    2>&1 | tee -a "$LOG"

step "train.sh ($MODEL_TYPE, $EPOCHS epochs)"
NUM_EPOCHS=$EPOCHS BATCH_SIZE=$BATCH VALID_PREFIX=valid ./train.sh \
    --ckpt_dir="$RDIR/saved_models" --output_dir="$RDIR/outputs" \
    --length_grouped=8 \
    2>&1 | tee -a "$LOG"

step "infer.sh (sampled eval -> reference-format results file)"
BATCH_SIZE=4 VALID_PREFIX=valid ./infer.sh best \
    --ckpt_dir="$RDIR/saved_models" --output_dir="$RDIR/outputs" \
    2>&1 | tee -a "$LOG"

step "serve (continuous batching over a mixed request file)"
python - <<'PY'
import json, os, numpy as np
rd = os.environ.get("REHEARSAL_DIR", "/tmp/rehearsal_medium")
rng = np.random.default_rng(0)
with open(os.path.join(rd, "requests.jsonl"), "w") as f:
    for i in range(24):
        req = {"prompt": rng.integers(0, 50000, (int(rng.integers(16, 96)),)).tolist(),
               "max_new_tokens": int(rng.integers(16, 64))}
        if i % 3 == 0:
            req["greedy"] = True
        f.write(json.dumps(req) + "\n")
PY
python -m ergm_tpu.cli.main --mode=serve --model_type="$MODEL_TYPE" \
    --data_dir="$DATA_DIR" --ckpt_dir="$RDIR/saved_models" --ckpt_name=best \
    --bos_token="<bos>" --sp1_token="<sp1>" --sp2_token="<sp2>" \
    --max_len=1024 --batch_size=8 --serve_sync=16 \
    --requests_file="$RDIR/requests.jsonl" \
    --serve_output="$RDIR/serve_results.jsonl" \
    2>&1 | tee -a "$LOG"

step "opportunistic validations (assets attempted, reasons logged)"
python scripts/opportunistic_validations.py 2>&1 | tee -a "$LOG"

step "summary -> results/rehearsal_medium.jsonl"
python - <<'PY'
import json, os, re, glob
rd = os.environ.get("REHEARSAL_DIR", "/tmp/rehearsal_medium")
log = open(os.path.join(rd, "rehearsal.log")).read()
row = {"study": "rehearsal_medium", "model": os.environ.get("MODEL_TYPE"),
       "epochs": os.environ.get("NUM_EPOCHS", "2")}
m = re.findall(r"([\d.]+)k? tok/s", log)
toks = re.findall(r"tok/s[=: ]+([\d.k]+)", log)
for key, pat in [("epoch_tok_per_s", r"tok/s=([\d.]+)"),
                 ("valid_ppl", r"[Vv]alid.*?PPL[=: ]+([\d.]+)"),
                 ("serve_wall_s", r"serve.*?wall[=: ]+([\d.]+)")]:
    ms = re.findall(pat, log)
    if ms:
        row[key] = ms[-1]
serve = os.path.join(rd, "serve_results.jsonl")
if os.path.exists(serve):
    rows = [json.loads(l) for l in open(serve)]
    row["serve_rows"] = len(rows)
results = glob.glob(os.path.join(rd, "outputs", "**", "*evaluation_results*"),
                    recursive=True)
row["eval_results_file"] = results[0] if results else None
out = os.path.join("results", "rehearsal_medium.jsonl")
with open(out, "a") as f:
    f.write(json.dumps(row) + "\n")
print(json.dumps(row))
PY
step "done"
