#!/bin/bash
# Data assembly launcher — the step the reference's load_data.sh points at
# but does not ship (SURVEY.md §2.4.1).
python -m ergm_tpu.cli.load_data \
    --data_dir="${DATA_DIR:-data}" \
    --train_prefix="train" \
    --valid_prefix="valid" \
    --train_frac=0.85 \
    --model_type="${MODEL_TYPE:-gpt2}" \
    "$@"
