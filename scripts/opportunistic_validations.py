"""Opportunistic execution of the environment-gated validations.

Three validations have never executed anywhere because their assets
don't exist in this environment (VERDICT r3 missing #1-2 / next #8):

1. real-pretrained-GPT-2 weight parity (tests/test_real_weights.py,
   needs ERGM_GPT2_WEIGHTS_DIR -> a local HF GPT-2 checkpoint),
2. the official-BERTScore golden (tests/test_bertscore.py, needs the
   ``bert_score`` pip package importable),
3. rescale-baseline csvs vendored from the bert_score package.

This script ATTEMPTS each one and logs attempt + outcome + reason to
results/opportunistic_validations.jsonl, so the moment any asset
appears (a weights dir on disk, a wheel in the pip cache, network), the
validation runs without anyone remembering to wire it. Run it as part
of every dress rehearsal:

    python scripts/opportunistic_validations.py

Asset acquisition, for an environment WITH network egress:
    pip install bert_score && python - <<'PY'
    from transformers import GPT2LMHeadModel, GPT2Tokenizer
    GPT2LMHeadModel.from_pretrained("gpt2").save_pretrained("/data/gpt2")
    GPT2Tokenizer.from_pretrained("gpt2").save_pretrained("/data/gpt2")
    PY
    ERGM_GPT2_WEIGHTS_DIR=/data/gpt2 python scripts/opportunistic_validations.py
"""

from __future__ import annotations

import datetime
import glob
import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "results", "opportunistic_validations.jsonl")

# locations scanned for a GPT-2 checkpoint when ERGM_GPT2_WEIGHTS_DIR is
# unset: HF cache layouts and conventional local dirs
WEIGHT_SEARCH = [
    os.path.expanduser("~/.cache/huggingface/hub/models--gpt2/snapshots/*"),
    os.path.expanduser("~/.cache/huggingface/transformers"),
    "/data/gpt2", "/models/gpt2", os.path.join(REPO, "assets", "gpt2"),
]


def _log(row):
    row = {"ts": datetime.datetime.now(datetime.timezone.utc)
           .strftime("%Y-%m-%dT%H:%M:%SZ"), **row}
    print(json.dumps(row))
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")


def _looks_like_gpt2_dir(path):
    if not os.path.isdir(path):
        return False
    names = set(os.listdir(path))
    has_weights = any(n.endswith((".safetensors", ".bin")) for n in names)
    return has_weights and "config.json" in names


def find_weights():
    env = os.environ.get("ERGM_GPT2_WEIGHTS_DIR")
    if env:
        return env if _looks_like_gpt2_dir(env) else None
    for pattern in WEIGHT_SEARCH:
        for cand in sorted(glob.glob(pattern)):
            if _looks_like_gpt2_dir(cand):
                return cand
    return None


def attempt_real_weights():
    wdir = find_weights()
    if not wdir:
        _log({"validation": "real_gpt2_weights", "ran": False,
              "reason": "no GPT-2 checkpoint found: ERGM_GPT2_WEIGHTS_DIR "
                        "unset and no candidate dir matches "
                        f"{WEIGHT_SEARCH} (this environment has no network "
                        "egress to download one)"})
        return
    env = dict(os.environ, ERGM_GPT2_WEIGHTS_DIR=wdir)
    r = subprocess.run(
        [sys.executable, "-m", "pytest", "-q",
         os.path.join(REPO, "tests", "test_real_weights.py")],
        env=env, capture_output=True, text=True)
    _log({"validation": "real_gpt2_weights", "ran": True, "weights": wdir,
          "passed": r.returncode == 0,
          "tail": r.stdout.strip().splitlines()[-3:]})


def attempt_bertscore_golden():
    try:
        import bert_score  # noqa: F401
        importable = True
    except ImportError as e:
        importable = False
        reason = f"bert_score not importable ({e}); pip install attempted next"
    if not importable:
        # a wheel may exist in a local pip cache even without egress
        pip = subprocess.run(
            [sys.executable, "-m", "pip", "install", "--no-input",
             "--disable-pip-version-check", "bert_score"],
            capture_output=True, text=True, timeout=120)
        if pip.returncode == 0:
            importable = True
        else:
            reason += f"; pip install failed: {pip.stderr.strip().splitlines()[-1:]}"
    if not importable:
        _log({"validation": "official_bertscore_golden", "ran": False,
              "reason": reason})
        return
    r = subprocess.run(
        [sys.executable, "-m", "pytest", "-q", "-k", "official",
         os.path.join(REPO, "tests", "test_bertscore.py")],
        capture_output=True, text=True)
    _log({"validation": "official_bertscore_golden", "ran": True,
          "passed": r.returncode == 0,
          "tail": r.stdout.strip().splitlines()[-3:]})


def attempt_vendor_rescale_baselines():
    dest = os.path.join(REPO, "ergm_tpu", "evaluation", "rescale_baseline")
    if glob.glob(os.path.join(dest, "*", "*.tsv")):
        _log({"validation": "vendor_rescale_baselines", "ran": True,
              "passed": True, "reason": "already vendored", "dest": dest})
        return
    try:
        import bert_score
        src = os.path.join(os.path.dirname(bert_score.__file__),
                           "rescale_baseline")
    except ImportError:
        src = None
    if not src or not os.path.isdir(src):
        _log({"validation": "vendor_rescale_baselines", "ran": False,
              "reason": "bert_score package (the source of the official "
                        "baseline tsvs) is not installed and cannot be "
                        "fetched without network egress; rescaled scores "
                        "need --baseline_path or the package installed"})
        return
    for lang_dir in glob.glob(os.path.join(src, "*")):
        lang = os.path.basename(lang_dir)
        os.makedirs(os.path.join(dest, lang), exist_ok=True)
        for tsv in glob.glob(os.path.join(lang_dir, "*.tsv")):
            shutil.copy(tsv, os.path.join(dest, lang))
    n = len(glob.glob(os.path.join(dest, "*", "*.tsv")))
    _log({"validation": "vendor_rescale_baselines", "ran": True,
          "passed": n > 0, "vendored_files": n, "dest": dest})


def main():
    attempt_real_weights()
    attempt_bertscore_golden()
    attempt_vendor_rescale_baselines()


if __name__ == "__main__":
    main()
