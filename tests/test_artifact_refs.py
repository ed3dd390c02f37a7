"""Every measurement artifact the docs cite must exist and be tracked.

Round-2/3 lesson: README and PARITY referenced `results/*.jsonl` files
that were never committed (sampler_quality, decode_kernel_bench), so the
evidence chain broke between sessions. This test closes that class of
drift: any `results/<name>.jsonl` mentioned in the user-facing docs must
be present, non-empty, and known to git.
"""

import os
import re
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DOCS = ["README.md", "PARITY.md", "docs/ARCHITECTURE.md", "docs/DATASETS.md"]


def _referenced_artifacts():
    refs = set()
    for doc in DOCS:
        path = os.path.join(REPO, doc)
        if not os.path.exists(path):
            continue
        with open(path) as f:
            text = f.read()
        refs.update(re.findall(r"results/[a-z0-9_]+\.jsonl", text))
    return sorted(refs)


def test_docs_reference_at_least_the_known_artifacts():
    refs = _referenced_artifacts()
    # the core evidence set; new artifacts extend this, never shrink it
    assert {"results/spec_bench.jsonl", "results/train_family.jsonl",
            "results/decode_ablation.jsonl"} <= set(refs), refs


def test_every_referenced_artifact_exists_and_is_tracked():
    tracked = set(subprocess.run(
        ["git", "ls-files", "results/"], cwd=REPO,
        capture_output=True, text=True).stdout.split())
    missing, untracked, empty = [], [], []
    for ref in _referenced_artifacts():
        path = os.path.join(REPO, ref)
        if not os.path.exists(path):
            missing.append(ref)
        elif os.path.getsize(path) == 0:
            empty.append(ref)
        elif ref not in tracked:
            untracked.append(ref)
    assert not missing, f"docs cite artifacts not on disk: {missing}"
    assert not empty, f"docs cite empty artifacts: {empty}"
    assert not untracked, (
        f"docs cite artifacts git does not track (they will vanish "
        f"between sessions): {untracked}")
