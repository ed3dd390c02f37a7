"""Checkpoint save/restore via orbax.

Reference behavior replicated (src/main.py:98-119, 184-196): best-valid-
PPL checkpoints named ``best_ckpt_epoch={E}_valid_ppl={P:.4f}`` holding
model/optimizer/schedule state plus counters; resume restores all of it.
orbax gives atomic async-friendly directory checkpoints instead of
torch.save blobs.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from ergm_tpu.train.steps import TrainState

_CKPT_RE = re.compile(r"best_ckpt_epoch=(\d+)_valid_ppl=([\d.eE+-]+?)/?$")


def save_checkpoint(ckpt_dir: str, state: TrainState, epoch: int, best_ppl: float,
                    keep_best: Optional[int] = None) -> str:
    """Save a best-PPL checkpoint (reference naming, src/main.py:193).

    ``keep_best``: retain only the N lowest-PPL checkpoints, deleting
    older/worse ones after a successful save (the reference accumulates
    every best checkpoint forever)."""
    name = f"best_ckpt_epoch={epoch}_valid_ppl={best_ppl:.4f}"
    path = os.path.join(os.path.abspath(ckpt_dir), name)
    payload = {
        "params": state.params,
        "opt_state": state.opt_state,
        "step": state.step,
        "epoch": np.int32(epoch),
        "best_ppl": np.float64(best_ppl),
    }
    # Multi-host: ocp.save is a COLLECTIVE — every process must call it
    # with the same path (the epoch/ppl in the name are computed from
    # global-batch metrics, identical on all hosts); orbax coordinates
    # so each array shard is written exactly once and the directory is
    # finalized by the primary. Host-local numpy leaves are written by
    # the primary only.
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, payload, force=True)
    if keep_best is not None and jax.process_index() == 0:
        _prune_checkpoints(ckpt_dir, keep_best, protect=name)
    return path


def _prune_checkpoints(ckpt_dir: str, keep_best: int, protect: Optional[str] = None) -> None:
    import shutil

    entries = []
    for entry in os.listdir(ckpt_dir):
        m = _CKPT_RE.match(entry)
        if m:
            entries.append((float(m.group(2)), entry))
    entries.sort()  # lowest ppl first
    for _, entry in entries[keep_best:]:
        if entry == protect:  # never delete the checkpoint just written
            continue
        shutil.rmtree(os.path.join(ckpt_dir, entry), ignore_errors=True)


PREEMPT_NAME = "preempt_ckpt"


def save_preempt_checkpoint(ckpt_dir: str, state: TrainState, epoch: int,
                            best_ppl: float) -> str:
    """Emergency mid-training save on SIGTERM (TPU preemption).

    Same payload as a best-PPL checkpoint, fixed name (each preemption
    overwrites the previous one), never matched by the best-PPL pruning
    or ``find_checkpoint``'s lowest-PPL scan — resume it explicitly with
    ``--ckpt_name=preempt``. ``epoch`` must be the last COMPLETED epoch:
    the optimizer state is mid-epoch, so resume re-runs the interrupted
    epoch from its start (the data iterator position is not part of the
    state; the LR schedule clamps at lr_end past its horizon)."""
    path = os.path.join(os.path.abspath(ckpt_dir), PREEMPT_NAME)
    payload = {
        "params": state.params,
        "opt_state": state.opt_state,
        "step": state.step,
        "epoch": np.int32(epoch),
        "best_ppl": np.float64(best_ppl),
    }
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, payload, force=True)
    return path


def clear_preempt_checkpoint(ckpt_dir: str) -> None:
    """Remove a stale preemption checkpoint (called on clean training
    completion — resuming it later would silently revert the params)."""
    import shutil

    path = os.path.join(os.path.abspath(ckpt_dir), PREEMPT_NAME)
    if os.path.isdir(path):
        shutil.rmtree(path, ignore_errors=True)


def restore_checkpoint(path: str, template_state: TrainState) -> Dict[str, Any]:
    """Restore into the shapes/dtypes of ``template_state``. Returns dict
    with 'state', 'epoch', 'best_ppl'."""
    template = {
        "params": template_state.params,
        "opt_state": template_state.opt_state,
        "step": template_state.step,
        "epoch": np.int32(0),
        "best_ppl": np.float64(0),
    }
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(os.path.abspath(path), item=template)
    state = TrainState(params=restored["params"], opt_state=restored["opt_state"],
                       step=restored["step"])
    return {"state": state, "epoch": int(restored["epoch"]),
            "best_ppl": float(restored["best_ppl"])}


def restore_params(path: str, template_params) -> Any:
    """Params-only restore (inference path, src/main.py:111-119): restore
    the raw tree and coerce the params subtree onto the template.

    Missing subtrees keep their template values — the reference's
    ``strict=False`` load that tolerates e.g. a checkpoint without the
    modality projections or emotion head (src/main.py:103)."""
    import jax.numpy as jnp

    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(os.path.abspath(path))
    source = restored["params"] if "params" in restored else restored

    def merge(template, rest):
        if isinstance(template, dict):
            if not isinstance(rest, dict):
                return template
            return {k: merge(v, rest[k]) if k in rest else v
                    for k, v in template.items()}
        if isinstance(template, (list, tuple)):
            if not isinstance(rest, (list, tuple)) or len(rest) != len(template):
                return template
            out = [merge(t, r) for t, r in zip(template, rest)]
            return type(template)(out)
        if rest is None:
            return template
        return jnp.asarray(rest, dtype=template.dtype)

    return merge(template_params, source)


def find_checkpoint(ckpt_dir: str, name: Optional[str] = None) -> Optional[str]:
    """Resolve a checkpoint path: explicit name, the sentinel "preempt"
    (the SIGTERM emergency checkpoint), or the best (lowest valid ppl)
    when name is None or the sentinel "best"."""
    if name == "preempt":
        name = PREEMPT_NAME
    if name == "best":
        name = None
    if name is not None:
        p = os.path.join(ckpt_dir, name)
        return p if os.path.isdir(p) else None
    if not os.path.isdir(ckpt_dir):
        return None
    best = None
    for entry in os.listdir(ckpt_dir):
        m = _CKPT_RE.match(entry)
        if m:
            ppl = float(m.group(2))
            if best is None or ppl < best[0]:
                best = (ppl, os.path.join(ckpt_dir, entry))
    return best[1] if best else None
