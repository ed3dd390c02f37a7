"""Grain-based host input pipeline (production loader).

The plain iterator in ergm_tpu.data.dataset covers the reference's
single-process DataLoader role (src/main.py:78-85, num_workers=0 in
train.sh:15). This module is the production path the north star calls
for — a Grain pipeline over the same DialogueDataset:

- deterministic global shuffle per epoch (seeded),
- per-host sharding for multi-host data parallelism (each host reads
  its own slice; device sharding inside the host stays the mesh's job),
- worker processes for parallel example assembly,
- the same bucketed static-shape collation (ergm_tpu.data.dataset.collate)
  so XLA executables are shared with the non-Grain path.
"""

from __future__ import annotations

from typing import Iterator, Optional

from ergm_tpu.data.dataset import Batch, DialogueDataset, collate


def make_grain_loader(
    dataset: DialogueDataset,
    *,
    batch_size: int,
    eos_id: int,
    shuffle: bool = False,
    seed: int = 0,
    pad_multiple: int = 128,
    max_len: int = 1024,
    drop_remainder: bool = False,
    num_workers: int = 0,
    host_index: int = 0,
    host_count: int = 1,
    static: bool = False,
    static_caps: Optional[bool] = None,
) -> "GrainBatches":
    import grain

    ds = grain.MapDataset.source(dataset)
    # shuffle FIRST, shard after: the epoch-seeded global shuffle re-mixes
    # examples across hosts every epoch like a global DataLoader shuffle;
    # shard-then-shuffle would pin each example to one host forever
    # (ADVICE r2)
    if shuffle:
        ds = ds.shuffle(seed=seed)
    if host_count > 1:
        # per-host shard (DCN data split), truncated to the MINIMUM
        # shard length: every host must iterate the same number of
        # batches or the collective train/eval steps deadlock
        per_host = len(dataset) // host_count
        ds = ds[host_index::host_count][:per_host]
    ds = ds.batch(
        batch_size,
        drop_remainder=drop_remainder,
        batch_fn=lambda examples: collate(
            list(examples), eos_id, batch_size,
            pad_multiple=pad_multiple, max_len=max_len,
            # multi-host: per-host dynamic buckets would give each
            # process a different global array shape (see collate)
            static=static, static_caps=static_caps),
    )
    it = ds.to_iter_dataset()
    if num_workers > 0:
        it = it.mp_prefetch(
            grain.MultiprocessingOptions(num_workers=num_workers))
    return GrainBatches(it)


class GrainBatches:
    """Iterable of ergm_tpu.data.dataset.Batch over a Grain pipeline."""

    def __init__(self, iter_dataset):
        self._ds = iter_dataset

    def __iter__(self) -> Iterator[Batch]:
        return iter(self._ds)
