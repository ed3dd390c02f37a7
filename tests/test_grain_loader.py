"""Grain pipeline tests: coverage parity with the plain iterator,
deterministic shuffling, host sharding."""

import numpy as np
import pytest

grain = pytest.importorskip("grain")

from ergm_tpu.data.dataset import DialogueDataset, batches
from ergm_tpu.data.grain_loader import make_grain_loader
from ergm_tpu.data.synthetic import write_synthetic_dataset


@pytest.fixture(scope="module")
def ds(tmp_path_factory):
    d = tmp_path_factory.mktemp("gdata")
    st = write_synthetic_dataset(str(d), prefixes=("train",), num_dialogues=5,
                                 turns_per_dialogue=4, base_vocab_size=64)
    return DialogueDataset("train", str(d), sp1_id=st.sp1_id, sp2_id=st.sp2_id,
                           eos_id=st.eos_id), st


def _all_ids(batches_iter):
    rows = []
    for b in batches_iter:
        for i in range(b.input_ids.shape[0]):
            if b.valid[i]:
                rows.append(tuple(b.input_ids[i][b.attention_mask[i] > 0]))
    return rows


def test_grain_covers_dataset(ds):
    dataset, st = ds
    got = _all_ids(make_grain_loader(dataset, batch_size=4, eos_id=st.eos_id))
    want = _all_ids(batches(dataset, 4, st.eos_id))
    assert sorted(got) == sorted(want)
    assert len(got) == len(dataset)


def test_grain_shuffle_deterministic(ds):
    dataset, st = ds
    a = _all_ids(make_grain_loader(dataset, batch_size=4, eos_id=st.eos_id,
                                   shuffle=True, seed=3))
    b = _all_ids(make_grain_loader(dataset, batch_size=4, eos_id=st.eos_id,
                                   shuffle=True, seed=3))
    c = _all_ids(make_grain_loader(dataset, batch_size=4, eos_id=st.eos_id,
                                   shuffle=True, seed=4))
    assert a == b
    assert sorted(a) == sorted(c)
    assert a != c  # different order


def test_grain_host_sharding(ds):
    dataset, st = ds
    shards = [
        _all_ids(make_grain_loader(dataset, batch_size=4, eos_id=st.eos_id,
                                   host_index=h, host_count=2))
        for h in (0, 1)
    ]
    merged = sorted(shards[0] + shards[1])
    assert merged == sorted(_all_ids(batches(dataset, 4, st.eos_id)))
    assert abs(len(shards[0]) - len(shards[1])) <= 1


def test_grain_static_shapes(ds):
    dataset, st = ds
    for b in make_grain_loader(dataset, batch_size=4, eos_id=st.eos_id,
                               pad_multiple=32, max_len=64):
        assert b.input_ids.shape[0] == 4
        assert b.input_ids.shape[1] % 32 == 0
