"""Data pipeline tests: assembly conventions, reference flattening rules,
static-shape collation. Targets the alignment logic SURVEY.md §4 calls
the most bug-prone part (custom_dataset.py:59-70)."""

import numpy as np
import pytest

from ergm_tpu.core.tokens import SpecialTokens
from ergm_tpu.data.assembly import assemble_split, build_target, build_window, write_split
from ergm_tpu.data.dataset import IGNORE_INDEX, DialogueDataset, batches, collate
from ergm_tpu.data.synthetic import make_synthetic_split, synthetic_vocab, write_synthetic_dataset


@pytest.fixture
def st():
    return SpecialTokens.register(synthetic_vocab(64))


def test_build_window_parity_and_bos(st):
    dia = [[10, 11], [12], [13, 14, 15]]
    w = build_window(dia, 2, st)
    assert w[0][:2] == [st.bos_id, st.sp1_id]
    assert w[1][0] == st.sp2_id
    assert w[2][0] == st.sp1_id
    assert w[2][-1] == st.eos_id  # target turn closes with eos


def test_build_window_max_turns(st):
    dia = [[1], [2], [3], [4], [5]]
    w = build_window(dia, 4, st, max_turns=2)
    assert len(w) == 2
    # window-local parity restarts at sp1 (matches the reference's
    # window-index-based token-type rule, custom_dataset.py:55)
    assert w[0][:2] == [st.bos_id, st.sp1_id]
    assert w[0][2] == 4 and w[1][1] == 5


def test_build_window_max_len_drops_oldest(st):
    dia = [[1] * 50, [2] * 50, [3] * 50]
    w = build_window(dia, 2, st, max_len=120)
    flat = [t for turn in w for t in turn]
    assert len(flat) < 120
    assert 3 in flat and 1 not in flat  # oldest turn dropped


def test_target_slice_roundtrip(st):
    """The reference derives labels as target[2:-2] + [eos]
    (custom_dataset.py:60); our stored form must survive that slice."""
    utter = [7, 8, 9]
    tgt = build_target(utter, st)
    assert tgt[2:-2] == utter
    assert (tgt[2:-2] + [st.eos_id]) == utter + [st.eos_id]


def _dataset(tmp_path, st, **kw):
    payloads, _ = make_synthetic_split(st=st, seed=1, **kw)
    write_split(payloads, str(tmp_path), "train")
    return DialogueDataset("train", str(tmp_path), sp1_id=st.sp1_id,
                           sp2_id=st.sp2_id, eos_id=st.eos_id)


def test_dataset_flattening_counts(tmp_path, st):
    ds = _dataset(tmp_path, st, num_dialogues=3, turns_per_dialogue=4)
    assert len(ds) == 12  # every utterance of every dialogue, none skipped


def test_label_alignment(tmp_path, st):
    """Every supervised label equals the input token at the same position
    (the shifted CE then supervises next-token prediction on the
    response span), and the masked prefix is exactly the history."""
    ds = _dataset(tmp_path, st, num_dialogues=3, turns_per_dialogue=4)
    for ex in ds.examples:
        lab = np.array(ex.labels)
        ids = np.array(ex.input_ids)
        sup = lab != IGNORE_INDEX
        assert sup.any()
        np.testing.assert_array_equal(lab[sup], ids[sup])
        # supervised region is a contiguous suffix
        first = np.argmax(sup)
        assert sup[first:].all()
        assert ids[-1] == st.eos_id


def test_token_types_alternate(tmp_path, st):
    ds = _dataset(tmp_path, st, num_dialogues=2, turns_per_dialogue=3)
    for ex in ds.examples:
        tts = set(ex.token_type_ids)
        assert tts <= {st.sp1_id, st.sp2_id}


def test_long_windows_skipped(tmp_path, st):
    payloads, _ = make_synthetic_split(st=st, seed=2, num_dialogues=1,
                                       turns_per_dialogue=8,
                                       utter_len=range(200, 201), max_len=None)
    write_split(payloads, str(tmp_path), "train")
    ds = DialogueDataset("train", str(tmp_path), sp1_id=st.sp1_id,
                         sp2_id=st.sp2_id, eos_id=st.eos_id, max_len=1024)
    # windows >= 1024 tokens are skipped (custom_dataset.py:51-52)
    assert 0 < len(ds) < 8


def test_collate_static_shapes(tmp_path, st):
    ds = _dataset(tmp_path, st, num_dialogues=2, turns_per_dialogue=3)
    b = collate(ds.examples[:3], st.eos_id, batch_size=4, pad_multiple=32)
    assert b.input_ids.shape == b.labels.shape == b.token_type_ids.shape
    assert b.input_ids.shape[0] == 4
    assert b.input_ids.shape[1] % 32 == 0
    assert b.valid.tolist() == [True, True, True, False]
    # pad fill semantics (custom_dataset.py:120-122)
    row = b.input_ids[0]
    n_real = int(b.attention_mask[0].sum())
    assert (row[n_real:] == st.eos_id).all()
    assert (b.labels[0][n_real:] == IGNORE_INDEX).all()


def test_batches_iterator(tmp_path, st):
    ds = _dataset(tmp_path, st, num_dialogues=3, turns_per_dialogue=4)
    out = list(batches(ds, batch_size=5, eos_id=st.eos_id, shuffle=True, seed=0))
    assert sum(int(b.valid.sum()) for b in out) == len(ds)
    for b in out:
        assert b.input_ids.shape[0] == 5


def test_length_grouped_batches(tmp_path, st):
    """length_grouped=K: exact cover of the dataset, fewer padded tokens
    than the uniform shuffle, deterministic under the seed, and a no-op
    under static (multi-host) shape pinning."""
    ds = _dataset(tmp_path, st, num_dialogues=8, turns_per_dialogue=6)

    def run(**kw):
        return list(batches(ds, batch_size=4, eos_id=st.eos_id, shuffle=True,
                            seed=0, pad_multiple=32, **kw))

    plain, grouped = run(), run(length_grouped=4)
    # exact cover: same example-length multiset over the valid rows
    def real_lens(out):
        return sorted(int(b.attention_mask[i].sum())
                      for b in out for i in range(len(b.valid)) if b.valid[i])
    assert real_lens(grouped) == real_lens(plain)
    assert real_lens(grouped) == sorted(len(e.input_ids) for e in ds.examples)
    # the point: grouping pads less
    padded = lambda out: sum(b.input_ids.size for b in out)
    assert padded(grouped) < padded(plain)
    # deterministic under the seed
    again = run(length_grouped=4)
    assert all(np.array_equal(a.input_ids, b.input_ids)
               for a, b in zip(grouped, again))
    # static mode pins every batch to max_len: grouping must not change it
    static = run(length_grouped=4, static=True, max_len=256)
    assert all(b.input_ids.shape[1] == 256 for b in static)


def test_write_synthetic_dataset_two_splits(tmp_path):
    st = write_synthetic_dataset(str(tmp_path), prefixes=("train", "valid"),
                                 num_dialogues=2, turns_per_dialogue=3)
    for prefix in ("train", "valid"):
        ds = DialogueDataset(prefix, str(tmp_path), sp1_id=st.sp1_id,
                             sp2_id=st.sp2_id, eos_id=st.eos_id)
        assert len(ds) == 6


def test_limit_matches_reference_debug_slice(tmp_path, st):
    ds_full = _dataset(tmp_path, st, num_dialogues=3, turns_per_dialogue=4)
    ds_lim = DialogueDataset("train", str(tmp_path.as_posix()), sp1_id=st.sp1_id,
                             sp2_id=st.sp2_id, eos_id=st.eos_id, limit=1)
    assert len(ds_lim) == 4 and len(ds_full) == 12


def test_collate_static_mode_pins_shapes(tmp_path, st):
    """Multi-host collation: static=True pads every batch to max_len and
    static_caps pins caption-array presence, so processes with different
    local examples still build IDENTICAL global batch shapes/structure
    for jax.make_array_from_process_local_data."""
    ds = _dataset(tmp_path, st, num_dialogues=3, turns_per_dialogue=4)
    short = [ds[0]]
    long_ = [max(ds.examples, key=lambda e: len(e.input_ids))]

    a = collate(short, st.eos_id, 2, max_len=256, static=True, static_caps=True)
    b = collate(long_, st.eos_id, 2, max_len=256, static=True, static_caps=True)
    assert a.input_ids.shape == b.input_ids.shape == (2, 256)
    # caption arrays exist with identical shape even if a local batch
    # happens to lack captions
    assert (a.caption_ids is None) == (b.caption_ids is None)
    if a.caption_ids is not None:
        assert a.caption_ids.shape == b.caption_ids.shape
    # dynamic mode still buckets tightly
    c = collate(short, st.eos_id, 2, max_len=256)
    assert c.input_ids.shape[1] <= 128


def test_host_shard_order_disjoint_equal_and_remixing():
    """Shuffle-then-shard (ADVICE r2): shards are disjoint, equal-length,
    cover ~all data, and an example MOVES between hosts across epoch
    seeds (shard-then-shuffle would pin it to one host forever)."""
    from ergm_tpu.data.dataset import host_shard_order

    n, hosts = 103, 4
    shards = [host_shard_order(n, h, hosts, shuffle=True, seed=1)
              for h in range(hosts)]
    lengths = {len(s) for s in shards}
    assert lengths == {n // hosts}
    flat = np.concatenate(shards)
    assert len(set(flat.tolist())) == len(flat)  # disjoint

    # epoch re-mixing: example 0's host changes for some seed
    def host_of(example, seed):
        for h in range(hosts):
            if example in host_shard_order(n, h, hosts, shuffle=True, seed=seed):
                return h
        return None

    assert any(host_of(0, s) != host_of(0, 1) for s in range(2, 8))

    # no shuffle: deterministic strided shards (validation path)
    np.testing.assert_array_equal(
        host_shard_order(n, 1, hosts), np.arange(n)[1::hosts][:n // hosts])


def test_subset_views_without_copy(tmp_path, st):
    from ergm_tpu.data.dataset import Subset

    ds = _dataset(tmp_path, st, num_dialogues=2, turns_per_dialogue=3)
    sub = Subset(ds, [2, 0])
    assert len(sub) == 2
    assert sub[0] is ds[2] and sub[1] is ds[0]


def test_collate_static_caption_truncation_warns(tmp_path, st):
    """Static collation must not silently truncate captions (ADVICE r2):
    an over-long caption under static_cap_len warns."""
    ds = _dataset(tmp_path, st, num_dialogues=2, turns_per_dialogue=3)
    e = ds[0]
    e.caption_ids = list(range(10, 50))  # longer than the 16-token cap below
    with pytest.warns(UserWarning, match="caption truncated"):
        collate([e], st.eos_id, 1, max_len=1024, static=True,
                static_caps=True, static_cap_len=16)
