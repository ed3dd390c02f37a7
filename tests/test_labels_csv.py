"""Generic CSV converter tests (ergm_tpu/tools/labels_csv.py) — the
MEDIC-and-anything-else path onto the interchange format."""

import json
import os
import pickle

import pytest

from ergm_tpu.core.tokens import EMOTION_TO_ID, SENTIMENT_TO_ID
from ergm_tpu.tools import labels_csv


def write_csv(path, rows, header):
    with open(path, "w") as f:
        f.write(",".join(header) + "\n")
        for r in rows:
            f.write(",".join(str(r[h]) for h in header) + "\n")


HEADER = ["session_id", "turn", "text", "empathy_label"]


def medic_rows():
    # two sessions; out-of-order turns in the second; one label needing
    # mapping per row
    return [
        dict(session_id="s1", turn=0, text="hello", empathy_label="no_empathy"),
        dict(session_id="s1", turn=1, text="I lost my job", empathy_label="no_empathy"),
        dict(session_id="s1", turn=2, text="that sounds hard", empathy_label="affective_empathy"),
        dict(session_id="s2", turn=1, text="tell me more", empathy_label="cognitive_empathy"),
        dict(session_id="s2", turn=0, text="I feel stuck", empathy_label="no_empathy"),
    ]


LABEL_MAP = "no_empathy=neutral,cognitive_empathy=neutral,affective_empathy=joy"


def convert(tmp_path, rows=None, extra=(), header=HEADER):
    csv = tmp_path / "medic.csv"
    write_csv(csv, rows or medic_rows(), header)
    out = tmp_path / "prepared"
    labels_csv.main([
        f"--csv={csv}", "--dialogue_col=session_id", "--utterance_col=text",
        "--emotion_col=empathy_label", "--order_col=turn",
        f"--label_map={LABEL_MAP}", "--train_frac=1.0",
        f"--output_dir={out}", *extra,
    ])
    dialogues = json.load(open(out / "train_sent_emo.json"))
    labels = pickle.load(open(out / "emotion_sentiment_labels.pkl", "rb"))
    return out, dialogues, labels


def test_mapping_ordering_and_derived_sentiment(tmp_path):
    _, dialogues, labels = convert(tmp_path)
    assert dialogues == [["hello", "I lost my job", "that sounds hard"],
                         ["I feel stuck", "tell me more"]]  # order_col sort
    e = labels["train"]["emotion"]
    n, j = EMOTION_TO_ID["neutral"], EMOTION_TO_ID["joy"]
    assert e == [[n, n, j], [n, n]]
    s = labels["train"]["sentiment"]
    assert s == [[SENTIMENT_TO_ID["neutral"]] * 2 + [SENTIMENT_TO_ID["positive"]],
                 [SENTIMENT_TO_ID["neutral"]] * 2]
    # interchange files exist for every split (empty dev/test here)
    assert labels["dev"] == {"emotion": [], "sentiment": []}


def test_unmapped_label_errors_loudly_by_default(tmp_path):
    rows = medic_rows()
    rows[0]["empathy_label"] = "mystery"
    with pytest.raises(ValueError, match="mystery"):
        convert(tmp_path, rows=rows)


def test_unmapped_drop(tmp_path):
    rows = medic_rows()
    rows[2]["empathy_label"] = "mystery"
    _, dialogues, labels = convert(tmp_path, rows=rows,
                                   extra=["--unmapped=drop"])
    assert dialogues[0] == ["hello", "I lost my job"]
    assert len(labels["train"]["emotion"][0]) == 2


def test_fractional_split_reproducible_and_partitions(tmp_path):
    rows = []
    for d in range(20):
        for t in range(3):
            rows.append(dict(session_id=f"d{d}", turn=t, text=f"u{d}-{t}",
                             empathy_label="no_empathy"))
    csv = tmp_path / "big.csv"
    write_csv(csv, rows, HEADER)
    outs = []
    for run in range(2):
        out = tmp_path / f"o{run}"
        labels_csv.main([
            f"--csv={csv}", "--dialogue_col=session_id",
            "--utterance_col=text", "--emotion_col=empathy_label",
            f"--label_map={LABEL_MAP}", "--train_frac=0.8", "--seed=7",
            f"--output_dir={out}"])
        outs.append({s: json.load(open(out / f"{s}_sent_emo.json"))
                     for s in ("train", "dev", "test")})
    assert outs[0] == outs[1]  # same seed -> same split
    sizes = {s: len(outs[0][s]) for s in outs[0]}
    assert sizes == {"train": 16, "dev": 2, "test": 2}
    # partition: every dialogue appears exactly once across splits
    seen = [tuple(d) for s in outs[0].values() for d in s]
    assert len(seen) == 20 and len(set(seen)) == 20


def test_split_col_and_explicit_sentiment(tmp_path):
    header = HEADER + ["split", "senti"]
    rows = [dict(session_id="a", turn=0, text="x", empathy_label="no_empathy",
                 split="train", senti="negative"),
            dict(session_id="b", turn=0, text="y", empathy_label="no_empathy",
                 split="test", senti="positive")]
    csv = tmp_path / "t.csv"
    write_csv(csv, rows, header)
    out = tmp_path / "o"
    labels_csv.main([
        f"--csv={csv}", "--dialogue_col=session_id", "--utterance_col=text",
        "--emotion_col=empathy_label", "--sentiment_col=senti",
        "--split_col=split", f"--label_map={LABEL_MAP}",
        f"--output_dir={out}"])
    labels = pickle.load(open(out / "emotion_sentiment_labels.pkl", "rb"))
    assert labels["train"]["sentiment"] == [[SENTIMENT_TO_ID["negative"]]]
    assert labels["test"]["sentiment"] == [[SENTIMENT_TO_ID["positive"]]]
    assert json.load(open(out / "dev_sent_emo.json")) == []


def test_per_split_files_and_canonical_passthrough(tmp_path):
    # labels already canonical need no --label_map
    header = ["Dialogue_ID", "Utterance", "Emotion"]
    rows = [dict(Dialogue_ID=0, Utterance="hi", Emotion="joy"),
            dict(Dialogue_ID=0, Utterance="yo", Emotion="anger")]
    csv = tmp_path / "train.csv"
    write_csv(csv, rows, header)
    out = tmp_path / "o"
    labels_csv.main([f"--train_csv={csv}", f"--output_dir={out}"])
    labels = pickle.load(open(out / "emotion_sentiment_labels.pkl", "rb"))
    assert labels["train"]["emotion"] == [[EMOTION_TO_ID["joy"],
                                           EMOTION_TO_ID["anger"]]]


def test_bad_column_and_bad_map_target(tmp_path):
    with pytest.raises(KeyError, match="wrong_col"):
        convert(tmp_path, extra=["--utterance_col=wrong_col"])
    csv = tmp_path / "m.csv"
    write_csv(csv, medic_rows(), HEADER)
    with pytest.raises(ValueError, match="canonical"):
        labels_csv.main([f"--csv={csv}", "--label_map=a=notanemotion",
                         "--train_frac=1.0", f"--output_dir={tmp_path}"])
