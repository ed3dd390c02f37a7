"""IEMOCAP converter tests (ergm_tpu/tools/labels_iemocap.py) on a
synthetic release-tree fixture mirroring the real layout:
Session{k}/dialog/{EmoEvaluation,transcriptions}/Ses0kX_*.txt."""

import json
import os
import pickle

import pytest

from ergm_tpu.core.tokens import EMOTION_TO_ID, SENTIMENT_TO_ID
from ergm_tpu.tools.labels_iemocap import convert, main, session_of

EMO_FILE = """% header junk the parser must skip
[6.2901 - 8.2357]\tSes0{s}F_impro01_F000\tneu\t[2.5000, 2.5000, 2.5000]
[10.010 - 11.370]\tSes0{s}F_impro01_M000\tfru\t[2.0000, 3.5000, 3.0000]
[2.0000 - 3.0000]\tSes0{s}F_impro01_F001\thap\t[4.0, 3.0, 3.0]
[14.000 - 15.000]\tSes0{s}F_impro01_M001\txxx\t[0, 0, 0]
"""

TRANS_FILE = """Ses0{s}F_impro01_F000 [006.2901-008.2357]: Excuse me.
Ses0{s}F_impro01_M000 [010.0100-011.3700]: Do you have your forms?
Ses0{s}F_impro01_F001 [002.0000-003.0000]: Great to see you!
Ses0{s}F_impro01_M001 [014.0000-015.0000]: Mumble mumble.
"""


@pytest.fixture()
def release(tmp_path):
    for s in (1, 4, 5):
        d = tmp_path / f"Session{s}" / "dialog"
        (d / "EmoEvaluation").mkdir(parents=True)
        (d / "transcriptions").mkdir(parents=True)
        (d / "EmoEvaluation" / f"Ses0{s}F_impro01.txt").write_text(
            EMO_FILE.format(s=s))
        (d / "transcriptions" / f"Ses0{s}F_impro01.txt").write_text(
            TRANS_FILE.format(s=s))
    return tmp_path


def test_convert_splits_orders_and_maps(release):
    dialogues, labels, skipped = convert(str(release))
    # session 1 -> train, 4 -> dev, 5 -> test
    for split in ("train", "dev", "test"):
        assert len(dialogues[split]) == 1
    d = dialogues["train"][0]
    # ordered by START TIME, not file order: hap line (t=2.0) comes first
    assert d == ["Great to see you!", "Excuse me.",
                 "Do you have your forms?", "Mumble mumble."]
    emo = labels["train"]["emotion"][0]
    assert emo == [EMOTION_TO_ID["joy"], EMOTION_TO_ID["neutral"],
                   EMOTION_TO_ID["neutral"],   # fru -> neutral by default
                   EMOTION_TO_ID["neutral"]]   # xxx -> neutral by default
    senti = labels["train"]["sentiment"][0]
    assert senti == [SENTIMENT_TO_ID["positive"], SENTIMENT_TO_ID["neutral"],
                     SENTIMENT_TO_ID["neutral"], SENTIMENT_TO_ID["neutral"]]
    assert skipped == 0


def test_drop_unmapped(release):
    dialogues, labels, skipped = convert(str(release), drop_unmapped=True)
    d = dialogues["test"][0]
    assert d == ["Great to see you!", "Excuse me."]  # fru/xxx dropped
    assert skipped == 2 * 3  # two per dialogue, three sessions
    assert labels["test"]["emotion"][0] == [EMOTION_TO_ID["joy"],
                                            EMOTION_TO_ID["neutral"]]


def test_cli_writes_interchange_files(release, tmp_path):
    out = tmp_path / "prepared"
    main([f"--data_dir={release}", f"--output_dir={out}"])
    for split in ("train", "dev", "test"):
        ds = json.loads((out / f"{split}_sent_emo.json").read_text())
        assert len(ds) == 1 and len(ds[0]) == 4
    with open(out / "emotion_sentiment_labels.pkl", "rb") as f:
        labels = pickle.load(f)
    assert set(labels) == {"train", "dev", "test"}
    assert labels["dev"]["emotion"][0][0] == EMOTION_TO_ID["joy"]


def test_session_parse_and_missing_dir(tmp_path):
    assert session_of("Ses03F_impro05") == 3
    assert session_of("garbage") is None
    with pytest.raises(FileNotFoundError, match="EmoEvaluation"):
        convert(str(tmp_path))


def test_equal_valid_test_session_rejected(release):
    # both sessions landing on the same id would empty the dev split
    with pytest.raises(ValueError, match="distinct sessions"):
        convert(str(release), valid_session=5, test_session=5)
