"""Tests for data-prep tooling: MELD label grouping, dialogue
tokenization, detokenizer cleanup, corpus-loader transformations,
WAV loading."""

import json
import os
import pickle
import wave

import numpy as np
import pytest

from ergm_tpu.tools.corpora import (clean_token_list, load_blended, load_daily,
                                    load_empathetic, load_persona)
from ergm_tpu.tools.labels import labels_from_rows
from ergm_tpu.tools.text2ids import tokenize_dialogues


def test_labels_grouping_and_ids():
    res = labels_from_rows(
        dialogue_ids=[0, 0, 1, 1, 1, 2],
        emotions=["joy", "anger", "neutral", "sadness", "fear", "surprise"],
        sentiments=["positive", "negative", "neutral", "negative", "negative", "positive"],
    )
    # EMOTION_LIST order: anger disgust fear joy neutral sadness surprise
    assert res["emotion"] == [[3, 0], [4, 5, 2], [6]]
    assert res["sentiment"] == [[1, 2], [0, 2, 2], [1]]


def test_labels_csv_cli(tmp_path):
    pd = pytest.importorskip("pandas")
    df = pd.DataFrame({
        "Dialogue_ID": [0, 0, 1],
        "Emotion": ["joy", "neutral", "anger"],
        "Sentiment": ["positive", "neutral", "negative"],
    })
    df.to_csv(tmp_path / "train_sent_emo.csv", index=False)
    from ergm_tpu.tools.labels import main as labels_main

    out = tmp_path / "labels.pkl"
    labels_main([f"--data_dir={tmp_path}", f"--output_file={out}"])
    with open(out, "rb") as f:
        res = pickle.load(f)
    assert res["train"]["emotion"] == [[3, 4], [0]]


@pytest.fixture(scope="module")
def bpe():
    from ergm_tpu.tokenizer.bpe import train_bpe

    return train_bpe(["hello there how are you doing today my friend"] * 3,
                     vocab_size=320)


def test_tokenize_dialogues(bpe):
    dialogues = [["hello there", ["how are you", "extra-field"]],
                 ["doing today"]]
    ids = tokenize_dialogues(dialogues, bpe)
    assert len(ids) == 2 and len(ids[0]) == 2
    assert bpe.decode(ids[0][0]) == "hello there"
    assert bpe.decode(ids[0][1]) == "how are you"  # list-form utterance uses [0]


def test_text2ids_cli(tmp_path, bpe):
    bpe.save(str(tmp_path / "tok"))
    with open(tmp_path / "train_sent_emo.json", "w") as f:
        json.dump([["hello there", "how are you"]], f)
    from ergm_tpu.tools.text2ids import main as t2i_main

    t2i_main([f"--data_dir={tmp_path}", "--prefixes=train",
              f"--tokenizer_dir={tmp_path / 'tok'}"])
    with open(tmp_path / "train_sent_emo_ids.json") as f:
        ids = json.load(f)
    assert len(ids[0]) == 2 and all(isinstance(t, int) for t in ids[0][0])


def test_clean_token_list_basics():
    # "hello world ." with a detached end mark -> glued, capitalized
    toks = ["hello", "Ġworld", "Ġ."]
    out = clean_token_list(toks)
    assert out[0] == "Hello"
    assert out[-1] == "."
    assert "Ġ." not in out


def test_clean_token_list_appends_period():
    assert clean_token_list(["hi"])[-1] == "."


def test_clean_token_list_capitalizes_after_end_mark():
    out = clean_token_list(["yes", ".", "Ġnow", "Ġgo"])
    assert "Ġ" + "Now" in out


def test_load_daily_with_injected_data(bpe):
    data = [["hello there", "how are you"], ["doing today", "my friend"],
            ["hello hello", "you you"], ["today today", "friend friend"]]
    train, valid, ntr, nva = load_daily(bpe, 0.5, data=data)
    assert len(train) == 2 and len(valid) == 2
    assert ntr == 4 and nva == 4
    assert train[0][0].startswith("Hello")


def test_load_empathetic_merges_same_speaker(bpe):
    data = {
        "utterance": ["hello there", "how are you", "doing today_comma_ friend",
                      "skip me_conv", "you you"],
        "conv_id": ["a", "a", "a", "a", "b"],
        "speaker_idx": [1, 1, 2, 2, 3],
    }
    train, valid, ntr, nva = load_empathetic(bpe, 1.0, data=data)
    dialogues = train + valid
    # conv a: two same-speaker turns merged, then speaker 2's turn
    assert len(dialogues[0]) == 2
    assert "," in dialogues[0][1]
    assert all("_conv" not in u for d in dialogues for u in d)


def test_load_persona_drops_silence(bpe):
    data = [{"utterances": [
        {"history": ["ignored earlier state"]},
        {"history": ["hello there", "__ SILENCE __", "how are you"]},
    ]}]
    train, valid, ntr, nva = load_persona(bpe, 1.0, data=data)
    assert len((train + valid)[0]) == 2


def test_load_blended_interleaves(bpe):
    data = {
        "previous_utterance": [["seed one", "seed two"]],
        "free_messages": [["hello there", "how are you"]],
        "guided_messages": [["doing today"]],
    }
    train, valid, *_ = load_blended(bpe, 1.0, data=data)
    dia = (train + valid)[0]
    assert dia[0] == "seed one" and dia[1] == "seed two"
    assert len(dia) == 5  # 2 seed + free/guided/free


def test_load_wav_roundtrip(tmp_path):
    from ergm_tpu.tools.extract_features import load_wav

    sr = 8000
    t = np.linspace(0, 1, sr, endpoint=False)
    x = (np.sin(2 * np.pi * 440 * t) * 0.5 * 32767).astype(np.int16)
    path = tmp_path / "tone.wav"
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(x.tobytes())
    y, got_sr = load_wav(str(path))
    assert got_sr == sr and y.shape == (sr,)
    np.testing.assert_allclose(y, x.astype(np.float32) / 32768.0, atol=1e-6)
