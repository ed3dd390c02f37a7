"""MELD-format dress rehearsal (VERDICT r1 item 6): a checked-in
micro-fixture in the reference's real input formats drives the WHOLE
pipeline through the same entry points a user runs
(/root/reference/README.md:34-56):

    MELD CSVs -> labels.py -> {prefix}_sent_emo.json -> text2ids.py
    -> WAV/PNG clips -> extract_features.py (random-weight encoders)
    -> load_data (json source, with captions) -> 2-epoch train
    -> infer -> evaluation results file with finite metrics.
"""

import csv
import json
import math
import os
import struct
import wave

import numpy as np
import pytest

from ergm_tpu.cli.load_data import main as load_data_main
from ergm_tpu.cli.main import main as cli_main
from ergm_tpu.tools.extract_features import main as extract_main
from ergm_tpu.tools.labels import main as labels_main
from ergm_tpu.tools.text2ids import main as text2ids_main

# the micro-corpus: (utterance, emotion, sentiment) per turn per dialogue
DIALOGUES = {
    "train": [
        [("Oh my God, he's lost it. He's totally lost it.", "sadness", "negative"),
         ("What?", "surprise", "negative"),
         ("Or the burritos are calling him.", "joy", "positive")],
        [("You know what really grinds my gears?", "anger", "negative"),
         ("Tell me everything about it.", "neutral", "neutral"),
         ("Slow walkers. Everywhere.", "disgust", "negative"),
         ("That is truly terrifying.", "fear", "negative")],
        [("I got the job! I start on Monday.", "joy", "positive"),
         ("That's wonderful news, congratulations!", "joy", "positive"),
         ("Thanks. I'm a little nervous though.", "fear", "negative")],
    ],
    "dev": [
        [("Did you hear about the storm last night?", "fear", "negative"),
         ("Yes, the thunder kept me awake.", "sadness", "negative")],
        [("This soup tastes amazing.", "joy", "positive"),
         ("I'm glad you like it.", "joy", "positive"),
         ("What's the secret ingredient?", "surprise", "positive")],
    ],
}


def _write_meld_csvs(meld_dir):
    os.makedirs(meld_dir, exist_ok=True)
    for split, dias in DIALOGUES.items():
        path = os.path.join(meld_dir, f"{split}_sent_emo.csv")
        with open(path, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["Sr No.", "Utterance", "Speaker", "Emotion", "Sentiment",
                        "Dialogue_ID", "Utterance_ID", "Season", "Episode",
                        "StartTime", "EndTime"])
            n = 0
            for d, dia in enumerate(dias):
                for u, (text, emo, senti) in enumerate(dia):
                    w.writerow([n, text, f"Speaker{u % 2}", emo, senti,
                                d, u, 1, 1, "0:00:00", "0:00:01"])
                    n += 1


def _write_clips(clips_root, split):
    """Per-dialogue subdirs with one WAV + one PNG per utterance (the
    post-ffmpeg/key_frames.sh layout)."""
    from PIL import Image

    rng = np.random.default_rng(0)
    split_dir = os.path.join(clips_root, split)
    for d, dia in enumerate(DIALOGUES[split]):
        dia_dir = os.path.join(split_dir, f"dia{d:03d}")
        os.makedirs(dia_dir, exist_ok=True)
        for u in range(len(dia)):
            wav_path = os.path.join(dia_dir, f"utt{u:02d}.wav")
            with wave.open(wav_path, "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(16000)
                t = np.arange(2000) / 16000.0
                x = (0.3 * np.sin(2 * math.pi * (200 + 50 * d + 10 * u) * t)
                     + 0.05 * rng.standard_normal(2000))
                w.writeframes(
                    struct.pack(f"<{len(x)}h",
                                *np.clip(x * 32767, -32767, 32767).astype(np.int16)))
            img = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
            Image.fromarray(img).save(os.path.join(dia_dir, f"keyframe{u:02d}.png"))
    return split_dir


def _tiny_encoders(monkeypatch):
    """Shrink the modality encoders' DEPTH (hidden stays 768 so the
    feature dim matches ModelConfig.modality_dim) for test speed."""
    from ergm_tpu.tools import audio as audio_mod
    from ergm_tpu.tools import vision as vision_mod

    orig_a, orig_v = audio_mod.AudioEncoderConfig, vision_mod.VisionEncoderConfig
    monkeypatch.setattr(audio_mod, "AudioEncoderConfig",
                        lambda **kw: orig_a(**{**dict(num_layers=1,
                                                      intermediate_size=128), **kw}))
    monkeypatch.setattr(vision_mod, "VisionEncoderConfig",
                        lambda **kw: orig_v(**{**dict(num_layers=1,
                                                      intermediate_size=128,
                                                      image_size=32), **kw}))
    # extract_features imports the names at call time from the modules


def test_meld_pipeline_end_to_end(tmp_path, monkeypatch):
    _tiny_encoders(monkeypatch)
    from ergm_tpu.core import config as config_mod

    monkeypatch.setitem(config_mod.GPT2_SIZES, "tiny",
                        dict(n_layer=2, n_head=4, n_embd=32))

    meld_dir = str(tmp_path / "meld")
    data_dir = str(tmp_path / "data")
    tok_dir = str(tmp_path / "tok")
    clips = str(tmp_path / "clips")
    os.makedirs(data_dir, exist_ok=True)

    # 1. MELD CSVs -> label pickle (src/scripts/emotion_labels.py role)
    _write_meld_csvs(meld_dir)
    labels_path = os.path.join(data_dir, "emotion_sentiment_labels.pkl")
    labels_main([f"--data_dir={meld_dir}", f"--output_file={labels_path}"])
    assert os.path.exists(labels_path)

    # 2. dialogue JSON + caption text per utterance
    for split, prefix in (("train", "train"), ("dev", "valid")):
        dias = [[u[0] for u in dia] for dia in DIALOGUES[split]]
        with open(os.path.join(data_dir, f"{prefix}_sent_emo.json"), "w") as f:
            json.dump(dias, f)
        caps = [[f"a person speaking in scene {d}" for _ in dia]
                for d, dia in enumerate(DIALOGUES[split])]
        with open(os.path.join(data_dir, f"{prefix}_captions.json"), "w") as f:
            json.dump(caps, f)

    # 3. train a small byte-level BPE on the fixture corpus, save GPT-2-format
    from ergm_tpu.tokenizer.bpe import train_bpe

    corpus = [u[0] for dias in DIALOGUES.values() for dia in dias for u in dia]
    tok = train_bpe(corpus, vocab_size=400)
    tok.save(tok_dir)

    # 4. tokenize (src/scripts/text2ids.py role)
    text2ids_main([f"--data_dir={data_dir}", "--prefixes=train,valid",
                   f"--tokenizer_dir={tok_dir}"])
    assert os.path.exists(os.path.join(data_dir, "train_sent_emo_ids.json"))

    # 5. on-device feature extraction over the WAV/PNG clips
    feats_path = os.path.join(data_dir, "features.pkl")
    for split in ("train", "dev"):
        split_dir = _write_clips(clips, split)
        extract_main([f"--clips_dir={split_dir}", f"--output_file={feats_path}",
                      f"--split={split}"])
    import pickle

    with open(feats_path, "rb") as f:
        feats = pickle.load(f)
    assert len(feats["train"]["aud"]) == 3 and len(feats["dev"]["img"]) == 2
    assert feats["train"]["aud"][0][0].shape == (768,)

    # 6. assemble the training pickles (the missing load_data step, §2.4.1)
    load_data_main([
        "--source=json", f"--data_dir={data_dir}",
        f"--out_dir={os.path.join(data_dir, 'tiny')}",
        "--labels_file=emotion_sentiment_labels.pkl",
        "--features_file=features.pkl", f"--tokenizer_dir={tok_dir}",
        "--valid_split=dev", "--captions",
    ])
    out_dir = os.path.join(data_dir, "tiny")
    assert os.path.exists(os.path.join(out_dir, "multi_train_data.pkl"))
    with open(os.path.join(out_dir, "multi_valid_data.pkl"), "rb") as f:
        payload = pickle.load(f)
    assert "cap" in payload and len(payload["txt"]) == 2

    # 7-8. train 2 epochs -> infer -> evaluation results, via the CLI
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        common = [f"--data_dir={data_dir}", "--model_type=tiny",
                  "--batch_size=4", "--max_len=128", "--dtype=float32",
                  "--mesh_shape=1", "--lr=1e-3", f"--tokenizer_dir={tok_dir}"]
        cli_main(["--mode=train", "--num_epochs=2", "--valid_prefix=valid",
                  *common])
        ckpts = os.listdir(tmp_path / "saved_models" / "tiny")
        assert any(c.startswith("best_ckpt_epoch=") for c in ckpts)
        cli_main(["--mode=infer", "--ckpt_name=best", "--valid_prefix=valid",
                  "--top_p=0.8", *common])
    finally:
        os.chdir(cwd)

    results = [f for f in os.listdir(out_dir) if f.endswith("_evaluation_results.txt")]
    assert results, "evaluation results file missing"
    text = (tmp_path / "data" / "tiny" / results[0]).read_text()
    metrics = {}
    for line in text.splitlines():
        k, _, v = line.partition(":")
        try:
            metrics[k.strip()] = float(v)
        except ValueError:
            pass
    for key in ("dist_1", "dist_2", "ppl", "emotion_acc", "bleu"):
        assert key in metrics and math.isfinite(metrics[key]), (key, text)
    gens = [f for f in os.listdir(out_dir) if f.endswith("_generations.txt")]
    assert gens and "Context:" in (tmp_path / "data" / "tiny" / gens[0]).read_text()
