"""Feature-extraction CLI: media files -> per-dialogue feature pickles.

The on-device counterpart of data_process/feature_extraction.py's
``__main__`` (feature_extraction.py:56-70): runs the JAX audio/vision
encoders (ergm_tpu/tools/audio.py, vision.py) over utterance clips and
keyframes, mean-pools, and writes ``{split: {"img": [...], "aud": [...]}}``
pickles in the layout ergm_tpu/cli/load_data.py consumes.

Pretrained weights come from LOCAL HF checkpoint dirs (no downloads):
``--wav2vec2_dir`` / ``--blip_dir`` pointing at directories containing
pytorch_model.bin or model.safetensors for facebook/wav2vec2-base-960h /
Salesforce/blip-image-captioning-base. Audio files must be WAV
(ffmpeg extracts 16 kHz mono WAV upstream, README.md:40 — stdlib
``wave`` reads them; resampling runs on device). Images load via PIL
when available.
"""

from __future__ import annotations

import argparse
import os
import pickle
import wave
from typing import Dict, List, Optional

import numpy as np


def load_wav(path: str) -> tuple:
    """(samples float32 [-1,1] mono, sample_rate) from a PCM WAV."""
    with wave.open(path, "rb") as w:
        sr = w.getframerate()
        n = w.getnframes()
        ch = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(n)
    if width == 2:
        x = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
    elif width == 4:
        x = np.frombuffer(raw, np.int32).astype(np.float32) / 2147483648.0
    elif width == 1:
        x = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    return x, sr


def _load_torch_state(model_dir: str):
    from ergm_tpu.utils.torch_io import load_torch_state

    return load_torch_state(model_dir)


def build_audio_extractor(wav2vec2_dir: Optional[str]):
    import jax
    import jax.numpy as jnp

    from ergm_tpu.tools.audio import (AudioEncoderConfig, extract_audio_features,
                                      hf_to_audio_params, init_audio_params, resample)

    cfg = AudioEncoderConfig()
    if wav2vec2_dir:
        params = hf_to_audio_params(_load_torch_state(wav2vec2_dir), cfg)
    else:
        print("WARNING: no --wav2vec2_dir; using random-init audio encoder")
        params = init_audio_params(jax.random.PRNGKey(0), cfg)

    @jax.jit
    def run(wav):
        return extract_audio_features(params, cfg, wav[None])[0]

    def extract(path: str) -> np.ndarray:
        x, sr = load_wav(path)
        wav = jnp.asarray(x)
        if sr != 16000:
            wav = resample(wav, sr, 16000)
        return np.asarray(run(wav))

    return extract


def build_image_extractor(blip_dir: Optional[str]):
    import jax
    import jax.numpy as jnp

    from ergm_tpu.tools.vision import (VisionEncoderConfig, extract_image_features,
                                       hf_to_vision_params, init_vision_params)

    cfg = VisionEncoderConfig()
    if blip_dir:
        params = hf_to_vision_params(_load_torch_state(blip_dir), cfg)
    else:
        print("WARNING: no --blip_dir; using random-init vision encoder")
        params = init_vision_params(jax.random.PRNGKey(1), cfg)

    mean = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
    std = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)

    @jax.jit
    def run(img):
        return extract_image_features(params, cfg, img[None])[0]

    def extract(path: str) -> np.ndarray:
        from PIL import Image

        im = Image.open(path).convert("RGB").resize((cfg.image_size, cfg.image_size))
        arr = np.asarray(im, np.float32) / 255.0
        arr = (arr - mean) / std
        return np.asarray(run(jnp.asarray(arr.transpose(2, 0, 1))))

    return extract


def main(argv=None):
    p = argparse.ArgumentParser(description="Extract audio/visual features on device")
    p.add_argument("--clips_dir", type=str, required=True,
                   help="Dir of per-dialogue subdirs holding utterance .wav files "
                        "and keyframe .jpg/.png files.")
    p.add_argument("--output_file", type=str, required=True)
    p.add_argument("--split", type=str, default="train")
    p.add_argument("--wav2vec2_dir", type=str, default=None)
    p.add_argument("--blip_dir", type=str, default=None)
    args = p.parse_args(argv)

    audio_fn = build_audio_extractor(args.wav2vec2_dir)
    image_fn = build_image_extractor(args.blip_dir)

    img_out: List[List[np.ndarray]] = []
    aud_out: List[List[np.ndarray]] = []
    for dia in sorted(os.listdir(args.clips_dir)):
        dia_dir = os.path.join(args.clips_dir, dia)
        if not os.path.isdir(dia_dir):
            continue
        wavs = sorted(f for f in os.listdir(dia_dir) if f.endswith(".wav"))
        imgs = sorted(f for f in os.listdir(dia_dir)
                      if f.endswith((".jpg", ".jpeg", ".png")))
        aud_out.append([audio_fn(os.path.join(dia_dir, f)) for f in wavs])
        img_out.append([image_fn(os.path.join(dia_dir, f)) for f in imgs])
        print(f"{dia}: {len(wavs)} wavs, {len(imgs)} images")

    payload: Dict[str, dict] = {args.split: {"img": img_out, "aud": aud_out}}
    if os.path.exists(args.output_file):
        with open(args.output_file, "rb") as f:
            existing = pickle.load(f)
        existing.update(payload)
        payload = existing
    with open(args.output_file, "wb") as f:
        pickle.dump(payload, f)
    print(f"wrote {args.output_file}")


if __name__ == "__main__":
    main()
