"""On-device audio frontend + wav2vec2-style encoder (JAX/XLA).

Replaces the reference's offline torch pipeline — librosa 16 kHz load →
HF Wav2Vec2Model → last_hidden_state → mean-pool (reference:
data_process/feature_extraction.py:8-26, 56-62) — with jitted TPU
programs:

- ``resample`` / ``log_mel_spectrogram``: on-device signal frontend
  (frame + Hann window + rFFT + mel filterbank) for mel-based pipelines,
- ``audio_encoder``: wav2vec2 architecture (7-layer strided conv feature
  extractor with per-channel group norm, feature projection, weight-
  normed convolutional positional embedding, post-LN transformer stack),
  weight-compatible with HF ``Wav2Vec2Model`` checkpoints via
  ``hf_to_audio_params`` — so features extracted from
  facebook/wav2vec2-base-960h weights match the reference extractor,
- ``extract_audio_features``: mean-pooled utterance feature
  (feature_extraction.py:56-62 semantics).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ergm_tpu.models.gpt2 import dense, layer_norm
from ergm_tpu.ops.attention import multihead_attention


@dataclasses.dataclass(frozen=True)
class AudioEncoderConfig:
    """wav2vec2-base geometry by default (HF Wav2Vec2Config defaults)."""

    conv_dim: Tuple[int, ...] = (512, 512, 512, 512, 512, 512, 512)
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    layer_norm_eps: float = 1e-5
    dtype: str = "float32"
    attention_impl: str = "auto"

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32

    def frames_for_samples(self, n: int) -> int:
        for k, s in zip(self.conv_kernel, self.conv_stride):
            n = (n - k) // s + 1
        return n


# ---------------------------------------------------------------------------
# Signal frontend
# ---------------------------------------------------------------------------


def resample(wav: jnp.ndarray, orig_sr: int, target_sr: int) -> jnp.ndarray:
    """Linear-interpolation resample along the last axis (the reference
    relies on librosa's 16 kHz load, feature_extraction.py:18)."""
    if orig_sr == target_sr:
        return wav
    n_in = wav.shape[-1]
    n_out = int(round(n_in * target_sr / orig_sr))
    pos = jnp.linspace(0.0, n_in - 1.0, n_out)
    i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n_in - 1)
    i1 = jnp.clip(i0 + 1, 0, n_in - 1)
    frac = pos - i0
    return wav[..., i0] * (1.0 - frac) + wav[..., i1] * frac


def mel_filterbank(num_mels: int, n_fft: int, sr: int,
                   fmin: float = 0.0, fmax: Optional[float] = None) -> np.ndarray:
    """[num_mels, n_fft//2+1] triangular (HTK) mel filterbank."""
    fmax = fmax or sr / 2

    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)

    def mel_to_hz(m):
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)

    mels = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), num_mels + 2)
    hz = mel_to_hz(mels)
    bins = np.floor((n_fft + 1) * hz / sr).astype(int)
    fb = np.zeros((num_mels, n_fft // 2 + 1), np.float32)
    for m in range(1, num_mels + 1):
        l, c, r = bins[m - 1], bins[m], bins[m + 1]
        for k in range(l, c):
            if c > l:
                fb[m - 1, k] = (k - l) / (c - l)
        for k in range(c, r):
            if r > c:
                fb[m - 1, k] = (r - k) / (r - c)
    return fb


def log_mel_spectrogram(
    wav: jnp.ndarray,  # [B, T] or [T]
    *,
    sr: int = 16000,
    n_fft: int = 400,
    hop: int = 160,
    num_mels: int = 80,
) -> jnp.ndarray:
    """[B, frames, num_mels] log-mel features, fully on device (frame →
    Hann window → rFFT → mel projection → log)."""
    if wav.ndim == 1:
        wav = wav[None]
    B, T = wav.shape
    n_frames = 1 + (T - n_fft) // hop if T >= n_fft else 0
    if n_frames <= 0:
        raise ValueError(f"waveform too short for n_fft={n_fft}")
    idx = (jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :])
    frames = wav[:, idx]  # [B, frames, n_fft]
    window = jnp.asarray(np.hanning(n_fft + 1)[:-1], jnp.float32)
    spec = jnp.abs(jnp.fft.rfft(frames * window, axis=-1)) ** 2
    fb = jnp.asarray(mel_filterbank(num_mels, n_fft, sr))
    mel = jnp.einsum("bfk,mk->bfm", spec, fb)
    return jnp.log(jnp.maximum(mel, 1e-10))


# ---------------------------------------------------------------------------
# wav2vec2-style encoder
# ---------------------------------------------------------------------------


def _conv1d(x, w, stride: int, padding: int = 0, groups: int = 1):
    """x [B, C_in, T], w [C_out, C_in/groups, K] -> [B, C_out, T']."""
    return lax.conv_general_dilated(
        x, w, window_strides=(stride,),
        padding=[(padding, padding)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=groups,
        precision="highest",
    )


def init_audio_params(rng: jax.Array, cfg: AudioEncoderConfig) -> Dict[str, Any]:
    keys = jax.random.split(rng, 8)
    H, I, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers

    def n(key, shape, std=0.02):
        return jax.random.normal(key, shape, jnp.float32) * std

    convs = []
    in_ch = 1
    for i, (ch, kern) in enumerate(zip(cfg.conv_dim, cfg.conv_kernel)):
        layer = {"conv": n(jax.random.fold_in(keys[0], i), (ch, in_ch, kern),
                           (2 / (in_ch * kern)) ** 0.5)}
        if i == 0:
            layer["gn_scale"] = jnp.ones((ch,))
            layer["gn_bias"] = jnp.zeros((ch,))
        convs.append(layer)
        in_ch = ch

    def ln():
        return {"scale": jnp.ones((L, H)), "bias": jnp.zeros((L, H))}

    def lin(key, din, dout):
        return {"kernel": n(key, (L, din, dout)), "bias": jnp.zeros((L, dout))}

    params = {
        "feature_extractor": convs,
        "feature_projection": {
            "layer_norm": {"scale": jnp.ones((cfg.conv_dim[-1],)),
                           "bias": jnp.zeros((cfg.conv_dim[-1],))},
            "projection": {"kernel": n(keys[1], (cfg.conv_dim[-1], H)),
                           "bias": jnp.zeros((H,))},
        },
        "pos_conv": {
            "weight": n(keys[2], (H, H // cfg.num_conv_pos_embedding_groups,
                                  cfg.num_conv_pos_embeddings)),
            "bias": jnp.zeros((H,)),
        },
        "encoder_layer_norm": {"scale": jnp.ones((H,)), "bias": jnp.zeros((H,))},
        "layers": {
            "q_proj": lin(jax.random.fold_in(keys[3], 0), H, H),
            "k_proj": lin(jax.random.fold_in(keys[3], 1), H, H),
            "v_proj": lin(jax.random.fold_in(keys[3], 2), H, H),
            "out_proj": lin(jax.random.fold_in(keys[3], 3), H, H),
            "layer_norm": ln(),
            "intermediate": lin(keys[4], H, I),
            "output": lin(keys[5], I, H),
            "final_layer_norm": ln(),
        },
    }
    return params


def audio_encoder(params, cfg: AudioEncoderConfig, wav: jnp.ndarray) -> jnp.ndarray:
    """[B, T] 16 kHz waveform -> [B, frames, hidden] (HF Wav2Vec2Model
    last_hidden_state semantics, the tensor feature_extraction.py:23-26
    extracts)."""
    dtype = cfg.compute_dtype
    x = wav[:, None, :].astype(jnp.float32)  # [B, 1, T]

    # conv feature extractor (group-norm on layer 0, gelu everywhere)
    for i, layer in enumerate(params["feature_extractor"]):
        x = _conv1d(x, layer["conv"], cfg.conv_stride[i])
        if "gn_scale" in layer:
            # per-channel GroupNorm(num_groups=channels) over time
            mean = jnp.mean(x, axis=-1, keepdims=True)
            var = jnp.var(x, axis=-1, keepdims=True)
            x = (x - mean) * lax.rsqrt(var + cfg.layer_norm_eps)
            x = x * layer["gn_scale"][None, :, None] + layer["gn_bias"][None, :, None]
        x = jax.nn.gelu(x, approximate=False)

    h = x.transpose(0, 2, 1)  # [B, frames, C]
    fp = params["feature_projection"]
    h = layer_norm(h, fp["layer_norm"], cfg.layer_norm_eps)
    h = dense(h.astype(dtype), fp["projection"])

    # convolutional positional embedding (weight-normed conv, groups=16)
    pad = cfg.num_conv_pos_embeddings // 2
    pos = _conv1d(h.transpose(0, 2, 1).astype(jnp.float32),
                  params["pos_conv"]["weight"], stride=1, padding=pad,
                  groups=cfg.num_conv_pos_embedding_groups)
    pos = pos + params["pos_conv"]["bias"][None, :, None]
    if cfg.num_conv_pos_embeddings % 2 == 0:
        pos = pos[..., :-1]
    pos = jax.nn.gelu(pos, approximate=False).transpose(0, 2, 1)
    h = h + pos.astype(dtype)
    h = layer_norm(h, params["encoder_layer_norm"], cfg.layer_norm_eps)

    nh = cfg.num_heads
    hd = cfg.hidden_size // nh

    def split_heads(t):
        b, l, d = t.shape
        return t.reshape(b, l, nh, hd).transpose(0, 2, 1, 3)

    def block(h, p):
        # post-LN encoder layer (HF Wav2Vec2EncoderLayer, base variant)
        q = split_heads(dense(h, p["q_proj"]))
        k = split_heads(dense(h, p["k_proj"]))
        v = split_heads(dense(h, p["v_proj"]))
        a = multihead_attention(q, k, v, causal=False, impl=cfg.attention_impl)
        a = a.transpose(0, 2, 1, 3).reshape(h.shape)
        h = layer_norm(h + dense(a, p["out_proj"]), p["layer_norm"], cfg.layer_norm_eps)
        ff = dense(h, p["intermediate"])
        ff = jax.nn.gelu(ff, approximate=False)
        ff = dense(ff, p["output"])
        h = layer_norm(h + ff, p["final_layer_norm"], cfg.layer_norm_eps)
        return h, None

    h, _ = lax.scan(block, h, params["layers"])
    return h


def extract_audio_features(params, cfg: AudioEncoderConfig, wav: jnp.ndarray) -> jnp.ndarray:
    """Mean-pooled utterance feature [B, hidden]
    (feature_extraction.py:56-62)."""
    return jnp.mean(audio_encoder(params, cfg, wav), axis=1)


# ---------------------------------------------------------------------------
# HF weight conversion
# ---------------------------------------------------------------------------


def _np(t):
    return t if isinstance(t, np.ndarray) else t.detach().cpu().numpy()


def hf_to_audio_params(state: Mapping[str, Any], cfg: AudioEncoderConfig) -> Dict[str, Any]:
    """Convert an HF Wav2Vec2Model state dict (optionally under a
    'wav2vec2.' prefix). nn.Linear weights transpose to (in, out); the
    weight-normed positional conv is materialized (w = g * v / ||v||,
    norms over (out, in) per kernel position)."""
    sd = {}
    for k, v in state.items():
        if k.startswith("wav2vec2."):
            k = k[len("wav2vec2."):]
        sd[k] = _np(v)
    L = cfg.num_layers

    convs = []
    for i in range(len(cfg.conv_dim)):
        layer = {"conv": jnp.asarray(sd[f"feature_extractor.conv_layers.{i}.conv.weight"])}
        if i == 0:
            layer["gn_scale"] = jnp.asarray(sd["feature_extractor.conv_layers.0.layer_norm.weight"])
            layer["gn_bias"] = jnp.asarray(sd["feature_extractor.conv_layers.0.layer_norm.bias"])
        convs.append(layer)

    if "encoder.pos_conv_embed.conv.parametrizations.weight.original0" in sd:
        g = sd["encoder.pos_conv_embed.conv.parametrizations.weight.original0"]
        v = sd["encoder.pos_conv_embed.conv.parametrizations.weight.original1"]
    else:  # older torch weight_norm naming
        g = sd["encoder.pos_conv_embed.conv.weight_g"]
        v = sd["encoder.pos_conv_embed.conv.weight_v"]
    norm = np.linalg.norm(v.reshape(-1, v.shape[-1]), axis=0, keepdims=True)[None]
    pos_w = g * v / np.maximum(norm, 1e-12)

    def stack_lin(fmt):
        w = np.stack([sd[fmt.format(i) + ".weight"].T for i in range(L)])
        b = np.stack([sd[fmt.format(i) + ".bias"] for i in range(L)])
        return {"kernel": jnp.asarray(w), "bias": jnp.asarray(b)}

    def stack_ln(fmt):
        return {"scale": jnp.asarray(np.stack([sd[fmt.format(i) + ".weight"] for i in range(L)])),
                "bias": jnp.asarray(np.stack([sd[fmt.format(i) + ".bias"] for i in range(L)]))}

    return {
        "feature_extractor": convs,
        "feature_projection": {
            "layer_norm": {"scale": jnp.asarray(sd["feature_projection.layer_norm.weight"]),
                           "bias": jnp.asarray(sd["feature_projection.layer_norm.bias"])},
            "projection": {"kernel": jnp.asarray(sd["feature_projection.projection.weight"].T),
                           "bias": jnp.asarray(sd["feature_projection.projection.bias"])},
        },
        "pos_conv": {"weight": jnp.asarray(pos_w),
                     "bias": jnp.asarray(sd["encoder.pos_conv_embed.conv.bias"])},
        "encoder_layer_norm": {"scale": jnp.asarray(sd["encoder.layer_norm.weight"]),
                               "bias": jnp.asarray(sd["encoder.layer_norm.bias"])},
        "layers": {
            "q_proj": stack_lin("encoder.layers.{}.attention.q_proj"),
            "k_proj": stack_lin("encoder.layers.{}.attention.k_proj"),
            "v_proj": stack_lin("encoder.layers.{}.attention.v_proj"),
            "out_proj": stack_lin("encoder.layers.{}.attention.out_proj"),
            "layer_norm": stack_ln("encoder.layers.{}.layer_norm"),
            "intermediate": stack_lin("encoder.layers.{}.feed_forward.intermediate_dense"),
            "output": stack_lin("encoder.layers.{}.feed_forward.output_dense"),
            "final_layer_norm": stack_ln("encoder.layers.{}.final_layer_norm"),
        },
    }
