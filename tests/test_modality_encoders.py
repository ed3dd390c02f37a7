"""Modality encoder parity tests vs locally-built HF torch models
(random init — no downloads), plus frontend unit tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from ergm_tpu.tools.audio import (AudioEncoderConfig, audio_encoder,
                                  extract_audio_features, hf_to_audio_params,
                                  init_audio_params, log_mel_spectrogram, resample)
from ergm_tpu.tools.vision import (VisionEncoderConfig, extract_image_features,
                                   hf_to_vision_params, init_vision_params,
                                   vision_encoder)


@pytest.fixture(scope="module")
def wav2vec2_pair():
    cfg = AudioEncoderConfig(
        conv_dim=(16, 16), conv_stride=(5, 2), conv_kernel=(10, 3),
        hidden_size=32, num_layers=2, num_heads=4, intermediate_size=64,
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4)
    hf_cfg = transformers.Wav2Vec2Config(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, conv_dim=(16, 16), conv_stride=(5, 2),
        conv_kernel=(10, 3), num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4, vocab_size=32,
        hidden_dropout=0.0, attention_dropout=0.0, feat_proj_dropout=0.0,
        activation_dropout=0.0, layerdrop=0.0)
    torch.manual_seed(0)
    hf = transformers.Wav2Vec2Model(hf_cfg)
    hf.eval()
    params = hf_to_audio_params(hf.state_dict(), cfg)
    return cfg, hf, params


def test_audio_encoder_parity(wav2vec2_pair):
    cfg, hf, params = wav2vec2_pair
    rng = np.random.default_rng(0)
    wav = rng.standard_normal((2, 800)).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.tensor(wav)).last_hidden_state.numpy()
    ours = np.asarray(audio_encoder(params, cfg, jnp.asarray(wav)))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-3)


def test_audio_feature_mean_pool(wav2vec2_pair):
    cfg, hf, params = wav2vec2_pair
    wav = np.random.default_rng(1).standard_normal((1, 640)).astype(np.float32)
    feat = np.asarray(extract_audio_features(params, cfg, jnp.asarray(wav)))
    with torch.no_grad():
        ref = hf(torch.tensor(wav)).last_hidden_state.mean(dim=1).numpy()
    np.testing.assert_allclose(feat, ref, atol=2e-3, rtol=1e-3)


def test_frames_for_samples(wav2vec2_pair):
    cfg, hf, params = wav2vec2_pair
    wav = jnp.zeros((1, 700))
    out = audio_encoder(params, cfg, wav)
    assert out.shape[1] == cfg.frames_for_samples(700)


@pytest.fixture(scope="module")
def blip_pair():
    cfg = VisionEncoderConfig(image_size=32, patch_size=8, hidden_size=32,
                              num_layers=2, num_heads=4, intermediate_size=64)
    from transformers.models.blip.modeling_blip import BlipVisionModel

    hf_cfg = transformers.BlipVisionConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, image_size=32, patch_size=8,
        attention_dropout=0.0)
    torch.manual_seed(1)
    hf = BlipVisionModel(hf_cfg)
    hf.eval()
    params = hf_to_vision_params(hf.state_dict(), cfg)
    return cfg, hf, params


def test_vision_encoder_parity(blip_pair):
    cfg, hf, params = blip_pair
    rng = np.random.default_rng(2)
    img = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.tensor(img)).last_hidden_state.numpy()
    ours = np.asarray(vision_encoder(params, cfg, jnp.asarray(img)))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-3)


def test_vision_feature_mean_pool(blip_pair):
    cfg, hf, params = blip_pair
    img = np.random.default_rng(3).standard_normal((1, 3, 32, 32)).astype(np.float32)
    feat = np.asarray(extract_image_features(params, cfg, jnp.asarray(img)))
    with torch.no_grad():
        ref = hf(torch.tensor(img)).last_hidden_state.mean(dim=1).numpy()
    np.testing.assert_allclose(feat, ref, atol=2e-3, rtol=1e-3)


def test_resample_linear():
    t = np.linspace(0, 1, 1000, dtype=np.float32)
    wav = np.sin(2 * np.pi * 5 * t)
    out = np.asarray(resample(jnp.asarray(wav), 1000, 500))
    assert out.shape[-1] == 500
    # matches numpy linear interpolation at the resampled grid
    expect = np.interp(np.linspace(0, 999, 500), np.arange(1000), wav)
    np.testing.assert_allclose(out, expect, atol=1e-5)
    same = np.asarray(resample(jnp.asarray(wav), 1000, 1000))
    np.testing.assert_array_equal(same, wav)


def test_log_mel_shapes_and_finiteness():
    wav = np.random.default_rng(4).standard_normal((2, 16000)).astype(np.float32)
    mel = np.asarray(log_mel_spectrogram(jnp.asarray(wav), sr=16000))
    assert mel.shape == (2, 1 + (16000 - 400) // 160, 80)
    assert np.isfinite(mel).all()


def test_random_init_runs():
    cfg = AudioEncoderConfig(conv_dim=(8, 8), conv_stride=(5, 2), conv_kernel=(10, 3),
                             hidden_size=16, num_layers=1, num_heads=2,
                             intermediate_size=32, num_conv_pos_embeddings=8,
                             num_conv_pos_embedding_groups=2)
    p = init_audio_params(jax.random.PRNGKey(0), cfg)
    out = audio_encoder(p, cfg, jnp.zeros((1, 400)))
    assert np.isfinite(np.asarray(out)).all()

    vcfg = VisionEncoderConfig(image_size=16, patch_size=8, hidden_size=16,
                               num_layers=1, num_heads=2, intermediate_size=32)
    vp = init_vision_params(jax.random.PRNGKey(1), vcfg)
    vout = vision_encoder(vp, vcfg, jnp.zeros((1, 3, 16, 16)))
    assert np.isfinite(np.asarray(vout)).all()
