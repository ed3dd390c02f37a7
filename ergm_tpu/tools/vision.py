"""On-device ViT visual encoder (BLIP-vision compatible, JAX/XLA).

Replaces the reference's offline torch pipeline — PIL image → HF
BlipModel.vision_model → last_hidden_state → mean-pool (reference:
data_process/feature_extraction.py:30-52, 64-70) — with a jitted TPU
program: 16x16 patchify conv, cls token, learned position embeddings,
pre-LN transformer stack, post layernorm. Weight-compatible with HF
``BlipVisionModel`` checkpoints via ``hf_to_vision_params`` (so features
from Salesforce/blip-image-captioning-base weights match the reference
extractor).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Mapping

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ergm_tpu.models.gpt2 import dense, layer_norm
from ergm_tpu.ops.attention import multihead_attention


@dataclasses.dataclass(frozen=True)
class VisionEncoderConfig:
    """BLIP-base vision geometry by default (ViT-B/16 at 384px)."""

    image_size: int = 384
    patch_size: int = 16
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    layer_norm_eps: float = 1e-5
    dtype: str = "float32"
    attention_impl: str = "auto"

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32


def init_vision_params(rng: jax.Array, cfg: VisionEncoderConfig) -> Dict[str, Any]:
    keys = jax.random.split(rng, 8)
    H, I, L, P = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers, cfg.patch_size

    def n(key, shape, std=0.02):
        return jax.random.normal(key, shape, jnp.float32) * std

    def ln():
        return {"scale": jnp.ones((L, H)), "bias": jnp.zeros((L, H))}

    def lin(key, din, dout):
        return {"kernel": n(key, (L, din, dout)), "bias": jnp.zeros((L, dout))}

    return {
        "patch_embed": {"kernel": n(keys[0], (H, 3, P, P)), "bias": jnp.zeros((H,))},
        "cls_token": n(keys[1], (1, 1, H)),
        "pos_embed": n(keys[2], (1, cfg.num_patches + 1, H)),
        "layers": {
            "qkv": lin(keys[3], H, 3 * H),
            "proj": lin(keys[4], H, H),
            "ln1": ln(),
            "fc1": lin(keys[5], H, I),
            "fc2": lin(keys[6], I, H),
            "ln2": ln(),
        },
        "post_layernorm": {"scale": jnp.ones((H,)), "bias": jnp.zeros((H,))},
    }


def vision_encoder(params, cfg: VisionEncoderConfig, images: jnp.ndarray) -> jnp.ndarray:
    """[B, 3, H, W] (HF pixel_values layout) -> [B, patches+1, hidden]
    (BlipVisionModel last_hidden_state, the tensor
    feature_extraction.py:48-52 extracts)."""
    dtype = cfg.compute_dtype
    x = lax.conv_general_dilated(
        images.astype(jnp.float32), params["patch_embed"]["kernel"],
        window_strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"), precision="highest",
    )  # [B, H, gh, gw]
    B, H, gh, gw = x.shape
    x = x.reshape(B, H, gh * gw).transpose(0, 2, 1)
    x = x + params["patch_embed"]["bias"]
    cls = jnp.broadcast_to(params["cls_token"], (B, 1, H))
    h = jnp.concatenate([cls, x], axis=1)
    h = h + params["pos_embed"][:, : h.shape[1]]
    h = h.astype(dtype)

    nh = cfg.num_heads
    hd = cfg.hidden_size // nh

    def block(h, p):
        # pre-LN ViT block (HF BlipEncoderLayer)
        y = layer_norm(h, p["ln1"], cfg.layer_norm_eps)
        qkv = dense(y, p["qkv"])
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split_heads(t):
            b, l, d = t.shape
            return t.reshape(b, l, nh, hd).transpose(0, 2, 1, 3)

        a = multihead_attention(split_heads(q), split_heads(k), split_heads(v),
                                causal=False, impl=cfg.attention_impl)
        a = a.transpose(0, 2, 1, 3).reshape(h.shape)
        h = h + dense(a, p["proj"])
        y = layer_norm(h, p["ln2"], cfg.layer_norm_eps)
        y = dense(y, p["fc1"])
        y = jax.nn.gelu(y, approximate=False)
        h = h + dense(y, p["fc2"])
        return h, None

    h, _ = lax.scan(block, h, params["layers"])
    return layer_norm(h, params["post_layernorm"], cfg.layer_norm_eps)


def extract_image_features(params, cfg: VisionEncoderConfig, images: jnp.ndarray) -> jnp.ndarray:
    """Mean-pooled image feature [B, hidden] (feature_extraction.py:64-70)."""
    return jnp.mean(vision_encoder(params, cfg, images), axis=1)


def _np(t):
    return t if isinstance(t, np.ndarray) else t.detach().cpu().numpy()


def hf_to_vision_params(state: Mapping[str, Any], cfg: VisionEncoderConfig) -> Dict[str, Any]:
    """Convert an HF BlipVisionModel state dict (optionally under a
    'vision_model.' prefix); nn.Linear weights transpose to (in, out)."""
    sd = {}
    for k, v in state.items():
        if k.startswith("vision_model."):
            k = k[len("vision_model."):]
        sd[k] = _np(v)
    L = cfg.num_layers

    def stack_lin(fmt):
        w = np.stack([sd[fmt.format(i) + ".weight"].T for i in range(L)])
        b = np.stack([sd[fmt.format(i) + ".bias"] for i in range(L)])
        return {"kernel": jnp.asarray(w), "bias": jnp.asarray(b)}

    def stack_ln(fmt):
        return {"scale": jnp.asarray(np.stack([sd[fmt.format(i) + ".weight"] for i in range(L)])),
                "bias": jnp.asarray(np.stack([sd[fmt.format(i) + ".bias"] for i in range(L)]))}

    return {
        "patch_embed": {"kernel": jnp.asarray(sd["embeddings.patch_embedding.weight"]),
                        "bias": jnp.asarray(sd["embeddings.patch_embedding.bias"])},
        "cls_token": jnp.asarray(sd["embeddings.class_embedding"].reshape(1, 1, -1)),
        "pos_embed": jnp.asarray(sd["embeddings.position_embedding"]),
        "layers": {
            "qkv": stack_lin("encoder.layers.{}.self_attn.qkv"),
            "proj": stack_lin("encoder.layers.{}.self_attn.projection"),
            "ln1": stack_ln("encoder.layers.{}.layer_norm1"),
            "fc1": stack_lin("encoder.layers.{}.mlp.fc1"),
            "fc2": stack_lin("encoder.layers.{}.mlp.fc2"),
            "ln2": stack_ln("encoder.layers.{}.layer_norm2"),
        },
        "post_layernorm": {"scale": jnp.asarray(sd["post_layernorm.weight"]),
                           "bias": jnp.asarray(sd["post_layernorm.bias"])},
    }
