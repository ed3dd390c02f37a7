"""Checkpoint-converter CLI: reference torch .ckpt -> orbax params ->
train init; reverse export back to a torch state dict."""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from ergm_tpu.cli.convert_ckpt import main as convert_main

VOCAB, EMBD, LAYER, HEAD = 96, 32, 2, 4


def _make_reference_style_ckpt(path):
    """A torch blob shaped like the reference save (src/main.py:186-196)."""
    cfg = transformers.GPT2Config(
        vocab_size=VOCAB, n_positions=64, n_embd=EMBD, n_layer=LAYER, n_head=HEAD,
        add_cross_attention=True)
    torch.manual_seed(0)
    model = transformers.GPT2LMHeadModel(cfg)
    blob = {"model_state_dict": model.state_dict(), "epoch": 3, "ppl": 12.5}
    torch.save(blob, path)
    return model


def test_roundtrip_torch_to_orbax_to_torch(tmp_path):
    src = tmp_path / "ref.ckpt"
    model = _make_reference_style_ckpt(str(src))

    out = tmp_path / "converted"
    convert_main([f"--src={src}", f"--dst={out}", "--model_type=gpt2",
                  f"--vocab_size={VOCAB}"])
    assert os.path.isdir(out)

    back = tmp_path / "exported.pt"
    convert_main(["--reverse", f"--src={out}", f"--dst={back}",
                  "--model_type=gpt2", f"--vocab_size={VOCAB}"])
    sd = torch.load(str(back), weights_only=False)
    ref_sd = model.state_dict()
    np.testing.assert_allclose(
        sd["transformer.wte.weight"].numpy(), ref_sd["transformer.wte.weight"].numpy())
    np.testing.assert_allclose(
        sd["transformer.h.1.attn.c_attn.weight"].numpy(),
        ref_sd["transformer.h.1.attn.c_attn.weight"].numpy())


def test_vocab_extension_on_convert(tmp_path):
    src = tmp_path / "ref.ckpt"
    _make_reference_style_ckpt(str(src))
    out = tmp_path / "converted"
    convert_main([f"--src={src}", f"--dst={out}", "--model_type=gpt2",
                  f"--vocab_size={VOCAB + 7}"])
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as c:
        params = c.restore(str(out))["params"]
    assert params["wte"]["embedding"].shape[0] == VOCAB + 7


def test_trainer_init_params(tmp_path):
    """--init_params starts training from converted weights."""
    src = tmp_path / "ref.ckpt"
    _make_reference_style_ckpt(str(src))
    out = tmp_path / "converted"

    from ergm_tpu.data.synthetic import write_synthetic_dataset

    data_dir = tmp_path / "data"
    st = write_synthetic_dataset(str(data_dir), prefixes=("train", "valid"),
                                 num_dialogues=2, turns_per_dialogue=3,
                                 base_vocab_size=VOCAB)
    convert_main([f"--src={src}", f"--dst={out}", "--model_type=gpt2",
                  f"--vocab_size={st.vocab_size}"])

    from ergm_tpu.core.config import ModelConfig, TrainConfig
    from ergm_tpu.train.trainer import Trainer

    cfg = TrainConfig(data_dir=str(data_dir), ckpt_dir=str(tmp_path / "ck"),
                      output_dir="", batch_size=2, num_epochs=1, max_len=64,
                      dtype="float32", mesh_shape=(1,), init_params=str(out))
    mcfg = ModelConfig(vocab_size=st.vocab_size, n_positions=64, n_embd=EMBD,
                       n_layer=LAYER, n_head=HEAD, dtype="float32")
    tr = Trainer(cfg, model_config=mcfg)
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as c:
        conv = c.restore(str(out))["params"]
    np.testing.assert_allclose(
        np.asarray(tr.state.params["wte"]["embedding"])[:VOCAB],
        np.asarray(conv["wte"]["embedding"])[:VOCAB])
