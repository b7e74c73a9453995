"""Checkpoint round trips: Orbax train state + bare msgpack + .bin compat."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maskbit_tpu.core.checkpoint import CheckpointManager, load_pretrained, save_pretrained


def _tree(seed=0):
    rng = np.random.default_rng(seed)
    return {
        "a": {"kernel": rng.normal(size=(4, 4)).astype(np.float32)},
        "b": {"bias": rng.normal(size=(4,)).astype(np.float32)},
    }


def test_orbax_round_trip(tmp_path):
    ckpt = CheckpointManager(str(tmp_path / "ckpts"), max_to_keep=2)
    state = {"params": _tree(0), "step": np.int32(7)}
    ckpt.save(7, state)
    assert ckpt.latest_step() == 7
    restored, step = ckpt.restore_latest(jax.tree.map(np.asarray, state))
    assert step == 7
    np.testing.assert_array_equal(restored["params"]["a"]["kernel"], state["params"]["a"]["kernel"])
    assert os.path.exists(tmp_path / "ckpts" / "metadata-7.json")


def test_resume_latest_of_many(tmp_path):
    ckpt = CheckpointManager(str(tmp_path / "ckpts"), max_to_keep=2)
    for step in (5, 10, 15):
        ckpt.save(step, {"params": _tree(step)})
    restored, step = ckpt.restore_latest({"params": _tree(0)})
    assert step == 15
    np.testing.assert_array_equal(
        restored["params"]["a"]["kernel"], _tree(15)["a"]["kernel"]
    )


def test_msgpack_round_trip(tmp_path):
    params = _tree(1)
    path = str(tmp_path / "model.msgpack")
    save_pretrained(params, path)
    loaded = load_pretrained(path, template=params)
    np.testing.assert_array_equal(loaded["a"]["kernel"], params["a"]["kernel"])
    # template-free restore also works
    loaded2 = load_pretrained(path)
    np.testing.assert_array_equal(loaded2["a"]["kernel"], params["a"]["kernel"])


def test_load_pretrained_torch_bin(tmp_path):
    torch = pytest.importorskip("torch")
    # tokenizer-shaped .bin auto-detects and converts
    state = {
        "encoder.conv_in.weight": torch.randn(8, 3, 3, 3),
        "decoder.conv_out.weight": torch.randn(3, 8, 3, 3),
        "decoder.conv_out.bias": torch.randn(3),
    }
    path = str(tmp_path / "pytorch_model.bin")
    torch.save(state, path)
    params = load_pretrained(path)["params"]
    assert params["encoder"]["conv_in"]["kernel"].shape == (3, 3, 3, 8)
    assert params["decoder"]["conv_out"]["kernel"].shape == (3, 3, 8, 3)


def test_convert_checkpoint_cli(tmp_path):
    torch = pytest.importorskip("torch")
    from maskbit_tpu.cli.convert_checkpoint import main
    from maskbit_tpu.core.checkpoint import load_pretrained

    state = {
        "encoder.conv_in.weight": torch.randn(8, 3, 3, 3),
        "decoder.conv_out.weight": torch.randn(3, 8, 3, 3),
        "decoder.conv_out.bias": torch.randn(3),
    }
    src = str(tmp_path / "model.bin")
    dst = str(tmp_path / "model.msgpack")
    torch.save(state, src)
    main(["--input", src, "--output", dst])
    loaded = load_pretrained(dst)
    assert loaded["params"]["encoder"]["conv_in"]["kernel"].shape == (3, 3, 3, 8)
