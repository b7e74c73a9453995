"""Pre-tokenization pipeline: writer/reader round trip + CLI + token training."""

import io

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml
from PIL import Image

from maskbit_tpu.data.token_shards import TokenShardDataset, TokenShardWriter
from maskbit_tpu.losses.mlm import MLMLossConfig
from maskbit_tpu.models.generator import LFQBert
from maskbit_tpu.train.generator_trainer import (
    init_generator_train_state,
    make_generator_train_step_from_tokens,
)
from maskbit_tpu.train.tokenizer_trainer import make_optimizer


def test_token_shard_round_trip(tmp_path, rng):
    writer = TokenShardWriter(str(tmp_path / "tok-%04d.npz"), maxcount=10)
    all_tokens = rng.integers(0, 4096, size=(25, 64)).astype(np.int32)
    all_labels = rng.integers(0, 1000, size=(25,)).astype(np.int32)
    for i in range(0, 25, 5):
        writer.write_batch(all_tokens[i : i + 5], all_labels[i : i + 5])
    writer.close()

    ds = TokenShardDataset(str(tmp_path / "tok-{0000..0002}.npz"), resample=False)
    batches = list(ds.batches(8, drop_last=False))
    got = np.concatenate([b["tokens"] for b in batches])
    labels = np.concatenate([b["class_id"] for b in batches])
    np.testing.assert_array_equal(got, all_tokens)
    np.testing.assert_array_equal(labels, all_labels)


def test_token_shard_resampling(tmp_path, rng):
    writer = TokenShardWriter(str(tmp_path / "tok-%04d.npz"), maxcount=100)
    writer.write_batch(rng.integers(0, 16, (10, 8)), rng.integers(0, 5, (10,)))
    writer.close()
    ds = TokenShardDataset(str(tmp_path / "tok-0000.npz"), resample=True, seed=1)
    it = ds.batches(4)
    # more batches than the dataset holds: with-replacement semantics
    batches = [next(it) for _ in range(10)]
    assert all(b["tokens"].shape == (4, 8) for b in batches)


def test_train_from_tokens_overfit(rng):
    model = LFQBert(
        img_size=16, hidden_dim=32, codebook_size=16, codebook_splits=2,
        depth=1, heads=2, mlp_dim=64, dropout=0.0, nclass=10, input_stride=2,
    )
    tx = make_optimizer(3e-3)
    state = init_generator_train_state(model, tx, jax.random.key(0))
    step = jax.jit(
        make_generator_train_step_from_tokens(model, 16, tx, MLMLossConfig())
    )
    tokens = jnp.asarray(rng.integers(0, 16, (4, 64)), jnp.int32)
    labels = jnp.asarray([0, 1, 2, 3])
    losses = []
    for i in range(25):
        state, metrics = step(state, tokens, labels, jax.random.key(i))
        losses.append(float(metrics["mlm_loss"]))
    assert losses[-1] < losses[0]


def test_pretokenize_cli(tmp_path, monkeypatch, rng):
    from maskbit_tpu.cli.pretokenize import main
    from maskbit_tpu.data.shard_writer import ShardWriter

    # tiny image shard set
    writer = ShardWriter(str(tmp_path / "img-%04d.tar"), maxcount=10)
    for i in range(6):
        arr = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="JPEG")
        writer.write(f"{i:06d}", buf.getvalue(), i % 3)
    writer.close()

    cfg = {
        "experiment": {"name": "pretok", "logger": "jsonl", "vqgan_checkpoint": ""},
        "model": {"vq_model": {
            "model_class": "vqgan+", "quantizer_type": "lookup-free",
            "codebook_size": 16, "token_size": 4, "num_channels": 3,
            "hidden_channels": 32, "channel_mult": [1, 2], "num_resolutions": 2,
            "num_res_blocks": 1, "sample_with_conv": True, "entropy_loss_weight": 0.0,
        }},
        "dataset": {"params": {}, "preprocessing": {"resolution": 32}},
        "training": {"mixed_precision": "no", "seed": 0},
        "pretokenize": {
            "shards": str(tmp_path / "img-0000.tar"),
            "output": str(tmp_path / "tokens" / "t-%04d.npz"),
            "batch_size": 4,
            "train_augmentation": False,
        },
    }
    config_path = tmp_path / "cfg.yaml"
    config_path.write_text(yaml.safe_dump(cfg))
    monkeypatch.setenv("WORKSPACE", str(tmp_path / "ws"))
    total = main([f"config={config_path}"])
    assert total == 6
    ds = TokenShardDataset(str(tmp_path / "tokens" / "t-0000.npz"), resample=False)
    batch = next(ds.batches(6, drop_last=False))
    assert batch["tokens"].shape == (6, 256)  # 32px / stride 2 -> 16x16 grid
    assert int(batch["tokens"].max()) < 16
