"""The embedding-table `Bert` generator variant: training + sampling paths
(the weight-tied output head is the structural difference from LFQBert)."""

import jax
import jax.numpy as jnp
import numpy as np

from maskbit_tpu.losses.mlm import MLMLossConfig
from maskbit_tpu.models.generator import Bert, make_generator
from maskbit_tpu.models.tokenizer import ConvVQModel
from maskbit_tpu.sampling.sample import SamplingConfig, make_sampler
from maskbit_tpu.train.generator_trainer import (
    init_generator_train_state,
    make_generator_train_step_from_tokens,
)
from maskbit_tpu.train.tokenizer_trainer import make_optimizer

# codebook 256 bits, 2 splits -> effective codebook 16 per split, mask id 16
BERT = Bert(
    img_size=16, hidden_dim=32, codebook_size=256, codebook_splits=2,
    depth=1, heads=2, mlp_dim=64, dropout=0.0, nclass=10, input_stride=2,
)


def test_bert_train_step_overfits(rng):
    tx = make_optimizer(3e-3)
    state = init_generator_train_state(BERT, tx, jax.random.key(0))
    step = jax.jit(make_generator_train_step_from_tokens(BERT, 256, tx, MLMLossConfig()))
    tokens = jnp.asarray(rng.integers(0, 256, (4, 64)), jnp.int32)
    labels = jnp.asarray([0, 1, 2, 3])
    losses = []
    for i in range(25):
        state, metrics = step(state, tokens, labels, jax.random.key(i))
        losses.append(float(metrics["mlm_loss"]))
    assert losses[-1] < losses[0]


def test_bert_tied_head_receives_gradients(rng):
    variables = BERT.init(
        jax.random.key(0), jnp.zeros((1, 64, 2), jnp.int32), jnp.zeros((1,), jnp.int32)
    )
    tokens = jnp.asarray(rng.integers(0, 16, (2, 64, 2)), jnp.int32)
    labels = jnp.zeros((2,), jnp.int32)

    def loss(params):
        logits = BERT.apply({"params": params}, tokens, labels)
        return jnp.mean(logits**2)

    grads = jax.grad(loss)(variables["params"])
    # tied embedding gets gradient from the output head; per-position bias too
    assert float(jnp.sum(jnp.abs(grads["tok_emb_0"]["embedding"]))) > 0.0
    assert float(jnp.sum(jnp.abs(grads["bias_0"]))) > 0.0


def test_bert_sampling_end_to_end(rng):
    tokenizer = ConvVQModel(
        num_channels=3, hidden_channels=32, channel_mult=(1, 2), num_resolutions=2,
        num_res_blocks=1, token_size=8, codebook_size=256,
        quantizer_type="lookup-free", entropy_loss_weight=0.0,
    )
    cfg = SamplingConfig(
        num_steps=3, guidance_scale=1.5, mask_token=16, patch_size=8,
        codebook_size=256, codebook_splits=2, mask_schedule_strategy="arccos",
    )
    key = jax.random.key(0)
    gen_vars = BERT.init(key, jnp.zeros((1, 64, 2), jnp.int32), jnp.zeros((1,), jnp.int32))
    tok_vars = tokenizer.init(key, jnp.zeros((1, 64), jnp.int32), method="decode_tokens")
    sampler = make_sampler(BERT, tokenizer, cfg, jit=True)
    images, _ = sampler(gen_vars, tok_vars, key, jnp.asarray([1, 2]))
    assert images.shape == (2, 16, 16, 3)
    assert np.all(np.isfinite(np.asarray(images)))


def test_make_generator_factory():
    vq = {"codebook_size": 16}
    mlm = {"hidden_dim": 32, "depth": 1, "heads": 2, "mlp_dim": 64,
           "codebook_splits": 2, "img_size": 16, "input_stride": 2}

    class D(dict):
        def get(self, k, d=None):
            return super().get(k, d)

    assert isinstance(make_generator("bert", D(mlm), D(vq)), Bert)
    from maskbit_tpu.models.generator import LFQBert

    assert isinstance(make_generator("lfq_bert", D(mlm), D(vq)), LFQBert)
    import pytest

    with pytest.raises(ValueError):
        make_generator("gpt", D(mlm), D(vq))


def test_attention_dropout_override():
    """attention_dropout=0.0 disables ONLY the attention-prob dropout (the
    (b, h, n, n) mask that dominates 512px training residuals): the MHA
    module becomes deterministic even in train mode, while None keeps the
    torch-MHA parity default (attn dropout = dropout)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from maskbit_tpu.nn.transformer import MultiHeadSelfAttention

    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 16, 32)), jnp.float32)

    mha_off = MultiHeadSelfAttention(32, 4, dropout=0.9, attention_dropout=0.0)
    v = mha_off.init(jax.random.key(0), x)
    train = mha_off.apply(v, x, deterministic=False,
                          rngs={"dropout": jax.random.key(1)})
    eval_ = mha_off.apply(v, x, deterministic=True)
    np.testing.assert_array_equal(np.asarray(train), np.asarray(eval_))

    mha_def = MultiHeadSelfAttention(32, 4, dropout=0.9)  # parity default
    train2 = mha_def.apply(v, x, deterministic=False,
                           rngs={"dropout": jax.random.key(1)})
    assert not np.array_equal(np.asarray(train2), np.asarray(eval_))
