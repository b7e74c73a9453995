"""Train-step tests: overfit convergence, disc gating, EMA, multi-device DP."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from maskbit_tpu.losses.mlm import MLMLossConfig
from maskbit_tpu.losses.vqgan import VQGANLossConfig
from maskbit_tpu.models.generator import LFQBert
from maskbit_tpu.models.tokenizer import ConvVQModel
from maskbit_tpu.nn.discriminator import NLayerDiscriminatorv2
from maskbit_tpu.parallel.mesh import MeshConfig, batch_sharding, create_mesh
from maskbit_tpu.train.generator_trainer import (
    init_generator_train_state,
    make_generator_train_step,
)
from maskbit_tpu.train.tokenizer_trainer import (
    init_tokenizer_train_state,
    make_optimizer,
    make_tokenizer_train_step,
)

TOKENIZER = ConvVQModel(
    num_channels=3, hidden_channels=32, channel_mult=(1, 2), num_resolutions=2,
    num_res_blocks=1, token_size=4, codebook_size=16, quantizer_type="lookup-free",
    entropy_loss_weight=0.01,
)
DISC = NLayerDiscriminatorv2(num_channels=3, hidden_channels=32, num_stages=1)
IMG = (4, 32, 32, 3)


def build_tokenizer_setup(disc_start=0, use_adaptive=True, donate=False):
    loss_cfg = VQGANLossConfig(
        reconstruction_loss="l2", reconstruction_weight=1.0, quantizer_weight=1.0,
        perceptual_loss="none", perceptual_weight=0.0,
        discriminator_loss="hinge", discriminator_factor=1.0,
        discriminator_weight=0.1, discriminator_start=disc_start,
        discriminator_gradient_penalty="adopt_weight" if use_adaptive else "none",
        lecam_regularization_weight=0.001,
    )
    gen_tx = make_optimizer(1e-3, max_grad_norm=1.0)
    disc_tx = make_optimizer(1e-3, max_grad_norm=1.0)
    state = init_tokenizer_train_state(
        TOKENIZER, DISC, gen_tx, disc_tx, jax.random.key(0), IMG, use_ema=True
    )
    step_fn = jax.jit(
        make_tokenizer_train_step(TOKENIZER, DISC, gen_tx, disc_tx, loss_cfg),
        donate_argnums=(0,) if donate else (),
    )
    return state, step_fn


def test_tokenizer_overfit_one_batch():
    state, step_fn = build_tokenizer_setup(disc_start=10_000)
    images = jnp.asarray(np.random.default_rng(0).uniform(size=IMG), jnp.float32)
    losses = []
    for i in range(30):
        state, metrics = step_fn(state, images, None, jax.random.key(i))
        losses.append(float(metrics["reconstruction_loss"]))
    assert losses[-1] < losses[0] * 0.9, f"no convergence: {losses[0]} -> {losses[-1]}"
    assert int(state.step) == 30


def test_discriminator_gating():
    state, step_fn = build_tokenizer_setup(disc_start=3)
    images = jnp.asarray(np.random.default_rng(1).uniform(size=IMG), jnp.float32)
    disc_params_0 = jax.tree.map(np.asarray, state.disc_params)

    for i in range(2):
        state, metrics = step_fn(state, images, None, jax.random.key(i))
        # before start: no disc update, zero gan metrics
        assert float(metrics["discriminator_factor"]) == 0.0
        assert float(metrics["discriminator_loss"]) == 0.0
    unchanged = jax.tree.map(
        lambda a, b: np.array_equal(a, np.asarray(b)), disc_params_0, state.disc_params
    )
    assert all(jax.tree.leaves(unchanged))

    for i in range(3):
        state, metrics = step_fn(state, images, None, jax.random.key(10 + i))
    assert float(metrics["discriminator_factor"]) == 1.0
    changed = jax.tree.map(
        lambda a, b: not np.array_equal(a, np.asarray(b)), disc_params_0, state.disc_params
    )
    assert any(jax.tree.leaves(changed))
    # lecam EMA moved away from zero once the disc started training
    assert float(jnp.abs(state.lecam.ema_real_logits_mean)) > 0.0


def test_ema_tracks_params():
    state, step_fn = build_tokenizer_setup(disc_start=10_000)
    images = jnp.asarray(np.random.default_rng(2).uniform(size=IMG), jnp.float32)
    for i in range(3):
        state, _ = step_fn(state, images, None, jax.random.key(i))
    # EMA step counter advanced with the optimizer
    assert int(state.ema.step) == 3


def test_generator_overfit_one_batch():
    # tokenizer downsamples 2x (num_resolutions=2) -> input_stride must be 2
    gen_img = (4, 16, 16, 3)
    model = LFQBert(
        img_size=16, hidden_dim=32, codebook_size=16, codebook_splits=2,
        depth=1, heads=2, mlp_dim=64, dropout=0.0, nclass=10, input_stride=2,
    )
    tx = make_optimizer(3e-3, max_grad_norm=1.0)
    state = init_generator_train_state(model, tx, jax.random.key(0))
    tok_vars = TOKENIZER.init(jax.random.key(1), jnp.zeros(gen_img))
    step_fn = jax.jit(
        make_generator_train_step(
            model, TOKENIZER, tx, MLMLossConfig(label_smoothing=0.1),
            class_label_dropout=0.1,
        )
    )
    images = jnp.asarray(np.random.default_rng(3).uniform(size=gen_img), jnp.float32)
    labels = jnp.asarray([0, 1, 2, 3])
    losses = []
    for i in range(30):
        state, metrics = step_fn(state, tok_vars, images, labels, jax.random.key(i))
        losses.append(float(metrics["mlm_loss"]))
    assert losses[-1] < losses[0], f"no convergence: {losses[0]} -> {losses[-1]}"
    assert int(state.ema.step) == 30


def test_tokenizer_train_step_multidevice():
    """DP over the 8 virtual CPU devices: batch sharded on the data axis."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = create_mesh(MeshConfig(data=8))
    state, step_fn = build_tokenizer_setup(disc_start=0, use_adaptive=False)
    images = np.random.default_rng(4).uniform(size=(8, 32, 32, 3)).astype(np.float32)
    sharded = jax.device_put(jnp.asarray(images), batch_sharding(mesh))
    state, metrics = step_fn(state, sharded, None, jax.random.key(0))
    assert np.isfinite(float(metrics["total_loss"]))
    state, metrics = step_fn(state, sharded, None, jax.random.key(1))
    assert np.isfinite(float(metrics["total_loss"]))


def test_gradient_accumulation_updates_every_k_steps():
    """With gradient_accumulation_steps=2, parameters change only on every
    second call (optax.MultiSteps semantics, reference accelerate.accumulate)."""
    from maskbit_tpu.losses.mlm import MLMLossConfig

    model = LFQBert(
        img_size=16, hidden_dim=32, codebook_size=16, codebook_splits=2,
        depth=1, heads=2, mlp_dim=64, dropout=0.0, nclass=10, input_stride=2,
    )
    tx = make_optimizer(1e-3, gradient_accumulation_steps=2)
    from maskbit_tpu.train.generator_trainer import (
        make_generator_train_step_from_tokens,
    )

    state = init_generator_train_state(model, tx, jax.random.key(0), use_ema=False)
    step_fn = jax.jit(
        make_generator_train_step_from_tokens(model, 16, tx, MLMLossConfig())
    )
    tokens = jnp.asarray(np.random.default_rng(0).integers(0, 16, (2, 64)), jnp.int32)
    labels = jnp.asarray([0, 1])

    p0 = jax.tree.map(np.asarray, state.params)
    state, _ = step_fn(state, tokens, labels, jax.random.key(1))
    unchanged = jax.tree.map(lambda a, b: np.array_equal(a, np.asarray(b)), p0, state.params)
    assert all(jax.tree.leaves(unchanged)), "params must not change on the 1st microstep"

    state, _ = step_fn(state, tokens, labels, jax.random.key(2))
    changed = jax.tree.map(lambda a, b: not np.array_equal(a, np.asarray(b)), p0, state.params)
    assert any(jax.tree.leaves(changed)), "params must update after k microsteps"


def _assert_state_trees_equal(a, b):
    same = jax.tree.map(
        lambda x, y: np.array_equal(np.asarray(x), np.asarray(y)), a, b
    )
    assert all(jax.tree.leaves(same)), "donated step diverged from reference"


def test_tokenizer_step_buffer_donation():
    """donate_argnums=0 (how the CLIs jit the step): every old-state buffer
    is actually consumed — no 'donated buffers were not usable' warning, all
    input leaves deleted — and the numerics are bit-identical to the
    non-donated step (no aliasing miscompilation). This is what keeps a step
    from holding old+new params+opt+EMA simultaneously (ROADMAP #0)."""
    import warnings

    images = jnp.asarray(np.random.default_rng(5).uniform(size=IMG), jnp.float32)
    state_ref, step_ref = build_tokenizer_setup(disc_start=0)
    ref_state, _ = step_ref(state_ref, images, None, jax.random.key(0))

    state, step_don = build_tokenizer_setup(disc_start=0, donate=True)
    old_leaves = jax.tree.leaves(state)
    with warnings.catch_warnings():
        warnings.filterwarnings(
            "error", message=".*[Dd]onated buffers.*"
        )
        new_state, _ = step_don(state, images, None, jax.random.key(0))
        jax.block_until_ready(new_state)
    assert all(leaf.is_deleted() for leaf in old_leaves), (
        "donation did not take effect: old state buffers still live"
    )
    _assert_state_trees_equal(ref_state, new_state)


def test_tokenizer_step_buffer_donation_sharded():
    """Donation composes with the multi-axis mesh: a state placed by
    shard_train_state and jit'd with pinned out_shardings (the CLI recipe)
    is FULLY consumed by the donated step, and the output shardings match
    the input's (no sharding drift -> no step-2 recompile). Without the
    out_shardings pin GSPMD re-shards ~10% of the state and those leaves
    silently escape donation."""
    import warnings

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from maskbit_tpu.losses.vqgan import VQGANLossConfig
    from maskbit_tpu.parallel.mesh import shard_train_state

    loss_cfg = VQGANLossConfig(
        reconstruction_loss="l2", reconstruction_weight=1.0, quantizer_weight=1.0,
        perceptual_loss="none", perceptual_weight=0.0,
        discriminator_loss="hinge", discriminator_factor=1.0,
        discriminator_weight=0.1, discriminator_start=0,
        discriminator_gradient_penalty="adopt_weight",
        lecam_regularization_weight=0.001,
    )
    gen_tx = make_optimizer(1e-3, max_grad_norm=1.0)
    disc_tx = make_optimizer(1e-3, max_grad_norm=1.0)
    mesh = create_mesh(MeshConfig(data=2, fsdp=2, tensor=2))
    with mesh:
        state = init_tokenizer_train_state(
            TOKENIZER, DISC, gen_tx, disc_tx, jax.random.key(0), IMG, use_ema=True
        )
        state = shard_train_state(state, mesh)
        state_shardings = jax.tree.map(lambda x: x.sharding, state)
        step_don = jax.jit(
            make_tokenizer_train_step(TOKENIZER, DISC, gen_tx, disc_tx, loss_cfg),
            donate_argnums=0,
            out_shardings=(state_shardings, None),
        )
        images = jax.device_put(
            jnp.asarray(np.random.default_rng(6).uniform(size=(8, 32, 32, 3)),
                        jnp.float32),
            batch_sharding(mesh),
        )
        old_leaves = jax.tree.leaves(state)
        with warnings.catch_warnings():
            warnings.filterwarnings("error", message=".*[Dd]onated buffers.*")
            new_state, metrics = step_don(state, images, None, jax.random.key(0))
            jax.block_until_ready(new_state)
        assert all(leaf.is_deleted() for leaf in old_leaves)
        assert np.isfinite(float(metrics["total_loss"]))
        same_sharding = jax.tree.map(
            lambda s, x: s == x.sharding, state_shardings, new_state
        )
        assert all(jax.tree.leaves(same_sharding)), "output shardings drifted"


def test_generator_step_buffer_donation():
    """Same contract for the Stage-II step (cli/train_maskbit jit)."""
    import warnings

    model = LFQBert(
        img_size=16, hidden_dim=32, codebook_size=16, codebook_splits=2,
        depth=1, heads=2, mlp_dim=64, dropout=0.0, nclass=10, input_stride=2,
    )
    tx = make_optimizer(1e-3, max_grad_norm=1.0)
    tok_vars = TOKENIZER.init(jax.random.key(1), jnp.zeros((1, 16, 16, 3)))
    images = jnp.asarray(
        np.random.default_rng(7).uniform(size=(4, 16, 16, 3)), jnp.float32
    )
    labels = jnp.asarray([0, 1, 2, 3])

    def run(donate):
        state = init_generator_train_state(model, tx, jax.random.key(0))
        step_fn = jax.jit(
            make_generator_train_step(model, TOKENIZER, tx, MLMLossConfig()),
            donate_argnums=(0,) if donate else (),
        )
        old_leaves = jax.tree.leaves(state)
        with warnings.catch_warnings():
            warnings.filterwarnings("error", message=".*[Dd]onated buffers.*")
            new_state, _ = step_fn(state, tok_vars, images, labels, jax.random.key(2))
            jax.block_until_ready(new_state)
        return new_state, old_leaves

    ref_state, _ = run(donate=False)
    new_state, old_leaves = run(donate=True)
    assert all(leaf.is_deleted() for leaf in old_leaves)
    _assert_state_trees_equal(ref_state, new_state)


def test_original_batchnorm_discriminator_trains():
    """The Pix2Pix (BatchNorm) discriminator through the REAL train step:
    round-3 review found it crashed with ScopeCollectionNotFound because
    init dropped the batch_stats collection — the step now applies it in
    torch-train()-equivalent batch-stats mode (lazily created, discarded).
    Covers the gen pass, the adaptive-weight vjp, and the separate
    real/fake disc passes (BatchNorm must NOT take the concat fast path)."""
    from maskbit_tpu.nn.discriminator import OriginalNLayerDiscriminator

    disc = OriginalNLayerDiscriminator(num_channels=3, hidden_channels=16, num_stages=2)
    loss_cfg = VQGANLossConfig(
        reconstruction_loss="l2", reconstruction_weight=1.0, quantizer_weight=1.0,
        perceptual_loss="none", perceptual_weight=0.0,
        discriminator_loss="hinge", discriminator_factor=1.0,
        discriminator_weight=0.1, discriminator_start=0,
        discriminator_gradient_penalty="adopt_weight",
        lecam_regularization_weight=0.001,
    )
    gen_tx = make_optimizer(1e-3, max_grad_norm=1.0)
    disc_tx = make_optimizer(1e-3, max_grad_norm=1.0)
    state = init_tokenizer_train_state(
        TOKENIZER, disc, gen_tx, disc_tx, jax.random.key(0), IMG, use_ema=True
    )
    step_fn = jax.jit(
        make_tokenizer_train_step(TOKENIZER, disc, gen_tx, disc_tx, loss_cfg)
    )
    images = jnp.asarray(np.random.default_rng(8).uniform(size=IMG), jnp.float32)
    disc_params_0 = jax.tree.map(np.asarray, state.disc_params)
    for i in range(2):
        state, metrics = step_fn(state, images, None, jax.random.key(i))
    assert np.isfinite(float(metrics["total_loss"]))
    assert np.isfinite(float(metrics["discriminator_loss"]))
    assert np.isfinite(float(metrics["d_weight"]))
    changed = jax.tree.map(
        lambda a, b: not np.array_equal(a, np.asarray(b)),
        disc_params_0, state.disc_params,
    )
    assert any(jax.tree.leaves(changed)), "BatchNorm discriminator must train"


def test_generator_remat_matches_nonremat():
    """model.mlm_model.remat=true (per-layer jax.checkpoint) must not change
    the training numerics: with counter-based threefry keys the dropout
    masks recompute bit-exactly in the backward pass, so the remat and
    plain steps produce the same updated params. (With rbg keys the bits
    are not recomputable — XLA saves the masks instead, which is why the
    round-2 remat measurement freed almost nothing at 512px.)"""
    from maskbit_tpu.train.generator_trainer import (
        make_generator_train_step_from_tokens,
    )

    tokens = jnp.asarray(np.random.default_rng(0).integers(0, 16, (4, 64)), jnp.int32)
    labels = jnp.asarray([0, 1, 2, 3])
    rng_step = jax.random.key(2)  # threefry

    def run(remat):
        model = LFQBert(
            img_size=16, hidden_dim=32, codebook_size=16, codebook_splits=2,
            depth=2, heads=2, mlp_dim=64, dropout=0.3, nclass=10,
            input_stride=2, remat=remat,
        )
        tx = make_optimizer(1e-3, max_grad_norm=1.0)
        state = init_generator_train_state(model, tx, jax.random.key(0))
        step_fn = jax.jit(
            make_generator_train_step_from_tokens(model, 16, tx, MLMLossConfig())
        )
        new_state, metrics = step_fn(state, tokens, labels, rng_step)
        return jax.device_get(new_state.params), float(metrics["mlm_loss"])

    params_plain, loss_plain = run(remat=False)
    params_remat, loss_remat = run(remat=True)
    assert abs(loss_plain - loss_remat) < 1e-6
    same = jax.tree.map(
        lambda a, b: np.allclose(a, b, atol=1e-6), params_plain, params_remat
    )
    assert all(jax.tree.leaves(same))


def test_v2_discriminator_concat_pass_identity(rng):
    """The batched real+fake discriminator pass (train/tokenizer_trainer.py)
    relies on GroupNorm being per-sample: D(concat(a, b)) == concat(D(a),
    D(b)) exactly for NLayerDiscriminatorv2."""
    import jax
    import jax.numpy as jnp

    from maskbit_tpu.nn.discriminator import NLayerDiscriminatorv2

    disc = NLayerDiscriminatorv2(num_stages=2, hidden_channels=32, blur_resample=True)
    a = jnp.asarray(rng.uniform(size=(3, 64, 64, 3)).astype(np.float32))
    b = jnp.asarray(rng.uniform(size=(3, 64, 64, 3)).astype(np.float32))
    variables = disc.init(jax.random.key(0), a)
    both = disc.apply(variables, jnp.concatenate([a, b], axis=0))
    sep = jnp.concatenate([disc.apply(variables, a), disc.apply(variables, b)], axis=0)
    np.testing.assert_array_equal(np.asarray(both), np.asarray(sep))
