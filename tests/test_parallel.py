"""Mesh + parameter-partitioning tests on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from maskbit_tpu.models.generator import LFQBert
from maskbit_tpu.parallel.mesh import (
    MeshConfig,
    batch_sharding,
    create_mesh,
    param_shardings,
    shard_params,
    sharded_byte_fraction as _sharded_fraction,
)

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")


@needs_8
def test_mesh_shapes():
    mesh = create_mesh(MeshConfig(data=-1, fsdp=1, tensor=2))
    assert dict(mesh.shape) == {"data": 4, "fsdp": 1, "tensor": 2}
    mesh2 = create_mesh(MeshConfig(data=2, fsdp=2, tensor=2))
    assert dict(mesh2.shape) == {"data": 2, "fsdp": 2, "tensor": 2}
    with pytest.raises(AssertionError):
        create_mesh(MeshConfig(data=3, fsdp=1, tensor=2))


@needs_8
def test_param_sharding_rules():
    mesh = create_mesh(MeshConfig(data=-1, fsdp=2, tensor=2))
    model = LFQBert(img_size=32, hidden_dim=64, codebook_size=256, codebook_splits=2,
                    depth=1, heads=4, mlp_dim=128, nclass=10, input_stride=4)
    params = model.init(
        jax.random.key(0),
        jnp.zeros((1, 64, 2), jnp.int32), jnp.zeros((1,), jnp.int32),
    )["params"]
    shardings = param_shardings(params, mesh)

    qkv = shardings["transformer"]["layers_0_attn"]["mha"]["qkv"]["kernel"]
    assert qkv.spec == P("fsdp", "tensor")
    out_proj = shardings["transformer"]["layers_0_attn"]["mha"]["out_proj"]["kernel"]
    assert out_proj.spec == P("tensor", "fsdp")
    fc1 = shardings["transformer"]["layers_0_ffn"]["fc1"]["kernel"]
    assert fc1.spec == P("fsdp", "tensor")
    # class_emb has 11 rows (not divisible by fsdp=2): falls back to the
    # feature-dim fsdp rule instead of replicating
    assert shardings["class_emb"]["embedding"].spec == P(None, ("tensor", "fsdp"))

    sharded = shard_params(params, mesh)
    # tensor-parallel leaf is actually split across devices
    leaf = sharded["transformer"]["layers_0_ffn"]["fc1"]["kernel"]
    assert len(leaf.sharding.device_set) == 8
    np.testing.assert_allclose(
        np.asarray(leaf), np.asarray(params["transformer"]["layers_0_ffn"]["fc1"]["kernel"])
    )


@needs_8
def test_fsdp_shards_generator_train_state_bytes():
    """The fsdp axis is a real ZeRO: >=90% of generator param + AdamW moment
    + EMA bytes split across devices under a pure-fsdp mesh (VERDICT r4 #1).
    Flagship-proportioned dims (hidden/mlp/vocab ratios of the 14-bit
    config) so divisibility behaves as it does at scale."""
    import optax

    from maskbit_tpu.parallel.mesh import shard_train_state
    from maskbit_tpu.train.generator_trainer import init_generator_train_state

    model = LFQBert(img_size=64, hidden_dim=256, codebook_size=16384,
                    codebook_splits=2, depth=2, heads=8, mlp_dim=1024,
                    nclass=1000, input_stride=16)
    state = init_generator_train_state(
        model, optax.adamw(1e-4), jax.random.key(0), use_ema=True
    )
    mesh = create_mesh(MeshConfig(data=1, fsdp=8, tensor=1))
    sharded = shard_train_state(state, mesh)

    frac = _sharded_fraction(sharded)
    assert frac >= 0.90, f"only {frac:.1%} of train-state bytes fsdp-sharded"

    # the big per-layer kernels and their optimizer moments are all split
    qkv = sharded.params["transformer"]["layers_0_attn"]["mha"]["qkv"]["kernel"]
    assert qkv.sharding.spec == P("fsdp", "tensor")
    mu = sharded.opt[0].mu["transformer"]["layers_0_ffn"]["fc1"]["kernel"]
    assert "fsdp" in jax.tree.leaves(tuple(mu.sharding.spec))
    ema_leaf = sharded.ema.params["transformer"]["layers_0_ffn"]["fc2"]["kernel"]
    assert ema_leaf.sharding.shard_shape(ema_leaf.shape) != ema_leaf.shape


@needs_8
def test_fsdp_only_forward_matches_replicated():
    """ZeRO sharding is numerics-preserving: fsdp=8 forward == unsharded."""
    model = LFQBert(img_size=32, hidden_dim=64, codebook_size=256, codebook_splits=2,
                    depth=2, heads=4, mlp_dim=128, nclass=10, input_stride=4)
    tokens = jnp.asarray(np.random.default_rng(1).integers(0, 16, (8, 64, 2)))
    labels = jnp.arange(8, dtype=jnp.int32) % 10
    variables = model.init(jax.random.key(0), tokens, labels)

    expected = model.apply(variables, tokens, labels)

    mesh = create_mesh(MeshConfig(data=1, fsdp=8, tensor=1))
    with mesh:
        sharded_params = shard_params(variables["params"], mesh)
        tokens_s = jax.device_put(tokens, batch_sharding(mesh))
        out = jax.jit(lambda p, t, l: model.apply({"params": p}, t, l))(
            sharded_params, tokens_s, labels
        )
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=2e-5, rtol=1e-4)


@needs_8
def test_fsdp_only_donation_and_resume(tmp_path):
    """The remaining ZeRO done-criterion (VERDICT r4 #1): on a PURE-fsdp
    mesh the donated generator train step consumes every old-state buffer
    with stable output shardings, a checkpoint of the sharded state restores
    into the sharded template, and training continues from it."""
    import optax
    import warnings

    from maskbit_tpu.core.checkpoint import CheckpointManager, abstract_sharded
    from maskbit_tpu.losses.mlm import MLMLossConfig
    from maskbit_tpu.models.tokenizer import ConvVQModel
    from maskbit_tpu.parallel.mesh import shard_train_state
    from maskbit_tpu.train.generator_trainer import (
        init_generator_train_state,
        make_generator_train_step,
    )

    model = LFQBert(img_size=32, hidden_dim=64, codebook_size=256,
                    codebook_splits=2, depth=2, heads=4, mlp_dim=128,
                    dropout=0.0, nclass=10, input_stride=4)
    tokenizer = ConvVQModel(
        num_channels=3, hidden_channels=32, channel_mult=(1, 2, 4),
        num_resolutions=3, num_res_blocks=1, token_size=8, codebook_size=256,
        quantizer_type="lookup-free", entropy_loss_weight=0.0,
    )
    tx = optax.adamw(1e-3)
    mesh = create_mesh(MeshConfig(data=1, fsdp=8, tensor=1))
    images = jnp.asarray(
        np.random.default_rng(0).uniform(size=(8, 32, 32, 3)), jnp.float32
    )
    labels = jnp.arange(8, dtype=jnp.int32) % 10

    with mesh:
        tok_vars = tokenizer.init(jax.random.key(1), jnp.zeros((1, 32, 32, 3)))
        state = init_generator_train_state(model, tx, jax.random.key(0),
                                           use_ema=True)
        state = shard_train_state(state, mesh)
        assert _sharded_fraction(state) > 0.5
        state_shardings = jax.tree.map(lambda x: x.sharding, state)
        step_fn = jax.jit(
            make_generator_train_step(model, tokenizer, tx, MLMLossConfig()),
            donate_argnums=0,
            out_shardings=(state_shardings, None),
        )
        images_s = jax.device_put(images, batch_sharding(mesh))

        old_leaves = jax.tree.leaves(state)
        with warnings.catch_warnings():
            warnings.filterwarnings("error", message=".*[Dd]onated buffers.*")
            state, metrics = step_fn(state, tok_vars, images_s, labels,
                                     jax.random.key(2))
            jax.block_until_ready(state)
        assert all(leaf.is_deleted() for leaf in old_leaves), (
            "donation did not take effect on the fsdp-only mesh"
        )
        assert np.isfinite(float(metrics["mlm_loss"]))
        same = jax.tree.map(lambda s, x: s == x.sharding, state_shardings, state)
        assert all(jax.tree.leaves(same)), "output shardings drifted under fsdp"

        # save the sharded state, restore into the sharded template, resume
        ckpt = CheckpointManager(str(tmp_path / "ckpts"))
        ckpt.save(1, state)
        ckpt.wait()
        template = abstract_sharded(state, state_shardings)
        restored, step = ckpt.restore_latest(template)
        assert step == 1
        for r, s in zip(jax.tree.leaves(restored), jax.tree.leaves(state)):
            assert r.sharding == s.sharding
            np.testing.assert_array_equal(np.asarray(r), np.asarray(s))

        restored2, metrics2 = step_fn(restored, tok_vars, images_s, labels,
                                      jax.random.key(3))
        jax.block_until_ready(restored2)
        assert np.isfinite(float(metrics2["mlm_loss"]))


@needs_8
def test_batch_sharding_spans_data_and_fsdp():
    mesh = create_mesh(MeshConfig(data=-1, fsdp=2, tensor=1))
    x = jnp.zeros((8, 4))
    sharded = jax.device_put(x, batch_sharding(mesh))
    assert len(sharded.sharding.device_set) == 8


@needs_8
def test_sharded_forward_matches_replicated():
    """GSPMD correctness: tensor-parallel forward == replicated forward."""
    model = LFQBert(img_size=32, hidden_dim=64, codebook_size=256, codebook_splits=2,
                    depth=2, heads=4, mlp_dim=128, nclass=10, input_stride=4)
    tokens = jnp.asarray(np.random.default_rng(0).integers(0, 16, (4, 64, 2)))
    labels = jnp.zeros((4,), jnp.int32)
    variables = model.init(jax.random.key(0), tokens, labels)

    expected = model.apply(variables, tokens, labels)

    mesh = create_mesh(MeshConfig(data=-1, fsdp=1, tensor=2))
    with mesh:
        sharded_params = shard_params(variables["params"], mesh)
        tokens_s = jax.device_put(tokens, batch_sharding(mesh))
        out = jax.jit(lambda p, t, l: model.apply({"params": p}, t, l))(
            sharded_params, tokens_s, labels
        )
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=2e-5, rtol=1e-4)


@needs_8
def test_sharded_sampler_matches_single_device():
    """Data-sharded pod sampling must produce the same tokens/images as the
    single-program sampler (same key, replicated weights)."""
    from maskbit_tpu.models.tokenizer import ConvVQModel
    from maskbit_tpu.sampling.sample import SamplingConfig, make_sampler
    from maskbit_tpu.sampling.serve import make_sharded_sampler

    tokenizer = ConvVQModel(
        num_channels=3, hidden_channels=32, channel_mult=(1, 2), num_resolutions=2,
        num_res_blocks=1, token_size=8, codebook_size=256,
        quantizer_type="lookup-free", entropy_loss_weight=0.0,
    )
    generator = LFQBert(
        img_size=8, hidden_dim=32, codebook_size=256, codebook_splits=2,
        depth=1, heads=2, mlp_dim=64, dropout=0.0, nclass=10, input_stride=2,
    )
    cfg = SamplingConfig(
        num_steps=3, guidance_scale=1.5, mask_token=16, patch_size=4,
        codebook_size=256, codebook_splits=2, mask_schedule_strategy="arccos",
    )
    key = jax.random.key(0)
    tok_vars = tokenizer.init(key, jnp.zeros((1, 16), jnp.int32), method="decode_tokens")
    gen_vars = generator.init(key, jnp.zeros((1, 16, 2), jnp.int32), jnp.zeros((1,), jnp.int32))
    labels = jnp.arange(8, dtype=jnp.int32) % 10

    plain = make_sampler(generator, tokenizer, cfg, jit=True)
    expected, _ = plain(gen_vars, tok_vars, key, labels)

    mesh = create_mesh(MeshConfig(data=8))
    with mesh:
        sharded = make_sharded_sampler(generator, tokenizer, cfg, mesh)
        got = sharded(gen_vars, tok_vars, key, labels)
    assert len(got.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-4, rtol=1e-4)


def test_multislice_hybrid_device_array():
    """Multi-slice pods: _device_array places the outermost DATA axis across
    slices (DCN) and keeps the fsdp/tensor plane inside one slice (ICI) —
    the layout that keeps model-axis collectives off the data-center
    network. Exercised with fake 2-slice devices (no multislice hardware
    here); single-slice behavior is covered by every other mesh test."""
    from types import SimpleNamespace

    from maskbit_tpu.parallel.mesh import _device_array

    devs = [
        SimpleNamespace(id=i, slice_index=i // 4, process_index=i // 4,
                        platform="tpu", device_kind="fake v5e",
                        coords=(i % 2, (i // 2) % 2, 0), core_on_chip=0)
        for i in range(8)
    ]
    arr = _device_array((2, 2, 2), devs)
    assert arr.shape == (2, 2, 2)
    # each outer (data) index is one whole slice; model axes never cross
    for i in range(2):
        slices = {d.slice_index for d in arr[i].flatten()}
        assert len(slices) == 1, f"model axes span slices: {slices}"
    assert {d.id for d in arr.flatten()} == set(range(8))


def test_multislice_indivisible_data_falls_back():
    """data axis not divisible by the slice count: fall back to the
    single-granule path (here: enumeration order, since fake devices fail
    mesh_utils) rather than asserting."""
    from types import SimpleNamespace

    from maskbit_tpu.parallel.mesh import _device_array

    devs = [
        SimpleNamespace(id=i, slice_index=i // 4, process_index=i // 4,
                        platform="tpu", device_kind="fake v5e",
                        coords=(i % 2, (i // 2) % 2, 0), core_on_chip=0)
        for i in range(8)
    ]
    arr = _device_array((1, 4, 2), devs)  # data=1 % 2 slices != 0
    assert arr.shape == (1, 4, 2)
    assert {d.id for d in arr.flatten()} == set(range(8))


@needs_8
def test_constrain_batch_trace_only_and_divisibility():
    """constrain_batch (the Stage-I decoder remat fix) must be: identity in
    eager mode even on-mesh (main-only viz decodes run eagerly inside `with
    mesh:` — an eager reshard onto a cross-process mesh would crash), a real
    batch constraint inside jit, and skipped when the batch doesn't divide
    the (data, fsdp) plane."""
    from maskbit_tpu.parallel.mesh import constrain_batch

    x = jnp.arange(16.0).reshape(4, 2, 2, 1)
    assert constrain_batch(x) is x  # no ambient mesh
    mesh = create_mesh(MeshConfig(data=2, fsdp=2, tensor=2))
    with mesh:
        assert constrain_batch(x) is x  # eager: identity even on-mesh
        out = jax.jit(constrain_batch)(jax.device_put(x, batch_sharding(mesh)))
        assert out.sharding.shard_shape(out.shape)[0] == 1  # 4/(data*fsdp)
        odd = jnp.zeros((3, 2, 2, 1))
        out_odd = jax.jit(constrain_batch)(odd)
        # 3 doesn't divide the 4-way (data, fsdp) plane: no constraint
        assert out_odd.sharding.shard_shape(out_odd.shape) == out_odd.shape
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


@needs_8
def test_decoder_on_mesh_matches_off_mesh():
    """The decoder's stage-boundary sharding constraints (constrain_batch)
    must not change numerics: fsdp+tensor-sharded decode == plain decode."""
    from maskbit_tpu.models.tokenizer import ConvVQModel

    model = ConvVQModel(
        num_channels=3, hidden_channels=32, channel_mult=(1, 2),
        num_resolutions=2, num_res_blocks=1, token_size=4, codebook_size=16,
        quantizer_type="lookup-free", entropy_loss_weight=0.0,
    )
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0.0, 1.0, (4, 16, 16, 3)), jnp.float32)
    variables = model.init(jax.random.key(0), images)
    expected, _ = model.apply(variables, images)

    mesh = create_mesh(MeshConfig(data=2, fsdp=2, tensor=2))
    with mesh:
        params_s = shard_params(variables["params"], mesh)
        images_s = jax.device_put(images, batch_sharding(mesh))
        out, _ = jax.jit(lambda p, x: model.apply({"params": p}, x))(params_s, images_s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               atol=2e-5, rtol=1e-4)
