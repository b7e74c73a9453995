"""Pallas fused attention vs einsum reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maskbit_tpu.nn.pallas_attention import fused_attention


def ref_attention(q, k, v):
    d = q.shape[-1]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (d**-0.5)
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", w, v)


@pytest.mark.parametrize("n", [64, 257])
def test_fused_attention_matches_einsum(rng, n):
    b, h, d = 2, 4, 64
    q = jnp.asarray(rng.normal(size=(b, n, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, n, h, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, n, h, d)), jnp.float32)
    out = fused_attention(q, k, v, interpret=True)
    expected = ref_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=2e-5, rtol=1e-4)


def test_fused_attention_padding_masked(rng):
    """Padded keys must not leak into the softmax: growing n with zero-pads
    differs from true padding handling — verify vs exact reference at n=257
    (non-multiple of the sublane tile)."""
    b, n, h, d = 1, 257, 2, 64
    q = jnp.asarray(rng.normal(size=(b, n, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, n, h, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, n, h, d)) + 3.0, jnp.float32)  # bias detects leaks
    out = fused_attention(q, k, v, interpret=True)
    expected = ref_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=2e-5, rtol=1e-4)


def test_fused_attention_block_matches_einsum_path(rng):
    """BertAttention attention_impl='fused' must match the einsum path
    (postnorm, deterministic) with identical params."""
    from maskbit_tpu.nn.transformer import BertAttention

    b, n, e, h = 2, 33, 64, 4
    x = jnp.asarray(rng.normal(size=(b, n, e)), jnp.float32)
    ref_mod = BertAttention(e, h, dropout=0.0, use_prenorm=False, attention_impl="einsum")
    variables = ref_mod.init(jax.random.key(0), x)
    expected = ref_mod.apply(variables, x)

    fused_mod = BertAttention(e, h, dropout=0.0, use_prenorm=False, attention_impl="fused")
    got = fused_mod.apply(variables, x)  # interpret mode on CPU
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=3e-5, rtol=1e-4)


def ref_dropout_attention(q, k, v, mask, rate):
    """Pure-JAX replica of the dropout-attention kernel math: softmax f32,
    keep-mask with 1/(1-p) scaling, value mix in input dtype."""
    d = q.shape[-1]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (d**-0.5)
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    if mask is not None:
        w = jnp.where(mask, w / (1.0 - rate), 0.0)
    return jnp.einsum("bhqk,bkhd->bqhd", w.astype(q.dtype), v)


def _seeds(b, h, base):
    """Deterministic distinct per-(batch, head) seeds for tests."""
    return jnp.asarray(
        np.arange(b * h, dtype=np.int64).reshape(b, h) * 7919 + base, jnp.int32
    )


def _hash_mask(seeds, n, rate):
    from maskbit_tpu.nn.pallas_attention import _round_up, hash_keep_mask_np

    b, h = seeds.shape
    n_pad = _round_up(n, 8)
    mask = np.zeros((b, h, n, n), bool)
    for bi in range(b):
        for hi in range(h):
            mask[bi, hi] = hash_keep_mask_np(
                n_pad, rate, int(seeds[bi, hi]))[:n, :n]
    return jnp.asarray(mask)


def test_dropout_attention_rate0_matches_plain(rng):
    from maskbit_tpu.nn.pallas_attention import dropout_attention

    b, n, h, d = 2, 33, 2, 64
    q, k, v = (jnp.asarray(rng.normal(size=(b, n, h, d)), jnp.float32) for _ in range(3))
    out = dropout_attention(q, k, v, _seeds(b, h, 5), 0.0, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref_attention(q, k, v)), atol=2e-5, rtol=1e-4
    )


@pytest.mark.parametrize("n", [33, 257])
def test_dropout_attention_fwd_and_grads_match_replica(rng, n):
    """Forward AND the custom VJP (dq/dk/dv) must match autodiff through a
    pure-JAX replica using the identical keep-mask (the interpret-mode mask
    is a deterministic hash replicated in numpy — hash_keep_mask_np)."""
    from maskbit_tpu.nn.pallas_attention import dropout_attention

    b, h, d, rate = 2, 2, 64, 0.4
    q, k, v = (jnp.asarray(rng.normal(size=(b, n, h, d)), jnp.float32) for _ in range(3))
    seeds = _seeds(b, h, 123)
    mask = _hash_mask(seeds, n, rate)

    out = dropout_attention(q, k, v, seeds, rate, interpret=True)
    expected = ref_dropout_attention(q, k, v, mask, rate)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=2e-5, rtol=1e-4)

    w0 = jnp.asarray(rng.normal(size=out.shape), jnp.float32)
    f_kernel = lambda q, k, v: jnp.sum(
        dropout_attention(q, k, v, seeds, rate, interpret=True) * w0)
    f_ref = lambda q, k, v: jnp.sum(ref_dropout_attention(q, k, v, mask, rate) * w0)
    got = jax.grad(f_kernel, argnums=(0, 1, 2))(q, k, v)
    exp = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for g, e in zip(got, exp):
        np.testing.assert_allclose(np.asarray(g), np.asarray(e), atol=5e-5, rtol=1e-4)


def test_dropout_attention_mask_statistics(rng):
    """Keep fraction of the mask ~ (1 - rate), and different seeds give
    different masks (the per-layer draw decorrelates layers)."""
    from maskbit_tpu.nn.pallas_attention import dropout_attention

    b, n, h, d, rate = 2, 64, 2, 64, 0.3
    q, k, v = (jnp.asarray(rng.normal(size=(b, n, h, d)), jnp.float32) for _ in range(3))
    mask = np.asarray(_hash_mask(_seeds(b, h, 11), n, rate))
    assert abs(mask.mean() - (1 - rate)) < 0.05
    o1 = dropout_attention(q, k, v, _seeds(b, h, 11), rate, interpret=True)
    o2 = dropout_attention(q, k, v, _seeds(b, h, 11), rate, interpret=True)
    o3 = dropout_attention(q, k, v, _seeds(b, h, 12), rate, interpret=True)
    assert bool(jnp.all(o1 == o2))       # same seeds -> same masks
    assert bool(jnp.any(o1 != o3))       # different seeds -> different masks


def test_dropout_attention_group_invariant(rng, monkeypatch):
    """The head-group schedule (G heads per program) is a pure performance
    knob: the MASK is bit-identical for every G (hash of (row, col, seed)
    only — checked via zero logits, where the output is a pure function of
    the mask), and values/grads agree to matmul-accumulation ulps (the
    schedule may reorder reductions, like any XLA re-tiling)."""
    from maskbit_tpu.nn.pallas_attention import dropout_attention

    b, n, h, d, rate = 2, 33, 4, 32, 0.3
    q, k, v = (jnp.asarray(rng.normal(size=(b, n, h, d)), jnp.float32) for _ in range(3))
    zq = jnp.zeros_like(q)
    seeds = _seeds(b, h, 7)

    def run(g):
        monkeypatch.setenv("MASKBIT_DROPATTN_GROUP", str(g))
        masked = dropout_attention(zq, zq, v, seeds, rate, interpret=True)
        out = dropout_attention(q, k, v, seeds, rate, interpret=True)
        grads = jax.grad(
            lambda q, k, v: jnp.sum(
                dropout_attention(q, k, v, seeds, rate, interpret=True) ** 2),
            argnums=(0, 1, 2))(q, k, v)
        return masked, out, grads

    base_masked, base_out, base_grads = run(1)
    for g in (2, 4, 8):
        masked, out, grads = run(g)
        # one flipped mask bit would move a zero-logit element by
        # (1/n)/(1-p)*|v| ~ 4e-2 >> the 1e-5 accumulation tolerance
        np.testing.assert_allclose(np.asarray(masked), np.asarray(base_masked),
                                   atol=1e-5, err_msg=f"group={g} mask differs")
        np.testing.assert_allclose(np.asarray(out), np.asarray(base_out),
                                   atol=1e-5, rtol=1e-5)
        for a, e in zip(grads, base_grads):
            np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                       atol=1e-4, rtol=1e-4)


def test_dropout_attention_mesh_invariant(rng):
    """Under `with mesh:` the kernel self-partitions via shard_map
    (batch over data x fsdp, heads over tensor). The mask hash has no
    positional dependence beyond (row, col, seed), so the sharded MASKS
    are bit-identical to the unsharded ones (checked via zero logits) and
    values/grads agree to matmul-accumulation ulps (sharding changes the
    local head-group schedule, which may reorder reductions). This is the
    property that keeps dropout independent across data-parallel shards
    (seeds are a global-shaped draw) and masks reproducible across mesh
    shapes."""
    from jax.sharding import Mesh
    from maskbit_tpu.nn.pallas_attention import dropout_attention

    b, n, h, d, rate = 4, 33, 4, 32, 0.3
    q, k, v = (jnp.asarray(rng.normal(size=(b, n, h, d)), jnp.float32) for _ in range(3))
    zq = jnp.zeros_like(q)
    seeds = _seeds(b, h, 42)

    def loss(q, k, v):
        return jnp.sum(dropout_attention(q, k, v, seeds, rate, interpret=True) ** 2)

    plain_masked = dropout_attention(zq, zq, v, seeds, rate, interpret=True)
    plain_out = dropout_attention(q, k, v, seeds, rate, interpret=True)
    plain_grads = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    devs = np.asarray(jax.devices()[:8]).reshape(2, 2, 2)
    with Mesh(devs, ("data", "fsdp", "tensor")):
        # the wrap must actually engage (value equality alone can't tell)
        jaxpr = str(jax.make_jaxpr(
            lambda q, k, v: dropout_attention(q, k, v, seeds, rate, interpret=True)
        )(q, k, v))
        assert "shard_map" in jaxpr
        mesh_masked = dropout_attention(zq, zq, v, seeds, rate, interpret=True)
        mesh_out = dropout_attention(q, k, v, seeds, rate, interpret=True)
        mesh_grads = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    # zero-logit output is a pure function of the mask: one flipped bit
    # moves an element by ~(1/n)/(1-p)*|v| ~ 4e-2 >> 1e-5
    np.testing.assert_allclose(np.asarray(mesh_masked), np.asarray(plain_masked),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(mesh_out), np.asarray(plain_out),
                               atol=1e-5, rtol=1e-5)
    for g, e in zip(mesh_grads, plain_grads):
        np.testing.assert_allclose(np.asarray(g), np.asarray(e),
                                   atol=1e-4, rtol=1e-4)


def test_fused_attention_block_mesh_matches_plain(rng):
    """The inference fused block self-partitions over the batch axes under
    `with mesh:` — same numbers as the unsharded call."""
    from jax.sharding import Mesh
    from maskbit_tpu.nn.transformer import BertAttention

    b, n, e, h = 8, 33, 64, 4
    x = jnp.asarray(rng.normal(size=(b, n, e)) * 0.1, jnp.float32)
    mod = BertAttention(e, h, dropout=0.0, use_prenorm=False, attention_impl="fused")
    variables = mod.init(jax.random.key(0), x)
    plain = mod.apply(variables, x)
    devs = np.asarray(jax.devices()[:8]).reshape(4, 2, 1)
    with Mesh(devs, ("data", "fsdp", "tensor")):
        meshed = mod.apply(variables, x)
    np.testing.assert_allclose(np.asarray(meshed), np.asarray(plain), atol=1e-6, rtol=1e-6)


def test_mha_fused_dropout_path(rng):
    """MultiHeadSelfAttention(fused_dropout=True) in training mode runs the
    kernel (interpret on CPU), stays finite, differs from the deterministic
    output, and the deterministic path is unchanged by the flag."""
    from maskbit_tpu.nn.transformer import MultiHeadSelfAttention

    b, n, e, h = 2, 33, 64, 4
    x = jnp.asarray(rng.normal(size=(b, n, e)), jnp.float32)
    ref = MultiHeadSelfAttention(e, h, dropout=0.2)
    fused = MultiHeadSelfAttention(e, h, dropout=0.2, fused_dropout=True)
    variables = ref.init(jax.random.key(0), x)

    det_ref = ref.apply(variables, x, True)
    det_fused = fused.apply(variables, x, True)
    np.testing.assert_allclose(np.asarray(det_fused), np.asarray(det_ref), rtol=1e-6)

    out = fused.apply(variables, x, False, rngs={"dropout": jax.random.key(1)})
    assert bool(jnp.all(jnp.isfinite(out)))
    assert bool(jnp.any(jnp.abs(out - det_ref) > 1e-4))
    # same rng -> identical; different rng -> different mask
    out2 = fused.apply(variables, x, False, rngs={"dropout": jax.random.key(1)})
    out3 = fused.apply(variables, x, False, rngs={"dropout": jax.random.key(2)})
    assert bool(jnp.all(out == out2)) and bool(jnp.any(out != out3))


def test_generator_train_step_with_fused_dropout(rng):
    """An LFQBert fwd+bwd with fused_attention_dropout=true compiles and
    yields finite loss/grads (the full custom-VJP path under value_and_grad)."""
    from maskbit_tpu.models.generator import LFQBert

    model = LFQBert(
        img_size=32, hidden_dim=64, codebook_size=256, codebook_splits=2,
        depth=2, heads=4, mlp_dim=128, dropout=0.1, nclass=10, input_stride=8,
        fused_attention_dropout=True,
    )
    b, n = 2, (32 // 8) ** 2
    tokens = jnp.asarray(rng.integers(0, 16, size=(b, n, 2)), jnp.int32)
    labels = jnp.asarray(rng.integers(0, 10, size=(b,)), jnp.int32)
    variables = model.init(jax.random.key(0), tokens, labels)

    def loss_fn(params):
        logits = model.apply(
            {"params": params}, tokens, labels, deterministic=False,
            rngs={"dropout": jax.random.key(3)},
        )
        return jnp.mean(logits.astype(jnp.float32) ** 2)

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    leaves = jax.tree.leaves(grads)
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in leaves)
    assert any(float(jnp.max(jnp.abs(g))) > 0 for g in leaves)


def test_self_partition_fallback_warns_and_matches(rng, caplog, monkeypatch):
    """Shapes that don't divide the mesh fall back to the unpartitioned
    kernel with a warning (on real multi-chip hardware GSPMD would
    replicate the opaque Mosaic call — the warning is the only signal) and
    identical numbers."""
    import logging
    from jax.sharding import Mesh
    from maskbit_tpu.nn.pallas_attention import dropout_attention, fused_attention

    # caplog's handler sits on the root logger; if an earlier in-process CLI
    # test ran setup_logger (which sets propagate=False), records would never
    # reach it — re-enable propagation for this test only
    monkeypatch.setattr(logging.getLogger("maskbit_tpu"), "propagate", True)

    b, n, h, d, rate = 3, 33, 4, 32, 0.3  # b=3 does not divide data*fsdp=4
    q, k, v = (jnp.asarray(rng.normal(size=(b, n, h, d)), jnp.float32) for _ in range(3))
    seeds = _seeds(b, h, 7)
    plain_drop = dropout_attention(q, k, v, seeds, rate, interpret=True)
    plain_fused = fused_attention(q, k, v, interpret=True)

    devs = np.asarray(jax.devices()[:8]).reshape(2, 2, 2)
    with Mesh(devs, ("data", "fsdp", "tensor")):
        jaxpr = str(jax.make_jaxpr(
            lambda q, k, v: dropout_attention(q, k, v, seeds, rate, interpret=True)
        )(q, k, v))
        assert "shard_map" not in jaxpr
        with caplog.at_level(logging.WARNING, logger="maskbit_tpu"):
            mesh_drop = dropout_attention(q, k, v, seeds, rate, interpret=True)
            mesh_fused = fused_attention(q, k, v, interpret=True)
    messages = [r.getMessage() for r in caplog.records]
    assert any("dropout_attention" in m and "unpartitioned" in m for m in messages)
    assert any("fused_attention:" in m and "unpartitioned" in m for m in messages)
    np.testing.assert_array_equal(np.asarray(mesh_drop), np.asarray(plain_drop))
    np.testing.assert_array_equal(np.asarray(mesh_fused), np.asarray(plain_fused))


def test_dropattn_group_override_validation(monkeypatch, caplog):
    """MASKBIT_DROPATTN_GROUP is a measurement knob: malformed or
    non-dividing values must degrade to G=1 with a warning (not crash
    mid-trace), and legal values must be clamped to the bwd kernel's VMEM
    bound (5 f32 (G, n_pad, n_pad) temporaries within the raised 100 MB
    scope) instead of compiling past it."""
    import logging
    from maskbit_tpu.nn.pallas_attention import _pick_group

    # see test_self_partition_fallback_warns_and_matches: undo a CLI test's
    # propagate=False so caplog can see the records
    monkeypatch.setattr(logging.getLogger("maskbit_tpu"), "propagate", True)

    with caplog.at_level(logging.WARNING, logger="maskbit_tpu"):
        monkeypatch.setenv("MASKBIT_DROPATTN_GROUP", "two")
        assert _pick_group(64, 272) == 1
        monkeypatch.setenv("MASKBIT_DROPATTN_GROUP", "3")
        assert _pick_group(64, 272) == 1  # 3 does not divide 64
        monkeypatch.setenv("MASKBIT_DROPATTN_GROUP", "8")
        assert _pick_group(64, 272) == 8  # fits: 8*272^2*20 = 11.8 MB
        # 512px: 8*1040^2*20 = 173 MB > the 100 MB scope -> clamped to a
        # fitting divisor of b*h (96 MB bound / (1040^2*20) = 4)
        clamped = _pick_group(64, 1040)
        assert clamped == 4
    messages = [r.getMessage() for r in caplog.records]
    assert any("not an integer" in m for m in messages)
    assert any("does not divide" in m for m in messages)
    assert any("clamping" in m for m in messages)
    monkeypatch.setenv("MASKBIT_DROPATTN_GROUP", "auto")
    # auto (round-4 hardware sweep, BENCHMARKS.md "Round 4"): short seq
    # groups up to 8 under the 16 MB default-VMEM bound; long seq stays G=1
    assert _pick_group(64, 272) == 8   # 8*272^2*20 = 11.8 MB <= 16 MB
    assert _pick_group(64, 1040) == 1  # 1*1040^2*20 = 21.6 MB > 16 MB
    assert _pick_group(6, 272) == 6    # largest divisor of b*h within bound
    monkeypatch.delenv("MASKBIT_DROPATTN_GROUP")
    assert _pick_group(64, 272) == 8   # unset env defaults to auto


def test_fused_attention_block_512px_seq(rng):
    """512px shapes (n=1025, E=1024): the fused block raises its own
    `vmem_limit_bytes` for long sequences (measured 1.8x over XLA on v5e) —
    verify that path stays numerically exact and the padded tail is masked."""
    from maskbit_tpu.nn.transformer import BertAttention

    b, n, e, h = 1, 1025, 1024, 16
    x = jnp.asarray(rng.normal(size=(b, n, e)) * 0.1, jnp.float32)
    ref_mod = BertAttention(e, h, dropout=0.0, use_prenorm=False, attention_impl="einsum")
    variables = ref_mod.init(jax.random.key(0), x)
    expected = ref_mod.apply(variables, x)

    fused_mod = BertAttention(e, h, dropout=0.0, use_prenorm=False, attention_impl="fused")
    got = fused_mod.apply(variables, x)  # interpret mode on CPU
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=3e-4, rtol=1e-3)
