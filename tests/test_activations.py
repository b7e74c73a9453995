"""gelu_erf (fusable polynomial erf) matches the exact lax.erf gelu."""

import jax
import jax.numpy as jnp
import numpy as np

from maskbit_tpu.ops.activations import erf_poly, gelu_erf


def test_erf_poly_accuracy():
    x = jnp.linspace(-6.0, 6.0, 200001, dtype=jnp.float32)
    got = erf_poly(x)
    want = jax.lax.erf(x)
    # paper bound is 1.5e-7 in exact arithmetic; f32 evaluation adds rounding
    assert float(jnp.max(jnp.abs(got - want))) < 1e-6
    # exact at 0 and saturates correctly
    np.testing.assert_allclose(float(erf_poly(jnp.float32(0.0))), 0.0, atol=1e-7)
    assert float(erf_poly(jnp.float32(10.0))) == 1.0
    assert float(erf_poly(jnp.float32(-10.0))) == -1.0


def test_gelu_erf_matches_exact_gelu():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(scale=3.0, size=(4096,)).astype(np.float32))
    got = gelu_erf(x)
    want = jax.nn.gelu(x, approximate=False)
    assert float(jnp.max(jnp.abs(got - want))) < 1.5e-6
    # bf16 in/out: within bf16 quantization noise of the exact version
    xb = x.astype(jnp.bfloat16)
    got_b = gelu_erf(xb).astype(jnp.float32)
    want_b = jax.nn.gelu(xb.astype(jnp.float32), approximate=False).astype(
        jnp.bfloat16
    ).astype(jnp.float32)
    np.testing.assert_allclose(got_b, want_b, atol=2e-5, rtol=1e-2)
