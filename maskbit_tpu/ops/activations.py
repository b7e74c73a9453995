"""Activation functions tuned for the TPU compiler path.

gelu_erf: the exact-erf GELU (torch.nn.GELU default — the reference's
activation, modeling/modules/bert.py FFN/head) computed via the
Abramowitz & Stegun 7.1.26 erf polynomial instead of `lax.erf`.

Why: XLA-TPU does not fuse `lax.erf` into the producing matmul's epilogue,
so `nn.gelu(approximate=False)` forces the (tokens, mlp_dim) f32
intermediate through an extra HBM round trip — measured 0.64 ms/layer at
the flagship serving shapes (b64, n257, 1024->4096), i.e. ~28% of the whole
FFN (BENCHMARKS.md round 2). The polynomial is plain exp/divide arithmetic,
fuses into the epilogue (measured 1.80 ms vs 2.30 ms per FFN), and is also
the only erf Mosaic can lower inside Pallas kernels.

Accuracy: |erf err| <= 1.5e-7 in exact arithmetic (<= 6e-7 measured in f32
evaluation) => gelu outputs match the lax.erf version to ~1e-6 f32 (at most
one bf16 ulp after cast) — far below every parity tolerance in tests/.
"""

from __future__ import annotations

import jax.numpy as jnp

_A1 = 0.254829592
_A2 = -0.284496736
_A3 = 1.421413741
_A4 = -1.453152027
_A5 = 1.061405429
_P = 0.3275911
_INV_SQRT2 = 0.7071067811865476


def erf_poly(x: jnp.ndarray) -> jnp.ndarray:
    """Abramowitz & Stegun 7.1.26 erf, |err| <= 1.5e-7 (f32 in, f32 out)."""
    sign = jnp.sign(x)
    z = jnp.abs(x)
    t = 1.0 / (1.0 + _P * z)
    poly = ((((_A5 * t + _A4) * t + _A3) * t + _A2) * t + _A1) * t
    return sign * (1.0 - poly * jnp.exp(-z * z))


def gelu_erf(x: jnp.ndarray) -> jnp.ndarray:
    """Exact-erf GELU (f32 math, output cast back to x.dtype)."""
    x32 = x.astype(jnp.float32)
    out = x32 * 0.5 * (1.0 + erf_poly(x32 * _INV_SQRT2))
    return out.astype(x.dtype)
