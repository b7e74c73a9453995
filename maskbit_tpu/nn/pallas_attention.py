"""Fused self-attention Pallas kernel for short sequences.

The generator's sequence is only 257 tokens (16x16 grid + class token), so
the entire per-(batch, head) attention — logits, f32 softmax, value mix —
fits in VMEM and is computed in one program per (batch, head).

Exact math (f32 softmax, no flash tiling needed); pads the sequence to the
sublane multiple and masks padded keys with -inf.

Status: measured on v5e at (b=16, n=257, h=16, d=64): 0.41 ms vs XLA's
0.28 ms — XLA's fused einsum+softmax wins at these tiny shapes, so the
default transformer path keeps the einsum formulation. At 512px shapes
(b=16, n=1025, E=1024) the n^2 f32 HBM intermediates dominate and both
Pallas paths win: this per-head kernel 4.3 ms vs XLA 5.8 ms per attention
block, and the fully fused block below 3.2 ms (1.8x; needs the raised
`vmem_limit_bytes` it sets for long sequences).
"""

from __future__ import annotations

import functools
import logging

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import PartitionSpec as P

_logger = logging.getLogger("maskbit_tpu")

_warned_no_mesh_api = False


def _kernel_mesh():
    """The ambient `with mesh:` Mesh, if these kernels can self-partition.

    Under auto-GSPMD jit a Mosaic pallas_call is an OPAQUE custom call: the
    SPMD partitioner cannot partition it, so on a multi-chip mesh it
    replicates the call after all-gathering q/k/v — correct, but it defeats
    the kernels' purpose. Attention is embarrassingly parallel over
    (batch, head), so when the caller runs inside `with mesh:` (the train
    CLIs, dryrun_multichip, the sharded sampler) the kernels wrap
    themselves in shard_map over (data, fsdp) x tensor — manual
    per-device partitioning with zero collectives."""
    try:
        from jax._src import mesh as mesh_lib

        m = mesh_lib.thread_resources.env.physical_mesh
    except Exception as exc:  # noqa: BLE001 — internal API; fall back to unsharded
        global _warned_no_mesh_api
        if not _warned_no_mesh_api:
            _warned_no_mesh_api = True
            _logger.warning(
                "pallas attention: ambient-mesh detection failed (%s) — "
                "kernel self-partitioning disabled; on a multi-chip mesh "
                "GSPMD will all-gather q/k/v and replicate the kernels", exc)
        return None
    if m is None or m.empty or m.size <= 1:
        return None
    if not {"data", "fsdp", "tensor"} <= set(m.axis_names):
        return None
    return m


def _batch_shards(mesh) -> int:
    return mesh.shape["data"] * mesh.shape["fsdp"]


def _self_partition(name, local_fn, in_specs, out_specs, args,
                    *, batch, heads=None, need_tensor_1=False):
    """shard_map `local_fn` over the ambient mesh when the shapes divide it;
    otherwise warn (on a multi-chip mesh GSPMD would all-gather the operands
    and replicate the opaque Mosaic call) and run unpartitioned. No-mesh
    callers skip the wrap silently — there is nothing to partition."""
    mesh = _kernel_mesh()
    if mesh is None:
        return local_fn(*args)
    ok = batch % _batch_shards(mesh) == 0
    if heads is not None:
        ok = ok and heads % mesh.shape["tensor"] == 0
    if need_tensor_1:
        ok = ok and mesh.shape["tensor"] == 1
    if not ok:
        _logger.warning(
            "%s: shapes (batch=%d, heads=%s) do not divide mesh %s — "
            "falling back to the unpartitioned kernel (GSPMD will replicate "
            "it on a multi-chip mesh)", name, batch, heads, dict(mesh.shape))
        return local_fn(*args)
    return jax.shard_map(local_fn, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)(*args)


def _attention_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, valid_len: int):
    q = q_ref[0]  # (Np, d)
    k = k_ref[0]
    v = v_ref[0]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (Np, Np)
    n_pad = q.shape[0]
    if valid_len < n_pad:
        key_ids = jax.lax.broadcasted_iota(jnp.int32, logits.shape, dimension=1)
        logits = jnp.where(key_ids < valid_len, logits, -jnp.inf)
    weights = jax.nn.softmax(logits, axis=-1)
    out = jax.lax.dot_general(
        weights.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = out.astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _fused_attention_local(interpret, q, k, v):
    b, n, h, d = q.shape
    sublane = 16 if q.dtype == jnp.bfloat16 else 8
    n_pad = _round_up(n, sublane)
    qp, kp, vp = (_prep_bh(x, n_pad) for x in (q, k, v))
    kernel = functools.partial(_attention_kernel, scale=d**-0.5, valid_len=n)
    out = pl.pallas_call(
        kernel,
        grid=(b * h,),
        in_specs=_bh_specs(n_pad, d, 3),
        out_specs=pl.BlockSpec((1, n_pad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, n_pad, d), q.dtype),
        interpret=interpret,
    )(qp, kp, vp)
    out = out[:, :n, :].reshape(b, h, n, d)
    return jnp.swapaxes(out, 1, 2)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    interpret: bool = False) -> jnp.ndarray:
    """(b, n, h, d) q/k/v -> (b, n, h, d) attention output.

    Unmasked bidirectional attention with 1/sqrt(d) scaling; softmax in f32
    on-chip. Intended for n up to ~1k (n^2 f32 must fit VMEM per program).
    Inside `with mesh:` the call self-partitions over (data, fsdp) x tensor
    via shard_map (see _kernel_mesh)."""
    b, n, h, d = q.shape
    spec = P(("data", "fsdp"), None, "tensor", None)
    return _self_partition(
        "fused_attention",
        functools.partial(_fused_attention_local, bool(interpret)),
        (spec, spec, spec), spec, (q, k, v), batch=b, heads=h)


# --- training attention with in-kernel dropout ------------------------------
#
# Attention-prob dropout is the dominant Stage-II training residual: XLA must
# materialize the (b, h, n, n) mask in HBM (rbg bits are cheap to draw but
# not recomputable; threefry is recomputable but costs ~60 ms/step to draw at
# this shape — BENCHMARKS.md rounds 2-3), and the fwd+bwd mask traffic costs
# ~22% of the whole 256px train step. Here the mask never exists in HBM: the
# forward kernel computes it from a counter-based hash of
# (row, col, layer seed, program id), and the backward kernel regenerates it
# bit-exactly while recomputing softmax flash-style — so the only HBM
# traffic is q/k/v/g and the outputs, same as dropout-free attention.
# (Reference semantics: torch MHA applies dropout to the softmax
# probabilities — modeling/bert.py:73-141; the mask distribution here is
# Bernoulli(1-p) with 1/(1-p) scaling like nn.Dropout, only the bit stream
# differs.)


def _dropout_mask(shape, rate: float, seed):
    """Bernoulli keep-mask: keep iff hash(row, col, seed) >= rate * 2^32
    (P(drop) = rate). `seed` is this (batch, head) slot's own 32-bit draw
    from the global rng, so the mask depends on NOTHING positional beyond
    (row, col) — the same seeds give bit-identical masks on any mesh, any
    grid layout, fwd or bwd.

    COUNTER-BASED, not stream-based: the Mosaic stream PRNG
    (prng_seed/prng_random_bits) maps its bit stream onto a ragged
    (n_pad, n_pad) array in a layout the fwd and bwd kernels do not agree
    on (measured on v5e: same seed, same shape, different masks — the FD
    gradient check catches it). A pure function of the element indices has
    no such freedom: fwd and bwd regenerate bit-identical masks on any
    backend, and the numpy replica below lets CPU tests check the math
    exactly. Mixing is the murmur3 finalizer over a linear index combine —
    avalanche quality far beyond what dropout needs, ~7 VPU integer ops."""
    thr = jnp.uint32(min(int(rate * 2**32), 2**32 - 1))
    rows = jax.lax.broadcasted_iota(jnp.int32, shape, 0).astype(jnp.uint32)
    cols = jax.lax.broadcasted_iota(jnp.int32, shape, 1).astype(jnp.uint32)
    mix = (rows * jnp.uint32(0x9E3779B1)
           + cols * jnp.uint32(0x85EBCA77)
           + seed.astype(jnp.uint32) * jnp.uint32(0xC2B2AE3D))
    mix = mix ^ (mix >> jnp.uint32(16))
    mix = mix * jnp.uint32(0x85EBCA6B)
    mix = mix ^ (mix >> jnp.uint32(13))
    mix = mix * jnp.uint32(0xC2B2AE35)
    mix = mix ^ (mix >> jnp.uint32(16))
    return mix >= thr


def hash_keep_mask_np(n_pad: int, rate: float, seed: int):
    """Numpy replica of the in-kernel hash mask (for tests)."""
    import numpy as np

    thr = np.uint32(min(int(rate * 2**32), 2**32 - 1))
    rows = np.arange(n_pad, dtype=np.uint32)[:, None]
    cols = np.arange(n_pad, dtype=np.uint32)[None, :]
    with np.errstate(over="ignore"):
        mix = (rows * np.uint32(0x9E3779B1)
               + cols * np.uint32(0x85EBCA77)
               + np.uint32(np.int64(seed) & 0xFFFFFFFF) * np.uint32(0xC2B2AE3D))
        mix = mix ^ (mix >> np.uint32(16))
        mix = mix * np.uint32(0x85EBCA6B)
        mix = mix ^ (mix >> np.uint32(13))
        mix = mix * np.uint32(0xC2B2AE35)
        mix = mix ^ (mix >> np.uint32(16))
    return mix >= thr


def _group_keep_mask(seed_ref, shape, rate: float, group: int):
    """(group, n_pad, n_pad) keep-mask: each head-in-group gets its own
    seed row (static unrolled loop — `group` is a compile-time constant)."""
    # group==1 never reaches here: both kernels early-return into their
    # dedicated 2D path (which calls _dropout_mask directly) before this.
    # ValueError (not assert) so the guard survives `python -O` (ADVICE r3).
    if group <= 1:
        raise ValueError("G=1 uses the plain-2D kernel path")
    base = pl.program_id(0) * group
    return jnp.stack(
        [_dropout_mask(shape[1:], rate, seed_ref[base + g, 0])
         for g in range(group)], axis=0)


def _dropattn_fwd_kernel(seed_ref, q_ref, k_ref, v_ref, o_ref,
                         *, scale: float, valid_len: int, rate: float,
                         group: int):
    if group == 1:
        # keep the plain 2D form for G=1 (the hardware-measured 512px path)
        q, k, v = q_ref[0], k_ref[0], v_ref[0]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        n_pad = q.shape[0]
        if valid_len < n_pad:
            ids = jax.lax.broadcasted_iota(jnp.int32, logits.shape, dimension=1)
            logits = jnp.where(ids < valid_len, logits, -jnp.inf)
        weights = jax.nn.softmax(logits, axis=-1)
        keep = _dropout_mask(weights.shape, rate, seed_ref[pl.program_id(0), 0])
        weights = jnp.where(keep, weights * (1.0 / (1.0 - rate)), 0.0)
        out = jax.lax.dot_general(
            weights.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0] = out.astype(o_ref.dtype)
        return
    q = q_ref[:]  # (G, Np, d)
    k = k_ref[:]
    v = v_ref[:]
    logits = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ) * scale  # (G, Np, Np)
    n_pad = q.shape[1]
    if valid_len < n_pad:
        key_ids = jax.lax.broadcasted_iota(jnp.int32, logits.shape, dimension=2)
        logits = jnp.where(key_ids < valid_len, logits, -jnp.inf)
    weights = jax.nn.softmax(logits, axis=-1)
    keep = _group_keep_mask(seed_ref, weights.shape, rate, group)
    weights = jnp.where(keep, weights * (1.0 / (1.0 - rate)), 0.0)
    out = jax.lax.dot_general(
        weights.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o_ref[:] = out.astype(o_ref.dtype)


def _dropattn_bwd_kernel(seed_ref, q_ref, k_ref, v_ref, g_ref,
                         dq_ref, dk_ref, dv_ref,
                         *, scale: float, valid_len: int, rate: float,
                         group: int):
    """Recompute softmax + the identical dropout mask, then dq/dk/dv."""
    if group == 1:
        # keep the plain 2D form for G=1 (the hardware-measured 512px path)
        q, k, v, g = q_ref[0], k_ref[0], v_ref[0], g_ref[0]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        n_pad = q.shape[0]
        if valid_len < n_pad:
            ids = jax.lax.broadcasted_iota(jnp.int32, logits.shape, dimension=1)
            logits = jnp.where(ids < valid_len, logits, -jnp.inf)
        weights = jax.nn.softmax(logits, axis=-1)
        keep = _dropout_mask(weights.shape, rate, seed_ref[pl.program_id(0), 0])
        inv = 1.0 / (1.0 - rate)
        dropped = jnp.where(keep, weights * inv, 0.0).astype(v.dtype)
        dv = jax.lax.dot_general(
            dropped, g, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dwd = jax.lax.dot_general(
            g, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        dw = jnp.where(keep, dwd * inv, 0.0)
        dlog = weights * (dw - jnp.sum(dw * weights, axis=-1, keepdims=True))
        dlog = (dlog * scale).astype(q.dtype)
        dq = jax.lax.dot_general(
            dlog, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dk = jax.lax.dot_general(
            dlog, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dq_ref[0] = dq.astype(dq_ref.dtype)
        dk_ref[0] = dk.astype(dk_ref.dtype)
        dv_ref[0] = dv.astype(dv_ref.dtype)
        return
    q = q_ref[:]  # (G, Np, d)
    k = k_ref[:]
    v = v_ref[:]
    g = g_ref[:]
    logits = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ) * scale
    n_pad = q.shape[1]
    if valid_len < n_pad:
        key_ids = jax.lax.broadcasted_iota(jnp.int32, logits.shape, dimension=2)
        logits = jnp.where(key_ids < valid_len, logits, -jnp.inf)
    weights = jax.nn.softmax(logits, axis=-1)          # pre-dropout, f32
    keep = _group_keep_mask(seed_ref, weights.shape, rate, group)
    inv = 1.0 / (1.0 - rate)
    dropped = jnp.where(keep, weights * inv, 0.0).astype(v.dtype)

    # dv = dropped^T @ g
    dv = jax.lax.dot_general(
        dropped, g, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    # d(dropped weights) = g @ v^T ; through dropout: keep * inv
    dwd = jax.lax.dot_general(
        g, v, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    dw = jnp.where(keep, dwd * inv, 0.0)
    # softmax backward on the PRE-dropout weights (f32)
    dlog = weights * (dw - jnp.sum(dw * weights, axis=-1, keepdims=True))
    dlog = (dlog * scale).astype(q.dtype)
    dq = jax.lax.dot_general(
        dlog, k, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    dk = jax.lax.dot_general(
        dlog, q, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    dq_ref[:] = dq.astype(dq_ref.dtype)
    dk_ref[:] = dk.astype(dk_ref.dtype)
    dv_ref[:] = dv.astype(dv_ref.dtype)


def _prep_bh(x, n_pad):
    """(b, n, h, d) -> (b*h, n_pad, d) with zero padding."""
    b, n, h, d = x.shape
    x = jnp.swapaxes(x, 1, 2).reshape(b * h, n, d)
    if n_pad != n:
        x = jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0)))
    return x


def _bh_specs(n_pad, d, count, group: int = 1):
    """Per-program VMEM blocks of `group` (batch, head) rows for `count`
    (b*h, n_pad, d) operands."""
    return [
        pl.BlockSpec((group, n_pad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        for _ in range(count)
    ]


# the full (b*h, 1) seed array rides in SMEM (a few hundred bytes); each
# program picks its own (batch, head) seed by program_id — Mosaic requires
# SMEM blocks be whole-array or tile-aligned, so no (1, 1) blocked spec
_SEED_SPEC = pl.BlockSpec(memory_space=pltpu.SMEM)


def _vmem_params(n_pad, group: int = 1):
    # bwd holds ~5 (group, n_pad, n_pad) f32 temporaries; past seq ~512 (or
    # with head grouping) that blows the default ~16 MB scope — raise it
    # (measured safe up to 100 MB on v5e)
    if group * n_pad * n_pad * 4 * 5 > 12_000_000:
        return {"compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)}
    return {}


def _pick_group(bh: int, n_pad: int) -> int:
    """Heads per program for the dropout kernels.

    At short sequences the per-(batch, head) programs are tiny (264x64x264
    matmuls) and per-program overhead dominates; batching G heads per
    program amortizes it — the same schedule insight as the inference
    fused block's head groups. Long sequences keep G=1: their (n, n) f32
    temporaries already fill VMEM. Auto rule: largest G <= 8 dividing b*h
    whose ~5 f32 (G, n_pad, n_pad) bwd temporaries stay under ~16 MB (the
    default VMEM scope). Hardware-measured round 4 (flagship Stage-II
    train step, BENCHMARKS.md "Round 4"): seq 257/b32 G=1/2/4/8 ->
    171.5/178.9/181.1/181.8 img/s (auto picks 8, +6.0%); seq 1025/b16
    no-remat G=1 vs G=2 both 36.9 img/s (identical — per-program overhead
    is negligible against the big per-head matmuls there), so the 16 MB
    bound's G=1 choice costs nothing. Override with
    MASKBIT_DROPATTN_GROUP=<int> for measurements."""
    import os

    env = os.environ.get("MASKBIT_DROPATTN_GROUP", "auto")
    if env == "auto":
        return max((c for c in range(1, 9)
                    if bh % c == 0 and c * n_pad * n_pad * 4 * 5 <= 16_000_000),
                   default=1)
    try:
        g = int(env)
    except ValueError:
        _logger.warning("MASKBIT_DROPATTN_GROUP=%r is not an integer — "
                        "using the auto schedule", env)
        return 1
    if g <= 0 or bh % g:
        if g != 1:
            _logger.warning("MASKBIT_DROPATTN_GROUP=%d does not divide "
                            "b*h=%d — using G=1", g, bh)
        return 1
    # the bwd kernel's ~5 f32 (G, n_pad, n_pad) temporaries must fit the
    # raised 100 MB VMEM scope; clamp to the largest fitting divisor
    max_g = max(1, (96 * 1024 * 1024) // (n_pad * n_pad * 4 * 5))
    if g > max_g:
        while max_g > 1 and bh % max_g:
            max_g -= 1
        _logger.warning("MASKBIT_DROPATTN_GROUP=%d exceeds the VMEM "
                        "bound at n_pad=%d — clamping to %d", g, n_pad, max_g)
        return max_g
    return g


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _dropout_attention(rate, interpret, q, k, v, seed):
    out, _ = _dropout_attention_fwd(rate, interpret, q, k, v, seed)
    return out


def _dropout_attention_fwd(rate, interpret, q, k, v, seed):
    b, n, h, d = q.shape
    sublane = 16 if q.dtype == jnp.bfloat16 else 8
    n_pad = _round_up(n, sublane)
    group = _pick_group(b * h, n_pad)
    qp, kp, vp = (_prep_bh(x, n_pad) for x in (q, k, v))
    kernel = functools.partial(
        _dropattn_fwd_kernel, scale=d**-0.5, valid_len=n, rate=rate,
        group=group,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b * h // group,),
        in_specs=[_SEED_SPEC] + _bh_specs(n_pad, d, 3, group),
        out_specs=pl.BlockSpec((group, n_pad, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, n_pad, d), q.dtype),
        interpret=interpret,
        **_vmem_params(n_pad, group),
    )(seed, qp, kp, vp)
    out = jnp.swapaxes(out[:, :n, :].reshape(b, h, n, d), 1, 2)
    return out, (q, k, v, seed)


def _dropout_attention_bwd(rate, interpret, res, g):
    q, k, v, seed = res
    b, n, h, d = q.shape
    sublane = 16 if q.dtype == jnp.bfloat16 else 8
    n_pad = _round_up(n, sublane)
    group = _pick_group(b * h, n_pad)
    qp, kp, vp, gp = (_prep_bh(x, n_pad) for x in (q, k, v, g))
    kernel = functools.partial(
        _dropattn_bwd_kernel, scale=d**-0.5, valid_len=n, rate=rate,
        group=group,
    )
    bh_spec = pl.BlockSpec((group, n_pad, d), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((b * h, n_pad, d), q.dtype)
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(b * h // group,),
        in_specs=[_SEED_SPEC] + _bh_specs(n_pad, d, 4, group),
        out_specs=(bh_spec, bh_spec, bh_spec),
        out_shape=(shape, shape, shape),
        interpret=interpret,
        **_vmem_params(n_pad, group),
    )(seed, qp, kp, vp, gp)

    def unprep(x):
        return jnp.swapaxes(x[:, :n, :].reshape(b, h, n, d), 1, 2)

    import numpy as _np

    dseed = _np.zeros(seed.shape, dtype=jax.dtypes.float0)
    return unprep(dq), unprep(dk), unprep(dv), dseed


_dropout_attention.defvjp(_dropout_attention_fwd, _dropout_attention_bwd)


def _dropout_attention_local(rate, interpret, q, k, v, seeds):
    b, _, h, _ = q.shape
    return _dropout_attention(rate, interpret, q, k, v, seeds.reshape(b * h, 1))


def dropout_attention(q, k, v, seeds, rate: float, interpret: bool = False):
    """(b, n, h, d) attention with in-kernel attention-prob dropout.

    `seeds` is a (b, h) int32/uint32 array — one independent mask stream per
    (batch, head), drawn by the caller from the GLOBAL rng (the same
    partitionable draw that makes nn.Dropout independent across
    data-parallel shards). The mask is a pure hash of (row, col, seed):
    the same seeds give bit-identical masks on any mesh or grid layout, and
    the backward pass regenerates them instead of storing them.
    Differentiable in q/k/v via the custom VJP above.

    Inside `with mesh:` the call self-partitions via shard_map — batch over
    (data, fsdp), heads over tensor — because GSPMD cannot partition an
    opaque Mosaic call (it would all-gather q/k/v on a multi-chip mesh)."""
    assert 0.0 <= rate < 1.0  # rate 0 = plain attention (kept for tests)
    b, _, h, _ = q.shape
    assert seeds.shape == (b, h), f"seeds must be (batch, heads), got {seeds.shape}"
    if seeds.dtype != jnp.int32:
        seeds = jax.lax.bitcast_convert_type(seeds, jnp.int32)
    spec = P(("data", "fsdp"), None, "tensor", None)
    return _self_partition(
        "dropout_attention",
        functools.partial(_dropout_attention_local, float(rate), bool(interpret)),
        (spec, spec, spec, P(("data", "fsdp"), "tensor")), spec,
        (q, k, v, seeds), batch=b, heads=h)


# --- fully fused postnorm attention block -----------------------------------


def _attention_block_kernel(
    x_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref, g_ref, b_ref, o_ref,
    *, num_heads: int, valid_len: int, eps: float, imgs: int,
):
    """LN(x + OutProj(Attention(QKV(x)))) for `imgs` batch elements, entirely
    in VMEM: the (n, 3E) qkv activation, the per-head f32 logits/softmax and
    the projection never round-trip to HBM. Measured ~15% faster than XLA's
    fused ops at (b16, n257, d1024, h16) on v5e — the win is the elided
    qkv/attention HBM traffic. Heads are processed in groups of <=8 to bound
    the f32 logits scratch (VMEM is 16 MB)."""
    imgs_, n_pad, e = x_ref.shape
    d = e // num_heads
    x = x_ref[:].reshape(imgs * n_pad, e)

    qkv = jax.lax.dot_general(
        x, wqkv_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) + bqkv_ref[:]
    qkv = qkv.astype(x.dtype)

    # logits scratch is (group, n_pad, n_pad) f32 — budget ~2.4 MB of VMEM
    # for it (group 8 at n=272; shrinks automatically for longer sequences)
    group = max(1, min(num_heads, (2_400_000 // (n_pad * n_pad * 4)) or 1))
    outs = []
    for img in range(imgs):
        qkv_i = qkv[img * n_pad:(img + 1) * n_pad]
        attn_parts = []
        for g0 in range(0, num_heads, group):
            heads = list(range(g0, min(g0 + group, num_heads)))
            # static head slices + jnp.stack lower cleanly in Mosaic
            q = jnp.stack([qkv_i[:, h * d:(h + 1) * d] for h in heads], axis=0)
            k = jnp.stack([qkv_i[:, e + h * d: e + (h + 1) * d] for h in heads], axis=0)
            v = jnp.stack([qkv_i[:, 2 * e + h * d: 2 * e + (h + 1) * d] for h in heads], axis=0)
            logits = jax.lax.dot_general(
                q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
            ) * (d**-0.5)
            if valid_len < n_pad:
                ids = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 2)
                logits = jnp.where(ids < valid_len, logits, -jnp.inf)
            weights = jax.nn.softmax(logits, axis=-1)
            attn = jax.lax.dot_general(
                weights.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            attn_parts.extend(attn[i] for i in range(len(heads)))
        outs.append(jnp.concatenate(attn_parts, axis=-1))
    attn2d = jnp.concatenate(outs, axis=0).astype(x.dtype)

    proj = jax.lax.dot_general(
        attn2d, wo_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) + bo_ref[:]

    y = x.astype(jnp.float32) + proj
    mu = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean((y - mu) ** 2, axis=-1, keepdims=True)
    out = ((y - mu) * jax.lax.rsqrt(var + eps) * g_ref[:] + b_ref[:]).astype(o_ref.dtype)
    o_ref[:] = out.reshape(imgs, n_pad, e)


@functools.partial(jax.jit, static_argnames=("num_heads", "eps", "interpret"))
def fused_attention_block(
    x: jnp.ndarray,
    wqkv: jnp.ndarray,
    bqkv: jnp.ndarray,
    wo: jnp.ndarray,
    bo: jnp.ndarray,
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    num_heads: int,
    eps: float = 1e-12,
    interpret: bool = False,
) -> jnp.ndarray:
    """Postnorm BERT attention block: LN(x + MHA(x)). x: (b, n, E).

    Inside `with mesh:` the call self-partitions over the batch axes via
    shard_map (weights replicated — this is the inference path, where the
    sharded sampler replicates them; see _kernel_mesh for why GSPMD alone
    cannot partition a Mosaic call). Requires tensor == 1: the packed
    [q|k|v] weight columns do not split head-wise under a plain tensor
    annotation."""
    rep = P()
    return _self_partition(
        "fused_attention_block",
        functools.partial(_fused_attention_block_local,
                          num_heads=num_heads, eps=eps,
                          interpret=bool(interpret)),
        (P(("data", "fsdp")), rep, rep, rep, rep, rep, rep),
        P(("data", "fsdp")),
        (x, wqkv, bqkv, wo, bo, ln_scale, ln_bias),
        batch=x.shape[0], need_tensor_1=True)


def _fused_attention_block_local(
    x, wqkv, bqkv, wo, bo, ln_scale, ln_bias,
    *, num_heads: int, eps: float, interpret: bool,
) -> jnp.ndarray:
    b, n, e = x.shape
    sublane = 16 if x.dtype == jnp.bfloat16 else 8
    n_pad = _round_up(n, sublane)
    xp = jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0))) if n_pad != n else x

    # one image per program: 2-per-program measured marginally faster in
    # isolation but overflows the 16 MB VMEM budget inside the sampler scan
    imgs = 1
    kernel = functools.partial(
        _attention_block_kernel, num_heads=num_heads, valid_len=n, eps=eps, imgs=imgs
    )
    # VMEM limit policy (all measured on v5e at E=1024):
    #  * short sequences: 20 MB. The default ~16 MB scope is enough for the
    #    kernel alone but can OOM by a few hundred KB inside larger programs
    #    (e.g. the 64-step sampler at CFG batch 80); 20 MB costs nothing
    #    (1.737 vs 1.762 ms/block at b64 n257) while 100 MB costs ~4%.
    #  * long sequences (512px -> n=1025): the f32 qkv intermediate needs a
    #    raised scope; 100 MB is a measured 1.8x win over XLA
    #    (3.2 vs 5.8 ms/block at b16 n1025).
    long_seq = n_pad * 3 * e * 4 > 4_500_000
    kwargs = {
        "compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=(100 if long_seq else 20) * 1024 * 1024
        )
    }
    out = pl.pallas_call(
        kernel,
        grid=(b // imgs,),
        in_specs=[
            pl.BlockSpec((imgs, n_pad, e), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((e, 3 * e), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * e,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((e, e), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((e,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((e,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((e,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((imgs, n_pad, e), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, e), x.dtype),
        interpret=interpret,
        **kwargs,
    )(xp, wqkv, bqkv, wo, bo, ln_scale, ln_bias)
    return out[:, :n, :]
