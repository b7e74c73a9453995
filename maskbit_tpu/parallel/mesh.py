"""Device mesh + sharding: the distributed runtime of the framework.

The reference delegates distribution to HF accelerate/NCCL DDP
(scripts/train_tokenizer.py:61-67); here it is a first-class layer built on
`jax.sharding.Mesh` + GSPMD:

  * `data`  axis — batch sharding (the reference's only strategy, DP)
  * `fsdp`  axis — parameter/optimizer-state sharding (ZeRO-like)
  * `tensor` axis — megatron-style tensor parallelism over the generator's
    attention heads / MLP hidden dim (a forward-looking hook; models at this
    scale are usually pure-DP)

Gradient/metric reduction happens through XLA collectives inserted by GSPMD
(psum over ICI/DCN) — there is no NCCL-style process group code to port.
"""

from __future__ import annotations

import re
from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class MeshConfig(NamedTuple):
    data: int = -1  # -1: all remaining devices
    fsdp: int = 1
    tensor: int = 1

    @classmethod
    def from_config(cls, cfg) -> "MeshConfig":
        node = cfg.get("parallel", None)
        if node is None:
            return cls()
        return cls(
            data=node.get("data", -1),
            fsdp=node.get("fsdp", 1),
            tensor=node.get("tensor", 1),
        )


AXES = ("data", "fsdp", "tensor")


def create_mesh(config: MeshConfig = MeshConfig(), devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    data = config.data
    if data == -1:
        denom = config.fsdp * config.tensor
        assert n % denom == 0, f"{n} devices not divisible by fsdp*tensor={denom}"
        data = n // denom
    assert data * config.fsdp * config.tensor == n, (
        f"mesh {data}x{config.fsdp}x{config.tensor} != {n} devices"
    )
    dev_array = _device_array((data, config.fsdp, config.tensor), devices)
    return Mesh(dev_array, AXES)


def _device_array(shape, devices) -> np.ndarray:
    """Topology-aware (data, fsdp, tensor) device array.

    On a real TPU slice the device ORDER decides whether the tensor/fsdp
    collectives ride ICI or hop DCN: mesh_utils lays the fastest-varying
    axes (tensor, fsdp) along physically adjacent chips; a plain reshape of
    jax.devices() does not. On a MULTI-SLICE pod (devices spanning
    slice_index values), the outermost DATA axis is placed across slices so
    the model axes' collectives stay on ICI and only the per-step grad
    reduction crosses DCN — the standard DP-over-multislice layout."""
    data = shape[0]
    try:
        from jax.experimental import mesh_utils

        slice_ids = {getattr(d, "slice_index", 0) or 0 for d in devices}
        n_slices = len(slice_ids)
        if n_slices > 1 and data % n_slices == 0:
            return mesh_utils.create_hybrid_device_mesh(
                (data // n_slices,) + tuple(shape[1:]),
                (n_slices,) + (1,) * (len(shape) - 1),
                devices=devices,
            )
        return mesh_utils.create_device_mesh(shape, devices=devices)
    except (ValueError, NotImplementedError, AssertionError) as e:
        # odd shapes/backends: fall back to enumeration order — visibly,
        # because on a pod this ordering can route collectives over DCN
        import logging

        logging.getLogger("maskbit_tpu").warning(
            f"mesh_utils device mesh failed for {shape} ({e!r}); "
            "falling back to device enumeration order (may be ICI-suboptimal)"
        )
        return np.asarray(devices).reshape(shape)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over data+fsdp (fsdp acts as extra DP
    for activations)."""
    return NamedSharding(mesh, P(("data", "fsdp")))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def constrain_batch(x):
    """Pin an activation (leading dim = batch) to P(('data','fsdp')) inside
    an ambient `with mesh:` trace; no-op anywhere else.

    Used at the tokenizer decoder's stage boundaries: with fsdp-sharded
    conv kernels the decode BACKWARD otherwise mixes batch-sharded
    activation cotangents with channels-over-fsdp layouts coming out of the
    kernel-gradient computation, and the SPMD partitioner bridges the
    mismatch with an 'Involuntary full rematerialization' (replicate +
    re-partition) at up_*/reduce_sum and norm_out/add_any
    (MULTICHIP_r04.json). A sharding constraint transposes onto the
    cotangent at the same point, so the re-shard happens inside the conv
    gradient (where SPMD has efficient collective lowerings) instead.
    Correctness-preserving under GSPMD either way.

    TRACE-ONLY: applied eagerly the constraint is a reshard, not an
    annotation — and the decoder is also applied eagerly from MAIN-ONLY
    host code inside the training ``with mesh:`` block (viz decodes),
    where a reshard onto the cross-process mesh would crash. Host-local
    JITTED decoder calls on a pod must run under ``host_local_mesh()``
    (the standing round-3 invariant), which makes this a no-op via the
    size-1 check."""
    if not isinstance(x, jax.core.Tracer):
        return x
    try:
        from jax._src import mesh as mesh_lib

        m = mesh_lib.thread_resources.env.physical_mesh
    except Exception:  # noqa: BLE001 — internal API; constraint is optional
        return x
    if m is None or m.empty or m.size <= 1:
        return x
    if not {"data", "fsdp"} <= set(m.axis_names):
        return x
    shards = m.shape["data"] * m.shape["fsdp"]
    if x.shape[0] % shards != 0:
        return x
    spec = P(("data", "fsdp"), *([None] * (x.ndim - 1)))
    return jax.lax.with_sharding_constraint(x, NamedSharding(m, spec))


# --- parameter partitioning rules -----------------------------------------
# (path regex, PartitionSpec). First match WITH DIVISIBLE DIMS wins — a rule
# whose axis sizes don't divide the leaf's dims is skipped, so a pattern may
# appear twice (primary spec, then fallback). Any annotation is
# correctness-preserving under GSPMD; these choices make BOTH model axes
# real:
#   * tensor — megatron split of heads / mlp hidden (column- then row-wise,
#     so each attention/FFN pair needs one psum on its output),
#   * fsdp  — ZeRO-style parameter + optimizer-state sharding of every
#     remaining dim. GSPMD all-gathers a weight right before use and
#     reduce-scatters its gradient (the standard JAX fsdp recipe: the
#     batch is also sharded over ('data', 'fsdp'), see batch_sharding),
#     so params, AdamW moments and EMA all scale 1/fsdp per device.
_PARAM_RULES = [
    # tensor-parallel transformer 2-D kernels, fsdp on the other dim
    (re.compile(r".*/(qkv|fc1)/kernel$"), P("fsdp", "tensor")),
    (re.compile(r".*/(qkv|fc1)/kernel$"), P(None, "tensor")),
    (re.compile(r".*/(out_proj|fc2)/kernel$"), P("tensor", "fsdp")),
    (re.compile(r".*/(out_proj|fc2)/kernel$"), P("tensor", None)),
    (re.compile(r".*/(qkv|fc1)/bias$"), P(("tensor", "fsdp"))),
    (re.compile(r".*/(qkv|fc1)/bias$"), P("tensor")),
    (re.compile(r".*/(prediction_layer|last_dense)/kernel$"), P("fsdp", "tensor")),
    (re.compile(r".*/prediction_layer/kernel$"), P(None, "tensor")),
    # input_proj rows = bit count (tiny, indivisible): shard the hidden dim
    (re.compile(r".*/input_proj/kernel$"), P(None, ("tensor", "fsdp"))),
    # embeddings: vocab over fsdp when divisible (VQ/LFQ codebooks), else
    # the feature dim (class_emb's 1001 rows, Bert's 2^k+1 token tables)
    (re.compile(r".*/embedding$"), P("fsdp", None)),
    (re.compile(r".*/embedding$"), P(None, ("tensor", "fsdp"))),
    # learned positional embedding (1, seq+1, hidden): feature dim
    (re.compile(r".*pos_emb$"), P(None, None, ("tensor", "fsdp"))),
    # Bert weight-tied head's per-position bias (seq_len, ecs)
    (re.compile(r".*/bias_\d+$"), P("fsdp", None)),
    # conv kernels: shard output channels over fsdp when large. Keep this
    # 4-dim catch-all above the 1-D vector rule but below all 2-dim rules:
    # specific rules must win first-match (the rank-mismatch `continue` in
    # _spec_for is a fallback, not the mechanism specific rules rely on).
    (re.compile(r".*/kernel$"), P(None, None, None, "fsdp")),
    # every remaining 1-D vector (dense/conv biases, norm scales): ZeRO
    # moments for these replicate otherwise. Indivisible sizes fall back to
    # replication via _spec_for's divisibility check.
    (re.compile(r".*/(bias|scale)$"), P(("tensor", "fsdp"))),
]


def _spec_for(path: str, shape, mesh: Mesh) -> P:
    for pattern, spec in _PARAM_RULES:
        if pattern.match(path):
            # drop the annotation if the dim is not divisible by the axis size
            dims = list(spec)
            if len(dims) > len(shape):
                continue
            ok = True
            for i, axis in enumerate(dims):
                if axis is None:
                    continue
                axes = axis if isinstance(axis, tuple) else (axis,)
                size = int(np.prod([mesh.shape[a] for a in axes]))
                if shape[i] % size != 0:
                    ok = False
                    break
            if ok:
                # a spec shorter than the rank leaves trailing dims unsharded
                return P(*dims)
    return P()


def param_shardings(params, mesh: Mesh):
    """A NamedSharding pytree for a parameter tree, following _PARAM_RULES."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_str(path):
        parts = []
        for p in path:
            if hasattr(p, "key"):
                parts.append(str(p.key))
            elif hasattr(p, "idx"):
                parts.append(str(p.idx))
        return "/".join(parts)

    specs = {}
    for path, leaf in flat:
        specs[path_str(path)] = _spec_for(path_str(path), getattr(leaf, "shape", ()), mesh)

    def map_fn(path, leaf):
        return NamedSharding(mesh, specs[path_str(path)])

    return jax.tree_util.tree_map_with_path(map_fn, params)


def shard_params(params, mesh: Mesh):
    """Device-put a parameter tree according to the partitioning rules."""
    shardings = param_shardings(params, mesh)
    return jax.tree.map(jax.device_put, params, shardings)


def shard_train_state(state, mesh: Mesh):
    """Device-put a FULL train state onto the mesh: parameter-shaped leaves
    follow _PARAM_RULES (optimizer moments and EMA mirror the param tree's
    paths, so they inherit the same placement — ZeRO-style), scalars and
    unmatched leaves replicate. Under the default pure-DP mesh everything
    replicates; with fsdp/tensor axes this is what makes a big model fit.

    The returned leaves carry NamedShardings, which is also what makes the
    pod-resume template (core/checkpoint.abstract_sharded semantics) exact:
    `jax.tree.map(lambda x: ShapeDtypeStruct(x.shape, x.dtype,
    sharding=x.sharding), state)`."""
    return shard_params(state, mesh)


def sharded_byte_fraction(tree) -> float:
    """Fraction of array bytes in `tree` whose placement actually SPLITS the
    leaf across devices (shard shape != global shape). Counts real sharding,
    not just annotations — a P() or size-1-axis spec contributes 0. Used by
    the ZeRO tests and the multichip dryrun to prove the fsdp/tensor axes
    genuinely reduce per-device state bytes (VERDICT r4 #1)."""
    total = 0
    split = 0
    for leaf in jax.tree.leaves(tree):
        if not isinstance(leaf, jax.Array) or leaf.ndim == 0:
            continue
        nbytes = leaf.size * leaf.dtype.itemsize
        total += nbytes
        if leaf.sharding.shard_shape(leaf.shape) != leaf.shape:
            split += nbytes
    return split / max(total, 1)


def local_mesh(config: MeshConfig = MeshConfig()) -> Mesh:
    """A mesh over this process's addressable devices only.

    For embarrassingly-parallel work (the 50k-sample gFID generation) a
    per-host mesh keeps sharding on ICI and needs no global jax.Arrays;
    hosts then merge plain-sum moments (eval/adm.py)."""
    return create_mesh(config, devices=jax.local_devices())


def global_batch_array(local_batch, mesh: Mesh) -> jax.Array:
    """Assemble per-process local batches into ONE global array sharded over
    the mesh's batch axes (data, fsdp).

    The multi-host data contract (reference scripts/train_tokenizer.py:61-67
    gets this from accelerate's DataLoader sharding): every process feeds
    global_batch/process_count examples. Single-process this is a plain
    device_put; multi-process each host's rows become its addressable shards
    of the global array — no gather through one host."""
    sharding = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.device_put(jnp.asarray(local_batch), sharding)
    return jax.make_array_from_process_local_data(sharding, np.asarray(local_batch))


def process_allgather_f64(x) -> np.ndarray:
    """Bit-exact float64 process allgather -> stacked (nproc, *shape).

    `multihost_utils.process_allgather` routes host data through jax arrays,
    which silently downcasts f64 -> f32 under the default x64-disabled config
    (and TPUs have no f64 at all). Evaluator moments are f64 sums whose
    cross-host merge must be exact, so ship the raw bits as uint32 pairs and
    reinterpret on the other side."""
    from jax.experimental import multihost_utils

    x = np.ascontiguousarray(np.atleast_1d(np.asarray(x, np.float64)))
    bits = x.view(np.uint32).reshape(x.shape + (2,))
    gathered = np.ascontiguousarray(np.asarray(multihost_utils.process_allgather(bits)))
    return gathered.view(np.float64).reshape((gathered.shape[0],) + x.shape)


def assert_host_agreement(facts: "dict[str, float]", context: str = "") -> None:
    """Raise loudly when per-host facts disagree (no-op single-host).

    Gating a collective on a per-host fact — a weights file found via an env
    var, a stats `.npz` on local disk — is a pod deadlock waiting to happen:
    the hosts that have the file enter the allgather, the ones that don't
    skip it, and everybody hangs forever with no error. Callers allgather
    the gate facts through here FIRST (one tiny fixed-shape collective every
    host always runs) and get a RuntimeError naming the disagreeing fact and
    the per-host values instead of a silent hang.
    """
    if jax.process_count() == 1:
        return
    names = sorted(facts)
    vec = np.asarray([float(facts[k]) for k in names], np.float64)
    gathered = process_allgather_f64(vec)  # (nproc, len(names))
    if not (gathered == vec[None]).all():
        lines = [
            f"  {name}: " + " ".join(f"host{p}={gathered[p, i]:g}"
                                     for p in range(gathered.shape[0]))
            for i, name in enumerate(names)
            if not (gathered[:, i] == gathered[0, i]).all()
        ]
        raise RuntimeError(
            f"per-host facts disagree{' in ' + context if context else ''} "
            "(a collective gated on them would deadlock the pod):\n"
            + "\n".join(lines)
        )


def host_accessible(tree):
    """Make every array leaf of `tree` readable from host code.

    Fully addressable leaves pass through UNCHANGED (still on device — no
    transfer; over the TPU relay a forced fetch of flagship params would cost
    ~20 s). Leaves whose shards span processes (fsdp/tensor axes crossing
    host boundaries on a pod) are resharded to fully-replicated and fetched
    as numpy via `process_allgather`.

    Fully-REPLICATED leaves that span processes (plain data-parallel pods)
    also pass through: each host's local shard is the whole value, and JAX
    reads them directly — only genuinely cross-host-SHARDED leaves gather.

    COLLECTIVE when any leaf is cross-host-sharded: every process must call
    it at the same point (the periodic save/viz/eval blocks in the train
    CLIs do — their cadence is a pure function of the global step). Without
    this, `jax.device_get(state.gen_params)` in a main-process-only export
    raises on non-addressable arrays and an un-jitted `model.apply` on them
    deadlocks the pod."""
    from jax.experimental import multihost_utils

    def fix(x):
        if isinstance(x, jax.Array) and not (
            x.is_fully_addressable or x.is_fully_replicated
        ):
            # tiled=True: concatenate the per-process shards back into the
            # global value (the only mode JAX supports for global arrays)
            return multihost_utils.process_allgather(x, tiled=True)
        return x

    return jax.tree.map(fix, tree)


def host_local_mesh():
    """Context manager: neutralize the ambient multi-chip mesh for
    host-local computations on a pod.

    The train CLIs run their periodic viz/eval sampling inside the training
    ``with mesh:`` block, on host-gathered (fully addressable) params — a
    host-local computation, sometimes made by the main process alone. The
    Pallas attention kernels self-partition over the ambient mesh
    (nn/pallas_attention._kernel_mesh), which on a MULTI-PROCESS mesh would
    shard_map a single-host call over non-addressable devices (crash /
    pod deadlock) or pin outputs to the global mesh where ``np.asarray``
    on them raises. Entering a size-1 mesh makes ambient-mesh consumers
    see "no mesh" while leaving jit behavior otherwise unchanged (the jit
    cache is keyed by the mesh context, so traces stay consistent).

    The replacement is a SIZE-1 mesh, i.e. the kernels run unpartitioned.
    A host-local mesh over all local devices does not work instead: the
    host_accessible-gathered params stay committed to the global mesh
    (fully-replicated pass-through), and a shard_map over only the local
    devices then fails with "incompatible devices" — measured in
    tests/test_multiprocess.py::..._fused_attention_host_local_viz.
    Viz batches are tiny and the in-train eval is redundant per host
    anyway; the full 50k eval (cli/eval_maskbit) keeps its own per-host
    mesh-sharded sampler. No-op single-process, where the ambient mesh is
    already host-local and self-partitioning is safe and faster.
    """
    import contextlib

    if jax.process_count() == 1:
        return contextlib.nullcontext()
    return Mesh(np.asarray(jax.local_devices()[:1]).reshape(1, 1, 1),
                ("data", "fsdp", "tensor"))


def is_main_process() -> bool:
    return jax.process_index() == 0


def barrier(name: str = "barrier") -> None:
    """Cross-host barrier (no-op single-host)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def warmup_collective_rendezvous(mesh: Optional[Mesh] = None) -> None:
    """Form the Gloo device cliques while processes are still in lockstep.

    XLA's CPU collectives (Gloo) lazily create one context per participating
    device clique, each through a key-value rendezvous with a HARD-CODED 30 s
    window; a miss is fatal (`Gloo context initialization failed:
    DEADLINE_EXCEEDED: GetKeyValue() timed out`). The first collective of a
    compiled program runs the moment each process finishes compiling it, and
    on a loaded host the compile-time skew between processes can exceed the
    window. Running tiny collectives over every clique the later programs
    will use — the process-leader columns (the `process_allgather` /
    `sync_global_devices` route) and every mesh-axis subset (the GSPMD
    psum/all-gather groups inside jit'd steps) — right after
    `jax.distributed.initialize`, while the only skew is import time, creates
    the contexts once; the real programs then reuse them with no rendezvous.

    No-op single-process or off-CPU (TPU collectives ride ICI and rendezvous
    through the coordination service with generous timeouts).
    """
    if jax.process_count() <= 1 or jax.default_backend() != "cpu":
        return
    from itertools import combinations

    from jax.experimental import multihost_utils

    multihost_utils.process_allgather(np.zeros((1,), np.float32))

    if mesh is None:
        mesh = Mesh(np.asarray(jax.devices()), ("all",))
    axes = mesh.axis_names
    subsets = [
        s for r in range(1, len(axes) + 1) for s in combinations(axes, r)
    ]
    # one row per device, sharded over every mesh axis jointly; replicating
    # the output over subset S makes XLA all-gather across exactly S's cliques
    out_shardings = [
        NamedSharding(mesh, P(tuple(a for a in axes if a not in s)))
        for s in subsets
    ]
    rows = np.zeros((len(jax.local_devices()), 1), np.float32)
    arr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P(axes)), rows
    )
    fanout = jax.jit(
        lambda a: [a + 0.0 for _ in out_shardings], out_shardings=out_shardings
    )
    jax.block_until_ready(fanout(arr))
