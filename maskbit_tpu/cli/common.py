"""Shared CLI plumbing for the train/eval entry points.

Covers the reference's script preamble (scripts/train_tokenizer.py:41-100):
workspace dirs from $WORKSPACE, config save, seeding, logger/tracker setup,
data construction — plus TPU-specific: mesh creation and a synthetic-data
fallback so every entry point runs end-to-end without an ImageNet copy.
"""

from __future__ import annotations

import os
import time
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from maskbit_tpu.core.config import Config
from maskbit_tpu.data.tar_reader import SimpleImagenet, expand_shard_pattern
from maskbit_tpu.parallel.mesh import (
    MeshConfig,
    create_mesh,
    is_main_process,
    warmup_collective_rendezvous,
)
from maskbit_tpu.utils.logger import setup_logger
from maskbit_tpu.utils.tracker import create_tracker


def validate_generator_config(config: Config) -> None:
    """Fail fast on inconsistent token geometry (a silent-NaN footgun:
    out-of-range token ids fill embeddings with NaN under jnp.take)."""
    import math

    vq = config.model.vq_model
    mlm = config.model.mlm_model
    codebook_size = vq.get("codebook_size", 1024)
    bits = int(math.log2(codebook_size))
    if 2**bits != codebook_size:
        raise ValueError(f"codebook_size {codebook_size} is not a power of two")
    if vq.get("quantizer_type", "lookup-free") == "lookup-free" and vq.get("token_size") != bits:
        raise ValueError(
            f"lookup-free tokenizer: token_size {vq.get('token_size')} must equal "
            f"log2(codebook_size) = {bits}"
        )
    splits = mlm.get("codebook_splits", 1)
    if bits % splits != 0:
        raise ValueError(f"codebook_splits {splits} must divide token bits {bits}")
    res = config.select("dataset.preprocessing.resolution", 256)
    stride = mlm.get("input_stride", 16)
    tok_stride = 2 ** (vq.get("num_resolutions", 5) - 1)
    if stride != tok_stride:
        raise ValueError(
            f"mlm_model.input_stride {stride} must match the tokenizer downsample "
            f"factor 2^(num_resolutions-1) = {tok_stride}"
        )
    if mlm.get("img_size", 256) != res:
        raise ValueError(
            f"mlm_model.img_size {mlm.get('img_size', 256)} must match "
            f"dataset resolution {res}"
        )


def resolve_compute_dtype(config: Config):
    mp = config.select("training.mixed_precision", "no")
    return jnp.bfloat16 if mp in ("bf16", "bfloat16") else jnp.float32


def reset_optimizer_counts(opt_state):
    """Zero every step-counter leaf (`count`, `gradient_step`, `mini_step`)
    in an optax state while keeping the moments (mu/nu) — the JAX analogue
    of the reference's `resume_lr_scheduler: false`, which drops the LR
    schedulers from the accelerate state before load so the schedule
    restarts while the optimizer is kept (train_tokenizer.py:308-329,
    train_maskbit.py:313-332)."""
    import jax.tree_util as jtu

    names = {"count", "gradient_step", "mini_step"}

    def fix(path, leaf):
        name = getattr(path[-1], "name", None) if path else None
        if name in names:
            return jnp.zeros_like(leaf)
        return leaf

    return jtu.tree_map_with_path(fix, opt_state)


def maybe_init_distributed() -> None:
    """Multi-host init (one process per host on a pod slice).

    Gated by MASKBIT_MULTIHOST=1 since single-host runs (and the CI CPU mesh)
    must not call jax.distributed.initialize.
    """
    if os.environ.get("MASKBIT_MULTIHOST", "0") == "1":
        jax.distributed.initialize()


def enable_compilation_cache(config: Config | None = None) -> None:
    """Persistent XLA compilation cache for every long-lived entry point.

    Compiles over the TPU relay cost ~2 min per jit'd program, and serve
    restarts / repeated evals re-pay all of them; the cache is
    content-addressed and compiler-version-keyed, so reuse is safe. No-op
    when a cache dir is already configured (the test conftest sets its own).
    Opt out with experiment.compilation_cache=false (or
    MASKBIT_COMPILE_CACHE=0); dir override via
    experiment.compilation_cache_dir (or MASKBIT_COMPILE_CACHE_DIR)."""
    if jax.config.jax_compilation_cache_dir:
        return
    if os.environ.get("MASKBIT_COMPILE_CACHE") == "0":
        return  # explicit env opt-out wins over any config value
    enabled = True
    if config is not None:
        enabled = bool(config.select("experiment.compilation_cache", enabled))
    if not enabled:
        return
    cache_dir = os.environ.get("MASKBIT_COMPILE_CACHE_DIR")
    if config is not None:
        cache_dir = config.select("experiment.compilation_cache_dir", cache_dir)
    if not cache_dir:
        from maskbit_tpu.utils.paths import user_cache_dir

        cache_dir = user_cache_dir("xla_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Persist only genuinely expensive programs. Relay compiles take minutes,
    # so they always qualify; sub-second init programs (truncated_normal and
    # friends) hover around the 1s default on a loaded host and would churn
    # the cache with per-run writes (measured: demo cache grew 4->6->8 across
    # identical runs before this was raised).
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def setup_experiment(config: Config, subdir: str = ""):
    """Workspace dirs, logger, tracker, seed, mesh — returns a context dict."""
    maybe_init_distributed()
    enable_compilation_cache(config)
    workspace = os.environ.get("WORKSPACE", "./workspace")
    name = config.select("experiment.name", "run")
    output_dir = os.path.join(workspace, name, subdir) if subdir else os.path.join(workspace, name)
    os.makedirs(output_dir, exist_ok=True)

    logger = setup_logger(
        "maskbit_tpu", output_file=os.path.join(output_dir, "log.txt")
    )
    if is_main_process():
        config.save_yaml(os.path.join(output_dir, "config.yaml"))
        tracker = create_tracker(
            config.select("experiment.logger", "jsonl"),
            output_dir,
            project=config.select("experiment.project", "maskbit_tpu"),
            run_name=name,
            config=config.to_dict(),
        )
    else:
        tracker = create_tracker("none", output_dir)

    mesh = create_mesh(MeshConfig.from_config(config))
    warmup_collective_rendezvous(mesh)
    seed = int(config.select("training.seed", 42))
    return dict(
        output_dir=output_dir, logger=logger, tracker=tracker, mesh=mesh, seed=seed
    )


def synthetic_batches(batch_size: int, resolution: int, seed: int = 0) -> Iterator[dict]:
    """Random image/label batches — fallback when no shards are available."""
    rng = np.random.default_rng(seed)
    while True:
        yield {
            "image": rng.uniform(size=(batch_size, resolution, resolution, 3)).astype(np.float32),
            "class_id": rng.integers(0, 1000, size=(batch_size,)).astype(np.int32),
        }


def build_dataloaders(config: Config, logger, global_batch_size: int):
    """SimpleImagenet when shards exist; synthetic fallback otherwise.

    Returns (train_iter_factory, eval_iter_factory, is_synthetic)."""
    params = config.dataset.params
    prep = config.dataset.preprocessing
    resolution = prep.get("resolution", 256)
    train_shards = params.get("train_shards_path_or_url", "")
    shards_exist = False
    try:
        expanded = expand_shard_pattern(train_shards)
        shards_exist = bool(expanded) and os.path.exists(expanded[0])
    except Exception:
        pass

    if not shards_exist:
        logger.warning(
            f"Train shards {train_shards!r} not found — using SYNTHETIC data. "
            "Point dataset.params.train_shards_path_or_url at real shards for training."
        )
        per_host = global_batch_size // jax.process_count()
        make_train = lambda: synthetic_batches(per_host, resolution, seed=0)
        make_eval = lambda: iter(
            [next(synthetic_batches(per_host, resolution, seed=1)) for _ in range(2)]
        )
        return make_train, make_eval, True

    data = SimpleImagenet(
        train_shards_path_or_url=train_shards,
        eval_shards_path_or_url=params.get("eval_shards_path_or_url", train_shards),
        num_train_examples=config.select("experiment.max_train_examples", 1_281_167),
        per_device_batch_size=config.select("training.per_device_batch_size", 16),
        global_batch_size=global_batch_size,
        num_workers_per_device=params.get("num_workers_per_device", 8),
        resolution=resolution,
        shuffle_buffer_size=params.get("shuffle_buffer_size", 1000),
        min_scale=prep.get("min_scale", 0.8),
        use_aspect_ratio_aug=prep.get("use_aspect_ratio_aug", True),
        use_random_crop=prep.get("use_random_crop", True),
        interpolation=prep.get("interpolation", "bilinear"),
        seed=int(config.select("training.seed", 42)),
    )
    return (lambda: iter(data.train_dataloader)), (lambda: data.eval_dataloader), False


def build_perceptual(config: Config, logger):
    """(apply_fn, variables) for the configured perceptual loss, or (None, None).

    Pretrained backbone weights are loaded from env-configured paths:
      MASKBIT_RESNET50_WEIGHTS  — torchvision resnet50 state dict (.pth)
      MASKBIT_LPIPS_WEIGHTS     — LPIPS lin-head weights (vgg_lpips.pth)
      MASKBIT_VGG16_WEIGHTS     — torchvision vgg16 state dict (.pth)
    Without weights the loss falls back to 'none' (zeros) with a warning —
    quantitative training parity requires the real weights.
    """
    name = config.select("losses.perceptual_loss", "none")
    if name == "none" or config.select("losses.perceptual_weight", 0.0) == 0.0:
        return None, None

    if name in ("resnet50", "convnext_s"):
        from maskbit_tpu.losses.perceptual import PerceptualLoss, convert_resnet50_state

        env = "MASKBIT_RESNET50_WEIGHTS" if name == "resnet50" else "MASKBIT_CONVNEXT_WEIGHTS"
        path = os.environ.get(env, "")
        if not os.path.exists(path):
            logger.warning(
                f"Perceptual backbone {name!r} weights unavailable "
                f"({env}={path!r}); disabling perceptual loss."
            )
            return None, None
        from maskbit_tpu.compat.torch_convert import load_torch_state_dict

        module = PerceptualLoss(
            model_name=name,
            compute_on_logits=config.select("losses.perceptual_loss_on_logits", True),
        )
        state = load_torch_state_dict(path)
        if name == "resnet50":
            variables = convert_resnet50_state(state)
        else:
            from maskbit_tpu.losses.convnext import convert_convnext_small_state

            variables = convert_convnext_small_state(state)
        return (lambda v, a, b: module.apply(v, a, b)), variables

    if name == "lpips":
        from maskbit_tpu.losses.lpips import (
            LPIPS,
            bundled_lin_weights_path,
            load_lpips_params,
        )

        # lin heads are bundled (converted from the reference's in-repo
        # pretrained/vgg_lpips.pth); the VGG16 backbone stays env-gated
        lin_path = os.environ.get("MASKBIT_LPIPS_WEIGHTS", bundled_lin_weights_path())
        vgg_path = os.environ.get("MASKBIT_VGG16_WEIGHTS", "")
        if not (os.path.exists(lin_path) and os.path.exists(vgg_path)):
            missing = []
            if not os.path.exists(lin_path):
                missing.append(f"MASKBIT_LPIPS_WEIGHTS={lin_path!r}")
            if not os.path.exists(vgg_path):
                missing.append(f"MASKBIT_VGG16_WEIGHTS={vgg_path!r}")
            logger.warning(
                f"LPIPS weights unavailable ({', '.join(missing)}); "
                "disabling perceptual loss."
            )
            return None, None
        module = LPIPS()
        variables = load_lpips_params(lin_path, vgg_path)
        return (lambda v, a, b: module.apply(v, a, b)), variables

    raise ValueError(f"Perception loss {name} is not supported.")


def load_generation_models(config, logger, fallback: str = "random",
                           cast_weights: bool = False):
    """Shared checkpoint-or-smoke loading for the generation entry points
    (eval_maskbit / serve): returns
    (tokenizer, generator, tok_vars, gen_vars, sampling_cfg, res, dtype).

    fallback: 'random' = real init (meaningful smoke metrics, fast to
    compile at test scale); 'zeros' = shape-only init (a full-size init's
    several hundred samplers take minutes to compile over the TPU relay).
    cast_weights: store weights in the compute dtype (serving: halves the
    weight HBM traffic; eval keeps f32 storage for metric fidelity).
    """
    import jax

    from maskbit_tpu.core.checkpoint import load_pretrained
    from maskbit_tpu.models.generator import make_generator
    from maskbit_tpu.models.tokenizer import ConvVQModel
    from maskbit_tpu.sampling.sample import SamplingConfig

    vq_cfg = config.model.vq_model
    mlm_cfg = config.model.mlm_model
    dtype = jnp.bfloat16 if config.select("training.mixed_precision", "bf16") in (
        "bf16", "bfloat16") else jnp.float32

    tokenizer = ConvVQModel.from_config(vq_cfg, dtype=dtype)
    generator = make_generator(
        mlm_cfg.get("model_cls", "lfq_bert"), mlm_cfg, vq_cfg, dtype=dtype
    )
    res = config.select("dataset.preprocessing.resolution", 256)

    def init_or_zeros(init_fn, *args):
        if fallback == "zeros":
            shapes = jax.eval_shape(init_fn, jax.random.key(0), *args)
            return jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
        return init_fn(jax.random.key(0), *args)

    tok_path = config.select("experiment.vqgan_checkpoint", "")
    gen_path = config.select("experiment.generator_checkpoint", "")
    if tok_path and os.path.exists(tok_path):
        tok_vars = load_pretrained(tok_path)
    else:
        logger.warning(
            f"tokenizer checkpoint missing — {fallback.upper()} weights (smoke mode)"
        )
        tok_vars = init_or_zeros(tokenizer.init, jnp.zeros((1, res, res, 3)))
    if gen_path and os.path.exists(gen_path):
        gen_vars = load_pretrained(gen_path)
    else:
        logger.warning(
            f"generator checkpoint missing — {fallback.upper()} weights (smoke mode)"
        )
        gen_vars = init_or_zeros(
            generator.init,
            jnp.zeros((1, generator.seq_len, generator.codebook_splits), jnp.int32),
            jnp.zeros((1,), jnp.int32),
        )
    if cast_weights and dtype != jnp.float32:
        cast = lambda t: jax.tree.map(
            lambda x: x.astype(dtype)
            if getattr(x, "dtype", None) == jnp.float32 else x, t)
        gen_vars, tok_vars = cast(gen_vars), cast(tok_vars)

    sampling_cfg = SamplingConfig.from_config(mlm_cfg, vq_cfg)._replace(
        patch_size=res // 2 ** (vq_cfg.get("num_resolutions", 5) - 1)
    )
    return tokenizer, generator, tok_vars, gen_vars, sampling_cfg, res, dtype


class ProfilerHook:
    """jax.profiler trace over a configured step window.

    Enable with `experiment.profile_steps="10-15"` (inclusive); traces land
    in <output_dir>/profile for xprof/tensorboard. (The reference has no
    profiler integration; SURVEY §5 calls for one in the rebuild.)
    """

    def __init__(self, output_dir: str, spec: str = ""):
        self._dir = os.path.join(output_dir, "profile")
        self._start, self._stop = None, None
        if spec:
            lo, _, hi = str(spec).partition("-")
            self._start, self._stop = int(lo), int(hi or lo)
        self._active = False

    def step(self, global_step: int) -> None:
        if self._start is None:
            return
        if global_step == self._start and not self._active:
            jax.profiler.start_trace(self._dir)
            self._active = True
        elif global_step > self._stop and self._active:
            jax.profiler.stop_trace()
            self._active = False

    def close(self) -> None:
        if self._active:
            jax.profiler.stop_trace()
            self._active = False


class GracefulShutdown:
    """Preemption-safe training: catch SIGTERM, let the in-flight step
    finish, then the train loop writes a final BLOCKING checkpoint and exits
    cleanly, so resume-latest continues from the exact step.

    TPU pods are preempted with SIGTERM + a grace window; the reference's
    resume contract (scripts/train_tokenizer.py:298-331) otherwise loses up
    to `save_every` steps. The handler only sets a flag — all device/IO work
    happens in the loop thread, outside async-signal context.

    Multi-host: the final checkpoint is a COLLECTIVE Orbax save, so the
    stop decision must be global — if SIGTERM lands on only some hosts
    (delivery skew during a preemption), a local decision would deadlock
    the save against hosts still training. `should_stop()` therefore
    OR-reduces the local flag across processes. The reduce is a blocking
    host-side collective that would break the host's async run-ahead if
    issued every step, so it runs every `check_every` steps (all hosts
    agree on WHICH steps via the global step counter — collectives must
    match up); preemption grace windows are tens of seconds, so reacting
    within check_every steps is ample."""

    def __init__(self, logger=None, check_every: int = 8):
        import signal

        self.requested = False
        self.check_every = max(1, int(check_every))
        self._stopped = False  # sticky once the global decision fires
        self._logger = logger
        try:
            self._prev = signal.signal(signal.SIGTERM, self._handle)
        except ValueError:  # not in the main thread (e.g. tests): stay inert
            self._prev = None

    def _handle(self, signum, frame):
        self.requested = True
        if self._logger is not None:
            self._logger.warning(
                "SIGTERM received — finishing the in-flight step, then "
                "writing a final checkpoint and exiting"
            )

    def should_stop(self, step: int = 0) -> bool:
        """Global stop decision: true on EVERY host iff any host was
        signaled, so all hosts enter the final collective save together.
        Pass the global step; the cross-host reduce runs only on steps
        divisible by check_every (single-host: immediate, no collective)."""
        if self._stopped:
            return True
        if jax.process_count() == 1:
            self._stopped = self.requested
            return self._stopped
        if step % self.check_every != 0:
            return False
        from jax.experimental import multihost_utils

        flags = multihost_utils.process_allgather(
            np.asarray([self.requested], np.int32)
        )
        self._stopped = bool(np.any(flags))
        return self._stopped


class StepTimer:
    """samples/sec + data/batch time meters (reference :335-348,442-468)."""

    def __init__(self):
        from maskbit_tpu.utils.meter import AverageMeter

        self.batch_time = AverageMeter()
        self.data_time = AverageMeter()
        self._end = time.time()

    def data_tick(self):
        self.data_time.update(time.time() - self._end)

    def batch_tick(self):
        self.batch_time.update(time.time() - self._end)
        self._end = time.time()
