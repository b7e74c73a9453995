"""Tar-shard input pipeline (webdataset-format, zero external deps).

Parity target: reference data/webdataset_reader.py (`SimpleImagenet`):
  * shards are .tar files of `{key}.jpg` + `{key}.cls` members
  * train: ResampledShards — shards sampled WITH replacement forever, no
    dataset resume by design (reference scripts/train_tokenizer.py:210-212),
    shuffle buffer, per-image transform, drop-last batching
  * eval: sequential shard list split across hosts/workers, no shuffle
  * `num_batches` / `num_samples` bookkeeping (:174-191)

TPU-first: per-host sharding comes from jax.process_index/count (no torch
DataLoader workers); decode/transform run in a thread pool feeding a bounded
prefetch queue so the accelerator never waits on JPEG decode; batches are
contiguous NHWC float32 numpy arrays ready for device_put.
"""

from __future__ import annotations

import io
import itertools
import os
import queue
import random
import re
import tarfile
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Dict, Iterator, List, Optional, Tuple

import numpy as np
from PIL import Image

from maskbit_tpu.data.transforms import EvalTransform, TrainTransform

_BRACE_RE = re.compile(r"^(.*)\{(\d+)\.\.(\d+)\}(.*)$")


def expand_shard_pattern(pattern) -> List[str]:
    """Expand 'imagenet-train-{0000..0252}.tar' into a shard list; also
    accepts a list of paths or a plain path/glob."""
    if isinstance(pattern, (list, tuple)):
        out: List[str] = []
        for p in pattern:
            out.extend(expand_shard_pattern(p))
        return out
    m = _BRACE_RE.match(pattern)
    if m:
        prefix, lo, hi, suffix = m.groups()
        width = len(lo)
        return [f"{prefix}{i:0{width}d}{suffix}" for i in range(int(lo), int(hi) + 1)]
    if any(ch in pattern for ch in "*?["):
        import glob

        return sorted(glob.glob(pattern))
    return [pattern]


def iterate_tar_samples(path: str) -> Iterator[Dict[str, bytes]]:
    """Group tar members by key prefix: {'__key__', 'jpg', 'cls', ...}."""
    with tarfile.open(path, "r") as tar:
        current_key: Optional[str] = None
        sample: Dict[str, bytes] = {}
        for member in tar:
            if not member.isfile():
                continue
            name = member.name
            if "." not in name:
                continue
            key, ext = name.split(".", 1)
            if key != current_key:
                if current_key is not None and sample:
                    yield dict(sample, __key__=current_key.encode())
                current_key = key
                sample = {}
            data = tar.extractfile(member)
            if data is not None:
                sample[ext.lower()] = data.read()
        if current_key is not None and sample:
            yield dict(sample, __key__=current_key.encode())


def _decode_sample(
    sample: Dict[str, bytes],
    transform: Callable,
    sample_seed: Optional[str] = None,
) -> Optional[Tuple[np.ndarray, int]]:
    img_bytes = None
    for ext in ("jpg", "jpeg", "png", "webp"):
        if ext in sample:
            img_bytes = sample[ext]
            break
    if img_bytes is None:
        return None
    label = int(sample["cls"].decode()) if "cls" in sample else -1
    img = Image.open(io.BytesIO(img_bytes))
    if sample_seed is not None and hasattr(transform, "rng"):
        # per-sample rng: augmentation is a pure function of (seed, process,
        # sample index) — the decode stream is bit-identical across the
        # serial/thread/process backends and across runs (determinism
        # contract, SURVEY §5)
        return transform(img, rng=random.Random(sample_seed)), label
    return transform(img), label


def _decode_sample_native(
    sample: Dict[str, bytes],
    transform: Callable,
    sample_seed: Optional[str] = None,
) -> Optional[Tuple[np.ndarray, int]]:
    """C++ decode backend: bytes -> crop -> resize -> flip in one native pass
    (maskbit_tpu/native). The crop/flip rng draws use the SAME functions and
    order as the PIL path, so augmentation geometry is identical for a given
    seed; only the resample arithmetic differs (~1 LSB vs PIL bilinear).
    Non-JPEG members and undecodable bytes fall back to the PIL path."""
    from maskbit_tpu import native
    from maskbit_tpu.data.transforms import TrainTransform, random_resized_crop_params

    img_bytes = None
    for ext in ("jpg", "jpeg"):
        if ext in sample:
            img_bytes = sample[ext]
            break
    if img_bytes is None:  # png/webp/...: PIL handles it
        return _decode_sample(sample, transform, sample_seed)
    interp = getattr(transform, "interpolation", "bilinear")
    if interp not in native.FILTERS:  # nearest/lanczos: PIL handles it
        return _decode_sample(sample, transform, sample_seed)
    label = int(sample["cls"].decode()) if "cls" in sample else -1
    try:
        w, h = native.decode_info(img_bytes)
    except ValueError:
        return _decode_sample(sample, transform, sample_seed)

    res = transform.resolution
    if sample_seed is not None:
        rng = random.Random(sample_seed)
    else:
        rng = getattr(transform, "rng", random.Random(0))
    is_train = isinstance(transform, TrainTransform)
    if is_train and transform.use_random_crop:
        top, left, ch, cw = random_resized_crop_params(
            h, w, (transform.min_scale, 1.0), transform.ratio, rng
        )
    else:
        s = min(w, h)
        top, left, ch, cw = (h - s) // 2, (w - s) // 2, s, s
    flip = is_train and rng.random() < 0.5
    try:
        out = native.decode_crop_resize(
            img_bytes, top, left, ch, cw, res, res, flip, interpolation=interp
        )
    except ValueError:
        return _decode_sample(sample, transform, sample_seed)
    return out.astype(np.float32) / 255.0, label


# --- process-pool decode backend -------------------------------------------
# JPEG decode in CPython threads is mostly GIL-free (PIL releases it), but on
# very wide pod hosts the residual GIL contention of transform/numpy code can
# cap throughput; this is the selectable escape hatch (same iterator API).
_WORKER_TRANSFORM: Optional[Callable] = None


def _decode_pool_init(transform: Callable) -> None:
    """Initializer for decode worker processes: bind the transform once per
    worker (instead of pickling it per sample). Augment randomness comes from
    the per-sample seed shipped with each work item, NOT worker identity, so
    streams are reproducible regardless of how work lands on workers."""
    global _WORKER_TRANSFORM
    _WORKER_TRANSFORM = transform


def _decode_in_worker(item: Tuple[Dict[str, bytes], Optional[str]]) -> Optional[Tuple[np.ndarray, int]]:
    sample, sample_seed = item
    return _decode_sample(sample, _WORKER_TRANSFORM, sample_seed)


class ShuffleBuffer:
    def __init__(self, size: int, rng: random.Random):
        self.size = size
        self.rng = rng
        self.buffer: list = []

    def __call__(self, iterator):
        for item in iterator:
            if len(self.buffer) < self.size:
                self.buffer.append(item)
                continue
            idx = self.rng.randrange(self.size)
            out, self.buffer[idx] = self.buffer[idx], item
            yield out
        self.rng.shuffle(self.buffer)
        yield from self.buffer
        self.buffer = []


class TarImageDataset:
    """Iterable dataset over tar shards with train/eval semantics."""

    def __init__(
        self,
        shards,
        transform: Callable,
        *,
        resample: bool = True,
        shuffle_buffer_size: int = 1000,
        seed: int = 0,
        process_index: int = 0,
        process_count: int = 1,
        num_decode_threads: int = 8,
        decode_backend: str = "thread",
    ):
        self.shards = expand_shard_pattern(shards)
        if not self.shards:
            raise ValueError(f"No shards matched {shards!r}")
        if decode_backend not in ("thread", "process", "native"):
            raise ValueError(
                f"decode_backend must be 'thread', 'process' or 'native', "
                f"got {decode_backend!r}"
            )
        if decode_backend == "native":
            from maskbit_tpu import native

            if not native.is_available():
                raise ValueError(
                    "decode_backend='native' but the C++ decoder could not "
                    f"be built: {native.build_error()}"
                )
        self.transform = transform
        self.resample = resample
        self.shuffle_buffer_size = shuffle_buffer_size
        self.seed = seed
        self.process_index = process_index
        self.process_count = process_count
        self.num_decode_threads = num_decode_threads
        self.decode_backend = decode_backend

    def _shard_iterator(self) -> Iterator[str]:
        if self.resample:
            # with-replacement resampling (webdataset ResampledShards);
            # different hosts decorrelate through the seed
            rng = random.Random(f"{self.seed}-{self.process_index}")
            while True:
                yield rng.choice(self.shards)
        else:
            # eval: split shards across hosts (split_by_worker analogue)
            yield from itertools.islice(
                self.shards, self.process_index, None, self.process_count
            )

    def __iter__(self) -> Iterator[Tuple[np.ndarray, int]]:
        rng = random.Random(f"{self.seed}-{self.process_index}-shuffle")

        def raw_samples():
            for shard in self._shard_iterator():
                yield from iterate_tar_samples(shard)

        samples = raw_samples()
        if self.resample and self.shuffle_buffer_size > 1:
            samples = ShuffleBuffer(self.shuffle_buffer_size, rng)(samples)

        # per-sample augment seed: sample order is deterministic (seeded
        # shuffle buffer, single-threaded producer), so keying the rng by
        # stream position makes the decoded stream identical across backends
        seed_base = f"{self.seed}-{self.process_index}-sample"
        indexed = ((s, f"{seed_base}-{i}") for i, s in enumerate(samples))

        # "native" runs the C++ kernel on the thread pool (it releases the
        # GIL for the whole decode+crop+resize, so threads scale on cores)
        decode_fn = (
            _decode_sample_native if self.decode_backend == "native" else _decode_sample
        )

        if self.num_decode_threads <= 1:
            for s, ss in indexed:
                decoded = decode_fn(s, self.transform, ss)
                if decoded is not None:
                    yield decoded
            return

        if self.decode_backend == "process":
            # spawn (not fork): the parent may hold live TPU/JAX runtime state
            import multiprocessing as mp
            from concurrent.futures import ProcessPoolExecutor

            pool = ProcessPoolExecutor(
                self.num_decode_threads,
                mp_context=mp.get_context("spawn"),
                initializer=_decode_pool_init,
                initargs=(self.transform,),
            )
            submit = lambda item: pool.submit(_decode_in_worker, item)
        else:
            pool = ThreadPoolExecutor(self.num_decode_threads)
            submit = lambda item: pool.submit(decode_fn, item[0], self.transform, item[1])

        with pool:
            window = 2 * self.num_decode_threads
            futures: "queue.Queue" = queue.Queue()
            sample_iter = iter(indexed)
            n_inflight = 0
            for item in itertools.islice(sample_iter, window):
                futures.put(submit(item))
                n_inflight += 1
            while n_inflight:
                fut = futures.get()
                n_inflight -= 1
                nxt = next(sample_iter, None)
                if nxt is not None:
                    futures.put(submit(nxt))
                    n_inflight += 1
                decoded = fut.result()
                if decoded is not None:
                    yield decoded


def batched(iterator, batch_size: int, drop_last: bool = True):
    """Collate (image, label) pairs into {'image': (b,h,w,c) f32, 'class_id': (b,)}."""
    batch_imgs, batch_labels = [], []
    for img, label in iterator:
        batch_imgs.append(img)
        batch_labels.append(label)
        if len(batch_imgs) == batch_size:
            yield {
                "image": np.stack(batch_imgs),
                "class_id": np.asarray(batch_labels, np.int32),
            }
            batch_imgs, batch_labels = [], []
    if batch_imgs and not drop_last:
        yield {
            "image": np.stack(batch_imgs),
            "class_id": np.asarray(batch_labels, np.int32),
        }


class PrefetchIterator:
    """Background-thread prefetch with a bounded queue."""

    _DONE = object()

    def __init__(self, iterable, buffer_size: int = 4):
        self._queue: "queue.Queue" = queue.Queue(maxsize=buffer_size)
        self._iterable = iterable
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._exception = None
        self._thread.start()

    def _worker(self):
        try:
            for item in self._iterable:
                self._queue.put(item)
        except BaseException as e:  # propagate into the consumer
            self._exception = e
        finally:
            self._queue.put(self._DONE)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._queue.get()
        if item is self._DONE:
            if self._exception is not None:
                raise self._exception
            raise StopIteration
        return item


class SimpleImagenet:
    """Facade matching the reference SimpleImagenet API
    (data/webdataset_reader.py:88-225): .train_dataloader/.eval_dataloader
    with num_batches/num_samples bookkeeping."""

    def __init__(
        self,
        train_shards_path_or_url,
        eval_shards_path_or_url,
        num_train_examples: int,
        per_device_batch_size: int,
        global_batch_size: int,
        num_workers_per_device: int = 8,
        resolution: int = 256,
        shuffle_buffer_size: int = 1000,
        min_scale: float = 0.8,
        use_aspect_ratio_aug: bool = True,
        use_random_crop: bool = True,
        interpolation: str = "bilinear",
        seed: int = 0,
        process_index: Optional[int] = None,
        process_count: Optional[int] = None,
        decode_backend: Optional[str] = None,
    ):
        import jax

        if decode_backend is None:
            decode_backend = os.environ.get("MASKBIT_DECODE_BACKEND", "thread")

        process_index = jax.process_index() if process_index is None else process_index
        process_count = jax.process_count() if process_count is None else process_count

        self.per_host_batch_size = global_batch_size // process_count
        num_batches = int(np.ceil(num_train_examples / global_batch_size))
        self.num_batches = num_batches
        self.num_samples = num_batches * global_batch_size

        train_transform = TrainTransform(
            resolution=resolution,
            min_scale=min_scale,
            use_aspect_ratio_aug=use_aspect_ratio_aug,
            use_random_crop=use_random_crop,
            interpolation=interpolation,
            seed=seed + process_index,
        )
        eval_transform = EvalTransform(resolution=resolution, interpolation=interpolation)

        self._train_dataset = TarImageDataset(
            train_shards_path_or_url, train_transform,
            resample=True, shuffle_buffer_size=shuffle_buffer_size,
            seed=seed, process_index=process_index, process_count=process_count,
            num_decode_threads=num_workers_per_device,
            decode_backend=decode_backend,
        )
        self._eval_dataset = TarImageDataset(
            eval_shards_path_or_url, eval_transform,
            resample=False, seed=seed,
            process_index=process_index, process_count=process_count,
            num_decode_threads=num_workers_per_device,
            decode_backend=decode_backend,
        )

    @property
    def train_dataloader(self):
        return PrefetchIterator(
            batched(iter(self._train_dataset), self.per_host_batch_size, drop_last=True)
        )

    @property
    def eval_dataloader(self):
        return batched(iter(self._eval_dataset), self.per_host_batch_size, drop_last=False)
