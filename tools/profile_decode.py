"""Benchmark the decode backends: PIL vs the native C++ kernel.

Realistic ImageNet-like JPEGs (mixed sizes around 500x375, quality 90),
TrainTransform geometry at 256px. Reports ms/img serial and with the
thread pool, per backend.

Run:  PYTHONPATH=. python tools/profile_decode.py
"""

import io
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image

from maskbit_tpu import native
from maskbit_tpu.data import tar_reader
from maskbit_tpu.data.transforms import TrainTransform

SIZES = [(375, 500), (333, 500), (500, 375), (480, 640), (768, 1024), (256, 256)]


def make_samples(n=64):
    rng = np.random.default_rng(0)
    samples = []
    for i in range(n):
        h, w = SIZES[i % len(SIZES)]
        # photographic-ish content: smooth gradients + noise octaves
        y, x = np.mgrid[0:h, 0:w]
        base = np.stack(
            [(x * 0.5) % 256, (y * 0.7) % 256, ((x + y) * 0.3) % 256], -1
        )
        noise = rng.normal(0, 12, (h // 8 + 1, w // 8 + 1, 3))
        noise = np.kron(noise, np.ones((8, 8, 1)))[:h, :w]
        arr = np.clip(base + noise, 0, 255).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="JPEG", quality=90)
        samples.append({"jpg": buf.getvalue(), "cls": b"1"})
    return samples


def bench(decode_fn, samples, transform, repeats=3):
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for i, s in enumerate(samples):
            decode_fn(s, transform, f"seed-{i}")
        times.append((time.perf_counter() - t0) / len(samples))
    return min(times)


def bench_threaded(backend, samples, threads=4, repeats=3):
    import itertools
    import tarfile
    import tempfile

    tmp = tempfile.mkdtemp()
    path = os.path.join(tmp, "bench-0000.tar")
    with tarfile.open(path, "w") as tar:
        for i, s in enumerate(samples):
            for ext in ("jpg", "cls"):
                info = tarfile.TarInfo(f"{i:06d}.{ext}")
                info.size = len(s[ext])
                import io as _io

                tar.addfile(info, _io.BytesIO(s[ext]))
    times = []
    n = len(samples)
    for _ in range(repeats):
        ds = tar_reader.TarImageDataset(
            path, TrainTransform(resolution=256, seed=0),
            resample=True, shuffle_buffer_size=1, seed=0,
            num_decode_threads=threads, decode_backend=backend,
        )
        it = iter(ds)
        next(it)  # warm the pool
        t0 = time.perf_counter()
        for _ in range(n):
            next(it)
        times.append((time.perf_counter() - t0) / n)
    return min(times)


def main():
    print(f"native available: {native.is_available()}")
    samples = make_samples()
    transform = TrainTransform(resolution=256, seed=0)

    t_pil = bench(tar_reader._decode_sample, samples, transform)
    print(f"PIL serial:    {t_pil*1e3:.2f} ms/img  ({1/t_pil:.0f} img/s/core)")
    t_nat = bench(tar_reader._decode_sample_native, samples, transform)
    print(f"native serial: {t_nat*1e3:.2f} ms/img  ({1/t_nat:.0f} img/s/core)  "
          f"{t_pil/t_nat:.2f}x")

    ncpu = os.cpu_count() or 1
    threads = min(4, max(2, ncpu))
    t_pil_t = bench_threaded("thread", samples, threads)
    print(f"PIL    x{threads} threads: {t_pil_t*1e3:.2f} ms/img ({1/t_pil_t:.0f} img/s)")
    t_nat_t = bench_threaded("native", samples, threads)
    print(f"native x{threads} threads: {t_nat_t*1e3:.2f} ms/img ({1/t_nat_t:.0f} img/s)  "
          f"{t_pil_t/t_nat_t:.2f}x")


if __name__ == "__main__":
    main()
