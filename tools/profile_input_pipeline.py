"""Input-pipeline sustainment at pod rates (VERDICT r4 #7).

Question: can the tar pipeline FEED Stage-I training? The fastest measured
Stage-I step is 125.9 img/s/chip at 256/b32 (BENCHMARKS.md); a standard
8-chip v5e host must therefore source ~1169 img/s of decoded+augmented
images from its CPUs. This tool measures, end to end through the REAL
iterator (tar parse -> shuffle buffer -> decode pool -> transform), the
per-core throughput of each decode backend on ImageNet-like JPEGs, then
derives the cores-per-host requirement and the starvation threshold (the
chip count one core can sustain).

Also measures the TRAIN-LOOP view on this 1-vCPU VM: data_time vs
batch_time of next(train_iter) against a simulated accelerator step, which
is what the trainer's perf/data_time metric reports.

Run: PYTHONPATH=. python tools/profile_input_pipeline.py
"""

import io
import os
import sys
import tarfile
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image

from maskbit_tpu import native
from maskbit_tpu.data import tar_reader
from maskbit_tpu.data.transforms import TrainTransform

STAGE1_IMG_S_CHIP = 125.9   # 256px b32 flagship GAN step (BENCHMARKS.md r5)
STAGE2_IMG_S_CHIP = 184.5   # 256px b32 fused-dropout step
CHIPS_PER_HOST = 8
SIZES = [(375, 500), (333, 500), (500, 375), (480, 640), (768, 1024), (256, 256)]


def make_tar(n=256):
    rng = np.random.default_rng(0)
    tmp = tempfile.mkdtemp()
    path = os.path.join(tmp, "bench-0000.tar")
    with tarfile.open(path, "w") as tar:
        for i in range(n):
            h, w = SIZES[i % len(SIZES)]
            y, x = np.mgrid[0:h, 0:w]
            base = np.stack(
                [(x * 0.5) % 256, (y * 0.7) % 256, ((x + y) * 0.3) % 256], -1)
            noise = np.kron(rng.normal(0, 12, (h // 8 + 1, w // 8 + 1, 3)),
                            np.ones((8, 8, 1)))[:h, :w]
            arr = np.clip(base + noise, 0, 255).astype(np.uint8)
            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, format="JPEG", quality=90)
            data = buf.getvalue()
            for ext, payload in (("jpg", data), ("cls", b"1")):
                info = tarfile.TarInfo(f"{i:06d}.{ext}")
                info.size = len(payload)
                tar.addfile(info, io.BytesIO(payload))
    return path, n


def iterator_rate(path, n, backend, threads, repeats=3):
    """End-to-end img/s through the real TarImageDataset iterator."""
    best = None
    for _ in range(repeats):
        ds = tar_reader.TarImageDataset(
            path, TrainTransform(resolution=256, seed=0),
            resample=True, shuffle_buffer_size=64, seed=0,
            num_decode_threads=threads, decode_backend=backend,
        )
        it = iter(ds)
        for _ in range(16):
            next(it)  # warm the pool + fill the buffer
        t0 = time.perf_counter()
        for _ in range(n):
            next(it)
        dt = (time.perf_counter() - t0) / n
        best = dt if best is None else min(best, dt)
    return 1.0 / best


def train_loop_view(path, backend, batch=32, steps=8, step_s=32 / STAGE1_IMG_S_CHIP):
    """data_time vs batch_time exactly as the trainer measures them, through
    the PRODUCTION loader composition (decode pool -> batched() collate ->
    PrefetchIterator), with a sleeping stand-in for the accelerator step
    (the real chip computes asynchronously; what matters is whether
    next(loader) returns in time)."""
    ds = tar_reader.TarImageDataset(
        path, TrainTransform(resolution=256, seed=0),
        resample=True, shuffle_buffer_size=64, seed=0,
        num_decode_threads=4, decode_backend=backend,
    )
    loader = tar_reader.PrefetchIterator(
        tar_reader.batched(iter(ds), batch, drop_last=True))

    next(loader)  # warm the pool + prefetch queue
    data_times = []
    for _ in range(steps):
        t0 = time.perf_counter()
        next(loader)
        data_times.append(time.perf_counter() - t0)
        time.sleep(step_s)  # the accelerator "step"
    return float(np.mean(data_times)), step_s


def main():
    ncores = os.cpu_count()
    print(f"host cores: {ncores}; native available: {native.is_available()}")
    path, n = make_tar()

    need_s1 = STAGE1_IMG_S_CHIP * CHIPS_PER_HOST
    need_s2 = STAGE2_IMG_S_CHIP * CHIPS_PER_HOST
    print(f"\nrequired feed rate: Stage-I {need_s1:.0f} img/s/host, "
          f"Stage-II {need_s2:.0f} img/s/host ({CHIPS_PER_HOST} chips)\n")
    print("| backend | threads | img/s (this VM) | img/s/core | "
          "cores for Stage-I 8-chip | chips/core |")
    print("|---|---|---|---|---|---|")
    rows = [("thread", 1), ("thread", 2), ("process", 1), ("native", 1),
            ("native", 2)]
    results = {}
    for backend, threads in rows:
        if backend == "native" and not native.is_available():
            print(f"| {backend} | {threads} | (unavailable) | | | |")
            continue
        rate = iterator_rate(path, n, backend, threads)
        per_core = rate / min(threads, ncores)
        results[(backend, threads)] = per_core
        print(f"| {backend} | {threads} | {rate:6.1f} | {per_core:6.1f} | "
              f"{need_s1/per_core:5.1f} | "
              f"{per_core/STAGE1_IMG_S_CHIP:4.2f} |")

    for backend in ("thread", "native"):
        if backend == "native" and not native.is_available():
            continue
        dt, st = train_loop_view(path, backend)
        print(f"\ntrain-loop view ({backend}, 4 threads on {ncores} core(s)): "
              f"data_time {dt*1e3:.1f} ms vs step {st*1e3:.0f} ms per b32 "
              f"-> {dt/(dt+st)*100:.1f}% of the loop waiting on data "
              f"at {ncores}-core x 1-chip scale")


if __name__ == "__main__":
    main()
