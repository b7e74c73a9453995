"""Batch-inference HTTP server for class-conditional generation.

Production-serving surface beyond the reference's demo script (the
reference stops at demo_util.py sample-and-save; this serves the same
sampler as a long-lived process):

    python -m maskbit_tpu.cli.serve config=configs/generator/maskbit_generator_14bit.yaml \
        experiment.vqgan_checkpoint=... experiment.generator_checkpoint=... \
        serve.port=8000 serve.batch_size=24

Design (TPU-first):
  * ONE jit'd program (sampler + LFQ unpack + conv decode) compiled at a
    fixed serving batch at startup — requests are padded/chunked to that
    batch so there is exactly one executable, no recompiles ever.
  * stdlib-only HTTP (ThreadingHTTPServer); a lock serializes device work
    (one chip = one stream), threads overlap request parsing/serialization
    with device compute.
  * dynamic micro-batching: UNSEEDED requests from concurrent clients are
    aggregated by a device-worker thread into the fixed compiled batch
    (bounded queue + a short fill window), so N concurrent 1-label requests
    cost ~1 device call, not N. Requests with an explicit `seed` keep the
    deterministic serialized path (same bytes for the same seed).

Endpoints:
  GET  /healthz            -> {"status": "ok", "warm": true}
  POST /generate           body {"labels": [int,...], "seed": int?,
                                 "format": "npy"|"png"?}
       -> npy: raw npz bytes {"images": (n,h,w,3) uint8}
       -> png: a PNG grid (requires PIL, always present)

Request caps (config): serve.max_labels (default 2048) and
serve.max_body_bytes (default 1 MiB) bound per-request work and memory.
"""

from __future__ import annotations

import collections
import io
import json
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import jax
import jax.numpy as jnp
import numpy as np


class _PendingRequest:
    """One in-flight batched request: filled slot-by-slot by the worker."""

    __slots__ = ("result", "remaining", "event", "error")

    def __init__(self, n: int, h: int, w: int):
        self.result = np.empty((n, h, w, 3), np.uint8)
        self.remaining = n
        self.event = threading.Event()
        self.error: Exception | None = None


class GeneratorService:
    """Owns the compiled sampler; thread-safe generate()."""

    def __init__(self, config):
        from maskbit_tpu.cli.common import (
            enable_compilation_cache,
            load_generation_models,
            validate_generator_config,
        )
        from maskbit_tpu.sampling.sample import make_sampler
        from maskbit_tpu.utils.logger import setup_logger

        validate_generator_config(config)
        # restartable serving: the warmup compile is the whole startup cost
        # (~minutes over the relay); the persistent cache makes restarts warm
        enable_compilation_cache(config)
        self.logger = setup_logger(name="maskbit_serve")
        # shared loader (cli/common.py). fallback='zeros': a full-size real
        # init's several hundred samplers take minutes to compile over the
        # relay; cast_weights halves the serving weight HBM traffic.
        tokenizer, generator, self.tok_vars, self.gen_vars, sampling_cfg, _, _ = (
            load_generation_models(config, self.logger, fallback="zeros",
                                   cast_weights=True)
        )
        self.batch = int(config.select("serve.batch_size", 24))
        self.nclass = int(config.model.mlm_model.get("nclass", 1000))
        self.max_labels = int(config.select("serve.max_labels", 2048))
        self.max_body_bytes = int(config.select("serve.max_body_bytes", 1 << 20))
        # fill window AFTER the first pending label before dispatch; a
        # fraction of the ~1-3 s device step, so batching costs ~nothing
        self.batch_wait = float(config.select("serve.batch_wait_ms", 10)) / 1e3
        n_local = len(jax.local_devices())
        if n_local > 1 and self.batch % n_local == 0 and \
                config.select("serve.shard_local_devices", True):
            # multi-chip host: shard each serving batch over the local mesh
            # (weights replicated, batch on the data axis) — one jit runs on
            # every chip simultaneously, ~n_local x the throughput
            from maskbit_tpu.parallel.mesh import MeshConfig, local_mesh
            from maskbit_tpu.sampling.serve import make_sharded_sampler

            mesh = local_mesh(MeshConfig())
            self.logger.info(
                f"sharding serving batch {self.batch} over {n_local} local devices"
            )
            sharded = make_sharded_sampler(generator, tokenizer, sampling_cfg, mesh)
            self._sampler = lambda gv, tv, key, y: (sharded(gv, tv, key, y), None)
        else:
            self._sampler = make_sampler(generator, tokenizer, sampling_cfg, jit=True)
        self._lock = threading.Lock()
        self.warm = False
        self._default_seed = int(config.select("training.seed", 42))
        self.device_calls = 0  # observability: compiled-program invocations
        self._img_hw: tuple[int, int] | None = None
        self._units: collections.deque = collections.deque()
        self._units_cv = threading.Condition()
        self._batch_counter = 0
        self._stop = False
        self._worker: threading.Thread | None = None

    def warmup(self) -> float:
        t0 = time.perf_counter()
        imgs = self.generate([0] * self.batch, seed=0)
        dt = time.perf_counter() - t0
        self._img_hw = imgs.shape[1:3]
        self.warm = True
        # the micro-batcher starts only once the program is compiled and the
        # output shape is known
        self._worker = threading.Thread(target=self._worker_loop, daemon=True)
        self._worker.start()
        self.logger.info(f"warmup compile+run: {dt:.1f}s at batch {self.batch}")
        return dt

    def close(self) -> None:
        with self._units_cv:
            self._stop = True
            self._units_cv.notify_all()
        if self._worker is not None:
            self._worker.join(timeout=5)

    def _validate(self, labels) -> np.ndarray:
        labels = np.asarray(labels, np.int32)
        if labels.ndim != 1 or len(labels) == 0:
            raise ValueError("labels must be a non-empty 1-D int list")
        if len(labels) > self.max_labels:
            raise ValueError(f"at most {self.max_labels} labels per request")
        if labels.min() < 0 or labels.max() >= self.nclass:
            raise ValueError(f"labels must be in [0, {self.nclass})")
        return labels

    def generate(self, labels, seed=None) -> np.ndarray:
        """Deterministic path: same (labels, seed) -> same bytes. Chunks to
        the compiled batch under the device lock."""
        labels = self._validate(labels)
        seed = self._default_seed if seed is None else int(seed)
        out = []
        with self._lock:  # one compiled program, one device stream
            for i0 in range(0, len(labels), self.batch):
                chunk = labels[i0 : i0 + self.batch]
                padded = np.zeros((self.batch,), np.int32)
                padded[: len(chunk)] = chunk
                key = jax.random.fold_in(jax.random.key(seed), i0)
                images, _ = self._sampler(
                    self.gen_vars, self.tok_vars, key, jnp.asarray(padded)
                )
                self.device_calls += 1
                images = np.asarray(jnp.clip(images[: len(chunk)], 0.0, 1.0))
                out.append((images * 255.0 + 0.5).astype(np.uint8))
        return np.concatenate(out, axis=0)

    def generate_batched(self, labels, timeout: float = 600.0) -> np.ndarray:
        """Micro-batched path for unseeded requests: label slots from
        concurrent requests aggregate into one compiled-batch device call."""
        labels = self._validate(labels)
        if self._img_hw is None:  # not warmed up yet: fall back
            return self.generate(labels)
        pending = _PendingRequest(len(labels), *self._img_hw)
        with self._units_cv:
            for j, lab in enumerate(labels):
                self._units.append((pending, j, int(lab)))
            self._units_cv.notify()
        if not pending.event.wait(timeout):
            raise RuntimeError("generation timed out")
        if pending.error is not None:
            raise pending.error
        return pending.result

    def _worker_loop(self) -> None:
        while True:
            with self._units_cv:
                while not self._units and not self._stop:
                    self._units_cv.wait()
                if self._stop:
                    # fail queued requests fast instead of leaving their
                    # handler threads blocked until the 600 s wait timeout
                    while self._units:
                        pending, _, _ = self._units.popleft()
                        pending.error = RuntimeError("server shutting down")
                        pending.event.set()
                    return
            # short fill window: let concurrent requests join this batch
            deadline = time.monotonic() + self.batch_wait
            while len(self._units) < self.batch:
                rest = deadline - time.monotonic()
                if rest <= 0:
                    break
                time.sleep(min(rest, 0.002))
            with self._units_cv:
                take = min(self.batch, len(self._units))
                units = [self._units.popleft() for _ in range(take)]
            try:
                padded = np.zeros((self.batch,), np.int32)
                for i, (_, _, lab) in enumerate(units):
                    padded[i] = lab
                with self._lock:
                    self._batch_counter += 1
                    key = jax.random.fold_in(
                        jax.random.key(self._default_seed), self._batch_counter
                    )
                    images, _ = self._sampler(
                        self.gen_vars, self.tok_vars, key, jnp.asarray(padded)
                    )
                    self.device_calls += 1
                arr = np.asarray(jnp.clip(images[: len(units)], 0.0, 1.0))
                arr8 = (arr * 255.0 + 0.5).astype(np.uint8)
                for i, (pending, j, _) in enumerate(units):
                    pending.result[j] = arr8[i]
                    pending.remaining -= 1  # single worker thread: no race
                    if pending.remaining == 0:
                        pending.event.set()
            except Exception as e:  # noqa: BLE001 — fail the waiting requests
                self.logger.error(f"batched generate failed: {e!r}")
                for pending, _, _ in units:
                    pending.error = e
                    pending.event.set()


def _png_grid(images: np.ndarray) -> bytes:
    from PIL import Image

    n, h, w, _ = images.shape
    cols = int(np.ceil(np.sqrt(n)))
    rows = int(np.ceil(n / cols))
    grid = np.zeros((rows * h, cols * w, 3), np.uint8)
    for i, img in enumerate(images):
        r, c = divmod(i, cols)
        grid[r * h : (r + 1) * h, c * w : (c + 1) * w] = img
    buf = io.BytesIO()
    Image.fromarray(grid).save(buf, format="PNG")
    return buf.getvalue()


def make_handler(service: GeneratorService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # route through our logger
            service.logger.info("http: " + fmt % args)

        def _reply(self, code: int, body: bytes, ctype: str) -> None:
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _json(self, code: int, obj) -> None:
            self._reply(code, json.dumps(obj).encode(), "application/json")

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"status": "ok", "warm": service.warm,
                                 "batch_size": service.batch})
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/generate":
                self._json(404, {"error": "unknown path"})
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                if length > service.max_body_bytes:
                    self._json(400, {"error": f"request body over "
                                     f"{service.max_body_bytes} bytes"})
                    return
                req = json.loads(self.rfile.read(length) or b"{}")
                if req.get("seed") is not None:
                    # explicit seed: deterministic serialized path
                    images = service.generate(req.get("labels", []), req["seed"])
                else:
                    # unseeded: micro-batched with concurrent requests
                    images = service.generate_batched(req.get("labels", []))
                fmt = req.get("format", "npy")
                if fmt == "png":
                    self._reply(200, _png_grid(images), "image/png")
                else:
                    buf = io.BytesIO()
                    if fmt == "npz":  # opt-in: zlib costs ~0.2-0.4 s/batch
                        np.savez_compressed(buf, images=images)
                    else:  # default: uncompressed (localhost, bandwidth free)
                        np.savez(buf, images=images)
                    self._reply(200, buf.getvalue(), "application/octet-stream")
            except ValueError as e:
                self._json(400, {"error": str(e)})
            except Exception as e:  # noqa: BLE001 — serving must not die
                service.logger.error(f"/generate failed: {e!r}")
                self._json(500, {"error": repr(e)})

    return Handler


def main(argv=None, serve_forever: bool = True):
    from maskbit_tpu.core.config import config_from_cli

    config = config_from_cli(argv if argv is not None else sys.argv[1:])
    service = GeneratorService(config)
    service.warmup()
    port = int(config.select("serve.port", 8000))
    server = ThreadingHTTPServer(("127.0.0.1", port), make_handler(service))
    service.logger.info(f"serving on 127.0.0.1:{server.server_address[1]}")
    if serve_forever:
        server.serve_forever()
    return server, service


if __name__ == "__main__":
    main()
