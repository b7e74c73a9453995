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

Endpoints:
  GET  /healthz            -> {"status": "ok", "warm": true}
  POST /generate           body {"labels": [int,...], "seed": int?,
                                 "format": "npy"|"png"?}
       -> npy: raw npz bytes {"images": (n,h,w,3) uint8}
       -> png: a PNG grid (requires PIL, always present)
"""

from __future__ import annotations

import io
import json
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import jax
import jax.numpy as jnp
import numpy as np


class GeneratorService:
    """Owns the compiled sampler; thread-safe generate()."""

    def __init__(self, config):
        from maskbit_tpu.cli.common import (
            load_generation_models,
            validate_generator_config,
        )
        from maskbit_tpu.sampling.sample import make_sampler
        from maskbit_tpu.utils.logger import setup_logger

        validate_generator_config(config)
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
        self._sampler = make_sampler(generator, tokenizer, sampling_cfg, jit=True)
        self._lock = threading.Lock()
        self.warm = False
        self._default_seed = int(config.select("training.seed", 42))

    def warmup(self) -> float:
        t0 = time.perf_counter()
        self.generate([0] * self.batch, seed=0)
        dt = time.perf_counter() - t0
        self.warm = True
        self.logger.info(f"warmup compile+run: {dt:.1f}s at batch {self.batch}")
        return dt

    def generate(self, labels, seed=None) -> np.ndarray:
        """labels: list[int] any length -> (n, h, w, 3) uint8."""
        labels = np.asarray(labels, np.int32)
        if labels.ndim != 1 or len(labels) == 0:
            raise ValueError("labels must be a non-empty 1-D int list")
        if labels.min() < 0 or labels.max() >= self.nclass:
            raise ValueError(f"labels must be in [0, {self.nclass})")
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
                images = np.asarray(jnp.clip(images[: len(chunk)], 0.0, 1.0))
                out.append((images * 255.0 + 0.5).astype(np.uint8))
        return np.concatenate(out, axis=0)


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
                req = json.loads(self.rfile.read(length) or b"{}")
                images = service.generate(req.get("labels", []), req.get("seed"))
                if req.get("format", "npy") == "png":
                    self._reply(200, _png_grid(images), "image/png")
                else:
                    buf = io.BytesIO()
                    np.savez_compressed(buf, images=images)
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
