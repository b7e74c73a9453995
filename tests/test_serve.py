"""HTTP serving entry point: compile-once batch inference."""

import io
import json
import threading
import urllib.request

import numpy as np

from tests.test_cli_eval_demo import DATASET, TINY_MLM, TINY_VQ  # noqa: F401


def _cfg_dict():
    return {
        "experiment": {"name": "serve_t", "logger": "jsonl", "resume": False,
                       "vqgan_checkpoint": "", "generator_checkpoint": ""},
        "model": {"vq_model": TINY_VQ, "mlm_model": TINY_MLM},
        "dataset": DATASET,
        "training": {"per_device_batch_size": 2, "mixed_precision": "no", "seed": 0},
        "serve": {"port": 0, "batch_size": 2},
    }


def test_serve_generate(tmp_path):
    import yaml

    from maskbit_tpu.cli.serve import main

    cfg_path = tmp_path / "serve.yaml"
    cfg_path.write_text(yaml.safe_dump(_cfg_dict()))
    server, service = main([f"config={cfg_path}"], serve_forever=False)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        port = server.server_address[1]
        base = f"http://127.0.0.1:{port}"

        with urllib.request.urlopen(f"{base}/healthz") as r:
            health = json.loads(r.read())
        assert health["status"] == "ok" and health["warm"]

        # 3 labels > batch 2: exercises chunking + padding
        req = urllib.request.Request(
            f"{base}/generate",
            data=json.dumps({"labels": [1, 7, 282], "seed": 5}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as r:
            data = np.load(io.BytesIO(r.read()))
        images = data["images"]
        assert images.shape == (3, 32, 32, 3) and images.dtype == np.uint8

        # determinism: same seed -> same bytes
        with urllib.request.urlopen(urllib.request.Request(
            f"{base}/generate",
            data=json.dumps({"labels": [1, 7, 282], "seed": 5}).encode(),
            headers={"Content-Type": "application/json"},
        )) as r:
            again = np.load(io.BytesIO(r.read()))["images"]
        np.testing.assert_array_equal(images, again)

        # png format
        with urllib.request.urlopen(urllib.request.Request(
            f"{base}/generate",
            data=json.dumps({"labels": [1], "format": "png"}).encode(),
        )) as r:
            png = r.read()
        assert png[:8] == b"\x89PNG\r\n\x1a\n"

        # validation error -> 400
        try:
            urllib.request.urlopen(urllib.request.Request(
                f"{base}/generate", data=json.dumps({"labels": [5000]}).encode()))
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        server.shutdown()
        service.close()


def test_serve_sharded_over_local_mesh(tmp_path):
    """serve.batch_size divisible by the local device count: the service
    shards each compiled batch over the local mesh (8 virtual CPU devices
    here; chips on a real multi-chip host) and still serves correct
    per-request results through HTTP."""
    import jax
    import pytest
    import yaml

    if len(jax.local_devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from maskbit_tpu.cli.serve import main

    cfg = _cfg_dict()
    cfg["serve"] = {"port": 0, "batch_size": 8}
    cfg_path = tmp_path / "serve_sh.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    server, service = main([f"config={cfg_path}"], serve_forever=False)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        port = server.server_address[1]
        base = f"http://127.0.0.1:{port}"
        req = urllib.request.Request(
            f"{base}/generate",
            data=json.dumps({"labels": [1, 7, 282], "seed": 5}).encode(),
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            images = np.load(io.BytesIO(r.read()))["images"]
        assert images.shape == (3, 32, 32, 3) and images.dtype == np.uint8
        # unseeded path rides the micro-batcher over the sharded sampler
        with urllib.request.urlopen(urllib.request.Request(
            f"{base}/generate", data=json.dumps({"labels": [4]}).encode()
        ), timeout=120) as r:
            one = np.load(io.BytesIO(r.read()))["images"]
        assert one.shape == (1, 32, 32, 3)
    finally:
        server.shutdown()
        service.close()


def test_serve_micro_batching_and_caps(tmp_path):
    """Concurrent UNSEEDED requests aggregate into one compiled-batch device
    call (dynamic micro-batching, VERDICT r2 item 8) and the request caps
    (max labels / max body bytes, ADVICE r2) reject oversized requests."""
    import yaml

    from maskbit_tpu.cli.serve import main

    cfg = _cfg_dict()
    cfg["serve"] = {"port": 0, "batch_size": 4, "batch_wait_ms": 300,
                    "max_labels": 6, "max_body_bytes": 4096}
    cfg_path = tmp_path / "serve_mb.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    server, service = main([f"config={cfg_path}"], serve_forever=False)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        port = server.server_address[1]
        base = f"http://127.0.0.1:{port}"

        calls_before = service.device_calls
        results = [None] * 4
        errors = []

        def hit(i):
            try:
                req = urllib.request.Request(
                    f"{base}/generate", data=json.dumps({"labels": [i]}).encode()
                )
                with urllib.request.urlopen(req, timeout=120) as r:
                    results[i] = np.load(io.BytesIO(r.read()))["images"]
            except Exception as e:  # surfaced below
                errors.append(e)

        threads = [threading.Thread(target=hit, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=180)
        assert not errors, errors
        for i, imgs in enumerate(results):
            assert imgs is not None and imgs.shape == (1, 32, 32, 3)
        calls = service.device_calls - calls_before
        # 4 concurrent 1-label requests at batch 4: aggregated, not 4 calls
        # (<=2 allows one request to just miss the first fill window)
        assert calls <= 2, f"no micro-batching: {calls} device calls for 4 requests"

        # cap: too many labels -> 400
        try:
            urllib.request.urlopen(urllib.request.Request(
                f"{base}/generate", data=json.dumps({"labels": [0] * 7}).encode()))
            raise AssertionError("expected HTTP 400 (max_labels)")
        except urllib.error.HTTPError as e:
            assert e.code == 400

        # cap: oversized body -> 400 (never parsed)
        big = json.dumps({"labels": [0], "pad": "x" * 8192}).encode()
        try:
            urllib.request.urlopen(urllib.request.Request(f"{base}/generate", data=big))
            raise AssertionError("expected HTTP 400 (max_body_bytes)")
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        server.shutdown()
        service.close()
