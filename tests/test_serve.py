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
