"""Measure the serving entry point on the chip (VERDICT r2 item 8).

Starts cli/serve.py in-process (flagship 14-bit config, zero weights — the
compiled program is identical to production), drives it over real HTTP, and
prints a latency/throughput table: single-label latency, full-batch
latency, sustained concurrent full-batch throughput, and the micro-batching
aggregation factor for concurrent 1-label clients.

Run:  PYTHONPATH=.:/root/.axon_site python -u tools/profile_serve.py
"""

import io
import json
import os
import statistics
import sys
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import yaml


def post(base, payload, timeout=600):
    req = urllib.request.Request(
        f"{base}/generate", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    t0 = time.perf_counter()
    with urllib.request.urlopen(req, timeout=timeout) as r:
        body = r.read()
    dt = time.perf_counter() - t0
    images = np.load(io.BytesIO(body))["images"]
    return dt, images


def main():
    from maskbit_tpu.cli.serve import main as serve_main

    batch = int(os.environ.get("SERVE_BATCH", "24"))
    cfg = {
        "experiment": {"name": "serve_prof", "logger": "jsonl", "resume": False,
                       "vqgan_checkpoint": "", "generator_checkpoint": ""},
        "training": {"per_device_batch_size": 2, "mixed_precision": "bf16",
                     "seed": 0},
        "serve": {"port": 0, "batch_size": batch, "batch_wait_ms": 15},
    }
    cfg_path = "/tmp/serve_prof.yaml"
    base_cfg = "configs/generator/maskbit_generator_14bit.yaml"
    base_tree = yaml.safe_load(open(base_cfg))
    base_tree.update(cfg)
    base_tree.setdefault("experiment", {}).update(cfg["experiment"])
    with open(cfg_path, "w") as f:
        yaml.safe_dump(base_tree, f)

    server, service = serve_main([f"config={cfg_path}"], serve_forever=False)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    print(f"serving batch={service.batch} on {base}")

    # single-label latency (seeded path, includes HTTP + npz overhead)
    lat1 = [post(base, {"labels": [i % 1000], "seed": i})[0] for i in range(3)]
    print(f"1-label seeded request latency: {min(lat1)*1e3:.0f} ms")

    # full-batch latency
    latB = [post(base, {"labels": list(range(batch)), "seed": i})[0] for i in range(3)]
    print(f"{batch}-label request latency: {min(latB)*1e3:.0f} ms "
          f"({batch/min(latB):.2f} img/s)")

    # sustained concurrent full-batch throughput: 4 clients x 3 requests
    results = []
    lock = threading.Lock()

    def client(cid):
        for j in range(3):
            dt, imgs = post(base, {"labels": list(range(batch)), "seed": cid * 10 + j})
            with lock:
                results.append((dt, len(imgs)))

    t0 = time.perf_counter()
    threads = [threading.Thread(target=client, args=(c,)) for c in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    n_imgs = sum(n for _, n in results)
    lats = sorted(dt for dt, _ in results)
    print(f"4 concurrent clients x 3 x {batch} labels: {n_imgs} imgs in "
          f"{wall:.1f}s = {n_imgs/wall:.2f} img/s sustained; "
          f"p50 lat {statistics.median(lats)*1e3:.0f} ms, "
          f"p100 {lats[-1]*1e3:.0f} ms")

    # micro-batching: `batch` concurrent 1-label unseeded clients
    calls0 = service.device_calls
    errs = []

    def tiny(i):
        try:
            post(base, {"labels": [i % 1000]})
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    t0 = time.perf_counter()
    threads = [threading.Thread(target=tiny, args=(i,)) for i in range(batch)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    calls = service.device_calls - calls0
    assert not errs, errs
    print(f"{batch} concurrent 1-label unseeded requests: {calls} device "
          f"call(s) in {wall:.1f}s (no batching would be {batch} calls, "
          f"~{batch}x the latency)")

    server.shutdown()
    service.close()


if __name__ == "__main__":
    main()
