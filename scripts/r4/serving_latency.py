"""Warm serving latency: CM 1-NFE vs DDIM-10 (VERDICT r3 #6).

Starts the real HTTP service (ddpm_diffusion_model_tpu.serving) on a
consistency-student checkpoint and on its base checkpoint in turn, compiles
with one cold request, then times warm single-sample requests end to end
(HTTP + device).  One JSON line per row.

  python scripts/r4/serving_latency.py --cm-ckpt /tmp/r4/cm \
      --base-ckpt /tmp/r4/ck/cfg6_v_last --config scripts/r4/cfg6_v.json
"""

from __future__ import annotations

import argparse
import json
import signal
import subprocess
import sys
import time
import urllib.request

sys.path.insert(0, ".")


def _wait_healthz(port, timeout=600):
    t0 = time.time()
    while time.time() - t0 < timeout:
        try:
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/healthz", timeout=5) as r:
                return json.loads(r.read())
        except Exception:  # noqa: BLE001
            time.sleep(1.0)
    raise TimeoutError("service never became healthy")


def _get(port, path, timeout=1200):
    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}{path}", timeout=timeout) as r:
        return r.read()


def measure(ckpt, config, query, label, port, reps=20):
    proc = subprocess.Popen(
        [sys.executable, "-m", "ddpm_diffusion_model_tpu.serving",
         "--ckpt", ckpt, "--config", config, "--port", str(port)],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    try:
        h = _wait_healthz(port)
        t0 = time.perf_counter()
        _get(port, query)  # cold: compile
        cold = time.perf_counter() - t0
        lats = []
        for i in range(reps):
            t0 = time.perf_counter()
            _get(port, query + f"&seed={100 + i}")
            lats.append(time.perf_counter() - t0)
        lats.sort()
        row = {"row": label, "ckpt": ckpt, "query": query,
               "cold_s": round(cold, 2),
               "warm_p50_s": round(lats[len(lats) // 2], 4),
               "warm_p95_s": round(lats[int(len(lats) * 0.95) - 1], 4),
               "reps": reps, "consistency": h.get("consistency")}
        print(json.dumps(row), flush=True)
    finally:
        proc.send_signal(signal.SIGTERM)  # graceful drain
        try:
            proc.wait(timeout=60)
        except subprocess.TimeoutExpired:
            proc.kill()


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--cm-ckpt", required=True)
    ap.add_argument("--base-ckpt", required=True)
    ap.add_argument("--config", required=True)
    ap.add_argument("--port", type=int, default=8123)
    ap.add_argument("--class-id", type=int, default=2)
    args = ap.parse_args(argv)

    cid = args.class_id
    measure(args.cm_ckpt, args.config,
            f"/sample?n=1&sampler=cm&steps=1&class_id={cid}&format=npy",
            "cm_1nfe", args.port)
    measure(args.base_ckpt, args.config,
            f"/sample?n=1&sampler=ddim&steps=10&class_id={cid}"
            f"&guidance=3.0&format=npy",
            "ddim10_w3", args.port)


if __name__ == "__main__":
    main()
