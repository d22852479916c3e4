"""Serving under load (VERDICT r4 #5): sustained throughput with N
concurrent clients against the real HTTP service on the chip.

The r4 single-request latency test sat on the ~40 ms tunnel+HTTP floor and
could not separate the routes; this measures what the coalescer was built
for — N clients hammering the same route, so window-mates merge into one
device batch.  Per (route, concurrency): served samples/s, client p50/p95,
and the coalesced batch-size histogram from /metrics (the counter landed
in r5 exactly for this).

  python scripts/r5/serving_load.py --ckpt /tmp/r4/ck/cfg6_v_last \
      --config scripts/r4/cfg6_v.json --cm-ckpt /tmp/r4/cm6k \
      --out /tmp/r5/serving_load.jsonl
"""

from __future__ import annotations

import argparse
import json
import signal
import subprocess
import sys
import threading
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


def _get(port, path, timeout=1800):
    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}{path}", timeout=timeout) as r:
        return r.read()


def _metrics(port):
    return json.loads(_get(port, "/metrics", timeout=60))


def load_route(port, query, label, clients, total_requests, emit):
    """N client threads issue sequential requests until the shared budget
    drains; per-request latencies pooled."""
    m0 = _metrics(port)
    lats, errs = [], []
    counter = {"left": total_requests}
    lock = threading.Lock()

    def client(cid):
        i = 0
        while True:
            with lock:
                if counter["left"] <= 0:
                    return
                counter["left"] -= 1
            t0 = time.perf_counter()
            try:
                _get(port, query + f"&seed={cid * 100000 + i}")
                with lock:
                    lats.append(time.perf_counter() - t0)
            except Exception as e:  # noqa: BLE001
                with lock:
                    errs.append(repr(e))
            i += 1

    t0 = time.perf_counter()
    ts = [threading.Thread(target=client, args=(c,)) for c in range(clients)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    wall = time.perf_counter() - t0
    m1 = _metrics(port)
    lats.sort()
    served = m1["samples"] - m0["samples"]
    hist = {k: m1["batch_size_hist"].get(k, 0)
            - m0.get("batch_size_hist", {}).get(k, 0)
            for k in m1.get("batch_size_hist", {})}
    hist = {k: v for k, v in hist.items() if v}
    row = {
        "route": label, "clients": clients, "requests": len(lats),
        "errors": len(errs), "wall_s": round(wall, 2),
        "served_samples_per_s": round(served / wall, 2),
        "p50_s": round(lats[len(lats) // 2], 4) if lats else None,
        "p95_s": round(lats[int(len(lats) * 0.95) - 1], 4) if lats else None,
        "batch_size_hist": hist,
        "multi_request_batches": m1["multi_request_batches"]
        - m0["multi_request_batches"],
    }
    if errs:
        row["first_error"] = errs[0]
    emit(row)


def drive(ckpt, config, routes, port, out_emit, clients_list, reqs):
    proc = subprocess.Popen(
        [sys.executable, "-m", "ddpm_diffusion_model_tpu.serving",
         "--ckpt", ckpt, "--config", config, "--port", str(port)],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    try:
        _wait_healthz(port)
        for label, query in routes:
            print(f"[warm] {label} ...", flush=True)
            _get(port, query + "&seed=1")  # cold compile (solo bucket)
            _get(port, query + "&seed=2")
            for clients in clients_list:
                # coalesced buckets compile on first merge; one throwaway
                # burst warms the n_bucket programs before the timed run
                load_route(port, query, f"{label}_warmup", clients,
                           clients * 2, lambda r: None)
                load_route(port, query, label, clients, reqs, out_emit)
    finally:
        proc.send_signal(signal.SIGTERM)
        try:
            proc.wait(timeout=60)
        except subprocess.TimeoutExpired:
            proc.kill()


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True, help="base (eps) checkpoint")
    ap.add_argument("--config", required=True)
    ap.add_argument("--cm-ckpt", help="consistency student checkpoint")
    ap.add_argument("--port", type=int, default=8141)
    ap.add_argument("--requests", type=int, default=192)
    ap.add_argument("--clients", default="8,32")
    ap.add_argument("--out", default="/tmp/r5/serving_load.jsonl")
    args = ap.parse_args(argv)

    import os

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    outf = open(args.out, "a")

    def emit(row):
        line = json.dumps(row)
        print(line, flush=True)
        outf.write(line + "\n")
        outf.flush()

    clients_list = [int(c) for c in args.clients.split(",")]
    base_routes = [
        ("ddim10", "/sample?n=1&steps=10&sampler=ddim&schedule=t_linear"),
        ("dpmpp10", "/sample?n=1&steps=10&sampler=dpmpp&schedule=t_linear"),
    ]
    drive(args.ckpt, args.config, base_routes, args.port, emit,
          clients_list, args.requests)
    if args.cm_ckpt:
        # class_id: CD trains only real labels — serve the trained pathway
        cm_routes = [("cm1", "/sample?n=1&steps=1&sampler=cm&class_id=2")]
        drive(args.cm_ckpt, args.config, cm_routes, args.port + 1, emit,
              clients_list, args.requests)
    outf.close()


if __name__ == "__main__":
    main()
