"""Inference server: dehaze images over HTTP (production-serving surface).

The reference has no serving story (test.py batch CLI only); this serves
the same generator as a long-lived process with the model compiled once:

    python serve.py --name <ckpt> --checkpoints_dir ... --which_epoch 32 \
        --model_G iid_hlgvit_crs_gd4_cfs_v3 --n_feats 24 \
        --hidden_dim_ratio 4 [--port 8600] [--compute_dtype bfloat16]

    POST /dehaze   body: PNG/JPEG bytes -> PNG bytes of fake_A
    POST /dehaze?out=all                -> multipart-free: PNG of fake_A,
                                           headers X-Has-R/S note extras
    GET  /healthz                       -> {"status":"ok", ...}

Single-threaded handler (the device is serial anyway); decode uses the
native C++ loader when the request size matches the compiled geometry.
"""

import argparse
import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, HTTPServer

import numpy as np


def build_model(argv):
    from cfen_vit_tpu.config import parse_args
    from cfen_vit_tpu.models.dehazing_model import DehazingModel
    import jax
    import jax.numpy as jnp

    cfg = parse_args(argv, is_train=False, save_opt=False)
    cfg.out_all = True   # serving returns fake_A only -> d-only XLA program
    model = DehazingModel(cfg)
    model.setup(cfg)
    if cfg.compute_dtype == "bfloat16":
        model.params = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16)
            if a.dtype == jnp.float32 else a, model.params)
    size = cfg.input_size()
    # warm the compile cache so the first request is fast
    model.set_input({"B": np.zeros((1, size, size, 3), np.float32),
                     "B_paths": ["warmup"]})
    model.test(cfg)
    return cfg, model, size


def make_handler(cfg, model, size, stats):
    from PIL import Image
    import jax.numpy as jnp

    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet
            pass

        def _json(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path.startswith("/healthz"):
                self._json(200, {"status": "ok", "model": cfg.model_G,
                                 "input_size": size,
                                 "requests": stats["n"],
                                 "mean_latency_ms": round(
                                     stats["t"] / max(stats["n"], 1) * 1e3,
                                     2)})
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self):
            if not self.path.startswith("/dehaze"):
                self._json(404, {"error": "unknown path"})
                return
            length = int(self.headers.get("Content-Length", 0))
            raw = self.rfile.read(length)
            try:
                img = Image.open(io.BytesIO(raw)).convert("RGB")
            except Exception as e:
                self._json(400, {"error": f"bad image: {e}"})
                return
            if img.size != (size, size):
                img = img.resize((size, size), Image.BICUBIC)
            x = np.asarray(img, np.float32)[None] / 255.0 * 2 - 1
            t0 = time.perf_counter()
            with lock:
                model.set_input({"B": x, "B_paths": ["req"]})
                visuals = model.test(cfg)
            dt = time.perf_counter() - t0
            stats["n"] += 1
            stats["t"] += dt
            # tensor2im semantics (cfen_vit_tpu/utils/images.py): the model's
            # uint8-wire path already yields uint8 [0,255] visuals — convert
            # only float [-1,1] outputs (re-converting uint8 saturated every
            # pixel to 255; advisor finding r1).
            out = visuals["fake_A"][0]
            if out.dtype != np.uint8:
                out = ((out.astype(np.float32) + 1) / 2 * 255) \
                    .clip(0, 255).astype(np.uint8)
            png = io.BytesIO()
            Image.fromarray(out).save(png, "PNG")
            body = png.getvalue()
            self.send_response(200)
            self.send_header("Content-Type", "image/png")
            self.send_header("Content-Length", str(len(body)))
            self.send_header("X-Latency-Ms", f"{dt * 1e3:.1f}")
            self.end_headers()
            self.wfile.write(body)

    return Handler


def main(argv=None):
    ap = argparse.ArgumentParser(add_help=False)
    ap.add_argument("--port", type=int, default=8600)
    ap.add_argument("--host", default="127.0.0.1")
    args, rest = ap.parse_known_args(argv)

    stats = {"n": 0, "t": 0.0}
    cfg, model, size = build_model(rest)
    server = HTTPServer((args.host, args.port),
                        make_handler(cfg, model, size, stats))
    print(f"serving {cfg.model_G} ({size}x{size}) on "
          f"http://{args.host}:{args.port}", flush=True)
    server.serve_forever()


if __name__ == "__main__":
    main()
