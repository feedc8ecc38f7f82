"""Per-HLO time profile of the canonical generator on the current device.

Captures a jax.profiler trace of N steady-state steps and aggregates the
'XLA Ops' line of the device plane into the top time sinks — the tool the
MFU workstream uses to decide what to fuse/pad/rewrite next (VERDICT r1
next-step #2).  Works through the axon tunnel (device-side xplane events
are shipped back with the trace).

Usage:
  python scripts/profile_hlo.py [--batch 7] [--size 512] [--branches d|all]
                                [--top 25] [--steps 5] [--train]
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import re
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def collect(trace_dir: str):
    import jax
    files = glob.glob(os.path.join(trace_dir, "**/*.xplane.pb"),
                      recursive=True)
    pd = jax.profiler.ProfileData.from_file(files[0])
    events = []
    for plane in pd.planes:
        if not plane.name.startswith("/device:"):
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                events.append((ev.name, ev.duration_ns))
    return events


_CLASS_RULES = [
    ("conv", re.compile(r"^%?(convolution|conv)")),
    ("matmul", re.compile(r"^%?(dot|cublas|custom-call.*dot)")),
    ("fusion", re.compile(r"^%?(loop_)?fusion")),
    ("copy/transpose", re.compile(r"^%?(copy|transpose|bitcast)")),
    ("reduce", re.compile(r"^%?reduce")),
    ("dynamic", re.compile(r"^%?dynamic")),
    ("all-reduce", re.compile(r"^%?all-")),
]


def classify(name: str) -> str:
    for label, rx in _CLASS_RULES:
        if rx.match(name):
            return label
    return "other"


def report(events, steps: int, wall: float, top: int, dump: str = ""):
    import collections
    per_op = collections.Counter()
    per_class = collections.Counter()
    total = 0
    for name, dur in events:
        per_op[name] += dur
        per_class[classify(name)] += dur
        total += dur
    print(f"# wall {wall*1e3:.1f} ms/step, device busy "
          f"{total/steps/1e6:.1f} ms/step")
    print("\n== by class ==")
    for cls, dur in per_class.most_common():
        print(f"{dur/steps/1e6:8.2f} ms  {dur/total*100:5.1f}%  {cls}")
    print(f"\n== top {top} ops ==")
    for name, dur in per_op.most_common(top):
        print(f"{dur/steps/1e6:8.2f} ms  {dur/total*100:5.1f}%  {name[:110]}")
    if dump:
        with open(dump, "w") as f:
            for name, dur in per_op.most_common():
                f.write(f"{dur/steps/1e6:.4f}\t{name}\n")
        print(f"# full table -> {dump}")


def profile_train(args):
    """Per-HLO profile of the jitted GAN train step (the train-MFU
    workstream's tool; VERDICT r2 #2)."""
    import time as _t
    import tempfile as _tf
    import numpy as np
    import jax
    from cfen_vit_tpu.config import Config, enable_compilation_cache
    enable_compilation_cache()
    from cfen_vit_tpu.train.trainer import GanTrainer

    cfg = Config(dataroot="/tmp", name="prof_train",
                 checkpoints_dir="/tmp/prof_train_ckpt",
                 n_feats=24, loadSize=args.size // 2,
                 patch_size=args.size // 16, num_heads=4,
                 hidden_dim_ratio=4, batchSize=args.batch, pool_size=50,
                 sb=True, isTrain=True, compute_dtype=args.dtype)
    tr = GanTrainer(cfg)
    tr.setup(cfg)
    rng = np.random.RandomState(0)
    s = args.size
    batch = {
        "B": rng.rand(args.batch, s, s, 3).astype(np.float32) * 2 - 1,
        "A": rng.rand(args.batch, s, s, 3).astype(np.float32) * 2 - 1,
        "R": rng.rand(args.batch, s, s, 3).astype(np.float32) * 2 - 1,
        "S": rng.rand(args.batch, s, s, 1).astype(np.float32) * 2 - 1,
        "B_paths": [f"{i}.png" for i in range(args.batch)],
    }
    tr.set_input(batch)
    tr.optimize_parameters(cfg)           # init + compile
    float(tr.get_current_losses()["G"])

    trace_dir = _tf.mkdtemp(prefix="hlo_train_trace_")
    jax.profiler.start_trace(trace_dir)
    t0 = _t.time()
    for _ in range(args.steps):
        tr.set_input(batch)
        tr.optimize_parameters(cfg)
    float(tr.get_current_losses()["G"])
    wall = (_t.time() - t0) / args.steps
    jax.profiler.stop_trace()
    report(collect(trace_dir), args.steps, wall, args.top, args.dump)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=7)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--branches", default="d", choices=["d", "all"])
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--train", action="store_true",
                    help="profile the full GAN train step instead of the "
                         "inference forward (uses the Config/GanTrainer "
                         "path: remat per --remat_mode default)")
    ap.add_argument("--dump", default="",
                    help="also write the FULL per-op table to this file")
    args = ap.parse_args()

    if args.train:
        return profile_train(args)

    import numpy as np
    import jax
    import jax.numpy as jnp
    from dataclasses import replace
    from cfen_vit_tpu.config import enable_compilation_cache
    enable_compilation_cache()
    from cfen_vit_tpu.models.registry import generator_spec
    from cfen_vit_tpu.models.generator import (generator_init,
                                               generator_forward)

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    spec = replace(generator_spec("iid_hlgvit_crs_gd4_cfs_v3"),
                   n_feats=24, hidden_dim_ratio=4, load_size=args.size // 2,
                   patch_size=args.size // 16, num_heads=4)
    params = generator_init(jax.random.PRNGKey(0), spec)
    params = jax.tree_util.tree_map(
        lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a, params)
    x = jnp.asarray(np.random.RandomState(0).rand(
        args.batch, args.size, args.size, 3) * 2 - 1, dtype)
    if args.branches == "d":
        fwd = jax.jit(lambda p, xx: generator_forward(p, spec, xx)["d"])
    else:
        fwd = jax.jit(lambda p, xx: generator_forward(p, spec, xx))

    out = fwd(params, x)
    jax.block_until_ready(out)

    trace_dir = tempfile.mkdtemp(prefix="hlo_trace_")
    jax.profiler.start_trace(trace_dir)
    t0 = time.time()
    for _ in range(args.steps):
        out = fwd(params, x)
    jax.block_until_ready(out)
    wall = (time.time() - t0) / args.steps
    jax.profiler.stop_trace()

    report(collect(trace_dir), args.steps, wall, args.top, args.dump)


if __name__ == "__main__":
    main()
