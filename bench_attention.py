"""Micro-benchmark: fused Pallas block attention vs XLA einsum attention.

Shapes are the model's real attention blocks (canonical 512x512 v3 config):
LViT levels [B*T, 256, E] with E/heads per level, GViT levels at 4x pool.
Run on the TPU to decide the CFEN_PALLAS_ATTN auto-dispatch default.

    python bench_attention.py [--batch 4] [--iters 50]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--mha", action="store_true",
                    help="A/B the FULL mha (proj+core+outproj): packed "
                         "[N,S,E] vs head-major (transposes folded into "
                         "the projection dots)")
    args = ap.parse_args()
    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    from cfen_vit_tpu.models.vit import (attention_core, mha_apply,
                                         mha_apply_headmajor)
    from cfen_vit_tpu.ops.pallas_attn import fused_block_attention

    B = args.batch
    cases = [  # (label, n, s, e, heads) — per-level LViT / GViT blocks
        ("lvit_L1", B * 64, 256, 96, 4),
        ("lvit_L2", B * 16, 256, 192, 8),
        ("lvit_L3", B * 4, 256, 384, 16),
        ("gvit_L1", B, 256, 384, 4),
        ("gvit_L2", B, 64, 768, 8),
        ("gvit_L3", B, 16, 1536, 16),
    ]
    rng = np.random.RandomState(0)
    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    for label, n, s, e, h in cases:
        q = jnp.asarray(rng.randn(n, s, e), dt)
        k = jnp.asarray(rng.randn(n, s, e), dt)
        v = jnp.asarray(rng.randn(n, s, e), dt)

        def timeit(fn):
            f = jax.jit(fn)
            jax.block_until_ready(f(q, k, v))
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = f(q, k, v)
            jax.block_until_ready(out)
            return (time.perf_counter() - t0) / args.iters * 1e6

        if args.mha:
            p = {kk: jnp.asarray(rng.randn(e, e) * 0.05, dt)
                 for kk in ("wq", "wk", "wv", "wo")}
            t_pk = timeit(lambda q, k, v: mha_apply(p, q, k, v, h))
            t_hm = timeit(
                lambda q, k, v: mha_apply_headmajor(p, q, k, v, h))
            print(f"{label:8s} [{n}x{s}x{e}] h={h:2d} packed={t_pk:9.1f}us"
                  f" headmajor={t_hm:9.1f}us speedup={t_pk / t_hm:5.2f}x")
            continue
        t_xla = timeit(lambda q, k, v: attention_core(q, k, v, h))
        line = f"{label:8s} [{n}x{s}x{e}] h={h:2d} xla={t_xla:9.1f}us"
        if on_tpu:
            t_pl = timeit(
                lambda q, k, v: fused_block_attention(q, k, v, h))
            line += f" pallas={t_pl:9.1f}us speedup={t_xla / t_pl:5.2f}x"
        print(line)


if __name__ == "__main__":
    main()
