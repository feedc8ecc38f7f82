"""On-device exactness check: flash-MRF kernels vs the dense XLA path.

The r4 device ladder measured flash-MRF at 12.66 img/s (SQ=128, +18% over
the 10.7 plain step) but the GAN step reported a nan G loss; the CPU
interpreter tests are exact, so this isolates whether the DEVICE kernels
(Mosaic lowering, not interpreter) produce the same loss value and grads
as the dense lax.scan path on the real training geometry.

Usage:  python scripts/check_mrf_device.py [--n 2] [--p 16384] [--c 256]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2)
    ap.add_argument("--p", type=int, default=16384)
    ap.add_argument("--c", type=int, default=256)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--sq", type=int, default=128)
    args = ap.parse_args()
    os.environ["CFEN_MRF_SQ"] = str(args.sq)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from cfen_vit_tpu.losses import vgg as V
    from cfen_vit_tpu.ops import pallas_mrf as PM

    dt = jnp.dtype(args.dtype)
    h = int(args.p ** 0.5)
    assert h * h == args.p, "p must be a square (NHWC feature map)"
    key = jax.random.PRNGKey(0)
    ko, kt = jax.random.split(key)
    # feature-like magnitudes (post-ReLU VGG activations)
    o = jax.nn.relu(jax.random.normal(ko, (args.n, h, h, args.c)) * 2.0)
    t = jax.nn.relu(jax.random.normal(kt, (args.n, h, h, args.c)) * 2.0)
    o = o.astype(dt)
    t = t.astype(dt)

    def dense(o, t):
        # CFEN_PALLAS_MRF unset/auto -> the lax.scan path
        return V._mrf(o, t)

    def kernel(o, t):
        o_n, t_n = V._normalize_feats(o, t)
        return PM.mrf_core(o_n, t_n)

    print(f"# n={args.n} p={args.p} c={args.c} dtype={args.dtype} "
          f"sq={args.sq}", flush=True)
    vd, gd = jax.jit(jax.value_and_grad(dense))(o, t)
    vd, gd = np.asarray(vd, np.float64), np.asarray(gd, np.float64)
    print(f"dense : loss={vd:.6f} |g|={np.abs(gd).max():.6g} "
          f"finite={np.isfinite(gd).all()}", flush=True)
    vk, gk = jax.jit(jax.value_and_grad(kernel))(o, t)
    vk, gk = np.asarray(vk, np.float64), np.asarray(gk, np.float64)
    print(f"pallas: loss={vk:.6f} |g|={np.abs(gk).max():.6g} "
          f"finite={np.isfinite(gk).all()}", flush=True)
    gscale = max(np.abs(gd).max(), 1e-30)
    print(f"diff  : loss={abs(vd - vk):.3e} "
          f"grad_rel={np.abs(gd - gk).max() / gscale:.3e}", flush=True)


if __name__ == "__main__":
    main()
