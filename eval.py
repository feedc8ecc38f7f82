"""Evaluation CLI: PSNR / SSIM / MS-SSIM between two image folders.

The reference computes no metrics (test.py only writes PNGs; paper numbers
were computed externally — SURVEY.md section 2.7).  This tool closes that
gap with the in-repo SSIM math mirrored from the reference's
pytorch_msssim package (ops/ssim.py), so "bit-comparable PSNR/SSIM"
(BASELINE.json north star) is measurable end-to-end:

    python eval.py --pred results/<name>/test_32/images --gt <root>/clear \
        [--suffix _fake_A] [--json]

Pairs files by basename after stripping --suffix from predictions.
"""

import argparse
import json
import os
import sys

import numpy as np
from PIL import Image


def _collect(d):
    exts = (".png", ".jpg", ".jpeg", ".bmp", ".PNG", ".JPG")
    return sorted(f for f in os.listdir(d) if f.endswith(exts))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--pred", required=True)
    ap.add_argument("--gt", required=True)
    ap.add_argument("--suffix", default="_fake_A",
                    help="suffix stripped from prediction basenames")
    ap.add_argument("--msssim", action="store_true")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args(argv)

    import jax.numpy as jnp
    from cfen_vit_tpu.ops.ssim import ssim, msssim, psnr

    gts = {os.path.splitext(f)[0]: os.path.join(args.gt, f)
           for f in _collect(args.gt)}
    pairs = []
    for f in _collect(args.pred):
        stem = os.path.splitext(f)[0]
        if stem.endswith(args.suffix):
            stem = stem[: -len(args.suffix)]
        if stem in gts:
            pairs.append((os.path.join(args.pred, f), gts[stem]))
    if not pairs:
        print("no matched prediction/gt pairs", file=sys.stderr)
        return 2

    psnrs, ssims, msssims = [], [], []
    for p, g in pairs:
        a = np.asarray(Image.open(p).convert("RGB"), np.float32)[None]
        b = np.asarray(Image.open(g).convert("RGB"), np.float32)[None]
        if a.shape != b.shape:
            print(f"skip {os.path.basename(p)}: shape {a.shape} vs {b.shape}",
                  file=sys.stderr)
            continue
        a = jnp.asarray(a / 255.0 * 2 - 1)
        b = jnp.asarray(b / 255.0 * 2 - 1)
        psnrs.append(float(psnr(a, b)))
        ssims.append(float(ssim(a, b)))
        if args.msssim:
            msssims.append(float(msssim(a, b)))

    out = {"n": len(psnrs),
           "psnr": round(float(np.mean(psnrs)), 4),
           "ssim": round(float(np.mean(ssims)), 5)}
    if msssims:
        out["msssim"] = round(float(np.mean(msssims)), 5)
    if args.json:
        print(json.dumps(out))
    else:
        print(f"n={out['n']} PSNR={out['psnr']:.2f}dB SSIM={out['ssim']:.4f}"
              + (f" MS-SSIM={out['msssim']:.4f}" if msssims else ""))
    return 0


if __name__ == "__main__":
    sys.exit(main())
