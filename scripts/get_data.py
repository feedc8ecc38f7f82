"""Dataset layout helper (counterpart of the reference's util/get_data.py,
which downloads CycleGAN/pix2pix archives — not applicable to the dehazing
datasets, and this environment has no network egress).

Verifies/creates the folder layout every CLI expects
(ref data/dec_vit_data.py:17-23):

    <dataroot>/
      hazy/    hazy inputs (always)
      clear/   clean ground truth (train)
      r/       reflectance ground truth (train)
      s/       shading ground truth (train)

Usage:
    python scripts/get_data.py --dataroot /data/reside --check [--train]
    python scripts/get_data.py --dataroot /data/reside --init
"""

import argparse
import os
import sys

DIRS_TEST = ["hazy"]
DIRS_TRAIN = ["hazy", "clear", "r", "s"]
EXTS = (".png", ".jpg", ".jpeg", ".bmp")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataroot", required=True)
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--init", action="store_true",
                    help="create the expected directories")
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args(argv)

    dirs = DIRS_TRAIN if args.train else DIRS_TEST
    if args.init:
        for d in dirs:
            os.makedirs(os.path.join(args.dataroot, d), exist_ok=True)
        print(f"created {dirs} under {args.dataroot}")
        return 0

    ok = True
    counts = {}
    for d in dirs:
        path = os.path.join(args.dataroot, d)
        if not os.path.isdir(path):
            print(f"MISSING dir: {path}")
            ok = False
            continue
        counts[d] = sum(1 for f in os.listdir(path) if f.endswith(EXTS))
    print("image counts:", counts)
    if args.train and len(set(counts.values())) > 1:
        print("WARNING: paired training dirs have differing counts")
    sizes = set()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
