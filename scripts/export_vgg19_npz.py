"""Convert torchvision VGG19 weights to the npz layout losses/vgg.py loads.

Run once in any environment that has torchvision + the pretrained weights
(this container has neither; zero egress):

    python scripts/export_vgg19_npz.py vgg19.npz
    CFEN_VGG19_NPZ=vgg19.npz python train.py ...

Also accepts a local torch state_dict path instead of torchvision:
    python scripts/export_vgg19_npz.py out.npz --state-dict vgg19-dcbb9e9d.pth
"""

import argparse
import sys

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--state-dict", default=None,
                    help="path to a torchvision vgg19 .pth state_dict")
    args = ap.parse_args(argv)

    sys.path.insert(0, ".")
    from cfen_vit_tpu.losses.vgg import weights_from_torch_vgg

    if args.state_dict:
        import torch
        sd = torch.load(args.state_dict, map_location="cpu")
        feats = {k[len("features."):]: v for k, v in sd.items()
                 if k.startswith("features.")}
    else:
        from torchvision import models
        feats = models.vgg19(weights="IMAGENET1K_V1").features.state_dict()
    np.savez(args.out, **weights_from_torch_vgg(feats))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
