"""Patchify/unpatchify as pure reshapes (replacing F.unfold / F.fold).

The reference tokenizes each tile with F.unfold(x, p, stride=p) which yields
tokens ordered row-major over the patch grid, each token a (channel, ph, pw)-
ordered flatten (ref networks_iid_hlgvit_crs_gd4_cfs_v3.py:1140, fold :1186).
Because stride == kernel there is no overlap, so unfold/fold are exact
reshapes — free on TPU, no gather.
"""

from __future__ import annotations

def unfold_tokens(x, p: int):
    """[N,H,W,C] -> [N, (H/p)*(W/p), C*p*p] with torch-unfold token layout."""
    n, h, w, c = x.shape
    gh, gw = h // p, w // p
    x = x.reshape(n, gh, p, gw, p, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)            # [N, gh, gw, C, p, p]
    return x.reshape(n, gh * gw, c * p * p)


def fold_tokens(x, p: int, h: int, w: int):
    """Inverse of unfold_tokens: [N, L, C*p*p] -> [N,H,W,C]."""
    n, l, d = x.shape
    gh, gw = h // p, w // p
    c = d // (p * p)
    x = x.reshape(n, gh, gw, c, p, p)
    x = x.transpose(0, 1, 4, 2, 5, 3)            # [N, gh, p, gw, p, C]
    return x.reshape(n, h, w, c)
