"""Tile split/join — the batched replacement for the reference's Crop2x2 tree.

The reference recursively quarters the feature map with Crop2x2 and runs a
shared-weight LViT on each 32x32 tile as a separate Python call — 336 calls
per forward (ref v3:403-482, :1025-1056).  Since the tiles are disjoint and
the weights shared, that is exactly one batched call on
[B*T, tile, tile, C]; these two reshapes implement the mapping.  Tile order
is row-major over the tile grid — any fixed order is equivalent because the
per-tile computation never mixes tiles.
"""

from __future__ import annotations

def split_tiles(x, t: int):
    """[B,H,W,C] -> [B*(H/t)*(W/t), t, t, C], row-major tile order."""
    b, h, w, c = x.shape
    gh, gw = h // t, w // t
    x = x.reshape(b, gh, t, gw, t, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b * gh * gw, t, t, c)


def join_tiles(x, b: int, h: int, w: int):
    """Inverse of split_tiles: [B*T, t, t, C] -> [B,H,W,C]."""
    bt, t, _, c = x.shape
    gh, gw = h // t, w // t
    x = x.reshape(b, gh, gw, t, t, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


def split_tiles_tokens(x, t: int, p: int):
    """[B,H,W,C] -> [B*T, (t/p)^2, C*p*p]: tile-split + torch-unfold patchify
    in ONE transpose.

    Exactly equals unfold_tokens(split_tiles(x, t), p) — tiles row-major,
    patches row-major within a tile, (C, ph, pw) token flatten — but never
    materializes the [B*T, t, t, C] tile form.  The round trip through two
    6-D transposes was ~6% of device time at the canonical geometry
    (scripts/profile_hlo.py, r2); this halves that traffic.
    """
    b, h, w, c = x.shape
    gh, gw = h // t, w // t
    q = t // p
    x = x.reshape(b, gh, q, p, gw, q, p, c)
    x = x.transpose(0, 1, 4, 2, 5, 7, 3, 6)      # [B,gh,gw,qh,qw,C,ph,pw]
    return x.reshape(b * gh * gw, q * q, c * p * p)


def join_tiles_tokens(x, t: int, p: int, b: int, h: int, w: int):
    """Inverse of split_tiles_tokens: [B*T, S, C*p*p] -> [B,H,W,C]."""
    gh, gw = h // t, w // t
    q = t // p
    c = x.shape[-1] // (p * p)
    x = x.reshape(b, gh, gw, q, q, c, p, p)
    x = x.transpose(0, 1, 3, 6, 2, 4, 7, 5)      # [B,gh,qh,ph,gw,qw,pw,C]
    return x.reshape(b, h, w, c)
