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
