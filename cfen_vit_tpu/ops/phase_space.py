"""Phase-space (space-to-depth) formulation of the generator's full-res band.

The model's worst-mapped region is the full-resolution C=12 band: the stem
(conv5x5 3->12 + ResBlock + stride-2 ds conv, ref v3:123-127, :297-298) and
the tail (convT 24->12 + conv3x3 + reflect-pad conv7x7 + tanh, ref
:301-322, :348-383).  Twelve channels starve the 128-lane units, and at
batch>=8 XLA flips the whole band to a batch-sublane layout (the b8 cliff,
BASELINE.md); even at the b7 sweet spot the band's layout-assignment copies
are ~4 ms of a 30 ms step (scripts/profile_hlo.py r3: copies = 47.6% of
device time).

This module removes the band entirely: every full-res tensor is stored as
its 2x2 space-to-depth transform — a half-res tensor with 4x the channels
([B,512,512,12] -> [B,256,256,48]) — and every full-res conv becomes an
exactly-equivalent half-res conv on phase-space weights:

  * stride-1 k=2r+1 conv  ->  K-cell phase conv, W_ps[t, pi, po] = w[d],
    d = 2t + pi - po (|d| <= r; zero otherwise), K = 2*ceil(r/2)+1;
  * ConvTranspose2d(4, s2, p1) (stored pre-flipped for the dilated-conv
    form, ops/nn.py) -> K3 phase conv from the half-res trunk,
    W_ps[t, po] = w[m], m = 2t + 2 - po (m in [0,4));
  * stride-2 k3 ds conv -> K2 conv consuming phases,
    W_ps[t, pi] = w[m], m = 2t + pi + 1 (m in [0,3); pad (1,0));
  * ReflectionPad2d preserves parity (full col -k <-> k, both parity k),
    so it is a per-phase cell shift: left pad cell -q of phase b is cell
    (q - b) of the SAME phase; right pad cell (n-1)+q is cell n - q - b.
  * ActNorm is per-channel affine -> tile params x4; InstanceNorm over the
    full-res plane -> stats over (H, W, phase) per channel group.

Zero-pad correctness at borders falls out of the weight zeros: any phase
tap that would read beyond the full-res zero-pad halo has d outside
[-r, r] and therefore zero weight.

Cost: the dense phase kernels carry parity-mismatch zeros, adding ~2.4
GFLOP/img (+2.4%) of MXU work in exchange for deleting the band's HBM
layout copies and the entire b>=8 pathology — measured end-to-end in
BASELINE.md.  Channel packing is (py*2+px)*C + c (py major), matching
space_to_depth below everywhere.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax import lax

_DN = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                 ("NHWC", "HWIO", "NHWC"))


def space_to_depth(x):
    """[B, 2H, 2W, C] -> [B, H, W, 4C], channel index (py*2+px)*C + c."""
    b, h2, w2, c = x.shape
    x = x.reshape(b, h2 // 2, 2, w2 // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h2 // 2, w2 // 2, 4 * c)


def depth_to_space(x):
    """Inverse of space_to_depth: [B, H, W, 4C] -> [B, 2H, 2W, C]."""
    b, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h, w, 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, 2 * h, 2 * w, c)


def _phase_window(r: int):
    """Union cell window [tmin, tmax] over both output phases for a
    stride-1 full-res conv of radius r (floor(-r/2) .. floor((1+r)/2))."""
    return -((r + 1) // 2), (1 + r) // 2


_SEL_CACHE: dict = {}


def _sel_s1(k: int):
    """Constant selection tensor S[K,K,4(pi),4(po),k,k]: S=1 where phase
    tap (ty,tx,pi,po) reads full-res tap (dy,dx)."""
    import numpy as np
    key = ("s1", k)
    if key not in _SEL_CACHE:
        r = (k - 1) // 2
        tmin, tmax = _phase_window(r)
        K = tmax - tmin + 1
        s = np.zeros((K, K, 4, 4, k, k), np.float32)
        for ty in range(tmin, tmax + 1):
            for tx in range(tmin, tmax + 1):
                for piy in range(2):
                    for pix in range(2):
                        for poy in range(2):
                            for pox in range(2):
                                dy = 2 * ty + piy - poy
                                dx = 2 * tx + pix - pox
                                if abs(dy) > r or abs(dx) > r:
                                    continue
                                s[ty - tmin, tx - tmin,
                                  piy * 2 + pix, poy * 2 + pox,
                                  r + dy, r + dx] = 1.0
        _SEL_CACHE[key] = s
    return _SEL_CACHE[key]


def _sel_convT():
    """S[3,3,4(po),4,4] for ConvTranspose2d(4, s2, p1) in pre-flipped
    dilated-conv layout (ops/nn.py)."""
    import numpy as np
    key = ("convT",)
    if key not in _SEL_CACHE:
        s = np.zeros((3, 3, 4, 4, 4), np.float32)
        for ty in range(-1, 2):
            for tx in range(-1, 2):
                for poy in range(2):
                    for pox in range(2):
                        my = 2 * ty + 2 - poy
                        mx = 2 * tx + 2 - pox
                        if 0 <= my < 4 and 0 <= mx < 4:
                            s[ty + 1, tx + 1, poy * 2 + pox, my, mx] = 1.0
        _SEL_CACHE[key] = s
    return _SEL_CACHE[key]


def _sel_ds():
    """S[2,2,4(pi),3,3] for the stride-2 k3 p1 full->half ds conv."""
    import numpy as np
    key = ("ds",)
    if key not in _SEL_CACHE:
        s = np.zeros((2, 2, 4, 3, 3), np.float32)
        for ty in range(-1, 1):
            for tx in range(-1, 1):
                for piy in range(2):
                    for pix in range(2):
                        my = 2 * ty + piy + 1
                        mx = 2 * tx + pix + 1
                        if 0 <= my < 3 and 0 <= mx < 3:
                            s[ty + 1, tx + 1, piy * 2 + pix, my, mx] = 1.0
        _SEL_CACHE[key] = s
    return _SEL_CACHE[key]


def expand_s1(w):
    """Full-res stride-1 conv [k,k,ci,co] (odd k, zero-pad r) -> phase-space
    [K,K,4ci,4co].  Apply with symmetric pad (K-1)//2 (the parity-mismatch
    slots are zero; border zero-pad correctness follows)."""
    k, _, ci, co = w.shape
    s = jnp.asarray(_sel_s1(k), w.dtype)
    out = jnp.einsum("ABqpyx,yxio->ABqipo", s, w)
    K = s.shape[0]
    return out.reshape(K, K, 4 * ci, 4 * co)


def _sel_entry(k: int):
    """S[k+1,k+1,4(po),k,k] for the DIRECT stride-2 entry conv: full-res
    stride-1 conv of odd k applied to the raw image, emitting the
    phase-space output straight from one stride-2 conv (no space_to_depth
    copy).  Tap ay of the k+1 window at output cell i reads raw row
    2i + ay - r; phase po row 2i+poy needs raw row 2i+poy+dy-r, so
    ay = poy + dy."""
    import numpy as np
    key = ("entry", k)
    if key not in _SEL_CACHE:
        s = np.zeros((k + 1, k + 1, 4, k, k), np.float32)
        for poy in range(2):
            for pox in range(2):
                for dy in range(k):
                    for dx in range(k):
                        s[poy + dy, pox + dx, poy * 2 + pox, dy, dx] = 1.0
        _SEL_CACHE[key] = s
    return _SEL_CACHE[key]


def expand_entry(w):
    """Full-res stride-1 conv [k,k,ci,co] (odd k, zero-pad r) -> direct
    stride-2 entry kernel [k+1,k+1,ci,4co].  Apply to the RAW full-res
    image with conv_entry below; exactly equals
    conv_ps(space_to_depth(x), expand_s1(w)) with the s2d transpose
    never materialized (it was ~0.7 ms of input layout copies at b8,
    scripts/profile_hlo.py r3)."""
    k, _, ci, co = w.shape
    s = jnp.asarray(_sel_entry(k), w.dtype)
    out = jnp.einsum("ABpyx,yxio->ABipo", s, w)
    return out.reshape(k + 1, k + 1, ci, 4 * co)


def conv_entry(x, w_entry, bias=None):
    """Stride-2 application of an expand_entry kernel to the raw image:
    [B,2H,2W,C] -> [B,H,W,4co] phase-space output (zero pad r = (k-2)//1
    ... pad is r on the low side and r+1 unused on the high side is not
    needed: window k+1 at stride 2 with pad r each side covers rows
    -r .. 2H-1+r exactly)."""
    kk = w_entry.shape[0]           # k+1, even
    r = (kk - 2) // 2 + (kk - 2) % 2  # r = (k-1)/2 with k = kk-1
    y = lax.conv_general_dilated(
        x, w_entry.astype(x.dtype), (2, 2), ((r, r), (r, r)),
        dimension_numbers=_DN)
    if bias is not None:
        y = y + tile4(bias).astype(y.dtype)
    return y


def _phase_range_1d(r: int, po: int):
    """Per-output-phase cell window [tmin, tmax] for a radius-r conv."""
    return (po - r) // 2, (po + r) // 2


def conv_s1_sparse(x_ps, w, bias=None, prepadded: int = 0):
    """Per-output-phase application of a full-res stride-1 conv: 4 smaller
    convs (each phase's true cell window, no parity-mismatch zeros)
    concatenated in phase order.  ~2.2x fewer FLOPs than the dense
    expand_s1 kernel for k=3 (4 vs 9 cells) and 1.6x for k=7 (16 vs 25);
    k=5 windows coincide with the dense form.  CFEN_PHASE_SPARSE=1 selects
    this in the generator band; measured A/B in BASELINE.md.

    prepadded=P: x_ps already carries P halo cells per side (e.g. the
    reflect pad) — each phase conv slices its window and runs VALID."""
    k, _, ci, co = w.shape
    r = (k - 1) // 2
    s_full = _sel_s1(k)
    tmin_d, _ = _phase_window(r)
    hh, ww = x_ps.shape[1] - 2 * prepadded, x_ps.shape[2] - 2 * prepadded
    outs = []
    for poy in range(2):
        ty0, ty1 = _phase_range_1d(r, poy)
        for pox in range(2):
            tx0, tx1 = _phase_range_1d(r, pox)
            po = poy * 2 + pox
            sel = s_full[ty0 - tmin_d:ty1 - tmin_d + 1,
                         tx0 - tmin_d:tx1 - tmin_d + 1, :, po]
            wp = jnp.einsum("ABqyx,yxio->ABqio",
                            jnp.asarray(sel, w.dtype), w)
            wp = wp.reshape(ty1 - ty0 + 1, tx1 - tx0 + 1, 4 * ci, co)
            if prepadded:
                src = x_ps[:, prepadded + ty0:prepadded + ty1 + hh,
                           prepadded + tx0:prepadded + tx1 + ww, :]
                pad = ((0, 0), (0, 0))
            else:
                src = x_ps
                pad = ((-ty0, ty1), (-tx0, tx1))
            y = lax.conv_general_dilated(
                src, wp.astype(x_ps.dtype), (1, 1), pad,
                dimension_numbers=_DN)
            outs.append(y)
    out = jnp.concatenate(outs, axis=-1)
    if bias is not None:
        out = out + tile4(bias).astype(out.dtype)
    return out


def convT_sparse(x, w, bias=None):
    """Per-output-phase ConvTranspose2d(4, s2, p1): 4 K2 convs from the
    half-res trunk (cells {-1,0} for phase 0, {0,1} for phase 1 per dim)."""
    _, _, ci, co = w.shape
    s_full = _sel_convT()           # [3,3,4(po),4,4]
    outs = []
    for poy in range(2):
        ty0, ty1 = -1 + poy, 0 + poy
        for pox in range(2):
            tx0, tx1 = -1 + pox, 0 + pox
            po = poy * 2 + pox
            sel = s_full[ty0 + 1:ty1 + 2, tx0 + 1:tx1 + 2, po]
            wp = jnp.einsum("AByx,yxio->ABio",
                            jnp.asarray(sel, w.dtype), w)
            y = lax.conv_general_dilated(
                x, wp.astype(x.dtype), (1, 1),
                ((-ty0, ty1), (-tx0, tx1)), dimension_numbers=_DN)
            outs.append(y)
    out = jnp.concatenate(outs, axis=-1)
    if bias is not None:
        out = out + tile4(bias).astype(out.dtype)
    return out


def use_sparse_phase() -> bool:
    flag = os.environ.get("CFEN_PHASE_SPARSE", "0")
    return flag == "1"


def expand_convT(w):
    """ConvTranspose2d(k=4, s2, p1) pre-flipped weight [4,4,ci,co] -> phase
    conv [3,3,ci,4co] from the half-res trunk.  Apply with pad 1."""
    _, _, ci, co = w.shape
    s = jnp.asarray(_sel_convT(), w.dtype)
    out = jnp.einsum("ABpyx,yxio->ABipo", s, w)
    return out.reshape(3, 3, ci, 4 * co)


def expand_ds(w):
    """Stride-2 k3 p1 full->half conv [3,3,ci,co] -> phase-consuming K2
    conv [2,2,4ci,co].  Apply with pad ((1,0),(1,0))."""
    _, _, ci, co = w.shape
    s = jnp.asarray(_sel_ds(), w.dtype)
    out = jnp.einsum("ABqyx,yxio->ABqio", s, w)
    return out.reshape(2, 2, 4 * ci, co)


def conv_ps(x, w, padding):
    """Phase-space conv: stride 1, explicit per-dim (lo, hi) padding."""
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    return lax.conv_general_dilated(x, w.astype(x.dtype), (1, 1), padding,
                                    dimension_numbers=_DN)


def tile4(v):
    """Per-full-res-channel vector [C] -> phase-space [4C]."""
    return jnp.tile(v, 4)


def reflect_pad_ps(x, p_cells: int):
    """Phase-space equivalent of full-res ReflectionPad2d: parity is
    preserved, so each phase plane pads with its own shifted cells
    (left cell -q of phase b = cell q - b; right cell (n-1)+q = n - q - b).
    Pads p_cells cells on each side of H and W."""
    b, h, w, c4 = x.shape
    c = c4 // 4
    v = x.reshape(b, h, w, 2, 2, c)

    def pad_axis(v, axis, n, phase_axis):
        a0 = jax.lax.index_in_dim(v, 0, phase_axis, keepdims=False)
        a1 = jax.lax.index_in_dim(v, 1, phase_axis, keepdims=False)
        # after squeezing phase_axis, the cell axis index is unchanged
        # (phase axes come after the spatial axes in our layout)
        sl = lambda t, lo, hi: lax.slice_in_dim(t, lo, hi, axis=axis)
        flip = lambda t: jnp.flip(t, axis=axis)
        top0 = flip(sl(a0, 1, p_cells + 1))          # cells q, q=p..1
        top1 = flip(sl(a1, 0, p_cells))              # cells q-1
        bot0 = flip(sl(a0, n - p_cells, n))          # cells n-q
        bot1 = flip(sl(a1, n - p_cells - 1, n - 1))  # cells n-q-1
        a0 = jnp.concatenate([top0, a0, bot0], axis=axis)
        a1 = jnp.concatenate([top1, a1, bot1], axis=axis)
        return jnp.stack([a0, a1], axis=phase_axis)

    v = pad_axis(v, 1, h, 3)   # rows, phase py at axis 3
    v = pad_axis(v, 2, w, 4)   # cols, phase px at axis 4
    return v.reshape(b, h + 2 * p_cells, w + 2 * p_cells, c4)


def instance_norm_ps(x, eps: float = 1e-5):
    """Full-res InstanceNorm computed in phase space: per-channel stats
    over (H, W, 4 phases), lane-efficient two-stage f32 sums like
    ops/nn.py instance_norm."""
    b, h, w, c4 = x.shape
    c = c4 // 4
    ct = jnp.float64 if x.dtype == jnp.float64 else jnp.float32
    x32 = x.astype(ct)
    r = x32.reshape(b, h, w * c4)
    s1 = jnp.sum(r, axis=1).reshape(b, w * 4, c).sum(axis=1)
    s2 = jnp.sum(jnp.square(r), axis=1).reshape(b, w * 4, c).sum(axis=1)
    n = h * w * 4
    mu = (s1 / n)
    var = jnp.maximum(s2 / n - jnp.square(mu), 0.0)
    mu4 = jnp.tile(mu, 4)[:, None, None, :]
    iv4 = jnp.tile(lax.rsqrt(var + eps), 4)[:, None, None, :]
    return ((x32 - mu4) * iv4).astype(x.dtype)


# --------------------------------------------------------------------------
# trunk phase space: s2d-to-s2d forms of the inter-level ops, so the WHOLE
# generator trunk (levels at C = nf/2nf/4nf) runs on 4x-channel half-res
# tensors.  At the canonical geometry the trunk's C=24/48/96 channels-last
# tensors use 24-96 of 128 lanes and the tile/tokenize transposes ran at
# ~60 GB/s effective (scripts/profile_hlo.py r3 b8: copy/transpose = 30.7%
# of device time); the s2d forms are 96/192/384-channel — lane-aligned —
# and LViT's p=2 patchify becomes a FREE reshape (it *is* the s2d
# transform, modulo a weight permutation; models/vit.py
# permute_vit_params).
# --------------------------------------------------------------------------


def _sel_ds_trunk():
    """S[3,3,4(pi),4(po),3,3] for a k3 s2 p1 full->half conv with BOTH
    sides stored as s2d: output s2d cell P phase po reads input s2d cells
    2P+t, t in {-1,0,1}; full-res tap dy = 2t + pi - 2po, |dy| <= 1.
    Apply with stride 2, pad ((1,0),(1,0))."""
    import numpy as np
    key = ("ds_trunk",)
    if key not in _SEL_CACHE:
        s = np.zeros((3, 3, 4, 4, 3, 3), np.float32)
        for ty in range(-1, 2):
            for tx in range(-1, 2):
                for piy in range(2):
                    for pix in range(2):
                        for poy in range(2):
                            for pox in range(2):
                                dy = 2 * ty + piy - 2 * poy
                                dx = 2 * tx + pix - 2 * pox
                                if abs(dy) > 1 or abs(dx) > 1:
                                    continue
                                s[ty + 1, tx + 1, piy * 2 + pix,
                                  poy * 2 + pox, dy + 1, dx + 1] = 1.0
        _SEL_CACHE[key] = s
    return _SEL_CACHE[key]


def expand_ds_trunk(w):
    """k3 s2 p1 downsample conv [3,3,ci,co] -> s2d-to-s2d kernel
    [3,3,4ci,4co].  Apply with conv_ds_trunk (stride 2, pad (1,0))."""
    _, _, ci, co = w.shape
    s = jnp.asarray(_sel_ds_trunk(), w.dtype)
    out = jnp.einsum("ABqpyx,yxio->ABqipo", s, w)
    return out.reshape(3, 3, 4 * ci, 4 * co)


def conv_ds_trunk(x, w_ps, bias=None):
    """Apply an expand_ds_trunk kernel: s2d(L) [B,H,W,4ci] ->
    s2d(L+1) [B,H/2,W/2,4co]."""
    y = lax.conv_general_dilated(
        x, w_ps.astype(x.dtype), (2, 2), ((1, 0), (1, 0)),
        dimension_numbers=_DN)
    if bias is not None:
        y = y + tile4(bias).astype(y.dtype)
    return y


def expand_convT_trunk(w):
    """ConvTranspose2d(k4, s2, p1) pre-flipped [4,4,ci,co], upsampling
    level L+1 (grid G) to level L (grid 2G), with BOTH sides stored as
    s2d: composition of the two existing transforms.  expand_convT turns
    the convT into a stride-1 k3 phase conv on grid G emitting s2d(L)@G
    ([3,3,ci,4co]); re-phasing THAT conv onto the s2d(L+1) store (grid
    G/2) is exactly expand_s1 again -> [3,3,4ci,16co].  Apply with
    convT_trunk below (pad 1, then one depth_to_space)."""
    return expand_s1(expand_convT(w))


def convT_trunk(x, w_ps, bias=None):
    """Apply an expand_convT_trunk kernel: s2d(L+1) [B,G/2,G/2,4ci] ->
    s2d(L) [B,G,G,4co] (one depth_to_space on the 16co intermediate)."""
    y = lax.conv_general_dilated(
        x, w_ps.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=_DN)
    y = depth_to_space(y)
    if bias is not None:
        y = y + tile4(bias).astype(y.dtype)
    return y


def expand_1x1_ps(w, in_sizes=None):
    """1x1 conv [1,1,cin,co] (or [cin,co]) -> dense s2d kernel
    [1,1,4cin,4co] (block-diagonal over phases; the parity-mismatch zeros
    ride the MXU like the other dense phase kernels).

    in_sizes: when the s2d input is a CONCAT of s2d tensors with full-res
    channel counts (a1, a2, ...), the stored channel order is
    (phases of a1)(phases of a2)... while the full-res conv expects
    (a1 a2 ...) per phase — the permutation is baked into the kernel's
    input axis."""
    import numpy as np
    if w.ndim == 4:
        w = w.reshape(w.shape[2], w.shape[3])
    cin, co = w.shape
    if in_sizes is None:
        in_sizes = (cin,)
    assert sum(in_sizes) == cin
    key = ("p1x1", tuple(in_sizes))
    if key not in _SEL_CACHE:
        # M[stored_row, q, full_c]: stored row (off4_j + q*a_j + i) is
        # full-res channel (off_j + i) at phase q
        m = np.zeros((4 * cin, 4, cin), np.float32)
        off, off4 = 0, 0
        for a in in_sizes:
            for q in range(4):
                for i in range(a):
                    m[off4 + q * a + i, q, off + i] = 1.0
            off += a
            off4 += 4 * a
        _SEL_CACHE[key] = m
    m = jnp.asarray(_SEL_CACHE[key], w.dtype)
    out = jnp.einsum("sqc,co->sqo", m, w)        # [4cin, 4, co], q-major out
    return out.reshape(1, 1, 4 * cin, 4 * co)


def conv_1x1_ps(x, w_ps, bias=None):
    y = lax.conv_general_dilated(x, w_ps.astype(x.dtype), (1, 1),
                                 ((0, 0), (0, 0)), dimension_numbers=_DN)
    if bias is not None:
        y = y + tile4(bias).astype(y.dtype)
    return y


def pool_phase_mean(x):
    """avg_pool2 of the full-res map, computed from its s2d store: the 2x2
    mean IS the mean over the 4 phase slots of each channel.  Done as a
    dot with a constant [4C,C] matrix so it fuses on the MXU."""
    c4 = x.shape[-1]
    c = c4 // 4
    key = ("pmean", c)
    if key not in _SEL_CACHE:
        import numpy as np
        m = np.zeros((c4, c), np.float32)
        for q in range(4):
            for i in range(c):
                m[q * c + i, i] = 0.25
        _SEL_CACHE[key] = m
    m = jnp.asarray(_SEL_CACHE[key], x.dtype)
    return jnp.einsum("bhwk,kc->bhwc", x, m)


def _up2_kernel(c: int):
    """Constant [3,3,C,4C] kernel for upsample_bilinear2 (align_corners=
    False, torch 2x stencil: out[2i]=.25 in[i-1]+.75 in[i]; out[2i+1]=
    .75 in[i]+.25 in[i+1]) emitting the s2d store of the upsampled map.
    Border clamping is handled by edge-padding the input 1 cell."""
    import numpy as np
    key = ("up2", c)
    if key not in _SEL_CACHE:
        k1 = {0: {-1: 0.25, 0: 0.75}, 1: {0: 0.75, 1: 0.25}}
        s = np.zeros((3, 3, c, 4 * c), np.float32)
        for py in range(2):
            for px in range(2):
                for ty, wy in k1[py].items():
                    for tx, wx in k1[px].items():
                        for i in range(c):
                            s[ty + 1, tx + 1, i,
                              (py * 2 + px) * c + i] = wy * wx
        _SEL_CACHE[key] = s
    return _SEL_CACHE[key]


def up2_ps(x):
    """upsample_bilinear2 ([B,H,W,C] -> full-res [B,2H,2W,C]) emitting the
    s2d store [B,H,W,4C] directly."""
    c = x.shape[-1]
    w = jnp.asarray(_up2_kernel(c), x.dtype)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    return lax.conv_general_dilated(xp, w, (1, 1), ((0, 0), (0, 0)),
                                    dimension_numbers=_DN)


def actnorm_ps(p, x):
    """ActNorm2d apply in s2d form: per-full-res-channel affine, params
    tiled over the 4 phases."""
    dt = x.dtype
    return (x + tile4(p["b"]).astype(dt)) * jnp.exp(tile4(p["w"])).astype(dt)


def use_phase_trunk(batch: int = 8) -> bool:
    """CFEN_PHASE_TRUNK=1 forces, =0 disables; auto is ON whenever the
    phase band is on (band+trunk won every measured batch — BASELINE.md
    r3b sweep; the trunk form only exists alongside the phase-space
    stem/tail)."""
    flag = os.environ.get("CFEN_PHASE_TRUNK", "auto")
    if flag == "0":
        return False
    if flag == "1":
        return True
    return use_phase_space(batch, trunk_ok=True)


def use_phase_space(batch: int = 8, trunk_ok: bool = False) -> bool:
    """CFEN_PHASE_SPACE=1 forces, =0 disables; auto (default) is ON on TPU
    at batch>=8, or at ANY batch when the spec supports the phase TRUNK
    (trunk_ok).  Measured (v5e 512px bf16, BASELINE.md r3 sweeps): the
    band-only form's dense-kernel overhead (+8.7 GFLOP/img) loses ~3%
    where XLA's full-res layout is good (b7: 218 vs 224) and wins big
    where it flips to batch-sublane (b8: 257 vs 183; b16: 242 vs 180);
    band+trunk wins at EVERY measured batch (b4 252, b7 265 vs 226 plain,
    b8 300, b16 293)."""
    flag = os.environ.get("CFEN_PHASE_SPACE", "auto")
    if flag == "0":
        return False
    try:
        on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False
    if flag == "1":
        return True
    return on_tpu and (batch >= 8 or trunk_ok)
