"""Flash-MRF: the ID-MRF divergence as streaming Pallas/TPU kernels.

The ID-MRF loss (reference consistency.py:42-91) builds, per batch image
and VGG layer, a [P, P] relative-distance matrix (P = H*W feature
positions; 16384 at relu3_1 for 512px inputs) and reduces it to a scalar.
The XLA lowering — even the lax.scan-blocked form in losses/vgg.py — must
materialize ~1 GB of f32 [block, P] intermediates per step in HBM
(cos -> relative distance -> exp -> row-normalize -> column-max), and the
r3b train profile measured those scans + their backward at ~35% of GAN-step
device time at b8.

This module computes the same math flash-attention-style: each kernel
step holds a full q-row strip [Sq, P] in VMEM, so the [P, P] matrix NEVER
exists in HBM — forward or backward.  What leaves the kernels is O(P):

  forward : m[q] = min_p cd, Z[q] = sum_p exp-term, p*[q] = argmin,
            K[p] = max_q cs, q*[p] = argmax           (all [N, P])
  backward: two kernels RECOMPUTE the cos dot tile-wise (the MXU is ~5%
            busy here; trading FLOPs for HBM is the whole point) and emit
            do = dcos @ t and dt = dcos^T @ o directly.

Math (per batch n; o, t are the L2-normalized features [P, C]):

  cos = o @ t^T            cd = (1 - cos)/2
  m[q] = min_p cd          r = cd / (m + eps)        eps = 1e-5
  be = exp(2 - 2 r)        Z[q] = sum_p be           cs = be / Z
  K[p] = max_q cs          div = mean_p K            L = -log(div)

Backward (g = upstream cotangent on sum_n L_n):
  dK = -g / (div P)
  dZ[q] = -(dK / Z[q]) * sum_{p: q*[p]=q} K[p]       (segment-sum, XLA)
  B[q,p] = dK [q = q*[p]] / Z[q] + dZ[q]             (d L / d be)
  dcos_dense[q,p] = be B / (m + eps)                 (in-kernel, dense)
  dm[q] = sum_p 2 be B cd / (m + eps)^2              (do-kernel by-product)
  dcos_point[q, p*[q]] = -dm[q] / 2                  (rank-1, XLA gather/
                                                      scatter epilogue)
  do = dcos @ t + point;  dt = dcos^T @ o + point

Exactness: identical operations to losses/vgg.py _mrf in f32 up to dot
tiling reassociation (tests/test_pallas_mrf.py: values and grads vs the
dense path < 1e-4, interpreter mode on CPU).  Tie-breaking for both
argmin and argmax picks the first index, matching torch.min/max.

Mosaic hygiene (CLAUDE.md r2/r3 gotchas): every in-kernel tensor and
every ref store is 2-D — row stats live as [Sq, 1] blocks of [N, P, 1]
arrays, column stats as [1, P] blocks of [N, 1, P] — no 1-D vectors, no
lane-splitting reshapes, no dynamic slices."""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except ImportError:  # pragma: no cover
    _HAS_PALLAS = False

_EPS = 1e-5

# XLA's default scoped-vmem budget is 16 MB and the resident [1, P, C]
# t-operand block (16384x256 bf16 = 8 MB) is double-buffered by Mosaic, so
# the kernels need ~16 MB + the SQ-dependent strips (r4 device ladder: OOM
# by 48K..384K at SQ=16..128).  v5e has 128 MB of physical VMEM; raise the
# per-kernel limit instead of restructuring — the t block is resident by
# design (each q-strip dots against ALL of t).
_VMEM_LIMIT = 96 * 1024 * 1024


def _compiler_params(grid_dims: int):
    if not _HAS_PALLAS:  # pragma: no cover
        return None
    # dim 0 (batch) is parallel; dim 1 (strips) accumulates the column
    # running-max in the forward kernel, so mark it arbitrary everywhere.
    sem = ("parallel",) * (grid_dims - 1) + ("arbitrary",)
    return pltpu.CompilerParams(
        dimension_semantics=sem, vmem_limit_bytes=_VMEM_LIMIT)


def _sq() -> int:
    """q-strip rows (CFEN_MRF_SQ).  Default 128 — the r4 device sweep's
    best (v5e b8 512px GAN step: SQ=64 11.97, **128 12.66**, 256 12.23,
    512 11.07 img/s); bigger strips amortize the resident-t reload less
    than they bloat the [Sq, P] f32 temporaries."""
    try:
        v = int(os.environ.get("CFEN_MRF_SQ", "") or 128)
    except ValueError:  # pragma: no cover
        v = 128
    return max(8, v)


def _clamp() -> bool:
    """CFEN_MRF_CLAMP=0 disables the cos>1 clamp and its grad masks — a
    debug A/B knob for measuring the clamp's device cost only; the
    unclamped form NaNs under bf16 (r4 trace: step 16) and must not ship."""
    return os.environ.get("CFEN_MRF_CLAMP", "1") != "0"


# --------------------------------------------------------------------------
# forward kernel: per (n, q-strip) — row stats + running column max
# --------------------------------------------------------------------------

def _fw_kernel(sq: int, o_ref, t_ref, m_ref, z_ref, ps_ref,
               k_ref, qs_ref):
    qs = pl.program_id(1)
    o = o_ref[0]                                   # [Sq, C]
    t = t_ref[0]                                   # [P, C]
    cos = jax.lax.dot_general(
        o, t, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)        # [Sq, P]
    # clamp: no-op in exact math, load-bearing in bf16 (see losses/vgg.py
    # _mrf_rows — cos > 1 from normalization roundoff makes m + eps
    # negative and the exp overflows; r4 device trace: p=nan at step 16)
    cd = 0.5 - 0.5 * cos
    if _clamp():
        cd = jnp.maximum(cd, 0.0)
    m = jnp.min(cd, axis=1, keepdims=True)         # [Sq, 1]
    piot = jax.lax.broadcasted_iota(jnp.int32, cd.shape, 1)
    p_star = jnp.min(jnp.where(cd == m, piot, jnp.int32(cd.shape[1])),
                     axis=1, keepdims=True)        # [Sq, 1] first argmin
    be = jnp.exp(2.0 - 2.0 * (cd / (m + _EPS)))
    z = jnp.sum(be, axis=1, keepdims=True)         # [Sq, 1]
    cs = be / z

    m_ref[0] = m
    z_ref[0] = z
    ps_ref[0] = p_star

    cmax = jnp.max(cs, axis=0, keepdims=True)      # [1, P]
    riot = jax.lax.broadcasted_iota(jnp.int32, cs.shape, 0)
    rloc = jnp.min(jnp.where(cs == cmax, riot, jnp.int32(sq)),
                   axis=0, keepdims=True)          # [1, P] first argmax
    rglob = rloc + qs * sq

    @pl.when(qs == 0)
    def _init():
        k_ref[0] = cmax
        qs_ref[0] = rglob

    @pl.when(qs != 0)
    def _acc():
        upd = cmax > k_ref[0]
        k_ref[0] = jnp.where(upd, cmax, k_ref[0])
        qs_ref[0] = jnp.where(upd, rglob, qs_ref[0])


def _mrf_forward_stats(o, t, interpret: bool = False):
    """o, t: [N, P, C] -> (m, z, p_star, k, q_star) with m/z/p_star
    [N, P, 1] and k/q_star [N, 1, P]."""
    n, p_len, c = o.shape
    sq = min(_sq(), p_len)   # direct callers may pass P < the default strip
    n_strips = p_len // sq
    o_spec = pl.BlockSpec((1, sq, c), lambda i, j: (i, j, 0))
    t_spec = pl.BlockSpec((1, p_len, c), lambda i, j: (i, 0, 0))
    row_spec = pl.BlockSpec((1, sq, 1), lambda i, j: (i, j, 0))
    col_spec = pl.BlockSpec((1, 1, p_len), lambda i, j: (i, 0, 0))
    return pl.pallas_call(
        functools.partial(_fw_kernel, sq),
        out_shape=[
            jax.ShapeDtypeStruct((n, p_len, 1), jnp.float32),   # m
            jax.ShapeDtypeStruct((n, p_len, 1), jnp.float32),   # z
            jax.ShapeDtypeStruct((n, p_len, 1), jnp.int32),     # p*
            jax.ShapeDtypeStruct((n, 1, p_len), jnp.float32),   # K
            jax.ShapeDtypeStruct((n, 1, p_len), jnp.int32),     # q*
        ],
        grid=(n, n_strips),
        in_specs=[o_spec, t_spec],
        out_specs=[row_spec, row_spec, row_spec, col_spec, col_spec],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * p_len * p_len * c,
            bytes_accessed=2 * n * p_len * c * o.dtype.itemsize,
            transcendentals=n * p_len * p_len),
        compiler_params=_compiler_params(2),
        interpret=interpret,
    )(o, t)


# --------------------------------------------------------------------------
# backward kernels.  Both recompute cos tile-wise and apply the dense
# cotangent  dcos[q,p] = be * B / (m + eps),
#            B = dK * [q = q*[p]] / Z[q] + dZ[q].
# The do-kernel (q-strips) also accumulates dm[q].
# --------------------------------------------------------------------------

def _bwd_do_kernel(sq: int, o_ref, t_ref, m_ref, z_ref, dz_ref, qstar_ref,
                   dk_ref, do_ref, dm_ref):
    qs = pl.program_id(1)
    o = o_ref[0]                                   # [Sq, C]
    t = t_ref[0]                                   # [P, C]
    cos = jax.lax.dot_general(
        o, t, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)        # [Sq, P]
    cd = 0.5 - 0.5 * cos
    if _clamp():
        cd = jnp.maximum(cd, 0.0)                  # fwd-kernel clamp
    m = m_ref[0]                                   # [Sq, 1]
    z = z_ref[0]
    dz = dz_ref[0]
    dk = dk_ref[0, 0, 0]
    be = jnp.exp(2.0 - 2.0 * (cd / (m + _EPS)))
    riot = jax.lax.broadcasted_iota(jnp.int32, cd.shape, 0) + qs * sq
    hit = riot == qstar_ref[0]                     # [Sq,P] vs [1,P]
    b_cot = jnp.where(hit, dk / z, 0.0) + dz
    beb = be * b_cot
    dcos = beb / (m + _EPS)
    if _clamp():
        # d cd/d cos vanishes where the clamp was active; cos < 1 <=> raw
        # cd > 0, reusing the live cos strip (no second [Sq,P] buffer)
        dcos = jnp.where(cos < 1.0, dcos, 0.0)
    dm_ref[0] = (jnp.sum(2.0 * beb * cd, axis=1, keepdims=True)
                 / (m + _EPS) ** 2)
    do_ref[0] = jax.lax.dot_general(
        dcos, t, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(do_ref.dtype)


def _bwd_dt_kernel(sp: int, t_ref, o_ref, m_ref, z_ref, dz_ref, qstar_ref,
                   dk_ref, dt_ref):
    t = t_ref[0]                                   # [Sp, C] (p-strip)
    o = o_ref[0]                                   # [P, C]  (all q rows)
    cos_t = jax.lax.dot_general(
        t, o, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)        # [Sp, P(q)]
    cd = 0.5 - 0.5 * cos_t
    if _clamp():
        cd = jnp.maximum(cd, 0.0)                  # fwd-kernel clamp
    m = m_ref[0]                                   # [1, P(q)]
    z = z_ref[0]
    dz = dz_ref[0]
    dk = dk_ref[0, 0, 0]
    be = jnp.exp(2.0 - 2.0 * (cd / (m + _EPS)))
    qiot = jax.lax.broadcasted_iota(jnp.int32, cd.shape, 1)
    hit = qiot == qstar_ref[0]                     # [Sp,P] vs [Sp,1]
    b_cot = jnp.where(hit, dk / z, 0.0) + dz
    dcos_t = be * b_cot / (m + _EPS)
    if _clamp():
        dcos_t = jnp.where(cos_t < 1.0, dcos_t, 0.0)
    dt_ref[0] = jax.lax.dot_general(
        dcos_t, o, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dt_ref.dtype)


def _mrf_backward(o, t, m, z, dz, q_star, dk, interpret: bool = False):
    """Dense cotangent parts.  m/z/dz: [N,P,1]; q_star: [N,1,P];
    dk: [N,1,1].  Returns (do [N,P,C], dt [N,P,C], dm [N,P,1])."""
    n, p_len, c = o.shape
    sq = min(_sq(), p_len)
    n_strips = p_len // sq
    strip_spec = pl.BlockSpec((1, sq, c), lambda i, j: (i, j, 0))
    full_spec = pl.BlockSpec((1, p_len, c), lambda i, j: (i, 0, 0))
    rowb_spec = pl.BlockSpec((1, sq, 1), lambda i, j: (i, j, 0))
    rowfull_spec = pl.BlockSpec((1, p_len, 1), lambda i, j: (i, 0, 0))
    colb_spec = pl.BlockSpec((1, 1, p_len), lambda i, j: (i, 0, 0))
    # Mosaic's block-mapping check requires the last two block dims to be
    # (8,128)-divisible OR equal to the array's — a (1,1) block of an [N,1]
    # array fails the sublane leg even in SMEM (measured on device, r4
    # ladder).  A trailing unit dim makes the block's last two dims equal
    # to the array's: [N,1,1] blocked (1,1,1).
    dk_spec = pl.BlockSpec((1, 1, 1), lambda i, j: (i, 0, 0),
                           memory_space=pltpu.SMEM)
    do, dm = pl.pallas_call(
        functools.partial(_bwd_do_kernel, sq),
        out_shape=[jax.ShapeDtypeStruct((n, p_len, c), o.dtype),
                   jax.ShapeDtypeStruct((n, p_len, 1), jnp.float32)],
        grid=(n, n_strips),
        in_specs=[strip_spec, full_spec, rowb_spec, rowb_spec, rowb_spec,
                  colb_spec, dk_spec],
        out_specs=[strip_spec, rowb_spec],
        cost_estimate=pl.CostEstimate(
            flops=4 * n * p_len * p_len * c,
            bytes_accessed=2 * n * p_len * c * o.dtype.itemsize,
            transcendentals=n * p_len * p_len),
        compiler_params=_compiler_params(2),
        interpret=interpret,
    )(o, t, m, z, dz, q_star, dk)
    # dt-kernel: p-strips; the q-side (column) stats ride whole-[1,P]
    # blocks, the p-side q_star rides [Sq,1] strips
    m_c = m.reshape(n, 1, p_len)
    z_c = z.reshape(n, 1, p_len)
    dz_c = dz.reshape(n, 1, p_len)
    qs_r = q_star.reshape(n, p_len, 1)
    dt = pl.pallas_call(
        functools.partial(_bwd_dt_kernel, sq),
        out_shape=jax.ShapeDtypeStruct((n, p_len, c), t.dtype),
        grid=(n, n_strips),
        in_specs=[strip_spec, full_spec, colb_spec, colb_spec, colb_spec,
                  rowb_spec, dk_spec],
        out_specs=strip_spec,
        cost_estimate=pl.CostEstimate(
            flops=4 * n * p_len * p_len * c,
            bytes_accessed=2 * n * p_len * c * t.dtype.itemsize,
            transcendentals=n * p_len * p_len),
        compiler_params=_compiler_params(2),
        interpret=interpret,
    )(t, o, m_c, z_c, dz_c, qs_r, dk)
    return do, dt, dm


# --------------------------------------------------------------------------
# custom-vjp core
# --------------------------------------------------------------------------

def _interpret() -> bool:
    return os.environ.get("CFEN_PALLAS_INTERPRET", "0") == "1"


@jax.custom_vjp
def mrf_core(o_n, t_n):
    """sum_n -log(mean_p max_q cs[q,p]) for normalized features [N,P,C]."""
    _, _, _, k, _ = _mrf_forward_stats(o_n, t_n, interpret=_interpret())
    div = jnp.mean(k[:, 0, :], axis=1)
    return jnp.sum(-jnp.log(div))


def _mrf_core_fwd(o_n, t_n):
    m, z, p_star, k, q_star = _mrf_forward_stats(
        o_n, t_n, interpret=_interpret())
    div = jnp.mean(k[:, 0, :], axis=1)
    loss = jnp.sum(-jnp.log(div))
    return loss, (o_n, t_n, m, z, p_star, k, q_star, div)


def _mrf_core_bwd(res, g):
    o_n, t_n, m, z, p_star, k, q_star, div = res
    n, p_len, c = o_n.shape
    dk = (-g / (div * p_len)).astype(jnp.float32)[:, None]   # [N,1]
    # dZ via segment-sum of K over argmax rows (vmapped scatter-add)
    sum_kq = jax.vmap(
        lambda qs, kk: jnp.zeros((p_len,), jnp.float32).at[qs].add(kk)
    )(q_star[:, 0, :], k[:, 0, :])
    dz = (-dk * sum_kq / z[:, :, 0])[:, :, None]             # [N,P,1]
    do, dt, dm = _mrf_backward(o_n, t_n, m, z, dz, q_star,
                               dk[:, :, None], interpret=_interpret())
    # rank-1 argmin corrections: dcos[q, p*[q]] += -dm[q]/2.  When the row
    # min was produced by the clamp (m == 0 <=> some raw cd <= 0), d m/d cos
    # is zero through max(cd, 0), so the correction is dropped — matching
    # autodiff of the clamped dense path.
    coef = (-0.5 * dm[:, :, 0]).astype(jnp.float32)          # [N,P]
    if _clamp():
        coef = jnp.where(m[:, :, 0] > 0, coef, 0.0)
    ps = p_star[:, :, 0]
    t_at_pstar = jnp.take_along_axis(
        t_n.astype(jnp.float32), ps[:, :, None], axis=1)     # [N,P,C]
    do = do.astype(jnp.float32) + coef[:, :, None] * t_at_pstar
    dt_sc = jax.vmap(
        lambda pss, vals: jnp.zeros((p_len, c), jnp.float32).at[pss].add(
            vals)
    )(ps, coef[:, :, None] * o_n.astype(jnp.float32))
    dt = dt.astype(jnp.float32) + dt_sc
    return do.astype(o_n.dtype), dt.astype(t_n.dtype)


mrf_core.defvjp(_mrf_core_fwd, _mrf_core_bwd)


# --------------------------------------------------------------------------
# dispatch
# --------------------------------------------------------------------------

def supported(p_len: int, c: int) -> bool:
    return _HAS_PALLAS and p_len % _sq() == 0 and p_len >= 1024 \
        and c % 128 == 0


def use_pallas_mrf() -> bool:
    """CFEN_PALLAS_MRF=1 forces, =0 disables; auto is ON on TPU (the CPU
    path would need interpret mode — the XLA scan wins there).  Measured
    (r4 device ladder, v5e b8 512px GAN step, remat=branch): dense scan
    10.7 img/s MFU 17.2% -> flash-MRF SQ=128 **12.66 img/s MFU 24.6%**
    (+18%); IDMRF was ~35% of step device time in the r3b profile."""
    flag = os.environ.get("CFEN_PALLAS_MRF", "auto")
    if flag == "0" or not _HAS_PALLAS:
        return False
    if flag == "1":
        return True
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False
