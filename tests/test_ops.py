"""Per-op golden tests vs torch / the reference's loss implementations.

Covers SURVEY.md section 7 build step 1: every core op matches its PyTorch
counterpart to float32 tolerance before the composite model relies on it.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.ref_utils import has_reference, ref_path

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from cfen_vit_tpu.ops import nn as N  # noqa: E402
from cfen_vit_tpu.ops.patch import unfold_tokens, fold_tokens  # noqa: E402
from cfen_vit_tpu.ops.tiles import split_tiles, join_tiles  # noqa: E402
from cfen_vit_tpu.ops.resize import avg_pool2, upsample_bilinear2  # noqa: E402
from cfen_vit_tpu.ops.gradient import color_gradient  # noqa: E402
from cfen_vit_tpu.ops import ssim as S  # noqa: E402


def _nhwc(t):
    return np.asarray(t).transpose(0, 2, 3, 1)


def _nchw(a):
    return torch.tensor(np.asarray(a).transpose(0, 3, 1, 2))


def test_conv2d_matches_torch(rng):
    x = rng.randn(2, 9, 11, 5).astype(np.float32)
    m = torch.nn.Conv2d(5, 7, 3, stride=2, padding=1)
    ref = m(_nchw(x)).detach().numpy()
    p = {"w": m.weight.detach().numpy().transpose(2, 3, 1, 0),
         "b": m.bias.detach().numpy()}
    got = N.conv2d(p, jnp.asarray(x), stride=2, padding=1)
    np.testing.assert_allclose(np.asarray(got), _nhwc(ref), atol=1e-5)


def test_conv_transpose2d_matches_torch(rng):
    x = rng.randn(2, 8, 6, 4).astype(np.float32)
    m = torch.nn.ConvTranspose2d(4, 6, kernel_size=4, stride=2, padding=1)
    ref = m(_nchw(x)).detach().numpy()
    w = m.weight.detach().numpy()[:, :, ::-1, ::-1]
    p = {"w": np.ascontiguousarray(w.transpose(2, 3, 0, 1)),
         "b": m.bias.detach().numpy()}
    got = N.conv_transpose2d(p, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), _nhwc(ref), atol=1e-5)


def test_actnorm_statistics_and_torch_parity(rng):
    """After init: mean~0, std~1 per channel (the vendored actnorm package's
    test pattern, ref actnorm/tests/test_actnorm.py:6-12), and values match
    the models/actnorm.py implementation."""
    x = rng.randn(4, 8, 8, 5).astype(np.float32) * 3 + 1
    p = N.actnorm_init(5)
    y, newp = N.actnorm_apply(p, jnp.asarray(x), init=True)
    flat = np.asarray(y).reshape(-1, 5)
    np.testing.assert_allclose(flat.mean(0), 0.0, atol=1e-5)
    np.testing.assert_allclose(flat.std(0, ddof=1), 1.0, atol=1e-4)
    # idempotent re-apply
    y2 = N.actnorm_apply(newp, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y), atol=1e-6)
    if has_reference():
        ref_path()
        from models.actnorm import ActNorm2d
        tm = ActNorm2d(5)
        ref = tm(_nchw(x)).detach().numpy()
        np.testing.assert_allclose(np.asarray(y), _nhwc(ref), atol=1e-5)


def test_actnorm_variance_floor(rng):
    x = (rng.randn(2, 4, 4, 3) * 0.01).astype(np.float32)  # var << 0.2
    _, newp = N.actnorm_apply(N.actnorm_init(3), jnp.asarray(x), init=True)
    np.testing.assert_allclose(np.asarray(newp["w"]),
                               -0.5 * np.log(0.2), atol=1e-5)


def test_instance_norm_matches_torch(rng):
    x = rng.randn(2, 6, 7, 4).astype(np.float32)
    ref = torch.nn.InstanceNorm2d(4)(_nchw(x)).numpy()
    got = N.instance_norm(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), _nhwc(ref), atol=1e-5)


def test_layer_norm_matches_torch(rng):
    x = rng.randn(3, 5, 16).astype(np.float32)
    m = torch.nn.LayerNorm(16)
    with torch.no_grad():
        m.weight.uniform_(0.5, 1.5)
        m.bias.uniform_(-0.5, 0.5)
    ref = m(torch.tensor(x)).detach().numpy()
    got = N.layer_norm({"g": m.weight.detach().numpy(),
                        "b": m.bias.detach().numpy()}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5)


def test_unfold_fold_matches_torch(rng):
    x = rng.randn(2, 8, 8, 3).astype(np.float32)
    ref = F.unfold(_nchw(x), 2, stride=2).transpose(1, 2).numpy()  # [B,L,D]
    got = unfold_tokens(jnp.asarray(x), 2)
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-6)
    back = fold_tokens(got, 2, 8, 8)
    np.testing.assert_allclose(np.asarray(back), x, atol=1e-6)


def test_tiles_roundtrip(rng):
    x = rng.randn(2, 16, 16, 3).astype(np.float32)
    t = split_tiles(jnp.asarray(x), 4)
    assert t.shape == (2 * 16, 4, 4, 3)
    back = join_tiles(t, 2, 16, 16)
    np.testing.assert_allclose(np.asarray(back), x, atol=0)
    # tile content: tile 0 of image 0 is the top-left 4x4 block
    np.testing.assert_allclose(np.asarray(t[0]), x[0, :4, :4], atol=0)


def test_tiles_tokens_fused_equals_two_step(rng):
    """split_tiles_tokens/join_tiles_tokens (the fused 8-D transpose) must
    exactly equal unfold_tokens(split_tiles(...)) — CI backing for the
    docstring claim (advisor r2: the pair had no callers and no tests)."""
    from cfen_vit_tpu.ops.tiles import split_tiles_tokens, join_tiles_tokens
    x = rng.randn(2, 16, 16, 3).astype(np.float32)
    fused = split_tiles_tokens(jnp.asarray(x), 8, 2)
    two_step = unfold_tokens(split_tiles(jnp.asarray(x), 8), 2)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(two_step),
                               atol=0)
    back = join_tiles_tokens(fused, 8, 2, 2, 16, 16)
    np.testing.assert_allclose(np.asarray(back), x, atol=0)


def test_avg_pool_matches_torch(rng):
    x = rng.randn(2, 8, 10, 3).astype(np.float32)
    ref = F.avg_pool2d(_nchw(x), 2, 2).numpy()
    got = avg_pool2(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), _nhwc(ref), atol=1e-6)


def test_bilinear_up2_matches_torch(rng):
    x = rng.randn(2, 5, 7, 3).astype(np.float32)
    ref = F.interpolate(_nchw(x), scale_factor=2, mode="bilinear",
                        align_corners=False).numpy()
    got = upsample_bilinear2(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), _nhwc(ref), atol=1e-5)


def test_reflection_pad_matches_torch(rng):
    x = rng.randn(1, 6, 6, 2).astype(np.float32)
    ref = torch.nn.ReflectionPad2d(3)(_nchw(x)).numpy()
    got = N.reflection_pad(jnp.asarray(x), 3)
    np.testing.assert_allclose(np.asarray(got), _nhwc(ref), atol=0)


def test_color_gradient_matches_reference(rng):
    if not has_reference():
        pytest.skip("no reference")
    ref_path()
    from models.gradient import gradient as ref_gradient
    x = rng.randn(2, 16, 16, 3).astype(np.float32)
    ref = ref_gradient(_nchw(x)).numpy()
    got = color_gradient(jnp.asarray(x))
    assert got.shape == (2, 18, 18, 3)
    np.testing.assert_allclose(np.asarray(got), _nhwc(ref), atol=1e-5)


def test_ssim_matches_reference(rng):
    if not has_reference():
        pytest.skip("no reference")
    ref_path()
    import pytorch_msssim as ref_ssim
    a = (rng.rand(2, 32, 32, 3) * 2 - 1).astype(np.float32)
    b = np.clip(a + rng.randn(2, 32, 32, 3).astype(np.float32) * 0.1, -1, 1)
    ref = float(ref_ssim.ssim(_nchw(a), _nchw(b)))
    got = float(S.ssim(jnp.asarray(a), jnp.asarray(b)))
    assert abs(ref - got) < 1e-5


def test_msssim_matches_reference(rng):
    if not has_reference():
        pytest.skip("no reference")
    ref_path()
    import pytorch_msssim as ref_ssim
    a = (rng.rand(1, 192, 192, 3) * 2 - 1).astype(np.float32)
    b = np.clip(a + rng.randn(1, 192, 192, 3).astype(np.float32) * 0.05,
                -1, 1)
    ref = float(ref_ssim.msssim(_nchw(a), _nchw(b)))
    got = float(S.msssim(jnp.asarray(a), jnp.asarray(b)))
    assert abs(ref - got) < 1e-4


def test_mha_matches_torch(rng):
    from cfen_vit_tpu.models.vit import mha_apply
    e, h, s, n = 16, 4, 10, 3
    m = torch.nn.MultiheadAttention(e, h, bias=False)
    x = rng.randn(s, n, e).astype(np.float32)  # torch is seq-first
    xt = torch.tensor(x)
    ref, _ = m(xt, xt, xt)
    in_proj = m.in_proj_weight.detach().numpy()
    p = {"wq": in_proj[:e].T, "wk": in_proj[e:2 * e].T,
         "wv": in_proj[2 * e:].T,
         "wo": m.out_proj.weight.detach().numpy().T}
    got = mha_apply({k: jnp.asarray(v) for k, v in p.items()},
                    jnp.asarray(x.transpose(1, 0, 2)),
                    jnp.asarray(x.transpose(1, 0, 2)),
                    jnp.asarray(x.transpose(1, 0, 2)), h)
    np.testing.assert_allclose(np.asarray(got).transpose(1, 0, 2),
                               ref.detach().numpy(), atol=1e-5)


def test_mha_headmajor_equivalence(rng):
    """Head-major MHA (head split folded into the projection dots) must
    match the packed path: same contractions, different layouts."""
    from cfen_vit_tpu.models.vit import mha_apply, mha_apply_headmajor
    for (n, s, e, h) in [(3, 10, 16, 4), (2, 64, 96, 4), (1, 16, 48, 16)]:
        x = jnp.asarray(rng.randn(n, s, e).astype(np.float32))
        p = {k: jnp.asarray(rng.randn(e, e).astype(np.float32)) * 0.1
             for k in ("wq", "wk", "wv", "wo")}
        a = mha_apply(p, x, x, x, h)
        b = mha_apply_headmajor(p, x, x, x, h)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=2e-6)
    # bf16 path agrees to bf16 tolerance
    xb = x.astype(jnp.bfloat16)
    pb = {k: v.astype(jnp.bfloat16) for k, v in p.items()}
    a = np.asarray(mha_apply(pb, xb, xb, xb, h), np.float32)
    b = np.asarray(mha_apply_headmajor(pb, xb, xb, xb, h), np.float32)
    np.testing.assert_allclose(a, b, rtol=0.05, atol=0.05)


def test_ssim_bf16_near_constant_stays_finite(rng):
    """bf16 cancellation guard (r5 device overfit: ssim_r = -inf at step
    117).  E[x^2] - mu^2 in bf16 (eps ~0.008) goes ~-1e-3 negative on
    near-constant windows, so v2 = s1+s2+C2 could round to <= 0 ->
    ssim_map +-inf (or silent huge-ratio outliers).  The relu on the
    variance terms is an exact-math no-op (variance >= 0); this stress
    sweep must stay finite and inside the analytic SSIM range."""
    import jax

    f = jax.jit(lambda a, b: S.ssim(a, b))
    g = jax.jit(jax.grad(lambda a, b: S.ssim(a, b)))
    for seed in range(40):
        r = np.random.RandomState(seed)
        base = r.uniform(-1, 1)
        a = base + r.randn(2, 64, 64, 3) * 1e-3
        b = a + r.randn(2, 64, 64, 3) * 1e-3
        a = jnp.asarray(a, jnp.bfloat16)
        b = jnp.asarray(b, jnp.bfloat16)
        v = float(f(a, b))
        # bf16 rounds near-identical windows to ssim ~1 +- 0.08 (numerator
        # and denominator quantize independently) — benign; the regression
        # target is the inf/huge-ratio class, hence the loose bound
        assert np.isfinite(v) and -1.25 <= v <= 1.25, (seed, v)
        assert bool(jnp.all(jnp.isfinite(g(a, b)))), seed
