"""Core neural-net primitives, NHWC layout, functional (params are pytrees).

Semantics mirror the reference's PyTorch modules exactly (tolerances ~1e-5):
  * conv2d            <- nn.Conv2d (ref models/common.py:11-14 same-padding)
  * conv_transpose2d  <- nn.ConvTranspose2d(k=4,s=2,p=1) (ref v3:301-322)
  * linear            <- nn.Linear
  * layer_norm        <- nn.LayerNorm(eps=1e-5)
  * instance_norm     <- nn.InstanceNorm2d(affine=False) (ref v3:292-298)
  * actnorm_apply     <- models/actnorm.py:22-47 ((x+bias)*exp(weight), with
                         data-dependent init from the first batch; variance is
                         the *unbiased* estimator floored at 0.2, ref :29-33)
  * reflection_pad    <- nn.ReflectionPad2d

All convs run through lax.conv_general_dilated with NHWC/HWIO dimension
numbers so XLA tiles them straight onto the MXU.  Param layouts:
  conv w: [kh, kw, in, out];  conv_transpose w: stored pre-flipped as the
  equivalent dilated-conv kernel [kh, kw, in, out];  linear w: [in, out].
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax import lax

_DN = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                 ("NHWC", "HWIO", "NHWC"))


# --------------------------------------------------------------------------
# initializers (mirroring reference init_weights 'kaiming', v3:49-74)
# --------------------------------------------------------------------------

def kaiming_normal(key, shape, fan_in):
    """kaiming_normal_(a=0, mode='fan_in'): std = sqrt(2/fan_in)."""
    return jax.random.normal(key, shape) * math.sqrt(2.0 / fan_in)


def kaiming_uniform_a5(key, shape, fan_in):
    """torch kaiming_uniform_(a=sqrt(5)): U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, minval=-bound, maxval=bound)


def conv_init(key, kh, kw, cin, cout, bias=True):
    p = {"w": kaiming_normal(key, (kh, kw, cin, cout), kh * kw * cin)}
    if bias:
        p["b"] = jnp.zeros((cout,))
    return p


def conv_transpose_init(key, kh, kw, cin, cout, bias=True):
    # fan_in of the torch ConvTranspose2d weight [cin, cout, kh, kw] under
    # kaiming(fan_in) is cout*kh*kw (torch counts dim-1 * receptive field).
    p = {"w": kaiming_normal(key, (kh, kw, cin, cout), kh * kw * cout)}
    if bias:
        p["b"] = jnp.zeros((cout,))
    return p


def linear_init(key, cin, cout, bias=True):
    p = {"w": kaiming_normal(key, (cin, cout), cin)}
    if bias:
        p["b"] = jnp.zeros((cout,))
    return p


def layer_norm_init(dim):
    return {"g": jnp.ones((dim,)), "b": jnp.zeros((dim,))}


def actnorm_init(dim):
    # weight/bias resolved by the data-dependent init pass (see actnorm_apply)
    # the flag is float32 so the whole param tree is differentiable
    # (it is bookkeeping only; Adam no-ops on its zero gradient)
    return {"w": jnp.zeros((dim,)), "b": jnp.zeros((dim,)),
            "initialized": jnp.zeros((), dtype=jnp.float32)}


# --------------------------------------------------------------------------
# apply functions
# --------------------------------------------------------------------------

def conv2d(p, x, stride: int = 1, padding=0):
    """nn.Conv2d equivalent; x NHWC, w [kh,kw,in,out].  padding: int or
    (ph, pw) like torch's per-dim padding (symmetric within each dim)."""
    ph, pw = (padding, padding) if isinstance(padding, int) else padding
    out = lax.conv_general_dilated(
        x, p["w"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=((ph, ph), (pw, pw)),
        dimension_numbers=_DN)
    if "b" in p:
        out = out + p["b"].astype(x.dtype)
    return out


def conv_transpose2d(p, x, stride: int = 2, padding: int = 1,
                     kernel: int = 4, output_padding: int = 0):
    """nn.ConvTranspose2d(k,s,p,output_padding) via input dilation.

    The stored kernel is already the spatially-flipped, [kh,kw,in,out]
    equivalent of torch's [in,out,kh,kw] weight, so this is a plain dilated
    conv with padding k-1-p low / k-1-p+output_padding high.
    """
    pad = kernel - 1 - padding
    out = lax.conv_general_dilated(
        x, p["w"].astype(x.dtype),
        window_strides=(1, 1),
        padding=((pad, pad + output_padding), (pad, pad + output_padding)),
        lhs_dilation=(stride, stride),
        dimension_numbers=_DN)
    if "b" in p:
        out = out + p["b"].astype(x.dtype)
    return out


def linear(p, x):
    out = x @ p["w"].astype(x.dtype)
    if "b" in p:
        out = out + p["b"].astype(x.dtype)
    return out


def layer_norm(p, x, eps: float = 1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    y = (x - mu) * lax.rsqrt(var + eps)
    return y * p["g"].astype(x.dtype) + p["b"].astype(x.dtype)


def instance_norm(x, eps: float = 1e-5):
    """InstanceNorm2d(affine=False, track_running_stats=False), NHWC.

    Stats are computed in f32 via a lane-efficient two-stage sum: reducing
    [B,H,W*C] over H keeps all 128 lanes busy (a plain (H,W)-axis reduce
    uses C=24 of 128 lanes and measured 4.5x slower on v5e); one-pass
    E[x^2]-mu^2 halves the passes.  f32 stats also make the bf16 path
    MORE accurate than per-dtype stats were."""
    b, h, w, c = x.shape
    # f32 stats for f32/bf16; f64 inputs keep f64 so the phase-space paths
    # (different sum orders) stay exactness-testable (tests/test_phase_space)
    ct = jnp.float64 if x.dtype == jnp.float64 else jnp.float32
    x32 = x.astype(ct)
    r = x32.reshape(b, h, w * c)
    s1 = jnp.sum(r, axis=1).reshape(b, w, c).sum(axis=1)
    s2 = jnp.sum(jnp.square(r), axis=1).reshape(b, w, c).sum(axis=1)
    n = h * w
    mu = s1 / n
    var = jnp.maximum(s2 / n - jnp.square(mu), 0.0)
    y = (x32 - mu[:, None, None, :]) * lax.rsqrt(var[:, None, None, :]
                                                 + eps)
    return y.astype(x.dtype)


def actnorm_apply(p, x, init: bool = False):
    """ActNorm2d: y = (x + bias) * exp(weight), channel-last.

    With init=True, returns (y, new_params) computing bias=-mean and
    weight=-0.5*log(max(var, 0.2)) from this batch (unbiased variance),
    matching models/actnorm.py:25-37.  Already-initialized params are left
    untouched so a resumed init pass is idempotent.
    """
    if init:
        flat = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
        n = flat.shape[0]
        mean = jnp.mean(flat, axis=0)
        var = jnp.sum(jnp.square(flat - mean), axis=0) / max(n - 1, 1)
        var = jnp.maximum(var, 0.2)
        done = p["initialized"] > 0
        new_b = jnp.where(done, p["b"], -mean)
        new_w = jnp.where(done, p["w"], -0.5 * jnp.log(var))
        newp = {"w": new_w, "b": new_b,
                "initialized": jnp.ones((), dtype=jnp.float32)}
        y = (x + new_b.astype(x.dtype)) * jnp.exp(new_w).astype(x.dtype)
        return y, newp
    return (x + p["b"].astype(x.dtype)) * jnp.exp(p["w"]).astype(x.dtype)


def reflection_pad(x, pad: int):
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")


def relu(x):
    return jnp.maximum(x, 0)


def leaky_relu(x, slope: float = 0.2):
    return jnp.where(x >= 0, x, x * slope)
