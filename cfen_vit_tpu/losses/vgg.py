"""VGG19 feature tower + the three perceptual losses built on it.

The reference uses two torchvision-pretrained VGG19 wrappers:
  * epdn/epdn_networks.py:663-693 `Vgg19` sliced at relu1_1/2_1/3_1/4_1/5_1,
    feeding `VGGLoss` (:134-146): L1 per slice, weights [1/32,1/16,1/8,1/4,1],
    inputs in [-1,1] with NO mean normalization;
  * models/vgg.py:199-229 `VGG19FeatLayer`: subtracts the ImageNet mean
    (no std), tap naming where 'reluK_2' is the ReLU after convK_1; feeds
    SemanticConsistencyLoss (L1 on relu3_2, ref consistency.py:9-27) and
    IDMRFLoss (MRF on relu3_2 + relu4_2, ref consistency.py:30-102).

This container has no torchvision / no network egress, so pretrained
weights must be provided as an .npz via `CFEN_VGG19_NPZ` (keys
`conv{k}_{i}.w` HWIO / `.b`) or cfg; otherwise `vgg19_init` gives a fixed
seeded random tower — the loss is then still a valid trainable perceptual
loss (random-feature perceptual losses are well studied), just not
ImageNet-VGG.  A converter from a torchvision state_dict lives in
interop/torch_import.py-style form below (`weights_from_torch_vgg`).

Only the taps the losses need are computed: through conv5_1 for the
perceptual loss, conv4_1 for MRF.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import nn as N

# (block, convs-in-block) for VGG19 features through conv5_1
_VGG19_BLOCKS = [(64, 2), (128, 2), (256, 4), (512, 4), (512, 4)]

# layers we actually need: everything up to and including conv5_1
_NEEDED = [("conv1_1",), ("conv1_2",), ("conv2_1",), ("conv2_2",),
           ("conv3_1",), ("conv3_2",), ("conv3_3",), ("conv3_4",),
           ("conv4_1",), ("conv4_2",), ("conv4_3",), ("conv4_4",),
           ("conv5_1",)]

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)


def _layer_defs():
    defs = []
    cin = 3
    for bi, (ch, n) in enumerate(_VGG19_BLOCKS, start=1):
        for ci in range(1, n + 1):
            defs.append((f"conv{bi}_{ci}", cin, ch))
            cin = ch
    return defs


def vgg19_init(key=None, npz_path: Optional[str] = None) -> Dict:
    """Load pretrained weights if available, else seeded random."""
    npz_path = npz_path or os.environ.get("CFEN_VGG19_NPZ", "")
    params: Dict = {}
    if npz_path and os.path.exists(npz_path):
        data = np.load(npz_path)
        for name, cin, ch in _layer_defs():
            if f"{name}.w" not in data:
                break
            params[name] = {"w": jnp.asarray(data[f"{name}.w"]),
                            "b": jnp.asarray(data[f"{name}.b"])}
        if params:
            return params
    key = key if key is not None else jax.random.PRNGKey(1234)
    for i, (name, cin, ch) in enumerate(_layer_defs()):
        params[name] = N.conv_init(jax.random.fold_in(key, i), 3, 3, cin, ch)
    return params


def weights_from_torch_vgg(state_dict) -> Dict[str, np.ndarray]:
    """Convert torchvision vgg19().features state_dict to our npz layout."""
    idx_to_name = []
    li = 0
    for bi, (ch, n) in enumerate(_VGG19_BLOCKS, start=1):
        for ci in range(1, n + 1):
            idx_to_name.append((li, f"conv{bi}_{ci}"))
            li += 2  # conv + relu
        li += 1      # pool
    out = {}
    for idx, name in idx_to_name:
        w = np.asarray(state_dict[f"{idx}.weight"])
        out[f"{name}.w"] = w.transpose(2, 3, 1, 0)
        out[f"{name}.b"] = np.asarray(state_dict[f"{idx}.bias"])
    return out


def _vgg_ps() -> bool:
    """CFEN_VGG_PS=1 routes conv1_1 through the phase-space form (=0 off;
    default off pending on-device measurement — repo dispatch discipline).

    Why: the r3b train profile put the VGG towers at ~10% of GAN-step
    device time with the FIRST conv lane-starved — its input is the
    full-res [B,512,512,3] C<sublane band, the exact geometry whose XLA
    layout flipped to batch-sublane at b>=8 and motivated ops/phase_space
    (BASELINE.md r3).  conv1_1 is 0.9 GFLOP/img, so the time is layout,
    not math: computing it as the exact s2d phase conv (cin 12, K=3 cells,
    3.7 GFLOP/img — noise on the MXU) keeps the starved band out of the
    conv entirely.  Only conv1_1 converts; deeper layers have >=64
    channels and healthy layouts, and a full s2d tower would 4x their
    ~136 GFLOP/img."""
    return os.environ.get("CFEN_VGG_PS", "0") == "1"


def _conv1_1_ps(p, x):
    """conv1_1 + bias via the s2d phase form; exact (expand_s1 zero-pad
    semantics) — returns the full-res [N,H,W,64] pre-ReLU activations."""
    from ..ops import phase_space as PH
    xs = PH.space_to_depth(x)
    w_ps = PH.expand_s1(p["w"])                    # [3,3,12,256]
    y = PH.conv_ps(xs, w_ps, 1) + PH.tile4(p["b"]).astype(x.dtype)
    return PH.depth_to_space(y)


def vgg19_features(params, x, taps: Tuple[str, ...],
                   subtract_mean: bool = False) -> Dict[str, jnp.ndarray]:
    """x: NHWC.  taps name the ReLU after a conv, e.g. 'relu3_1'.

    Runs only as deep as the deepest requested tap."""
    if subtract_mean:
        x = x - jnp.asarray(_IMAGENET_MEAN, x.dtype)
    want = set(taps)
    feats = {}
    use_ps = (_vgg_ps() and x.ndim == 4
              and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0)
    for bi, (ch, n) in enumerate(_VGG19_BLOCKS, start=1):
        if bi > 1:
            x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                      (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
        for ci in range(1, n + 1):
            name = f"conv{bi}_{ci}"
            if bi == 1 and ci == 1 and use_ps:
                x = N.relu(_conv1_1_ps(params[name], x))
            else:
                x = N.relu(N.conv2d(params[name], x, padding=1))
            tap = f"relu{bi}_{ci}"
            if tap in want:
                feats[tap] = x
                if len(feats) == len(want):
                    return feats
    return feats


def vgg_perceptual_loss(params, x, y):
    """epdn VGGLoss: sliced L1 with pyramid weights (ref :134-146)."""
    taps = ("relu1_1", "relu2_1", "relu3_1", "relu4_1", "relu5_1")
    weights = (1 / 32, 1 / 16, 1 / 8, 1 / 4, 1.0)
    fx = vgg19_features(params, x, taps)
    fy = vgg19_features(params, y, taps)
    fy = jax.tree_util.tree_map(jax.lax.stop_gradient, fy)
    return sum(w * jnp.mean(jnp.abs(fx[t] - fy[t]))
               for w, t in zip(weights, taps))


def semantic_consistency_loss(params, out, target):
    """L1 on the FeatLayer's 'relu3_2' (== ReLU after conv3_1),
    inputs mean-shifted (ref consistency.py:9-27, vgg.py:205-216)."""
    fo = vgg19_features(params, out, ("relu3_1",), subtract_mean=True)
    ft = vgg19_features(params, target, ("relu3_1",), subtract_mean=True)
    return jnp.mean(jnp.abs(fo["relu3_1"] - ft["relu3_1"]))


def _normalize_feats(o, t):
    n, h, w, c = o.shape
    t_mean = jnp.mean(t, axis=-1, keepdims=True)
    o_f = o - t_mean
    t_f = t - t_mean
    o_n = o_f / (jnp.linalg.norm(o_f, axis=-1, keepdims=True))
    t_n = t_f / (jnp.linalg.norm(t_f, axis=-1, keepdims=True))
    return o_n.reshape(n, h * w, c), t_n.reshape(n, h * w, c)


def _mrf_bf16() -> bool:
    """CFEN_MRF_BF16=1 forces; default OFF — measured REJECTION (v5e b8
    512px GAN step, r3b): bf16 storage of the post-exp MRF values slowed
    the step 10.64 -> 9.69 img/s despite halving the [N,block,P] buffer —
    the f32<->bf16 converts fragment the scan body's fusions (same failure
    mode as the sparse phase kernels).  Quality would have been fine
    (tests/test_vgg_losses.py::test_mrf_bf16_probs_tolerance: <0.5% value
    error, grad cosine >0.999); the flag stays for re-measurement on new
    compilers.  cos/cdist/min/rel stay f32 in both modes: best-match cdist
    is ~1e-3..1e-4 and bf16's 8-bit mantissa would quantize it to 0."""
    return os.environ.get("CFEN_MRF_BF16", "0") == "1"


def _mrf_rows(o_rows, t_n):
    """cs rows for a q-block: [N,bq,C] x [N,P,C] -> normalized [N,bq,P]."""
    cos = jnp.einsum("nqc,npc->nqp", o_rows, t_n,
                     preferred_element_type=jnp.float32)
    # conv output layout is [HW_t filters, spatial HW_o] => dim1 of the
    # reference's cdist is the t-patch axis; relative-dist mins over it.
    # The clamp is a no-op in exact arithmetic (cos <= 1 for unit rows) but
    # load-bearing under bf16: unit-normalization error (~2^-8) can push
    # cos past 1, making min(cdist) + 1e-5 NEGATIVE, so rel flips sign and
    # exp((1-rel)/0.5) overflows -> inf/inf = nan.  Measured: the r4 device
    # trace went p=nan at step 16 (trace_train_losses.py); the f32-only
    # reference (consistency.py:58-66) never trips this because f32
    # normalization error is ~1e-7.
    cdist = jnp.maximum(-(cos - 1.0) / 2.0, 0.0)
    rel = cdist / (jnp.min(cdist, axis=2, keepdims=True) + 1e-5)
    before = jnp.exp((1.0 - rel) / 0.5)
    if _mrf_bf16():
        before = before.astype(jnp.bfloat16)
        denom = jnp.sum(before, axis=2, keepdims=True, dtype=jnp.float32)
        return before / denom.astype(jnp.bfloat16)
    return before / jnp.sum(before, axis=2, keepdims=True)


def _mrf_block_size(default: int = 2048) -> int:
    """Streaming q-block size for the ID-MRF scan — the knob of the r1 #6
    sweep (bench_train.py --mrf_block / CFEN_MRF_BLOCK).  Larger blocks =
    fewer scan iterations but a bigger live [N, block, P] slab."""
    import os
    try:
        return int(os.environ.get("CFEN_MRF_BLOCK", "") or default)
    except ValueError:  # pragma: no cover
        return default


def _mrf(o, t, block: int = 0):
    """One-layer ID-MRF divergence (ref consistency.py:42-91).

    The reference materializes the full [HW_o, HW_t] relative-distance
    matrix (1 GB fp32 at relu3 resolution for 512px inputs) via a Python
    loop of convs.  The row-normalizations (min/sum over t) are local to a
    q-row and the only cross-row reduction is a max over q per t-column, so
    we stream q-row blocks through a lax.scan carrying the running
    column-max — the big matrix never exists in HBM, forward or backward
    (jax.checkpoint on the block recomputes it in the vjp)."""
    block = block or _mrf_block_size()
    o_n, t_n = _normalize_feats(o, t)
    n, P, c = o_n.shape

    from ..ops import pallas_mrf as PM
    if PM.use_pallas_mrf() and PM.supported(P, c):
        # flash-MRF kernels: the [P,P] matrix never exists in HBM
        return PM.mrf_core(o_n, t_n)

    if P <= block:
        cs = _mrf_rows(o_n, t_n)
        k_max = jnp.max(cs, axis=1).astype(jnp.float32)
        div = jnp.mean(k_max, axis=1)
        return jnp.sum(-jnp.log(div))

    nb = -(-P // block)
    pad = nb * block - P
    o_pad = jnp.pad(o_n, ((0, 0), (0, pad), (0, 0)))
    blocks = o_pad.reshape(n, nb, block, c).transpose(1, 0, 2, 3)
    valid = jnp.arange(nb * block).reshape(nb, block) < P

    @jax.checkpoint
    def step(kmax, inp):
        rows, mask = inp
        cs = _mrf_rows(rows, t_n)                       # [N, block, P]
        cs = jnp.where(mask[None, :, None], cs,
                       jnp.asarray(-jnp.inf, cs.dtype))
        return jnp.maximum(kmax,
                           jnp.max(cs, axis=1).astype(jnp.float32)), None

    kmax0 = jnp.full((n, P), -jnp.inf, jnp.float32)
    k_max, _ = jax.lax.scan(step, kmax0, (blocks, valid))
    div = jnp.mean(k_max, axis=1)
    return jnp.sum(-jnp.log(div))


def idmrf_loss(params, out, target):
    """style{relu3_2:1, relu4_2:1} + content{relu4_2:1} (ref :30-102)."""
    fo = vgg19_features(params, out, ("relu3_1", "relu4_1"),
                        subtract_mean=True)
    ft = vgg19_features(params, target, ("relu3_1", "relu4_1"),
                        subtract_mean=True)
    m3 = _mrf(fo["relu3_1"], ft["relu3_1"])
    m4 = _mrf(fo["relu4_1"], ft["relu4_1"])
    return m3 + 2.0 * m4
