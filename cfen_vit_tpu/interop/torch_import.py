"""One-way importer: reference PyTorch `.pth` state_dicts -> our param trees.

Maps the reference generator's state_dict (dec_ipt in
networks_iid_hlgvit_crs_gd4_cfs_v3.py:103-390 and variant files) onto the
GenSpec-driven param tree of models/generator.py.  Handles:

  * the optional 'module.' DataParallel prefix (ref base_model.py:114-131
    strips it on load; checkpoints saved via save_networks are unwrapped);
  * dead weights present in checkpoints but never used in forward:
    TransformerDecoder + query_embed (ref v3:1116-1122), MeanShift
    sub_mean/add_mean (ref v3:120-121), position_ids buffers — all ignored;
  * layout conversion to NHWC/HWIO and the packed MultiheadAttention
    in_proj split.

Everything returns numpy arrays; callers jnp-ify on device placement.
"""

from __future__ import annotations

import numpy as np

from ..models.generator import GenSpec


def _np(t):
    if isinstance(t, np.ndarray):
        return t
    try:  # torch tensor
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def _conv(sd, key):
    w = _np(sd[f"{key}.weight"])            # [O,I,kh,kw]
    p = {"w": w.transpose(2, 3, 1, 0)}
    if f"{key}.bias" in sd:
        p["b"] = _np(sd[f"{key}.bias"])
    return p


def _convT(sd, key):
    w = _np(sd[f"{key}.weight"])            # [I,O,kh,kw]
    w = w[:, :, ::-1, ::-1]                  # spatial flip
    p = {"w": np.ascontiguousarray(w.transpose(2, 3, 0, 1))}  # [kh,kw,I,O]
    if f"{key}.bias" in sd:
        p["b"] = _np(sd[f"{key}.bias"])
    return p


def _linear(sd, key):
    p = {"w": _np(sd[f"{key}.weight"]).T}
    if f"{key}.bias" in sd:
        p["b"] = _np(sd[f"{key}.bias"])
    return p


def _ln(sd, key):
    return {"g": _np(sd[f"{key}.weight"]), "b": _np(sd[f"{key}.bias"])}


def _actnorm(sd, key):
    return {"w": _np(sd[f"{key}.weight"]),
            "b": _np(sd[f"{key}.bias"]),
            "initialized": np.asarray(_np(sd[f"{key}.initialized"]),
                                      dtype=np.float32).reshape(())}


def _vit(sd, prefix, num_layers, no_mlp=False, no_pos=False, shrink=1):
    p = {}
    if shrink > 1:
        p["conv_shrink"] = {"conv": _conv(sd, f"{prefix}.conv_shrink.0"),
                            "an": _actnorm(sd, f"{prefix}.conv_shrink.1")}
        p["conv_extend"] = {"conv": _conv(sd, f"{prefix}.conv_extend.0"),
                            "an": _actnorm(sd, f"{prefix}.conv_extend.1")}
    if not no_mlp:
        p["linear_encoding"] = _linear(sd, f"{prefix}.linear_encoding")
        p["mlp_head"] = {"l1": _linear(sd, f"{prefix}.mlp_head.0"),
                         "l2": _linear(sd, f"{prefix}.mlp_head.3")}
    layers = []
    for i in range(num_layers):
        lp = f"{prefix}.encoder.layers.{i}"
        in_proj = _np(sd[f"{lp}.self_attn.in_proj_weight"])   # [3E, E]
        e = in_proj.shape[1]
        layer = {
            "attn": {
                "wq": in_proj[:e].T, "wk": in_proj[e:2 * e].T,
                "wv": in_proj[2 * e:].T,
                "wo": _np(sd[f"{lp}.self_attn.out_proj.weight"]).T,
            },
            "linear1": _linear(sd, f"{lp}.linear1"),
            "linear2": _linear(sd, f"{lp}.linear2"),
        }
        if f"{lp}.norm1.weight" in sd:
            layer["norm1"] = _ln(sd, f"{lp}.norm1")
            layer["norm2"] = _ln(sd, f"{lp}.norm2")
        layers.append(layer)
    p["layers"] = layers
    if not no_pos:
        p["pos"] = _np(sd[f"{prefix}.position_encoding.pe.weight"])
    return p


def _cfs(sd, prefix):
    def fc(name):
        return {"c1": {"w": _np(sd[f"{prefix}.{name}.0.weight"])
                       .transpose(2, 3, 1, 0)},
                "c2": {"w": _np(sd[f"{prefix}.{name}.2.weight"])
                       .transpose(2, 3, 1, 0)}}
    return {k: fc(k) for k in
            ("fc_avg_cf1", "fc_avg_cf2", "fc_max_cf1", "fc_max_cf2")}


def import_generator_state_dict(sd, spec: GenSpec):
    """Build our generator param tree from a reference dec_ipt state_dict."""
    sd = {k[len("module."):] if k.startswith("module.") else k: v
          for k, v in sd.items()}
    p: dict = {}

    # stem
    p["head"] = {"conv": _conv(sd, "head.0.0"),
                 "res": {"c1": _conv(sd, "head.0.1.body.0"),
                         "c2": _conv(sd, "head.0.1.body.2")}}
    if spec.half_res_trunk:
        p["ds_e01"] = {"conv": _conv(sd, "ds_conv_e01.0")}

    def vit_in(prefix, lvl, encoder, local):
        del lvl, encoder  # head counts are static, carried by the spec
        shrink = spec.shrink if local else 1   # v5 shrinks LViT only
        return _vit(sd, prefix, spec.num_layers, spec.no_mlp, spec.no_pos,
                    shrink)

    # dec_ipt runs one encoder per branch: R = unsuffixed modules, S = 's'
    # suffix (ref dec_ipt.py:275-871); shared-encoder files use one set.
    enc_pairs = ([(b, "" if b == "r" else b) for b in spec.branches]
                 if spec.separate_encoders else [("", "")])
    for be, ref_sfx in enc_pairs:
        for lvl in (1, 2, 3):
            if lvl > 1:
                p[f"ds_e0{lvl}{be}"] = {
                    "conv": _conv(sd, f"ds_conv_e0{lvl}{ref_sfx}.0")}
            if spec.use_local:
                p[f"lvit_e0{lvl}{be}"] = vit_in(
                    f"localvit_encoder_0{lvl}{ref_sfx}", lvl, True, True)
            if spec.use_global:
                p[f"gvit_e0{lvl}{be}"] = vit_in(
                    f"globalvit_encoder_0{lvl}{ref_sfx}", lvl, True, False)
            if spec.use_local and spec.use_global and spec.fusion == "cat":
                p[f"lgcat_e0{lvl}{be}"] = {
                    "conv": _conv(sd, f"lgcat_conv_e0{lvl}{ref_sfx}.0")}
                if spec.lgcat_norm == "actnorm":
                    p[f"lgcat_e0{lvl}{be}"]["an"] = _actnorm(
                        sd, f"lgcat_conv_e0{lvl}{ref_sfx}.1")

    # single-decoder files name their decoder ViTs without a branch suffix
    # (ipt.py:134-168; networks_iidn_* constructs `localvit_decoder_03` but
    # its forward calls the undefined `..._03d` — a reference defect; we map
    # from the constructed names)
    plain_suffix = spec.ipt_style or spec.branches == "d"
    for b in spec.branches:
        if spec.separate_encoders:
            sfx = "" if b == "r" else b     # dec_ipt decoder naming
        else:
            sfx = "" if plain_suffix else b
        for lvl in (3, 2, 1):
            if spec.use_local:
                p[f"lvit_d0{lvl}{b}"] = vit_in(
                    f"localvit_decoder_0{lvl}{sfx}", lvl, False, True)
            if spec.use_global:
                p[f"gvit_d0{lvl}{b}"] = vit_in(
                    f"globalvit_decoder_0{lvl}{sfx}", lvl, False, False)
            if spec.use_local and spec.use_global and spec.fusion == "cat":
                p[f"lgcat_d0{lvl}{b}"] = {
                    "conv": _conv(sd, f"lgcat_conv_d0{lvl}{b}.0")}
                if spec.lgcat_norm == "actnorm":
                    p[f"lgcat_d0{lvl}{b}"]["an"] = _actnorm(
                        sd, f"lgcat_conv_d0{lvl}{b}.1")
        if spec.ipt_style:
            # ipt.py names its decoder transpose-convs us_conv_e03/e02
            # (ref ipt.py:189-192), both InstanceNorm; dec_ipt adds the
            # per-branch suffix (us_conv_e03s for S, ref dec_ipt.py:260-268)
            p[f"us_d03{b}"] = {"conv": _convT(sd, f"us_conv_e03{sfx}.0")}
            p[f"us_d02{b}"] = {"conv": _convT(sd, f"us_conv_e02{sfx}.0")}
            continue
        p[f"us_d03{b}"] = {"conv": _convT(sd, f"us_conv_d03{b}.0")}
        p[f"us_d02{b}"] = {"conv": _convT(sd, f"us_conv_d02{b}.0"),
                           "an": _actnorm(sd, f"us_conv_d02{b}.1")}
        if spec.half_res_trunk:
            p[f"us_d01{b}"] = {"conv": _convT(sd, f"us_conv_d01{b}.0"),
                               "an": _actnorm(sd, f"us_conv_d01{b}.1")}
        if spec.d_skip == "res":
            pass
        elif (b in "rs" or spec.d_skip == "enc"
              or spec.d_skip == "cat3"):
            sk = _convT if spec.sk_conv_transposed else _conv
            p[f"sk_d03{b}"] = {"conv": sk(sd, f"sk_conv_d03{b}.0"),
                               "an": _actnorm(sd, f"sk_conv_d03{b}.1")}
            p[f"sk_d02{b}"] = {"conv": sk(sd, f"sk_conv_d02{b}.0"),
                               "an": _actnorm(sd, f"sk_conv_d02{b}.1")}
        elif spec.d_skip == "cat_partner":
            # 1x1 ConvTranspose2d with stride 1: conv with [I,O,1,1] weight
            p[f"sk_d03{b}"] = {"conv": _convT(sd, f"sk_conv_d03{b}.0")}
            p[f"sk_d02{b}"] = {"conv": _convT(sd, f"sk_conv_d02{b}.0")}
        elif spec.d_skip == "cfs":
            p["cfs_d03d"] = _cfs(sd, "cfsm2g_d03d.0")
            p["cfs_d02d"] = _cfs(sd, "cfsm2g_d02d.0")

    # tails: cfs-family files name them tail_R/tail_S/tail_D; the non-cfs
    # files use tail_color (shared R/D) and tail_gray (S).
    # tail Sequential layouts: with ActNorm or InstanceNorm at idx 2 the
    # final conv7 sits at idx 5; the S tail has no norm so it sits at idx 4.
    def tail(prefix, has_an, has_norm_slot):
        t = {"conv1": _conv(sd, f"{prefix}.1"),
             "conv2": _conv(sd, f"{prefix}.{5 if has_norm_slot else 4}")}
        if has_an:
            t["an"] = _actnorm(sd, f"{prefix}.2")
        return t

    for b in spec.branches:
        if spec.shared_tails and b == "d" and "r" in spec.branches:
            continue
        if spec.separate_encoders:
            name = "tail_gray" if b == "s" else "tail_color"
        elif spec.ipt_style:
            name = "tail"
        elif spec.shared_tails or spec.branches == "d":
            name = "tail_gray" if b == "s" else "tail_color"
        else:
            name = {"r": "tail_R", "s": "tail_S", "d": "tail_D"}[b]
        has_norm_slot = (b != "s") or spec.s_tail_norm
        p[f"tail_{b}"] = tail(
            f"{name}.0",
            has_an=(has_norm_slot and spec.tail_norm == "actnorm"),
            has_norm_slot=has_norm_slot)
    if spec.xdh:
        sp = {}
        for k in ("refine1", "refine2", "conv1010", "conv1020", "conv1030",
                  "conv1040", "conv1050"):
            sp[k] = _conv(sd, f"sp.{k}")
        sp["refine3"] = _conv(sd, "sp.refine3.0")
        p["sp"] = sp
    if spec.cnn:
        def resblocks(prefix, lvl):
            blocks = []
            for i in range(2):
                blocks.append({
                    "c1": _conv(sd, f"{prefix}.{i}.conv_block.1"),
                    "an1": _actnorm(sd, f"{prefix}.{i}.conv_block.2"),
                    "c2": _conv(sd, f"{prefix}.{i}.conv_block.5"),
                    "an2": _actnorm(sd, f"{prefix}.{i}.conv_block.6"),
                })
            return blocks
        for lvl in (1, 2, 3):
            p[f"cnn_e0{lvl}"] = resblocks(f"encoder_0{lvl}", lvl)
            for b in spec.branches:
                p[f"cnn_d0{lvl}{b}"] = resblocks(f"decoder_0{lvl}{b}", lvl)
    return p
