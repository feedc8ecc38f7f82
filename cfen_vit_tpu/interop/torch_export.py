"""Exporter: our generator param trees -> reference-format state_dicts.

The inverse of torch_import.py, enabling round-trip interop (train here,
eval in the PyTorch reference, or hand checkpoints back to reference
users).  The reference loads strictly (base_model.py:131), so the exported
dict must contain EVERY parameter/buffer its modules own — including the
dead weights its forward never uses (TransformerDecoder, query_embed,
position_ids buffers, MeanShift sub_mean/add_mean; SURVEY.md section 2.3
NOTE).  Dead tensors are synthesized: zeros for never-trained weights,
the deterministic arange / RGB-mean values for buffers.

Covers the cfs-family specs (tail_R/S/D naming) and the shared-tail files;
keys verified by a strict round-trip golden test
(tests/test_torch_export.py).
"""

from __future__ import annotations

import numpy as np

from ..models.generator import GenSpec


def _conv(p):
    out = {"weight": np.asarray(p["w"]).transpose(3, 2, 0, 1)}
    if "b" in p:
        out["bias"] = np.asarray(p["b"])
    return out


def _convT(p):
    w = np.asarray(p["w"]).transpose(2, 3, 0, 1)[:, :, ::-1, ::-1]
    out = {"weight": np.ascontiguousarray(w)}
    if "b" in p:
        out["bias"] = np.asarray(p["b"])
    return out


def _linear(p):
    out = {"weight": np.asarray(p["w"]).T}
    if "b" in p:
        out["bias"] = np.asarray(p["b"])
    return out


def _an(p):
    return {"weight": np.asarray(p["w"]), "bias": np.asarray(p["b"]),
            "initialized": np.asarray(p["initialized"], dtype=np.int64)
            .reshape(())}


def _put(sd, prefix, tensors):
    for k, v in tensors.items():
        sd[f"{prefix}.{k}"] = v


def _dead_decoder(sd, prefix, e, hidden):
    """TransformerDecoderLayer params the forward never touches
    (ref v3:1409-1447): zeros with the exact shapes."""
    lp = f"{prefix}.decoder.layers.0"
    for attn in ("self_attn", "multihead_attn"):
        sd[f"{lp}.{attn}.in_proj_weight"] = np.zeros((3 * e, e), np.float32)
        sd[f"{lp}.{attn}.out_proj.weight"] = np.zeros((e, e), np.float32)
    sd[f"{lp}.linear1.weight"] = np.zeros((hidden, e), np.float32)
    sd[f"{lp}.linear1.bias"] = np.zeros((hidden,), np.float32)
    sd[f"{lp}.linear2.weight"] = np.zeros((e, hidden), np.float32)
    sd[f"{lp}.linear2.bias"] = np.zeros((e,), np.float32)
    for norm in ("norm1", "norm2", "norm3"):
        sd[f"{lp}.{norm}.weight"] = np.ones((e,), np.float32)
        sd[f"{lp}.{norm}.bias"] = np.zeros((e,), np.float32)


def _vit(sd, prefix, p, vs, num_queries: int = 1):
    if not vs.no_mlp:
        _put(sd, f"{prefix}.linear_encoding", _linear(p["linear_encoding"]))
        _put(sd, f"{prefix}.mlp_head.0", _linear(p["mlp_head"]["l1"]))
        _put(sd, f"{prefix}.mlp_head.3", _linear(p["mlp_head"]["l2"]))
        sd[f"{prefix}.query_embed.weight"] = np.zeros(
            (num_queries, vs.embedding_dim * vs.seq_length), np.float32)
    for i, layer in enumerate(p["layers"]):
        lp = f"{prefix}.encoder.layers.{i}"
        a = layer["attn"]
        sd[f"{lp}.self_attn.in_proj_weight"] = np.concatenate(
            [np.asarray(a["wq"]).T, np.asarray(a["wk"]).T,
             np.asarray(a["wv"]).T], axis=0)
        sd[f"{lp}.self_attn.out_proj.weight"] = np.asarray(a["wo"]).T
        _put(sd, f"{lp}.linear1", _linear(layer["linear1"]))
        _put(sd, f"{lp}.linear2", _linear(layer["linear2"]))
        if "norm1" in layer:
            sd[f"{lp}.norm1.weight"] = np.asarray(layer["norm1"]["g"])
            sd[f"{lp}.norm1.bias"] = np.asarray(layer["norm1"]["b"])
            sd[f"{lp}.norm2.weight"] = np.asarray(layer["norm2"]["g"])
            sd[f"{lp}.norm2.bias"] = np.asarray(layer["norm2"]["b"])
    _dead_decoder(sd, prefix, vs.embedding_dim, vs.hidden_dim)
    if not vs.no_pos:
        sd[f"{prefix}.position_encoding.pe.weight"] = np.asarray(p["pos"])
        sd[f"{prefix}.position_encoding.position_ids"] = np.arange(
            vs.seq_length, dtype=np.int64)[None]
    if "conv_shrink" in p:
        _put(sd, f"{prefix}.conv_shrink.0", _conv(p["conv_shrink"]["conv"]))
        _put(sd, f"{prefix}.conv_shrink.1", _an(p["conv_shrink"]["an"]))
        _put(sd, f"{prefix}.conv_extend.0", _conv(p["conv_extend"]["conv"]))
        _put(sd, f"{prefix}.conv_extend.1", _an(p["conv_extend"]["an"]))


def _meanshift(sd, prefix, rgb_range=255, sign=-1):
    """MeanShift buffers (ref common.py:16-26) — dead in v3's forward but
    present in its state_dict."""
    mean = np.array([0.4488, 0.4371, 0.4040], np.float32)
    sd[f"{prefix}.weight"] = np.eye(3, dtype=np.float32).reshape(3, 3, 1, 1)
    sd[f"{prefix}.bias"] = sign * rgb_range * mean


def export_generator_state_dict(params, spec: GenSpec):
    """Our param tree -> a dict loadable by the reference dec_ipt with
    strict=True (convert values with torch.tensor before load)."""
    if spec.cnn or spec.ipt_style or spec.xdh or spec.branches != "rsd":
        raise NotImplementedError(
            "export currently covers the 3-branch hlgvit family")
    sd: dict = {}
    _meanshift(sd, "sub_mean", sign=-1)
    _meanshift(sd, "add_mean", sign=1)
    _put(sd, "head.0.0", _conv(params["head"]["conv"]))
    _put(sd, "head.0.1.body.0", _conv(params["head"]["res"]["c1"]))
    _put(sd, "head.0.1.body.2", _conv(params["head"]["res"]["c2"]))
    if spec.half_res_trunk:
        _put(sd, "ds_conv_e01.0", _conv(params["ds_e01"]["conv"]))

    for lvl in (1, 2, 3):
        if lvl > 1:
            _put(sd, f"ds_conv_e0{lvl}.0", _conv(params[f"ds_e0{lvl}"]["conv"]))
        if spec.use_local:
            _vit(sd, f"localvit_encoder_0{lvl}", params[f"lvit_e0{lvl}"],
                 spec.lvit_spec(lvl))
        if spec.use_global:
            _vit(sd, f"globalvit_encoder_0{lvl}", params[f"gvit_e0{lvl}"],
                 spec.gvit_spec(lvl, True))
        if spec.use_local and spec.use_global and spec.fusion == "cat":
            _put(sd, f"lgcat_conv_e0{lvl}.0",
                 _conv(params[f"lgcat_e0{lvl}"]["conv"]))
            if spec.lgcat_norm == "actnorm":
                _put(sd, f"lgcat_conv_e0{lvl}.1",
                     _an(params[f"lgcat_e0{lvl}"]["an"]))

    for b in spec.branches:
        for lvl in (3, 2, 1):
            if spec.use_local:
                _vit(sd, f"localvit_decoder_0{lvl}{b}",
                     params[f"lvit_d0{lvl}{b}"], spec.lvit_spec(lvl))
            if spec.use_global:
                _vit(sd, f"globalvit_decoder_0{lvl}{b}",
                     params[f"gvit_d0{lvl}{b}"], spec.gvit_spec(lvl, False))
            if spec.use_local and spec.use_global and spec.fusion == "cat":
                _put(sd, f"lgcat_conv_d0{lvl}{b}.0",
                     _conv(params[f"lgcat_d0{lvl}{b}"]["conv"]))
                if spec.lgcat_norm == "actnorm":
                    _put(sd, f"lgcat_conv_d0{lvl}{b}.1",
                         _an(params[f"lgcat_d0{lvl}{b}"]["an"]))
        _put(sd, f"us_conv_d03{b}.0", _convT(params[f"us_d03{b}"]["conv"]))
        _put(sd, f"us_conv_d02{b}.0", _convT(params[f"us_d02{b}"]["conv"]))
        _put(sd, f"us_conv_d02{b}.1", _an(params[f"us_d02{b}"]["an"]))
        if spec.half_res_trunk:
            _put(sd, f"us_conv_d01{b}.0",
                 _convT(params[f"us_d01{b}"]["conv"]))
            _put(sd, f"us_conv_d01{b}.1", _an(params[f"us_d01{b}"]["an"]))
        if b in "rs":
            sk = _convT if spec.sk_conv_transposed else _conv
            _put(sd, f"sk_conv_d03{b}.0", sk(params[f"sk_d03{b}"]["conv"]))
            _put(sd, f"sk_conv_d03{b}.1", _an(params[f"sk_d03{b}"]["an"]))
            _put(sd, f"sk_conv_d02{b}.0", sk(params[f"sk_d02{b}"]["conv"]))
            _put(sd, f"sk_conv_d02{b}.1", _an(params[f"sk_d02{b}"]["an"]))
        elif spec.d_skip == "cat3":
            sk = _convT if spec.sk_conv_transposed else _conv
            _put(sd, f"sk_conv_d03{b}.0", sk(params[f"sk_d03{b}"]["conv"]))
            _put(sd, f"sk_conv_d03{b}.1", _an(params[f"sk_d03{b}"]["an"]))
            _put(sd, f"sk_conv_d02{b}.0", sk(params[f"sk_d02{b}"]["conv"]))
            _put(sd, f"sk_conv_d02{b}.1", _an(params[f"sk_d02{b}"]["an"]))
        elif spec.d_skip == "cfs":
            for name in ("fc_avg_cf1", "fc_avg_cf2", "fc_max_cf1",
                         "fc_max_cf2"):
                for lvl in (3, 2):
                    fc = params[f"cfs_d0{lvl}d"][name]
                    sd[f"cfsm2g_d0{lvl}d.0.{name}.0.weight"] = (
                        np.asarray(fc["c1"]["w"]).transpose(3, 2, 0, 1))
                    sd[f"cfsm2g_d0{lvl}d.0.{name}.2.weight"] = (
                        np.asarray(fc["c2"]["w"]).transpose(3, 2, 0, 1))

    for b in spec.branches:
        if spec.shared_tails and b == "d" and "r" in spec.branches:
            continue
        if spec.shared_tails:
            name = "tail_gray" if b == "s" else "tail_color"
        else:
            name = {"r": "tail_R", "s": "tail_S", "d": "tail_D"}[b]
        tp = params[f"tail_{b}"]
        has_norm_slot = (b != "s") or spec.s_tail_norm
        _put(sd, f"{name}.0.1", _conv(tp["conv1"]))
        if "an" in tp:
            _put(sd, f"{name}.0.2", _an(tp["an"]))
        _put(sd, f"{name}.0.{5 if has_norm_slot else 4}", _conv(tp["conv2"]))
    return sd
