"""`--model_G` registry: maps reference generator-variant names to GenSpec.

The reference keeps 14 near-identical 1.5k-line network files selected by a
string (models/model_iid_dehazing.py:50-95); here each name is a GenSpec.
Variant deltas were verified by diffing the reference files (see SURVEY.md
section 2.4):

  iid_hlgvit_crs_gd4_cfs_v3  canonical: half-res trunk, CFS d-skip
  iid_hlgvit_crs_gd4_cfs     full-res trunk (head -> n_feats, no ds_e01/us_d01)
  iid_hlgvit_crs_gd4_cfs_v2  byte-identical to _cfs in the reference
  iid_hlgvit_crs_gd4_cfs_pe  _cfs plus a print statement — alias
  iid_hlgvit_crs_gd4_cfs_v5  v3 with a /4 channel bottleneck inside all ViTs
  iid_hlgvit_crs_gd4         no CFS: d-skip = sk_conv(cat(d,r,s)); full-res;
                             tail shared between R and D (tail_color)
  iid_hlgvit_add_gd4         local/global fused by addition (note: the
                             reference file crashes at its line 536 tuple
                             typo; we implement the intended add fusion)
  iid_hlgvit_crs_gd2         global branch at 2x downsample (the reference's
                             pool/upsample counts are inconsistent and crash;
                             we implement the consistent 2x version)
  iid_lvit_crs_gd4           local branch only (x_e = lvit + x)
  iid_gvit_crs_gd4           global branch only (x_e = gvit + x)
  iid_vit_crs_gd4            plain ViT (global tokenization, no pooling)
  iid_cnn_crs                CNN-only ablation
  iidr_hlgvit_crs_gd4        reflectance-only IID (branches rd + xdh head)
  iids_hlgvit_crs_gd4        shading-only IID (branches sd + xdh head)
  iidn_hlgvit_crs_gd4        no IID: single dehazed decoder
"""

from __future__ import annotations

from dataclasses import replace

from .generator import GenSpec, generator_init, generator_forward


def _base(**kw) -> GenSpec:
    return GenSpec(**kw)


_REGISTRY = {}


def _reg(name: str, **kw):
    _REGISTRY[name] = GenSpec(name=name, **kw)


_reg("iid_hlgvit_crs_gd4_cfs_v3", half_res_trunk=True, d_skip="cfs")
_reg("iid_hlgvit_crs_gd4_cfs", half_res_trunk=False, d_skip="cfs",
     shared_tails=True)
_reg("iid_hlgvit_crs_gd4_cfs_v2", half_res_trunk=False, d_skip="cfs",
     shared_tails=True)
_reg("iid_hlgvit_crs_gd4_cfs_pe", half_res_trunk=False, d_skip="cfs",
     shared_tails=True)
_reg("iid_hlgvit_crs_gd4_cfs_v5", half_res_trunk=True, d_skip="cfs", shrink=4)
_reg("iid_hlgvit_crs_gd4", half_res_trunk=False, d_skip="cat3",
     shared_tails=True)
_reg("iid_hlgvit_add_gd4", half_res_trunk=False, d_skip="cat3",
     fusion="add", shared_tails=True, tail_norm="instance",
     s_tail_norm=True, d02_us_from_s=True)
_reg("iid_hlgvit_crs_gd2", half_res_trunk=False, d_skip="cat3",
     global_pools=1, shared_tails=True, tail_norm="instance",
     s_tail_norm=True, d02_us_from_s=True)
_reg("iid_lvit_crs_gd4", half_res_trunk=False, d_skip="cat3",
     use_global=False, shared_tails=True, s_tail_norm=True,
     sk_conv_transposed=True, d02_us_from_s=True)
_reg("iid_gvit_crs_gd4", half_res_trunk=False, d_skip="cat3",
     use_local=False, shared_tails=True, s_tail_norm=True,
     sk_conv_transposed=True, d02_us_from_s=True)
_reg("iid_vit_crs_gd4", half_res_trunk=False, d_skip="cat3",
     use_local=False, global_pools=0, shared_tails=True, s_tail_norm=True,
     sk_conv_transposed=True, d02_us_from_s=True)
_reg("iid_cnn_crs", half_res_trunk=False, d_skip="cat3",
     use_local=False, use_global=False, shared_tails=True, cnn=True,
     ds_norm="actnorm", d02_us_from_s=True)
_reg("iidr_hlgvit_crs_gd4", half_res_trunk=False, branches="rd",
     d_skip="cat_partner", shared_tails=True, lgcat_norm="instance",
     xdh=True, tail_norm="instance", s_tail_norm=True)
_reg("iids_hlgvit_crs_gd4", half_res_trunk=False, branches="sd",
     d_skip="cat_partner", shared_tails=True, lgcat_norm="instance",
     xdh=True, tail_norm="instance", s_tail_norm=True)
_reg("iidn_hlgvit_crs_gd4", half_res_trunk=False, branches="d",
     d_skip="enc", s_tail_norm=True)
# models/ipt.py — the single-output HLG-ViT behind `--model vit` (MGVIT)
_reg("ipt", half_res_trunk=False, branches="d", fusion="add",
     d_skip="res", ipt_style=True, tail_norm="instance", s_tail_norm=True)
# models/lgvit_add.py add_ipt — identical to ipt except the GViT pool count
# follows --l2g_ratio (ref lgvit_add.py:739-745; its always-4x upsample
# makes l2g_ratio=2 crash there — docs/REFERENCE_DEFECTS.md; ours is
# consistent) and the tail drops the no-op Upsampler
_reg("lgvit_add", half_res_trunk=False, branches="d", fusion="add",
     d_skip="res", ipt_style=True, tail_norm="instance", s_tail_norm=True)
# models/dec_ipt.py — the older two-branch net behind the (factory-less)
# DECMGVIT trainer: shared stem, per-branch encoders+decoders (R unsuffixed,
# S 's'-suffixed), add fusion, res skips, IN tails, SpatialPyramid refiner
# over cat(input, xr, xs) (ref dec_ipt.py:275-871)
_reg("dec_ipt", half_res_trunk=False, branches="rs", fusion="add",
     d_skip="res", ipt_style=True, separate_encoders=True, xdh=True,
     s_dec_from_r_enc=True, s_dec1_ru_zero=True,
     tail_norm="instance", s_tail_norm=True)


def generator_spec(name: str, cfg=None) -> GenSpec:
    """Resolve a `--model_G` name (optionally overriding geometry from cfg)."""
    if name not in _REGISTRY:
        raise KeyError(f"unknown --model_G '{name}'; known: "
                       f"{sorted(_REGISTRY)}")
    spec = _REGISTRY[name]
    if cfg is not None:
        spec = replace(
            spec,
            n_feats=cfg.n_feats, n_colors=cfg.n_colors,
            patch_size=cfg.patch_size, patch_dim=cfg.patch_dim,
            num_heads=cfg.num_heads, num_layers=cfg.num_layers,
            hidden_dim_ratio=cfg.hidden_dim_ratio, load_size=cfg.loadSize,
            no_norm=cfg.no_norm, no_mlp=cfg.no_mlp,
            pos_every=cfg.pos_every, no_pos=cfg.no_pos)
        if name == "lgvit_add":
            # only lgvit_add consults --l2g_ratio (2x or 4x global pooling,
            # ref lgvit_add.py:739-745); the other files hardcode 4x
            ratio = int(getattr(cfg, "l2g_ratio", 4))
            spec = replace(spec, global_pools={2: 1, 4: 2}[ratio])
    return spec


def create_generator(key, name_or_spec, cfg=None):
    """Returns (spec, params, apply_fn)."""
    spec = (name_or_spec if isinstance(name_or_spec, GenSpec)
            else generator_spec(name_or_spec, cfg))
    params = generator_init(key, spec)
    return spec, params, generator_forward
