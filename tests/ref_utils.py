"""Helpers to run the PyTorch reference (read-only, for golden tests).

The reference generator files import only torch + einops, so they run on the
baked-in torch-cpu.  We instantiate them with a *tiny* geometry that keeps
every structural invariant of the canonical 512x512 config
(patch_size == loadSize/8, three 2x levels, GViT 4x pooling).
"""

import os
import sys
import types

REF = "/root/reference"


def has_reference():
    return os.path.isdir(os.path.join(REF, "models"))


def ref_path():
    if REF not in sys.path:
        sys.path.insert(0, REF)


def tiny_opt(**overrides):
    """Reference-style opt namespace for a 128px-input tiny model."""
    o = types.SimpleNamespace(
        n_feats=8, n_colors=3, patch_size=8, patch_dim=2, num_heads=2,
        num_layers=1, hidden_dim_ratio=2, num_queries=1, dropout_rate=0.0,
        no_mlp=False, pos_every=False, no_pos=False, no_norm=False,
        loadSize=64, rgb_range=255, gpu_ids=[], init_type="kaiming",
        scale=[1], l2g_ratio=4,
    )
    for k, v in overrides.items():
        setattr(o, k, v)
    return o


def tiny_spec_kwargs(o):
    """GenSpec overrides matching tiny_opt."""
    return dict(n_feats=o.n_feats, n_colors=o.n_colors,
                patch_size=o.patch_size, patch_dim=o.patch_dim,
                num_heads=o.num_heads, num_layers=o.num_layers,
                hidden_dim_ratio=o.hidden_dim_ratio, load_size=o.loadSize,
                no_norm=o.no_norm, no_mlp=o.no_mlp,
                pos_every=o.pos_every, no_pos=o.no_pos)


def load_repo_module(name: str):
    """Import a repo-root top-level module (test.py, serve.py...) by path —
    immune to /root/reference being prepended to sys.path by ref_path()."""
    import importlib.util
    import os
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        f"cfen_repo_{name}", os.path.join(repo_root, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod
