"""Golden parity for every *runnable* reference generator variant.

Several reference variant files crash by construction (documented in
docs/REFERENCE_DEFECTS.md): `add` (tuple typo), `gd2` (pool/fold shape
mismatch), `vit` (pooling commented out), `cnn` (undefined padding_type),
`iidn` (calls undefined decoder attrs), `iids` (7ch into a 9ch conv).
Those get our-side shape/run tests in test_variants_shapes.py instead.
"""

import numpy as np
import pytest

from tests.ref_utils import has_reference, ref_path, tiny_opt, tiny_spec_kwargs

pytestmark = pytest.mark.golden

if not has_reference():
    pytest.skip("reference repo unavailable", allow_module_level=True)

# (our registry name, reference module, half_res, output names in order)
CASES = [
    ("iid_hlgvit_crs_gd4_cfs", "networks_iid_hlgvit_crs_gd4_cfs",
     False, ["r", "s", "d"]),
    ("iid_hlgvit_crs_gd4_cfs_v5", "networks_iid_hlgvit_crs_gd4_cfs_v5",
     True, ["r", "s", "d"]),
    ("iid_hlgvit_crs_gd4", "networks_iid_hlgvit_crs_gd4",
     False, ["r", "s", "d"]),
    ("iid_lvit_crs_gd4", "networks_iid_lvit_crs_gd4",
     False, ["r", "s", "d"]),
    ("iid_gvit_crs_gd4", "networks_iid_gvit_crs_gd4",
     False, ["r", "s", "d"]),
    ("ipt", "ipt", False, ["d"]),
    ("lgvit_add", "lgvit_add", False, ["d"]),
    ("dec_ipt", "dec_ipt", False, ["r", "s", "dh"]),
]
# iidr is NOT here: its reference forward crashes on an undefined `s_d_02`
# (networks_iidr_hlgvit_crs_gd4.py:674) — see docs/REFERENCE_DEFECTS.md.


@pytest.mark.parametrize("name,ref_mod,half_res,outs",
                         CASES, ids=[c[0] for c in CASES])
def test_variant_matches_reference(name, ref_mod, half_res, outs):
    import importlib
    import torch
    import jax
    import jax.numpy as jnp
    from dataclasses import replace
    from cfen_vit_tpu.models.registry import generator_spec
    from cfen_vit_tpu.models.generator import generator_forward
    from cfen_vit_tpu.interop.torch_import import import_generator_state_dict

    ref_path()
    from models import common as ref_common
    mod = importlib.import_module(f"models.{ref_mod}")

    torch.manual_seed(0)
    o = tiny_opt()
    net = mod.define_G(o, ref_common.default_conv)
    net.eval()
    size = 128 if half_res else 64
    x = torch.tensor(
        np.random.RandomState(1).randn(1, 3, size, size).astype(np.float32))
    with torch.no_grad():
        net(x)                         # ActNorm data init
        ref_out = net(x)
    if not isinstance(ref_out, (list, tuple)):
        ref_out = [ref_out]
    ref_out = [t.numpy() for t in ref_out]

    spec = replace(generator_spec(name), **tiny_spec_kwargs(o))
    params = import_generator_state_dict(net.state_dict(), spec)
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    got = jax.jit(lambda p, xx: generator_forward(p, spec, xx))(params, xj)
    got = {k: np.asarray(v).transpose(0, 3, 1, 2) for k, v in got.items()}

    assert len(ref_out) == len(outs)
    for i, k in enumerate(outs):
        diff = np.abs(got[k] - ref_out[i]).max()
        assert diff < 3e-4, f"{name} branch {k}: max abs diff {diff}"
