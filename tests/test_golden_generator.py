"""Golden parity: our generator vs the PyTorch reference, weight-for-weight.

Instantiates the reference dec_ipt (networks_iid_hlgvit_crs_gd4_cfs_v3.py)
with random weights on torch-cpu, runs one forward (which data-initializes
its ActNorms), exports the state_dict, imports it with
interop.torch_import, and checks [xr, xs, xd] agree to float32 tolerance.
This is the SURVEY.md section 7 "bit-comparable" gate in miniature.
"""

import numpy as np
import pytest

from tests.ref_utils import has_reference, ref_path, tiny_opt, tiny_spec_kwargs

pytestmark = pytest.mark.golden

if not has_reference():
    pytest.skip("reference repo unavailable", allow_module_level=True)


@pytest.fixture(scope="module")
def torch_ref():
    ref_path()
    import torch
    torch.manual_seed(0)
    from models import networks_iid_hlgvit_crs_gd4_cfs_v3 as refmod
    from models import common as ref_common
    o = tiny_opt()
    net = refmod.define_G(o, ref_common.default_conv)
    net.eval()
    x = torch.tensor(
        np.random.RandomState(1).randn(2, 3, 128, 128).astype(np.float32))
    with torch.no_grad():
        out1 = net(x)          # initializes ActNorms
        out2 = net(x)          # deterministic pass
    for a, b in zip(out1, out2):
        assert float((a - b).abs().max()) < 1e-6
    return o, net, x, [t.numpy() for t in out2]


def test_v3_generator_matches_reference(torch_ref):
    import jax.numpy as jnp
    import jax
    from dataclasses import replace
    from cfen_vit_tpu.models.registry import generator_spec
    from cfen_vit_tpu.models.generator import generator_forward
    from cfen_vit_tpu.interop.torch_import import import_generator_state_dict

    o, net, x, ref_out = torch_ref
    spec = replace(generator_spec("iid_hlgvit_crs_gd4_cfs_v3"),
                   **tiny_spec_kwargs(o))
    params = import_generator_state_dict(net.state_dict(), spec)
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    out = jax.jit(lambda p, xx: generator_forward(p, spec, xx))(params, xj)

    got = {k: np.asarray(v).transpose(0, 3, 1, 2) for k, v in out.items()}
    names = {"r": 0, "s": 1, "d": 2}
    for k, i in names.items():
        diff = np.abs(got[k] - ref_out[i]).max()
        assert diff < 2e-4, f"branch {k}: max abs diff {diff}"
