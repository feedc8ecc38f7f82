"""Round-trip interop: our params -> reference .pth state_dict -> reference
torch model (STRICT load) -> outputs match our forward."""

import numpy as np
import pytest

from tests.ref_utils import has_reference, ref_path, tiny_opt, tiny_spec_kwargs

pytestmark = pytest.mark.golden

if not has_reference():
    pytest.skip("reference repo unavailable", allow_module_level=True)


def test_export_strict_roundtrip(rng):
    import torch
    import jax
    import jax.numpy as jnp
    from dataclasses import replace
    from cfen_vit_tpu.models.registry import generator_spec
    from cfen_vit_tpu.models.generator import generator_init, generator_forward
    from cfen_vit_tpu.interop.torch_export import export_generator_state_dict

    ref_path()
    from models import networks_iid_hlgvit_crs_gd4_cfs_v3 as refmod
    from models import common as ref_common

    o = tiny_opt()
    spec = replace(generator_spec("iid_hlgvit_crs_gd4_cfs_v3"),
                   **tiny_spec_kwargs(o))
    params = generator_init(jax.random.PRNGKey(11), spec)
    x = rng.randn(1, 128, 128, 3).astype(np.float32)
    out, params = jax.jit(lambda p, xx: generator_forward(
        p, spec, xx, actnorm_init=True))(params, jnp.asarray(x))

    sd = {k: torch.tensor(np.ascontiguousarray(v))
          for k, v in export_generator_state_dict(params, spec).items()}
    torch.manual_seed(0)
    net = refmod.define_G(o, ref_common.default_conv).eval()
    net.load_state_dict(sd, strict=True)   # every key, exact shapes
    with torch.no_grad():
        ref = net(torch.tensor(x.transpose(0, 3, 1, 2)))

    for k, i in (("r", 0), ("s", 1), ("d", 2)):
        got = np.asarray(out[k]).transpose(0, 3, 1, 2)
        diff = np.abs(got - ref[i].numpy()).max()
        assert diff < 3e-4, f"branch {k}: {diff}"
