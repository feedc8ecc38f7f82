"""End-to-end CLI test: test.py over a synthetic hazy folder.

Mirrors the reference's golden-command flow (run_me_for_testing.txt:4-23):
dataroot/hazy/*.png -> results/<name>/test_<epoch>/images/*_fake_A.png
plus an index.html gallery.
"""

import os

import numpy as np
import pytest
from PIL import Image


@pytest.fixture
def tiny_env(tmp_path):
    import jax
    from dataclasses import replace
    from cfen_vit_tpu.config import Config
    from cfen_vit_tpu.models.registry import generator_spec
    from cfen_vit_tpu.models.generator import generator_init, generator_forward
    from cfen_vit_tpu.train.checkpoint import save_net

    rng = np.random.RandomState(0)
    hazy = tmp_path / "data" / "hazy"
    hazy.mkdir(parents=True)
    for i in range(3):
        Image.fromarray(
            (rng.rand(128, 128, 3) * 255).astype(np.uint8)).save(
            hazy / f"img_{i:02d}.png")

    cfg = Config(dataroot=str(tmp_path / "data"), name="tiny",
                 checkpoints_dir=str(tmp_path / "ckpt"),
                 results_dir=str(tmp_path / "results"),
                 n_feats=8, loadSize=64, patch_size=8, num_heads=2,
                 hidden_dim_ratio=2, isTrain=False, sb=True, phase="test",
                 which_epoch="7")
    spec = generator_spec(cfg.model_G, cfg)
    params = generator_init(jax.random.PRNGKey(0), spec)
    x = jax.numpy.asarray(rng.randn(1, 128, 128, 3).astype(np.float32))
    _, params = jax.jit(
        lambda p, xx: generator_forward(p, spec, xx, actnorm_init=True)
    )(params, x)
    save_net(cfg, "7", "G", params)
    return cfg, tmp_path


def test_cli_end_to_end(tiny_env):
    from tests.ref_utils import load_repo_module
    test_cli = load_repo_module('test')
    cfg, tmp = tiny_env
    argv = ["--dataroot", cfg.dataroot, "--name", "tiny",
            "--checkpoints_dir", cfg.checkpoints_dir,
            "--results_dir", cfg.results_dir,
            "--model", "dec_vit", "--dataset_mode", "dec_vit",
            "--model_G", "iid_hlgvit_crs_gd4_cfs_v3",
            "--n_feats", "8", "--loadSize", "64", "--patch_size", "8",
            "--num_heads", "2", "--hidden_dim_ratio", "2",
            "--sb", "--out_all", "--which_epoch", "7"]
    test_cli.main(argv)
    img_dir = os.path.join(cfg.results_dir, "tiny", "test_7", "images")
    pngs = sorted(os.listdir(img_dir))
    assert pngs == [f"img_{i:02d}_fake_A.png" for i in range(3)]
    out = np.asarray(Image.open(os.path.join(img_dir, pngs[0])))
    assert out.shape == (128, 128, 3) and out.dtype == np.uint8
    assert os.path.exists(os.path.join(cfg.results_dir, "tiny", "test_7",
                                       "index.html"))


def test_cli_all_visuals_without_out_all(tiny_env):
    from tests.ref_utils import load_repo_module
    test_cli = load_repo_module('test')
    cfg, tmp = tiny_env
    argv = ["--dataroot", cfg.dataroot, "--name", "tiny",
            "--checkpoints_dir", cfg.checkpoints_dir,
            "--results_dir", cfg.results_dir, "--phase", "val",
            "--model", "dec_vit", "--dataset_mode", "dec_vit",
            "--n_feats", "8", "--loadSize", "64", "--patch_size", "8",
            "--num_heads", "2", "--hidden_dim_ratio", "2",
            "--sb", "--which_epoch", "7", "--how_many", "1"]
    test_cli.main(argv)
    img_dir = os.path.join(cfg.results_dir, "tiny", "val_7", "images")
    labels = {f.split("img_00_")[1][:-4] for f in os.listdir(img_dir)}
    assert labels == {"real_B", "fake_A", "fake_R", "fake_S"}


def test_cli_vit_model_single_output(tmp_path):
    """--model vit (MGVIT/ipt single-output generator) through the CLI."""
    import jax
    import numpy as np
    from PIL import Image
    from tests.ref_utils import load_repo_module
    test_cli = load_repo_module('test')
    from cfen_vit_tpu.config import Config
    from cfen_vit_tpu.models.registry import generator_spec
    from cfen_vit_tpu.models.generator import generator_init, generator_forward
    from cfen_vit_tpu.train.checkpoint import save_net

    rng = np.random.RandomState(0)
    hazy = tmp_path / "data" / "hazy"
    hazy.mkdir(parents=True)
    Image.fromarray((rng.rand(64, 64, 3) * 255).astype(np.uint8)).save(
        hazy / "a.png")

    cfg = Config(dataroot=str(tmp_path / "data"), name="vt",
                 checkpoints_dir=str(tmp_path / "ckpt"),
                 results_dir=str(tmp_path / "results"),
                 model="vit", dataset_mode="vit", n_feats=8, loadSize=64,
                 patch_size=8, num_heads=2, hidden_dim_ratio=2,
                 isTrain=False, sb=True, which_epoch="3")
    spec = generator_spec("ipt", cfg)
    params = generator_init(jax.random.PRNGKey(0), spec)
    x = jax.numpy.zeros((1, 64, 64, 3))
    _, params = jax.jit(lambda p, xx: generator_forward(
        p, spec, xx, actnorm_init=True))(params, x)
    save_net(cfg, "3", "G", params)

    test_cli.main(["--dataroot", cfg.dataroot, "--name", "vt",
                   "--checkpoints_dir", cfg.checkpoints_dir,
                   "--results_dir", cfg.results_dir,
                   "--model", "vit", "--dataset_mode", "vit",
                   "--n_feats", "8", "--loadSize", "64", "--patch_size",
                   "8", "--num_heads", "2", "--hidden_dim_ratio", "2",
                   "--sb", "--which_epoch", "3"])
    import os
    img_dir = os.path.join(cfg.results_dir, "vt", "test_3", "images")
    assert sorted(os.listdir(img_dir)) == ["a_fake_A.png", "a_real_B.png"]


def test_cli_chop_and_ensemble(tiny_env):
    """--chop handles inputs larger than the compiled geometry;
    --self_ensemble averages the x8 dihedral transforms."""
    import os
    import numpy as np
    from PIL import Image
    from tests.ref_utils import load_repo_module
    test_cli = load_repo_module('test')
    cfg, tmp = tiny_env
    big = tmp / "bigdata" / "hazy"
    big.mkdir(parents=True)
    rng = np.random.RandomState(3)
    Image.fromarray((rng.rand(192, 192, 3) * 255).astype(np.uint8)).save(
        big / "big.png")
    test_cli.main(["--dataroot", str(tmp / "bigdata"), "--name", "tiny",
                   "--checkpoints_dir", cfg.checkpoints_dir,
                   "--results_dir", cfg.results_dir, "--phase", "chop",
                   "--model", "dec_vit", "--dataset_mode", "dec_vit",
                   "--n_feats", "8", "--loadSize", "64", "--patch_size",
                   "8", "--num_heads", "2", "--hidden_dim_ratio", "2",
                   "--sb", "--out_all", "--which_epoch", "7",
                   "--chop", "--chop_overlap", "16", "--self_ensemble"])
    img_dir = os.path.join(cfg.results_dir, "tiny", "chop_7", "images")
    out = np.asarray(Image.open(os.path.join(img_dir, "big_fake_A.png")))
    assert out.shape == (192, 192, 3)


def test_cli_decn_model(tmp_path):
    """--model decn_vit (single-decoder iidn generator; the reference's
    wrapper file is missing entirely — docs/REFERENCE_DEFECTS.md)."""
    import jax
    import numpy as np
    import os
    from PIL import Image
    from tests.ref_utils import load_repo_module
    test_cli = load_repo_module('test')
    from cfen_vit_tpu.config import Config
    from cfen_vit_tpu.models.registry import generator_spec
    from cfen_vit_tpu.models.generator import generator_init, generator_forward
    from cfen_vit_tpu.train.checkpoint import save_net

    rng = np.random.RandomState(0)
    (tmp_path / "data" / "hazy").mkdir(parents=True)
    Image.fromarray((rng.rand(64, 64, 3) * 255).astype(np.uint8)).save(
        tmp_path / "data" / "hazy" / "a.png")
    cfg = Config(dataroot=str(tmp_path / "data"), name="dn",
                 checkpoints_dir=str(tmp_path / "ckpt"),
                 results_dir=str(tmp_path / "results"), model="decn_vit",
                 n_feats=8, loadSize=64, patch_size=8, num_heads=2,
                 hidden_dim_ratio=2, isTrain=False, sb=True,
                 which_epoch="2")
    spec = generator_spec("iidn_hlgvit_crs_gd4", cfg)
    params = generator_init(jax.random.PRNGKey(0), spec)
    _, params = jax.jit(lambda p, xx: generator_forward(
        p, spec, xx, actnorm_init=True))(params, jax.numpy.zeros((1, 64, 64, 3)))
    save_net(cfg, "2", "G", params)
    test_cli.main(["--dataroot", cfg.dataroot, "--name", "dn",
                   "--checkpoints_dir", cfg.checkpoints_dir,
                   "--results_dir", cfg.results_dir, "--model", "decn_vit",
                   "--dataset_mode", "dec_vit", "--n_feats", "8",
                   "--loadSize", "64", "--patch_size", "8", "--num_heads",
                   "2", "--hidden_dim_ratio", "2", "--sb",
                   "--which_epoch", "2"])
    img_dir = os.path.join(cfg.results_dir, "dn", "test_2", "images")
    assert sorted(os.listdir(img_dir)) == ["a_fake_A.png", "a_real_B.png"]
