"""Config / CLI parity: the reference's canonical commands parse verbatim."""

import pytest


def test_canonical_readme_command_parses(tmp_path):
    from cfen_vit_tpu.config import parse_args
    argv = ("--dataroot R --name iid_hlgvit_crs_gd4_cfs_v3_reside "
            "--n_feats 24 --hidden_dim_ratio 4 --sb --out_all "
            "--which_epoch 32 --model dec_vit --dataset_mode dec_vit "
            "--model_G iid_hlgvit_crs_gd4_cfs_v3 "
            f"--checkpoints_dir {tmp_path}").split()
    cfg = parse_args(argv, is_train=False)
    assert cfg.n_feats == 24 and cfg.hidden_dim_ratio == 4
    assert cfg.sb and cfg.out_all and cfg.which_epoch == "32"
    assert not cfg.isTrain and cfg.phase == "test"
    assert cfg.input_size() == 512   # half-res trunk at loadSize 256
    # opt.txt dumped like the reference (base_options.py:241-248)
    opt = (tmp_path / "iid_hlgvit_crs_gd4_cfs_v3_reside" / "opt.txt")
    assert opt.exists() and "n_feats: 24" in opt.read_text()


def test_all_reference_flags_accepted(tmp_path):
    """Every flag from the reference's five canonical test commands plus the
    common train flags parses without error."""
    from cfen_vit_tpu.config import parse_args
    argv = ("--dataroot D --name x --batchSize 2 --loadSize 256 "
            "--fineSize 128 --input_nc 3 --output_nc 3 --ngf 32 --ndf 32 "
            "--which_model_netD basic --n_layers_D 3 --gpu_ids 0 "
            "--nThreads 2 --norm instance --no_dropout --init_type kaiming "
            "--patch_dim 2 --num_heads 4 --num_layers 1 --dropout_rate 0 "
            "--num_queries 1 --patch_size 32 --rgb_range 255 --n_colors 3 "
            "--n_feats 24 --hidden_dim_ratio 2 --l2g_ratio 4 "
            "--niter 100 --niter_decay 200 --beta1 0.5 --lr 0.0001 "
            "--pool_size 50 --lambda_A 1 --lambda_B 2 --lambda_identity 1 "
            "--lambda_vgg 1.0 --lambda_content 1 --lambda_style 2 "
            "--lr_policy lambda --lr_decay_iters 200 --epoch_count 1 "
            "--print_freq 100 --display_freq 100 --save_latest_freq 5000 "
            "--save_epoch_freq 1 --display_winsize 256 --display_id 0 "
            "--verbose --resize_or_crop resize --max_dataset_size 100 "
            f"--checkpoints_dir {tmp_path}").split()
    cfg = parse_args(argv, is_train=True)
    assert cfg.isTrain and cfg.beta1 == 0.5 and cfg.pool_size == 50


def test_invalid_geometry_rejected(tmp_path):
    from cfen_vit_tpu.config import parse_args
    with pytest.raises(ValueError):
        parse_args(f"--dataroot D --name x --loadSize 100 "
                   f"--checkpoints_dir {tmp_path}".split(), is_train=False)
