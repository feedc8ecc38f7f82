"""eval.py CLI: PSNR/SSIM between folders (identical pair => inf-ish/1.0)."""

import json
import os

import numpy as np
import pytest
from PIL import Image


def test_eval_cli(tmp_path, capsys, rng):
    from tests.ref_utils import load_repo_module
    eval_cli = load_repo_module('eval')

    pred = tmp_path / "pred"
    gt = tmp_path / "gt"
    pred.mkdir()
    gt.mkdir()
    a = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
    noisy = np.clip(a.astype(int) + rng.randint(-10, 10, a.shape), 0,
                    255).astype(np.uint8)
    Image.fromarray(a).save(gt / "im1.png")
    Image.fromarray(noisy).save(pred / "im1_fake_A.png")
    Image.fromarray(a).save(gt / "im2.png")
    Image.fromarray(a).save(pred / "im2_fake_A.png")

    rc = eval_cli.main(["--pred", str(pred), "--gt", str(gt), "--json"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["n"] == 2
    assert 20 < out["psnr"] < 200      # one perfect + one noisy pair
    assert 0.8 < out["ssim"] <= 1.0

    # probe: no matching pairs -> clean exit code 2
    empty = tmp_path / "empty"
    empty.mkdir()
    assert eval_cli.main(["--pred", str(empty), "--gt", str(gt)]) == 2
