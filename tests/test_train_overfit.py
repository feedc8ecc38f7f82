"""Nightly: the GAN trainer must OPTIMIZE, not just step (VERDICT r4 #3).

CPU-tiny version of scripts/train_overfit.py: 50 full GAN steps on 2 fixed
synthetic hazy/clear pairs at the minimum v3 geometry (128px input =
2*loadSize per the half-res-trunk rule), asserting the G loss trends down
and PSNR(fake_A, clear) improves.  Step mechanics are covered by the
default tier; this catches sign/weighting errors that equivalence tests
against our own forward cannot."""

import importlib.util
import os
import sys

import numpy as np
import pytest

_SPEC = importlib.util.spec_from_file_location(
    "train_overfit",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "scripts", "train_overfit.py"))
train_overfit = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(train_overfit)


@pytest.mark.nightly
def test_trainer_optimizes_tiny():
    hist = train_overfit.run(steps=50, batch=2, size=128, pairs=2,
                             dtype="float32", remat=False, log_every=5,
                             quiet=False)
    assert len(hist) >= 8
    g = [h["G"] for h in hist]
    p = [h["psnr"] for h in hist]
    assert all(np.isfinite(g)), g
    # robust trend checks: mean of last 3 logged points vs first 3
    g_head, g_tail = np.mean(g[:3]), np.mean(g[-3:])
    p_head, p_tail = np.mean(p[:3]), np.mean(p[-3:])
    assert g_tail < g_head, (g_head, g_tail, g)
    assert p_tail > p_head + 0.3, (p_head, p_tail, p)
