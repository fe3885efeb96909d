"""Stand-in end-to-end parity (VERDICT r1 #7): full stage-1 (with
densification) -> stage-2 -> relight against procedural GT rendered by the
same forward model.  Thresholds are calibrated ~3 dB under measured values
(see BASELINE.md stand-in parity rows)."""

import pytest

from svgir_tpu.eval.standin import run_standin_parity


@pytest.mark.slow
def test_standin_parity_pipeline():
    out = run_standin_parity(n_gt=250, n_views=8, res=40, sample_num=8,
                             stage1_iters=200, stage2_iters=100,
                             init_points=120, capacity=512, verbose=False)
    # measured on CPU at this scale: 447 alive, stage1 14.9, stage2 14.6,
    # relight 15.8 (thresholds ~3 dB under)
    assert out["n_alive_after_stage1"] > 150, out   # densification ran
    assert out["stage1_nvs_psnr"] > 12.0, out
    assert out["stage2_pbr_psnr"] > 11.5, out
    assert out["relight_psnr"] > 12.0, out
