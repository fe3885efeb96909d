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
    # relight 15.8, albedo 19.1 (thresholds ~3 dB under)
    assert out["n_alive_after_stage1"] > 150, out   # densification ran
    assert out["stage1_nvs_psnr"] > 12.0, out
    assert out["stage2_pbr_psnr"] > 11.5, out
    assert out["relight_psnr"] > 12.0, out
    assert out["albedo_psnr"] > 16.0, out


@pytest.mark.nightly
@pytest.mark.slow
def test_standin_parity_medium():
    """The discriminating config (VERDICT r2 item 7): 10k+ gaussians after
    densification, 600+250 iters.  Thresholds at measured − 1.5 dB
    (r3 CPU run 2026-08-19: stage1 17.1, stage2 18.1, relight 18.5,
    albedo 20.0, 12 711 alive — BASELINE.md medium row)."""
    out = run_standin_parity(n_gt=1000, n_views=12, res=64, sample_num=8,
                             stage1_iters=600, stage2_iters=250,
                             init_points=400, capacity=16384, verbose=False)
    assert out["n_alive_after_stage1"] > 8000, out
    assert out["stage1_nvs_psnr"] > 15.6, out
    assert out["stage2_pbr_psnr"] > 16.6, out
    assert out["relight_psnr"] > 17.0, out
    assert out["albedo_psnr"] > 18.5, out
