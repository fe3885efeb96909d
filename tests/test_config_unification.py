"""The benched configuration must be the trained configuration.

VERDICT r3 weakness 3: bench.py shipped tile=32/strip=8 while train.py
defaulted strip=0, so the published throughput reflected a configuration
the trainer never ran.  These tests pin the single source of truth: the
``RasterConfig`` field defaults, consumed identically by bench.py (absent
env overrides) and train.py (absent CLI overrides).
"""

import os

import pytest

from svgir_tpu.config import RasterConfig


def _bench_cfg():
    """Reproduce bench.py's cfg construction (without the snug-cap probe,
    which is scene-specific by design)."""
    return RasterConfig(
        max_instances=int(os.environ.get("SVGIR_BENCH_CAP", 7 << 16)),
        chunk=int(os.environ.get("SVGIR_BENCH_CHUNK", RasterConfig.chunk)),
        tile=int(os.environ.get("SVGIR_BENCH_TILE", RasterConfig.tile)),
        strip=int(os.environ.get("SVGIR_BENCH_STRIP", RasterConfig.strip)))


def _train_cfg():
    """train.py's raster_cfg from its REAL parser at default CLI flags."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from train import build_parser, raster_cfg_from_args
    args = build_parser().parse_args(["-s", "x", "-m", "y"])
    return raster_cfg_from_args(args)


def test_bench_and_train_share_kernel_config(monkeypatch):
    for k in list(os.environ):
        if k.startswith("SVGIR_BENCH"):
            monkeypatch.delenv(k)
    b, t = _bench_cfg(), _train_cfg()
    # every field except the scene-sized instance cap must be identical
    # (bench probes its synthetic scene snugly; the trainer starts snug and
    # auto-grows on overflow)
    for field in ("tile", "strip", "chunk", "binner", "surface",
                  "normalize_depth", "per_pixel_depth"):
        assert getattr(b, field) == getattr(t, field), field


def test_train_cli_defaults_match_rasterconfig():
    """train.py's argparse defaults must track the RasterConfig defaults —
    checked against the imported parser itself."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from train import build_parser
    args = build_parser().parse_args(["-s", "x", "-m", "y"])
    assert args.strip == RasterConfig.strip
    assert args.tile == RasterConfig.tile
    assert args.chunk == RasterConfig.chunk


def test_a_b_winners_are_the_defaults():
    """The measured A/B winners (docs/PERF.md): tile=32, strip=8,
    counting binner."""
    cfg = RasterConfig()
    assert cfg.tile == 32
    assert cfg.strip == 8
    assert cfg.binner == "counting"
