"""End-to-end CLI smoke: train.py main() over an on-disk Blender scene.

Covers the glue the trainer tests bypass: dataset dispatch + random-PLY
bootstrap, cfg_args dump, cameras.json, logger callbacks, end-of-run
checkpoint + PLY export (reference train.py:28-249 orchestration).
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

from tests.test_data import _write_blender_scene


def test_train_cli_stage1(tmp_path):
    import train as train_cli
    from svgir_tpu.data.readers import store_pointcloud

    root = str(tmp_path / "scene")
    _write_blender_scene(root, n_frames=3, res=32)

    # small init cloud (the reader would otherwise bootstrap 100k points)
    rng = np.random.default_rng(1)
    xyz = rng.random((300, 3)) * 2.0 - 1.0
    rgb = rng.random((300, 3)) * 255
    nrm = rng.standard_normal((300, 3))
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    store_pointcloud(os.path.join(root, "points3d.ply"), xyz, rgb, nrm)

    out = str(tmp_path / "out")
    train_cli.main([
        "-s", root, "-m", out, "--iterations", "8",
        "--max_instances", "4096", "--position_lr_max_steps", "8",
    ])

    assert os.path.exists(os.path.join(out, "cfg_args.json"))
    assert os.path.exists(os.path.join(out, "cameras.json"))
    assert os.path.exists(os.path.join(out, "chkpnt8.npz"))
    assert os.path.exists(os.path.join(out, "point_cloud.ply"))
    log = [json.loads(l) for l in
           open(os.path.join(out, "train_log.jsonl"))]
    assert log and np.isfinite(log[-1]["loss"])

    # NVS eval CLI over the stage-1 output (reference eval_nvs.py flow);
    # this toy scene has no test split, so evaluate the train views
    import eval_nvs
    eval_nvs.main([
        "-s", root, "-m", out, "-c", os.path.join(out, "chkpnt8.npz"),
        "--max_instances", "4096", "--eval_scale", "1",
    ])
    train_eval = os.path.join(out, "eval", "train")
    assert os.path.isdir(train_eval) and os.listdir(train_eval)

    # stage 2 resumes the stage-1 checkpoint (upgrade-to-PBR path:
    # train.py -t render_relight -c chkpnt*, reference run_tensoir.sh:20-42)
    out2 = str(tmp_path / "out2")
    train_cli.main([
        "-s", root, "-m", out2, "-t", "render_relight",
        "-c", os.path.join(out, "chkpnt8.npz"),
        "--iterations", "14", "--max_instances", "4096",
        "--sample_num", "4", "--env_resolution", "16",
        "--position_lr_max_steps", "14",
    ])
    assert os.path.exists(os.path.join(out2, "chkpnt14.npz"))
    assert os.path.exists(os.path.join(out2, "point_cloud.ply"))
    log2 = [json.loads(l) for l in
            open(os.path.join(out2, "train_log.jsonl"))]
    assert log2 and np.isfinite(log2[-1]["loss"])

    # relighting CLI: composition PLY + HDR env + 2-frame orbit
    import imageio.v2 as imageio
    import relighting
    hdr = str(tmp_path / "env.png")
    imageio.imwrite(hdr, (np.random.default_rng(0)
                          .random((8, 16, 3)) * 255).astype(np.uint8))
    rel_out = str(tmp_path / "relight")
    relighting.main([
        "--config", os.path.join(out2, "point_cloud.ply"), "--hdr", hdr,
        "--output", rel_out, "--frames", "2", "--resolution", "32",
        "--sample_num", "2", "--max_instances", "4096",
    ])
    rel_frames = os.path.join(rel_out, "pbr_env")
    assert os.path.exists(os.path.join(rel_frames, "frame_1.png"))

    # relighting CLI via a reference-style config DIRECTORY
    # (configs/<name>/{transform,trajectory,light_transform}.json)
    cfg_dir = str(tmp_path / "cfg")
    os.makedirs(cfg_dir, exist_ok=True)
    ident4 = [1.0, 0, 0, 0, 0, 1.0, 0, 0, 0, 0, 1.0, 0, 0, 0, 0, 1.0]
    json.dump({"scene": {"path": os.path.join(out2, "point_cloud.ply"),
                         "transform": ident4}},
              open(os.path.join(cfg_dir, "transform.json"), "w"))
    w2c = [1.0, 0, 0, 0, 0, 1.0, 0, 0, 0, 0, 1.0, 3.0, 0, 0, 0, 1.0]
    json.dump({"camera": {"width": 32, "height": 32, "fov": 40},
               "trajectory": {"0": w2c, "1": w2c}},
              open(os.path.join(cfg_dir, "trajectory.json"), "w"))
    rot = [1.0, 0, 0, 0, 1.0, 0, 0, 0, 1.0]
    json.dump({"transform": {"0": rot, "1": rot}},
              open(os.path.join(cfg_dir, "light_transform.json"), "w"))
    rel_out2 = str(tmp_path / "relight_cfgdir")
    relighting.main([
        "--config", cfg_dir, "--hdr", hdr, "--output", rel_out2,
        "--sample_num", "2", "--max_instances", "4096",
        "--capture_list", "pbr_env,normal,roughness",
    ])
    for ct in ("pbr_env", "normal", "roughness"):
        assert os.path.exists(os.path.join(rel_out2, ct, "frame_1.png")), ct

    # normal_eval CLI over the relight frames (self-MAE == 0)
    import normal_eval
    normal_eval.main(["--pred_dir", rel_frames, "--gt_dir", rel_frames])

    # GUI viewer in headless orbit-sweep mode over the stage-2 checkpoint
    import gui
    gui_out = str(tmp_path / "gui")
    gui.main([
        "-c", os.path.join(out2, "chkpnt14.npz"), "--headless",
        "--output", gui_out, "--frames", "2", "--resolution", "32",
        "--sample_num", "2", "--max_instances", "4096",
    ])
    assert os.listdir(gui_out)
