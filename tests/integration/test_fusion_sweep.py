"""cli eval on a jscc_fusion (c3) checkpoint: camera PSNR + BEV mIoU sweep
from the fusion param tree's codec sub-trees (r2 evaluation-coverage gap:
`eval` previously only handled plain jscc configs)."""

import json

import pytest

from multimodal_sc_tpu import cli


def _overrides(tmp_path):
    return [
        # image_hw must match the dataset's served shape (synthetic_cifar
        # -> 32x32); patch 8 keeps the ViT at 16 tokens.
        "train.dataset=synthetic_cifar",
        "camera.image_hw=32,32", "camera.dim=32", "camera.depth=1",
        "camera.heads=2", "camera.c_sym=4", "camera.patch=8",
        "lidar.pillar_dim=16", "lidar.c_sym=2", "lidar.bev_hw=8,8",
        "lidar.max_points=64",
        "train.steps=2", "train.batch_size=4", "train.log_every=10",
        f"train.checkpoint_dir={tmp_path}", "train.checkpoint_every=2",
    ]


@pytest.mark.slow
def test_eval_sweeps_fusion_checkpoint(tmp_path, capsys):
    ov = _overrides(tmp_path)
    args = [x for pair in (("--set", o) for o in ov) for x in pair]
    assert cli.main(["train", "--config", "c3", *args]) == 0
    capsys.readouterr()

    out_json = str(tmp_path / "curves.json")
    rc = cli.main(["eval", "--config", "c3", "--out", out_json, *args])
    out = capsys.readouterr().out
    assert rc == 0
    assert "camera PSNR:" in out and "lidar BEV mIoU:" in out
    assert "camera SSIM:" in out

    curves = json.load(open(out_json))
    assert set(curves) == {"camera", "lidar"}
    for kind in ("awgn", "rayleigh"):
        miou_curve = [p["miou"] for p in curves["lidar"][kind]]
        assert all(0.0 <= m <= 1.0 for m in miou_curve)
        psnr_curve = [p["psnr"] for p in curves["camera"][kind]]
        assert all(p > 0 for p in psnr_curve)
        ssim_curve = [p["ssim"] for p in curves["camera"][kind]]
        assert all(-1.0 <= s <= 1.0 for s in ssim_curve)
