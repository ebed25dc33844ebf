"""CPU probe (r5): usage-loss variants on the long tiny-c3 digital run.
Arms vary the usage form (diversity-only vs +confidence), coef, and
reseed. Writes results_r5/probe_vq_usage.json (merging across runs)."""
import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import multimodal_sc_tpu as msc  # noqa: E402
from multimodal_sc_tpu.codec import semantic_vq  # noqa: E402
from multimodal_sc_tpu.train import fusion_jscc  # noqa: E402

BASE = [
    "camera.arch=cnn", "camera.features=8,16,16,16", "camera.c_sym=2",
    "camera.image_hw=32,32", "train.dataset=synthetic_cifar",
    "lidar.arch=vq", "lidar.pillar_dim=16", "lidar.bev_hw=8,8",
    "lidar.vq_codes=64", "lidar.vq_dim=8", "lidar.max_points=64",
    "train.steps=700", "train.batch_size=16", "train.log_every=100",
    "train.eval_every=10000", "train.checkpoint_every=10000",
    "train.iters_per_dispatch=50",
]
# (name, sample_weight, extra overrides)
ARMS = [
    ("div_025", 0.0, ["lidar.vq_usage_coef=0.25"]),
    ("div_025_rs", 0.0, ["lidar.vq_usage_coef=0.25", "lidar.vq_reseed=0.05"]),
    ("div_1", 0.0, ["lidar.vq_usage_coef=1.0"]),
    ("mix_025", 0.25, ["lidar.vq_usage_coef=0.25"]),
]
PATH = "results_r5/probe_vq_usage.json"
out = json.load(open(PATH)) if os.path.exists(PATH) else {}
only = set(sys.argv[1:])
for name, sw, extra in ARMS:
    if only and name not in only:
        continue
    semantic_vq.USAGE_SAMPLE_WEIGHT = sw
    for seed in (0, 1):
        cfg = msc.get_preset("c3").override_str(
            BASE + extra + [f"train.seed={seed}"]).validate()
        _, m = fusion_jscc.run(cfg)
        out[f"{name}_s{seed}"] = {
            k: float(v) for k, v in m.items()
            if k in ("loss", "miou", "psnr", "lidar_code_perplexity",
                     "lidar_index_err", "lidar_vq_loss",
                     "lidar_vq_reseeded")}
        print(name, seed, out[f"{name}_s{seed}"], flush=True)
        with open(PATH, "w") as f:
            json.dump(out, f, indent=1)
