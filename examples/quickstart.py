"""Quickstart: the five public verbs end-to-end on tiny shapes.

Run: python examples/quickstart.py   (CPU or TPU; ~1 min on TPU after the
compilation cache is warm).
"""

import jax
import jax.numpy as jnp

import multimodal_sc_tpu as msc


def main():
    # --- 1. Build a camera codec and push an image through the channel ---
    from multimodal_sc_tpu.codec.camera_cnn import CameraJSCC

    key = jax.random.key(0)
    model = CameraJSCC(features=(16, 32, 32, 32), c_sym=4)
    img = jax.random.uniform(key, (4, 32, 32, 3))
    params = model.init(key, img, None)["params"]

    z = msc.encode(model, params, img)                 # (4, k, 2) symbols
    z_hat = msc.channel(z, 10.0, "rayleigh", key)      # fading + noise
    recon = msc.decode(model, params, z_hat)           # (4, 32, 32, 3)
    print("JSCC roundtrip:", z.shape, "->", recon.shape)

    # Digital mode: 16-QAM constellation instead of analog amplitudes.
    z_digital = msc.channel(z, 10.0, "awgn", key, modulation=16)
    print("16-QAM symbols hit", len(jnp.unique(z_digital.round(3))),
          "distinct levels after noise")

    # Channel realism: frequency-selective OFDM multipath with a
    # pilot-ESTIMATED channel at the equalizer (no genie CSI).
    z_ofdm = msc.channel(z, 10.0, "ofdm", key, pilots=2)
    print("OFDM + 2-pilot LS-estimated CSI:", z_ofdm.shape)
    # (Bandwidth-agile codecs: train with camera.adaptive_rate=true, then
    #  deploy at any rate via api.reconstruct(..., rate_sym=m) or
    #  `cli eval --rate-sweep`.)

    # --- 2. One composed call (stays one jitted graph under jit) ---
    from multimodal_sc_tpu.evaluation import psnr

    recon2, _ = msc.api.reconstruct(model, params, img, 10.0, key, "awgn")
    print("api.reconstruct PSNR:", float(psnr(recon2, img)),
          "dB (untrained)")

    # --- 3. RL: act + train_step on a tiny config-4 agent ---
    cfg = msc.get_preset("c4").override_str([
        "camera.features=8,16,16,16", "camera.c_sym=2",
        "camera.image_hw=16,16", "env.image_hw=16,16",
        "lidar.pillar_dim=16", "lidar.c_sym=2", "lidar.bev_hw=8,8",
        "fusion.dim=32", "fusion.depth=1", "fusion.heads=2",
        "fusion.state_dim=32", "env.num_npcs=2", "env.lidar_rays=16",
        "rl.replay_capacity=128", "rl.batch_size=8",
    ])
    from multimodal_sc_tpu.envs import driving
    from multimodal_sc_tpu.rl import dqn as dqn_lib

    state = dqn_lib.init(cfg, key, num_envs=4)
    img_o, pts, mask = driving.observe_batch(cfg.env, state.env_states)
    actions = msc.act(cfg, state.params, img_o, pts, mask, key)
    print("actions:", actions)

    for _ in range(3):
        state, metrics = msc.train_step(cfg, state)
    print("after 3 fused iterations:",
          {k: round(float(v), 4) for k, v in jax.device_get(metrics).items()})

    # --- 3b. The same agent over DIGITAL links (r4): both modalities
    # ship codebook indices over QPSK; FEC is a deploy-time flag on the
    # same checkpoint (channel.fec=hamming74_soft).
    cfg_d = cfg.override_str([
        "camera.arch=vq", "camera.vq_codes=16", "camera.vq_dim=8",
        "lidar.arch=vq", "lidar.vq_codes=16", "lidar.vq_dim=8",
    ]).validate()
    state_d = dqn_lib.init(cfg_d, key, num_envs=4)
    a_d = msc.act(cfg_d, state_d.params, img_o, pts, mask, key)
    print("digital-link actions:", a_d)

    # --- 4. Full training runs are presets away ---
    # python -m multimodal_sc_tpu.cli train --config c5
    print("done")


if __name__ == "__main__":
    main()
