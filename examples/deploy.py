"""Deployment example: the transmitter/receiver split over a real channel.

Exports a camera codec as standalone StableHLO artifacts, then simulates
the deployed system WITHOUT the framework's model code: the transmitter
process would ship only ``encoder.stablehlo``, the receiver only
``decoder.stablehlo`` — here both run in one process for the demo, with
the channel in between (the one part that is physics, not code).

Run: python examples/deploy.py   (CPU or TPU; exports in ~1 min)
"""

import tempfile

import jax
import jax.numpy as jnp

import multimodal_sc_tpu as msc


def main():
    key = jax.random.key(0)

    # --- Train-side: build a codec (untrained here; in production load
    # params from train.checkpoint_dir — see `cli export`).
    cfg = msc.get_preset("c2").override_str(
        ["camera.features=16,32,32,32", "camera.c_sym=4",
         "camera.image_hw=32,32"])
    from multimodal_sc_tpu.io import export as export_lib
    from multimodal_sc_tpu.train import jscc

    params = jscc.create_train_state(cfg, key).params
    artifact_dir = tempfile.mkdtemp(prefix="msc_artifact_")
    export_lib.save_artifact(
        artifact_dir, export_lib.export_camera_codec(cfg, params), cfg)
    print(f"exported -> {artifact_dir}")

    # --- Deployment-side: artifacts only, any batch size.
    fns = export_lib.load_artifact(artifact_dir)
    img = jax.random.uniform(key, (8, 32, 32, 3))
    snr_db = jnp.full((8,), 10.0)

    z = fns["encoder"](img, snr_db)                 # transmitter
    z_hat = msc.channel(z, snr_db, "rayleigh", key)  # the air
    recon = fns["decoder"](z_hat, snr_db)            # receiver

    mse = jnp.mean((recon - img) ** 2)
    psnr = 10.0 * jnp.log10(1.0 / mse)
    print(f"symbols {z.shape} -> recon {recon.shape}, "
          f"PSNR {float(psnr):.2f} dB (untrained params)")


if __name__ == "__main__":
    main()
