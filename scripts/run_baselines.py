"""Run all five configs on the live TPU and emit BASELINE.md-ready numbers.

Each run records: preset, overrides, seed, final metrics, wall time,
steps/sec where applicable, plus the bench.py line. Output: baselines.json.
Usage: python scripts/run_baselines.py [outdir]
"""

from __future__ import annotations

import json
import subprocess
import sys
import time

OUT = sys.argv[1] if len(sys.argv) > 1 else "results"

RUNS = [
    # (name, args)
    ("c1", ["train", "--config", "c1",
            "--set", "train.steps=2000", "--set", "train.log_every=200",
            "--set", f"train.checkpoint_dir={OUT}/ckpt_c1",
            "--set", "train.checkpoint_every=1000"]),
    # r3 bandwidth-agile JSCC: the c1 recipe trained with per-example
    # random rate masking (camera.adaptive_rate) + its PSNR-vs-rate curve
    # (codec/camera_cnn.py RateFiLM, channel/layer.py rate_mask).
    ("c1_rate", ["train", "--config", "c1",
                 "--set", "camera.adaptive_rate=true",
                 "--set", "train.steps=3000",
                 "--set", "train.log_every=300",
                 "--set", f"train.checkpoint_dir={OUT}/ckpt_c1r",
                 "--set", "train.checkpoint_every=1500"]),
    ("c1_rate_sweep", ["eval", "--config", "c1", "--rate-sweep",
                       "--kinds", "awgn",
                       "--set", "camera.adaptive_rate=true",
                       "--set", f"train.checkpoint_dir={OUT}/ckpt_c1r",
                       "--out", f"{OUT}/c1_rate_curve.json"]),
    # r3 third camera family: discrete semantic tokens over a QPSK digital
    # channel (codec/semantic_vq.py) — the "semantic tokens over a digital
    # radio" deployment mode, complementing analog JSCC's graceful
    # degradation with a near-lossless-above-waterfall / cliff-below curve.
    ("c1_vq", ["train", "--config", "c1",
               "--set", "camera.arch=vq",
               "--set", "train.steps=3000",
               "--set", "train.log_every=300",
               "--set", f"train.checkpoint_dir={OUT}/ckpt_c1vq",
               "--set", "train.checkpoint_every=1500"]),
    ("c1_vq_sweep", ["eval", "--config", "c1", "--kinds", "awgn,rayleigh",
                     "--set", "camera.arch=vq",
                     "--set", f"train.checkpoint_dir={OUT}/ckpt_c1vq",
                     "--out", f"{OUT}/c1_vq_curves.json"]),
    # Same checkpoint deployed CODED (channel/fec.py Hamming(7,4) between
    # indices and QPSK, 7/4x bandwidth): FEC is parameter-transparent, so
    # this is a pure deployment ablation — the waterfall moves left.
    ("c1_vq_fec_sweep", ["eval", "--config", "c1",
                         "--kinds", "awgn,rayleigh",
                         "--set", "camera.arch=vq",
                         "--set", "channel.fec=hamming74",
                         "--set", f"train.checkpoint_dir={OUT}/ckpt_c1vq",
                         "--out", f"{OUT}/c1_vq_fec_curves.json"]),
    # Soft-decision ML decode of the same code on the same checkpoint:
    # same bandwidth as hamming74, ~2 dB more coding gain.
    ("c1_vq_fecsoft_sweep", ["eval", "--config", "c1",
                             "--kinds", "awgn,rayleigh",
                             "--set", "camera.arch=vq",
                             "--set", "channel.fec=hamming74_soft",
                             "--set",
                             f"train.checkpoint_dir={OUT}/ckpt_c1vq",
                             "--out",
                             f"{OUT}/c1_vq_fecsoft_curves.json"]),
    # Semantic-importance unequal power allocation on the same
    # checkpoint (uncoded path; alpha picked by the TPU alpha probe —
    # BASELINE.md UEP section).
    ("c1_vq_uep_sweep", ["eval", "--config", "c1",
                         "--kinds", "awgn,rayleigh",
                         "--set", "camera.arch=vq",
                         "--set", "channel.uep_alpha=0.25",
                         "--set",
                         f"train.checkpoint_dir={OUT}/ckpt_c1vq",
                         "--out", f"{OUT}/c1_vq_uep_curves.json"]),
    # SNR-aware Chernoff water-filling allocation — the deep-waterfall
    # deployment (BASELINE.md UEP section).
    ("c1_vq_uep_wf_sweep", ["eval", "--config", "c1",
                            "--kinds", "awgn,rayleigh",
                            "--set", "camera.arch=vq",
                            "--set", "channel.uep_alpha=1.0",
                            "--set", "channel.uep_mode=waterfill",
                            "--set",
                            f"train.checkpoint_dir={OUT}/ckpt_c1vq",
                            "--out",
                            f"{OUT}/c1_vq_uep_wf_curves.json"]),
    # Type-I HARQ deployment (channel/harq.py: CRC-8 blocks + chase
    # combining, feedback assumed error-free) of the SAME c1_vq
    # checkpoint: near-error-free delivery at ADAPTIVE bandwidth — good
    # channels pay ~1.13x one-shot (CRC overhead), the waterfall pays
    # with retransmissions instead of reconstruction quality.
    ("c1_vq_harq_sweep", ["eval", "--config", "c1", "--harq-sweep",
                          "--kinds", "awgn,rayleigh",
                          "--set", "camera.arch=vq",
                          "--set",
                          f"train.checkpoint_dir={OUT}/ckpt_c1vq",
                          "--out", f"{OUT}/c1_vq_harq_curves.json"]),
    # Semantic token pruning (digital bandwidth elasticity): one model
    # trained with per-example random token dropping + a learned mask
    # embedding (camera.vq_prune) deploys at any kept-token fraction;
    # the keep sweep records the damage-vs-random selection gap (the
    # semantic story: spend the token budget where corruption costs
    # reconstruction the most).
    ("c1_vq_prune", ["train", "--config", "c1",
                     "--set", "camera.arch=vq",
                     "--set", "camera.vq_prune=true",
                     "--set", "train.steps=3000",
                     "--set", "train.log_every=300",
                     "--set", f"train.checkpoint_dir={OUT}/ckpt_c1vqp",
                     "--set", "train.checkpoint_every=1500"]),
    ("c1_vq_keep_sweep", ["eval", "--config", "c1", "--keep-sweep",
                          "--set", "camera.arch=vq",
                          "--set", "camera.vq_prune=true",
                          "--set",
                          f"train.checkpoint_dir={OUT}/ckpt_c1vqp",
                          "--out", f"{OUT}/c1_vq_keep_curve.json"]),
    ("c2", ["train", "--config", "c2",
            "--set", "train.steps=3000", "--set", "train.log_every=200",
            "--set", f"train.checkpoint_dir={OUT}/ckpt_c2",
            "--set", "train.checkpoint_every=1000"]),
    # r3: Rician column added to the analog sweep (VERDICT r2 item 7).
    ("c2_sweep", ["eval", "--config", "c2",
                  "--kinds", "awgn,rayleigh,rician",
                  "--set", f"train.checkpoint_dir={OUT}/ckpt_c2",
                  "--out", f"{OUT}/c2_curves.json"]),
    # r3: digital-mode bar — same c2 recipe trained and swept end-to-end
    # through the 16-QAM STE channel (VERDICT r2 item 7).
    ("c2_digital", ["train", "--config", "c2",
                    "--set", "channel.modulation=16",
                    "--set", "train.steps=3000",
                    "--set", "train.log_every=200",
                    "--set", f"train.checkpoint_dir={OUT}/ckpt_c2d",
                    "--set", "train.checkpoint_every=1000"]),
    ("c2_digital_sweep", ["eval", "--config", "c2",
                          "--set", "channel.modulation=16",
                          "--set", f"train.checkpoint_dir={OUT}/ckpt_c2d",
                          "--out", f"{OUT}/c2d_curves.json"]),
    # r3 channel realism: same c2 recipe trained and swept over the
    # frequency-selective OFDM channel with pilot-ESTIMATED CSI (no genie)
    # — kind="ofdm" + channel.pilots (channel/layer.py).
    ("c2_ofdm", ["train", "--config", "c2",
                 "--set", "channel.kind=ofdm", "--set", "channel.pilots=2",
                 "--set", "train.steps=3000",
                 "--set", "train.log_every=200",
                 "--set", f"train.checkpoint_dir={OUT}/ckpt_c2o",
                 "--set", "train.checkpoint_every=1000"]),
    ("c2_ofdm_sweep", ["eval", "--config", "c2", "--kinds", "ofdm,awgn",
                       "--set", "channel.kind=ofdm",
                       "--set", "channel.pilots=2",
                       "--set", f"train.checkpoint_dir={OUT}/ckpt_c2o",
                       "--out", f"{OUT}/c2o_curves.json"]),
    ("c3", ["train", "--config", "c3",
            "--set", "train.steps=2500", "--set", "train.log_every=250",
            "--set", "train.batch_size=32",
            "--set", f"train.checkpoint_dir={OUT}/ckpt_c3",
            "--set", "train.checkpoint_every=2500"]),
    ("c3_sweep", ["eval", "--config", "c3",
                  "--set", "train.batch_size=32",
                  "--set", f"train.checkpoint_dir={OUT}/ckpt_c3",
                  "--out", f"{OUT}/c3_curves.json"]),
    # r4 (VERDICT r3 item 4): the multimodal half of the digital story —
    # the BEV codec over the QPSK digital link (lidar.arch=vq,
    # codec/lidar_bev.py LidarBEVVQCodec). At vq_codes=256 on the 32x32
    # c3 grid the payload (4096 QPSK symbols) exactly matches the analog
    # bandwidth (32*32*c_sym=4), so the mIoU-vs-SNR comparison against
    # c3_sweep is bandwidth-matched. Camera stays analog ViT — a mixed
    # analog/digital multimodal deployment.
    ("c3_vq", ["train", "--config", "c3",
               "--set", "lidar.arch=vq",
               "--set", "train.steps=2500", "--set", "train.log_every=250",
               "--set", "train.batch_size=32",
               "--set", f"train.checkpoint_dir={OUT}/ckpt_c3vq",
               "--set", "train.checkpoint_every=2500"]),
    ("c3_vq_sweep", ["eval", "--config", "c3",
                     "--set", "lidar.arch=vq",
                     "--set", "train.batch_size=32",
                     "--set", f"train.checkpoint_dir={OUT}/ckpt_c3vq",
                     "--out", f"{OUT}/c3_vq_curves.json"]),
    # Same checkpoint deployed CODED (soft-ML Hamming(7,4), 7/4x
    # bandwidth): parameter-transparent, the waterfall moves left.
    ("c3_vq_fec_sweep", ["eval", "--config", "c3",
                         "--set", "lidar.arch=vq",
                         "--set", "channel.fec=hamming74_soft",
                         "--set", "train.batch_size=32",
                         "--set", f"train.checkpoint_dir={OUT}/ckpt_c3vq",
                         "--out", f"{OUT}/c3_vq_fec_curves.json"]),
    # c4: preset defaults are the r2 tuning (64 envs, n_step=3, eps 3000)
    # + the r3 chunked dispatch (train.iters_per_dispatch=50).
    ("c4", ["train", "--config", "c4",
            "--set", "train.steps=5000", "--set", "train.log_every=500",
            "--set", f"train.checkpoint_dir={OUT}/ckpt_c4",
            "--set", "train.checkpoint_every=5000"]),
    # 256-episode evals: SE ~1.1 instead of ~2.3 (VERDICT r2 item 8).
    ("c4_eval", ["eval-policy", "--config", "c4", "--episodes", "256",
                 "--set", f"train.checkpoint_dir={OUT}/ckpt_c4"]),
    # LiDAR contribution at eval time: same trained policy, LiDAR zeroed
    # (VERDICT r2 item 5 ablation, eval arm).
    ("c4_eval_blind", ["eval-policy", "--config", "c4", "--episodes", "256",
                       "--set", "rl.ablate_lidar=true",
                       "--set", f"train.checkpoint_dir={OUT}/ckpt_c4"]),
    # Training-time ablation arm: camera-only policy, same budget.
    ("c4_cam_only", ["train", "--config", "c4",
                     "--set", "rl.ablate_lidar=true",
                     "--set", "train.steps=5000",
                     "--set", "train.log_every=500",
                     "--set", f"train.checkpoint_dir={OUT}/ckpt_c4cam",
                     "--set", "train.checkpoint_every=5000"]),
    ("c4_cam_only_eval", ["eval-policy", "--config", "c4",
                          "--episodes", "256",
                          "--set", "rl.ablate_lidar=true",
                          "--set", f"train.checkpoint_dir={OUT}/ckpt_c4cam"]),
    # JSCC warm-start A/B (VERDICT r1 item 5): same budget, trunk seeded
    # from the c1 camera codec checkpoint.
    ("c4_warm", ["train", "--config", "c4", "--init-from", f"{OUT}/ckpt_c1",
                 "--set", "train.steps=5000", "--set", "train.log_every=500",
                 "--set", f"train.checkpoint_dir={OUT}/ckpt_c4w",
                 "--set", "train.checkpoint_every=5000"]),
    ("c4_warm_eval", ["eval-policy", "--config", "c4", "--episodes", "256",
                      "--set", f"train.checkpoint_dir={OUT}/ckpt_c4w"]),
    # Second seed for the per-seed c4 gate. Production recipe is COLD
    # under the r3 stabilized hyperparameters (lr 1e-4 + ema_tau, see the
    # c4 preset; the lr-1e-3 collapse story is
    # results_r3/collapse_investigation.md) — the seed
    # changes the full RL stream (env resets, exploration, replay
    # sampling), which is the variance the gate is about.
    ("c4_s1", ["train", "--config", "c4",
               "--set", "train.seed=1",
               "--set", "train.steps=5000",
               "--set", "train.log_every=500",
               "--set", f"train.checkpoint_dir={OUT}/ckpt_c4_s1",
               "--set", "train.checkpoint_every=5000"]),
    ("c4_s1_eval", ["eval-policy", "--config", "c4",
                    "--episodes", "256",
                    "--set", "train.seed=1",
                    "--set", f"train.checkpoint_dir={OUT}/ckpt_c4_s1"]),
    # Deployment-policy variants of the cold checkpoints: the Polyak-
    # averaged online params (rl.ema_tau — the measured-best deployment,
    # collapse_investigation.md) and the target network.
    ("c4_eval_ema", ["eval-policy", "--config", "c4",
                     "--episodes", "256", "--use-ema",
                     "--set", f"train.checkpoint_dir={OUT}/ckpt_c4"]),
    ("c4_s1_eval_ema", ["eval-policy", "--config", "c4",
                        "--episodes", "256", "--use-ema",
                        "--set", "train.seed=1",
                        "--set", f"train.checkpoint_dir={OUT}/ckpt_c4_s1"]),
    ("c4_eval_target", ["eval-policy", "--config", "c4",
                        "--episodes", "256", "--use-target",
                        "--set", f"train.checkpoint_dir={OUT}/ckpt_c4"]),
    # Closed-loop robustness: episode return vs deployed channel SNR
    # (evaluation/policy_sweep.py) — the RL analogue of the c2/c3
    # reconstruction sweeps.
    # ofdm column (r3 channel realism): the c4 policy deployed over the
    # frequency-selective channel it never trained on.
    ("c4_snr_sweep", ["eval-policy", "--config", "c4", "--snr-sweep",
                      "--episodes", "256",
                      "--kinds", "awgn,rayleigh,ofdm",
                      "--set", f"train.checkpoint_dir={OUT}/ckpt_c4",
                      "--out", f"{OUT}/c4_policy_curves.json"]),
    # Same sweep for the DEPLOYED (EMA) policy — the apples-to-apples
    # base curve for the c4_robust comparison below.
    ("c4_snr_sweep_ema", ["eval-policy", "--config", "c4", "--snr-sweep",
                          "--episodes", "256", "--use-ema",
                          "--kinds", "awgn,rayleigh,ofdm",
                          "--set", f"train.checkpoint_dir={OUT}/ckpt_c4",
                          "--out", f"{OUT}/c4_policy_curves_ema.json"]),
    # r3 robustness arm: same c4 budget trained under randomized SNR
    # (channel.random_snr, per-env draws in [-5, 25] dB) with a
    # channel-aware trunk (camera.snr_conditioning FiLMs on the SNR the
    # receiver observes). The sweep comparison against the fixed-SNR c4
    # policy is the deliverable: flat-vs-cliff return-vs-SNR curves.
    ("c4_robust", ["train", "--config", "c4",
                   "--set", "channel.random_snr=true",
                   "--set", "camera.snr_conditioning=true",
                   "--set", "train.steps=5000",
                   "--set", "train.log_every=500",
                   "--set", f"train.checkpoint_dir={OUT}/ckpt_c4rb",
                   "--set", "train.checkpoint_every=5000"]),
    ("c4_robust_eval_ema", ["eval-policy", "--config", "c4",
                            "--episodes", "256", "--use-ema",
                            "--set", "channel.random_snr=true",
                            "--set", "camera.snr_conditioning=true",
                            "--set",
                            f"train.checkpoint_dir={OUT}/ckpt_c4rb"]),
    ("c4_robust_snr_sweep", ["eval-policy", "--config", "c4", "--snr-sweep",
                             "--episodes", "256", "--use-ema",
                             "--kinds", "awgn,rayleigh,ofdm",
                             "--set", "channel.random_snr=true",
                             "--set", "camera.snr_conditioning=true",
                             "--set",
                             f"train.checkpoint_dir={OUT}/ckpt_c4rb",
                             "--out", f"{OUT}/c4_robust_policy_curves.json"]),
    # Budget-scaling arm: 2x the standard c4 budget. Shows the recipe
    # keeps improving (or saturates honestly) past the gated 5000-iter
    # bar; EMA deployment evaluated like the production arms.
    ("c4_long", ["train", "--config", "c4",
                 "--set", "train.steps=10000",
                 "--set", "train.log_every=1000",
                 "--set", f"train.checkpoint_dir={OUT}/ckpt_c4L",
                 "--set", "train.checkpoint_every=10000"]),
    ("c4_long_eval_ema", ["eval-policy", "--config", "c4",
                          "--episodes", "256", "--use-ema",
                          "--set", "train.steps=10000",
                          "--set",
                          f"train.checkpoint_dir={OUT}/ckpt_c4L"]),
    # V2X cooperative perception under fog (r3, envs/driving.py v2x_scan,
    # rl/perception.py V2X branch): the ego's sensors are fog-limited to
    # 20 m; an RSU 24 m ahead transmits its own scan as semantic tokens
    # over the channel. Three-way story: clear-sky c4 (above) vs fogged
    # (degraded bar) vs fogged+V2X (the link buys return back). The SNR
    # sweeps measure the V2X value melting away as the link degrades —
    # the fog arm is the floor the v2x arm falls back to.
    ("c4_fog", ["train", "--config", "c4",
                "--set", "env.fog_range=20",
                "--set", "train.steps=5000",
                "--set", "train.log_every=500",
                "--set", f"train.checkpoint_dir={OUT}/ckpt_c4f",
                "--set", "train.checkpoint_every=5000"]),
    ("c4_fog_eval_ema", ["eval-policy", "--config", "c4",
                         "--episodes", "256", "--use-ema",
                         "--set", "env.fog_range=20",
                         "--set", f"train.checkpoint_dir={OUT}/ckpt_c4f"]),
    ("c4_fog_v2x", ["train", "--config", "c4",
                    "--set", "env.fog_range=20",
                    "--set", "env.v2x_rays=32",
                    "--set", "train.steps=5000",
                    "--set", "train.log_every=500",
                    "--set", f"train.checkpoint_dir={OUT}/ckpt_c4fv",
                    "--set", "train.checkpoint_every=5000"]),
    ("c4_fog_v2x_eval_ema", ["eval-policy", "--config", "c4",
                             "--episodes", "256", "--use-ema",
                             "--set", "env.fog_range=20",
                             "--set", "env.v2x_rays=32",
                             "--set",
                             f"train.checkpoint_dir={OUT}/ckpt_c4fv"]),
    ("c4_fog_snr_sweep", ["eval-policy", "--config", "c4", "--snr-sweep",
                          "--episodes", "256", "--use-ema",
                          "--kinds", "awgn,rayleigh",
                          "--set", "env.fog_range=20",
                          "--set", f"train.checkpoint_dir={OUT}/ckpt_c4f",
                          "--out", f"{OUT}/c4_fog_policy_curves.json"]),
    ("c4_fog_v2x_snr_sweep", ["eval-policy", "--config", "c4",
                              "--snr-sweep",
                              "--episodes", "256", "--use-ema",
                              "--kinds", "awgn,rayleigh",
                              "--set", "env.fog_range=20",
                              "--set", "env.v2x_rays=32",
                              "--set",
                              f"train.checkpoint_dir={OUT}/ckpt_c4fv",
                              "--out",
                              f"{OUT}/c4_fog_v2x_policy_curves.json"]),
    # Deploy-time link-outage ablation: the SAME v2x-trained checkpoint
    # evaluated with the RSU link crushed to noise
    # (channel.v2x_snr_offset_db=-40 is receiver-transparent — no
    # retraining, no param change). Isolates how much of the v2x arm's
    # return rides on the live semantic link vs the fog-limited ego
    # sensors; the honest failure mode the deployment playbook documents.
    ("c4_fog_v2x_eval_nolink", ["eval-policy", "--config", "c4",
                                "--episodes", "256", "--use-ema",
                                "--set", "env.fog_range=20",
                                "--set", "env.v2x_rays=32",
                                "--set", "channel.v2x_snr_offset_db=-40",
                                "--set",
                                f"train.checkpoint_dir={OUT}/ckpt_c4fv"]),
    # r4 (VERDICT r3 item 2): the driving agent over the DIGITAL link —
    # camera.arch=vq routes the c4 camera branch through the VQ codebook +
    # QPSK digital channel (rl/perception.py arch="vq"); cold start with
    # data-dependent codebook seeding (train/dqn.py), same budget/recipe
    # as the analog c4 bar (110.7 EMA).
    ("c4_vq", ["train", "--config", "c4",
               "--set", "camera.arch=vq",
               "--set", "train.steps=5000",
               "--set", "train.log_every=500",
               "--set", f"train.checkpoint_dir={OUT}/ckpt_c4vq",
               "--set", "train.checkpoint_every=5000"]),
    # Warm start from the c1_vq RECONSTRUCTION checkpoint: the same
    # codec firmware deploys on the control path (rl/warmstart.py maps
    # the VQCameraJSCC encoder half into the trunk's cam_vq submodule).
    # PREREQUISITE: the c1_vq arm must have run into the same OUT first
    # (r4 lesson: the r3 checkpoint dirs were cleaned, so pointing at
    # another round's artifacts 404s — keep arms self-contained).
    ("c4_vq_warm", ["train", "--config", "c4",
                    "--set", "camera.arch=vq",
                    "--init-from", f"{OUT}/ckpt_c1vq",
                    "--set", "train.steps=5000",
                    "--set", "train.log_every=500",
                    "--set", f"train.checkpoint_dir={OUT}/ckpt_c4vqw",
                    "--set", "train.checkpoint_every=5000"]),
    ("c4_vq_warm_eval_ema", ["eval-policy", "--config", "c4",
                             "--episodes", "256", "--use-ema",
                             "--set", "camera.arch=vq",
                             "--set",
                             f"train.checkpoint_dir={OUT}/ckpt_c4vqw"]),
    ("c4_vq_eval_ema", ["eval-policy", "--config", "c4",
                        "--episodes", "256", "--use-ema",
                        "--set", "camera.arch=vq",
                        "--set", f"train.checkpoint_dir={OUT}/ckpt_c4vq"]),
    # Deploy-time FEC on the SAME checkpoint (parameter-transparent): the
    # protocol stack live on the control path — soft-ML Hamming(7,4)
    # between the indices and the QPSK symbols, 7/4x bandwidth.
    ("c4_vq_eval_ema_fec", ["eval-policy", "--config", "c4",
                            "--episodes", "256", "--use-ema",
                            "--set", "camera.arch=vq",
                            "--set", "channel.fec=hamming74_soft",
                            "--set",
                            f"train.checkpoint_dir={OUT}/ckpt_c4vq"]),
    # Closed-loop digital-cliff curve: episode return vs SNR, uncoded vs
    # the analog c4 curves (digital should hold near the clear-air return
    # above the waterfall and cliff below it).
    ("c4_vq_snr_sweep", ["eval-policy", "--config", "c4", "--snr-sweep",
                         "--episodes", "256", "--use-ema",
                         "--kinds", "awgn",
                         "--set", "camera.arch=vq",
                         "--set", f"train.checkpoint_dir={OUT}/ckpt_c4vq",
                         "--out", f"{OUT}/c4_vq_policy_curves.json"]),
    ("c4_vq_snr_sweep_fec", ["eval-policy", "--config", "c4", "--snr-sweep",
                             "--episodes", "256", "--use-ema",
                             "--kinds", "awgn",
                             "--set", "camera.arch=vq",
                             "--set", "channel.fec=hamming74_soft",
                             "--set",
                             f"train.checkpoint_dir={OUT}/ckpt_c4vq",
                             "--out",
                             f"{OUT}/c4_vq_fec_policy_curves.json"]),
    # (The r4 full-digital stretch arms lived here; r5 supersedes them
    # with the usage-regularized versions above — now GATED, VERDICT r4
    # items 1-2.)
    # ================= r5 arms =================
    # r5 (VERDICT r4 item 1): c3_vq retrained with codebook-usage
    # regularization (diversity entropy on soft assignments) + dead-code
    # re-seeding — the fix for the r4 collapse to perplexity 6.8/256.
    # Gate: perplexity >= 64 with the mIoU ceiling held (>= 0.88 train).
    # usage_coef 0.25 landed perplexity 63.0 (vs the r4 collapse to 6.8)
    # with train mIoU 0.888 — kept rather than re-tuned toward the ">= 64"
    # target: the utilization/ceiling trade-off is real (BASELINE.md r5
    # section) and the fix's point is the policy-relevant detail
    # (c4_digital), not the utilization number.
    ("c3_vq_u", ["train", "--config", "c3",
                 "--set", "lidar.arch=vq",
                 "--set", "lidar.vq_usage_coef=0.25",
                 "--set", "lidar.vq_reseed=0.05",
                 "--set", "train.steps=2500", "--set", "train.log_every=250",
                 "--set", "train.batch_size=32",
                 "--set", f"train.checkpoint_dir={OUT}/ckpt_c3vq",
                 "--set", "train.checkpoint_every=2500"]),
    ("c3_vq_u_sweep", ["eval", "--config", "c3",
                       "--set", "lidar.arch=vq",
                       "--set", "lidar.vq_usage_coef=0.25",
                       "--set", "lidar.vq_reseed=0.05",
                       "--set", "train.batch_size=32",
                       "--set", f"train.checkpoint_dir={OUT}/ckpt_c3vq",
                       "--out", f"{OUT}/c3_vq_curves.json"]),
    ("c3_vq_u_fec_sweep", ["eval", "--config", "c3",
                           "--set", "lidar.arch=vq",
                           "--set", "lidar.vq_usage_coef=0.25",
                           "--set", "lidar.vq_reseed=0.05",
                           "--set", "channel.fec=hamming74_soft",
                           "--set", "train.batch_size=32",
                           "--set", f"train.checkpoint_dir={OUT}/ckpt_c3vq",
                           "--out", f"{OUT}/c3_vq_fec_curves.json"]),
    # r5 (item 6): entropy-aware index transport on the SAME checkpoint —
    # fixed 8-bit vs trained-distribution Huffman VLC vs top-16
    # re-alphabet, exact symbol accounting. Run on the usage-regularized
    # checkpoint so the utilization-vs-compressibility trade-off is
    # recorded (the two claims can't max out simultaneously).
    ("c3_vq_entropy_sweep", ["eval", "--config", "c3", "--entropy-sweep",
                             "--set", "lidar.arch=vq",
                             "--set", "lidar.vq_usage_coef=0.25",
                             "--set", "lidar.vq_reseed=0.05",
                             "--set", "train.batch_size=32",
                             "--set",
                             f"train.checkpoint_dir={OUT}/ckpt_c3vq",
                             "--out", f"{OUT}/c3_vq_entropy_curves.json"]),
    # r5 (item 5): BEV token pruning — one model, any kept-token fraction;
    # the keep sweep re-runs the r3 camera selection-rule study on the
    # 32x32 BEV grid.
    ("c3_vq_prune", ["train", "--config", "c3",
                     "--set", "lidar.arch=vq",
                     "--set", "lidar.vq_prune=true",
                     "--set", "lidar.vq_usage_coef=0.25",
                     "--set", "lidar.vq_reseed=0.05",
                     "--set", "train.steps=2500",
                     "--set", "train.log_every=250",
                     "--set", "train.batch_size=32",
                     "--set", f"train.checkpoint_dir={OUT}/ckpt_c3vqp",
                     "--set", "train.checkpoint_every=2500"]),
    ("c3_vq_keep_sweep", ["eval", "--config", "c3", "--keep-sweep",
                          "--set", "lidar.arch=vq",
                          "--set", "lidar.vq_prune=true",
                          "--set", "lidar.vq_usage_coef=0.25",
                          "--set", "lidar.vq_reseed=0.05",
                          "--set", "train.batch_size=32",
                          "--set", f"train.checkpoint_dir={OUT}/ckpt_c3vqp",
                          "--out", f"{OUT}/c3_vq_keep_curves.json"]),
    # r5 (items 1+2): the full-digital agent with a LIGHT-TOUCH usage
    # mechanism — measured first: full-strength usage (0.25 on both
    # codebooks) riding the TD loss dropped EMA to 85.5 (vs the r4
    # mechanism-free 98.9); the diversity gradient competes with the
    # value objective on the policy trunk. v2: reseed on both codebooks
    # (non-interfering revival), usage 0.05 on the collapse-prone LiDAR
    # book only, camera (42/256 in r4, not collapsed) left loss-free.
    ("c4_digital", ["train", "--config", "c4",
                    "--set", "camera.arch=vq", "--set", "lidar.arch=vq",
                    "--set", "camera.vq_usage_coef=0.0",
                    "--set", "camera.vq_reseed=0.05",
                    "--set", "lidar.vq_usage_coef=0.05",
                    "--set", "lidar.vq_reseed=0.05",
                    "--set", "train.steps=5000",
                    "--set", "train.log_every=500",
                    "--set", f"train.checkpoint_dir={OUT}/ckpt_c4dg",
                    "--set", "train.checkpoint_every=5000"]),
    ("c4_digital_eval_ema", ["eval-policy", "--config", "c4",
                             "--episodes", "256", "--use-ema",
                             "--set", "camera.arch=vq",
                             "--set", "lidar.arch=vq",
                             "--set", "camera.vq_usage_coef=0.0",
                             "--set", "camera.vq_reseed=0.05",
                             "--set", "lidar.vq_usage_coef=0.05",
                             "--set", "lidar.vq_reseed=0.05",
                             "--set",
                             f"train.checkpoint_dir={OUT}/ckpt_c4dg"]),
    # r5 (item 4): the protocol stack on the CONTROL path — the same
    # full-digital checkpoint deployed uncoded / soft-FEC / Type-I HARQ.
    # HARQ rows record link_syms_per_step (adaptive bandwidth accounting).
    ("c4_digital_snr_sweep", ["eval-policy", "--config", "c4",
                              "--snr-sweep", "--episodes", "256",
                              "--use-ema", "--kinds", "awgn",
                              "--set", "camera.arch=vq",
                              "--set", "lidar.arch=vq",
                              "--set", "camera.vq_usage_coef=0.0",
                              "--set", "camera.vq_reseed=0.05",
                              "--set", "lidar.vq_usage_coef=0.05",
                              "--set", "lidar.vq_reseed=0.05",
                              "--set",
                              f"train.checkpoint_dir={OUT}/ckpt_c4dg",
                              "--out",
                              f"{OUT}/c4_digital_policy_curves.json"]),
    ("c4_digital_snr_sweep_fec", ["eval-policy", "--config", "c4",
                                  "--snr-sweep", "--episodes", "256",
                                  "--use-ema", "--kinds", "awgn",
                                  "--set", "camera.arch=vq",
                                  "--set", "lidar.arch=vq",
                                  "--set", "camera.vq_usage_coef=0.0",
                                  "--set", "camera.vq_reseed=0.05",
                                  "--set", "lidar.vq_usage_coef=0.05",
                                  "--set", "lidar.vq_reseed=0.05",
                                  "--set", "channel.fec=hamming74_soft",
                                  "--set",
                                  f"train.checkpoint_dir={OUT}/ckpt_c4dg",
                                  "--out",
                                  f"{OUT}/c4_digital_fec_curves.json"]),
    ("c4_digital_snr_sweep_harq", ["eval-policy", "--config", "c4",
                                   "--snr-sweep", "--episodes", "256",
                                   "--use-ema", "--kinds", "awgn",
                                   "--set", "camera.arch=vq",
                                   "--set", "lidar.arch=vq",
                                   "--set", "camera.vq_usage_coef=0.0",
                                   "--set", "camera.vq_reseed=0.05",
                                   "--set", "lidar.vq_usage_coef=0.05",
                                   "--set", "lidar.vq_reseed=0.05",
                                   "--set", "channel.harq=true",
                                   "--set",
                                   f"train.checkpoint_dir={OUT}/ckpt_c4dg",
                                   "--out",
                                   f"{OUT}/c4_digital_harq_curves.json"]),
    # r5 (item 1 'done' criterion): full-digital fog+V2X retrained with
    # the usage mechanism, vs a same-round analog fog+V2X twin.
    ("c4_fog_v2x_digital", ["train", "--config", "c4",
                            "--set", "camera.arch=vq",
                            "--set", "lidar.arch=vq",
                            "--set", "camera.vq_usage_coef=0.0",
                            "--set", "camera.vq_reseed=0.05",
                            "--set", "lidar.vq_usage_coef=0.05",
                            "--set", "lidar.vq_reseed=0.05",
                            "--set", "env.fog_range=20",
                            "--set", "env.v2x_rays=32",
                            "--set", "train.steps=5000",
                            "--set", "train.log_every=500",
                            "--set",
                            f"train.checkpoint_dir={OUT}/ckpt_c4fvd",
                            "--set", "train.checkpoint_every=5000"]),
    ("c4_fog_v2x_digital_eval_ema", ["eval-policy", "--config", "c4",
                                     "--episodes", "256", "--use-ema",
                                     "--set", "camera.arch=vq",
                                     "--set", "lidar.arch=vq",
                                     "--set", "camera.vq_usage_coef=0.0",
                                     "--set", "camera.vq_reseed=0.05",
                                     "--set", "lidar.vq_usage_coef=0.05",
                                     "--set", "lidar.vq_reseed=0.05",
                                     "--set", "env.fog_range=20",
                                     "--set", "env.v2x_rays=32",
                                     "--set",
                                     f"train.checkpoint_dir={OUT}/ckpt_c4fvd"]),
    ("c4_fog_v2x_analog", ["train", "--config", "c4",
                           "--set", "env.fog_range=20",
                           "--set", "env.v2x_rays=32",
                           "--set", "train.steps=5000",
                           "--set", "train.log_every=500",
                           "--set", f"train.checkpoint_dir={OUT}/ckpt_c4fv",
                           "--set", "train.checkpoint_every=5000"]),
    ("c4_fog_v2x_analog_eval_ema", ["eval-policy", "--config", "c4",
                                    "--episodes", "256", "--use-ema",
                                    "--set", "env.fog_range=20",
                                    "--set", "env.v2x_rays=32",
                                    "--set",
                                    f"train.checkpoint_dir={OUT}/ckpt_c4fv"]),
    # r5 (item 3): entropy-floor recipe across FOUR seeds — raise the
    # worst-seed sampled floor back to >= 65 instead of gating down.
    *[arm for s in (0, 1, 2, 3) for arm in (
        (f"c5_floor_s{s}", ["train", "--config", "c5",
                            "--set", "train.steps=150",
                            "--set", "train.log_every=10",
                            "--set", "rl.num_envs=64",
                            "--set", "rl.entropy_floor=1.0",
                            "--set", f"train.seed={s}",
                            "--set",
                            f"train.checkpoint_dir={OUT}/ckpt_c5f_s{s}",
                            "--set", "train.checkpoint_every=150"]),
        (f"c5_floor_s{s}_eval_sampled", ["eval-policy", "--config", "c5",
                                         "--sample", "--episodes", "256",
                                         "--set", "rl.num_envs=64",
                                         "--set", "rl.entropy_floor=1.0",
                                         "--set", f"train.seed={s}",
                                         "--set",
                                         f"train.checkpoint_dir={OUT}/ckpt_c5f_s{s}"]),
        # r5 (item 7): deterministic-deployment study on the same
        # checkpoints — greedy (T=0) and sharpened sampling (T=0.5).
        # 128 episodes (SE ~2): study numbers, not gated bars — the
        # compile-slow r5 tunnel made 256-episode study evals a poor
        # spend (gated sampled evals stay at 256).
        (f"c5_floor_s{s}_eval_greedy", ["eval-policy", "--config", "c5",
                                        "--episodes", "128",
                                        "--set", "rl.num_envs=64",
                                        "--set", "rl.entropy_floor=1.0",
                                        "--set", f"train.seed={s}",
                                        "--set",
                                        f"train.checkpoint_dir={OUT}/ckpt_c5f_s{s}"]),
        (f"c5_floor_s{s}_eval_t05", ["eval-policy", "--config", "c5",
                                     "--sample", "--temperature", "0.5",
                                     "--episodes", "128",
                                     "--set", "rl.num_envs=64",
                                     "--set", "rl.entropy_floor=1.0",
                                     "--set", f"train.seed={s}",
                                     "--set",
                                     f"train.checkpoint_dir={OUT}/ckpt_c5f_s{s}"]),
    )],
    # ================= end r5 arms =================
    # c5 at the r2-bar budget (150 updates), both eval modes recorded in
    # ONE artifact (VERDICT r2 item 4 — the r2 json only held the 60-update
    # run and an rc-1 eval).
    ("c5", ["train", "--config", "c5",
            "--set", "train.steps=150", "--set", "train.log_every=10",
            "--set", "rl.num_envs=64",
            "--set", f"train.checkpoint_dir={OUT}/ckpt_c5",
            "--set", "train.checkpoint_every=150"]),
    ("c5_eval_sampled", ["eval-policy", "--config", "c5", "--sample",
                         "--episodes", "256",
                         "--set", "rl.num_envs=64",
                         "--set", f"train.checkpoint_dir={OUT}/ckpt_c5"]),
    ("c5_eval_greedy", ["eval-policy", "--config", "c5", "--episodes", "256",
                        "--set", "rl.num_envs=64",
                        "--set", f"train.checkpoint_dir={OUT}/ckpt_c5"]),
    # The PPO deployment-EMA bar (rl.ema_tau=0.02 in the c5 preset —
    # passive Polyak average of the policy, one lerp per update; mirrors
    # the c4 EMA deployment story).
    ("c5_eval_ema", ["eval-policy", "--config", "c5", "--episodes", "256",
                     "--use-ema",
                     "--set", "rl.num_envs=64",
                     "--set", f"train.checkpoint_dir={OUT}/ckpt_c5"]),
    # After c5 trains: eval-policy falls back to UNTRAINED params when the
    # checkpoint is missing, so sweeping before training silently records
    # a garbage curve.
    ("c5_snr_sweep", ["eval-policy", "--config", "c5", "--snr-sweep",
                      "--episodes", "256",
                      "--kinds", "awgn,rayleigh",
                      "--set", "rl.num_envs=64",
                      "--set", f"train.checkpoint_dir={OUT}/ckpt_c5",
                      "--out", f"{OUT}/c5_policy_curves.json"]),
    # Second seed for the per-seed c5 gate (preset lr is now 3e-4 from
    # the r3 lr study, results_r3/ppo_recipe.json; selection was
    # min-across-seeds per the collapse hunt's lesson).
    ("c5_s1", ["train", "--config", "c5",
               "--set", "train.steps=150", "--set", "train.log_every=10",
               "--set", "rl.num_envs=64",
               "--set", "train.seed=1",
               "--set", f"train.checkpoint_dir={OUT}/ckpt_c5_s1",
               "--set", "train.checkpoint_every=150"]),
    ("c5_s1_eval_sampled", ["eval-policy", "--config", "c5", "--sample",
                            "--episodes", "256",
                            "--set", "rl.num_envs=64",
                            "--set", "train.seed=1",
                            "--set",
                            f"train.checkpoint_dir={OUT}/ckpt_c5_s1"]),
    ("c5_s1_eval_ema", ["eval-policy", "--config", "c5",
                        "--episodes", "256", "--use-ema",
                        "--set", "rl.num_envs=64",
                        "--set", "train.seed=1",
                        "--set",
                        f"train.checkpoint_dir={OUT}/ckpt_c5_s1"]),
    # r4 (VERDICT r3 item 8): seeds 2-3 so the c5 deployment-mode
    # recommendation ("deploy sampled") rests on 6 effective seeds, not 4.
    ("c5_s2", ["train", "--config", "c5",
               "--set", "train.steps=150", "--set", "train.log_every=10",
               "--set", "rl.num_envs=64",
               "--set", "train.seed=2",
               "--set", f"train.checkpoint_dir={OUT}/ckpt_c5_s2",
               "--set", "train.checkpoint_every=150"]),
    ("c5_s2_eval_sampled", ["eval-policy", "--config", "c5", "--sample",
                            "--episodes", "256",
                            "--set", "rl.num_envs=64",
                            "--set", "train.seed=2",
                            "--set",
                            f"train.checkpoint_dir={OUT}/ckpt_c5_s2"]),
    ("c5_s2_eval_ema", ["eval-policy", "--config", "c5",
                        "--episodes", "256", "--use-ema",
                        "--set", "rl.num_envs=64",
                        "--set", "train.seed=2",
                        "--set",
                        f"train.checkpoint_dir={OUT}/ckpt_c5_s2"]),
    ("c5_s3", ["train", "--config", "c5",
               "--set", "train.steps=150", "--set", "train.log_every=10",
               "--set", "rl.num_envs=64",
               "--set", "train.seed=3",
               "--set", f"train.checkpoint_dir={OUT}/ckpt_c5_s3",
               "--set", "train.checkpoint_every=150"]),
    ("c5_s3_eval_sampled", ["eval-policy", "--config", "c5", "--sample",
                            "--episodes", "256",
                            "--set", "rl.num_envs=64",
                            "--set", "train.seed=3",
                            "--set",
                            f"train.checkpoint_dir={OUT}/ckpt_c5_s3"]),
    ("c5_s3_eval_ema", ["eval-policy", "--config", "c5",
                        "--episodes", "256", "--use-ema",
                        "--set", "rl.num_envs=64",
                        "--set", "train.seed=3",
                        "--set",
                        f"train.checkpoint_dir={OUT}/ckpt_c5_s3"]),
    # Entropy-anneal experiment arm (r2 memory lead): 0.01 -> 0.001 over
    # the run; expected to sharpen the policy for greedy deployment.
    ("c5_anneal", ["train", "--config", "c5",
                   "--set", "train.steps=150", "--set", "train.log_every=10",
                   "--set", "rl.num_envs=64",
                   "--set", "rl.entropy_coef_final=0.001",
                   "--set", f"train.checkpoint_dir={OUT}/ckpt_c5a",
                   "--set", "train.checkpoint_every=150"]),
    ("c5_anneal_eval_greedy", ["eval-policy", "--config", "c5",
                               "--episodes", "256",
                               "--set", "rl.num_envs=64",
                               "--set",
                               f"train.checkpoint_dir={OUT}/ckpt_c5a"]),
    ("c5_anneal_eval_sampled", ["eval-policy", "--config", "c5", "--sample",
                                "--episodes", "256",
                                "--set", "rl.num_envs=64",
                                "--set",
                                f"train.checkpoint_dir={OUT}/ckpt_c5a"]),
]


def main() -> None:
    import os

    os.makedirs(OUT, exist_ok=True)
    # Optional arm filter: `run_baselines.py OUT arm1 arm2 ...` runs only
    # the named arms and MERGES into an existing baselines.json (so
    # supplementary arms extend the artifact instead of clobbering it).
    only = set(sys.argv[2:])
    results = {}
    if only and os.path.exists(f"{OUT}/baselines.json"):
        results = json.load(open(f"{OUT}/baselines.json"))
    unknown = only - {name for name, _ in RUNS} - {"bench"}
    if unknown:
        raise SystemExit(f"unknown arm(s): {sorted(unknown)}; "
                         f"known: {[n for n, _ in RUNS] + ['bench']}")
    for name, args in RUNS:
        if only and name not in only:
            continue
        print(f"=== {name} ===", flush=True)
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, "-m", "multimodal_sc_tpu.cli", *args],
            capture_output=True, text=True)
        retried = False
        if proc.returncode != 0 and "FAILED_PRECONDITION" in proc.stderr:
            # The axon tunnel intermittently throws 'TPU backend error
            # (FailedPrecondition)' mid-run (~2/11 long runs, r2); one
            # retry has always succeeded.
            print(f"=== {name}: transient TPU FailedPrecondition, "
                  "retrying once ===", flush=True)
            print("\n".join(proc.stderr.splitlines()[-5:]), flush=True)
            retried = True
            t0 = time.time()   # wall_s = the successful attempt only
            proc = subprocess.run(
                [sys.executable, "-m", "multimodal_sc_tpu.cli", *args],
                capture_output=True, text=True)
        wall = time.time() - t0
        out = proc.stdout.strip().splitlines()
        last_json = None
        for line in reversed(out):
            try:
                last_json = json.loads(line)
                break
            except (json.JSONDecodeError, ValueError):
                continue
        results[name] = {
            "args": args, "wall_s": round(wall, 1),
            "returncode": proc.returncode, "final": last_json,
            "stdout_tail": out[-8:],
        }
        if retried:
            results[name]["retried_transient_tpu_error"] = True
        if proc.returncode != 0:
            results[name]["stderr_tail"] = proc.stderr.splitlines()[-15:]
        print(json.dumps(results[name], indent=2), flush=True)
        with open(f"{OUT}/baselines.json", "w") as f:
            json.dump(results, f, indent=2)

    if not only or "bench" in only:
        t0 = time.time()
        proc = subprocess.run([sys.executable, "bench.py"],
                              capture_output=True, text=True)
        results["bench"] = {
            "wall_s": round(time.time() - t0, 1),
            "line": proc.stdout.strip().splitlines()[-1:],
            "returncode": proc.returncode,
        }
        with open(f"{OUT}/baselines.json", "w") as f:
            json.dump(results, f, indent=2)
        print(json.dumps(results["bench"], indent=2))


if __name__ == "__main__":
    main()
