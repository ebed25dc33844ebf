"""CLI: ``python -m multimodal_sc_tpu.cli train --config c4 --set k=v``.

Spec: SURVEY.md §5.6 — argparse + dataclasses only, no external deps.
"""

from __future__ import annotations

import argparse
import json
import sys

import jax


def _policy_sweep_and_print(cfg, params, key, args, epsilon=0.0,
                            sample=False) -> int:
    """Shared `eval-policy --snr-sweep` body: return-vs-SNR curves for the
    restored policy (evaluation/policy_sweep.py)."""
    from multimodal_sc_tpu.evaluation import policy_sweep

    snrs = (policy_sweep.DEFAULT_SNRS if args.snrs is None else
            tuple(float(s) for s in args.snrs.split(",")))
    kinds = tuple(k.strip() for k in args.kinds.split(","))
    curves = policy_sweep.policy_snr_sweep(
        cfg, params, key, snrs=snrs, kinds=kinds, num_envs=args.episodes,
        epsilon=epsilon, sample=sample)
    print("episode return (mean):")
    print(policy_sweep.format_table(curves))
    if args.out:
        policy_sweep.save_curves(curves, args.out)
    return 0


def _restore_params_latest(cfg, fresh_params, field="params"):
    """Params-only PARTIAL restore of the newest checkpoint: evaluation and
    export never need the replay buffer / env states, and reading just one
    param subtree works for BOTH unsharded DQNState and ShardedDQNState
    checkpoints (train/dqn.run auto-shards on multi-device hosts) without
    ever materializing the multi-GB training arrays; shapes are validated
    against the fresh params tree (ADVICE r1 + r2 reviews). Returns None
    when no checkpoint exists (callers pick their own fallback/warning)."""
    if not cfg.train.checkpoint_dir:
        return None
    from multimodal_sc_tpu.io.checkpoint import CheckpointManager

    mgr = CheckpointManager(cfg.train.checkpoint_dir)
    restored = mgr.restore_params_latest(fresh_params, field=field)
    mgr.close()
    return restored


def _untrained_fallback(cfg, fresh, allow_untrained):
    """No checkpoint found at eval/export time: hard error by default.

    The silent fallback burned a whole eval batch in r3 — deleted
    checkpoint dirs made 256-episode evals + a 21-point policy sweep
    quietly measure UNTRAINED params with rc 0 (flat 3.89 curves in
    results_r3/baselines.json before the re-run). Opt back into the old
    behavior with --allow-untrained (useful for pipeline smoke tests).
    """
    if allow_untrained:
        print("warning: no checkpoint found "
              f"(train.checkpoint_dir={cfg.train.checkpoint_dir!r}) — "
              "using UNTRAINED init params (--allow-untrained)",
              file=sys.stderr)
        return fresh
    raise SystemExit(
        "error: no checkpoint found at "
        f"train.checkpoint_dir={cfg.train.checkpoint_dir!r}; evaluating "
        "untrained params is almost never intended — train first, fix "
        "the path, or pass --allow-untrained to evaluate a fresh init")


def _select_dqn_deploy_params(cfg, key, use_target=False, use_ema=False,
                              use_best=False, allow_untrained=False):
    """Resolve which tree of a DQN checkpoint deploys (shared by
    `eval-policy` and `export`): the online params by default,
    `--use-target` the TD target network, `--use-ema` the Polyak-averaged
    deployment policy (rl.ema_tau — the measured-best cold-c4 deployment,
    results_r3/collapse_investigation.md), `--use-best` the best-measured-
    return snapshot (rl.eval_snapshot_every). A missing checkpoint is a
    hard error unless allow_untrained (_untrained_fallback)."""
    from multimodal_sc_tpu.rl import dqn as dqn_lib

    field = "params"
    if use_target:
        field = "target_params"
    if use_ema:
        if use_target:
            print("--use-ema and --use-target are exclusive; "
                  "using --use-ema", file=sys.stderr)
        if cfg.rl.ema_tau <= 0:
            print("--use-ema: rl.ema_tau == 0 in this config — the "
                  "EMA was never updated during training and equals "
                  "the init params", file=sys.stderr)
        field = "ema_params"
    if use_best:
        from multimodal_sc_tpu.io.checkpoint import CheckpointManager

        best = (CheckpointManager(cfg.train.checkpoint_dir)
                .restore_best_policy()
                if cfg.train.checkpoint_dir else None)
        if best is None:
            print("--use-best: no <checkpoint_dir>/best snapshot "
                  "(train with rl.eval_snapshot_every > 0); "
                  "falling back to the latest checkpoint",
                  file=sys.stderr)
        else:
            print(f"best snapshot: iter {int(best['step'])}, "
                  f"train-time eval {float(best['eval_return']):.2f}",
                  file=sys.stderr)
            if field not in best:
                print(f"--use-best: snapshot predates {field}; "
                      "using its online params", file=sys.stderr)
            return best.get(field, best["params"])
    fresh = dqn_lib.init_params(cfg, key)
    restored = _restore_params_latest(cfg, fresh, field=field)
    if restored is None:
        return _untrained_fallback(cfg, fresh, allow_untrained)
    return restored


def _select_ppo_deploy_params(cfg, key, use_target=False, use_ema=False,
                              use_best=False, allow_untrained=False):
    """Resolve which tree of a PPO checkpoint deploys (shared by
    `eval-policy` and `export`): the online params by default, `--use-ema`
    the Polyak-averaged deployment policy (rl.ema_tau, one lerp per
    update). --use-target/--use-best are DQN-only (PPO keeps no target
    net and no best-snapshot driver hook) and warn+ignore. A missing
    checkpoint is a hard error unless allow_untrained."""
    from multimodal_sc_tpu.rl import ppo as ppo_lib

    if use_target:
        print("--use-target applies to DQN policies only (PPO keeps no "
              "target network); ignoring", file=sys.stderr)
    if use_best:
        print("--use-best applies to DQN policies only (best-snapshot "
              "selection is a DQN-driver feature); ignoring",
              file=sys.stderr)
    field = "params"
    if use_ema:
        if cfg.rl.ema_tau <= 0:
            print("--use-ema: rl.ema_tau == 0 in this config — the "
                  "EMA was never updated during training and equals "
                  "the init params", file=sys.stderr)
        field = "ema_params"
    fresh = ppo_lib.init_params(cfg, key)
    restored = _restore_params_latest(cfg, fresh, field=field)
    if restored is None:
        return _untrained_fallback(cfg, fresh, allow_untrained)
    return restored


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="multimodal_sc_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("train", help="run a training config")
    t.add_argument("--config", required=True,
                   help="preset name (c1..c5 or full names)")
    t.add_argument("--set", action="append", default=[], dest="overrides",
                   help="dotted override, e.g. train.steps=100")
    t.add_argument("--metrics", default=None, help="JSONL metrics path")
    t.add_argument("--init-from", default=None, dest="init_from",
                   help="JSCC checkpoint dir to warm-start the RL "
                        "perception trunk from (dqn/ppo tasks)")

    e = sub.add_parser("eval", help="SNR-sweep evaluation of a jscc config")
    e.add_argument("--config", required=True)
    e.add_argument("--set", action="append", default=[], dest="overrides")
    e.add_argument("--out", default=None, help="curve JSON output path")
    e.add_argument("--rate-sweep", action="store_true", dest="rate_sweep",
                   help="PSNR-vs-bandwidth curve instead of PSNR-vs-SNR "
                        "(adaptive_rate camera configs only; evaluated at "
                        "channel.snr_db over the first --kinds entry)")
    e.add_argument("--allow-untrained", action="store_true",
                   dest="allow_untrained",
                   help="permit sweeping UNTRAINED init params when no "
                        "checkpoint exists (default: hard error — the "
                        "silent fallback recorded a flat-16.76-dB HARQ "
                        "curve from a deleted checkpoint dir in r3)")
    e.add_argument("--harq-sweep", action="store_true", dest="harq_sweep",
                   help="Type-I HARQ (CRC-8 + chase combining, "
                        "channel/harq.py) deployment curve for a VQ codec: "
                        "PSNR + adaptive bandwidth vs SNR on the same "
                        "checkpoint")
    e.add_argument("--entropy-sweep", action="store_true",
                   dest="entropy_sweep",
                   help="entropy-aware index-transport study on the "
                        "digital BEV codec (lidar.arch=vq): fixed "
                        "8-bit/token vs trained-distribution Huffman VLC "
                        "vs top-16 re-alphabet, same checkpoint, exact "
                        "symbol accounting (r5)")
    e.add_argument("--keep-sweep", action="store_true", dest="keep_sweep",
                   help="PSNR-vs-kept-token-fraction curve for a token-"
                        "pruned VQ codec (camera.vq_prune configs only; "
                        "one curve per selection rule, damage vs random, "
                        "at channel.kind @ channel.snr_db)")
    e.add_argument("--kinds", default="awgn,rayleigh",
                   help="comma list of channel kinds to sweep "
                        "(awgn,rayleigh,rician,ideal)")

    s = sub.add_parser("show", help="print a resolved config as JSON")
    s.add_argument("--config", required=True)
    s.add_argument("--set", action="append", default=[], dest="overrides")

    pe = sub.add_parser("eval-policy",
                        help="mean episode reward of a DQN/PPO policy")
    pe.add_argument("--config", required=True)
    pe.add_argument("--set", action="append", default=[], dest="overrides")
    pe.add_argument("--episodes", type=int, default=32)
    pe.add_argument("--seed", type=int, default=0)
    pe.add_argument("--temperature", type=float, default=1.0,
                    help="PPO sampled-mode logit temperature (deployment "
                         "sharpening study, r5): 1.0 = trained policy, "
                         "-> 0 approaches argmax")
    pe.add_argument("--sample", action="store_true",
                    help="PPO: sample the policy instead of argmax (the "
                         "training-time behavior; argmax of a high-entropy "
                         "policy can be degenerate)")
    pe.add_argument("--eps", type=float, default=0.0,
                    help="DQN: eval-time epsilon (standard Atari protocol "
                         "uses 0.05; 0 = pure argmax, which can be "
                         "degenerate for a cold-trained Q-function)")
    pe.add_argument("--use-best", action="store_true",
                    help="DQN: evaluate the best-snapshot policy selected "
                         "during training (rl.eval_snapshot_every > 0, "
                         "saved under <checkpoint_dir>/best) instead of "
                         "the latest checkpoint — deploy on measured "
                         "return, not recency")
    pe.add_argument("--use-target", action="store_true",
                    help="DQN: evaluate the TARGET network instead of the "
                         "online params — under soft updates "
                         "(rl.target_tau) the target is the Polyak average "
                         "of the online params, i.e. the smoothed "
                         "deployment policy (the oscillation antidote, "
                         "results_r3/collapse_investigation.md)")
    pe.add_argument("--use-ema", action="store_true",
                    help="DQN/PPO: evaluate the Polyak-averaged ONLINE params "
                         "(rl.ema_tau > 0) — the deployment policy; the "
                         "param-trajectory mean out-evaled every endpoint "
                         "snapshot in the r3 recipe study "
                         "(results_r3/collapse_investigation.md)")
    pe.add_argument("--allow-untrained", action="store_true",
                    dest="allow_untrained",
                    help="permit evaluating UNTRAINED init params when no "
                         "checkpoint exists (default: hard error — the "
                         "silent fallback records garbage curves)")
    pe.add_argument("--snr-sweep", action="store_true", dest="snr_sweep",
                    help="sweep episode return across deployed channel "
                         "SNR x kind (the closed-loop analogue of `eval`'s "
                         "reconstruction sweep) instead of a single eval")
    pe.add_argument("--kinds", default="awgn,rayleigh",
                    help="channel kinds for --snr-sweep "
                         "(awgn,rayleigh,rician,ideal)")
    pe.add_argument("--snrs", default=None,
                    help="comma list of SNR dB points for --snr-sweep "
                         "(default -5..25 step 5)")
    pe.add_argument("--out", default=None,
                    help="curve JSON output path for --snr-sweep")

    x = sub.add_parser(
        "export",
        help="serialize the trained codec/policy of a config as "
             "standalone StableHLO deployment artifacts (jax.export): "
             "encoder for the transmitter, decoder for the receiver, "
             "greedy policy for the agent")
    x.add_argument("--config", required=True)
    x.add_argument("--set", action="append", default=[], dest="overrides")
    x.add_argument("--out", required=True, help="artifact directory")
    x.add_argument("--batch", type=int, default=None,
                   help="fix the exported batch size (default: "
                        "batch-size-polymorphic)")
    x.add_argument("--use-target", action="store_true", dest="use_target",
                   help="DQN: export the target network (Polyak average "
                        "under rl.target_tau) instead of the online params")
    x.add_argument("--use-ema", action="store_true",
                   help="DQN/PPO: export the Polyak-averaged deployment "
                        "policy (rl.ema_tau — the measured-best cold-c4 "
                        "deployment, results_r3/collapse_investigation.md)")
    x.add_argument("--use-best", action="store_true", dest="use_best",
                   help="DQN: export the best-measured-return snapshot "
                        "(rl.eval_snapshot_every)")

    args = p.parse_args(argv)

    from multimodal_sc_tpu.runtime.cache import enable_compilation_cache

    enable_compilation_cache()

    from multimodal_sc_tpu.config.presets import get_preset

    cfg = get_preset(args.config).override_str(args.overrides)
    # Cross-field validation on the FINAL config (silently-ignored flag
    # combos are hard errors — VERDICT r3 item 6). `show` skips it so
    # inspecting an invalid combo is still possible.
    if args.cmd != "show":
        cfg.validate()

    if args.cmd == "show":
        print(cfg.to_json())
        return 0

    if args.cmd == "train":
        task = cfg.train.task
        if task == "jscc":
            from multimodal_sc_tpu.train import jscc

            _, last = jscc.run(cfg, metrics_path=args.metrics)
        elif task == "jscc_fusion":
            from multimodal_sc_tpu.train import fusion_jscc

            _, last = fusion_jscc.run(cfg, metrics_path=args.metrics)
        elif task == "dqn":
            from multimodal_sc_tpu.train import dqn

            _, last = dqn.run(cfg, metrics_path=args.metrics,
                              init_from=args.init_from)
        elif task == "ppo":
            from multimodal_sc_tpu.train import ppo

            _, last = ppo.run(cfg, metrics_path=args.metrics,
                              init_from=args.init_from)
        else:
            print(f"unknown task {task!r}", file=sys.stderr)
            return 2
        print(json.dumps({k: float(v) for k, v in last.items()}))
        return 0

    if args.cmd == "eval-policy":
        from multimodal_sc_tpu.evaluation import policy_eval

        key = jax.random.key(args.seed)

        if cfg.train.task == "dqn" or cfg.rl.algo == "dqn":
            if args.sample:
                print("--sample applies to PPO policies only; DQN eval is "
                      "always greedy (epsilon=0)", file=sys.stderr)
            params = _select_dqn_deploy_params(
                cfg, key, use_target=args.use_target, use_ema=args.use_ema,
                use_best=args.use_best,
                allow_untrained=getattr(args, "allow_untrained", False))
            if args.snr_sweep:
                return _policy_sweep_and_print(cfg, params, key, args,
                                               epsilon=args.eps)
            out = policy_eval.evaluate_dqn(cfg, params, key,
                                           num_envs=args.episodes,
                                           epsilon=args.eps)
        else:
            params = _select_ppo_deploy_params(
                cfg, key, use_target=args.use_target, use_ema=args.use_ema,
                use_best=args.use_best,
                allow_untrained=getattr(args, "allow_untrained", False))
            if args.snr_sweep:
                return _policy_sweep_and_print(cfg, params, key, args,
                                               sample=args.sample)
            out = policy_eval.evaluate_ppo(
                cfg, params, key, num_envs=args.episodes,
                greedy=not args.sample,
                temperature=getattr(args, "temperature", 1.0))
        print(json.dumps(out))
        return 0

    if args.cmd == "export":
        from multimodal_sc_tpu.io import export as export_lib

        key = jax.random.key(cfg.train.seed)

        def _params_only(fresh):
            restored = _restore_params_latest(cfg, fresh)
            if restored is None:
                print("warning: no checkpoint found (train.checkpoint_dir="
                      f"{cfg.train.checkpoint_dir!r}) — exporting UNTRAINED "
                      "params", file=sys.stderr)
                return fresh
            return restored

        task = cfg.train.task
        if (args.use_target or args.use_best) and task != "dqn":
            print("--use-target/--use-best apply to DQN exports only; "
                  "ignoring", file=sys.stderr)
        if args.use_ema and task not in ("dqn", "ppo"):
            print("--use-ema applies to policy (DQN/PPO) exports only; "
                  "ignoring", file=sys.stderr)
        if task == "jscc":
            from multimodal_sc_tpu.train import jscc

            params = _params_only(jscc.create_train_state(cfg, key).params)
            parts = export_lib.export_camera_codec(cfg, params,
                                                   batch=args.batch)
        elif task == "jscc_fusion":
            from multimodal_sc_tpu.train import fusion_jscc

            params = _params_only(
                fusion_jscc.create_train_state(cfg, key).params)
            parts = {
                # The fusion pipeline's own camera builder: param trees
                # match the checkpoint (see the eval verb's builder note).
                **export_lib.export_camera_codec(
                    cfg, params["camera"], batch=args.batch,
                    model_builder=fusion_jscc.build_camera_codec),
                **export_lib.export_lidar_codec(cfg, params["lidar"],
                                                batch=args.batch),
            }
        elif task == "dqn":
            params = _select_dqn_deploy_params(
                cfg, key, use_target=args.use_target, use_ema=args.use_ema,
                use_best=args.use_best,
                allow_untrained=getattr(args, "allow_untrained", False))
            parts = {"policy": export_lib.export_policy(
                cfg, params, batch=args.batch)}
        elif task == "ppo":
            params = _select_ppo_deploy_params(cfg, key,
                                               use_ema=args.use_ema)
            parts = {"policy": export_lib.export_policy(
                cfg, params, batch=args.batch)}
        else:
            print(f"unknown task {task!r}", file=sys.stderr)
            return 2
        export_lib.save_artifact(args.out, parts, cfg)
        print(json.dumps({"out": args.out, "parts": sorted(parts),
                          "bytes": {k: len(v) for k, v in parts.items()}}))
        return 0

    if args.cmd == "eval":
        from multimodal_sc_tpu.channel import channel_kwargs
        from multimodal_sc_tpu.envs.datasets import ImageDataset
        from multimodal_sc_tpu.evaluation import snr_sweep
        from multimodal_sc_tpu.train import jscc

        key = jax.random.key(cfg.train.seed)

        if cfg.train.task == "jscc_fusion":
            # Late-fusion (c3) sweep: camera PSNR + semantic-BEV mIoU
            # curves from the two codec sub-trees of the fusion checkpoint.
            from multimodal_sc_tpu.codec.lidar_bev import (
                occupancy_target,
                semantic_bev_target,
            )
            from multimodal_sc_tpu.envs.datasets import (
                synthetic_pointcloud_batch,
            )
            from multimodal_sc_tpu.train import fusion_jscc

            state = fusion_jscc.create_train_state(cfg, key)
            if cfg.train.checkpoint_dir:
                from multimodal_sc_tpu.io.checkpoint import CheckpointManager

                mgr = CheckpointManager(cfg.train.checkpoint_dir)
                restored = mgr.restore_latest(state)
                if restored is not None:
                    state = restored
                    print(f"restored step {mgr.latest_step()} from "
                          f"{cfg.train.checkpoint_dir}", file=sys.stderr)
                else:
                    state = state.replace(params=_untrained_fallback(
                        cfg, state.params,
                        getattr(args, "allow_untrained", False)))
            # The fusion pipeline's own builders: param trees are
            # guaranteed to match the checkpoint (the plain-jscc builder
            # would add a seg head for cnn+seg_classes configs).
            cam_model = fusion_jscc.build_camera_codec(cfg)
            lid = cfg.lidar
            lid_model = fusion_jscc.build_lidar_codec(cfg)
            data = ImageDataset(cfg.train.dataset, cfg.train.batch_size,
                                seed=cfg.train.seed + 999,
                                data_root=cfg.train.data_root)
            images = jax.numpy.asarray(next(data))
            pts, mask, cls = synthetic_pointcloud_batch(
                jax.random.fold_in(key, 0xE7A1), cfg.train.batch_size,
                lid.max_points, lid.x_range, lid.y_range, with_classes=True)
            if lid.seg_classes > 1:
                target = semantic_bev_target(pts, mask, cls, lid.bev_hw,
                                             lid.x_range, lid.y_range,
                                             num_classes=lid.seg_classes)
            else:
                target = occupancy_target(pts, mask, lid.bev_hw,
                                          lid.x_range, lid.y_range)
            kinds = tuple(k.strip() for k in args.kinds.split(","))
            if getattr(args, "keep_sweep", False):
                if not cfg.lidar.vq_prune:
                    print("--keep-sweep on the fusion task requires "
                          "lidar.vq_prune=true", file=sys.stderr)
                    return 2
                curves = snr_sweep.sweep_lidar_vq_keep(
                    cfg, state.params["lidar"], pts, mask, target,
                    jax.random.fold_in(key, 0x6EEB))
                for sel, rows in curves.items():
                    print(f"select={sel}:")
                    for row in rows:
                        print(json.dumps(row))
                if args.out:
                    snr_sweep.save_curves(curves, args.out)
                return 0
            if getattr(args, "entropy_sweep", False):
                if cfg.lidar.arch != "vq":
                    print("--entropy-sweep requires lidar.arch=vq",
                          file=sys.stderr)
                    return 2
                curves = snr_sweep.sweep_lidar_vq_entropy(
                    cfg, state.params["lidar"], pts, mask, target,
                    jax.random.fold_in(key, 0xE27), kinds=kinds)
                print(json.dumps(curves["calibration"]))
                for kind in kinds:
                    print(f"{kind}: mIoU full/vlc/fixed + syms:")
                    for row in curves[kind]:
                        print(json.dumps(row))
                if args.out:
                    snr_sweep.save_curves(curves, args.out)
                return 0
            cam_curves = snr_sweep.sweep_camera(
                cam_model, state.params["camera"], images, key,
                kinds=kinds,
                **channel_kwargs(cfg.channel))
            if cfg.lidar.arch == "vq":
                # Digital LiDAR codec: the QPSK link (+ optional FEC)
                # rides inside the model — its own sweep.
                lid_curves = snr_sweep.sweep_lidar_vq(
                    cfg, state.params["lidar"], pts, mask, target,
                    jax.random.fold_in(key, 0x11DA), kinds=kinds)
            else:
                lid_curves = snr_sweep.sweep_lidar(
                    lid_model, state.params["lidar"], pts, mask, target,
                    jax.random.fold_in(key, 0x11DA), kinds=kinds,
                    **channel_kwargs(cfg.channel))
            print("camera PSNR:")
            print(snr_sweep.format_table(cam_curves))
            print("camera SSIM:")
            print(snr_sweep.format_table(cam_curves, metric="ssim"))
            print("lidar BEV mIoU:")
            print(snr_sweep.format_table(lid_curves, metric="miou"))
            if cfg.lidar.arch == "vq":
                print("lidar index error rate:")
                print(snr_sweep.format_table(lid_curves,
                                             metric="index_err"))
            if args.out:
                snr_sweep.save_curves(
                    {"camera": cam_curves, "lidar": lid_curves}, args.out)
            return 0

        state = jscc.create_train_state(cfg, key)
        if cfg.train.checkpoint_dir:
            from multimodal_sc_tpu.io.checkpoint import CheckpointManager

            mgr = CheckpointManager(cfg.train.checkpoint_dir)
            restored = mgr.restore_latest(state)
            if restored is not None:
                state = restored
                print(f"restored step {mgr.latest_step()} from "
                      f"{cfg.train.checkpoint_dir}", file=sys.stderr)
            else:
                # Hard error like eval-policy/export: a deleted checkpoint
                # dir silently produced a flat untrained HARQ curve with
                # rc 0 in r3 (the exact failure eval-policy was already
                # guarded against).
                state = state.replace(params=_untrained_fallback(
                    cfg, state.params,
                    getattr(args, "allow_untrained", False)))
        model = jscc.build_model(cfg)
        with_seg = cfg.camera.seg_classes > 0 and cfg.camera.arch == "cnn"
        data = ImageDataset(cfg.train.dataset, cfg.train.batch_size,
                            seed=cfg.train.seed + 999, with_seg=with_seg,
                            data_root=cfg.train.data_root)
        if with_seg:
            images, seg = next(data)
            seg = jax.numpy.asarray(seg)
        else:
            images, seg = next(data), None
        if cfg.camera.arch == "vq":
            if getattr(args, "harq_sweep", False):
                curves = snr_sweep.sweep_camera_vq_harq(
                    cfg, state.params, jax.numpy.asarray(images), key,
                    kinds=tuple(k.strip() for k in args.kinds.split(",")))
                for kind, curve in curves.items():
                    print(f"{kind}: {'snr':>6} {'psnr':>8} {'idx_err':>9} "
                          f"{'sym/img':>9} {'rounds':>7} {'fail':>7}")
                    for p in curve:
                        print(f"      {p['snr_db']:>6.1f} {p['psnr']:>8.2f} "
                              f"{p['index_err']:>9.4f} "
                              f"{p['symbols_per_item']:>9.1f} "
                              f"{p['mean_rounds']:>7.2f} "
                              f"{p['residual_fail_rate']:>7.4f}")
                if args.out:
                    snr_sweep.save_curves(curves, args.out)
                return 0
            if getattr(args, "keep_sweep", False):
                if not cfg.camera.vq_prune:
                    print("--keep-sweep requires camera.vq_prune=true",
                          file=sys.stderr)
                    return 2
                curves = snr_sweep.sweep_camera_vq_keep(
                    cfg, state.params, jax.numpy.asarray(images), key)
                print(f"{'keep':>8} " + " ".join(
                    f"{s + '/psnr':>14} {s + '/idx_err':>14}"
                    for s in curves))
                for i, p in enumerate(next(iter(curves.values()))):
                    row = f"{p['keep']:>8.3f} " + " ".join(
                        f"{curves[s][i]['psnr']:>14.3f} "
                        f"{curves[s][i]['index_err']:>14.4f}"
                        for s in curves)
                    print(row)
                if args.out:
                    snr_sweep.save_curves(curves, args.out)
                return 0
            # Discrete-token codec: digital channel inside the model —
            # its own sweep (PSNR/SSIM + index error rate per kind).
            curves = snr_sweep.sweep_camera_vq(
                cfg, state.params, jax.numpy.asarray(images), key,
                kinds=tuple(k.strip() for k in args.kinds.split(",")))
            print(snr_sweep.format_table(curves))
            print(snr_sweep.format_table(curves, metric="index_err"))
            if args.out:
                snr_sweep.save_curves(curves, args.out)
            return 0
        if getattr(args, "rate_sweep", False):
            if not cfg.camera.adaptive_rate:
                print("--rate-sweep requires camera.adaptive_rate=true",
                      file=sys.stderr)
                return 2
            kind = args.kinds.split(",")[0].strip()
            curve = snr_sweep.sweep_camera_rate(
                model, state.params, jax.numpy.asarray(images), key,
                snr_db=cfg.channel.snr_db, kind=kind,
                **channel_kwargs(cfg.channel))
            print(f"{'rate':>8} {'psnr':>10} {'ssim':>10}   ({kind} @ "
                  f"{cfg.channel.snr_db} dB)")
            for p in curve:
                print(f"{p['rate']:>8.3f} {p['psnr']:>10.3f} "
                      f"{p['ssim']:>10.3f}")
            if args.out:
                snr_sweep.save_curves({kind: curve}, args.out)
            return 0
        curves = snr_sweep.sweep_camera(
            model, state.params, jax.numpy.asarray(images), key, seg=seg,
            kinds=tuple(k.strip() for k in args.kinds.split(",")),
            **channel_kwargs(cfg.channel))
        print(snr_sweep.format_table(curves))
        print(snr_sweep.format_table(curves, metric="ssim"))
        if with_seg:
            print(snr_sweep.format_table(curves, metric="miou"))
        if args.out:
            snr_sweep.save_curves(curves, args.out)
        return 0

    return 2


if __name__ == "__main__":
    raise SystemExit(main())
