"""Policy return-vs-SNR sweep (evaluation/policy_sweep.py): the sweep
honors the requested channel kind/SNR, pairs episodes across points, and
covers both RL heads."""

import jax
import numpy as np
import pytest

from multimodal_sc_tpu.config.presets import get_preset
from multimodal_sc_tpu.evaluation import policy_sweep

TINY = [
    "camera.features=8,16,16,16", "camera.c_sym=2",
    "camera.image_hw=16,16", "env.image_hw=16,16",
    "lidar.pillar_dim=16", "lidar.c_sym=2", "lidar.bev_hw=8,8",
    "fusion.dim=32", "fusion.depth=1", "fusion.heads=2",
    "fusion.state_dim=32",
    "env.num_npcs=2", "env.lidar_rays=16", "env.max_steps=8",
]


def _params(cfg, key):
    from multimodal_sc_tpu.rl import dqn as dqn_lib
    from multimodal_sc_tpu.rl import ppo as ppo_lib

    if cfg.rl.algo == "ppo":
        return ppo_lib.init_params(cfg, key)
    return dqn_lib.init_params(cfg, key)


@pytest.mark.parametrize(
    "preset",
    ["c4", pytest.param("c5", marks=pytest.mark.slow)])
@pytest.mark.slow
def test_sweep_shapes_and_pairing(key, preset):
    cfg = get_preset(preset).override_str(TINY)
    params = _params(cfg, key)
    curves = policy_sweep.policy_snr_sweep(
        cfg, params, key, snrs=(-10.0, 20.0), kinds=("ideal", "awgn"),
        num_envs=4)
    assert set(curves) == {"ideal", "awgn"}
    for rows in curves.values():
        assert [r["snr_db"] for r in rows] == [-10.0, 20.0]
        for r in rows:
            assert np.isfinite(r["episode_return_mean"])
            assert np.isfinite(r["reward_per_step"])
    # The ideal channel ignores SNR: with paired env/action keys the two
    # sweep points must produce IDENTICAL rollouts — this catches both a
    # broken snr plumb-through (ideal rows differing) and broken pairing.
    i0, i1 = curves["ideal"]
    assert i0["episode_return_mean"] == i1["episode_return_mean"]
    assert i0["reward_per_step"] == i1["reward_per_step"]
    # format_table renders every kind column.
    table = policy_sweep.format_table(curves)
    assert "ideal" in table and "awgn" in table and "-10.0" in table


def test_cli_eval_policy_snr_sweep(tmp_path, capsys):
    """`eval-policy --snr-sweep` wiring: table printed, curves JSON saved."""
    import json

    from multimodal_sc_tpu import cli

    out = str(tmp_path / "curves.json")
    args = []
    for o in TINY:
        args += ["--set", o]
    # No checkpoint here: a missing checkpoint is a HARD error by default
    # (r3 — the silent untrained fallback recorded garbage 256-episode
    # curves in the baselines artifact); this wiring test opts out.
    with pytest.raises(SystemExit, match="no checkpoint"):
        cli.main(["eval-policy", "--config", "c4", "--snr-sweep",
                  "--episodes", "4", "--kinds", "ideal",
                  "--snrs", "0,10", "--out", out, *args])
    rc = cli.main(["eval-policy", "--config", "c4", "--snr-sweep",
                   "--allow-untrained",
                   "--episodes", "4", "--kinds", "ideal",
                   "--snrs", "0,10", "--out", out, *args])
    assert rc == 0
    assert "episode return" in capsys.readouterr().out
    curves = json.load(open(out))
    assert [r["snr_db"] for r in curves["ideal"]] == [0.0, 10.0]


@pytest.mark.slow
def test_awgn_snr_actually_reaches_the_channel(key):
    """At -30 dB the channel output is noise-dominated; the greedy actions
    of a fixed net must differ from the +30 dB actions for at least one
    env step (if they never differ, snr_db is not reaching channel_op)."""
    cfg = get_preset("c4").override_str(TINY)
    params = _params(cfg, key)
    from multimodal_sc_tpu.envs import driving
    from multimodal_sc_tpu.rl.perception import QNetwork

    states = driving.reset_batch(cfg.env, key, 8)
    img, pts, mask = driving.observe_batch(cfg.env, states)
    net = QNetwork(cfg.override_str(["channel.kind=awgn"]))
    q_lo = net.apply({"params": params}, img, pts, mask, key,
                     snr_db=jax.numpy.full((8,), -30.0))
    q_hi = net.apply({"params": params}, img, pts, mask, key,
                     snr_db=jax.numpy.full((8,), 30.0))
    assert not np.allclose(np.asarray(q_lo), np.asarray(q_hi), atol=1e-3)
