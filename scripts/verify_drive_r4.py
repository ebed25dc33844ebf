"""r4 verify drive on the real TPU: runtime fog scalar, V2X offset arg,
VQ-digital RL branch, and a quick c1 sanity. Tiny budgets — this checks
the graphs compile+run end-to-end, not the bars."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multimodal_sc_tpu.runtime.cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402

import multimodal_sc_tpu as msc  # noqa: E402

print("devices:", jax.devices(), flush=True)
t0 = time.time()

# --- 1. tiny c4 DQN train, fog + V2X on (runtime-fog graph + v2x branch).
from multimodal_sc_tpu.train import dqn as dqn_train  # noqa: E402

cfg = msc.get_preset("c4").override_str([
    "env.fog_range=20", "env.v2x_rays=32",
    "train.steps=60", "train.log_every=30", "train.iters_per_dispatch=30",
    "rl.num_envs=32",
]).validate()
state, last = dqn_train.run(cfg)
print("c4 fog+v2x train:", json.dumps({k: float(v) for k, v in last.items()}),
      flush=True)

# --- 2. fog-off run reuses the SAME compiled graph (runtime scalar): the
# second run's first_dispatch_s should be seconds (persistent cache hit),
# not minutes.
cfg0 = msc.get_preset("c4").override_str([
    "env.v2x_rays=32",
    "train.steps=60", "train.log_every=30", "train.iters_per_dispatch=30",
    "rl.num_envs=32",
]).validate()
state0, last0 = dqn_train.run(cfg0)
print("c4 clear+v2x train (cache-hit check):",
      json.dumps({k: float(v) for k, v in last0.items()}), flush=True)

# --- 3. eval-policy path with runtime v2x offset: same params, offset -40
# vs 0 — different returns, one compile (in-process jit cache).
from multimodal_sc_tpu.evaluation import policy_eval  # noqa: E402

out_link = policy_eval.evaluate_dqn(cfg, state.params, jax.random.key(0),
                                    num_envs=32)
cfg_nolink = cfg.override_str(["channel.v2x_snr_offset_db=-40"])
out_nolink = policy_eval.evaluate_dqn(cfg_nolink, state.params,
                                      jax.random.key(0), num_envs=32)
print("eval link:", out_link, flush=True)
print("eval nolink:", out_nolink, flush=True)

# --- 4. tiny c4 VQ-digital DQN train (arch=vq on the RL path).
cfgv = msc.get_preset("c4").override_str([
    "camera.arch=vq",
    "train.steps=60", "train.log_every=30", "train.iters_per_dispatch=30",
    "rl.num_envs=32",
]).validate()
statev, lastv = dqn_train.run(cfgv)
print("c4 vq train:", json.dumps({k: float(v) for k, v in lastv.items()}),
      flush=True)

# FEC deploy on the same params (parameter-transparent).
cfgv_fec = cfgv.override_str(["channel.fec=hamming74_soft"]).validate()
out_fec = policy_eval.evaluate_dqn(cfgv_fec, statev.params,
                                   jax.random.key(0), num_envs=32)
print("vq fec eval:", out_fec, flush=True)

# --- 5. c1 quick jscc sanity (PSNR climbing).
from multimodal_sc_tpu.train import jscc  # noqa: E402

cfg1 = msc.get_preset("c1").override_str(
    ["train.steps=300", "train.batch_size=32", "train.log_every=100"])
_, last1 = jscc.run(cfg1)
print("c1 300 steps:", json.dumps({k: float(v) for k, v in last1.items()}),
      flush=True)
assert last1["psnr"] > 19.0, last1

# --- 6. error-path probes.
try:
    msc.get_preset("c4").override_str(["camera.adaptive_rate=true"]).validate()
    raise SystemExit("validate() failed to reject adaptive_rate on RL")
except ValueError as e:
    print("probe ok:", str(e)[:60], flush=True)

print(f"ALL VERIFY DRIVES PASSED in {time.time() - t0:.0f}s", flush=True)
