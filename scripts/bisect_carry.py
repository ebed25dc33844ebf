"""Stage-2 bisect of the cold-c4 collapse: WHY does carrying the rendered
observation collapse training?

Stage 1 (scripts/bisect_c4.py, results_r3/bisect_c4.json) split cleanly on
``carry_obs``: arms with the carried observation (A kernel-off, D full-r3)
collapse to greedy ~3.9 / constant argmax, arms without it (B, C) eval
30-41 — kernel and chunking exonerated. Statically the carried obs should
equal a fresh render up to act-time uint8 quantization (1/255, and only
when rl.replay_quantize). This stage separates the two remaining suspects:

  I probe        : production r3 config; every K dispatches, jit-compare
                   the carried obs against a fresh observe_batch of the
                   same env states (max |diff| per field) and the greedy
                   argmax agreement between the two — direct falsification
                   of "carried == fresh".
  F carry+nq     : rl.replay_quantize=false, carry on. No quantization
                   anywhere -> act path mathematically identical to
                   no-carry. Collapse here = real carry bug.
  G nocarry+nq   : rl.replay_quantize=false, carry off. Control for F.
  H f32carry+q   : replay_quantize on (production bytes win kept), but the
                   f32 render is carried and quantization happens only at
                   store time (make_iteration(carry_f32=True)) — the
                   candidate production fix if F is healthy and the probe
                   shows act-time quantization is the only delta.

Usage: python scripts/bisect_carry.py [outfile.json]   (TPU, ~4 min/arm)
"""

from __future__ import annotations

import json
import sys
import time
import traceback

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from multimodal_sc_tpu.runtime.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import multimodal_sc_tpu as msc  # noqa: E402
from multimodal_sc_tpu.envs import driving  # noqa: E402
from multimodal_sc_tpu.evaluation import policy_eval  # noqa: E402
from multimodal_sc_tpu.rl import dqn as dqn_lib  # noqa: E402

ITERS = 5000
CHUNK = 50


def make_probe(cfg):
    @jax.jit
    def probe(state):
        img_f, pts_f, mask_f = driving.observe_batch(cfg.env, state.env_states)
        img_c = dqn_lib.dequantize_image(state.obs_image)
        f32 = lambda x: x.astype(jnp.float32)  # noqa: E731
        k = jax.random.key(7)
        a_c = dqn_lib.act(cfg, state.params, img_c, state.obs_points,
                          state.obs_mask, k, 0.0)
        a_f = dqn_lib.act(cfg, state.params, img_f, pts_f, mask_f, k, 0.0)
        return {
            "d_img": jnp.max(jnp.abs(img_c - img_f)),
            "d_img_frac_gt_1lsb": jnp.mean(
                (jnp.abs(img_c - img_f) > (1.5 / 255.0)).astype(jnp.float32)),
            "d_pts": jnp.max(jnp.abs(f32(state.obs_points) - f32(pts_f))),
            "d_mask": jnp.max(jnp.abs(f32(state.obs_mask) - f32(mask_f))),
            "argmax_agree": jnp.mean((a_c == a_f).astype(jnp.float32)),
        }
    return probe


def run_arm(name, cfg, carry_obs=True, carry_f32=False, probe_every=0):
    rec = {"carry_obs": carry_obs, "carry_f32": carry_f32,
           "replay_quantize": cfg.rl.replay_quantize, "probes": []}
    try:
        state = dqn_lib.init(cfg, jax.random.key(0), cfg.rl.num_envs)
        if carry_f32:
            img, _, _ = driving.observe_batch(cfg.env, state.env_states)
            state = state._replace(obs_image=img)
        it = dqn_lib.make_iteration(cfg, carry_obs=carry_obs, chunk=CHUNK,
                                    carry_f32=carry_f32)
        probe = make_probe(cfg) if probe_every else None
        t0 = time.time()
        last = None
        for i in range(ITERS // CHUNK):
            if probe is not None and i % probe_every == 0:
                # Dispatch the probe BEFORE the donating iteration call so
                # it reads this dispatch's state buffers while still valid.
                p = {k: round(float(v), 5) for k, v in probe(state).items()}
                p["iters"] = i * CHUNK
                rec["probes"].append(p)
                print(f"{name} probe@{i * CHUNK}: {p}", flush=True)
            state, m = it(state)
            last = m
        jax.block_until_ready(last)
        rec["train_s"] = round(time.time() - t0, 1)
        rec["final_train_return"] = round(float(last["episode_return"][-1]), 2)
        rec["final_action_entropy"] = round(
            float(jnp.mean(last["action_entropy"])), 3)
        # Save final params for post-hoc analysis (stage 1 lost its params,
        # blocking the identical-trajectory follow-up).
        import numpy as np
        leaves, _ = jax.tree_util.tree_flatten(state.params)
        np.savez(f"results_r3/params_{name.split()[0]}.npz",
                 **{str(i): np.asarray(x) for i, x in enumerate(leaves)})
        for eps, label in ((0.0, "greedy"), (0.05, "eps05")):
            out = policy_eval.evaluate_dqn(
                cfg, state.params, jax.random.key(0), num_envs=256,
                epsilon=eps)
            rec[f"eval_{label}"] = {k: round(v, 3) for k, v in out.items()}
        out = policy_eval.evaluate_dqn(
            cfg, state.params, jax.random.key(1), num_envs=256, epsilon=0.0)
        rec["eval_greedy_seed1"] = {k: round(v, 3) for k, v in out.items()}
        print(f"{name}: {json.dumps({k: v for k, v in rec.items() if k != 'probes'})}",
              flush=True)
    except Exception:
        rec["error"] = traceback.format_exc()
        print(f"{name}: FAILED\n{rec['error']}", flush=True)
    return rec


def main():
    outfile = (sys.argv[1] if len(sys.argv) > 1
               else "results_r3/bisect_carry.json")
    base = msc.get_preset("c4")
    noq = base.override_str(["rl.replay_quantize=false"])
    results = {}
    results["I_probe"] = run_arm("I probe", base, probe_every=5)
    results["F_carry_noquant"] = run_arm("F carry+nq", noq)
    results["G_nocarry_noquant"] = run_arm("G nocarry+nq", noq,
                                           carry_obs=False)
    results["H_f32carry_quant"] = run_arm("H f32carry+q", base,
                                          carry_f32=True)
    with open(outfile, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {outfile}")


if __name__ == "__main__":
    main()
