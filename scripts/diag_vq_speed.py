"""Microbench the c4 VQ RL pieces on the real TPU: which op costs ~3 s?"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multimodal_sc_tpu.runtime.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

import multimodal_sc_tpu as msc
from multimodal_sc_tpu.codec.semantic_vq import (
    transmit_indices,
    vector_quantize,
)
from multimodal_sc_tpu.rl import dqn as dqn_lib


def timed(name, fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:<40} {dt * 1e3:9.2f} ms/iter", flush=True)
    return out


key = jax.random.key(0)
B, N, K, D = 32, 64, 256, 64
cfgv = msc.get_preset("c4").override_str(["camera.arch=vq"])
ch = cfgv.channel

idx = jax.random.randint(key, (B, N), 0, K, jnp.int32)
cb = jax.random.normal(key, (K, D))
z = jax.random.normal(key, (B, 8, 8, D))
snr = jnp.full((B,), 10.0)

timed("vector_quantize", jax.jit(
    lambda z, cb: vector_quantize(z, cb)[1]), z, cb)
timed("transmit_indices", jax.jit(
    lambda i, s, k: transmit_indices(ch, i, K, s, k)), idx, snr, key)
timed("codebook gather", jax.jit(lambda cb, i: cb[i]), cb, idx)

# Full iterations, analog vs vq, act-only and act+learn.
for arch in ("cnn", "vq"):
    cfg = msc.get_preset("c4").override_str([f"camera.arch={arch}"])
    state = dqn_lib.init(cfg, key, 32)
    for learn in (False, True):
        it = dqn_lib.make_iteration(cfg, learn=learn)
        state, m = it(state)
        jax.block_until_ready(m)
        t0 = time.perf_counter()
        for _ in range(20):
            state, m = it(state)
        jax.block_until_ready(m)
        dt = (time.perf_counter() - t0) / 20
        print(f"iteration arch={arch} learn={learn}: {dt * 1e3:9.2f} ms",
              flush=True)
print("done", flush=True)
