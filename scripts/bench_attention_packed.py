"""Microbench: packed-head Pallas attention vs XLA twin on the live chip.

Flagship shapes = the c4 fusion transformer's four attention sites at
bench batch (1024 envs): cam(65) x lid(256) cross both ways + self each.

METHOD NOTE (hard-won): successive identical dispatches through the axon
tunnel get deduplicated/overlapped, producing physically impossible
timings (e.g. 3e11 flops "in" 0.1 ms). Every timed loop below therefore
threads the output back into the next call's input so the chain is
data-dependent — same technique as bench.py's state threading.

Usage: python scripts/bench_attention_packed.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit_chained(fn, q, k, v, iters=50):
    """fn(q,k,v)->out with out fed back into q (data-dependent chain)."""
    f = jax.jit(lambda q, k, v: fn(q, k, v))
    out = f(q, k, v)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        q = q + 1e-9 * out
        out = f(q, k, v)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms (incl. the add)


def main() -> None:
    from multimodal_sc_tpu.kernels.attention_packed import (
        packed_attention,
        packed_attention_reference,
    )
    from multimodal_sc_tpu.runtime.cache import enable_compilation_cache

    enable_compilation_cache()
    b, heads, dm = 1024, 4, 128
    for lq, lk, label in [(65, 256, "cam->lid"), (256, 65, "lid->cam"),
                          (65, 65, "cam self"), (256, 256, "lid self")]:
        kq, kk, kv = jax.random.split(jax.random.key(0), 3)
        q = jax.random.normal(kq, (b, lq, dm))
        k = jax.random.normal(kk, (b, lk, dm))
        v = jax.random.normal(kv, (b, lk, dm))

        t_ref = timeit_chained(
            lambda q, k, v: packed_attention_reference(q, k, v, heads),
            q, k, v)
        t_pal = timeit_chained(
            lambda q, k, v: packed_attention(q, k, v, heads), q, k, v)
        print(f"{label:10s} (B={b}, {lq}x{lk}, H={heads}, d={dm//heads}): "
              f"XLA {t_ref:.3f} ms | packed {t_pal:.3f} ms | "
              f"speedup {t_ref/t_pal:.2f}x", flush=True)

        # Training path: grads actually consumed (returned from jit), so
        # the backward can't be dead-code-eliminated.
        def make_g(fn):
            def g(q, k, v):
                loss, grads = jax.value_and_grad(
                    lambda qq: jnp.sum(fn(qq, k, v) ** 2))(q)
                return grads
            return g

        t_gr = timeit_chained(
            make_g(lambda q, k, v: packed_attention_reference(q, k, v, heads)),
            q, k, v, iters=20)
        t_gp = timeit_chained(
            make_g(lambda q, k, v: packed_attention(q, k, v, heads)),
            q, k, v, iters=20)
        print(f"{'':10s} fwd+bwd: XLA {t_gr:.3f} ms | packed {t_gp:.3f} ms "
              f"| speedup {t_gr/t_gp:.2f}x", flush=True)


if __name__ == "__main__":
    main()
