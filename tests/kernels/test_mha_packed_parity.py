"""MHA module parity: pallas packed kernel on/off with identical params.

Repo convention: flag-gated kernels must be drop-in (same param tree, same
numerics), so a checkpoint trained either way loads under either flag.
"""

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_sc_tpu.codec.camera_vit import MHA


def test_mha_packed_kernel_is_dropin(key):
    k_init, k_q, k_kv = jax.random.split(key, 3)
    x_q = jax.random.normal(k_q, (2, 65, 128))
    x_kv = jax.random.normal(k_kv, (2, 256, 128))

    ref = MHA(dim=128, heads=4, use_pallas=False)
    pal = MHA(dim=128, heads=4, use_pallas=True)
    params = ref.init(k_init, x_q, x_kv)

    out_ref = ref.apply(params, x_q, x_kv)
    out_pal = pal.apply(params, x_q, x_kv)  # interpret mode on CPU
    np.testing.assert_allclose(np.asarray(out_pal), np.asarray(out_ref),
                               atol=2e-5, rtol=2e-5)

    # Gradients through the custom VJP match XLA autodiff.
    def loss(fn, p):
        return jnp.sum(fn.apply(p, x_q, x_kv) ** 2)

    g_ref = jax.grad(lambda p: loss(ref, p))(params)
    g_pal = jax.grad(lambda p: loss(pal, p))(params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-4),
        g_ref, g_pal)
