"""NaN watchdog + fault injection (SURVEY.md §5.3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_sc_tpu.obs.profiling import NaNWatchdog, corrupt_symbols


def test_watchdog_passes_finite():
    NaNWatchdog().check(1, {"loss": jnp.float32(0.5)})


def test_watchdog_halts_on_nan():
    with pytest.raises(FloatingPointError, match="non-finite"):
        NaNWatchdog().check(7, {"loss": jnp.float32(jnp.nan)})


def test_watchdog_halts_on_inf():
    with pytest.raises(FloatingPointError):
        NaNWatchdog().check(7, {"loss": jnp.float32(jnp.inf)})


def test_corrupt_symbols_modes(key):
    z = jax.random.normal(key, (2, 16, 2))
    assert bool(jnp.isnan(corrupt_symbols(z, "nan")).any())
    assert bool(jnp.isinf(corrupt_symbols(z, "inf")).any())
    assert float(jnp.max(corrupt_symbols(z, "burst"))) == 100.0
    with pytest.raises(ValueError):
        corrupt_symbols(z, "gamma-ray")


def test_fault_injection_reaches_watchdog(key):
    """Corrupted channel output propagates to a non-finite loss, and the
    watchdog halts — the SURVEY §5.3 fault-injection scenario end-to-end."""
    from multimodal_sc_tpu.codec.camera_cnn import CameraJSCC

    model = CameraJSCC(features=(8, 16, 16, 16), c_sym=2)
    img = jax.random.uniform(key, (2, 32, 32, 3))
    params = model.init(key, img, None)["params"]
    z = model.apply({"params": params}, img, None, method="encode")
    z_bad = corrupt_symbols(z, "nan")
    rec = model.apply({"params": params}, z_bad, None, method="decode")
    loss = jnp.mean((rec - img) ** 2)
    with pytest.raises(FloatingPointError):
        NaNWatchdog().check(1, {"loss": loss})
