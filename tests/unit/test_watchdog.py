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


def test_collapse_watchdog_floor_math():
    """Constant-argmax entropy floor: eps=0 -> 0 nats; eps=1 -> uniform."""
    import numpy as np

    from multimodal_sc_tpu.obs.profiling import CollapseWatchdog

    assert CollapseWatchdog.collapsed_entropy(0.0, 9) < 1e-6
    np.testing.assert_allclose(
        CollapseWatchdog.collapsed_entropy(1.0, 9), np.log(9), rtol=1e-6)


def test_collapse_watchdog_trips_only_when_armed(capsys):
    """Near-floor entropy at high eps (early training) must NOT trip; at
    low eps it trips after `consecutive` checks and warns once."""
    import jax.numpy as jnp

    from multimodal_sc_tpu.obs.profiling import CollapseWatchdog

    dog = CollapseWatchdog(num_actions=9, consecutive=3)
    floor_lo = CollapseWatchdog.collapsed_entropy(0.05, 9)

    # High epsilon: collapsed-looking entropy is normal early greed; no trip.
    for step in range(3):
        dog.check(step, {"epsilon": jnp.float32(0.9),
                         "action_entropy": jnp.float32(0.1)})
    assert not dog.tripped

    # Low epsilon, healthy entropy: no trip.
    for step in range(3):
        dog.check(step, {"epsilon": jnp.float32(0.05),
                         "action_entropy": jnp.float32(1.5)})
    assert not dog.tripped

    # Low epsilon, at the collapsed floor: trips on the 3rd consecutive.
    for step in range(3):
        dog.check(step, {"epsilon": jnp.float32(0.05),
                         "action_entropy": jnp.float32(floor_lo + 0.01)})
    assert dog.tripped
    assert "greedy-collapse" in capsys.readouterr().err
