"""Integration-test sanitizers (SURVEY.md §5.2, VERDICT r1 item 9).

Every integration test runs with ``jax_debug_nans=True``: any NaN produced
inside a jitted train/eval step re-executes op-by-op and raises at the
producing primitive. The training paths must be NaN-free end to end; tests
that *inject* NaNs (watchdog/fault-injection) live in tests/unit and keep
the default-off setting from the root conftest.
"""

import jax
import pytest


@pytest.fixture(autouse=True)
def debug_nans():
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", False)
