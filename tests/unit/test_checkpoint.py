"""Checkpoint/resume round-trips (SURVEY §5)."""

import datetime as dt

import jax.numpy as jnp
import numpy as np

from hedgehog_tpu import BlackScholesAnalytic, Call, European, PricingProblem, RateCurve, Spot, VanillaOption, BlackScholesInputs, solve
from hedgehog_tpu.utils.checkpoint import load_pytree, save_pytree

REF = dt.date(2024, 1, 1)


def test_pytree_roundtrip(tmp_path):
    curve = RateCurve.from_dfs(REF, [0.5, 1.0, 2.0], [0.99, 0.975, 0.95])
    market = BlackScholesInputs(REF, curve, 100.0, 0.2)
    payoff = VanillaOption(100.0, dt.date(2025, 1, 1), European(), Call(), Spot())
    prob = PricingProblem(payoff, market)

    path = str(tmp_path / "prob")
    save_pytree(path, prob)
    prob2 = load_pytree(path, prob)

    p1 = float(solve(prob, BlackScholesAnalytic()).price)
    p2 = float(solve(prob2, BlackScholesAnalytic()).price)
    assert p1 == p2


def test_calibration_state_roundtrip(tmp_path):
    params = {"x": jnp.asarray([0.02, 3.0, 0.03]), "step": jnp.asarray(17)}
    save_pytree(str(tmp_path / "calib"), params)
    loaded = load_pytree(str(tmp_path / "calib"), params)
    np.testing.assert_array_equal(np.asarray(loaded["x"]), np.asarray(params["x"]))
    assert int(loaded["step"]) == 17
