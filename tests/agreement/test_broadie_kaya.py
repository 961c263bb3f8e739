"""Broadie-Kaya exact Heston sampling agreement, mirroring reference
test/agreement/montecarlo_heston.jl:150-252 — with the *correct* HestonInputs
argument order (the reference test passes them mislabeled; SURVEY §2 notes
not to replicate that bug)."""

import datetime as dt

import numpy as np
import pytest

from hedgehog_tpu import (
    Antithetic,
    Call,
    CarrMadan,
    EulerMaruyama,
    European,
    HestonBroadieKaya,
    HestonDynamics,
    HestonInputs,
    MonteCarlo,
    PricingProblem,
    SimulationConfig,
    Spot,
    VanillaOption,
    solve,
)

REF = dt.date(2025, 1, 1)
EXPIRY = dt.date(2025, 12, 31)
# V0=0.04, kappa=1.5, theta=0.04, sigma=0.3, rho=-0.6
MARKET = HestonInputs(REF, 0.05, 100.0, 0.04, 1.5, 0.04, 0.3, -0.6)
PAYOFF = VanillaOption(100.0, EXPIRY, European(), Call(), Spot())
PROB = PricingProblem(PAYOFF, MARKET)

CM_PRICE = float(solve(PROB, CarrMadan(1.0, 32.0, HestonDynamics())).price)


def bk_price(trajectories, seed, vr=None):
    cfg = SimulationConfig(
        trajectories=trajectories,
        steps=1,
        seed=seed,
        variance_reduction=vr or __import__("hedgehog_tpu").NoVarianceReduction(),
    )
    m = MonteCarlo(HestonDynamics(), HestonBroadieKaya(), cfg)
    return float(solve(PROB, m).price)


def test_bk_vs_carr_madan():
    p = bk_price(10_000, seed=42)
    assert p == pytest.approx(CM_PRICE, rel=2e-2)


def test_bk_vs_euler():
    p_bk = bk_price(10_000, seed=7)
    cfg = SimulationConfig(
        trajectories=25_000, steps=200, seed=7, variance_reduction=Antithetic()
    )
    p_em = float(solve(PROB, MonteCarlo(HestonDynamics(), EulerMaruyama(), cfg)).price)
    assert p_bk == pytest.approx(p_em, rel=5e-2)


def test_bk_antithetic():
    p = bk_price(5_000, seed=0, vr=Antithetic())
    assert p == pytest.approx(CM_PRICE, rel=3e-2)


def test_bk_variance_moments():
    """Terminal variance distribution moments: E[V_T] and Var[V_T] have CIR
    closed forms — a direct check on the noncentral-χ² stage."""
    import jax.numpy as jnp

    from hedgehog_tpu import simulate_terminal_prices  # noqa: F401  (API presence)
    from hedgehog_tpu.distributions.broadie_kaya import sample_noncentral_chisq
    import jax

    kappa, theta, sigma, V0, T = 1.5, 0.04, 0.3, 0.04, 1.0
    em = -np.expm1(-kappa * T)
    d = 4 * kappa * theta / sigma**2
    lam = 4 * kappa * np.exp(-kappa * T) * V0 / (sigma**2 * em)
    c = sigma**2 * em / (4 * kappa)
    vt = c * sample_noncentral_chisq(jax.random.PRNGKey(0), d, lam, (400_000,))
    mean_expected = V0 * np.exp(-kappa * T) + theta * em
    var_expected = (
        V0 * sigma**2 / kappa * (np.exp(-kappa * T) - np.exp(-2 * kappa * T))
        + theta * sigma**2 / (2 * kappa) * em**2
    )
    assert float(jnp.mean(vt)) == pytest.approx(mean_expected, rel=5e-3)
    assert float(jnp.var(vt)) == pytest.approx(var_expected, rel=2e-2)


def test_bk_scalar_scan_path_with_batched_paths():
    """cf_terms not divisible by 8 forces the scalar-scan CF path, which
    must handle path-batched states (regression: the block detector used
    ndim>0 and mistook the batch axis for a frequency block, crashing)."""
    import jax.numpy as jnp

    from hedgehog_tpu.distributions.broadie_kaya import (
        heston_integrated_variance_weights,
    )

    VT = jnp.array([0.03, 0.05, 0.041])
    s100 = heston_integrated_variance_weights(VT, 0.04, 2.0, 0.04, 0.3, 1.0, 100)
    s104 = heston_integrated_variance_weights(VT, 0.04, 2.0, 0.04, 0.3, 1.0, 104)
    # scalar-scan (100) and block (104) paths must agree on shared weights
    import numpy as np

    np.testing.assert_allclose(
        np.asarray(s100.weights), np.asarray(s104.weights[:100]), rtol=1e-12
    )
