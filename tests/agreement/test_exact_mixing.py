"""Exact-transition segmented mixing estimator (HestonExactMixing).

Numerics live in models/heston_exact.py: exact noncentral-χ² CIR transitions
(Poisson-Gamma mixture, the representation behind the reference's sampler,
src/distributions/heston.jl:125-133), closed-form conditional ∫V moments
from the Broadie-Kaya Laplace transform (heston.jl:150-212), gamma-matched
∫V draw, conditional Black-Scholes close.  Measured |bias| ≤ 0.4bp at two
segments (benchmarks/one_step_exact_mixing.py)."""

import datetime as dt

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hedgehog_tpu import (
    Antithetic,
    Call,
    CarrMadan,
    European,
    HestonDynamics,
    HestonExactMixing,
    HestonInputs,
    MonteCarlo,
    PricingProblem,
    Put,
    SimulationConfig,
    Spot,
    VanillaOption,
    solve,
)
from hedgehog_tpu.models.heston_exact import (
    bessel_ratio,
    cir_exact_constants,
    cir_exact_step,
    iv_cond_moments,
    poisson_inv,
)

REF = dt.date(2020, 1, 1)
EXPIRY = dt.date(2021, 1, 1)
MARKET = HestonInputs(REF, 0.03, 100.0, 0.04, 2.0, 0.04, 0.3, -0.7)
# Feller-violating stress market (2κθ = 0.12 < σ² = 0.25)
FELLER = HestonInputs(REF, 0.03, 100.0, 0.04, 1.0, 0.06, 0.5, -0.8)


def _prob(cp, market=MARKET, strike=100.0):
    return PricingProblem(VanillaOption(strike, EXPIRY, European(), cp, Spot()), market)


def _cm_price(prob):
    return float(solve(prob, CarrMadan(1.0, "auto", HestonDynamics())).price)


# ---------------- numeric building blocks ----------------


def test_bessel_ratio_vs_scipy():
    sp = pytest.importorskip("scipy.special")
    rng = np.random.default_rng(0)
    nu = rng.uniform(-0.55, 3.0, 512)
    z = 10.0 ** rng.uniform(-3.0, 2.5, 512)
    got = np.asarray(bessel_ratio(jnp.asarray(nu), jnp.asarray(z)))
    want = sp.ive(nu + 1.0, z) / sp.ive(nu, z)
    assert np.max(np.abs(got / want - 1.0)) < 1e-4


def test_poisson_inv_matches_cdf_inversion():
    st = pytest.importorskip("scipy.stats")
    rng = np.random.default_rng(1)
    mu = rng.uniform(0.05, 8.0, 256)
    u = rng.uniform(0.0, 1.0, 256)
    got = np.asarray(poisson_inv(jnp.asarray(mu), jnp.asarray(u)))
    want = st.poisson.ppf(u, mu)  # same inversion convention: min{k: F(k) ≥ u}
    np.testing.assert_array_equal(got, want)


def test_iv_cond_moments_vs_laplace_fd():
    """m1/s2 must be the derivatives of the BK conditional Laplace transform
    log E[e^{-a·IV} | V_0, V_T] at a = 0 (finite differences, scipy f64)."""
    sp = pytest.importorskip("scipy.special")

    def log_phi(a, x, y, kappa, theta, sigma, T):
        nu = 2.0 * kappa * theta / sigma**2 - 1.0
        g = np.sqrt(kappa**2 + 2.0 * sigma**2 * a)

        def piece(gam):
            s = np.sinh(gam * T / 2.0)
            coth = np.cosh(gam * T / 2.0) / s
            z = (2.0 * np.sqrt(x * y) / sigma**2) * gam / s
            return (np.log(gam) - np.log(s)
                    - ((x + y) / sigma**2) * gam * coth
                    + np.log(sp.ive(nu, z)) + z)

        return piece(g) - piece(kappa)

    for m in (MARKET, FELLER):
        kappa, theta, sigma = float(m.kappa), float(m.theta), float(m.sigma)
        c = cir_exact_constants(kappa, theta, sigma, 0.5)
        for y_mult in (0.4, 1.0, 2.5):
            x, y = float(m.V0), y_mult * theta
            # h small enough for O(h²) truncation, large enough that the
            # second difference (lp+lm ~ s2·h²) stays above f64 cancellation
            h = 5e-3
            lp = log_phi(+h, x, y, kappa, theta, sigma, 0.5)
            lm = log_phi(-h, x, y, kappa, theta, sigma, 0.5)
            m1, s2 = iv_cond_moments(jnp.asarray(x), jnp.asarray(y), c)
            assert float(m1) == pytest.approx(-(lp - lm) / (2 * h), rel=1e-4)
            assert float(s2) == pytest.approx((lp + lm) / h**2, rel=1e-3)


def test_cir_exact_step_transition_moments():
    """Sampled V_{t+Δ} must reproduce the exact CIR conditional mean and
    variance (the transition is exact up to Wilson-Hilferty gamma error)."""
    kappa, theta, sigma, dt_ = 2.0, 0.04, 0.3, 0.5
    c = cir_exact_constants(kappa, theta, sigma, dt_)
    n = 1 << 16
    key = jax.random.PRNGKey(7)
    k1, k2, k3 = jax.random.split(key, 3)
    x = jnp.full((n,), 0.05)
    y = cir_exact_step(
        x,
        jax.random.uniform(k1, (n,)),
        jax.random.normal(k2, (n,)),
        jax.random.uniform(k3, (n,)),
        c,
    )
    e = np.exp(-kappa * dt_)
    mean = theta + (0.05 - theta) * e
    var = (0.05 * sigma**2 * e * (1 - e) / kappa
           + theta * sigma**2 * (1 - e) ** 2 / (2 * kappa))
    assert float(jnp.mean(y)) == pytest.approx(mean, rel=1e-2)
    assert float(jnp.var(y)) == pytest.approx(var, rel=3e-2)


# ---------------- pricing agreement ----------------


@pytest.mark.parametrize("cp", [Call(), Put()])
def test_exact_mixing_qmc_vs_carr_madan(cp):
    """Two segments, scrambled Sobol': sub-bp bias + QMC noise ≪ 20bp."""
    prob = _prob(cp)
    cfg = SimulationConfig(
        trajectories=1 << 16, steps=2, variance_reduction=Antithetic(),
        seed=5, qmc=True,
    )
    sol = solve(prob, MonteCarlo(HestonDynamics(), HestonExactMixing(), cfg))
    assert float(sol.price) == pytest.approx(_cm_price(prob), rel=2e-3)


def test_exact_mixing_feller_violating_market():
    prob = _prob(Call(), market=FELLER)
    cfg = SimulationConfig(
        trajectories=1 << 16, steps=2, variance_reduction=Antithetic(),
        seed=11, qmc=True,
    )
    sol = solve(prob, MonteCarlo(HestonDynamics(), HestonExactMixing(), cfg))
    assert float(sol.price) == pytest.approx(_cm_price(prob), rel=3e-3)


def test_exact_mixing_prng_antithetic():
    prob = _prob(Call())
    cfg = SimulationConfig(
        trajectories=50_000, steps=2, variance_reduction=Antithetic(), seed=3
    )
    sol = solve(prob, MonteCarlo(HestonDynamics(), HestonExactMixing(), cfg))
    assert float(sol.price) == pytest.approx(_cm_price(prob), rel=2e-2)
    assert sol.ensemble.shape == (2, 50_000)


def test_exact_mixing_strike_grid_matches_scalar_solves():
    strikes = jnp.asarray([80.0, 95.0, 100.0, 110.0, 130.0])
    cfg = SimulationConfig(
        trajectories=4_096, steps=2, variance_reduction=Antithetic(),
        seed=9, qmc=True,
    )
    method = MonteCarlo(HestonDynamics(), HestonExactMixing(), cfg)
    grid = solve(_prob(Call(), strike=strikes), method).price
    assert grid.shape == (5,)
    for i, k in enumerate(np.asarray(strikes)):
        scalar = solve(_prob(Call(), strike=float(k)), method).price
        assert float(grid[i]) == pytest.approx(float(scalar), rel=1e-12)


def test_exact_mixing_sharded_matches_unsharded_qmc():
    """Sharded devices slice ONE Sobol' sequence disjointly → the sharded
    price equals the unsharded price to summation order (the estimator
    routes through mc_path_values like every conditional strategy)."""
    from hedgehog_tpu.parallel.sharding import make_paths_mesh, sharded_mc_price

    prob = _prob(Call())
    cfg = SimulationConfig(
        trajectories=16_384, steps=2, variance_reduction=Antithetic(),
        seed=7, qmc=True,
    )
    method = MonteCarlo(HestonDynamics(), HestonExactMixing(), cfg)
    p_single = float(solve(prob, method).price)
    p_sharded = float(sharded_mc_price(prob, method, make_paths_mesh()))
    assert p_sharded == pytest.approx(p_single, rel=1e-9)


def test_exact_surface_single_expiry_reproduces_solve():
    """The exact-transition surface shares the solve path's draw layout
    (4 Sobol' dims per segment, step-major), so a single-expiry surface at
    the same seed IS the HestonExactMixing solve price."""
    from hedgehog_tpu.methods.montecarlo import heston_surface_mc

    prob = _prob(Call())
    cfg = SimulationConfig(
        trajectories=8192, steps=2, variance_reduction=Antithetic(),
        seed=11, qmc=True,
    )
    method = MonteCarlo(HestonDynamics(), HestonExactMixing(), cfg)
    want = float(solve(prob, method).price)
    surf = heston_surface_mc(
        prob.market_inputs, [prob.payoff.expiry],
        jnp.asarray([prob.payoff.strike]), cfg, strategy=HestonExactMixing(),
    )
    assert float(surf[0, 0]) == pytest.approx(want, rel=1e-12)


def test_exact_surface_matches_carr_madan_per_point():
    """Exact-transition surface: every (expiry, strike) point agrees with an
    independent Carr-Madan solve — at a 4-segment budget for a 2-expiry
    surface (vs ~32 QE steps for comparable bias)."""
    from hedgehog_tpu.methods.montecarlo import heston_surface_mc

    market = _prob(Call()).market_inputs
    expiries = [dt.date(2024, 7, 1), dt.date(2025, 1, 1)]
    strikes = jnp.asarray([90.0, 100.0, 110.0])
    cfg = SimulationConfig(
        trajectories=1 << 15, steps=4, variance_reduction=Antithetic(),
        seed=5, qmc=True,
    )
    surf = heston_surface_mc(
        market, expiries, strikes, cfg, strategy=HestonExactMixing()
    )
    for i, e in enumerate(expiries):
        for k in range(strikes.shape[0]):
            payoff = VanillaOption(float(strikes[k]), e, European(), Call(), Spot())
            cm = solve(
                PricingProblem(payoff, market),
                CarrMadan(1.0, "auto", HestonDynamics()),
            ).price
            assert float(surf[i, k]) == pytest.approx(float(cm), rel=5e-3)


def test_exact_surface_sharded_matches_unsharded():
    """sharded_surface_fn forwards the strategy: the exact-transition
    surface under QMC slices ONE Sobol' sequence disjointly per device."""
    from hedgehog_tpu.methods.montecarlo import heston_surface_mc
    from hedgehog_tpu.parallel.sharding import make_paths_mesh, sharded_surface_fn

    market = _prob(Call()).market_inputs
    expiries = [dt.date(2024, 7, 1), dt.date(2025, 1, 1)]
    strikes = jnp.asarray([95.0, 105.0])
    cfg = SimulationConfig(
        trajectories=8192, steps=4, variance_reduction=Antithetic(),
        seed=9, qmc=True,
    )
    method = MonteCarlo(HestonDynamics(), HestonExactMixing(), cfg)
    sharded = sharded_surface_fn(method, make_paths_mesh())(market, expiries, strikes)
    single = heston_surface_mc(
        market, expiries, strikes, cfg, strategy=HestonExactMixing()
    )
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single), rtol=1e-9)


def test_exact_mixing_rejects_untruncatable_poisson_rate():
    """Very low vol-of-vol markets make the Poisson-mixture count of the
    exact CIR transition explode (λ ∝ 1/σ²); a silently clamped count would
    price with large hidden bias, so the estimator must REFUSE with a
    pointer to the QE mixing path (review finding: the old heuristic
    silently returned the 64-trip cap)."""
    market = HestonInputs(dt.date(2024, 1, 1), 0.03, 100.0, 0.04, 2.0, 0.04,
                          0.02, -0.7)  # sigma (vol-of-vol) = 0.02
    payoff = VanillaOption(100.0, dt.date(2025, 1, 1), European(), Call(), Spot())
    cfg = SimulationConfig(trajectories=1024, steps=2,
                           variance_reduction=Antithetic(), seed=0)
    method = MonteCarlo(HestonDynamics(), HestonExactMixing(), cfg)
    with pytest.raises(ValueError, match="HestonQE"):
        solve(PricingProblem(payoff, market), method)


def test_exact_mixing_never_materializes_terminal_samples():
    from hedgehog_tpu import simulate_terminal_prices

    cfg = SimulationConfig(trajectories=128, steps=2)
    with pytest.raises(TypeError, match="conditional"):
        simulate_terminal_prices(
            _prob(Call()), MonteCarlo(HestonDynamics(), HestonExactMixing(), cfg)
        )
