"""Conditional LSM (round-3 VERDICT item 3): American Heston pricing from a
conditional-bridge grid — QE variance path + one-normal exact conditional S
draw per step, LSM regression on the joint (S, V) basis.

Agreement contract mirrors the reference's american_options.jl:51 rtol 2e-2
(LSM vs lattice/other-LSM), applied across grid constructions: the
conditional-bridge LSM must agree with Euler-grid and QE-grid LSM.
"""

import datetime as dt

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import hedgehog_tpu as hh

REF = dt.date(2024, 1, 1)
EXPIRY = dt.date(2025, 1, 1)
R, SPOT = 0.03, 100.0
H = dict(V0=0.04, kappa=2.0, theta=0.04, sigma=0.3, rho=-0.7)


def _market():
    return hh.HestonInputs(REF, R, SPOT, *H.values())


def _cfg(n, steps, seed=0):
    return hh.SimulationConfig(
        trajectories=n, steps=steps, variance_reduction=hh.Antithetic(), seed=seed
    )


def _lsm(strategy, n, steps, degree, seed=0):
    return hh.LSM(hh.MonteCarlo(hh.HestonDynamics(), strategy, _cfg(n, steps, seed)), degree)


AM_PUT = hh.VanillaOption(105.0, EXPIRY, hh.American(), hh.Put(), hh.Spot())
EU_PUT = hh.VanillaOption(105.0, EXPIRY, hh.European(), hh.Put(), hh.Spot())


def test_conditional_grid_european_matches_carr_madan():
    # the bridge grid's terminal marginal must price Europeans correctly
    prob = hh.PricingProblem(EU_PUT, _market())
    cm = float(hh.solve(prob, hh.CarrMadan(1.0, "auto", hh.HestonDynamics())).price)
    from hedgehog_tpu.methods.montecarlo import simulate_conditional_grid

    s_grid, v_grid = simulate_conditional_grid(prob, _cfg(1 << 14, 16))
    payoff = jnp.mean(jnp.maximum(105.0 - s_grid[:, -1, :], 0.0))
    D = float(jnp.exp(-R * hh.yearfrac(REF, hh.to_ticks(EXPIRY))))
    np.testing.assert_allclose(float(D * payoff), cm, rtol=2e-2)
    assert (np.asarray(v_grid) >= 0.0).all()


def test_conditional_lsm_vs_euler_and_qe_lsm():
    prob = hh.PricingProblem(AM_PUT, _market())
    p_cond = float(hh.solve(prob, _lsm(hh.HestonQE(conditional=True), 1 << 14, 32, 3)).price)
    p_qe = float(hh.solve(prob, _lsm(hh.HestonQE(), 1 << 14, 32, 4, seed=1)).price)
    p_euler = float(hh.solve(prob, _lsm(hh.EulerMaruyama(), 1 << 14, 64, 4, seed=2)).price)
    # american_options.jl:51 tolerance across independent constructions
    np.testing.assert_allclose(p_cond, p_qe, rtol=2e-2)
    np.testing.assert_allclose(p_cond, p_euler, rtol=2e-2)


def test_conditional_lsm_american_premium():
    prob_am = hh.PricingProblem(AM_PUT, _market())
    prob_eu = hh.PricingProblem(EU_PUT, _market())
    method = _lsm(hh.HestonQE(conditional=True), 1 << 13, 24, 3)
    p_am = float(hh.solve(prob_am, method).price)
    p_eu = float(
        hh.solve(prob_eu, hh.CarrMadan(1.0, "auto", hh.HestonDynamics())).price
    )
    assert p_am >= p_eu - 1e-2  # early-exercise premium is nonnegative


def test_conditional_lsm_sharded_matches_unsharded_scale():
    from hedgehog_tpu.parallel import make_paths_mesh, sharded_lsm_price_fn

    mesh = make_paths_mesh(jax.devices()[:8])
    method = _lsm(hh.HestonQE(conditional=True), 8 * 1024, 16, 3)
    prob = hh.PricingProblem(AM_PUT, _market())
    p_sharded = float(jax.jit(sharded_lsm_price_fn(method, mesh))(prob))
    p_single = float(hh.solve(prob, _lsm(hh.HestonQE(conditional=True), 8 * 1024, 16, 3, seed=7)).price)
    # different streams → statistical agreement only
    np.testing.assert_allclose(p_sharded, p_single, rtol=3e-2)


def test_rao_blackwell_terminal_target():
    """RB terminal target (LSM.rao_blackwell): per-path conditional mean of
    the terminal payoff — same mean, strictly lower variance than the raw
    payoff on the same grid (measured price-level variance ratio ≈ 1.24
    across seeds at 2k paths), and it matches a brute-force conditional
    Monte Carlo average over the final bridge normal."""
    import jax

    from hedgehog_tpu.methods.lsm import _flatten_grid, rb_terminal_value
    from hedgehog_tpu.methods.montecarlo import simulate_conditional_grid

    prob = hh.PricingProblem(AM_PUT, _market())
    cfg = _cfg(1 << 13, 16)
    s_grid, v_grid = simulate_conditional_grid(prob, cfg)
    spots, vols = _flatten_grid(s_grid), _flatten_grid(v_grid)
    term = np.asarray(rb_terminal_value(prob, spots, vols))
    raw = np.asarray(prob.payoff(spots[-1]))
    np.testing.assert_allclose(term.mean(), raw.mean(), rtol=2e-2)
    assert term.var() < raw.var()

    # brute force: redraw the final-segment bridge normal many times for a
    # few paths and average the payoff — must match the closed form
    T = hh.yearfrac(REF, hh.to_ticks(EXPIRY))
    dtau = T / 16
    kappa, theta, sigma, rho = H["kappa"], H["theta"], H["sigma"], H["rho"]
    idx = np.arange(6)
    v_a, v_b = np.asarray(vols[-2])[idx], np.asarray(vols[-1])[idx]
    iv = 0.5 * dtau * (v_a + v_b)
    j = (v_b - v_a - kappa * theta * dtau + kappa * iv) / sigma
    s_prev = np.asarray(spots[-2])[idx]
    z = np.asarray(jax.random.normal(jax.random.PRNGKey(9), (1 << 16,)))
    log_st = (np.log(s_prev)[:, None] + R * dtau - 0.5 * iv[:, None]
              + rho * j[:, None]
              + np.sqrt((1.0 - rho**2) * iv)[:, None] * z[None, :])
    brute = np.maximum(105.0 - np.exp(log_st), 0.0).mean(axis=1)
    np.testing.assert_allclose(term[idx], brute, rtol=2e-2, atol=5e-3)


def test_rao_blackwell_price_matches_plain():
    prob = hh.PricingProblem(AM_PUT, _market())
    cfg = _cfg(1 << 14, 16)
    mc = hh.MonteCarlo(hh.HestonDynamics(), hh.HestonQE(conditional=True), cfg)
    p_rb = float(hh.solve(prob, hh.LSM(mc, 3)).price)  # rao_blackwell=True default
    p_plain = float(hh.solve(prob, hh.LSM(mc, 3, rao_blackwell=False)).price)
    np.testing.assert_allclose(p_rb, p_plain, rtol=1e-2)


def test_price_grid_conditional_routing():
    # simulate_price_grid now routes conditional strategies to the bridge
    prob = hh.PricingProblem(EU_PUT, _market())
    method = hh.MonteCarlo(hh.HestonDynamics(), hh.HestonQE(conditional=True), _cfg(256, 4))
    grid = hh.simulate_price_grid(prob, method)
    assert grid.shape == (2, 5, 256)
    bad = hh.MonteCarlo(hh.LognormalDynamics(), hh.HestonQE(conditional=True), _cfg(256, 4))
    with pytest.raises(TypeError):
        hh.simulate_price_grid(prob, bad)
