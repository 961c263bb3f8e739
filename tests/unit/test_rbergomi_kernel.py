"""Fused rough-Bergomi mixing kernel (ops/rbergomi_kernel.py), validated on
CPU in interpret mode via the in-kernel Sobol' stream — pure bit arithmetic,
so the kernel's QMC variant reproduces the pure-JAX estimator per-path (the
PRNG variant shares every line but the draw source and is exercised on TPU
by benchmarks/rbergomi_bench.py)."""

import datetime as dt

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import hedgehog_tpu as hh
from hedgehog_tpu.methods.montecarlo import _rbergomi_mixing_values
from hedgehog_tpu.models.rough_bergomi import rbergomi_variance
from hedgehog_tpu.ops.rbergomi_kernel import (
    _rb_trace_inputs,
    rbergomi_mixing_values,
    rbergomi_mixing_vanilla_price,
)

REF, EXPIRY = dt.date(2024, 1, 1), dt.date(2025, 1, 1)


def _problem(payoff=None, xi0=0.04):
    mkt = hh.RoughBergomiInputs(REF, 0.03, 100.0, xi0, 1.5, 0.1, -0.7)
    opt = payoff or hh.VanillaOption(
        100.0, EXPIRY, hh.European(), hh.Call(), hh.Spot()
    )
    return hh.PricingProblem(opt, mkt)


def _config(paths=4096, steps=16, qmc=True, seed=3):
    return hh.SimulationConfig(
        trajectories=paths, steps=steps, variance_reduction=hh.Antithetic(),
        seed=seed, qmc=qmc,
    )


def test_kernel_qmc_values_match_pure_jax_per_path():
    """Same Sobol' points, same dim order, same Volterra factor → the kernel's
    per-path values match the pure-JAX fp32 estimator elementwise (residual =
    the kernel's fp32 ndtri/matmul vs f64; values are O(10))."""
    prob, cfg = _problem(), _config()
    ins = _rb_trace_inputs(prob, cfg, 64)
    chol, coefs, eta, dtau, f_base, lfk, strike, cp, rho, disc, T = ins
    got = rbergomi_mixing_values(
        chol, coefs, eta, dtau, f_base, lfk, strike, cp, rho,
        n_paths=cfg.trajectories, steps=cfg.steps, seed=cfg.seed,
        antithetic=True, qmc=True, interpret=True,
    )
    want = _rbergomi_mixing_values(
        prob, cfg, jax.random.PRNGKey(cfg.seed), quad_nodes=64, fp32=True
    )
    assert got.shape == (2, cfg.trajectories)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want, np.float32), atol=3e-2
    )
    # and the price-level agreement is much tighter than the per-path bound
    assert abs(float(jnp.mean(got)) - float(jnp.mean(want))) < 2e-4 * float(
        jnp.mean(want)
    )


def test_kernel_qmc_point_offset_slices_one_sequence():
    """Block i at offset 0 equals block 0 at offset i·2048 — the disjoint
    slicing contract sharded devices rely on."""
    prob, cfg = _problem(), _config(paths=4096, steps=8)
    ins = _rb_trace_inputs(prob, cfg, 64)
    chol, coefs, eta, dtau, f_base, lfk, strike, cp, rho, _, _ = ins

    def vals(n_paths, offset):
        return rbergomi_mixing_values(
            chol, coefs, eta, dtau, f_base, lfk, strike, cp, rho,
            n_paths=n_paths, steps=cfg.steps, seed=cfg.seed,
            antithetic=True, qmc=True, point_offset=offset, interpret=True,
        )

    whole = vals(4096, 0)
    second = vals(2048, 2048)
    np.testing.assert_array_equal(np.asarray(whole[:, 2048:]), np.asarray(second))


def test_price_kernel_consistent_with_values_kernel():
    """The accumulating price kernel equals disc·mean(values kernel) over the
    identical point range (same per-path math, different reduction site)."""
    prob, cfg = _problem(), _config(steps=8)
    ins = _rb_trace_inputs(prob, cfg, 64)
    chol, coefs, eta, dtau, f_base, lfk, strike, cp, rho, disc, _ = ins
    price = rbergomi_mixing_vanilla_price(
        chol, coefs, eta, dtau, f_base, lfk, strike, cp, rho, disc,
        n_blocks=1, n_batches=2, steps=cfg.steps, seed=cfg.seed,
        qmc=True, interpret=True,
    )
    vals = rbergomi_mixing_values(
        chol, coefs, eta, dtau, f_base, lfk, strike, cp, rho,
        n_paths=4096, steps=cfg.steps, seed=cfg.seed,
        antithetic=True, qmc=True, interpret=True,
    )
    want = float(disc) * float(jnp.mean(vals))
    np.testing.assert_allclose(float(price), want, rtol=1e-6)


def test_trace_inputs_coefs_are_the_zero_z_variance():
    """C_k = ξ₀(t_k)·exp(−½η²t_k^{2H}) is exactly rbergomi_variance at Z = 0;
    also exercises the ForwardVarianceCurve branch."""
    curve = hh.ForwardVarianceCurve(
        tenors=jnp.asarray([0.25, 0.5, 1.0]), xi=jnp.asarray([0.03, 0.04, 0.05])
    )
    prob, cfg = _problem(xi0=curve), _config(steps=8)
    chol, coefs, *_ = _rb_trace_inputs(prob, cfg, 64)
    T = hh.yearfrac(REF, EXPIRY)
    t_left = (jnp.arange(8) / 8) * T
    want = rbergomi_variance(prob.market_inputs, jnp.zeros(8), t_left)
    np.testing.assert_allclose(np.asarray(coefs), np.asarray(want), rtol=1e-12)
    assert chol.shape == (16, 16)


def test_use_kernel_dispatch_guards():
    """Non-vanilla payoffs and strike grids must redirect to the pure-JAX
    estimator instead of silently mispricing."""
    strat = hh.RoughBergomiMixing(use_kernel=True)
    cfg = _config(qmc=False)
    method = hh.MonteCarlo(hh.RoughBergomiDynamics(), strat, cfg)
    digital = hh.DigitalOption(100.0, EXPIRY, hh.European(), hh.Call(), hh.Spot())
    with pytest.raises(TypeError, match="use_kernel"):
        hh.solve(hh.PricingProblem(digital, _problem().market_inputs), method)
    grid = hh.VanillaOption(
        jnp.asarray([90.0, 100.0]), EXPIRY, hh.European(), hh.Call(), hh.Spot()
    )
    with pytest.raises(TypeError, match="use_kernel"):
        hh.solve(hh.PricingProblem(grid, _problem().market_inputs), method)


def test_use_kernel_solve_cpu_fallback_matches_pure_jax():
    """Off-TPU the adapter must price identically to the pure-JAX strategy
    (same key derivation, same estimator)."""
    prob = _problem()
    cfg = _config(qmc=False, paths=2048, steps=8)
    p_kernel = hh.solve(
        prob, hh.MonteCarlo(hh.RoughBergomiDynamics(),
                            hh.RoughBergomiMixing(use_kernel=True), cfg)
    ).price
    p_pure = hh.solve(
        prob, hh.MonteCarlo(hh.RoughBergomiDynamics(),
                            hh.RoughBergomiMixing(), cfg)
    ).price
    np.testing.assert_allclose(float(p_kernel), float(p_pure), rtol=1e-12)


# ---------------------------------------------------------------- greeks


def _kernel_fd(cfg, nb, nbat, name, h, base=None):
    """Central FD of the price kernel in the named market parameter, on the
    identical QMC stream (smooth in every parameter, so FD is clean)."""
    from hedgehog_tpu.ops.rbergomi_kernel import rbergomi_mixing_vanilla_price

    vals = dict(spot=100.0, xi0=0.04, eta=1.5, rho=-0.7, hurst=0.1, rate=0.03)
    if base:
        vals.update(base)

    def price(**kw):
        v = dict(vals)
        v.update(kw)
        mkt = hh.RoughBergomiInputs(REF, v["rate"], v["spot"], v["xi0"],
                                    v["eta"], v["hurst"], v["rho"])
        opt = hh.VanillaOption(100.0, EXPIRY, hh.European(), hh.Call(), hh.Spot())
        ins = _rb_trace_inputs(hh.PricingProblem(opt, mkt), cfg, 64)[:-1]
        return float(rbergomi_mixing_vanilla_price(
            *ins, n_blocks=nb, n_batches=nbat, steps=cfg.steps,
            seed=cfg.seed, qmc=True, interpret=True,
        ))

    return (price(**{name: vals[name] + h}) - price(**{name: vals[name] - h})) / (2 * h)


def test_greeks_kernel_is_the_pathwise_derivative_of_the_price_kernel():
    """Forward-mode tangents must equal central FD of the price kernel on
    the SAME QMC stream — this pins the tangent algebra (dL/dH matmul, the
    eta/H log-derivative chains, the value-stage partials) independently of
    fp32 estimator noise.  rho/hurst tolerances are FD-noise-bound (their
    per-path chains are large with cancelling signs)."""
    from hedgehog_tpu.ops.rbergomi_kernel import rbergomi_kernel_price_and_greeks

    n, nb, nbat = 8, 2, 1
    cfg = _config(steps=n, seed=3)
    prob = _problem()
    price, greeks = rbergomi_kernel_price_and_greeks(
        prob, cfg, n_blocks=nb, n_batches=nbat, interpret=True
    )
    assert set(greeks) == {"spot", "xi0", "eta", "rho", "hurst", "rate"}
    for name, h, rtol in (("xi0", 1e-4, 1e-4), ("eta", 3e-3, 2e-3),
                          ("rate", 1e-4, 1e-3), ("spot", 0.2, 2e-3),
                          ("rho", 2e-3, 3e-2), ("hurst", 2e-4, 2e-2)):
        fd = _kernel_fd(cfg, nb, nbat, name, h)
        np.testing.assert_allclose(float(greeks[name]), fd, rtol=rtol,
                                   err_msg=name)


def test_greeks_kernel_price_matches_price_kernel_and_pure_grad():
    """The fused kernel's price must equal the price-only kernel to f64
    reduction-order noise (the in-kernel fp32 accumulations are bit-identical
    — same stream, same algebra incl. the rcp-mirrored antithetic group —
    only the host-side f64 sum order differs), and the big greeks
    (spot, xi0, rate) must
    agree with jax.grad of the pure-JAX f64 estimator on the same points
    (small greeks with per-path cancellation are fp32-noise-bound at this
    path count and are pinned by the FD test above instead)."""
    from hedgehog_tpu.market.rate_curve import df_yf
    from hedgehog_tpu.ops.rbergomi_kernel import (
        rbergomi_kernel_price_and_greeks,
        rbergomi_mixing_vanilla_price,
    )

    n, nb, nbat = 8, 2, 1
    cfg = _config(steps=n, seed=3)
    prob = _problem()
    price, greeks = rbergomi_kernel_price_and_greeks(
        prob, cfg, n_blocks=nb, n_batches=nbat, interpret=True
    )
    ins = _rb_trace_inputs(prob, cfg, 64)[:-1]
    p_only = rbergomi_mixing_vanilla_price(
        *ins, n_blocks=nb, n_batches=nbat, steps=n, seed=cfg.seed,
        qmc=True, interpret=True,
    )
    np.testing.assert_allclose(np.float64(price), np.float64(p_only), rtol=1e-8)

    opt = hh.VanillaOption(100.0, EXPIRY, hh.European(), hh.Call(), hh.Spot())
    paths = 2 * nb * nbat * 2048
    cfgp = hh.SimulationConfig(trajectories=paths, steps=n,
                               variance_reduction=hh.Antithetic(), seed=3,
                               qmc=True)
    T = hh.yearfrac(REF, EXPIRY)

    def pure(spot, xi0, rate):
        mkt = hh.RoughBergomiInputs(REF, rate, spot, xi0, 1.5, 0.1, -0.7)
        vals = _rbergomi_mixing_values(
            hh.PricingProblem(opt, mkt), cfgp, jax.random.PRNGKey(3),
            quad_nodes=64,
        )
        return jnp.exp(-rate * T) * jnp.mean(vals)

    g = jax.grad(pure, argnums=(0, 1, 2))(100.0, 0.04, 0.03)
    np.testing.assert_allclose(float(greeks["spot"]), float(g[0]), rtol=3e-3)
    np.testing.assert_allclose(float(greeks["xi0"]), float(g[1]), rtol=3e-3)
    np.testing.assert_allclose(float(greeks["rate"]), float(g[2]), rtol=3e-3)


def test_greeks_kernel_guards():
    from hedgehog_tpu.ops.rbergomi_kernel import rbergomi_kernel_price_and_greeks

    cfg = _config(steps=8)
    curve = hh.ForwardVarianceCurve(
        tenors=jnp.asarray([0.5, 1.0]), xi=jnp.asarray([0.04, 0.05])
    )
    with pytest.raises(TypeError, match="scalar xi0"):
        rbergomi_kernel_price_and_greeks(
            _problem(xi0=curve), cfg, n_blocks=1, n_batches=1, interpret=True
        )
    with pytest.raises(ValueError, match="steps >= 2"):
        rbergomi_kernel_price_and_greeks(
            _problem(), _config(steps=1), n_blocks=1, n_batches=1, interpret=True
        )


# ----------------------------------------------------------------- smile


def test_smile_kernel_matches_per_strike_price_kernel():
    """One V-path simulation closes every strike: the smile kernel must
    reproduce the single-strike price kernel point-by-point on the same
    QMC stream (only the value stage is K-dependent)."""
    from hedgehog_tpu.ops.rbergomi_kernel import rbergomi_kernel_smile

    n, nb, nbat = 8, 2, 1
    cfg = _config(steps=n, seed=3)
    strikes = [85.0, 100.0, 125.0]
    smile = rbergomi_kernel_smile(
        _problem(), cfg, strikes, n_blocks=nb, n_batches=nbat, interpret=True
    )
    assert smile.shape == (3,)
    mkt = _problem().market_inputs
    for k_idx, K in enumerate(strikes):
        opt = hh.VanillaOption(K, EXPIRY, hh.European(), hh.Call(), hh.Spot())
        ins = _rb_trace_inputs(hh.PricingProblem(opt, mkt), cfg, 64)[:-1]
        want = rbergomi_mixing_vanilla_price(
            *ins, n_blocks=nb, n_batches=nbat, steps=n, seed=cfg.seed,
            qmc=True, interpret=True,
        )
        np.testing.assert_allclose(float(smile[k_idx]), float(want), rtol=2e-6)
    # monotone in strike for calls — the strike-grid wiring is ordered
    assert float(smile[0]) > float(smile[1]) > float(smile[2])


# ----------------------------------------------------------- weighted VJP


def _weighted_ref(steps, n_pairs, seed, ct, cp=1.0):
    """f64 pure-JAX weighted sum over the SAME Sobol' points as the kernel,
    as a function of the 8 differentiable scalars — the AD oracle for the
    cotangent-weighted VJP kernel (incl. the maturity chain, which the
    problem-level estimator hides behind concrete dates)."""
    from jax.scipy.special import ndtri
    from jax.scipy.stats import norm

    from hedgehog_tpu.math.sobol import sobol_uniforms
    from hedgehog_tpu.models.rough_bergomi import _pow, volterra_chol

    n = steps

    def f(p):
        spot, xi0v, eta, hurst, rho, r0, T, k = tuple(p)
        chol = volterra_chol(hurst, T, n, quad_nodes=64)
        u = sobol_uniforms(jax.random.PRNGKey(seed), n_pairs, 2 * n, skip=0)
        xi = ndtri(u).T  # (2n, P)
        x = jnp.stack([chol @ xi, -(chol @ xi)])  # antithetic groups
        dw, z = x[:, :n], x[:, n:]
        z_left = jnp.concatenate([jnp.zeros_like(z[:, :1]), z[:, : n - 1]], 1)
        t_left = (jnp.arange(n) / n) * T
        t2h = _pow(t_left, 2.0 * hurst)[None, :, None]
        v = xi0v * jnp.exp(eta * z_left - 0.5 * eta**2 * t2h)
        iv = jnp.sum(v, axis=1) * (T / n)
        j = jnp.sum(jnp.sqrt(v) * dw, axis=1)
        e_arg = rho * j - 0.5 * rho**2 * iv
        f_eff = spot * jnp.exp(r0 * T) * jnp.exp(e_arg)
        var = (1.0 - rho**2) * iv
        sd = jnp.sqrt(var)
        d1 = (jnp.log(spot * jnp.exp(r0 * T) / k) + e_arg + 0.5 * var) / sd
        d2 = d1 - sd
        y = cp * (f_eff * norm.cdf(cp * d1) - k * norm.cdf(cp * d2))
        return jnp.sum(ct * y)

    return f


def test_weighted_vjp_qmc_matches_pure_jax_grad():
    """The cotangent-weighted VJP kernel (custom-vjp backward of the values
    kernel) must match jax.grad of the SAME weighted sum through the
    pure-JAX Sobol' path for ALL 8 scalars — spot, xi0, eta, hurst, rho,
    r0, T (the self-similar maturity chain) and strike."""
    from hedgehog_tpu.ops.rbergomi_kernel import _rb_values_vjp

    steps, n_pairs, seed = 8, 2048, 5
    T = float(hh.yearfrac(REF, EXPIRY))
    idx = jnp.arange(2 * n_pairs, dtype=jnp.float64).reshape(2, n_pairs)
    ct = 0.5 + 0.5 * jnp.sin(idx)  # arbitrary smooth per-path cotangents

    p0 = jnp.array([100.0, 0.04, 1.5, 0.1, -0.7, 0.03, T, 95.0], jnp.float64)
    got = _rb_values_vjp(
        *tuple(p0), 1.0, ct, n_paths=n_pairs, steps=steps, seed=seed,
        antithetic=True, qmc=True, interpret=True,
    )
    want = jax.grad(_weighted_ref(steps, n_pairs, seed, ct))(p0)
    for name, g, w in zip(
        ("spot", "xi0", "eta", "hurst", "rho", "r0", "T", "strike"),
        got, tuple(want),
    ):
        assert float(g) == pytest.approx(float(w), rel=2e-2, abs=5e-2), name


def test_values_diff_grad_through_kernel_backed_reduction():
    """End-to-end: jax.grad of a reduction of rbergomi_mixing_values_diff
    (the view the TPU adapter serves) agrees with the pure-JAX oracle, and
    the primal is bit-identical to the primal values kernel."""
    from hedgehog_tpu.ops.rbergomi_kernel import (
        _rb_trace_inputs,
        rbergomi_mixing_values_diff,
    )

    steps, n_pairs, seed = 8, 2048, 5
    T = float(hh.yearfrac(REF, EXPIRY))
    cfg = _config(paths=n_pairs, steps=steps, seed=seed)
    prob = _problem(
        hh.VanillaOption(95.0, EXPIRY, hh.European(), hh.Call(), hh.Spot())
    )

    def diff_vals(p):
        spot, xi0v, eta, hurst, rho, r0, T, k = tuple(p)
        return rbergomi_mixing_values_diff(
            spot, xi0v, eta, hurst, rho, r0, T, k, 1.0,
            n_paths=n_pairs, steps=steps, seed=seed, antithetic=True,
            qmc=True, interpret=True,
        )

    p0 = jnp.array([100.0, 0.04, 1.5, 0.1, -0.7, 0.03, T, 95.0], jnp.float64)

    # primal identity vs the production trace path
    ins = _rb_trace_inputs(prob, cfg, 64)
    chol, coefs, eta, dtau, f_base, lfk, strike, cp, rho, _d, _T = ins
    want_vals = rbergomi_mixing_values(
        chol, coefs, eta, dtau, f_base, lfk, strike, cp, rho,
        n_paths=n_pairs, steps=steps, seed=seed, antithetic=True, qmc=True,
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(diff_vals(p0)), np.asarray(want_vals), rtol=0, atol=2e-5
    )

    ct = jnp.ones((2, n_pairs)) / (2.0 * n_pairs)
    got = jax.grad(lambda p: jnp.sum(ct * diff_vals(p)))(p0)
    want = jax.grad(_weighted_ref(steps, n_pairs, seed, ct))(p0)
    for name, g, w in zip(
        ("spot", "xi0", "eta", "hurst", "rho", "r0", "T", "strike"),
        tuple(got), tuple(want),
    ):
        assert float(g) == pytest.approx(float(w), rel=2e-2, abs=1e-3), name


@pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="pltpu.prng_* has no interpret-mode lowering on CPU; the PRNG "
    "replay shares every line with the QMC variant but the draw source",
)
def test_weighted_vjp_prng_matches_kernel_fd():
    """PRNG variant (no Sobol' oracle): the weighted VJP on the kernel's own
    PRNG stream must match central finite differences of the primal values
    kernel re-run at the SAME seed — covers the single-group (non-antithetic)
    replay too.  Only VPU-side parameters (eta) admit small-step FD on real
    TPU: chol-perturbing parameters (hurst, T) hit the MXU's f32-matmul
    quantization (~1e-3-relative price wobble, measured), so hurst gets a
    LARGE step and a loose bound (its exact check is the QMC oracle test)."""
    from hedgehog_tpu.ops.rbergomi_kernel import (
        _rb_values_vjp,
        rbergomi_mixing_values_diff,
    )

    steps, n_paths, seed = 4, 2048, 11
    T, cp = 0.75, 1.0
    ct = jnp.ones((1, n_paths)) / n_paths

    def price(eta, hurst):
        vals = rbergomi_mixing_values_diff(
            100.0, 0.04, eta, hurst, -0.7, 0.03, T, 100.0, cp,
            n_paths=n_paths, steps=steps, seed=seed, antithetic=False,
            qmc=False,
        )
        return jnp.sum(ct * vals)

    g = _rb_values_vjp(
        100.0, 0.04, 1.5, 0.1, -0.7, 0.03, T, 100.0, cp, ct,
        n_paths=n_paths, steps=steps, seed=seed, antithetic=False,
        qmc=False,
    )
    h = 1e-3
    fd_eta = (price(1.5 + h, 0.1) - price(1.5 - h, 0.1)) / (2 * h)
    assert float(g[2]) == pytest.approx(float(fd_eta), rel=3e-3, abs=2e-4)
    hh_ = 0.05
    fd_hurst = (price(1.5, 0.1 + hh_) - price(1.5, 0.1 - hh_)) / (2 * hh_)
    assert float(g[3]) == pytest.approx(float(fd_hurst), rel=0.5, abs=3e-2)


def test_weighted_vjp_curve_bucket_vegas_match_pure_jax_grad():
    """Per-step VJP variant under a bucketed forward-variance curve: jax.grad
    through rbergomi_mixing_values_diff_curve must return the BUCKET vegas
    ∂/∂ξᵢ (plus tenor/maturity chains through the sliding spine) matching
    the pure-JAX oracle on the same Sobol' points."""
    from jax.scipy.special import ndtri
    from jax.scipy.stats import norm

    from hedgehog_tpu.math.sobol import sobol_uniforms
    from hedgehog_tpu.models.rough_bergomi import _pow, volterra_chol
    from hedgehog_tpu.ops.rbergomi_kernel import (
        rbergomi_mixing_values_diff_curve,
    )

    steps, n_pairs, seed = 8, 2048, 5
    T = float(hh.yearfrac(REF, EXPIRY))
    n = steps
    idx = jnp.arange(2 * n_pairs, dtype=jnp.float64).reshape(2, n_pairs)
    ct = (0.5 + 0.5 * jnp.sin(idx)) / (2.0 * n_pairs)
    cp = 1.0

    def oracle(spot, xi, tenors, eta, hurst, rho, r0, Tv, k):
        chol = volterra_chol(hurst, Tv, n, quad_nodes=64)
        u = sobol_uniforms(jax.random.PRNGKey(seed), n_pairs, 2 * n, skip=0)
        z_std = ndtri(u).T
        x = jnp.stack([chol @ z_std, -(chol @ z_std)])
        dw, z = x[:, :n], x[:, n:]
        z_left = jnp.concatenate([jnp.zeros_like(z[:, :1]), z[:, : n - 1]], 1)
        t_left = (jnp.arange(n) / n) * Tv
        level = jnp.interp(t_left, tenors, xi)[None, :, None]
        t2h = _pow(t_left, 2.0 * hurst)[None, :, None]
        v = level * jnp.exp(eta * z_left - 0.5 * eta**2 * t2h)
        iv = jnp.sum(v, axis=1) * (Tv / n)
        j = jnp.sum(jnp.sqrt(v) * dw, axis=1)
        e_arg = rho * j - 0.5 * rho**2 * iv
        f_eff = spot * jnp.exp(r0 * Tv) * jnp.exp(e_arg)
        var = (1.0 - rho**2) * iv
        sd = jnp.sqrt(var)
        d1 = (jnp.log(spot * jnp.exp(r0 * Tv) / k) + e_arg + 0.5 * var) / sd
        y = cp * (f_eff * norm.cdf(cp * d1) - k * norm.cdf(cp * (d1 - sd)))
        return jnp.sum(ct * y)

    def kernel_sum(spot, xi, tenors, eta, hurst, rho, r0, Tv, k):
        vals = rbergomi_mixing_values_diff_curve(
            spot, xi, tenors, eta, hurst, rho, r0, Tv, k, cp,
            n_paths=n_pairs, steps=steps, seed=seed, antithetic=True,
            qmc=True, interpret=True,
        )
        return jnp.sum(ct * vals)

    xi = jnp.array([0.04, 0.05, 0.035])
    tenors = jnp.array([0.1, 0.5, 1.0])
    args = (100.0, xi, tenors, 1.5, 0.1, -0.7, 0.03, T, 95.0)
    argnums = tuple(range(9))
    got = jax.grad(kernel_sum, argnums=argnums)(*args)
    want = jax.grad(oracle, argnums=argnums)(*args)
    names = ("spot", "xi", "tenors", "eta", "hurst", "rho", "r0", "T", "strike")
    for name, g, w in zip(names, got, want):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=2e-2, atol=1e-4,
            err_msg=name,
        )
