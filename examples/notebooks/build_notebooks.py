#!/usr/bin/env python
"""Build + execute the interactive notebooks (reference-parity artifact:
/root/reference ships Pluto notebooks + docs/src/interactive.md; these are
the jupyter analogs, executed clean on CPU).

Sources of truth: docs/walkthrough.md (the end-to-end story) and
examples/structured_desk.py (the desk-day story).  Cells are authored here
as (kind, text) pairs — no jupytext dependency — converted with nbformat and
executed with nbclient on an 8-virtual-device CPU mesh so the sharded
sections run for real.

Run:  PYTHONPATH=/root/repo python examples/notebooks/build_notebooks.py
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["PYTHONPATH"] = _REPO + (
    os.pathsep + os.environ["PYTHONPATH"] if os.environ.get("PYTHONPATH") else ""
)

import nbformat
from nbclient import NotebookClient

HERE = os.path.dirname(os.path.abspath(__file__))


def build(name, cells):
    nb = nbformat.v4.new_notebook()
    nb.metadata["kernelspec"] = {
        "name": "python3", "display_name": "Python 3", "language": "python",
    }
    for kind, text in cells:
        if kind == "md":
            nb.cells.append(nbformat.v4.new_markdown_cell(text.strip()))
        else:
            nb.cells.append(nbformat.v4.new_code_cell(text.strip()))
    client = NotebookClient(nb, timeout=1200, kernel_name="python3")
    client.execute()
    path = os.path.join(HERE, name)
    nbformat.write(nb, path)
    print(f"wrote {path} ({len(nb.cells)} cells, executed clean)")


WALKTHROUGH = [
    ("md", """
# End-to-end walkthrough: Heston from quotes to sharded greeks

The notebook form of `docs/walkthrough.md` (reference-parity artifact:
the upstream library ships Pluto notebooks — docs/src/interactive.md).
It follows one Heston market through the whole stack: quotes → surface →
price (four methods) → greek vector → calibration → multi-chip scaling.
Runs on CPU with an 8-virtual-device mesh; on TPU the same code routes to
the fused Pallas kernels.
"""),
    ("code", """
import datetime as dt
import jax, jax.numpy as jnp
import hedgehog_tpu as hh

REF, EXPIRY = dt.date(2024, 1, 1), dt.date(2025, 1, 1)
jax.devices()
"""),
    ("md", """
## 1. Ingest market quotes (vol_quotes.jl)

A whole bid/mid/ask surface resolves in one batched program — every missing
side is implied from the other, with `throw|warn|ignore` policy checks.
"""),
    ("code", """
strikes  = jnp.array([90.0, 100.0, 110.0])
expiries = jnp.array([hh.add_yearfrac(hh.to_ticks(REF), t) for t in (0.5, 0.5, 0.5)])
res = hh.resolve_quotes_batch(
    strikes, expiries, hh.SpotObs(100.0), 0.03, REF,
    mid_price=jnp.array([12.3, 6.1, 2.6]),
)
res.mid_iv   # implied vols, one bisection for the whole surface
"""),
    ("md", """
## 2. Build market inputs (market_inputs/*.jl)
"""),
    ("code", """
market = hh.HestonInputs(REF, 0.03, 100.0, 0.04, 2.0, 0.04, 0.3, -0.7)
#                        ref  rate  spot  V0   kappa theta sigma rho
payoff = hh.VanillaOption(100.0, EXPIRY, hh.European(), hh.Call(), hh.Spot())
prob   = hh.PricingProblem(payoff, market)
"""),
    ("md", """
## 3. Price with every method (pricing_methods/*.jl)

Fourier oracle, QE Monte Carlo, exact Broadie-Kaya sampling, randomized-
Sobol' QMC, and the conditional (Romano-Touzi mixing) flagship — which also
prices a whole strike grid from ONE path set.
"""),
    ("code", """
cm = hh.solve(prob, hh.CarrMadan(1.0, 32.0, hh.HestonDynamics())).price

cfg = hh.SimulationConfig(trajectories=2**15, steps=10,
                          variance_reduction=hh.Antithetic(), seed=0)
mc  = hh.solve(prob, hh.MonteCarlo(hh.HestonDynamics(), hh.HestonQE(), cfg)).price
bk  = hh.solve(prob, hh.MonteCarlo(hh.HestonDynamics(),
                                   hh.HestonBroadieKaya(),
                                   hh.SimulationConfig(trajectories=2**13, steps=1,
                                                       seed=0))).price
qcfg = hh.SimulationConfig(trajectories=2**15, steps=10, seed=0, qmc=True)
mix = hh.solve(prob, hh.MonteCarlo(hh.HestonDynamics(),
                                   hh.HestonQE(conditional=True), qcfg)).price
{"carr_madan": float(cm), "qe_mc": float(mc), "broadie_kaya": float(bk),
 "mixing_qmc": float(mix)}
"""),
    ("code", """
grid_payoff = hh.VanillaOption(jnp.array([90.0, 100.0, 110.0]),
                               EXPIRY, hh.European(), hh.Call(), hh.Spot())
smile = hh.solve(hh.PricingProblem(grid_payoff, market),
                 hh.MonteCarlo(hh.HestonDynamics(),
                               hh.HestonQE(conditional=True), qcfg)).price
smile   # three strikes, one path set
"""),
    ("md", """
## 4. The full greek vector in one reverse pass (greeks_problem.jl)

Lenses rewrite any problem field immutably; `jax.grad` through the re-solve
is the whole AD story (north-star: the 7-greek vector < 2× one price on
TPU).
"""),
    ("code", """
def price(spot, v0, kappa, theta, sigma, rho, r):
    m = hh.HestonInputs(REF, r, spot, v0, kappa, theta, sigma, rho)
    return hh.solve(hh.PricingProblem(payoff, m),
                    hh.MonteCarlo(hh.HestonDynamics(), hh.HestonQE(), cfg)).price

greeks = jax.jit(jax.grad(price, argnums=(0, 1, 2, 3, 4, 5, 6)))(
    100.0, 0.04, 2.0, 0.04, 0.3, -0.7, 0.03)
dict(zip(("delta", "dV0", "dkappa", "dtheta", "vol_of_vol_vega", "drho", "rho_rate"),
         [float(g) for g in greeks]))
"""),
    ("code", """
bs_prob = hh.PricingProblem(payoff, hh.BlackScholesInputs(REF, 0.03, 100.0, 0.2))
delta = hh.solve(hh.GreekProblem(bs_prob, hh.SpotLens()), hh.ForwardAD(),
                 hh.BlackScholesAnalytic()).greek
batch = hh.solve(hh.BatchGreekProblem(bs_prob, (hh.SpotLens(), hh.VolLens())),
                 hh.ReverseAD(), hh.BlackScholesAnalytic())  # {lens: greek}, ONE pass
float(delta), {type(k).__name__: float(v) for k, v in batch.items()}
"""),
    ("md", """
## 5. Calibrate Heston to the surface (calibration.jl:74-98)

Box-bounded L-BFGS with `jax.value_and_grad` through the Fourier pricer;
scalar problems (implied vol) use `RootFinderAlgo` with IFT-differentiable
output.
"""),
    ("code", """
payoffs = [hh.VanillaOption(float(k), EXPIRY, hh.European(), hh.Call(), hh.Spot())
           for k in (80, 90, 100, 110, 120)]
basket  = hh.BasketPricingProblem(payoffs, market)
quotes  = jnp.array([hh.solve(hh.PricingProblem(p, market),
                              hh.CarrMadan(1.0, 32.0, hh.HestonDynamics())).price
                     for p in payoffs])
lenses  = tuple(hh.FieldLens(f"market_inputs.{f}") for f in
                ("V0", "kappa", "theta", "sigma", "rho"))
calib   = hh.CalibrationProblem(basket, quotes,
                                jnp.array([0.08, 1.0, 0.08, 0.5, -0.3]),
                                hh.CarrMadan(1.0, 32.0, hh.HestonDynamics()), lenses)
sol = hh.solve(calib, hh.OptimizerAlgo(max_iters=200),
               lb=jnp.array([1e-3, 0.1, 1e-3, 0.05, -0.95]),
               ub=jnp.array([0.5, 8.0, 0.5, 1.5, 0.0]))
sol.u, bool(sol.converged), int(sol.iterations)
"""),
    ("md", """
## 6. Scale across chips (SURVEY §2c)

Path sharding is the domain's data parallelism: per-device RNG streams fold
in the device index (zero communication for sampling); the only collective
is a psum of payoff sums.  This notebook runs on an 8-virtual-device CPU
mesh — the same `shard_map` program scales over ICI on a TPU slice.
"""),
    ("code", """
from hedgehog_tpu.parallel import make_paths_mesh, sharded_mc_price_fn

mesh  = make_paths_mesh()                       # all visible devices
cfg8  = hh.SimulationConfig(trajectories=2**16, steps=10, seed=0)
fn    = sharded_mc_price_fn(hh.MonteCarlo(hh.HestonDynamics(), hh.HestonQE(), cfg8), mesh)
price_sh = jax.jit(fn)(prob)
delta_sh = jax.grad(lambda s: fn(hh.SpotLens().set(prob, s)))(100.0)
mesh, float(price_sh), float(delta_sh)
"""),
    ("md", """
## 7. Exotic laws from characteristic functions (sample_from_cf.jl)

The machinery behind Broadie-Kaya's ∫V draw works for any nonnegative law
given only its CF.
"""),
    ("code", """
from hedgehog_tpu.distributions.sample_from_cf import sample_from_cf
xs = sample_from_cf(jax.random.PRNGKey(0), lambda a: (1 - 1.3j*a)**-2.5, 20_000)
float(xs.mean()), float(xs.std())   # Gamma(2.5, 1.3): mean 3.25
"""),
]


DESK = [
    ("md", """
# A structured-products desk day

Notebook form of `examples/structured_desk.py`: autocallable issue, VIX vol
hedge, and the dividend book — three workflows beyond the reference's
vanilla scope that reuse its `solve(PricingProblem(payoff, market), method)`
architecture unchanged.
"""),
    ("code", """
import datetime as dt
import jax
import hedgehog_tpu as hh

REF, EXPIRY = dt.date(2025, 1, 1), dt.date(2027, 1, 1)
R, S0 = 0.03, 100.0
"""),
    ("md", """
## 1. Issue a phoenix-memory autocallable

Priced on the conditional (Romano-Touzi) mixing grid — the V-path-only
simulation behind the TPU flagship — and risked with plain `jax.grad` (the
bridge knock-in leg is smooth, so vega flows pathwise).
"""),
    ("code", """
heston = hh.HestonInputs(REF, R, S0, V0=0.04, kappa=2.0, theta=0.05,
                         sigma=0.6, rho=-0.7)
note = hh.Autocallable(
    EXPIRY, periods=8, autocall_barrier=1.0, coupon=0.02,
    knock_in_barrier=0.7, coupon_barrier=0.8,  # phoenix-memory convention
)
mc = hh.MonteCarlo(
    hh.HestonDynamics(), hh.HestonQE(conditional=True),
    hh.SimulationConfig(trajectories=2**14, steps=64,
                        variance_reduction=hh.Antithetic(), seed=7),
)
prob = hh.PricingProblem(note, heston)
float(hh.solve(prob, mc).price)   # issue price per 1.0 notional
"""),
    ("code", """
def reprice(v0, sigma_v):
    m = hh.FieldLens("market_inputs.V0").set(prob, v0)
    m = hh.FieldLens("market_inputs.sigma").set(m, sigma_v)
    return hh.solve(m, mc).price

dV0, dsig = jax.grad(reprice, argnums=(0, 1))(0.04, 0.6)
{"dPrice/dV0": float(dV0), "dPrice/dsigma_v": float(dsig)}
"""),
    ("md", """
## 2. Hedge with a VIX call on the SAME market

`VIXAnalytic` prices the 30-day forward variance-swap root by survival-form
quadrature over the exact CIR transition — AD end-to-end, so the overlay's
vol-of-vol vega lands in the same coordinates as the note's risk.
"""),
    ("code", """
vix_exp = dt.date(2025, 7, 1)
fut = hh.solve(hh.PricingProblem(hh.VIXFuture(vix_exp), heston),
               hh.VIXAnalytic()).price
calls = {K: float(hh.solve(hh.PricingProblem(hh.VIXOption(K, vix_exp), heston),
                           hh.VIXAnalytic()).price)
         for K in (18.0, 22.0, 26.0)}
vix_vega = jax.grad(
    lambda sv: hh.solve(
        hh.PricingProblem(hh.VIXOption(22.0, vix_exp),
                          hh.FieldLens("sigma").set(heston, sv)),
        hh.VIXAnalytic(),
    ).price
)(0.6)
float(fut), calls, float(vix_vega)
"""),
    ("md", """
## 3. Mark the American-put dividend book

Discrete CASH dividends under BOTH market conventions: the spot model (PDE
drops the spot by the cash amount at each ex-date) vs Hull's escrowed model
(CRR on a PV-shifted spot).  The gap is a modelling choice desks argue
about, not numerical error.
"""),
    ("code", """
divs = hh.DividendSchedule([dt.date(2025, 7, 1), dt.date(2026, 7, 1)],
                           [2.5, 2.5])
bs_div = hh.BlackScholesInputs(REF, R, S0, 0.25, dividends=divs)
put = hh.VanillaOption(100.0, EXPIRY, hh.American(), hh.Put(), hh.Spot())
p_pde = float(hh.solve(hh.PricingProblem(put, bs_div),
                       hh.PDEMethod(space_steps=300, time_steps=120)).price)
p_crr = float(hh.solve(hh.PricingProblem(put, bs_div),
                       hh.CoxRossRubinsteinMethod(800)).price)
{"spot_model_pde": p_pde, "escrowed_crr": p_crr,
 "gap_bp": abs(p_pde - p_crr) / p_crr * 1e4}
"""),
]


if __name__ == "__main__":
    build("walkthrough.ipynb", WALKTHROUGH)
    build("structured_desk.ipynb", DESK)
    print("all notebooks executed clean")
    sys.exit(0)
