"""Quotes → implied-vol surface → reprice (mirrors reference
examples/implied_vol.jl + iv_round.jl): builds a skewed surface from option
prices in ONE batched solve, then prices off the calibrated surface."""

import datetime as dt

import jax.numpy as jnp

import hedgehog_tpu as hh

REF = dt.date(2024, 1, 1)


def main():
    tenors = jnp.array([0.25, 0.5, 1.0, 2.0])
    strikes = jnp.array([80.0, 90.0, 100.0, 110.0, 120.0])
    spot, r = 100.0, 0.03
    true_vols = (
        0.2
        + 0.05 * jnp.abs(jnp.log(strikes[None, :] / spot))
        + 0.02 * jnp.sqrt(tenors[:, None])
    )
    quotes = hh.iv_to_price_bs(true_vols, strikes[None, :], tenors[:, None], spot, r)
    surf = hh.rect_vol_surface_from_prices(REF, r, spot, tenors, strikes, quotes)
    err = float(jnp.max(jnp.abs(surf.vols - true_vols)))
    print(f"inverted {quotes.size} quotes in one batched solve; max |iv err| = {err:.2e}")

    market = hh.BlackScholesInputs(REF, r, spot, surf)
    opt = hh.VanillaOption(95.0, hh.add_yearfrac(REF, 0.75), hh.European(), hh.Put(), hh.Spot())
    price = hh.solve(hh.PricingProblem(opt, market), hh.BlackScholesAnalytic()).price
    print(f"K=95 9M put off the calibrated surface: {float(price):.4f} "
          f"(interp vol = {float(hh.get_vol_yf(surf, 0.75, 95.0)):.4f})")


if __name__ == "__main__":
    main()
