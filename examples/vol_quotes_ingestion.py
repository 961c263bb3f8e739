"""Market-quote ingestion: bid/mid/ask resolution, policies, batch mode.

Mirrors the reference's vol-quote layer (src/market_data/vol_quotes.jl):
quotes arrive as any mix of prices and implied vols (NaN = missing), get
resolved into consistent (price, IV) pairs, and configurable policies decide
what happens on inconsistent or non-monotone inputs.  The batch resolver
does a whole surface in ONE XLA program.

Run: PYTHONPATH=. python examples/vol_quotes_ingestion.py
"""

import datetime as dt
import warnings

import jax.numpy as jnp
import numpy as np

import hedgehog_tpu as hh

REF = dt.date(2024, 1, 1)
EXPIRY = dt.date(2024, 7, 1)
SPOT, RATE = 100.0, 0.03

# ---- scalar convenience path: one quote, full policy machinery ----------
payoff = hh.VanillaOption(105.0, EXPIRY, hh.European(), hh.Call(), hh.Spot())
q = hh.VolQuote.build(
    payoff, hh.SpotObs(SPOT), RATE, reference_date=REF,
    mid_price=4.10, bid_iv=0.19, ask_iv=0.23,
)
print("scalar quote: mid given as price, bid/ask as IVs")
print(f"  bid  (p, iv) = ({q.bid_price:.4f}, {q.bid_iv:.4f})")
print(f"  mid  (p, iv) = ({q.mid_price:.4f}, {q.mid_iv:.4f})")
print(f"  ask  (p, iv) = ({q.ask_price:.4f}, {q.ask_iv:.4f})")

# an inconsistent quote under the warn policy
cfg = hh.VolQuoteConfig(vol_price_inconsistency_handling="warn")
with warnings.catch_warnings(record=True) as caught:
    warnings.simplefilter("always")
    hh.VolQuote.build(
        payoff, hh.SpotObs(SPOT), RATE, reference_date=REF,
        mid_price=4.10, mid_iv=0.50, config=cfg,
    )
print(f"\ninconsistent (price, iv) pair under 'warn': {len(caught)} warning(s):")
print(f"  {caught[0].message}")

# ---- batch path: a whole surface in one XLA call ------------------------
strikes = jnp.array([90.0, 95.0, 100.0, 105.0, 110.0])
expiries = jnp.full(5, hh.to_ticks(EXPIRY))
true_iv = jnp.array([0.26, 0.23, 0.21, 0.20, 0.195])  # a skew
mid_price = hh.iv_to_price(
    hh.VanillaOption(strikes, EXPIRY, hh.European(), hh.Call(), hh.Spot()),
    SPOT, RATE, true_iv, REF,
)
mid_price = jnp.where(jnp.arange(5) == 2, jnp.nan, mid_price)  # one missing price
mid_iv_in = jnp.where(jnp.arange(5) == 2, 0.21, jnp.nan)       # ...given as IV

res = hh.resolve_quotes_batch(
    strikes, expiries, hh.SpotObs(SPOT), RATE, REF,
    mid_price=mid_price, mid_iv=mid_iv_in,
)
print("\nbatched surface resolution (one XLA program):")
print("  K      given            resolved price  resolved IV   true IV")
for i in range(5):
    given = "price" if not np.isnan(float(mid_price[i])) else "IV"
    print(
        f"  {float(strikes[i]):5.1f}  {given:14s}  {float(res.mid_price[i]):10.4f}"
        f"      {float(res.mid_iv[i]):.4f}       {float(true_iv[i]):.4f}"
    )
