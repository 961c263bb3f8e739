"""hedgehog_tpu — a TPU-native derivatives-pricing framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of Hedgehog.jl
(reference layout: /root/reference/src/Hedgehog.jl): one `solve(problem,
method)` entry point over analytic Black-Scholes, CRR binomial trees,
Monte Carlo (Euler-Maruyama and exact samplers incl. Broadie-Kaya Heston),
Carr-Madan Fourier pricing and Longstaff-Schwartz LSM, with AD/FD/analytic
Greeks through functional lenses and differentiable calibration — every
method a jit/vmap-able XLA program, hot paths as Pallas TPU kernels, and
path-sharded multi-chip scaling via jax.sharding.
"""

import jax as _jax

# Tick arithmetic (~6.4e13 ms) and 1e-8 pricing goldens require float64.
# Pallas kernels opt into fp32 fast paths explicitly.
_jax.config.update("jax_enable_x64", True)

from .core.dates import (  # noqa: E402
    ACT365F,
    MILLISECONDS_IN_DAY,
    MILLISECONDS_IN_YEAR_365,
    SECONDS_IN_YEAR_365,
    Act360,
    Act365Fixed,
    Act36525,
    ActActISDA,
    DayCount,
    Thirty360E,
    add_yearfrac,
    ticks_to_datetime,
    to_ticks,
    yearfrac,
)
from .core.payoffs import (  # noqa: E402
    American,
    ArithmeticAverage,
    AsianOption,
    BarrierOption,
    Cliquet,
    ForwardStartOption,
    VarianceSwap,
    Call,
    DigitalOption,
    Down,
    European,
    Forward,
    GeometricAverage,
    KnockIn,
    KnockOut,
    Put,
    Spot,
    Up,
    VanillaOption,
    parity_transform,
)
from .market.rate_curve import (  # noqa: E402
    FlatRateCurve,
    RateCurve,
    df,
    df_yf,
    forward_rate,
    is_flat,
    spine_tenors,
    spine_zeros,
    zero_rate,
    zero_rate_yf,
)
from .market.vol_surface import (  # noqa: E402
    FlatVolSurface,
    Interpolator2D,
    RectVolSurface,
    get_vol,
    get_vol_yf,
    spine_strikes,
    spine_vols,
    surface_spine_tenors,
)
from .market.inputs import (  # noqa: E402
    AbstractMarketInputs,
    BlackScholesInputs,
    HestonInputs,
    MertonInputs,
    SABRInputs,
    market_yearfrac,
)
from .market.vol_quotes import (  # noqa: E402
    ForwardObs,
    FuturesObs,
    ResolvedQuotes,
    SpotObs,
    VolQuote,
    VolQuoteConfig,
    iv_to_price,
    price_to_iv,
    resolve_quotes_batch,
    underlying_forward,
    underlying_spot,
)
from .core.problems import (  # noqa: E402
    AnalyticSolution,
    BasketPricingProblem,
    BasketPricingSolution,
    CarrMadanSolution,
    CRRSolution,
    LSMSolution,
    MonteCarloSolution,
    PricingProblem,
)
from .core.lenses import (  # noqa: E402
    FieldLens,
    Lens,
    SpotLens,
    VolLens,
    ZeroRateSpineLens,
    lens_get,
    lens_set,
)
from .core.solve import AbstractPricingMethod, register_solver, solve  # noqa: E402
from .methods.black_scholes import BlackScholesAnalytic  # noqa: E402
from .methods.crr import CoxRossRubinsteinMethod  # noqa: E402
from .methods.merton import MertonAnalytic  # noqa: E402
from .methods.sabr import SABRAnalytic, hagan_vol  # noqa: E402
from .models.local_vol import dupire_local_vol  # noqa: E402
from .models.dynamics import (  # noqa: E402
    HestonDynamics,
    LognormalDynamics,
    LocalVolDynamics,
    MertonJumpDynamics,
    SABRDynamics,
    heston_cf,
    lognormal_cf,
)
from .methods.carr_madan import CarrMadan, carr_madan_error_estimate  # noqa: E402
from .methods.lsm import LSM  # noqa: E402
from .calibration.calibration import (  # noqa: E402
    CalibrationProblem,
    CalibrationSolution,
    OptimizerAlgo,
    RootFinderAlgo,
)
from .calibration.implied import (  # noqa: E402
    implied_vol,
    implied_vol_bs,
    iv_to_price_bs,
    rect_vol_surface_from_prices,
)
from .math.rootfind import bisect_root, implicit_root  # noqa: E402
from .math.optimize import minimize_lbfgs  # noqa: E402
from .methods.mixing_greeks import (  # noqa: E402
    heston_exact_price_and_greeks,
    heston_mixing_price_and_greeks,
)
from .methods.montecarlo import (  # noqa: E402
    Antithetic,
    BlackScholesExact,
    MertonExact,
    EulerMaruyama,
    HestonBroadieKaya,
    HestonExactMixing,
    HestonQE,
    MonteCarlo,
    NoVarianceReduction,
    SimulationConfig,
    heston_surface_mc,
    heston_variance_swap_strike,
    mc_path_values,
    simulate_conditional_values,
    simulate_price_grid,
    simulate_terminal_prices,
)
from .greeks.greeks import (  # noqa: E402
    AnalyticGreek,
    BatchGreekProblem,
    FDBackward,
    FDCentral,
    FDForward,
    FiniteDifference,
    ForwardAD,
    GreekProblem,
    GreekResult,
    ReverseAD,
    SecondOrderGreekProblem,
)

__all__ = [
    # dates
    "SECONDS_IN_YEAR_365",
    "MILLISECONDS_IN_YEAR_365",
    "MILLISECONDS_IN_DAY",
    "to_ticks",
    "yearfrac",
    "add_yearfrac",
    "ticks_to_datetime",
    # day-count conventions (beyond-reference; the reference is ACT/365-only)
    "DayCount",
    "Act365Fixed",
    "Act360",
    "Act36525",
    "Thirty360E",
    "ActActISDA",
    "ACT365F",
    # payoffs
    "VanillaOption",
    "DigitalOption",
    "BarrierOption",
    "Up",
    "Down",
    "KnockIn",
    "KnockOut",
    "AsianOption",
    "VarianceSwap",
    "ForwardStartOption",
    "Cliquet",
    "ArithmeticAverage",
    "GeometricAverage",
    "European",
    "American",
    "Call",
    "Put",
    "Spot",
    "Forward",
    "parity_transform",
    # market
    "RateCurve",
    "FlatRateCurve",
    "df",
    "df_yf",
    "zero_rate",
    "zero_rate_yf",
    "forward_rate",
    "is_flat",
    "spine_tenors",
    "spine_zeros",
    "spine_strikes",
    "spine_vols",
    "surface_spine_tenors",
    "AbstractMarketInputs",
    "implied_vol",
    "FlatVolSurface",
    "RectVolSurface",
    "Interpolator2D",
    "get_vol",
    "get_vol_yf",
    "BlackScholesInputs",
    "HestonInputs",
    "MertonInputs",
    "SABRInputs",
    "market_yearfrac",
    # market data / quotes
    "SpotObs",
    "ForwardObs",
    "FuturesObs",
    "VolQuote",
    "VolQuoteConfig",
    "ResolvedQuotes",
    "resolve_quotes_batch",
    "iv_to_price",
    "price_to_iv",
    "underlying_spot",
    "underlying_forward",
    # problems / solutions
    "PricingProblem",
    "BasketPricingProblem",
    "BasketPricingSolution",
    "AnalyticSolution",
    "CRRSolution",
    "MonteCarloSolution",
    "CarrMadanSolution",
    "LSMSolution",
    # lenses
    "Lens",
    "FieldLens",
    "SpotLens",
    "VolLens",
    "ZeroRateSpineLens",
    "lens_get",
    "lens_set",
    # solve facade
    "solve",
    "register_solver",
    "AbstractPricingMethod",
    # methods
    "BlackScholesAnalytic",
    "CoxRossRubinsteinMethod",
    "MertonAnalytic",
    "SABRAnalytic",
    "hagan_vol",
    # dynamics & MC
    "LognormalDynamics",
    "HestonDynamics",
    "MertonJumpDynamics",
    "SABRDynamics",
    "LocalVolDynamics",
    "dupire_local_vol",
    "heston_cf",
    "lognormal_cf",
    "CarrMadan",
    "carr_madan_error_estimate",
    "LSM",
    # calibration & solvers
    "CalibrationProblem",
    "CalibrationSolution",
    "OptimizerAlgo",
    "RootFinderAlgo",
    "implied_vol_bs",
    "iv_to_price_bs",
    "rect_vol_surface_from_prices",
    "bisect_root",
    "implicit_root",
    "minimize_lbfgs",
    "MonteCarlo",
    "SimulationConfig",
    "EulerMaruyama",
    "HestonQE",
    "BlackScholesExact",
    "HestonBroadieKaya",
    "MertonExact",
    "HestonExactMixing",
    "NoVarianceReduction",
    "Antithetic",
    "simulate_terminal_prices",
    "simulate_conditional_values",
    "mc_path_values",
    "heston_surface_mc",
    "heston_variance_swap_strike",
    "heston_exact_price_and_greeks",
    "heston_mixing_price_and_greeks",
    "simulate_price_grid",
    # greeks
    "GreekProblem",
    "SecondOrderGreekProblem",
    "BatchGreekProblem",
    "GreekResult",
    "ForwardAD",
    "ReverseAD",
    "FiniteDifference",
    "AnalyticGreek",
    "FDForward",
    "FDBackward",
    "FDCentral",
]
