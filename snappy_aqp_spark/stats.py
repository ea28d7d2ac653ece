"""Pure-python statistical constants used by the error estimators.

The reference engine uses commons-math ``NormalDistribution`` /
``TDistribution.inverseCumulativeProbability`` for its closed-form
confidence factors (reference: src/main/scala/org/apache/spark/sql/execution/
common/ErrorAggregateFunction.scala:29-30 and closedform/closedFormError.scala:132-138).

We precompute the same constants in Python and inline them as literals into
both the Spark plan and the DuckDB oracle SQL, so the two engines are
guaranteed to use bit-identical factors.

No scipy in this environment -> small self-contained implementations:
  * normal_ppf: Acklam's rational approximation + Halley refinement (~1e-15)
  * t_ppf: bisection on the Student-t CDF computed via the regularized
    incomplete beta function (Lentz continued fraction).
"""

from __future__ import annotations

import math
from functools import lru_cache

# --- normal inverse CDF -----------------------------------------------------

_A = (-3.969683028665376e+01, 2.209460984245205e+02, -2.759285104469687e+02,
      1.383577518672690e+02, -3.066479806614716e+01, 2.506628277459239e+00)
_B = (-5.447609879822406e+01, 1.615858368580409e+02, -1.556989798598866e+02,
      6.680131188771972e+01, -1.328068155288572e+01)
_C = (-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e+00,
      -2.549732539343734e+00, 4.374664141464968e+00, 2.938163982698783e+00)
_D = (7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e+00,
      3.754408661907416e+00)


def normal_ppf(p: float) -> float:
    """Inverse standard-normal CDF, accurate to ~1ulp after refinement."""
    if not 0.0 < p < 1.0:
        raise ValueError(f"p out of range: {p}")
    p_low, p_high = 0.02425, 1 - 0.02425
    if p < p_low:
        q = math.sqrt(-2 * math.log(p))
        x = (((((_C[0] * q + _C[1]) * q + _C[2]) * q + _C[3]) * q + _C[4]) * q + _C[5]) / \
            ((((_D[0] * q + _D[1]) * q + _D[2]) * q + _D[3]) * q + 1)
    elif p <= p_high:
        q = p - 0.5
        r = q * q
        x = (((((_A[0] * r + _A[1]) * r + _A[2]) * r + _A[3]) * r + _A[4]) * r + _A[5]) * q / \
            (((((_B[0] * r + _B[1]) * r + _B[2]) * r + _B[3]) * r + _B[4]) * r + 1)
    else:
        q = math.sqrt(-2 * math.log(1 - p))
        x = -(((((_C[0] * q + _C[1]) * q + _C[2]) * q + _C[3]) * q + _C[4]) * q + _C[5]) / \
            ((((_D[0] * q + _D[1]) * q + _D[2]) * q + _D[3]) * q + 1)
    # two Halley refinement steps using the exact CDF via erfc
    for _ in range(2):
        e = 0.5 * math.erfc(-x / math.sqrt(2)) - p
        u = e * math.sqrt(2 * math.pi) * math.exp(x * x / 2)
        x = x - u / (1 + x * u / 2)
    return x


# --- regularized incomplete beta --------------------------------------------

def _betacf(a: float, b: float, x: float) -> float:
    """Continued fraction for the incomplete beta function (Lentz)."""
    MAXIT, EPS, FPMIN = 300, 3e-16, 1e-300
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < FPMIN:
        d = FPMIN
    d = 1.0 / d
    h = d
    for m in range(1, MAXIT + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < FPMIN:
            d = FPMIN
        c = 1.0 + aa / c
        if abs(c) < FPMIN:
            c = FPMIN
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < FPMIN:
            d = FPMIN
        c = 1.0 + aa / c
        if abs(c) < FPMIN:
            c = FPMIN
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < EPS:
            break
    return h


def betainc(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b)."""
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    ln_bt = (math.lgamma(a + b) - math.lgamma(a) - math.lgamma(b) +
             a * math.log(x) + b * math.log(1.0 - x))
    bt = math.exp(ln_bt)
    if x < (a + 1.0) / (a + b + 2.0):
        return bt * _betacf(a, b, x) / a
    return 1.0 - bt * _betacf(b, a, 1.0 - x) / b


def t_cdf(t: float, df: float) -> float:
    """Student-t CDF."""
    if t == 0.0:
        return 0.5
    x = df / (df + t * t)
    p = 0.5 * betainc(df / 2.0, 0.5, x)
    return 1.0 - p if t > 0 else p


@lru_cache(maxsize=4096)
def t_ppf(p: float, df: float) -> float:
    """Inverse Student-t CDF by bisection (deterministic, ~1e-13)."""
    if not 0.0 < p < 1.0:
        raise ValueError(f"p out of range: {p}")
    if p == 0.5:
        return 0.0
    lo, hi = -1.0, 1.0
    while t_cdf(lo, df) > p:
        lo *= 2
        if lo < -1e18:
            break
    while t_cdf(hi, df) < p:
        hi *= 2
        if hi > 1e18:
            break
    for _ in range(200):
        mid = 0.5 * (lo + hi)
        if t_cdf(mid, df) < p:
            lo = mid
        else:
            hi = mid
        if hi - lo <= abs(mid) * 1e-14 + 1e-300:
            break
    return 0.5 * (lo + hi)


@lru_cache(maxsize=64)
def confidence_factors(confidence: float, max_df: int = 28) -> tuple[float, tuple[float, ...]]:
    """(z, t-table) pair for a confidence level.

    z = Phi^-1(0.5 + confidence/2) used when the group sample count >= 30,
    t[df] for df in 1..max_df otherwise -- mirroring the reference's z/t
    switch at 30 (closedFormError.scala:132-138).
    """
    p = 0.5 + confidence / 2.0
    z = normal_ppf(p)
    ts = tuple(t_ppf(p, float(df)) for df in range(1, max_df + 1))
    return z, ts


# Poisson(1) CDF used by the bootstrap multiplicity column
# (reference: bootstrap/bootstrapExpressions.scala:157-225 draws Poisson(1)
# multiplicities per trial). We invert the CDF against an integer uniform
# draw so both engines compute identical multiplicities.
def poisson1_cdf_thresholds(modulus: int, max_k: int = 8) -> tuple[int, ...]:
    """Integer thresholds c_k = floor(P(Pois(1) <= k) * modulus)."""
    out = []
    acc = 0.0
    term = math.exp(-1.0)  # pmf(0)
    for k in range(0, max_k + 1):
        acc += term
        out.append(min(modulus - 1, int(acc * modulus)))
        term = term / (k + 1)
    return tuple(out)
