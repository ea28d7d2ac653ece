"""Error-limit-driven stratum sizing (StratifiedSamplerErrorLimit).

Reference semantics (execution/StratifiedSamplerErrorLimit.scala:31-42):
grow/shrink each stratum's sample so the closed-form (CLT) relative error of
a named numeric column stays under a limit at a confidence level, per
stratum independently.

Batch formulation: one exact stats pass per stratum (N, Σx, Σx² on the
quantized measure — order-independent integers), then the textbook sample
size with finite-population correction:

    n0    = (z · sd / (|mean| · e))²          (z at the confidence level)
    n_req = ceil(n0 / (1 + n0 / N))  clamped to [reservoir_size, N]

followed by a keep-the-n_req-smallest-key-hashes pick (same deterministic
ranking as the reservoir sampler). Both passes are portable SQL, so
error-limit samples replay exactly on the oracle.
"""

from __future__ import annotations

from ..dialect import dlit
from ..quant import measure_scale, pow2_literal
from ..specs import SampleSpec
from ..stats import normal_ppf


def stats_frags(spec: SampleSpec) -> dict[str, str]:
    """per-stratum aggregate fragments over the tagged base table."""
    m = measure_scale(spec.error_limit_max_abs)
    mq = (f"CAST(FLOOR(({spec.error_limit_col}) * {pow2_literal(m)}) "
          f"AS BIGINT)")
    return {
        "__eN": "CAST(COUNT(*) AS BIGINT)",
        "__esx": f"CAST(SUM({mq}) AS BIGINT)",
        "__esxx": f"CAST(SUM(({mq}) * ({mq})) AS BIGINT)",
    }


def nreq_frag(spec: SampleSpec) -> str:
    """required stratum sample size from (__eN, __esx, __esxx)."""
    m = measure_scale(spec.error_limit_max_abs)
    z = normal_ppf(0.5 + spec.error_limit_conf / 2.0)
    k_min = spec.reservoir_size
    n_d = "CAST(__eN AS DOUBLE)"
    mean = f"(CAST(__esx AS DOUBLE) * {pow2_literal(-m)} / {n_d})"
    var = (f"(CAST(__esxx AS DOUBLE) * {pow2_literal(-2 * m)} / {n_d} "
           f"- {mean} * {mean})")
    n0 = (f"(({dlit(z)} * SQRT({var}) / (ABS({mean}) * "
          f"{dlit(spec.error_limit_pct)})) * "
          f"({dlit(z)} * SQRT({var}) / (ABS({mean}) * "
          f"{dlit(spec.error_limit_pct)})))")
    nreq = f"CAST(CEIL({n0} / ({dlit(1.0)} + {n0} / {n_d})) AS BIGINT)"
    guarded = (f"LEAST((CASE WHEN {mean} = {dlit(0.0)} OR {var} <= {dlit(0.0)} "
               f"THEN CAST({k_min} AS BIGINT) "
               f"ELSE GREATEST({nreq}, {k_min}) END), __eN)")
    return f"CAST({guarded} AS BIGINT)"
