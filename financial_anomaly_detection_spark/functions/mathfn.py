"""Cross-engine-deterministic math (SURVEY.md §2.8 extension).

The oracle gate hashes raw values, and engine libm implementations of
transcendentals (Spark's java.lang.Math vs DuckDB's C runtime) may
disagree in the last ulp — which is why every oracle-backed query so
far is transcendental-free (the PMI query ranks by the log-free
ratio, etc.). ``det_ln_sql`` lifts that restriction for the natural
log: it emits ONE SQL expression string that both engines parse into
the identical IEEE-double expression tree (comparisons, +,-,*,/ and
literal constants only — no libm calls), so the result is
bit-identical across engines by construction.

Method: range-reduce r = m * 2^k with a CASE ladder of exact
power-of-two comparisons (k = floor(log2 r), m in [1, 2)); then
ln m = 2 * atanh((m-1)/(m+1)) by the odd Taylor series. For m in
[1, 2), t = (m-1)/(m+1) <= 1/3, so the 7-term series truncation error
is below t^15/15 * 2 < 1e-8 — beyond the 6-decimal sround precision
every oracle query rounds to, and far beyond the float64 noise the
hash already tolerates via rounding. ln r = k * ln2 + series, with
ln2 as an exact 17-digit literal both parsers round-trip to the same
double.

Neither engine contracts a*b+c into FMA for these plans (HotSpot
needs explicit Math.fma; DuckDB compiles IEEE-strict), so evaluation
order fixes the bits.
"""

from __future__ import annotations

# k range covers ratios from 2^-40 to 2^40 (~1e-12 .. 1e12) — any
# Laplace-smoothed probability ratio lands well inside.
_K_MIN, _K_MAX = -40, 40

_LN2 = "0.6931471805599453"

# 1/(2j+1) coefficients as shortest-round-trip literals: both SQL
# parsers convert the decimal string to the nearest double, which is
# exactly repr(1/(2j+1)) by IEEE round-trip.
_COEFFS = [repr(1.0 / (2 * j + 1)) for j in range(1, 8)]  # 1/3 .. 1/15


def _pow2_literal(k: int) -> str:
    """2^k as an exact decimal literal (powers of two are exact)."""
    return repr(float(2.0**k))


def det_ln_sql(var: str) -> str:
    """A SQL expression string computing ln(``var``) deterministically.

    ``var`` must be a simple column reference (it is substituted many
    times in the CASE ladders — pre-compute compound ratios into a
    column first) holding a strictly positive DOUBLE in
    [2^-40, 2^41). Parse it with Spark ``F.expr`` and DuckDB alike;
    both produce the identical IEEE expression tree.
    """
    # descending ladder: first branch whose threshold <= var wins,
    # i.e. k = floor(log2(var)); ELSE arm = k below _K_MIN clamps
    k_branches = " ".join(
        f"WHEN {var} >= {_pow2_literal(k)} THEN CAST({k} AS DOUBLE)"
        for k in range(_K_MAX, _K_MIN - 1, -1)
    )
    p_branches = " ".join(
        f"WHEN {var} >= {_pow2_literal(k)} THEN {_pow2_literal(k)}"
        for k in range(_K_MAX, _K_MIN - 1, -1)
    )
    k_expr = f"(CASE {k_branches} ELSE CAST({_K_MIN - 1} AS DOUBLE) END)"
    p_expr = f"(CASE {p_branches} ELSE {_pow2_literal(_K_MIN - 1)} END)"
    m = f"({var} / {p_expr})"
    t = f"(({m} - 1.0) / ({m} + 1.0))"
    u = f"({t} * {t})"
    # Horner: series = t * (1 + u*(1/3 + u*(1/5 + ... + u*(1/15)...)))
    horner = _COEFFS[-1]
    for c in reversed(_COEFFS[:-1]):
        horner = f"({c} + {u} * {horner})"
    series = f"({t} * (1.0 + {u} * {horner}))"
    return f"({k_expr} * {_LN2} + 2.0 * {series})"
