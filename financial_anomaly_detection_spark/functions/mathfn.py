"""Cross-engine-deterministic math (SURVEY.md §2.8 extension).

The oracle gate hashes raw values, and engine libm implementations of
transcendentals (Spark's java.lang.Math vs DuckDB's C runtime) may
disagree in the last ulp — which is why every oracle-backed query so
far is transcendental-free (the PMI query ranks by the log-free
ratio, etc.). ``det_ln_sql`` / ``det_exp_sql`` lift that restriction:
each emits ONE SQL expression string that both engines parse into the
identical IEEE-double expression tree (comparisons, +,-,*,/ and
DOUBLE literal constants only — no libm calls), so the result is
bit-identical across engines by construction.

Two parser traps this module is careful about (measured, not
theoretical):

* Spark parses a bare decimal literal (``0.5``) as DECIMAL, not
  DOUBLE. With a DOUBLE operand the decimal coerces to double exactly
  and nothing changes — but Spark's ``floor`` returns BIGINT, and
  BIGINT * DECIMAL stays DECIMAL (exact decimal arithmetic), which
  produced 1e-12-level divergence in an early det_exp draft. EVERY
  literal here therefore uses scientific notation (``5e-1``), which
  both parsers type as DOUBLE.
* Neither engine contracts a*b+c into FMA for these plans (HotSpot
  needs explicit Math.fma; DuckDB compiles IEEE-strict), so
  evaluation order fixes the bits — validated empirically over
  hundreds of values in tests/test_mathfn.py.

Codegen-size traps (measured on the round-9 Kaplan-Meier query; both
drop the stage to interpreted mode — results stay correct, ~10x
slower): (1) never wrap a ladder in an OUTER ``CASE WHEN`` — Spark
inlines the whole branch without the method-splitting a top-level
expression gets and the generated method exceeds the JVM's 64KB
limit; guard the ladder's INPUT (e.g. ratio -> 1e0 on degenerate
rows) and CASE the scalar OUTPUT instead. (2) the ladder's ``var``
must be a plain column on a materialization boundary when it is
itself a computed expression — projection collapse substitutes the
expression into every ladder reference (~165 for ln, ~160 for exp)
and explodes the method the same way; ``localCheckpoint`` after
computing the input column.

Method (ln): range-reduce r = m * 2^k with a CASE ladder of exact
power-of-two comparisons (k = floor(log2 r), m in [1, 2)); then
ln m = 2 * atanh((m-1)/(m+1)) by the odd Taylor series. For m in
[1, 2), t = (m-1)/(m+1) <= 1/3, so the 7-term series truncation error
is below 1e-8 — beyond the 6-decimal sround precision the oracle
queries round to. ln r = k * ln2 + series.

Method (exp): x = k*ln2 + r with k = floor(x/ln2 + 0.5) (plain double
floor — identical across engines on identical x), r in
[-ln2/2, ln2/2]; exp(r) by an 11-term Taylor polynomial (truncation
< 1e-13); 2^k recovered by the same descending CASE ladder.
"""

from __future__ import annotations

import math as _math


def _dlit(v: float) -> str:
    """A literal BOTH SQL parsers type as DOUBLE and round-trip to the
    same bits: shortest repr, forced into scientific notation (a bare
    decimal literal is DECIMAL to Spark's parser)."""
    s = repr(float(v))
    return s if ("e" in s or "E" in s) else s + "e0"


# k range covers ratios from 2^-40 to 2^40 (~1e-12 .. 1e12) — any
# Laplace-smoothed probability ratio lands well inside.
_K_MIN, _K_MAX = -40, 40

_LN2 = _dlit(0.6931471805599453)

# 1/(2j+1) coefficients, shortest-round-trip DOUBLE literals.
_COEFFS = [_dlit(1.0 / (2 * j + 1)) for j in range(1, 8)]  # 1/3 .. 1/15


def _pow2_literal(k: int) -> str:
    """2^k as an exact DOUBLE literal (powers of two are exact)."""
    return _dlit(2.0**k)


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
        f"WHEN {var} >= {_pow2_literal(k)} THEN {_dlit(float(k))}"
        for k in range(_K_MAX, _K_MIN - 1, -1)
    )
    p_branches = " ".join(
        f"WHEN {var} >= {_pow2_literal(k)} THEN {_pow2_literal(k)}"
        for k in range(_K_MAX, _K_MIN - 1, -1)
    )
    k_expr = f"(CASE {k_branches} ELSE {_dlit(float(_K_MIN - 1))} END)"
    p_expr = f"(CASE {p_branches} ELSE {_pow2_literal(_K_MIN - 1)} END)"
    m = f"({var} / {p_expr})"
    t = f"(({m} - 1e0) / ({m} + 1e0))"
    u = f"({t} * {t})"
    # Horner: series = t * (1 + u*(1/3 + u*(1/5 + ... + u*(1/15)...)))
    horner = _COEFFS[-1]
    for c in reversed(_COEFFS[:-1]):
        horner = f"({c} + {u} * {horner})"
    series = f"({t} * (1e0 + {u} * {horner}))"
    return f"({k_expr} * {_LN2} + 2e0 * {series})"


_INV_LN2 = _dlit(1.4426950408889634)
_EXP_K_MIN, _EXP_K_MAX = -58, 58

_EXP_COEFFS = [_dlit(1.0 / _math.factorial(j)) for j in range(11, 0, -1)]


def det_exp_sql(var: str) -> str:
    """A SQL expression string computing exp(``var``) deterministically.

    ``var`` must be a simple column reference holding a DOUBLE in
    roughly [-40, 40]. Same contract as :func:`det_ln_sql`: both
    engines parse the string into the identical IEEE-double tree, so
    results are bit-equal. The BIGINT Spark ``floor`` is cast back to
    DOUBLE so no decimal/bigint arithmetic path exists in either
    engine.
    """
    k = f"CAST(floor({var} * {_INV_LN2} + 5e-1) AS DOUBLE)"
    r = f"({var} - {k} * {_LN2})"
    # Horner: 1 + r*(1 + r*(1/2 + r*(1/6 + ...)))
    horner = _EXP_COEFFS[0]
    for c in _EXP_COEFFS[1:]:
        horner = f"({c} + {r} * {horner})"
    poly = f"(1e0 + {r} * {horner})"
    pw_branches = " ".join(
        f"WHEN {k} >= {_dlit(float(kk))} THEN {_pow2_literal(kk)}"
        for kk in range(_EXP_K_MAX, _EXP_K_MIN - 1, -1)
    )
    pw = f"(CASE {pw_branches} ELSE {_pow2_literal(_EXP_K_MIN - 1)} END)"
    return f"({pw} * {poly})"
