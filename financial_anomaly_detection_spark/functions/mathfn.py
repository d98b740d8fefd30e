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


# ---------------------------------------------------------------------------
# Column twins (round 12).
#
# The SQL-string forms above duplicate every shared subterm TEXTUALLY:
# in det_ln the 81-branch CASE ladder is re-expanded once per reference
# to m/t/u (~34 references -> ~2,700 CASE branches per call site), and
# in det_exp the floor-k expression recurs in all 117 pw branches. The
# cost is not (only) row evaluation — it is DRIVER-side: analysis and
# optimizer passes over ~1e5-node trees, a whole-stage-codegen attempt
# that overflows janino and falls back to interpreted eval of the same
# giant tree (measured: keyness_g2's ladder accounted for 4.2 s of its
# 5.1 s isolated runtime at 31 output rows).
#
# The Column twins below bind each subterm ONCE via a single-element
# higher-order-function "let" (transform over a 1-element array: lambda
# references read the bound value instead of re-expanding the defining
# expression), so the tree is O(ladder size). The IEEE op sequence is
# IDENTICAL to the SQL form — sharing a deterministic subexpression
# cannot change its value — and 2^k comes from pow(2e0, k), which is
# exactly the CASE ladder's literal for every integer k in range
# (asserted bit-equal over the full grid in tests/test_mathfn.py).
# HOF lambdas are CodegenFallback, but interpreted evaluation of the
# COMPACT tree beats both interpreted and codegen'd evaluation of the
# exploded one. The SQL forms remain the DuckDB-oracle side.
# ---------------------------------------------------------------------------


def _let(val, body):
    """Single-value let-binding: evaluate ``val`` once, pass the bound
    Column to ``body``. transform() applies the lambda to the one-element
    array; element_at unwraps the result."""
    from pyspark.sql import functions as F

    return F.element_at(F.transform(F.array(val), body), 1)


def det_ln_col(x):
    """Column twin of :func:`det_ln_sql` — bit-identical result, compact
    tree. Unlike the SQL form, ``x`` may be any expression (it is bound
    once, so nothing is textually duplicated)."""
    from pyspark.sql import functions as F

    ln2 = F.lit(float(_LN2))

    def with_x(xv):
        k_ladder = F.when(
            xv >= F.lit(2.0 ** _K_MAX), F.lit(float(_K_MAX))
        )
        for k in range(_K_MAX - 1, _K_MIN - 1, -1):
            k_ladder = k_ladder.when(xv >= F.lit(2.0 ** k), F.lit(float(k)))
        k_ladder = k_ladder.otherwise(F.lit(float(_K_MIN - 1)))

        def with_k(kv):
            def with_m(m):
                def with_t(t):
                    def with_u(u):
                        horner = F.lit(float(_COEFFS[-1]))
                        for c in reversed(_COEFFS[:-1]):
                            horner = F.lit(float(c)) + u * horner
                        series = t * (F.lit(1.0) + u * horner)
                        return kv * ln2 + F.lit(2.0) * series

                    return _let(t * t, with_u)

                return _let((m - F.lit(1.0)) / (m + F.lit(1.0)), with_t)

            return _let(xv / F.pow(F.lit(2.0), kv), with_m)

        return _let(k_ladder, with_k)

    return _let(x, with_x)


def det_exp_col(x):
    """Column twin of :func:`det_exp_sql` — bit-identical result, compact
    tree; ``x`` may be any expression."""
    from pyspark.sql import functions as F

    inv_ln2 = F.lit(float(_INV_LN2))
    ln2 = F.lit(float(_LN2))

    def with_x(xv):
        k_expr = F.floor(xv * inv_ln2 + F.lit(0.5)).cast("double")

        def with_k(kv):
            def with_r(r):
                horner = F.lit(float(_EXP_COEFFS[0]))
                for c in _EXP_COEFFS[1:]:
                    horner = F.lit(float(c)) + r * horner
                poly = F.lit(1.0) + r * horner
                # clamp reproduces the descending CASE: k >= K_MAX
                # takes the top branch, k < K_MIN the ELSE arm
                pw = F.pow(
                    F.lit(2.0),
                    F.least(
                        F.greatest(kv, F.lit(float(_EXP_K_MIN - 1))),
                        F.lit(float(_EXP_K_MAX)),
                    ),
                )
                return pw * poly

            return _let(xv - kv * ln2, with_r)

        return _let(k_expr, with_k)

    return _let(x, with_x)
