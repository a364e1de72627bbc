"""SQL-text builders for literal-heavy column expressions.

Plan construction is driver-side Python: every ``F.lit`` / ``F.col`` /
lambda-function call is a py4j round trip, and a k×dim literal codebook
built element-by-element costs thousands of them PER QUERY INVOCATION —
measured ~1-3 s for the PQ/k-means families at sf0.1, often more than
the query's actual execution (OPTIMIZATION_r12.md, guide §4: the
JVM↔Python boundary — here on the plan-construction side, not the data
path). Emitting the SAME expression as one SQL string parsed by
``F.expr`` is one round trip, and the parsed Catalyst tree is
arithmetically identical:

* double literals use the ``D`` suffix (a bare ``0.15`` parses as
  DECIMAL in Spark SQL) with ``repr()`` shortest-round-trip text, so
  the IEEE value is bit-identical to ``F.lit(float(x))``;
* fold/lambda shapes mirror the Column versions exactly (same
  ``zip_with``/``aggregate`` nesting, same CAST placement, same
  accumulator init), so the generated code evaluates the same ops in
  the same order — the DuckDB-parity rounding contracts are untouched.

Lambda variables are prefixed ``_l`` so they can never shadow a column
referenced inside the fragment.

Column-name arguments are interpolated UNQUOTED: callers must pass
plain identifiers (letters/digits/underscore, not a reserved word).  A
name with spaces/hyphens would break parsing where the old Column
builders accepted anything — every in-repo caller passes plain
internal names; backtick-quote at the call site if that ever changes.
"""

from __future__ import annotations

import math
from collections.abc import Iterable


def dlit(x: float) -> str:
    """Shortest-round-trip double literal (D suffix: never decimal).

    Finite values only: ``repr(inf)``/``repr(nan)`` would emit the
    unparseable tokens ``infD``/``nanD`` and surface as a confusing
    AnalysisException far from the caller — fail loudly here instead
    (every current caller passes bounded constants: centroids, weights,
    planes)."""
    x = float(x)
    if not math.isfinite(x):
        raise ValueError(f"dlit: non-finite double literal {x!r}")
    return f"{x!r}D"


def arr_dlit(vals: Iterable[float]) -> str:
    """array(...) of double literals — the one-call form of
    ``F.array(*[F.lit(float(x)) for x in vals])``."""
    return f"array({', '.join(dlit(x) for x in vals)})"


def dot_sql(a: str, b: str, cast_b: bool = True) -> str:
    """Dot product of two array<numeric> SQL fragments, accumulated in
    double — the one-call form of ``operators.similarity.dot_col``.
    ``cast_b=False`` mirrors the builders whose right side is already a
    double literal array (they cast only the data side)."""
    y = "CAST(_ly AS DOUBLE)" if cast_b else "_ly"
    return (
        f"aggregate(zip_with({a}, {b}, "
        f"(_lx, _ly) -> CAST(_lx AS DOUBLE) * {y}), "
        "0.0D, (_lacc, _lv) -> _lacc + _lv)"
    )


def lsh_bucket_sql(vec: str, planes: list[list[float]]) -> str:
    """Sign-bit hyperplane bucket id: bit_i = (v · plane_i) > 0, summed
    as a left-associated chain of CASE terms — the one-call form of the
    ``hyperplane_lsh_buckets`` fold (same projection lambda shape: only
    the data side is cast; the plane side is a double literal array)."""
    terms = ["CAST(0 AS BIGINT)"]
    for i, p in enumerate(planes):
        proj = dot_sql(vec, arr_dlit(p), cast_b=False)
        terms.append(
            f"(CASE WHEN {proj} > 0 THEN CAST({2 ** i} AS BIGINT) "
            "ELSE CAST(0 AS BIGINT) END)"
        )
    return " + ".join(terms)


def assign_case_sql(dists: list[str]) -> str:
    """First-wins argmin as a nested CASE chain over distance SQL
    fragments — the one-call form of
    ``operators.clustering.assign_cluster_col`` (the least() subtree is
    restated per branch exactly as the Column form shares one Column
    object into k-1 branches)."""
    least = f"least({', '.join(dists)})"
    s = f"{len(dists) - 1}"
    for i in range(len(dists) - 2, -1, -1):
        s = f"CASE WHEN {dists[i]} = {least} THEN {i} ELSE {s} END"
    return s


def norm_sql(a: str) -> str:
    """L2 norm of an array<numeric> SQL fragment — the one-call form of
    ``operators.similarity.norm_col`` (same transform/aggregate fold)."""
    return (
        f"sqrt(aggregate(transform({a}, "
        "_lx -> CAST(_lx AS DOUBLE) * CAST(_lx AS DOUBLE)), "
        "0.0D, (_lacc, _lv) -> _lacc + _lv))"
    )


def cosine_sql(a: str, b: str) -> str:
    """Cosine similarity of two array<numeric> SQL fragments — the
    one-call form of ``operators.similarity.cosine_col``."""
    return f"{dot_sql(a, b)} / ({norm_sql(a)} * {norm_sql(b)})"


def sq_dist_sql(vec: str, cent: list[float], round_digits: int = 5) -> str:
    """Rounded squared distance of ``vec`` to a literal centroid:
    ``round(v·v - 2 v·c + c·c, digits)`` — the one-call form of one
    element of ``operators.clustering.sq_dist_cols``."""
    cc = sum(x * x for x in cent)
    # `x * 2.0D` (not `2.0D * x`): Python's `2.0 * col` resolves via
    # Column.__rmul__ to `col * 2.0`, and we keep the parsed tree
    # node-for-node identical to the Column-built one.
    return (
        f"round({dot_sql(vec, vec)} - "
        f"{dot_sql(vec, arr_dlit(cent))} * 2.0D + {dlit(cc)}, {round_digits})"
    )
