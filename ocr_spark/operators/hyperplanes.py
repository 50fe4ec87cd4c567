"""Seeded pseudo-random hyperplanes, shared by Spark operators and oracles.

Sign-LSH over near-orthogonal embedding corpora needs *random* hyperplanes:
axis-aligned sign bits (round 2) measured recall@5 of only 0.02-0.32 and
dedup pair recall 0.203, because independent coordinates make near
neighbors at cos ~0.4 disagree on many leading-dimension signs.  A fixed
LCG generates the planes deterministically, and the *literal* component
values are inlined into both the Spark column expressions and the DuckDB
oracle SQL — the two engines therefore hash every vector identically, and
the correctness gate stays exact (sign decisions are taken on the dot
rounded to 6 dp, which makes a summation-order flip vanishingly unlikely —
the same accepted convention as the 6-dp cosine rounding; a dot sitting
within float noise of a rounding boundary could still in principle bucket
differently across engines, so this is a convention, not a guarantee).

Components are drawn uniform in [-1, 1] at 3-decimal resolution, so each
literal parses to the identical double in every engine.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

LCG_SEED = 0x5EED
DIM = 64  # embeddings table dimension (TESTDATA.md)


def planes(k: int, d: int = DIM, seed: int = LCG_SEED) -> list[list[float]]:
    """``k`` deterministic pseudo-random hyperplanes of dimension ``d``
    (components uniform in [-1, 1], 3-dp resolution) from a 64-bit LCG
    (Knuth MMIX constants)."""
    s = seed
    out = []
    for _ in range(k):
        row = []
        for _ in range(d):
            s = (s * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            row.append(((s >> 33) % 2001 - 1000) / 1000.0)
        out.append(row)
    return out


def dot(x: Column, y: Column) -> Column:
    """JVM-side dot product of two intact array<double> columns — the scale
    form (no posexplode: a 64-dim vector stays ONE row, and the plan never
    joins on a 64-value component index)."""
    return F.aggregate(
        F.zip_with(x, y, lambda a, b: a * b), F.lit(0.0), lambda acc, v: acc + v
    )


def dot_plane(col: Column, plane: list[float]) -> Column:
    """Dot of an array column with one literal hyperplane."""
    return dot(col, F.array(*[F.lit(x) for x in plane]))


def key_expr(col: Column, plane_slice: list[list[float]]) -> Column:
    """Integer sign-LSH key: bit i set iff round(dot(col, plane_i), 6) > 0."""
    return sum(
        (
            F.when(F.round(dot_plane(col, p), 6) > 0, 1 << i).otherwise(0)
            for i, p in enumerate(plane_slice)
        ),
        F.lit(0),
    )


def sql_dot_plane(col_expr: str, plane: list[float]) -> str:
    """DuckDB mirror of :func:`dot_plane` (identical literals)."""
    lits = ",".join(repr(x) for x in plane)
    return f"list_dot_product({col_expr}, [{lits}]::DOUBLE[])"


def sql_key_expr(col_expr: str, plane_slice: list[list[float]]) -> str:
    """DuckDB mirror of :func:`key_expr`."""
    return " + ".join(
        f"(CASE WHEN round({sql_dot_plane(col_expr, p)}, 6) > 0 THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(plane_slice)
    )
