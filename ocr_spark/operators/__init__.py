"""SQL-expressible operator library, mapped 1:1 from SURVEY.md §2.

Each module defines ``QUERIES: dict[name, (spark_fn, oracle_sql | None)]``
where ``spark_fn(spark, sf_dir) -> DataFrame`` and ``oracle_sql`` is the
equivalent ANSI SQL DuckDB runs on the same parquet (None → rows-only check
for non-SQL-expressible ops).  Cross-engine discipline (so the driver's
row-count + schema + value-hash comparison passes):

- alias every computed column identically on both sides;
- cast aggregates explicitly (DuckDB sum(BIGINT) is HUGEINT, Spark is BIGINT);
- round double aggregates (sum order differs between engines);
- render timestamps as strings (date_format vs strftime);
- regex replacement backrefs: Spark ``$1``, DuckDB ``\\1`` — patterns kept in
  the RE2∩Java common subset;
- the cross-engine stable 60-bit hash is
  Spark  ``conv(substr(md5(x), 1, 15), 16, 10)`` cast BIGINT ==
  DuckDB ``('0x' || substr(md5(x), 1, 15))::BIGINT``.
"""

from __future__ import annotations

from ocr_spark.operators import (
    aggregates,
    dedup,
    extras,
    filters,
    joins,
    multimodal,
    relational,
    sets,
    similarity,
    spatial,
    strings,
    textstats,
    transcripts,
    windows,
)

ALL: dict = {}
for _m in (
    relational,
    filters,
    joins,
    aggregates,
    windows,
    strings,
    sets,
    spatial,
    extras,
    dedup,
    similarity,
    textstats,
    multimodal,
    transcripts,
):
    for _name, _pair in _m.QUERIES.items():
        assert _name not in ALL, f"duplicate operator name {_name}"
        ALL[_name] = _pair


def queries():
    return {name: fn for name, (fn, _sql) in ALL.items()}


def oracle_sql():
    return {name: sql for name, (_fn, sql) in ALL.items() if sql is not None}
