"""Declarative data-quality checks — the dbt-test / Great-Expectations
surface a lakehouse runs before anything downstream trusts a table:
predicate expectations, key uniqueness, and referential integrity, each
reduced to ONE violation count per check and unioned into a single
report frame ``(check, n_checked, n_violations, pass)``.

Shape at scale: a predicate check is a map-side-combinable aggregate
over one scan; a uniqueness check is count-vs-count-distinct (two
partial aggregates, no row-level shuffle of violators); referential
integrity is a left-anti join where the parent KEY SET is the join
side — dimension-sized in a star schema, broadcast by AQE. The report
itself is checks-count rows: collect-safe by construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def check_predicate(name: str, df: DataFrame, violation: Column) -> DataFrame:
    """One-row report: rows where ``violation`` holds are defects.
    NULL predicate results count as violations (an expectation that
    cannot be evaluated is not met — the conservative convention)."""
    return df.agg(
        F.lit(name).alias("check"),
        F.count(F.lit(1)).alias("n_checked"),
        F.sum(
            F.when(F.coalesce(violation, F.lit(True)), F.lit(1)).otherwise(
                F.lit(0)
            )
        ).alias("n_violations"),
    )


def check_unique(name: str, df: DataFrame, cols: list[str]) -> DataFrame:
    """One-row report: n_violations = rows beyond the first per
    duplicate key, computed as count(*) minus the number of distinct
    key GROUPS. Grouping on the raw columns (not a string-encoded
    concatenation) is injective — ('x', NULL), (NULL, 'x') and ('x', '')
    are distinct keys — and follows SQL GROUP BY's NULL convention:
    NULLs group together, so duplicate all-NULL keys are violations.
    Plan shape: one partial-combined shuffle on the key columns, then a
    scalar aggregate over group counts — no violator rows move."""
    groups = df.groupBy(*[F.col(c) for c in cols]).agg(
        F.count(F.lit(1)).alias("_cnt")
    )
    return groups.agg(
        F.lit(name).alias("check"),
        F.coalesce(F.sum("_cnt"), F.lit(0)).alias("n_checked"),
        (
            F.coalesce(F.sum("_cnt"), F.lit(0)) - F.count(F.lit(1))
        ).alias("n_violations"),
    )


def check_ref(
    name: str,
    child: DataFrame,
    key: str,
    parent: DataFrame,
    parent_key: str,
) -> DataFrame:
    """One-row report: child rows whose ``key`` has no match in
    ``parent.parent_key`` (orphans). NULL child keys never match —
    counted as orphans, the strict-FK convention."""
    pk = parent.select(F.col(parent_key).alias("_pk")).distinct()
    orphans = child.join(
        pk, child[key] == F.col("_pk"), "left_anti"
    )
    total = child.agg(F.count(F.lit(1)).alias("_n"))
    return (
        orphans.agg(F.count(F.lit(1)).alias("n_violations"))
        .crossJoin(F.broadcast(total))
        .select(
            F.lit(name).alias("check"),
            F.col("_n").alias("n_checked"),
            "n_violations",
        )
    )


def dq_report(checks: list[DataFrame]) -> DataFrame:
    """Union the one-row check frames into the report, adding the
    pass flag (0 violations)."""
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out.select(
        "check",
        F.col("n_checked").cast("long").alias("n_checked"),
        F.col("n_violations").cast("long").alias("n_violations"),
        F.when(F.col("n_violations") == 0, F.lit(1))
        .otherwise(F.lit(0))
        .alias("pass_flag"),
    )
