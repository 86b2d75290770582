"""Differential correctness: every oracle-backed query vs DuckDB.

Mirrors the driver's t2 gate: run the Spark query and the oracle SQL on
the same parquet tables, compare row count, column names, and an
order-insensitive value hash (columns sorted by name, rows sorted).
"""

from __future__ import annotations

import glob
import math
import os

import duckdb
import pytest

from visual_asset_management_system_spark.queries import ORACLES, QUERIES

SF_DIR_CORRECTNESS = "/root/testdata/sf0.01"


def _duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for path in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(path)[: -len(".parquet")]
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{path}'")
    return con


def _canon(value):
    """Canonicalize a cell for cross-engine comparison."""
    import decimal

    if isinstance(value, decimal.Decimal):
        value = float(value)
    if isinstance(value, float):
        if math.isnan(value):
            return "nan"
        return f"{value:.10g}"
    if isinstance(value, (list, tuple)):
        return tuple(_canon(v) for v in value)
    if hasattr(value, "isoformat"):
        return value.isoformat()
    return value


def _normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return [cols[i] for i in order], out


# soak tier (r15): the q_dedup_representatives oracle's RECURSIVE
# reachability closure over the quadratic pair surface costs ~150 s in
# DuckDB ALONE at sf0.01 (measured; the full test ran 300 s) — frozen
# oracle SQL, so the cost is structural. The driver's own rotating
# 50-query correctness gate still covers it independently; run it here
# with `-m soak` or by name.
_SOAK_ORACLE = {"q_dedup_representatives"}
ORACLE_QUERIES = [
    pytest.param(n, marks=pytest.mark.soak) if n in _SOAK_ORACLE else n
    for n in sorted(ORACLES)
]


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, name):
    sf_dir = SF_DIR_CORRECTNESS
    sdf = QUERIES[name](spark, sf_dir)
    spark_cols = list(sdf.columns)
    spark_rows = [tuple(r) for r in sdf.collect()]

    con = _duck_con(sf_dir)
    res = con.sql(ORACLES[name])
    duck_cols = list(res.columns)
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    s_cols, s_norm = _normalize(spark_cols, spark_rows)
    d_cols, d_norm = _normalize(duck_cols, duck_rows)
    mismatches = [
        (a, b) for a, b in zip(s_norm, d_norm) if a != b
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)}/{len(s_norm)} rows differ; "
        f"first: spark={mismatches[0][0]} duck={mismatches[0][1]}"
    )


NO_ORACLE = sorted(set(QUERIES) - set(ORACLES))

# When every registered query has a differential oracle (the steady
# state since round 5), the parametrize list below is empty and pytest
# emits one SKIPPED row for the empty parameter set — that skip is this
# invariant holding, not a disabled test. The explicit reason makes the
# suite's `1 skipped` self-documenting in -rs output.
_NO_ORACLE_PARAMS = NO_ORACLE or [
    pytest.param(
        None,
        marks=pytest.mark.skip(
            reason="all registered queries have differential oracles; "
            "the rows-only fallback check has nothing to cover"
        ),
    )
]


@pytest.mark.parametrize("name", _NO_ORACLE_PARAMS)
def test_no_oracle_query_runs(spark, name):
    df = QUERIES[name](spark, SF_DIR_CORRECTNESS)
    assert df.count() >= 0
