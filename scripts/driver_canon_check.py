"""Driver-canonicalizer mimic: run named queries Spark-vs-DuckDB at
sf0.01 and compare the way the DRIVER does (pandas frames, columns
sorted by name, rows sorted with sort_values, values hashed with dtype
sensitivity — so int64 vs float64 mismatches, and list cells raise).

Usage: python scripts/driver_canon_check.py q_doc_pack q_corpus_build ...
       (no args = all registered oracles)
"""

from __future__ import annotations

import glob
import hashlib
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from visual_asset_management_system_spark.queries import ORACLES, QUERIES
from visual_asset_management_system_spark.session import get_spark

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def _value_hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for col in df.columns:
        for v in df[col]:
            if isinstance(v, float):
                h.update(f"f:{v:.9g}".encode())
            else:
                h.update(f"{type(v).__name__}:{v!r}".encode())
    return h.hexdigest()


def main(names):
    spark = get_spark(
        app_name="driver-canon-check", master="local[8]", shuffle_partitions=8
    )
    con = duckdb.connect()
    for path in glob.glob(os.path.join(SF_DIR, "*.parquet")):
        name = os.path.basename(path)[: -len(".parquet")]
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{path}'")

    failures = 0
    for name in names:
        try:
            sdf = QUERIES[name](spark, SF_DIR).toPandas()
            ddf = con.sql(ORACLES[name]).df()
            s, d = _canon(sdf), _canon(ddf)
            rows = len(s) == len(d)
            schema = list(s.columns) == list(d.columns)
            hmatch = _value_hash(s) == _value_hash(d)
            ok = rows and schema and hmatch
            if not ok:
                failures += 1
                print(
                    f"FAIL {name}: rows={rows} ({len(s)}/{len(d)}) "
                    f"schema={schema} hash={hmatch}"
                )
                if rows and schema and not hmatch:
                    for col in s.columns:
                        sc, dc = s[col], d[col]
                        if sc.dtype != dc.dtype:
                            print(f"  dtype {col}: {sc.dtype} vs {dc.dtype}")
                        neq = (sc.astype(str) != dc.astype(str))
                        if neq.any():
                            i = neq.idxmax()
                            print(
                                f"  first diff {col}[{i}]: "
                                f"{sc[i]!r} vs {dc[i]!r}"
                            )
            else:
                print(f"PASS {name} ({len(s)} rows)")
        except Exception as e:  # noqa: BLE001
            failures += 1
            print(f"ERR  {name}: {type(e).__name__}: {e}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main(sys.argv[1:] or sorted(ORACLES))
