#!/usr/bin/env python
"""Round-14 probe #4: suggest_index_update candidate selection
(OPTIMIZATION_r14.md "Not yet optimized" #4 — the handler was never
stage-decomposed).

The shipped handler finds candidate tokens (tokens sharing an affected
prefix) by DISTINCT-ing the whole post-batch token dictionary, exploding
each token's prefixes, semi-joining the affected set, DISTINCT-ing
again, and semi-joining the store back on token — a full-store shuffle
per batch. But the affected-prefix set is closed under truncation
(every prefix of an affected token is affected, lengths 1..4), so a
token has ANY affected prefix iff its FIRST CHARACTER is an affected
1-char prefix: candidate selection can be one broadcast semi-join on a
derived substr(1,1) key — zero dictionary shuffles, one store scan
instead of two.

v2 must return identical fresh_suggest rows AND leave an identical
store state (tokens + suggest sinks read back and compared).
"""

from __future__ import annotations

import os
import random
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window, functions as F  # noqa: E402

from visual_asset_management_system_spark.operators.inverted_index import (  # noqa: E402
    _prefixes,
    _token_counts,
    suggest_index_update,
)
from visual_asset_management_system_spark.session import get_spark  # noqa: E402


def suggest_index_update_v2(
    spark,
    state_dir,
    changes,
    batch_key,
    key_cols=("database_id", "asset_id"),
    text_col="asset_name",
    max_prefix_len=4,
    k=3,
):
    from visual_asset_management_system_spark.streaming.cdc import (
        apply_cdc_batch,
    )

    key_cols = list(key_cols)
    tokens_dir = os.path.join(state_dir, "tokens")
    suggest_dir = os.path.join(state_dir, "suggest")
    manifest_dir = os.path.join(state_dir, "manifests", f"batch={batch_key}")

    ch = changes
    if "seq" in ch.columns:
        w = Window.partitionBy(*key_cols).orderBy(F.desc("seq"))
        ch = (
            ch.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    new_rows = _token_counts(
        ch.filter(F.col("event_name") != "REMOVE"), key_cols, text_col
    )

    store_schema = (
        ", ".join(f"{c} string" for c in key_cols) + ", token string, cnt bigint"
    )
    if os.path.isdir(tokens_dir):
        store = spark.read.parquet(tokens_dir).select(*key_cols, "token", "cnt")
    else:
        store = spark.createDataFrame([], store_schema)

    batch_keys = ch.select(*key_cols).distinct()
    if os.path.isfile(os.path.join(manifest_dir, "_SUCCESS")):
        affected_prefixes = spark.read.parquet(manifest_dir)
    else:
        old_tokens = store.join(batch_keys, key_cols, "left_semi").select(
            "token"
        )
        affected_tokens = old_tokens.unionByName(
            new_rows.select("token")
        ).distinct()
        affected_prefixes = (
            affected_tokens.select(
                F.explode(_prefixes(F.col("token"), max_prefix_len)).alias(
                    "prefix"
                )
            ).distinct()
        )
        affected_prefixes.write.mode("overwrite").parquet(manifest_dir)
        affected_prefixes = spark.read.parquet(manifest_dir)

    updated = store.join(batch_keys, key_cols, "left_anti").unionByName(
        new_rows
    )
    # --- v2: candidate rows via the 1-char closure -------------------
    aff1 = affected_prefixes.filter(F.length("prefix") == 1)
    cand = (
        updated.join(
            F.broadcast(aff1),
            F.substring(F.col("token"), 1, 1) == F.col("prefix"),
            "left_semi",
        )
        .groupBy("token")
        .agg(F.sum("cnt").alias("freq"))
    )
    # -----------------------------------------------------------------
    wrank = Window.partitionBy("prefix").orderBy(F.desc("freq"), "token")
    fresh_suggest = (
        cand.withColumn(
            "prefix", F.explode(_prefixes(F.col("token"), max_prefix_len))
        )
        .join(F.broadcast(affected_prefixes), "prefix", "left_semi")
        .withColumn("rank", F.row_number().over(wrank).cast("int"))
        .filter(F.col("rank") <= k)
        .select("prefix", F.col("token").alias("suggestion"), "freq", "rank")
    )

    prefix_batch = affected_prefixes.withColumn("event_name", F.lit("MODIFY"))
    apply_cdc_batch(
        prefix_batch,
        lambda keys: fresh_suggest.join(keys, ["prefix"], "left_semi"),
        suggest_dir,
        ["prefix"],
    )
    apply_cdc_batch(
        ch,
        lambda keys: new_rows.join(keys, key_cols, "left_semi"),
        tokens_dir,
        key_cols,
    )
    return fresh_suggest


WORDS = None


def vocab(rng, n=8000):
    out = set()
    while len(out) < n:
        out.add(
            "".join(rng.choice("abcdefghijklmnopqrstuvwxyz")
                    for _ in range(rng.randint(3, 10)))
        )
    return sorted(out)


def seed_batch(spark, rng, n_entities=30000):
    rows = [
        (
            "db_1",
            f"a{i}",
            "INSERT",
            " ".join(rng.choice(WORDS) for _ in range(3)),
        )
        for i in range(n_entities)
    ]
    return spark.createDataFrame(
        rows,
        "database_id string, asset_id string, event_name string, "
        "asset_name string",
    )


def change_batch(spark, rng, n=40):
    rows = [
        (
            "db_1",
            f"a{rng.randrange(30000)}",
            rng.choice(["MODIFY", "MODIFY", "MODIFY", "REMOVE"]),
            " ".join(rng.choice(WORDS) for _ in range(3)),
        )
        for _ in range(n)
    ]
    return spark.createDataFrame(
        rows,
        "database_id string, asset_id string, event_name string, "
        "asset_name string",
    )


def snap(df):
    return sorted(tuple(r) for r in df.collect())


def state_snap(spark, st):
    from visual_asset_management_system_spark.streaming.cdc import read_sink

    out = {}
    for sub in ("tokens", "suggest"):
        d = os.path.join(st, sub)
        sdf = spark.read.parquet(d) if os.path.isdir(d) else None
        out[sub] = None if sdf is None else sorted(
            tuple(r) for r in sdf.drop("_part").collect()
        )
    return out


def main():
    global WORDS
    spark = get_spark(app_name="probe4-r14")
    spark.sparkContext.setLogLevel("ERROR")
    rng = random.Random(14)
    WORDS = vocab(rng)

    base = "/tmp/probe4_r14"
    shutil.rmtree(base, ignore_errors=True)
    sa, sb = os.path.join(base, "A"), os.path.join(base, "B")

    seed = seed_batch(spark, rng)
    t0 = time.time()
    suggest_index_update(spark, sa, seed, "seed")
    print(f"seed A (v1): {time.time()-t0:.2f}s", flush=True)
    t0 = time.time()
    suggest_index_update(spark, sb, seed, "seed")
    print(f"seed B (v1): {time.time()-t0:.2f}s", flush=True)

    # interleaved steady-state batches; the returned frame cannot be
    # re-collected after the sink rewrite (stale file listing — the
    # documented handler contract), so equality is asserted on the FULL
    # post-batch sink state, which subsumes the fresh rows
    tv1 = tv2 = 0.0
    for i in range(6):
        b = change_batch(spark, random.Random(100 + i))
        t0 = time.time()
        suggest_index_update(spark, sa, b, f"b{i}")
        tv1 += time.time() - t0
        t0 = time.time()
        suggest_index_update_v2(spark, sb, b, f"b{i}")
        tv2 += time.time() - t0
        st1, st2 = state_snap(spark, sa), state_snap(spark, sb)
        same = st1 == st2
        print(
            f"batch {i}: state equal {same} "
            f"(tokens {len(st1['tokens'] or [])}, "
            f"suggest {len(st1['suggest'] or [])})",
            flush=True,
        )
        assert same
    print(f"v1 total {tv1:.2f}s   v2 total {tv2:.2f}s   ratio {tv2/tv1:.2f}",
          flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
