"""Generate a SCALED ANALOG of the driver fixture for structural soaks.

The driver's testdata (TESTDATA.md) is read-only and tops out at sf0.1;
the 100 TB posture arguments are made from plan structure at that SF.
This generator produces an sf-scaled analog (default 10x => "sf1") with
the SAME schemas, key relationships, value domains, and workload
structure — learned from the sf0.1 fixture itself — so the soak can
measure how runtime and plan structure move with data volume.

It is an ANALOG, not the driver's generator: per-row values are drawn
fresh (seeded, reproducible) from the observed marginal distributions,
so correctness hashes do NOT transfer — only scaling behavior does.
Workload-critical structure is preserved deliberately:

- TPC-H-ish stars: fresh keys at 10x cardinality, foreign keys uniform
  over the scaled dimension, ~4.07 lineitems/order, same categorical
  domains and date ranges (sampled from the fixture's own columns);
- documents: the same 31-token vocabulary and 10-100 token lengths,
  the same 20-source / 5-language split, PLUS planted exact-duplicate
  and near-duplicate clusters (the fixture's dedup workload: without
  them every dedup/similarity operator would measure an empty
  candidate surface at scale);
- embeddings: 64-dim float32 vectors with the fixture's label split,
  vec_id 0 kept as the ANN query anchor;
- events: 10x users over the same 30-day window (denser streams, the
  realistic scale direction), same event-type mix, values resampled
  from the observed distribution.

Usage:
    python scripts/gen_scaled_fixture.py OUT_DIR [SCALE] [BASE_DIR]
    # e.g. python scripts/gen_scaled_fixture.py /tmp/sf1 10
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 1042


def _read(base: str, name: str) -> pa.Table:
    return pq.read_table(os.path.join(base, f"{name}.parquet"))


def _write(out: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows")


def _resample(rng, col, n):
    """n draws with replacement from an observed column's values."""
    arr = col.to_numpy(zero_copy_only=False)
    return arr[rng.integers(0, len(arr), n)]


def generate(out: str, scale: int, base: str) -> None:
    rng = np.random.default_rng(SEED)
    os.makedirs(out, exist_ok=True)

    # dimension tables that do not scale: copy verbatim
    for name in ("region", "nation"):
        _write(out, name, _read(base, name))

    # ---- customer / supplier / part: fresh keys, resampled attributes
    cust = _read(base, "customer")
    n_cust = cust.num_rows * scale
    _write(out, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(n_cust)]),
        "c_nationkey": pa.array(
            _resample(rng, cust["c_nationkey"], n_cust), pa.int32()),
        "c_acctbal": pa.array(_resample(rng, cust["c_acctbal"], n_cust)),
        "c_mktsegment": pa.array(
            _resample(rng, cust["c_mktsegment"], n_cust)),
    }))

    supp = _read(base, "supplier")
    n_supp = supp.num_rows * scale
    _write(out, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n_supp)]),
        "s_nationkey": pa.array(
            _resample(rng, supp["s_nationkey"], n_supp), pa.int32()),
        "s_acctbal": pa.array(_resample(rng, supp["s_acctbal"], n_supp)),
    }))

    part = _read(base, "part")
    n_part = part.num_rows * scale
    _write(out, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": pa.array(_resample(rng, part["p_name"], n_part)),
        "p_brand": pa.array(_resample(rng, part["p_brand"], n_part)),
        "p_type": pa.array(_resample(rng, part["p_type"], n_part)),
        "p_size": pa.array(_resample(rng, part["p_size"], n_part), pa.int32()),
        "p_retailprice": pa.array(
            _resample(rng, part["p_retailprice"], n_part)),
    }))

    # ---- orders / lineitem: scaled fact tables, uniform FKs
    orders = _read(base, "orders")
    n_ord = orders.num_rows * scale
    _write(out, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": pa.array(
            _resample(rng, orders["o_orderstatus"], n_ord)),
        "o_totalprice": pa.array(_resample(rng, orders["o_totalprice"], n_ord)),
        "o_orderdate": pa.array(_resample(rng, orders["o_orderdate"], n_ord)),
        "o_orderpriority": pa.array(
            _resample(rng, orders["o_orderpriority"], n_ord)),
    }))

    li = _read(base, "lineitem")
    n_li = li.num_rows * scale
    orderkeys = rng.integers(0, n_ord, n_li)
    _write(out, "lineitem", pa.table({
        "l_orderkey": pa.array(orderkeys, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(
            rng.integers(1, 8, n_li).astype(np.int32), pa.int32()),
        "l_quantity": pa.array(_resample(rng, li["l_quantity"], n_li)),
        "l_extendedprice": pa.array(
            _resample(rng, li["l_extendedprice"], n_li)),
        "l_discount": pa.array(_resample(rng, li["l_discount"], n_li)),
        "l_tax": pa.array(_resample(rng, li["l_tax"], n_li)),
        "l_returnflag": pa.array(_resample(rng, li["l_returnflag"], n_li)),
        "l_linestatus": pa.array(_resample(rng, li["l_linestatus"], n_li)),
        "l_shipdate": pa.array(_resample(rng, li["l_shipdate"], n_li)),
    }))

    # ---- documents: same vocabulary + planted dup/near-dup clusters
    docs = _read(base, "documents")
    texts = docs["text"].to_pylist()
    vocab = sorted({t for s in texts[:500] for t in s.split()})
    langs = docs["lang"].to_numpy(zero_copy_only=False)
    n_doc = docs.num_rows * scale
    n_src = 20
    out_texts: list[str] = []
    for i in range(n_doc):
        r = rng.random()
        if i > 10 and r < 0.08:          # exact duplicate of an earlier doc
            out_texts.append(out_texts[rng.integers(0, i)])
        elif i > 10 and r < 0.16:        # near-dup: drop the last 5 tokens
            src = out_texts[rng.integers(0, i)].split()
            out_texts.append(" ".join(src[: max(len(src) - 5, 3)]))
        else:
            ln = int(rng.integers(10, 101))
            out_texts.append(
                " ".join(vocab[j] for j in rng.integers(0, len(vocab), ln))
            )
    _write(out, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc), pa.int64()),
        "text": pa.array(out_texts),
        "lang": pa.array(langs[rng.integers(0, len(langs), n_doc)]),
        "source": pa.array([f"src{i % n_src}" for i in range(n_doc)]),
        "n_chars": pa.array(
            np.array([len(t) for t in out_texts]), pa.int64()),
    }))

    # ---- embeddings: keep vec_id 0 (the ANN query anchor), fresh rest
    emb = _read(base, "embeddings")
    dim = len(emb["embedding"][0])
    n_emb = emb.num_rows * scale
    vecs = rng.standard_normal((n_emb, dim)).astype(np.float32)
    vecs[0] = np.array(emb["embedding"][0].as_py(), dtype=np.float32)
    labels = _resample(rng, emb["label"], n_emb)
    _write(out, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    }))

    # ---- events: 10x users, same 30-day window (denser stream)
    ev = _read(base, "events")
    n_ev = ev.num_rows * scale
    ts = ev["ts"].to_numpy(zero_copy_only=False)
    t_min, t_max = ts.min(), ts.max()
    span_ns = (t_max - t_min).astype("timedelta64[ns]").astype(np.int64)
    offs = np.sort(rng.integers(0, span_ns, n_ev))
    n_users = int(ev["user_id"].to_numpy(zero_copy_only=False).max()) * scale
    _write(out, "events", pa.table({
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": pa.array(t_min + offs.astype("timedelta64[ns]")),
        "user_id": pa.array(rng.integers(0, n_users, n_ev), pa.int64()),
        "event_type": pa.array(_resample(rng, ev["event_type"], n_ev)),
        "value": pa.array(_resample(rng, ev["value"], n_ev)),
        "props": pa.array(
            [f'{{"k": {int(k)}}}' for k in rng.integers(0, 100, n_ev)]),
    }))


if __name__ == "__main__":
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_vams_sf1"
    scale = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    base_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    print(f"generating {scale}x analog of {base_dir} -> {out_dir}")
    generate(out_dir, scale, base_dir)
    print("done")
