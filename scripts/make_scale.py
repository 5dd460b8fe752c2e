"""Scale a fixture directory N× for weak-scaling measurements.

Usage: python scripts/make_scale.py [--base /root/testdata/sf0.1] [--n 10]
                                    [--out /tmp/scale_sf1]

Each copy i shifts every key space by i·(max key + 1) and extends the event
time axis by i·span, so the scaled tables have N× the entities (users,
docs, vectors, orders) — weak scaling, not hot-key scaling. Content is
decorrelated per copy where identity would distort workload shape:

- documents.text gets a per-copy word prefix (``c{i}w``), making shingle
  sets disjoint across copies — minhash/ngram candidate counts scale
  linearly instead of quadratically (10 identical copies of every doc would
  make every document a 10-way near-duplicate);
- embeddings gets a per-copy ORTHOGONAL transform (cyclic dimension shift +
  deterministic sign flips): within-copy geometry — and therefore each
  copy's near-dup pair set and bucket occupancy — is preserved exactly,
  while cross-copy cosine drops to ~N(0, 1/dims) noise (additive
  perturbation was measured insufficient: copies stayed near-identical and
  every vector became a 10-way near-duplicate, exploding verify output
  quadratically);
- dims (nation, region, supplier, part) are NOT scaled — they are
  broadcast-sized at every scale by design.

Output parquet is written by Spark with default row-group sizing across
defaultParallelism tasks, so scans of the scaled fixture split properly
(unlike the single-row-group driver fixture).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: E402

from synth_timeseries_data_spark.session import get_session  # noqa: E402

DIMS = ("nation", "region", "supplier", "part")


def _shift(df: DataFrame, col: str, i: int, stride: int):
    return df.withColumn(col, F.col(col) + F.lit(i * stride))


def _copies(base: DataFrame, n: int, xform) -> DataFrame:
    out = None
    for i in range(n):
        c = xform(base, i)
        out = c if out is None else out.unionByName(c)
    return out


def scale_dir(spark: SparkSession, base_dir: str, out_dir: str, n: int) -> None:
    os.makedirs(out_dir, exist_ok=True)
    rd = lambda t: spark.read.parquet(os.path.join(base_dir, f"{t}.parquet"))  # noqa: E731
    wr = lambda df, t: (  # noqa: E731
        df.repartition(spark.sparkContext.defaultParallelism)
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, f"{t}.parquet"))
    )

    ev = rd("events")
    # NTZ-safe: timestampdiff/interval arithmetic works for both TIMESTAMP
    # and TIMESTAMP_NTZ encodings of the fixture
    emax = ev.agg(
        F.max("event_id"),
        F.max("user_id"),
        F.expr("timestampdiff(SECOND, MIN(ts), MAX(ts))"),
    ).first()
    e_stride, u_stride = emax[0] + 1, emax[1] + 1
    span_s = emax[2] + 3600  # +1h guard gap

    def ev_copy(df, i):
        return (
            _shift(_shift(df, "event_id", i, e_stride), "user_id", i, u_stride)
            .withColumn("ts", F.expr(f"ts + INTERVAL '{i * span_s}' SECOND"))
        )

    wr(_copies(ev, n, ev_copy), "events")

    docs = rd("documents")
    d_stride = docs.agg(F.max("doc_id")).first()[0] + 1

    def doc_copy(df, i):
        out = _shift(df, "doc_id", i, d_stride)
        if i > 0:
            tag = f"c{i}w"
            out = out.withColumn(
                "text", F.regexp_replace("text", r"(^| )", f"$1{tag}")
            ).withColumn("n_chars", F.length("text"))
        return out

    wr(_copies(docs, n, doc_copy), "documents")

    emb = rd("embeddings")
    v_stride = emb.agg(F.max("vec_id")).first()[0] + 1

    def emb_copy(df, i):
        out = _shift(df, "vec_id", i, v_stride)
        if i > 0:
            shift = (i * 17) % 64
            out = out.withColumn(
                "embedding",
                F.expr(
                    "transform(sequence(0, size(embedding) - 1), j -> CAST("
                    f"element_at(embedding, ((j + {shift}) % size(embedding)) + 1)"
                    f" * (CASE WHEN (j * 31 + {i} * 13) % 2 = 0"
                    " THEN 1.0 ELSE -1.0 END) AS FLOAT))"
                ),
            )
        return out

    wr(_copies(emb, n, emb_copy), "embeddings")

    orders = rd("orders")
    cust = rd("customer")
    li = rd("lineitem")
    o_stride = orders.agg(F.max("o_orderkey")).first()[0] + 1
    c_stride = cust.agg(F.max("c_custkey")).first()[0] + 1
    wr(
        _copies(
            orders,
            n,
            lambda df, i: _shift(_shift(df, "o_orderkey", i, o_stride),
                                 "o_custkey", i, c_stride),
        ),
        "orders",
    )
    wr(_copies(cust, n, lambda df, i: _shift(df, "c_custkey", i, c_stride)),
       "customer")
    wr(_copies(li, n, lambda df, i: _shift(df, "l_orderkey", i, o_stride)),
       "lineitem")

    for t in DIMS:
        rd(t).write.mode("overwrite").parquet(os.path.join(out_dir, f"{t}.parquet"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--n", type=int, default=10)
    ap.add_argument("--out", default="/tmp/scale_sf1")
    a = ap.parse_args()
    spark = get_session("make-scale")
    scale_dir(spark, a.base, a.out, a.n)
    for t in sorted(os.listdir(a.out)):
        p = os.path.join(a.out, t)
        size = sum(
            os.path.getsize(os.path.join(p, f)) for f in os.listdir(p)
        ) if os.path.isdir(p) else os.path.getsize(p)
        print(f"{t}: {size / 1e6:.1f} MB")


if __name__ == "__main__":
    main()
