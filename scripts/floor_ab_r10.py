"""Round-10 component-floor audits (VERDICT r9 'What's wrong' #2).

Six round-9 additions sit >2x DuckDB at >=0.3 s without a FLOOR.md
decomposition: ks_drift, bigram_xent, asof_join_orders,
cusum_changepoint, zipf_fit, hll_distinct. For each, this script times —
same session, interleaved, best-of-3, noop sink — the FULL registered
form against its dominant-component plan prefixes, plus a candidate
alternative form where one exists (bigram_xent: v12 derived from tf12
instead of a second corpus explode). Results land in FLOOR.md §r10.

Usage: python scripts/floor_ab_r10.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from synth_timeseries_data_spark.queries import all_queries  # noqa: E402
from synth_timeseries_data_spark.queries import llm_pipeline as lp  # noqa: E402
from synth_timeseries_data_spark.queries import timeseries as tsm  # noqa: E402
from synth_timeseries_data_spark.session import get_session  # noqa: E402
from synth_timeseries_data_spark.sources.tables import load  # noqa: E402

REPS = 3


def noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def best(spark, sql_or_df, reps=REPS) -> float:
    out = float("inf")
    for _ in range(reps):
        df = spark.sql(sql_or_df) if isinstance(sql_or_df, str) else sql_or_df
        out = min(out, noop(df))
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_session("floor-ab-r10")
    qs = all_queries()

    # Register every view the probes reference, exactly as the builders do.
    lp._register_docs(spark, sf_dir)
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    tsm._orders_us_view(spark, sf_dir)

    # Warm-up: touch each relation once.
    for t in ("documents_par", "events", "orders_us"):
        spark.table(t).write.format("noop").mode("overwrite").save()

    rows: list[tuple[str, str, float]] = []

    def rec(query: str, form: str, sql_or_df) -> float:
        s = best(spark, sql_or_df)
        rows.append((query, form, s))
        print(f"{query:18s} {form:44s} {s:7.3f}s", flush=True)
        return s

    # ---------------- ks_drift ----------------
    docs = (
        "docs AS (SELECT doc_id, source, size(split(text, ' ')) AS v"
        " FROM documents_par)"
    )
    rec("ks_drift", "scan+len only (docs CTE)", f"WITH {docs} SELECT * FROM docs")
    rec(
        "ks_drift",
        "+ cnt agg (source,len counts)",
        f"WITH {docs} SELECT source, v, COUNT(*) AS c FROM docs"
        " GROUP BY source, v",
    )
    rec(
        "ks_drift",
        "+ grid (cross-fill + window cumsum)",
        f"""WITH {docs},
        cnt AS (SELECT source, v, COUNT(*) AS c FROM docs GROUP BY source, v),
        vals AS (SELECT DISTINCT v FROM cnt)
        SELECT source, v,
               CAST(SUM(c) OVER (PARTITION BY source ORDER BY v) AS BIGINT)
                 AS c_le
        FROM (
          SELECT s.source, vals.v, COALESCE(cnt.c, 0) AS c
          FROM (SELECT DISTINCT source FROM cnt) s
          CROSS JOIN vals
          LEFT JOIN cnt ON cnt.source = s.source AND cnt.v = vals.v
        ) filled""",
    )
    rec("ks_drift", "FULL registered form", lp._KS_SPARK)

    # ---------------- bigram_xent ----------------
    rec("bigram_xent", "FULL registered (v12 from pairs)", lp._BX_SPARK)
    bx_tf12 = lp._BX_SPARK.replace(
        "v12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM pairs GROUP BY w1, w2)",
        "v12 AS (SELECT w1, w2, CAST(SUM(tf) AS BIGINT) AS c12 FROM tf12"
        " GROUP BY w1, w2)",
    )
    assert bx_tf12 != lp._BX_SPARK
    rec("bigram_xent", "variant: v12 from tf12 (no 2nd explode)", bx_tf12)
    rec(
        "bigram_xent",
        "pairs explode + tf12 agg only",
        """WITH w AS (SELECT doc_id, split(text, ' ') AS ws
                      FROM documents_par),
        pairs AS (SELECT doc_id, element_at(ws, i) AS w1,
                         element_at(ws, i + 1) AS w2
                  FROM (SELECT * FROM w WHERE size(ws) >= 2) w2g
                  LATERAL VIEW explode(sequence(1, size(ws) - 1)) x AS i)
        SELECT doc_id, w1, w2, COUNT(*) AS tf FROM pairs
        GROUP BY doc_id, w1, w2""",
    )
    # value-parity of the variant (cheap sanity before any adoption)
    a = spark.sql(lp._BX_SPARK).orderBy("doc_id").collect()
    b = spark.sql(bx_tf12).orderBy("doc_id").collect()
    print("bigram variant rows equal:", a == b, flush=True)

    # ---------------- asof_join_orders ----------------
    rec(
        "asof_join_orders",
        "orders dedup window (od CTE)",
        """SELECT uid, od_us, o_orderkey, o_totalprice FROM (
             SELECT o_custkey AS uid, od_us, o_orderkey, o_totalprice,
                    ROW_NUMBER() OVER (PARTITION BY o_custkey, od_us
                                       ORDER BY o_orderkey DESC) AS rn
             FROM orders_us) x WHERE rn = 1""",
    )
    rec(
        "asof_join_orders",
        "events scan + bare union (no window)",
        """SELECT o_custkey AS uid, od_us AS ts_us, 0 AS typ FROM orders_us
           UNION ALL
           SELECT user_id, ts DIV 1000, 1 FROM events""",
    )
    rec("asof_join_orders", "FULL registered form", tsm._ASOFJ_SPARK)

    # ---------------- cusum_changepoint ----------------
    rec(
        "cusum_changepoint",
        "events scan + ONE series window cumsum",
        """SELECT user_id, ts,
                  SUM(CAST(FLOOR(value * 1000000.0) AS BIGINT))
                    OVER (PARTITION BY user_id ORDER BY ts, event_id) AS cs
           FROM events""",
    )
    rec("cusum_changepoint", "FULL registered form", tsm._cusum_sql(True))

    # ---------------- zipf_fit ----------------
    rec(
        "zipf_fit",
        "explode + per-source tf agg only",
        """WITH w AS (SELECT source, split(text, ' ') AS ws
                      FROM documents_par),
        toks AS (SELECT source, tok AS term FROM w
                 LATERAL VIEW explode(ws) x AS tok)
        SELECT source, term, COUNT(*) AS c FROM toks GROUP BY source, term""",
    )
    rec(
        "zipf_fit",
        "+ rank window (top-1000 pts)",
        """WITH w AS (SELECT source, split(text, ' ') AS ws
                      FROM documents_par),
        toks AS (SELECT source, tok AS term FROM w
                 LATERAL VIEW explode(ws) x AS tok),
        tf AS (SELECT source, term, COUNT(*) AS c FROM toks
               GROUP BY source, term)
        SELECT source, c,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY c DESC, term ASC) AS rk
        FROM tf""",
    )
    rec("zipf_fit", "FULL registered form", lp._ZIPF_SPARK)

    # ---------------- hll_distinct ----------------
    rec(
        "hll_distinct",
        "explode + md5 + register MAX agg",
        "WITH x AS (" + lp._hll_registers_sql(lp._SPARK_D, "documents_par")
        + ") SELECT * FROM x",
    )
    rec("hll_distinct", "FULL registered form", lp._HLL_SPARK)

    # DuckDB reference columns for the audited queries
    import duckdb

    con = duckdb.connect()
    for t in ("documents", "events", "orders"):
        p = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    for name in (
        "ks_drift", "bigram_xent", "asof_join_orders",
        "cusum_changepoint", "zipf_fit", "hll_distinct",
    ):
        sql = qs[name].oracle
        con.execute(sql).arrow()
        d = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            con.execute(sql).arrow()
            d = min(d, time.perf_counter() - t0)
        print(f"duckdb {name:18s} {d:7.4f}s", flush=True)

    # machine-readable dump so FLOOR.md numbers are reproducible from the
    # script output rather than transcribed stdout
    import json

    print(json.dumps([
        {"query": q, "form": f, "sec": round(s, 4)} for q, f, s in rows
    ]), flush=True)


if __name__ == "__main__":
    main()
