"""Round-7 same-session interleaved A/B for the four data-proportional
>2x entries (VERDICT r06 item 1) plus the minhash_dedup watch item (item 5).

One SparkSession, one DuckDB connection, R interleaved rounds over a fixed
task order — every task's min-of-R comes from the SAME contention window,
so cross-task deltas are component costs, not tenant noise.

Tasks:
  spark: unigram_xent, dsir_weights, tfidf_topterms, corpus_filter,
         csv_roundtrip (full), csv write-only at 8/32-way, csv readback,
         minhash_dedup
  duck:  the registry oracles for the five queries (same interleave)

Usage: python scripts/floor_ab_r07.py [sf_dir] [rounds]
Prints one JSON line and writes /tmp/floor_ab_r07.json; dumps the
minhash_dedup physical plan to /tmp/minhash_plan_r07.txt for the
PLANS.md r05 comparison.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from synth_timeseries_data_spark.queries import all_queries  # noqa: E402
from synth_timeseries_data_spark.session import fast_commit, get_session  # noqa: E402
from synth_timeseries_data_spark.sources import load  # noqa: E402

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and not args[0].isdigit():
        # path-looking first arg: fail loudly on a typo'd fixture dir
        # instead of falling through to int(<path>)
        if not os.path.isdir(args[0]):
            raise SystemExit(f"no such sf_dir: {args[0]}")
        sf_dir, args = args[0], args[1:]
    rounds = int(args[0]) if args else 5

    spark = get_session("floor-ab-r07")
    queries = all_queries()

    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):
            p = os.path.join(p, "*.parquet")
        elif not os.path.exists(p):
            continue
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    def spark_task(name):
        q = queries[name]

        def run():
            q.build(spark, sf_dir).write.format("noop").mode("overwrite").save()

        return run

    def duck_task(name):
        sql = queries[name].oracle

        def run():
            con.execute(sql).fetchall()

        return run

    # csv write-only components (the A/B the verdict asks for): identical
    # projection + spread, only the write width differs.
    fast_commit(spark)
    ev_cols = ("event_id", "ts", "user_id", "event_type", "value")
    out8 = os.path.join(tempfile.gettempdir(), "csv_ab_w8")
    out32 = os.path.join(tempfile.gettempdir(), "csv_ab_w32")

    def csv_write(width, out):
        def run():
            ev = load(spark, sf_dir, "events").select(*ev_cols).repartition(width)
            ev.write.mode("overwrite").option("header", True).option(
                "nullValue", ""
            ).csv(out)

        return run

    def csv_read():
        back = (
            spark.read.option("header", True)
            .option("nullValue", "")
            .schema(
                "event_id long, ts long, user_id long, event_type string,"
                " value double"
            )
            .csv(out8)
        )
        back.groupBy().count().write.format("noop").mode("overwrite").save()

    tasks = [
        ("xent_spark", spark_task("unigram_xent")),
        ("xent_duck", duck_task("unigram_xent")),
        ("dsir_spark", spark_task("dsir_weights")),
        ("dsir_duck", duck_task("dsir_weights")),
        ("tfidf_spark", spark_task("tfidf_topterms")),
        ("tfidf_duck", duck_task("tfidf_topterms")),
        ("cf_spark", spark_task("corpus_filter")),
        ("cf_duck", duck_task("corpus_filter")),
        ("csvrt_spark", spark_task("csv_roundtrip")),
        ("csvrt_duck", duck_task("csv_roundtrip")),
        ("csv_w8", csv_write(8, out8)),
        ("csv_w32", csv_write(32, out32)),
        ("csv_read", csv_read),
        ("minhash_spark", spark_task("minhash_dedup")),
        ("minhash_duck", duck_task("minhash_dedup")),
    ]

    # warm-up (cold run of everything, also builds session indices)
    for name, run in tasks:
        t0 = time.perf_counter()
        run()
        print(f"cold {name}: {time.perf_counter() - t0:.3f}s", flush=True)

    times: dict[str, list[float]] = {name: [] for name, _ in tasks}
    for r in range(rounds):
        for name, run in tasks:
            t0 = time.perf_counter()
            run()
            times[name].append(time.perf_counter() - t0)
        print(f"round {r + 1}/{rounds} done", flush=True)

    mins = {name: round(min(v), 4) for name, v in times.items()}
    out = {
        "sf_dir": sf_dir,
        "rounds": rounds,
        "min": mins,
        "all": {k: [round(x, 4) for x in v] for k, v in times.items()},
    }
    with open("/tmp/floor_ab_r07.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"min": mins}))

    plan = (
        queries["minhash_dedup"]
        .build(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    with open("/tmp/minhash_plan_r07.txt", "w") as f:
        f.write(plan)
    print("minhash plan dumped to /tmp/minhash_plan_r07.txt")


if __name__ == "__main__":
    main()
