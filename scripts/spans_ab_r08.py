"""Round-8 interleaved A/B for dedup_spans' two first-doc-stamp forms
(VERDICT r07 item 1): the run-keyed WINDOW (sortless full-partition MIN;
a hot boilerplate run lands in ONE task) vs the AGG + SHUFFLE_HASH-join
form (map-side partial MIN + AQE-splittable join; pays the position pass
twice). Sets _SPANS_AGG_ROWS.

Corpora: the /tmp/scale_sf{1,10} uniform fixtures, plus HOT variants of
each where one 8-token boilerplate block is prepended to 80% of docs
(the aac4508 stress shape at scale — worst-case window-partition skew).

One SparkSession, R interleaved rounds over a fixed task order; min-of-R
per task from the same contention window. Usage:
  python scripts/spans_ab_r08.py [rounds]
Prints one JSON line and writes /tmp/spans_ab_r08.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from synth_timeseries_data_spark.queries.corpus_ext import (  # noqa: E402
    _SPANS_SPARK,
    _SPANS_SPARK_AGG,
)
from synth_timeseries_data_spark.session import get_session  # noqa: E402

BLOCK = " ".join(f"hotblk{i}" for i in range(8))


def make_hot(spark, base_dir: str, out_dir: str) -> None:
    """HOT variant fixture dir: prepend one shared 8-token block to 80%
    of docs; written as {out_dir}/documents.parquet so the registry's
    loader resolves it like any sf dir."""
    tgt = os.path.join(out_dir, "documents.parquet")
    if os.path.exists(os.path.join(tgt, "_SUCCESS")):
        return
    docs = spark.read.parquet(os.path.join(base_dir, "documents.parquet"))
    hot = docs.withColumn(
        "text",
        F.when(
            F.col("text").isNotNull() & (F.col("doc_id") % 5 != 0),
            F.concat(F.lit(BLOCK + " "), F.col("text")),
        ).otherwise(F.col("text")),
    )
    hot.write.mode("overwrite").parquet(tgt)


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_session()

    from synth_timeseries_data_spark.queries.llm_pipeline import (
        _register_docs,
    )

    fixtures = {}
    for sf in ("sf1", "sf10"):
        base = f"/tmp/scale_{sf}"
        hot = f"/tmp/spans_hot_{sf}"
        make_hot(spark, base, hot)
        fixtures[f"{sf}_uniform"] = base
        fixtures[f"{sf}_hot"] = hot

    forms = {"window": _SPANS_SPARK, "agg": _SPANS_SPARK_AGG}
    tasks = [
        (fx, form) for fx in sorted(fixtures) for form in sorted(forms)
    ]
    times: dict[str, list[float]] = {f"{fx}:{form}": [] for fx, form in tasks}

    for _ in range(rounds):
        for fx, form in tasks:
            _register_docs(spark, fixtures[fx])
            t0 = time.time()
            # .count() would let Catalyst prune the rebuild column and
            # eliminate the unique-keyed left joins entirely — aggregate
            # over every output column so the full plan runs.
            n = (
                spark.sql(forms[form])
                .selectExpr(
                    "COUNT(*) AS n",
                    "SUM(length(clean_text)) AS s1",
                    "SUM(n_removed) AS s2",
                    "SUM(n_tokens) AS s3",
                )
                .collect()[0]
                .n
            )
            times[f"{fx}:{form}"].append(time.time() - t0)
            print(f"{fx}:{form} rows={n} {times[f'{fx}:{form}'][-1]:.2f}s",
                  flush=True)

    out = {k: round(min(v), 3) for k, v in times.items()}
    print(json.dumps(out))
    with open("/tmp/spans_ab_r08.json", "w") as f:
        f.write(json.dumps(out))


if __name__ == "__main__":
    main()
