"""Round-8 stress measurement for line_dedup's window-partition skew —
the dedup_spans aac4508 shape at LINE grain: the bench fixture has no
newlines, so this builds line-structured corpora from the scale fixtures
(every 8th space becomes a newline, deterministically) plus HOT variants
where one universal boilerplate line is inserted into 80% of docs — the
worst case for the hash-keyed first-doc window (every hot occurrence
lands in ONE h partition) AND a full exercise of the rebuild path (80%
of docs are touched and rebuilt).

Usage: python scripts/line_dedup_stress.py [rounds]
Prints one JSON line and writes /tmp/line_dedup_stress.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from synth_timeseries_data_spark.queries.corpus_mining import (  # noqa: E402
    _LD_SPARK,
)
from synth_timeseries_data_spark.queries.llm_pipeline import (  # noqa: E402
    _register_docs,
)
from synth_timeseries_data_spark.session import get_session  # noqa: E402

HOTLINE = "subscribe to our newsletter for daily updates and offers"


def make_lines(spark, base_dir: str, out_dir: str, hot: bool) -> None:
    tgt = os.path.join(out_dir, "documents.parquet")
    if os.path.exists(os.path.join(tgt, "_SUCCESS")):
        return
    docs = spark.read.parquet(os.path.join(base_dir, "documents.parquet"))
    # every 8th space -> newline (deterministic line structure, ~7-token
    # lines so most lines clear the 4-token eligibility floor)
    lined = docs.withColumn(
        "text",
        F.regexp_replace(
            "text",
            r"((?:\S+ ){7}\S+) ",
            "$1\n",
        ),
    )
    if hot:
        lined = lined.withColumn(
            "text",
            F.when(
                F.col("text").isNotNull() & (F.col("doc_id") % 5 != 0),
                F.concat(F.lit(HOTLINE + "\n"), F.col("text")),
            ).otherwise(F.col("text")),
        )
    lined.write.mode("overwrite").parquet(tgt)


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_session("line-dedup-stress")
    tasks = []
    for sf, base in (("sf1", "/tmp/scale_sf1"), ("sf10", "/tmp/scale_sf10")):
        for hot in (False, True):
            out = f"/tmp/lines_{'hot' if hot else 'uni'}_{sf}"
            make_lines(spark, base, out, hot)
            tasks.append((f"{sf}-{'hot' if hot else 'uniform'}", out))
    best: dict[str, float] = {}
    for _r in range(rounds):
        for name, out in tasks:
            _register_docs(spark, out)
            t = time.time()
            spark.sql(_LD_SPARK).write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t, 2)
            best[name] = min(best.get(name, 1e9), dt)
    # sanity: the hot line is actually removed everywhere but the keeper
    _register_docs(spark, tasks[1][1])  # sf1-hot
    out_df = spark.sql(_LD_SPARK)
    carriers = out_df.where(f"clean_text LIKE '%{HOTLINE}%'").count()
    removed = out_df.where("n_removed > 0").count()
    result = {"best_of": rounds, "times": best,
              "sf1_hot_keepers": carriers, "sf1_hot_touched": removed}
    print(json.dumps(result))
    with open("/tmp/line_dedup_stress.json", "w") as f:
        json.dump(result, f)


if __name__ == "__main__":
    main()
