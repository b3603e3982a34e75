"""Interleaved race: q_stream_cdc_state's state-store partition count
(spark.sql.shuffle.partitions at stream start = number of state
stores). Round-16 verdict item 6: at a 150-key sf0.1 stream the
framework floor might shrink with fewer state partitions (fewer state
store instances + fewer Python worker round trips per batch).

The entry pins defaultParallelism (32) after a round-14 race showed
full core count winning at sf1 (2.8 s vs 5.1 s at 8) with sf0.1
parity; this tool re-races it in the current harness so the choice
stays evidence-backed.

Usage: python tools/ab_cdc_partitions.py [--runs 5] [--parts 8,16,32]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--parts", default="8,16,32")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from pyspark.sql import SparkSession, Window, functions as F

    import __spark_entry__ as em
    from patito_spark.streaming import streaming_apply_changes

    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4))
    spark = (
        SparkSession.builder.appName("ab-cdc-partitions")
        .master(f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.files.openCostInBytes", str(256 * 1024))
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_DRIVER_MEMORY", "48g"),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def run(n_parts: int) -> float:
        stream = em._events_stream(spark, args.sf_dir)
        changes = stream.select(
            "user_id",
            F.expr("ts div 1000").alias("ts"),
            "event_id",
            "value",
            "event_type",
            F.when(F.col("event_type") == "error", "D")
            .otherwise("U")
            .alias("op"),
        )
        merged = streaming_apply_changes(
            changes, key_cols=["user_id"], seq_col="ts"
        )
        name = f"ab_cdc_{uuid.uuid4().hex[:8]}"
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(n_parts))
        t0 = time.perf_counter()
        try:
            q = (
                merged.writeStream.format("memory")
                .queryName(name)
                .outputMode("update")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(300)
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
        sink = spark.table(name)
        w = Window.partitionBy("user_id").orderBy(F.col("ts").desc())
        out = (
            sink.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        out.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        spark.catalog.dropTempView(name)
        return dt

    parts = [int(p) for p in args.parts.split(",")]
    for p in parts:  # warm
        run(p)
    times = {p: [] for p in parts}
    for _ in range(args.runs):
        for p in parts:
            times[p].append(run(p))
    for p in parts:
        ts = times[p]
        print(
            f"parts={p}: median {statistics.median(ts):.3f} "
            f"min {min(ts):.3f} all {[round(t, 3) for t in ts]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
