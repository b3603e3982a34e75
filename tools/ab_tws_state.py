"""One-process interleaved A/B: the CDC merge stream on
applyInPandasWithState (current operator) vs Spark 4's
transformWithStateInPandas — the OPTIMIZATION_r15 "not yet optimized" #1
candidate, which was deferred pending its own A/B.

Both variants run the IDENTICAL merge body (one idxmax per Arrow batch,
late-change guard against the stored seq) over the same availableNow
memory-sink query the q_stream_cdc_state entry runs; the only difference
is the stateful-operator API (and, forced by it, the state store:
transformWithState requires RocksDB, applyInPandasWithState uses the
default HDFS-backed provider). Warm passes first, then N strictly
interleaved timed passes each; a correctness cross-check reduces both
sinks to latest-per-key and diffs them.

Usage: python tools/ab_tws_state.py [--runs 5] [--sf-dir DIR]
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
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    import pandas as pd
    from pyspark.sql import SparkSession, Window, functions as F
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    from pyspark.sql.types import BooleanType, StructField, StructType

    import __spark_entry__ as em
    from patito_spark.streaming import streaming_apply_changes

    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4))
    spark = (
        SparkSession.builder.appName("ab-tws-state")
        .master(f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.files.openCostInBytes", str(256 * 1024))
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_DRIVER_MEMORY", "48g"),
        )
        .config("spark.sql.codegen.cache.maxEntries", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def changes(sf_dir: str):
        stream = em._events_stream(spark, sf_dir)
        return stream.select(
            "user_id",
            F.expr("ts div 1000").alias("ts"),
            "event_id",
            "value",
            "event_type",
            F.when(F.col("event_type") == "error", "D")
            .otherwise(F.lit("U"))
            .alias("op"),
        )

    key_cols, seq_col, op_col = ["user_id"], "ts", "op"

    def tws_merged(ch):
        """transformWithStateInPandas twin of streaming_apply_changes."""
        value_cols = [c for c in ch.columns if c not in (*key_cols, op_col)]
        key_fields = [ch.schema[c] for c in key_cols]
        value_fields = [ch.schema[c] for c in value_cols]
        out_schema = StructType(
            key_fields
            + value_fields
            + [StructField("is_deleted", BooleanType(), False)]
        )
        state_schema = StructType(
            value_fields + [StructField("__deleted", BooleanType(), True)]
        )
        seq_idx = value_cols.index(seq_col)

        def _py(value):
            return value.item() if hasattr(value, "item") else value

        class Merge(StatefulProcessor):
            def init(self, handle: StatefulProcessorHandle) -> None:
                self._best = handle.getValueState("best", state_schema)

            def handleInputRows(self, key, rows, timerValues):
                best = None
                best_deleted = False
                for pdf in rows:
                    if not len(pdf):
                        continue
                    row = pdf.loc[pdf[seq_col].idxmax()]
                    values = tuple(_py(row[c]) for c in value_cols)
                    if best is None or values[seq_idx] > best[seq_idx]:
                        best = values
                        best_deleted = _py(row[op_col]) == "D"
                if best is None:
                    return
                current = self._best.get()
                if current is not None and current[seq_idx] >= best[seq_idx]:
                    return
                self._best.update((*best, best_deleted))
                yield pd.DataFrame(
                    [(*key, *best, best_deleted)],
                    columns=[*key_cols, *value_cols, "is_deleted"],
                )

            def close(self) -> None:
                pass

        return ch.groupBy(*key_cols).transformWithStateInPandas(
            statefulProcessor=Merge(),
            outputStructType=out_schema,
            outputMode="Update",
            timeMode="None",
        )

    def run_once(make_merged, label: str):
        prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
        prev_provider = spark.conf.get(
            "spark.sql.streaming.stateStore.providerClass", ""
        )
        spark.conf.set(
            "spark.sql.shuffle.partitions",
            str(spark.sparkContext.defaultParallelism),
        )
        if label.startswith("tws"):
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass",
                "org.apache.spark.sql.execution.streaming.state."
                "RocksDBStateStoreProvider",
            )
        name = f"ab_{uuid.uuid4().hex[:8]}"
        start = time.perf_counter()
        try:
            q = (
                make_merged(changes(args.sf_dir))
                .writeStream.format("memory")
                .queryName(name)
                .outputMode("update")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(300)
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
            if prev_provider:
                spark.conf.set(
                    "spark.sql.streaming.stateStore.providerClass",
                    prev_provider,
                )
            else:
                spark.conf.unset(
                    "spark.sql.streaming.stateStore.providerClass"
                )
        elapsed = time.perf_counter() - start
        sink = spark.table(name)
        w = Window.partitionBy("user_id").orderBy(F.col("ts").desc())
        final = (
            sink.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        pdf = final.toPandas().sort_values("user_id").reset_index(drop=True)
        spark.catalog.dropTempView(name)
        return elapsed, pdf

    variants = {
        "apipws": lambda ch: streaming_apply_changes(
            ch, key_cols=key_cols, seq_col=seq_col
        ),
        "tws": tws_merged,
    }

    # correctness cross-check + warm (2 untimed passes each)
    results = {}
    for label, make in variants.items():
        _, pdf = run_once(make, label)
        results[label] = pdf
        run_once(make, label)
    a, b = results["apipws"], results["tws"]
    same = a.equals(b[a.columns])
    print(f"cross-check: rows {len(a)} vs {len(b)}, identical={same}")
    if not same:
        print(a.compare(b[a.columns]).head(20))
        raise SystemExit("variants disagree — A/B void")

    times: dict[str, list[float]] = {k: [] for k in variants}
    for i in range(args.runs):
        for label, make in variants.items():
            t, _ = run_once(make, label)
            times[label].append(t)
            print(f"pass {i + 1} {label}: {t:.3f}s", flush=True)

    for label, ts in times.items():
        print(
            f"{label}: best {min(ts):.3f}  median {statistics.median(ts):.3f}"
            f"  all {[round(t, 3) for t in ts]}"
        )


if __name__ == "__main__":
    main()
