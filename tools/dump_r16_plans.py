"""Capture .explain("formatted") for every declared query into plans/r16/.

Usage: python tools/dump_r16_plans.py [before|after] [entry,entry,...]

Writes plans/r16/<query>_<suffix>.txt. Session config mirrors bench.py so
the captured plans are the ones the bench actually runs (same AQE, shuffle
partitions, openCost). Plans are captured WITHOUT executing (the initial
AdaptiveSparkPlan) which is what `.explain("formatted")` prints.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

import __spark_entry__ as entry_mod
from patito_spark.functions.cache import release_caches
from patito_spark.plans import formatted_explain


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4))
    spark = (
        SparkSession.builder.appName("patito_spark-plan-dump")
        .master(f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.files.openCostInBytes", str(256 * 1024))
        .config(
            "spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g")
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r16",
    )
    os.makedirs(out_dir, exist_ok=True)
    prev = spark.conf.get("spark.sql.maxMetadataStringLength", "100")
    spark.conf.set("spark.sql.maxMetadataStringLength", "10000")
    try:
        for name, fn in entry_mod.queries().items():
            if only and name not in only:
                continue
            spark.sparkContext.setJobDescription(f"plan-dump: {name}")
            df = fn(spark, sf_dir)
            text = formatted_explain(df)
            path = os.path.join(out_dir, f"{name}_{suffix}.txt")
            with open(path, "w") as fh:
                fh.write(text)
            release_caches()
            print(f"wrote {path} ({len(text)} bytes)")
    finally:
        spark.conf.set("spark.sql.maxMetadataStringLength", prev)
    spark.stop()


if __name__ == "__main__":
    main()
