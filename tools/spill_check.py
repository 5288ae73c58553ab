"""Graceful-spill check: a windowed sort under a deliberately starved
execution-memory budget must SPILL (UnsafeExternalSorter → disk) and
still return the exact answer — the property that separates Spark's
memory-managed operators from the reference's in-memory-only shuffle
(``/root/reference/src/worker/mod.rs:34-37`` holds all shuffle data
in RAM; at 100 TB, operators that cannot spill simply die).

Run standalone (prints one JSON line) or via the test harness.
"""
import glob
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    evdir = tempfile.mkdtemp()
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("spill-check")
        .config("spark.driver.memory", "600m")
        .config("spark.sql.shuffle.partitions", "2")
        # starve execution memory so the per-partition sort MUST spill
        .config("spark.memory.fraction", "0.05")
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", evdir)
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.rolling.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    n_rows = li.count()
    w = Window.partitionBy(F.col("l_orderkey") % 2).orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    got = (
        li.withColumn("rn", F.row_number().over(w))
        .agg(F.sum("rn").alias("s"), F.count(F.lit(1)).alias("n"))
        .first()
    )
    spark.stop()

    cand = glob.glob(f"{evdir}/*")[0]
    logf = (
        cand
        if os.path.isfile(cand)
        else [p for p in glob.glob(f"{cand}/*") if "appstatus" not in p][0]
    )
    mem_sp = disk_sp = 0
    for line in open(logf):
        try:
            e = json.loads(line)
        except ValueError:
            continue
        if e.get("Event") == "SparkListenerTaskEnd":
            tm = e.get("Task Metrics") or {}
            mem_sp += tm.get("Memory Bytes Spilled", 0)
            disk_sp += tm.get("Disk Bytes Spilled", 0)
    print(
        json.dumps(
            {
                "n_rows": n_rows,
                "row_number_count": got["n"],
                "row_number_sum": got["s"],
                "memory_spilled_mb": round(mem_sp / 1e6, 1),
                "disk_spilled_mb": round(disk_sp / 1e6, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
