"""The reference's core use case end-to-end under a REAL Hive
metastore (embedded Derby, Hive catalog via enableHiveSupport) at
sf0.1: a three-batch incremental-merge narrative into a PARTITIONED
destination — updates, tombstones, per-batch CDC log partitions, the
two-phase safe_overwrite self-read — closing with partition-pruning
plan gates (VERDICT r5 item 6).

Runs in a subprocess: the pytest session fixture already owns this
JVM's SparkSession with the in-memory catalog, and catalogImplementation
cannot change on a live session.
"""

from __future__ import annotations

import os
import subprocess
import sys

SF_DIR = "/root/testdata/sf0.1"

SCRIPT = r"""
import sys

from pyspark.sql import functions as F

from hive_exporter_spark.catalog import TableName
from hive_exporter_spark.operators.ingest import incremental_merge, incremental_table
from hive_exporter_spark.plans import formatted_plan
from hive_exporter_spark.session import build_session
from hive_exporter_spark.sources.files import read_table

tmp, sf = sys.argv[1], sys.argv[2]
spark = build_session(
    "hive-narrative",
    enable_hive=True,
    extra_conf={
        "spark.sql.warehouse.dir": f"{tmp}/warehouse",
        "javax.jdo.option.ConnectionURL":
            f"jdbc:derby:;databaseName={tmp}/metastore_db;create=true",
    },
)
assert spark.conf.get("spark.sql.catalogImplementation") == "hive", \
    spark.conf.get("spark.sql.catalogImplementation")

ev = (
    read_table(spark, sf, "events")
    .select(
        "event_id", "user_id", "event_type", "value",
        F.col("ts").alias("last_modified"),
        F.to_date("ts").cast("string").alias("date"),
        # reference semantics: live rows carry NULL, any non-NULL
        # marker is a tombstone (spark_loaders.py:238-239)
        F.lit(None).cast("int").alias("deleted"),
    )
)
n_all = ev.count()
dest = TableName("hive_nar", "events_merged")
ARGS = dict(key_columns=["event_id"], last_modified_column="last_modified",
            incremental_column="event_id", deleted_column="deleted",
            partition_cols=["date"])

# --- batch 1: first id range.
b1 = ev.where(F.col("event_id") <= 40000)
n1 = b1.count()
r1 = incremental_merge(spark, b1, dest, batch_tag="b1", **ARGS)
assert r1.destination_count == n1, (r1, n1)

# --- batch 2: next range PLUS re-delivery of all of batch 1 (the HWM
# filter must drop the unchanged rows) PLUS 500 genuine updates whose
# bumped last_modified carries them over the disjunctive watermark.
upd = (ev.where(F.col("event_id").between(501, 1000))
       .withColumn("last_modified",
                   F.col("last_modified") + F.expr("INTERVAL 1000 DAYS"))
       .withColumn("value", F.col("value") + 1000.0))
b2 = ev.where(F.col("event_id") <= 80000).unionByName(upd)
n2_new = ev.where((F.col("event_id") > 40000)
                  & (F.col("event_id") <= 80000)).count()
r2 = incremental_merge(spark, b2, dest, batch_tag="b2", **ARGS)
assert r2.ingested_count == n2_new + 500, (r2, n2_new)
assert r2.destination_count == n1 + n2_new, (r2, n1, n2_new)

# --- batch 3: the tail PLUS tombstones for ids 1-500 (even later
# last_modified): latest version wins, then the anti-filter drops them.
tomb = (ev.where(F.col("event_id") <= 500)
        .withColumn("last_modified",
                    F.col("last_modified") + F.expr("INTERVAL 2000 DAYS"))
        .withColumn("deleted", F.lit(1)))
b3 = ev.where(F.col("event_id") > 80000).unionByName(tomb)
r3 = incremental_merge(spark, b3, dest, batch_tag="b3", **ARGS)
n_tomb = tomb.count()
assert r3.destination_count == n_all - n_tomb, (r3, n_all, n_tomb)

final = spark.table(str(dest))
# updates won: ids 501-1000 carry the +1000 values
base = {r["event_id"]: r["value"]
        for r in ev.where(F.col("event_id").between(501, 1000)).collect()}
got = {r["event_id"]: r["value"]
       for r in final.where(F.col("event_id").between(501, 1000)).collect()}
assert got == {k: v + 1000.0 for k, v in base.items()}, "updates lost"
# tombstoned ids are gone
assert final.where(F.col("event_id") <= 500).count() == 0

# --- metastore facts: destination is date-partitioned, CDC log holds
# one partition per batch tag.
parts = [r[0] for r in spark.sql(f"SHOW PARTITIONS {dest}").collect()]
assert parts and all(p.startswith("date=") for p in parts), parts[:3]
log_parts = {r[0] for r in spark.sql(
    f"SHOW PARTITIONS {incremental_table(dest)}").collect()}
assert log_parts == {"dl_ingest_date=b1", "dl_ingest_date=b2",
                     "dl_ingest_date=b3"}, log_parts

# --- plan gates: a date filter on the destination must prune at the
# file index (PartitionFilters), leaving no post-scan DataFilter, and
# must read a strict subset of the partitions.
one_day = sorted(parts)[len(parts) // 2].split("=", 1)[1]
q = final.where(F.col("date") == one_day)
plan = formatted_plan(q)
import re
m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
assert m and "date" in m.group(1), plan
d = re.search(r"DataFilters: \[([^\]]*)\]", plan)
assert d is None or d.group(1).strip() == "", plan
q.count()  # execute so the pruned scan actually runs
exact = final.collect()
day_rows = [r for r in exact if r["date"] == one_day]
assert q.count() == len(day_rows) > 0

# CDC-log pruning by batch tag: reading one batch's partition prunes.
log_q = spark.table(str(incremental_table(dest))).where(
    F.col("dl_ingest_date") == "b2")
lp = re.search(r"PartitionFilters: \[([^\]]*)\]", formatted_plan(log_q))
assert lp and "dl_ingest_date" in lp.group(1), formatted_plan(log_q)
assert log_q.count() == r2.ingested_count

print("HIVE_NARRATIVE_OK", r3.destination_count)
"""


def test_partitioned_merge_narrative_under_hive_metastore(tmp_path):
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo"
    env.setdefault("SPARK_GRAFT_CPUS", "8")
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT, str(tmp_path), SF_DIR],
        capture_output=True, text=True, timeout=540, env=env,
        cwd=str(tmp_path),  # keep any stray derby.log out of the repo
    )
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    assert "HIVE_NARRATIVE_OK" in proc.stdout, proc.stdout[-2000:]
