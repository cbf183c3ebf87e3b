"""Multi-dimensional data layout: Z-order (Morton) clustering for
data-skipping writes.

A parquet lake prunes row groups by per-column min/max stats, but a
sort on (a, b) only clusters the FIRST column — predicates on `b`
alone still scan everything. Interleaving the bits of rank-bucketed
columns into one Morton key and range-partitioning + sorting on it
gives every interleaved column locality, so min/max pruning works on
each dimension (the technique behind Delta/Iceberg OPTIMIZE ZORDER;
public description in the Morton-order literature).

Scale shape: one tiny min/max aggregate (broadcast back as a scalar
row — no collect in the job graph), then a map-only bucket+interleave
projection, then ONE range shuffle (`repartitionByRange` samples
boundaries) with an in-partition sort that feeds the writer. Nothing
here is quadratic and nothing concentrates on the driver.
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ZORDER_BITS = 8


def bucket_sql(col: str, lo: str, hi: str, bits: int) -> str:
    """SQL fragment mapping `col` into [0, 2^bits) by linear range
    binning against scalar bounds columns `lo`/`hi`. Plain-ANSI
    arithmetic (floor/least/greatest, IEEE doubles, identical
    evaluation order) so the same fragment runs on Spark and DuckDB —
    the oracle twin is literally this string."""
    n = 1 << bits
    # greatest(width, 1e-12): a constant column would otherwise make
    # the bin width 0 and 0/0 = NaN, which ANSI-mode Spark refuses to
    # cast to BIGINT. With the floor, every constant value lands in
    # bucket 0 on both engines.
    return (
        f"least(greatest(CAST(floor((CAST({col} AS DOUBLE) - {lo}) "
        f"/ (greatest({hi} - {lo}, 1e-12) / {n}.0)) AS BIGINT), 0), {n - 1})"
    )


def interleave_sql(bucket_cols: Sequence[str], bits: int) -> str:
    """SQL fragment interleaving the low `bits` bits of each bucket
    column into one Morton key: column i owns bit positions
    b*len(cols)+i. Shift-right/&/multiply only — portable SQL."""
    terms = []
    for b in range(bits):
        for i, c in enumerate(bucket_cols):
            weight = 1 << (b * len(bucket_cols) + i)
            terms.append(f"((({c} >> {b}) & 1) * {weight})")
    return " + ".join(terms)


def zorder_index(df: DataFrame, cols: Sequence[str],
                 bits: int = ZORDER_BITS) -> DataFrame:
    """Append per-column bucket ids (``__b0``, ``__b1``, …) and the
    Morton key ``__z`` for `cols`. Bounds come from one min/max
    aggregate broadcast back as a literal single row — the whole op is
    scan → map, no wide shuffle."""
    bounds = df.agg(*[f(c).cast("double").alias(f"__{n}_{i}")
                      for i, c in enumerate(cols)
                      for n, f in (("lo", F.min), ("hi", F.max))])
    out = df.crossJoin(F.broadcast(bounds))
    bcols = []
    for i, c in enumerate(cols):
        bcols.append(f"__b{i}")
        out = out.withColumn(
            f"__b{i}", F.expr(bucket_sql(c, f"__lo_{i}", f"__hi_{i}", bits)))
    out = out.withColumn("__z", F.expr(interleave_sql(bcols, bits)))
    return out.drop(*[f"__{n}_{i}" for i in range(len(cols))
                      for n in ("lo", "hi")])


def zorder_layout(df: DataFrame, cols: Sequence[str],
                  bits: int = ZORDER_BITS,
                  n_partitions: int | None = None) -> DataFrame:
    """Cluster `df` for writing: Z-index, range-partition on the
    Morton key, sort within partitions. Feeding this straight to a
    parquet writer yields files whose min/max stats are tight on EVERY
    interleaved column, so later point/range scans on any of them
    prune most files."""
    out = zorder_index(df, cols, bits)
    n = n_partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    out = out.repartitionByRange(int(n), "__z").sortWithinPartitions("__z")
    return out.drop(*[f"__b{i}" for i in range(len(cols))])


def skipping_effectiveness(df: DataFrame, zcol_parts: DataFrame,
                           col: str) -> DataFrame:
    """Diagnostic: per output partition of `zcol_parts`, the min/max
    span of `col` — the quantity parquet stats pruning keys off —
    plus `span_frac`, that span as a fraction of the FULL table's
    range in `df` (the unclustered baseline). Narrower fractions =>
    fewer partitions overlap a given predicate => more skipping."""
    full = df.agg(
        (F.max(col) - F.min(col)).cast("double").alias("__full_span"))
    return (
        zcol_parts.withColumn("__pid", F.spark_partition_id())
        .groupBy("__pid")
        .agg(F.min(col).alias("lo"), F.max(col).alias("hi"),
             F.count(F.lit(1)).alias("n_rows"))
        .crossJoin(F.broadcast(full))
        .withColumn(
            "span_frac",
            F.round((F.col("hi") - F.col("lo")).cast("double")
                    / F.greatest(F.col("__full_span"), F.lit(1e-12)), 6))
        .drop("__full_span")
        .orderBy("__pid")
    )


# ---------------------------------------------------------------------------
# Small-file compaction
# ---------------------------------------------------------------------------

COMPACT_TARGET_BYTES = 128 * 1024 * 1024  # HDFS-block-sized outputs


def _list_data_files(spark, path: str) -> list[tuple[str, int]]:
    """(path, bytes) for every data file under `path`, via the Hadoop
    FileSystem API (works for any supported scheme, not just local).
    Driver-sized metadata: one entry per file — the same listing any
    planner (or the reader itself) performs."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    out: list[tuple[str, int]] = []
    it = fs.listFiles(p, True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.startswith("_") or name.startswith("."):
            continue  # _SUCCESS, checksums, hidden
        out.append((st.getPath().toString(), int(st.getLen())))
    return out


def small_file_report(spark, path: str,
                      target_bytes: int = COMPACT_TARGET_BYTES) -> DataFrame:
    """One-row compaction plan for a table directory: file count,
    total bytes, how many are below half the target ("small"), and the
    output file count a compaction would produce. The operational
    early-warning for the classic 100 TB failure mode — millions of
    KB-sized files from over-parallel or incremental writers turning
    every scan into a NameNode/listing storm."""
    files = _list_data_files(spark, path)
    total = sum(b for _, b in files)
    n_small = sum(1 for _, b in files if b < target_bytes // 2)
    n_out = max(1, -(-total // target_bytes))  # ceil
    return spark.createDataFrame(
        [(len(files), total, n_small, n_out,
          int(total / max(len(files), 1)), int(total / n_out))],
        "n_files long, total_bytes long, n_small_files long, "
        "n_output_files long, avg_bytes_now long, avg_bytes_after long",
    )


def _reject_overlapping_dirs(src_dir: str, dst_dir: str,
                             default_fs: str | None = None) -> None:
    """Refuse a compaction whose output dir equals (or nests inside /
    around) its input dir. An overwrite of a directory that is being
    lazily read is data loss waiting on Spark's best-effort "cannot
    overwrite a path being read" detection — fail fast and explicitly
    instead. Store-aware: paths overlap only when scheme AND authority
    AND path prefix collide (`s3a://a/x` vs `s3a://b/x` are different
    buckets, allowed). A scheme-less path resolves against
    ``default_fs`` — Hadoop's ``fs.defaultFS``, which callers pass
    from the live session — because that is how Spark itself resolves
    it; assuming "local" would wave through `hdfs://nn/data` vs
    `/data` on a cluster whose defaultFS is that very namenode."""
    import os
    import posixpath
    from urllib.parse import urlparse

    d = urlparse(default_fs) if default_fs else None

    def split(p: str) -> tuple[str, str, str]:
        u = urlparse(p)
        if u.scheme:
            scheme, netloc, path = u.scheme, u.netloc, u.path
        elif d is not None:
            scheme, netloc, path = (d.scheme or "file"), d.netloc, p
        else:
            scheme, netloc, path = "file", "", p
        if scheme == "file":
            path = os.path.abspath(path)
        # URI paths always use '/' — normalize with posixpath (and fold
        # any local os.sep) so prefix tests below never depend on the
        # driver's OS: os.sep on a Windows driver would silently wave
        # through nested s3a/hdfs paths.
        return scheme, netloc, posixpath.normpath(path.replace(os.sep, "/"))

    def nests(parent: str, child: str) -> bool:
        if parent == child:
            return True
        # parent-at-root edge: '/' + '/' = '//', which no child
        # starts with — treat root as containing everything.
        prefix = parent if parent.endswith("/") else parent + "/"
        return child.startswith(prefix)

    (ss, sn, sp), (ds_, dn, dp) = split(src_dir), split(dst_dir)
    if (ss, sn) != (ds_, dn):
        return
    if nests(sp, dp) or nests(dp, sp):
        raise ValueError(
            f"compaction output {dst_dir!r} overlaps input {src_dir!r}: "
            "overwriting a directory being read would lose data — "
            "write to a sibling dir and swap")


def _default_fs(spark) -> str:
    """The session's ``fs.defaultFS`` (e.g. ``file:///`` locally,
    ``hdfs://nn`` on a cluster) — the authority scheme-less paths
    resolve against."""
    return (spark.sparkContext._jsc.hadoopConfiguration()
            .get("fs.defaultFS", "file:///"))


def compact_files(spark, src_dir: str, dst_dir: str,
                  target_bytes: int = COMPACT_TARGET_BYTES,
                  fmt: str = "parquet") -> dict:
    """Rewrite a many-small-files directory as ~target-sized files.

    The one hard requirement at scale: compaction must NOT shuffle —
    it is a pure re-bin of existing bytes. `coalesce(n)` merges input
    splits into n output tasks with zero exchange (each task reads a
    contiguous set of source files and streams them out); contrast
    `repartition(n)`, which would round-robin every row through a full
    network shuffle. The trade (coalesce can't split a pathological
    giant file across tasks) is irrelevant here: inputs are small by
    premise.

    Returns {n_files_before, n_files_after, total_bytes, rows} so
    callers can assert row preservation — the same reconciliation
    contract as the ingest reporters (reference spark_loaders.py
    count-check idiom).
    """
    _reject_overlapping_dirs(src_dir, dst_dir, _default_fs(spark))
    before = _list_data_files(spark, src_dir)
    total = sum(b for _, b in before)
    n_out = max(1, -(-total // target_bytes))
    df = spark.read.format(fmt).load(src_dir)
    df.coalesce(n_out).write.format(fmt).mode("overwrite").save(dst_dir)
    after = _list_data_files(spark, dst_dir)
    rows = spark.read.format(fmt).load(dst_dir).count()
    return {
        "n_files_before": len(before),
        "n_files_after": len(after),
        "total_bytes": total,
        "rows": rows,
    }


def _leaf_partition_dirs(spark, path: str) -> list[str]:
    """Relative paths of every Hive-style leaf partition dir
    (`key=val[/key2=val2...]`) under `path` — the dirs that directly
    hold data files. Driver-sized: one entry per partition."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(path)
    fs = root.getFileSystem(conf)
    # Qualify BEFORE slicing: a relative `path` (or one whose string
    # form differs from the resolved URI) would otherwise make every
    # rel-path computation garbage and silently return zero leaves.
    root_str = fs.makeQualified(root).toUri().getPath()
    leaves: set[str] = set()
    strays: list[str] = []
    it = fs.listFiles(root, True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.startswith("_") or name.startswith("."):
            continue
        parent = st.getPath().getParent().toUri().getPath()
        rel = parent[len(root_str):].strip("/")
        # Hadoop's default PathFilter hides underscore/dot paths at
        # ANY depth — a file inside `_admissions/` (the IVF admission
        # history) or `.staging/` is invisible to every reader, so it
        # is neither a leaf nor a stray worth refusing over.
        if any(seg.startswith(("_", ".")) for seg in rel.split("/") if seg):
            continue
        if rel and all("=" in seg for seg in rel.split("/")):
            leaves.add(rel)
        else:
            strays.append(f"{rel}/{name}" if rel else name)
    if strays:
        raise ValueError(
            "data files outside key=val leaf dirs would be silently "
            f"dropped by a per-partition rebin: {strays[:5]}"
            f"{' ...' if len(strays) > 5 else ''} — compact the dir "
            "with compact_files (flat) or clean the strays first")
    return sorted(leaves)


def compact_partitioned(spark, src_dir: str, dst_dir: str,
                        target_bytes: int = COMPACT_TARGET_BYTES,
                        fmt: str = "parquet",
                        parallelism: int = 1) -> dict:
    """Partition-preserving compaction: rebin each Hive-style leaf
    partition dir of `src_dir` independently into `dst_dir`, keeping
    the `key=val` layout (so downstream partition pruning still
    works) — the realistic 100 TB form of `compact_files`, whose flat
    rewrite would erase the partition columns from the directory
    structure.

    Shape: a driver loop over the partition-dir list (driver-sized
    metadata, one entry per partition) launching one shuffle-free
    coalesce rebin per partition. Per-partition jobs are small and
    independent — each leaf overwrite is idempotent, so a restart can
    resume partway; the incremental-friendly unit is the partition,
    exactly like the reference's partition-per-batch layout. No job
    ever shuffles: compaction stays a pure byte rebin per leaf.
    `parallelism > 1` submits leaves from a driver thread pool (the
    `export_tables` idiom, sinks.py): each leaf job is tiny, so with
    thousands of partitions the pool — not per-job parallelism — is
    what keeps executors busy.

    Returns {n_partitions, n_files_before, n_files_after, rows}.
    """
    _reject_overlapping_dirs(src_dir, dst_dir, _default_fs(spark))
    leaves = _leaf_partition_dirs(spark, src_dir)

    def _one(rel: str) -> dict:
        return compact_files(spark, f"{src_dir}/{rel}", f"{dst_dir}/{rel}",
                             target_bytes, fmt=fmt)

    if parallelism <= 1:
        reports = [_one(rel) for rel in leaves]
    else:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=parallelism) as pool:
            reports = list(pool.map(_one, leaves))
    nb = sum(r["n_files_before"] for r in reports)
    na = sum(r["n_files_after"] for r in reports)
    # leaves are disjoint, so the global count is the sum of the
    # per-leaf counts compact_files already paid for — re-reading the
    # whole compacted tree would be a second full pass over the output
    rows = sum(r["rows"] for r in reports)
    return {
        "n_partitions": len(leaves),
        "n_files_before": nb,
        "n_files_after": na,
        "rows": rows,
    }
