"""Local stand-in for the driver's t2 correctness gate.

Runs every `__spark_entry__.queries()` entry on Spark and its
`oracle_sql()` twin on DuckDB over the same parquet tables, compares
row count, column names, and (order-insensitively) values. Floats are
compared exactly first; on mismatch the max abs delta is reported so
near-misses (summation-order drift) are distinguishable from logic
bugs.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from hive_exporter_spark.session import build_session  # noqa: E402
from hive_exporter_spark.sources.files import TESTDATA_TABLES  # noqa: E402


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            ts = pd.to_datetime(s)
            if getattr(ts.dtype, "tz", None) is not None:
                ts = ts.dt.tz_localize(None)
            df[c] = ts.astype("datetime64[ns]")
        elif s.dtype == object:
            # DuckDB hands LIST columns back as numpy arrays, Spark as
            # Python lists; unify before stringifying or identical
            # values compare unequal ("[0.1, 0.2]" vs "[0.1 0.2]").
            df[c] = s.map(
                lambda x: x.tolist() if isinstance(x, np.ndarray) else x
            ).astype(str)
        elif pd.api.types.is_bool_dtype(s):
            df[c] = s.astype(bool)
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"rowcount spark={len(spark_pdf)} duck={len(duck_pdf)}")
    scols, dcols = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if scols != dcols:
        problems.append(f"columns spark={scols} duck={dcols}")
        return problems
    if problems:
        return problems
    s, d = normalize(spark_pdf.copy()), normalize(duck_pdf.copy())
    for c in s.columns:
        sv, dv = s[c], d[c]
        # The driver's value-hash is dtype-sensitive: DuckDB HUGEINT (from
        # SUM over integers) lands in pandas as float64 while Spark emits
        # int64 — values equal, hashes different. Treat the int/float split
        # itself as a failure so it surfaces locally, not in CORRECTNESS.
        s_float = pd.api.types.is_float_dtype(sv)
        d_float = pd.api.types.is_float_dtype(dv)
        if s_float != d_float:
            which = "spark" if s_float else "duck"
            problems.append(
                f"col {c}: dtype drift ({which} float vs int) — driver hash "
                f"would fail; CAST the oracle (HUGEINT sums -> BIGINT)")
            continue
        if s_float or d_float:
            a = sv.astype(float).to_numpy()
            b = dv.astype(float).to_numpy()
            exact = np.array_equal(a, b, equal_nan=True)
            if not exact:
                both = ~(np.isnan(a) | np.isnan(b))
                delta = np.max(np.abs(a[both] - b[both])) if both.any() else float("nan")
                problems.append(f"col {c}: float mismatch max|Δ|={delta:.3e}")
        else:
            if not sv.equals(dv):
                diff = (sv != dv)
                problems.append(f"col {c}: {int(diff.sum())} differing values "
                                f"e.g. {sv[diff].head(3).tolist()} vs {dv[diff].head(3).tolist()}")
    return problems


def main() -> int:
    argv = [a for a in sys.argv[1:] if a not in ("--vanilla", "--window")]
    vanilla = "--vanilla" in sys.argv[1:]
    window = "--window" in sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    if window:
        # The driver's 50-entry CORRECTNESS window — pair with
        # --vanilla to reproduce the real gate exactly.
        only |= set(entrymod._PRIORITY)
    if vanilla:
        # Reproduce the driver harness: a default SparkSession with NONE of
        # build_session's confs — catches any hidden session dependency.
        from pyspark.sql import SparkSession

        spark = (SparkSession.builder.master("local[8]")
                 .appName("oracle-check-vanilla").getOrCreate())
    else:
        spark = build_session("oracle-check")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    queries, oracles = entrymod.queries(), entrymod.oracle_sql()
    n_fail = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"SKIP {name}: no oracle (rows-only) — spark rows={len(sdf)} [{t_spark:.1f}s]")
            continue
        try:
            ddf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            n_fail += 1
            print(f"FAIL {name} [{t_spark:.1f}s]: " + "; ".join(problems))
        else:
            print(f"OK   {name}: rows={len(sdf)} [{t_spark:.1f}s]")
    missing = set(oracles) - set(queries)
    if missing:
        n_fail += 1
        print(f"FAIL: oracles without queries: {sorted(missing)}")
    print(f"{'PASS' if n_fail == 0 else 'FAIL'}: {n_fail} failures")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
