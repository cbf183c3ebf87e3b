"""CLI tests: parser rules (reference spark_loaders.py:15-56 mutual
exclusions) and the export/import/metadata paths end-to-end."""

from __future__ import annotations

import uuid

import pytest

from hive_exporter_spark import cli


def test_parser_table_query_mutual_exclusion():
    p = cli.build_parser()
    with pytest.raises(SystemExit):
        p.parse_args(["full", "-j", "jdbc:mysql://h/d", "-t", "t",
                      "-q", "select 1", "-o", "db.t"])
    with pytest.raises(SystemExit):
        p.parse_args(["full", "-j", "jdbc:mysql://h/d", "-o", "db.t"])
    args = p.parse_args(["append", "-j", "jdbc:x", "-t", "t", "-o", "db.t",
                         "-i", "id"])
    assert args.incremental_column == "id"
    args = p.parse_args(["merge", "-j", "jdbc:x", "-t", "t", "-o", "db.t",
                         "-k", "id,region", "-l", "lm", "-i", "id"])
    assert args.key_columns.split(",") == ["id", "region"]


def test_batch_tag_format():
    tag = cli.default_batch_tag()
    assert len(tag) == 15 and tag[8] == "T"


def test_export_import_metadata_cli(spark, tmp_path):
    db = f"testdb_{uuid.uuid4().hex[:8]}"
    spark.sql(f"CREATE DATABASE {db}")
    try:
        spark.range(20).write.saveAsTable(f"{db}.cli_tbl")
        listing = tmp_path / "tables.txt"
        listing.write_text(f"{db}.cli_tbl\n\n")
        out_dir = tmp_path / "out"
        assert cli.main(["export", "-f", str(listing), "-d", str(out_dir)]) == 0
        imp_db = f"{db}_imp"
        try:
            assert cli.main(["import", str(out_dir / f"{db}.cli_tbl"),
                             "-d", imp_db]) == 0
            assert spark.table(f"{imp_db}.cli_tbl").count() == 20
        finally:
            spark.sql(f"DROP DATABASE IF EXISTS {imp_db} CASCADE")
        meta_path = tmp_path / "meta"
        assert cli.main(["export-metadata", "-o", str(meta_path), "-b", db]) == 0
        snap = spark.read.parquet(str(meta_path))
        assert snap.where(snap.tbl_name == "cli_tbl").count() == 1
    finally:
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")


def test_export_validates_table_names(spark, tmp_path):
    listing = tmp_path / "bad.txt"
    listing.write_text("not_qualified\n")
    with pytest.raises(ValueError):
        cli.main(["export", "-f", str(listing), "-d", str(tmp_path / "o")])


def test_curate_cli_end_to_end(spark, tmp_path):
    """`curate` must read a documents dir, run the pipeline, and write
    packed rows whose shape matches calling the library directly."""
    from hive_exporter_spark.cli import main
    from hive_exporter_spark.operators.pipeline import curation_pipeline
    from hive_exporter_spark.sources.files import read_table

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    src = str(tmp_path / "docs_in")
    docs.write.parquet(src)
    out = str(tmp_path / "curated")
    rc = main(["curate", "-i", src, "-o", out])
    assert rc == 0
    got = spark.read.parquet(out)
    want = curation_pipeline(docs)
    assert got.count() == want.count()
    assert sorted(got.columns) == sorted(want.columns)
