"""Reader parity (FIXTURES.md B4): the same data serialized multiple
ways must load identically through smart_load; writers round-trip."""

import os

import pytest
from pyspark.sql import functions as F

from etl_tool_rep_spark.catalog import load
from etl_tool_rep_spark.sinks import write_csv, write_partitioned
from etl_tool_rep_spark.sources import (read_excel, read_sniffed,
                                        smart_load)
from etl_tool_rep_spark.sources.sftp import sftp_extract


@pytest.fixture(scope="module")
def slice_df(spark, sf_dir):
    return (load(spark, sf_dir, "orders")
            .select("o_orderkey", "o_custkey", "o_orderstatus",
                    "o_totalprice")
            .orderBy("o_orderkey").limit(100))


@pytest.fixture(scope="module")
def fmt_dir(spark, slice_df, tmp_path_factory):
    d = tmp_path_factory.mktemp("formats")
    pdf = slice_df.toPandas()
    pdf.to_csv(d / "etl_main.csv", index=False)
    pdf.to_csv(d / "etl_main.txt", sep="|", index=False)
    pdf.to_json(d / "etl_main.json", orient="records", lines=True)
    pdf.to_parquet(d / "etl_main.parquet")
    pdf.to_csv(d / "etl_sniff.dat", sep=";", index=False)
    return d


def _rows(df):
    return sorted(
        (r["o_orderkey"], r["o_custkey"], r["o_orderstatus"],
         float(r["o_totalprice"]))
        for r in df.collect())


def test_all_formats_load_identically(spark, slice_df, fmt_dir):
    expect = _rows(slice_df)
    for name in ["etl_main.csv", "etl_main.txt", "etl_main.json",
                 "etl_main.parquet"]:
        got = _rows(smart_load(spark, str(fmt_dir / name)))
        assert got == expect, name


def test_sniffed_semicolon(spark, slice_df, fmt_dir):
    df = read_sniffed(spark, str(fmt_dir / "etl_sniff.dat"))
    assert _rows(df) == _rows(slice_df)
    # unknown extension goes through the sniffer too (main.py:86-88)
    assert _rows(smart_load(spark, str(fmt_dir / "etl_sniff.dat"))) \
        == _rows(slice_df)


def test_excel_gated(spark, fmt_dir):
    """openpyxl absent here: the reader must fail with a clear
    NotImplementedError, not an ImportError at import time."""
    fake = fmt_dir / "etl_main.xlsx"
    fake.write_bytes(b"PK\x03\x04fake")
    with pytest.raises(NotImplementedError, match="openpyxl"):
        read_excel(spark, str(fake))


def test_sftp_gated(spark):
    with pytest.raises(NotImplementedError, match="paramiko"):
        sftp_extract(spark, "example.invalid", 22, "u", "p", "/x.csv")


def test_write_csv_single_file_roundtrip(spark, slice_df, tmp_path):
    out = str(tmp_path / "export")
    write_csv(slice_df, out, single_file=True)
    parts = [f for f in os.listdir(out) if f.startswith("part-")]
    assert len(parts) == 1
    back = smart_load(spark, os.path.join(out, parts[0]))
    assert _rows(back) == _rows(slice_df)


def test_write_partitioned_prunes(spark, sf_dir, tmp_path):
    out = str(tmp_path / "part_orders")
    orders = load(spark, sf_dir, "orders")
    write_partitioned(orders, out, ["o_orderstatus"],
                      files_per_partition=2)
    # layout: one dir per status
    dirs = sorted(d for d in os.listdir(out)
                  if d.startswith("o_orderstatus="))
    assert dirs == ["o_orderstatus=F", "o_orderstatus=O",
                    "o_orderstatus=P"]
    back = spark.read.parquet(out)
    got = back.filter(F.col("o_orderstatus") == "F")
    # partition pruning visible in the scan plan
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert got.count() == orders.filter("o_orderstatus = 'F'").count()
    assert "o_orderstatus=F" in plan or "PartitionFilters" in plan
