"""ORC / text / binaryFile reader round-trips (the columnar-alt,
raw-corpus, and multimodal ingest paths)."""

import os

from etl_tool_rep_spark.catalog import load
from etl_tool_rep_spark.sources import (read_binary, read_orc,
                                        read_text, smart_load)


def test_orc_roundtrip_and_dispatch(spark, sf_dir, tmp_path):
    src = (load(spark, sf_dir, "nation")
           .orderBy("n_nationkey"))
    path = str(tmp_path / "nation.orc")
    src.write.mode("overwrite").orc(path)
    back = read_orc(spark, path)
    assert back.count() == src.count()
    assert set(back.columns) == set(src.columns)
    assert smart_load(spark, path).count() == src.count()


def test_text_reader_lines(spark, tmp_path):
    p = tmp_path / "corpus.txtraw"
    p.write_text("line one\nline two\nline three\n")
    df = read_text(spark, str(p))
    assert df.columns == ["value"]
    assert sorted(r["value"] for r in df.collect()) == [
        "line one", "line three", "line two"]


def test_binary_reader_content_and_glob(spark, tmp_path):
    (tmp_path / "a.bin").write_bytes(b"\x00\x01\x02")
    (tmp_path / "b.dat").write_bytes(b"\xff")
    df = read_binary(spark, str(tmp_path), glob="*.bin")
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0]["length"] == 3
    assert bytes(rows[0]["content"]) == b"\x00\x01\x02"
    assert os.path.basename(rows[0]["path"]).endswith("a.bin")


def test_xml_reader_rowtag(spark, tmp_path):
    from etl_tool_rep_spark.sources import read_xml
    p = tmp_path / "items.xml"
    p.write_text(
        "<items>"
        "<item><id>1</id><name>alpha</name><price>9.50</price></item>"
        "<item><id>2</id><name>beta</name><price>3.25</price></item>"
        "</items>")
    df = read_xml(spark, str(p), row_tag="item")
    rows = {r["id"]: r for r in df.collect()}
    assert set(rows) == {1, 2}
    assert rows[1]["name"] == "alpha"
    assert float(rows[2]["price"]) == 3.25
