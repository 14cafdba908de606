"""Headless CLI end-to-end (in-process main(); a subprocess would pay
a second JVM startup for no extra coverage)."""

import json
import os

from etl_tool_rep_spark.__main__ import main
from etl_tool_rep_spark.sources import smart_load


def test_cli_end_to_end(spark, tmp_path):
    (tmp_path / "main.csv").write_text(
        "id,amt,region\n1,100.0,EU\n2,2000.0,US\n3,50.0,XX\n")
    (tmp_path / "regions.csv").write_text(
        "code,label\nEU,Europe\nUS,America\n")
    (tmp_path / "rules.json").write_text(json.dumps([
        {"name": "Region", "type": "Lookup", "map_name": "regions",
         "in_col": "region", "key_col": "code", "val_col": "label"},
        {"name": "Tier", "type": "Conditional",
         "expression": "(`amt` >= 1000)", "then": "big",
         "else": "small"},
    ]))
    out = str(tmp_path / "out")
    rc = main(["--primary", str(tmp_path / "main.csv"),
               "--mapping", str(tmp_path / "regions.csv"),
               "--pipeline", str(tmp_path / "rules.json"),
               "--output", out, "--single-file"])
    assert rc == 0
    part = [f for f in os.listdir(out) if f.startswith("part-")][0]
    got = sorted(map(tuple,
                     smart_load(spark, os.path.join(out, part)).collect()),
                 key=str)
    assert got == sorted([("America", "big"), ("Europe", "small"),
                          (None, "small")], key=str)
