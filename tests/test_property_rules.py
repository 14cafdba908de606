"""Property-based differential test (SURVEY.md §5.2#4): for random
small frames and random rule lists, the Spark-compiled pipeline must
equal a pandas oracle implementing the reference's documented
semantics (SURVEY.md §2.1: independent rules, string-coerced last-wins
lookup, NULL comparisons to the else branch).

The oracle below is written from the documented behavioral contract,
not from the reference source.
"""

import math

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_tool_rep_spark.pipeline import compile_pipeline, parse_pipeline

COLS = ["num_a", "num_b", "cat"]
CATS = ["x", "y", "z"]


def pandas_oracle(main: pd.DataFrame, rules: list[dict],
                  mapping: pd.DataFrame) -> pd.DataFrame:
    """Reference-semantics oracle: each rule reads the primary frame;
    output holds only rule columns."""
    out = pd.DataFrame(index=main.index)
    for r in rules:
        if r["type"] == "Direct Map":
            out[r["name"]] = main[r["source"]]
        elif r["type"] == "Conditional":
            mask = main.eval(r["expression"].replace("`", ""),
                             engine="python")
            mask = mask.fillna(False) if hasattr(mask, "fillna") else mask
            out[r["name"]] = pd.Series(
                [r["then"] if bool(m) else r["else"] for m in mask],
                index=main.index)
        elif r["type"] == "Lookup":
            lut = dict(zip(mapping[r["key_col"]].astype(str),
                           mapping[r["val_col"]]))
            out[r["name"]] = main[r["in_col"]].astype(str).map(lut)
    return out


numeric = st.one_of(st.integers(-100, 100), st.none())


@st.composite
def frames(draw):
    n = draw(st.integers(1, 8))
    return pd.DataFrame({
        "num_a": pd.array([draw(numeric) for _ in range(n)],
                          dtype="Int64"),
        "num_b": pd.array([draw(numeric) for _ in range(n)],
                          dtype="Int64"),
        "cat": [draw(st.one_of(st.sampled_from(CATS), st.none()))
                for _ in range(n)],
    })


@st.composite
def rule_lists(draw):
    rules = []
    n = draw(st.integers(1, 4))
    for i in range(n):
        kind = draw(st.sampled_from(["Direct Map", "Conditional",
                                     "Lookup"]))
        name = f"out_{i}"
        if kind == "Direct Map":
            rules.append({"name": name, "type": "Direct Map",
                          "source": draw(st.sampled_from(COLS))})
        elif kind == "Conditional":
            col = draw(st.sampled_from(["num_a", "num_b"]))
            op = draw(st.sampled_from([">", "<", ">=", "<=", "==", "!="]))
            lit = draw(st.integers(-50, 50))
            expr = f"(`{col}` {op} {lit})"
            if draw(st.booleans()):
                col2 = draw(st.sampled_from(["num_a", "num_b"]))
                conj = draw(st.sampled_from(["&", "|"]))
                expr = f"{expr} {conj} (`{col2}` > {draw(st.integers(-50, 50))})"
            rules.append({"name": name, "type": "Conditional",
                          "expression": expr, "then": "T", "else": "F"})
        else:
            rules.append({"name": name, "type": "Lookup",
                          "map_name": "m",
                          "in_col": draw(st.sampled_from(
                              ["num_a", "num_b"])),
                          "key_col": "k", "val_col": "v"})
    return rules


MAPPING = pd.DataFrame({
    # duplicate key 7: last occurrence must win
    "k": [0, 1, 2, 3, 5, 7, 7, 10, -10],
    "v": ["a", "b", "c", "d", "e", "first", "second", "j", "neg"],
})


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return round(v, 9)
    return v


@pytest.mark.usefixtures("spark")
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(main=frames(), rules=rule_lists())
def test_spark_matches_pandas_oracle(spark, main, rules):
    sdf = spark.createDataFrame(
        main.assign(cat=main["cat"].astype(object)),
        "num_a long, num_b long, cat string")
    m = spark.createDataFrame(MAPPING, "k long, v string").coalesce(1)
    got = compile_pipeline(sdf, parse_pipeline(rules),
                           {"m": m}).toPandas()
    want = pandas_oracle(main, rules, MAPPING)
    assert list(got.columns) == list(want.columns)
    for c in got.columns:
        g = [_norm(v) for v in got[c].tolist()]
        w = [_norm(None if pd.isna(v) else v) for v in want[c].tolist()]
        assert g == w, f"column {c}: spark={g} pandas={w}\nrules={rules}"
