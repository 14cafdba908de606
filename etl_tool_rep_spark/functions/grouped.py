"""Grouped-map (applyInPandas) operators.

applyInPandas is the third Python escape hatch (after scalar
pandas_udf and mapInPandas): the whole group lands in one pandas
frame, for per-group algorithms that need the full group in memory
(normalization, per-group model fits, rank transforms).

Scale note: group size is the memory bound — a skewed group must fit
in one executor's RAM. Pre-aggregate or salt first when groups can be
huge; here groups are per-language document sets.

No ``from __future__ import annotations`` (runtime type resolution).
"""

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

ZSCORE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("lang", T.StringType()),
    T.StructField("n_chars", T.LongType()),
    T.StructField("chars_z", T.DoubleType()),
])


def _zscore_group(pdf: pd.DataFrame) -> pd.DataFrame:
    mu = pdf["n_chars"].mean()
    sd = pdf["n_chars"].std(ddof=1)  # sample stddev, matches SQL
    if pd.isna(sd):
        # 1-row group: stddev_samp is NULL in SQL -> NULL z-score
        z = pd.Series([None] * len(pdf), dtype="float64",
                      index=pdf.index)
    else:
        # sd == 0 gives 0/0 = NaN, matching SQL double semantics
        z = ((pdf["n_chars"] - mu) / sd).round(6)
    return pd.DataFrame({
        "doc_id": pdf["doc_id"],
        "lang": pdf["lang"],
        "n_chars": pdf["n_chars"],
        "chars_z": z,
    })


def zscore_per_group(df: DataFrame, group_col: str = "lang") -> DataFrame:
    """Per-group z-score normalization of n_chars via grouped-map
    pandas (one Arrow batch per group)."""
    return (df.select("doc_id", group_col, "n_chars")
              .groupBy(group_col)
              .applyInPandas(_zscore_group, schema=ZSCORE_SCHEMA))
