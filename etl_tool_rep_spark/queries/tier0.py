"""Tier 0 — reference-faithful rule-pipeline queries.

Each query builds a rule pipeline in the reference's JSON schema
(reference main.py:349-412), compiles it through
``etl_tool_rep_spark.pipeline`` and runs it over the driver corpus
(orders as the primary table, customer as the mapping table — the
star-schema stand-ins for the reference's fact + mapping files).

The oracle SQL mirrors the compiled plan's semantics exactly,
including the string-coerced lookup keys (main.py:168-169).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load
from ..pipeline import parse_pipeline, compile_pipeline
from .registry import query


def _run(spark: SparkSession, sf_dir: str, rules_json: list) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    mappings = {"customer": load(spark, sf_dir, "customer"),
                "nation": load(spark, sf_dir, "nation")}
    return compile_pipeline(orders, parse_pipeline(rules_json), mappings)


@query(
    "direct_map",
    oracle="""
    SELECT o_orderkey AS okey,
           o_totalprice AS order_amount,
           o_orderstatus AS status
    FROM orders
    """,
)
def direct_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1 projection/rename (reference main.py:145-146)."""
    return _run(spark, sf_dir, [
        {"name": "okey", "type": "Direct Map", "source": "o_orderkey"},
        {"name": "order_amount", "type": "Direct Map",
         "source": "o_totalprice"},
        {"name": "status", "type": "Direct Map", "source": "o_orderstatus"},
    ])


@query(
    "conditional_case",
    oracle="""
    SELECT o_orderkey AS okey,
           CASE WHEN (o_totalprice > 150000) THEN 'VIP'
                ELSE 'Regular' END AS priority,
           CASE WHEN (o_totalprice > 50000) AND (o_orderstatus = 'F')
                THEN 'Target' ELSE 'Other' END AS segment
    FROM orders
    """,
)
def conditional_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2 row-wise CASE; NULL conditions fall to else
    (reference main.py:148-157, SURVEY.md §2.1 pt 6)."""
    return _run(spark, sf_dir, [
        {"name": "okey", "type": "Direct Map", "source": "o_orderkey"},
        {"name": "priority", "type": "Conditional",
         "expression": "(`o_totalprice` > 150000)",
         "then": "VIP", "else": "Regular"},
        {"name": "segment", "type": "Conditional",
         "expression": "(`o_totalprice` > 50000) & (`o_orderstatus` == 'F')",
         "then": "Target", "else": "Other"},
    ])


@query(
    "lookup_join",
    oracle="""
    SELECT o.o_orderkey AS okey, c.c_name AS cust_name
    FROM orders o
    LEFT JOIN customer c
      ON CAST(o.o_custkey AS VARCHAR) = CAST(c.c_custkey AS VARCHAR)
    """,
)
def lookup_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3 string-coerced, last-wins broadcast lookup
    (reference main.py:159-171)."""
    return _run(spark, sf_dir, [
        {"name": "okey", "type": "Direct Map", "source": "o_orderkey"},
        {"name": "cust_name", "type": "Lookup", "map_name": "customer",
         "in_col": "o_custkey", "key_col": "c_custkey",
         "val_col": "c_name"},
    ])


@query(
    "lookup_miss_null",
    oracle="""
    SELECT o.o_orderkey AS okey, c.c_name AS missing_name
    FROM orders o
    LEFT JOIN customer c
      ON CAST(o.o_totalprice AS VARCHAR) = CAST(c.c_custkey AS VARCHAR)
    """,
)
def lookup_miss_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3 miss->NULL path via the float-vs-int string-coercion quirk:
    a DOUBLE in_col stringifies as '123.45'-style and can never match
    an integer key's '123' (verified, SURVEY.md §2.1 pt 5) — the
    all-NULL output IS the reference's behavior."""
    return _run(spark, sf_dir, [
        {"name": "okey", "type": "Direct Map", "source": "o_orderkey"},
        {"name": "missing_name", "type": "Lookup", "map_name": "customer",
         "in_col": "o_totalprice", "key_col": "c_custkey",
         "val_col": "c_name"},
    ])


FLAGSHIP_RULES = [
    {"name": "okey", "type": "Direct Map", "source": "o_orderkey"},
    {"name": "customer_name", "type": "Lookup", "map_name": "customer",
     "in_col": "o_custkey", "key_col": "c_custkey", "val_col": "c_name"},
    {"name": "priority", "type": "Conditional",
     "expression": "(`o_totalprice` > 150000)",
     "then": "VIP", "else": "Regular"},
    {"name": "segment", "type": "Conditional",
     "expression": "(`o_totalprice` > 50000) & (`o_orderstatus` == 'O')",
     "then": "Target", "else": "Other"},
    {"name": "order_amount", "type": "Direct Map", "source": "o_totalprice"},
]


@query(
    "multi_rule_pipeline",
    oracle="""
    SELECT o.o_orderkey AS okey,
           c.c_name AS customer_name,
           CASE WHEN (o.o_totalprice > 150000) THEN 'VIP'
                ELSE 'Regular' END AS priority,
           CASE WHEN (o.o_totalprice > 50000) AND (o.o_orderstatus = 'O')
                THEN 'Target' ELSE 'Other' END AS segment,
           o.o_totalprice AS order_amount
    FROM orders o
    LEFT JOIN customer c
      ON CAST(o.o_custkey AS VARCHAR) = CAST(c.c_custkey AS VARCHAR)
    """,
)
def multi_rule_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: the full reference rule engine in one compiled select
    (T1+T2+T3 combined; equivalent of reference examples.json:2-5 over
    the driver corpus)."""
    return _run(spark, sf_dir, FLAGSHIP_RULES)
