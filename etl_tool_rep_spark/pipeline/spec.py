"""Declarative pipeline spec.

The reference's only IR is a JSON-serializable ``list[dict]`` of rules
(reference main.py:239, import/export main.py:327-339) in the schema
emitted by its UI builder (main.py:349-412):

    {"name": ..., "type": "Direct Map",   "source": ...}
    {"name": ..., "type": "Conditional",  "expression": ..., "then": ..., "else": ...}
    {"name": ..., "type": "Lookup",       "map_name": ..., "in_col": ...,
                                          "key_col": ..., "val_col": ...}

A second, older schema exists only as documentation in the reference's
``examples.json:1-7`` (``output_columns`` with ``lookup`` / ``condition``
objects; the ``if`` list is an implicit AND of comparisons). Both parse
here and normalize to the same dataclasses (SURVEY.md §2.1 pt 8).
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Any, Union


@dataclass(frozen=True)
class DirectMapRule:
    name: str
    source: str


@dataclass(frozen=True)
class ConditionalRule:
    name: str
    expression: str  # pandas-eval grammar; translated by expr.py
    then: Any
    else_: Any


@dataclass(frozen=True)
class LookupRule:
    name: str
    map_name: str
    in_col: str
    key_col: str
    val_col: str


Rule = Union[DirectMapRule, ConditionalRule, LookupRule]


class PipelineSpecError(ValueError):
    pass


def _parse_main_schema_rule(r: dict) -> Rule:
    t = r.get("type")
    if t == "Direct Map":
        return DirectMapRule(name=r["name"], source=r["source"])
    if t == "Conditional":
        return ConditionalRule(name=r["name"], expression=r["expression"],
                               then=r.get("then"), else_=r.get("else"))
    if t == "Lookup":
        return LookupRule(name=r["name"], map_name=r["map_name"],
                          in_col=r["in_col"], key_col=r["key_col"],
                          val_col=r["val_col"])
    raise PipelineSpecError(f"unknown rule type: {t!r}")


def _quote_literal(value: Any) -> str:
    """Quote a comparison literal the way the reference's builder does
    (format_val, reference main.py:364-367): strings quoted, numbers
    bare."""
    if isinstance(value, str):
        escaped = value.replace("'", "\\'")
        return f"'{escaped}'"
    return str(value)


def _parse_examples_schema_col(c: dict) -> Rule:
    name = c["name"]
    if "lookup" in c:
        lk = c["lookup"]
        return LookupRule(name=name, map_name=lk["mapping_file"],
                          in_col=lk["input_col"], key_col=lk["key_col"],
                          val_col=lk["target_col"])
    if "condition" in c:
        cond = c["condition"]
        terms = []
        for term in cond["if"]:  # implicit AND (examples.json:2-5)
            op = term["operator"]
            terms.append(
                f"(`{term['input_col']}` {op} {_quote_literal(term['value'])})")
        return ConditionalRule(name=name, expression=" & ".join(terms),
                               then=cond.get("then"), else_=cond.get("else"))
    if "source" in c:
        return DirectMapRule(name=name, source=c["source"])
    raise PipelineSpecError(f"cannot parse output column: {c!r}")


def parse_pipeline(spec: Union[str, bytes, list, dict]) -> list[Rule]:
    """Parse either pipeline JSON schema into normalized rules.

    Accepts a JSON string/bytes, an already-decoded list (main.py rules
    schema), or a dict with ``output_columns`` (examples.json schema).
    """
    if isinstance(spec, (str, bytes)):
        spec = json.loads(spec)
    if isinstance(spec, dict) and "output_columns" in spec:
        return [_parse_examples_schema_col(c) for c in spec["output_columns"]]
    if isinstance(spec, list):
        return [_parse_main_schema_rule(r) for r in spec]
    raise PipelineSpecError(f"unrecognized pipeline spec shape: {type(spec)}")


def export_pipeline(rules: list[Rule]) -> str:
    """Serialize back to the main.py rule schema (round-trip surface,
    reference main.py:336-339)."""
    out = []
    for r in rules:
        if isinstance(r, DirectMapRule):
            out.append({"name": r.name, "type": "Direct Map",
                        "source": r.source})
        elif isinstance(r, ConditionalRule):
            out.append({"name": r.name, "type": "Conditional",
                        "expression": r.expression, "then": r.then,
                        "else": r.else_})
        elif isinstance(r, LookupRule):
            out.append({"name": r.name, "type": "Lookup",
                        "map_name": r.map_name, "in_col": r.in_col,
                        "key_col": r.key_col, "val_col": r.val_col})
    return json.dumps(out, indent=2)
