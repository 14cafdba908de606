"""pandas-eval expression grammar -> SQL translator.

The reference evaluates Conditional expressions with
``pandas.DataFrame.eval(engine='python')`` (reference main.py:154). Its
UI builder only emits parenthesized binary comparisons joined by
``&``/``|`` (main.py:361,370-380), but imported JSON pipelines reach
eval unchecked (main.py:327-334), so the accepted grammar is the eval
superset: arithmetic (+ - * / % **), comparisons (== != > < >= <=),
boolean ops (& | and or), negation (~ / not), parentheses, backticked
or bare column names, numeric / string / boolean literals.

We never eval Python. The expression is tokenized and re-emitted as a
SQL string in one of two dialects:

  * ``spark``  — for ``F.expr(...)``: identifiers backtick-quoted.
  * ``duckdb`` — for the correctness oracle: identifiers double-quoted.

NULL semantics need no special handling: pandas eval treats NaN
comparisons as False so NaN rows take the else-branch (verified,
SURVEY.md §2.1 pt 6), and SQL's ``CASE WHEN <null-cond>`` also falls
through to ELSE. The semantics line up for the whole comparison
grammar.

KNOWN DIVERGENCE: ``%`` on negative operands follows SQL semantics
(sign of the dividend: -1 % 3 = -1) while Python/pandas-eval follows
the divisor's sign (-1 % 3 = 2). A token-stream translator cannot
restructure the expression to pmod; pipelines using ``%`` on possibly
negative values should write the intent explicitly.
"""

from __future__ import annotations

import re

_TOKEN_RE = re.compile(
    r"""
      (?P<ws>\s+)
    | (?P<bident>`[^`]*`)
    | (?P<str1>'(?:[^'\\]|\\.)*')
    | (?P<str2>"(?:[^"\\]|\\.)*")
    | (?P<num>\d+\.\d*(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?|\d+(?:[eE][+-]?\d+)?)
    | (?P<name>[A-Za-z_][A-Za-z_0-9]*)
    | (?P<op>\*\*|==|!=|>=|<=|>|<|&|\||~|\(|\)|\+|-|\*|/|%|,|\[|\])
    """,
    re.VERBOSE,
)

# python/pandas-eval keywords -> SQL
_KEYWORDS = {
    "and": "AND", "or": "OR", "not": "NOT",
    "True": "TRUE", "False": "FALSE", "None": "NULL",
    "in": "IN",
}

# pandas-eval list literals (`x in [1, 2]`) become SQL IN-lists
_BRACKETS = {"[": "(", "]": ")"}

_OPS = {
    "&": "AND", "|": "OR", "~": "NOT", "==": "=", "**": "^",
}


class ExprError(ValueError):
    pass


def _emit_ident(name: str, dialect: str) -> str:
    if dialect == "spark":
        return f"`{name}`"
    escaped = name.replace('"', '""')
    return f'"{escaped}"'


def _emit_string(body: str) -> str:
    # normalize python-style escapes to a SQL single-quoted literal.
    # latin-1/backslashreplace keeps non-ASCII intact while letting
    # unicode_escape process the backslash sequences (a bare utf-8
    # round-trip through unicode_escape mojibakes 'café').
    unescaped = (body.encode("latin-1", "backslashreplace")
                 .decode("unicode_escape"))
    return "'" + unescaped.replace("'", "''") + "'"


def translate_expr(expression: str, dialect: str = "spark") -> str:
    """Translate a pandas-eval expression string into a SQL expression.

    >>> translate_expr("(`amount` > 1000) & (`status` == 'Active')")
    "(`amount` > 1000) AND (`status` = 'Active')"
    """
    if dialect not in ("spark", "duckdb"):
        raise ExprError(f"unknown dialect {dialect!r}")
    out: list[str] = []
    pos = 0
    n = len(expression)
    while pos < n:
        m = _TOKEN_RE.match(expression, pos)
        if not m:
            raise ExprError(
                f"cannot tokenize expression at offset {pos}: "
                f"{expression[pos:pos + 20]!r}")
        pos = m.end()
        kind = m.lastgroup
        tok = m.group()
        if kind == "ws":
            continue
        if kind == "bident":
            out.append(_emit_ident(tok[1:-1], dialect))
        elif kind == "str1":
            out.append(_emit_string(tok[1:-1]))
        elif kind == "str2":
            out.append(_emit_string(tok[1:-1]))
        elif kind == "num":
            out.append(tok)
        elif kind == "name":
            if tok in _KEYWORDS:
                out.append(_KEYWORDS[tok])
            else:
                # bare name == column reference in pandas eval
                out.append(_emit_ident(tok, dialect))
        elif kind == "op":
            if tok in _BRACKETS:
                out.append(_BRACKETS[tok])
            elif tok == "**":
                # SQL has no **; both Spark and DuckDB expose power()
                # but '^' means XOR in Spark — rewrite handled below.
                out.append("**")
            else:
                out.append(_OPS.get(tok, tok))
    sql = " ".join(out)
    # a ** b -> power(a, b) would need a parser; the reference's UI
    # never emits **, so reject rather than mistranslate.
    if "**" in sql:
        raise ExprError("'**' is not supported; use power() explicitly")
    if "IN ( )" in sql:
        raise ExprError("empty IN-list (pandas eval allows `x in []`; "
                        "SQL does not — drop the term instead)")
    return sql
