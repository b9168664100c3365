"""Restricted user-filter-string compiler.

The reference accepts per-field filter strings (e.g. "value > 3 AND
value <= 7") with the placeholder `value`, rewrites the placeholder to
the concrete pivot column, and AND-chains them straight into a WHERE
clause by string concatenation (reference: SQL/GetUpdateHistory.sql:
202-233 — a SQL-injection surface, SURVEY.md §7.4).

Here the string is tokenized against a whitelist grammar BEFORE it
ever reaches `F.expr`:

    expr   := clause (("AND"|"OR") clause)*
    clause := ["NOT"] "value" op literal | "(" expr ")"
    op     := = | == | != | <> | < | <= | > | >=
    literal:= integer | float

Anything else (identifiers, strings, function calls, semicolons) is
rejected. Only after validation is the placeholder substituted and the
expression handed to Catalyst, where it participates in normal
predicate pushdown.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_TOKEN = re.compile(
    r"\s*(?:(?P<lpar>\()|(?P<rpar>\))|(?P<op><=|>=|==|!=|<>|=|<|>)"
    r"|(?P<num>-?\d+(?:\.\d+)?)|(?P<word>[A-Za-z_][A-Za-z_0-9]*))"
)
_KEYWORDS = {"AND", "OR", "NOT"}


class FilterSyntaxError(ValueError):
    pass


def _tokenize(s: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(s):
        m = _TOKEN.match(s, pos)
        if not m or m.end() == pos:
            if s[pos:].strip() == "":
                break
            raise FilterSyntaxError(f"illegal character at {pos!r}: {s[pos:pos+10]!r}")
        pos = m.end()
        kind = m.lastgroup
        out.append((kind, m.group(kind)))
    return out


def _validate(tokens: list[tuple[str, str]], placeholder: str) -> None:
    # Tiny recursive-descent check of the grammar above.
    i = 0

    def expr() -> None:
        nonlocal i
        clause()
        while i < len(tokens) and tokens[i][0] == "word" and tokens[i][1].upper() in (
            "AND",
            "OR",
        ):
            i += 1
            clause()

    def clause() -> None:
        nonlocal i
        if i < len(tokens) and tokens[i][0] == "word" and tokens[i][1].upper() == "NOT":
            i += 1
        if i < len(tokens) and tokens[i][0] == "lpar":
            i += 1
            expr()
            if i >= len(tokens) or tokens[i][0] != "rpar":
                raise FilterSyntaxError("unbalanced parenthesis")
            i += 1
            return
        if not (
            i < len(tokens)
            and tokens[i][0] == "word"
            and tokens[i][1] == placeholder
        ):
            raise FilterSyntaxError(f"expected {placeholder!r} at token {i}")
        i += 1
        if i >= len(tokens) or tokens[i][0] != "op":
            raise FilterSyntaxError("expected comparison operator")
        i += 1
        if i >= len(tokens) or tokens[i][0] != "num":
            raise FilterSyntaxError("expected numeric literal")
        i += 1

    if not tokens:
        raise FilterSyntaxError("empty filter")
    expr()
    if i != len(tokens):
        raise FilterSyntaxError(f"trailing tokens at {i}")
    for kind, val in tokens:
        if kind == "word" and val.upper() not in _KEYWORDS and val != placeholder:
            raise FilterSyntaxError(f"identifier {val!r} not allowed")


def compile_filter(
    filter_str: str, column: str, placeholder: str = "value"
) -> Column:
    """Validate `filter_str` against the whitelist grammar, rewrite the
    placeholder to `column` (the reference's rewrite step,
    SQL/GetUpdateHistory.sql:212-215), and return a Catalyst Column."""
    tokens = _tokenize(filter_str)
    _validate(tokens, placeholder)
    rewritten = re.sub(
        rf"\b{re.escape(placeholder)}\b", f"`{column}`", filter_str
    )
    return F.expr(rewritten)
