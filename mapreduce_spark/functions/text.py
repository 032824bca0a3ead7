"""Tokenization / shingling column builders shared by text operators.

Reference analog: the word-count mapper tokenizes by translating spaces and
tabs to newlines and lowercasing (/root/reference/tests/testdata/exec/
wc_map.sh:12). Here tokenization is a whitespace regex split, lowercased,
with empty tokens dropped — the oracle mirrors it with
regexp_split_to_array(lower(text), '\\s+').
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

TOKEN_SPLIT_RE = r"\s+"

# SQL fragment producing the same token list in DuckDB.
SQL_TOKENS = "list_filter(regexp_split_to_array(lower({col}), '\\s+'), t -> t <> '')"


def tokens(col: str | Column) -> Column:
    """Lowercased whitespace tokens, empties removed. array<string>."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), TOKEN_SPLIT_RE), lambda t: t != "")


def shingles(tok_col: Column, n: int = 3) -> Column:
    """Word n-gram shingles over a token array (space-joined strings).

    JVM-side only, built from chained ``zip_with`` over shifted copies of
    the token array. Every array argument is evaluated ONCE per row —
    unlike a transform whose lambda slices the source expression, which
    re-evaluates the tokenizer per element (measured 20x slower). Nulls
    propagate through ``concat`` past the end of shifted copies and are
    filtered, so documents shorter than n words produce an empty array.
    """
    acc = tok_col
    for k in range(1, n):
        shifted = F.slice(
            tok_col, k + 1, F.greatest(F.size(tok_col) - k, F.lit(0))
        )
        acc = F.zip_with(acc, shifted, lambda a, b: F.concat(a, F.lit(" "), b))
    return F.filter(acc, lambda x: x.isNotNull())


def sql_shingles(tok_col: str, n: int = 3) -> str:
    """DuckDB fragment mirroring shingles() over a token-list COLUMN.

    ``tok_col`` must be a list<varchar> column in scope (1-based indexing).
    """
    joined = " || ' ' || ".join(f"{tok_col}[i + {k}]" for k in range(1, n + 1))
    return (
        f"CASE WHEN len({tok_col}) >= {n} THEN "
        f"list_transform(range(len({tok_col}) - {n} + 1), i -> {joined}) "
        f"ELSE [] END"
    )
