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

    JVM-side only: sequence + transform + slice, no Python UDF. Documents
    shorter than n words produce an empty array.
    """
    return F.when(
        F.size(tok_col) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(tok_col) - n),
            lambda i: F.concat_ws(" ", F.slice(tok_col, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


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
