#!/usr/bin/env python3
"""Grep mapper: emit "1\tline" for lines containing QUERY (default
"data"), case-insensitive. Contract-compatible with the reference's
grep_map.py (/root/reference/tests/testdata/exec/grep_map.py:28) but an
independent implementation with a different default query."""

import os
import sys

QUERY = os.environ.get("GREP_QUERY", "data").lower()

for line in sys.stdin:
    if QUERY in line.lower():
        sys.stdout.write(f"1\t{line.rstrip(chr(10))}\n")
