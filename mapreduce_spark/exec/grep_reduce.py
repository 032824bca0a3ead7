#!/usr/bin/env python3
"""Grep reducer: project the value (text after the first tab), dropping
malformed lines. Contract-compatible with the reference's grep_reduce.py
(/root/reference/tests/testdata/exec/grep_reduce.py:11-33)."""

import sys

for line in sys.stdin:
    line = line.rstrip("\n")
    if "\t" in line:
        sys.stdout.write(line.split("\t", 1)[1] + "\n")
