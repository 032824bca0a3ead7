#!/usr/bin/env python3
"""Word-count reducer (sorted "key\tvalue" lines -> "key\ttotal" lines).

Contract-compatible with the reference's wc_reduce.sh
(/root/reference/tests/testdata/exec/wc_reduce.sh:14): counts runs of
ADJACENT equal keys — correct only because the framework delivers input
sorted, exactly the reference's sort->merge->reduce contract. Key is the
text before the FIRST tab (may be the empty string).
"""

import sys
from itertools import groupby


def key_of(line: str) -> str:
    """Key = text before the FIRST tab (may be the empty string)."""
    return line.rstrip("\n").split("\t", 1)[0]


for key, grp in groupby(sys.stdin, key=key_of):
    sys.stdout.write(f"{key}\t{sum(1 for _ in grp)}\n")
