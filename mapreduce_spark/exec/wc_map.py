#!/usr/bin/env python3
"""Word-count mapper (stdin lines -> "token\t1" lines).

Contract-compatible with the reference's wc_map.sh
(/root/reference/tests/testdata/exec/wc_map.sh:12, `tr '[ \t]' '\n'` then
lowercase then `awk '{print $1"\t1"}'`): every char in {space, tab, '[',
']'} is a token boundary, empty segments (consecutive delimiters / blank
lines) produce EMPTY-STRING keys, everything lowercased. Independent
implementation — line-at-a-time, O(1) memory.
"""

import re
import sys

_SPLIT = re.compile(r"[ \t\[\]]")

for line in sys.stdin:
    for token in _SPLIT.split(line.rstrip("\n").lower()):
        sys.stdout.write(f"{token}\t1\n")
