"""Byte-level payload SimHash near-dup: planted-variant recall + the
non-collision law.

Exact-digest dedup (multimodal_dedup) only catches byte-identical
payloads; this operator's claim is catching VARIANTS — a payload with a
few bytes changed or a short tail truncated keeps ~all its byte 4-grams,
so its 60-bit signature stays within Hamming 3 of the original. The test
plants exactly those cases among unrelated payloads and asserts the pair
set: variants found, unrelated absent.
"""

from __future__ import annotations

import pytest

from mapreduce_spark.operators.multimodal import (
    MM_SIMHASH_MAX_HAM,
    payload_simhash_pairs,
)


@pytest.fixture(scope="module", name="pairs")
def pairs_fixture(spark):
    base = ("the quick brown fox jumps over the lazy dog " * 8).encode()
    edited = bytearray(base)
    edited[10:13] = b"XYZ"  # 3-byte edit: ~7 of ~350 grams change
    truncated = base[:-20]  # short tail drop
    unrelated1 = ("completely different payload content entirely " * 8).encode()
    unrelated2 = bytes(range(32, 127)) * 4
    rows = [
        (0, bytes(base)),
        (1, bytes(edited)),
        (2, bytes(truncated)),
        (10, unrelated1),
        (11, unrelated2),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    return {
        (r["src"], r["dst"]): r["hamming"]
        for r in payload_simhash_pairs(df).collect()
    }


def test_planted_variants_found(pairs):
    """The edited and truncated copies must pair with the original (and
    with each other — both are near the same signature)."""
    for edge in [(0, 1), (0, 2), (1, 2)]:
        assert edge in pairs, f"missing planted near-dup pair {edge}: {pairs}"
        assert pairs[edge] <= MM_SIMHASH_MAX_HAM


def test_unrelated_payloads_not_paired(pairs):
    """Unrelated payloads must NOT land within Hamming 3 of anything —
    the law that separates the 60-bit profile from the degenerate
    16-bit demo width."""
    flat = {d for e in pairs for d in e}
    assert 10 not in flat and 11 not in flat, f"false pairs: {pairs}"
