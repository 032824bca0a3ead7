"""Pure-SQL-expression Bloom filter: build as an ``array<bigint>`` bit set
aggregate, probe with JVM-side bit math.

Spark's internal ``BloomFilterAggregate`` (``bloom_filter_agg`` /
``might_contain``) is not registered in the public FunctionRegistry of this
build, and ``DataFrameStatFunctions.bloomFilter`` materializes the sketch on
the driver. This module gets the same effect with Catalyst expressions only,
so the filter is built by a normal (map-side partial) aggregation and the
probe participates in whole-stage codegen:

- build: each value contributes K bit positions ``pmod(xxhash64(seed, v),
  m_bits)``; positions fold into ``m_bits/64`` longs via ``bit_or`` and a
  dense array is produced with ``transform(sequence(...))``. One row out,
  constant size (m_bits/8 bytes) regardless of input cardinality — THE
  property that makes it broadcastable at 100 TB where the raw value set
  is not.
- probe: K ``element_at`` + mask tests ANDed together. No false negatives
  (same hash family both sides); false positives are bounded by the usual
  ``(1 - e^{-kn/m})^k`` and must be removed by an exact re-check (equi-join
  against the true value set) when exact answers are required.

Used by the contamination gates (streaming/events.py, operators/dedup.py):
bloom prefilter drops the overwhelmingly-common "no benchmark overlap" rows
cheaply; only surviving candidates pay the exact verification join.
"""

from __future__ import annotations

from functools import reduce
from operator import and_

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# Default geometry: 2^19 bits = 64 KiB broadcast. With K=4 hashes this holds
# ~50k distinct values at fpp < 1e-2 and ~5k at fpp < 1e-5 — sized for the
# benchmark-shingle sets the contamination gates broadcast. Callers with
# bigger static sides pass a larger m_bits (cost is linear in broadcast
# size, still corpus-size-independent).
M_BITS = 1 << 19
K_HASHES = 4


def _positions(value: Column, m_bits: int, k: int) -> list[Column]:
    """K independent bit positions for value: xxhash64 seeded by index."""
    return [
        F.pmod(F.xxhash64(F.lit(i), value), F.lit(m_bits)) for i in range(k)
    ]


def bloom_build(
    values: DataFrame,
    col: str,
    m_bits: int = M_BITS,
    k: int = K_HASHES,
) -> DataFrame:
    """Aggregate ``values[col]`` into a 1-row DataFrame with column ``bw``:
    a dense ``array<bigint>`` of m_bits/64 words. Empty input yields the
    all-zero filter (probe always misses), so an empty static side means
    "keep everything" rather than NULL-propagating rows away.
    """
    if m_bits % 64 != 0 or m_bits <= 0 or k < 1:
        raise ValueError(
            f"bloom geometry invalid: m_bits={m_bits} (need positive "
            f"multiple of 64), k={k} (need >= 1)"
        )
    n_words = m_bits // 64
    pairs = values.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.shiftright(p, 6).cast("int").alias("word"),
                        F.call_function(
                            "shiftleft",
                            F.lit(1).cast("bigint"),
                            p.bitwiseAND(F.lit(63)).cast("int"),
                        ).alias("mask"),
                    )
                    for p in _positions(F.col(col), m_bits, k)
                ]
            )
        ).alias("e")
    ).select("e.*")
    folded = pairs.groupBy("word").agg(F.expr("bit_or(mask)").alias("bits"))
    # Dense array via a range left-join (gap words -> 0), then one sorted
    # collect_list. NOT map_from_entries + element_at(map, i) per index:
    # Spark maps are unsorted entry arrays, so each map lookup is a linear
    # scan and the n_words lookups degenerate to O(n_words^2) on one row
    # (measured 4.3 s at the default geometry); array element_at is O(1).
    grid = values.sparkSession.range(n_words).select(
        F.col("id").cast("int").alias("word")
    )
    return (
        grid.join(folded, "word", "left")
        .select(
            "word", F.coalesce("bits", F.lit(0).cast("bigint")).alias("bits")
        )
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("word", "bits"))),
                lambda e: e["bits"],
            ).alias("bw")
        )
    )


def bloom_probe(
    bw: Column,
    value: Column,
    m_bits: int = M_BITS,
    k: int = K_HASHES,
) -> Column:
    """Boolean membership test of ``value`` against a ``bloom_build`` array
    column ``bw``. True may be a false positive; False is definitive."""
    conds = []
    for p in _positions(value, m_bits, k):
        word = (F.shiftright(p, 6) + 1).cast("int")  # element_at is 1-based
        mask = F.call_function(
            "shiftleft",
            F.lit(1).cast("bigint"),
            p.bitwiseAND(F.lit(63)).cast("int"),
        )
        conds.append(F.element_at(bw, word).bitwiseAND(mask) != 0)
    return reduce(and_, conds)
