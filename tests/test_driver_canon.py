"""Driver-canonicalizer safety gate (VERDICT r7 #1).

The correctness driver collects each graded query to pandas and sorts by
every column (``DataFrame.sort_values``); array cells raise ``TypeError:
unhashable type`` there, turning a RIGHT answer into an official ERR
(CORRECTNESS_r07.json: embedding_pq_codes_opq). The rotation can promote
ANY registered query into the 50-slot window, so the invariant must hold
registry-wide: no query returns ArrayType / MapType / StructType columns.

For the current grading window we additionally replay the driver's
``sort_values`` canonicalization verbatim on a collected sample, so the
gate fails on any unhashable cell type even if a new non-scalar Spark
type slips past the schema check.
"""

from __future__ import annotations

from pyspark.sql import types as T

from mapreduce_spark.registry import GRADING_PRIORITY, load_all
import pytest

NON_SCALAR = (T.ArrayType, T.MapType, T.StructType)


@pytest.mark.seal
def test_no_registered_query_returns_non_scalar_columns(spark, sf_dir):
    offenders = {}
    window = set(GRADING_PRIORITY)
    for name, spec in load_all().items():
        df = spec.fn(spark, sf_dir)
        # DateType joins the ban (r10): Spark dates reach pandas as
        # object(datetime.date) but DuckDB dates as datetime64 — identical
        # values, mismatched driver hash (caught pre-driver on dau_wau by
        # tools/check_correctness.py --typed). Emit TIMESTAMP_NTZ instead.
        # BinaryType joins the ban (r12): DuckDB BLOBs reach pandas as
        # bytearray cells, which the driver's sort_values cannot hash —
        # multimodal_ingest's official r12 ERR. Graded projections carry
        # bytes as hex (injective, both engines uppercase) instead.
        bad = [
            f.name for f in df.schema.fields
            if isinstance(f.dataType, NON_SCALAR + (T.DateType, T.BinaryType))
        ]
        if bad:
            offenders[name] = bad
            continue
        if name in window:
            # the driver's exact canonicalization step on a real sample
            pdf = df.limit(3).toPandas()
            pdf.sort_values(by=list(pdf.columns))  # raises on array cells
    assert not offenders, f"driver-canon-unsafe outputs: {offenders}"
