"""Build-artifact materialization for multiply-consumed derived frames.

Spark plans recompute a DataFrame subtree once PER REFERENCE in the
consuming physical plan: there is no common-subexpression elimination
across joins/unions, and exchange reuse did not fire on these shapes —
the r12-start executed plan of ``similarity_ivfpq_adc_residual`` carried
194 shuffle exchanges, 127 broadcast builds, 134 parquet scans and ZERO
``ReusedExchange`` nodes, i.e. the in-plan Lloyd quantizer training ran
dozens of times per execution (plans/r12/*_before.txt). The guide's
remedies are §3.3 "materialising an intermediate result truncates the
plan" and §1.2 step 1 "don't compute things you throw away": checkpoint
the small trained artifact once and let every consumer read it.

``materialize`` eagerly ``localCheckpoint``s the frame: the subtree runs
exactly once, on the executors (MEMORY_AND_DISK — never the driver),
and the returned frame scans that materialization. Values are
unchanged — the subtree is deterministic and the oracle gate re-verifies
every consumer. Lifetime is the query invocation that built it: every
bench rep and every driver grading call re-derives the artifact from the
parquet inputs (the EAGER_BUILD discipline in bench.py times it per
rep), so nothing persists across runs.

At 100 TB the same cut is what an index/tokenizer/quantizer BUILD is:
train once, serve many. A consumer plan that re-derives the quantizer
k times multiplies the n^1.25 training term by k; materialization makes
it 1x and leaves the serve path's cost law untouched.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def run_concurrently(*thunks) -> list:
    """Run independent Spark ACTIONS (e.g. two table writes that share
    no dependency) from a small thread pool so the second job's tasks
    back-fill executors freed by the first job's straggler tail — the
    guide §2.6 overlap pattern. Spark's scheduler runs concurrent jobs
    FIFO, which is exactly the back-fill behavior wanted; results come
    back in argument order and exceptions propagate.

    ``SPARK_GRAFT_SERIAL_BUILD=1`` runs the thunks serially instead —
    the A/B measurement knob (and the conservative posture for
    memory-tight clusters, where two concurrent jobs' peak state may
    not co-reside)."""
    if os.environ.get("SPARK_GRAFT_SERIAL_BUILD") or len(thunks) == 1:
        return [t() for t in thunks]
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=len(thunks)) as pool:
        futures = [pool.submit(t) for t in thunks]
        return [f.result() for f in futures]


def materialize(df: DataFrame) -> DataFrame:
    """Eagerly localCheckpoint a (small) derived frame; see module doc.

    ``SPARK_GRAFT_NO_MATERIALIZE=1`` turns every call into a no-op —
    the A/B measurement knob (guide §1: measure both ways under the
    same host weather). Values are identical either way; only the
    plan shape (one checkpointed run vs N in-plan re-derivations)
    changes, so the knob cannot affect the oracle gate."""
    if os.environ.get("SPARK_GRAFT_NO_MATERIALIZE"):
        return df
    return df.localCheckpoint(eager=True)
