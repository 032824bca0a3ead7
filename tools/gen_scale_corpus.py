"""Self-generated scale corpora for the two-point scaling bench
(VERDICT r10 #3).

The driver ships sf0.001/0.01/0.1 only, so the 100 TB posture had ONE
measured point — plan audits and cost gauges are shape evidence, not an
empirical growth curve. This generator produces documents.parquet +
embeddings.parquet (the only tables the expensive headline queries
read) at arbitrary scale, matching the driver testdata's SHAPE: the
same 30-word vocabulary at near-uniform frequency, ~45-580-char docs
averaging ~300, the same 5-lang / 20-source mixes, a planted exact-dup
tail, and UNIT-NORM 64-dim float embeddings with 10 labels (the
driver's vectors are unit-length; raw N(0,1) components overflow the
residual tier's +-30000 micro-unit headroom guard).
Deterministic (numpy PCG, fixed seed). Both scale points come from THIS
generator, so generation idiosyncrasies cancel out of the growth ratio
— the driver's own corpora are never compared against these.

    python tools/gen_scale_corpus.py /tmp/scale_a 5000 2000
    python tools/gen_scale_corpus.py /tmp/scale_b 25000 10000

Round 12 (VERDICT r11 #3) adds the RELATIONAL side so the two-point
bench can cover the TPC-H/window/SCD2 headline queries: pass n_orders
and n_events as argv[4]/argv[5] and the generator also emits
orders (n), lineitem (~4n, TPC-H-ish 1..7 lines/order), customer
(n/10), events (n_events over n_events/66 users, 30-day window), and
the driver-sized static dims (supplier 1000 / nation 25 / region 5 /
part 20000) — shapes and value ranges mirror TESTDATA.md's sf0.1.

    python tools/gen_scale_corpus.py /tmp/scale_a 5000 2000 30000 20000
    python tools/gen_scale_corpus.py /tmp/scale_b 25000 10000 150000 100000
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "join", "hash", "row", "batch", "scan", "customer", "column", "filter",
    "small", "slow", "merge", "order", "vector", "line", "data", "table",
    "agg", "value", "key", "stream", "window", "spark", "a", "group",
    "part", "big", "sort", "query", "fast", "the",
]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.15, 0.15, 0.15, 0.14]
N_SOURCES = 20
DUP_FRAC = 0.002  # exact-dup tail (driver sf0.1: 8 dup texts / 5000)
EMB_DIM = 64
N_LABELS = 10


def gen(out_dir: str, n_docs: int, n_vecs: int, seed: int = 1142) -> None:
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)

    texts: list[str] = []
    for i in range(n_docs):
        if texts and rng.random() < DUP_FRAC:
            texts.append(texts[rng.integers(0, len(texts))])
            continue
        n_words = int(rng.integers(8, 100))
        words = rng.choice(VOCAB, size=n_words)
        texts.append(" ".join(words))
    docs = pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(
                rng.choice(LANGS, size=n_docs, p=LANG_P), pa.string()
            ),
            "source": pa.array(
                [f"src{int(s)}" for s in rng.integers(0, N_SOURCES, n_docs)],
                pa.string(),
            ),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(docs, os.path.join(out_dir, "documents.parquet"))

    vecs = rng.normal(size=(n_vecs, EMB_DIM))
    vecs = (vecs / np.linalg.norm(vecs, axis=1, keepdims=True)).astype(
        np.float32
    )
    emb = pa.table(
        {
            "vec_id": pa.array(range(n_vecs), pa.int64()),
            "embedding": pa.array(
                [v.tolist() for v in vecs], pa.list_(pa.float32())
            ),
            "label": pa.array(
                rng.integers(0, N_LABELS, n_vecs).astype(np.int32), pa.int32()
            ),
        }
    )
    pq.write_table(emb, os.path.join(out_dir, "embeddings.parquet"))
    print(f"{out_dir}: {n_docs} docs, {n_vecs} vecs")


PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUSES = ["F", "O", "P"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
ETYPES = ["click", "error", "purchase", "signup", "view"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
PNOUNS = ["ring", "bolt", "screw", "plate", "tube", "rod", "cap", "gear"]
PADJS = ["large", "hot", "blue", "red", "small", "dim", "new", "old"]
N_SUPPLIER = 1000
N_PART = 20000
N_NATION = 25
N_REGION = 5
_DAY_US = 86_400_000_000


def _ts_us(base_us: int, offsets_us) -> pa.Array:
    return pa.array(
        (base_us + offsets_us).astype(np.int64), pa.timestamp("us")
    )


def gen_rel(out_dir: str, n_orders: int, n_events: int, seed: int = 2184) -> None:
    """TPC-H-ish relational corpus at an arbitrary scale point, shaped
    like the driver testdata (TESTDATA.md): orders/lineitem/customer/
    events scale with the arguments; supplier/nation/region/part stay
    driver-sized (broadcast dims — scaling them would only blur the
    fact-table growth ratio)."""
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    n_cust = max(1, n_orders // 10)
    base_1995_us = 788_918_400_000_000  # 1995-01-01 UTC in micros

    okey = np.arange(n_orders, dtype=np.int64)
    odate_us = rng.integers(0, 2400 * _DAY_US, n_orders)
    orders = pa.table(
        {
            "o_orderkey": pa.array(okey),
            "o_custkey": pa.array(
                rng.integers(0, n_cust, n_orders).astype(np.int64)
            ),
            "o_orderstatus": pa.array(
                rng.choice(STATUSES, size=n_orders), pa.string()
            ),
            "o_totalprice": pa.array(
                np.round(rng.uniform(1000.0, 500000.0, n_orders), 2)
            ),
            "o_orderdate": _ts_us(base_1995_us, odate_us),
            "o_orderpriority": pa.array(
                rng.choice(PRIORITIES, size=n_orders), pa.string()
            ),
        }
    )
    pq.write_table(orders, os.path.join(out_dir, "orders.parquet"))

    lines_per = rng.integers(1, 8, n_orders)
    l_okey = np.repeat(okey, lines_per)
    n_li = int(l_okey.size)
    linenums = np.concatenate(
        [np.arange(1, c + 1, dtype=np.int32) for c in lines_per]
    )
    lineitem = pa.table(
        {
            "l_orderkey": pa.array(l_okey),
            "l_partkey": pa.array(
                rng.integers(0, N_PART, n_li).astype(np.int64)
            ),
            "l_suppkey": pa.array(
                rng.integers(0, N_SUPPLIER, n_li).astype(np.int64)
            ),
            "l_linenumber": pa.array(linenums, pa.int32()),
            "l_quantity": pa.array(
                rng.integers(1, 51, n_li).astype(np.float64)
            ),
            "l_extendedprice": pa.array(
                np.round(rng.uniform(900.0, 105000.0, n_li), 2)
            ),
            "l_discount": pa.array(
                np.round(rng.integers(0, 11, n_li) / 100.0, 2)
            ),
            "l_tax": pa.array(np.round(rng.integers(0, 9, n_li) / 100.0, 2)),
            "l_returnflag": pa.array(
                rng.choice(["A", "N", "R"], size=n_li), pa.string()
            ),
            "l_linestatus": pa.array(
                rng.choice(["F", "O"], size=n_li), pa.string()
            ),
            "l_shipdate": _ts_us(
                base_1995_us, rng.integers(0, 2500 * _DAY_US, n_li)
            ),
        }
    )
    pq.write_table(lineitem, os.path.join(out_dir, "lineitem.parquet"))

    customer = pa.table(
        {
            "c_custkey": pa.array(np.arange(n_cust, dtype=np.int64)),
            "c_name": pa.array(
                [f"Customer#{i:09d}" for i in range(n_cust)], pa.string()
            ),
            "c_nationkey": pa.array(
                rng.integers(0, N_NATION, n_cust).astype(np.int32), pa.int32()
            ),
            "c_acctbal": pa.array(
                np.round(rng.uniform(-999.0, 9999.0, n_cust), 2)
            ),
            "c_mktsegment": pa.array(
                rng.choice(SEGMENTS, size=n_cust), pa.string()
            ),
        }
    )
    pq.write_table(customer, os.path.join(out_dir, "customer.parquet"))

    n_users = max(1, n_events // 66)
    base_2024_us = 1_704_067_200_000_000  # 2024-01-01 UTC in micros
    events = pa.table(
        {
            "event_id": pa.array(np.arange(n_events, dtype=np.int64)),
            "ts": _ts_us(
                base_2024_us, np.sort(rng.integers(0, 30 * _DAY_US, n_events))
            ),
            "user_id": pa.array(
                rng.integers(0, n_users, n_events).astype(np.int64)
            ),
            "event_type": pa.array(
                rng.choice(ETYPES, size=n_events), pa.string()
            ),
            "value": pa.array(
                np.round(
                    np.minimum(rng.exponential(50.0, n_events), 560.0), 2
                )
            ),
            "props": pa.array(
                [f'{{"k": {int(k)}}}' for k in rng.integers(0, 100, n_events)],
                pa.string(),
            ),
        }
    )
    pq.write_table(events, os.path.join(out_dir, "events.parquet"))

    supplier = pa.table(
        {
            "s_suppkey": pa.array(np.arange(N_SUPPLIER, dtype=np.int64)),
            "s_name": pa.array(
                [f"Supplier#{i:09d}" for i in range(N_SUPPLIER)], pa.string()
            ),
            "s_nationkey": pa.array(
                rng.integers(0, N_NATION, N_SUPPLIER).astype(np.int32),
                pa.int32(),
            ),
            "s_acctbal": pa.array(
                np.round(rng.uniform(-999.0, 9999.0, N_SUPPLIER), 2)
            ),
        }
    )
    pq.write_table(supplier, os.path.join(out_dir, "supplier.parquet"))

    nation = pa.table(
        {
            "n_nationkey": pa.array(
                np.arange(N_NATION, dtype=np.int32), pa.int32()
            ),
            "n_name": pa.array(
                [f"NATION_{i}" for i in range(N_NATION)], pa.string()
            ),
            "n_regionkey": pa.array(
                (np.arange(N_NATION) % N_REGION).astype(np.int32), pa.int32()
            ),
        }
    )
    pq.write_table(nation, os.path.join(out_dir, "nation.parquet"))

    region = pa.table(
        {
            "r_regionkey": pa.array(
                np.arange(N_REGION, dtype=np.int32), pa.int32()
            ),
            "r_name": pa.array(
                ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
                pa.string(),
            ),
        }
    )
    pq.write_table(region, os.path.join(out_dir, "region.parquet"))

    part = pa.table(
        {
            "p_partkey": pa.array(np.arange(N_PART, dtype=np.int64)),
            "p_name": pa.array(
                [
                    f"{rng.choice(PADJS)} {rng.choice(PNOUNS)}"
                    for _ in range(N_PART)
                ],
                pa.string(),
            ),
            "p_brand": pa.array(
                [f"Brand#{int(b)}" for b in rng.integers(1, 26, N_PART)],
                pa.string(),
            ),
            "p_type": pa.array(rng.choice(PTYPES, size=N_PART), pa.string()),
            "p_size": pa.array(
                rng.integers(1, 51, N_PART).astype(np.int32), pa.int32()
            ),
            "p_retailprice": pa.array(
                np.round(900.0 + 0.1 * np.arange(N_PART), 2)
            ),
        }
    )
    pq.write_table(part, os.path.join(out_dir, "part.parquet"))
    print(
        f"{out_dir}: {n_orders} orders, {n_li} lineitem, {n_cust} customer, "
        f"{n_events} events (+static dims)"
    )


if __name__ == "__main__":
    gen(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))
    if len(sys.argv) > 5:
        gen_rel(sys.argv[1], int(sys.argv[4]), int(sys.argv[5]))
