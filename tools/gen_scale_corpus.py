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


if __name__ == "__main__":
    gen(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))
