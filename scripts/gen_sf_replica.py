"""Generate a statistically-equivalent REPLICA of the driver's
documents/embeddings tables at an arbitrary scale, for MEASUREMENT only
(bench_extra.py targets) — correctness stays pinned to the frozen
/root/testdata sfs and their DuckDB oracles.

Shape replicated from the frozen sf0.1 tables (measured in r6):
- documents: doc_id 0..N-1, text = U(10,100) words from the 30-word
  vocabulary; 5% of docs are near-dup copies of an earlier doc with a
  trailing " dup" token (the planted-pair population jaccard/simhash
  queries surface); lang ~ {en .41, de/es/fr/zh ~.15}, source src0..19,
  n_chars = len(text).  Shingle vocabulary saturates near vocab^3
  (~28k), so per-shingle df grows ~linearly with N and inverted-index
  pair rows ~quadratically — the property that makes the dedup queries
  scale-hard (OPTIMIZATION_r06.md "Scale robustness").
- embeddings: vec_id 0..M-1 (M = 2N/5), unit-normalized N(0,1)^64
  floats, label = vec_id % 10.

Usage: python scripts/gen_sf_replica.py <out_dir> <n_docs>
"""

from __future__ import annotations

import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_W = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]


def main() -> None:
    out, n_docs = sys.argv[1], int(sys.argv[2])
    rng = np.random.default_rng(42)

    texts: list[str] = []
    for i in range(n_docs):
        if i > 0 and rng.random() < 0.05:
            # near-dup: copy an earlier doc, append the marker token
            texts.append(texts[rng.integers(0, i)] + " dup")
        else:
            k = int(rng.integers(10, 101))
            words = rng.integers(0, len(VOCAB), size=k)
            texts.append(" ".join(VOCAB[w] for w in words))
    langs = rng.choice(LANGS, size=n_docs, p=LANG_W)
    docs = pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(langs.tolist()),
            "source": pa.array([f"src{i % 20}" for i in range(n_docs)]),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(docs, f"{out}/documents.parquet")

    m = 2 * n_docs // 5
    v = rng.standard_normal((m, 64)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    emb = pa.table(
        {
            "vec_id": pa.array(range(m), pa.int64()),
            "embedding": pa.array(list(v), pa.list_(pa.float32())),
            "label": pa.array([i % 10 for i in range(m)], pa.int32()),
        }
    )
    pq.write_table(emb, f"{out}/embeddings.parquet")
    print(f"wrote {n_docs} docs + {m} embeddings to {out}")


if __name__ == "__main__":
    main()
