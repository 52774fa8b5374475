"""Production-CLI rolling-crawl dedup (--stage dedup-incremental):
increment 1 pairs batch1 against the index built from the corpus,
--merge-index folds it in, increment 2 (fresh warehouse, same
--index-dir) pairs batch2 against corpus ∪ batch1 — each increment's
checkpointed pairs must equal the full-corpus minhash_lsh_pairs run
restricted to that batch's new-touching pairs. Rerunning increment 1's
exact command must resume (not recompute, not re-merge). Runs the CLI
in a SUBPROCESS because it owns (and stops) its SparkSession."""

import json
import os
import subprocess
import sys

import numpy as np
import pandas as pd
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

NH, NB, TH = 32, 16, 0.7  # the CLI stage's fixed banding + threshold


def _pages(ids, seed=11) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    vocab = np.array([f"w{i:03d}" for i in range(400)])
    texts = {
        i: " ".join(rng.choice(vocab, size=12, replace=True)) + f" tail{i}"
        for i in ids
    }
    return pd.DataFrame({
        "url": [f"https://ex.org/p{i}" for i in ids],
        "warc_ts": pd.Timestamp("2024-06-01"),
        "html": [f"<html>{texts[i]}</html>".encode() for i in ids],
        "text": [texts[i] for i in ids],
        "lang": "en",
    })


def _run_cli(argv, timeout=420):
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "run_pipeline.py"),
         *argv],
        env=dict(os.environ, SPARK_GRAFT_CPUS="4"),
        capture_output=True, text=True, timeout=timeout,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return [json.loads(ln) for ln in out.stdout.strip().splitlines()]


def _vecs(ids, seed=5) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    m = {i: rng.standard_normal(16) for i in ids}
    return pd.DataFrame({
        "vec_id": list(ids),
        "embedding": [m[i].tolist() for i in ids],
    })


@pytest.fixture(scope="module")
def crawl(spark, tmp_path_factory):
    """corpus (200 docs), batch1 (30), batch2 (30) — with duplicate
    TEXTS planted across the groups under distinct urls (re-crawl
    shape): batch1 copies corpus texts, batch2 copies corpus AND
    batch1 texts. Plus (vec_id, embedding) tables for the embedding
    half, with near-identical vectors planted batch1→corpus."""
    root = tmp_path_factory.mktemp("crawl")
    corpus = _pages(range(200))
    batch1 = _pages(range(200, 230))
    batch2 = _pages(range(230, 260))
    for k in range(5):  # batch1[k] duplicates corpus[3k]
        batch1.loc[k, "text"] = corpus.loc[3 * k, "text"]
    for k in range(4):  # batch2 duplicates corpus[50+3k] and batch1[10+k]
        batch2.loc[k, "text"] = corpus.loc[50 + 3 * k, "text"]
        batch2.loc[4 + k, "text"] = batch1.loc[10 + k, "text"]
    emb_corpus = _vecs(range(200))
    emb_batch1 = _vecs(range(200, 230), seed=6)
    for k in range(5):  # batch1 vec near-duplicates corpus vec 7k
        emb_batch1.at[k, "embedding"] = (
            np.asarray(emb_corpus.at[7 * k, "embedding"])
            + 1e-5 * np.random.default_rng(900 + k).standard_normal(16)
        ).tolist()
    paths = {}
    for name, pdf in (("corpus", corpus), ("batch1", batch1),
                      ("batch2", batch2), ("emb_corpus", emb_corpus),
                      ("emb_batch1", emb_batch1)):
        p = str(root / name)
        spark.createDataFrame(pdf).write.parquet(p)
        paths[name] = p
    return root, paths, {"corpus": corpus, "batch1": batch1,
                         "batch2": batch2, "emb_corpus": emb_corpus,
                         "emb_batch1": emb_batch1}


def _expected_pairs(spark, frames, new_urls):
    from o2g_spark.operators import dedup

    allp = pd.concat(frames, ignore_index=True)[["url", "text"]]
    full = dedup.minhash_lsh_pairs(
        spark.createDataFrame(allp), "url", "text", NH, NB, TH)
    return {
        (r.id_a, r.id_b, r.jaccard) for r in full.collect()
        if r.id_a in new_urls or r.id_b in new_urls
    }


def test_cli_batch_dedup_emits_clusters(spark, crawl, tmp_path):
    """--stage dedup now closes the pair list into clusters: the
    dedup_clusters stage must equal a union-find over the committed
    jaccard pairs (one canonical url per near-dup cluster)."""
    root, paths, frames = crawl
    allp = pd.concat([frames["corpus"], frames["batch1"]],
                     ignore_index=True)
    src = str(tmp_path / "allpages")
    spark.createDataFrame(allp).write.parquet(src)
    wh = str(tmp_path / "wh")
    lines = _run_cli(["--pages", src, "--out", wh, "--stage", "dedup"])
    stages = {m["stage"]: m for m in lines if "stage" in m}
    pairs = {
        (r.id_a, r.id_b, r.jaccard)
        for r in spark.read.parquet(
            os.path.join(wh, "jaccard_dedup", "data")).collect()
    }
    labels = {
        (r.doc_id, r.canon_id)
        for r in spark.read.parquet(
            os.path.join(wh, "dedup_clusters", "data")).collect()
    }
    assert labels == _uf_labels(pairs) and len(labels) >= 10
    assert stages["dedup_clusters"]["clusters"] == len(
        {c for _, c in labels})
    # the dedup_stats report must be the exact histogram of the
    # labels with unpaired corpus urls counted as size-1 clusters
    from collections import Counter
    stats = {
        r.cluster_size: (r.n_clusters, r.n_docs, r.n_droppable)
        for r in spark.read.parquet(
            os.path.join(wh, "dedup_stats", "data")).collect()
    }
    expected = Counter(Counter(c for _, c in labels).values())
    expected[1] += len(set(allp["url"])) - len({d for d, _ in labels})
    assert {k: v[0] for k, v in stats.items()} == {
        k: v for k, v in expected.items() if v}
    assert all(
        v == (expected[k], k * expected[k], (k - 1) * expected[k])
        for k, v in stats.items()
    )
    assert stages["dedup_stats"]["droppable"] == sum(
        (k - 1) * v for k, v in expected.items())


def _uf_labels(pairs):
    """(doc_id, canon_id) per union-find over (id_a, id_b, score)."""
    nodes = sorted({x for a, b, _ in pairs for x in (a, b)})
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b, _ in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {(n, find(n)) for n in nodes}


def test_cli_incremental_lifecycle(spark, crawl):
    root, paths, frames = crawl
    idx = str(root / "idx")
    wh1, wh2 = str(root / "wh1"), str(root / "wh2")

    # increment 1: build index from corpus, pair batch1, merge it in
    # (both modalities — the embedding half rides the same invocation)
    argv1 = ["--pages", paths["corpus"], "--new-pages", paths["batch1"],
             "--embeddings", paths["emb_corpus"],
             "--new-embeddings", paths["emb_batch1"],
             "--out", wh1, "--index-dir", idx,
             "--stage", "dedup-incremental", "--merge-index"]
    lines = _run_cli(argv1)
    stages = {m["stage"]: m for m in lines if "stage" in m}
    assert not stages["lsh_index_build"]["resumed"]
    assert not stages["emb_index_build"]["resumed"]
    # the planted near-identical vectors surface through the emb index
    emb_pairs = spark.read.parquet(
        os.path.join(wh1, "embedding_dedup_incremental", "data"))
    assert stages["embedding_dedup_incremental"]["rows"] == \
        emb_pairs.count() >= 5
    assert all(r.id_b >= 200 for r in emb_pairs.collect())
    assert stages["emb_index_merge"]["rows"] == \
        stages["emb_index_build"]["rows"] + 30 * 8  # 30 vecs × 8 bands
    got1 = {
        (r.id_a, r.id_b, r.jaccard)
        for r in spark.read.parquet(
            os.path.join(wh1, "jaccard_dedup_incremental", "data")
        ).collect()
    }
    exp1 = _expected_pairs(
        spark, [frames["corpus"], frames["batch1"]],
        set(frames["batch1"]["url"]))
    assert got1 == exp1 and len(got1) >= 5
    merged_rows = stages["lsh_index_merge"]["rows"]

    # rerun the IDENTICAL command: everything resumes, the merge is
    # idempotent (index row count unchanged), pairs unchanged
    lines_re = _run_cli(argv1)
    stages_re = {m["stage"]: m for m in lines_re if "stage" in m}
    assert stages_re["lsh_index_build"]["resumed"]
    assert stages_re["jaccard_dedup_incremental"]["resumed"]
    assert stages_re["lsh_index_merge"]["rows"] == merged_rows
    assert stages_re["jaccard_dedup_incremental"]["rows"] == len(got1)
    assert stages_re["emb_index_build"]["resumed"]
    assert stages_re["embedding_dedup_incremental"]["resumed"]
    # emb re-merge is a no-op too (dedupe on vec id)
    assert stages_re["emb_index_merge"]["rows"] == \
        stages["emb_index_merge"]["rows"]

    # the merge also rolled the persisted dup-cluster labels forward:
    # labels must equal a union-find over increment 1's pairs
    labels1 = {
        (r.doc_id, r.canon_id)
        for r in spark.read.parquet(
            os.path.join(idx, "dup_labels", "data")).collect()
    }
    assert labels1 == _uf_labels(got1)
    assert stages["dup_labels"]["rows"] == len(labels1) > 0

    # compact: fold the merge deltas into the base snapshots (explicit
    # O(corpus) maintenance); increment 2 below then reads the
    # compacted index — its exactness doubles as the reader-invariance
    # check through the CLI path
    lines_c = _run_cli([*argv1, "--compact-index"])
    stages_c = {m["stage"]: m for m in lines_c if "stage" in m}
    assert stages_c["lsh_index_compact"]["deltas_folded"] >= 1
    assert stages_c["emb_index_compact"]["deltas_folded"] >= 1
    assert stages_c["lsh_index_compact"]["rows"] == merged_rows

    # increment 2: fresh warehouse, same index — batch2 pairs against
    # corpus AND batch1 (through the merged index)
    lines2 = _run_cli(
        ["--pages", paths["corpus"], "--new-pages", paths["batch2"],
         "--out", wh2, "--index-dir", idx,
         "--stage", "dedup-incremental"])
    stages2 = {m["stage"]: m for m in lines2 if "stage" in m}
    assert stages2["lsh_index_build"]["resumed"]  # index already built
    got2 = {
        (r.id_a, r.id_b, r.jaccard)
        for r in spark.read.parquet(
            os.path.join(wh2, "jaccard_dedup_incremental", "data")
        ).collect()
    }
    exp2 = _expected_pairs(
        spark, [frames["corpus"], frames["batch1"], frames["batch2"]],
        set(frames["batch2"]["url"]))
    assert got2 == exp2 and len(got2) >= 8
    # the batch1-planted dups surface ONLY via the merged index
    b1 = set(frames["batch1"]["url"])
    assert any(a in b1 or b in b1 for a, b, _ in got2)
