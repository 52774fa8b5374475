"""passage_dedup vs EXACT Lee-et-al. ExactSubstr semantics (r5 verdict
#4): quantify what the token-window fingerprint form misses or merges
on planted ADVERSARIAL span layouts.

The reference here is a brute-force TRUE-SEQUENCE implementation of
the operator's documented semantics — "remove every token covered by a
k-window whose exact token sequence has an earlier (doc, start)
occurrence" — which is provably the same token-removal set as
suffix-array ExactSubstr with the first-occurrence keep rule:

  t removed by ExactSubstr
    ⟺ t lies in some ≥k-token substring occurrence with an earlier
      occurrence of the same substring
    ⟺ some k-window covering t has an earlier occurrence
      (⇒: any ≥k substring containing t contains a k-window covering t,
       and that window recurs inside the earlier occurrence;
       ⇐: the k-window IS such a substring).

So the operator diverges from exact semantics ONLY through (a) joint
fingerprint collisions (~2×56 effective bits; expected ~1e-7 false
collisions at the 100 TB window count) and (b) its whitespace
tokenization vs the paper's BPE tokens. This script measures (a)=0 on
planted adversarial layouts by comparing rebuilt texts byte-for-byte
against the brute reference, for both strategies.

Usage: python scripts/bench_passage_exact.py
Writes a markdown table to stdout (pasted into BENCH/BASELINE.md).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from o2g_spark.operators.passages import passage_dedup  # noqa: E402
from o2g_spark.session import get_spark  # noqa: E402

K = 8  # small k so the adversarial geometry is readable; semantics are k-invariant


def brute_exact(rows: list[tuple[int, str]], k: int) -> dict[int, str]:
    """True-sequence (no fingerprint) reference of the documented
    semantics; dict id → rebuilt text."""
    toks = {i: t.split() for i, t in rows}
    first: dict[tuple, tuple] = {}  # window tokens → earliest (id, start)
    for i, ts in sorted(toks.items()):
        for s in range(len(ts) - k + 1):
            w = tuple(ts[s:s + k])
            if w not in first:
                first[w] = (i, s)
    out = {}
    for i, ts in sorted(toks.items()):
        covered = [False] * len(ts)
        for s in range(len(ts) - k + 1):
            w = tuple(ts[s:s + k])
            if first[w] != (i, s):
                for p in range(s, s + k):
                    covered[p] = True
        out[i] = " ".join(t for t, c in zip(ts, covered) if not c)
    return out


def tok(n: int, tag: str) -> str:
    return " ".join(f"{tag}{j}" for j in range(n))


def cases() -> dict[str, list[tuple[int, str]]]:
    A, B, C = tok(K, "a"), tok(K, "b"), tok(K, "c")
    uniq = lambda i, n=4: " ".join(f"u{i}_{j}" for j in range(n))  # noqa: E731
    return {
        # duplicate shifted by 1..k-1 tokens inside otherwise-unique text
        "shifted windows": [
            (1, f"{uniq(1)} {A} {uniq(2)}"),
            (2, f"{uniq(3, 3)} {A} {uniq(4, 9)}"),
            (3, f"{A}"),
        ],
        # two dups overlapping near the boundary: doc3 holds A+B fused
        "overlapping near-boundary": [
            (1, f"{A} {uniq(1)}"),
            (2, f"{uniq(2)} {B}"),
            (3, f"{A} {B}"),
        ],
        # staggered triple: kept-copy choice alternates between docs
        "staggered A|B / B|C / A|B|C": [
            (1, f"{A} {B}"),
            (2, f"{B} {C}"),
            (3, f"{A} {B} {C}"),
        ],
        # periodic self-overlap within ONE doc (suffix-array stress)
        "periodic within-doc": [
            (1, " ".join(["p q r s"] * K)),
            (2, f"{uniq(9)} " + " ".join(["p q r s"] * 3)),
        ],
        # exact full-doc duplicates + a doc shorter than k
        "full dup + short doc": [
            (1, A),
            (2, A),
            (3, "too short"),
        ],
        # partial overlap of the KEPT copy: doc2 shares only A's tail+B's head
        "kept-copy partial trim": [
            (1, f"{A} {B}"),
            (2, " ".join(A.split()[K // 2:]) + " " + " ".join(B.split()[:K // 2])),
        ],
    }


def main():
    spark = get_spark("passage_exact")
    print("| case | docs | strategy=window | strategy=join |")
    print("|---|---|---|---|")
    for name, rows in cases().items():
        want = brute_exact(rows, K)
        verdicts = []
        for strat in ("window", "join"):
            df = spark.createDataFrame(rows, ["doc_id", "text"])
            got = {
                r["doc_id"]: r["text"]
                for r in passage_dedup(df, "doc_id", "text", k=K,
                                       strategy=strat).collect()
            }
            diff = {i for i in want if want[i] != got.get(i)}
            verdicts.append("exact match" if not diff
                            else f"DIVERGES on ids {sorted(diff)}")
        print(f"| {name} | {len(rows)} | {verdicts[0]} | {verdicts[1]} |")


if __name__ == "__main__":
    main()
