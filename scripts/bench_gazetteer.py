"""A/B bench for the extract_places matchers at large gazetteer sizes
(r2 VERDICT item 8: the alternation regex is O(|names|) per text
position and degrades past ~10^4 entries).

    python scripts/bench_gazetteer.py [n_names] [n_pages]

Generates n_names synthetic multi-word place names and n_pages texts
(each embedding 0-3 mentions), then times each matcher end-to-end and
asserts all matchers return IDENTICAL rows. Prints one JSON line.

The alternation leg is skipped above 20k names — the whole point is
that it stops being runnable there (a 10^5-branch Java Pattern spends
minutes per partition).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from o2g_spark.functions import geotag  # noqa: E402
from o2g_spark.session import get_spark  # noqa: E402

SYLLABLES = (
    "ka ri to na mi lo sa ve du pe gor tan bur chester ville ford "
    "berg stad holm grad pur abad ton field"
).split()


def synth_names(n: int, seed: int = 11) -> list[str]:
    rng = np.random.default_rng(seed)
    names = set()
    while len(names) < n:
        k = int(rng.integers(2, 5))
        w = "".join(SYLLABLES[i] for i in rng.integers(0, len(SYLLABLES), k))
        name = w.capitalize()
        if rng.integers(0, 3) == 0:
            w2 = "".join(
                SYLLABLES[i] for i in rng.integers(0, len(SYLLABLES), 2)
            )
            name = name + " " + w2.capitalize()
        names.add(name)
    return sorted(names)[:n]


def main():
    n_names = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_pages = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    spark = get_spark("gaz_bench", master="local[8]")
    names = synth_names(n_names)
    rng = np.random.default_rng(5)

    fill = (
        "the quick brown fox jumps over the lazy dog while reading "
        "about geography and travel destinations around the world"
    ).split()
    texts = []
    for i in range(n_pages):
        words = [fill[j] for j in rng.integers(0, len(fill), 30)]
        for _ in range(int(rng.integers(0, 4))):
            pos = int(rng.integers(0, len(words)))
            words.insert(pos, names[int(rng.integers(0, len(names)))])
        texts.append(" ".join(words))

    pages = spark.createDataFrame(
        [(f"u{i}", t) for i, t in enumerate(texts)], ["url", "text"]
    ).localCheckpoint()
    gaz = spark.createDataFrame(
        [(p, float(i % 90), float(i % 180), "xx") for i, p in enumerate(names)],
        ["place", "lat", "lon", "country"],
    ).localCheckpoint()

    matchers = ["trie", "aho"]
    if n_names <= 20_000:
        matchers.insert(0, "alternation")

    timings, counts, digests = {}, {}, {}
    for m in matchers:
        out = geotag.extract_places(pages, gaz, matcher=m)
        out.count()  # warmup (pattern compile / automaton build)
        t0 = time.time()
        counts[m] = out.count()
        timings[m] = round(time.time() - t0, 3)
        digests[m] = (
            out.select(F.expr("bit_xor(xxhash64(url, mention))").alias("d"))
            .collect()[0]["d"]
        )

    assert len(set(digests.values())) == 1, f"matchers disagree: {digests}"
    print(json.dumps({
        "n_names": n_names,
        "n_pages": n_pages,
        "rows": counts[matchers[0]],
        "sec": timings,
        "identical_output": True,
    }))


if __name__ == "__main__":
    main()
