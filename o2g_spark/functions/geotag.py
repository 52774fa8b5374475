"""Geotag extraction (BASELINE.json B2): text → 0..n (lat, lon) points.

Replaces the reference's OSM stop-node extraction (o2g filters nodes
tagged ``public_transport=stop_position`` etc.; SURVEY.md §2.A A3
[o2g-PK]) with coordinate/place extraction from web-page text.

Two extractors, both set-oriented:

- **coordinate literals** — ``regexp_extract_all`` on the JVM (stays in
  codegen), parsed to doubles with split/cast; one output row per match
  via ``explode``. An Arrow pandas-UDF variant exists for A/B.
- **gazetteer place mentions** — one alternation regex over the (small,
  broadcast) place dictionary, then a broadcast equi-join back to the
  gazetteer for coordinates. At 100 TB the regex scan is embarrassingly
  parallel; the join side is a few thousand rows → always broadcast.

Neither extractor touches the ``text`` column itself — the
byte-identical-text invariant (BASELINE.json input_hint) is preserved
by construction; tests hash text before/after.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# "<lat>, <lon>" with 1-6 decimals, the synthetic corpus emits 4.
COORD_RE = r"(-?\d{1,2}\.\d{1,6}),\s(-?\d{1,3}\.\d{1,6})"

_POINT_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("lat", T.DoubleType(), False),
            T.StructField("lon", T.DoubleType(), False),
            T.StructField("mention", T.StringType(), False),
        ]
    )
)


def coord_matches(text: Column | str) -> Column:
    """Array of raw "lat, lon" match strings — pure JVM regex."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(c, F.lit(COORD_RE), 0)


def extract_coords(pages: DataFrame, text_col: str = "text") -> DataFrame:
    """pages → one row per coordinate literal: + (lat, lon, mention).

    Plan shape: scan → regexp_extract_all → explode → split/cast.
    All JVM-side; rows with no match are dropped (0..n semantics).
    Out-of-range pairs (|lat|>90, |lon|>180) are filtered out.
    """
    # project the match array before exploding (GenerateExec evaluates
    # generator expressions interpreted — keep the regex in a Project)
    m = pages.withColumn("__matches", coord_matches(text_col)).withColumn(
        "mention", F.explode("__matches")
    ).drop("__matches")
    parts = F.split(F.col("mention"), r",\s")
    out = (
        m.withColumn("lat", parts.getItem(0).cast(T.DoubleType()))
        .withColumn("lon", parts.getItem(1).cast(T.DoubleType()))
        .filter(
            (F.abs(F.col("lat")) <= 90.0) & (F.abs(F.col("lon")) <= 180.0)
        )
        .withColumn("geo_source", F.lit("coord"))
    )
    return out


def extract_coords_pandas_udf():
    """Arrow pandas-UDF variant of coordinate extraction (bench A/B).

    Series[str] → Series[array<struct<lat,lon,mention>>] using
    vectorized ``str.extractall`` — the BASELINE-mandated fallback shape
    for extractors Catalyst can't express.
    """
    pat = re.compile(COORD_RE)

    @F.pandas_udf(_POINT_SCHEMA)
    def _extract(text: pd.Series) -> pd.Series:
        matches = text.str.extractall(pat)
        out = [[] for _ in range(len(text))]
        if len(matches):
            for (row_i, _m), (la, lo) in zip(matches.index, matches.values):
                la_f, lo_f = float(la), float(lo)
                if abs(la_f) <= 90.0 and abs(lo_f) <= 180.0:
                    out[row_i].append(
                        {"lat": la_f, "lon": lo_f, "mention": f"{la}, {lo}"}
                    )
        return pd.Series(out)

    return _extract


def _trie_regex(names: list[str]) -> str:
    """Compile names into a prefix-sharing trie regex.

    A flat alternation costs the engine O(|names|) branch attempts per
    text position; the trie form walks shared prefixes, bounding the
    per-position cost by the trie depth regardless of gazetteer size
    (A/B numbers: scripts/bench_gazetteer.py) while staying a plain JVM
    regex (whole-stage codegen, no Python).

    Longest-match semantics are preserved: at every node the
    continuation group is tried BEFORE accepting end-of-word (greedy
    ``(?:...)?``), exactly like the longest-first alternation.
    """
    trie: dict = {}
    for name in names:
        node = trie
        for ch in name:
            node = node.setdefault(ch, {})
        node[""] = {}  # end-of-word marker

    def serialize(node: dict) -> str:
        end = "" in node
        branches = sorted(k for k in node if k != "")
        alts = [re.escape(ch) + serialize(node[ch]) for ch in branches]
        if not alts:
            return ""
        body = alts[0] if len(alts) == 1 else "(?:" + "|".join(alts) + ")"
        # end-of-word with continuations: the WHOLE suffix is optional
        # (group it — a bare `?` would bind to the last char only) and
        # greedy, so longer names are preferred before accepting here
        return "(?:" + body + ")?" if end else body

    return serialize(trie)


class _AhoCorasick:
    """Minimal Aho-Corasick automaton (dict-trie + BFS failure links)
    with regex-equivalent reporting: leftmost, longest-at-position,
    non-overlapping matches bounded by ``\\b`` word edges."""

    _WORD = set(
        "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_"
    )

    def __init__(self, names: list[str]):
        self.goto: list[dict] = [{}]
        self.out: list[int] = [0]  # longest name length ending here
        for name in names:
            s = 0
            for ch in name:
                nxt = self.goto[s].get(ch)
                if nxt is None:
                    self.goto.append({})
                    self.out.append(0)
                    nxt = len(self.goto) - 1
                    self.goto[s][ch] = nxt
                s = nxt
            self.out[s] = max(self.out[s], len(name))
        from collections import deque

        self.fail = [0] * len(self.goto)
        dq = deque(self.goto[0].values())
        while dq:
            s = dq.popleft()
            for ch, t in self.goto[s].items():
                dq.append(t)
                f = self.fail[s]
                while f and ch not in self.goto[f]:
                    f = self.fail[f]
                cand = self.goto[f].get(ch, 0)
                self.fail[t] = cand if cand != t else 0
                # propagate: longest name that is a suffix at t
                self.out[t] = max(self.out[t], self.out[self.fail[t]])

    def find_all(self, text: str) -> list[str]:
        """Matches in regex order: scan left→right, at each word-bounded
        start position keep the LONGEST name, drop overlaps.

        ``\\b`` semantics exactly: a boundary exists where word-ness
        CHANGES between neighbors (virtual out-of-string chars are
        non-word). The edge chars of the match are text[start] and
        text[i], so names with non-word edges (``St.``, ``C (D)``)
        bound the same way the compiled regex bounds them.
        """
        word = self._WORD
        n = len(text)
        cands: dict[int, int] = {}  # start -> max length
        s = 0
        for i, ch in enumerate(text):
            while s and ch not in self.goto[s]:
                s = self.fail[s]
            s = self.goto[s].get(ch, 0)
            if self.out[s] and (
                (ch in word) != (i + 1 < n and text[i + 1] in word)
            ):
                # walk the failure chain: every name ending at i
                t = s
                while t:
                    ln = self.out[t]
                    if ln:
                        start = i - ln + 1
                        if (text[start] in word) != (
                            start > 0 and text[start - 1] in word
                        ):
                            cands[start] = max(cands.get(start, 0), ln)
                    t = self.fail[t]
        out = []
        pos = 0
        for start in sorted(cands):
            if start < pos:
                continue
            ln = cands[start]
            out.append(text[start : start + ln])
            pos = start + ln
        return out


_AHO_MEMO: dict = {}


def _aho_matches_udf(places: tuple[str, ...]):
    """Arrow pandas UDF: text → array of gazetteer mentions via a
    per-worker-memoized Aho-Corasick automaton — the scale path for
    gazetteers beyond what a compiled regex can hold (10⁵–10⁶ names).
    Build cost is paid once per Python worker; match cost is O(chars),
    independent of gazetteer size."""
    import hashlib

    key = hashlib.sha256("\x1f".join(places).encode()).hexdigest()

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _match(text: pd.Series) -> pd.Series:
        ac = _AHO_MEMO.get(key)
        if ac is None:
            ac = _AhoCorasick(list(places))
            # bound worker memory with room for a FEW live gazetteers:
            # a query joining two extract_places calls interleaves both
            # UDFs' batches in one worker — a keep-one memo would
            # rebuild the 10⁵-node automaton on every batch
            while len(_AHO_MEMO) >= 4:
                _AHO_MEMO.pop(next(iter(_AHO_MEMO)))  # oldest-inserted
            _AHO_MEMO[key] = ac
        return text.map(lambda t: ac.find_all(t or ""))

    return _match


# alternation regexes degrade linearly in |names| past this point; the
# trie regex produces identical output and is flat in |names|
_TRIE_THRESHOLD = 512
# beyond this the compiled trie pattern itself gets unwieldy (multi-MB
# Java Pattern) — hand whole batches to the Aho-Corasick pandas UDF
_AHO_THRESHOLD = 200_000


def extract_places(
    pages: DataFrame,
    gazetteer: DataFrame,
    text_col: str = "text",
    matcher: str = "auto",
) -> DataFrame:
    """pages × gazetteer → one row per place mention with its coords.

    The matcher over place names is built driver-side (the gazetteer is
    a dimension table) and every variant produces IDENTICAL matches
    (leftmost, longest-at-position, non-overlapping, word-bounded —
    pinned by tests/test_geotag.py):

    - ``alternation``: longest-first ``\\b(a|b|...)\\b`` regex — fine to
      a few hundred names, O(|names|) per text position beyond;
    - ``trie``: prefix-sharing trie regex (:func:`_trie_regex`) — still
      pure JVM codegen, per-position cost flat in |names|;
    - ``aho``: Aho-Corasick pandas UDF — for gazetteers too large for
      any compiled regex;
    - ``auto`` (default): pick by gazetteer size.

    Matches broadcast-join back to the gazetteer for coordinates.
    """
    places = [
        r.place for r in gazetteer.select("place").collect()
        if r.place and r.place.strip()
    ]
    if not places:
        raise ValueError("empty gazetteer")
    if matcher == "auto":
        if len(places) > _AHO_THRESHOLD:
            matcher = "aho"
        elif len(places) > _TRIE_THRESHOLD:
            matcher = "trie"
        else:
            matcher = "alternation"
    if matcher == "alternation":
        alternation = "|".join(
            re.escape(p) for p in sorted(places, key=len, reverse=True)
        )
        matches = F.regexp_extract_all(
            F.col(text_col), F.lit(f"\\b({alternation})\\b"), 1
        )
    elif matcher == "trie":
        matches = F.regexp_extract_all(
            F.col(text_col), F.lit(f"\\b({_trie_regex(places)})\\b"), 1
        )
    elif matcher == "aho":
        matches = _aho_matches_udf(tuple(sorted(places)))(F.col(text_col))
    else:
        raise ValueError(f"unknown matcher {matcher!r}")
    m = pages.withColumn("__matches", matches).withColumn(
        "mention", F.explode("__matches")
    ).drop("__matches")
    return (
        m.join(F.broadcast(gazetteer), m.mention == gazetteer.place, "inner")
        .drop("place")
        .withColumn("geo_source", F.lit("place"))
    )


def geotag(
    pages: DataFrame, gazetteer: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Full B2: union of coordinate + place extractions.

    Output columns: all page columns + (lat, lon, mention, geo_source).
    A page with both signals yields rows from each; a page with none
    yields nothing.
    """
    coords = extract_coords(pages, text_col)
    places = extract_places(pages, gazetteer, text_col)
    return coords.unionByName(places.select(*coords.columns))
