"""Corpus-curation operators for training-data pipelines: deterministic
train/val/test splits, stratified + weighted sampling, per-domain
quality caps, and token-window document chunking.

These are the selection/partitioning ops a 100-TB crawl corpus needs
between dedup and training: every one is a **pure Column expression**
(whole-stage codegen, no Python in the hot path) and every one is
DETERMINISTIC — membership is a function of the row alone (a 60-bit
md5 hash, see functions/text.py), never of RNG state or partitioning.
That matters at scale for three reasons:

* reproducibility: the same corpus + seed yields the same split on any
  cluster size, any partition layout, any retry (Spark's built-in
  ``df.sample``/``randomSplit`` are per-partition-RNG and change under
  repartitioning);
* resumability: a killed job re-derives the identical assignment, so
  split/sample stages compose with the checkpoint layer without
  persisting membership;
* no-leakage audits: train/test membership can be re-checked row-wise
  downstream (the hash is the proof), instead of trusting a frozen
  file.

Each builder has a ``*_sql`` twin producing the bit-identical DuckDB
expression, so all of these ops carry full value-hash oracles in the
driver contract.

Scale notes (the 100-TB audit, per op):

* ``hash_split`` / ``stratified_sample`` — narrow (no shuffle at all):
  a map-side CASE over a hash. Filters compose with parquet scan
  pushdown on the id column.
* ``weighted_sample_topk`` — one global top-k. Spark plans
  ``TakeOrderedAndProject`` (per-partition heap + driver merge of k
  rows), NOT a full sort: safe at any corpus size for serving-sized k.
* ``domain_cap`` — one hash shuffle on the registered domain + a
  rank window. Domains are the natural skew axis of a crawl (a few
  giant hosts); the cap itself is the mitigation — the window scans a
  skewed partition once but emits ≤ max_per_domain rows from it.
* ``doc_chunks`` — narrow per-row explode; output rows ≈ tokens/step
  per doc. The chunk array is materialized via ``withColumn`` BEFORE
  the explode (CLAUDE.md rule 1: GenerateExec evaluates generator
  expressions interpreted, so exploding a computed array re-evaluates
  the tokenizer per output row).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import text as X

_MICRO = 1_000_000


def _c(x: Column | str) -> Column:
    return F.col(x) if isinstance(x, str) else x


def _sq(s: str) -> str:
    """Escape a python string for embedding as a SQL literal."""
    return s.replace("'", "''")


# ----------------------------------------------------------- hash bucket

def hash_bucket_micro(key: Column | str, seed: str) -> Column:
    """Deterministic uniform bucket in [0, 1e6): 60-bit md5 hash of
    ``seed || ':' || key``, mod 1e6. The micro-fraction grid keeps all
    threshold comparisons in exact integer space (no float fractions
    to diverge across engines)."""
    tagged = F.concat(F.lit(seed + ":"), _c(key).cast(T.StringType()))
    return F.pmod(X.md5_hash60(tagged), F.lit(_MICRO)).cast(T.LongType())


def hash_bucket_micro_sql(key: str, seed: str) -> str:
    # integer % (NOT fmod): the 60-bit hash exceeds the double mantissa,
    # so a float modulus would corrupt the bucket. The hash is
    # non-negative, so Spark pmod == Spark % == DuckDB %.
    h = X.md5_hash60_sql(f"concat('{_sq(seed)}:', CAST({key} AS VARCHAR))")
    return f"({h} % {_MICRO})"


def _micro_thresholds(weights: dict[str, float]) -> list[tuple[str, int]]:
    """Cumulative integer thresholds on the micro grid. All but the
    last split get floor(w * 1e6) micro-slots; the last absorbs the
    rounding remainder so the thresholds always cover [0, 1e6)."""
    if not weights:
        raise ValueError("weights must be non-empty")
    if any(w < 0 for w in weights.values()):
        raise ValueError("weights must be non-negative")
    total = sum(weights.values())
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    names = list(weights)
    cuts: list[tuple[str, int]] = []
    acc = 0
    for name in names[:-1]:
        acc += int(weights[name] / total * _MICRO)
        cuts.append((name, acc))
    cuts.append((names[-1], _MICRO))
    return cuts


# ------------------------------------------------------------ hash split

def split_assign(
    key: Column | str, weights: dict[str, float], seed: str = "split"
) -> Column:
    """Split label ('train'/'val'/'test'/...) for a row, as a pure
    column: deterministic in (seed, key) alone — stable under
    repartitioning, retries, and cluster size, unlike
    ``DataFrame.randomSplit`` (per-partition RNG)."""
    bucket = hash_bucket_micro(key, seed)
    cuts = _micro_thresholds(weights)
    # build innermost-out so the FIRST (smallest) matching threshold wins
    expr = F.lit(cuts[-1][0])
    for name, cut in cuts[:-1][::-1]:
        expr = F.when(bucket < cut, F.lit(name)).otherwise(expr)
    return expr


def split_assign_sql(key: str, weights: dict[str, float], seed: str = "split") -> str:
    bucket = hash_bucket_micro_sql(key, seed)
    cuts = _micro_thresholds(weights)
    expr = f"'{_sq(cuts[-1][0])}'"
    for name, cut in cuts[:-1][::-1]:
        expr = f"CASE WHEN {bucket} < {cut} THEN '{_sq(name)}' ELSE {expr} END"
    return expr


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
    seed: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Attach a deterministic split column. Narrow op — no shuffle."""
    return df.withColumn(out_col, split_assign(id_col, weights, seed))


# ---------------------------------------------------- stratified sample

def stratified_keep(
    key: Column | str,
    stratum: Column | str,
    fractions: dict[str, float],
    seed: str = "strat",
    default: float = 0.0,
) -> Column:
    """Boolean keep-mask for per-stratum deterministic sampling: a row
    survives iff hash_bucket < fraction[stratum] * 1e6. Strata absent
    from ``fractions`` use ``default``. Pure column — the sample is a
    pushdown-friendly filter, not a shuffle."""
    bucket = hash_bucket_micro(key, seed)
    thr = F.lit(int(default * _MICRO))
    for name in sorted(fractions, reverse=True):
        thr = F.when(
            _c(stratum) == name, F.lit(int(fractions[name] * _MICRO))
        ).otherwise(thr)
    return bucket < thr


def stratified_keep_sql(
    key: str,
    stratum: str,
    fractions: dict[str, float],
    seed: str = "strat",
    default: float = 0.0,
) -> str:
    bucket = hash_bucket_micro_sql(key, seed)
    thr = str(int(default * _MICRO))
    for name in sorted(fractions, reverse=True):
        thr = (
            f"CASE WHEN {stratum} = '{_sq(name)}' "
            f"THEN {int(fractions[name] * _MICRO)} ELSE {thr} END"
        )
    return f"({bucket} < {thr})"


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    fractions: dict[str, float],
    seed: str = "strat",
    default: float = 0.0,
) -> DataFrame:
    return df.where(stratified_keep(id_col, strata_col, fractions, seed, default))


# ------------------------------------------------- weighted reservoir

def weighted_sample_topk(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    seed: str = "wres",
) -> DataFrame:
    """Weighted sample WITHOUT replacement of size k (Efraimidis–
    Spirakis A-Res), deterministic: each row draws u = hash-uniform in
    (0, 1] and takes priority ln(u)/w; the k largest priorities win —
    P(selection) proportional to weight, exactly the reservoir scheme,
    but with the RNG replaced by the row hash so the "reservoir" is a
    plain distributed top-k (TakeOrderedAndProject: per-partition
    heaps, no global sort, no driver collect of the corpus).

    Weights must be > 0. Output keeps the input columns plus the
    priority (``__wkey``) dropped; rows ordered by priority descending
    with id tiebreak.
    """
    # u in (0,1]: (h mod 2^52 + 1) / 2^52 — 52 bits keeps the integer
    # exactly representable in the double mantissa, so the division is
    # a single correctly-rounded IEEE op in both engines.
    h52 = F.pmod(
        X.md5_hash60(
            F.concat(F.lit(seed + ":"), _c(id_col).cast(T.StringType()))
        ),
        F.lit(1 << 52),
    )
    u = (h52 + F.lit(1)).cast(T.DoubleType()) / F.lit(float(1 << 52))
    w = _c(weight_col)
    # non-positive weights silently invert the priority — fail loudly
    # (runtime, codegen-side; no extra job)
    key = F.when(
        w <= 0,
        F.raise_error(
            F.lit("weighted_sample_topk: weights must be > 0")
        ).cast(T.DoubleType()),
    ).otherwise(F.log(u) / w)
    ranked = df.withColumn("__wkey", key)
    return (
        ranked.orderBy(F.col("__wkey").desc(), _c(id_col).asc())
        .limit(k)
        .drop("__wkey")
    )


def weighted_sample_topk_sql(
    table_sql: str, id_col: str, weight_col: str, k: int, seed: str = "wres"
) -> str:
    h = X.md5_hash60_sql(f"concat('{seed}:', CAST({id_col} AS VARCHAR))")
    u = f"((({h} % {1 << 52}) + 1) / {float(1 << 52)})"
    return (
        f"SELECT * EXCLUDE (__wkey) FROM ("
        f"SELECT *, ln({u}) / {weight_col} AS __wkey FROM {table_sql}"
        f") ORDER BY __wkey DESC, {id_col} ASC LIMIT {k}"
    )


# ------------------------------------------------------------ domain cap

# scheme://host[:port]/...  — capture the authority, then strip
# userinfo and port. The pattern parses identically in Java regex and
# RE2/DuckDB (no lookarounds, no engine-specific classes).
_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"


def url_host(url: Column | str) -> Column:
    """Lowercased hostname of a URL (authority minus userinfo/port);
    '' when the input has no scheme://authority shape."""
    auth = F.regexp_extract(_c(url), _HOST_RE, 1)
    no_user = F.element_at(F.split(auth, "@"), -1)
    host = F.element_at(F.split(no_user, ":"), 1)
    return F.lower(host)


def url_host_sql(url: str) -> str:
    auth = f"regexp_extract({url}, '{_HOST_RE}', 1)"
    no_user = f"list_extract(string_split({auth}, '@'), -1)"
    host = f"list_extract(string_split({no_user}, ':'), 1)"
    return f"lower({host})"


# tracking params dropped by url_canonical (name, optionally =value);
# anchored both ends — rlike/regexp_matches are find-anywhere in both
# engines, the anchors make it a full-param match
TRACKING_PARAM_RE = (
    r"^(utm_[^=]*|gclid|fbclid|msclkid|mc_eid|igshid|yclid|ref|ref_src)(=.*)?$"
)
_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"


def url_canonical(url: Column | str) -> Column:
    """Canonical URL for crawl dedup / frontier keys. Deterministic,
    engine-neutral column math (regex + list ops — one pass, no UDF):

    - fragment dropped; userinfo dropped
    - scheme and host lowercased; default ports (:80 http, :443
      https) stripped, other ports kept
    - empty path → ``/``; trailing slash stripped off non-root paths
    - query: tracking params removed (:data:`TRACKING_PARAM_RE`),
      the rest sorted bytewise (duplicates kept), ``?`` dropped when
      nothing survives

    Inputs without a ``scheme://authority`` shape pass through
    trimmed-only — canonicalization must never destroy keys it does
    not understand.
    """
    u = F.trim(_c(url))
    nofrag = F.regexp_replace(u, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(nofrag, _SCHEME_RE, 1))
    base = F.regexp_replace(nofrag, r"\?.*$", "")
    query = F.regexp_extract(nofrag, r"\?(.*)$", 1)
    auth = F.regexp_extract(base, _HOST_RE, 1)
    no_user = F.element_at(F.split(auth, "@"), -1)
    hostname = F.lower(F.regexp_replace(no_user, r":[0-9]*$", ""))
    port = F.regexp_extract(no_user, r":([0-9]+)$", 1)
    keep_port = (
        (port != "")
        & ~((scheme == F.lit("http")) & (port == "80"))
        & ~((scheme == F.lit("https")) & (port == "443"))
    )
    host_out = F.when(keep_port, F.concat(hostname, F.lit(":"), port)).otherwise(
        hostname
    )
    path = F.regexp_replace(base, _SCHEME_RE + r"[^/?#]*", "")
    path = F.when(path == "", F.lit("/")).otherwise(
        F.when(path != "/", F.regexp_replace(path, r"/$", "")).otherwise(path)
    )
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    q2 = F.array_join(F.array_sort(params), "&")
    q_out = F.when(q2 == "", F.lit("")).otherwise(F.concat(F.lit("?"), q2))
    canon = F.concat(scheme, F.lit("://"), host_out, path, q_out)
    return F.when(scheme == "", u).otherwise(canon)


def url_canonical_sql(url: str) -> str:
    """DuckDB twin of :func:`url_canonical` (same regexes; DuckDB's
    regexp_replace needs the 'g' flag nowhere here — each pattern is
    anchored or single-match)."""
    u = f"trim({url})"
    nofrag = f"regexp_replace({u}, '#.*$', '')"
    scheme = f"lower(regexp_extract({nofrag}, '{_SCHEME_RE}', 1))"
    base = f"regexp_replace({nofrag}, '\\?.*$', '')"
    query = f"regexp_extract({nofrag}, '\\?(.*)$', 1)"
    auth = f"regexp_extract({base}, '{_HOST_RE}', 1)"
    no_user = f"list_extract(string_split({auth}, '@'), -1)"
    hostname = f"lower(regexp_replace({no_user}, ':[0-9]*$', ''))"
    port = f"regexp_extract({no_user}, ':([0-9]+)$', 1)"
    keep_port = (
        f"({port} <> '' AND NOT ({scheme} = 'http' AND {port} = '80') "
        f"AND NOT ({scheme} = 'https' AND {port} = '443'))"
    )
    host_out = (
        f"CASE WHEN {keep_port} THEN concat({hostname}, ':', {port}) "
        f"ELSE {hostname} END"
    )
    raw_path = f"regexp_replace({base}, '{_SCHEME_RE}[^/?#]*', '')"
    path = (
        f"CASE WHEN {raw_path} = '' THEN '/' "
        f"WHEN {raw_path} <> '/' THEN regexp_replace({raw_path}, '/$', '') "
        f"ELSE {raw_path} END"
    )
    params = (
        f"list_filter(string_split({query}, '&'), "
        f"p -> p <> '' AND NOT regexp_matches(p, '{TRACKING_PARAM_RE}'))"
    )
    # coalesce: DuckDB's array_to_string over an EMPTY list is NULL
    # (Spark's array_join is ''), and concat would then skip it and
    # leave a stray '?'
    q2 = f"coalesce(array_to_string(list_sort({params}), '&'), '')"
    q_out = f"CASE WHEN {q2} = '' THEN '' ELSE concat('?', {q2}) END"
    canon = f"concat({scheme}, '://', {host_out}, {path}, {q_out})"
    return f"CASE WHEN {scheme} = '' THEN {u} ELSE {canon} END"


def registered_domain(url: Column | str) -> Column:
    """Last two dot-labels of the host (example.com for
    www.example.com) — the crawl-dedup grouping key. Hosts with fewer
    than two labels pass through unchanged.

    Known approximation (no public-suffix list offline): multi-label
    registries group one level too coarse (foo.co.uk → co.uk), and
    bracketed IPv6 authorities are not special-cased. For a corpus cap
    both errors are conservative — they merge more pages under one
    cap, never split a real domain into many."""
    host = url_host(url)
    dom = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    return F.when(dom == "", host).otherwise(dom)


def registered_domain_sql(url: str) -> str:
    host = url_host_sql(url)
    dom = f"regexp_extract({host}, '([^.]+\\.[^.]+)$', 1)"
    return f"CASE WHEN {dom} = '' THEN {host} ELSE {dom} END"


def domain_cap(
    df: DataFrame,
    url_col: str,
    score_col: str,
    id_col: str,
    max_per_domain: int,
    domain_col: str = "domain",
) -> DataFrame:
    """Keep the top ``max_per_domain`` rows per registered domain by
    score (ties → min id). The standard crawl-corpus diversity cap:
    one hash shuffle on the domain, and the rank window is itself the
    skew mitigation — a mega-host's partition is scanned once and
    emits at most the cap."""
    dom = registered_domain(url_col)
    from pyspark.sql import Window

    w = (
        Window.partitionBy(domain_col)
        .orderBy(F.col(score_col).desc(), F.col(id_col).asc())
    )
    return (
        df.withColumn(domain_col, dom)
        .withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= max_per_domain)
        .drop("__rk")
    )


# ------------------------------------------------------------ chunking

def doc_chunks(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 128,
    overlap: int = 0,
) -> DataFrame:
    """Token-window chunking for training-sequence prep: tokenize with
    the engine-neutral BPE-ish pattern (functions/text.TOKEN_RE),
    window into chunks of ``chunk_tokens`` with ``overlap`` tokens of
    context between consecutive chunks, and emit one row per chunk
    (chunk_idx, n_tokens, chunk_text — tokens re-joined with single
    spaces). Docs with zero tokens produce zero chunks.

    Narrow op: tokenize → start-offset array → posexplode → slice.
    Both arrays are MATERIALIZED columns before the explode
    (CLAUDE.md rule 1 — Generate evaluates its child interpreted and
    without subexpression elimination, so exploding a computed regex
    array re-runs the tokenizer per emitted row: measured 20× on the
    Morton analog)."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    step = chunk_tokens - overlap
    toks = F.regexp_extract_all(_c(text_col), F.lit(X.TOKEN_RE), 0)
    out = (
        df.withColumn("__toks", toks)
        .withColumn("__n", F.size("__toks"))
        .withColumn(
            "__starts",
            F.when(F.col("__n") <= 0, F.array().cast(T.ArrayType(T.IntegerType())))
            .otherwise(
                F.sequence(F.lit(0), F.col("__n") - 1, F.lit(step))
            ),
        )
        .select(
            F.col(id_col),
            F.col("__toks"),
            F.posexplode(F.col("__starts")).alias("chunk_idx", "__start"),
        )
        .withColumn("__chunk", F.slice("__toks", F.col("__start") + 1, chunk_tokens))
        .select(
            F.col(id_col),
            F.col("chunk_idx").cast(T.LongType()).alias("chunk_idx"),
            F.size("__chunk").cast(T.LongType()).alias("n_tokens"),
            F.concat_ws(" ", F.col("__chunk")).alias("chunk_text"),
        )
    )
    return out


# ------------------------------------------------------------- tf-idf

def tfidf_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    scale: int = 1_000_000,
) -> DataFrame:
    """Top-k rarity-weighted terms per document: tf from the doc's
    word multiset, df from the corpus (docs containing the term),
    score = (tf * scale) // df — the TF-IDF ranking shape with the
    idf kept as an EXACT integer rational (scale/df) instead of a
    logarithm, so the score is bit-identical across engines (ln()'s
    last ulp is not contractual; see CLAUDE.md). Monotonic in tf and
    in 1/df, which is what the ranking consumes. Ties → lexicographic
    term.

    Output: id, term, tf, df, score_ppm — k rows per doc (fewer for
    short docs).

    Scale shape: one (doc, term) partial-agg groupBy, one term-level
    df agg (vocab-sized), an equi-join on term (AQE decides broadcast
    vs shuffle by actual vocab size), and a per-doc top-k window.
    The hot-term skew axis (stopwords appear in every doc) is bounded:
    the join's build side is one row per distinct term, never per
    occurrence."""
    from ..session import cache_latest

    # materialize the word array before exploding (CLAUDE.md rule 1 —
    # Generate evaluates its child interpreted, per emitted row)
    tf = (
        df.withColumn("__ws", X.words(_c(text_col)))
        .select(F.col(id_col), F.explode("__ws").alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )
    # tf feeds BOTH join sides; Spark has no common-subplan reuse for
    # DataFrame lineage, so without this the tokenize+agg runs twice
    # (measured as 2 Generates in the uncached plan)
    tf = cache_latest("corpus.tfidf_topk.tf", tf)
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = tf.join(dfreq, "term").withColumn(
        "score_ppm",
        F.expr(f"(tf * CAST({scale} AS BIGINT)) DIV df"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(
        F.col("score_ppm").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= k)
        .select(
            F.col(id_col),
            "term",
            F.col("tf").cast(T.LongType()).alias("tf"),
            F.col("df").cast(T.LongType()).alias("df"),
            F.col("score_ppm").cast(T.LongType()).alias("score_ppm"),
        )
    )


def tfidf_topk_sql(
    table: str, id_col: str, text_col: str, k: int = 5, scale: int = 1_000_000
) -> str:
    wds = X.words_sql(text_col)
    return f"""
WITH tf AS (
  SELECT {id_col}, term, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT {id_col}, unnest({wds}) AS term FROM {table})
  GROUP BY {id_col}, term
), dfreq AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term
)
SELECT {id_col}, tf.term AS term, tf, df,
       (tf * CAST({scale} AS BIGINT)) // df AS score_ppm
FROM tf JOIN dfreq ON tf.term = dfreq.term
QUALIFY row_number() OVER (
  PARTITION BY {id_col} ORDER BY score_ppm DESC, tf.term ASC) <= {k}
"""


def doc_chunks_sql(
    table: str,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 128,
    overlap: int = 0,
) -> str:
    """DuckDB twin of :func:`doc_chunks` (1-based list slicing, range()
    end-exclusive; chunk_idx is the 0-based window ordinal)."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    step = chunk_tokens - overlap
    toks = f"regexp_extract_all({text_col}, '[A-Za-z0-9]+|[^A-Za-z0-9\\s]')"
    return f"""
WITH base AS (
  SELECT {id_col}, {toks} AS toks FROM {table}
), starts AS (
  SELECT {id_col}, toks,
         unnest(range(0, greatest(len(toks), 0), {step})) AS start
  FROM base
)
SELECT {id_col},
       CAST(start // {step} AS BIGINT) AS chunk_idx,
       CAST(len(toks[start + 1 : start + {chunk_tokens}]) AS BIGINT) AS n_tokens,
       array_to_string(toks[start + 1 : start + {chunk_tokens}], ' ') AS chunk_text
FROM starts
"""


# ------------------------------------------------------------- mixing

# Training-data mixing (the Pile/Dolma/DoReMi-shaped stage): given
# relative domain weights and a total token budget, emit a per-doc
# COPY PLAN (id, domain, tokens, n_copies) such that each domain
# contributes ~weight·budget tokens — upsampling (n_copies > 1) when
# the budget exceeds what the domain has, downsampling (a hash-ordered
# prefix) when it doesn't. Everything is integer-exact and a pure
# function of (row, seed, weights, budget): same plan on any cluster
# size, any retry, any partitioning — and the DuckDB twin re-derives
# it bit-for-bit.
#
# Budget arithmetic (all BIGINT):
#   ppm_d    = round(w_d / Σw · 1e6)
#   budget_d = total_tokens · ppm_d DIV 1e6
#   full_d   = budget_d DIV avail_d     (whole-corpus epochs)
#   rem_d    = budget_d %  avail_d      (the partial epoch, in tokens)
# and the partial epoch keeps a deterministic hash-ordered prefix:
#
# * strategy="window" (exact fill): order docs by (md5 hash, id)
#   within the domain, cumulative token sum, keep while cum <= rem_d —
#   the emitted token count never exceeds budget_d and undershoots by
#   less than one document. ONE domain-key shuffle + a window; the
#   window partition is per-domain, so a mega-domain is ONE TASK —
#   the same skew axis as domain_cap (measured: 230 s at 50M docs
#   with a 60%-mass domain, scripts/bench_mixing.py).
# * strategy="bucket" (exact fill, skew-proof): BIT-IDENTICAL output
#   to "window", but the cumsum runs per (domain, top-12-hash-bits)
#   partition — every task bounded at ~avail/4096 — plus a tiny
#   bucket prefix-sum table broadcast back. Use it whenever a domain
#   can dominate the corpus; "window" stays default only because its
#   plan is the simplest statement of the semantics.
# * strategy="rate" (narrow, no shuffle over the corpus): keep a doc
#   in the partial epoch iff pmod(hash, 1e6) < rem_d·1e6 DIV avail_d.
#   Hits the budget in expectation (±√ concentration), scans the
#   corpus once with ZERO exchanges (per-domain avail totals are a
#   bounded driver-side collect — at most len(weights) rows).
#
# Docs with null/non-positive token counts and domains outside
# `weights` are excluded from the plan (weight 0 ≡ absent).

def _mix_ppm(weights: dict[str, float]) -> list[tuple[str, int]]:
    if not weights:
        raise ValueError("mix needs at least one domain weight")
    tot = float(sum(weights.values()))
    if tot <= 0 or any(w < 0 for w in weights.values()):
        raise ValueError("mix weights must be non-negative, sum > 0")
    return [(d, round(w / tot * _MICRO)) for d, w in sorted(weights.items())]


def _mix_require_integral(df: DataFrame, token_col: Column | str) -> None:
    from .sketches import _q_require_integral

    _q_require_integral(df, token_col, what="mix")


def _mix_hash(domain: Column, id_: Column, seed: str) -> Column:
    return X.md5_hash60(
        F.concat_ws(":", F.lit(seed), domain.cast(T.StringType()),
                    id_.cast(T.StringType()))
    )


def _mix_hash_sql(domain: str, id_: str, seed: str) -> str:
    return X.md5_hash60_sql(
        f"concat('{_sq(seed)}', ':', CAST({domain} AS VARCHAR), ':', "
        f"CAST({id_} AS VARCHAR))"
    )


def _mix_budget_case(domain: Column, ppms, total_tokens: int) -> Column:
    out = F.lit(None).cast(T.LongType())
    expr = None
    for d, ppm in ppms:
        budget = total_tokens * ppm // _MICRO
        cond = domain == F.lit(d)
        expr = F.when(cond, F.lit(budget)) if expr is None else expr.when(
            cond, F.lit(budget)
        )
    return expr.otherwise(out)


def _mix_budget_case_sql(domain: str, ppms, total_tokens: int) -> str:
    whens = " ".join(
        f"WHEN '{_sq(d)}' THEN CAST({total_tokens * ppm // _MICRO} AS BIGINT)"
        for d, ppm in ppms
    )
    return f"CASE {domain} {whens} END"


def mix_plan(
    df: DataFrame,
    domain_col: str,
    token_col: str,
    id_col: str,
    weights: dict[str, float],
    total_tokens: int,
    seed: str = "mix",
    strategy: str = "window",
) -> DataFrame:
    """The copy plan ``(id, domain, tokens, n_copies)`` (n_copies >=
    1). See the section comment for semantics and the three
    strategies' scale shapes ("bucket" ≡ "window" bit-for-bit).
    ``id_col`` must be unique per row — it is the deterministic
    tie-break of the hash order; duplicate ids leave the cumsum
    boundary ambiguous in BOTH engines."""
    if total_tokens < 0:
        raise ValueError("total_tokens must be >= 0")
    if strategy not in ("window", "bucket", "rate"):
        raise ValueError("strategy must be 'window', 'bucket' or 'rate'")
    _mix_require_integral(df, token_col)
    ppms = _mix_ppm(weights)
    dom, tok, id_ = _c(domain_col), _c(token_col), _c(id_col)
    # NULL ids excluded: the id is the deterministic hash tie-break,
    # and the two engines disagree on NULL concat/ordering semantics
    rows = df.where(
        dom.isin([d for d, _ in ppms]) & tok.isNotNull() & (tok > 0)
        & id_.isNotNull()
    ).select(
        id_.alias("id"),
        dom.alias("domain"),
        tok.cast(T.LongType()).alias("tokens"),
    )
    budget = _mix_budget_case(F.col("domain"), ppms, total_tokens)

    if strategy == "window":
        from pyspark.sql import Window

        h = _mix_hash(F.col("domain"), F.col("id"), seed)
        wcum = (
            Window.partitionBy("domain")
            .orderBy("__h", "id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        wall = Window.partitionBy("domain")
        planned = (
            rows.withColumn("__h", h)
            .withColumn("__avail", F.sum("tokens").over(wall))
            .withColumn("__cum", F.sum("tokens").over(wcum))
            .withColumn("__budget", budget)
            .withColumn(
                "n_copies",
                (F.expr("__budget DIV __avail")
                 + (F.col("__cum") <= F.expr("__budget % __avail"))
                 .cast(T.LongType())),
            )
        )
    elif strategy == "bucket":
        # exact fill WITHOUT the hot-domain single-task window: the
        # hash order splits into 4096 contiguous runs on the hash's
        # top 12 bits, so the row-level cumsum windows partition by
        # (domain, bucket) — each ~avail/4096 — and a tiny per-bucket
        # prefix-sum table (<= 4096 rows per domain, its own window
        # trivially small) supplies the tokens that came before the
        # bucket. cum(row) = bucket_prefix + within_bucket_cum, so the
        # output is BIT-IDENTICAL to strategy="window" (pinned by test
        # and by the shared gate oracle) while every task is bounded.
        from pyspark.sql import Window

        h = _mix_hash(F.col("domain"), F.col("id"), seed)
        rows2 = rows.withColumn("__h", h).withColumn(
            "__bk", F.shiftright("__h", 48)
        )
        bkt = rows2.groupBy("domain", "__bk").agg(
            F.sum("tokens").alias("__bt")
        )
        wdom = Window.partitionBy("domain").orderBy("__bk")
        bkt = bkt.select(
            "domain", "__bk",
            (F.sum("__bt").over(
                wdom.rowsBetween(Window.unboundedPreceding,
                                 Window.currentRow)
            ) - F.col("__bt")).alias("__pre"),
            F.sum("__bt").over(Window.partitionBy("domain")).alias("__avail"),
        )
        wbk = (
            Window.partitionBy("domain", "__bk")
            .orderBy("__h", "id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        planned = (
            rows2.withColumn("__cumw", F.sum("tokens").over(wbk))
            .join(F.broadcast(bkt), ["domain", "__bk"])
            .withColumn("__budget", budget)
            .withColumn(
                "n_copies",
                (F.expr("__budget DIV __avail")
                 + (F.col("__pre") + F.col("__cumw")
                    <= F.expr("__budget % __avail"))
                 .cast(T.LongType())),
            )
        )
    else:
        # bounded driver materialization: one row per weighted domain
        avail = {
            r["domain"]: r["avail"]
            for r in rows.groupBy("domain")
            .agg(F.sum("tokens").alias("avail"))
            .collect()
        }
        full_e = None
        rate_e = None
        for d, ppm in ppms:
            if d not in avail:
                continue
            b = total_tokens * ppm // _MICRO
            full, rem = b // avail[d], b % avail[d]
            rate = rem * _MICRO // avail[d]
            cond = F.col("domain") == F.lit(d)
            full_e = (F.when(cond, F.lit(full)) if full_e is None
                      else full_e.when(cond, F.lit(full)))
            rate_e = (F.when(cond, F.lit(rate)) if rate_e is None
                      else rate_e.when(cond, F.lit(rate)))
        if full_e is None:  # no weighted domain present in the corpus
            return rows.withColumn(
                "n_copies", F.lit(None).cast(T.LongType())
            ).where(F.lit(False))
        h = _mix_hash(F.col("domain"), F.col("id"), seed)
        planned = rows.withColumn(
            "n_copies",
            full_e.otherwise(F.lit(0)).cast(T.LongType())
            + (F.pmod(h, F.lit(_MICRO)) < rate_e.otherwise(F.lit(0)))
            .cast(T.LongType()),
        )
    return planned.where(F.col("n_copies") >= 1).select(
        "id", "domain", "tokens", "n_copies"
    )


def mix_plan_sql(
    table_sql: str,
    domain_col: str,
    token_expr: str,
    id_col: str,
    weights: dict[str, float],
    total_tokens: int,
    seed: str = "mix",
    strategy: str = "window",
) -> str:
    """DuckDB twin of :func:`mix_plan`. ``strategy="bucket"`` shares
    the window twin: its bucket decomposition is provably the same
    cumsum (bucket prefix + within-bucket run over a hash-prefix
    split of the SAME total order), so the oracle checks algebraic
    equivalence — the strongest oracle class."""
    ppms = _mix_ppm(weights)
    doms = ", ".join(f"'{_sq(d)}'" for d, _ in ppms)
    h = _mix_hash_sql("domain", "id", seed)
    base = f"""
  SELECT {id_col} AS id, {domain_col} AS domain,
         CAST({token_expr} AS BIGINT) AS tokens
  FROM {table_sql}
  WHERE {domain_col} IN ({doms}) AND {token_expr} IS NOT NULL
    AND {id_col} IS NOT NULL
    AND {token_expr} > 0
"""
    budget = _mix_budget_case_sql("domain", ppms, total_tokens)
    if strategy in ("window", "bucket"):
        body = f"""
WITH rows_ AS ({base}),
planned AS (
  SELECT id, domain, tokens,
         ({budget}) // SUM(tokens) OVER (PARTITION BY domain)
         + CASE WHEN SUM(tokens) OVER (
                  PARTITION BY domain ORDER BY {h}, id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                <= ({budget}) % SUM(tokens) OVER (PARTITION BY domain)
           THEN 1 ELSE 0 END AS n_copies
  FROM rows_
)
SELECT id, domain, tokens, CAST(n_copies AS BIGINT) AS n_copies
FROM planned WHERE n_copies >= 1
"""
        return body
    rbudget = _mix_budget_case_sql("r.domain", ppms, total_tokens)
    rh = _mix_hash_sql("r.domain", "r.id", seed)
    return f"""
WITH rows_ AS ({base}),
avail AS (
  SELECT domain, SUM(tokens) AS avail FROM rows_ GROUP BY domain
),
planned AS (
  SELECT r.id, r.domain, r.tokens,
         ({rbudget}) // a.avail
         + CASE WHEN ({rh}) % {_MICRO}
                -- HUGEINT: rem*1e6 overflows BIGINT past ~9.2e12
                -- domain tokens (the Spark side computes this rate in
                -- arbitrary-precision python on the driver)
                < CAST(({rbudget}) % a.avail AS HUGEINT) * {_MICRO} // a.avail
           THEN 1 ELSE 0 END AS n_copies
  FROM rows_ r JOIN avail a ON a.domain = r.domain
)
SELECT id, domain, tokens, CAST(n_copies AS BIGINT) AS n_copies
FROM planned WHERE n_copies >= 1
"""


def mix_expand(plan: DataFrame) -> DataFrame:
    """Physical copies off the plan: one ``(id, domain, tokens,
    copy_idx)`` row per epoch membership — the thing a training
    shuffle consumes. The copy array is materialized pre-explode
    (CLAUDE.md rule 1), though here it is a cheap sequence."""
    return (
        plan.withColumn("__copies", F.expr("sequence(0, n_copies - 1)"))
        .select(
            "id", "domain", "tokens",
            F.explode("__copies").alias("copy_idx"),
        )
    )


def mix_report(
    plan: DataFrame,
    weights: dict[str, float],
    total_tokens: int,
) -> DataFrame:
    """Per-domain accounting off the plan: docs kept, copies, tokens
    emitted vs budget (domains the corpus lacks entirely emit no row —
    their budget is unfillable and a join with `weights` keys is the
    caller's audit)."""
    ppms = _mix_ppm(weights)
    budget = _mix_budget_case(F.col("domain"), ppms, total_tokens)
    return (
        plan.groupBy("domain")
        .agg(
            F.count("*").alias("docs_kept"),
            F.sum("n_copies").alias("copies"),
            F.sum(F.col("tokens") * F.col("n_copies")).alias("tokens_emitted"),
        )
        .withColumn("budget", budget)
        .orderBy("domain")
    )
