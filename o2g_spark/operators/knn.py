"""kNN join via iterative k-ring expansion (BASELINE.json B6).

Reference parity: o2g orders a route's stops by relation-member position
(SURVEY.md §2.A A5/A9/A11 [o2g-PK]); the graft re-expresses "ordered
neighbor lists" as k-nearest-neighbor ranks that must be deterministic
and stable (SURVEY.md §2.C). This module produces, for every query
point, its k nearest target points with a total deterministic ordering.

Algorithm — distance-bounded shuffle joins (the north-rule wording):

    ring 0: join each query's own cell to the target cell index
    ring r: join the 8r cells at Chebyshev grid distance exactly r
    after ring r, any unexamined target sits in a cell at Chebyshev
    distance ≥ r+1, hence at planar distance ≥ r * dlat(res); a query
    is DONE once it holds k candidates whose k-th distance is within
    that bound. Loop until every query is done.

Every per-round step is a plain DataFrame op (explode of a literal
offset array → JVM Morton encode → equi-join on cell id → windowed
top-k), so Catalyst plans each round and AQE handles skewed cells.
Python never sees a row.

Scale notes (100 TB):
- the target index is built once (`cell_encode`, pure JVM) and is
  broadcast when small (gazetteers, POI sets) — the query side then
  never shuffles; with huge target sets the join degrades gracefully
  to a shuffle hash join on ``cell_id``.
- each round touches only still-active queries (anti-join on done set
  semantics via the ``__done`` flag), so hot regions converge in ring
  0-1 and the tail shrinks geometrically;
- per-round state (running top-k) is ``persist()``-ed and the previous
  round unpersisted — lineage depth stays O(rounds), not O(rows).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from ..functions import cellfns
from ..kernels import cells


def _ring_offsets(r: int) -> list[tuple[int, int]]:
    """(dx, dy) offsets of the hollow ring at Chebyshev distance r."""
    if r == 0:
        return [(0, 0)]
    return [
        (dx, dy)
        for dx in range(-r, r + 1)
        for dy in range(-r, r + 1)
        if max(abs(dx), abs(dy)) == r
    ]


_OFFSET_CHUNK = 4096


def _offset_chunks(lo: int, hi: int) -> list[list[tuple[int, int]]]:
    """Offsets of rings lo..hi, split into ≤4096-entry chunks so no
    literal struct-array in the plan is unbounded. The per-round hi
    shrink can't go below ONE ring, and a single ring past r=512 has
    8r > 4096 offsets — each chunk becomes its own materialize-then-
    explode pass; together they cover every ring cell exactly once."""
    offsets = [off for r_ in range(lo, hi + 1) for off in _ring_offsets(r_)]
    return [
        offsets[i:i + _OFFSET_CHUNK]
        for i in range(0, len(offsets), _OFFSET_CHUNK)
    ]


def choose_strategy(k: int, n_queries: int, n_targets: int) -> tuple[bool, int]:
    """Cost-based strategy from the two cardinalities: ``(use_brute,
    res)``. Brute = ONE map-only job producing |Q|·|T| cheap JVM
    distance rows; k-ring = ~3 rounds of |Q|·(ring cells) probes. Brute
    wins only when the CROSS PRODUCT is small — bounding on |T| alone
    chose a 2.8-billion row window for 14M queries × 200 targets
    (observed at 20M pages). The 120M product budget is MEASURED, not
    reasoned (scripts/bench_knn_crossover.py, BENCH/BASELINE.md §knn
    crossover): brute wins by ~25-30% at 120M-product shapes and LOSES
    by ~40% at 200M (the former budget — it claimed a shape where
    rings win), so the claim region stops at the largest measured
    brute-win product. For the k-ring path, pick the grid so a
    query expects its answers within ~1 ring: ~k targets per (2r+1)²
    window at r≈1 ⇒ cells ≈ 9·n/k (too fine ⇒ empty rings ⇒ wasted
    rounds, measured 3×). Pure function — unit-testable without Spark.
    """
    use_brute = n_targets <= 5000 and n_queries * n_targets <= 120_000_000
    res = max(2, min(12, int(math.log2(max(4, 9 * n_targets / max(k, 1)) ** 0.5))))
    return use_brute, res


def knn_join(
    queries: DataFrame,
    targets: DataFrame,
    k: int,
    res: int | None = None,
    query_id: str = "qid",
    target_id: str = "tid",
    lat_col: str = "lat",
    lon_col: str = "lon",
    max_rings: int | None = None,
    broadcast_targets: bool = True,
    n_queries: int | None = None,
    n_targets: int | None = None,
    tail_brute_cap: int = 50_000_000,
) -> DataFrame:
    """For each query point: the k nearest targets by squared planar
    degree distance (bit-exact across engines — see kernels.geometry).

    Output: ``(query_id, target_id, dist2, knn_rank)`` with
    ``knn_rank`` ∈ 1..k, ordered deterministically by
    ``(dist2, target_id)`` — ties cannot flip between runs or
    partitionings. Queries with fewer than k reachable targets return
    the ones that exist.

    ``n_queries`` / ``n_targets`` are CARDINALITY HINTS for the cost
    model: when supplied (from table stats, checkpoint lineage
    row_counts, or caller knowledge) the auto-strategy path runs ZERO
    extra ``count()`` scans. Without hints each missing side costs one
    counting scan before the join. Hints only steer STRATEGY (brute vs
    ring, seed width, tail-brute trigger) — loop termination always
    uses exact counts, so a wrong hint can cost time, never rows.
    """
    if res is None:
        if n_targets is None:
            n_targets = targets.count()
        if n_queries is None:
            n_queries = queries.count()
        use_brute, res = choose_strategy(k, n_queries, n_targets)
        if use_brute:
            return knn_bruteforce(
                queries, targets, k, query_id, target_id, lat_col, lon_col
            )
    if n_targets is None:
        # one counting scan (pass the hint to avoid it): the target
        # cardinality drives the ring-width seed and the tail-brute
        # bound below — both are the difference between ~2 rounds and
        # a long straggler loop
        n_targets = targets.count()
    n = 1 << res
    dlat = 180.0 / n  # smaller cell axis in degrees → safe radius unit
    if max_rings is None:
        max_rings = n  # full sweep worst case; loop exits on done anyway

    tgt = targets.select(
        F.col(target_id).alias("__tid"),
        F.col(lat_col).alias("__tlat"),
        F.col(lon_col).alias("__tlon"),
        cellfns.cell_encode(lat_col, lon_col, res).alias("__tcell"),
    )
    tgt = F.broadcast(tgt) if broadcast_targets else tgt.repartition("__tcell")

    q = queries.select(
        F.col(query_id).alias("__qid"),
        F.col(lat_col).alias("__qlat"),
        F.col(lon_col).alias("__qlon"),
        cellfns.grid_ix(lon_col, res).alias("__ix"),
        cellfns.grid_iy(lat_col, res).alias("__iy"),
    )

    active = q.localCheckpoint(eager=True)
    # EXACT count over the just-materialized checkpoint (cheap: counts
    # cached blocks). Deliberately NOT the n_queries hint: n_active
    # drives loop TERMINATION, and an underestimated hint would end the
    # loop with still-active queries unemitted — hints may only affect
    # strategy, never correctness.
    n_active = active.count()
    best: DataFrame | None = None  # running top-k for STILL-ACTIVE queries
    finished: list[DataFrame] = []  # emitted results of done queries
    w = Window.partitionBy("__qid").orderBy(F.col("dist2").asc(), F.col("__tid").asc())

    def _finalize(df: DataFrame) -> DataFrame:
        return df.select(
            F.col("__qid").alias(query_id),
            F.col("__tid").alias(target_id),
            F.col("dist2"),
            F.col("knn_rank").cast(T.IntegerType()),
        )

    def _brute_block(qside: DataFrame) -> DataFrame:
        """One bounded cross join finishing every query in qside exactly
        (same output contract/tie-break as the ring path). Honors
        broadcast_targets=False: the cap bounds cross-product ROWS, not
        the broadcast SIZE — 2 queries × 25M targets fits the cap but
        not the driver; let Spark pick the join strategy then."""
        t_side = targets.select(
            F.col(target_id).alias("__tid"),
            F.col(lat_col).alias("__tlat"),
            F.col(lon_col).alias("__tlon"),
        )
        if broadcast_targets:
            t_side = F.broadcast(t_side)
        return (
            qside.select("__qid", "__qlat", "__qlon")
            .crossJoin(t_side)
            .withColumn("__dlat", F.col("__qlat") - F.col("__tlat"))
            .withColumn("__dlon", F.col("__qlon") - F.col("__tlon"))
            .withColumn(
                "dist2",
                F.col("__dlat") * F.col("__dlat")
                + F.col("__dlon") * F.col("__dlon"),
            )
            .withColumn("knn_rank", F.row_number().over(w))
            .filter(F.col("knn_rank") <= k)
        )

    # Cost-based EARLY exit (CLAUDE.md rule 7 — bound TOTAL work): if
    # the whole query side already fits the brute budget, one cross
    # join beats any number of ring rounds; the ring machinery exists
    # to avoid |Q|·|T| when that product is huge, not to be run for
    # its own sake. Measured: this removes the two rounds of fixed
    # per-round job cost (ring join + window + checkpoint + counts)
    # that dominated knn_kring at bench scale. n_active is the exact
    # just-counted cardinality; n_targets may be a hint, and a wrong
    # hint only mis-routes strategy — the brute output is exact
    # regardless. tail_brute_cap=0 disables both this and the tail
    # cleanup (forcing the pure ring path, as the gate query does to
    # keep ring machinery under the DuckDB oracle).
    if n_targets and tail_brute_cap and n_active * n_targets <= tail_brute_cap:
        return _finalize(_brute_block(active))

    # Geometrically widening ring batches: round i examines Chebyshev
    # distances [lo, hi] with the window doubling each round. One Spark
    # job per round instead of per ring, so sparse regions converge in
    # O(log r_final) rounds; every cell is still examined exactly once
    # (ranges are disjoint). localCheckpoint truncates lineage each
    # round — plan depth stays O(1), not O(rounds).
    #
    # Done queries are EMITTED out of the loop each round (finished
    # list), so the windowed pool shrinks to the undecided tail instead
    # of re-sorting every query's top-k all rounds — at 14M queries the
    # hot majority finishes in round 1 and later rounds touch only the
    # sparse-region stragglers.
    explored = -1  # max Chebyshev distance fully examined so far
    # Seed the first batch width from TARGET DENSITY instead of the
    # minimal 2 rings: with expected k answers inside r_hat =
    # sqrt(k·cells/(π·n_targets)) rings, covering ~3·r_hat in round 1
    # both FINDS the k nearest and PROVES them done for the typical
    # query, so the loop usually runs once plus a tail round — measured
    # vs width=2: same rows, 2-3 fewer rounds of fixed per-round cost.
    # The 4096-offset bound below still caps any over-eager seed.
    width = 2  # rings 0-1: explored=0 can't prove anyone done
    if n_targets and n_targets > 0:
        r_hat = math.sqrt(k * n * n / (math.pi * n_targets))
        width = max(2, min(int(math.ceil(2 * r_hat)) + 1, n))
    while explored < max_rings:
        lo = explored + 1
        hi = min(max_rings, lo + width - 1)
        # keep the literal offset array bounded (~4k entries per round)
        while hi > lo and 4 * (hi * hi + hi - lo * lo + lo) > 4096:
            hi -= 1
        # _offset_chunks bounds every literal even when the hi shrink
        # bottomed out at one over-wide ring (8r > 4096 past r=512):
        # one materialize-then-explode pass per chunk over the
        # checkpointed `active`, unioned before the join.
        exploded_chunks = []
        for chunk in _offset_chunks(lo, hi):
            off_arr = F.array(
                *[
                    F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                    for dx, dy in chunk
                ]
            )
            exploded_chunks.append(
                # materialize the literal array BEFORE explode (CLAUDE.md
                # rule 1: GenerateExec evaluates generator expressions
                # interpreted, re-building the 4k-struct literal per row)
                active.withColumn("__offs", off_arr)
                .withColumn("__off", F.explode("__offs"))
                .drop("__offs")
            )
        cand_exploded = exploded_chunks[0]
        for part in exploded_chunks[1:]:
            cand_exploded = cand_exploded.unionByName(part)
        cand_cells = (
            cand_exploded
            .withColumn("__nx", F.col("__ix") + F.col("__off.dx"))
            .withColumn("__ny", F.col("__iy") + F.col("__off.dy"))
            .filter(
                (F.col("__nx") >= 0)
                & (F.col("__nx") < n)
                & (F.col("__ny") >= 0)
                & (F.col("__ny") < n)
            )
            .withColumn(
                "__cell", cellfns.cell_from_ixiy(F.col("__nx"), F.col("__ny"), res)
            )
        )
        hits = (
            cand_cells.join(tgt, cand_cells["__cell"] == tgt["__tcell"], "inner")
            .withColumn("__dlat", F.col("__qlat") - F.col("__tlat"))
            .withColumn("__dlon", F.col("__qlon") - F.col("__tlon"))
            .withColumn(
                "dist2",
                F.col("__dlat") * F.col("__dlat") + F.col("__dlon") * F.col("__dlon"),
            )
            # only what the top-k window and emit need: the query
            # coords/grid indexes ride on `active`, not the pool — at
            # 14M queries this trims the window shuffle rows ~40%
            .select("__qid", "__tid", "dist2")
        )
        pool = hits if best is None else best.unionByName(hits)
        explored = hi
        width *= 2

        # A query is done when it has k hits and the k-th is provably
        # nearer than anything an unexplored ring could hold. STRICT <:
        # an unexplored target at exactly dist2 == safe2 (cell-edge
        # alignment) with a smaller tid would displace the current k-th
        # under the (dist2, target_id) tie-break.
        #
        # Done-detection rides the SAME window partitioning as the
        # top-k rank (count/max per qid on the already-exchanged,
        # already-sorted rows), and the round materializes exactly ONE
        # localCheckpoint; emitted/best are cheap filters over it.
        # (Previously: a separate groupBy + two semi/anti joins + three
        # more eager checkpoints — 6 Spark jobs per round, now 3;
        # measured 7.3 s → see bench for the k-ring headline.)
        safe2 = (explored * dlat) ** 2
        wq = Window.partitionBy("__qid")
        scored = (
            pool.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= k)
            .drop("__rk")
            .withColumn(
                "__done",
                (F.count("*").over(wq) >= k)
                & (F.max("dist2").over(wq) < F.lit(safe2)),
            )
            .localCheckpoint(eager=True)  # truncate lineage across rounds
        )
        # rank at emit time (qid sets of emitted batches are disjoint,
        # so no global re-rank is ever needed)
        emitted = (
            scored.filter(F.col("__done"))
            .drop("__done")
            .withColumn("knn_rank", F.row_number().over(w))
        )
        finished.append(emitted)
        best = scored.filter(~F.col("__done")).drop("__done")
        # The surviving-active COUNT comes from one cheap job over the
        # checkpointed scored rows (n_active = previous − done): the
        # anti-joined active SET is only built when something actually
        # consumes it below. In the dense common case (everyone proves
        # done in round 1, or the tail fits the brute budget) the
        # per-round anti-join + eager checkpoint disappears entirely —
        # it was ~30% of the measured k-ring wall time.
        n_done = (
            scored.filter(F.col("__done")).select("__qid").distinct().count()
        )
        n_active -= n_done
        if n_active == 0:
            best = None
            break
        done_ids = scored.filter(F.col("__done")).select("__qid").distinct()
        next_active = active.join(done_ids, "__qid", "left_anti")
        # Bounded tail cleanup: once the undecided tail is small enough
        # that |active|·|targets| fits the brute budget, ONE cross join
        # finishes every straggler exactly — replacing the remaining
        # O(log max_rings) prove-done rounds (sparse-region stragglers
        # are precisely the queries whose done-proof radius grows
        # slowest). TOTAL work is capped, per CLAUDE.md rule 7.
        if n_targets and n_active * n_targets <= tail_brute_cap:
            finished.append(_brute_block(next_active))
            best = None
            break
        active = next_active.localCheckpoint(eager=True)

    parts = [_finalize(p) for p in finished]
    if best is not None:
        # stragglers that exhausted max_rings keep their partial top-k
        parts.insert(0, _finalize(best.withColumn("knn_rank", F.row_number().over(w))))
    result = parts[0]
    for part in parts[1:]:
        result = result.unionByName(part)
    return result


def knn_bruteforce(
    queries: DataFrame,
    targets: DataFrame,
    k: int,
    query_id: str = "qid",
    target_id: str = "tid",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Cross-join reference implementation (oracle / small dims only).

    Same output contract as :func:`knn_join`; used by tests and as the
    DuckDB-expressible oracle shape. O(|Q|·|T|) — never the scale path.
    """
    q = queries.select(
        F.col(query_id).alias("__qid"),
        F.col(lat_col).alias("__qlat"),
        F.col(lon_col).alias("__qlon"),
    )
    t = targets.select(
        F.col(target_id).alias("__tid"),
        F.col(lat_col).alias("__tlat"),
        F.col(lon_col).alias("__tlon"),
    )
    w = Window.partitionBy("__qid").orderBy(F.col("dist2").asc(), F.col("__tid").asc())
    return (
        q.crossJoin(F.broadcast(t))
        .withColumn("__dlat", F.col("__qlat") - F.col("__tlat"))
        .withColumn("__dlon", F.col("__qlon") - F.col("__tlon"))
        .withColumn(
            "dist2",
            F.col("__dlat") * F.col("__dlat") + F.col("__dlon") * F.col("__dlon"),
        )
        .withColumn("knn_rank", F.row_number().over(w))
        .filter(F.col("knn_rank") <= k)
        .select(
            F.col("__qid").alias(query_id),
            F.col("__tid").alias(target_id),
            F.col("dist2"),
            F.col("knn_rank").cast(T.IntegerType()),
        )
    )
