"""Production pipeline CLI (BASELINE.json north_rule: "runs via
spark-submit --py-files ... at N and 4N executors").

    spark-submit --master local[8] --driver-memory 32g \
        --py-files "$(python -c 'from o2g_spark.session import build_pyfiles_zip; print(build_pyfiles_zip())')" \
        jobs/run_pipeline.py --pages synth:1000000 --out /tmp/wh --stage all

(--driver-memory is mandatory past ~5M pages: under spark-submit the
JVM exists before get_spark runs, so the session default cannot apply —
the stock 1g heap dies in the first wide write.)

Stages (each checkpoints atomically with per-partition lineage rows and
resumes from the last committed snapshot — kill this job at any point
and rerun the same command):

    extract html→text over the binary html column (B3; OPT-IN, not in
            --stage all): per-url sha2 of the canonical extraction
            lands in the checkpoint's lineage digest, so the
            byte-identity invariant (input_hint: "byte-identical
            extracted text per url") is attested per partition at
            scale and re-checkable after resume
    filter  (OPT-IN) pre-dedup hygiene: corpus-frequency boilerplate
            strip, Gopher repetition caps, quality floor, optional
            benchmark decontamination — (url, reason) labels plus the
            surviving stripped text
    passages (OPT-IN) cross-doc exact-substring dedup (operators/
            passages.py, Lee et al. 2022): every duplicated
            >= --passage-k token run removed corpus-wide, keeping the
            globally-first occurrence; metrics carry removed_tokens
            and docs_touched
    pii     (OPT-IN) release-time redaction (functions/pii.py): mask
            emails / IPv4s / phones in every doc's text; metrics
            carry per-kind masked counts and docs_touched
    bpe     (OPT-IN) tokenizer lifecycle (operators/bpe.py): learn
            --bpe-merges merges from the corpus once (committed as the
            bpe_merges snapshot, never retrained on resume), then
            encode every page (bpe_tokens: url, n_tokens, tok_hash);
            metrics carry total_tokens
    geotag  scan pages → coordinate extraction → cell encode (B1-B4)
    pip     cell-cover + ray-cast point-in-polygon join (B5)
    knn     k-ring kNN against the gazetteer (B6)
    tiles   Web-Mercator tile assignment + density (B8)
    dedup   df-capped n-gram jaccard near-dup pairs over page text,
            then dedup_clusters — the transitive closure that turns
            pairs into one canonical url per near-dup cluster
            (operators/clusters.py) — and dedup_stats, the published
            job report (cluster-size histogram over the whole corpus
            + droppable counts); with --embeddings also banded-LSH
            embedding near-dups
    dedup-incremental  (OPT-IN) rolling-crawl dedup against the
            persisted LSH index (operators/lsh_index.py): builds or
            resumes the index at --index-dir, pairs ONLY the new
            batch (--new-pages, or a crc32 carve-out of --pages);
            --merge-index folds the batch in as an O(batch) LSM delta
            AND rolls the persisted dup-cluster labels forward;
            --compact-index pays the explicit O(corpus) delta fold;
            with --media + --new-media the media modality rides the
            same lifecycle (persisted signature index, payloads
            decoded once ever, --media-kind per index)
    media-dedup  (OPT-IN) perceptual near-dup over a --media
            parquet (media_id, url, kind, payload, meta): integer
            dHash / audio-fingerprint / per-frame video-dHash
            SIGNATURE stages committed first (payloads decode once,
            never again on resume or re-pair), then exact pigeonhole
            pairing (images/audio) + frame-set jaccard (video) from
            the snapshots, one dup_clusters transitive closure over
            all modalities, and the cluster-size report; metrics
            carry hot-bucket / hot-frame-hash counters so the caps
            are accounted, never silent
    curate  (OPT-IN) the post-dedup corpus-curation path a training
            pipeline runs (operators/corpus.py + packing.py): keep
            the highest-quality member per dup cluster →
            deterministic train/val/test split → per-domain cap →
            token-window chunking → next-fit sequence packing; every
            step checkpointed, metrics carry split counts and the
            packing fill ratio
    stats   (OPT-IN) the corpus report card (sketches.quantile_sketch
            + hll_distinct): per-language doc counts, token totals,
            length p50/p90/p99 off the integer relative-error sketch
            and an HLL distinct-word estimate — every aggregate's
            shuffle bounded by sketch size, never corpus size
    mix     (OPT-IN) weighted training-data mixing (corpus.mix_plan):
            rebalance per-registered-domain token mass to
            --mix-weights under a --mix-tokens budget — a committed
            copy plan (url, domain, tokens, n_copies) plus a
            per-domain accounting snapshot; exact-fill by default,
            --mix-strategy bucket for the skew-proof exact variant,
            rate for the zero-shuffle approximation
    report  per-zone/lang + per-tile rollups (B9-B11)

Prints one JSON metrics line per stage: rows, seconds, pages/sec. The
dedup line carries the no-silent-cap counters
(jaccard_dropped_shingles, near_dup_hot_buckets) so a production run
shows exactly what its recall caps excluded — not only the bench.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from o2g_spark.functions import cellfns, geotag, pii  # noqa: E402
from o2g_spark.functions import text as X  # noqa: E402
from o2g_spark.operators import (  # noqa: E402
    boilerplate, bpe, clusters, decontam, dedup, knn, lmfilter,
    media_dedup, multimodal, packing, passages, pip, repetition,
    similarity, skew, tiles, video,
)
from o2g_spark.operators import corpus as corpus_ops  # noqa: E402
from o2g_spark.operators import sketches as sketch_ops  # noqa: E402
from o2g_spark.plans.checkpoint import CheckpointManager  # noqa: E402
from o2g_spark.session import get_spark  # noqa: E402
from o2g_spark.sources import synth, synth_dist, tables  # noqa: E402

STAGES = ("geotag", "pip", "knn", "tiles", "dedup", "report")
# opt-in stages: runnable via --stage NAME but excluded from --stage all
# (extract doubles the page-scan cost; dedup-incremental maintains a
# persistent index across invocations; keep `all` timings comparable
# across rounds)
OPT_STAGES = (
    "extract", "clean", "filter", "passages", "pii", "bpe", "lm",
    "dedup-incremental", "media-dedup", "curate", "mix", "stats",
)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", default="synth:200000",
                    help="parquet path, synth:N for distributed "
                         "generation, or warc:PATH for raw WARC /"
                         " .warc.gz crawl files (sources/warc.py)")
    ap.add_argument("--out", required=True, help="checkpoint warehouse dir")
    ap.add_argument("--stage", default="all",
                    choices=("all",) + STAGES + OPT_STAGES)
    ap.add_argument("--res", type=int, default=9, help="cell resolution")
    ap.add_argument("--zoom", type=int, default=11, help="tile zoom")
    ap.add_argument("--knn-k", type=int, default=3)
    ap.add_argument("--jaccard-max-df", type=int, default=200,
                    help="df cap for the dedup stage's candidate shingles")
    ap.add_argument("--embeddings", default=None,
                    help="parquet with (vec_id, embedding) — enables the "
                         "embedding near-dup half of the dedup stage")
    ap.add_argument("--max-bucket", type=int, default=100_000,
                    help="LSH bucket-size cap for embedding near-dup")
    ap.add_argument("--new-pages", default=None,
                    help="parquet of the NEW crawl batch for --stage "
                         "dedup-incremental (default: carve "
                         "crc32(url) %% 20 == 0 out of --pages)")
    ap.add_argument("--new-embeddings", default=None,
                    help="parquet of the NEW (vec_id, embedding) batch "
                         "— with --embeddings, adds the embedding index "
                         "half of --stage dedup-incremental")
    ap.add_argument("--index-dir", default=None,
                    help="long-lived persisted LSH index location for "
                         "--stage dedup-incremental (default: "
                         "<out>/lsh_index). Use a fresh --out warehouse "
                         "per crawl increment and keep --index-dir "
                         "pointed at the same place")
    ap.add_argument("--merge-index", action="store_true",
                    help="after incremental pairing, fold the new batch "
                         "into the persisted LSH index as an LSM delta "
                         "and update the rolling dup-cluster labels "
                         "(idempotent on rerun; the next increment must "
                         "use a fresh --out so its pairing stage is not "
                         "resumed from this one)")
    ap.add_argument("--compact-index", action="store_true",
                    help="after merging, fold all accumulated LSM "
                         "deltas into the base index snapshots (the "
                         "explicit O(corpus) maintenance op — run on "
                         "your schedule, e.g. when deltas approach the "
                         "base's size; readers are unchanged)")
    ap.add_argument("--media", default=None,
                    help="parquet of media rows (media_id, url, kind, "
                         "payload, meta) for --stage media-dedup")
    ap.add_argument("--media-max-hamming", type=int, default=6,
                    help="near-dup threshold (bits) for --stage "
                         "media-dedup; must be <= media-chunks - "
                         "media-band-chunks")
    ap.add_argument("--media-chunks", type=int, default=8,
                    help="signature slices for media banding (8 -> 28 "
                         "bands/16-bit keys, exact to hamming 6; use 4 "
                         "with --media-max-hamming 2 past ~1M media "
                         "rows: 6 bands/32-bit keys)")
    ap.add_argument("--media-band-chunks", type=int, default=2,
                    help="slices per band key for media banding")
    ap.add_argument("--new-media", default=None,
                    help="parquet of the NEW media batch for the "
                         "media half of --stage dedup-incremental "
                         "(needs --media as the indexed corpus)")
    ap.add_argument("--media-kind", default="image",
                    choices=("image", "audio", "video"),
                    help="modality for the media half of --stage "
                         "dedup-incremental (one persisted index per "
                         "modality; video uses the frame-hash "
                         "set-jaccard index, operators/video_index)")
    ap.add_argument("--media-frame-samples", type=int, default=256,
                    help="audio fingerprint frame size (samples) for "
                         "--stage media-dedup")
    ap.add_argument("--video-threshold", type=float, default=0.5,
                    help="frame-set jaccard threshold for the video "
                         "half of --stage media-dedup")
    ap.add_argument("--video-max-df", type=int, default=10_000,
                    help="drop frame hashes shared by more than this "
                         "many videos before video pairing (0 = "
                         "exact); hot count rides the metrics line")
    ap.add_argument("--media-max-bucket", type=int, default=100_000,
                    help="drop media band buckets larger than this "
                         "before pairing (0 = exact/no cap); dropped "
                         "bucket count rides the metrics line")
    ap.add_argument("--max-per-domain", type=int, default=1000,
                    help="curate: per-registered-domain page cap")
    ap.add_argument("--chunk-tokens", type=int, default=256,
                    help="curate: tokens per training chunk")
    ap.add_argument("--chunk-overlap", type=int, default=16,
                    help="curate: overlap tokens between chunks")
    ap.add_argument("--pack-budget", type=int, default=2048,
                    help="curate: tokens per packed training sequence")
    ap.add_argument("--pack-shards", type=int, default=64,
                    help="curate: parallel packing shards")
    ap.add_argument("--benchmark", default=None,
                    help="--stage filter: parquet of benchmark/eval texts "
                         "(column `text`) to decontaminate against")
    ap.add_argument("--decontam-n", type=int, default=13,
                    help="--stage filter: decontamination n-gram size")
    ap.add_argument("--boiler-min-frac", type=float, default=0.5,
                    help="--stage filter: strip lines present in >= this "
                         "fraction of documents")
    ap.add_argument("--min-words", type=int, default=10,
                    help="--stage filter: reject docs shorter than this "
                         "(post-boilerplate)")
    ap.add_argument("--min-quality", type=float, default=0.2,
                    help="--stage filter: reject docs under this "
                         "quality_score")
    ap.add_argument("--max-dup-line", type=float, default=0.30,
                    help="--stage filter: Gopher dup-line-fraction cap")
    ap.add_argument("--max-top2", type=float, default=0.20,
                    help="--stage filter: Gopher top-2-gram char cap")
    ap.add_argument("--max-dup10", type=float, default=0.10,
                    help="--stage filter: Gopher dup-10-gram char cap")
    ap.add_argument("--rep-min-words", type=int, default=50,
                    help="--stage filter: apply the n-gram repetition "
                         "caps only to docs at least this long — a "
                         "short doc's top-gram fraction is high by "
                         "pigeonhole, not by spam (Gopher applies its "
                         "caps alongside a 50-word floor)")
    ap.add_argument("--passage-k", type=int, default=50,
                    help="--stage passages: duplicated-run threshold in "
                         "tokens (Lee et al. 2022 use 50)")
    ap.add_argument("--passage-strategy", default="window",
                    choices=("window", "join"),
                    help="--stage passages: keep-first ranking strategy "
                         "(join = AQE-skew-splittable escape for corpora "
                         "with a window key duplicated millions of times)")
    ap.add_argument("--bpe-merges", type=int, default=32,
                    help="--stage bpe: number of merges to learn")
    ap.add_argument("--lm-target", default=None,
                    help="--stage lm: parquet of trusted reference texts "
                         "(columns url, text) to train the bigram LM on "
                         "(default: a deterministic hash half of --pages)")
    ap.add_argument("--lm-train-frac", type=float, default=0.5,
                    help="--stage lm: fraction of --pages used as the "
                         "training half when --lm-target is absent")
    ap.add_argument("--stats-hll-p", type=int, default=12,
                    help="stats: HLL precision for distinct words — "
                         "the raw estimator needs true distinct >= "
                         "~2.5*2^p (sketches.py docstring), so lower "
                         "p for small corpora")
    ap.add_argument("--mix-weights", default=None,
                    help="mix: JSON domain→relative-weight map, keys "
                         "are registered domains of the page urls")
    ap.add_argument("--mix-tokens", type=int, default=None,
                    help="mix: total token budget to fill")
    ap.add_argument("--mix-strategy", default="window",
                    choices=("window", "bucket", "rate"),
                    help="mix: exact-fill window (default), the "
                         "skew-proof bit-identical bucket variant, or "
                         "the zero-shuffle approximate rate strategy")
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    spark = get_spark("o2g_pipeline", master=args.master)
    ckpt = CheckpointManager(spark, args.out)
    metrics = []

    def run(stage, build, key_col, cell_col=None, extra=None):
        t0 = time.time()
        resumed = ckpt.is_committed(stage)
        df = ckpt.run_stage(stage, build, key_col=key_col, cell_col=cell_col)
        n = ckpt.manifest(stage)["row_count"]
        dt = time.time() - t0
        m = {
            "stage": stage,
            "rows": n,
            "sec": round(dt, 3),
            "rows_per_sec": round(n / dt, 1) if dt > 0 else None,
            "resumed": resumed,
        }
        if extra:
            # no-silent-cap counters etc. — computed AFTER the stage so
            # a resumed run still reports them
            m.update({k: v() if callable(v) else v for k, v in extra.items()})
        metrics.append(m)
        print(json.dumps(m), flush=True)
        return df

    if args.pages.startswith("synth:"):
        n_pages = int(args.pages.split(":", 1)[1])
        pages = synth_dist.gen_pages_dist(spark, n_pages)
    elif args.pages.startswith("warc:"):
        # raw crawl ingest (sources/warc.py): response records →
        # (url, warc_ts, html); no canonical text column, so text-
        # needing stages route through --stage extract first (their
        # guards already say so). One audit pass FIRST: the source's
        # counted-not-dropped contract (per-file skip counts, non-200
        # records the 200-filter below removes) must reach the metrics
        # stream, not be selected away.
        from o2g_spark.sources import warc as warc_src

        t_warc = time.time()
        raw_warc = warc_src.read_warc(spark, args.pages.split(":", 1)[1])
        kept_cond = F.col("url").isNotNull() & (F.col("http_status") == 200)
        audit = raw_warc.groupBy("src_file").agg(
            F.max("warc_skipped").alias("sk"),
            F.sum(kept_cond.cast("long")).alias("kept"),
            F.sum((F.col("url").isNotNull() & ~kept_cond.eqNullSafe(True))
                  .cast("long")).alias("non200"),
        ).agg(
            F.count("*").alias("files"),
            F.sum("sk").alias("skipped"),
            F.sum("kept").alias("kept"),
            F.sum("non200").alias("non200"),
        ).collect()[0]
        m = {
            "stage": "warc_ingest",
            "files": int(audit["files"]),
            "rows": int(audit["kept"] or 0),
            "sec": round(time.time() - t_warc, 3),
            "records_skipped": int(audit["skipped"] or 0),
            "records_non200": int(audit["non200"] or 0),
        }
        metrics.append(m)
        print(json.dumps(m), flush=True)
        pages = raw_warc.where(kept_cond).select("url", "warc_ts", "html")
    else:
        pages = spark.read.parquet(args.pages)

    zones_pdf = synth.gen_zones()
    rings = synth.zone_rings(zones_pdf)
    gaz_pdf = synth.gen_gazetteer()
    gaz = tables.gazetteer_df(spark, gaz_pdf)

    want = STAGES if args.stage == "all" else (args.stage,)

    def text_pages(stage: str):
        """pages WITH a text column: the input's own, or — the raw-
        crawl path — the committed extract snapshot's extracted text
        joined back on url. Every text stage routes through this, so
        `--pages warc:… --stage extract` then `--stage clean/filter/…`
        against the same --out composes."""
        if "text" in pages.columns:
            return pages
        if ckpt.is_committed("extract"):
            snap = ckpt.read_snapshot("extract")
            if "text" in snap.columns:
                return pages.join(snap.select("url", "text"), "url")
        raise SystemExit(
            f"--stage {stage} needs a `text` column: run --stage "
            "extract first on raw crawls (its snapshot persists the "
            "extracted text when the input carries none)")

    if "extract" in want:
        # html→text at scale through the checkpoint layer: the stage
        # output is (url, text_sha, byte_identical) — sha2 of the
        # CANONICAL extraction per url, so every lineage digest row
        # attests the extracted bytes of its partition (north-rule
        # "byte-identical extracted text per url"), and a resumed run
        # re-verifies against the committed digests for free. The bool
        # rides in the digest too: one flipped byte anywhere flips the
        # stage digest.
        # byte_identical attestation needs a canonical `text` column to
        # compare against — synth pages carry one; a real crawl parquet
        # usually doesn't, and referencing it would AnalysisException.
        # Without it, emit NULL (the digest still attests text_sha) AND
        # PERSIST the extracted text itself: on the raw-crawl path
        # (--pages warc:) this snapshot is the only place text exists,
        # and every downstream text stage reads it back (text_pages()).
        has_canonical_text = "text" in pages.columns

        def build_extract():
            ex = multimodal.extract_text(pages)
            identical = (
                F.col("text_extracted").eqNullSafe(F.col("text"))
                if has_canonical_text
                else F.lit(None).cast("boolean")
            )
            cols = [
                "url",
                F.sha2("text_extracted", 256).alias("text_sha"),
                identical.alias("byte_identical"),
            ]
            if not has_canonical_text:
                cols.insert(1, F.col("text_extracted").alias("text"))
            return ex.select(*cols)

        run(
            "extract", build_extract, key_col="url",
            extra={
                # no-silent-failure counter: pages whose extraction does
                # NOT byte-match the source text column (must be 0 on
                # synth pages, whose html wraps text losslessly); None
                # when the input has no canonical text to attest against
                "mismatched_pages": (
                    lambda: ckpt.run_stage(
                        "extract", build_extract, key_col="url"
                    ).filter(~F.col("byte_identical")).count()
                ) if has_canonical_text else None,
            },
        )

    if "filter" in want:
        # pre-dedup hygiene (operators/boilerplate.py, repetition.py,
        # decontam.py + quality_score): strip corpus-frequency
        # boilerplate lines, then reject degenerate/contaminated docs.
        # TWO stages so the reject accounting is committed once and
        # the per-reason counters read the snapshot instead of
        # recomputing the feature pass per counter:
        #   filter_labels: (url, reason) for EVERY input doc
        #   filter_kept:   the surviving (url, text[, lang]) rows
        pages = text_pages("filter")
        lang_cols = ["lang"] if "lang" in pages.columns else []

        def build_filter_labels():
            src = pages.select("url", "text")
            stripped = boilerplate.strip_boilerplate(
                src, "url", "text", min_frac=args.boiler_min_frac
            )
            rep = repetition.repetition_report(
                stripped, "url", "text", top_ns=(2,), dup_ns=(10,)
            )
            base = (
                stripped.select("url", "text", "n_kept")
                .join(rep, "url")
                .withColumn("q", X.quality_score("text"))
            )
            # the n-gram caps only bind past --rep-min-words: a short
            # doc's top-gram char fraction is high by pigeonhole
            long_enough = F.col("n_words") >= args.rep_min_words
            reason = (
                F.when(F.col("n_kept") == 0, "boilerplate_empty")
                .when(F.col("n_words") < args.min_words, "too_short")
                .when(F.col("dup_line_frac") > args.max_dup_line, "repetition")
                .when(
                    long_enough
                    & (F.col("top2_char_frac") > args.max_top2),
                    "repetition",
                )
                .when(
                    long_enough
                    & (F.col("dup10_char_frac") > args.max_dup10),
                    "repetition",
                )
                .when(F.col("q") < args.min_quality, "quality")
            )
            labeled = base.withColumn("__r", reason)
            if args.benchmark:
                bench = spark.read.parquet(args.benchmark)
                bad = decontam.contamination_report(
                    src, bench, "url", "text", n=args.decontam_n,
                    bench_text_col="text",
                ).select("url", F.lit("decontam").alias("__d"))
                labeled = labeled.join(bad, "url", "left").withColumn(
                    "__r", F.coalesce("__r", "__d")
                )
            return labeled.select(
                "url", F.coalesce("__r", F.lit("kept")).alias("reason")
            )

        labels_df = ckpt.run_stage(
            "filter_labels", build_filter_labels, key_col="url"
        )

        def build_filter_kept():
            kept = labels_df.where(F.col("reason") == "kept").select("url")
            # the kept TEXT is the boilerplate-stripped one — the
            # downstream corpus must not retain banner lines
            stripped = boilerplate.strip_boilerplate(
                pages.select("url", "text").join(kept, "url"),
                "url", "text", min_frac=args.boiler_min_frac,
            ).select("url", "text")
            if lang_cols:
                stripped = stripped.join(
                    pages.select("url", *lang_cols), "url"
                )
            return stripped

        def _reason_count(name):
            return lambda: int(
                ckpt.read_snapshot("filter_labels")
                .where(F.col("reason") == name).count()
            )

        run(
            "filter_kept", build_filter_kept, key_col="url",
            extra={
                "rejected_boilerplate_empty": _reason_count("boilerplate_empty"),
                "rejected_too_short": _reason_count("too_short"),
                "rejected_repetition": _reason_count("repetition"),
                "rejected_quality": _reason_count("quality"),
                "rejected_decontam": _reason_count("decontam"),
            },
        )

    if "passages" in want:
        # cross-doc exact-substring dedup (operators/passages.py)
        # through the checkpoint layer: rewrites every doc's text with
        # duplicated >=k-token passages removed (globally-first
        # occurrence kept), committed + resumable like every stage.
        # Opt-in: the window-key exchange is a full-corpus shuffle.
        pages = text_pages("passages")

        def build_passages():
            return passages.passage_dedup(
                pages.select("url", "text"), "url", "text",
                k=args.passage_k, strategy=args.passage_strategy,
            )

        def _passage_sum(col):
            return lambda: int(
                ckpt.read_snapshot("passages")
                .agg(F.sum(col)).collect()[0][0] or 0
            )

        run(
            "passages", build_passages, key_col="url",
            extra={
                "passage_k": args.passage_k,
                "removed_tokens": _passage_sum("n_removed"),
                "docs_touched": lambda: int(
                    ckpt.read_snapshot("passages")
                    .where(F.col("n_spans") > 0).count()
                ),
            },
        )

    if "clean" in want:
        # unicode normalization (functions/text.py clean_text — the
        # CCNet/Dolma pre-dedup pass): committed + resumable, pure
        # codegen regex passes, idempotent — a crash-rerun over
        # already-clean text is a byte-identical no-op by construction.
        pages = text_pages("clean")

        def build_clean():
            cleaned = X.clean_text(F.col("text"))
            return pages.select(
                "url",
                cleaned.alias("text"),
                (~cleaned.eqNullSafe(F.col("text"))).alias("changed"),
            )

        run(
            "clean", build_clean, key_col="url",
            extra={
                "docs_changed": lambda: int(
                    ckpt.read_snapshot("clean")
                    .agg(F.sum(F.col("changed").cast("long")))
                    .collect()[0][0] or 0
                ),
            },
        )

    if "pii" in want:
        # release-time redaction (functions/pii.py): mask emails /
        # IPv4s / phones in every doc's text, committed + resumable.
        # Pure codegen regex passes — no shuffle beyond the write.
        pages = text_pages("pii")

        def build_pii():
            return pii.scrub_pii(pages.select("url", "text"), "url", "text")

        def _pii_sum(col):
            return lambda: int(
                ckpt.read_snapshot("pii")
                .agg(F.sum(col)).collect()[0][0] or 0
            )

        run(
            "pii", build_pii, key_col="url",
            extra={
                "masked_email": _pii_sum("n_email"),
                "masked_ipv4": _pii_sum("n_ipv4"),
                "masked_phone": _pii_sum("n_phone"),
                "docs_touched": lambda: int(
                    ckpt.read_snapshot("pii")
                    .where(
                        (F.col("n_email") + F.col("n_ipv4")
                         + F.col("n_phone")) > 0
                    ).count()
                ),
            },
        )

    if "bpe" in want:
        # tokenizer lifecycle (operators/bpe.py): train merges ONCE on
        # the corpus (word-frequency-dict formulation — the k-iteration
        # loop runs on distinct words, not pages), persist them through
        # the checkpoint layer, then encode every page with the
        # committed merges. Rerunning resumes: a committed merge table
        # is never retrained, a committed token table never re-encoded.
        pages = text_pages("bpe")

        def build_merges():
            return bpe.bpe_merges_df(
                spark, pages.select("text"), "text", args.bpe_merges)

        merges_df = ckpt.run_stage(
            "bpe_merges", build_merges, key_col="pair")

        def build_tokens():
            learned = [r.pair for r in
                       merges_df.orderBy("step").collect()]
            return bpe.bpe_encode(
                pages.select("url", "text"), "url", "text", learned)

        run(
            "bpe_tokens", build_tokens, key_col="url",
            extra={
                # the COMMITTED merge count, not the CLI argument: a
                # resume with a different --bpe-merges keeps the
                # committed snapshot, and the metrics must say so
                "n_merges": lambda: int(merges_df.count()),
                "total_tokens": lambda: int(
                    ckpt.read_snapshot("bpe_tokens")
                    .agg(F.sum("n_tokens")).collect()[0][0] or 0
                ),
            },
        )

    if "lm" in want:
        # perplexity-filter lifecycle (operators/lmfilter.py): train
        # the add-one bigram LM ONCE (on --lm-target or a deterministic
        # hash half of the corpus), persist the self-contained model
        # table through the checkpoint layer, score every page from
        # the COMMITTED snapshot, and bucket pages into CCNet-style
        # head/middle/tail thirds by per-token NLL. Rerunning resumes:
        # a committed model is never retrained.
        pages = text_pages("lm")

        if args.lm_target:
            lm_train_pages = spark.read.parquet(args.lm_target)
        else:
            cut = int(args.lm_train_frac * 1_000_000)
            lm_train_pages = pages.where(
                corpus_ops.hash_bucket_micro("url", "lmtrain") < cut)

        def build_lm_model():
            # min_count=1 + vocab column: the snapshot must stay
            # UNPRUNED and self-contained for lm_score_from_model
            return lmfilter.lm_train(
                lm_train_pages.select("url", "text"), "url", "text",
                min_count=1, include_vocab=True,
            ).withColumn("bigram", F.concat_ws(" ", "w1", "w2"))

        model_df = ckpt.run_stage("lm_model", build_lm_model,
                                  key_col="bigram")

        def build_lm_scores():
            return lmfilter.lm_score_from_model(
                model_df, pages.select("url", "text"), "url", "text")

        def _lm_thirds():
            # CCNet buckets by perplexity thirds; cutoffs from a
            # deterministic 1% hash sample (exact percentile on the
            # sample — scale-safe where a full exact percentile's
            # single agg buffer is not), full table when the sample
            # is too small to quantile
            scores = ckpt.read_snapshot("lm_scores")
            sample = scores.where(
                corpus_ops.hash_bucket_micro("url", "lmq") < 10_000)
            if sample.count() < 1_000:
                sample = scores
            cuts = sample.agg(F.expr(
                "percentile(nll_per_tok, array(CAST(1.0/3 AS DOUBLE), "
                "CAST(2.0/3 AS DOUBLE)))"
            ).alias("c")).collect()[0]["c"]
            lo, hi = float(cuts[0]), float(cuts[1])
            counts = dict(
                scores.select(
                    F.when(F.col("nll_per_tok") <= lo, "head")
                    .when(F.col("nll_per_tok") <= hi, "middle")
                    .otherwise("tail").alias("b")
                ).groupBy("b").count().collect()
            )
            return {
                "cut_head": round(lo, 4), "cut_middle": round(hi, 4),
                "head": int(counts.get("head", 0)),
                "middle": int(counts.get("middle", 0)),
                "tail": int(counts.get("tail", 0)),
            }

        run(
            "lm_scores", build_lm_scores, key_col="url",
            extra={
                "model_bigrams": lambda: int(model_df.count()),
                "ppl_thirds": _lm_thirds,
            },
        )

    # geotag: extraction + cell encode, salted against hot cells before
    # any downstream per-cell work (SURVEY.md §7.2: salt BEFORE Python)
    def build_geotag():
        # raw crawls route text through the extract snapshot and may
        # lack a lang column — the geospatial core composes with
        # --pages warc: the same way the text stages do
        src = text_pages("geotag")
        if "lang" not in src.columns:
            src = src.withColumn("lang", F.lit(None).cast("string"))
        tagged = geotag.extract_coords(src).select(
            "url", "warc_ts", "lang", "lat", "lon", "mention"
        )
        tagged = tagged.withColumn(
            "cell", cellfns.cell_encode("lat", "lon", args.res)
        )
        return skew.salted_repartition(tagged, "cell", "url", buckets=8)

    if "geotag" in want:
        tagged = run("geotag", build_geotag, key_col="url", cell_col="cell")
    elif set(want) & {"pip", "knn", "tiles", "report"}:
        # only the stages that consume `tagged` pay for it (resume from
        # the committed snapshot when present, else build uncounted);
        # extract/dedup read raw pages and must not trigger a geotag
        # build on a fresh warehouse
        tagged = ckpt.run_stage("geotag", build_geotag, key_col="url", cell_col="cell")
    else:
        tagged = None

    if "pip" in want:
        run(
            "pip",
            lambda: pip.pip_join(tagged, rings, res=args.res),
            key_col="url",
            cell_col="cell",
        )
    if "knn" in want:
        targets = gaz.select(
            F.monotonically_increasing_id().alias("tid"), "lat", "lon"
        ).localCheckpoint()
        run(
            "knn",
            lambda: knn.knn_join(
                tagged.select(F.col("url").alias("qid"), "lat", "lon"),
                targets,
                k=args.knn_k,  # res auto-tuned from target density
                # cardinality hints: geotag lineage row_count + the
                # driver-known gazetteer size → the cost model runs
                # ZERO counting scans here
                n_queries=ckpt.manifest("geotag")["row_count"],
                n_targets=len(gaz_pdf),
            ),
            key_col="qid",
        )
    if "tiles" in want:
        run(
            "tiles",
            lambda: tiles.assign_tiles(tagged, args.zoom),
            key_col="url",
            cell_col="tile_id",
        )
    if "dedup" in want:
        # df-capped jaccard near-dups over page text; the cap counter
        # rides on the SAME stage metrics line (no silent recall loss)
        pages = text_pages("dedup")
        jpairs = run(
            "jaccard_dedup",
            lambda: dedup.jaccard_pairs(
                pages.select("url", "text"), "url", "text",
                n=3, threshold=0.7, max_df=args.jaccard_max_df,
            ),
            key_col="id_a",
            extra={
                "jaccard_max_df": args.jaccard_max_df,
                "jaccard_dropped_shingles": lambda: dedup.jaccard_dropped_shingles(
                    pages.select("url", "text"), "url", "text",
                    n=3, max_df=args.jaccard_max_df,
                ),
            },
        )
        # transitive closure of the pair list: one canonical url per
        # near-dup CLUSTER (A~B, B~C ⇒ one kept page), the step that
        # turns pairs into an actually-deduplicated corpus
        run(
            "dedup_clusters",
            lambda: clusters.dup_clusters(jpairs),
            key_col="doc_id",
            extra={
                "clusters": lambda: int(
                    ckpt.read_snapshot("dedup_clusters")
                    .select("canon_id").distinct().count()
                ),
            },
        )
        # the job report: cluster-size histogram over the WHOLE page
        # corpus (unpaired pages = size-1 clusters); sum(n_droppable)
        # is exactly what a keep-one-per-cluster policy removes
        run(
            "dedup_stats",
            lambda: clusters.dup_stats(
                ckpt.read_snapshot("dedup_clusters"),
                corpus=pages, id_col="url",
            ),
            key_col="cluster_size",
            extra={
                "droppable": lambda: int(
                    ckpt.read_snapshot("dedup_stats")
                    .agg(F.coalesce(F.sum("n_droppable"), F.lit(0)))
                    .collect()[0][0]
                ),
            },
        )
        if args.embeddings:
            emb = spark.read.parquet(args.embeddings)
            run(
                "embedding_dedup",
                lambda: similarity.embedding_near_dup_pairs(
                    emb, max_bucket=args.max_bucket,
                ),
                key_col="id_a",
                extra={
                    "max_bucket": args.max_bucket,
                    "near_dup_hot_buckets": lambda: similarity.near_dup_hot_buckets(
                        emb, max_bucket=args.max_bucket,
                    ).count(),
                },
            )

    if "dedup-incremental" in want:
        # the rolling-crawl dedup lifecycle through the production CLI:
        # a persisted LSH index (operators/lsh_index.py) lives at
        # <out>/lsh_index across invocations; each run pairs only the
        # NEW batch against it — O(batch) work, never O(corpus). First
        # run builds the index from the non-batch pages (resumable,
        # like every stage); --merge-index folds the paired batch in so
        # the NEXT invocation's batch sees it. Rerunning the identical
        # command resumes every piece from its committed snapshot.
        from o2g_spark.operators import _delta_index, lsh_index

        pages = text_pages("dedup-incremental")
        if args.new_embeddings and not args.embeddings:
            raise SystemExit(
                "--new-embeddings needs --embeddings (the indexed "
                "corpus) as well")
        if args.new_media and not args.media:
            raise SystemExit(
                "--new-media needs --media (the indexed corpus) as well")
        idx_dir = args.index_dir or os.path.join(args.out, "lsh_index")
        if args.new_pages:
            new_docs = spark.read.parquet(args.new_pages).select("url", "text")
            corpus = text_pages("dedup").select("url", "text")
        else:
            is_new = F.pmod(F.crc32(F.col("url")), F.lit(20)) == 0
            new_docs = pages.filter(is_new).select("url", "text")
            corpus = pages.filter(~is_new).select("url", "text")
        idx_ckpt = CheckpointManager(spark, idx_dir)
        t0 = time.time()
        index_built = not idx_ckpt.is_committed(lsh_index.BANDS_STAGE)
        lsh_index.lsh_index_build(
            spark, idx_dir, corpus, id_col="url",
            num_hashes=32, bands=16)
        m = {
            "stage": "lsh_index_build",
            "rows": _delta_index.total_row_count(idx_ckpt, lsh_index.BANDS_STAGE),
            "sec": round(time.time() - t0, 3),
            "resumed": not index_built,
            "index_dir": idx_dir,
        }
        metrics.append(m)
        print(json.dumps(m), flush=True)
        inc_pairs = run(
            "jaccard_dedup_incremental",
            lambda: lsh_index.minhash_lsh_pairs_incremental(
                spark, idx_dir, new_docs, id_col="url", threshold=0.7),
            key_col="id_a",
            extra={"index_dir": idx_dir},
        )
        if args.merge_index:
            t0 = time.time()
            lsh_index.lsh_index_merge(spark, idx_dir, new_docs, id_col="url")
            m = {
                "stage": "lsh_index_merge",
                "rows": _delta_index.total_row_count(idx_ckpt, lsh_index.BANDS_STAGE),
                "sec": round(time.time() - t0, 3),
                "resumed": False,
                "index_dir": idx_dir,
            }
            metrics.append(m)
            print(json.dumps(m), flush=True)
            # rolling dup-cluster labels, folded increment by increment:
            # the committed labels are a star edge set spanning exactly
            # the clusters seen so far, so folding only THIS increment's
            # pairs equals re-clustering every pair ever emitted
            # (operators/clusters.py invariant). Idempotent on rerun —
            # re-folding already-spanned pairs is a fixpoint.
            t0 = time.time()
            if idx_ckpt.is_committed("dup_labels"):
                prior = idx_ckpt.read_snapshot("dup_labels").localCheckpoint()
            else:
                prior = spark.createDataFrame(
                    [], "doc_id string, canon_id string")
            labels = clusters.dup_clusters_incremental(prior, inc_pairs)
            idx_ckpt.run_stage(
                "dup_labels", lambda: labels, key_col="doc_id", force=True)
            m = {
                "stage": "dup_labels",
                "rows": idx_ckpt.manifest("dup_labels")["row_count"],
                "sec": round(time.time() - t0, 3),
                "resumed": False,
                "index_dir": idx_dir,
            }
            metrics.append(m)
            print(json.dumps(m), flush=True)
        if args.compact_index:
            t0 = time.time()
            n_folded = lsh_index.lsh_index_compact(spark, idx_dir)
            m = {
                "stage": "lsh_index_compact",
                "rows": _delta_index.total_row_count(idx_ckpt, lsh_index.BANDS_STAGE),
                "deltas_folded": n_folded,
                "sec": round(time.time() - t0, 3),
                "resumed": False,
                "index_dir": idx_dir,
            }
            metrics.append(m)
            print(json.dumps(m), flush=True)

        if args.embeddings and args.new_embeddings:
            # the embedding-modality half, same lifecycle: persisted
            # hyperplane-band index + O(batch) incremental pairing
            from o2g_spark.operators import emb_index

            eidx_dir = idx_dir + "_emb"
            emb_corpus = spark.read.parquet(args.embeddings)
            emb_new = spark.read.parquet(args.new_embeddings)
            eidx_ckpt = CheckpointManager(spark, eidx_dir)
            t0 = time.time()
            e_built = not eidx_ckpt.is_committed(emb_index.BANDS_STAGE)
            emb_index.emb_index_build(spark, eidx_dir, emb_corpus)
            m = {
                "stage": "emb_index_build",
                "rows": _delta_index.total_row_count(
                    eidx_ckpt, emb_index.BANDS_STAGE),
                "sec": round(time.time() - t0, 3),
                "resumed": not e_built,
                "index_dir": eidx_dir,
            }
            metrics.append(m)
            print(json.dumps(m), flush=True)
            run(
                "embedding_dedup_incremental",
                lambda: emb_index.embedding_near_dup_incremental(
                    spark, eidx_dir, emb_new, max_bucket=args.max_bucket),
                key_col="id_a",
                extra={"index_dir": eidx_dir,
                       "max_bucket": args.max_bucket},
            )
            if args.merge_index:
                t0 = time.time()
                emb_index.emb_index_merge(spark, eidx_dir, emb_new)
                m = {
                    "stage": "emb_index_merge",
                    "rows": _delta_index.total_row_count(
                        eidx_ckpt, emb_index.BANDS_STAGE),
                    "sec": round(time.time() - t0, 3),
                    "resumed": False,
                    "index_dir": eidx_dir,
                }
                metrics.append(m)
                print(json.dumps(m), flush=True)
            if args.compact_index:
                t0 = time.time()
                n_folded = emb_index.emb_index_compact(spark, eidx_dir)
                m = {
                    "stage": "emb_index_compact",
                    "rows": _delta_index.total_row_count(
                        eidx_ckpt, emb_index.BANDS_STAGE),
                    "deltas_folded": n_folded,
                    "sec": round(time.time() - t0, 3),
                    "resumed": False,
                    "index_dir": eidx_dir,
                }
                metrics.append(m)
                print(json.dumps(m), flush=True)

        if args.media and args.new_media:
            # the media-modality half, same lifecycle: persisted
            # perceptual-signature (image/audio) or frame-hash (video)
            # index + O(batch) incremental pairing — committed
            # payloads are never re-decoded
            from o2g_spark.operators import media_index, video_index

            is_video = args.media_kind == "video"
            midx_dir = idx_dir + ("_video" if is_video else "_media")
            m_corpus = spark.read.parquet(args.media)
            m_new = spark.read.parquet(args.new_media)
            midx_ckpt = CheckpointManager(spark, midx_dir)
            main_stage = (video_index.FRAMES_STAGE if is_video
                          else media_index.BANDS_STAGE)
            t0 = time.time()
            m_built = not midx_ckpt.is_committed(main_stage)
            if is_video:
                video_index.video_index_build(spark, midx_dir, m_corpus)
            else:
                media_index.media_index_build(
                    spark, midx_dir, m_corpus, kind=args.media_kind,
                    chunks=args.media_chunks,
                    band_chunks=args.media_band_chunks,
                    frame_samples=args.media_frame_samples)
            m = {
                "stage": "media_index_build",
                "rows": _delta_index.total_row_count(
                    midx_ckpt, main_stage),
                "sec": round(time.time() - t0, 3),
                "resumed": not m_built,
                "index_dir": midx_dir,
            }
            metrics.append(m)
            print(json.dumps(m), flush=True)
            if is_video:
                run(
                    "media_dedup_incremental",
                    lambda: video_index.video_near_dup_incremental(
                        spark, midx_dir, m_new,
                        threshold=args.video_threshold,
                        max_df=args.video_max_df or None),
                    key_col="id_a",
                    extra={"index_dir": midx_dir,
                           "media_kind": args.media_kind,
                           "video_threshold": args.video_threshold,
                           "video_max_df": args.video_max_df},
                )
            else:
                run(
                    "media_dedup_incremental",
                    lambda: media_index.media_near_dup_incremental(
                        spark, midx_dir, m_new,
                        max_hamming=args.media_max_hamming,
                        max_bucket=args.media_max_bucket or None),
                    key_col="id_a",
                    extra={"index_dir": midx_dir,
                           "media_kind": args.media_kind,
                           "media_max_bucket": args.media_max_bucket},
                )
            if args.merge_index:
                t0 = time.time()
                if is_video:
                    video_index.video_index_merge(spark, midx_dir, m_new)
                else:
                    media_index.media_index_merge(spark, midx_dir, m_new)
                m = {
                    "stage": "media_index_merge",
                    "rows": _delta_index.total_row_count(
                        midx_ckpt, main_stage),
                    "sec": round(time.time() - t0, 3),
                    "resumed": False,
                    "index_dir": midx_dir,
                }
                metrics.append(m)
                print(json.dumps(m), flush=True)
            if args.compact_index:
                t0 = time.time()
                if is_video:
                    n_folded = video_index.video_index_compact(
                        spark, midx_dir)
                else:
                    n_folded = media_index.media_index_compact(
                        spark, midx_dir)
                m = {
                    "stage": "media_index_compact",
                    "rows": _delta_index.total_row_count(
                        midx_ckpt, main_stage),
                    "deltas_folded": n_folded,
                    "sec": round(time.time() - t0, 3),
                    "resumed": False,
                    "index_dir": midx_dir,
                }
                metrics.append(m)
                print(json.dumps(m), flush=True)

    if "media-dedup" in want:
        # perceptual near-dup over raw media payloads (operators/
        # media_dedup.py). The EXPENSIVE step — decoding every payload
        # into a 64-bit signature — commits first, so a resumed run
        # (or a re-pair with different banding knobs against the same
        # --out) never touches payload bytes again; pairing, the
        # transitive closure, and the job report then mirror the text
        # dedup stage exactly.
        if not args.media:
            raise SystemExit("--stage media-dedup needs --media <parquet>")
        media = spark.read.parquet(args.media)
        cap = args.media_max_bucket or None
        mh, mc, mbc = (
            args.media_max_hamming, args.media_chunks, args.media_band_chunks
        )

        img_sig = run(
            "media_sig_image",
            lambda: media_dedup.image_dhash(media),
            key_col="media_id",
            extra={
                "undecodable": lambda: int(
                    ckpt.read_snapshot("media_sig_image")
                    .where(F.col("dhash").isNull()).count()
                ),
            },
        )
        aud_sig = run(
            "media_sig_audio",
            lambda: media_dedup.audio_fingerprint(
                media, frame_samples=args.media_frame_samples),
            key_col="media_id",
            extra={
                "unfingerprintable": lambda: int(
                    ckpt.read_snapshot("media_sig_audio")
                    .where(F.col("fingerprint").isNull()).count()
                ),
            },
        )
        vid_fh = run(
            "media_sig_video",
            lambda: video.video_frame_dhash(media),
            key_col="media_id",
            extra={
                "videos": lambda: int(
                    ckpt.read_snapshot("media_sig_video")
                    .select("media_id").distinct().count()
                ),
            },
        )

        def _hot(sig_df, sig_col):
            if cap is None:
                return 0
            return int(
                media_dedup.band_bucket_sizes(sig_df, "media_id", sig_col, mc, mbc)
                .where(F.col("k") > cap).count()
            )

        def build_media_pairs():
            img = media_dedup.hamming_pairs(
                img_sig, "media_id", "dhash",
                max_hamming=mh, chunks=mc, band_chunks=mbc, max_bucket=cap,
            ).withColumn("modality", F.lit("image"))
            aud = media_dedup.hamming_pairs(
                aud_sig, "media_id", "fingerprint",
                max_hamming=mh, chunks=mc, band_chunks=mbc, max_bucket=cap,
            ).withColumn("modality", F.lit("audio"))
            return img.unionByName(aud)

        mpairs = run(
            "media_pairs", build_media_pairs, key_col="id_a",
            extra={
                "image_pairs": lambda: int(
                    ckpt.read_snapshot("media_pairs")
                    .where(F.col("modality") == "image").count()
                ),
                "audio_pairs": lambda: int(
                    ckpt.read_snapshot("media_pairs")
                    .where(F.col("modality") == "audio").count()
                ),
                "media_max_bucket": args.media_max_bucket,
                "hot_buckets_image": lambda: _hot(img_sig, "dhash"),
                "hot_buckets_audio": lambda: _hot(aud_sig, "fingerprint"),
            },
        )
        vcap = args.video_max_df or None
        vpairs = run(
            "media_pairs_video",
            lambda: video.video_near_dup_pairs_from_hashes(
                vid_fh, threshold=args.video_threshold, max_df=vcap),
            key_col="id_a",
            extra={
                "video_threshold": args.video_threshold,
                "video_max_df": args.video_max_df,
                "hot_frame_hashes": lambda: int(
                    video.video_hot_frame_hashes_from_hashes(
                        vid_fh, vcap).count()
                ) if vcap is not None else 0,
            },
        )
        all_pairs = mpairs.select("id_a", "id_b").unionByName(
            vpairs.select("id_a", "id_b"))
        mclusters = run(
            "media_dedup_clusters",
            lambda: clusters.dup_clusters(all_pairs),
            key_col="doc_id",
            extra={
                "clusters": lambda: int(
                    ckpt.read_snapshot("media_dedup_clusters")
                    .select("canon_id").distinct().count()
                ),
            },
        )
        run(
            "media_dedup_stats",
            lambda: clusters.dup_stats(
                mclusters, corpus=media.select("media_id"), id_col="media_id",
            ),
            key_col="cluster_size",
            extra={
                "droppable": lambda: int(
                    ckpt.read_snapshot("media_dedup_stats")
                    .agg(F.sum("n_droppable")).collect()[0][0] or 0
                ),
            },
        )

    if "curate" in want:
        # the post-dedup corpus-curation path (operators/corpus.py +
        # packing.py): cluster labels → keep-best → split → domain cap
        # → chunking → sequence packing, each a checkpointed stage.
        pages = text_pages("curate")
        # the dup-cluster labels: resume from the dedup stage's
        # snapshots when present, build them (uncounted) otherwise
        jpairs_c = ckpt.run_stage(
            "jaccard_dedup",
            lambda: dedup.jaccard_pairs(
                pages.select("url", "text"), "url", "text",
                n=3, threshold=0.7, max_df=args.jaccard_max_df,
            ),
            key_col="id_a",
        )
        labels = ckpt.run_stage(
            "dedup_clusters",
            lambda: clusters.dup_clusters(jpairs_c),
            key_col="doc_id",
        )

        def build_kept():
            scored = pages.select(
                "url", "lang", X.quality_score("text").alias("q")
            )
            kept = clusters.dedup_keep_best(
                scored, None, "url", "q", labels=labels
            )
            kept = corpus_ops.hash_split(
                kept, "url", {"train": 0.98, "val": 0.01, "test": 0.01}
            )
            return corpus_ops.domain_cap(
                kept, "url", "q", "url", args.max_per_domain
            ).select("url", "lang", "q", "split", "domain")

        def _split_count(name):
            return lambda: int(
                ckpt.read_snapshot("curate_kept")
                .where(F.col("split") == name).count()
            )

        run(
            "curate_kept", build_kept, key_col="url",
            extra={
                "max_per_domain": args.max_per_domain,
                "train_rows": _split_count("train"),
                "val_rows": _split_count("val"),
                "test_rows": _split_count("test"),
            },
        )

        def build_chunks():
            kept = ckpt.read_snapshot("curate_kept").select("url", "split")
            src = pages.select("url", "text").join(kept, "url")
            return corpus_ops.doc_chunks(
                src, "url", "text", args.chunk_tokens, args.chunk_overlap
            ).join(kept, "url")

        run("curate_chunks", build_chunks, key_col="url")

        def build_packed():
            # pack TRAIN chunks only (eval splits stay unpacked); the
            # chunk id is url#idx — unique by construction
            ch = (
                ckpt.read_snapshot("curate_chunks")
                .where(F.col("split") == "train")
                .select(
                    F.concat_ws(
                        "#", "url", F.col("chunk_idx").cast("string")
                    ).alias("cid"),
                    "n_tokens",
                )
            )
            return packing.pack_sequences(
                ch, "cid", "n_tokens",
                budget=args.pack_budget, shards=args.pack_shards,
            )

        run(
            "curate_packed", build_packed, key_col="id",
            extra={
                "pack_budget": args.pack_budget,
                "bins_used": lambda: int(
                    packing.pack_stats(
                        ckpt.read_snapshot("curate_packed"), args.pack_budget
                    ).collect()[0]["bins_used"]
                ),
                "fill_ratio": lambda: float(
                    packing.pack_stats(
                        ckpt.read_snapshot("curate_packed"), args.pack_budget
                    ).collect()[0]["fill_ratio"]
                ),
            },
        )

    if "stats" in want:
        # the corpus report card (sketches.quantile_sketch +
        # hll_distinct): per-language doc counts, token totals, length
        # quantiles and a distinct-word estimate — the aggregates'
        # shuffles are bounded by SKETCH size (≤ ~2e3 histogram rows /
        # 2^p registers per language), never by corpus size, so the
        # stage's cost is the scan + the word explode.
        pages = text_pages("stats")

        def build_stats():
            # lang coalesced to a sentinel: an inner equi-join never
            # matches NULL keys, so NULL-lang docs would silently
            # vanish from the report AND its totals
            lang = (F.coalesce(F.col("lang"), F.lit("unknown"))
                    if "lang" in pages.columns
                    else F.lit("all")).alias("lang")
            src = pages.select(lang, X.token_count("text").alias("toks"),
                               "text")
            base = src.groupBy("lang").agg(
                F.count("*").alias("docs"),
                F.sum("toks").alias("total_tokens"),
            )
            q = sketch_ops.quantile_sketch(
                src, ["lang"], "toks",
                {"len_p50": 0.5, "len_p90": 0.9, "len_p99": 0.99},
            )
            words = src.withColumn("__ws", X.words("text")).select(
                "lang", F.explode("__ws").alias("w")
            )
            h = sketch_ops.hll_distinct(
                words, ["lang"], "w", p=args.stats_hll_p
            ).select("lang", F.col("hll_est").alias("distinct_words_est"))
            # left joins: a lang whose docs are all NULL-text (no toks
            # rows) or wordless (no explode rows) must keep its base
            # row rather than drop from the report
            return base.join(q, "lang", "left").join(h, "lang", "left")

        def _stats_sum(col):
            return lambda: int(
                ckpt.read_snapshot("corpus_stats")
                .agg(F.sum(col)).collect()[0][0] or 0
            )

        run(
            "corpus_stats", build_stats, key_col="lang",
            extra={
                "total_docs": _stats_sum("docs"),
                "total_tokens": _stats_sum("total_tokens"),
            },
        )

    if "mix" in want:
        # weighted training-data mixing (operators/corpus.py mixing
        # section): the committed per-doc copy plan rebalancing
        # per-domain token mass to --mix-weights under a --mix-tokens
        # budget. Deterministic (hash-ordered epochs), so a crash-
        # rerun re-derives the identical plan.
        pages = text_pages("mix")
        if not args.mix_weights or args.mix_tokens is None:
            raise SystemExit(
                "--stage mix needs --mix-weights (JSON domain→weight "
                "map) and --mix-tokens (total token budget)")
        if args.mix_tokens < 0:
            raise SystemExit("--mix-tokens must be >= 0")
        try:
            mix_w = {str(k): float(v)
                     for k, v in json.loads(args.mix_weights).items()}
        except (json.JSONDecodeError, AttributeError, TypeError,
                ValueError) as e:
            raise SystemExit(f"--mix-weights is not a JSON map: {e}")

        def build_mix():
            src = pages.select(
                "url",
                corpus_ops.registered_domain("url").alias("domain"),
                X.token_count("text").alias("tokens"),
            )
            return corpus_ops.mix_plan(
                src, "domain", "tokens", "url", mix_w,
                args.mix_tokens, strategy=args.mix_strategy,
            ).withColumnRenamed("id", "url")

        def _mix_stat(col):
            return lambda: int(
                ckpt.read_snapshot("mix_plan")
                .agg(F.sum(col)).collect()[0][0] or 0
            )

        run(
            "mix_plan", build_mix, key_col="url",
            extra={
                "strategy": args.mix_strategy,
                "budget_tokens": args.mix_tokens,
                "total_copies": _mix_stat("n_copies"),
                "tokens_emitted": lambda: int(
                    ckpt.read_snapshot("mix_plan")
                    .agg(F.sum(F.col("tokens") * F.col("n_copies")))
                    .collect()[0][0] or 0
                ),
            },
        )

        def build_mix_report():
            return corpus_ops.mix_report(
                ckpt.read_snapshot("mix_plan")
                .withColumnRenamed("url", "id"),
                mix_w, args.mix_tokens,
            )

        run("mix_report", build_mix_report, key_col="domain")

    if "report" in want:
        def build_report():
            t = tiles.assign_tiles(tagged, args.zoom)
            return (
                t.groupBy("tile_x", "tile_y")
                .agg(
                    F.count("*").alias("n_points"),
                    F.approx_count_distinct("url").alias("approx_urls"),
                )
            )
        run("report", build_report, key_col="tile_x")

    total = {
        "total_sec": round(sum(m.get("sec", 0) for m in metrics), 3),
        "stages": len(metrics),
        "resumed_stages": sum(1 for m in metrics if m.get("resumed")),
    }
    print(json.dumps(total), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
