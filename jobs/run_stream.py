"""Production streaming CLI (r4 VERDICT #4): launch the bounded-state
stateful operators under a DURABLE checkpoint via the documented
spark-submit path — the streaming counterpart of jobs/run_pipeline.py.

Ops (all applyInPandasWithState, event-time idle eviction by default,
exactly-once across kill -9 via checkpointLocation + the parquet sink
manifest — evidence protocol in scripts/stream_resume_demo.py):

  visits       cell_visits_stateful over an event stream
               (user_id, event_id, ts, cell)
  neardup      near_dup_candidates_stream over a doc stream
               (doc_id, text, ts) — minhash-LSH candidate funnel
  neardup-emb  near_dup_embedding_stream over a vector stream
               (vec_id, embedding array<float>, ts) — hyperplane funnel
  neardup-media  near_dup_media_stream over a raw media stream
               (media_id, kind, payload binary, ts) — integer dHash /
               audio-fingerprint funnel; --media-kind picks the
               modality (one query per modality, shared machinery);
               --media-kind video routes to near_dup_video_stream
               (real AVI decode, per-frame dHashes as band keys)
  hll          hll_window_stream over an event stream
               (grp string, v string, ts) — tumbling-window distinct
               sketch, 2^p bytes of state per open window
  quantiles    quantile_window_stream over a metric stream
               (grp string, v long, ts) — tumbling-window p50/p90/p99
               off the integer relative-error sketch, bounded
               bucket-histogram state per open window

Run (spark-submit so the JVM gets its memory BEFORE get_spark; see
CLAUDE.md — the flag is mandatory past toy scale):

    spark-submit --master local[8] --driver-memory 32g \
        --py-files "$(python -c 'from o2g_spark.session import \
            build_pyfiles_zip; print(build_pyfiles_zip())')" \
        jobs/run_stream.py --op neardup --src /data/docs_stream \
        --sink /wh/nd_candidates --ckpt /wh/nd_ckpt \
        --state-store rocksdb --mode drain

Modes: ``drain`` processes everything currently in --src INCLUDING the
watermark-advance no-data batches where event-time evictions land
(commit-log quiescence wait), then exits 0 — the restartable backfill /
catch-up shape, and what the resume evidence uses. ``follow`` keeps
the query running for a live tail until killed; a kill at ANY point
resumes exactly-once from the checkpoint on the next invocation.

Resume is implicit: same --ckpt (+ same --shuffle-partitions and
--state-store — state layout is partitioned by them) continues from
the last commit; already-committed sink batches are never re-emitted
(FileStreamSink manifest).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SCHEMAS = {
    "visits": "user_id long, event_id long, ts timestamp, cell long",
    "neardup": "doc_id string, text string, ts timestamp",
    "neardup-emb": "vec_id string, embedding array<float>, ts timestamp",
    "neardup-media": "media_id long, kind string, payload binary, "
                     "ts timestamp",
    "hll": "grp string, v string, ts timestamp",
    "quantiles": "grp string, v long, ts timestamp",
}


def build_query(spark, args):
    from o2g_spark.streaming import stateful

    stream = (
        spark.readStream.schema(args.schema)
        .option("maxFilesPerTrigger", args.max_files_per_trigger)
        .parquet(args.src)
    )
    common = dict(
        timeout_ms=args.timeout_ms,
        time_mode=args.time_mode,
        watermark=args.watermark,
    )
    if args.op == "visits":
        if args.shards:
            common["shards"] = args.shards
        return stateful.cell_visits_stateful(stream, **common)
    if args.op == "neardup":
        return stateful.near_dup_candidates_stream(
            stream, shards=args.shards or 1024, **common
        )
    if args.op == "neardup-emb":
        if not args.dim:
            raise SystemExit("--dim is required for --op neardup-emb "
                             "(a stream cannot be sampled for vector width)")
        return stateful.near_dup_embedding_stream(
            stream, dim=args.dim, shards=args.shards or 1024, **common
        )
    if args.op == "neardup-media":
        if args.media_kind == "video":
            return stateful.near_dup_video_stream(
                stream, every_k=args.video_every_k,
                shards=args.shards or 1024, **common
            )
        return stateful.near_dup_media_stream(
            stream, kind=args.media_kind, shards=args.shards or 1024,
            frame_samples=args.media_frame_samples, **common
        )
    if args.op == "hll":
        return stateful.hll_window_stream(
            stream, "grp", "v", "ts",
            window_seconds=args.window_seconds, p=args.hll_p,
            time_mode=args.time_mode, watermark=args.watermark,
        )
    if args.op == "quantiles":
        return stateful.quantile_window_stream(
            stream, "grp", "v", "ts",
            window_seconds=args.window_seconds,
            quantiles={"p50": 0.5, "p90": 0.9, "p99": 0.99},
            sub_bits=args.sub_bits,
            time_mode=args.time_mode, watermark=args.watermark,
        )
    raise SystemExit(f"unknown --op {args.op!r}")


def drain(q, ckpt: str, timeout_s: int) -> None:
    """Process all available input AND the watermark-advance no-data
    batches (event-time evictions commit there — processAllAvailable
    alone can return before they land): wait for the commit log to
    stop advancing while the trigger is idle.

    The commit-log probe reads the LOCAL filesystem; for a remote
    ``--ckpt`` (hdfs://, s3a://, ...) it degrades to the status-only
    idle heuristic — loudly, because that heuristic alone can return
    before a scheduled eviction batch commits."""
    q.processAllAvailable()
    commits_dir = os.path.join(ckpt, "commits")
    if "://" in ckpt and not os.path.isdir(commits_dir):
        print(
            f"WARNING: --ckpt {ckpt!r} is not a local path; drain's "
            "commit-log quiescence check is unavailable and only the "
            "trigger-idle status heuristic gates completion — prefer "
            "a longer --drain-timeout-s or verify the sink row count "
            "against a batch twin",
            file=sys.stderr, flush=True,
        )

    def n_commits() -> int:
        if not os.path.isdir(commits_dir):
            return 0
        return len([f for f in os.listdir(commits_dir)
                    if not f.startswith(".")])

    stable_since = None
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        before = n_commits()
        time.sleep(4)
        st = q.status
        if (n_commits() == before and not st["isDataAvailable"]
                and not st["isTriggerActive"]):
            if stable_since is None:
                stable_since = time.time()
            elif time.time() - stable_since >= 8:
                return
        else:
            stable_since = None
    raise SystemExit(f"drain: commit log still advancing after {timeout_s}s")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--op", required=True,
                    choices=["visits", "neardup", "neardup-emb",
                             "neardup-media", "hll",
                             "quantiles"])
    ap.add_argument("--src", required=True,
                    help="parquet directory consumed as a file stream")
    ap.add_argument("--sink", required=True, help="parquet output path")
    ap.add_argument("--ckpt", required=True,
                    help="durable checkpointLocation (same path = resume)")
    ap.add_argument("--mode", default="drain", choices=["drain", "follow"])
    ap.add_argument("--schema", default=None,
                    help="override the op's default source schema DDL")
    ap.add_argument("--timeout-ms", type=int, default=3_600_000,
                    help="idle-eviction timeout (data time in event mode)")
    ap.add_argument("--time-mode", default="event",
                    choices=["event", "processing"])
    ap.add_argument("--watermark", default="10 minutes")
    ap.add_argument("--shards", type=int, default=None,
                    help="state-shard count (default: op's own default; "
                         "visits defaults to per-user keying)")
    ap.add_argument("--window-seconds", type=int, default=3600,
                    help="hll: tumbling window width")
    ap.add_argument("--sub-bits", type=int, default=4,
                    help="quantiles: sketch sub-bucket bits (error "
                         "bound 2^-(sub_bits+1))")
    ap.add_argument("--hll-p", type=int, default=10,
                    help="hll: sketch precision (state = 2^p bytes)")
    ap.add_argument("--media-kind", default="image",
                    choices=["image", "audio", "video"],
                    help="modality for --op neardup-media (video "
                         "routes to the frame-hash funnel, "
                         "near_dup_video_stream)")
    ap.add_argument("--video-every-k", type=int, default=1,
                    help="sample every k-th frame for --media-kind "
                         "video")
    ap.add_argument("--media-frame-samples", type=int, default=256,
                    help="audio fingerprint frame size for --op "
                         "neardup-media --media-kind audio")
    ap.add_argument("--dim", type=int, default=None,
                    help="embedding width (neardup-emb only)")
    ap.add_argument("--state-store", default="hdfs",
                    choices=["hdfs", "rocksdb"])
    ap.add_argument("--shuffle-partitions", type=int, default=8,
                    help="MUST match across kill/resume (state layout)")
    ap.add_argument("--max-files-per-trigger", type=int, default=1)
    ap.add_argument("--drain-timeout-s", type=int, default=600)
    args = ap.parse_args(argv)
    if args.schema is None:
        args.schema = SCHEMAS[args.op]

    from o2g_spark.session import get_spark

    extra = {}
    if args.state_store == "rocksdb":
        extra["spark.sql.streaming.stateStore.providerClass"] = (
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider"
        )
    spark = get_spark(
        app_name=f"o2g-stream-{args.op}",
        shuffle_partitions=args.shuffle_partitions,
        extra_conf=extra,
    )
    out = build_query(spark, args)
    q = (
        out.writeStream.format("parquet")
        .option("path", args.sink)
        .option("checkpointLocation", args.ckpt)
        .outputMode("append")
        .start()
    )
    if args.mode == "follow":
        q.awaitTermination()
        return 0
    drain(q, args.ckpt, args.drain_timeout_s)
    q.stop()
    # a drained stream that emitted ZERO rows writes only
    # _spark_metadata (parquet writers are created lazily on the first
    # row) — an empty sink is a successful drain, not a read error.
    # Local sinks are probed directly; remote ones (s3a://, hdfs://)
    # can't be listed with os, so the schema-inference failure of an
    # empty metadata-only dir is caught instead.
    if os.path.isdir(args.sink):
        has_data = any(
            not f.startswith((".", "_")) for f in os.listdir(args.sink)
        )
        rows = spark.read.parquet(args.sink).count() if has_data else 0
    else:
        try:
            rows = spark.read.parquet(args.sink).count()
        except Exception as exc:
            if "infer schema" not in str(exc).lower():
                raise
            rows = 0
    print(json.dumps({
        "op": args.op, "mode": "drain", "sink_rows": int(rows),
        "state_store": args.state_store, "ckpt": args.ckpt,
    }), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
