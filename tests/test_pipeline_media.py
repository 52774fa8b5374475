"""Production-CLI perceptual media dedup (--stage media-dedup):
signature stages committed before pairing, exact pair sets vs
brute-force over the kernel signatures, cluster/report rollup, and
the resume path (decode stages must not rerun). Subprocess — the CLI
owns its SparkSession."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from o2g_spark.kernels.avi import try_decode_avi  # noqa: E402
from o2g_spark.operators import media_dedup as M  # noqa: E402
from o2g_spark.operators import video as V  # noqa: E402
from o2g_spark.operators.multimodal import (  # noqa: E402
    MEDIA_SCHEMA,
    _try_decode_raster,
    try_decode_wav,
)

AUDIO_OFFSET = 10_000  # keep media_id unique across modalities
VIDEO_OFFSET = 100_000
FRAME = 128


def _media_rows():
    rows = list(M.synth_phash_media_rows())
    for mid, url, kind, payload, meta in M.synth_afp_media_rows():
        rows.append((mid + AUDIO_OFFSET, url, kind, payload, meta))
    for mid, url, kind, payload, meta in V.synth_avi_media_rows():
        rows.append((mid + VIDEO_OFFSET, url, kind, payload, meta))
    return rows


def _expected_video_pairs(rows, threshold=0.5):
    sets = {}
    for mid, _u, kind, payload, _m in rows:
        if kind != "video":
            continue
        sets[mid] = {M.dhash_from_rgb(f)
                     for f in try_decode_avi(bytes(payload))[3]}
    out = set()
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sets[a] & sets[b])
            if inter:
                jac = round(inter / len(sets[a] | sets[b]), 6)
                if jac >= threshold:
                    out.add((a, b, jac))
    return out


def _expected_pairs(rows, max_hamming=6):
    sig = {}
    for mid, _u, kind, payload, _m in rows:
        if kind == "image":
            r = _try_decode_raster(bytes(payload))
            sig[mid] = ("image", None if r is None else M.dhash_from_rgb(r[2]))
        else:
            wav = try_decode_wav(bytes(payload))
            fp = None
            if wav is not None:
                fp = M.audio_fp_from_samples(wav[2], FRAME)[1]
            sig[mid] = ("audio", fp)
    out = set()
    ids = sorted(sig)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            (ka, sa), (kb, sb) = sig[a], sig[b]
            if ka != kb or sa is None or sb is None:
                continue
            hm = bin((sa ^ sb) & 0xFFFFFFFFFFFFFFFF).count("1")
            if hm <= max_hamming:
                out.add((a, b, hm, ka))
    return out


def _run_cli(argv, timeout=420):
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "run_pipeline.py"),
         *argv],
        env=dict(os.environ, SPARK_GRAFT_CPUS="4"),
        capture_output=True, text=True, timeout=timeout,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return [json.loads(ln) for ln in out.stdout.strip().splitlines()]


@pytest.fixture(scope="module")
def cli(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("media_dedup")
    media_path = str(root / "media")
    wh = str(root / "wh")
    spark.createDataFrame(_media_rows(), MEDIA_SCHEMA).write.parquet(media_path)
    argv = ["--media", media_path, "--out", wh, "--stage", "media-dedup",
            "--media-frame-samples", str(FRAME), "--master", "local[4]"]
    lines = _run_cli(argv)
    resumed = _run_cli(argv)
    return {"wh": wh, "lines": lines, "resumed": resumed}


def _by_stage(lines):
    return {m["stage"]: m for m in lines if "stage" in m}


def test_all_stages_present(cli):
    stages = _by_stage(cli["lines"])
    for s in ("media_sig_image", "media_sig_audio", "media_sig_video",
              "media_pairs", "media_pairs_video",
              "media_dedup_clusters", "media_dedup_stats"):
        assert s in stages, s
        assert stages[s]["resumed"] is False


def test_signature_stage_rows(cli):
    stages = _by_stage(cli["lines"])
    rows = _media_rows()
    n_img = sum(1 for r in rows if r[2] == "image")
    n_aud = sum(1 for r in rows if r[2] == "audio")
    assert stages["media_sig_image"]["rows"] == n_img
    assert stages["media_sig_audio"]["rows"] == n_aud
    assert stages["media_sig_image"]["undecodable"] == 0
    # the short clip fingerprints as NULL
    assert stages["media_sig_audio"]["unfingerprintable"] == 1
    n_frames = sum(
        len(try_decode_avi(bytes(r[3]))[3])
        for r in rows if r[2] == "video")
    assert stages["media_sig_video"]["rows"] == n_frames
    assert stages["media_sig_video"]["videos"] == sum(
        1 for r in rows if r[2] == "video")


def test_pair_set_exact(cli, spark):
    want = _expected_pairs(_media_rows())
    got_df = spark.read.parquet(os.path.join(cli["wh"], "media_pairs", "data"))
    got = {
        (r.id_a, r.id_b, r.hamming, r.modality) for r in got_df.collect()
    }
    assert got == want
    stages = _by_stage(cli["lines"])
    assert stages["media_pairs"]["image_pairs"] == sum(
        1 for p in want if p[3] == "image")
    assert stages["media_pairs"]["audio_pairs"] == sum(
        1 for p in want if p[3] == "audio")
    assert stages["media_pairs"]["hot_buckets_image"] == 0
    assert stages["media_pairs"]["hot_buckets_audio"] == 0
    vwant = _expected_video_pairs(_media_rows())
    vgot = {
        (r.id_a, r.id_b, r.jaccard)
        for r in spark.read.parquet(
            os.path.join(cli["wh"], "media_pairs_video", "data")).collect()
    }
    assert vgot == vwant and len(vwant) >= 3
    assert stages["media_pairs_video"]["hot_frame_hashes"] == 0


def test_cluster_report(cli):
    stages = _by_stage(cli["lines"])
    want = set(_expected_pairs(_media_rows()))
    want |= {(a, b, j, "video") for a, b, j in
             _expected_video_pairs(_media_rows())}
    # union-find over expected pairs → clusters and droppable count
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b, _h, _m in want:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comps = {}
    for node in parent:
        comps.setdefault(find(node), set()).add(node)
    droppable = sum(len(c) - 1 for c in comps.values())
    assert stages["media_dedup_clusters"]["rows"] == len(parent)
    assert stages["media_dedup_clusters"]["clusters"] == len(comps)
    assert stages["media_dedup_stats"]["droppable"] == droppable


def test_resume_skips_decode(cli):
    stages = _by_stage(cli["resumed"])
    for s in ("media_sig_image", "media_sig_audio", "media_sig_video",
              "media_pairs", "media_pairs_video",
              "media_dedup_clusters", "media_dedup_stats"):
        assert stages[s]["resumed"] is True
    first = _by_stage(cli["lines"])
    for s in ("media_sig_image", "media_sig_audio", "media_sig_video",
              "media_pairs", "media_pairs_video"):
        assert stages[s]["rows"] == first[s]["rows"]


def test_dedup_incremental_media(spark, tmp_path_factory):
    """--stage dedup-incremental --media/--new-media: persisted media
    index build → O(batch) pairing → --merge-index LSM fold; a SECOND
    batch (fresh --out, same --index-dir) pairs against old ∪ merged —
    proving the merge landed — and committed payloads are never
    re-decoded (the second run's build line is resumed)."""
    root = tmp_path_factory.mktemp("media_inc")
    rows = [r for r in _media_rows() if r[2] == "image"]
    old = [r for r in rows if r[0] < 1000]
    new1 = [r for r in rows if r[0] >= 1000]
    # batch 2: a byte-identical repost of id 1000 (which arrived in
    # batch 1 — only a MERGED index can pair it)
    src1000 = next(r for r in new1 if r[0] == 1000)
    new2 = [(5000, "u5000", "image", src1000[3], src1000[4])]

    paths = {}
    for name, data in (("old", old), ("new1", new1), ("new2", new2)):
        paths[name] = str(root / name)
        spark.createDataFrame(data, MEDIA_SCHEMA).write.parquet(paths[name])
    idx = str(root / "idx")

    common = ["--pages", "synth:200", "--stage", "dedup-incremental",
              "--media", paths["old"], "--index-dir", idx,
              "--merge-index", "--master", "local[4]"]
    lines1 = _run_cli(["--out", str(root / "wh1"),
                       "--new-media", paths["new1"], *common])
    st1 = _by_stage(lines1)
    assert st1["media_index_build"]["resumed"] is False
    assert st1["media_index_merge"]["rows"] > st1["media_index_build"]["rows"]

    sigs = {}
    for mid, _u, _k, payload, _m in old + new1 + new2:
        w_h_rgb = _try_decode_raster(bytes(payload))
        sigs[mid] = M.dhash_from_rgb(w_h_rgb[2])

    def brute(touching):
        out = set()
        ids = sorted(sigs)
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                if a in touching or b in touching:
                    hm = bin((sigs[a] ^ sigs[b]) & (2**64 - 1)).count("1")
                    if hm <= 6:
                        out.add((a, b, hm))
        return out

    got1 = {
        (r.id_a, r.id_b, r.hamming)
        for r in spark.read.parquet(
            os.path.join(str(root / "wh1"), "media_dedup_incremental", "data")
        ).collect()
    }
    assert got1 == {p for p in brute({r[0] for r in new1})
                    if p[0] != 5000 and p[1] != 5000}

    lines2 = _run_cli(["--out", str(root / "wh2"),
                       "--new-media", paths["new2"], *common])
    st2 = _by_stage(lines2)
    assert st2["media_index_build"]["resumed"] is True  # never re-decoded
    got2 = {
        (r.id_a, r.id_b, r.hamming)
        for r in spark.read.parquet(
            os.path.join(str(root / "wh2"), "media_dedup_incremental", "data")
        ).collect()
    }
    assert got2 == brute({5000})
    assert (1000, 5000, 0) in got2  # the batch-1 row, via the merge


def test_cli_video_incremental_lifecycle(spark, tmp_path_factory):
    """--stage dedup-incremental --media-kind video: persisted
    frame-hash index → O(batch) set-jaccard pairing → --merge-index
    LSM fold; a SECOND batch (fresh --out, same --index-dir) pairs
    against old ∪ merged, and committed payloads are never re-decoded
    (the second run's build line is resumed)."""
    root = tmp_path_factory.mktemp("video_inc")
    rows = [r for r in _media_rows() if r[2] == "video"]
    old = [r for r in rows if r[0] < VIDEO_OFFSET + 1000]
    new1 = [r for r in rows if r[0] >= VIDEO_OFFSET + 1000]
    # batch 2: a byte-identical repost of the clip that arrived in
    # batch 1 — only a MERGED index can pair it
    src = next(r for r in new1 if r[0] == VIDEO_OFFSET + 1000)
    new2 = [(VIDEO_OFFSET + 5000, "u5000v", "video", src[3], src[4])]

    paths = {}
    for name, data in (("old", old), ("new1", new1), ("new2", new2)):
        paths[name] = str(root / name)
        spark.createDataFrame(data, MEDIA_SCHEMA).write.parquet(paths[name])
    idx = str(root / "idx")

    common = ["--pages", "synth:200", "--stage", "dedup-incremental",
              "--media", paths["old"], "--index-dir", idx,
              "--media-kind", "video", "--video-max-df", "0",
              "--merge-index", "--master", "local[4]"]
    lines1 = _run_cli(["--out", str(root / "wh1"),
                       "--new-media", paths["new1"], *common])
    st1 = _by_stage(lines1)
    assert st1["media_index_build"]["resumed"] is False
    assert st1["media_index_merge"]["rows"] > st1["media_index_build"]["rows"]

    all_pairs = _expected_video_pairs(old + new1 + new2)
    new1_ids = {r[0] for r in new1}
    got1 = {
        (r.id_a, r.id_b, r.jaccard)
        for r in spark.read.parquet(
            os.path.join(str(root / "wh1"), "media_dedup_incremental", "data")
        ).collect()
    }
    want1 = {p for p in all_pairs
             if (p[0] in new1_ids or p[1] in new1_ids)
             and VIDEO_OFFSET + 5000 not in (p[0], p[1])}
    assert got1 == want1 and len(want1) >= 3

    lines2 = _run_cli(["--out", str(root / "wh2"),
                       "--new-media", paths["new2"], *common])
    st2 = _by_stage(lines2)
    assert st2["media_index_build"]["resumed"] is True  # never re-decoded
    got2 = {
        (r.id_a, r.id_b, r.jaccard)
        for r in spark.read.parquet(
            os.path.join(str(root / "wh2"), "media_dedup_incremental", "data")
        ).collect()
    }
    want2 = {p for p in all_pairs if VIDEO_OFFSET + 5000 in (p[0], p[1])}
    assert got2 == want2
    # the batch-1 twin row, reachable only through the merged delta
    assert (VIDEO_OFFSET + 1000, VIDEO_OFFSET + 5000, 1.0) in got2
