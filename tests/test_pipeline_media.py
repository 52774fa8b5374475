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

from o2g_spark.operators import media_dedup as M  # noqa: E402
from o2g_spark.operators.multimodal import (  # noqa: E402
    MEDIA_SCHEMA,
    _try_decode_raster,
    try_decode_wav,
)

AUDIO_OFFSET = 10_000  # keep media_id unique across modalities
FRAME = 128


def _media_rows():
    rows = list(M.synth_phash_media_rows())
    for mid, url, kind, payload, meta in M.synth_afp_media_rows():
        rows.append((mid + AUDIO_OFFSET, url, kind, payload, meta))
    return rows


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
    for s in ("media_sig_image", "media_sig_audio", "media_pairs",
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


def test_cluster_report(cli):
    stages = _by_stage(cli["lines"])
    want = _expected_pairs(_media_rows())
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
    for s in ("media_sig_image", "media_sig_audio", "media_pairs",
              "media_dedup_clusters", "media_dedup_stats"):
        assert stages[s]["resumed"] is True
    first = _by_stage(cli["lines"])
    for s in ("media_sig_image", "media_sig_audio", "media_pairs"):
        assert stages[s]["rows"] == first[s]["rows"]
