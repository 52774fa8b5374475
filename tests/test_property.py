"""Property-based kernel tests (hypothesis): the invariants the whole
engine rests on, fuzzed rather than fixtured."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from o2g_spark.kernels import cells, geometry

LAT = st.floats(min_value=-89.999, max_value=89.999, allow_nan=False)
LON = st.floats(min_value=-179.999, max_value=179.999, allow_nan=False)
RES = st.integers(min_value=0, max_value=cells.MAX_RES)


@given(LAT, LON, RES)
@settings(max_examples=200, deadline=None)
def test_encode_bounds_contain_point(lat, lon, res):
    c = cells.encode([lat], [lon], res)
    lon0, lat0, lon1, lat1 = cells.cell_bounds(c)
    # symmetric 1e-9° tolerance: a point within one ulp of a cell edge
    # may floor to either side — deterministically and identically in
    # numpy/Spark/DuckDB (what correctness actually needs)
    assert lon0[0] - 1e-9 <= lon <= lon1[0] + 1e-9
    assert lat0[0] - 1e-9 <= lat <= lat1[0] + 1e-9
    assert int(cells.cell_res(c)[0]) == res


@given(LAT, LON, st.integers(min_value=1, max_value=cells.MAX_RES))
@settings(max_examples=200, deadline=None)
def test_parent_contains_child(lat, lon, res):
    child = cells.encode([lat], [lon], res)
    for pr in {0, res // 2, res - 1}:
        par = cells.parent(child, pr)
        assert par[0] == cells.encode([lat], [lon], pr)[0]


@given(LAT, LON, st.integers(min_value=0, max_value=cells.MAX_RES - 1))
@settings(max_examples=100, deadline=None)
def test_children_partition_parent(lat, lon, res):
    c = cells.encode([lat], [lon], res)
    kids = cells.children(c)[0]
    finer = cells.encode([lat], [lon], res + 1)
    assert finer[0] in set(kids.tolist())
    assert all(cells.parent(np.array([k]))[0] == c[0] for k in kids)


def _poly_radius(ang, rad, t):
    """Radius of a star-shaped polygon's boundary at angle t."""
    n = len(ang)
    j = int(np.searchsorted(ang, t)) % n
    a0, a1 = ang[j - 1], ang[j]
    r0, r1 = rad[j - 1], rad[j]
    x0, y0 = r0 * np.cos(a0), r0 * np.sin(a0)
    x1, y1 = r1 * np.cos(a1), r1 * np.sin(a1)
    dx, dy = x1 - x0, y1 - y0
    denom = dx * np.sin(t) - dy * np.cos(t)
    if abs(denom) < 1e-12:
        return 0.0
    s = -(x0 * np.sin(t) - y0 * np.cos(t)) / denom
    return float(np.hypot(x0 + s * dx, y0 + s * dy))


@given(st.integers(min_value=5, max_value=12), st.integers(min_value=0, max_value=10_000))
@settings(max_examples=50, deadline=None)
def test_raycast_matches_star_polygon_oracle(n_verts, seed):
    """Even-odd ray cast agrees with an independent polar-containment
    oracle on random star-shaped (hence simple) polygons: a point is
    inside iff its radius is below the boundary radius at its angle.

    Star-shapedness about the center requires every angular gap < π:
    bounded-ratio gaps guarantee it (max share 1/(1+(n-1)/2) < 1/2)."""
    rng = np.random.default_rng(seed)
    gaps = rng.uniform(0.5, 1.0, n_verts)
    ang = 2 * np.pi * np.cumsum(gaps) / gaps.sum()
    ang = np.sort(ang % (2 * np.pi))
    rad = rng.uniform(1.0, 5.0, n_verts)
    cx, cy = rng.uniform(-20, 20), rng.uniform(-20, 20)
    ring = np.column_stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)])
    ring = np.vstack([ring, ring[:1]])

    pts_lon = rng.uniform(cx - 6, cx + 6, 200)
    pts_lat = rng.uniform(cy - 6, cy + 6, 200)
    got = geometry.points_in_ring(pts_lon, pts_lat, ring)

    theta = np.arctan2(pts_lat - cy, pts_lon - cx) % (2 * np.pi)
    r_pt = np.hypot(pts_lon - cx, pts_lat - cy)
    for i in range(len(pts_lon)):
        r_poly = _poly_radius(ang, rad, theta[i])
        if abs(r_pt[i] - r_poly) < 1e-6:
            continue  # boundary tie — either verdict acceptable
        assert got[i] == (r_pt[i] < r_poly), (i, r_pt[i], r_poly)


@given(st.integers(min_value=2, max_value=9))
@settings(max_examples=30, deadline=None)
def test_adaptive_cover_classification_sound(res):
    """Random convex polygon: every interior-cell center is inside;
    every center outside interior∪boundary is outside the polygon."""
    rng = np.random.default_rng(res * 7 + 1)
    ang = np.sort(rng.uniform(0, 2 * np.pi, 7))
    ring = np.column_stack([10 * np.cos(ang), 5 + 8 * np.sin(ang)])
    ring = np.vstack([ring, ring[:1]])
    interior, boundary = geometry.polygon_cover_adaptive(
        [ring], max(0, res - 3), res
    )
    if len(interior):
        clat, clon = cells.cell_center(interior)
        assert geometry.points_in_polygon(clon, clat, [ring]).all()


# --------------------------------------------- real decoders (r3)

from o2g_spark.operators import multimodal as mm  # noqa: E402


@given(
    w=st.integers(1, 12),
    h=st.integers(1, 10),
    top_down=st.booleans(),
    seed=st.integers(0, 10**6),
)
@settings(max_examples=60, deadline=None)
def test_bmp_roundtrip_property(w, h, top_down, seed):
    """make_bmp → try_decode_bmp is pixel-exact for EVERY size (odd
    widths exercise stride padding) and both row orders."""
    rng = np.random.default_rng(seed)
    rgb = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    got = mm.try_decode_bmp(mm.make_bmp(rgb, top_down=top_down))
    assert got is not None
    gw, gh, out = got
    assert (gw, gh) == (w, h)
    assert np.array_equal(out, rgb)


@given(
    n=st.integers(1, 500),
    ch=st.integers(1, 2),
    rate=st.sampled_from([8000, 11025, 22050, 44100]),
    seed=st.integers(0, 10**6),
)
@settings(max_examples=60, deadline=None)
def test_wav_roundtrip_property(n, ch, rate, seed):
    rng = np.random.default_rng(seed)
    s = rng.integers(-32768, 32768, size=(n, ch)).astype(np.int16)
    got = mm.try_decode_wav(mm.make_wav(s, rate))
    assert got is not None
    grate, gch, out = got
    assert (grate, gch) == (rate, ch)
    assert np.array_equal(out, s)


# ------------------------------------- gazetteer matcher equivalence

import re as _re  # noqa: E402

from o2g_spark.functions import geotag as gt  # noqa: E402

_name_st = st.text(alphabet="abcxy .+()", min_size=1, max_size=8).map(
    str.strip
).filter(bool)


@given(
    names=st.sets(_name_st, min_size=1, max_size=12),
    text=st.text(alphabet="abcxy ,.+()", max_size=60),
)
@settings(max_examples=150, deadline=None)
def test_matchers_equivalent_property(names, text):
    """Aho-Corasick and the trie regex agree with the longest-first
    alternation on arbitrary overlapping/nested name sets — the
    equivalence extract_places promises for every matcher."""
    ordered = sorted(names, key=len, reverse=True)
    alt = _re.compile(
        r"\b(" + "|".join(_re.escape(p) for p in ordered) + r")\b"
    )
    trie = _re.compile(r"\b(" + gt._trie_regex(list(names)) + r")\b")
    want = alt.findall(text)
    assert trie.findall(text) == want
    assert gt._AhoCorasick(list(names)).find_all(text) == want


# ------------------------------------------------------- codec kernels

from o2g_spark.kernels import jpeg as J  # noqa: E402
from o2g_spark.operators import multimodal as mm  # noqa: E402


# the conformant reference encoder lives beside make_gif (fixture-class
# code); what the property needs is independence from the DECODER, and
# an encoder is not a decoder
_lzw_ref_encode = mm.lzw_encode_reference


@given(st.binary(min_size=1, max_size=3000),
       st.sampled_from([2, 3, 4, 8]))
@settings(max_examples=60, deadline=None)
def test_lzw_roundtrip_any_stream(data, mcs):
    data = bytes(b % (1 << mcs) for b in data)
    dec = mm._lzw_decode(_lzw_ref_encode(data, mcs), mcs, len(data))
    assert dec is not None and bytes(dec) == data


@given(st.integers(1, 40), st.integers(1, 30), st.integers(0, 2**32 - 1))
@settings(max_examples=40, deadline=None)
def test_gif_canonical_roundtrip_prop(w, h, seed):
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    idx = rng.integers(0, 256, (h, w), dtype=np.uint8)
    got = mm.try_decode_gif(mm.make_gif(idx, pal))
    assert got is not None and (got[0], got[1]) == (w, h)
    assert np.array_equal(got[2], pal[idx.reshape(-1)].reshape(h, w, 3))


@given(st.integers(1, 33), st.integers(1, 25), st.integers(0, 2**32 - 1),
       st.sampled_from([60, 85, 100]), st.booleans(), st.sampled_from([0, 3]))
@settings(max_examples=25, deadline=None)
def test_jpeg_decode_stats_prop(w, h, seed, quality, subsample, dri):
    """Any encodable image round-trips with sane stats: exact dims,
    mean within the DC-quant + color-convert envelope, never a crash."""
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    out = J.try_decode_jpeg(
        J.make_jpeg(img, quality=quality, subsample=subsample,
                    restart_interval=dri))
    assert out is not None and (out[0], out[1]) == (w, h)
    assert abs(float(out[2].mean()) - float(img.mean())) < 16.0


# ------------------------------------------------- quantile sketch math

from o2g_spark.operators import sketches as SK  # noqa: E402

QX = st.integers(min_value=-(2**63) + 1, max_value=2**63 - 1)
QB_BITS = st.integers(min_value=1, max_value=20)


@given(QX, QB_BITS)
@settings(max_examples=300, deadline=None)
def test_qsketch_estimate_within_relative_bound(x, b):
    est = SK.qb_value(SK.qb_of(x, b), b)
    assert abs(est - x) <= abs(x) * SK.qsketch_error_bound(b) + 0.5
    assert (est == 0) == (x == 0)
    assert (est > 0) == (x > 0)


@given(QX, QX, QB_BITS)
@settings(max_examples=300, deadline=None)
def test_qsketch_bucket_monotone(x, y, b):
    # bucket ids order like values — the property the cumsum walk
    # (and therefore every quantile answer) rests on
    if x <= y:
        assert SK.qb_of(x, b) <= SK.qb_of(y, b)
    else:
        assert SK.qb_of(x, b) >= SK.qb_of(y, b)


@given(QX, QB_BITS)
@settings(max_examples=300, deadline=None)
def test_qsketch_estimate_same_bucket(x, b):
    # the midpoint estimate lands back in the value's own bucket, so
    # repeated sketch->estimate->sketch is a fixpoint after one step
    qb = SK.qb_of(x, b)
    est = SK.qb_value(qb, b)
    assert SK.qb_of(est, b) == qb


@given(st.integers(min_value=0, max_value=2**20), QB_BITS)
@settings(max_examples=200, deadline=None)
def test_qsketch_small_values_exact_below_2_pow_b(x, b):
    if x < (1 << b):
        assert SK.qb_value(SK.qb_of(x, b), b) == x
