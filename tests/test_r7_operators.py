"""Round-7 pinning tests (VERDICT r6 brief).

  * graph_triangle_count is now DEGREE-oriented (#4): the planted
    hub/star graph produces ZERO wedges (under the old id
    orientation a low-id hub is the apex of O(hub²) wedges), exact
    triangle counts survive on known graphs, and the physical plan
    contains the degree-aggregate broadcast join.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_riveranalysis_spark.plans import mining as M


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "part_a long, part_b long")


def _wedges(de):
    w1 = de.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    w2 = de.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    return w1.join(w2, "a").filter(F.col("b") != F.col("c"))


def test_star_graph_has_zero_wedges_under_degree_orientation(spark):
    """Hub node 0 (lowest id, degree 40) + 40 degree-1 leaves: id
    orientation makes the hub the apex of 40·39 = 1560 wedges;
    degree orientation points every edge leaf→hub, so NO node has
    out-degree > 1 and the wedge set is EMPTY — the arboricity bound
    the r6 docstring promised but didn't implement."""
    e = _edges(spark, [(0, i) for i in range(1, 41)])
    de = M.degree_oriented_edges(e)
    out = de.groupBy("src").count().agg(F.max("count")).collect()[0][0]
    assert out == 1
    assert _wedges(de).count() == 0
    assert M.triangles_per_node(e).count() == 0


def test_triangle_counts_exact_on_planted_graphs(spark):
    """K4 (4 triangles, every node in 3) + a pendant edge + an open
    square (0 triangles) — each triangle emitted exactly once via its
    unique two-out-edge apex."""
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    pendant = [(4, 9)]
    square = [(10, 11), (11, 12), (12, 13), (10, 13)]
    got = {
        r.node: r.n_triangles
        for r in M.triangles_per_node(
            _edges(spark, k4 + pendant + square)
        ).collect()
    }
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_hub_with_one_closing_edge_still_counts(spark):
    """Star + one leaf-leaf edge = exactly 1 triangle; the apex must
    be a LEAF (degree order), never the hub, keeping wedge volume at
    the arboricity bound even when triangles exist."""
    e = _edges(spark, [(0, i) for i in range(1, 31)] + [(1, 2)])
    got = {r.node: r.n_triangles for r in M.triangles_per_node(e).collect()}
    assert got == {0: 1, 1: 1, 2: 1}
    de = M.degree_oriented_edges(e)
    # hub 0 has max degree → zero out-edges → zero hub-apex wedges
    assert de.filter(F.col("src") == 0).count() == 0


def test_triangle_plan_shows_degree_broadcast_join(spark):
    """The executed plan of the registered query must contain the
    degree-aggregate broadcast joins (the 100×-scale feature), not a
    bare id-oriented self-join."""
    df = M.graph_triangle_count(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan[:2000]


# ---------------------------------------------------------------------------
# GIF frame decode (VERDICT r6 #7) — independent encoder, golden frames
# ---------------------------------------------------------------------------


def _lzw_pack(codes_widths):
    acc = bits = 0
    out = bytearray()
    for c, w in codes_widths:
        acc |= c << bits
        bits += w
        while bits >= 8:
            out.append(acc & 255)
            acc >>= 8
            bits -= 8
    if bits:
        out.append(acc & 255)
    return bytes(out)


def _gif_lzw_literal(indices, min_code=8):
    """Literal-only LZW (the classic 'uncompressed GIF' trick): a
    CLEAR every 250 codes keeps the decoder table under 2^(min+1), so
    the code width never grows."""
    clear, end, w = 1 << min_code, (1 << min_code) + 1, min_code + 1
    cw = [(clear, w)]
    n = 0
    for px in indices:
        if n == 250:
            cw.append((clear, w))
            n = 0
        cw.append((px, w))
        n += 1
    cw.append((end, w))
    return _lzw_pack(cw)


def _gif_lzw_real(indices, min_code):
    """True dictionary LZW with code-width growth — exercises the
    decoder's table-append and width-bump paths the literal encoder
    never reaches."""
    clear, end = 1 << min_code, (1 << min_code) + 1
    d = {bytes([i]): i for i in range(clear)}
    nxt, width = end + 1, min_code + 1
    cw = [(clear, width)]
    buf = b""
    for px in indices:
        k = buf + bytes([px])
        if k in d:
            buf = k
            continue
        cw.append((d[buf], width))
        if nxt < 4096:
            d[k] = nxt
            nxt += 1
            # decoder widens when its table LENGTH hits 2^width; its
            # table is one entry behind the encoder's dict (it appends
            # entry n only on the code AFTER the one that assigned n),
            # so its length when reading the next code is nxt - 1
            if nxt - 1 == (1 << width) and width < 12:
                width += 1
        buf = bytes([px])
    if buf:
        cw.append((d[buf], width))
    cw.append((end, width))
    return _lzw_pack(cw)


def _gif_encode(w, h, frames, palette, min_code=8, encoder=_gif_lzw_literal):
    """frames: list of (left, top, fw, fh, indices, gce|None,
    interlaced). gce = (disposal, transparent_idx|None)."""
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x80 | 0x07, 0, 0])  # 256-entry GCT, bg idx 0
    out += palette
    for left, top, fw, fh, idx, gce, inter in frames:
        if gce is not None:
            disp, tr = gce
            flags = (disp << 2) | (1 if tr is not None else 0)
            out += bytes([0x21, 0xF9, 4, flags, 0, 0, tr or 0, 0])
        out += bytes([0x2C])
        for v in (left, top, fw, fh):
            out += v.to_bytes(2, "little")
        out += bytes([0x40 if inter else 0, min_code])
        data = encoder(idx, min_code)
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += bytes([0, ])
    out += bytes([0x3B])
    return bytes(out)


def _pal256():
    return bytes(
        b for i in range(256) for b in ((i, (i * 7) % 256, (255 - i)))
    )


def _rgb(pal, indices):
    return b"".join(pal[i * 3 : i * 3 + 3] for i in indices)


def test_gif_full_frame_animation_decodes_golden_frames():
    from bigdata_riveranalysis_spark.operators import multimodal as MM

    pal = _pal256()
    w, h = 4, 3
    planes = [bytes([c] * (w * h)) for c in (10, 77, 200)]
    gif = _gif_encode(
        w, h, [(0, 0, w, h, p, None, False) for p in planes], pal
    )
    got = MM._gif_frames(gif)
    assert got is not None and len(got) == 3
    for (gw, gh, rgb), p in zip(got, planes):
        assert (gw, gh) == (w, h)
        assert rgb == _rgb(pal, p)


def test_gif_partial_frame_transparency_and_disposal():
    from bigdata_riveranalysis_spark.operators import multimodal as MM

    pal = _pal256()
    w, h = 4, 3
    base = bytes([5] * (w * h))
    # frame 2: 2x1 patch at (1,1): one opaque pixel (9), one transparent
    patch = bytes([9, 0])
    gif = _gif_encode(
        w,
        h,
        [
            (0, 0, w, h, base, None, False),
            (1, 1, 2, 1, patch, (1, 0), False),  # draw-over, tr idx 0
        ],
        pal,
    )
    f1, f2 = MM._gif_frames(gif)
    assert f1[2] == _rgb(pal, base)
    expect = bytearray(_rgb(pal, base))
    expect[(1 * w + 1) * 3 : (1 * w + 1) * 3 + 3] = pal[9 * 3 : 9 * 3 + 3]
    assert f2[2] == bytes(expect)  # transparent pixel kept the base color


def test_gif_interlace_and_real_lzw_roundtrip():
    from bigdata_riveranalysis_spark.operators import multimodal as MM

    pal = _pal256()
    w, h = 5, 7
    # repetitive pattern → real LZW builds dictionary entries + widens
    idx = bytes((i * 3 + (i // w)) % 7 for i in range(w * h)) * 1
    rows = [idx[y * w : (y + 1) * w] for y in range(h)]
    inter_order = [0, 4, 2, 6, 1, 3, 5]  # GIF 4-pass order for h=7
    inter = b"".join(rows[y] for y in inter_order)
    gif = _gif_encode(
        w, h, [(0, 0, w, h, inter, None, True)], pal,
        min_code=3, encoder=_gif_lzw_real,
    )
    got = MM._gif_frames(gif)
    assert got is not None
    assert got[0] == (w, h, _rgb(pal, idx))


def test_gif_real_lzw_wide_table(spark):
    """A long high-entropy stream forces many dictionary appends and
    several width bumps (min_code=8 → widths 9..12)."""
    from bigdata_riveranalysis_spark.operators import multimodal as MM

    idx = bytes((i * 131 + (i >> 3) * 17) % 251 for i in range(40 * 30))
    pal = _pal256()
    gif = _gif_encode(40, 30, [(0, 0, 40, 30, idx, None, False)], pal,
                      encoder=_gif_lzw_real)
    got = MM._gif_frames(gif)
    assert got is not None
    assert got[0] == (40, 30, _rgb(pal, idx))


def test_gif_frames_through_spark_plan(spark):
    """Golden frames end-to-end through the mapInPandas operator: a
    5-frame GIF yields frame_no 0/2/4 (GIF_FRAME_EVERY=2), each frame
    the P6 encoding of the composited canvas — readable back through
    _raster (the resize/decode consumers)."""
    from bigdata_riveranalysis_spark.operators import multimodal as MM

    pal = _pal256()
    w, h = 3, 2
    planes = [bytes([c] * (w * h)) for c in (1, 2, 3, 4, 5)]
    gif = _gif_encode(w, h, [(0, 0, w, h, p, None, False) for p in planes], pal)
    df = spark.createDataFrame(
        [(1, bytearray(gif))], "doc_id long, payload binary"
    )
    rows = {r.frame_no: r for r in MM.sample_frames(df).collect()}
    assert sorted(rows) == [0, 2, 4]
    for i in (0, 2, 4):
        expect = MM._encode_ppm(w, h, _rgb(pal, planes[i]))
        assert bytes(rows[i].frame) == expect
        assert rows[i].frame_len == len(expect)
        # sampled frames feed straight back into the image decoders
        assert MM._raster(bytes(rows[i].frame)) is not None

    # non-GIF payloads keep the byte-stride contract (oracle-checked
    # query semantics unchanged)
    blob = bytes(range(200))
    df2 = spark.createDataFrame([(2, blob)], "doc_id long, payload binary")
    got = {r.frame_no: bytes(r.frame) for r in MM.sample_frames(df2).collect()}
    assert got == {0: blob[:64], 1: blob[128:192]}


def test_resize_payload_long_dimension_headers():
    """ADVICE r6: 4-digit dimensions make the P6 header >15 bytes; the
    resize must size against the ACTUAL header and shrink uniformly
    (aspect preserved within integer truncation), never decrement
    dims independently."""
    from bigdata_riveranalysis_spark.operators import multimodal as MM

    w, h = 1200, 40  # 30:1 aspect
    rgb = bytes((i % 3 == 0) * 200 for i in range(3 * w * h))
    payload = MM._encode_ppm(w, h, rgb)
    out = MM._resize_payload(payload, 4000)
    r = MM._raster(out)
    assert r is not None
    _, nw, nh, _ = r
    assert len(out) <= 4000
    # uniform scale: aspect within truncation error of the original
    assert nh >= 1 and abs(nw / nh - w / h) / (w / h) < 0.35
    # and the budget is actually used (not a degenerate 1x1)
    assert nw * nh * 3 > 4000 * 0.5


def test_cms_bucket_wide_key_domain_matches_hugeint(spark):
    """ADVICE r6: the naive a·k wraps in non-ANSI Spark for keys ≥
    ~2^33 while DuckDB promotes to HUGEINT. The two-step Mersenne
    reduction must agree with exact (Python bigint / DuckDB HUGEINT)
    arithmetic over the full nonnegative long domain."""
    import duckdb

    from bigdata_riveranalysis_spark.plans import mining as M

    keys = [0, 1, 5, 2**31 - 1, 2**33, 2**40 + 7, 2**52 + 123,
            2**61 - 2, 2**61 - 1, 2**61, 2**62 + 3, 2**63 - 1]
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    from pyspark.sql import functions as F_

    got = {}
    for d in range(M.CMS_DEPTH):
        rows = df.select(
            "k", M.cms_bucket(F_.lit(d), F_.col("k")).alias("b")
        ).collect()
        got.update({(d, r.k): r.b for r in rows})
    for d in range(M.CMS_DEPTH):
        a, b = M.CMS_A[d], M.CMS_B[d]
        for k in keys:
            want = ((a * k + b) % M.CMS_P) % M.CMS_WIDTH
            assert got[(d, k)] == want, (d, k, got[(d, k)], want)
            # run the ACTUAL oracle fragment (cms_bucket_sql), not a
            # hand-built equivalent — the r7 review found the real
            # oracle texts lacked the HUGEINT cast while this test's
            # inline SQL had it, masking the divergence.
            rel = duckdb.sql(
                f"WITH {M.CMS_SEEDS_SQL} SELECT {M.cms_bucket_sql(str(k))}"
                f" FROM seeds WHERE d = {d}"
            ).fetchall()[0][0]
            assert rel == want, (d, k)


def test_pagerank_integer_recurrence_on_planted_graph(spark):
    """3-node path a—b—c: hand-computed fixed-point recurrence
    (s' = 150000 + (85·Σ floor(s/deg)) div 100) must match the
    production pipeline exactly — the bit-identical-across-engines
    property the oracle hash relies on."""
    e = _edges(spark, [(1, 2), (2, 3)])
    got = {r.node: (r.score_ppm, r.degree)
           for r in M.pagerank_scores(e).collect()}
    # hand simulation
    deg = {1: 1, 2: 2, 3: 1}
    s = {1: 1_000_000, 2: 1_000_000, 3: 1_000_000}
    for _ in range(M.PR_ITERS):
        share = {v: s[v] // deg[v] for v in s}
        inc = {1: share[2], 3: share[2], 2: share[1] + share[3]}
        s = {v: 150_000 + (85 * inc[v]) // 100 for v in s}
    assert got == {v: (s[v], deg[v]) for v in s}
    # center node aggregates two neighbors -> highest score
    assert got[2][0] > got[1][0] == got[3][0]


# ---------------------------------------------------------------------------
# Property-based checks (hypothesis) for the r7 graph + GIF paths
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_SETTINGS = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_edge_sets = st.sets(
    st.tuples(st.integers(0, 11), st.integers(0, 11)).filter(
        lambda p: p[0] != p[1]
    ),
    min_size=1,
    max_size=24,
)


def _canon_edges(pairs):
    return sorted({(min(a, b), max(a, b)) for a, b in pairs})


@_SETTINGS
@given(pairs=_edge_sets)
def test_triangle_counts_match_bruteforce(spark, pairs):
    """Degree-oriented distributed counts == O(n³) brute force on
    random graphs — orientation/tie-break independence."""
    import itertools

    edges = _canon_edges(pairs)
    adj = set(edges)
    nodes = sorted({v for e in edges for v in e})
    expect = {}
    for a, b, c in itertools.combinations(nodes, 3):
        if (
            (a, b) in adj and (b, c) in adj and (a, c) in adj
        ):
            for v in (a, b, c):
                expect[v] = expect.get(v, 0) + 1
    got = {
        r.node: r.n_triangles
        for r in M.triangles_per_node(_edges(spark, edges)).collect()
    }
    assert got == expect, (edges, got, expect)


@_SETTINGS
@given(pairs=_edge_sets)
def test_pagerank_matches_integer_simulation(spark, pairs):
    """Distributed fixed-point PageRank == a pure-Python integer
    simulation of the same recurrence, on random graphs."""
    edges = _canon_edges(pairs)
    deg: dict[int, int] = {}
    nbrs: dict[int, list[int]] = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
        nbrs.setdefault(a, []).append(b)
        nbrs.setdefault(b, []).append(a)
    s = {v: M.PR_SCALE for v in deg}
    for _ in range(M.PR_ITERS):
        share = {v: s[v] // deg[v] for v in s}
        s = {
            v: 150_000 + (85 * sum(share[u] for u in nbrs[v])) // 100
            for v in s
        }
    got = {
        r.node: (r.score_ppm, r.degree)
        for r in M.pagerank_scores(_edges(spark, edges)).collect()
    }
    assert got == {v: (s[v], deg[v]) for v in s}, edges


_frames_strategy = st.lists(
    st.tuples(
        st.integers(0, 255),  # fill color index
        st.booleans(),  # interlaced?
    ),
    min_size=1,
    max_size=4,
)


@_SETTINGS
@given(
    w=st.integers(1, 9),
    h=st.integers(1, 9),
    frames=_frames_strategy,
    seed=st.integers(0, 2**31),
)
def test_gif_roundtrip_random_frames(w, h, frames, seed):
    """decode(encode(x)) == x for random full-frame animations under
    the REAL LZW encoder, any geometry, mixed interlacing."""
    import random

    from bigdata_riveranalysis_spark.operators import multimodal as MM

    rng = random.Random(seed)
    pal = _pal256()
    spec = []
    planes = []
    for fill, inter in frames:
        idx = bytes(
            (fill + rng.randrange(4)) % 256 for _ in range(w * h)
        )
        if inter:
            # rows in GIF 4-pass order
            order = (
                list(range(0, h, 8))
                + list(range(4, h, 8))
                + list(range(2, h, 4))
                + list(range(1, h, 2))
            )
            enc_idx = b"".join(
                idx[y * w : (y + 1) * w] for y in order
            )
        else:
            enc_idx = idx
        spec.append((0, 0, w, h, enc_idx, None, inter))
        planes.append(idx)
    gif = _gif_encode(w, h, spec, pal, min_code=8, encoder=_gif_lzw_real)
    got = MM._gif_frames(gif)
    assert got is not None and len(got) == len(planes)
    for (gw, gh, rgb), idx in zip(got, planes):
        assert (gw, gh) == (w, h)
        assert rgb == _rgb(pal, idx)


@_SETTINGS
@given(blob=st.binary(min_size=0, max_size=400), seed=st.integers(0, 2**31))
def test_gif_decoder_never_crashes_on_garbage(blob, seed):
    """decode-or-None discipline under fuzz: arbitrary bytes — raw,
    magic-prefixed, or a valid GIF with a corrupted tail — must
    return None or valid frames, never raise or hang (the decoder
    runs inside executors on untrusted payloads)."""
    import random

    from bigdata_riveranalysis_spark.operators import multimodal as MM

    for payload in (
        blob,
        b"GIF89a" + blob,
        b"GIF87a" + blob,
    ):
        out = MM._gif_frames(payload)
        assert out is None or all(
            len(rgb) == 3 * w * h for w, h, rgb in out
        )
    # corrupted valid GIF: flip a few bytes
    pal = _pal256()
    good = _gif_encode(4, 3, [(0, 0, 4, 3, bytes(12), None, False)], pal)
    rng = random.Random(seed)
    bad = bytearray(good)
    for _ in range(3):
        bad[rng.randrange(len(bad))] ^= rng.randrange(1, 256)
    out = MM._gif_frames(bytes(bad))
    assert out is None or all(len(rgb) == 3 * w * h for w, h, rgb in out)


def test_two_level_prefix_sums_survive_long_overflow(spark):
    """ADVICE r6 #1 pin: sum_cols accumulate on DECIMAL(38,0), so a
    cumulative sum that overflows a LONG partway through the order
    (terms of 2^62: the long cliff hits at row 2) stays exact to the
    last row — the same HUGEINT-equivalent headroom exact.wide_sum
    gives plain aggregates."""
    from decimal import Decimal

    from bigdata_riveranalysis_spark.plans import scale as SC

    n, term = 40, 1 << 62
    df = spark.createDataFrame(
        [(i, term) for i in range(n)], "k long, v long"
    )
    out = SC.two_level_prefix(df, [F.asc("k")], sum_cols=("v",)).orderBy("k")
    rows = out.select("k", "_cum_v", "_tot_v").collect()
    for r in rows:
        assert r._cum_v == Decimal((r.k + 1) * term), r
        assert r._tot_v == Decimal(n * term)
