"""Property-based tests (hypothesis) for the pure kernels whose
correctness the oracle checks rely on: the z-order bit interleave (the
DuckDB oracle SQL and a reference implementation must agree for ALL
inputs, not just the fixture's key range), the EWMA recurrence (the
vectorized pandas path must equal the literal recurrence the DuckDB
recursive CTE steps), and the two real codecs (round-trip identity on
arbitrary payloads)."""

from __future__ import annotations

import duckdb
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from talkdesk_async_etl_spark.operators.ingest import _Z_BITS, _Z_MASK, _z_terms_sql


def _interleave_ref(x: int, y: int) -> int:
    z = 0
    for b in range(_Z_BITS):
        z |= ((x >> b) & 1) << (2 * b)
        z |= ((y >> b) & 1) << (2 * b + 1)
    return z


@settings(max_examples=200, deadline=None)
@given(st.integers(0, 2**40), st.integers(0, 2**40))
def test_zorder_sql_matches_reference(x, y):
    """The oracle's generated SQL interleave == the bit-twiddling
    reference, for keys far beyond the fixture's range (masking
    included)."""
    con = duckdb.connect()
    sql = _z_terms_sql(f"{x} & {_Z_MASK}", f"{y} & {_Z_MASK}")
    got = con.execute(f"SELECT {sql}").fetchone()[0]
    assert got == _interleave_ref(x & _Z_MASK, y & _Z_MASK)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.floats(-1e6, 1e6, allow_nan=False, width=64),
            st.just(1.5),  # force constant runs to hit pandas' guard
        ),
        min_size=1,
        max_size=50,
    )
)
def test_pandas_ewm_equals_normalized_recurrence(values):
    """pandas ewm(adjust=False) — the vectorized path inside
    udaf_ewma_timeseries — must equal the NORMALIZED recurrence
    y = (ow·prev + nw·x)/(ow + nw), ow = 1−α, BIT-FOR-BIT in float64,
    WITH pandas' constant-run guard: when prev == cur the kernel skips
    the update outright ("avoid numerical errors on constant series" —
    found by this very test on [1.5, 1.5]). This guarded normalized
    form is exactly what the DuckDB oracle steps (repr-exact
    literals); the textbook y = αx + (1−α)y differs by ~1 ulp, which a
    6-dp round would usually — but not provably always — hide."""
    import pandas as pd

    alpha = 0.3
    ow = 1 - alpha
    got = pd.Series(values, dtype="float64").ewm(alpha=alpha, adjust=False).mean()
    y = values[0]
    expect = [y]
    for x in values[1:]:
        if y != x:
            y = (ow * y + alpha * x) / (ow + alpha)
        expect.append(y)
    assert np.array_equal(got.to_numpy(), np.array(expect)), (
        "vectorized ewm diverged from the guarded normalized recurrence"
    )


@settings(max_examples=100, deadline=None)
@given(st.integers(1, 2000), st.integers(0, 2**32 - 1))
def test_wav_roundtrip_arbitrary_pcm(n, seed):
    """encode_wav → decode_wav_real is the identity on arbitrary int16
    PCM, any length."""
    from talkdesk_async_etl_spark.operators.multimodal import (
        decode_wav_real,
        encode_wav,
    )

    rng = np.random.default_rng(seed)
    pcm = rng.integers(-32768, 32768, size=n, dtype=np.int16)
    out, rate = decode_wav_real(encode_wav(pcm, sample_rate=44100))
    assert rate == 44100
    assert np.array_equal(out, pcm)


@settings(max_examples=100, deadline=None)
@given(st.integers(1, 40), st.integers(1, 40), st.integers(0, 2**32 - 1))
def test_ppm_roundtrip_arbitrary_raster(w, h, seed):
    """encode_ppm → decode_ppm_real is the identity on arbitrary RGB
    rasters, any dimensions."""
    from talkdesk_async_etl_spark.operators.multimodal import (
        decode_ppm_real,
        encode_ppm,
    )

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_ppm_real(encode_ppm(px)), px)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=40))
def test_duck_hex15_matches_python_md5(s):
    """The engine-agreeing 60-bit hash (dedup's _duck_hex15 SQL fold)
    == int(md5(utf8)[:15], 16) for ARBITRARY text — the leaf under the
    simhash/winnow/importance-sampling oracles. (The Spark side is
    conv(substring(md5,1,15),16,10), pinned value-identical by those
    queries' hash-checked oracles at three SFs.)"""
    import hashlib

    from talkdesk_async_etl_spark.operators.dedup import _duck_hex15

    con = duckdb.connect()
    got = con.execute(
        f"SELECT {_duck_hex15('mh')} FROM (SELECT md5(?) AS mh)", [s]
    ).fetchone()[0]
    assert got == int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


@settings(max_examples=200, deadline=None)
@given(st.integers(0, 2**60 - 1), st.integers(0, 2**60 - 1))
def test_winnow_bitfold_duck_matches_python(a, b):
    """The winnow oracle's gram combine xor((a % 2^53)*128, b) must be
    exact BIGINT arithmetic in DuckDB for the full 60-bit input domain
    (no implicit widening/overflow surprises)."""
    P = 1 << 53
    con = duckdb.connect()
    got = con.execute(
        f"SELECT xor(((?::BIGINT % {P}) * 128), ?::BIGINT)", [a, b]
    ).fetchone()[0]
    assert got == (((a % P) * 128) ^ b)


@settings(max_examples=120, deadline=None)
@given(
    st.integers(2, 60),
    st.integers(2, 40),
    st.integers(0, 2**32),
)
def test_rle8_roundtrip_arbitrary_raster(w, h, seed):
    """BI_RLE8 round-trip identity on arbitrary rasters — random
    (absolute-mode-heavy), banded (encoded-run-heavy), and mixed
    textures all decode bit-exactly, including odd widths that
    exercise the absolute-mode word-alignment pad."""
    from talkdesk_async_etl_spark.operators.multimodal import (
        decode_bmp_rle,
        encode_bmp_rle,
    )

    rng = np.random.RandomState(seed % 2**31)
    noisy = rng.randint(0, 256, size=(h, w), dtype=np.uint8)
    assert np.array_equal(decode_bmp_rle(encode_bmp_rle(noisy)), noisy)

    banded = np.repeat(
        rng.randint(0, 256, size=(h, 1), dtype=np.uint8), w, axis=1
    )
    assert np.array_equal(decode_bmp_rle(encode_bmp_rle(banded)), banded)

    mixed = noisy.copy()
    mixed[:: 2] = banded[:: 2]
    assert np.array_equal(decode_bmp_rle(encode_bmp_rle(mixed)), mixed)


@settings(max_examples=120, deadline=None)
@given(st.binary(min_size=0, max_size=4000))
def test_lzw_roundtrip_arbitrary_bytes(payload):
    """GIF variable-width LZW round-trip identity on arbitrary byte
    strings (table-overflow resets included once payloads get long
    and diverse)."""
    from talkdesk_async_etl_spark.operators.multimodal import (
        _lzw_decode,
        _lzw_encode,
    )

    assert _lzw_decode(_lzw_encode(payload)) == payload


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.integers(-10**6, 10**6), min_size=1, max_size=60),
)
def test_cusum_window_identity_property(devs):
    """S_i − min(0, min_{j≤i} S_j) == the max(0, c+dev) recurrence for
    ARBITRARY deviation series — the identity events_cusum_drift's
    window formulation rests on."""
    c = 0
    s = 0
    run_min = 0
    for d in devs:
        c = max(0, c + d)
        s += d
        run_min = min(run_min, s)
        assert c == s - min(0, run_min)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.integers(0, 10**9), min_size=2, max_size=30),
)
def test_gini_decimal_path_matches_python(masses):
    """The DECIMAL(38,0) floor-division spelling must equal exact
    Python integer arithmetic for arbitrary masses, including ones
    whose 1e6-scaled numerator exceeds int64."""
    xs = sorted(masses)
    n, tot = len(xs), sum(xs)
    if tot == 0:
        return  # zero-mass group is out of the operator's domain
    num = sum((2 * (i + 1) - n - 1) * x for i, x in enumerate(xs))
    want = num * 1_000_000 // (n * tot)

    con = duckdb.connect()
    got = con.execute(
        f"SELECT CAST(({num}::HUGEINT * 1000000) // ({n}::HUGEINT * {tot}::HUGEINT) AS BIGINT)"
    ).fetchone()[0]
    assert got == want


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(0, 500), min_size=1, max_size=60),
    st.lists(st.integers(0, 500), min_size=1, max_size=60),
)
def test_ks_grid_formula_matches_brute_force(xs, ys):
    """The KS value-grid formulation (cross-multiplied cumulative
    counts, micro floor) must equal the brute-force max over all
    thresholds of |ecdf_a - ecdf_b| for ARBITRARY integer samples —
    including ties, disjoint ranges, and singletons."""
    import math

    na, nb = len(xs), len(ys)
    grid = sorted(set(xs) | set(ys))
    best = 0
    for v in grid:
        ca = sum(1 for x in xs if x <= v)
        cb = sum(1 for y in ys if y <= v)
        best = max(best, abs(ca * nb - cb * na) * 1_000_000 // (na * nb))
    # replay the operator's formulation: cumulative over the global
    # value grid with zero-filled per-sample counts
    ca = cb = 0
    got = 0
    from collections import Counter

    fa, fb = Counter(xs), Counter(ys)
    for v in grid:
        ca += fa.get(v, 0)
        cb += fb.get(v, 0)
        got = max(got, abs(ca * nb - cb * na) * 1_000_000 // (na * nb))
    assert got == best
    assert 0 <= got <= 1_000_000
    assert math.gcd(na, nb) >= 1  # hypothesis shrinks keep both non-empty


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 50), st.sampled_from(["en", "de"])),
                min_size=2, max_size=80))
def test_mwu_tworank_identity(pairs):
    """The 2x-midrank walk (2*cum_before + t + 1 per tied value) must
    reproduce the classical midrank rank-sum: R1 = sum of average
    ranks of group 1, hence U = R1 - n1(n1+1)/2, for arbitrary tied
    samples."""
    if not any(g == "en" for _, g in pairs) or not any(g == "de" for _, g in pairs):
        return
    vals = sorted(pairs)
    # classical midranks
    ranks = {}
    i = 0
    svals = sorted(v for v, _ in pairs)
    while i < len(svals):
        j = i
        while j < len(svals) and svals[j] == svals[i]:
            j += 1
        mid = (i + 1 + j) / 2  # average of ranks i+1..j
        ranks[svals[i]] = mid
        i = j
    r1 = sum(ranks[v] for v, g in pairs if g == "en")
    n1 = sum(1 for _, g in pairs if g == "en")
    u_classic_x2 = int(2 * r1) - n1 * (n1 + 1)

    # operator walk on the value grain
    from collections import Counter

    cen = Counter(v for v, g in pairs if g == "en")
    call = Counter(v for v, _ in pairs)
    cum = 0
    r1x2 = 0
    for v in sorted(call):
        t = call[v]
        r1x2 += cen.get(v, 0) * (2 * cum + t + 1)
        cum += t
    assert r1x2 - n1 * (n1 + 1) == u_classic_x2


@settings(max_examples=100, deadline=None)
@given(st.integers(0, 2**60 - 1), st.integers(0, 15))
def test_bootstrap_weight_thresholds_partition_micro_space(u, r):
    """The frozen Poisson(1) thresholds are strictly increasing, below
    1e6, and the CASE walk assigns every micro draw exactly one weight
    whose cumulative probability brackets the draw."""
    from talkdesk_async_etl_spark.operators.sampling import _BOOT_THRESH

    assert list(_BOOT_THRESH) == sorted(set(_BOOT_THRESH))
    assert _BOOT_THRESH[-1] < 1_000_000
    um = u % 1_000_000
    w = next((k for k, t in enumerate(_BOOT_THRESH) if um < t), 5)
    if w < 5:
        assert um < _BOOT_THRESH[w]
        assert w == 0 or um >= _BOOT_THRESH[w - 1]
    else:
        assert um >= _BOOT_THRESH[-1]


@settings(max_examples=150, deadline=None)
@given(st.lists(st.integers(1, 10**6), min_size=1, max_size=50))
def test_simpson_yule_spectrum_bounds(freqs):
    """Simpson's D and Yule's K over an arbitrary frequency spectrum:
    D in [0, 1e6]; D = 1e6 iff one type; K = 0 iff all singletons —
    the exact-integer formulations can't leave their ranges."""
    n = sum(freqs)
    rep2 = sum(f * (f - 1) for f in freqs)
    f2 = sum(f * f for f in freqs)
    d = 0 if n < 2 else rep2 * 1_000_000 // (n * (n - 1))
    k = 0 if n == 0 else (f2 - n) * 10_000 * 1_000_000 // (n * n)
    assert 0 <= d <= 1_000_000
    assert (d == 1_000_000) == (len(freqs) == 1 and n >= 2)
    # k == 0 iff the spectrum is all singletons (f2 == n): any repeat
    # makes (f2-n)*1e10 >= 1e10 > n^2 for every reachable n here.
    assert (k == 0) == (f2 == n)


# --- Round-14 kernels ----------------------------------------------------


def _ntile_naive(n: int, k: int) -> list[int]:
    """Reference ntile: deal rows into k buckets, earlier buckets absorb
    the remainder — one row at a time, no arithmetic shortcuts."""
    base, rem = divmod(n, k)
    out, bucket = [], 1
    cnt = 0
    for _ in range(n):
        cap = base + (1 if bucket <= rem else 0)
        cnt += 1
        out.append(bucket)
        if cnt == cap:
            bucket, cnt = bucket + 1, 0
    return out


@settings(max_examples=300, deadline=None)
@given(st.integers(1, 500), st.integers(1, 40))
def test_two_pass_ntile_closed_form_matches_naive_deal(n, k):
    """two_pass_ntile's closed-form remainder formula (the SQL CASE in
    operators/stats.py) must reproduce the row-at-a-time deal for every
    (n, k) — including n < k (row-per-bucket) and the exact absorb
    boundaries."""
    base, rem = divmod(n, k)
    cut = rem * (base + 1)
    want = _ntile_naive(n, k)
    for r in range(1, n + 1):
        if r <= cut:
            got = (r - 1) // (base + 1) + 1
        else:
            got = rem + (r - cut - 1) // base + 1
        assert got == want[r - 1], (n, k, r)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 8)),
        min_size=2,
        max_size=60,
    )
)
def test_spearman_integer_comoments_match_float_ranks(pairs):
    """The 2x-scaled integer midrank co-moment rho (agg_spearman_corr's
    formulation) must equal the classical float Spearman (Pearson over
    midranks) on arbitrary tied samples — scale factors cancel
    exactly."""
    import math

    xs = [p[0] for p in pairs]
    ys = [p[1] for p in pairs]

    def ranks2x(vals):
        # 2*midrank as the operator computes it: 2*(cum_before) + ties + 1
        out = []
        for v in vals:
            below = sum(1 for u in vals if u < v)
            ties = sum(1 for u in vals if u == v)
            out.append(2 * below + ties + 1)
        return out

    rx, ry = ranks2x(xs), ranks2x(ys)
    n = len(pairs)
    sx, sy = sum(rx), sum(ry)
    sxx = sum(a * a for a in rx)
    syy = sum(b * b for b in ry)
    sxy = sum(a * b for a, b in zip(rx, ry))
    d1 = n * sxx - sx * sx
    d2 = n * syy - sy * sy
    if d1 == 0 or d2 == 0:
        return  # the operator's zero-variance guard branch
    got = (n * sxy - sx * sy) / math.sqrt(d1 * d2)

    def midranks(vals):
        return [r / 2 for r in ranks2x(vals)]

    fx, fy = midranks(xs), midranks(ys)
    mx, my = sum(fx) / n, sum(fy) / n
    num = sum((a - mx) * (b - my) for a, b in zip(fx, fy))
    den = math.sqrt(
        sum((a - mx) ** 2 for a in fx) * sum((b - my) ** 2 for b in fy)
    )
    assert abs(got - num / den) < 1e-9


@settings(max_examples=200, deadline=None)
@given(st.lists(st.sampled_from([1, -1]), min_size=2, max_size=100))
def test_runs_count_equals_segment_count_and_z_antisymmetry(signs):
    """1 + #sign-changes (the lag walk agg_runs_test sums) must equal
    the number of maximal constant segments; and the z statistic is
    invariant under a global sign flip (n1 and n2 swap symmetrically
    in every term)."""
    import math

    runs = 1 + sum(1 for a, b in zip(signs, signs[1:]) if a != b)
    segs = 1
    for a, b in zip(signs, signs[1:]):
        if a != b:
            segs += 1
    assert runs == segs
    n1 = sum(1 for s in signs if s == 1)
    n2 = len(signs) - n1
    # the operator's full guard: one-sided OR zero-variance
    # (2·n1·n2 == n1+n2, i.e. n1 = n2 = 1 — this very test found the
    # unguarded division)
    if n1 == 0 or n2 == 0 or n1 + n2 == 1 or 2 * n1 * n2 == n1 + n2:
        return

    def z(a, b, r):
        mu = 2 * a * b / (a + b) + 1
        var = 2 * a * b * (2 * a * b - a - b) / ((a + b) ** 2 * (a + b - 1))
        return (r - mu) / math.sqrt(var)

    assert abs(z(n1, n2, runs) - z(n2, n1, runs)) < 1e-12


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 5), st.integers(1, 9)),
        min_size=1,
        max_size=40,
    ),
    st.integers(1, 5),
)
def test_quantized_l1_walk_mass_bounds(edges, iters):
    """The quantized integer power-iteration step shared by
    graph_hits_scores and events_markov_stationary: after each
    truncating renormalization, total L1 mass is <= 1e6 and the floor
    losses are bounded by the number of occupied states — the
    deterministic-quantization contract both oracles replay."""
    M = 1_000_000
    nodes = sorted({e[0] for e in edges} | {e[1] for e in edges})
    rowsum = {}
    for s, d, w in edges:
        rowsum[s] = rowsum.get(s, 0) + w
    pi = {v: M for v in nodes}
    for _ in range(iters):
        raw = {}
        for s, d, w in edges:
            raw[d] = raw.get(d, 0) + pi[s] * w // rowsum[s]
        tot = sum(raw.values())
        pi = {v: (raw.get(v, 0) * M // tot if tot else 0) for v in nodes}
        if tot == 0:
            assert all(x == 0 for x in pi.values())
            continue
        occupied = sum(1 for x in pi.values() if x > 0)
        assert sum(pi.values()) <= M
        assert sum(pi.values()) >= M - occupied


@settings(max_examples=200, deadline=None)
@given(st.integers(0, 100), st.integers(0, 100), st.integers(0, 100))
def test_jaccard_micro_bounds_and_symmetry(common, only_a, only_b):
    """text_source_vocab_overlap's inclusion-exclusion micro Jaccard:
    bounded by [0, 1e6], symmetric in (a, b), equal to 1e6 exactly iff
    the vocabularies coincide (non-empty)."""
    na, nb = common + only_a, common + only_b
    union = na + nb - common
    if union == 0:
        return
    j = common * 1_000_000 // union
    j_sym = common * 1_000_000 // (nb + na - common)
    assert 0 <= j <= 1_000_000
    assert j == j_sym
    assert (j == 1_000_000) == (only_a == 0 and only_b == 0 and common > 0)


# --- round-15 kernels: pure-Python replicas of the eval math ---------


def _pr_points(scored, thresholds):
    pos = sum(y for _, y in scored)
    pts = []
    for thr in thresholds:
        tp = sum(1 for p, y in scored if p >= thr and y == 1)
        fp = sum(1 for p, y in scored if p >= thr and y == 0)
        prec = 1_000_000 if tp + fp == 0 else tp * 1_000_000 // (tp + fp)
        rec = 0 if pos == 0 else tp * 1_000_000 // pos
        pts.append((rec, prec))
    return pts


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 1_000_000), st.integers(0, 1)),
        min_size=1,
        max_size=60,
    )
)
def test_pr_trapezoid_bounds_and_monotonicity(scored):
    """ml_eval_pr_curve's quantized trapezoid for ARBITRARY score
    sets: recall is non-increasing along the threshold grid (so every
    trapezoid term is nonnegative — the truncation ≡ floor
    precondition), and the AUC stays inside [0, 1e6]."""
    from talkdesk_async_etl_spark.operators.mining import _PR_THRESHOLDS

    pts = _pr_points(scored, _PR_THRESHOLDS)
    recalls = [r for r, _ in pts]
    assert all(a >= b for a, b in zip(recalls, recalls[1:]))
    s = sum(
        (pts[i][0] - pts[i + 1][0]) * (pts[i][1] + pts[i + 1][1])
        for i in range(len(pts) - 1)
    )
    assert s >= 0
    auc = s // 2_000_000
    assert 0 <= auc <= 1_000_000


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 1_000_000), st.integers(0, 1)),
        min_size=2,
        max_size=60,
    )
)
def test_roc_histogram_identity_equals_pair_loop(scored):
    """ml_eval_roc_auc's histogram identity — Σ_b (2·pos_b·neg_below
    + pos_b·neg_b) — must equal the brute-force pair loop (2·wins +
    ties) for ARBITRARY score multisets, and label inversion
    reflects AUC around 1/2 when both classes are present."""
    pos = [p for p, y in scored if y == 1]
    neg = [p for p, y in scored if y == 0]
    hist: dict[int, list[int]] = {}
    for p, y in scored:
        c = hist.setdefault(p, [0, 0])
        c[y] += 1
    num2_hist = 0
    cum_neg = 0
    for p in sorted(hist):
        nb, pb = hist[p][0], hist[p][1]
        num2_hist += 2 * pb * cum_neg + pb * nb
        cum_neg += nb
    num2_loop = sum(
        2 if pp > pn else (1 if pp == pn else 0) for pp in pos for pn in neg
    )
    assert num2_hist == num2_loop
    if pos and neg:
        auc = num2_loop * 1_000_000 // (2 * len(pos) * len(neg))
        inv = sum(
            2 if pn > pp else (1 if pp == pn else 0) for pp in pos for pn in neg
        )
        assert num2_loop + inv == 2 * len(pos) * len(neg)
        assert 0 <= auc <= 1_000_000


@settings(max_examples=200, deadline=None)
@given(
    st.dictionaries(
        st.integers(0, 400), st.integers(0, 10_000), min_size=1, max_size=40
    )
)
def test_ols_closed_form_equals_residual_minimum(days):
    """events_ols_trend's integer closed form: the exact rational
    slope sxy_c/sxx_c must minimize the sum of squared residuals —
    perturbing the slope by ±1 nano never improves the fit — and the
    published slope_nano is the truncation-toward-zero of that
    rational (both engines' division)."""
    from fractions import Fraction

    n = len(days)
    sx = sum(days)
    sy = sum(days.values())
    sxx = sum(x * x for x in days)
    sxy = sum(x * y for x, y in days.items())
    sxx_c = n * sxx - sx * sx
    sxy_c = n * sxy - sx * sy
    if sxx_c == 0:
        return
    slope = Fraction(sxy_c, sxx_c)

    def rss(b):
        a = (Fraction(sy) - b * sx) / n
        return sum((Fraction(y) - (a + b * x)) ** 2 for x, y in days.items())

    eps = Fraction(1, 1_000_000_000)
    best = rss(slope)
    assert best <= rss(slope + eps) and best <= rss(slope - eps)
    published = abs(sxy_c) * 1_000_000_000 // sxx_c * (1 if sxy_c >= 0 else -1)
    assert published == int(slope * 1_000_000_000)  # int() truncates to zero


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.booleans(),  # has view first
            st.booleans(),  # click after view
            st.booleans(),  # purchase after click
        ),
        min_size=1,
        max_size=50,
    )
)
def test_funnel_stage_counts_are_monotone(users):
    """events_funnel_steps' stage flags: n1 >= n2 >= n3 for every
    population (reaching step k implies reaching step k-1 under the
    chained first-touch contract), and conversion ratios stay in
    [0, 1e6]."""
    n1 = sum(1 for v, _, _ in users if v)
    n2 = sum(1 for v, c, _ in users if v and c)
    n3 = sum(1 for v, c, p in users if v and c and p)
    assert n1 >= n2 >= n3
    for num, den in ((n2, n1), (n3, n2), (n3, n1)):
        rate = 0 if den == 0 else num * 1_000_000 // den
        assert 0 <= rate <= 1_000_000
