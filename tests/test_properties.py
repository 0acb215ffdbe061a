"""Property-based tests (SURVEY §5): converter invariants hold for
arbitrary inputs, not just fixtures. Example counts are kept small —
every example runs Spark jobs."""

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    vals=st.lists(
        st.one_of(st.none(), st.text(min_size=0, max_size=8)),
        min_size=1,
        max_size=30,
    )
)
@settings(**_SETTINGS)
def test_dict_encode_is_bijection_with_null_zero(spark, vals):
    from deep_db_learning_spark.functions.encode import dict_encode

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "i long, v string"
    )
    rows = dict_encode(df, "v", out="v_code").collect()
    by_val = {}
    for r in rows:
        code = r["v_code"]
        v = r["v"]
        # NULL is always code 0 (reference's None-first ordering, F12/O4)
        if v is None:
            assert code == 0
        else:
            assert code >= 1
        # same value -> same code, different values -> different codes
        if v in by_val:
            assert by_val[v] == code
        by_val[v] = code
    non_null = {v for v in vals if v is not None}
    assert len({c for v, c in by_val.items() if v is not None}) == len(non_null)
    # codes are dense 1..card
    if non_null:
        assert sorted(c for v, c in by_val.items() if v is not None) == list(
            range(1, len(non_null) + 1)
        )


@given(
    dates=st.lists(
        st.dates(min_value=dt.date(1, 1, 1), max_value=dt.date(9999, 12, 28)),
        min_size=1,
        max_size=20,
    )
)
@settings(**_SETTINGS)
def test_date_decomposition_roundtrips(spark, dates):
    """(year, dayofyear) losslessly reconstructs the date (F3)."""
    df = spark.createDataFrame([Row(i=i, d=d) for i, d in enumerate(dates)])
    dec = df.select(
        "i", "d", F.year("d").alias("y"), F.dayofyear("d").alias("doy")
    )
    back = dec.withColumn(
        "d2",
        F.date_add(
            F.make_date(F.col("y"), F.lit(1), F.lit(1)), F.col("doy") - F.lit(1)
        ),
    )
    assert back.filter(F.col("d2") != F.col("d")).count() == 0


@given(
    t=st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FFF),
        min_size=0,
        max_size=60,
    ),
    k=st.integers(min_value=2, max_value=9),
)
@settings(max_examples=200, deadline=None)
def test_rolling_shingle_hash_matches_naive(t, k):
    """The vectorized Horner kernel equals a naive per-gram fold for
    arbitrary unicode text — no Spark needed (the expression twin is
    pinned separately in tests/test_dedup.py)."""
    from deep_db_learning_spark.operators.dedup import (
        SHINGLE_B,
        SHINGLE_P,
        _rolling_shingle_hashes,
    )

    def naive_hash(g):
        acc = 0
        for ch in g:
            acc = (acc * SHINGLE_B + ord(ch)) % SHINGLE_P
        return acc

    grams = [t] if len(t) < k else [t[i : i + k] for i in range(len(t) - k + 1)]
    want = sorted({naive_hash(g) for g in grams})
    got = _rolling_shingle_hashes(t, k).tolist()
    assert got == want


@given(
    h=st.integers(min_value=1, max_value=12),
    w=st.integers(min_value=1, max_value=12),
    seed=st.integers(min_value=0, max_value=10_000),
)
@settings(max_examples=50, deadline=None)
def test_bmp_roundtrip_any_shape(h, w, seed):
    """BMP encode/decode is lossless for every (h, w) — including the
    widths whose rows need 4-byte padding."""
    import numpy as np

    from deep_db_learning_spark.operators.multimodal import (
        decode_bmp_bytes,
        encode_bmp_bytes,
    )

    img = np.random.default_rng(seed).integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert (decode_bmp_bytes(encode_bmp_bytes(img)) == img).all()


@given(
    h=st.integers(min_value=1, max_value=10),
    w=st.integers(min_value=1, max_value=10),
    channels=st.sampled_from([1, 2, 3, 4]),
    filter_type=st.integers(min_value=0, max_value=4),
    seed=st.integers(min_value=0, max_value=10_000),
)
@settings(max_examples=60, deadline=None)
def test_png_roundtrip_all_filters(h, w, channels, filter_type, seed):
    """PNG encode/decode is lossless for gray / gray+alpha / RGB /
    RGBA at every row-filter type — each filter_type exercises the
    matching decoder unfilter branch (none/sub/up/average/paeth)."""
    import numpy as np

    from deep_db_learning_spark.operators.multimodal import (
        decode_png_bytes,
        encode_png_bytes,
    )

    shape = (h, w) if channels == 1 else (h, w, channels)
    img = np.random.default_rng(seed).integers(0, 256, size=shape, dtype=np.uint8)
    out = decode_png_bytes(encode_png_bytes(img, filter_type=filter_type))
    assert out.shape == shape
    assert (out == img).all()


def test_png_palette_decode():
    """Color type 3: indices resolve through PLTE to RGB."""
    import struct
    import zlib

    import numpy as np

    from deep_db_learning_spark.operators.multimodal import decode_png_bytes

    palette = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 7, 8, 9])
    idx = np.array([[0, 1], [2, 3]], dtype=np.uint8)
    body = b"".join(b"\x00" + row.tobytes() for row in idx)

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", palette)
        + chunk(b"IDAT", zlib.compress(body))
        + chunk(b"IEND", b"")
    )
    out = decode_png_bytes(png)
    assert out.shape == (2, 2, 3)
    assert out.tolist() == [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [7, 8, 9]]]


@given(
    sw=st.sampled_from([1, 2, 4]),
    ch=st.integers(min_value=1, max_value=2),
    n=st.integers(min_value=1, max_value=64),
    seed=st.integers(min_value=0, max_value=10_000),
)
@settings(max_examples=50, deadline=None)
def test_wav_decode_all_sample_widths(sw, ch, n, seed):
    """PCM WAV decode handles 8/16/32-bit and multi-channel downmix;
    values land in [-1, 1] and mono length equals the frame count."""
    import io
    import wave

    import numpy as np

    from deep_db_learning_spark.operators.multimodal import decode_wav_bytes

    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 2 ** (8 * sw), size=n * ch, dtype=np.uint64)
    dtype = {1: "u1", 2: "<i2", 4: "<i4"}[sw]
    if sw > 1:
        frames = (frames - 2 ** (8 * sw - 1)).astype(dtype)
    else:
        frames = frames.astype(dtype)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(ch)
        wv.setsampwidth(sw)
        wv.setframerate(8000)
        wv.writeframes(frames.tobytes())
    sr, x = decode_wav_bytes(buf.getvalue())
    assert sr == 8000 and len(x) == n
    assert np.abs(x).max() <= 1.0


@given(
    texts=st.lists(
        st.one_of(
            st.none(),
            st.text(
                alphabet=st.characters(blacklist_categories=("Cs",)),
                min_size=0,
                max_size=40,
            ),
        ),
        min_size=1,
        max_size=12,
    )
)
@settings(**_SETTINGS)
def test_simhash_kernel_matches_expr_any_text(spark, texts):
    # the Arrow numpy kernel and the Spark HOF twin agree on arbitrary
    # unicode (astral chars included), any whitespace shape, empty
    # strings, and NULLs
    from deep_db_learning_spark.operators import dedup

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    kern = {r["doc_id"]: r["simhash"] for r in dedup.simhash(df, "text").collect()}
    expr = {r["doc_id"]: r["simhash"] for r in dedup.simhash_expr(df, "text").collect()}
    assert kern == expr


@given(
    keys=st.lists(
        st.tuples(st.integers(0, 50), st.integers(0, 6)),
        min_size=1,
        max_size=40,
    ),
    seed=st.integers(0, 2**16),
)
@settings(**_SETTINGS)
def test_packed_node_ids_unique_for_any_composite_key(spark, keys, seed):
    # duplicate composite keys allowed (the driver data ships them):
    # packed ids must stay unique per ROW and the plan must never
    # contain a single-partition exchange
    from deep_db_learning_spark.operators.graph import mint_node_ids

    rows = [(a, b, float((a * 31 + b + seed) % 97)) for a, b in keys]
    df = spark.createDataFrame(rows, "k1 long, k2 int, payload double")
    nodes, kind = mint_node_ids(df, ["k1", "k2"], "pk")
    assert kind == "packed"
    ids = [r["node_id"] for r in nodes.collect()]
    assert len(ids) == len(set(ids)) == len(keys)
    plan = nodes._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


@given(
    events=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 10_000), st.integers(0, 4)),
        min_size=1,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_sessionize_invariant_to_partitioning_with_ties(spark, events):
    # rows may share (user_id, ts) — the tie-broken windows must give
    # identical session stats under different partitionings
    import datetime as dt

    from deep_db_learning_spark.streaming.events import session_stats

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, u, base + dt.timedelta(seconds=s * 37), float(v))
        for i, (u, s, v) in enumerate(events)
    ]
    schema = "event_id long, user_id long, ts timestamp_ntz, value double"
    a = spark.createDataFrame(rows, schema)
    b = spark.createDataFrame(rows, schema).repartition(7, "event_id")
    ka = {tuple(r) for r in session_stats(a, gap_minutes=1).collect()}
    kb = {tuple(r) for r in session_stats(b, gap_minutes=1).collect()}
    assert ka == kb


@given(
    toks=st.lists(st.integers(min_value=1, max_value=500), min_size=1, max_size=60),
    budget=st.integers(min_value=10, max_value=1000),
    chunk=st.integers(min_value=1, max_value=40),
)
@settings(**_SETTINGS)
def test_pack_shards_matches_sequential_packing(spark, toks, budget, chunk):
    """pack_shards equals the naive sequential packer for arbitrary
    token sequences, budgets, and chunk sizes (a row belongs to the
    shard its first token lands in)."""
    from deep_db_learning_spark.operators.mixing import pack_shards

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(toks)], "rid bigint, toks int"
    )
    got = {
        r["rid"]: r["shard_id"]
        for r in pack_shards(df, "toks", budget, "rid", chunk_size=chunk).collect()
    }
    cum = 0
    want = {}
    for i, t in enumerate(toks):
        want[i] = cum // budget
        cum += t
    assert got == want


@given(
    n=st.integers(min_value=1, max_value=60),
    frac=st.floats(min_value=0.0, max_value=1.0),
    seed=st.integers(min_value=0, max_value=10_000),
)
@settings(**_SETTINGS)
def test_stratified_sample_matches_python_hash(spark, n, frac, seed):
    """The kept set is exactly the rows whose portable hash clears the
    stratum's threshold — replicated in plain Python arithmetic."""
    from deep_db_learning_spark.functions.hashing import KNUTH, MERSENNE_31
    from deep_db_learning_spark.operators.mixing import stratified_sample

    df = spark.createDataFrame(
        [(i, "s" if i % 2 else "t") for i in range(n)], "k bigint, stratum string"
    )
    got = sorted(
        r["k"]
        for r in stratified_sample(
            df, "stratum", {"s": frac}, "k", seed=seed
        ).collect()
    )
    want = sorted(
        i
        for i in range(n)
        if i % 2
        and ((i % MERSENNE_31 + seed) * KNUTH) % MERSENNE_31 < frac * MERSENNE_31
    )
    assert got == want


@given(
    t=st.text(
        alphabet=st.characters(
            codec="utf-8", exclude_categories=("Cs",), max_codepoint=0x2FFF
        ),
        max_size=120,
    )
)
@settings(max_examples=60, deadline=None)
def test_redact_pii_idempotent_and_digitfree(t):
    """Redaction is a fixpoint after one pass (placeholders contain no
    redactable material) and leaves no 9+-digit runs behind. Checked in
    RE2 semantics via the DuckDB twin — the engine-parity test in
    test_text.py ties Spark to the same patterns."""
    import duckdb
    import re

    from deep_db_learning_spark.functions.text import redact_pii_sql

    con = duckdb.connect()
    once = con.execute(
        f"SELECT {redact_pii_sql('?::VARCHAR')}", [t]
    ).fetchone()[0]
    twice = con.execute(
        f"SELECT {redact_pii_sql('?::VARCHAR')}", [once]
    ).fetchone()[0]
    assert once == twice
    assert not re.search(r"[0-9]{9,}", once)


@given(
    texts=st.lists(
        st.one_of(st.none(), st.text(max_size=60)), min_size=1, max_size=12
    )
)
@settings(**_SETTINGS)
def test_repetition_fractions_bounded(spark, texts):
    """dup/top token fractions land in [0,1] with top >= 1/n_tokens for
    any input, NULL/empty mapping to 0."""
    from deep_db_learning_spark.functions import text as T

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(texts)], "i long, t string"
    )
    rows = df.select(
        "t",
        T.duplicate_token_fraction(F.col("t")).alias("d"),
        T.top_token_fraction(F.col("t")).alias("p"),
        T.duplicate_line_fraction(F.col("t")).alias("l"),
    ).collect()
    for r in rows:
        for v in (r["d"], r["p"], r["l"]):
            assert 0.0 <= v <= 1.0
        # Spark `trim` strips only ASCII spaces — Python str.strip()
        # also strips \t/\x1f/... and would disagree on the empty case
        if r["t"] is None or r["t"].strip(" ") == "":
            assert r["d"] == 0.0 and r["p"] == 0.0
        else:
            # the most frequent token covers at least its own share
            assert r["p"] > 0.0
            # a fully-duplicated doc: top fraction must also be high
            if r["d"] == 1.0:
                assert False, "dup fraction 1.0 impossible (first token is never a dup)"


@given(
    h=st.integers(min_value=1, max_value=40),
    w=st.integers(min_value=1, max_value=40),
    gray=st.booleans(),
    subsample=st.booleans(),
    restart=st.sampled_from([0, 1, 3]),
    seed=st.integers(min_value=0, max_value=10_000),
)
@settings(max_examples=40, deadline=None)
def test_jpeg_roundtrip_smooth_bounded_error(h, w, gray, subsample, restart, seed):
    """Baseline JPEG encode/decode: on a smooth gradient the round-trip
    error is bounded by quantization (small), at every shape (including
    non-multiples of 8/16), grayscale + 4:4:4 + 4:2:0, with and without
    DRI/RSTn restarts."""
    import numpy as np

    from deep_db_learning_spark.operators.multimodal import (
        decode_jpeg_bytes,
        encode_jpeg_bytes,
    )

    rng = np.random.default_rng(seed)
    # FIXED small per-pixel slopes (not normalized-to-range): a tiny
    # image must not become a 200-units-per-pixel ramp, which 4:2:0
    # chroma averaging legitimately neutralizes
    a0, b0 = rng.uniform(0.5, 2.5), rng.uniform(0.5, 2.5)
    base = np.add.outer(np.arange(h) * a0, np.arange(w) * b0)
    base = np.clip(base + 20, 0, 235).astype(np.uint8)
    if gray:
        img = base
        if subsample:
            return  # encoder rejects gray+subsample; covered below
    else:
        img = np.stack([base, 255 - base, base // 2 + 64], axis=-1).astype(np.uint8)
    jb = encode_jpeg_bytes(img, subsample=(subsample and not gray), restart_interval=restart)
    out = decode_jpeg_bytes(jb)
    assert out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int))
    # quantization (+ 2x2 chroma averaging) on a smooth ramp stays small
    assert err.mean() <= 6.0
    assert err.max() <= 40


def test_jpeg_rejects_unsupported_and_validates():
    import numpy as np
    import pytest

    from deep_db_learning_spark.operators.multimodal import (
        decode_jpeg_bytes,
        encode_jpeg_bytes,
    )

    with pytest.raises(ValueError, match="uint8"):
        encode_jpeg_bytes(np.zeros((4, 4)))
    with pytest.raises(ValueError, match="colour"):
        encode_jpeg_bytes(np.zeros((4, 4), np.uint8), subsample=True)
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg_bytes(b"nope")
    # extended-sequential SOF1 (still unsupported) refuses by name;
    # SOF2 itself is now the real progressive path (r5)
    img = np.zeros((8, 8), np.uint8)
    jb = bytearray(encode_jpeg_bytes(img))
    i = jb.find(b"\xff\xc0")
    jb[i + 1] = 0xC1
    with pytest.raises(NotImplementedError, match="SOF0.*SOF2"):
        decode_jpeg_bytes(bytes(jb))
    # relabeling a BASELINE stream as SOF2 is malformed (its single
    # scan has Se=63 with Ss=0 — not a legal progressive DC scan) and
    # must error rather than mis-decode
    jb[i + 1] = 0xC2
    with pytest.raises(ValueError, match="DC scan"):
        decode_jpeg_bytes(bytes(jb))


@given(
    h=st.integers(min_value=1, max_value=40),
    w=st.integers(min_value=1, max_value=40),
    ycck=st.booleans(),
    seed=st.integers(min_value=0, max_value=10_000),
)
@settings(max_examples=30, deadline=None)
def test_jpeg_cmyk_roundtrip_smooth_bounded_error(h, w, ycck, seed):
    """Adobe CMYK/YCCK encode/decode (r6): on smooth ink gradients the
    decoded RGB stays within quantization error of the expected
    R = s_c·s_k/255 conversion, at every shape (including 1×1 and
    non-multiples of 8), both APP14 transforms."""
    import numpy as np

    from deep_db_learning_spark.operators.multimodal import (
        decode_jpeg_bytes,
        encode_jpeg_cmyk,
    )

    rng = np.random.default_rng(seed)
    slopes = rng.uniform(0.5, 2.5, size=4)
    offs = rng.uniform(10, 60, size=4)
    yy, xx = np.mgrid[0:h, 0:w]
    cmyk = np.stack(
        [
            np.clip(yy * slopes[0] + xx * slopes[1] + offs[0], 0, 200),
            np.clip(xx * slopes[2] + offs[1], 0, 200),
            np.clip(yy * slopes[3] + offs[2], 0, 200),
            np.full((h, w), offs[3]),
        ],
        axis=-1,
    ).astype(np.uint8)
    inv = 255.0 - cmyk.astype(np.float64)
    want = np.stack(
        [inv[..., j] * inv[..., 3] / 255.0 for j in range(3)], axis=-1
    )
    out = decode_jpeg_bytes(encode_jpeg_cmyk(cmyk, ycck=ycck))
    assert out.shape == (h, w, 3)
    err = np.abs(out.astype(float) - want)
    assert err.mean() <= 6.0


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["aa", "bb", "cc"]), min_size=0, max_size=12
        ),
        min_size=1,
        max_size=8,
    ),
    phrase_len=st.integers(min_value=1, max_value=3),
    data=st.data(),
)
@settings(**_SETTINGS)
def test_phrase_search_counts_match_naive_scan(spark, docs, phrase_len, data):
    """Positional phrase retrieval equals a naive sliding-window count
    of consecutive token matches, for arbitrary tiny-alphabet corpora
    (overlaps, repeats, absent phrases)."""
    from deep_db_learning_spark.operators.search import phrase_search

    phrase_toks = data.draw(
        st.lists(
            st.sampled_from(["aa", "bb", "cc"]),
            min_size=phrase_len,
            max_size=phrase_len,
        )
    )
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r["doc_id"]: r["n_occurrences"]
        for r in phrase_search(
            df, "text", "doc_id", [(0, " ".join(phrase_toks))]
        ).collect()
    }
    n = len(phrase_toks)
    for i, toks in enumerate(docs):
        naive = sum(
            1
            for j in range(len(toks) - n + 1)
            if toks[j : j + n] == phrase_toks
        )
        assert got.get(i, 0) == naive


def test_no_shadowed_top_level_definitions():
    """Every module in the package defines each top-level function/class
    at most once — a later duplicate silently shadows the earlier one
    (the r7 ``opq_train`` defect: the improved implementation was dead
    code because a stale copy sat later in the module)."""
    import ast
    import pathlib

    pkg = pathlib.Path(__file__).resolve().parents[1] / "deep_db_learning_spark"
    offenders = []
    for path in sorted(pkg.rglob("*.py")):
        tree = ast.parse(path.read_text(), filename=str(path))
        seen = {}
        for node in tree.body:
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
                if node.name in seen:
                    offenders.append(
                        f"{path.relative_to(pkg.parent)}:{node.lineno} "
                        f"shadows {node.name} (first at line {seen[node.name]})"
                    )
                seen[node.name] = node.lineno
    assert not offenders, "\n".join(offenders)


@given(
    vals=st.lists(
        st.one_of(
            st.none(),
            st.floats(allow_nan=False, allow_infinity=False,
                      min_value=-1e6, max_value=1e6),
            st.sampled_from([0.0, 1.0, -1.0]),  # force tie masses
        ),
        min_size=1,
        max_size=60,
    ),
    k=st.integers(min_value=0, max_value=70),
)
@settings(**_SETTINGS)
def test_threshold_cut_equals_rank_form(spark, vals, k):
    """For ARBITRARY keys (ties, NULLs, negatives, tiny/huge floats)
    and arbitrary k, the threshold cut keeps exactly the window form's
    rows among non-NULL keys (r10 selection contract)."""
    from deep_db_learning_spark.operators.selection import (
        topk_threshold_cut,
    )

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "doc_id long, score double"
    )
    got = sorted(
        r["doc_id"]
        for r in topk_threshold_cut(
            df, "score", k, "doc_id", n_bins=8, collect_cap=4
        ).collect()
    )
    ranked = sorted(
        ((v, i) for i, v in enumerate(vals) if v is not None),
        key=lambda t: (-t[0], t[1]),
    )
    want = sorted(i for _v, i in ranked[:k])
    assert got == want


@given(
    rows=st.lists(
        st.tuples(
            st.one_of(
                st.floats(allow_nan=False, allow_infinity=False,
                          min_value=-100, max_value=100),
                st.sampled_from([0.0, 0.5]),  # tie masses
            ),
            st.integers(min_value=0, max_value=1),
        ),
        min_size=2,
        max_size=50,
    )
)
@settings(**_SETTINGS)
def test_binary_auc_equals_pair_counting(spark, rows):
    """For arbitrary (score, label) multisets with both classes, the
    distributed integer-midrank AUC equals the O(n²) pair count
    exactly (ties at half credit)."""
    from deep_db_learning_spark.plans.metrics import binary_auc

    pos = [s for s, y in rows if y == 1]
    neg = [s for s, y in rows if y == 0]
    if not pos or not neg:
        return  # AUC undefined — the operator raises, covered elsewhere
    df = spark.createDataFrame(rows, "s double, y int")
    got = binary_auc(df, "s", "y")
    num2 = sum(2 * (p > q) + (p == q) for p in pos for q in neg)
    assert got == num2 / (2.0 * len(pos) * len(neg))
