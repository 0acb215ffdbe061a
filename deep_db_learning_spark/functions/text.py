"""Text-analysis operators for the LLM-data-pipeline extension.

No reference counterpart (the reference's only text handling is an
embedding hook, ``data/ctu_dataset.py:43-52``); these are the standard
operators a 100 TB training-data pipeline needs. Everything here is a
native Column expression (codegen, zero Python) so it runs at full scan
speed; only genuinely non-expressible kernels drop to pandas UDFs.

- language ID: marker-token heuristic
- quality scoring: length / punctuation / stopword / word-length ratios
- repetition signals: duplicate-token / top-token / duplicate-line
  fractions (Gopher-style boilerplate flags)
- PII redaction: email / IPv4 / phone regexp_replace chain
- token counting: whitespace + BPE-ish regex
- fingerprinting: md5 content hash (portable) + rolling 64-bit
  polynomial hash over character shingles (winnowing-style)
- shingling: character n-grams via sequence+substring (no UDF)
- chunking: overlapping character windows, 1→N posexplode (RAG /
  pre-embedding pass)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# word-boundary markers for cheap language ID; deterministic and
# oracle-expressible (instr > 0)
LANG_MARKERS: list[tuple[str, str]] = [
    ("en", " the "),
    ("en", " and "),
    ("es", " el "),
    ("es", " la "),
    ("de", " der "),
    ("de", " und "),
    ("fr", " le "),
    ("fr", " et "),
]

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")

# BPE-ish pre-tokenizer: letter runs | digit runs | single punctuation.
# Kept RE2-compatible so the DuckDB oracle evaluates the same pattern.
BPE_TOKEN_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def whitespace_token_count(text: Column) -> Column:
    """Tokens = non-empty whitespace-separated runs."""
    t = F.trim(text)
    return F.when(t == "", 0).otherwise(
        F.size(F.split(t, r"\s+"))
    ).cast("int")


def bpe_token_count(text: Column) -> Column:
    """Count of BPE-ish pre-tokens (letters/digits/punct runs)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_PATTERN), 0)).cast("int")


def lang_id(text: Column) -> Column:
    """First-match marker-token language guess; 'und' when no marker
    hits. Padded with spaces so markers match at string edges."""
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    expr = F.lit("und")
    for lang, marker in reversed(LANG_MARKERS):
        expr = F.when(F.instr(padded, marker) > 0, F.lit(lang)).otherwise(expr)
    return expr


def stopword_ratio(text: Column) -> Column:
    """Fraction of whitespace tokens that are stopwords.

    Implemented without a higher-order ``filter`` (r5): HOF lambdas are
    interpreted per element and their named-lambda analysis dominates
    the plan-build time of composite expressions like
    :func:`quality_score`. Whitespace is normalized to single spaces,
    then stopword TOKENS are counted with zero-width boundary
    lookarounds (adjacent stopwords still both match because
    lookarounds don't consume the shared space). Values are
    bit-identical to the ``filter(isin)`` form — the DuckDB oracle
    keeps its list_filter formulation."""
    toks = F.split(F.lower(F.trim(text)), r"\s+")
    n = F.size(toks)
    padded = F.concat(
        F.lit(" "),
        F.regexp_replace(F.lower(F.trim(text)), r"\s+", " "),
        F.lit(" "),
    )
    pat = "(?<= )(" + "|".join(STOPWORDS) + ")(?= )"
    stop = F.size(F.regexp_extract_all(padded, F.lit(pat), 0))
    return F.when(n > 0, stop.cast("double") / n).otherwise(F.lit(0.0))


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are punctuation."""
    n = F.length(text)
    punct = F.length(F.regexp_replace(text, "[A-Za-z0-9 ]", ""))
    return F.when(n > 0, punct.cast("double") / n).otherwise(F.lit(0.0))


def mean_word_length(text: Column) -> Column:
    """Mean token length. The summed token lengths equal the count of
    non-whitespace characters (every non-\\s char belongs to exactly
    one token), so the per-token ``aggregate`` HOF reduces to one
    ``regexp_replace`` + ``length`` — same values, no interpreted
    lambda (r5)."""
    toks = F.split(F.trim(text), r"\s+")
    n = F.size(toks)
    total = F.length(F.regexp_replace(text, r"\s", ""))
    return F.when(n > 0, total.cast("double") / n).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: long enough, low punctuation,
    sane stopword density, sane word length. Weights are arbitrary but
    fixed — the operator contract is determinism, not linguistics."""
    len_score = F.least(F.length(text) / F.lit(200.0), F.lit(1.0))
    punct_pen = F.lit(1.0) - F.least(punct_ratio(text) * 5.0, F.lit(1.0))
    stop_score = F.least(stopword_ratio(text) * 4.0, F.lit(1.0))
    wl = mean_word_length(text)
    wl_score = F.when((wl >= 3.0) & (wl <= 8.0), 1.0).otherwise(0.5)
    score = F.round(
        0.4 * len_score + 0.2 * punct_pen + 0.2 * stop_score + 0.2 * wl_score, 6
    )
    # NULL text scores 0 — `least` would silently drop the null operand
    # and hand a missing document a good score
    return F.when(text.isNull(), F.lit(0.0)).otherwise(score)


def duplicate_token_fraction(text: Column) -> Column:
    """Gopher-style repetition signal: fraction of whitespace tokens
    that are repeats of an earlier token (``1 − distinct/total``,
    case-folded). High values flag boilerplate/spam documents. Pure
    array expressions — codegen, no shuffle, no UDF."""
    toks = F.split(F.lower(F.trim(text)), r"\s+")
    n = F.size(toks)
    d = F.size(F.array_distinct(toks))
    return F.when(text.isNull() | (F.trim(text) == ""), F.lit(0.0)).otherwise(
        (n - d).cast("double") / n
    )


def top_token_fraction(text: Column) -> Column:
    """Gopher-style repetition signal: fraction of tokens taken by the
    single most frequent token. Sort the row's tokens, then one
    ``aggregate`` fold tracks the longest equal run — O(n log n) per
    row (HOFs are interpreted, so the naive count-each-distinct nested
    HOF is O(n²) and measurably slow), row-bounded, no shuffle. The
    DuckDB oracle uses the unnest→groupBy form — same values."""
    toks = F.array_sort(F.split(F.lower(F.trim(text)), r"\s+"))
    n = F.size(toks)
    top = F.aggregate(
        toks,
        F.struct(
            F.lit(" ").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, t: F.struct(
            t.alias("prev"),
            F.when(t == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(t == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    return F.when(text.isNull() | (F.trim(text) == ""), F.lit(0.0)).otherwise(
        top.cast("double") / n
    )


def duplicate_line_fraction(text: Column) -> Column:
    """Gopher-style repetition signal: fraction of newline-separated
    lines that are repeats of an earlier line. Trailing newlines are
    stripped first — a file-final ``\\n`` (the common case in real
    corpora) must not mint a phantom empty line that skews the
    fraction."""
    lines = F.split(F.regexp_replace(text, "\\n+$", ""), "\n")
    n = F.size(lines)
    d = F.size(F.array_distinct(lines))
    return F.when(text.isNull(), F.lit(0.0)).otherwise(
        (n - d).cast("double") / n
    )


# PII patterns, deliberately kept inside the Java-regex ∩ RE2 common
# subset (char classes + greedy quantifiers, no backrefs/lookaround) so
# Spark and a DuckDB oracle substitute identically. Order matters:
# emails before phones (an email's digits must not half-match as a
# phone), IPs before phones (dotted quads would otherwise be eaten by
# the phone pattern's digit runs).
#
# Three phone shapes, calibrated so date/time/decimal prose survives:
# (a) area code in parens, (b) +country with space/dash groups, (c)
# dash-chained or bare runs of ≥9 digits. '.' ':' '/' are never
# separators and ≤8-digit dash shapes never match, so ISO dates
# (2024-01-02: 8 digits), datetimes (the space between date and time
# is not a chainable separator in (c)), timestamps (12:30:45), and
# ordinary decimals (3.14159265: 8-digit fraction) all stay intact.
# Documented exceptions (erring toward redaction is the safe default
# for a pre-training scrub):
# - any bare run of ≥9 digits IS redacted — at that length a digit run
#   is an account/serial/phone identifier more often than prose;
# - dotted 4-part version strings ("1.2.3.4") are shape-identical to
#   IPv4 and redact as <IP>;
# - (a) requires ≥2 digits inside the parens, so citation-like prose
#   ("figure (1) 2024-2025") survives; the European trunk-prefix shape
#   "+44 (0) 20 ..." is instead caught by the dedicated rule (a'),
#   which demands a leading +country before the literal "(0)" — a
#   shape no citation or date produces (ADVICE r4).
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}", "<IP>"),
    (r"\+[0-9]{1,3}[ -]?\(0\)([ -]?[0-9]{2,4}){2,}", "<PHONE>"),
    (
        r"\+?[0-9]{0,3}[ -]?\([0-9]{2,4}\)[ -]?[0-9]{2,4}[ -]?[0-9]{2,4}[ -]?[0-9]{0,4}",
        "<PHONE>",
    ),
    (r"\+[0-9]{1,3}([ -][0-9]{2,4}){2,}", "<PHONE>"),
    (r"[0-9](-?[0-9]){8,}", "<PHONE>"),
]


def redact_pii(text: Column) -> Column:
    """Rule-based PII redaction (emails, IPv4s, phone-shaped digit
    runs → typed placeholders) — the standard pre-training scrub pass.
    A chain of ``regexp_replace`` column expressions: whole-stage
    codegen, full scan speed, no UDF. Cross-engine parity with DuckDB
    is pinned in tests (``redact_pii_sql`` is the oracle twin)."""
    out = text
    for pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def redact_pii_sql(expr: str) -> str:
    """DuckDB/ANSI twin of :func:`redact_pii` (same patterns, same
    order, global replacement)."""
    out = expr
    for pat, repl in PII_PATTERNS:
        # DuckDB single-quoted strings are escape-free: the pattern's
        # backslashes pass through to RE2 verbatim — no doubling
        out = f"regexp_replace({out}, '{pat}', '{repl}', 'g')"
    return out


def fingerprint_md5(text: Column) -> Column:
    """Content fingerprint — md5 hex (bit-identical in any engine)."""
    return F.md5(text)


def char_shingles(text_col: str, k: int = 5, distinct: bool = True) -> Column:
    """Character k-grams as array<string>, pure codegen:
    ``transform(sequence(1, len-k+1), i -> substring(text, i, k))``.
    Dynamic-start substring needs the SQL expression form (the PySpark
    lambda API only takes literal start positions). Stays in Tungsten —
    no Python round trip at 100 TB. Texts shorter than ``k`` yield the
    whole text as their only shingle."""
    body = (
        f"CASE WHEN length({text_col}) < {k} THEN array({text_col}) "
        f"ELSE transform(sequence(1, length({text_col}) - {k - 1}), "
        f"i -> substring({text_col}, i, {k})) END"
    )
    return F.expr(f"array_distinct({body})" if distinct else body)


def doc_fingerprint_rolling(df, text_col: str, k: int = 8, out: str = "fingerprint"):
    """Winnowing-style near-dup fingerprint: min of xxhash64 over char
    k-grams (a 1-perm minhash). xxhash64 is JVM-vectorized but
    engine-specific, so this op is unit-tested rather than SQL-oracled."""
    grams = char_shingles(text_col, k, distinct=False)
    hashed = F.transform(grams, lambda g: F.xxhash64(g))
    return df.withColumn(out, F.array_min(hashed))


def doc_fingerprint_min_md5(text_col: str, k: int = 8) -> Column:
    """Portable twin of :func:`doc_fingerprint_rolling`: lexicographic
    min of md5-prefix hex strings over char k-grams — a 1-permutation
    minhash whose value is bit-identical across engines (md5 is md5),
    so it IS SQL-oracle-checkable.

    Physical form: Arrow-batched pandas UDF — the expression form
    (``array_min(transform(md5..))``) evaluates the HOF lambda
    interpreted per gram (~50µs each), ~40× slower than this kernel.
    """
    import hashlib

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def fn(texts):
        out = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            grams = [t] if len(t) < k else (t[i : i + k] for i in range(len(t) - k + 1))
            out.append(
                min(hashlib.md5(g.encode("utf-8")).hexdigest()[:16] for g in grams)
            )
        return pd.Series(out)

    fn.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    return pandas_udf(fn, "string")(F.col(text_col))


def token_ngrams(text_col: str, n: int = 13, distinct: bool = True) -> Column:
    """Whitespace-token n-grams as array<string> (space-joined), pure
    codegen — the unit of benchmark-decontamination matching. Texts
    with fewer than ``n`` tokens yield their whole token sequence as
    one gram."""
    toks = f"split(trim({text_col}), '\\\\s+')"
    body = (
        f"CASE WHEN size({toks}) < {n} THEN array(concat_ws(' ', {toks})) "
        f"ELSE transform(sequence(1, size({toks}) - {n - 1}), "
        f"i -> concat_ws(' ', slice({toks}, i, {n}))) END"
    )
    return F.expr(f"array_distinct({body})" if distinct else body)


def token_ngrams_pandas(df, text_col: str, n: int = 13, out: str = "grams"):
    """Arrow-batched twin of :func:`token_ngrams` — identical gram
    strings (tokenization uses Java's default ``\\s`` class
    ``[ \\t\\n\\x0B\\f\\r]`` explicitly, so Python's unicode-aware
    ``\\s`` can't diverge), without the interpreted per-gram HOF cost."""
    import re

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    ws = re.compile(r"[ \t\n\x0b\f\r]+")

    def fn(texts):
        res = []
        for t in texts:
            if t is None:
                res.append(None)
                continue
            toks = ws.split(t.strip())
            if len(toks) < n:
                res.append([" ".join(toks)])
            else:
                seen = list(dict.fromkeys(
                    " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
                ))
                res.append(seen)
        return pd.Series(res)

    fn.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    return df.withColumn(out, pandas_udf(fn, "array<string>")(F.col(text_col)))


def contamination_matches(
    train,
    eval_docs,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
):
    """Benchmark decontamination (the GPT-3-style n-gram overlap
    check): for every training doc, count distinct token n-grams it
    shares with ANY eval doc. Returns (id, n_shared_grams) for docs
    with at least one hit — the candidates to drop before training.

    Physical shape: the eval side's distinct grams are small (the
    benchmark) → broadcast; the train side explodes to (id, gram) and
    inner-joins — no shuffle of the corpus beyond the explode, and the
    aggregation is map-side-combinable. At 100 TB hash the grams
    (``xxhash64``) to shrink the exchange; string grams keep the
    DuckDB oracle exact here."""
    from pyspark.sql.functions import broadcast

    e = (
        token_ngrams_pandas(eval_docs.select(text_col), text_col, n)
        .select(F.explode("grams").alias("gram"))
        .distinct()
    )
    t = token_ngrams_pandas(train.select(id_col, text_col), text_col, n).select(
        F.col(id_col), F.explode("grams").alias("gram")
    )
    return (
        t.join(broadcast(e), "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shared_grams"))
    )


def chunk_documents(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 512,
    overlap: int = 64,
):
    """1→N chunk expansion — split each document into overlapping
    character windows (the standard pre-embedding/RAG chunking pass).
    Returns ``(id_col, chunk_id, chunk_start, chunk)`` with
    ``chunk_id`` 0-based per document and ``chunk_start`` the 0-based
    character offset; windows start every ``size − overlap`` chars, so
    consecutive chunks share ``overlap`` chars and their union is the
    whole document. NULL/empty texts yield no chunks.

    Pure codegen (``sequence`` + ``posexplode`` + dynamic-start
    ``substring`` via the SQL expression form): a row-local 1→N
    flatMap, no shuffle — at 100 TB this runs at scan speed and the
    output inherits the input partitioning."""
    if overlap >= size:
        raise ValueError(f"overlap ({overlap}) must be < size ({size})")
    if overlap < 0:
        # a negative overlap makes step > size: uncovered gaps between
        # chunks, violating the union-is-the-whole-document contract
        raise ValueError(f"overlap ({overlap}) must be >= 0")
    step = size - overlap
    # last start caps at length - overlap - 1: a start beyond that
    # yields a chunk lying entirely inside the previous one's overlap
    # (a strict substring — duplicate content downstream); the cap
    # still covers the tail because consecutive starts are ≤ step
    # apart, so last_start + size ≥ length
    starts = F.expr(
        f"CASE WHEN {text_col} IS NULL OR length({text_col}) = 0 THEN array() "
        f"ELSE sequence(0, greatest(length({text_col}) - {overlap + 1}, 0), {step}) END"
    )
    return (
        df.select(id_col, text_col, F.posexplode(starts).alias("chunk_id", "chunk_start"))
        .select(
            id_col,
            "chunk_id",
            "chunk_start",
            F.expr(f"substring({text_col}, chunk_start + 1, {size})").alias("chunk"),
        )
    )


def mean_token_corpus_freq(
    df, text_col: str = "text", id_col: str = "doc_id", out: str = "mean_tok_freq"
):
    """Inverse-rarity quality signal: the mean, over a document's
    lowercased whitespace tokens, of each token's CORPUS occurrence
    count — high values mean the document is built from the corpus's
    most common vocabulary (boilerplate/templated text), low values
    mean rare-token-dense text. The unigram-LM surprisal signal
    without the cross-engine ``log()`` hazard: everything is exact
    integer arithmetic (token counts, per-doc count sums) until ONE
    final bigint/bigint double division, so a DuckDB oracle reproduces
    the doubles bitwise.

    Returns ``(id_col, out)`` — one row per input document (tokenless
    documents get 0.0). Two shuffles at any scale: the corpus count
    groupBy and the per-doc fold; the token→count join is shuffle-side
    on the token key (skew from stopword tokens is bounded by the
    per-token row groups AQE splits)."""
    from pyspark.sql import functions as F

    toks = (
        df.select(
            F.col(id_col),
            F.explode(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
            ).alias("__tok"),
        )
        .filter(F.col("__tok") != "")
    )
    counts = toks.groupBy("__tok").agg(F.count(F.lit(1)).alias("__c"))
    per_doc = (
        toks.join(counts, "__tok")
        .groupBy(id_col)
        .agg((F.sum("__c") / F.count(F.lit(1))).alias(out))
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .na.fill({out: 0.0})
    )
