"""Trained byte-pair-encoding tokenization — upgrading the
``BPE_TOKEN_PATTERN`` regex pre-tokenizer (``functions/text.py``) to a
REAL learned subword vocabulary (Sennrich et al., ACL 2016; the GPT-2
greedy-merge application order).

Fit/apply split follows the engine's sample-fit posture (``pq_train``,
``ivf_index_deterministic``): the merge table is learned driver-side
on a DETERMINISTIC sample (knuth-ordered by id — engine-portable, no
``rand()``), because a subword vocabulary only needs a sketch of the
word-frequency distribution; application is a vectorized Arrow pass
with a per-batch word cache (words repeat — each distinct word
segments once per batch), so the 100 TB corpus never funnels through
the driver.

Determinism contract: pair selection breaks count ties by
lexicographically SMALLEST pair, so the same sample always yields the
same merge table; segmentation is the standard lowest-rank-first fold,
a pure function of (word, merges). No SQL oracle (BPE is not
SQL-expressible); the tests pin the engine's distributed output
against an independent driver-side segmentation of the same corpus
plus the classic algebraic invariants (zero merges = characters,
token count monotone non-increasing in merges, every token's
concatenation reconstructs the word).
"""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import knuth_hash

# words = the search tokenizer's vocabulary (lowercase [a-z0-9]+ runs)
WORD_PATTERN = "[a-z0-9]+"
END = "</w>"


def _merge_word(sym: tuple, pair: tuple) -> tuple:
    out, i = [], 0
    while i < len(sym):
        if i < len(sym) - 1 and (sym[i], sym[i + 1]) == pair:
            out.append(sym[i] + sym[i + 1])
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def bpe_train(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_merges: int = 200,
    sample: int = 10_000,
    seed: int = 42,
) -> list[tuple[str, str]]:
    """Learn the merge table on a deterministic corpus sample.
    Returns ``[(left, right), ...]`` in merge order (= rank). Stops
    early when no adjacent pair repeats (count < 2 adds no
    compression). Driver memory is O(sample vocabulary), not corpus."""
    rows = (
        df.select(F.col(id_col), F.col(text_col))
        .orderBy(knuth_hash(F.col(id_col), seed), F.col(id_col))
        .limit(sample)
        .collect()
    )
    word_freq: Counter = Counter()
    for r in rows:
        for w in re.findall(WORD_PATTERN, (r[text_col] or "").lower()):
            word_freq[w] += 1
    vocab = {tuple(w) + (END,): c for w, c in word_freq.items()}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for sym, c in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += c
        if not pairs:
            break
        # max count; ties broken by lexicographically smallest pair —
        # the determinism contract
        pair = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[pair] < 2:
            break
        merges.append(pair)
        vocab = {_merge_word(sym, pair): c for sym, c in vocab.items()}
    return merges


def bpe_segment_word(word: str, ranks: dict) -> list[str]:
    """GPT-2 greedy application: repeatedly merge the LOWEST-rank
    adjacent pair (leftmost on rank ties) until none applies. Pure
    function of (word, merges) — the same segmentation everywhere."""
    sym = list(word) + [END]
    while len(sym) > 1:
        best_i, best_r = -1, None
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_r is None or r < best_r):
                best_r, best_i = r, i
        if best_i < 0:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_tokens(
    df: DataFrame,
    text_col: str,
    merges: list[tuple[str, str]],
    out: str = "bpe_tokens",
) -> DataFrame:
    """``array<string>`` of trained-BPE tokens per row — one Arrow
    pass; each distinct word in a batch segments once (word cache)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    ranks = {tuple(p): i for i, p in enumerate(merges)}

    def fn(texts):
        cache: dict = {}
        res = []
        for t in texts:
            toks: list[str] = []
            for w in re.findall(WORD_PATTERN, (t or "").lower()):
                seg = cache.get(w)
                if seg is None:
                    seg = bpe_segment_word(w, ranks)
                    cache[w] = seg
                toks.extend(seg)
            res.append(toks)
        return pd.Series(res)

    fn.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    udf = pandas_udf(fn, "array<string>")
    return df.withColumn(out, udf(F.col(text_col)))


def bpe_token_count(
    df: DataFrame,
    text_col: str,
    merges: list[tuple[str, str]],
    out: str = "n_bpe_tokens",
) -> DataFrame:
    """Trained-tokenizer token counts — the budget signal the regex
    ``bpe_token_count`` (``functions/text.py``) approximates."""
    return bpe_tokens(df, text_col, merges, out="__bpe").select(
        *df.columns, F.size("__bpe").cast("int").alias(out)
    )
