"""String normalizers (SURVEY F1/F2, A2).

The reference defines 12 normalizer combos — identity / lower(ci) /
strip / rstrip / unidecode and their compositions
(``/root/reference/db_transformer/db/distinct_cnt_retrieval.py:83-115``)
— used both to count distincts under normalization (A2) and to
reconcile a categorical column's observed value set with its declared
cardinality (``cat_converter.py:44-76``).

Everything except unidecode is a native JVM expression. Unidecode
(ASCII transliteration) has no Spark builtin; we use a pandas UDF over
``unicodedata`` NFKD + ASCII-fold — Arrow-batched, only entering the
plan when a normalizer chain actually needs it.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _fold_ascii(v):
    if v is None:
        return None
    return unicodedata.normalize("NFKD", v).encode("ascii", "ignore").decode("ascii")


_UNIDECODE_UDF = None


def unidecode_udf(c: Column) -> Column:
    """ASCII transliteration à la ``unidecode`` (NFKD + drop combining).
    The pandas UDF is created lazily — registering it at import time
    would require an active SparkSession."""
    global _UNIDECODE_UDF
    if _UNIDECODE_UDF is None:

        @pandas_udf("string")
        def _udf(s: pd.Series) -> pd.Series:
            return s.map(_fold_ascii)

        _UNIDECODE_UDF = _udf
    return _UNIDECODE_UDF(c)


def _ident(c: Column) -> Column:
    return c


def _ci(c: Column) -> Column:
    return F.lower(c)


def _strip(c: Column) -> Column:
    return F.trim(c)


def _rstrip(c: Column) -> Column:
    return F.rtrim(c)


def _unidecode(c: Column) -> Column:
    return unidecode_udf(c)


# the reference's SIMPLE_STRING_SERIES_MAPPERS registry, same names and
# same precedence order (distinct_cnt_retrieval.py:83-115)
NORMALIZERS: dict[str, list] = {
    "identity": [_ident],
    "ci": [_ci],
    "strip": [_strip],
    "rstrip": [_rstrip],
    "strip_ci": [_strip, _ci],
    "rstrip_ci": [_rstrip, _ci],
    "unidecode": [_unidecode],
    "unidecode_ci": [_unidecode, _ci],
    "unidecode_strip": [_unidecode, _strip],
    "unidecode_rstrip": [_unidecode, _rstrip],
    "unidecode_strip_ci": [_unidecode, _strip, _ci],
    "unidecode_rstrip_ci": [_unidecode, _rstrip, _ci],
}


def normalize(c: Column, name: str) -> Column:
    """Apply the named normalizer chain."""
    out = c
    for f in NORMALIZERS[name]:
        out = f(out)
    return out


def distinct_count_normalized(df, column: str, normalizer: str = "identity") -> int:
    """A2: null-inclusive distinct count under a normalizer
    (``distinct_cnt_retrieval.py:55-155``). One distributed
    distinct+count; the normalization happens before the shuffle so
    equal-after-normalization values co-locate."""
    return df.select(normalize(F.col(column), normalizer).alias("v")).distinct().count()
