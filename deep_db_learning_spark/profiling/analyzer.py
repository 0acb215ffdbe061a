"""Schema inference: the reference's ``SchemaAnalyzer`` decision tree,
re-run over single-pass Spark profiles instead of per-column SQL.

Decision logic ported semantically from
``/root/reference/db_transformer/db/schema_autodetect.py``:

- determined storage types (``:136-148``): float/decimal → num,
  boolean → cat, date → date, timestamp → datetime, daytime-interval
  → duration; long text stays text.
- single-column PK → omit (pure identifier, ``:454-461``); composite-PK
  members are NOT auto-omitted (FIXTURES.md lineitem case).
- member of a non-composite FK → omit (``:463-467``).
- all-NULL column → omit, unless it is the target → error (``:335-342``).
- integer/string columns: cardinality tree with
  ratio > 0.2 (``FRACTION_..._IGNORE_THRESHOLD``) or
  cardinality > 1000 (``MAXIMUM_CARDINALITY_THRESHOLD``) ⇒ not
  categorical; then ID-name regex ⇒ omit; integers fall back to num
  (numeric-name regex and plural-noun heuristic force num *before* the
  cat fallback), strings fall back to text (``:344-389``).
- target override: ``target_type`` forces cat/num (``:441-449``).

The thresholds and regexes are reproduced verbatim so that golden-file
tests against FIXTURES.md expectations hold. The plural-noun heuristic
uses the ``inflect`` package if importable, else a lightweight
English-plural fallback (the container has no ``inflect``).
"""

from __future__ import annotations

import re
from typing import Callable

from pyspark.sql import DataFrame

from ..schema import ColumnSpec, DBSchema, ForeignKey, TableSpec
from .profiler import ColumnStats, profile_table, profilable_columns

# regexes verbatim from schema_autodetect.py:153-160
ID_NAME_REGEX = re.compile(
    r"_id$|^id_|_id_|Id$|Id[^a-z]|[Ii]dentifier|IDENTIFIER|ID[^a-zA-Z]|ID$"
    r"|[guGU]uid[^a-z]|[guGU]uid$|[GU]UID[^a-zA-Z]|[GU]UID$"
)
COMMON_NUMERIC_COLUMN_NAME_REGEX = re.compile(
    r"balance|amount|size|duration|frequency|count|cnt|votes|score|number|age|year|month|day",
    re.IGNORECASE,
)

FRACTION_DISTINCT_TO_NONNULL_IGNORE_THRESHOLD = 0.2
MAXIMUM_CARDINALITY_THRESHOLD = 1000

# (DataFrame, stats-columns, mode) → ColumnStats dict, shared across
# SchemaAnalyzer instances: a pipeline typically profiles the same
# loaded tables several times (standalone inference, then inside
# minimum_slice / training assembly), and each profile is a full scan.
# Same static-input contract as operators.graph._PACKED_STATS — call
# clear_profile_cache() after mutating a source a cached frame reads.
# Bounded FIFO (keys hold strong DataFrame refs): ad-hoc frames (tests,
# exploratory sessions) must not pin driver memory without limit.
_PROFILE_CACHE: dict = {}
_PROFILE_CACHE_MAX = 32


def clear_profile_cache() -> None:
    """Drop memoized table profiles (see the static-input contract on
    ``_PROFILE_CACHE``)."""
    _PROFILE_CACHE.clear()

try:  # pragma: no cover - container has no inflect; fallback covers tests
    import inflect

    _INFLECT = inflect.engine()

    def _is_plural(word: str) -> bool:
        return _INFLECT.singular_noun(word) is not False

except ImportError:  # pragma: no cover

    # Irregular plurals inflect recognizes without a trailing 's' —
    # the class the bare endswith('s') rule misses entirely. Includes
    # the unchanging (singular == plural) nouns, which
    # ``inflect.singular_noun`` reports as plural (it returns the word
    # itself, truthy) — sheep/series/species etc.
    _IRREGULAR_PLURALS = frozenset(
        "children men women people feet teeth geese mice lice oxen dice "
        "data media indices vertices matrices criteria phenomena bacteria "
        "alumni fungi cacti nuclei stimuli syllabi radii "
        "analyses bases crises theses hypotheses diagnoses axes "
        "sheep deer fish series species means offspring aircraft "
        "headquarters".split()
    )
    # Singular nouns ending in 's' that the ss/us/is suffix rules do
    # NOT cover but inflect correctly rejects — common column names.
    _SINGULAR_S_WORDS = frozenset(
        "alias bias gas atlas canvas lens news chaos ethos pathos "
        "kudos corps summons".split()
    )

    def _is_plural(word: str) -> bool:
        """Lightweight twin of ``inflect.singular_noun(w) is not False``
        (schema_autodetect.py:363-368): suffix rules + the irregular /
        false-positive tables above. Residual divergence is limited to
        rarer irregulars; FIXTURES.md goldens hold either way."""
        w = word.lower()
        if w in _IRREGULAR_PLURALS:
            return True
        if w in _SINGULAR_S_WORDS:
            return False
        if len(w) < 3 or w.endswith("ss") or w.endswith("us") or w.endswith("is"):
            return False
        return w.endswith("s")


_INT_TYPES = ("tinyint", "smallint", "int", "bigint")
_FLOAT_TYPES = ("float", "double", "decimal")
_STRING_TYPES = ("string", "varchar", "char")


def _storage_family(spark_type: str) -> str:
    t = spark_type.lower()
    if t.startswith(_FLOAT_TYPES):
        return "num"
    if t == "boolean":
        return "bool"
    if t == "date":
        return "date"
    if t.startswith("timestamp"):
        return "datetime"
    if t.startswith("interval day") or t == "daytimeinterval":
        return "duration"
    if t.startswith(_INT_TYPES):
        return "int"
    if t.startswith(_STRING_TYPES):
        return "string"
    return "other"


class SchemaAnalyzer:
    """Profiles a database and infers a :class:`DBSchema`.

    ``omit`` pairs and the ``target`` behave like the reference's
    constructor filters (``schema_autodetect.py:182-259``): omitted
    (table, column) pairs are forced to ``omit``; the target may force a
    type and may never be omitted.
    """

    def __init__(
        self,
        tables: dict[str, DataFrame],
        primary_keys: dict[str, list[str]] | None = None,
        foreign_keys: dict[str, list[ForeignKey]] | None = None,
        target: tuple[str, str] | None = None,
        target_type: str | None = None,
        omit: set[tuple[str, str]] | None = None,
        profile_mode: str = "exact",
        post_guess_schema_hook: Callable[[DBSchema], None] | None = None,
    ) -> None:
        self.tables = tables
        self.primary_keys = primary_keys or {}
        self.foreign_keys = foreign_keys or {}
        self.target = target
        self.target_type = target_type
        self.omit = omit or set()
        self.profile_mode = profile_mode
        self.post_guess_schema_hook = post_guess_schema_hook
        self._profiles: dict[str, dict[str, ColumnStats]] = {}

    # -- profiling ---------------------------------------------------------
    def _stats_columns(self, table: str) -> list[str]:
        """Columns whose decision actually consumes statistics.

        Determined storage families (float/decimal, date, timestamp,
        interval) resolve from the type alone (``schema_autodetect.py
        :136-148``); lone-PK and non-composite-FK members return before
        any profiling (``:454-467``); explicit omits never profile. What
        remains — int/string columns on the cardinality tree, plus bool
        (→ cat, needs ``card``) and the target — is typically a small
        fraction of a wide fact table, and every dropped column removes
        one row-multiplication from the Expand behind the exact
        multi-column distinct."""
        df = self.tables[table]
        atomics = set(profilable_columns(df))
        pk = set(self.primary_keys.get(table, []))
        non_comp_fk = self._non_composite_fk_columns(table)
        out: list[str] = []
        for f in df.schema.fields:
            c = f.name
            if c not in atomics:
                continue
            is_target = (table, c) == self.target
            if not is_target:
                if (table, c) in self.omit:
                    continue
                if c in pk and len(pk) == 1:
                    continue
                if c in non_comp_fk:
                    continue
            family = _storage_family(f.dataType.simpleString())
            if is_target or family in ("int", "string", "bool"):
                out.append(c)
        return out

    def profile(self, table: str) -> dict[str, ColumnStats]:
        if table not in self._profiles:
            cols = self._stats_columns(table)
            key = (self.tables[table], tuple(cols), self.profile_mode)
            if key not in _PROFILE_CACHE:
                while len(_PROFILE_CACHE) >= _PROFILE_CACHE_MAX:
                    _PROFILE_CACHE.pop(next(iter(_PROFILE_CACHE)))
                _PROFILE_CACHE[key] = profile_table(
                    self.tables[table],
                    columns=cols,
                    mode=self.profile_mode,
                    thresholds=(FRACTION_DISTINCT_TO_NONNULL_IGNORE_THRESHOLD,),
                    max_card=MAXIMUM_CARDINALITY_THRESHOLD,
                )
            # shallow copy: analyzers must not alias one mutable dict
            self._profiles[table] = dict(_PROFILE_CACHE[key])
        return self._profiles[table]

    def prefetch_profiles(self, max_concurrency: int = 8) -> None:
        """Run all per-table profiling jobs concurrently.

        Each profile is one independent Spark aggregation; submitting
        them from driver threads lets the scheduler interleave their
        stages — the win both locally (small tables under-fill the
        executor) and on a cluster (scans of different tables overlap).
        """
        from concurrent.futures import ThreadPoolExecutor

        pending = [t for t in self.tables if t not in self._profiles]
        if len(pending) <= 1:
            for t in pending:
                self.profile(t)
            return
        with ThreadPoolExecutor(min(max_concurrency, len(pending))) as pool:
            list(pool.map(self.profile, pending))

    # -- decision tree -----------------------------------------------------
    def _non_composite_fk_columns(self, table: str) -> set[str]:
        return {
            fk.columns[0]
            for fk in self.foreign_keys.get(table, [])
            if len(fk.columns) == 1
        }

    def do_guess_column_type(
        self, table: str, column: str, must_have_type: bool
    ) -> str:
        """The value-driven part of the tree
        (``schema_autodetect.py:312-389``). Returns a semantic type name."""
        df = self.tables[table]
        spark_type = dict(
            (f.name, f.dataType.simpleString()) for f in df.schema.fields
        )[column]
        family = _storage_family(spark_type)

        # determined types (schema_autodetect.py:136-148)
        if family == "num":
            return "num"
        if family == "bool":
            return "cat"
        if family in ("date", "datetime", "duration"):
            return family
        if family == "other":
            return "omit"

        stats = self.profile(table).get(column)
        if stats is None or stats.n_nonnull == 0:
            if must_have_type:
                raise ValueError(
                    f"Column {column} in table {table} contains only NULL values, "
                    "but it cannot be omitted as it is the target."
                )
            return "omit"

        cardinality = stats.n_distinct
        too_many_distinct = (
            stats.distinct_to_nonnull > FRACTION_DISTINCT_TO_NONNULL_IGNORE_THRESHOLD
            or cardinality > MAXIMUM_CARDINALITY_THRESHOLD
        )

        if family == "int":
            if too_many_distinct:
                if not must_have_type and ID_NAME_REGEX.search(column):
                    return "omit"
                return "num"
            if COMMON_NUMERIC_COLUMN_NAME_REGEX.search(column):
                return "num"
            if _is_plural(column):
                return "num"
            return "cat"
        # string family
        if too_many_distinct:
            if not must_have_type and ID_NAME_REGEX.search(column):
                return "omit"
            return "text"
        return "cat"

    def guess_column_type(self, table: str, column: str) -> ColumnSpec:
        """Constraint-driven wrapper (``schema_autodetect.py:428-484``)."""
        if (table, column) in self.omit:
            return ColumnSpec("omit")

        pk = set(self.primary_keys.get(table, []))
        is_in_pk = column in pk
        is_target = (table, column) == self.target

        guessed: str | None = None
        if is_target and self.target_type is not None:
            if self.target_type not in ("cat", "num"):
                raise ValueError(f"bad target_type {self.target_type!r}")
            guessed = self.target_type
        else:
            if is_in_pk and len(pk) == 1:
                # lone PK column = pure row identifier → omit (:454-461)
                return ColumnSpec("omit", key=True)
            if column in self._non_composite_fk_columns(table):
                # non-composite FK member → omit (:463-467)
                return ColumnSpec("omit", key=is_in_pk)

        if guessed is None:
            guessed = self.do_guess_column_type(table, column, must_have_type=is_target)

        if is_target and guessed == "omit":
            raise TypeError(f"Column '{column}' in table '{table}' cannot be omitted.")

        if guessed == "cat":
            card = self.profile(table)[column].n_distinct
            return ColumnSpec("cat", key=is_in_pk, card=card)
        return ColumnSpec(guessed, key=is_in_pk)

    def guess_schema(self) -> DBSchema:
        """Infer specs for every column of every table
        (``schema_autodetect.py:486-508``)."""
        self.prefetch_profiles()
        schema = DBSchema()
        for table in self.tables:
            cols = {
                c: self.guess_column_type(table, c)
                for c in [f.name for f in self.tables[table].schema.fields]
            }
            schema.tables[table] = TableSpec(
                columns=cols, foreign_keys=list(self.foreign_keys.get(table, []))
            )
        if self.post_guess_schema_hook is not None:
            self.post_guess_schema_hook(schema)
        return schema
