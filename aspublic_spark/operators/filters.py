"""Ingest-side filter/dedup/upsert operators (SURVEY §2.2).

Reimplements the reference's ingest policy surface as pushdown-friendly
DataFrame predicates:

- prefix/suffix list exclusion (collector.py:92-97 domain lists ->
  conv_id prefixes here): a single Catalyst `exists()` over a literal
  array, no UDF, no join for small lists;
- union-compiled regex content filter (collector.py:103-107, :961-965):
  ONE rlike with an alternation pattern, compiled once per task;
- accept/reject policy composition (recorder.py:27-50): accept-policies
  OR-ed (empty accept list = accept all), reject-policies OR-ed, final
  predicate accept AND NOT reject — default-accept / default-reject
  semantics match the recorder's;
- idempotent upsert: anti-join new keys against existing (the
  `INSERT ... ON CONFLICT(url) DO NOTHING` of db_sqlite.py:55-59);
- batch dedup with TTL semantics (collector.py:129-141): first-seen
  row wins within a key; TTL is only meaningful in streaming (see
  streaming.ingest.dedup_within_watermark).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


@dataclass
class FilterPolicy:
    """One accept or reject policy: prefix list + regex list.

    A row matches the policy if its key column starts with any prefix
    OR its text matches any regex (case-insensitive, like the
    recorder's lower-cased matching)."""

    prefixes: list[str] = field(default_factory=list)
    patterns: list[str] = field(default_factory=list)

    def matches(self, key_col: Column, text_cols: list[Column]) -> Column:
        cond = F.lit(False)
        if self.prefixes:
            arr = F.array(*[F.lit(p) for p in self.prefixes])
            cond = cond | F.exists(arr, lambda p: key_col.startswith(p))
        if self.patterns:
            union = "|".join(f"(?:{p})" for p in self.patterns)
            for tc in text_cols:
                cond = cond | F.lower(F.coalesce(tc, F.lit(""))).rlike(union)
        return cond


def apply_policies(
    df: DataFrame,
    key_col: str,
    text_cols: list[str],
    accept: list[FilterPolicy] | None = None,
    reject: list[FilterPolicy] | None = None,
) -> DataFrame:
    """recorder.py:27-50 semantics: with accept policies, a row must
    match at least one (default-reject); reject policies then remove
    matches (reject wins on conflict)."""
    kc = F.col(key_col)
    tcs = [F.col(c) for c in text_cols]
    pred = F.lit(True)
    if accept:
        acc = F.lit(False)
        for p in accept:
            acc = acc | p.matches(kc, tcs)
        pred = pred & acc
    for p in reject or []:
        pred = pred & ~p.matches(kc, tcs)
    return df.filter(pred)


def suffix_exclusion(df: DataFrame, col: str, suffixes: list[str]) -> DataFrame:
    """Domain-suffix exclusion (collector.py:92-97) as one exists()."""
    if not suffixes:
        return df
    arr = F.array(*[F.lit(s) for s in suffixes])
    return df.filter(~F.exists(arr, lambda s: F.col(col).endswith(s)))


def regex_exclusion(df: DataFrame, text_col: str, patterns: list[str]) -> DataFrame:
    """Union-compiled regex content filter (collector.py:961-965)."""
    if not patterns:
        return df
    union = "|".join(f"(?:{p})" for p in patterns)
    return df.filter(~F.coalesce(F.col(text_col), F.lit("")).rlike(union))


def anti_join_existing(new_df: DataFrame, existing: DataFrame, keys: list[str]) -> DataFrame:
    """Idempotent-upsert guard: keep only rows whose key is not already
    present (ON CONFLICT DO NOTHING, db_sqlite.py:55-59)."""
    return new_df.join(existing.select(*keys).distinct(), list(keys), "left_anti")


def first_seen_dedup(df: DataFrame, keys: list[str], order_col: str) -> DataFrame:
    """Batch analog of the collector's dedupe map: the earliest row per
    key survives (deterministic, unlike dropDuplicates' arbitrary pick)."""
    w = Window.partitionBy(*keys).orderBy(F.col(order_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    )
