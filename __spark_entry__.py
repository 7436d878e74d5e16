"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes the implemented operator surface from SURVEY.md §2
over the driver-provided parquet tables; ``oracle_sql()`` gives the
DuckDB-equivalent ANSI SQL for each. The full-text queries run through
the REAL engine path (packed varint index on disk -> block-max pruned
BM25 retrieval), not a shortcut pipeline; the oracle recomputes BM25
naively in SQL (the documents corpus is single-space [a-z0-9 ] text, so
``string_split(text, ' ')`` tokenizes identically to the engine's FTS5
tokenizer).

Float policy: scores are rounded to 4 decimals on BOTH sides and used
as the ordering key with doc_id tie-break, so cross-engine last-ulp
noise cannot flip ranks or hashes. Timestamps are returned as epoch
microseconds (bigint) to avoid tz/representation drift.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aspublic_spark import BM25_B, BM25_K1
from aspublic_spark.index.build import IndexBuilder
from aspublic_spark.query.engine import SearchEngine
from aspublic_spark.query.parser import parse_websearch
from aspublic_spark.session import ensure_package

SF0001 = "/root/testdata/sf0.001"

_ENGINES: dict[str, SearchEngine] = {}


def _documents_engine(spark: SparkSession, sf_dir: str) -> SearchEngine:
    """Build (once per sf_dir) and cache the inverted index over documents."""
    key = os.path.normpath(sf_dir)
    if key in _ENGINES:
        return _ENGINES[key]
    ensure_package(spark)
    idx = os.path.join("/tmp", "aspublic_idx_" + os.path.basename(key))
    if not os.path.exists(os.path.join(idx, "index_meta.json")):
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        IndexBuilder(
            spark,
            idx,
            key_cols=["doc_id"],
            text_col="text",
            meta_cols=["lang", "source", "n_chars"],
            n_slices=4,
        ).build(docs)
    eng = SearchEngine(spark, idx)
    _ENGINES[key] = eng
    return eng


def _fts(spark, sf_dir, q, k=20, parser=None, **kw) -> DataFrame:
    eng = _documents_engine(spark, sf_dir)
    kwargs = dict(kw)
    if parser is not None:
        kwargs["parser"] = parser
    res = eng.search(q, k=k, **kwargs).df
    return (
        res.withColumn("score_r", F.round(F.col("score"), 4))
        .orderBy(F.col("score_r").desc(), F.col("doc_id").asc())
        .limit(k)
        .select(F.col("doc_id").cast("long").alias("doc_id"), F.col("score_r").alias("score"))
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 AND-query through the packed index at sf0.001."""
    return _fts(spark, SF0001, "hash join", k=50)


# ---------------------------------------------------------------------------
# oracle SQL builder for BM25 over the documents view
# ---------------------------------------------------------------------------

def _bm25_sql(
    terms: list[str],
    and_terms: list[str] | None = None,
    or_groups: list[list[str]] | None = None,
    not_terms: list[str] | None = None,
    phrase: list[str] | None = None,
    doc_filter: str | None = None,
    k: int = 20,
) -> str:
    """DuckDB SQL computing the exact same BM25 top-k as the engine."""
    all_pos = sorted(set(terms))
    in_list = ",".join(f"'{t}'" for t in all_pos)
    and_terms = and_terms or []
    not_terms = not_terms or []
    having = []
    if and_terms:
        al = ",".join(f"'{t}'" for t in sorted(set(and_terms)))
        having.append(
            f"count(distinct term) filter (where term in ({al})) = {len(set(and_terms))}"
        )
    for g in or_groups or []:
        gl = ",".join(f"'{t}'" for t in sorted(set(g)))
        having.append(f"count(*) filter (where term in ({gl})) > 0")
    having_sql = ("having " + " and ".join(having)) if having else ""
    not_sql = ""
    if not_terms:
        nl = ",".join(f"'{t}'" for t in sorted(set(not_terms)))
        not_sql = (
            f"and s.doc_id not in (select doc_id from tok where term in ({nl}))"
        )
    phrase_sql = ""
    if phrase:
        conds = " and ".join(
            f"p{i}.term = '{t}' and p{i}.pos = p0.pos + {i}" for i, t in enumerate(phrase) if i > 0
        )
        joins = " ".join(
            f"join tokpos p{i} on p{i}.doc_id = p0.doc_id" for i in range(1, len(phrase))
        )
        phrase_sql = (
            "and s.doc_id in (select distinct p0.doc_id from tokpos p0 "
            + joins
            + f" where p0.term = '{phrase[0]}' and "
            + conds
            + ")"
        )
    filt = f"and {doc_filter}" if doc_filter else ""
    return f"""
with tokpos as (
  select d.doc_id, t.term, t.pos
  from (select doc_id, string_split(text, ' ') toks from documents) d,
  lateral (select unnest(d.toks) as term, generate_subscripts(d.toks, 1) - 1 as pos) t
),
tok as (select doc_id, term from tokpos),
dl as (select doc_id, count(*) as dl from tok group by doc_id),
stats as (
  select count(*) as n_docs, avg(coalesce(l.dl, 0)) as avgdl
  from documents d left join dl l using (doc_id)
),
tf as (
  select doc_id, term, count(*) as tf from tok
  where term in ({in_list}) group by doc_id, term
),
dfreq as (
  select term, count(distinct doc_id) as df from tok
  where term in ({in_list}) group by term
),
scored as (
  select t.doc_id,
         sum(ln((s.n_docs - f.df + 0.5) / (f.df + 0.5) + 1)
             * t.tf * {BM25_K1 + 1.0}
             / (t.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * l.dl / s.avgdl))) as score
  from tf t
  join dfreq f using (term)
  join dl l using (doc_id)
  cross join stats s
  group by t.doc_id
  {having_sql}
)
select s.doc_id, round(s.score, 4) as score
from scored s join documents d on s.doc_id = d.doc_id
where true {not_sql} {phrase_sql} {filt}
order by round(s.score, 4) desc, s.doc_id asc
limit {k}
"""


# ---------------------------------------------------------------------------
# queries + oracles
# ---------------------------------------------------------------------------

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def docs(spark, sf):
        return spark.read.parquet(os.path.join(sf, "documents.parquet"))

    def events(spark, sf):
        return spark.read.parquet(os.path.join(sf, "events.parquet"))

    q: dict[str, Callable] = {}

    # -- full-text search family (Q1-Q11 of SURVEY §2.3) ----------------
    q["fts_single_term"] = lambda spark, sf: _fts(spark, sf, "dup", k=20)
    q["fts_and"] = lambda spark, sf: _fts(spark, sf, "hash join", k=20)
    q["fts_and_not"] = lambda spark, sf: _fts(spark, sf, "hash join !sort", k=20)
    q["fts_or"] = lambda spark, sf: _fts(
        spark, sf, "dup OR vector", k=20, parser=parse_websearch
    )
    q["fts_phrase"] = lambda spark, sf: _fts(spark, sf, '"hash join"', k=20)
    q["fts_filtered"] = lambda spark, sf: _fts(
        spark, sf, "table", k=20, extra_filter=F.col("lang") == "en"
    )

    # -- structured-only operators (Q6/Q7/Q10 analogs on events) --------
    def topk_recency(spark, sf):
        return (
            events(spark, sf)
            .filter(F.col("event_type") == "signup")
            .orderBy(F.col("ts").desc(), F.col("event_id").asc())
            .limit(50)
            .select(
                "event_id",
                F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_str"),
                F.round("value", 4).alias("value"),
            )
        )

    q["topk_recency"] = topk_recency

    def retention_prune_count(spark, sf):
        cutoff = "2024-03-01 00:00:00"
        return (
            events(spark, sf)
            .filter(F.col("ts") >= F.lit(cutoff).cast("timestamp"))
            .groupBy("event_type")
            .agg(F.count("*").alias("n"))
        )

    q["retention_prune_count"] = retention_prune_count

    # -- ingest-side operators (I4/I6/I7, S9) ----------------------------
    def policy_filter(spark, sf):
        # accept: lang in (en, fr); reject: text matching 'slow.*error|dup'
        d = docs(spark, sf)
        return (
            d.filter(F.col("lang").isin("en", "fr"))
            .filter(~F.col("text").rlike("slow .* error|dup"))
            .groupBy("source")
            .agg(F.count("*").alias("n_docs"))
        )

    q["policy_filter"] = policy_filter

    def dedup_exact(spark, sf):
        # exact dedup by text hash: keep min doc_id per distinct text
        d = docs(spark, sf)
        return (
            d.groupBy("text")
            .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies"))
            .filter(F.col("n_copies") > 1)
            .select("keep_id", "n_copies")
        )

    q["dedup_exact"] = dedup_exact

    def token_count_by_lang(spark, sf):
        d = docs(spark, sf)
        return (
            d.select("lang", F.size(F.split("text", " ")).alias("n_tok"))
            .groupBy("lang")
            .agg(F.sum("n_tok").alias("total_tokens"), F.count("*").alias("n_docs"))
        )

    q["token_count_by_lang"] = token_count_by_lang

    return q


def oracle_sql() -> dict[str, str]:
    o: dict[str, str] = {}
    o["fts_single_term"] = _bm25_sql(["dup"], and_terms=["dup"])
    o["fts_and"] = _bm25_sql(["hash", "join"], and_terms=["hash", "join"])
    o["fts_and_not"] = _bm25_sql(
        ["hash", "join"], and_terms=["hash", "join"], not_terms=["sort"]
    )
    o["fts_or"] = _bm25_sql(["dup", "vector"], or_groups=[["dup", "vector"]])
    o["fts_phrase"] = _bm25_sql(
        ["hash", "join"], and_terms=["hash", "join"], phrase=["hash", "join"]
    )
    o["fts_filtered"] = _bm25_sql(["table"], and_terms=["table"], doc_filter="d.lang = 'en'")

    o["topk_recency"] = """
        select event_id, strftime(ts, '%Y-%m-%d %H:%M:%S.%f') as ts_str,
               round(value, 4) as value
        from events where event_type = 'signup'
        order by ts desc, event_id asc limit 50
    """
    o["retention_prune_count"] = """
        select event_type, count(*) as n from events
        where ts >= timestamp '2024-03-01 00:00:00'
        group by event_type
    """
    o["policy_filter"] = """
        select source, count(*) as n_docs from documents
        where lang in ('en', 'fr') and not regexp_matches(text, 'slow .* error|dup')
        group by source
    """
    o["dedup_exact"] = """
        select min(doc_id) as keep_id, count(*) as n_copies
        from documents group by text having count(*) > 1
    """
    o["token_count_by_lang"] = """
        select lang, sum(len(string_split(text, ' '))) as total_tokens,
               count(*) as n_docs
        from documents group by lang
    """
    return o
