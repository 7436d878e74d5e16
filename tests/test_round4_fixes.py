"""Round-4 correctness fixes (ADVICE r3).

- term_stats driver cache eviction must not drop terms requested in the
  SAME call (a silent miss made an AND/phrase term look absent and
  search() returned empty);
- row-store generation ids must never regress onto occupied docs_dir
  partitions after a retention prune drops every live index generation.
"""

import datetime as dt
import os

from pyspark.sql import functions as F

from aspublic_spark.index.build import IndexBuilder
from aspublic_spark.query.engine import SearchEngine
from aspublic_spark.streaming.ingest import StreamingIngest
from aspublic_spark.tables import fixture_transcripts


def test_term_stats_eviction_keeps_same_call_terms(spark, workdir):
    idx = os.path.join(workdir, "ts_evict_idx")
    b = IndexBuilder(
        spark, idx, key_cols=["conv_id", "turn_idx"], text_col="text",
        meta_cols=["role", "tool", "ts"], n_slices=2, block_size=8,
    )
    b.build(fixture_transcripts(spark))
    eng = SearchEngine(spark, idx)
    # warm one term, then force the eviction path on the next call
    warm = eng.term_stats(["sample"])
    assert "sample" in warm
    eng._term_cache_max = 1
    both = eng.term_stats(["sample", "example"])
    # the bug cleared 'sample' out of the cache and silently returned it
    # as absent-from-corpus
    assert "sample" in both and "example" in both
    # and an AND search combining a warm and a cold term stays correct
    assert eng.search("sample status").df.count() > 0


def test_salt_plan_first_build_has_no_full_count_prepass(spark, workdir, monkeypatch):
    """VERDICT r3 #8: the first-build salt plan must not run a full
    count() over a (possibly expensively transformed) input — the
    row-count check has to be a bounded LIMIT probe. Spy on every
    DataFrame.count() the salt plan issues and require each to sit
    under a GlobalLimit."""
    # patch the CONCRETE class (pyspark 4 makes pyspark.sql.DataFrame an
    # abstract facade whose methods the classic implementation overrides)
    from pyspark.sql.classic.dataframe import DataFrame

    from aspublic_spark.tables import synth_transcripts

    idx = os.path.join(workdir, "salt_probe_idx")
    b = IndexBuilder(
        spark, idx, key_cols=["conv_id", "turn_idx"], text_col="text",
        meta_cols=["role", "tool", "ts"], n_slices=2, block_size=8,
        salt_max_postings=500,
    )
    df = synth_transcripts(spark, 2_000, seed=11)  # transformed lineage
    plans = []
    orig = DataFrame.count

    def spy(self):
        plans.append(self._jdf.queryExecution().optimizedPlan().toString())
        return orig(self)

    monkeypatch.setattr(DataFrame, "count", spy)
    plan = b._salt_plan(df)
    assert plans, "salt plan issued no row-count probe"
    assert all("GlobalLimit" in p for p in plans), plans
    # input (2000 rows) exceeds salt_max (500): the sample path runs and
    # the plan stays usable
    plan.collect()


def test_gen_ids_do_not_regress_after_full_prune(spark, workdir):
    idx = os.path.join(workdir, "genreg_idx")
    docs = os.path.join(workdir, "genreg_docs")
    ing = StreamingIngest(
        spark, idx, docs, index_kwargs=dict(n_slices=2, block_size=8)
    )
    first = fixture_transcripts(spark)
    assert ing.ingest_batch(first) == 6
    # retention prune far in the future drops EVERY live index generation
    ing.builder.prune_index(dt.datetime(2030, 1, 1))
    assert ing.builder._live_gens() == []
    # a fresh ingester (restart) must see docs_dir/gen=0 as occupied
    ing2 = StreamingIngest(
        spark, idx, docs, index_kwargs=dict(n_slices=2, block_size=8)
    )
    assert ing2._next_gen == 1
    second = first.withColumn("conv_id", F.lit("c2"))
    assert ing2.ingest_batch(second) == 6
    # the old row-store partition is intact, the new batch landed beside it
    gens = sorted(
        n for n in os.listdir(docs) if n.startswith("gen=")
    )
    assert gens == ["gen=0", "gen=1"]
    assert spark.read.parquet(os.path.join(docs, "gen=0")).count() == 6
    assert spark.read.parquet(os.path.join(docs, "gen=1")).count() == 6
