"""Structured-Streaming ingest: the streaming analog of the reference's
collector -> recorder -> DB pipeline (SURVEY §2.1 S1/S8, §2.5).

Reference semantics mapped onto Spark streaming primitives:

- websocket firehose + micro-batch buffer with 60s flush cadence
  (collector.py:144-233, recorder.py:73-120)  ->  ``readStream`` +
  ``trigger(processingTime=...)`` / ``availableNow`` + ``foreachBatch``;
- in-memory dedupe map with 600s TTL (collector.py:129-141, :757-760)
  ->  ``withWatermark(ts, '10 minutes')`` +
  ``dropDuplicatesWithinWatermark`` (state GC'd by the watermark
  exactly like the TTL eviction);
- at-least-once push + idempotent `ON CONFLICT DO NOTHING` upsert
  (collector.py:198-201 + db_sqlite.py:55-59)  ->  at-least-once
  foreachBatch + anti-join-existing append (effectively-once);
- FTS5 trigger-per-insert index maintenance (db_sqlite.py:28-41)  ->
  per-batch incremental index generation (IndexBuilder.add_documents).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aspublic_spark.index.build import IndexBuilder
from aspublic_spark.index.fsio import fs_for
from aspublic_spark.operators.filters import FilterPolicy, anti_join_existing, apply_policies
from aspublic_spark.tables import TRANSCRIPTS_SCHEMA


class StreamingIngest:
    """Micro-batch transcript ingest with dedup, policy filters, and
    incremental index maintenance."""

    def __init__(
        self,
        spark: SparkSession,
        index_dir: str,
        docs_dir: str,
        watermark: str = "10 minutes",
        accept: list[FilterPolicy] | None = None,
        reject: list[FilterPolicy] | None = None,
        index_kwargs: dict | None = None,
        dedup_horizon_days: int | None = 7,
        html_text: bool = False,
        auto_compact_gens: int | None = None,
    ):
        """``dedup_horizon_days`` bounds the cross-batch idempotency
        anti-join: the existing-keys scan reads only day partitions
        within the horizon of the batch's min ts, so per-batch cost is
        independent of corpus history (the reference bounds the same
        state with a 600 s TTL dedupe map, collector.py:757-760, and
        relies on the DB upsert's ON CONFLICT for anything older —
        here the Iceberg MERGE seam / an offline exact dedup pass plays
        that role). ``None`` scans full history (exact, unbounded)."""
        self.spark = spark
        self.index_dir = index_dir
        self.docs_dir = docs_dir
        self.keys_dir = docs_dir + "_keys"
        self.watermark = watermark
        self.accept = accept
        self.reject = reject
        self.dedup_horizon_days = dedup_horizon_days
        # html_text=True runs the collector's HTML->text normalize stage
        # (collector.py:102, ignore_links + body_width=0) on ingest
        self.html_text = html_text
        # compact the index when the generation count reaches this bound
        # (many small per-batch segments make query scans open many
        # files; batches are serialized inside foreachBatch, so the
        # offline-op constraint holds during the stream)
        self.auto_compact_gens = auto_compact_gens
        self.builder = IndexBuilder(spark, index_dir, **(index_kwargs or {}))
        # docs_dir may live on a different store than the index
        self.fs = fs_for(docs_dir, spark)
        # the row store is gen=N partitioned (idempotent per-batch
        # overwrite). A docs_dir with FLAT parquet files at its root is
        # a pre-gen-layout deployment: writing gen dirs next to flat
        # files would duplicate rows AND break partition discovery for
        # every reader, so refuse loudly before any write happens.
        if self.fs.isdir(docs_dir):
            flat = [
                n for n in self.fs.listdir(docs_dir)
                if not n.startswith(("gen=", "_", "."))
            ]
            if flat:
                raise ValueError(
                    f"docs_dir {docs_dir} holds a flat (pre-generation) "
                    "row-store layout; migrate by moving the existing "
                    f"files into {docs_dir}/gen=0/ before ingesting"
                )
        self._next_gen = self._detect_next_gen()
        # exact post-dedup row count across this instance's batches —
        # unlike recentProgress (capped at the last ~100 updates), this
        # never undercounts a long-lived stream
        self.rows_ingested_total = 0

    def _detect_next_gen(self) -> int:
        """Max over BOTH the index generations and the row-store's
        existing gen= partitions: after a retention prune drops every
        live index generation, ids must not restart at 0 and clobber
        occupied docs_dir partitions (docs_dir is never pruned)."""
        nxt = self.builder._next_gen_id()
        for name in self.fs.listdir(self.docs_dir):
            if name.startswith("gen="):
                try:
                    nxt = max(nxt, int(name.split("=", 1)[1]) + 1)
                except ValueError:
                    continue
        return nxt

    # -- batch core (shared by the streaming sink and batch backfill) ----
    def _staging_dir(self, gen: int) -> str:
        return os.path.join(self.docs_dir + "_staging", f"gen_{gen}")

    def _finish_staged(self, gen: int) -> int:
        """Append + index one staged generation; every step idempotent:
        the docs append is guarded by a marker (Spark's output commit
        makes the append itself all-or-nothing), and add_documents
        resumes from its per-slice manifests."""
        staged = self._staging_dir(gen)
        new = self.spark.read.parquet(staged)
        n = new.count()
        if not n:
            self.fs.delete(staged, recursive=True)
            return 0
        # row store lands in a per-generation partition via OVERWRITE —
        # a replayed recovery rewrites the same directory instead of
        # appending twice (the old append had a duplicate window between
        # job commit and its marker write). Readers see a `gen` int
        # partition column (the Iceberg-snapshot analog).
        new.write.mode("overwrite").parquet(
            os.path.join(self.docs_dir, f"gen={gen}")
        )
        kmarker = os.path.join(staged, "_KEYS_APPENDED")
        if not self.fs.exists(kmarker):
            # day-partitioned key sidecar: the dedup anti-join reads
            # only recent partitions (partition pruning on `day`)
            new.select(
                "conv_id", "turn_idx", F.to_date("ts").alias("day")
            ).write.mode("append").partitionBy("day").parquet(self.keys_dir)
            self.fs.write_file_atomic(kmarker, "")
        self.builder.add_documents(new, gen=gen)
        # the staged copy exists ONLY for crash recovery; once the
        # generation is fully committed it must go — otherwise a later
        # compact()/prune_index() (which clears per-gen manifests)
        # would make recover() re-index long-finished batches and
        # double-count every doc in them
        self.fs.delete(staged, recursive=True)
        return n

    def recover(self):
        """Finish any staged batches whose append/indexing was interrupted
        (at-least-once delivery + this recovery = effectively-once), and
        repair index generations with missing derived state (damaged
        pack output, compact/prune interrupted after their markers)."""
        root = self.docs_dir + "_staging"
        for name in self.fs.listdir(root):
            if not name.startswith("gen_"):
                continue
            path = os.path.join(root, name)
            if name.endswith("_pre"):
                # pre-dedup scratch from an interrupted batch: the
                # source will redeliver it (at-least-once), discard
                self.fs.delete(path, recursive=True)
                continue
            if not self.fs.exists(os.path.join(path, "_SUCCESS")):
                # the staging WRITE itself was interrupted (only Spark's
                # _temporary scratch inside): unreadable and incomplete —
                # discard like the _pre dirs, the at-least-once source
                # redelivers the batch (ADVICE r2)
                self.fs.delete(path, recursive=True)
                continue
            gen = int(name.split("_")[1])
            self._finish_staged(gen)
            self._next_gen = max(self._next_gen, gen + 1)
        self.builder.repair()
        self._next_gen = max(self._next_gen, self._detect_next_gen())

    def ingest_batch(self, batch_df: DataFrame, epoch_id: int | None = None) -> int:
        self.recover()
        df = batch_df
        if self.html_text:
            from aspublic_spark.functions.html import html_text_udf

            df = df.withColumn("text", html_text_udf(F.col("text")))
        if self.accept or self.reject:
            df = apply_policies(df, "conv_id", ["text"], self.accept, self.reject)
        # Materialize the normalized/filtered batch ONCE (HTML and regex
        # policies are the expensive lineage); the batch's min ts rides
        # the same write as an observed metric, so no extra action.
        # Staging also SEVERS LINEAGE: the anti-join below references
        # on-disk state this batch will append to, and a later
        # re-evaluation of an un-severed plan would anti-join the new
        # rows against themselves.
        from pyspark.sql import Observation

        gen = self._next_gen
        pre_dir = self._staging_dir(gen) + "_pre"
        obs = Observation(f"ingest_g{gen}")
        df.observe(obs, F.min("ts").alias("mn")).write.mode("overwrite").parquet(
            pre_dir
        )
        mn = obs.get["mn"]
        staged_pre = self.spark.read.parquet(pre_dir)

        # idempotent upsert: drop keys already present (exactly-once
        # effect under at-least-once delivery). The existing side is the
        # day-partitioned key sidecar pruned to the dedup horizon, so
        # this scan does NOT grow with corpus history.
        existing = None
        if self.fs.isdir(self.keys_dir):
            existing = self.spark.read.parquet(self.keys_dir)
            if self.dedup_horizon_days is not None and mn is not None:
                from datetime import timedelta

                horizon = (mn - timedelta(days=self.dedup_horizon_days)).date()
                # NULL-ts keys land in the null day partition; they have
                # no date to age out by, so they stay in-scope forever —
                # otherwise a redelivered NULL-ts doc would double-index
                existing = existing.filter(
                    (F.col("day") >= F.lit(horizon)) | F.col("day").isNull()
                )
        elif self.fs.isdir(self.docs_dir):
            # legacy layout without the sidecar: full-history scan
            existing = self.spark.read.parquet(self.docs_dir)
        new = staged_pre
        if existing is not None:
            new = anti_join_existing(
                new, existing.select("conv_id", "turn_idx"), ["conv_id", "turn_idx"]
            )
        new.write.mode("overwrite").parquet(self._staging_dir(gen))
        self.fs.delete(pre_dir, recursive=True)
        n = self._finish_staged(gen)
        self.rows_ingested_total += n
        if n:
            self._next_gen += 1
        if self.auto_compact_gens and self._next_gen and n:
            if len(self.builder._live_gens()) >= self.auto_compact_gens:
                self.builder.compact()
                self._next_gen = self._detect_next_gen()
        return n

    def prune_keys(self, older_than) -> int:
        """Drop key-sidecar day partitions older than ``older_than`` (a
        date): they are never read once outside every future batch's
        dedup horizon — directory-level delete, no Spark job. Returns
        the number of partitions removed. The NULL day partition is
        never pruned (NULL-ts keys stay dedup-visible forever)."""
        from datetime import date

        cutoff = older_than if isinstance(older_than, date) else older_than.date()
        removed = 0
        for name in self.fs.listdir(self.keys_dir):
            if not name.startswith("day="):
                continue
            try:
                d = date.fromisoformat(name.split("=", 1)[1])
            except ValueError:
                continue
            if d < cutoff:
                self.fs.delete(os.path.join(self.keys_dir, name), recursive=True)
                removed += 1
        return removed

    # -- streaming wiring --------------------------------------------------
    def start_from_stream(
        self,
        stream: DataFrame,
        checkpoint_dir: str,
        available_now: bool = True,
        processing_time: str = "60 seconds",
    ):
        """Attach the ingest pipeline to ANY streaming DataFrame with
        the transcript schema — kafka (`readStream.format("kafka")` +
        from_json projection), socket, rate, or file sources all reach
        the same observe -> watermark -> dedup -> foreachBatch plan.
        Each micro-batch reports the listenerStats counters
        (received / unique_approx / last_event_ts, ap_types.py:22-32)
        via the query's observedMetrics["ingest"]. Incoming columns are
        re-aligned to the transcript schema by NAME first (I10,
        recorder.py:54-70): sources may send any column order/casing,
        extra columns are dropped, and a missing required field fails
        fast at PLAN time rather than corrupting the index."""
        from aspublic_spark.tables import realign_fields

        stream = realign_fields(stream)
        stream = observe_ingest(stream).withWatermark(
            "ts", self.watermark
        ).dropDuplicatesWithinWatermark(["conv_id", "turn_idx"])
        writer = stream.writeStream.foreachBatch(
            lambda bdf, eid: self.ingest_batch(bdf, eid)
        ).option("checkpointLocation", checkpoint_dir)
        if available_now:
            writer = writer.trigger(availableNow=True)
        else:
            writer = writer.trigger(processingTime=processing_time)
        return writer.start()

    def start(
        self,
        source_dir: str,
        checkpoint_dir: str,
        available_now: bool = True,
        processing_time: str = "60 seconds",
    ):
        """File-source stream (the sandbox stand-in for the websocket
        firehose; swap for kafka/socket via start_from_stream)."""
        stream = self.spark.readStream.schema(TRANSCRIPTS_SCHEMA).parquet(source_dir)
        return self.start_from_stream(
            stream, checkpoint_dir, available_now, processing_time
        )


def observe_ingest(df: DataFrame, name: str = "ingest") -> DataFrame:
    """listenerStats analog (ap_types.py:22-32): received / unique-ish
    counters exposed through df.observe -> QueryProgress metrics."""
    return df.observe(
        name,
        F.count(F.lit(1)).alias("received"),
        F.approx_count_distinct(F.concat_ws("#", "conv_id", "turn_idx")).alias("unique_approx"),
        F.max("ts").alias("last_event_ts"),
    )
