package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}
import graft.olap.StarSchema

/** Structured-Streaming CDC pipeline — the streaming form of the reference's
  * LISTEN/NOTIFY worker (worker_sync.py:42-108): a change stream of events is
  * consumed continuously, windowed aggregates maintain the OLAP rollups, and
  * a foreachBatch SCD1 merge keeps the latest-state table current.
  *
  * The batch operators in `graft.ops.Events` and `StarSchema.scd1Latest` are
  * reused verbatim — one set of semantics, two execution modes.
  */
object EventsCdc {

  /** File-based change stream: the `events` parquet schema consumed as a
    * stream (each new file under `dir` is a micro-batch — the parquet
    * analogue of the NOTIFY queue). `maxFilesPerTrigger` > 0 caps files per
    * micro-batch (deterministic replay in specs; backpressure in prod). */
  def readEventStream(spark: SparkSession, dir: String, schemaFrom: DataFrame,
                      maxFilesPerTrigger: Int = 0): DataFrame = {
    val reader = spark.readStream.schema(schemaFrom.schema)
    (if (maxFilesPerTrigger > 0)
       reader.option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
     else reader).parquet(dir)
  }

  /** The reference worker's FULL loop (worker_sync.py:71-108) as one
    * streaming pipeline: file-arrival change stream → exactly-once guard →
    * tombstone-aware SCD1 state maintenance. Each new file plays a NOTIFY
    * delivery; [[dedupStream]] absorbs the at-least-once re-deliveries a
    * real queue/file source produces; the [[runScd1]] merge keeps the
    * newest row per key with deletes preserved as tombstones (read the live
    * view via [[graft.olap.StarSchema.live]]). One call, continuously
    * current state — the library form of the worker process. */
  def runWorker(spark: SparkSession, srcDir: String, schemaFrom: DataFrame,
                stateDir: String, checkpointDir: String,
                keys: Seq[String] = Seq("user_id"),
                dedupDelay: String = "2 hours",
                maxFilesPerTrigger: Int = 0,
                trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    runScd1(spark,
      dedupStream(readEventStream(spark, srcDir, schemaFrom, maxFilesPerTrigger),
                  dedupDelay),
      stateDir, checkpointDir, keys, trigger)

  /** Watermarked tumbling-window aggregation: the streaming mirror of
    * `Events.windowed`. The watermark bounds state — windows older than
    * `delay` are finalized and evicted, so state size is O(active windows ×
    * event types) regardless of stream length. */
  def windowedCounts(events: DataFrame, every: String = "1 hour",
                     delay: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), every), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           graft.queries.Exact.dsum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
              col("n_events"), col("sum_value"))

  /** One SCD1 merge step: newest row per key across (current state ∪ batch).
    * Exposed for both the streaming sink below and direct batch use.
    * Schema evolution per the [[graft.sources.SchemaEvolution]] contract:
    * a WIDENED batch (column added upstream) merges — standing rows carry
    * NULL for the new column; a NARROWED or retyped batch refuses loudly
    * before any state is written. */
  def mergeStep(state: Option[DataFrame], batch: DataFrame,
                keys: Seq[String]): DataFrame = {
    val all = state.map { st =>
      graft.sources.SchemaEvolution
        .requireEvolvable(st.schema, batch.schema, "SCD1 mergeStep")
      st.unionByName(batch, allowMissingColumns = true)
    }.getOrElse(batch)
    StarSchema.scd1Latest(all, keys, Seq(col("ts").desc, col("event_id").desc))
  }

  /** State-version directories (`v=N`) under `stateDir`, resolved through
    * the Hadoop FileSystem API so the same listing works on HDFS/S3A/local
    * — `java.io.File` would silently return nothing on a cluster filesystem
    * and every merge would run against empty state. */
  private[graft] def stateVersions(spark: SparkSession,
                                       stateDir: String): Seq[Long] = {
    val p = new org.apache.hadoop.fs.Path(stateDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
      .map(_.getPath.getName.stripPrefix("v=").toLong)
  }

  /** foreachBatch SCD1 merge into a versioned parquet state directory:
    * batch N writes `v=N` from `v=N-1 ∪ batch` (last-write-wins per key).
    * Versioned writes keep the merge idempotent under micro-batch replay —
    * re-running batch N simply overwrites `v=N` with identical content.
    * (A transactional table format would replace the versioning in a real
    * deployment; the merge semantics are the deliverable here.) */
  def scd1MergeBatch(spark: SparkSession, stateDir: String, keys: Seq[String])
                    (batch: DataFrame, batchId: Long): Unit = {
    val versions = stateVersions(spark, stateDir).filter(_ < batchId)
    val state =
      if (versions.isEmpty) None
      else Some(spark.read.parquet(s"$stateDir/v=${versions.max}"))
    mergeStep(state, batch, keys)
      .write.mode("overwrite").parquet(s"$stateDir/v=$batchId")
  }

  /** Launch the CDC pipeline: change stream → SCD1 state maintenance. */
  def runScd1(spark: SparkSession, events: DataFrame, stateDir: String,
              checkpointDir: String, keys: Seq[String] = Seq("user_id"),
              trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    events.writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch(scd1MergeBatch(spark, stateDir, keys) _)
      .start()

  /** SCD1 merge as a full-outer join pick — the CO-LOCATED form of
    * [[mergeStep]] for a bucketed state table. [[mergeStep]] unions the
    * state with the batch and re-windows, which hash-shuffles the FULL
    * state every micro-batch; at 100 TB the state dwarfs every batch, so
    * that recurring shuffle IS the pipeline's cost. Here the state never
    * moves: with state bucketed on `keys`
    * ([[graft.sources.FileFormats.writeBucketed]]), the full-outer
    * sort-merge join plans NO Exchange on the state side — only the small
    * batch shuffles to the bucket layout. Per key, the newer of (state row,
    * newest batch row) wins under the same (`tsCol` desc, `tieCol` desc)
    * order as [[mergeStep]]; tombstones survive like any other row.
    * Assumes `tsCol` is non-null on arriving rows (event streams carry an
    * event time) and state holds one row per key (the SCD1 invariant). */
  def mergeStepCoLocated(state: DataFrame, batch: DataFrame, keys: Seq[String],
                         tsCol: String = "ts",
                         tieCol: String = "event_id"): DataFrame = {
    // evolution gate + widen (SchemaEvolution contract): a widened batch
    // is admitted — the standing side gains the new columns as NULL via a
    // PROJECTION over the bucketed scan, which preserves its output
    // partitioning, so the merge stays exchange-free on the state side; a
    // narrowed/retyped batch refuses loudly here, before any write
    val added = graft.sources.SchemaEvolution
      .requireEvolvable(state.schema, batch.schema, "SCD1 co-located merge")
    val st = graft.sources.SchemaEvolution.widen(state, batch.schema)
    val nonKeys = state.columns.toSeq.filterNot(keys.contains) ++
      added.map(_.name)
    val batchLatest = StarSchema
      .scd1Latest(batch, keys, Seq(col(tsCol).desc, col(tieCol).desc))
      .select(keys.map(col) ++ nonKeys.map(c => col(c).as(s"__b_$c")): _*)
    val takeBatch = col(s"__b_$tsCol").isNotNull &&
      (col(tsCol).isNull || col(s"__b_$tsCol") > col(tsCol) ||
       (col(s"__b_$tsCol") === col(tsCol) && col(s"__b_$tieCol") >= col(tieCol)))
    st.join(batchLatest, keys, "full_outer")
      .select(keys.map(col) ++ nonKeys.map(c =>
        when(takeBatch, col(s"__b_$c")).otherwise(col(c)).as(c)): _*)
  }

  /** foreachBatch SCD1 merge over versioned BUCKETED state — the sink
    * SURVEY §4 promises: batch N reads external table `${table}_v${N-1}`
    * (bucketed + sorted on `keys` at `$statePath/v=${N-1}`) and writes
    * `${table}_v$N` through the bucketed sink, so every merge's expensive
    * side is exchange-free and the bucket layout is paid once per version
    * write, never re-derived at read time. Overwrite keeps replays
    * idempotent exactly as [[scd1MergeBatch]]; `retain` bounds growth —
    * re-running batch N needs only v=N-1, so older versions' tables are
    * dropped and their directories deleted (Hadoop FS, so HDFS/S3A work). */
  def scd1MergeBatchBucketed(spark: SparkSession, stateTable: String,
                             statePath: String, keys: Seq[String],
                             buckets: Int, retain: Int = 2)
                            (batch: DataFrame, batchId: Long): Unit = {
    val versions = stateVersions(spark, statePath).filter(_ < batchId)
    val merged =
      if (versions.isEmpty) mergeStep(None, batch, keys)
      else {
        // catalog miss (fresh session over surviving state dirs): fall back
        // to the plain parquet read — correct, just not exchange-free for
        // this one batch; the version written below restores the layout
        val prev = s"${stateTable}_v${versions.max}"
        val state =
          if (spark.catalog.tableExists(prev)) spark.table(prev)
          else spark.read.parquet(s"$statePath/v=${versions.max}")
        mergeStepCoLocated(state, batch, keys)
      }
    merged.write.mode("overwrite")
      .option("path", s"$statePath/v=$batchId")
      .format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(s"${stateTable}_v$batchId")
    versions.sorted.dropRight(math.max(retain - 1, 0)).foreach { v =>
      spark.sql(s"DROP TABLE IF EXISTS ${stateTable}_v$v")
      val p = new org.apache.hadoop.fs.Path(s"$statePath/v=$v")
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  /** [[runWorker]] with the bucketed state sink: the full worker loop whose
    * per-batch merge never shuffles the state side. */
  def runWorkerBucketed(spark: SparkSession, srcDir: String,
                        schemaFrom: DataFrame, stateTable: String,
                        statePath: String, checkpointDir: String,
                        keys: Seq[String] = Seq("user_id"), buckets: Int = 32,
                        dedupDelay: String = "2 hours",
                        maxFilesPerTrigger: Int = 0,
                        trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    dedupStream(readEventStream(spark, srcDir, schemaFrom, maxFilesPerTrigger),
                dedupDelay)
      .writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch(
        scd1MergeBatchBucketed(spark, stateTable, statePath, keys, buckets) _)
      .start()

  /** One micro-batch of the JDBC worker: reduce the batch to its newest
    * row per key FIRST (a batch carrying several versions of a key must
    * apply only the last — applying them as separate statements would
    * race across executor connections), then split on the tombstone
    * predicate: survivors upsert with the NEWEST-WINS guard
    * ([[graft.sources.Jdbc.upsertSql]] guardCols), tombstoned keys
    * DELETE. The key sets are disjoint by construction (one row per key
    * after the reduction), so the two statements cannot contend.
    *
    * Replay posture: an engine retry or source redelivery re-applies the
    * same reduced rows — upserts are value-idempotent, the guard stops a
    * replayed OLDER row from clobbering newer table state, and deleting
    * an absent key is a no-op. The one semantic difference from the
    * parquet state sink: a DELETE leaves no tombstone ROW in the table,
    * so an upsert for that key arriving LATER than its delete re-inserts
    * — the reference worker's exact semantics (worker_sync.py:96-101);
    * use [[runWorker]]'s parquet state when resurrect-proof tombstones
    * matter. */
  def scd1JdbcBatch(conn: graft.sources.Jdbc.ConnInfo, table: String,
                    keys: Seq[String], deleteWhen: org.apache.spark.sql.Column,
                    tsCol: String = "ts", tieCol: String = "event_id")
                   (batch: DataFrame, batchId: Long): Unit = {
    val latest = StarSchema
      .scd1Latest(batch, keys, Seq(col(tsCol).desc, col(tieCol).desc))
      .persist()
    // NULL-safe split: a row where deleteWhen evaluates to NULL (e.g. a
    // NULL event_type under the default === "error" predicate) is not a
    // tombstone — it must land in the upsert branch, not vanish from both
    val isDelete = coalesce(deleteWhen, lit(false))
    try {
      graft.sources.Jdbc.upsert(latest.filter(!isDelete), conn, table, keys,
        guardCols = Seq(tsCol, tieCol))
      graft.sources.Jdbc.deleteKeys(latest.filter(isDelete), conn, table, keys)
    } finally latest.unpersist(blocking = false)
  }

  /** The reference worker's LITERAL deployment shape (worker_sync.py:
    * 96-108): change stream → exactly-once guard → tombstone-aware upsert
    * into a LIVE JDBC OLAP database — [[runWorker]] with the warehouse,
    * not a parquet directory, as the state. Composes [[dedupStream]] with
    * [[scd1JdbcBatch]] under foreachBatch; delivery is at-least-once into
    * an idempotent apply, i.e. effectively-once for the table state. */
  def runWorkerJdbc(spark: SparkSession, srcDir: String, schemaFrom: DataFrame,
                    conn: graft.sources.Jdbc.ConnInfo, table: String,
                    checkpointDir: String,
                    keys: Seq[String] = Seq("user_id"),
                    deleteWhen: org.apache.spark.sql.Column =
                      col("event_type") === "error",
                    dedupDelay: String = "2 hours",
                    maxFilesPerTrigger: Int = 0,
                    trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    dedupStream(readEventStream(spark, srcDir, schemaFrom, maxFilesPerTrigger),
                dedupDelay)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch(scd1JdbcBatch(conn, table, keys, deleteWhen) _)
      .start()

  /** Stream-stream interval join — the streaming twin of the batch
    * `range_join`: each event joined to the SAME user's events strictly
    * within the following `window`. Both sides carry watermarks and the
    * join condition bounds event-time distance, which is what lets Spark
    * evict buffered rows once the watermark passes their match window —
    * state is O(events per window), not the stream's history. Inner join
    * ⇒ append output: a pair emits as soon as both rows have arrived. */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   key: String = "user_id", window: String = "30 minutes",
                   delay: String = "2 hours"): DataFrame = {
    val a = left.withWatermark("ts", delay).select(
      col(key).as("a_key"), col("ts").as("a_ts"),
      col("event_id").as("a_event_id"))
    val b = right.withWatermark("ts", delay).select(
      col(key).as("b_key"), col("ts").as("b_ts"),
      col("event_id").as("b_event_id"), col("value").as("b_value"))
    a.join(b,
      col("a_key") === col("b_key") &&
        col("b_ts") > col("a_ts") &&
        col("b_ts") <= col("a_ts") + expr(s"INTERVAL $window"))
  }

  /** Streaming exact dedup — the at-least-once guard in front of every
    * CDC/file/queue source: duplicate event_ids (source replays, task
    * retries, re-listed files) are dropped within the watermark horizon,
    * so state is bounded by the delay window instead of accreting every id
    * ever seen (what a plain streaming dropDuplicates would do). Choose
    * `delay` >= the source's maximum replay lag; replays older than the
    * horizon re-emit — the downstream SCD1 merge is idempotent to absorb
    * exactly that. */
  def dedupStream(events: DataFrame, delay: String = "2 hours"): DataFrame =
    events.withWatermark("ts", delay).dropDuplicatesWithinWatermark("event_id")

  /** One liveness/health row per streaming query — the library form of the
    * reference worker's heartbeat file (worker_sync.py:63-70 writes
    * `worker_status.json` with state + timestamp on an interval). Values
    * come from `StreamingQuery.lastProgress`, so this is metadata-only: no
    * job runs, safe to poll on any cadence. A monitoring loop can write
    * this DataFrame to its status sink as-is. */
  final case class StreamHealth(
      query_name: String,
      query_id: String,
      is_active: Boolean,
      last_batch_id: Long,
      num_input_rows: Long,
      total_state_rows: Long,
      last_progress_ts: String)

  /** Streaming sketch-table maintenance — the streaming twin of
    * [[graft.ops.Sketches]]: every micro-batch APPENDS one HLL sketch row
    * per bucket (tagged with the batch id) to the sketch table; readers
    * answer distinct-count questions over any bucket subset by merging
    * sketches ([[graft.ops.Sketches.mergedEstimate]]) — history is never
    * rescanned, and the per-batch write is a blind append (no
    * read-modify-write, no streaming state). Replay-robust where it
    * matters: a re-delivered batch unions in the SAME key set, and HLL
    * union is idempotent — the distinct estimate is unaffected (the
    * additive `n_rows` column double-counts on replay; treat it as
    * at-least-once telemetry, the sketch as the truth). */
  def runDistinctSketches(stream: DataFrame, sketchDir: String,
                          checkpointDir: String,
                          bucketCol: String, keyCol: String, lgK: Int = 14,
                          trigger: Trigger = Trigger.AvailableNow())
      : StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        StateSink.appendIdempotent(
          graft.ops.Sketches.distinctSketch(batch, col(bucketCol), col(keyCol), lgK),
          batchId, sketchDir)
        ()
      }
      .start()

  /** Native `session_window` sessionization as a STREAMING aggregation —
    * Spark's built-in session state next to the custom
    * flatMapGroupsWithState `StreamingSessionize`: the IDENTICAL
    * aggregate shape to the batch `Events.sessionizeNative`, plus a
    * watermark; append mode emits each session once the watermark passes
    * its close (last event + gap). The built-in operator gives
    * merge-on-late-event and state eviction for free — the custom twin
    * exists for session shapes the built-in cannot express (emit-on-
    * update, per-user caps). */
  def sessionizeNativeStream(events: DataFrame, gap: String = "30 minutes",
                             delay: String = "2 hours"): DataFrame =
    graft.ops.Events.sessionizeNative(events.withWatermark("ts", delay), gap)

  /** Streaming Bloom-filter maintenance — the membership member of the
    * streaming sketch family next to [[runDistinctSketches]]: every
    * micro-batch APPENDS its (bucket, bit) set-bit rows to the filter
    * table; readers probe any bucket subset by merging rows (bit union,
    * [[graft.ops.Sketches.bloomProbe]]). Like the HLL twin — and unlike
    * the Misra-Gries / Count-Min counters — bit union is IDEMPOTENT, so
    * a re-delivered batch changes nothing and the no-false-negative
    * guarantee is replay-robust under at-least-once delivery. */
  def runBloomSketches(stream: DataFrame, sketchDir: String,
                       checkpointDir: String,
                       bucketCol: String, itemCol: String,
                       k: Int = 3, bits: Int = 65536,
                       trigger: Trigger = Trigger.AvailableNow())
      : StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        StateSink.appendIdempotent(
          graft.ops.Sketches.bloomSketch(
            batch, col(bucketCol), col(itemCol), k, bits),
          batchId, sketchDir)
        ()
      }
      .start()

  /** Streaming heavy-hitters maintenance — the Misra-Gries member of the
    * streaming sketch family next to [[runDistinctSketches]]: every
    * micro-batch APPENDS one ≤k-counter MG summary row per bucket (shard =
    * batch id) to the sketch table; readers answer top-item questions over
    * any bucket subset by merging rows
    * ([[graft.ops.Sketches.heavyHittersMerged]]) — blind appends, no
    * read-modify-write, no streaming state. Replay caveat (weaker than the
    * HLL twin): MG merge ADDS counts, so a re-delivered batch inflates
    * both the counters and the recorded `n_items` total — the
    * f − n/(k+1) ≤ ĉ ≤ f guarantee keeps holding against the RECORDED
    * at-least-once weight n, the frequencies it bounds are of the
    * replayed stream. Exactly-once sinks (or dedup upstream, see the
    * streaming-dedup operator) restore true-stream semantics. */
  def runHeavyHitterSketches(stream: DataFrame, sketchDir: String,
                             checkpointDir: String,
                             bucketCol: String, itemCol: String, k: Int = 64,
                             trigger: Trigger = Trigger.AvailableNow())
      : StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        StateSink.appendIdempotent(
          graft.ops.Sketches.heavyHitterSketch(
            batch, col(bucketCol), lit(batchId), col(itemCol), k),
          batchId, sketchDir, idCol = "shard")
        ()
      }
      .start()

  /** One SCD2 merge step — the streaming application of
    * [[graft.olap.StarSchema.scd2History]]'s contract: the state's CLOSED
    * interval rows pass through UNTOUCHED (history is immutable — at scale
    * this slice is an append-only table that never rewrites); each key's
    * OPEN row is closed at its first batch change (`valid_to_us` = the
    * change's timestamp, `is_current` = false); the batch's own changes
    * become the key's next versions (ordinals continue from the open
    * row's), the last one per key open/current. A DELETE is a change row
    * like any other — the tombstone version becomes current, ending the
    * interval; point-in-time lookups before the delete still resolve and
    * the live view excludes the key (no resurrection).
    *
    * Work per batch is batch-sized plus the touched keys' open rows —
    * never closed history. Assumes IN-ORDER batches (every change in
    * batch N is `(tsUs, tie)`-after the state's open row for its key —
    * the CDC worker contract; [[dedupStream]] upstream absorbs
    * redelivery). With in-order batches the result is IDENTICAL to
    * running scd2History over the concatenated change log (spec-pinned).
    */
  /** The four columns [[graft.olap.StarSchema.scd2History]] adds to the
    * change rows — excluded from the evolution gate's standing anchor
    * (the arriving batch is raw changes and never carries them). */
  private val Scd2Meta =
    Set("version", "valid_from_us", "valid_to_us", "is_current")

  /** SCD2 evolution gate + widen: enforce the
    * [[graft.sources.SchemaEvolution]] contract between the standing
    * history's DATA columns and the batch, then widen the standing frame
    * with any added columns (historical versions predate the column, so
    * NULL is the honest value). */
  private def scd2Evolve(state: DataFrame, batch: DataFrame): DataFrame = {
    graft.sources.SchemaEvolution.requireEvolvable(
      org.apache.spark.sql.types.StructType(
        state.schema.fields.filterNot(f => Scd2Meta(f.name))),
      batch.schema, "SCD2 merge")
    graft.sources.SchemaEvolution.widen(state, batch.schema)
  }

  def scd2MergeStep(state: Option[DataFrame], batch: DataFrame,
                    keys: Seq[String], tsUsCol: String = "ts_us",
                    tieCol: String = "event_id"): DataFrame = {
    state match {
      case None => StarSchema.scd2History(batch, keys, col(tsUsCol),
        Seq(col(tsUsCol), col(tieCol)))
      case Some(st0) =>
        val st = scd2Evolve(st0, batch)
        st.filter(!col("is_current")).unionByName(
          scd2MergeOpen(st.filter(col("is_current")), batch,
            keys, tsUsCol, tieCol))
    }
  }

  /** The open-side algebra of [[scd2MergeStep]], touching ONLY the open
    * rows and the batch — the closed slice never enters the plan. Returns
    * the touched keys' full new version runs: previously-open rows now
    * closed at their key's first batch change, plus the batch's own
    * versions (ordinals continued), last one per key current. */
  private def scd2MergeOpen(open0: DataFrame, batch: DataFrame,
                            keys: Seq[String], tsUsCol: String,
                            tieCol: String): DataFrame = {
    // gate + widen here as well: the split sink calls this directly with
    // the open slice read from disk (idempotent when the caller already
    // widened — widen of a covered schema is the identity)
    val open = scd2Evolve(open0, batch)
    val batchHist = StarSchema.scd2History(batch, keys, col(tsUsCol),
      Seq(col(tsUsCol), col(tieCol)))
    val firsts = batch.groupBy(keys.map(col): _*)
      .agg(min(col(tsUsCol)).as("__first_ts"))
    val openMerged = open.join(firsts, keys, "left")
      .withColumn("valid_to_us",
        coalesce(col("__first_ts"), col("valid_to_us")))
      .withColumn("is_current", col("__first_ts").isNull)
      .drop("__first_ts")
    val base = open.select(
      (keys.map(col) :+ col("version").as("__base_version")): _*)
    val shifted = batchHist.join(base, keys, "left")
      .withColumn("version",
        col("version") + coalesce(col("__base_version"), lit(0)))
      .drop("__base_version")
    openMerged.unionByName(shifted)
  }

  /** foreachBatch SCD2 merge into a versioned parquet state directory —
    * the SCD2 twin of [[scd1MergeBatch]]: batch N writes `v=N` from
    * `v=N-1` merged with the batch; overwrite keeps replays idempotent
    * (re-running batch N rewrites identical content). The versioned
    * full-state write is the sandbox stand-in for a transactional table;
    * the merge itself never reads or shuffles more than the batch and the
    * open rows, so the real deployment swaps the sink, not the logic. */
  def scd2MergeBatch(spark: SparkSession, stateDir: String, keys: Seq[String],
                     tsUsCol: String = "ts_us", tieCol: String = "event_id")
                    (batch: DataFrame, batchId: Long): Unit = {
    val versions = stateVersions(spark, stateDir).filter(_ < batchId)
    val state =
      if (versions.isEmpty) None
      else Some(spark.read.parquet(s"$stateDir/v=${versions.max}"))
    scd2MergeStep(state, batch, keys, tsUsCol, tieCol)
      .write.mode("overwrite").parquet(s"$stateDir/v=$batchId")
  }

  /** Launch the continuous SCD2 pipeline: change stream → versioned SCD2
    * history maintenance — the reference worker's apply loop with type-2
    * history instead of last-write-wins. */
  def runScd2(spark: SparkSession, changes: DataFrame, stateDir: String,
              checkpointDir: String, keys: Seq[String] = Seq("user_id"),
              tsUsCol: String = "ts_us", tieCol: String = "event_id",
              trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    changes.writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch(scd2MergeBatch(spark, stateDir, keys, tsUsCol, tieCol) _)
      .start()

  /** Split-state SCD2 merge — the sink whose write cost matches
    * [[scd2MergeStep]]'s read cost. [[scd2MergeBatch]] rewrites the ENTIRE
    * versioned state (closed history included) every batch, so at scale
    * the immutable slice — which only ever GROWS — dominates every write.
    * Here the storage honors the scaladoc's own claim that closed history
    * is append-only:
    *
    *   - `$stateDir/closed/batch=N` — the interval rows that became
    *     closed IN batch N, written once, never rewritten. Re-running
    *     batch N overwrites only its OWN directory with identical content
    *     (replay-idempotent without touching neighbors).
    *   - `$stateDir/open/v=N` — the current row per live key, the only
    *     slice rewritten per batch; small (|live keys|) by construction.
    *
    * Per-batch written rows are therefore O(|batch| + |touched open
    * rows|), never O(|history|) — spec-pinned. The full versioned state
    * is [[scd2SplitState]] (closed appends ∪ newest open), and equals
    * [[graft.olap.StarSchema.scd2History]] of the concatenated change log
    * exactly. `retain` bounds open-version growth as in
    * [[scd1MergeBatchBucketed]]; closed dirs are the product, not cache,
    * and are kept. */
  def scd2MergeBatchSplit(spark: SparkSession, stateDir: String,
                          keys: Seq[String], tsUsCol: String = "ts_us",
                          tieCol: String = "event_id", retain: Int = 2)
                         (batch: DataFrame, batchId: Long): Unit = {
    // retain=1 would delete the very version a micro-batch replay reads:
    // a crash between the retention sweep and the checkpoint commit would
    // make the replayed batch re-bootstrap from the batch alone, silently
    // dropping every untouched key's open row
    require(retain >= 2,
      s"retain must be >= 2 (replay of batch N needs open/v=N-1), got $retain")
    val versions = stateVersions(spark, s"$stateDir/open").filter(_ < batchId)
    val next = versions match {
      case vs if vs.isEmpty =>
        StarSchema.scd2History(batch, keys, col(tsUsCol),
          Seq(col(tsUsCol), col(tieCol)))
      case vs =>
        scd2MergeOpen(spark.read.parquet(s"$stateDir/open/v=${vs.max}"),
          batch, keys, tsUsCol, tieCol)
    }
    // two actions split the merge result (closed slice, open slice), each
    // into its own dir so the closed write never has to know what earlier
    // batches contain. The merge is persisted across the pair — it is
    // batch+open-sized by construction, and without the cache the second
    // write would re-run the whole merge (measured 1.5× the whole step)
    next.persist()
    try {
      next.filter(!col("is_current"))
        .write.mode("overwrite").parquet(s"$stateDir/closed/batch=$batchId")
      next.filter(col("is_current"))
        .write.mode("overwrite").parquet(s"$stateDir/open/v=$batchId")
    } finally next.unpersist(blocking = false)
    versions.sorted.dropRight(math.max(retain - 1, 0)).foreach { v =>
      val p = new org.apache.hadoop.fs.Path(s"$stateDir/open/v=$v")
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  /** Assemble the full SCD2 state from a [[scd2MergeBatchSplit]] sink:
    * every closed append plus the newest open snapshot. */
  def scd2SplitState(spark: SparkSession, stateDir: String): DataFrame = {
    val versions = stateVersions(spark, s"$stateDir/open")
    require(versions.nonEmpty, s"no open state under $stateDir/open")
    val open = spark.read.parquet(s"$stateDir/open/v=${versions.max}")
    val closedPath = new org.apache.hadoop.fs.Path(s"$stateDir/closed")
    val fs = closedPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(closedPath)) open
    // mergeSchema + allowMissingColumns: closed appends can span schema
    // versions (a widened batch wrote newer files with more columns) —
    // older closed rows surface the added columns as NULL, per the
    // SchemaEvolution contract
    else spark.read.option("basePath", s"$stateDir/closed")
      .option("mergeSchema", "true")
      .parquet(s"$stateDir/closed").drop("batch")
      .unionByName(open, allowMissingColumns = true)
  }

  /** [[runScd2]] with the split closed/open sink. */
  def runScd2Split(spark: SparkSession, changes: DataFrame, stateDir: String,
                   checkpointDir: String, keys: Seq[String] = Seq("user_id"),
                   tsUsCol: String = "ts_us", tieCol: String = "event_id",
                   trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    changes.writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch(scd2MergeBatchSplit(spark, stateDir, keys, tsUsCol, tieCol) _)
      .start()

  /** Streaming Count-Min maintenance — the point-frequency member that
    * completes the streaming sketch family (HLL distinct / Bloom
    * membership / Misra-Gries top-k / histogram via batch / CM here):
    * every micro-batch APPENDS its (bucket, depth, slot, cnt) cell rows
    * to the sketch table; readers answer "how often did item x occur"
    * over any bucket subset by merging rows — cell-wise count ADDITION
    * ([[graft.ops.Sketches.countMinEstimates]] sums cells before the
    * min-over-depths read) — blind appends, no read-modify-write, no
    * streaming state. Replay caveat (the MG posture, NOT the HLL/Bloom
    * one): cell counts are sums, so a re-delivered batch adds its counts
    * again and estimates bound the frequencies of the REPLAYED stream —
    * the one-sided guarantee est ≥ true frequency survives replay (CM
    * never underestimates; redelivery only adds), exactness of the upper
    * side needs an exactly-once sink or upstream dedup
    * ([[dedupStream]]). */
  def runCountMinSketches(stream: DataFrame, sketchDir: String,
                          checkpointDir: String,
                          bucketCol: String, itemCol: String,
                          depth: Int = 3, width: Int = 32,
                          trigger: Trigger = Trigger.AvailableNow())
      : StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        StateSink.appendIdempotent(
          graft.ops.Sketches.countMinSketch(
            batch, col(bucketCol), col(itemCol), depth, width),
          batchId, sketchDir)
        ()
      }
      .start()

  /** Streaming histogram-quantile maintenance — the fifth and last
    * streaming twin, completing the sketch family's symmetry (HLL
    * distinct / Bloom membership / Misra-Gries top-k / Count-Min point
    * frequency / fixed-bin quantiles here): every micro-batch APPENDS its
    * (bucket, bin, cnt) rows to the sketch table — at most `nbins` rows
    * per (batch, bucket) regardless of batch size — and readers answer
    * rank queries over any bucket subset by merging bins with plain count
    * addition ([[graft.ops.Sketches.histogramQuantiles]]). Blind appends,
    * no read-modify-write, no streaming state. Replay caveat is the
    * CM/MG one, not the HLL/Bloom one: bin counts are sums, so a
    * re-delivered batch counts again and quantiles describe the REPLAYED
    * stream — the [est_lo, est_hi] bin-bound guarantee itself survives
    * (it brackets the replayed stream's true rank value exactly);
    * rank-exactness over the LOGICAL stream needs an exactly-once sink or
    * upstream [[dedupStream]]. The [lo, hi] domain is part of the sketch
    * table's contract and must match the read path's, as in the batch
    * [[graft.ops.Sketches.histogramSketch]]. */
  def runHistogramSketches(stream: DataFrame, sketchDir: String,
                           checkpointDir: String,
                           bucketCol: String, valueCol: String,
                           lo: Long, hi: Long, nbins: Int = 1024,
                           trigger: Trigger = Trigger.AvailableNow())
      : StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        StateSink.appendIdempotent(
          graft.ops.Sketches.histogramSketch(
            batch, col(bucketCol), col(valueCol), lo, hi, nbins),
          batchId, sketchDir)
        ()
      }
      .start()

  def health(spark: SparkSession, queries: Seq[StreamingQuery]): DataFrame = {
    import spark.implicits._
    queries.map { q =>
      val p = Option(q.lastProgress)
      StreamHealth(
        query_name = Option(q.name).getOrElse(""),
        query_id = q.id.toString,
        is_active = q.isActive,
        last_batch_id = p.map(_.batchId).getOrElse(-1L),
        num_input_rows = p.map(_.numInputRows).getOrElse(0L),
        total_state_rows =
          p.map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(0L),
        last_progress_ts = p.map(_.timestamp).getOrElse(""))
    }.toDF()
  }

  /** Launch the windowed-aggregate pipeline into an in-memory or file sink
    * name/path (append mode — only finalized windows are emitted). */
  def runWindowed(events: DataFrame, queryName: String,
                  every: String = "1 hour", delay: String = "2 hours",
                  trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    windowedCounts(events, every, delay).writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(OutputMode.Append())
      .trigger(trigger)
      .start()
}
