package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** CSV/JSON readers with explicit schemas, and the partitioned star-schema
  * parquet sink.
  *
  * Explicit schemas are mandatory at scale: schema inference is an extra
  * full pass over the data, and inferred types drift between runs.
  */
object FileFormats {

  def csv(spark: SparkSession, path: String, schema: StructType,
          header: Boolean = true, delimiter: String = ","): DataFrame =
    spark.read.schema(schema)
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .option("mode", "PERMISSIVE")
      .csv(path)

  def json(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("mode", "PERMISSIVE").json(path)

  /** ORC with an explicit schema — the interchange format when the OLAP
    * estate is Hive/Trino-centric; columnar with min/max stripes, so the
    * same pushdown/pruning posture as parquet applies. */
  def orc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  def writeOrc(df: DataFrame, outDir: String): Unit =
    df.write.mode("overwrite").orc(outDir)

  /** Small-file compaction — the maintenance pass every long-lived table
    * needs: incremental syncs and streaming sinks accrete kilobyte files,
    * and at read time every file costs a task launch, a footer fetch, and
    * a seek — a million-file table spends longer scheduling than scanning.
    * Rewrites the directory into ceil(totalBytes / targetBytes) files via
    * `coalesce` (a NARROW repartition: input files are grouped onto
    * output tasks with no shuffle — compaction is IO-bound and must not
    * pay an exchange).
    *
    * Sizes come from the Hadoop FileSystem API, so the same call works on
    * HDFS/S3A/local. Writes to `outDir` rather than in place: the swap is
    * the caller's (atomic rename / metastore repoint) — a failed in-place
    * overwrite would destroy the only copy. For a date-partitioned table,
    * run per partition directory (only fresh partitions need compacting).
    *
    * @return number of output files chosen */
  def compact(spark: SparkSession, dir: String, outDir: String,
              targetBytes: Long = 128L * 1024 * 1024): Int = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val total = fs.listStatus(p)
      .filter(_.getPath.getName.endsWith(".parquet")).map(_.getLen).sum
    val n = math.max(1, math.ceil(total.toDouble / targetBytes).toInt)
    spark.read.parquet(dir).coalesce(n)
      .write.mode("overwrite").parquet(outDir)
    n
  }

  /** Swap a verified compacted rewrite into place. The guard encodes the
    * destroyed-only-copy hazard [[compact]]'s scaladoc hands to callers: if
    * the rewrite's row count differs from `expectedRows`, the swap is
    * REFUSED — the original directory is untouched and the rewrite is
    * deleted. On success the original moves aside to `<dir>.compact_old`,
    * the rewrite renames in, and only then is the old data deleted; a
    * failed second rename restores the original. Renames go through the
    * Hadoop FS API (atomic metadata moves on HDFS/local; on S3A rename is
    * a copy — repoint a metastore there instead). */
  private[graft] def swapCompacted(spark: SparkSession, dir: String,
                                   tmpDir: String, expectedRows: Long): Unit = {
    val src = new org.apache.hadoop.fs.Path(dir)
    val tmp = new org.apache.hadoop.fs.Path(tmpDir)
    val fs = src.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rewritten = spark.read.parquet(tmpDir).count()
    if (rewritten != expectedRows) {
      fs.delete(tmp, true)
      throw new IllegalStateException(
        s"compaction swap refused: rewrite has $rewritten rows, source has " +
          s"$expectedRows — original directory left untouched")
    }
    val old = new org.apache.hadoop.fs.Path(dir + ".compact_old")
    fs.delete(old, true) // stale leftover from an interrupted prior swap
    if (!fs.rename(src, old))
      throw new java.io.IOException(s"could not move $dir aside to $old")
    if (!fs.rename(tmp, src)) {
      // restore — the original is still the only copy; if even the restore
      // fails, say exactly where the data is instead of implying it's back
      if (!fs.rename(old, src))
        throw new java.io.IOException(
          s"could not move $tmpDir into $dir AND could not restore the " +
            s"original — the data is intact at $old; move it back manually")
      throw new java.io.IOException(s"could not move $tmpDir into $dir")
    }
    fs.delete(old, true)
  }

  /** [[compact]] plus the atomic swap: rewrite into `<dir>.compact_tmp`,
    * verify the row count survived, then rename into place (refusing the
    * swap — original untouched — on any row-count mismatch).
    * @return number of output files chosen */
  def compactAndSwap(spark: SparkSession, dir: String,
                     targetBytes: Long = 128L * 1024 * 1024): Int = {
    val expected = spark.read.parquet(dir).count()
    val tmpDir = dir + ".compact_tmp"
    val n = compact(spark, dir, tmpDir, targetBytes)
    swapCompacted(spark, dir, tmpDir, expected)
    n
  }

  /** Fact-table sink: partitioned by the date key (so every downstream
    * date-range query prunes partitions at the source) and sorted within
    * partitions on (partition col, join keys). The partition column leads
    * the sort deliberately: the V1 dynamic-partition writer requires rows
    * sorted by partition columns and would otherwise INSERT ITS OWN sort,
    * discarding the join-key order — leading with it satisfies the writer
    * and keeps rowgroups orderkey-ordered (run-length-friendly encoding,
    * parquet min/max skipping on the sort prefix). The repartition on the
    * partition column sends every partition value to exactly ONE task, so
    * each directory receives exactly one file (spec-asserted) — without it
    * every task can hold every date and a P-partition write creates up to
    * tasks × P files.
    *
    * `granularity` sizes the directories to the data: `"day"` (default) is
    * the production posture — at 100 TB a day of fact is tens of GB and a
    * date-range query prunes to exactly the days it needs. At small scale
    * a day is a few KB and the write is dominated not by data but by the
    * per-directory commit protocol (one task-output rename per directory,
    * merged sequentially at job commit — ~2400 directories of metadata ops
    * for a 7-year TPC-H fact). `"month"` truncates the partition key to
    * month grain (~80 directories for the same span), the appropriate
    * layout below ~1 GB/day; rows stay date-sorted within each month file,
    * so day-level predicates still skip row groups via parquet min/max on
    * the leading sort column even though directory pruning is month-grain. */
  /** The standing schema of a parquet directory, if it exists and holds
    * data — the anchor the [[SchemaEvolution]] gate compares a new batch
    * against. One footer read (Spark's default schema pick), NOT a
    * mergeSchema sweep — the gate anchors on the latest layout; a
    * mixed-schema dir is read back through [[readEvolved]]. */
  private[graft] def standingSchema(spark: SparkSession,
                                    dir: String): Option[StructType] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else try Some(spark.read.parquet(dir).schema)
    catch { case _: org.apache.spark.sql.AnalysisException => None }
  }

  /** Read a standing table that may span schema versions (a widened batch
    * wrote newer files with more columns): `mergeSchema` unions every
    * footer's schema and older files surface the added columns as NULL —
    * the read half of the [[SchemaEvolution]] contract. */
  def readEvolved(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(dir)

  def writeFact(fact: DataFrame, outDir: String,
                partitionCol: String = "date_key",
                sortCols: Seq[String] = Seq("l_orderkey", "l_linenumber"),
                granularity: String = "day"): Unit = {
    // schema-evolution gate BEFORE the overwrite touches anything: a
    // widened fact is fine (full rewrite carries the new column), a
    // narrowed or retyped one refuses loudly while the standing data is
    // still intact. month_key is sink-derived (never part of the caller's
    // frame), so it is excluded from the standing anchor.
    standingSchema(fact.sparkSession, outDir).foreach { s0 =>
      SchemaEvolution.requireEvolvable(
        StructType(s0.fields.filterNot(_.name == "month_key")),
        fact.schema, s"writeFact($outDir)")
    }
    writeFactUnchecked(fact, outDir, partitionCol, sortCols, granularity)
  }

  private def writeFactUnchecked(fact: DataFrame, outDir: String,
                partitionCol: String,
                sortCols: Seq[String],
                granularity: String): Unit = granularity match {
    case "day" =>
      fact
        .repartition(col(partitionCol))
        .sortWithinPartitions((partitionCol +: sortCols).map(col): _*)
        .write.mode("overwrite")
        .partitionBy(partitionCol)
        .parquet(outDir)
    case "month" =>
      fact
        .withColumn("month_key", trunc(col(partitionCol), "month"))
        .repartition(col("month_key"))
        .sortWithinPartitions(
          (col("month_key") +: col(partitionCol) +: sortCols.map(col)): _*)
        .write.mode("overwrite")
        .partitionBy("month_key")
        .parquet(outDir)
    case other =>
      throw new IllegalArgumentException(
        s"writeFact granularity must be 'day' or 'month', got '$other'")
  }

  /** Dimension sink, size-tiered. Small dims (the default) coalesce to one
    * file — they broadcast at read time and a single footer beats a
    * thousand tiny files. `large = true` is for dims that mirror an OLTP
    * giant (a 100 TB deployment's customer dim is billions of rows): the
    * write keeps its parallelism and caps rows per file, because a
    * single-task single-file write is as wrong there as a broadcast join
    * would be. Tiering is declared by the caller — a row-count probe at
    * write time would cost an extra job, and the caller knows which dims
    * mirror giants. For the join side of large dims, see [[writeBucketed]]:
    * bucket fact and dim on the join key and the recurring fact⋈dim join
    * runs as a zero-Exchange sort-merge join. */
  def writeDim(dim: DataFrame, outDir: String, large: Boolean = false,
               maxRecordsPerFile: Long = 4L * 1000 * 1000): Unit = {
    // same evolution gate as writeFact: widened dim rewrites fine,
    // narrowed/retyped refuses before the standing copy is destroyed
    standingSchema(dim.sparkSession, outDir).foreach { s0 =>
      SchemaEvolution.requireEvolvable(s0, dim.schema, s"writeDim($outDir)")
    }
    (if (large) dim else dim.coalesce(1))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile.toString)
      .parquet(outDir)
  }

  /** Range-sorted sink: `repartitionByRange` + in-partition sort on `key`
    * yields files whose key ranges are DISJOINT and ordered — so any
    * range/point predicate on the key prunes whole files (and row groups
    * within them) via parquet min/max stats, without directory-per-value
    * partitioning (which explodes at high cardinality). This is the layout
    * for range-scanned high-cardinality keys — event time, order ids —
    * where `partitionBy` would create millions of directories and a hash
    * layout scatters every range across all files. The range exchange
    * samples the key distribution, so files are balanced under skew.
    * SourcesSpec asserts the disjoint-ordered property file by file. */
  def writeRangeSorted(df: DataFrame, outDir: String, key: String,
                       numFiles: Int): Unit =
    df.repartitionByRange(numFiles, col(key))
      .sortWithinPartitions(col(key))
      .write.mode("overwrite").parquet(outDir)

  /** Morton (Z-order) interleave of two non-negative integer keys — the
    * space-filling-curve value multi-dimensional clustering sorts by. Bits
    * spread via the standard mask-and-shift sequence (each input's low 31
    * bits interleaved into one 64-bit value), pure codegen'd bitwise ops.
    * 31 bits per key, not 32: the second key's bit 31 would land in the
    * long's SIGN bit and a signed sort would order those rows before
    * zero — silently destroying curve locality for upper-half keys.
    * CONTRACT: keys must lie in [0, 2³¹); wider values alias (k and
    * k−2³¹ interleave identically) — scale or rank them into range first,
    * exactly as [[writeZOrdered]] does with its 20-bit min-max rescale.
    * Keys of wildly different ranges should be scaled for a second
    * reason: curve locality only helps when both dimensions use
    * comparable bit widths. */
  def zValue(a: Column, b: Column): Column = {
    def spread(c: Column): Column = {
      var x = c.cast("long").bitwiseAND(lit(0x7FFFFFFFL))
      x = x.bitwiseOR(shiftleft(x, 16)).bitwiseAND(lit(0x0000FFFF0000FFFFL))
      x = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FF00FF00FFL))
      x = x.bitwiseOR(shiftleft(x, 4)).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
      x = x.bitwiseOR(shiftleft(x, 2)).bitwiseAND(lit(0x3333333333333333L))
      x.bitwiseOR(shiftleft(x, 1)).bitwiseAND(lit(0x5555555555555555L))
    }
    spread(a).bitwiseOR(shiftleft(spread(b), 1))
  }

  /** Z-ordered sink: range-partition + sort on the Morton interleave of TWO
    * keys, so file (and row-group) min/max spans stay tight on BOTH columns
    * — a point/range predicate on EITHER key prunes most files, where a
    * plain sort on one key leaves the other scattered across every file.
    * This is the layout for tables queried along two independent
    * dimensions (user×time, part×supplier) — the same clustering Delta's
    * OPTIMIZE ZORDER and Iceberg's sort orders apply, done here with a
    * plain codegen'd expression and the stock range exchange (which
    * samples the z-values, so files stay balanced under skew). The curve
    * keys never persist — only the layout changes.
    *
    * Both keys are min-max scaled to a common 20-bit width before
    * interleaving (Delta does the same via range ids): raw interleave of
    * keys with unequal ranges degenerates to a single-key sort — the wider
    * key owns every high bit and the narrow key stops clustering. Bounds
    * come from one tiny min/max aggregate when not supplied; at 100 TB
    * pass the known `bounds` (partition metadata, stats) and skip that
    * scan. */
  def writeZOrdered(df: DataFrame, outDir: String, c1: String, c2: String,
                    numFiles: Int,
                    bounds: Option[(Long, Long, Long, Long)] = None): Unit = {
    val computed = bounds.orElse {
      val r = df.agg(
        min(col(c1)).cast("long"), max(col(c1)).cast("long"),
        min(col(c2)).cast("long"), max(col(c2)).cast("long")).head()
      // empty input or an all-null key: no curve to build — plain write
      if (r.anyNull) None
      else Some((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    }
    if (computed.isEmpty) {
      // no curve to build, but the caller's file-count request still holds
      df.coalesce(numFiles).write.mode("overwrite").parquet(outDir)
      return
    }
    val (lo1, hi1, lo2, hi2) = computed.get
    val bits = 20
    def scaled(c: Column, lo: Long, hi: Long): Column = {
      val factor = ((1L << bits) - 1).toDouble / math.max(1L, hi - lo)
      ((c.cast("long") - lit(lo)).cast("double") * lit(factor)).cast("long")
    }
    val z = zValue(scaled(col(c1), lo1, hi1), scaled(col(c2), lo2, hi2))
    df.repartitionByRange(numFiles, z)
      .sortWithinPartitions(z)
      .write.mode("overwrite").parquet(outDir)
  }

  /** Bucket-preserving compaction — [[compact]]'s coalesce rewrite is
    * WRONG for a bucketed table: it would flatten the per-bucket files
    * into arbitrary ones and drop the metastore bucket spec, silently
    * costing every downstream join its zero-Exchange property. A bucketed
    * table accretes files per (writer task × bucket) — recurring merges
    * ([[graft.streaming.EventsCdc.scd1MergeBatchBucketed]]) multiply them
    * — so compaction here means: ONE file per bucket, same bucket spec.
    *
    * The bucket spec is read from the metastore (never trusted from the
    * caller — a mismatched respec would silently break co-location), and
    * the data is repartitioned on the EXPLICIT bucket-id expression
    * `pmod(hash(keys), n)` — the exact murmur3-pmod the datasource bucket
    * writer computes. Repartitioning on the raw keys is NOT safe here:
    * the source of a compaction is by definition a bucketed table, its
    * scan already reports `hashpartitioning(keys, n)`, and the planner is
    * entitled to elide or rewire a shuffle it deems redundant — observed
    * on Spark 4.1 as a plain multi-file-per-task scan feeding the writer
    * directly (one file per task × bucket, the accretion this function
    * exists to undo). Keying the shuffle on the derived bucket-id
    * expression is never partitioning-equivalent to the scan, so the
    * exchange survives, and every distinct bucket id lands wholly inside
    * one task — the bucketed writer then emits exactly one file per
    * bucket (a task holding two ids emits two files; totals still = n).
    * The rewrite is registered at `outTable`/`outPath` with the SAME
    * bucketBy/sortBy; the swap (metastore repoint / rename) stays the
    * caller's, as with [[compact]]. A post-write file-count assert fails
    * loudly if a future planner change breaks the invariant again.
    * SourcesSpec asserts the post-compaction join still plans no
    * Exchange.
    *
    * @return number of buckets (= output file count) */
  def compactBucketed(spark: SparkSession, tableName: String,
                      outTable: String, outPath: String): Int = {
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(tableName))
    val spec = meta.bucketSpec.getOrElse(throw new IllegalArgumentException(
      s"$tableName has no bucket spec — use compact() for plain directories"))
    val keys = spec.bucketColumnNames
    val sorts = spec.sortColumnNames
    val n = spec.numBuckets
    val bucketId = pmod(hash(keys.map(col): _*), lit(n))
    val writer = spark.table(tableName)
      .repartition(n, bucketId)
      .write.mode("overwrite")
      .option("path", outPath)
      .format("parquet")
      .bucketBy(n, keys.head, keys.tail: _*)
    (if (sorts.nonEmpty) writer.sortBy(sorts.head, sorts.tail: _*) else writer)
      .saveAsTable(outTable)
    // the invariant is one file per NON-EMPTY bucket (a bucket the hash
    // never maps a row to legitimately has no file), checked from the
    // bucket-id suffix the datasource writer embeds in every file name;
    // Hadoop FS listing so the check works on cluster filesystems too
    val p = new org.apache.hadoop.fs.Path(outPath)
    val names = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .listStatus(p).map(_.getPath.getName).filter(_.endsWith(".parquet"))
    val bucketIds = names.flatMap("_(\\d{5})\\.".r.findFirstMatchIn(_).map(_.group(1)))
    require(names.length == bucketIds.distinct.length && names.length <= n,
      s"compactBucketed invariant broken: ${names.length} files over " +
        s"${bucketIds.distinct.length} distinct bucket ids (spec: $n buckets) " +
        s"at $outPath — planner no longer preserves the bucket-id shuffle")
    n
  }

  /** Bucketed sink for recurring equi-joins: two tables written with the
    * SAME bucket count on their join keys are join-co-located — Spark
    * plans the sort-merge join with NO Exchange on either side (bucket i
    * only ever meets bucket i). This is the 100 TB layout for the SCD1
    * state table and any fact⋈fact recurring join: the shuffle is paid
    * ONCE at write time, then every subsequent merge/join/groupBy on the
    * bucket key is shuffle-free. `sortBy` pre-sorts within buckets so the
    * merge phase needs no sort either. Registered as an EXTERNAL table
    * (data lives at `path`); SourcesSpec proves the exchange-free plan. */
  def writeBucketed(df: DataFrame, tableName: String, path: String,
                    key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .option("path", path)
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(tableName)
}
