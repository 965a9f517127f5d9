package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** JDBC OLTP source and OLAP upsert sink.
  *
  * Mirrors the reference's Postgres surface: full/partitioned table reads
  * (sync_oltp_to_olap.py:194-260) and idempotent `INSERT ... ON CONFLICT DO
  * UPDATE` upserts (sync_oltp_to_olap.py:54-93, 174-191) — but set-oriented:
  * reads are split into `numPartitions` range slices so 1000 executors pull
  * concurrently, predicates are pushed into the remote SQL, and the upsert
  * runs as batched statements per partition (one connection per partition,
  * `batchSize` rows per round trip), never a row-at-a-time driver loop.
  */
object Jdbc {

  final case class ConnInfo(
      url: String,
      user: String,
      password: String,
      driver: String = "org.postgresql.Driver")

  /** Partitioned-range JDBC read: Spark issues one bounded query per
    * partition on `partitionColumn` ∈ [lower, upper]. Catalyst pushes
    * filters/projections into the generated SQL (JDBCScan PushedFilters). */
  def readPartitioned(spark: SparkSession, conn: ConnInfo, table: String,
                      partitionColumn: String, lower: Long, upper: Long,
                      numPartitions: Int): DataFrame =
    spark.read.format("jdbc")
      .option("url", conn.url)
      .option("user", conn.user)
      .option("password", conn.password)
      .option("driver", conn.driver)
      .option("dbtable", table)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lower.toString)
      .option("upperBound", upper.toString)
      .option("numPartitions", numPartitions.toString)
      .option("fetchsize", "10000")
      .load()

  /** Unpartitioned read for small dimension tables (single round trip). */
  def readTable(spark: SparkSession, conn: ConnInfo, table: String): DataFrame =
    spark.read.format("jdbc")
      .option("url", conn.url).option("user", conn.user)
      .option("password", conn.password).option("driver", conn.driver)
      .option("dbtable", table).load()

  /** Incremental read of explicit changed keys — the CDC-worker path
    * (worker_sync.py:94-108): the key list rides the remote WHERE clause so
    * only touched rows leave the OLTP store. */
  def readChanged(spark: SparkSession, conn: ConnInfo, table: String,
                  keyCol: String, keys: Seq[Long]): DataFrame =
    spark.read.format("jdbc")
      .option("url", conn.url).option("user", conn.user)
      .option("password", conn.password).option("driver", conn.driver)
      .option("dbtable",
        s"(SELECT * FROM $table WHERE $keyCol IN (${keys.mkString(",")})) AS t")
      .load()

  /** The idempotent upsert statement (SCD Type 1, last-write-wins) — the
    * exact semantics of the reference's `ON CONFLICT (key) DO UPDATE SET
    * col = EXCLUDED.col` (sync_oltp_to_olap.py:63-73). Pure function so
    * specs can pin the SQL without a live database.
    *
    * `guardCols` (optional) makes the conflict update NEWEST-WINS instead
    * of last-statement-wins: the update applies only when the incoming
    * row is strictly newer under the lexicographic (guard...) order —
    * `WHERE (table.g1, g2) < (EXCLUDED.g1, g2)` — so an out-of-order or
    * replayed OLDER row can never clobber newer OLAP state (the JDBC form
    * of the parquet merge's ts/tie comparison; row-value comparison is
    * ANSI, runs on Postgres and DuckDB alike). */
  def upsertSql(table: String, cols: Seq[String], keyCols: Seq[String],
                guardCols: Seq[String] = Nil): String = {
    require(keyCols.nonEmpty && keyCols.forall(cols.contains), "keys must be columns")
    require(guardCols.forall(cols.contains), "guards must be columns")
    val updatable = cols.filterNot(keyCols.contains)
    val guard =
      if (guardCols.isEmpty) ""
      else s" WHERE (${guardCols.map(c => s"$table.$c").mkString(", ")}) < " +
        s"(${guardCols.map(c => s"EXCLUDED.$c").mkString(", ")})"
    val setClause =
      if (updatable.isEmpty) "DO NOTHING"
      else "DO UPDATE SET " +
        updatable.map(c => s"$c = EXCLUDED.$c").mkString(", ") + guard
    s"INSERT INTO $table (${cols.mkString(", ")}) " +
      s"VALUES (${cols.map(_ => "?").mkString(", ")}) " +
      s"ON CONFLICT (${keyCols.mkString(", ")}) $setClause"
  }

  /** Distributed batched DELETE by key — the tombstone half of the
    * reference worker's apply loop (worker_sync.py:96-101 deletes on a
    * change of type delete). Same executor shape as [[upsert]]: one
    * connection per partition, `batchSize` keys per round trip, one
    * commit. Idempotent by construction (deleting an absent key is a
    * no-op), so task retries and batch replays are safe. */
  def deleteKeys(df: DataFrame, conn: ConnInfo, table: String,
                 keyCols: Seq[String], batchSize: Int = 1000): Unit = {
    require(keyCols.nonEmpty && keyCols.forall(df.columns.contains),
      "keys must be columns of the frame")
    val sql = s"DELETE FROM $table WHERE " +
      keyCols.map(c => s"$c = ?").mkString(" AND ")
    val (url, user, pass, driver) = (conn.url, conn.user, conn.password, conn.driver)
    df.select(keyCols.map(org.apache.spark.sql.functions.col): _*)
      .foreachPartition { rows: Iterator[Row] =>
        if (rows.nonEmpty) {
          Class.forName(driver)
          val c = java.sql.DriverManager.getConnection(url, user, pass)
          try {
            c.setAutoCommit(false)
            val st = c.prepareStatement(sql)
            var n = 0
            rows.foreach { r =>
              var i = 0
              while (i < keyCols.length) { st.setObject(i + 1, r.get(i)); i += 1 }
              st.addBatch(); n += 1
              if (n % batchSize == 0) st.executeBatch()
            }
            if (n % batchSize != 0) st.executeBatch()
            c.commit()
          } finally c.close()
        }
      }
  }

  /** SQL column type for ALTER TABLE ADD COLUMN when evolving the OLAP
    * target under a widened frame — ANSI names only, so the same DDL runs
    * on Postgres and DuckDB. */
  private[graft] def sqlType(dt: org.apache.spark.sql.types.DataType): String = {
    import org.apache.spark.sql.types._
    dt match {
      case LongType          => "BIGINT"
      case IntegerType       => "INTEGER"
      case ShortType         => "SMALLINT"
      case DoubleType        => "DOUBLE PRECISION"
      case FloatType         => "REAL"
      case StringType        => "VARCHAR"
      case BooleanType       => "BOOLEAN"
      case TimestampType     => "TIMESTAMP"
      case DateType          => "DATE"
      case d: DecimalType    => s"DECIMAL(${d.precision},${d.scale})"
      case other => throw new IllegalArgumentException(
        s"no JDBC DDL mapping for Spark type ${other.simpleString} — " +
          "evolve the target table manually")
    }
  }

  /** The target table's column names, from driver-side metadata (a
    * zero-row probe query — no data moves). */
  private def tableColumns(c: java.sql.Connection, table: String): Seq[String] = {
    val st = c.createStatement()
    try {
      val md = st.executeQuery(s"SELECT * FROM $table WHERE 1=0").getMetaData
      (1 to md.getColumnCount).map(md.getColumnName)
    } finally st.close()
  }

  /** Distributed batched upsert: each partition opens one connection, binds
    * rows into `batchSize` JDBC batches, and commits once. Executors write
    * concurrently; idempotency comes from the ON CONFLICT statement, so
    * task retries are safe (at-least-once → effectively-once).
    *
    * Schema evolution (the [[SchemaEvolution]] contract at the JDBC
    * boundary, checked on the DRIVER before any executor writes a row —
    * never discovered as a mid-partition SQLException): a frame carrying
    * columns the target table lacks refuses loudly unless
    * `addMissingColumns = true`, which first evolves the table with
    * `ALTER TABLE ADD COLUMN` (standing rows read NULL — the widened-batch
    * semantics). A frame NARROWER than the table is fine here by upsert
    * algebra — `ON CONFLICT DO UPDATE` sets only the provided columns, so
    * existing values are retained, never nulled (the reference's fixed
    * column lists, sync_oltp_to_olap.py:56-62, are the degenerate
    * always-aligned case). */
  def upsert(df: DataFrame, conn: ConnInfo, table: String, keyCols: Seq[String],
             batchSize: Int = 1000, addMissingColumns: Boolean = false,
             guardCols: Seq[String] = Nil): Unit = {
    val cols = df.columns.toSeq
    Class.forName(conn.driver)
    val probe = java.sql.DriverManager.getConnection(conn.url, conn.user, conn.password)
    try {
      val existing = tableColumns(probe, table).map(_.toLowerCase).toSet
      val added = cols.filterNot(c0 => existing(c0.toLowerCase))
      if (added.nonEmpty) {
        require(addMissingColumns,
          s"Jdbc.upsert($table): frame carries column(s) " +
            s"[${added.mkString(", ")}] the target table lacks — refusing " +
            "before any row is written. Pass addMissingColumns = true to " +
            "evolve the table (ALTER TABLE ADD COLUMN), or align the frame.")
        added.foreach { a =>
          val st = probe.createStatement()
          try st.execute(
            s"ALTER TABLE $table ADD COLUMN $a ${sqlType(df.schema(a).dataType)}")
          finally st.close()
        }
      }
    } finally probe.close()
    val sql = upsertSql(table, cols, keyCols, guardCols)
    val (url, user, pass, driver) = (conn.url, conn.user, conn.password, conn.driver)
    df.foreachPartition { rows: Iterator[Row] =>
      if (rows.nonEmpty) {
        Class.forName(driver)
        val c = java.sql.DriverManager.getConnection(url, user, pass)
        try {
          c.setAutoCommit(false)
          val st = c.prepareStatement(sql)
          var n = 0
          rows.foreach { r =>
            var i = 0
            while (i < cols.length) { st.setObject(i + 1, r.get(i)); i += 1 }
            st.addBatch(); n += 1
            if (n % batchSize == 0) st.executeBatch()
          }
          if (n % batchSize != 0) st.executeBatch()
          c.commit()
        } finally c.close()
      }
    }
  }
}
