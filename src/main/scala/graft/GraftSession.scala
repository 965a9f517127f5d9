package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's recommended configuration.
  *
  * Local testing runs `local[32]`; on a real cluster only the master/memory
  * knobs change — the SQL conf below is the 100 TB posture: AQE re-plans
  * shuffles at runtime (partition coalescing + skew-join splitting), and
  * shuffle partitions are sized explicitly instead of the 200 default.
  */
object GraftSession {
  def builder(appName: String = "graft",
              master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]",
              shufflePartitions: Int = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
      : SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName(appName)
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // keep plan strings untruncated so pushdown/broadcast assertions (and
      // humans reading .explain) see every scan filter and read-schema field
      .config("spark.sql.debug.maxToStringFields", "2000")
      // scan-node metadata (PushedFilters/ReadSchema) defaults to 100 chars —
      // too short to see every pushed predicate
      .config("spark.sql.maxMetadataStringLength", "10000")
      // events.parquet carries TIMESTAMP(NANOS); read as epoch-nanos long
      // (graft.sources.Tables.events converts to microsecond timestamps)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  def get(appName: String = "graft"): SparkSession = {
    val s = builder(appName).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
