package graft

/** CLI entry point — the library-user equivalent of the reference's
  * `main.py` trigger surface (full sync on demand; incremental sync driven
  * by a changed-key table):
  *
  *   spark-submit --class graft.SyncMain graft.jar full <srcDir> <outDir>
  *   spark-submit --class graft.SyncMain graft.jar incremental <srcDir> <outDir>
  *   spark-submit --class graft.SyncMain graft.jar status <srcDir> <outDir>
  *
  * Incremental mode derives the changed-customer set from the events change
  * stream (purchase events), mirroring the worker's NOTIFY-driven re-sync.
  */
object SyncMain {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: SyncMain full|incremental|status <srcDir> <outDir>")
    val Array(mode, srcDir, outDir) = args
    val spark = GraftSession.get(s"graft-sync-$mode")
    try {
      mode match {
        case "full" =>
          graft.olap.StarSchemaJob.run(spark, srcDir, outDir)
          println(s"full sync written to $outDir")
        case "incremental" =>
          import org.apache.spark.sql.functions.col
          val changed = graft.sources.Tables.events(spark, srcDir)
            .filter(col("event_type") === "purchase")
            .select(col("user_id")).distinct()
          val n = graft.olap.StarSchemaJob.syncIncremental(spark, srcDir, outDir, changed)
          println(s"incremental sync rewrote $n fact rows in $outDir")
        case "status" =>
          graft.olap.StarSchemaJob.status(spark, outDir).show(truncate = false)
        case other =>
          throw new IllegalArgumentException(s"unknown mode: $other")
      }
    } finally spark.stop()
  }
}
