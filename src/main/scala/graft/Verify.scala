package graft

import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional "--only a,b,c" third arg: builder-side targeted re-check of
    // a few queries (the driver always runs the full registry)
    val only: Option[Set[String]] = args.drop(2) match {
      case Array("--only", names) => Some(names.split(",").toSet)
      case _ => None
    }
    val spark = GraftSession.get("graft-verify")
    new java.io.File(outDir).mkdirs()
    // registry order (not Map hash order) so failures/timings attribute
    // deterministically run to run
    SparkEntry.registry.filter(q => only.forall(_.contains(q.name))).foreach { q =>
      try q.run(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/${q.name}")
      catch { case e: Throwable =>
        System.err.println(s"[verify] ${q.name} failed: ${e.getMessage}")
      }
    }
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"),
      JsonEscape.obj(SparkEntry.oracleSql))
    spark.stop()
  }
}
