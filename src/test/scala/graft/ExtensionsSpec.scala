package graft

import graft.functions.NativeExpressions
import graft.ops.Similarity
import org.apache.spark.sql.functions._

/** The SparkSessionExtensions registration: the native expressions must be
  * reachable from plain SQL and agree with the Scala API. */
class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("graft_simhash_bits is SQL-callable and matches the Scala API") {
    val fromSql = spark.sql(
      "SELECT graft_simhash_bits(array(1L, 2L, 3L, 2L), 60) AS fp")
      .as[Long].head()
    val fromApi = Seq(Seq(1L, 2L, 3L, 2L)).toDF("hs")
      .select(NativeExpressions.simhashBits($"hs", 60).as("fp"))
      .as[Long].head()
    assert(fromSql === fromApi)
  }

  test("graft_minhash_signature is SQL-callable and matches the Scala API") {
    val fromSql = spark.sql(
      "SELECT graft_minhash_signature(array(7L, 8L), 16, 42L) AS sig")
      .as[Seq[Long]].head()
    val fromApi = Seq(Seq(7L, 8L)).toDF("hs")
      .select(NativeExpressions.minhashSignature($"hs", 16, 42L).as("sig"))
      .as[Seq[Long]].head()
    assert(fromSql === fromApi)
  }

  test("graft_dot is SQL-callable and matches the Scala API") {
    val fromSql = spark.sql(
      "SELECT graft_dot(array(0.5D, -1.5D, 2.0D), array(1.0D, 2.0D, 0.25D)) AS d")
      .as[Double].head()
    val fromApi = Seq((Seq(0.5, -1.5, 2.0), Seq(1.0, 2.0, 0.25))).toDF("a", "b")
      .select(NativeExpressions.dotProduct($"a", $"b").as("d"))
      .as[Double].head()
    assert(fromSql === fromApi)
    assert(fromSql === 0.5 * 1.0 + -1.5 * 2.0 + 2.0 * 0.25)
  }

  test("graft_nfc_normalize is SQL-callable and matches the Scala API") {
    val fromSql = spark.sql("SELECT graft_nfc_normalize('café') AS n")
      .as[String].head()
    val fromApi = Seq("café").toDF("s")
      .select(NativeExpressions.nfcNormalize($"s").as("n"))
      .as[String].head()
    assert(fromSql === fromApi)
    assert(fromSql === "café")
  }

  test("graft_srp_band_values is SQL-callable and matches the Scala API") {
    val planes = Similarity.planeMatrix(8, 4, 42L)
    val planesSql = planes
      .map(_.map(_.toString).mkString("array(", ",", ")"))
      .mkString("array(", ",", ")")
    val fromSql = spark.sql(
      s"SELECT graft_srp_band_values(array(0.5D, -1.5D, 2.0D, 0.25D), $planesSql, 4) AS b")
      .as[Seq[Long]].head()
    val fromApi = Seq(Seq(0.5, -1.5, 2.0, 0.25)).toDF("emb")
      .select(NativeExpressions.srpBandValues($"emb", planes, 4).as("b"))
      .as[Seq[Long]].head()
    assert(fromSql === fromApi)
    assert(fromSql.length === 2) // 8 planes / 4 rows
  }
}
