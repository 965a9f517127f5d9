package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pareto-frontier (skyline) selection: the rows not dominated on two
  * maximize-both dimensions — the classic "best suppliers by balance AND
  * revenue" multi-criteria report (Börzsönyi et al., ICDE'01).
  *
  * The 2-D case needs no dominance self-join: group to per-x-value maxima,
  * order the groups by x descending, and a row is on the frontier iff it
  * holds its x-group's maximum y AND that y strictly exceeds the running
  * maximum over all strictly-higher x groups (a 1-PRECEDING-bounded ROWS
  * window over the grouped table, where ties can't blur the frame because
  * grouping made x distinct). Cost: one (x)-keyed aggregate over the
  * input plus a window over |distinct x| rows and an x-keyed join back —
  * the input is typically already an aggregated report table, and the
  * grouped table is bounded by the x cardinality, not the corpus.
  */
object Skyline {

  /** Frontier rows of `df` maximizing both `x` and `y`. Ties surviving
    * dominance (equal on both dims) are all kept — none strictly
    * dominates another. Rows with NULL in either dimension are
    * incomparable under dominance and are EXCLUDED explicitly (without
    * the filter they would be dropped by one code path and kept by a
    * NOT-EXISTS formulation — an undefined, formulation-dependent
    * answer). */
  def frontier2d(df: DataFrame, x: String, y: String): DataFrame = {
    val comparable = df.filter(col(x).isNotNull && col(y).isNotNull)
    val grouped = comparable.groupBy(col(x)).agg(max(col(y)).as("_gmax_y"))
    val strictWin = Window.orderBy(col(x).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val bounds = grouped.select(col(x), col("_gmax_y"),
      max(col("_gmax_y")).over(strictWin).as("_strict_max_y"))
    comparable.join(bounds, x)
      .filter(col(y) === col("_gmax_y") &&
        (col("_strict_max_y").isNull || col("_strict_max_y") < col(y)))
      .drop("_gmax_y", "_strict_max_y")
  }
}
