package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count-min sketch frequency estimation — the third classic sketch
  * next to HLL (approx_distinct_hll) and KLL (approx_quantiles_kll),
  * as a pure DataFrame program:
  *
  *  - BUILD: one pass over the fact exploding each key into `depth`
  *    (row, slot) cells (slot = xxhash64(key, seed_row) mod width),
  *    then ONE groupBy((row, slot)) count. The sketch is a DataFrame of
  *    at most depth·width rows — KBs, independent of input size, so it
  *    broadcasts anywhere and unions across shards by cell-wise sum
  *    (the standard CMS mergeability at 1000-executor scale: partial
  *    sketches per partition, summed — which is exactly what the
  *    partial/final aggregate already does here).
  *  - ESTIMATE: for each query key, recompute its depth slots and take
  *    MIN(cell count) over the depth rows (classic CMS upper-bound
  *    estimate: never under the true count, over by at most εN with
  *    probability 1-δ, ε ≈ e/width, δ ≈ e^-depth).
  */
object FreqSketch {

  private def slot(key: org.apache.spark.sql.Column, row: Int, width: Int) =
    pmod(xxhash64(key, lit(row)), lit(width.toLong))

  /** The sketch table: (row, slot, cnt), ≤ depth·width rows. */
  def cmsBuild(df: DataFrame, keyCol: String, depth: Int = 4, width: Int = 1024): DataFrame =
    df.select(posexplode(array((0 until depth).map(r =>
        slot(col(keyCol), r, width)): _*)).as(Seq("row", "slot")))
      .groupBy(col("row"), col("slot"))
      .agg(count(lit(1)).as("cnt"))

  /** Estimated count per distinct key of `queries(keyCol)`: min over
    * the depth cells. The sketch side is tiny → broadcast join.
    */
  def cmsEstimate(
      sketch: DataFrame,
      queries: DataFrame,
      keyCol: String,
      depth: Int = 4,
      width: Int = 1024): DataFrame = {
    val q = queries.select(col(keyCol)).distinct()
      .select(col(keyCol), posexplode(array((0 until depth).map(r =>
        slot(col(keyCol), r, width)): _*)).as(Seq("row", "slot")))
    // LEFT join + coalesce-to-0: a cell no build key landed in is an
    // EMPTY cell (count 0), not a missing observation — an inner join
    // would drop it, inflating the min (or losing unseen keys entirely)
    q.join(broadcast(sketch), Seq("row", "slot"), "left_outer")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_n"))
  }
}
