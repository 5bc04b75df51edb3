package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Trajectory simplification — Douglas–Peucker per user track (public
  * knowledge, 1973): recursively keep the point farthest from the
  * current segment while its distance exceeds ε, the standard polyline
  * reduction for GPS traces before storage/rendering.
  *
  * Cross-engine exactness: coordinates live on the integer
  * centi-degree lattice and every comparison is integer — the
  * perpendicular-distance test is `cross² > ε²·|seg|²` (one
  * cross-multiplication, no division, no sqrt), the farthest-point
  * argmax ties to the SMALLEST index, and degenerate (closed-loop)
  * segments fall back to point distance vs ε². The DuckDB oracle
  * replays the identical recursion as a segment-splitting recursive
  * CTE over per-user point lists.
  *
  * Scale shape: one shuffle groups each user's track; the per-group
  * recursion is the one justified imperative region (the decision at
  * each level depends on which points earlier levels kept — the
  * [[GreedySweep]] argument), memory-bounded by the single track.
  * Worst case O(n²) per track like every DP implementation; tracks are
  * per-user bounded.
  */
object Trajectory {

  final case class KeptPoint(user_id: Long, idx: Long, x: Long, y: Long)

  /** @param pts  (user_id, idx [1-based, dense per user], x, y) rows
    * @param eps  tolerance on the coordinate lattice
    * @return kept points, same schema, unordered
    */
  def simplify(pts: DataFrame, eps: Long): Dataset[KeptPoint] = {
    val spark = pts.sparkSession
    import spark.implicits._
    val eps2 = eps * eps
    pts.select(col("user_id").cast("long"), col("idx").cast("long"),
        col("x").cast("long"), col("y").cast("long"))
      .as[(Long, Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (uid, it) =>
        val arr = it.toArray.sortBy(_._2)
        val n = arr.length
        if (n <= 1) arr.iterator.map(p => KeptPoint(uid, p._2, p._3, p._4))
        else {
          val keep = new Array[Boolean](n)
          keep(0) = true
          keep(n - 1) = true
          val stack = scala.collection.mutable.ArrayBuffer((0, n - 1))
          while (stack.nonEmpty) {
            val (a, b) = stack.remove(stack.length - 1)
            if (b - a >= 2) {
              val x0 = arr(a)._3; val y0 = arr(a)._4
              val x1 = arr(b)._3; val y1 = arr(b)._4
              val dx = x1 - x0; val dy = y1 - y0
              val sl2 = dx * dx + dy * dy
              var bestNum = -1L
              var bestI = -1
              var i = a + 1
              while (i < b) {
                val px = arr(i)._3 - x0; val py = arr(i)._4 - y0
                val num =
                  if (sl2 == 0L) px * px + py * py
                  else { val cr = dx * py - dy * px; cr * cr }
                if (num > bestNum) { bestNum = num; bestI = i } // first max wins
                i += 1
              }
              val threshold = if (sl2 == 0L) eps2 else eps2 * sl2
              if (bestNum > threshold) {
                keep(bestI) = true
                stack += ((a, bestI))
                stack += ((bestI, b))
              }
            }
          }
          arr.indices.iterator.filter(keep)
            .map(i => KeptPoint(uid, arr(i)._2, arr(i)._3, arr(i)._4))
        }
      }
  }
}
