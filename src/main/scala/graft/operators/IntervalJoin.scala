package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval join WITHOUT an equi key, as a bucketed equi-join.
  *
  * Spark plans a pure range predicate (no equality conjunct) as a
  * BroadcastNestedLoopJoin or CartesianProduct — quadratic work per
  * partition pair, the classic 100 TB killer. The standard fix is to
  * manufacture the equality: quantize time into `widthSec` buckets,
  * explode each interval into every bucket it overlaps, map each point
  * to its single containing bucket, equi-join on the bucket id, and
  * refine with the exact containment predicate.
  *
  * Each point lands in exactly ONE bucket, so a (point, interval) pair
  * meets exactly once — no dedup pass. Cost scales with
  * |points| + |intervals| × (span/width + 1): pick `widthSec` near the
  * typical interval span so intervals explode into ~2 buckets.
  */
object IntervalJoin {

  /** @param points    frame with a timestamp column `ptTs`
    * @param intervals frame with timestamp columns `lo`, `hi`
    *                  (column names across the two frames must not
    *                  collide — alias beforehand)
    * @return matched pairs where `lo <= ptTs < hi`, all columns of
    *         both inputs. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      ptTs: String, lo: String, hi: String, widthSec: Long): DataFrame = {
    require(widthSec > 0, s"widthSec must be positive, got $widthSec")
    val taken = (points.columns ++ intervals.columns).toSet
    val bkt = Iterator.from(0).map(i => s"__bkt$i")
      .find(!taken.contains(_)).get
    val pb = points.withColumn(bkt,
      floor(col(ptTs).cast("long") / widthSec))
    val ib = intervals.withColumn(bkt,
      explode(sequence(floor(col(lo).cast("long") / widthSec),
        floor(col(hi).cast("long") / widthSec))))
    pb.join(ib, Seq(bkt))
      .filter(col(ptTs) >= col(lo) && col(ptTs) < col(hi))
      .drop(bkt)
  }
}
