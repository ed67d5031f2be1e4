package graft.tools

import org.apache.spark.sql.functions._

import graft.core.GraftSession
import graft.multimodal.Multimodal
import graft.core.CkptTap._

/** Dev utility: sweep the phash blocking dial — for each candidate q
  * (total fine blocking bits), report the banded-LSH candidate-pair
  * count, the max bucket occupancy, and the blocking recall against
  * the hamming ≤ 6 truth restricted to the q=0 candidate set (an
  * upper-bound proxy: exact truth is all-pairs, which is the thing
  * the dial exists to avoid).
  *
  *   runMain graft.tools.PhashProbe <sfDir> <q1,q2,...>
  */
object PhashProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val dir = args(0)
    val qs = args(1).split(',').map(_.toInt)
    val media = Multimodal.mediaFromDocuments(spark, dir)
    qs.foreach { q =>
      val bands = Multimodal.phashBands(media, q).toDF()
        .tappedLocalCheckpoint()
      val occ = bands.groupBy("band", "bkey").count()
        .agg(max("count").as("maxb"),
          sum(expr("count * (count - 1) / 2")).as("mass"))
        .collect()(0)
      val a = bands.select(col("media_id").as("da"), col("band"), col("bkey"))
      val b = bands.select(col("media_id").as("db"), col("band"),
        col("bkey").as("bkb"))
      val nCand = a.join(b, a("band") === b("band") &&
          a("bkey") === b("bkb") && a("da") < b("db"))
        .select("da", "db").distinct().count()
      println(f"[phash-probe] q=$q%-3d maxBucket=${occ.getLong(0)}%-7d " +
        f"bandPairMass=${occ.getDouble(1)}%.3g distinctCand=$nCand")
      bands.unpersist(true)
    }
    spark.stop()
  }
}
