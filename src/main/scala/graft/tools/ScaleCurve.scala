package graft.tools

import graft.core.GraftSession

/** Time a fixed set of headline queries across fixture dirs of
  * increasing scale and print a per-query curve — the measurement
  * behind PLANS.md's scaling table (does each family scale ~linearly
  * from sf0.01 → sf0.1 → sf1, or is something super-linear hiding in
  * the plan?).
  *
  *   runMain graft.tools.ScaleCurve <dir1,dir2,...> [queriesCsv]
  *
  * Per dir: `llm_stage_index` runs first (same policy as
  * [[graft.Bench]] — consumers measure their own cost against warm
  * memos), then each query once. Output: one `[curve]` line per
  * (dir, query) plus a markdown summary table on stdout at the end.
  */
object ScaleCurve {

  private val defaultQueries = Seq(
    "q1_agg", "agg_grouping_sets", "agg_cube", "agg_poisson_bootstrap",
    "join_inner_star", "join_salted", "join_asof",
    "win_moving_avg", "win_topk_heap", "sort_topn", "events_sessionize",
    "text_tokens", "text_quality",
    "llm_stage_index", "llm_exact_dedup", "llm_minhash_neardup",
    "llm_dedup_clusters", "llm_incremental_dedup", "llm_hard_negatives",
    "llm_cosine_topk", "llm_ann_ivf", "llm_kmeans_train",
    "stream_tumbling")

  def main(args: Array[String]): Unit = {
    val dirs = args(0).split(',').toSeq
    val queries = if (args.length > 1) args(1).split(',').toSeq
      else defaultQueries
    val spark = GraftSession.get()
    // JVM/codegen warmup so the smallest dir isn't charged for it
    graft.SparkEntry.entry(spark).count()
    val times = scala.collection.mutable.LinkedHashMap
      .empty[(String, String), Double]
    dirs.foreach { dir =>
      val ordered = queries.filter(_ == "llm_stage_index") ++
        queries.filterNot(_ == "llm_stage_index")
      ordered.foreach { q =>
        val t0 = System.nanoTime()
        val ok =
          try {
            graft.SparkEntry.queries(q)(spark, dir)
              .write.mode("overwrite").format("noop").save(); true
          } catch { case e: Throwable =>
            System.err.println(s"[curve] $q @ $dir FAILED: ${e.getMessage}")
            false
          }
        val sec = (System.nanoTime() - t0) / 1e9
        times((dir, q)) = if (ok) sec else -sec
        println(f"[curve] $dir $q ${sec}%.2f s")
      }
      // each dir's memoized indexes are its own; release before the
      // next scale so storage doesn't accumulate across dirs
      graft.core.CacheRelease(spark)
    }
    println("\n| query | " + dirs.map(d => d.split('/').last).mkString(" | ") + " |")
    println("|---|" + dirs.map(_ => "---|").mkString)
    queries.foreach { q =>
      println(s"| $q | " +
        dirs.map(d => f"${times.getOrElse((d, q), Double.NaN)}%.2f").mkString(" | ") + " |")
    }
    spark.stop()
  }
}
