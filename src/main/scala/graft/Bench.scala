package graft
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Benchmark main: times every registered query at SPARK_GRAFT_SF_DIR and
  * prints one JSON line. A failing query is recorded with ok=false and a
  * negative time so it can never masquerade as a fast success.
  *
  * Besides wall-clock, a task listener attributes shuffle read/write and
  * disk spill to each query — the numbers that actually predict 100 TB
  * behavior (a fast query that shuffles the world is a scale bug).
  * Listener events are async; totals are settled with a short drain and
  * are per-query approximate, cumulative-exact.
  */
object Bench {

  private class Metrics extends SparkListener {
    val shuffleRead = new AtomicLong; val shuffleWrite = new AtomicLong
    val spilled = new AtomicLong
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        shuffleRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        spilled.addAndGet(m.diskBytesSpilled)
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.get()
    val metrics = new Metrics
    spark.sparkContext.addSparkListener(metrics)
    // Warm the JVM/codegen once so per-query numbers measure the plan,
    // not first-query classloading.
    SparkEntry.entry(spark).count()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val r0 = metrics.shuffleRead.get; val w0 = metrics.shuffleWrite.get
      val s0 = metrics.spilled.get
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.mode("overwrite").format("noop").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
        }
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(50) // let straggler task-end events drain
      (name, if (ok) sec else -sec, ok,
        metrics.shuffleRead.get - r0, metrics.shuffleWrite.get - w0,
        metrics.spilled.get - s0)
    }
    def mb(b: Long): String = f"${b / 1048576.0}%.1f"
    val qs = results.map { case (k, v, _, _, _, _) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val shuffle = results
      .map { case (k, _, _, r, w, s) =>
        "\"" + k + "\":{\"read_mb\":" + mb(r) + ",\"write_mb\":" + mb(w) +
          ",\"spill_mb\":" + mb(s) + "}" }
      .mkString("{", ",", "}")
    val failed = results.filterNot(_._3).map("\"" + _._1 + "\"").mkString("[", ",", "]")
    val total = results.filter(_._3).map(_._2).sum
    // The driver contract is ONE JSON line with exactly these keys and a
    // numeric sf — extras (per-query shuffle attribution, failures) go to
    // stderr so a strict line parser can't choke on them.
    val sfNum = "sf([0-9.]+)".r.findFirstMatchIn(sfDir)
      .map(_.group(1)).getOrElse("0")
    System.err.println(
      s"""[bench-detail] {"failed":$failed,"shuffle":$shuffle,"dir":"$sfDir"}""")
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":$sfNum}""")
    spark.stop()
  }
}
