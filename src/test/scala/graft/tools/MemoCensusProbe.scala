package graft.tools

import graft.SelfJoinCensus
import graft.core.CkptTap

/** Dev diagnostic (not a graded path): replay the SelfJoinCensus's
  * checkpoint-tap sweep QUERY BY QUERY and print every tapped
  * self-equi-join's key SQL plus its measured pair mass at each given
  * fixture dir — the per-query attribution the census test
  * deliberately pools away (memos belong to whichever query builds
  * them first; this probe builds fresh per query name passed, so the
  * first name listed owns the memo plans).
  *
  *   runMain graft.tools.MemoCensusProbe <dirA> <dirB> <q1,q2,...>
  */
object MemoCensusProbe {
  def main(args: Array[String]): Unit = {
    val Array(dirA, dirB, names) = args.take(3)
    val spark = graft.core.GraftSession.get()
    val nameList =
      if (names == "@all") graft.SparkEntry.queries.keys.toSeq.sorted
      else names.split(',').filter(_.nonEmpty).toSeq
    nameList.foreach { name =>
      Seq(dirA, dirB).foreach { dir =>
        CkptTap.start()
        val visible =
          try {
            val df = CkptTap.labeled(dir) {
              graft.SparkEntry.queries(name)(spark, dir)
            }
            SelfJoinCensus.selfJoins(df).map(("visible", _))
          } catch {
            case e: Throwable =>
              println(s"[$name @ $dir] FAILED: ${e.getMessage}")
              Seq.empty
          }
        val tapped = CkptTap.stop().filter(_.label == dir)
          .flatMap(t => SelfJoinCensus.fromPlan(t.plan).map(("tapped", _)))
        (visible ++ tapped).foreach { case (kind, sj) =>
          val st = SelfJoinCensus.joinStats(spark, sj)
          println(f"[$name @ $dir] $kind mass=${st.mass}%,d " +
            f"l=${st.lRows}%,d r=${st.rRows}%,d key=[${sj.keySql}]")
        }
      }
    }
    spark.stop()
  }
}
