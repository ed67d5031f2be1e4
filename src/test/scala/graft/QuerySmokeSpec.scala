package graft

/** Every registered query runs at sf0.001 and (except the legitimately
  * sparse near-dup outputs) returns rows. Complements the driver's
  * sf0.01 oracle gate with a fast local smoke. */
class QuerySmokeSpec extends SparkTestBase {

  private val mayBeEmpty = Set(
    "llm_ngram_jaccard", "llm_minhash_neardup", "llm_embed_neardup",
    "stream_late_drop", "join_anti")

  test("oracle coverage: every query has an oracle SQL twin") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle: $missing")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val n = fn(spark, sf).count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
