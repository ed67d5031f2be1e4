package graft

import org.apache.spark.sql.Row

/** Semantic pins for the round-9 widening family
  * ([[graft.queries.Analytics3]]): cross-join cardinality, the EWMA
  * left-fold recurrence, PageRank mass conservation, Levenshtein
  * blocking admissibility, and the Zipf fit's shape. */
class Analytics3Spec extends SparkTestBase {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("join_cross: |nation| x |region| rows, one home region per nation") {
    val n = spark.read.parquet(s"$sf/nation.parquet").count()
    val r = spark.read.parquet(s"$sf/region.parquet").count()
    val out = q("join_cross").collect()
    assert(out.length == n * r)
    assert(out.map(_.getAs[Int]("is_home").toLong).sum == n)
  }

  test("win_ewma matches a driver-side left fold of the sorted values") {
    val byUser = spark.read.parquet(s"$sf/events.parquet")
      .orderBy("user_id", "ts", "event_id")
      .select("user_id", "value")
      .collect()
      .groupBy(_.getLong(0)) // Array.groupBy keeps encounter (sorted) order
      .map { case (u, rows) =>
        val vs = rows.map(_.getDouble(1))
        u -> vs.tail.foldLeft(vs.head)((acc, x) => 0.3d * x + 0.7d * acc)
      }
    val got = q("win_ewma").collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Double]("ewma")).toMap
    assert(got.keySet == byUser.keySet)
    got.foreach { case (u, e) =>
      assert(math.abs(e - byUser(u)) < 1e-12, s"user $u: $e vs ${byUser(u)}")
    }
  }

  test("graph_pagerank: one rank per event type, mass conserved") {
    val out = q("graph_pagerank").collect()
    val types = spark.read.parquet(s"$sf/events.parquet")
      .select("event_type").distinct().count()
    assert(out.length == types)
    val ranks = out.map(_.getAs[Double]("rank"))
    assert(ranks.forall(_ > 0))
    // complete transition graph: no dangling mass, so ranks sum to 1
    assert(math.abs(ranks.sum - 1.0) < 1e-9)
  }

  test("llm_edit_distance: blocked pairs are admissible and scored") {
    val out = q("llm_edit_distance").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val len = r.getAs[Long]("len_chars")
      val dist = r.getAs[Long]("dist")
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
      assert(len < 120)
      // Levenshtein on equal-length strings is at most the length
      assert(dist >= 0 && dist <= len)
      assert(math.abs(r.getAs[Double]("rel") - dist.toDouble / len) < 1e-12)
    }
  }

  test("agg_ttest_welch: welch df between min(n)-1 and pooled df") {
    val Array(row: Row) = q("agg_ttest_welch").collect()
    val (na, nb) = (row.getAs[Long]("n_a"), row.getAs[Long]("n_b"))
    assert(na > 1 && nb > 1)
    val df = row.getAs[Double]("df_welch")
    assert(df >= math.min(na, nb) - 1 && df <= na + nb - 2)
    assert(!row.getAs[Double]("t_stat").isNaN)
  }

  test("agg_chi2: nonnegative statistic, exact dof and n") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val langs = docs.select("lang").distinct().count()
    val sources = docs.select("source").distinct().count()
    val Array(row: Row) = q("agg_chi2").collect()
    assert(row.getAs[Double]("chi2") >= 0.0)
    assert(row.getAs[Long]("dof") == (langs - 1) * (sources - 1))
    assert(row.getAs[Long]("n") == docs.count())
  }

  test("join_asof_tolerance: in-tolerance matches equal join_asof, rest null") {
    val base = q("join_asof").collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[String]("signup_at")).toMap
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss")
    var nulled = 0
    q("join_asof_tolerance").collect().foreach { r =>
      val id = r.getAs[Long]("event_id")
      val got = r.getAs[String]("signup_at")
      val errAt = fmt.parse(r.getAs[String]("error_at")).getTime
      if (got != null) {
        assert(got == base(id), s"event $id: tolerance changed the match")
        assert(errAt - fmt.parse(got).getTime <= 2L * 3600 * 1000)
      } else if (base(id) != null) {
        // base match exists but is out of tolerance
        assert(errAt - fmt.parse(base(id)).getTime > 2L * 3600 * 1000)
        nulled += 1
      }
    }
    assert(nulled > 0, "fixture should have at least one out-of-tolerance match")
  }

  test("llm_zipf: negative slope, r2 in [0,1], at most 100 terms") {
    val Array(row: Row) = q("llm_zipf").collect()
    assert(row.getAs[Double]("zipf_slope") < 0.0)
    val r2 = row.getAs[Double]("zipf_r2")
    assert(r2 >= 0.0 && r2 <= 1.0)
    val n = row.getAs[Long]("n_terms")
    assert(n > 2 && n <= 100)
  }
}
