package graft

import org.apache.spark.sql.Row

/** Semantic pins for round-11 batch M ([[graft.queries.Analytics33]]). */
class Analytics33Spec extends SparkTestBase {

  private def run(name: String): Array[Row] =
    SparkEntry.queries(name)(spark, sf).collect()

  test("graph_scc: components partition the 25 nations; members of a " +
    "multi-node SCC are cyclic; scc_id is the component minimum") {
    val rows = run("graph_scc")
    assert(rows.length == 25)
    val byComp = rows.groupBy(_.getLong(1))
    byComp.foreach { case (cid, members) =>
      assert(members.head.getLong(2) == members.length,
        "scc_size must census the component")
      assert(members.map(_.getLong(0)).min == cid ||
        members.forall(_.getLong(2) == 1),
        "component id is its minimum member")
      if (members.length > 1)
        assert(members.forall(_.getBoolean(4)),
          "multi-node SCC members lie on a cycle")
    }
    assert(byComp.values.map(_.length).sum == 25,
      "components partition the node set")
  }

  test("events_propensity_strata: four strata, effects recompose, " +
    "arms census every user") {
    val rows = run("events_propensity_strata").sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    val nUsers = rows.map(r => r.getLong(1) + r.getLong(2)).sum
    val total = graft.core.Tables.load(spark, sf, "events")
      .select("user_id").distinct().count()
    assert(nUsers == total, "strata x arms must partition the users")
    rows.foreach { r =>
      assert(math.abs(r.getDouble(5)
        - (r.getDouble(3) - r.getDouble(4))) < 1e-12)
    }
  }

  test("llm_wordpiece_apply: pieces recompose a prefix of the word, " +
    "greedy always advances, top words tokenize to one piece at " +
    "most 4 chars or split") {
    val rows = run("llm_wordpiece_apply")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val word = r.getString(0)
      val pieces = Seq(2, 3, 4).flatMap(i =>
        if (r.isNullAt(i)) None else Some(r.getString(i)))
      assert(pieces.nonEmpty, s"$word must match at least one piece")
      assert(word.startsWith(pieces.mkString("")),
        s"$word pieces ${pieces} must concatenate to a prefix")
      assert(r.getLong(5) == pieces.length)
      assert(pieces.forall(p => p.nonEmpty && p.length <= 4))
      if (!r.getBoolean(6))
        assert(pieces.mkString("") == word,
          s"non-UNK word $word must be fully consumed in <=3 pieces")
    }
    assert(rows.exists(_.getLong(5) > 1), "some word must split")
    val nWords = rows.length
    val distinctWords = rows.map(_.getString(0)).distinct.length
    assert(nWords == distinctWords, "one row per distinct word")
  }
}
