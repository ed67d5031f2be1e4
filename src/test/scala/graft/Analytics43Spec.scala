package graft

import org.apache.spark.sql.Row

/** Semantic pins for round-11 batch W ([[graft.queries.Analytics43]]). */
class Analytics43Spec extends SparkTestBase {

  private def run(name: String): Array[Row] =
    SparkEntry.queries(name)(spark, sf).collect()

  test("agg_isotonic: fit is monotone, bounded by the data range, and " +
    "mean-preserving (the PAV invariants)") {
    val rows = run("agg_isotonic")
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(rows.length > 10)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 >= a._3, s"monotone violated at x=${b._1}")
    }
    val (yMin, yMax) = (rows.map(_._2).min, rows.map(_._2).max)
    rows.foreach(r => assert(r._3 >= yMin && r._3 <= yMax))
    val (sy, syh) = (rows.map(_._2).sum, rows.map(_._3).sum)
    assert(math.abs(sy - syh) / math.abs(sy) < 1e-9,
      "PAV preserves the total (block means preserve block sums)")
  }

  test("agg_isotonic: fit equals a driver-side PAV stack replica") {
    val rows = run("agg_isotonic")
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1)
    // classic PAV with a merge stack, exact rational means via sums
    case class Block(sum: Double, n: Long)
    val stack = scala.collection.mutable.ArrayBuffer.empty[Block]
    rows.foreach { r =>
      var b = Block(r._2, 1)
      while (stack.nonEmpty &&
        stack.last.sum / stack.last.n >= b.sum / b.n) {
        val t = stack.remove(stack.length - 1)
        b = Block(t.sum + b.sum, t.n + b.n)
      }
      stack += b
    }
    val fit = stack.flatMap(b => Seq.fill(b.n.toInt)(b.sum / b.n))
    rows.map(_._3).zip(fit).zipWithIndex.foreach { case ((got, want), i) =>
      assert(math.abs(got - want) < 1e-6 * (1.0 + math.abs(want)),
        s"PAV mismatch at index $i: $got vs $want")
    }
  }

  test("agg_periodogram: 29 candidate periods, normalized power in [0,1]") {
    val rows = run("agg_periodogram")
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(rows.map(_._1).sorted.toSeq == (2L to 30L).toSeq)
    rows.foreach { case (p, pw) =>
      assert(pw >= 0.0 && pw <= 1.0 + 1e-12, s"period $p power $pw")
    }
  }
}
