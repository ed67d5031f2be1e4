package graft

import graft.multimodal.Multimodal
import graft.queries.LlmVectors

/** Properties of the corpus-size dials that every blocked self-join
  * hangs off (r13 verdict stretch task): the integer threshold
  * ladders must evaluate IDENTICALLY as Scala ([[LlmVectors
  * .ladderCount]], what the engine blocks with) and as the SQL text
  * emitted into the DuckDB oracles ([[LlmVectors.ladderSql]], what
  * the oracle blocks with) — a one-bit disagreement at any corpus
  * size silently splits the two engines' candidate sets. Spark
  * SQL-evaluates the emitted text here; DuckDB and Spark agree on
  * CASE/comparison semantics over BIGINT, so Spark-eval is a faithful
  * stand-in (and the 459-query oracle gate covers the DuckDB side at
  * three real corpus sizes). Plus the band guarantees the near-dup
  * blockers rely on: the simhash pigeonhole at ARBITRARY dialed
  * width, and phash exact-dup collision at every fine-bit dial.
  */
class DialLadderSpec extends SparkTestBase {

  /** Spark-evaluate a ladderSql emission against a literal n. */
  private def sqlEval(n: Long, base: Long, steps: Int): Int =
    spark.sql(
      s"SELECT ${LlmVectors.ladderSql("n", base, steps)} AS q " +
        s"FROM (SELECT CAST($n AS BIGINT) AS n)")
      .head().getInt(0)

  private val ladders = Seq( // (base, steps) of every shipped dial
    (512L, 12),  // signBandBits (llm_embed_neardup)
    (1000L, 24), // cellBits (llm_semdedup)
    (512L, 23),  // simhashBandBits
    (1000L, 12), // mm_phash_neardup fine bits (÷4)
    (8000L, 46)) // headroom shape (wide step count)

  test("ladderCount == Spark-eval of ladderSql at every threshold " +
      "boundary of every shipped dial") {
    ladders.foreach { case (base, steps) =>
      val boundaries = (0 until steps).flatMap { j =>
        val t = base << j
        Seq(t - 1, t, t + 1)
      } ++ Seq(0L, 1L, base - 1, Long.MaxValue / 4)
      boundaries.foreach { n =>
        assert(LlmVectors.ladderCount(n, base, steps) ==
          sqlEval(n, base, steps),
          s"ladder($base,$steps) disagrees at n=$n")
      }
    }
  }

  test("a mutated (off-by-one-shift) ladder SQL is caught at a " +
      "boundary (the property test is red on the mutation)") {
    val (base, steps) = (1000L, 12)
    val mutated = (0 until steps) // thresholds shifted one doubling up
      .map(j => s"CASE WHEN n > ${base << (j + 1)} THEN 1 ELSE 0 END")
      .mkString(" + ")
    val n = base + 1 // first boundary: real ladder says 1, mutant 0
    val q = spark.sql(
      s"SELECT $mutated AS q FROM (SELECT CAST($n AS BIGINT) AS n)")
      .head().getInt(0)
    assert(q != LlmVectors.ladderCount(n, base, steps),
      "mutation not detectable at the boundary — test has no teeth")
  }

  test("simhash pigeonhole: hamming <= 3 over the full 4w-bit hash " +
      "implies an exact band match at EVERY dialed width, through " +
      "the two-lane widths past w=15") {
    val rnd = new scala.util.Random(1414L)
    def maskBits(b: Int): Long =
      if (b <= 0) 0L else if (b >= 64) -1L else (1L << b) - 1
    (8 to 31).foreach { w => // simhashBandBits range incl. lane split
      // the engine's lane split: one long while 4w fits sign-safe,
      // two bands per lane beyond (simhashNearDup's loBits)
      val loBits = if (4 * w <= 60) 4 * w else 2 * w
      val hiBits = 4 * w - loBits
      (0 until 2000).foreach { _ =>
        val alo = rnd.nextLong() & maskBits(loBits)
        val ahi = rnd.nextLong() & maskBits(hiBits)
        // flip 0..3 random bit positions of the 4w-bit hash
        var blo = alo; var bhi = ahi
        (0 until rnd.nextInt(4)).foreach { _ =>
          val p = rnd.nextInt(4 * w)
          if (p < loBits) blo ^= 1L << p
          else bhi ^= 1L << (p - loBits)
        }
        val bandsEqual = (0 until 4).exists { j =>
          val g = j * w // band start; never straddles (loBits = 2w | 4w)
          if (g < loBits)
            ((alo >>> g) & maskBits(w)) == ((blo >>> g) & maskBits(w))
          else
            ((ahi >>> (g - loBits)) & maskBits(w)) ==
              ((bhi >>> (g - loBits)) & maskBits(w))
        }
        val ham = java.lang.Long.bitCount(alo ^ blo) +
          java.lang.Long.bitCount(ahi ^ bhi)
        assert(ham > 3 || bandsEqual,
          s"pigeonhole broken at w=$w lo=$alo/$blo hi=$ahi/$bhi")
      }
    }
  }

  test("phash: byte-identical images share every band key at every " +
      "fine-bit dial, and the stride walk never reuses a pixel") {
    // stride-23 injectivity over the 64 band pixels for i < 46
    val pos = (0 until 46).map(i => (i * 23) % 64)
    assert(pos.distinct.size == pos.size,
      "stride positions collide — extension bits would repeat")
    import spark.implicits._
    val rnd = new scala.util.Random(14)
    val bytes = Array.fill(256)(rnd.nextInt(256).toByte)
    Seq(0, 4, 16, 46).foreach { q =>
      val keys = Multimodal.phashBands(
        Seq(Multimodal.MediaRow(1L, bytes, "x"),
          Multimodal.MediaRow(2L, bytes.clone(), "x")).toDS(), q)
        .collect().groupBy(_.band).values
      assert(keys.forall(ks =>
        ks.map(_.bkey).distinct.length == 1 && ks.length == 2),
        s"exact dups split at q=$q")
    }
  }
}
