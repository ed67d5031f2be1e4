package graft

import org.apache.spark.sql.functions._

/** Properties of the native Misra-Gries heavy-hitters aggregate. */
class MisraGriesSpec extends SparkTestBase {

  import spark.implicits._

  test("guaranteed retention: every key with freq > n/(k+1) is a candidate") {
    // 1000 rows: "a" 400, "b" 300, "c" 200, then 100 singletons — with
    // k=8, anything above 1000/9 ≈ 111 must survive any merge order.
    val rows = Seq.fill(400)("a") ++ Seq.fill(300)("b") ++
      Seq.fill(200)("c") ++ (1 to 100).map(i => s"u$i")
    // scramble deterministically and spread over many partitions to
    // exercise partial buffers + merges
    val df = rows.zipWithIndex
      .sortBy { case (v, i) => (i * 2654435761L) % 1000003 }
      .map(_._1).toDF("k").repartition(16)
    val cands = df.agg(expr("heavy_hitters(k, 8)").as("c"))
      .head().getSeq[String](0).toSet
    assert(Set("a", "b", "c").subsetOf(cands), s"lost a heavy hitter: $cands")
    assert(cands.size <= 8, s"buffer exceeded k: $cands")
  }

  test("uniform stream: candidate count never exceeds k") {
    val df = (1 to 5000).map(i => s"key${i % 500}").toDF("k").repartition(8)
    val cands = df.agg(expr("heavy_hitters(k, 4)").as("c"))
      .head().getSeq[String](0)
    assert(cands.size <= 4)
  }

  test("nulls are ignored and integral keys stringify") {
    val df = Seq[(java.lang.Long, Int)]((1L, 0), (1L, 0), (null, 0), (2L, 0))
      .toDF("k", "z")
    val cands = df.agg(expr("heavy_hitters(k, 4)").as("c"))
      .head().getSeq[String](0).toSet
    assert(cands == Set("1", "2"))
  }

  test("morton interleave puts a in even bits, b in odd bits") {
    val df = Seq((3L, 5L), (0L, 1L), (1L, 0L), (65535L, 65535L))
      .toDF("a", "b")
      .select(graft.queries.ScaleOps.morton(col("a"), col("b")).as("z"))
    val zs = df.collect().map(_.getLong(0))
    // 3=0b11 spreads to 0b101; 5=0b101 spreads to 0b10001, shifted 0b100010
    assert(zs(0) == (5L | (17L << 1)))
    assert(zs(1) == 2L)
    assert(zs(2) == 1L)
    assert(zs(3) == 0xFFFFFFFFL)
  }
}
