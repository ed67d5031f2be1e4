package graft

import graft.operators.ConnectedComponents

class ConnectedComponentsSpec extends SparkTestBase {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.components(spark, edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain, triangle, and isolated pair each collapse to their min") {
    val out = run(Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),   // chain 1-2-3-4
      (10L, 11L), (11L, 12L), (12L, 10L), // triangle
      (20L, 21L)))
    assert(out == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("long path converges (log-round contraction, not diameter walks)") {
    val path = (0L until 40L).map(i => (i, i + 1))
    val out = run(path)
    assert(out.size == 41 && out.values.forall(_ == 0L))
  }

  test("self-loops and duplicate/reversed edges are harmless") {
    val out = run(Seq((5L, 5L), (6L, 7L), (7L, 6L), (6L, 7L)))
    assert(out == Map(5L -> 5L, 6L -> 6L, 7L -> 6L))
  }

  test("matches a reference union-find on 12 random graphs") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 12) {
      val nNodes = rnd.nextInt(30) + 2
      val nEdges = rnd.nextInt(50) + 1
      val edges = Seq.fill(nEdges)(
        (rnd.nextInt(nNodes).toLong, rnd.nextInt(nNodes).toLong))
      // reference: in-memory union-find with min-label roots
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      def union(a: Long, b: Long): Unit = {
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      edges.foreach { case (a, b) => union(a, b) }
      val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(n => n -> find(n)).toMap
      val got = run(edges)
      assert(got == expected, s"trial $trial: $edges")
    }
  }

  test("reliable-checkpoint mode produces identical labels and writes " +
       "recoverable state") {
    // The 100 TB failure mode: localCheckpoint blocks die with their
    // executor and lineage is already truncated — job lost. With a
    // checkpoint dir, per-round state lands on durable storage instead.
    val dir = java.nio.file.Files
      .createTempDirectory("graft-cc-ckpt").toString
    try {
      val edges = Seq(
        (1L, 2L), (2L, 3L), (3L, 4L),
        (10L, 11L), (11L, 12L), (12L, 10L),
        (20L, 21L)).toDF("src", "dst")
      val reliable = ConnectedComponents
        .components(spark, edges, checkpointDir = Some(dir))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val local = ConnectedComponents.components(spark, edges)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(reliable == local)
      // reliable mode must have actually materialized RDD checkpoints
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(p => p.getFileName.toString.startsWith("rdd-"))
        .count()
      assert(wrote > 0, "no rdd-* checkpoint dirs written — reliable " +
        "mode silently fell back to local lineage truncation")
    } finally {
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(dir))
    }
  }

  test("small-graph cutover scales with parallelism, not a magic constant") {
    import ConnectedComponents.{smallGraphPartitions, EdgesPerPartitionFloor}
    // tiny graph, sandbox parallelism: collapse to one partition
    assert(smallGraphPartitions(10L, 32) == Some(1))
    // mid-size: enough edges for a few partitions, still below cutover
    assert(smallGraphPartitions(50000L, 32) == Some((50000L / EdgesPerPartitionFloor).toInt))
    // above 32-core cutover (32 × floor = 131072): keep the layout
    assert(smallGraphPartitions(200000L, 32).isEmpty)
    // the SAME 200k edges on a 1000-executor cluster ARE small — the
    // cutover moved with the cluster, which is the point
    assert(smallGraphPartitions(200000L, 1000) == Some((200000L / EdgesPerPartitionFloor).toInt))
  }

  test("above-cutover graph keeps the distributed path and stays correct") {
    // defaultParallelism in the test session is 4 → cutover = 16384
    // edges; 100 chains × 200 edges = 20000 edges exercises the
    // keep-the-layout branch end-to-end with known components.
    val cutover = spark.sparkContext.defaultParallelism *
      ConnectedComponents.EdgesPerPartitionFloor
    val edges = for {
      chain <- 0L until 100L
      i <- 0L until 200L
    } yield (chain * 1000L + i, chain * 1000L + i + 1)
    assert(edges.size > cutover,
      s"fixture too small to exercise the distributed branch ($cutover)")
    val out = run(edges)
    assert(out.size == 100 * 201)
    assert(out.forall { case (node, comp) => comp == (node / 1000L) * 1000L })
  }

  test("matches the label-propagation clustering on fixture near-dups") {
    val a = graft.queries.LlmText.queries("llm_dedup_clusters")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    val b = graft.queries.LlmText.queries("llm_cc_altstar")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(a == b && a.nonEmpty)
  }
}
