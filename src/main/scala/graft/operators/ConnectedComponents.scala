package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.CkptTap._

/** Connected components via the alternating large-star / small-star
  * algorithm (Kiveris et al., "Connected Components in MapReduce and
  * Beyond", SoCC'14) — the scale path for BIG edge sets, complementing
  * the simple min-label propagation in [[graft.queries.LlmText]]:
  * label propagation converges in O(diameter) rounds, while the
  * star operations contract the graph in O(log n) rounds and keep
  * per-round state proportional to the (shrinking) edge set. Both
  * produce the same labeling: every node → the minimum node id of its
  * component.
  *
  * Each round is two shuffles (a groupBy per star step); edges only
  * ever rewire toward smaller ids, so `sum(src + dst)` strictly
  * decreases until the fixpoint — that monotone invariant is the
  * convergence check (one cheap agg per round, no edge-set diff).
  */
object ConnectedComponents {

  /** Minimum edges per partition for the star rounds to be worth
    * distributing: below this, a round's two shuffles are pure
    * scheduling overhead. The small-graph cutover is derived as
    * `defaultParallelism × this`, so it scales with the cluster — on
    * the 32-core sandbox it sits near the old hand-picked 100k
    * constant, on a 1000-executor cluster it moves ~1000× higher,
    * which is exactly where the overhead/parallelism tradeoff moves. */
  private[graft] val EdgesPerPartitionFloor = 4096L

  /** The small-graph decision, factored out so the cutover arithmetic
    * is unit-testable: Some(targetPartitions) when the edge set is too
    * small to be worth the default layout, None to keep it. */
  private[graft] def smallGraphPartitions(
      edgeCount: Long, parallelism: Int): Option[Int] =
    if (edgeCount < parallelism * EdgesPerPartitionFloor)
      Some(math.max(1L, edgeCount / EdgesPerPartitionFloor).toInt)
    else None

  /** One star step. Large connects strictly-larger neighbors of each
    * node to the minimum of its closed neighborhood; small connects the
    * ≤ neighbors (and the node itself) to that minimum. */
  private def star(edges: DataFrame, large: Boolean): DataFrame = {
    val nbrs = edges.unionByName(
      edges.select(col("dst").as("src"), col("src").as("dst")))
    val mins = nbrs.groupBy("src")
      .agg(min(col("dst")).as("mn"))
      .select(col("src"), least(col("src"), col("mn")).as("m"))
    val joined = nbrs.join(mins, "src")
    val rewired =
      if (large) joined.filter(col("dst") > col("src"))
        .select(col("dst").as("src"), col("m").as("dst"))
      else joined.filter(col("dst") <= col("src"))
        .select(col("dst").as("src"), col("m").as("dst"))
        .unionByName(mins.select(col("src"), col("m").as("dst")))
    rewired.filter(col("src") =!= col("dst")).distinct()
  }

  /** @param edges two LONG columns (src, dst), undirected, self-loops
    *              ignored.
    * @param checkpointDir when set, per-round state is truncated via
    *        RELIABLE `df.tappedCheckpoint()` into this directory instead of
    *        executor-local `localCheckpoint()`. localCheckpoint blocks
    *        live only on executors: at 100 TB an executor loss
    *        mid-iteration loses blocks with NO recompute path (lineage
    *        was truncated) and kills the whole job. A checkpoint dir on
    *        durable storage (HDFS/S3) survives executor churn — the
    *        right mode on a real cluster; the default stays local for
    *        single-JVM sandbox runs where there is no executor to lose.
    * @return (node, component) where component = min node id reachable;
    *         every node of `edges` appears exactly once. */
  def components(spark: SparkSession, edges: DataFrame,
                 maxRounds: Int = 25,
                 checkpointDir: Option[String] = None): DataFrame = {
    val ckpt: DataFrame => DataFrame = checkpointDir match {
      case Some(dir) =>
        spark.sparkContext.setCheckpointDir(dir)
        df => df.tappedCheckpoint()
      case None => df => df.tappedLocalCheckpoint()
    }
    val nodes = ckpt(edges.select(col("src").as("node"))
      .unionByName(edges.select(col("dst").as("node"))).distinct())
    var e = ckpt(edges.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst")).distinct())
    // Small graphs collapse to the fewest partitions that keep
    // `EdgesPerPartitionFloor` edges per slot: each star round is two
    // shuffles, and on a tiny edge set the rounds are pure scheduling
    // overhead across the full default layout. Big graphs keep the
    // distributed layout (same adaptive layout as the label-propagation
    // loop). The cutover is parallelism-derived, not a magic constant.
    smallGraphPartitions(e.count(), spark.sparkContext.defaultParallelism)
      .foreach(parts => e = ckpt(e.coalesce(parts)))
    var prevSum = BigDecimal(-1)
    var converged = e.isEmpty
    var iter = 0
    while (!converged && iter < maxRounds) {
      val prev = e
      e = ckpt(star(star(e, large = true), large = false))
      val sum = Option(
        e.agg(org.apache.spark.sql.functions.sum(
          col("src").cast("decimal(38,0)") + col("dst").cast("decimal(38,0)")))
          .head().getDecimal(0))
        .map(BigDecimal(_)).getOrElse(BigDecimal(0))
      // equal sums almost always means the fixpoint; confirm with an
      // exact set diff only on those (rare) rounds
      converged = sum == prevSum &&
        e.exceptAll(prev).isEmpty && prev.exceptAll(e).isEmpty
      prevSum = sum
      iter += 1
    }
    // Kiveris et al. prove O(log^2 n) rounds worst-case for alternating
    // large-star/small-star (typically far fewer in practice), and the
    // fixpoint detection needs one extra confirming round — so the
    // default cap of 25 is a practical bound, not a guarantee; callers
    // with pathological graphs can raise `maxRounds`. If the fixpoint
    // check still hasn't passed at the cap, returning labels from a
    // non-fixpoint edge set would silently hand back WRONG component
    // assignments — fail loudly instead.
    if (!converged) throw new IllegalStateException(
      s"connected components did not converge after $iter star rounds; " +
        "edge set is not a star forest — refusing to emit partial labels")
    // At the fixpoint the graph is a star forest: every non-root points
    // straight at its component minimum.
    val labels = e.groupBy(col("src").as("node"))
      .agg(min(col("dst")).as("component"))
    nodes.join(labels, Seq("node"), "left")
      .select(col("node"),
        least(col("node"), coalesce(col("component"), col("node")))
          .as("component"))
  }
}
