package graft

import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeSet, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Project}
import org.apache.spark.sql.execution.columnar.InMemoryRelation
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.{ExternalRDD, LogicalRDD}
import org.apache.spark.sql.graftbridge.PlanDf
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared analysis for the fixed-block self-join census: finds every
  * equi-join whose two sides scan the SAME base relation (the shape
  * every blocked near-dup / dedup pairing takes) and MEASURES its true
  * candidate-pair mass Σ_k l_k·r_k — the number of row pairs the join
  * must consider — at two fixture scales. A data-proportional block
  * key keeps that mass growing like the input; a fixed-cardinality
  * block key (literal bucket arithmetic, a label column, bounded ints)
  * makes it grow like the input SQUARED. The r12 sf1 bench caught four
  * quadratic instances (mm_phash_neardup 38×, llm_embed_neardup 21×,
  * llm_semdedup 14×, llm_edit_distance 13× wall growth on 10× data) —
  * this census turns that class into a commit-time failure.
  *
  * Pair mass, not left-side occupancy: a per-group scalar-attach join
  * (big fact × 3-row aggregate on l_returnflag) has huge left blocks
  * but pair mass = |fact| because the right side holds one row per
  * key — linear and healthy. Only when BOTH sides put many rows in the
  * same block does mass outgrow the input.
  */
object SelfJoinCensus {

  /** One self-equi-join occurrence inside a query's optimized plan:
    * the oriented (left expr, right expr) key pairs plus both inputs. */
  final case class SelfJoin(
      keyPairs: Seq[(Expression, Expression)],
      left: LogicalPlan,
      right: LogicalPlan,
      shared: Set[String]) {
    def keySql: String = keyPairs.map(_._1.sql).mkString(", ")
  }

  /** Identity of the base relations under a plan: file paths for
    * parquet/csv scans, RDD identity for checkpointed memos, cache
    * builder identity for persisted frames. Two join sides sharing any
    * identity are a self-join on that relation. */
  private def leafIds(p: LogicalPlan): Set[String] = p.collect {
    case l: LogicalRelation => l.relation match {
      case f: HadoopFsRelation => f.location.rootPaths.map(_.toString).toSet
      case r => Set("rel:" + System.identityHashCode(r))
    }
    case r: LogicalRDD => Set("rdd:" + r.rdd.id)
    case r: ExternalRDD[_] => Set("xrdd:" + r.rdd.id)
    case m: InMemoryRelation =>
      Set("cache:" + System.identityHashCode(m.cacheBuilder))
  }.flatten.toSet

  /** Conjuncts of an expression. */
  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
      conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  /** All self-equi-joins in a query's optimized plan (any join type:
    * semi/anti probes pay the same per-block comparison mass a
    * sort-merge or hash join does, even though their output is
    * bounded by the left side). */
  def selfJoins(df: DataFrame): Seq[SelfJoin] =
    fromPlan(df.queryExecution.optimizedPlan)

  def fromPlan(plan: LogicalPlan): Seq[SelfJoin] = {
    plan.collect {
      case j: Join if j.condition.isDefined =>
        val lIds = leafIds(j.left); val rIds = leafIds(j.right)
        val shared = lIds intersect rIds
        if (shared.isEmpty) None
        else {
          val lOut = AttributeSet(j.left.output)
          val rOut = AttributeSet(j.right.output)
          val pairs = conjuncts(j.condition.get).collect {
            case EqualTo(a, b)
                if a.references.subsetOf(lOut) && b.references.subsetOf(rOut)
                  && a.references.nonEmpty && b.references.nonEmpty => (a, b)
            case EqualTo(a, b)
                if b.references.subsetOf(lOut) && a.references.subsetOf(rOut)
                  && b.references.nonEmpty && a.references.nonEmpty => (b, a)
          }
          if (pairs.isEmpty) None
          else Some(SelfJoin(pairs, j.left, j.right, shared))
        }
    }.flatten
  }

  /** Measured join statistics: input rows on each side and the true
    * candidate-pair mass Σ_k l_k·r_k over the equi-key blocks (the
    * pairs a hash or sort-merge join materializes per block before
    * any residual predicate filters them). */
  final case class JoinStats(lRows: Long, rRows: Long, mass: Long) {
    def maxRows: Long = math.max(lRows, rRows)
  }

  /** One Spark action: per-key counts on both sides, inner-joined on
    * the key tuple (mirroring the join's own null semantics — an
    * EqualTo key never matches NULL, so NULL-key rows carry no mass),
    * summing count products. */
  def joinStats(s: SparkSession, sj: SelfJoin): JoinStats = {
    import org.apache.spark.sql.functions._
    def counts(side: LogicalPlan, keys: Seq[Expression]): DataFrame = {
      val proj = Project(
        keys.zipWithIndex.map { case (e, i) => Alias(e, s"k$i")() }, side)
      val df = PlanDf.ofRows(s, proj)
      df.groupBy(df.columns.map(col): _*).count()
    }
    val l = counts(sj.left, sj.keyPairs.map(_._1))
      .withColumnRenamed("count", "lc")
    val r = counts(sj.right, sj.keyPairs.map(_._2))
      .withColumnRenamed("count", "rc")
    val keyCols = sj.keyPairs.indices.map(i => s"k$i")
    val row = l.join(r, keyCols.toSeq, "inner")
      .agg(sum(expr("lc * rc")).as("mass"))
      .join(l.agg(sum("lc").as("ln")))
      .join(r.agg(sum("rc").as("rn")))
      .collect()(0)
    def g(i: Int): Long = if (row.isNullAt(i)) 0L else row.getLong(i)
    JoinStats(g(1), g(2), g(0))
  }
}
