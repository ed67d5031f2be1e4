package graft

/** Global scale-guard invariants over EVERY registered query's plan:
  *
  *  1. No nondeterministic expression anywhere in the analyzed plan —
  *     a nondeterministic shuffle key is the classic row-loss/dup
  *     hazard under partial stage retry, and nondeterministic projects
  *     break result reproducibility between runs.
  *  2. No CartesianProduct in the physical plan — every pair-generating
  *     operator must be blocked/bucketed (LSH bands, source blocks,
  *     sign buckets). BroadcastNestedLoopJoin is allowed: it is the
  *     intended shape for tiny-side cross joins (query sets, scalar
  *     totals) and is bounded by the broadcast size.
  */
class PlanAuditSpec extends SparkTestBase {

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name: deterministic plan, no cartesian product") {
      val df = fn(spark, sf)
      val nondet = df.queryExecution.analyzed
        .collect { case p => p.expressions }.flatten
        .filter(!_.deterministic)
      assert(nondet.isEmpty,
        s"nondeterministic expressions in $name: ${nondet.take(3)}")
      val physical = df.queryExecution.executedPlan.toString
      assert(!physical.contains("CartesianProduct"),
        s"$name plans a CartesianProduct — pair generation must be blocked")
    }
  }

  // 3. Oracle-graded outputs must be scalar-only: the grading
  //    harness canonicalizes by a pandas row sort, which throws on
  //    ARRAY/MAP/STRUCT cells — such a query is red on the driver
  //    even when values agree (round-7 `llm_inverted_index`).
  //    Serialize nested results (array_join / to_json) before grading.
  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)
       if SparkEntry.oracleSql.contains(name)) {
    test(s"$name: oracle-graded schema is scalar-only") {
      import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
      val nested = fn(spark, sf).schema.fields.filter(f =>
        f.dataType.isInstanceOf[ArrayType] ||
          f.dataType.isInstanceOf[MapType] ||
          f.dataType.isInstanceOf[StructType])
      assert(nested.isEmpty,
        s"$name emits non-scalar graded columns " +
          s"${nested.map(f => s"${f.name}: ${f.dataType.simpleString}").mkString(", ")} — " +
          "the driver's pandas canonicalization cannot sort these")
    }
  }
}
