package graft.tools

import graft.core.{GraftSession, Tables}

/** Dev utility: print schema + a sample for each fixture table, or the
  * formatted physical plan of one registered query.
  *
  *   runMain graft.tools.Probe schemas <sfDir>
  *   runMain graft.tools.Probe explain <sfDir> <queryName>
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    args.toList match {
      case "schemas" :: dir :: Nil =>
        Tables.names.foreach { n =>
          println(s"== $n")
          val df = Tables.load(spark, dir, n)
          df.printSchema()
          df.show(3, truncate = 60)
        }
      // Subset correctness dump: like graft.Verify but only for the
      // named queries (comma-separated) — pair with
      // `tools/oracle_check.py <dir> <out> <only>` for fast iteration.
      case "dump" :: dir :: out :: names :: Nil =>
        new java.io.File(out).mkdirs()
        val wanted = names.split(',').toSet
        wanted.foreach { n =>
          graft.SparkEntry.queries(n)(spark, dir)
            .coalesce(1).write.mode("overwrite").parquet(s"$out/$n")
        }
        def q(s: String): String = "\"" + s.flatMap {
          case '"'  => "\\\""
          case '\\' => "\\\\"
          case '\n' => "\\n"
          case c if c < ' ' => f"\\u${c.toInt}%04x"
          case c => c.toString
        } + "\""
        val json = graft.SparkEntry.oracleSql.filter(kv => wanted(kv._1))
          .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$out/oracle_sql.json"), json)
      case "explain" :: dir :: name :: Nil =>
        graft.SparkEntry.queries(name)(spark, dir).explain("formatted")
      // AQE's runtime join re-planning (e.g. SMJ→BHJ once the build
      // side's true size is known) is invisible in the static plan:
      // execute, then print the FINAL adaptive plan. This is the audit
      // for "no broadcast hint, but AQE still broadcasts at this sf".
      case "explainExec" :: dir :: name :: Nil =>
        val df = graft.SparkEntry.queries(name)(spark, dir)
        df.collect()
        println(df.queryExecution.executedPlan.toString)
      case "time" :: dir :: name :: reps =>
        val n = reps.headOption.map(_.toInt).getOrElse(3)
        // win_topk_window: the row_number twin of win_topk_heap, kept
        // here (not graded — same results as win_topk_heap) purely for
        // heap-vs-sort A/B timing.
        val fn = if (name == "win_topk_window") {
          import org.apache.spark.sql.expressions.Window
          import org.apache.spark.sql.functions._
          (s: org.apache.spark.sql.SparkSession, d: String) =>
            Tables.load(s, d, "lineitem")
              .select("l_suppkey", "l_orderkey", "l_linenumber",
                "l_extendedprice")
              .withColumn("rn", row_number().over(
                Window.partitionBy("l_suppkey")
                  .orderBy(col("l_extendedprice").desc, col("l_orderkey"),
                    col("l_linenumber"))))
              .filter(col("rn") <= 5).drop("rn")
        } else graft.SparkEntry.queries(name)
        (1 to n).foreach { i =>
          val t0 = System.nanoTime()
          fn(spark, dir).write.mode("overwrite").format("noop").save()
          println(f"[time] $name rep $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
        }
      // Ad-hoc SQL over the fixture tables (each registered as a temp
      // view by name), statement read from the file at <path>. Full
      // 17-digit doubles so cross-engine ulp diffs are visible.
      case "sql" :: dir :: path :: Nil =>
        Tables.names.foreach(n =>
          Tables.load(spark, dir, n).createOrReplaceTempView(n))
        val stmt = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(path)), "UTF-8")
        spark.sql(stmt).collect().foreach { r =>
          println((0 until r.length).map { i =>
            r.get(i) match {
              case d: java.lang.Double => "%.17g".format(d)
              case v => String.valueOf(v)
            }
          }.mkString(" | "))
        }
      case other =>
        System.err.println(s"usage: schemas <dir> | explain <dir> <query>; got $other")
    }
    spark.stop()
  }
}
