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
      case "explain" :: dir :: name :: Nil =>
        graft.SparkEntry.queries(name)(spark, dir).explain("formatted")
      case other =>
        System.err.println(s"usage: schemas <dir> | explain <dir> <query>; got $other")
    }
    spark.stop()
  }
}
