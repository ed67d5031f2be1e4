package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col

import graft.functions.CleanFns

/** Pins every edge case the reference encodes (dump_bigq.py:70-127)
  * plus the two documented divergences ('1,234K' and 'NaN'). */
class CleanFnsSpec extends SparkTestBase {
  import spark.implicits._

  private def one(fn: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
      v: String): Any = {
    val r = Seq(Option(v)).toDF("x").select(fn(col("x")).as("y")).head()
    if (r.isNullAt(0)) null else r.get(0)
  }

  test("T1 parseDate: 'Mar 07, 2025' and null-producing inputs") {
    assert(one(CleanFns.parseDate, "Mar 07, 2025").toString == "2025-03-07")
    assert(one(CleanFns.parseDate, " Feb 01, 2024 ").toString == "2024-02-01")
    assert(one(CleanFns.parseDate, "") == null)
    assert(one(CleanFns.parseDate, "nan") == null)
    assert(one(CleanFns.parseDate, null) == null)
  }

  test("T2 parseCommaNumber: commas stripped, garbage -> null") {
    assert(one(CleanFns.parseCommaNumber, "42,801.72") == 42801.72)
    assert(one(CleanFns.parseCommaNumber, "1,234,567.89") == 1234567.89)
    assert(one(CleanFns.parseCommaNumber, "17.5") == 17.5)
    assert(one(CleanFns.parseCommaNumber, "") == null)
    assert(one(CleanFns.parseCommaNumber, "nan") == null)
    assert(one(CleanFns.parseCommaNumber, "abc") == null)
  }

  test("T3 parseMagnitude: K/M/B suffixes, reference comma parity") {
    assert(one(CleanFns.parseMagnitude, "55.7K") == 55700.0)
    assert(one(CleanFns.parseMagnitude, "763.44M") == 763440000.0)
    assert(one(CleanFns.parseMagnitude, "1.2B") == 1.2e9)
    assert(one(CleanFns.parseMagnitude, "1,234") == 1234.0)
    // reference parity: float('1,234') raises inside the K branch -> None
    assert(one(CleanFns.parseMagnitude, "1,234K") == null)
    assert(one(CleanFns.parseMagnitude, "") == null)
    assert(one(CleanFns.parseMagnitude, "nan") == null)
    // documented divergence: reference would yield float NaN for 'NaN'
    assert(one(CleanFns.parseMagnitude, "NaN") == null)
    assert(one(CleanFns.parseMagnitude, "junk") == null)
  }

  test("T4 parsePercent: sign kept, all trailing % stripped") {
    assert(one(CleanFns.parsePercent, "+0.52%") == 0.52)
    assert(one(CleanFns.parsePercent, "-0.99%") == -0.99)
    assert(one(CleanFns.parsePercent, "0.00%") == 0.0)
    assert(one(CleanFns.parsePercent, "1.5%%") == 1.5)
    assert(one(CleanFns.parsePercent, "") == null)
    assert(one(CleanFns.parsePercent, "nan") == null)
  }

  test("T5 normalizeColumns: first matching variant renamed") {
    val df = Seq(("a", "b")).toDF("Vol.", "Change %")
    val n = CleanFns.normalizeColumns(df, CleanFns.stockDriftMap)
    assert(n.columns.toSeq == Seq("Vol", "Change"))
    // already-canonical names untouched
    val ok = Seq(("a", "b")).toDF("Vol", "Change")
    assert(CleanFns.normalizeColumns(ok, CleanFns.stockDriftMap)
      .columns.toSeq == Seq("Vol", "Change"))
  }

  test("UDF twin parseMagnitudeScala matches the Column expression") {
    import graft.udf.Udfs.parseMagnitudeScala
    for (v <- Seq("55.7K", "763.44M", "1.2B", "1,234", "1,234K", "", "nan",
        "NaN", "junk", "42.0")) {
      val expr = one(CleanFns.parseMagnitude, v)
      val udf = parseMagnitudeScala(v).map(_.asInstanceOf[Any]).orNull
      assert(expr == udf, s"mismatch for '$v': expr=$expr udf=$udf")
    }
  }
}
