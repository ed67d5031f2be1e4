package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, DoubleType}

/** Cleaning operators T1-T6 from SURVEY.md §2A, as pure Column
  * expressions (whole-stage-codegen'd; no UDF serialization).
  *
  * Semantics are pinned to the reference's null-production rules
  * (reference `dump_bigq.py:70-86`, `:97-127`): empty string -> null,
  * literal 'nan' (any case) -> null, unparseable -> null. The same
  * rules are mirrored verbatim in the DuckDB oracle SQL so both
  * sides stay pinned (SURVEY.md §7 "hard parts").
  *
  * NOTE: these rely on non-ANSI cast semantics (failed cast -> null),
  * i.e. `spark.sql.ansi.enabled=false` — set by [[graft.core.GraftSession]].
  */
object CleanFns {

  private def nullish(c: Column): Column =
    c.isNull || lower(trim(c)).isin("", "nan")

  /** T1: `"Mar 07, 2025"` -> DATE. (reference `dump_bigq.py:97-99`) */
  def parseDate(c: Column): Column =
    when(nullish(c), lit(null).cast(DateType))
      .otherwise(to_date(trim(c), "MMM dd, yyyy"))

  /** T2: `"42,801.72"` -> 42801.72; ''/'nan'/garbage -> null.
    * (reference `dump_bigq.py:102-111`) */
  def parseCommaNumber(c: Column): Column =
    when(nullish(c), lit(null).cast(DoubleType))
      .otherwise(regexp_replace(trim(c), ",", "").cast(DoubleType))

  /** T3: magnitude-suffixed volume: `763.44M` -> 7.6344e8, `K` -> 1e3,
    * `B` -> 1e9, plain (with commas) -> double, else null.
    * (reference `dump_bigq.py:70-86`)
    *
    * Parity notes, pinned by CleanFnsSpec:
    *  - commas are stripped ONLY in the no-suffix branch, exactly like
    *    the reference (`float(x[:-1])` on the suffix path raises on
    *    `"1,234K"` -> None; here the failed cast -> null, and
    *    null * 1e3 stays null);
    *  - `nullish` lowercases, so `'NaN'` -> null, whereas the reference's
    *    case-sensitive check lets `float('NaN')` produce a NaN *value*.
    *    Deliberate normalization — NaN poisons equality joins and the
    *    oracle compare; mirrored in the oracle SQL. */
  def parseMagnitude(c: Column): Column = {
    val t = trim(c)
    val beforeSuffix = t.substr(lit(1), length(t) - 1).cast(DoubleType)
    when(nullish(c), lit(null).cast(DoubleType))
      .when(t.endsWith("K"), beforeSuffix * 1e3)
      .when(t.endsWith("M"), beforeSuffix * 1e6)
      .when(t.endsWith("B"), beforeSuffix * 1e9)
      .otherwise(regexp_replace(t, ",", "").cast(DoubleType))
  }

  /** T4: `'+0.52%'` -> 0.52, `'-0.99%'` -> -0.99. All trailing `%`
    * stripped, like the reference's `rstrip('%')`.
    * (reference `dump_bigq.py:124-127`) */
  def parsePercent(c: Column): Column =
    when(nullish(c), lit(null).cast(DoubleType))
      .otherwise(regexp_replace(trim(c), "%+$", "").cast(DoubleType))

  /** T5: schema-drift canonicalization — rename the first present
    * variant to the canonical name. (reference `dump_bigq.py:114-127`) */
  def normalizeColumns(df: DataFrame, canon: Map[String, Seq[String]]): DataFrame =
    canon.foldLeft(df) { case (d, (target, variants)) =>
      variants.find(d.columns.contains) match {
        case Some(v) if v != target => d.withColumnRenamed(v, target)
        case _                      => d
      }
    }

  /** Default drift map used by the stock pipeline
    * (reference `dump_bigq.py:114-118`, `:121-122`). */
  val stockDriftMap: Map[String, Seq[String]] = Map(
    "Vol"    -> Seq("Vol", "Vol.", "Volume", "VOL"),
    "Change" -> Seq("Change", "Change %", "% Change"))
}
