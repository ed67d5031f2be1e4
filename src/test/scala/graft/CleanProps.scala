package graft

import org.scalacheck.{Gen, Prop, Properties}

import graft.udf.Udfs.parseMagnitudeScala

/** Property-based pins (SURVEY §5.4) on the pure-Scala twin of the
  * magnitude parser (proven equal to the Column expression in
  * CleanFnsSpec, so these properties transfer to the query path). */
object CleanProps extends Properties("CleanFns") {

  private val mag = Gen.oneOf("K" -> 1e3, "M" -> 1e6, "B" -> 1e9)
  private val smallDouble = Gen.chooseNum(0.01, 9999.99)

  property("format-then-parse round-trips through any magnitude suffix") =
    Prop.forAll(smallDouble, mag) { (d, m) =>
      val formatted = f"$d%.2f${m._1}"
      val parsed = parseMagnitudeScala(formatted)
      parsed.exists(v => math.abs(v - (math.rint(d * 100) / 100) * m._2) < 1e-6 * m._2)
    }

  property("plain numbers parse with or without thousands commas") =
    Prop.forAll(Gen.chooseNum(1L, 999999999L)) { n =>
      val plain = parseMagnitudeScala(n.toString)
      val grouped = parseMagnitudeScala(f"$n%,d")
      plain.contains(n.toDouble) && grouped.contains(n.toDouble)
    }

  property("null-producing inputs never yield a value") =
    Prop.forAll(Gen.oneOf("", "nan", "NaN", "NAN", "  ", "junk", "12x", "K")) { s =>
      parseMagnitudeScala(s).isEmpty
    }

  property("parsing is idempotent on failure (never throws)") =
    Prop.forAll(Gen.asciiPrintableStr) { s =>
      parseMagnitudeScala(s); true
    }
}
