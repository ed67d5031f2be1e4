package graft

/** Semantic pins for `mm_dft_energy`
  * ([[graft.multimodal.Multimodal.mmDftEnergy]]). */
class MmDftSpec extends SparkTestBase {

  test("mm_dft_energy: 4 bands per media, shares partition the total, " +
    "frame counts agree across bands") {
    val rows = SparkEntry.queries("mm_dft_energy")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) Double.NaN else r.getDouble(3),
        r.getDouble(4)))
    assert(rows.nonEmpty)
    assert(rows.map(_._2).toSet == Set(1L, 2L, 4L, 8L))
    rows.groupBy(_._1).foreach { case (m, bs) =>
      assert(bs.length == 4, s"media $m must have all 4 bands")
      assert(bs.map(_._3).toSet.size == 1,
        s"media $m frame count must not vary by band")
      val shares = bs.map(_._4).filterNot(_.isNaN)
      if (shares.nonEmpty) {
        assert(shares.forall(x => x >= 0.0 && x <= 1.0 + 1e-12))
        assert(math.abs(shares.sum - 1.0) < 1e-9,
          s"media $m band shares must partition the total")
      }
      bs.foreach(b => assert(b._5 >= 0.0))
    }
  }

  test("quantized DFT weights sit far from their rounding boundaries " +
    "(the libm-ulp safety claim in the scaladoc)") {
    val fracDists = for (m <- 0 until 64; f <- Seq(math.cos _, math.sin _))
      yield {
        val w = f(2.0 * math.Pi * m.toDouble / 32.0) * 1000000.0 + 0.5
        math.abs(w - math.rint(w))
      }
    // exact integer hits (cos=±1, sin at multiples of pi) land on .5
    // BELOW the +0.5 shift, i.e. w fractional exactly .5 never occurs;
    // everything else keeps a wide margin
    assert(fracDists.forall(d => d > 0.02 || d < 1e-6),
      s"closest non-exact boundary distance: ${fracDists.filter(_ > 1e-6).min}")
  }
}
