package graft

import org.scalatest.funsuite.AnyFunSuite

/** Per-query bench budget: no graded query may exceed PER_QUERY_CEILING
  * seconds in the most recent recorded sf0.1 bench detail. This is the
  * CI tripwire for structurally slow queries — r8 shipped a 23.5 s XML
  * round-trip and a 13 s quadratic dedup apply that only surfaced in
  * the driver's bench; this spec fails the build first.
  *
  * Reads the `bench_detail.json` that [[graft.Bench]] writes to the
  * repo root. Skipped (cancel) when the file is absent or from a
  * different scale factor — the budget is calibrated to sf0.1.
  *
  * The ceiling is 6 s (was 12 in r8/r9): the slowest non-staging query
  * in the r9 driver run was 4.4 s, so 6 s catches the next structurally
  * heavy query two rounds earlier while still clearing the local
  * run-to-run band. The bench harness now pins its scratch to tmpfs
  * and emits per-query GC/storage counters, which removes most of the
  * environment noise that justified the old 12 s headroom.
  * `llm_stage_index` is exempt: it is the explicit
  * build-the-shared-index-once step (minhash pair index + shingle
  * tables + clusters) and is priced as a batch index build, not a
  * query; its budget is the suite-level number.
  */
class BenchBudgetSpec extends AnyFunSuite {

  private val PerQueryCeiling = 6.0
  private val Exempt = Set("llm_stage_index")

  test(s"no graded query exceeds $PerQueryCeiling s in recorded sf0.1 bench detail") {
    val f = new java.io.File("bench_detail.json")
    assume(f.exists(), "no bench_detail.json recorded — run graft.Bench first")
    val text = new String(
      java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
    val sfRe = """"sf":([0-9.]+)""".r
    val sf = sfRe.findFirstMatchIn(text).map(_.group(1))
    assume(sf.contains("0.1"), s"bench detail is sf=$sf, budget is for sf0.1")
    // bench_detail.json is a flat one-line JSON object; the queries map
    // is "queries":{"name":sec,...} with plain (possibly negative for
    // failures) decimal values.
    val qBlock = text.substring(
      text.indexOf("\"queries\":{") + "\"queries\":{".length,
      text.indexOf("}", text.indexOf("\"queries\":{")))
    val entry = """"([^"]+)":(-?[0-9.]+)""".r
    val times = entry.findAllMatchIn(qBlock)
      .map(m => m.group(1) -> m.group(2).toDouble).toSeq
    assert(times.nonEmpty, "no per-query timings parsed from bench_detail.json")
    val over = times.filterNot { case (n, _) => Exempt(n) }
      .filter { case (_, sec) => math.abs(sec) > PerQueryCeiling }
    assert(over.isEmpty,
      s"queries over the $PerQueryCeiling s sf0.1 budget: " +
        over.sortBy(-_._2).map { case (n, s) => f"$n=$s%.1f s" }.mkString(", "))
  }
}
