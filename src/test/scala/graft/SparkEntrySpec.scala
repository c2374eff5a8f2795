package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract guards: every query must carry an oracle (the
  * correctness gate silently downgrades to a rows-only check for keys
  * missing from oracleSql, so a wiring slip would weaken the gate
  * without failing anything). */
class SparkEntrySpec extends AnyFunSuite {

  /** Queries DELIBERATELY registered without an oracle (the driver
    * then records a rows-only check). Empty since round 8: even the
    * binary media pipeline is gated, via the scalar-facts constants
    * oracle. Keep the mechanism so a future genuinely-ungateable query
    * has to be listed here explicitly to pass. */
  private val rowsOnly = Set.empty[String]

  test("every queries key has an oracleSql twin and vice versa") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(q.diff(o) === rowsOnly, s"queries without oracle: ${q.diff(o)}")
    assert(o.diff(q).isEmpty, s"oracles without query: ${o.diff(q)}")
  }

  test("staged ANN family gates READ the session cache, not recompute") {
    val spark = SparkSpec.session
    val dir = "/root/testdata/sf0.001"
    // first call stages; the gate's own plan must then read the
    // persisted table (InMemoryTableScan), proving the compute-once
    // claim the family's scaladocs make
    val plan = graft.queries.LlmQueries.qAnnTopk(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("InMemoryTableScan"),
      s"q_ann_topk must read the staged truth table:\n$plan")
    val plan2 = graft.queries.LlmQueries.qAnnScoreboard(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan2.contains("InMemoryTableScan"),
      "q_ann_scoreboard must read staged prefixes")
    graft.Staging.evictSession(spark)
  }

  test("oracle SQL is non-empty and single-statement") {
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(sql.trim.nonEmpty, s"$k oracle empty")
      // blank out string literals first: a ';' INSIDE one (e.g. the
      // XML entity &quot; in the DwC-A meta goldens) is data, not a
      // statement separator
      val noLiterals = sql.replaceAll("(?s)'[^']*'", "''")
      assert(!noLiterals.trim.stripSuffix(";").contains(";"),
        s"$k oracle has multiple statements")
    }
  }
}
