package graft.ingest

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Replays the committed ingest-suspects differential vectors
  * (reference is_row_suspect outputs over boundary-focused counters)
  * through SummaryChecks.suspectTag. */
class SuspectsDifferentialSpec extends SparkSpec {

  test("suspectTag agrees with 1500 recorded is_row_suspect runs") {
    replay("/suspects_vectors.tsv")
  }

  test("suspectTag agrees with a second unseen-seed batch of 1500") {
    replay("/suspects_vectors2.tsv")
  }

  test("suspectTag agrees with a third unseen-seed batch of 1500 " +
      "(seed 9999, added round 12 — passed on its first run)") {
    replay("/suspects_vectors3.tsv")
  }

  private def replay(resource: String): Unit = {
    val s = spark
    import s.implicits._
    val url = getClass.getResource(resource)
    val rows = scala.io.Source.fromURL(url).getLines().map { l =>
      val p = l.split("\t")
      (p(0).toLong, p(1) == "1", p(2).toLong, p(3).toLong, p(4).toLong,
        p(5).toLong, p(6).toLong, p(7).toLong, p(8).toLong, p(9).toLong,
        p(10))
    }.toSeq
    assert(rows.length === 1500)
    val bad = rows.toDF("id", "ok", "rc", "rcr", "rup", "rdel",
        "mc", "mcr", "mup", "mdel", "expect")
      .select(col("id"), col("expect"),
        coalesce(SummaryChecks.suspectTag(col("ok"),
          col("rc"), col("rcr"), col("rup"), col("rdel"),
          col("mc"), col("mcr"), col("mup"), col("mdel")), lit("OK")).as("got"))
      .filter(col("expect") =!= col("got")).collect()
    assert(bad.isEmpty, bad.take(5).mkString("; "))
  }
}
