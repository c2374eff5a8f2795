package graft.ingest

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** is_row_suspect cascade parity (ds_sum_counts.py:52-97). */
class SummaryChecksSpec extends SparkSpec {
  import spark.implicits._

  private def tag(ok: Boolean, rc: Long, rcr: Long, rup: Long, rdel: Long,
      mc: Long, mcr: Long, mup: Long, mdel: Long): String = {
    val df = Seq((ok, rc, rcr, rup, rdel, mc, mcr, mup, mdel))
      .toDF("ok", "rc", "rcr", "rup", "rdel", "mc", "mcr", "mup", "mdel")
    df.select(SummaryChecks.suspectTag(col("ok"), col("rc"), col("rcr"),
      col("rup"), col("rdel"), col("mc"), col("mcr"), col("mup"),
      col("mdel"))).collect()(0).getString(0)
  }

  test("rule order: datafile gate wins over everything") {
    assert(tag(false, 0, 0, 0, 0, 0, 0, 0, 0) == "DATAFILE_NOT_OK")
  }

  test("record rules in reference order") {
    assert(tag(true, 0, 0, 0, 0, 0, 0, 0, 0) == "NO_RECORDS")
    assert(tag(true, 100, 100, 0, 0, 50, 10, 40, 0) == "ALLNEW_RECORDS")
    assert(tag(true, 0, 0, 0, 5, 10, 2, 8, 0) == "DELETED_ALL_RECORDS")
    assert(tag(true, 100, 20, 60, 20, 0, 0, 0, 0) == "RECORDS_CHURN")
    assert(tag(true, 100, 10, 60, 30, 0, 0, 0, 0) == "DELETED_MANY_RECORDS")
    assert(tag(true, 100, 50, 50, 0, 0, 0, 0, 0) == "MANY_NEW_RECORDS")
  }

  test("media rules, incl. the mc>400 threshold and churn window") {
    assert(tag(true, 100, 10, 90, 0, 50, 50, 0, 0) == "ALLNEW_MEDIA")
    assert(tag(true, 100, 10, 90, 0, 0, 0, 0, 3) == "DELETED_ALL_MEDIA")
    assert(tag(true, 100, 10, 90, 0, 500, 10, 450, 40) == "DELETED_MANY_MEDIA")
    assert(tag(true, 100, 10, 90, 0, 500, 250, 250, 0) == "MANY_NEW_MEDIA")
    // mc ≤ 400: the many-media thresholds don't apply, churn does
    assert(tag(true, 100, 10, 90, 0, 100, 20, 60, 20) == "MEDIA_CHURN")
  }

  test("benign rows yield null (not suspect)") {
    assert(tag(true, 100, 10, 90, 0, 50, 10, 40, 0) == null)
    // churn ratio exactly at the open bound 0.1 is NOT suspect
    assert(tag(true, 100, 10, 90, 10, 0, 0, 0, 0) == null)
  }
}
