package graft.ingest

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Ingest-summary quality gate: the ordered suspect-classification
  * cascade the reference runs over per-recordset ingest counters before
  * pausing a feed (ds_sum_counts.py:52-97, true division). First
  * matching rule wins; non-suspect rows yield null. The rule order is
  * load-bearing — e.g. DELETED_ALL_RECORDS (count 0, deletes > 0)
  * guards the churn-ratio divisions below it from zero denominators,
  * exactly as the early returns do in the reference.
  */
object SummaryChecks {

  def suspectTag(datafileOk: Column,
      rc: Column, rcr: Column, rup: Column, rdel: Column,
      mc: Column, mcr: Column, mup: Column, mdel: Column): Column = {
    def d(a: Column, b: Column) = a.cast("double") / b.cast("double")
    when(!datafileOk, "DATAFILE_NOT_OK")
      .when(rc === 0 && mc === 0, "NO_RECORDS")
      .when(rc > 0 && rcr === rc && rup === 0 && rdel === 0, "ALLNEW_RECORDS")
      .when(rc === 0 && rdel > 0, "DELETED_ALL_RECORDS")
      .when(rdel > 0 && d(rcr, rdel) > 0.9 && d(rcr, rdel) < 1.1 &&
        d(rcr, rc) > 0.1, "RECORDS_CHURN")
      .when(rc > 0 && d(rdel, rc) > 0.2, "DELETED_MANY_RECORDS")
      .when(rc > 0 && d(rcr, rc) > 0.45, "MANY_NEW_RECORDS")
      .when(mc > 0 && mcr === mc && mup === 0 && mdel === 0, "ALLNEW_MEDIA")
      .when(mc === 0 && mdel > 0, "DELETED_ALL_MEDIA")
      .when(mc > 400 && d(mdel, mc) > 0.06, "DELETED_MANY_MEDIA")
      .when(mc > 400 && d(mcr, mc) > 0.4, "MANY_NEW_MEDIA")
      .when(mdel > 0 && d(mcr, mdel) > 0.9 && d(mcr, mdel) < 1.1 &&
        d(mcr, mc) > 0.1, "MEDIA_CHURN")
  }
}
