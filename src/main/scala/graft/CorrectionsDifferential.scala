package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Differential audit of the KV correction engine against the
  * REFERENCE's RecordCorrector.correct_record:
  * tools/gen_corrections_differential.py runs the reference class with
  * an injected in-memory store; this main replays the same records and
  * rules through [[graft.etl.Corrections.apply]] and prints field- and
  * flag-level mismatches. */
object CorrectionsDifferential {
  def main(args: Array[String]): Unit = {
    val path = if (args.length > 0) args(0) else "/tmp/corrdiff/vectors.jsonl"
    val spark: SparkSession = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    implicit val fmts: Formats = DefaultFormats

    val lines = scala.io.Source.fromFile(path).getLines().toSeq
    val head = JsonMethods.parse(lines.head)
    val rules = (head \ "rules").extract[Seq[JObject]].map { r =>
      graft.etl.Corrections.Rule(
        (r \ "k").extract[Map[String, String]],
        (r \ "v").extract[Map[String, String]])
    }
    val parsed = lines.tail.map(JsonMethods.parse(_))
    val fields = Seq("dwc:country", "idigbio:isoCountryCode", "dwc:kingdom",
      "dwc:phylum", "dwc:genus", "dwc:specificepithet",
      "dwc:scientificname", "dwc:family")
    val colOf = fields.map(f =>
      f -> f.replace("dwc:", "").replace("idigbio:", "")).toMap
    val inputs = parsed.map { j =>
      val id = (j \ "id").extract[Long]
      val d = (j \ "data").extract[Map[String, String]]
      (id, fields.map(d.get))
    }
    val exps = parsed.map { j =>
      val id = (j \ "id").extract[Long]
      ((id, (j \ "exp" \ "fields").extract[Map[String, Option[String]]],
        (j \ "exp" \ "flags").extract[Seq[String]]))
    }.map(t => t._1 -> (t._2, t._3)).toMap

    val df = inputs.map { case (id, vs) =>
      (id, vs(0), vs(1), vs(2), vs(3), vs(4), vs(5), vs(6), vs(7))
    }.toDF(Seq("id") ++ fields.map(colOf): _*)

    val out = graft.etl.Corrections.foldFlags(
        graft.etl.Corrections.apply(df, rules, colOf), "flags")
      .collect()
    var bad = 0
    var checked = 0
    out.foreach { r =>
      val id = r.getLong(0)
      val (ef, eflags) = exps(id)
      fields.zipWithIndex.foreach { case (f, i) =>
        checked += 1
        val got = if (r.isNullAt(i + 1)) null else r.getString(i + 1)
        val exp = ef(f).orNull
        if (got != exp) {
          bad += 1
          if (bad <= 30) println(s"[diff] id=$id $f engine=$got ref=$exp")
        }
      }
      checked += 1
      val gotFlags = r.getSeq[String](r.fieldIndex("flags")).sorted
      if (gotFlags != eflags.sorted) {
        bad += 1
        if (bad <= 30)
          println(s"[diff] id=$id flags engine=$gotFlags ref=${eflags.sorted}")
      }
    }
    println(s"[corrdiff] ${checked - bad}/$checked comparisons agree ($bad mismatches, ${out.length} records)")
    spark.stop()
  }
}
