package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Replays the committed corrections differential vectors (generated
  * once by tools/gen_corrections_differential.py from the REFERENCE's
  * RecordCorrector.correct_record with an injected in-memory store)
  * through Corrections.apply — key-tuple cascade, original-first
  * hashing, protected-kingdom guard, scientificname immunity and the
  * added/replaced flag rules, all against reference outputs without
  * Python at test time. */
class CorrectionsDifferentialSpec extends SparkSpec {

  test("Corrections.apply agrees with 400 recorded correct_record runs") {
    replay("/corrections_vectors.jsonl")
  }

  test("Corrections.apply agrees with a second unseen-seed batch of 400") {
    replay("/corrections_vectors2.jsonl")
  }

  test("corrections agree with a third unseen-seed batch of 400 " +
      "(seed 6006, added round 12 — passed on its first run)") {
    replay("/corrections_vectors3.jsonl")
  }

  private def replay(resource: String): Unit = {
    val s = spark
    import s.implicits._
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    implicit val fmts: Formats = DefaultFormats
    val url = getClass.getResource(resource)
    val lines = scala.io.Source.fromURL(url).getLines().toSeq
    val rules = (JsonMethods.parse(lines.head) \ "rules")
      .extract[Seq[JObject]].map { r =>
        Corrections.Rule(
          (r \ "k").extract[Map[String, String]],
          (r \ "v").extract[Map[String, String]])
      }
    val parsed = lines.tail.map(JsonMethods.parse(_))
    assert(parsed.length === 400)
    val fields = Seq("dwc:country", "idigbio:isoCountryCode", "dwc:kingdom",
      "dwc:phylum", "dwc:genus", "dwc:specificepithet",
      "dwc:scientificname", "dwc:family")
    val colOf = fields.map(f =>
      f -> f.replace("dwc:", "").replace("idigbio:", "")).toMap
    val inputs = parsed.map { j =>
      val d = (j \ "data").extract[Map[String, String]]
      ((j \ "id").extract[Long], fields.map(d.get))
    }
    val exps = parsed.map { j =>
      ((j \ "id").extract[Long],
        ((j \ "exp" \ "fields").extract[Map[String, Option[String]]],
          (j \ "exp" \ "flags").extract[Seq[String]].sorted))
    }.toMap
    val df = inputs.map { case (id, vs) =>
      (id, vs(0), vs(1), vs(2), vs(3), vs(4), vs(5), vs(6), vs(7))
    }.toDF(Seq("id") ++ fields.map(colOf): _*)
    val out = Corrections.foldFlags(
      Corrections.apply(df, rules, colOf), "flags").collect()
    assert(out.length === 400)
    out.foreach { r =>
      val id = r.getLong(0)
      val (ef, eflags) = exps(id)
      fields.zipWithIndex.foreach { case (f, i) =>
        val got = if (r.isNullAt(i + 1)) null else r.getString(i + 1)
        assert(got === ef(f).orNull, s"id=$id field=$f")
      }
      assert(r.getSeq[String](r.fieldIndex("flags")).sorted === eflags,
        s"id=$id flags")
    }
  }
}
