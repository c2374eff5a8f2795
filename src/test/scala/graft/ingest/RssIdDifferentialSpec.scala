package graft.ingest

import org.scalatest.funsuite.AnyFunSuite

/** Differential audit of the RSS recordid derivation against the
  * reference's id_func (update_publisher_recordset.py:61-96):
  * 1,000 recorded runs over random (portal, id/collid) pairs —
  * ipt version-suffix stripping, Symbiota collid URLs, case folding,
  * id-over-collid priority. Pure-JVM. */
class RssIdDifferentialSpec extends AnyFunSuite {

  test("recordId agrees with 1000 recorded id_func runs") {
    replay("/rssid_vectors.jsonl")
  }

  test("recordId agrees with a second unseen-seed batch of 1000") {
    replay("/rssid_vectors2.jsonl")
  }

  test("recordId agrees with a third unseen-seed batch of 1000 " +
      "(seed 7007, added round 12 — passed on its first run)") {
    replay("/rssid_vectors3.jsonl")
  }

  private def replay(resource: String): Unit = {
    val url = getClass.getResource(resource)
    val src = scala.io.Source.fromURL(url)(scala.io.Codec.UTF8)
    val field = """"(\w+)": (null|"(?:[^"\\]|\\.)*")""".r
    val vectors = try src.getLines().map { l =>
      val m = field.findAllMatchIn(l).map { mm =>
        mm.group(1) -> (mm.group(2) match {
          case "null" => None
          case s => Some(s.substring(1, s.length - 1)
            .replace("\\\"", "\"").replace("\\\\", "\\").replace("\\/", "/"))
        })
      }.toMap
      (m("portal").get, m("eid"), m("collid"), m("exp"))
    }.toList finally src.close()
    assert(vectors.size === 1000)
    val bad = vectors.filter { case (p, eid, collid, exp) =>
      Rss.recordId(p, eid, collid) != exp
    }
    assert(bad.isEmpty, s"${bad.size} mismatches: ${bad.take(5)}")
  }
}
