package graft.ingest

import org.scalatest.funsuite.AnyFunSuite

/** Differential audit of field-name canonicalization against the
  * reference (idb/helpers/fieldnames.py): the committed vector file
  * carries the reference's ENTIRE translate_dict (496 entries, dumped
  * by tools/gen_fieldnames_differential.py) plus 2,000 recorded
  * get_canonical_name runs over mangled headers (unprintable
  * injection, case flips, padding, namespace noise). The table leg
  * proves the FieldnamesTable transcription is key-exact and
  * value-exact in BOTH directions; the probe leg proves the
  * printable-filter + lookup behavior matches. Pure-JVM — no Spark. */
class FieldnamesDifferentialSpec extends AnyFunSuite {

  // minimal JSON reader for the ensure_ascii vector file: every string
  // is \u-escaped ASCII, so a hand parser is exact
  private def parse(line: String): Map[String, Option[String]] = {
    val m = scala.collection.mutable.Map.empty[String, Option[String]]
    val kv = """"(\w+)":\s*("(?:[^"\\]|\\.)*"|null)""".r
    kv.findAllMatchIn(line).foreach { mm =>
      val k = mm.group(1)
      val v = mm.group(2) match {
        case "null" => None
        case s =>
          val body = s.substring(1, s.length - 1)
          val sb = new StringBuilder
          var i = 0
          while (i < body.length) {
            val c = body.charAt(i)
            if (c == '\\') {
              body.charAt(i + 1) match {
                case 'u' =>
                  sb.append(Integer.parseInt(body.substring(i + 2, i + 6), 16).toChar)
                  i += 6
                case 'n' => sb.append('\n'); i += 2
                case 't' => sb.append('\t'); i += 2
                case 'r' => sb.append('\r'); i += 2
                case o => sb.append(o); i += 2
              }
            } else { sb.append(c); i += 1 }
          }
          Some(sb.toString)
      }
      m(k) = v
    }
    m.toMap
  }

  private lazy val vectors: Seq[Map[String, Option[String]]] = {
    val url = getClass.getResource("/fieldnames_vectors.jsonl")
    val src = scala.io.Source.fromURL(url)(scala.io.Codec.UTF8)
    try src.getLines().map(parse).toList finally src.close()
  }

  test("translate_dict transcription is exact in both directions") {
    val refTable = vectors.filter(_("kind").contains("table"))
      .map(v => v("key").get -> (v("name"), v("cls").get)).toMap
    assert(refTable.size === 496)
    val ours = FieldnamesTable.translate
    val missing = refTable.keySet -- ours.keySet
    val extra = ours.keySet -- refTable.keySet
    assert(missing.isEmpty, s"keys missing from FieldnamesTable: $missing")
    assert(extra.isEmpty, s"keys not in the reference: $extra")
    val diff = refTable.collect {
      case (k, (n, c)) if ours(k) != ((n, c)) => (k, (n, c), ours(k))
    }
    assert(diff.isEmpty, s"value mismatches: ${diff.take(5)}")
  }

  test("canonical agrees with 2000 recorded get_canonical_name runs") {
    val probes = vectors.filter(_("kind").contains("probe"))
    assert(probes.size === 2000)
    val bad = probes.flatMap { v =>
      val (n, c) = Fieldnames.canonical(v("f").get)
      if (n != v("name") || !v("cls").contains(c))
        Some((v("f").get, (v("name"), v("cls")), (n, c)))
      else None
    }
    assert(bad.isEmpty, s"${bad.size} mismatches: ${bad.take(5)}")
  }
}
