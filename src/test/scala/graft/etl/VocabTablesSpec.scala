package graft.etl

import org.scalatest.funsuite.AnyFunSuite

/** Parity checks for the exact data ports of the reference's vocabulary
  * tables (idb/data_tables/rights_strings.py, taxon_rank.py) — sizes
  * plus the quirks a regenerated or hand-edited table would lose.
  */
class VocabTablesSpec extends AnyFunSuite {

  test("rights tables match the reference sizes (rights_strings.py)") {
    assert(VocabTables.licenseTrans.size === 103)
    assert(VocabTables.licenses.size === 14)
    assert(VocabTables.rankMapping.size === 313)
    assert(VocabTables.rankMapping.count(_._2.isEmpty) === 239)
  }

  test("reference quirks are carried verbatim") {
    // the "CC3 BY" entry's rights value is BY-NC-SA in the reference —
    // a data bug we reproduce for behavior compatibility
    assert(VocabTables.licenses("CC3 BY")._1 === "BY-NC-SA")
    // CC3 logos are http://, CC4 logos https://
    assert(VocabTables.licenses("CC3 BY-NC")._2.get.startsWith("http://"))
    assert(VocabTables.licenses("CC4 BY-NC")._2.get.startsWith("https://"))
    // "Public Domain" has rights only — no logo, no webstatement
    assert(VocabTables.licenses("Public Domain") === ("Public Domain", None, None))
  }

  test("prose and HTML rights strings resolve (rights_strings.py:60-114)") {
    assert(VocabTables.licenseTrans("CC BY (Attribution)") === "CC4 BY")
    assert(VocabTables.licenseTrans(
      "Creative Commons Attribution (CC-BY) 4.0 License") === "CC4 BY")
    // the HTML-blob keys publishers actually send are in the table
    assert(VocabTables.licenseTrans.keys.exists(_.startsWith("<a rel=\"license\"")))
  }

  test("taxon rank mapping and reject families (taxon_rank.py:49-366)") {
    assert(VocabTables.rankMapping("espècie") === Some("species"))
    assert(VocabTables.rankMapping("nothosubsp.") === Some("subspecies"))
    assert(VocabTables.rankMapping("fma.") === Some("family"))
    // rejected junk ranks map to None = remove
    assert(VocabTables.rankMapping("aff.") === None)
    assert(VocabTables.rankMapping("×") === None)
  }
}
