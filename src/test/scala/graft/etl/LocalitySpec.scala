package graft.etl

import org.scalatest.funsuite.AnyFunSuite

/** Rule assembly parity with locality.py get_data() (:3-46) over the
  * FULL locality_data tables (TSV resources generated one-to-one from
  * the reference by tools/gen_locality.py). */
class LocalitySpec extends AnyFunSuite {

  private val byKey = Locality.rules.groupBy(_.matchOn)

  test("full tables loaded: reference row counts") {
    // locality_data.py: string_to_iso_code 249 countries (:1939-2190),
    // implied_parent 51 stateprovince entries (50 states + DC) + 239
    // countries (:2194-2490), kl
    // 1,677 variant entries across three fields after the kl_none
    // merge (:299-1900)
    assert(Locality.stringToIsoCode.size === 249)
    assert(Locality.impliedParent("stateprovince").size === 51)
    assert(Locality.impliedParent("country").size === 239)
    assert(Locality.kl.keySet ===
      Set("continent", "country", "stateprovince"))
    assert(Locality.kl.values.map(_.size).sum === 1677)
    // every rule row came from exactly one table entry
    assert(Locality.rules.size ===
      Locality.vds.values.map(_.size).sum +
        Locality.kl.values.map(_.size).sum)
  }

  test("state rules merge the country vds entry (o.update, locality.py:27-29)") {
    val fl = byKey(Map("dwc:stateProvince" -> "florida")).head.set
    assert(fl == Map(
      "dwc:continent" -> "north america",
      "dwc:country" -> "united states",
      "idigbio:isoCountryCode" -> "usa"))
  }

  test("Hawaii keeps oceania: the US has no country-continent entry (quirk)") {
    assert(!Locality.impliedParent("country").contains("united states"))
    val hi = byKey(Map("dwc:stateProvince" -> "hawaii")).head.set
    assert(hi("dwc:continent") == "oceania")
    assert(hi("idigbio:isoCountryCode") == "usa")
  }

  test("canonical country rules set vds fields only, never dwc:country") {
    val us = byKey(Map("dwc:country" -> "united states")).head.set
    assert(us == Map("idigbio:isoCountryCode" -> "usa"))
    val br = byKey(Map("dwc:country" -> "brazil")).head.set
    assert(br == Map("dwc:continent" -> "south america",
      "idigbio:isoCountryCode" -> "bra"))
  }

  test("kl variants canonicalize and inherit the canonical vds entry") {
    val usa = byKey(Map("dwc:country" -> "usa")).head.set
    assert(usa == Map("dwc:country" -> "united states",
      "idigbio:isoCountryCode" -> "usa"))
    val frb = byKey(Map("dwc:country" -> "federative republic of brazil")).head.set
    assert(frb == Map("dwc:country" -> "brazil",
      "dwc:continent" -> "south america", "idigbio:isoCountryCode" -> "bra"))
  }

  test("kl continent variants canonicalize only (no continent vds)") {
    assert(byKey(Map("dwc:continent" -> "eurasia")).head.set ==
      Map("dwc:continent" -> "asia"))
    assert(byKey(Map("dwc:continent" -> "afica")).head.set ==
      Map("dwc:continent" -> "africa"))
  }

  test("kl identity entries collide with implied-parent rules; kl comes LAST") {
    // locality_data kl["stateprovince"]["florida"] == "florida": two
    // rules share the match key, and to_insert order puts the kl rule
    // second — the last-write-wins dedupe in Corrections.apply must
    // therefore see the kl rule (which also names the field itself)
    val fl = byKey(Map("dwc:stateProvince" -> "florida"))
    assert(fl.size === 2)
    assert(fl.last.set("dwc:stateProvince") === "florida")
    assert(fl.last.set("dwc:continent") === "north america")
    assert(fl.last.set("idigbio:isoCountryCode") === "usa")
  }

  test("kl_none junk blanks the field in all three kl maps (:1898-1900)") {
    assert(byKey(Map("dwc:country" -> "unknown")).head.set ==
      Map("dwc:country" -> ""))
    assert(byKey(Map("dwc:continent" -> "unknown")).head.set ==
      Map("dwc:continent" -> ""))
    assert(byKey(Map("dwc:stateProvince" -> "unknown")).head.set ==
      Map("dwc:stateProvince" -> ""))
    // the empty variant is itself a kl_none key, kept verbatim
    assert(byKey(Map("dwc:country" -> "")).head.set ==
      Map("dwc:country" -> ""))
  }

  test("UTF-8 survives the TSV round trip (åland islands)") {
    assert(Locality.stringToIsoCode("åland islands") === "ala")
    val al = byKey(Map("dwc:country" -> "åland islands")).head.set
    assert(al("idigbio:isoCountryCode") === "ala")
  }

  test("washington, d.c. is a stateprovince entry (:2246)") {
    val dc = byKey(Map("dwc:stateProvince" -> "washington, d.c.")).head.set
    assert(dc("dwc:country") === "united states")
    assert(dc("dwc:continent") === "north america")
  }

  test("every rule is a 1-field tuple on continent, country or stateProvince") {
    assert(Locality.rules.forall(r => r.matchOn.size == 1 &&
      Set("dwc:continent", "dwc:country", "dwc:stateProvince")(
        r.matchOn.keys.head)))
  }
}
