package graft.etl

import org.scalatest.funsuite.AnyFunSuite

/** Rule assembly parity with locality.py get_data() (:3-46) over the
  * locality_data subset. */
class LocalitySpec extends AnyFunSuite {

  private val byKey = Locality.rules.groupBy(_.matchOn)

  test("state rules merge the country vds entry (o.update, locality.py:27-29)") {
    val fl = byKey(Map("dwc:stateProvince" -> "florida")).head.set
    assert(fl == Map(
      "dwc:continent" -> "north america",
      "dwc:country" -> "united states",
      "idigbio:isoCountryCode" -> "usa"))
  }

  test("Hawaii keeps oceania: the US has no country-continent entry (quirk)") {
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

  test("kl_none junk blanks the field (locality.py:36-37)") {
    assert(byKey(Map("dwc:country" -> "unknown")).head.set ==
      Map("dwc:country" -> ""))
  }

  test("every rule is a 1-field tuple on stateProvince or country") {
    assert(Locality.rules.forall(r => r.matchOn.size == 1 &&
      Set("dwc:stateProvince", "dwc:country")(r.matchOn.keys.head)))
  }
}
