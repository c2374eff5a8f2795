package graft.etl

import graft.etl.Corrections.Rule

/** Geography correction rules in the reference's locality_data shape
  * (idb/data_tables/locality_data.py, rule assembly
  * idb/data_tables/locality.py:3-46): implied-parent tuples
  * (stateprovince → [continent, country], country → [continent]),
  * country → ISO-3166 alpha-3 codes, and the kl canonicalization map of
  * observed variant spellings (with the kl_none junk values that blank
  * the field).
  *
  * This is a representative SUBSET data port — entries verified
  * one-to-one against the reference (locality_data.py:1939-2490,
  * 456-480, 257-297); the full 2,510-line table drops in without code
  * change. Quirk preserved: "united states" has NO country-level
  * implied-parent entry (:2248-2489 list), so the vds merge adds only
  * the ISO code to state rules and Hawaii's "oceania" continent
  * (:2206) survives — while Brazil-variant rules DO gain
  * "south america" (:2277).
  */
object Locality {

  /** stateprovince → (continent, country) (locality_data.py:2195-2247). */
  val impliedParentState: Seq[(String, String, String)] = Seq(
    ("alabama", "north america", "united states"),
    ("california", "north america", "united states"),
    ("florida", "north america", "united states"),
    ("hawaii", "oceania", "united states"),
    ("texas", "north america", "united states"),
  )

  /** country → continent (locality_data.py:2248-2489; the US is absent
    * there — preserved). */
  val impliedParentCountry: Map[String, String] = Map(
    "brazil" -> "south america",
    "canada" -> "north america",
    "mexico" -> "north america",
    "australia" -> "australia",
  )

  /** country → ISO 3166 alpha-3 (locality_data.py:1939-2190 subset). */
  val stringToIsoCode: Map[String, String] = Map(
    "united states" -> "usa",
    "brazil" -> "bra",
    "canada" -> "can",
    "mexico" -> "mex",
    "australia" -> "aus",
  )

  /** Observed variant → canonical country (kl["country"],
    * locality_data.py:456-1896 subset). */
  val klCountry: Map[String, String] = Map(
    "usa" -> "united states",
    "u.s.a." -> "united states",
    "united states of america" -> "united states",
    "us" -> "united states",
    "federative republic of brazil" -> "brazil",
  )

  /** Junk values that blank the field (kl_none, locality_data.py:257-297,
    * merged into kl["country"] at :1898). */
  val klNone: Seq[String] = Seq(
    "unknown", "no data", "not applicable", "null", "[none]")

  /** Rule assembly mirroring locality.py get_data():
    *  1. vds: country entries carry implied continent + ISO code;
    *  2. stateprovince rules set continent/country then merge the
    *     country's vds entry (o.update, :27-29 — right side wins);
    *  3. country rules apply the vds entry directly;
    *  4. kl variant rules set the canonical name (or "" for kl_none)
    *     and merge the canonical country's vds entry (:38-41). */
  def rules: Seq[Rule] = {
    val countryVds: Map[String, Map[String, String]] = {
      val fromIp = impliedParentCountry.map { case (c, cont) =>
        c -> Map("dwc:continent" -> cont) }
      stringToIsoCode.foldLeft(fromIp) { case (m, (c, iso)) =>
        m + (c -> (m.getOrElse(c, Map.empty) + ("idigbio:isoCountryCode" -> iso)))
      }
    }
    val stateRules = impliedParentState.map { case (s, cont, co) =>
      val base = Map("dwc:continent" -> cont, "dwc:country" -> co)
      Rule(Map("dwc:stateProvince" -> s),
        base ++ countryVds.getOrElse(co, Map.empty))
    }
    val countryRules = countryVds.toSeq.sortBy(_._1).map { case (c, o) =>
      Rule(Map("dwc:country" -> c), o) }
    val klRules =
      klCountry.toSeq.sortBy(_._1).map { case (v, canon) =>
        Rule(Map("dwc:country" -> v),
          Map("dwc:country" -> canon) ++ countryVds.getOrElse(canon, Map.empty))
      } ++ klNone.map(v => Rule(Map("dwc:country" -> v), Map("dwc:country" -> "")))
    stateRules ++ countryRules ++ klRules
  }
}
