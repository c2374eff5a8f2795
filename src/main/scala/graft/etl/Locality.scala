package graft.etl

import graft.etl.Corrections.Rule

/** Geography correction rules in the reference's locality_data shape —
  * the FULL table (idb/data_tables/locality_data.py; rule assembly
  * idb/data_tables/locality.py:3-46): implied-parent tuples
  * (stateprovince → [continent, country], country → [continent]),
  * country → ISO-3166 alpha-3 codes, and the kl canonicalization maps
  * of observed variant spellings for continent, country AND
  * stateprovince (each merged with the kl_none junk values that blank
  * the field, locality_data.py:1898-1900).
  *
  * The tables live as UTF-8 TSV resources under graft/locality/
  * (generated one-to-one from the reference data by
  * tools/gen_locality.py — a deliberate verbatim DATA port, same
  * adjudication as FieldnamesTable/VocabTables); this object replays
  * get_data()'s assembly over them. Quirks preserved:
  *  - "united states" has NO country-level implied-parent entry
  *    (locality_data.py:2248-2489 list), so the vds merge adds only
  *    the ISO code to state rules and Hawaii's "oceania" continent
  *    (:2206) survives — while Brazil-variant rules DO gain
  *    "south america" (:2277);
  *  - kl carries IDENTITY entries ("florida" → "florida"): their rules
  *    collide with the implied-parent rules on the same match key, and
  *    the reference's KV store resolves the collision last-write-wins
  *    in to_insert order (record_corrector.py:125-151 — one line per
  *    etag, later lines overwrite), i.e. the kl rule replaces the vds
  *    rule wholesale. [[Corrections.apply]] reproduces that dedupe;
  *  - kl_none's canonical is the literal string "None", meaning blank
  *    the field to "" (locality.py:35-37) — kept as a sentinel in the
  *    TSV and translated here;
  *  - kl_none includes the EMPTY variant ("" → blank), kept verbatim.
  */
object Locality {

  private def loadTsv(name: String): Vector[Array[String]] = {
    val in = getClass.getResourceAsStream(s"/graft/locality/$name.tsv")
    require(in != null, s"missing locality resource $name.tsv")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines().map(_.split("\t", -1)).toVector
    finally src.close()
  }

  private val remap = Map(
    "continent" -> "dwc:continent",
    "country" -> "dwc:country",
    "stateprovince" -> "dwc:stateProvince")

  /** Positional meaning of implied_parent's parent lists
    * (locality.py:4 aggs_fields). */
  private val aggsFields = Seq("continent", "country", "stateprovince")

  /** country → ISO 3166 alpha-3 (locality_data.py:1939-2190, all 249). */
  lazy val stringToIsoCode: Map[String, String] =
    loadTsv("string_to_iso_code").map(a => a(0) -> a(1)).toMap

  /** field → value → positional parents (locality_data.py:2194-2490:
    * 52 states/DC → [continent, country], 238 countries → [continent]). */
  lazy val impliedParent: Map[String, Map[String, Seq[String]]] =
    loadTsv("implied_parent").groupBy(_(0)).map { case (f, rows) =>
      f -> rows.map(a => a(1) -> a.drop(2).toSeq).toMap
    }

  /** field → variant → canonical, AFTER the in-module kl_none merge
    * (locality_data.py:299-1900; canonical "None" = blank the field). */
  lazy val kl: Map[String, Map[String, String]] =
    loadTsv("kl").groupBy(_(0)).map { case (f, rows) =>
      f -> rows.map(a => a(1) -> a(2)).toMap
    }

  /** The vds lookup of get_data() AFTER its in-place mutations:
    *  1. implied parents remapped to dwc: terms positionally;
    *  2. ISO codes merged into the dwc:country entries (:19-23);
    *  3. any entry whose dwc:country value is itself a vds country key
    *     absorbs that country entry (the first to_insert loop's
    *     `o.update` mutates vds in place, :26-29 — so state entries
    *     gain the US ISO code before the kl loop reads them). */
  lazy val vds: Map[String, Map[String, Map[String, String]]] = {
    val base: Map[String, Map[String, Map[String, String]]] =
      impliedParent.map { case (f, m) =>
        remap(f) -> m.map { case (v, parents) =>
          v -> parents.zipWithIndex.map { case (p, i) =>
            remap(aggsFields(i)) -> p
          }.toMap
        }
      }
    val countries = stringToIsoCode.foldLeft(
      base.getOrElse("dwc:country", Map.empty)) { case (m, (k, iso)) =>
      m + (k -> (m.getOrElse(k, Map.empty) + ("idigbio:isoCountryCode" -> iso)))
    }
    val merged = base + ("dwc:country" -> countries)
    merged.map { case (f, m) =>
      f -> m.map { case (v, o) =>
        v -> (o.get("dwc:country").flatMap(countries.get) match {
          case Some(co) => o ++ co // right side wins, like dict.update
          case None     => o
        })
      }
    }
  }

  /** Rule assembly mirroring locality.py get_data(), in to_insert
    * order (vds rules = data_dictionaries_1 first, kl rules =
    * data_dictionaries_2 second — the order the last-write-wins
    * dedupe in [[Corrections.apply]] depends on):
    *  1. vds entries become rules keyed on their own field-value, set
    *     = the post-mutation entry (never the key field itself);
    *  2. kl variant rules set the canonical name (or "" for "None")
    *     and merge the canonical value's vds entry when one exists
    *     (:38-41) — continent has no vds, so continent rules
    *     canonicalize only. */
  lazy val rules: Seq[Rule] = {
    val vdsRules = for {
      (f, m) <- vds.toSeq.sortBy(_._1)
      (v, o) <- m.toSeq.sortBy(_._1)
    } yield Rule(Map(f -> v), o)
    val klRules = for {
      (f0, m) <- kl.toSeq.sortBy(_._1)
      (v, canon) <- m.toSeq.sortBy(_._1)
    } yield {
      val f = remap(f0)
      val vd0 = Map(f -> (if (canon == "None") "" else canon))
      val extra = vds.get(f).flatMap(_.get(vd0(f))).getOrElse(Map.empty)
      Rule(Map(f -> v), vd0 ++ extra)
    }
    vdsRules ++ klRules
  }
}
