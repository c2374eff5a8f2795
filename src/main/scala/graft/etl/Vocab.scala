package graft.etl

/** Controlled-vocabulary lookup tables (data ports; see provenance on
  * each). At cluster scale these are broadcast into expressions /
  * lookup joins — none is larger than a few KB.
  */
object Vocab {

  /** Datum alias normalization (conversions.py:424-430). */
  val datumAliases: Map[String, String] = Map(
    "WORLDGEODETICSYSTEM1984" -> "WGS84",
    "WORLDGEODETICSYSTEM84"   -> "WGS84",
    "WORLDGEODETICSYSTEM1972" -> "WGS72",
    "NORTHAMERICANDATUM1983"  -> "NAD83",
    "NORTHAMERICANDATUM1927"  -> "NAD27")

  /** Datums we accept as parseable. The reference reprojects these to
    * WGS84 via PROJ (conversions.py:485-509); no projection library is
    * available here, so known datums pass through untransformed
    * (divergence: coordinates keep their source datum, typically within
    * ~100 m of WGS84 for these) and unknown ones flag `datum_error`. */
  val knownDatums: Set[String] = Set("WGS84", "WGS72", "NAD83", "NAD27", "ETRS89",
    "GRS80", "OSGB36", "ED50", "GDA94", "TOKYO", "AGD66", "AGD84", "SAD69")

  /** rights string → license key (data port of the canonical subset of
    * idb/data_tables/rights_strings.py acceptable_licenses_trans: the
    * CC URL forms http/https × with/without trailing slash × v3/v4,
    * plus the common short codes). */
  val licenseTrans: Map[String, String] = {
    val byUrl = for {
      scheme <- Seq("http", "https")
      (path, key) <- Seq(
        "licenses/by-nc-sa" -> "BY-NC-SA", "licenses/by-sa" -> "BY-SA",
        "licenses/by-nc" -> "BY-NC", "licenses/by-nc-nd" -> "BY-NC-ND",
        "licenses/by-nd" -> "BY-ND", "licenses/by" -> "BY")
      ver <- Seq("3.0" -> "CC3", "4.0" -> "CC4")
      slash <- Seq("", "/")
    } yield s"$scheme://creativecommons.org/$path/${ver._1}$slash" -> s"${ver._2} $key"
    val zero = for {
      scheme <- Seq("http", "https"); slash <- Seq("", "/")
    } yield s"$scheme://creativecommons.org/publicdomain/zero/1.0$slash" -> "CC0"
    val short = Seq(
      "CC0" -> "CC0", "Public Domain" -> "Public Domain",
      "cc-by" -> "CC4 BY", "cc-by-sa" -> "CC4 BY-SA",
      "cc-by-nc" -> "CC4 BY-NC", "cc-by-nc-sa" -> "CC4 BY-NC-SA",
      "cc-by-nc-nd" -> "CC4 BY-NC-ND",
      "CC BY" -> "CC4 BY", "CC BY-SA" -> "CC4 BY-SA",
      "CC BY-NC" -> "CC4 BY-NC", "CC BY-NC-SA" -> "CC4 BY-NC-SA",
      "CC-BY" -> "CC4 BY", "CC-BY-SA" -> "CC4 BY-SA",
      "CC-BY-NC" -> "CC4 BY-NC", "CC-BY-NC-SA" -> "CC4 BY-NC-SA",
      "CC BY-NC-SA (Attribution-NonCommercial-ShareAlike)" -> "CC4 BY-NC-SA",
      "CC BY-SA (Attribution-ShareAlike)" -> "CC4 BY-SA",
      "CC BY-NC (Attribution-NonCommercial)" -> "CC4 BY-NC",
      "CC BY (Attribution)" -> "CC4 BY",
      "Attribution" -> "CC4 BY", "Attribution-NonCommercial" -> "CC4 BY-NC")
    (byUrl ++ zero ++ short).toMap
  }

  /** license key → (rights, licenselogourl, webstatement) detail
    * (rights_strings.py:116-226; note the reference maps "CC3 BY"'s
    * rights to "BY-NC-SA" — an upstream typo we do NOT replicate). */
  val licenses: Map[String, (String, String, String)] = {
    def cc(ver: String, key: String): (String, (String, String, String)) = {
      val lower = key.toLowerCase
      val v = if (ver == "CC3") "3.0" else "4.0"
      s"$ver $key" -> (key,
        s"https://i.creativecommons.org/l/$lower/$v/88x31.png",
        s"http://creativecommons.org/licenses/$lower/$v/")
    }
    val keys = Seq("BY", "BY-SA", "BY-NC", "BY-NC-SA", "BY-ND", "BY-NC-ND")
    (keys.map(cc("CC3", _)) ++ keys.map(cc("CC4", _)) ++ Seq(
      "CC0" -> ("CC0",
        "https://i.creativecommons.org/p/zero/1.0/88x31.png",
        "http://creativecommons.org/publicdomain/zero/1.0/"),
      "Public Domain" -> ("Public Domain",
        "https://i.creativecommons.org/p/mark/1.0/88x31.png",
        "http://creativecommons.org/publicdomain/mark/1.0/"))).toMap
  }

  /** mime → default storage bucket (media_validation.py:18-34). */
  val defaultBuckets: Map[String, String] = Map(
    "image/jpeg" -> "images", "image/jp2" -> "images",
    "audio/mpeg" -> "sounds", "audio/mpeg3" -> "sounds",
    "video/mpeg" -> "video", "video/mp4" -> "video",
    "model/mesh" -> "models")

  /** GBIF rank vocabulary (data_tables/taxon_rank.py:6-45, full set). */
  val acceptableRanks: Set[String] = Set(
    "domain", "kingdom", "subkingdom", "superphylum", "phylum", "subphylum",
    "superclass", "class", "subclass", "supercohort", "cohort", "subcohort",
    "superorder", "order", "suborder", "infraorder", "superfamily", "family",
    "subfamily", "tribe", "subtribe", "genus", "subgenus", "section",
    "subsection", "series", "subseries", "speciesAggregate", "species",
    "subspecificAggregate", "subspecies", "variety", "subvariety", "form",
    "subform", "cultivarGroup", "cultivar", "strain")

  /** Common alias → canonical rank (data port of a representative subset
    * of taxon_rank.py mapping; entries mapping to null mean "remove"). */
  val rankMapping: Map[String, Option[String]] = Map(
    "class" -> Some("class"), "classe" -> Some("class"),
    "division" -> Some("phylum"), "espècie" -> Some("species"),
    "espécie" -> Some("species"), "f." -> Some("form"),
    "family" -> Some("family"), "familia" -> Some("family"),
    "fm." -> Some("family"), "gen." -> Some("genus"),
    "genero" -> Some("genus"), "género" -> Some("genus"),
    "genus" -> Some("genus"), "kingdom" -> Some("kingdom"),
    "order" -> Some("order"), "orden" -> Some("order"),
    "phylum" -> Some("phylum"), "sp." -> Some("species"),
    "specie" -> Some("species"), "species" -> Some("species"),
    "spp." -> Some("species"), "ssp." -> Some("subspecies"),
    "subsp." -> Some("subspecies"), "subspecies" -> Some("subspecies"),
    "var." -> Some("variety"), "variety" -> Some("variety"),
    "varietas" -> Some("variety"), "cultivar" -> Some("cultivar"),
    "forma" -> Some("form"), "form" -> Some("form"),
    "tribe" -> Some("tribe"), "sect." -> Some("section"),
    "section" -> Some("section"), "unknown" -> None, "not stated" -> None,
    "indet." -> None, "?" -> None)
}
