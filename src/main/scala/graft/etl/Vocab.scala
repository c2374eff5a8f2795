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

  /** Datums we accept as parseable (no `datum_error` flag). The
    * reference reprojects via PROJ (conversions.py:485-509); here every
    * non-identity member (NAD27/ED50/OSGB36/WGS72/TOKYO/AGD66/AGD84/
    * SAD69) goes through the abridged-Molodensky transform in
    * [[Datums]], and the ~identity family (WGS84/NAD83/GRS80/ETRS89/
    * GDA94) passes through — matching PROJ's grid-less behavior. */
  val knownDatums: Set[String] = Set("WGS84", "WGS72", "NAD83", "NAD27", "ETRS89",
    "GRS80", "OSGB36", "ED50", "GDA94", "TOKYO", "AGD66", "AGD84", "SAD69")

  /** rights string → license key (FULL data port of
    * idb/data_tables/rights_strings.py:7-114 acceptable_licenses_trans,
    * 103 entries including the prose and HTML-blob rights strings real
    * publishers send). */
  val licenseTrans: Map[String, String] = VocabTables.licenseTrans

  /** license key → (rights, licenselogourl, webstatement) detail
    * (FULL data port of rights_strings.py:116-185; quirks kept verbatim:
    * "CC3 BY" carries rights "BY-NC-SA" — the reference's own data bug —
    * CC3 logo URLs use http://, and "Public Domain" has no logo or
    * webstatement). */
  val licenses: Map[String, (String, Option[String], Option[String])] =
    VocabTables.licenses

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

  /** Alias → canonical rank (FULL data port, taxon_rank.py:49-366:
    * 74 mapping entries plus 239 reject entries that map to None =
    * "remove"). */
  val rankMapping: Map[String, Option[String]] = VocabTables.rankMapping
}
