package graft.ingest

/** Field-name canonicalization (idb/helpers/fieldnames.py:594-631):
  * provider headers → (canonical namespace:term, DwC class), resolved
  * against the FULL translate_dict ([[FieldnamesTable]], 496 entries —
  * a complete data port of fieldnames.py:92-589). The reference
  * semantics are a pure dict lookup: unknown fields come back unchanged
  * with class `Unknown`; a handful of housekeeping headers ("row
  * number", "Error", …) map to a None name meaning "drop this column".
  * Quirks of the table (e.g. the "dwc:Occurence" class typo on some
  * entries) are carried verbatim — consumers match on names, not
  * classes, and behavior compatibility wins.
  */
object Fieldnames {

  val UnknownClass = "Unknown"

  /** string.printable minus the lookup: the reference strips characters
    * outside Python's string.printable before the dict probe. */
  private def printable(c: Char): Boolean =
    (c >= ' ' && c < 127) || c == '\t' || c == '\n' || c == '\r' ||
      c == '\u000b' || c == '\u000c'

  /** get_canonical_name (fieldnames.py:594-631): returns
    * (canonical name — None means drop the field, class). */
  def canonical(field: String): (Option[String], String) = {
    val f = field.filter(printable)
    FieldnamesTable.translate.getOrElse(f, (Some(f), UnknownClass))
  }

  /** Convenience shape for callers that treat "drop" as identity. */
  def canonicalName(field: String): (String, String) = {
    val (n, c) = canonical(field)
    (n.getOrElse(field.filter(printable)), c)
  }

  /** DwC-A extension rowType URI → CURIE shortname (data port of
    * fieldnames.py:64-88 `types`). */
  val extensionShortnames: Map[String, String] = Map(
    "http://data.ggbn.org/schemas/ggbn/terms/MaterialSample" -> "ggbn:MaterialSample",
    "http://purl.org/NET/aec/associatedTaxa" -> "aec:associatedTaxa",
    "http://rs.iobis.org/obis/terms/ExtendedMeasurementOrFact" -> "obis:ExtendedMeasurementOrFact",
    "http://rs.gbif.org/terms/1.0/Identifier" -> "gbif:Identifier",
    "http://rs.gbif.org/terms/1.0/Image" -> "dwc:Multimedia",
    "http://rs.gbif.org/terms/1.0/Multimedia" -> "dwc:Multimedia",
    "http://rs.gbif.org/terms/1.0/Reference" -> "gbif:Reference",
    "http://rs.gbif.org/terms/1.0/SpeciesProfile" -> "gbif:SpeciesProfile",
    "http://rs.gbif.org/terms/1.0/VernacularName" -> "gbif:VernacularName",
    "http://rs.tdwg.org/ac/terms/Audubon_Core" -> "dwc:Multimedia",
    "http://rs.tdwg.org/ac/terms/multimedia" -> "dwc:Multimedia",
    "http://rs.tdwg.org/ac/terms/Multimedia" -> "dwc:Multimedia",
    "http://rs.tdwg.org/dwc/terms/Identification" -> "dwc:Identification",
    "http://rs.tdwg.org/dwc/terms/MeasurementOrFact" -> "dwc:MeasurementOrFact",
    "http://rs.tdwg.org/dwc/terms/occurrence" -> "dwc:Occurrence",
    "http://rs.tdwg.org/dwc/terms/Occurrence" -> "dwc:Occurrence",
    "http://rs.tdwg.org/dwc/terms/ResourceRelationship" -> "dwc:ResourceRelationship",
    "http://rs.tdwg.org/dwc/terms/Taxon" -> "dwc:Taxon",
    "http://rs.tdwg.org/chrono/terms/ChronometricAge" -> "chrono:ChronometricAge",
    "http://zooarchnet.org/dwc/terms/ChronometricDate" -> "zan:ChronometricDate",
    "http://zooarchnet.org/dwc/terms/ChronometricAge" -> "zan:ChronometricAge")

  def extensionShortname(rowTypeUri: String): String =
    extensionShortnames.getOrElse(rowTypeUri, curieOf(rowTypeUri))

  /** Full term URI → CURIE using the namespace table (meta.xml terms). */
  def curieOf(termUri: String): String = {
    graft.export.Exports.namespacesRev
      .collectFirst { case (p, uri) if termUri.startsWith(uri) =>
        s"$p:${termUri.stripPrefix(uri)}" }
      .getOrElse(termUri)
  }
}
