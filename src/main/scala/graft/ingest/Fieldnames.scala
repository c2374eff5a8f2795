package graft.ingest

/** Field-name canonicalization (idb/helpers/fieldnames.py:594-631):
  * provider headers → `[canonical namespace:term, DwC class]`, with
  * non-printable characters stripped and unknown fields classed
  * `Unknown`.
  *
  * The reference's translate_dict has ~580 alias entries; this port
  * keeps the resolution MACHINERY exact and carries a representative
  * alias subset plus the dict's three systematic families (identity,
  * `ns_term` underscore forms, bare-term and case variants), which
  * together cover the overwhelming majority of the original entries.
  */
object Fieldnames {

  val UnknownClass = "Unknown"

  private val occ = "dwc:Occurrence"
  private val mm = "dwc:Multimedia"

  /** Canonical DwC occurrence terms (drives the generated families). */
  private val dwcTerms: Seq[String] = Seq(
    "occurrenceID", "catalogNumber", "recordNumber", "recordedBy",
    "individualCount", "sex", "lifeStage", "reproductiveCondition",
    "behavior", "establishmentMeans", "occurrenceStatus", "preparations",
    "disposition", "associatedMedia", "associatedReferences",
    "associatedSequences", "associatedTaxa", "otherCatalogNumbers",
    "occurrenceRemarks", "institutionID", "collectionID", "datasetID",
    "institutionCode", "collectionCode", "datasetName", "basisOfRecord",
    "informationWithheld", "dataGeneralizations", "dynamicProperties",
    "eventID", "fieldNumber", "eventDate", "eventTime", "startDayOfYear",
    "endDayOfYear", "year", "month", "day", "verbatimEventDate", "habitat",
    "samplingProtocol", "fieldNotes", "eventRemarks", "locationID",
    "higherGeography", "continent", "waterBody", "islandGroup", "island",
    "country", "countryCode", "stateProvince", "county", "municipality",
    "locality", "verbatimLocality", "minimumElevationInMeters",
    "maximumElevationInMeters", "verbatimElevation",
    "minimumDepthInMeters", "maximumDepthInMeters", "verbatimDepth",
    "decimalLatitude", "decimalLongitude", "geodeticDatum",
    "coordinateUncertaintyInMeters", "coordinatePrecision",
    "verbatimCoordinates", "verbatimLatitude", "verbatimLongitude",
    "verbatimCoordinateSystem", "verbatimSRS", "footprintWKT",
    "georeferencedBy", "georeferencedDate", "georeferenceProtocol",
    "georeferenceSources", "georeferenceVerificationStatus",
    "georeferenceRemarks", "geologicalContextID", "bed", "formation",
    "group", "member", "identificationID", "identifiedBy",
    "dateIdentified", "identificationReferences", "identificationRemarks",
    "identificationQualifier", "typeStatus", "taxonID", "scientificName",
    "acceptedNameUsage", "higherClassification", "kingdom", "phylum",
    "class", "order", "family", "genus", "subgenus", "specificEpithet",
    "infraspecificEpithet", "taxonRank", "verbatimTaxonRank",
    "scientificNameAuthorship", "vernacularName", "nomenclaturalCode",
    "taxonomicStatus", "nomenclaturalStatus", "taxonRemarks", "modified",
    "language", "license", "rightsHolder", "accessRights",
    "bibliographicCitation", "references", "occurrenceDetails")

  /** Hand-carried aliases (subset of translate_dict; fieldnames.py
    * :96-593). */
  private val aliases: Map[String, (String, String)] = Map(
    "Collector" -> ("dwc:recordedBy", occ),
    "CollectorNumber" -> ("dwc:recordNumber", occ),
    "DayCollected" -> ("dwc:day", occ),
    "MonthCollected" -> ("dwc:month", occ),
    "YearCollected" -> ("dwc:year", occ),
    "DayIdentified" -> ("dwc:dateIdentified", occ),
    "Identifier" -> ("dwc:identifiedBy", occ),
    "JulianDay" -> ("dwc:startDayOfYear", occ),
    "Latitude" -> ("dwc:decimalLatitude", occ),
    "Longitude" -> ("dwc:decimalLongitude", occ),
    "CatalogNumber" -> ("dwc:catalogNumber", occ),
    "CatalogNumberText" -> ("dwc:catalogNumber", occ),
    "id" -> ("id", occ),
    "coreid" -> ("coreid", occ),
    "accessURI" -> ("ac:accessURI", mm),
    "ac:accessURI" -> ("ac:accessURI", mm),
    "dcterms:identifier" -> ("dcterms:identifier", occ),
    "dc:identifier" -> ("dc:identifier", occ),
    "dcterms:modified" -> ("dcterms:modified", occ),
    "dcterms:rights" -> ("dcterms:rights", occ),
    "dcterms:license" -> ("dcterms:license", occ),
    "dcterms:type" -> ("dcterms:type", occ),
    "gbif:canonicalName" -> ("gbif:canonicalName", occ),
    "idigbio:recordId" -> ("idigbio:recordId", occ),
    "symbiota:verbatimScientificName" -> ("symbiota:verbatimScientificName", occ),
  )

  private val byLower: Map[String, String] =
    dwcTerms.map(t => t.toLowerCase -> t).toMap

  /** get_canonical_name (fieldnames.py:594-631): returns
    * (canonical name, class). */
  def canonicalName(field: String): (String, String) = {
    // strip non-printable, like the reference's string.printable filter
    val f = field.filter(c => c >= ' ' && c < 127)
    aliases.get(f).getOrElse {
      // identity family: "dwc:month" etc.
      if (f.startsWith("dwc:") && byLower.contains(f.stripPrefix("dwc:").toLowerCase))
        ("dwc:" + byLower(f.stripPrefix("dwc:").toLowerCase), occ)
      // underscore family: "dwc_decimalLatitude"
      else if (f.startsWith("dwc_") && byLower.contains(f.stripPrefix("dwc_").toLowerCase))
        ("dwc:" + byLower(f.stripPrefix("dwc_").toLowerCase), occ)
      // bare-term + case family: "decimalLatitude", "ScientificName"
      else if (byLower.contains(f.toLowerCase))
        ("dwc:" + byLower(f.toLowerCase), occ)
      else (f, UnknownClass)
    }
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
