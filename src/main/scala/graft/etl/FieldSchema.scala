package graft.etl

/** The typed index-field schema — a data port of the reference's field
  * declaration table (idb/helpers/conversions.py:35-188):
  * `[indexname, rawfield, fieldtype, include_in_score, altname]`.
  *
  * `raw` is the source key read by the verbatim grabber; `alt` is the
  * long name used for export headers when `raw` is empty (the value is
  * then produced by a later enrichment stage, not the verbatim pass).
  */
final case class FieldDef(index: String, raw: String, ftype: String,
    inScore: Int, alt: Option[String] = None)

object FieldSchema {
  import scala.{List => L}

  private def f(i: String, r: String, t: String, s: Int, a: String = null) =
    FieldDef(i, r, t, s, Option(a))

  val records: List[FieldDef] = L(
    f("uuid", "idigbio:uuid", "text", 0),
    f("datemodified", "", "date", 0, "idigbio:dateModified"),
    f("etag", "idigbio:etag", "text", 0),
    f("recordids", "idigbio:recordIds", "list", 0),
    f("version", "", "integer", 0, "idigbio:version"),
    f("kingdom", "dwc:kingdom", "text", 1),
    f("phylum", "dwc:phylum", "text", 1),
    f("class", "dwc:class", "text", 1),
    f("order", "dwc:order", "text", 1),
    f("family", "dwc:family", "text", 1),
    f("genus", "dwc:genus", "text", 1),
    f("basisofrecord", "dwc:basisOfRecord", "text", 1),
    f("specificepithet", "dwc:specificEpithet", "text", 1),
    f("infraspecificepithet", "dwc:infraspecificEpithet", "text", 1),
    f("highertaxon", "dwc:higherClassification", "longtext", 1),
    f("scientificname", "dwc:scientificName", "text", 1),
    f("commonname", "dwc:vernacularName", "text", 1),
    f("commonnames", "", "list", 1),
    f("associatedsequences", "", "list", 1),
    f("continent", "dwc:continent", "text", 1),
    f("country", "dwc:country", "text", 1),
    f("stateprovince", "dwc:stateProvince", "text", 1),
    f("county", "dwc:county", "text", 1),
    f("countrycode", "idigbio:isoCountryCode", "text", 1),
    f("municipality", "dwc:municipality", "text", 1),
    f("waterbody", "dwc:waterBody", "text", 1),
    f("locality", "dwc:locality", "longtext", 1),
    f("verbatimlocality", "dwc:verbatimLocality", "longtext", 1),
    f("geopoint", "", "point", 1, "idigbio:geoPoint"),
    f("minelevation", "", "float", 1, "dwc:minimumElevationInMeters"),
    f("maxelevation", "", "float", 1, "dwc:maximumElevationInMeters"),
    f("mindepth", "", "float", 1, "dwc:minimumDepthInMeters"),
    f("maxdepth", "", "float", 1, "dwc:maximumDepthInMeters"),
    f("coordinateuncertainty", "", "float", 1, "dwc:coordinateUncertaintyInMeters"),
    f("datecollected", "", "date", 1, "idigbio:eventDate"),
    f("startdayofyear", "", "integer", 1, "dwc:startDayOfYear"),
    f("institutionname", "idigbio:institutionName", "text", 1),
    f("institutioncode", "dwc:institutionCode", "text", 1),
    f("institutionid", "dwc:institutionID", "text", 1),
    f("collectionname", "idigbio:collectionName", "text", 1),
    f("collectioncode", "dwc:collectionCode", "text", 1),
    f("collectionid", "dwc:collectionID", "text", 1),
    f("occurrenceid", "dwc:occurrenceID", "text", 1),
    f("barcodevalue", "idigbio:barcodeValue", "text", 1),
    f("catalognumber", "dwc:catalogNumber", "text", 1),
    f("fieldnumber", "dwc:fieldNumber", "text", 1),
    f("recordnumber", "dwc:recordNumber", "text", 1),
    f("typestatus", "dwc:typeStatus", "text", 1),
    f("eventdate", "dwc:eventDate", "text", 1),
    f("verbatimeventdate", "dwc:verbatimEventDate", "text", 1),
    f("collector", "dwc:recordedBy", "longtext", 1),
    f("recordset", "", "text", 0, "idigbio:recordset"),
    f("mediarecords", "", "list", 0, "idigbio:mediarecords"),
    f("hasImage", "", "boolean", 0, "idigbio:hasImage"),
    f("hasMedia", "", "boolean", 0, "idigbio:hasMedia"),
    f("bed", "dwc:bed", "text", 1),
    f("group", "dwc:group", "text", 1),
    f("member", "dwc:member", "text", 1),
    f("formation", "dwc:formation", "text", 1),
    f("geologicalcontextid", "dwc:geologicalContextID", "text", 1),
    f("lowestbiostratigraphiczone", "dwc:lowestBiostratigraphicZone", "text", 1),
    f("highestbiostratigraphiczone", "dwc:highestBiostratigraphicZone", "text", 1),
    f("lithostratigraphicterms", "dwc:lithostratigraphicTerms", "text", 1),
    f("earliestperiodorlowestsystem", "dwc:earliestPeriodOrLowestSystem", "text", 1),
    f("earliesteraorlowesterathem", "dwc:earliestEraOrLowestErathem", "text", 1),
    f("earliestepochorlowestseries", "dwc:earliestEpochOrLowestSeries", "text", 1),
    f("earliestageorloweststage", "dwc:earliestAgeOrLowestStage", "text", 1),
    f("earliesteonorlowesteonothem", "dwc:earliestEonOrLowestEonothem", "text", 1),
    f("latesteraorhighesterathem", "dwc:latestEraOrHighestErathem", "text", 1),
    f("latestepochorhighestseries", "dwc:latestEpochOrHighestSeries", "text", 1),
    f("latestageorhigheststage", "dwc:latestAgeOrHighestStage", "text", 1),
    f("latestperiodorhighestsystem", "dwc:latestPeriodOrHighestSystem", "text", 1),
    f("latesteonorhighesteonothem", "dwc:latestEonOrHighestEonothem", "text", 1),
    f("individualcount", "", "float", 0, "dwc:individualCount"),
    f("flags", "", "list", 0, "idigbio:flags"),
    f("dqs", "", "float", 0, "idigbio:dataQualityScore"),
    f("canonicalname", "gbif:canonicalName", "text", 1),
    f("taxonomicstatus", "dwc:taxonomicStatus", "text", 1),
    f("taxonid", "dwc:taxonID", "text", 1),
    f("taxonrank", "dwc:taxonRank", "text", 1),
    f("datasetid", "dwc:datasetID", "text", 1),
  )

  val mediarecords: List[FieldDef] = L(
    f("uuid", "idigbio:uuid", "text", 0),
    f("datemodified", "", "date", 0, "idigbio:dateModified"),
    f("modified", "", "date", 1, "dcterms:modified"),
    f("etag", "idigbio:etag", "text", 0),
    f("version", "", "integer", 0, "idigbio:version"),
    f("recordids", "idigbio:recordIds", "list", 0),
    f("recordset", "", "text", 0, "idigbio:recordsets"),
    f("records", "", "list", 0, "idigbio:records"),
    f("format", "", "text", 1, "dcterms:format"),
    f("mediatype", "", "text", 1, "idigbio:mediaType"),
    f("type", "dc:type", "text", 1),
    f("tag", "ac:tag", "longtext", 1),
    f("accessuri", "", "text", 1, "ac:accessURI"),
    f("xpixels", "", "integer", 1, "exif:PixelXDimension"),
    f("ypixels", "", "integer", 1, "exif:PixelYDimension"),
    f("rights", "", "text", 1, "dcterms:rights"),
    f("licenselogourl", "", "text", 1, "ac:licenseLogoURL"),
    f("webstatement", "", "text", 1, "xmpRights:WebStatement"),
    f("hasSpecimen", "", "boolean", 0, "idigbio:hasSpecimen"),
    f("flags", "", "list", 0, "idigbio:flags"),
    f("dqs", "", "float", 0, "idigbio:dataQualityScore"),
  )

  val publishers: List[FieldDef] = L(
    f("uuid", "idigbio:uuid", "text", 0),
    f("datemodified", "", "date", 0, "idigbio:dateModified"),
    f("etag", "idigbio:etag", "text", 0),
    f("version", "", "integer", 0, "idigbio:version"),
    f("recordids", "idigbio:recordIds", "list", 0),
    f("flags", "", "list", 0, "idigbio:flags"),
    f("dqs", "", "float", 0, "idigbio:dataQualityScore"),
    f("recordsets", "", "list", 0, "idigbio:recordsets"),
    f("name", "name", "text", 0, "idigbio:publisherName"),
  )

  val recordsets: List[FieldDef] = L(
    f("uuid", "idigbio:uuid", "text", 0),
    f("datemodified", "", "date", 0, "idigbio:dateModified"),
    f("etag", "idigbio:etag", "text", 0),
    f("version", "", "integer", 0, "idigbio:version"),
    f("recordids", "idigbio:recordIds", "list", 0),
    f("publisher", "", "text", 0, "idigbio:publisher"),
    f("flags", "", "list", 0, "idigbio:flags"),
    f("dqs", "", "float", 0, "idigbio:dataQualityScore"),
    f("rights", "data_rights", "text", 0, "dcterms:rights"),
    f("archivelink", "link", "text", 0, "idigbio:archiveLink"),
    f("emllink", "eml_link", "text", 0, "idigbio:emlLink"),
    f("logourl", "logo_url", "text", 0, "idigbio:logoUrl"),
    f("name", "collection_name", "text", 0, "dwc:datasetName"),
  )

  val byType: Map[String, List[FieldDef]] = Map(
    "records" -> records, "mediarecords" -> mediarecords,
    "publishers" -> publishers, "recordsets" -> recordsets)

  /** Denominator of the data-quality score (conversions.py:218-224). */
  val maxScores: Map[String, Double] = byType.map { case (t, fs) =>
    val s = fs.map(_.inScore).sum.toDouble
    t -> (if (s == 0.0) 1.0 else s)
  }

  /** index field → `namespace:term` long name for export headers
    * (conversions.py:205-215). */
  val longNames: Map[String, Map[String, String]] = byType.map { case (t, fs) =>
    t -> fs.map { fd =>
      fd.index -> fd.alt.getOrElse(
        if (fd.raw.nonEmpty) fd.raw else s"idigbio:${fd.index}")
    }.toMap
  }

  /** Parent containment (conversions.py:26-30). */
  val parentMap: Map[String, String] = Map(
    "records" -> "recordsets",
    "mediarecords" -> "recordsets",
    "recordsets" -> "publishers")
}
