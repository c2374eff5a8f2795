package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The grabAll enrichment pipeline (conversions.py:932-964) as a
  * DataFrame transform: verbatim → elev → int → float → geo → date →
  * relations → commonnames/genbank → crossfill → basisofrecord →
  * taxonrank → flags → dqs.
  *
  * Input contract: a `data: map<string,string>` column holding the
  * canonicalized raw record; optional metadata columns `uuid`, `etag`,
  * `version`, `parent`, `recordids: array<string>`,
  * `siblings: map<string,array<string>>` (as produced by the store
  * layer). Output: one typed column per index field (FieldSchema),
  * `geopoint: struct<lon,lat>`, `flags: array<string>`, `dqs: double`.
  *
  * PERFORMANCE SHAPE — hand-CSE via staged projections. The pipeline is
  * a stack of thin Projects where every expression consumed more than
  * once downstream is materialized ONCE as a named column and referenced
  * by attribute afterwards. A single flat projection would let Catalyst
  * inline each shared tree into all of its consumers (~450 element_at /
  * ~130 regex occurrences for a 12-column read — measured 4× slower at
  * sf0.1), because whole-stage codegen (and with it subexpression
  * elimination) turns off beyond spark.sql.codegen.maxFields. Catalyst's
  * CollapseProject keeps this staging intact: it only merges layers when
  * doing so duplicates no non-cheap multi-referenced alias. The wide raw
  * `data` map is consumed entirely in the first stage and pruned from
  * all later row buffers. Still no shuffle and no UDFs anywhere.
  */
object Enrich {
  import Grabbers._

  /** A fixed `now` so plans are deterministic (checkBounds upper bound).
    * `geo` supplies the country-polygon (and optional EEZ) index for the
    * reverse-geocode correction stage (conversions.py:514-563); when set,
    * `geopoint` is flip-corrected against `countrycode` and the
    * rev_geocode_* flags join the fold (and count toward dqs). */
  def records(df: DataFrame,
      now: java.sql.Timestamp = java.sql.Timestamp.valueOf("2026-01-01 00:00:00"),
      geo: Option[(GeoCorrection.CountryIndex, Option[GeoCorrection.CountryIndex])] = None)
      : DataFrame = {
    val data = col("data")
    val hasCol = df.columns.toSet

    // fields whose final nullness differs from their verbatim value
    // (crossfill / vocabulary fixes run after the verbatim pass)
    val mutatedAfterVerbatim = Set("scientificname", "genus",
      "specificepithet", "basisofrecord", "taxonrank")

    // ALL normalized map reads go through one one-pass multi-key kernel
    // (graft.functions.MapFields): ~60 element_at calls were ~60 linear
    // scans of the raw map per row — and the largest bytecode block in
    // the span. `_f` materializes once in stage 0; each consumer is a
    // cheap struct-field read.
    // ONE key→index list drives BOTH the projection key set and the
    // consuming columns below, so the two can never drift apart
    val textFields = FieldSchema.records.collect {
      case fd if fd.raw.nonEmpty && Set("text", "longtext")(fd.ftype) &&
        !Set("uuid", "etag")(fd.index) => fd.raw -> fd.index
    }
    val textKeys = textFields.map(_._1)
    val elevFields = Seq(
      "minelevation" -> "dwc:minimumElevationInMeters",
      "maxelevation" -> "dwc:maximumElevationInMeters",
      "mindepth"     -> "dwc:minimumDepthInMeters",
      "maxdepth"     -> "dwc:maximumDepthInMeters")
    val elevKeys = elevFields.map(_._2)
    val scoreKeys = FieldSchema.records.collect {
      case fd if fd.inScore > 0 && fd.raw.nonEmpty => fd.raw }
    val miscKeys = Seq("idigbio:uuid", "idigbio:etag", "idigbio:version",
      "dwc:individualCount", "dwc:coordinateUncertaintyInMeters",
      "dwc:decimalLatitude", "dwc:decimalLongitude", "dwc:geodeticDatum",
      "dwc:year", "dwc:month", "dwc:day", "dwc:startDayOfYear",
      "dwc:vernacularName")
    val allKeys = (textKeys ++ elevKeys ++ scoreKeys ++ miscKeys).distinct
    def fk(key: String): Column = col("_f").getField(key)

    // partial data-quality score over plain verbatim text fields —
    // nullness equals the raw probe's, so fold it to one small int while
    // the projected fields are in scope (one native pass over the
    // projected struct; the when/isNotNull fold is the spec, pinned in
    // EnrichSpec)
    val verbatimScoreWeights = FieldSchema.records
      .filter(fd => fd.inScore > 0 && fd.raw.nonEmpty &&
        Set("text", "longtext")(fd.ftype) && !mutatedAfterVerbatim(fd.index))
      .map(fd => fd.raw -> fd.inScore)
    val verbatimScore =
      graft.functions.MapFields.structScore(col("_f"), verbatimScoreWeights)

    // carry caller columns that are neither contract inputs nor outputs
    val contract = Set("data", "uuid", "etag", "version", "parent",
      "recordids", "siblings")
    val produced = FieldSchema.records.map(_.index).toSet
    val passthrough = df.columns.toSeq
      .filterNot(c => contract(c) || produced(c)).map(col)

    // --- stage 0: date-string staging ---------------------------------
    // permissiveTimestamp references its input ~16× (cast + rlike gates +
    // month-name branches); fed the raw `upper(trim(element_at(...)))`
    // tree directly, that tree is copied into every reference and the ONE
    // generated method for the date expression passes the JVM's 64 KB
    // bytecode limit — Janino then fails the whole stage into interpreted
    // execution. Materializing the trimmed input as a named column makes
    // each reference a bound attribute; CollapseProject keeps the stage
    // (multi-referenced, non-cheap alias).
    // stage 0 consumes the raw map ENTIRELY (one multi-key projection +
    // the three raw reads) and a barrier closes its codegen span, so the
    // scan/synthesis span and the parse span each stay under the JIT
    // method ceiling and neither carries the map across
    val s0 = graft.plans.CodegenBarrier(
      df.withColumns(Map(
        "_dm_in" -> upper(trim(getFieldRaw(data, "idigbio:dateModified"))),
        "_ed_in" -> upper(trim(getFieldRaw(data, "dwc:eventDate"))),
        "_as_raw" -> getFieldRaw(data, "dwc:associatedSequences"),
        "_vn_raw" -> getFieldRaw(data, "dwc:vernacularName"),
        "_f" -> graft.functions.MapFields(data, allKeys),
      )).drop("data"))

    // --- stage 1: everything that reads `data` ------------------------
    val textCols = textFields.map { case (raw, idx) => fk(raw).as(idx) }
    val elevCols = elevFields.map { case (idx, raw) =>
      firstNumberDouble(fk(raw)).as(idx) }
    val siblings =
      if (hasCol("siblings")) col("siblings")
      else lit(null).cast("map<string,array<string>>")
    val mediarecords = element_at(siblings, "mediarecord")

    val s1 = s0.select(passthrough ++ Seq(
      (if (hasCol("uuid")) col("uuid") else fk("idigbio:uuid")).as("uuid"),
      (if (hasCol("etag")) col("etag") else fk("idigbio:etag")).as("etag"),
      (if (hasCol("recordids")) col("recordids")
       else lit(null).cast("array<string>")).as("recordids"),
      (if (hasCol("version")) col("version").cast("long")
       else firstNumberLong(fk("idigbio:version"))).as("version"),
      (if (hasCol("parent")) col("parent")
       else try_element_at(element_at(siblings, "recordset"), lit(1))).as("recordset"),
      mediarecords.as("mediarecords"),
      firstNumberDouble(fk("dwc:individualCount")).as("individualcount"),
      firstNumberDouble(fk("dwc:coordinateUncertaintyInMeters"))
        .as("coordinateuncertainty"),
      fk("dwc:decimalLatitude").as("_lat_raw"),
      fk("dwc:decimalLongitude").as("_lon_raw"),
      fk("dwc:geodeticDatum").as("_datum_raw"),
      permissiveTimestamp(col("_dm_in")).as("datemodified"),
      permissiveTimestamp(col("_ed_in")).as("_dc_direct"),
      firstNumberLong(fk("dwc:year")).cast("int").as("_yr"),
      firstNumberLong(fk("dwc:month")).cast("int").as("_mo"),
      firstNumberLong(fk("dwc:day")).cast("int").as("_dy"),
      firstNumberLong(fk("dwc:startDayOfYear")).cast("int").as("_sdy"),
      // no array_compact: it rewrites to a higher-order ArrayFilter,
      // which is CodegenFallback and would knock this whole projection
      // chain out of WholeStageCodegen
      // collect_common_names (conversions.py:818-833) reads the RAW
      // field — case and whitespace preserved, unlike the lowercased
      // getfield path the singular `commonname` verbatim column takes
      // (r11 full-record differential finding)
      when(col("_vn_raw").isNotNull, array(col("_vn_raw")))
        .otherwise(array().cast("array<string>")).as("commonnames"),
      genbankFromText(col("_as_raw")).as("associatedsequences"),
      verbatimScore.as("_score_verbatim"),
    ) ++ textCols ++ elevCols: _*)

    // Codegen span boundaries (graft.plans.CodegenBarrier): the stage
    // stack would otherwise fuse into ONE generated processNext() past
    // the 8 KB JIT / 64 KB Janino ceilings — compiled, discarded, run
    // per-operator. Splitting at the three natural group boundaries
    // (raw-map reads | geo/datum math | vocab chains + flags fold) keeps
    // every span small enough to fuse FOR REAL: measured faster warm
    // than per-operator execution, and the wasted giant compile is gone
    // from the cold path.
    val s1b = graft.plans.CodegenBarrier(s1)

    // --- stage 2: parses of stage-1 strings ---------------------------
    val s2 = s1b.withColumns(Map(
      // try_cast: junk coordinate text is a null coordinate (the
      // reference's float-parse try/except), not an ANSI cast error
      "_lat0" -> col("_lat_raw").try_cast(org.apache.spark.sql.types.DoubleType),
      "_lon0" -> col("_lon_raw").try_cast(org.apache.spark.sql.types.DoubleType),
      "_latexp" -> getExponent(col("_lat_raw")),
      "_lonexp" -> getExponent(col("_lon_raw")),
      "datecollected" -> coalesce(col("_dc_direct"),
        composeEventDate(col("_yr"), col("_mo"), col("_dy"), col("_sdy"))),
      "hasImage" -> col("mediarecords").isNotNull,
      "hasMedia" -> col("mediarecords").isNotNull,
    ))

    // --- stage 3: geo assembly (conversions.py:446-509; the
    //     reverse-geocode stage needs a country-polygon index — omitted) ---
    val preFlip = col("_lat0").isNotNull && col("_lon0").isNotNull &&
      ((col("_lat0") >= -180 && col("_lat0") < -90) ||
       (col("_lat0") > 90 && col("_lat0") <= 180)) &&
      (col("_lon0") >= -90 && col("_lon0") <= 90)
    val s3 = s2.withColumns(Map(
      "_pre_flip" -> preFlip,
      "_lat1" -> when(preFlip, col("_lon0")).otherwise(col("_lat0")),
      "_lon1" -> when(preFlip, col("_lat0")).otherwise(col("_lon0")),
      "startdayofyear" -> dayofyear(col("datecollected")),
    ))

    val s4 = s3.withColumns(Map(
      "_oob" -> (col("_lat0").isNotNull && col("_lon0").isNotNull &&
        (!(col("_lat1") >= -90 && col("_lat1") <= 90) ||
         !(col("_lon1") >= -180 && col("_lon1") <= 180))),
      "_datum_norm" -> {
        val mangled = mangleString(col("_datum_raw"))
        // alias table as one native hash probe; unknown datums pass
        // through (DatumsSpec covers alias + passthrough cases)
        coalesce(graft.functions.StaticLookup(mangled, "datum_aliases",
          Vocab.datumAliases), mangled)
      },
    ))

    val s5pre = s4.withColumns(Map(
      "geopoint" -> when(col("_lat0").isNotNull && col("_lon0").isNotNull && !col("_oob"),
        struct(col("_lon1").as("lon"), col("_lat1").as("lat"))),
    ))

    // datum → WGS84 reprojection (conversions.py:496-505: PROJ transform
    // applied BEFORE the rev-geocode lookup). Abridged-Molodensky SQL from
    // Datums; datums outside the shift table (incl. the ~identity
    // NAD83/GRS80 family and unknown/datum_error values) pass through,
    // matching the reference's failed-CRS behavior.
    val s5dat = s5pre
      .withColumns(Map(
        "_glon" -> col("geopoint.lon"), "_glat" -> col("geopoint.lat")))
      .withColumn("geopoint",
        when(col("geopoint").isNotNull &&
            col("_datum_norm").isin(Datums.shiftedDatums: _*),
          struct(
            Datums.lonCol(col("_glon"), col("_glat"), col("_datum_norm")).as("lon"),
            Datums.latCol(col("_glon"), col("_glat"), col("_datum_norm")).as("lat")))
          .otherwise(col("geopoint")))

    // reverse-geocode correction (conversions.py:514-563) — the budgeted
    // broadcast-lookup UDF; skipped entirely when no index is supplied
    val s5 = geo match {
      case Some((idx, eez)) => GeoCorrection.stage(s5dat, idx, eez)
      case None => s5dat
    }

    val s5b = graft.plans.CodegenBarrier(s5)

    val s6 = s5b.withColumns(Map(
      "_flag_geopoint_pre_flip" -> col("_pre_flip"),
      "_flag_geopoint_bounds" -> col("_oob"),
      "_flag_geopoint_low_precision" -> (col("geopoint").isNotNull &&
        (col("_latexp") <= 2 || col("_lonexp") <= 2)),
      "_flag_geopoint_datum_missing" ->
        (col("geopoint").isNotNull && col("_datum_raw").isNull),
      "_flag_geopoint_datum_error" ->
        (col("geopoint").isNotNull && col("_datum_raw").isNotNull &&
          !col("_datum_norm").isin(Vocab.knownDatums.toSeq: _*)),
    ))

    // --- stage 7: crossfill (conversions.py:745-768; reverse direction
    //     via the minimal gnparser-equivalent Grabbers.parseSciName:
    //     subgenus skip, rank-marker and authorship exclusion) ----------
    // the native one-pass parser (semantics pinned to
    // Grabbers.parseSciName by NativeTextSpec); both fields extract
    // from one materialized struct so the kernel runs once per row
    val s7 = s6.withColumns(Map(
      "_flag_scientificname_added" ->
        (col("genus").isNotNull && col("scientificname").isNull),
      // the reverse branch runs when the name is present and genus absent
      // (:761); each part fills + flags only when it PARSED, mirroring
      // the reference's `filled(k, gs)` guard (:763-765)
      "_crossfill_rev" ->
        (col("scientificname").isNotNull && col("genus").isNull),
      "_sci" -> graft.functions.NativeText.sciParse(col("scientificname")),
    ))
    val s8 = s7.withColumns(Map(
      "_flag_genus_added" ->
        (col("_crossfill_rev") && col("_sci.genus").isNotNull),
      "_flag_specificepithet_added" -> (col("_crossfill_rev") &&
        col("specificepithet").isNull && col("_sci.epithet").isNotNull),
      "scientificname" -> when(col("_flag_scientificname_added"),
        concat_ws(" ", col("genus"), col("specificepithet")))
        .otherwise(col("scientificname")),
    ))
    val s9 = s8.withColumns(Map(
      "genus" -> when(col("_flag_genus_added"), col("_sci.genus"))
        .otherwise(col("genus")),
      "specificepithet" -> when(col("_flag_specificepithet_added"),
        col("_sci.epithet")).otherwise(col("specificepithet")),
    ))

    // --- stage 10: vocabulary fixes -----------------------------------
    val s9b = graft.plans.CodegenBarrier(s9)
    val (borVal, borRemoved, borInvalid) = fixBasisOfRecord(col("basisofrecord"))
    val (rankVal, rankRemoved, rankReplaced) = fixTaxonRank(col("taxonrank"))
    val s10 = s9b.withColumns(Map(
      "_flag_dwc_basisofrecord_removed" -> borRemoved,
      "_flag_dwc_basisofrecord_invalid" -> borInvalid,
      "basisofrecord" -> borVal,
      "_flag_dwc_taxonrank_removed" -> rankRemoved,
      "_flag_dwc_taxonrank_replaced" -> rankReplaced,
      "_flag_dwc_taxonrank_invalid" -> rankRemoved,
      "taxonrank" -> rankVal,
    ))

    // --- flags fold (setFlags conversions.py:235-261 + grabAll
    //     :957-962). Order: set-flags first, then fold order. ----------
    val setFlagCols: Seq[(String, Column)] = Seq(
      "geopoint_0_coord" -> (col("geopoint").isNotNull &&
        (col("geopoint.lon") === 0 || col("geopoint.lat") === 0)),
      "geopoint_similar_coord" -> (col("geopoint").isNotNull &&
        abs(col("geopoint.lon")) === abs(col("geopoint.lat"))),
      "datecollected_bounds" -> dateOutOfBounds(col("datecollected"), now),
    )
    val geoFoldOrder = Seq(
      "geopoint_pre_flip", "geopoint_bounds", "geopoint_low_precision",
      "geopoint_datum_missing", "geopoint_datum_error")
    val restFoldOrder = Seq(
      "scientificname_added", "genus_added", "specificepithet_added",
      "dwc_basisofrecord_removed", "dwc_basisofrecord_invalid",
      "dwc_taxonrank_removed", "dwc_taxonrank_replaced",
      "dwc_taxonrank_invalid")
    // conditional-array concat instead of array_compact(array(...)):
    // stays codegen-able (see commonnames note)
    def flagParts(named: Seq[(String, Column)]): Seq[Column] =
      named.map { case (name, cond) =>
        when(coalesce(cond, lit(false)), array(lit(name)))
          .otherwise(array().cast("array<string>"))
      }
    // rev_geocode flags slot in right after the other geo flags, matching
    // the reference's per-grabber append order (geoGrabber before
    // crossfill/vocab fixes)
    val rgPart =
      if (geo.isDefined) Seq(coalesce(col("_rg_flags"), array().cast("array<string>")))
      else Nil
    val flagsCol = concat(
      flagParts(setFlagCols ++ geoFoldOrder.map(n => n -> col(s"_flag_$n"))) ++
        rgPart ++
        flagParts(restFoldOrder.map(n => n -> col(s"_flag_$n"))): _*)
    val s11 = s10.withColumn("flags", flagsCol)

    // --- dqs (score, conversions.py:264-271) --------------------------
    val laterFields = FieldSchema.records.filter(fd =>
      fd.inScore > 0 && (mutatedAfterVerbatim(fd.index) ||
        fd.raw.isEmpty || !Set("text", "longtext")(fd.ftype)))
    val scored = laterFields
      .filter(fd => s11.columns.contains(fd.index))
      .map(fd => when(col(fd.index).isNotNull, lit(fd.inScore)).otherwise(lit(0)))
      .foldLeft(col("_score_verbatim"))(_ + _)
    val s12 = s11.withColumn("dqs",
      (scored - size(col("flags"))).cast("double") /
        lit(FieldSchema.maxScores("records")))

    s12.drop(s12.columns.filter(_.startsWith("_")): _*)
  }

  /** grabAll for the mediarecords type (conversions.py:932-964 with the
    * mediarecords field table :138-160). Same input contract as
    * [[records]]; output is one typed column per
    * FieldSchema.mediarecords entry plus `flags` and `dqs`.
    *
    * Notes vs the reference:
    *  - the intGrabber table (conversions.py:365-368) grabs `xpixels`
    *    from exif:PixelYDimension and `ypixels` from exif:PixelXDimension
    *    — a deliberate-looking swap we REPRODUCE, since downstream
    *    consumers of the reference's index see swapped dimensions and
    *    behavior compatibility wins over exif correctness;
    *  - the license vote resolves count ties to the first-seen candidate
    *    (the reference's max(set(...)) tie order is hash-arbitrary);
    *  - no geo/elev/crossfill/vocab stages run for this type (their
    *    per-type grabber tables are empty), so the only flags are the
    *    ones inherited from the raw record, and dqs is pure field
    *    presence. */
  def mediarecords(df: DataFrame): DataFrame = {
    val data = col("data")
    val hasCol = df.columns.toSet
    val siblings =
      if (hasCol("siblings")) col("siblings")
      else lit(null).cast("map<string,array<string>>")

    val licenseCandidates = Seq("dcterms:rights", "dc:rights",
      "xmpRights:UsageTerms", "xmpRights:WebStatement", "dcterms:license")

    val contract = Set("data", "uuid", "etag", "version", "parent",
      "recordids", "siblings")
    val produced = FieldSchema.mediarecords.map(_.index).toSet
    val passthrough = df.columns.toSeq
      .filterNot(c => contract(c) || produced(c)).map(col)

    // --- stage 0: consume the raw map entirely ------------------------
    // one one-pass multi-key projection (raw values — URLs/licenses are
    // case-sensitive) + the two date stagings + the ac:-prefix probe;
    // the barrier closes the span so the parse stage never carries the
    // map (see the records pipeline for the full rationale)
    val rawKeys = (Seq("idigbio:uuid", "idigbio:etag", "idigbio:version",
      "dc:type", "ac:tag", "exif:PixelYDimension", "exif:PixelXDimension",
      "ac:accessURI", "ac:bestQualityAccessURI", "dcterms:identifier",
      "dc:identifier", "dcterms:format", "dc:format",
      "ac:bestQualityFormat") ++ licenseCandidates).distinct
    def fr(key: String): Column = col("_fr").getField(key)
    def frNorm(key: String): Column = lower(trim(fr(key)))
    val s0 = graft.plans.CodegenBarrier(
      df.withColumns(Map(
        "_dm_in" -> upper(trim(getFieldRaw(data, "idigbio:dateModified"))),
        "_mo_in" -> upper(trim(getFieldRaw(data, "dcterms:modified"))),
        "_has_ac" -> hasAcKey(data),
        "_fr" -> graft.functions.MapFields(data, rawKeys, normalize = false),
      )).drop("data"))
    val (formatCol, mediatypeCol) = mediaTypeFrom(fr)

    val s1 = s0.select(passthrough ++ Seq(
      (if (hasCol("uuid")) col("uuid") else frNorm("idigbio:uuid")).as("uuid"),
      (if (hasCol("etag")) col("etag") else frNorm("idigbio:etag")).as("etag"),
      (if (hasCol("recordids")) col("recordids")
       else lit(null).cast("array<string>")).as("recordids"),
      (if (hasCol("version")) col("version").cast("long")
       else firstNumberLong(frNorm("idigbio:version"))).as("version"),
      (if (hasCol("parent")) col("parent")
       else try_element_at(element_at(siblings, "recordset"), lit(1))).as("recordset"),
      element_at(siblings, "record").as("records"),
      permissiveTimestamp(col("_dm_in")).as("datemodified"),
      permissiveTimestamp(col("_mo_in")).as("modified"),
      frNorm("dc:type").as("type"),
      frNorm("ac:tag").as("tag"),
      // reference swap (conversions.py:367-368): xpixels ← PixelY
      firstNumberLong(frNorm("exif:PixelYDimension")).as("xpixels"),
      firstNumberLong(frNorm("exif:PixelXDimension")).as("ypixels"),
      formatCol.as("format"),
      mediatypeCol.as("mediatype"),
      accessUriFrom(fr, col("_has_ac")).as("accessuri"),
    ) ++ licenseCandidates.zipWithIndex.map { case (f, i) =>
      licenseKey(fr(f)).as(s"_lic_$i")
    }: _*)

    // Codegen span boundaries — same rationale as the records pipeline:
    // the raw-map-read span (2× date cascade + 5× 103-entry license-key
    // chains) and the pairwise license vote each fuse and compile on
    // their own; stacked they exceed the JIT/Janino method ceilings.
    val s1bar = graft.plans.CodegenBarrier(s1)

    // --- stage 2: license vote over the materialized key columns ------
    val s2 = s1bar.withColumns(Map(
      "_lic_vote" -> licenseVote(
        licenseCandidates.indices.map(i => col(s"_lic_$i"))),
      "hasSpecimen" -> col("records").isNotNull,
    ))
    val (rights, logo, webstatement) = licenseDetail(col("_lic_vote"))
    val s3 = s2.withColumns(Map(
      "rights" -> rights,
      "licenselogourl" -> logo,
      "webstatement" -> webstatement,
    ))

    // --- flags + dqs ---------------------------------------------------
    // no geopoint/datecollected for this type → setFlags contributes
    // nothing; flags is the empty list (corrections-added flag_ keys are
    // the correction engine's concern, Corrections.scala)
    val s4 = s3.withColumn("flags", array().cast("array<string>"))
    val scored = FieldSchema.mediarecords
      .filter(fd => fd.inScore > 0 && s4.columns.contains(fd.index))
      .map(fd => when(col(fd.index).isNotNull, lit(fd.inScore)).otherwise(lit(0)))
      .reduce(_ + _)
    val s5 = s4.withColumn("dqs",
      (scored - size(col("flags"))).cast("double") /
        lit(FieldSchema.maxScores("mediarecords")))

    s5.drop(s5.columns.filter(_.startsWith("_")): _*)
  }

  /** Nested contacts element type (conversions.py:190-203 — the one
    * `custom_mappings` entry: recordsets.contacts, a nested object list
    * with keyword-analyzed first_name/last_name/email/role). */
  val contactsType = "array<struct<first_name:string,last_name:string," +
    "email:string,role:string>>"

  /** grabAll for the recordsets type (conversions.py:932-964 over the
    * field table :173-188). The recordset's raw document comes from the
    * RSS/EML harvest (collection_name, data_rights, link, eml_link,
    * logo_url), so raw keys are bare names, not CURIEs. `contacts` is the
    * reference's single "custom"-typed field: verbatimGrabber returns the
    * nested value untouched (getfield's non-string branch,
    * conversions.py:281-283), so here it is an optional typed nested
    * column ([[contactsType]]) passed through as-is. No grabber table has
    * recordsets entries for elev/float/geo/license/crossfill, so those
    * stages vanish; intGrabber takes version, dateGrabber datemodified,
    * relationsGrabber publisher (parent or siblings). All inScore weights
    * are 0 for this type ⇒ dqs = -len(flags)/1.0 = 0.0 for flagless rows
    * (score, conversions.py:264-271 with the maxscores==0 → 1 guard). */
  def recordsets(df: DataFrame): DataFrame = {
    val data = col("data")
    val hasCol = df.columns.toSet
    val siblings =
      if (hasCol("siblings")) col("siblings")
      else lit(null).cast("map<string,array<string>>")

    val contract = Set("data", "uuid", "etag", "version", "parent",
      "recordids", "siblings", "contacts")
    val produced = FieldSchema.recordsets.map(_.index).toSet
    val passthrough = df.columns.toSeq
      .filterNot(c => contract(c) || produced(c)).map(col)

    val s0 = df.withColumn("_dm_in",
      upper(trim(getFieldRaw(data, "idigbio:dateModified"))))
    val s1 = s0.select(passthrough ++ Seq(
      (if (hasCol("uuid")) col("uuid") else getField(data, "idigbio:uuid")).as("uuid"),
      (if (hasCol("etag")) col("etag") else getField(data, "idigbio:etag")).as("etag"),
      (if (hasCol("recordids")) col("recordids")
       else lit(null).cast("array<string>")).as("recordids"),
      (if (hasCol("version")) col("version").cast("long")
       else firstNumberLong(getField(data, "idigbio:version"))).as("version"),
      (if (hasCol("parent")) col("parent")
       else try_element_at(element_at(siblings, "publisher"), lit(1))).as("publisher"),
      permissiveTimestamp(col("_dm_in")).as("datemodified"),
      getField(data, "data_rights").as("rights"),
      (if (hasCol("contacts")) col("contacts")
       else lit(null).cast(contactsType)).as("contacts"),
      getField(data, "link").as("archivelink"),
      getField(data, "eml_link").as("emllink"),
      getField(data, "logo_url").as("logourl"),
      getField(data, "collection_name").as("name"),
    ): _*)

    val s2 = s1.withColumn("flags", array().cast("array<string>"))
    // every recordsets inScore weight is 0 (conversions.py:173-188) and
    // maxscores falls back to 1, so dqs is just -|flags| (== 0.0 here)
    s2.withColumn("dqs",
      (lit(0) - size(col("flags"))).cast("double") /
        lit(FieldSchema.maxScores("recordsets")))
  }

  /** grabAll for the publishers type (conversions.py:932-964 over the
    * field table :162-172): name from the publisher record's bare `name`
    * key, child recordsets list from siblings (relationsGrabber
    * :651-652), version/datemodified via the shared int/date grabbers.
    * Like recordsets, all inScore weights are 0 ⇒ dqs 0.0. */
  def publishers(df: DataFrame): DataFrame = {
    val data = col("data")
    val hasCol = df.columns.toSet
    val siblings =
      if (hasCol("siblings")) col("siblings")
      else lit(null).cast("map<string,array<string>>")

    val contract = Set("data", "uuid", "etag", "version", "parent",
      "recordids", "siblings")
    val produced = FieldSchema.publishers.map(_.index).toSet
    val passthrough = df.columns.toSeq
      .filterNot(c => contract(c) || produced(c)).map(col)

    val s0 = df.withColumn("_dm_in",
      upper(trim(getFieldRaw(data, "idigbio:dateModified"))))
    val s1 = s0.select(passthrough ++ Seq(
      (if (hasCol("uuid")) col("uuid") else getField(data, "idigbio:uuid")).as("uuid"),
      (if (hasCol("etag")) col("etag") else getField(data, "idigbio:etag")).as("etag"),
      (if (hasCol("recordids")) col("recordids")
       else lit(null).cast("array<string>")).as("recordids"),
      (if (hasCol("version")) col("version").cast("long")
       else firstNumberLong(getField(data, "idigbio:version"))).as("version"),
      element_at(siblings, "recordset").as("recordsets"),
      permissiveTimestamp(col("_dm_in")).as("datemodified"),
      getField(data, "name").as("name"),
    ): _*)

    val s2 = s1.withColumn("flags", array().cast("array<string>"))
    s2.withColumn("dqs",
      (lit(0) - size(col("flags"))).cast("double") /
        lit(FieldSchema.maxScores("publishers")))
  }
}
