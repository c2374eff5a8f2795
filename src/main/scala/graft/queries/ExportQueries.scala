package graft.queries

import graft.Tables
import graft.export.Exports
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Export-sink semantics as CORRECTNESS queries (download.py:166-225). */
object ExportQueries {

  /** uniquevals: value → count sorted by count desc (most_common), with
    * the scientificname capitalization rule exercised on a derived name
    * column. The uuid5 id column is covered by ScalaTest goldens (DuckDB
    * has no sha1 to mirror it). */
  def qUniquevals(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
      .withColumn("scientificname",
        concat(lit("GENUS"), col("doc_id") % 7, lit(" epithet")))
    Exports.uniquevals(d, "records", "scientificname", identity)
      .drop("id")
  }

  val qUniquevalsSql: String =
    """WITH d AS (SELECT 'Genus' || (doc_id % 7) || ' epithet' AS value
      |           FROM documents)
      |SELECT value, COUNT(*) AS itemCount FROM d
      |GROUP BY value ORDER BY itemCount DESC, value""".stripMargin

  /** query_to_csv value encoding: id first, arrays JSON-encoded, nulls
    * as empty string, headers renamed to `namespace:term` long names. */
  def qExportCsv(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val recs = ev.groupBy(concat(lit("u"), col("user_id")).as("uuid"))
      .agg(
        sort_array(collect_list(concat(lit("ev:"), col("event_id")))).as("recordids"),
        max(when(col("event_type") === "click", col("props"))).as("locality"))
    Exports.csvFormat(recs, "records", "uuid", Seq("recordids", "locality"))
      .orderBy(col("uuid"))
  }

  val qExportCsvSql: String =
    """WITH recs AS (
      |  SELECT 'u' || user_id AS uuid,
      |    list_sort(list('ev:' || event_id)) AS recordids,
      |    max(CASE WHEN event_type = 'click' THEN props END) AS locality
      |  FROM events GROUP BY 1)
      |SELECT uuid,
      |  coalesce(to_json(recordids), '') AS "idigbio:recordIds",
      |  coalesce(locality, '') AS "dwc:locality"
      |FROM recs ORDER BY uuid""".stripMargin

  /** Citation attribution counts (download.py:49-79). */
  def qCitations(s: SparkSession, dir: String): DataFrame =
    Exports.citationCounts(Tables.documents(s, dir), "source")

  val qCitationsSql: String =
    """SELECT source AS recordset, COUNT(*) AS itemCount FROM documents
      |GROUP BY source ORDER BY itemCount DESC, recordset""".stripMargin

  /** DwC-A export sink through the oracle gate (download.py:433-577,
    * lib/meta_xml.py): one row per archive member — its meta.xml block
    * exactly as [[Exports.makeFileBlock]] emits it (CURIE→URI term
    * expansion, core `id` vs extension `coreid`, quoting/terminator
    * attributes), joined with the member's row count from the data
    * (core = every document, the multimedia extension = the synthetic
    * has-media subset). The oracle restates the expected XML as an
    * independent literal, so any sink formatting drift goes hash-red. */
  def qExportDwca(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val coreFields = Seq("dwc:occurrenceID", "dwc:scientificName", "dwc:eventDate")
    val extFields = Seq("ac:accessURI", "dcterms:format")
    val blocks = Seq(
      ("occurrence.csv", "core", Exports.rowTypes("records"),
        coreFields.size,
        Exports.makeFileBlock("occurrence.csv", coreFields, core = true,
          rowType = Exports.rowTypes("records"))),
      ("multimedia.csv", "extension", Exports.rowTypes("mediarecords"),
        extFields.size,
        Exports.makeFileBlock("multimedia.csv", extFields, core = false,
          rowType = Exports.rowTypes("mediarecords"))),
    ).toDF("location", "file_type", "row_type", "n_fields", "meta_xml")
    val counts = docs.agg(count(lit(1)).as("n_rows"))
        .withColumn("location", lit("occurrence.csv"))
      .unionByName(
        docs.filter(col("doc_id") % 3 === 0).agg(count(lit(1)).as("n_rows"))
          .withColumn("location", lit("multimedia.csv")))
    counts.join(broadcast(blocks), Seq("location"))
      .select(col("location"), col("file_type"), col("row_type"),
        col("n_fields"), col("n_rows"), col("meta_xml"))
      .orderBy(col("location"))
  }

  /** DwC-A ROUND TRIP — the export sink and the archive reader gated
    * against each other end to end: a core table derived from
    * `documents` is written as a real zip (meta.xml from
    * makeMeta/makeFileBlock + CSV member), unzipped, parsed back
    * through the full Dwca reader (meta.xml parse → CURIE field map →
    * positional read), and reduced to per-bucket fidelity aggregates
    * the oracle replays from the raw table — any drift in either the
    * writer's meta/CSV emission or the reader's parse goes gate-red.
    * The zip is assembled driver-side from collected ids (the export
    * sink's documented bounded-export shape); temp paths are fixed
    * per-(jvm,sf) with overwrite. */
  def qDwcaRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val ids = Tables.documents(s, dir).select(col("doc_id"))
      .orderBy(col("doc_id")).collect().map(_.getLong(0))
    val csv = new StringBuilder("id,occurrenceID,catalogNumber\n")
    ids.foreach { id => csv.append(s"$id,occ:$id,cat-${id % 13}\n") }
    // multimedia extension: every 3rd doc carries one media row
    val ext = new StringBuilder("coreid,accessURI\n")
    ids.filter(_ % 3 == 0).foreach { id =>
      ext.append(s"$id,http://media.example/$id.jpg\n")
    }
    val meta = Exports.makeMeta(Seq(
      Exports.makeFileBlock(
        "occurrence.csv", Seq("dwc:occurrenceID", "dwc:catalogNumber"),
        core = true, rowType = Exports.rowTypes("records")),
      Exports.makeFileBlock(
        "multimedia.csv", Seq("ac:accessURI"),
        core = false, rowType = Exports.rowTypes("mediarecords"))))
    val base = sys.props("java.io.tmpdir") +
      s"/graft_dwca_${Integer.toHexString(dir.hashCode)}"
    new java.io.File(base).mkdirs()
    val zip = s"$base/archive.zip"
    Exports.writeDwcaZip(zip, Map("meta.xml" -> meta,
      "occurrence.csv" -> csv.toString, "multimedia.csv" -> ext.toString))
    val unzipped = graft.ingest.Dwca.unzip(zip, target = Some(s"$base/x"))
    val (core, exts) = graft.ingest.Dwca.read(s, unzipped)
    // extension→core join (Dwca.joinExtension): media rows resolve to
    // their core occurrence; unmatched would null out and shift sums
    val media = graft.ingest.Dwca.joinExtension(core, exts("dwc:Multimedia"))
      .select(col("id").cast("long").as("doc_id"),
        col("`ac:accessURI`").as("uri"))
      .groupBy((col("doc_id") % 7).as("g"))
      .agg(count(lit(1)).as("n_media"),
        sum(conv(substring(md5(col("uri")), 1, 15), 16, 10).cast("long")
            % 1000000007L).as("uri_checksum"))
    core.select(col("id").cast("long").as("doc_id"),
        col("`dwc:occurrenceID`").as("occ"))
      .groupBy((col("doc_id") % 7).as("g"))
      .agg(count(lit(1)).as("n"),
        sum(col("doc_id")).as("idsum"),
        sum(conv(substring(md5(col("occ")), 1, 15), 16, 10).cast("long")
            % 1000000007L).as("checksum"))
      .join(media, Seq("g"), "left")
      .select(col("g"), col("n"), col("idsum"), col("checksum"),
        coalesce(col("n_media"), lit(0L)).as("n_media"),
        coalesce(col("uri_checksum"), lit(0L)).as("uri_checksum"))
      .orderBy(col("g"))
  }

  val qDwcaRoundtripSql: String =
    """WITH m AS (
      |  SELECT doc_id % 7 AS g, count(*) AS n_media,
      |    CAST(sum(try_cast('0x' || substr(
      |      md5('http://media.example/' || doc_id || '.jpg'), 1, 15)
      |      AS BIGINT) % 1000000007) AS BIGINT) AS uri_checksum
      |  FROM documents WHERE doc_id % 3 = 0 GROUP BY g),
      |c AS (
      |  SELECT doc_id % 7 AS g, count(*) AS n,
      |    CAST(sum(doc_id) AS BIGINT) AS idsum,
      |    CAST(sum(try_cast('0x' || substr(md5('occ:' || doc_id), 1, 15)
      |      AS BIGINT) % 1000000007) AS BIGINT) AS checksum
      |  FROM documents GROUP BY g)
      |SELECT c.g, n, idsum, checksum,
      |  coalesce(m.n_media, 0) AS n_media,
      |  coalesce(m.uri_checksum, 0) AS uri_checksum
      |FROM c LEFT JOIN m ON c.g = m.g ORDER BY c.g""".stripMargin

  val qExportDwcaSql: String = {
    val coreXml =
      """  <core encoding="utf-8" fieldsTerminatedBy="," linesTerminatedBy="\n" fieldsEnclosedBy="&quot;" ignoreHeaderLines="1" rowType="http://rs.tdwg.org/dwc/terms/Occurrence">
        |    <files>
        |      <location>occurrence.csv</location>
        |    </files>
        |    <id index="0" />
        |    <field index="1" term="http://rs.tdwg.org/dwc/terms/occurrenceID"/>
        |    <field index="2" term="http://rs.tdwg.org/dwc/terms/scientificName"/>
        |    <field index="3" term="http://rs.tdwg.org/dwc/terms/eventDate"/>
        |  </core>""".stripMargin
    val extXml =
      """  <extension encoding="utf-8" fieldsTerminatedBy="," linesTerminatedBy="\n" fieldsEnclosedBy="&quot;" ignoreHeaderLines="1" rowType="http://rs.tdwg.org/ac/terms/multimedia">
        |    <files>
        |      <location>multimedia.csv</location>
        |    </files>
        |    <coreid index="0" />
        |    <field index="1" term="http://rs.tdwg.org/ac/terms/accessURI"/>
        |    <field index="2" term="http://purl.org/dc/terms/format"/>
        |  </extension>""".stripMargin
    s"""WITH blocks(location, file_type, row_type, n_fields, meta_xml) AS (VALUES
       |  ('occurrence.csv', 'core', 'http://rs.tdwg.org/dwc/terms/Occurrence',
       |   3, '$coreXml'),
       |  ('multimedia.csv', 'extension', 'http://rs.tdwg.org/ac/terms/multimedia',
       |   2, '$extXml')),
       |counts AS (
       |  SELECT 'occurrence.csv' AS location, COUNT(*) AS n_rows FROM documents
       |  UNION ALL
       |  SELECT 'multimedia.csv', COUNT(*) FROM documents WHERE doc_id % 3 = 0)
       |SELECT location, file_type, row_type, n_fields, n_rows, meta_xml
       |FROM counts JOIN blocks USING (location) ORDER BY location""".stripMargin
  }
}
