package graft.export

import graft.etl.FieldSchema
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

/** Bulk-export sinks (SURVEY §2.1, §3.2): CSV/TSV with the reference's
  * value encoding, unique-values exports with stable UUIDv5 ids, and
  * DwC-A meta.xml/zip assembly.
  */
object Exports {

  /** Namespace prefix → URI (data port of idb/helpers/fieldnames.py:20-57
    * incl. the manual reverse overrides) — used to expand CURIEs into
    * meta.xml term URIs. */
  val namespacesRev: Map[String, String] = Map(
    "dwc" -> "http://rs.tdwg.org/dwc/terms/",
    "dcterms" -> "http://purl.org/dc/terms/",
    "dc" -> "http://purl.org/dc/elements/1.1/",
    "ac" -> "http://rs.tdwg.org/ac/terms/",
    "xmpRights" -> "http://ns.adobe.com/xap/1.0/rights/",
    "xmp" -> "http://ns.adobe.com/xap/1.0/",
    "Iptc4xmpExt" -> "http://iptc.org/std/Iptc4xmpExt/2008-02-29/",
    "idigbio" -> "http://portal.idigbio.org/terms/",
    "symbiota" -> "http://symbiota.org/terms/",
    "inhs" -> "http://portal.idigbio.org/terms/inhs/",
    "wgs84_pos" -> "http://www.w3.org/2003/01/geo/wgs84_pos#",
    "gbif" -> "http://rs.gbif.org/terms/1.0/",
    "iucn" -> "http://iucn.org/terms/",
    "fcc" -> "http://portal.idigbio.org/terms/fcc/",
    "photoshop" -> "http://ns.adobe.com/photoshop/1.0/",
    "exif" -> "http://ns.adobe.com/exif/1.0/",
    "aec" -> "http://purl.org/NET/aec/",
    "zan" -> "http://zooarchnet.org/dwc/terms/",
    "ala" -> "http://rs.ala.org.au/terms/1.0/",
    "abcd" -> "http://rs.tdwg.org/abcd/terms/",
    "hispid" -> "http://hiscom.chah.org.au/hispid/terms/",
    "ggbn" -> "http://data.ggbn.org/schemas/ggbn/terms/",
    "obis" -> "http://rs.iobis.org/obis/terms/",
    "chrono" -> "http://rs.tdwg.org/chrono/terms/",
    "mixs" -> "http://gensc.org/ns/mixs/")

  // --- UUIDv5 (RFC 4122 name-based, SHA-1) ------------------------------
  // The uniquevals exports id values with uuid5 under fixed namespaces
  // (idigbio_workers/lib/identification.py:1-20).

  /** Standard RFC 4122 namespaces. */
  val NamespaceUrl: java.util.UUID =
    java.util.UUID.fromString("6ba7b811-9dad-11d1-80b4-00c04fd430c8")
  val NamespaceDns: java.util.UUID =
    java.util.UUID.fromString("6ba7b810-9dad-11d1-80b4-00c04fd430c8")

  def uuidBytes(u: java.util.UUID): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(16)
    bb.putLong(u.getMostSignificantBits).putLong(u.getLeastSignificantBits)
    bb.array()
  }

  /** Driver-side uuid5. */
  def uuid5(namespace: java.util.UUID, name: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-1")
    md.update(uuidBytes(namespace))
    md.update(name.getBytes("UTF-8"))
    val h = md.digest()
    h(6) = ((h(6) & 0x0f) | 0x50).toByte
    h(8) = ((h(8) & 0x3f) | 0x80).toByte
    val bb = java.nio.ByteBuffer.wrap(h, 0, 16)
    new java.util.UUID(bb.getLong, bb.getLong).toString
  }

  /** identification.py:6-11 — derived sub-namespaces (golden-asserted
    * in the reference source). */
  val localityNamespace: java.util.UUID =
    java.util.UUID.fromString(uuid5(NamespaceUrl,
      "http://identifiers.idigbio.org/locality"))
  val gnNamespace: java.util.UUID =
    java.util.UUID.fromString(uuid5(NamespaceDns, "globalnames.org"))

  /** uuid5 as a codegen'd column: sha1 over namespace bytes ++ value,
    * version/variant nibbles patched in hex-string space (nibble 12 →
    * '5'; nibble 16 → (n & 3) | 8 via a translate table). */
  def uuid5Column(namespace: java.util.UUID, name: Column): Column = {
    val h = sha1(concat(lit(uuidBytes(namespace)), encode(name, "UTF-8")))
    val variant = translate(substring(h, 17, 1),
      "0123456789abcdef", "89ab89ab89ab89ab")
    concat_ws("-",
      substring(h, 1, 8),
      substring(h, 9, 4),
      concat(lit("5"), substring(h, 14, 3)),
      concat(variant, substring(h, 18, 3)),
      substring(h, 21, 12))
  }

  def identifyScientificName(c: Column): Column =
    uuid5Column(gnNamespace, coalesce(c, lit("")))
  def identifyLocality(c: Column): Column =
    uuid5Column(localityNamespace, coalesce(c, lit("")))

  // --- CSV / uniquevals -------------------------------------------------

  /** query_to_csv value encoding (download.py:201-225): id column first,
    * strings pass through, non-scalars JSON-encoded, nulls become empty
    * strings. Returns the frame ready for `.write.option("header",true)
    * .csv(...)` with headers renamed to long names. */
  def csvFormat(df: DataFrame, t: String, idField: String,
      fields: Seq[String]): DataFrame = {
    val longNames = FieldSchema.longNames.getOrElse(t, Map.empty)
    val cols = col(idField).as(idField) +: fields.map { f =>
      val enc = df.schema(f).dataType match {
        case _: ArrayType | _: MapType | _: StructType => to_json(col(f))
        case _ => col(f).cast("string")
      }
      coalesce(enc, lit("")).as(longNames.getOrElse(f, f))
    }
    df.select(cols: _*)
  }

  /** query_to_uniquevals (download.py:166-198): value → count, sorted by
    * count desc (most_common), scientificname capitalized, id = uuid5 of
    * the value. Null values group under "". */
  def uniquevals(df: DataFrame, t: String, valField: String,
      idFunc: Column => Column): DataFrame = {
    val isSci = valField.toLowerCase.endsWith("scientificname")
    val v0 = coalesce(col(valField).cast("string"), lit(""))
    val v = if (isSci) concat(upper(substring(v0, 1, 1)), lower(substring(v0, 2, 100000)))
            else v0
    df.select(v.as("value"))
      .groupBy(col("value")).agg(count(lit(1)).as("itemCount"))
      .select(idFunc(col("value")).as("id"), col("value"), col("itemCount"))
      .orderBy(col("itemCount").desc, col("value"))
  }

  // --- DwC-A meta.xml + zip (download.py:433-577, lib/meta_xml.py) ------

  /** Expand a CURIE (`dwc:genus`) to a term URI for meta.xml. */
  def termUri(term: String): String = term.split(":", 2) match {
    case Array(p, local) if namespacesRev.contains(p) => namespacesRev(p) + local
    case _ => term
  }

  def makeFileBlock(filename: String, fields: Seq[String], core: Boolean,
      rowType: String, tabs: Boolean = false): String = {
    val fieldTerminator = if (tabs) "\\t" else ","
    val (fileType, idType) = if (core) ("core", "id") else ("extension", "coreid")
    val fieldXml = fields.zipWithIndex.map { case (f, i) =>
      s"""    <field index="${i + 1}" term="${termUri(f)}"/>"""
    }.mkString("\n")
    s"""  <$fileType encoding="utf-8" fieldsTerminatedBy="$fieldTerminator" linesTerminatedBy="\\n" fieldsEnclosedBy="&quot;" ignoreHeaderLines="1" rowType="$rowType">
       |    <files>
       |      <location>$filename</location>
       |    </files>
       |    <$idType index="0" />
       |$fieldXml
       |  </$fileType>""".stripMargin
  }

  def makeMeta(fileBlocks: Seq[String]): String =
    s"""<archive xmlns="http://rs.tdwg.org/dwc/text/">
       |${fileBlocks.mkString("\n")}
       |</archive>
       |""".stripMargin

  val rowTypes: Map[String, String] = Map(
    "records" -> "http://rs.tdwg.org/dwc/terms/Occurrence",
    "mediarecords" -> "http://rs.tdwg.org/ac/terms/multimedia",
    "uniquelocality" -> "http://rs.tdwg.org/dwc/terms/Location",
    "uniquenames" -> "http://rs.tdwg.org/dwc/terms/Taxon")

  /** Citation counts (download.py:49-79): recordset attribution list. */
  def citationCounts(df: DataFrame, recordsetCol: String): DataFrame =
    df.groupBy(col(recordsetCol).as("recordset"))
      .agg(count(lit(1)).as("itemCount"))
      .orderBy(col("itemCount").desc, col("recordset"))

  /** Render `df` as ONE RFC4180 CSV text via the Spark csv writer
    * (coalesced single part, doubled-quote escaping — the encoding
    * [[graft.ingest.Dwca.readFile]] parses back). The driver-side
    * collection is the export worker's bounded tail; an unbounded
    * export ships the written directory instead (see
    * [[writeDwcaZip]]). */
  def csvText(df: DataFrame, tabs: Boolean = false): String = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_csv")
    try {
      df.coalesce(1).write.mode("overwrite")
        .option("header", "true")
        .option("delimiter", if (tabs) "\t" else ",")
        .option("escape", "\"")
        .csv(tmp.toString)
      val part = tmp.toFile.listFiles()
        .filter(f => f.getName.startsWith("part-") &&
          f.getName.endsWith(".csv")).headOption
      part match {
        case Some(f) =>
          new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
        case None =>
          // a zero-partition result (a download whose queries match
          // nothing) writes NO part file after coalesce(1) — the member
          // is still a valid header-only CSV, not a crash
          val delim = if (tabs) "\t" else ","
          df.columns.map { c =>
            if (c.exists(ch => ch == delim.head || ch == '"' ||
                ch == '\n' || ch == '\r'))
              "\"" + c.replace("\"", "\"\"") + "\""
            else c
          }.mkString(delim) + "\n"
      }
    } finally {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(tmp)
      val paths = try walk.iterator().asScala.toSeq.reverse finally walk.close()
      paths.foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  /** Assemble a DwC-A zip on the driver from per-file CSV text already
    * collected (export sizes are bounded by the query, as in the
    * reference's worker); big exports should instead ship the Spark-
    * written csv directories and zip externally. */
  def writeDwcaZip(outPath: String, files: Map[String, String]): Unit = {
    val zos = new java.util.zip.ZipOutputStream(
      new java.io.FileOutputStream(outPath))
    try files.foreach { case (name, content) =>
      zos.putNextEntry(new java.util.zip.ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    } finally zos.close()
  }
}
