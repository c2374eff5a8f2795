package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Darwin Core Archive reader (idigbio_ingestion/lib/dwca.py:32-254):
  * driver-side meta.xml parse → one Spark CSV read per core/extension
  * file with per-file delimiter/encoding/header config, positional
  * field mapping to CURIE column names, and `default`-value columns.
  */
object Dwca {

  final case class FileSpec(
      location: String,
      rowType: String,
      fieldsTerminatedBy: String,
      linesTerminatedBy: String,
      fieldsEnclosedBy: String, // "" = unquoted (the DwC text default)
      encoding: String,
      ignoreHeaderLines: Int,
      idIndex: Int,
      idName: String, // "id" for core, "coreid" for extensions
      fields: Seq[(Int, String)],          // index → CURIE
      defaults: Seq[(String, String)])     // CURIE → default value

  final case class Archive(core: FileSpec, extensions: Seq[FileSpec])

  private def unescape(s: String): String =
    s.replace("\\t", "\t").replace("\\n", "\n").replace("\\r", "\r")

  /** Parse meta.xml (dwca.py:92-135, 215-246). */
  def parseMeta(metaXml: String): Archive = {
    val root = scala.xml.XML.loadString(metaXml)
    def fileSpec(node: scala.xml.Node, core: Boolean): FileSpec = {
      def attr(n: String, dflt: String) =
        node.attribute(n).map(_.text).getOrElse(dflt)
      val idNode = if (core) node \ "id" else node \ "coreid"
      val fields = (node \ "field").flatMap { f =>
        val term = Fieldnames.curieOf((f \@ "term"))
        f.attribute("index").map(i => (i.text.trim.toInt, term))
      }
      val defaults = (node \ "field").flatMap { f =>
        f.attribute("default").map(d =>
          (Fieldnames.curieOf(f \@ "term"), d.text))
      }
      FileSpec(
        location = (node \ "files" \ "location").text.trim,
        rowType = attr("rowType", "http://rs.tdwg.org/dwc/terms/Occurrence"),
        fieldsTerminatedBy = unescape(attr("fieldsTerminatedBy", ",")),
        linesTerminatedBy = unescape(attr("linesTerminatedBy", "\n")),
        // the DwC text guide default is unquoted; &quot; enables RFC4180
        // quoting (python csv's quotechar in the reference's reader)
        fieldsEnclosedBy = unescape(attr("fieldsEnclosedBy", "")),
        encoding = attr("encoding", "UTF-8"),
        ignoreHeaderLines = attr("ignoreHeaderLines", "0").trim.toInt,
        idIndex = idNode.headOption.map(n => (n \@ "index").trim.toInt).getOrElse(0),
        idName = if (core) "id" else "coreid",
        fields = fields,
        defaults = defaults)
    }
    val core = (root \ "core").headOption.getOrElse(
      throw new IllegalArgumentException("meta.xml has no core"))
    Archive(fileSpec(core, core = true),
      (root \ "extension").map(fileSpec(_, core = false)))
  }

  /** Read one archive file per its spec: positional `_c{i}` columns →
    * CURIE names, id/coreid column, defaults appended (dwca.py's
    * `#term` default handling). */
  def readFile(spark: SparkSession, dir: String, spec: FileSpec): DataFrame = {
    val quoted = spec.fieldsEnclosedBy.nonEmpty
    val raw = spark.read
      .option("header", spec.ignoreHeaderLines > 0)
      .option("delimiter", spec.fieldsTerminatedBy)
      .option("encoding", spec.encoding)
      .option("mode", "PERMISSIVE")
      // fieldsEnclosedBy="" disables quote handling entirely (a quote is
      // data); when set, escape = the quote char gives RFC4180 doubled
      // quotes ("the ""old"" farm"), matching python csv's default
      // doublequote=True in the reference reader
      .option("quote", if (quoted) spec.fieldsEnclosedBy else "")
      .option("escape", if (quoted) spec.fieldsEnclosedBy else "\\")
      // quoted fields may legally embed record terminators; multiLine
      // parses them at the cost of file-level (not block-level) input
      // splits — archive members are per-file reads of bounded size, so
      // correctness wins here. An unquoted archive keeps splittable reads.
      .option("multiLine", quoted)
      .csv(s"$dir/${spec.location}")
    val positional = raw.columns
    def colAt(i: Int) =
      if (i < positional.length) col(positional(i)) else lit(null).cast("string")
    val idCol = colAt(spec.idIndex).as(spec.idName)
    val fieldCols = spec.fields
      .filter { case (i, term) => i != spec.idIndex || term != spec.idName }
      .map { case (i, term) => colAt(i).as(term) }
    val defaultCols = spec.defaults
      .filterNot { case (term, _) => spec.fields.exists(_._2 == term) }
      .map { case (term, v) => lit(v).as(term) }
    raw.select(idCol +: (fieldCols ++ defaultCols): _*)
  }

  /** Read the whole archive: core plus each extension, exposed by
    * rowType CURIE. */
  def read(spark: SparkSession, dir: String): (DataFrame, Map[String, DataFrame]) = {
    val metaPath = java.nio.file.Paths.get(dir, "meta.xml")
    val archive = parseMeta(java.nio.file.Files.readString(metaPath))
    val core = readFile(spark, dir, archive.core)
    val exts = archive.extensions.map { e =>
      Fieldnames.extensionShortname(e.rowType) -> readFile(spark, dir, e)
    }.toMap
    (core, exts)
  }

  /** extension→core join (db_check.py:167-168, 365-378): Spark needs no
    * ordering-based buffering — a plain equi-join, broadcast when the
    * extension is small. */
  def joinExtension(core: DataFrame, ext: DataFrame): DataFrame =
    ext.join(core, ext("coreid") === core("id"), "left")

  /** Unzip an archive (driver-side, like dwca.py:63-75) — to `target`
    * when given (cleared first; repeat callers reuse one dir instead
    * of leaking a fresh temp copy per call), else a new temp dir. */
  def unzip(zipPath: String, target: Option[String] = None): String = {
    val outDir = target match {
      case Some(t) =>
        val p = java.nio.file.Paths.get(t)
        if (java.nio.file.Files.exists(p)) {
          import scala.jdk.CollectionConverters._
          val walk = java.nio.file.Files.walk(p)
          try walk.iterator().asScala.toSeq.reverse
            .foreach(java.nio.file.Files.delete)
          finally walk.close()
        }
        java.nio.file.Files.createDirectories(p).toString
      case None => java.nio.file.Files.createTempDirectory("dwca").toString
    }
    val zf = new java.util.zip.ZipFile(zipPath)
    try {
      zf.entries().asIterator().forEachRemaining { e =>
        if (!e.isDirectory) {
          val dest = java.nio.file.Paths.get(outDir, e.getName)
          java.nio.file.Files.createDirectories(dest.getParent)
          java.nio.file.Files.copy(zf.getInputStream(e), dest)
        }
      }
    } finally zf.close()
    outDir
  }
}
