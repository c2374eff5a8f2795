package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Delimited (CSV/TSV) ingestion with the reference's recovery
  * semantics (idigbio_ingestion/lib/delimited.py:49-306):
  * header canonicalization, rowtype inference by majority DwC-class
  * vote, NUL stripping, and bad-line flagging — expressed on Spark's
  * PERMISSIVE reader so malformed lines survive as flagged rows instead
  * of killing the file.
  */
object Delimited {

  /** Delimiter normalization (delimited.py:63-125): named/escaped/HTML
    * forms → the character. */
  def normalizeDelimiter(d: String): String = d match {
    case "tab" | "\\t" | "0x09" | "&#9;" | "&#09;" => "\t"
    case "comma" | ","                             => ","
    case "pipe" | "|"                              => "|"
    case ";" | "semicolon"                         => ";"
    case other                                     => other
  }

  /** Rowtype inference: majority vote of the canonical classes of the
    * header terms (delimited.py:182-203): dropped (None-name) headers
    * don't vote, Unknown does, and ties break to the lexically LARGER
    * class name (the reference sorts (count, name) descending). */
  def rowTypeVote(headers: Seq[String]): String = {
    val classes = headers.map(Fieldnames.canonical)
      .collect { case (Some(_), cls) => cls }
    if (classes.isEmpty) "dwc:Occurrence"
    else classes.groupBy(identity).view.mapValues(_.size)
      .toSeq.maxBy { case (name, n) => (n, name) }._1
  }

  /** Read a delimited file: PERMISSIVE mode with a corrupt-record
    * column, canonicalized headers (duplicates uniquified), NULs
    * stripped from every string column, and a `flags` column carrying
    * `line_parse_error` for rows Spark could not fully parse
    * (delimited.py:237-296's bad-line recovery) and `encoding_error`
    * for rows with undecodable bytes (delimited.py:256-266: the
    * reference's decoder injects a DECODEERROR: marker; the JVM charset
    * decoder substitutes U+FFFD, so that replacement char is the
    * equivalent per-row signal — the mojibake'd value is kept, like the
    * reference keeps the marker-stripped text). */
  def read(spark: SparkSession, path: String, delimiter: String = ",",
      encoding: String = "UTF-8"): DataFrame = {
    val raw = spark.read
      .option("header", "true")
      .option("delimiter", normalizeDelimiter(delimiter))
      .option("encoding", encoding)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .csv(path)
    // canonicalize + uniquify; headers whose canonical name is None
    // ("row number", "Error", ...) are dropped like delimited.py:186-189
    val dataCols = raw.columns.filterNot(_ == "_corrupt")
      .filter(c => Fieldnames.canonical(c)._1.isDefined)
    val seen = scala.collection.mutable.Map.empty[String, Int]
    val renamed = dataCols.map { c =>
      val canon = Fieldnames.canonicalName(c)._1
      val n = seen.getOrElse(canon, 0)
      seen(canon) = n + 1
      if (n == 0) canon else s"${canon}_$n"
    }
    val strippedCols = dataCols.zip(renamed).map { case (c, name) =>
      // strip NULs (db_check.py:170-179)
      regexp_replace(col(c), "\u0000", "").as(name)
    }
    val parseFlag =
      if (raw.columns.contains("_corrupt"))
        when(col("_corrupt").isNotNull, array(lit("line_parse_error")))
          .otherwise(array().cast("array<string>"))
      else array().cast("array<string>")
    val encodeFlag = dataCols
      .map(c => coalesce(col(c).contains("\ufffd"), lit(false)))
      .reduceOption(_ || _).getOrElse(lit(false))
    val flagCol = concat(parseFlag,
      when(encodeFlag, array(lit("encoding_error")))
        .otherwise(array().cast("array<string>"))).as("flags")
    raw.select(strippedCols :+ flagCol: _*)
  }
}
