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
    * `line_parse_error` for rows the reference would SKIP
    * (LineLength/MissingFields recovery, delimited.py:237-296) and
    * `encoding_error` for rows with undecodable bytes
    * (delimited.py:256-266: the reference's decoder injects a
    * DECODEERROR: marker; the JVM charset decoder substitutes U+FFFD,
    * so that replacement char is the equivalent per-row signal — the
    * mojibake'd value is kept, like the reference keeps the
    * marker-stripped text).
    *
    * Value semantics replicate the reference's readline (:255-268,
    * audited by DelimitedDifferentialSpec over recorded DelimitedFile
    * runs): every field `.strip()`ed and empties dropped (surfaced
    * here as null — the DataFrame spelling of an absent dict key).
    * `quote` = python csv's `fieldenc` ("" = QUOTE_NONE: a quote char
    * is data); escape = the quote char gives RFC4180 doubled quotes,
    * python csv's doublequote=True. `multiLine` enables embedded
    * newlines inside quoted fields exactly as csv.reader always does —
    * off by default because a multiLine file cannot be SPLIT for
    * parallel scan (one task per file); turn it on only for archives
    * known to quote newlines. */
  def read(spark: SparkSession, path: String, delimiter: String = ",",
      encoding: String = "UTF-8", quote: String = "\"",
      multiLine: Boolean = false): DataFrame = {
    val delim = normalizeDelimiter(delimiter)
    // The header is parsed DRIVER-SIDE (one line of metadata, like
    // meta.xml) so the engine — not Spark's header inference — owns
    // column naming: Spark mangles duplicate headers by appending the
    // column index, which breaks the reference's duplicate-header
    // semantics (both columns feed one dict key, delimited.py:185),
    // and an inferred schema silently PASSES wrong-length rows, where
    // an explicit schema makes PERMISSIVE mode flag both short and
    // long rows in _corrupt — the reference SKIPS those rows
    // (delimited.py:247-253), so they must be flaggable.
    val headerTokens = parseHeaderLine(spark, path, delim, encoding, quote)
    val schema = org.apache.spark.sql.types.StructType(
      headerTokens.indices.map(i =>
        org.apache.spark.sql.types.StructField(
          s"_c$i", org.apache.spark.sql.types.StringType)) :+
        org.apache.spark.sql.types.StructField(
          "_corrupt", org.apache.spark.sql.types.StringType))
    val raw = spark.read
      .option("header", "true")      // skip line 1; names come from us
      .option("enforceSchema", "true")
      .option("delimiter", delim)
      .option("encoding", encoding)
      .option("quote", quote)   // "" maps to \u0000: quoting disabled
      .option("escape", if (quote.isEmpty) "\\" else quote)
      .option("multiLine", multiLine)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .schema(schema)
      .csv(path)
    // canonicalize by position + uniquify; headers whose canonical name
    // is None ("row number", "Error", ...) are dropped like
    // delimited.py:186-189. Duplicate canonical names get _N suffixes —
    // readline's dict collapses them last-non-empty-wins; callers fold
    // the _N columns the same way (DelimitedDifferentialSpec pins it).
    val canon = headerTokens.map(h => Fieldnames.canonical(h))
    val dataIdx = canon.indices.filter(i => canon(i)._1.isDefined)
    val seen = scala.collection.mutable.Map.empty[String, Int]
    val renamed = dataIdx.map { i =>
      val name = canon(i)._1.get
      val n = seen.getOrElse(name, 0)
      seen(name) = n + 1
      if (n == 0) name else s"${name}_$n"
    }
    val strippedCols = dataIdx.zip(renamed).map { case (i, name) =>
      // strip NULs (db_check.py:170-179), then the reference's
      // per-field .strip() with empties dropped (delimited.py:255-268;
      // null is the DataFrame spelling of an absent dict key). Regex
      // strip, not trim(): python strips every char where isspace()
      // holds -- exactly [\t\n\x0b\f\r\x1c-\x1f space \x85] plus the
      // Unicode Zs/Zl/Zp categories (NBSP, en/em spaces, ideographic
      // space), which Java \s (ASCII-only) misses. The class below is
      // bit-exact to python's isspace set (checked against CPython).
      val pyWs = "[\\s\\x1c-\\x1f\\x85\\p{Z}]"
      val trimmed = regexp_replace(
        regexp_replace(col(s"_c$i"), "\u0000", ""),
        "^" + pyWs + "+|" + pyWs + "+$", "")
      when(length(trimmed) === 0, lit(null)).otherwise(trimmed).as(name)
    }
    val parseFlag =
      when(col("_corrupt").isNotNull, array(lit("line_parse_error")))
        .otherwise(array().cast("array<string>"))
    val encodeFlag = dataIdx
      .map(i => coalesce(col(s"_c$i").contains("�"), lit(false)))
      .reduceOption(_ || _).getOrElse(lit(false))
    val flagCol = concat(parseFlag,
      when(encodeFlag, array(lit("encoding_error")))
        .otherwise(array().cast("array<string>"))).as("flags")
    raw.select(strippedCols :+ flagCol: _*)
  }

  /** Parse the file's first line with the same csv dialect the
    * distributed read uses (univocity — the parser inside Spark's CSV
    * source). Driver-side and O(one line); quoted headers containing
    * newlines are out of scope (none in the wild corpus). */
  private def parseHeaderLine(spark: SparkSession, path: String,
      delim: String, encoding: String, quote: String): IndexedSeq[String] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val target =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).map(_.getPath)
          .filter(q => !q.getName.startsWith("_") && !q.getName.startsWith("."))
          .minBy(_.getName)
      else p
    val in = fs.open(target)
    val line = try {
      val br = new java.io.BufferedReader(
        new java.io.InputStreamReader(in, encoding))
      Option(br.readLine()).getOrElse("")
    } finally in.close()
    val settings = new com.univocity.parsers.csv.CsvParserSettings()
    settings.getFormat.setDelimiter(delim.head)
    settings.getFormat.setQuote(if (quote.isEmpty) '\u0000' else quote.head)
    settings.getFormat.setQuoteEscape(if (quote.isEmpty) '\u0000' else quote.head)
    settings.setEmptyValue("")
    settings.setNullValue("")
    val parser = new com.univocity.parsers.csv.CsvParser(settings)
    Option(parser.parseLine(line)).getOrElse(Array.empty[String])
      .toIndexedSeq.map(v => Option(v).getOrElse(""))
  }
}
