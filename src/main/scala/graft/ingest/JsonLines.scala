package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON-lines record interchange — the dump/restore format of the
  * reference's API layer (records ARE JSON documents; the api and the
  * test fixtures ship them as one-object-per-line .jsonl dumps under
  * tests/data): each line `{"id": ..., "data": {term: value}}`
  * becomes an (id, data map) row ready for the enrich pipeline, with
  * the same recovery discipline as [[Delimited.read]] — an
  * unparseable or shapeless line is FLAGGED and kept, never fatal to
  * the file.
  *
  * Scale shape: `spark.read.text` splits by line like any columnar
  * scan; `from_json` is a codegen expression, so parsing runs at scan
  * speed with no shuffle. Keys arrive canonical in this format (the
  * reference stores canonical dwc:/idigbio: terms in `data`), so no
  * header translation pass is needed. */
object JsonLines {

  val schema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("data", MapType(StringType, StringType))))

  def read(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.text(path)
      .select(col("value"), from_json(col("value"), schema).as("r"))
    raw.select(
      col("r.id").as("id"),
      col("r.data").as("data"),
      when(col("r").isNull || col("r.id").isNull || col("r.data").isNull,
        array(lit("json_parse_error")))
        .otherwise(array().cast("array<string>")).as("flags"),
      col("value").as("_raw"))
  }

  /** The dump twin: (id, data) rows → one JSON object per line. */
  def write(df: DataFrame, idCol: String, dataCol: String,
      path: String): Unit =
    df.select(to_json(struct(col(idCol).as("id"), col(dataCol).as("data")))
        .as("value"))
      .write.mode("overwrite").text(path)
}
