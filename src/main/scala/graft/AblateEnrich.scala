package graft

import graft.etl.Enrich
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Perf ablation for the enrich pipeline: times each cumulative slice
  * of q_enrich (read+synth → stage groups → full query) with noop
  * writes so the expensive expression family can be located instead of
  * guessed. Usage: runMain graft.AblateEnrich [sfDir] */
object AblateEnrich {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(label: String)(df: DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[ablate] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    val o = Tables.orders(spark, sfDir)
    val latStr = concat(
      (col("o_orderkey") % 170 - 85).cast("string"), lit("."),
      lpad((col("o_orderkey") % 1000).cast("string"), 3, "0"))
    val lonStr = concat(
      (col("o_orderkey") % 340 - 170).cast("string"), lit("."),
      lpad((col("o_custkey") % 1000).cast("string"), 3, "0"))
    val elevStr = concat((col("o_orderkey") % 5000).cast("string"), lit(".5 m"))
    val countStr = concat((col("o_custkey") % 9 + 1).cast("string"), lit(","),
      lpad((col("o_orderkey") % 1000).cast("string"), 3, "0"))
    val sciname = concat(lit("Genus"), (col("o_custkey") % 50).cast("string"),
      lit(" epithet"), (col("o_orderkey") % 100).cast("string"))
    val borStr = when(col("o_orderpriority") === "1-URGENT", "Preserved Specimen")
      .when(col("o_orderpriority") === "2-HIGH", "Fossil bones")
      .when(col("o_orderpriority") === "3-MEDIUM", "machine observation")
      .when(col("o_orderpriority") === "4-NOT SPECIFIED", "mystery meat")
      .otherwise("unknown sheet")
    val raw = o.select(
      col("o_orderkey").as("id"),
      map(
        lit("dwc:scientificName"), sciname,
        lit("dwc:eventDate"), col("o_orderdate").cast("string"),
        lit("dwc:decimalLatitude"), latStr,
        lit("dwc:decimalLongitude"), lonStr,
        lit("dwc:minimumElevationInMeters"), elevStr,
        lit("dwc:individualCount"), countStr,
        lit("dwc:basisOfRecord"), borStr,
      ).as("data"))

    time("0 read+synth map")(raw)
    time("1 + full Enrich.records")(Enrich.records(raw))
    time("2 + final select")(graft.queries.EtlQueries.qEnrich(spark, sfDir))

    // stage-by-stage: replicate Enrich.records' internal staging by
    // timing increasing column subsets of its output
    val enriched = Enrich.records(raw)
    time("3 enrich, numerics only")(enriched.select("id", "individualcount",
      "coordinateuncertainty", "minelevation", "maxelevation", "mindepth",
      "maxdepth"))
    time("4 enrich, dates only")(enriched.select("id", "datecollected",
      "startdayofyear", "eventdate"))
    time("5 enrich, geo only")(enriched.select("id", "geopoint"))
    time("6 enrich, names only")(enriched.select("id", "scientificname",
      "genus", "specificepithet", "taxonrank", "basisofrecord"))
    time("7 enrich, flags+dqs only")(enriched.select("id", "flags", "dqs"))
    spark.stop()
  }
}
