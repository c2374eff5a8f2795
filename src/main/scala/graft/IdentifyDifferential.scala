package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Differential audit of the identifier-extraction cascade against the
  * reference's identifyRecord (db_check.py:152-165) — replays
  * tools/gen_identify_differential.py vectors through
  * [[graft.ingest.Identify.candidates]]. Compares the full ordered
  * (field, id) candidate list per record. */
object IdentifyDifferential {
  val vectorSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("type", StringType),
    StructField("rsid", StringType),
    StructField("data", MapType(StringType, StringType)),
    StructField("exp", ArrayType(ArrayType(StringType)))))

  def main(args: Array[String]): Unit = {
    val path = if (args.length > 0) args(0) else "/tmp/identdiff/vectors.jsonl"
    val spark: SparkSession = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val vecs = spark.read.schema(vectorSchema).json(path)
    val types = vecs.select(col("type")).distinct()
      .collect().map(_.getString(0))
    var total = 0L
    var bad = 0L
    types.foreach { t =>
      val got = vecs.filter(col("type") === t)
        .select(col("id"), col("exp"),
          transform(
            graft.ingest.Identify.candidates(col("data"), t, col("rsid")),
            s => array(s.getField("field"), s.getField("id"))).as("got"))
      val rows = got.collect()
      total += rows.length
      rows.foreach { r =>
        val exp = r.getSeq[scala.collection.Seq[String]](1).map(_.toList).toList
        val g = r.getSeq[scala.collection.Seq[String]](2).map(_.toList).toList
        if (exp != g) {
          bad += 1
          if (bad <= 20)
            println(s"[diff] id=${r.getLong(0)} type=$t ref=$exp engine=$g")
        }
      }
    }
    println(s"[identdiff] ${total - bad}/$total agree ($bad mismatches)")
    spark.stop()
  }
}
