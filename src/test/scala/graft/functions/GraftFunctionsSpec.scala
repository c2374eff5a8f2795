package graft.functions

import graft.SparkSpec

/** The SQL surface of the native expressions must plan the exact same
  * Catalyst nodes the Column API uses. */
class GraftFunctionsSpec extends SparkSpec {

  test("registered SQL functions match the Column API results") {
    val s = spark
    import s.implicits._
    GraftFunctions.register(s)
    Seq(("a b c d e", Array(1.0f, 2.0f)), ("x y z w v", Array(0.5f, -1.0f)))
      .toDF("t", "v").createOrReplaceTempView("gf_docs")
    val sql = s.sql(
      """SELECT minhash_sig(split(t, ' '), 3) AS sig,
        |       simhash60(split(t, ' ')) AS sh,
        |       repetition_stats(split(t, ' ')).n_distinct AS nd,
        |       dot_product(v, v) AS dp
        |FROM gf_docs""".stripMargin).collect()
    val api = s.table("gf_docs").select(
        NativeText.minhashSig(org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.col("t"), " "), 3).as("sig"),
        NativeText.simhash60(org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.col("t"), " ")).as("sh"),
        NativeText.repetitionStats(org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.col("t"), " "))
          .getField("n_distinct").as("nd"),
        NativeMath.dotProduct(org.apache.spark.sql.functions.col("v"),
          org.apache.spark.sql.functions.col("v")).as("dp"))
      .collect()
    assert(sql.map(_.toString).toSeq === api.map(_.toString).toSeq)
  }

  test("minhash_sig defaults the shingle size and rejects non-literal n") {
    val s = spark
    GraftFunctions.register(s)
    val r = s.sql("SELECT size(minhash_sig(split('a b c', ' '))) AS n")
      .collect()(0).getInt(0)
    assert(r === MinhashKernel.NumHashes)
  }

  test("shingle_hashes / sci_parse / date_shape answer from SQL") {
    val s = spark
    GraftFunctions.register(s)
    val r = s.sql(
      """SELECT size(shingle_hashes(split('a b c d', ' '), 3)) AS ns,
        |       sci_parse('acer rubrum').genus AS g,
        |       date_shape('5-MAR-2001') AS sh""".stripMargin).collect()(0)
    assert(r.getInt(0) === 2)
    assert(r.getString(1) === "acer")
    assert(r.getInt(2) === 7)
  }
}
