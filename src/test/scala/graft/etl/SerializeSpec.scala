package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SerializeSpec extends SparkSpec {

  test("prepForEs: timestamps become ISO strings (indexer.py:50-89)") {
    val s = spark
    import s.implicits._
    val df = Seq((1, java.sql.Timestamp.valueOf("2014-01-10 08:30:00")))
      .toDF("id", "datemodified")
    val out = Serialize.prepForEs(df).collect()(0)
    assert(out.getString(1) === "2014-01-10T08:30:00Z")
  }

  test("geoshapeFromWkt parses POLYGON rings (conversions.py:771-790)") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1, "POLYGON((10 20, 30 40, 50 60))"),
      (2, "10,20,30,40"),          // bare list → pairs
      (3, "not wkt at all"),       // invalid
      (4, "10,20,30"),             // odd count → invalid
    ).toDF("id", "wkt")
    val (shape, invalid) = Serialize.geoshapeFromWkt(col("wkt"))
    val rows = df.select(col("id"), shape.as("s"), invalid.as("inv"))
      .orderBy("id").collect()
    val s1 = rows(0).getStruct(1)
    assert(s1.getString(0) === "polygon")
    val coords = s1.getSeq[org.apache.spark.sql.Row](1)
    assert(coords.head.getDouble(0) === 10.0 && coords.head.getDouble(1) === 20.0)
    assert(!rows(0).getBoolean(2))
    val s2 = rows(1).getStruct(1)
    assert(s2.getSeq[org.apache.spark.sql.Row](1).size === 2)
    assert(rows(2).isNullAt(1) && rows(2).getBoolean(2))
    assert(rows(3).isNullAt(1) && rows(3).getBoolean(2))
  }

  test("geoshapeFromPointRadius builds circles (conversions.py:793-801)") {
    val s = spark
    import s.implicits._
    val df = Seq((1, Some(10.0), Some(20.0), Some(500.0)),
      (2, Option.empty[Double], Option.empty[Double], Some(1.0)))
      .toDF("id", "lon", "lat", "unc")
      .withColumn("geopoint", when(col("lon").isNotNull,
        struct(col("lon"), col("lat"))))
    val out = df.select(col("id"),
      Serialize.geoshapeFromPointRadius(col("geopoint"), col("unc")).as("c"))
      .orderBy("id").collect()
    assert(out(0).getStruct(1).getString(0) === "circle")
    assert(out(0).getStruct(1).getString(2) === "500.0")
    assert(out(1).isNullAt(1))
  }
}
