package graft.streaming

import graft.SparkSpec
import graft.etl.Enrich
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The enrichment pipeline is a stateless projection chain, so it must
  * compose with Structured Streaming unchanged — including the custom
  * CodegenBarrier nodes inside it (a pass-through physical operator the
  * micro-batch planner has to accept). This is the "continuous ingest
  * enriches in-stream" guarantee a 100 TB deployment relies on. */
class StreamingEnrichSpec extends SparkSpec {

  test("Enrich.records runs inside a streaming micro-batch (barrier included)") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val mem = MemoryStream[(Long, Map[String, String])]
    val enriched = Enrich.records(mem.toDF().toDF("id", "data"))
    mem.addData(
      (1L, Map("dwc:genus" -> "Acer", "dwc:specificEpithet" -> "rubrum",
        "dwc:eventDate" -> "1/2/2014 3:15 PM",
        "dwc:decimalLatitude" -> "29.65", "dwc:decimalLongitude" -> "-82.32")),
      (2L, Map("dwc:scientificName" -> "Quercus alba")))
    val q = enriched.writeStream
      .format("memory").queryName("enrich_stream")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val rows = sp.table("enrich_stream").orderBy("id").collect()
    assert(rows.length === 2)
    val r1 = rows(0)
    assert(r1.getString(r1.fieldIndex("genus")) === "acer")
    assert(r1.getTimestamp(r1.fieldIndex("datecollected")).toString
      === "2014-01-02 15:15:00.0")
    assert(!r1.isNullAt(r1.fieldIndex("geopoint")))
    val r2 = rows(1)
    // crossfill runs in-stream too
    assert(r2.getString(r2.fieldIndex("genus")) === "quercus")
  }
}
