package graft.media

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MediaSpec extends SparkSpec {

  test("fetchBatch: schema, deterministic content etag, prefix partitioning") {
    val s = spark
    import s.implicits._
    val pending = Seq(
      "http://a.example/img/1.jpg", "http://a.example/img/2.jpg",
      "http://b.example/x.bin").toDF("url")
    val out = Media.fetchBatch(pending)
    assert(out.schema === Media.fetchResultSchema)
    val rows = out.orderBy("url").collect()
    assert(rows.length === 3)
    assert(rows.forall(_.getInt(1) === 200))
    assert(rows(0).getString(3) === "image/jpeg")
    assert(rows(2).getString(3) === "application/octet-stream")
    // deterministic: same url → same etag across runs
    val again = Media.fetchBatch(pending).orderBy("url").collect()
    assert(rows.map(_.getString(2)).toSeq === again.map(_.getString(2)).toSeq)
    // blob is real binary with the advertised hash
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(rows(0).getAs[Array[Byte]](4)).map(b => f"$b%02x").mkString
    assert(h === rows(0).getString(2))
  }

  test("urlPrefix groups by host") {
    val s = spark
    import s.implicits._
    val df = Seq("http://a.example/img/1.jpg", "https://b.example/y").toDF("url")
    val got = df.select(Media.urlPrefix(col("url"))).collect().map(_.getString(0))
    assert(got.toSeq === Seq("http://a.example", "https://b.example"))
  }

  test("derivatives: one row per (etag, kind) with width metadata") {
    val s = spark
    import s.implicits._
    val pending = Seq("http://a.example/img/1.jpg").toDF("url")
    val blobs = Media.fetchBatch(pending)
    val d = Media.derivatives(blobs)
    assert(d.schema === Media.derivativeSchema)
    val rows = d.orderBy("deriv").collect()
    assert(rows.map(r => (r.getString(1), r.getInt(2))).toSeq ===
      Seq(("thumbnail", 260), ("webview", 600)))
    assert(rows.forall(_.getAs[Array[Byte]](3).nonEmpty))
  }

  test("mediaView resolves the latest association per url (db.py:624-656)") {
    val s = spark
    import s.implicits._
    def ts(x: String) = java.sql.Timestamp.valueOf(x)
    val media = Seq(("u1", "images", null: String, "image/jpeg",
      null: java.sql.Timestamp, null: Integer)).toDF(
      "url", "type", "owner", "mime", "last_check", "last_status")
    val mo = Seq(
      ("u1", "e_old", ts("2024-01-01 00:00:00")),
      ("u1", "e_new", ts("2024-02-01 00:00:00")),
    ).toDF("url", "etag", "modified")
    val objects = Seq(
      ("e_old", "image/jpeg", false, "images"),
      ("e_new", "video/mp4", false, "video"),
    ).toDF("etag", "detected_mime", "derivatives", "bucket")
    val r = Media.mediaView(media, mo, objects).collect()(0)
    assert(r.getAs[String]("etag") === "e_new")
    assert(r.getAs[String]("bucket") === "video")
  }
}
