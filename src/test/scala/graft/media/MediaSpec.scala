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

  test("aHash: perturbed re-encode stays within a few bits, different " +
      "images differ widely; near-dup pairs found via banding") {
    val s = spark
    import s.implicits._
    val b7 = Media.synthImageBlocksJpeg(7L)
    val base = Media.aHash64(b7)
    val noisy = Media.aHash64(Media.addNoiseDots(b7, 7L, dots = 6))
    val other = Media.aHash64(Media.synthImageBlocksJpeg(8L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(base, noisy) <= 3, s"perturbation moved ${ham(base, noisy)} bits")
    assert(ham(base, other) > 10, s"distinct seeds only ${ham(base, other)} bits apart")

    val blobs = ((1 to 12).map(i =>
        (f"img$i%03d", Media.synthImageBlocksJpeg(i.toLong))) ++
      Seq(("img001n", Media.addNoiseDots(Media.synthImageBlocksJpeg(1L), 1L, 5)),
          ("img007n", Media.addNoiseDots(Media.synthImageBlocksJpeg(7L), 7L, 6))))
      .toDF("id", "content")
    val pairs = Media.imageNearDups(blobs, "id", "content", maxHamming = 3)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs.contains(("img001", "img001n")))
    assert(pairs.contains(("img007", "img007n")))
    // no cross-seed pair may appear
    assert(pairs.forall { case (a, b) => a.take(6) === b.take(6) }, pairs)
  }

  test("filterBlacklist: broadcast anti-join drops listed etags, no fact shuffle") {
    val s = spark
    import s.implicits._
    val blobs = Seq("e1" -> "a", "e2" -> "b", "e3" -> "c").toDF("etag", "x")
    val bl = Seq("e2", "e999").toDF("etag")
    val kept = Media.filterBlacklist(blobs, bl)
    assert(kept.collect().map(_.getString(0)).sorted.toSeq === Seq("e1", "e3"))
    val plan = kept.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"), plan)
    assert(!plan.contains("Exchange hashpartitioning"), plan)
  }

  /** In-memory JPEG fixture: a w×h gradient encoded through the JDK
    * writer (the reference ships a test JPEG; this container builds an
    * equivalent deterministically). */
  private def jpegBytes(w: Int, h: Int): Array[Byte] = {
    import java.awt.image.BufferedImage
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h)
      img.setRGB(x, y, ((x * 255 / w) << 16) | ((y * 255 / h) << 8) | 0x40)
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpeg", buf)
    buf.toByteArray
  }

  test("imageResize: real JPEG downscales to target width, bilinear, aspect kept") {
    val src = jpegBytes(1000, 500)
    val thumb = Media.imageResize(src, 260)
    val web = Media.imageResize(src, 600)
    assert(Media.imageDims(thumb).contains((260, 130)))
    assert(Media.imageDims(web).contains((600, 300)))
    // truncating height like the reference's int(): 500 * 260/1000 = 130
  }

  test("imageResize: no upscale below target width, still JPEG-encoded") {
    val src = jpegBytes(100, 80)
    val out = Media.imageResize(src, 260)
    assert(Media.imageDims(out).contains((100, 80)))
    // JPEG SOI marker
    assert((out(0) & 0xff) == 0xff && (out(1) & 0xff) == 0xd8)
  }

  test("imageResize: undecodable bytes raise BadImageException") {
    intercept[Media.BadImageException] {
      Media.imageResize(Array.tabulate[Byte](64)(_.toByte), 260)
    }
  }

  test("derivative pipeline end-to-end with the REAL kernel over binaryFile") {
    val s = spark
    import s.implicits._
    // write a fixture image, ingest via the binaryFile source — the
    // multimodal-column path: opaque binary + typed metadata
    val dir = java.nio.file.Files.createTempDirectory("graft_media").toFile
    val f = new java.io.File(dir, "fixture.jpg")
    val fos = new java.io.FileOutputStream(f)
    fos.write(jpegBytes(900, 600)); fos.close()
    val bin = spark.read.format("binaryFile").load(f.getAbsolutePath)
      .select(col("path"), col("content"))
    val blobs = bin.select(
      md5(col("content")).as("etag"), col("content"))
    val d = Media.derivatives(blobs, Media.imageResize)
    val rows = d.orderBy("deriv").collect()
    assert(rows.length == 2)
    val dims = rows.map(r => Media.imageDims(r.getAs[Array[Byte]](3)).get).toSeq
    assert(dims == Seq((260, 173), (600, 400)))  // 600*260/900=173.33→173
    // derivative blobs are genuine JPEGs, not hashes
    assert(rows.forall(_.getAs[Array[Byte]](3).length > 1000))
  }

  /** PCM-16 mono WAV fixture: `seconds` of audio at 8 kHz where the
    * first half is silence and the second half a full-scale square
    * wave — extreme RMS contrast for peak assertions. */
  private def wavBytes(): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val rate = 8000
    val n = rate // 1 second
    val pcm = new Array[Byte](n * 2)
    for (i <- n / 2 until n) {
      val v: Short = if ((i / 8) % 2 == 0) 20000 else -20000
      pcm(i * 2) = (v & 0xff).toByte
      pcm(i * 2 + 1) = ((v >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(rate.toFloat, 16, 1, true, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val buf = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, buf)
    buf.toByteArray
  }

  private def synthWav(seed: Long, gain: Double = 1.0,
      flipSegs: Int = 0): Array[Byte] =
    Media.synthWav(seed, gain, flipSegs)

  test("audio fingerprint: gain-invariant, small edits stay near, " +
      "different audio far; near-dups found via banding") {
    val s = spark
    import s.implicits._
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val base = Media.audioFingerprint64(synthWav(3L))
    assert(ham(base, Media.audioFingerprint64(synthWav(3L, gain = 0.4))) === 0,
      "max-normalized bars make gain changes a no-op")
    val edited = Media.audioFingerprint64(synthWav(3L, flipSegs = 2))
    assert(ham(base, edited) <= 3, s"2-segment edit moved ${ham(base, edited)} bits")
    val other = Media.audioFingerprint64(synthWav(4L))
    assert(ham(base, other) > 10, s"distinct seeds ${ham(base, other)} bits apart")

    val blobs = ((1 to 8).map(i => (f"au$i%03d", synthWav(i.toLong))) ++
      Seq(("au003g", synthWav(3L, gain = 0.5)),
          ("au005e", synthWav(5L, flipSegs = 2))))
      .toDF("id", "content")
    val pairs = Media.audioNearDups(blobs, "id", "content", maxHamming = 3)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs.contains(("au003", "au003g")))
    assert(pairs.contains(("au005", "au005e")))
    assert(pairs.forall { case (a, b) => a.take(5) === b.take(5) }, pairs)
  }

  test("video near-dups: perturbed re-encode pairs on most frames, " +
      "different videos never pair") {
    val s = spark
    import s.implicits._
    def vid(seed: Long, noisy: Boolean): Array[Byte] = {
      val frames = (0 until 4).map { f =>
        val base = Media.synthImageBlocksJpeg(seed * 100 + f, 64, 48)
        if (noisy) Media.addNoiseDots(base, seed * 100 + f, 120) else base
      }
      Media.mjpegAviFromJpegs(frames, 64, 48)
    }
    val blobs = ((1 to 6).map(i => (f"v$i%03d", vid(i.toLong, noisy = false))) ++
      Seq(("v002n", vid(2L, noisy = true)),
          ("v004n", vid(4L, noisy = true))))
      .toDF("id", "content")
    val pairs = Media.videoNearDups(blobs, "id", "content",
        nFrames = 4, maxHamming = 3, minClose = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(pairs.map(p => (p._1, p._2)).toSet ===
      Set(("v002", "v002n"), ("v004", "v004n")), pairs.toSeq)
    assert(pairs.forall(_._3 >= 3), pairs.toSeq)
  }

  test("waveformPeaks: real WAV decode, silent half ~0, loud half at ceiling") {
    val peaks = Media.waveformPeaks(wavBytes())
    assert(peaks.length == 107)
    // first ~half silent, second ~half loud; allow the boundary bar slack
    assert(peaks.take(50).forall(_ == 0), "silent chunks must be 0")
    assert(peaks.drop(55).count(_ == 60) > 40, "loud chunks at the 60 ceiling")
    assert(peaks.max == 60)
  }

  test("waveformImage renders the 840x150 bar canvas from audio bytes") {
    val img = Media.waveformImage(wavBytes())
    assert(Media.imageDims(img).contains((840, 150)))
  }

  test("sampleFrames: one row per (etag, frame_idx), deterministic stub kernel") {
    val s = spark
    import s.implicits._
    val blobs = Media.fetchBatch(Seq("http://a.example/v.mp4").toDF("url"))
    val frames = Media.sampleFrames(blobs, n = 4)
    assert(frames.schema === Media.frameSchema)
    val rows = frames.orderBy("frame_idx").collect()
    assert(rows.map(_.getInt(1)).toSeq === Seq(0, 1, 2, 3))
    assert(rows.forall(_.getAs[Array[Byte]](2).length == 64))
    // deterministic across runs, distinct across frames
    val again = Media.sampleFrames(blobs, n = 4).orderBy("frame_idx").collect()
    assert(rows.map(_.getAs[Array[Byte]](2).toSeq) ===
      again.map(_.getAs[Array[Byte]](2).toSeq))
    assert(rows.map(_.getAs[Array[Byte]](2).toSeq).distinct.length == 4)
  }

  test("httpFetcher: REAL network kernel against an in-process server") {
    val s = spark
    import s.implicits._
    val served = Media.synthImageJpeg(42)
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    try {
      server.createContext("/img.jpg", (x: com.sun.net.httpserver.HttpExchange) => {
        x.getResponseHeaders.set("Content-Type", "image/jpeg")
        x.sendResponseHeaders(200, served.length)
        x.getResponseBody.write(served); x.close()
      })
      server.createContext("/gone", (x: com.sun.net.httpserver.HttpExchange) => {
        x.sendResponseHeaders(404, -1); x.close()
      })
      server.start()
      val port = server.getAddress.getPort
      val pending = Seq(
        s"http://127.0.0.1:$port/img.jpg",
        s"http://127.0.0.1:$port/gone",
        // unroutable per RFC 5737 TEST-NET — the connection-failure path
        "http://192.0.2.1:81/x").toDF("url")
      val got = Media.fetchBatch(pending, Media.httpFetcher)
        .collect().map(r => r.getString(0) ->
          (r.getInt(1), r.getAs[Array[Byte]](4), r.getString(3))).toMap
      val ok = got(s"http://127.0.0.1:$port/img.jpg")
      assert(ok._1 === 200 && ok._2.sameElements(served) && ok._3 === "image/jpeg")
      assert(got(s"http://127.0.0.1:$port/gone")._1 === 404)
      assert(got("http://192.0.2.1:81/x")._1 === 0, "connection failure records status 0")
      // fetched blob flows straight into the real derivative kernel
      val resized = Media.imageResize(ok._2, 260)
      assert(Media.imageDims(resized).exists(_._1 === 260))
    } finally server.stop(0)
  }

  test("mjpeg: synthesized AVI round-trips through the REAL frame kernel") {
    val clip = Media.synthMjpegAvi(7, nFrames = 10)
    val all = Media.mjpegAviFrames(clip)
    assert(all.size === 10)
    all.foreach { f =>
      assert(Media.imageDims(f) === Some((64, 48)), "every frame is a decodable JPEG")
    }
    val sampled = Media.mjpegFrameDecoder(clip, 3)
    assert(sampled.size === 3)
    assert(sampled.head.sameElements(all.head) && sampled.last.sameElements(all.last),
      "even sampling keeps the endpoints")
    intercept[Media.BadImageException](Media.mjpegAviFrames("nope".getBytes))
    intercept[Media.BadImageException](
      Media.mjpegAviFrames(clip.take(40))) // truncated chunk
  }

  test("sampleFrames drives the REAL mjpeg kernel over table rows") {
    val s = spark
    import s.implicits._
    val blobs = Seq(
      ("e1", Media.synthMjpegAvi(1, nFrames = 8)),
      ("e2", Media.synthMjpegAvi(2, nFrames = 5))).toDF("etag", "content")
    val frames = Media.sampleFrames(blobs, 3, Media.mjpegFrameDecoder)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getAs[Array[Byte]](2)))
    assert(frames.count(_._1 == "e1") === 3)
    assert(frames.count(_._1 == "e2") === 3)
    frames.foreach { case (_, _, f) =>
      assert(Media.imageDims(f) === Some((64, 48)))
    }
  }

  test("waveform: undecodable audio raises like the reference's error path") {
    intercept[Media.BadImageException] {
      Media.waveformPeaks(Array.tabulate[Byte](100)(_.toByte))
    }
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

  test("fetchDecisions: the get_items conjunction (fetcher.py:203-233) — " +
      "every skip reason, the stale-failure re-fetch, the prefixless " +
      "queue, per-prefix fetch_seq over selected rows only, and the " +
      "post-fetch status MERGE") {
    val s = spark
    import s.implicits._
    def ts(d: String) = java.sql.Timestamp.valueOf(d + " 00:00:00")
    val now = ts("2024-02-20")
    val media = Seq(
      // (url, type, last_status, last_check, outcome)
      ("http://a.example/1", Some("images"), None, Some(ts("2024-01-01")), 200),
      ("http://a.example/2", Some("images"), Some(404), Some(ts("2024-01-05")), 500),
      ("http://a.example/3", Some("images"), Some(404), Some(ts("2024-02-19")), 200),
      ("http://a.example/4", Some("images"), Some(200), Some(ts("2024-01-01")), 200),
      // never fetched + RECENT last_check: NULL status selects
      // unconditionally (the reference's OR short-circuits before the
      // staleness conjunct)
      ("http://a.example/5", Some("images"), None, Some(ts("2024-02-19")), 200),
      // failed status but NO check stamp: the three-valued
      // `last_check < cutoff` is NULL → excluded, like the reference SQL
      ("http://a.example/6", Some("images"), Some(500), None, 200),
      ("http://b.example/1", None, None, Some(ts("2024-01-01")), 200),
      ("http://media.idigbio.org/z", Some("images"), None, Some(ts("2024-01-01")), 200),
      ("weird-no-prefix", Some("images"), None, Some(ts("2024-01-01")), 404))
      .map { case (u, t, st, lc, o) =>
        (u, t, st: Option[Int], lc: Option[java.sql.Timestamp], o) }
      .toDF("url", "type", "last_status", "last_check", "outcome")
    val got = Media.fetchDecisions(media, lit(now), col("outcome"))
      .orderBy("url").collect()
      .map(r => (r.getString(0), Option(r.getString(1)),
        r.getString(2), r.getString(3),
        Option(r.get(5)).map(_.asInstanceOf[Int]),
        r.getBoolean(6),
        Option(r.get(7)).map(_.asInstanceOf[Int])))
    assert(got.toSeq === Seq(
      // never fetched → fetch, queue position 1 of prefix a.example
      ("http://a.example/1", Some("http://a.example/"), "fetch",
        "selected", Some(200), true, Some(1)),
      // stale 404 (checked Jan 5 < Jan 20 cutoff) → re-fetch, seq 2
      ("http://a.example/2", Some("http://a.example/"), "fetch",
        "selected", Some(500), true, Some(2)),
      // fresh 404 → wait out the month; status keeps
      ("http://a.example/3", Some("http://a.example/"), "skip",
        "recent_failure", Some(404), false, None),
      // 200 never re-fetches regardless of age
      ("http://a.example/4", Some("http://a.example/"), "skip",
        "ok_status", Some(200), false, None),
      // never fetched with a FRESH check stamp still fetches, seq 3
      ("http://a.example/5", Some("http://a.example/"), "fetch",
        "selected", Some(200), true, Some(3)),
      // failed but never check-stamped: excluded (three-valued <)
      ("http://a.example/6", Some("http://a.example/"), "skip",
        "recent_failure", Some(500), false, None),
      // type null is excluded before anything else
      ("http://b.example/1", Some("http://b.example/"), "skip",
        "no_type", None, false, None),
      // hardcoded ignore prefix
      ("http://media.idigbio.org/z", Some("http://media.idigbio.org/"),
        "skip", "ignored_prefix", None, false, None),
      // PREFIX_RE no-match → NULL-prefix queue, still fetched
      ("weird-no-prefix", None, "fetch", "selected", Some(404), true,
        Some(1))))
  }
}
