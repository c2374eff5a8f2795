package graft.media

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Media / multimodal-column layer (SURVEY §2.1 media rows, db.py
  * :804-827, idigbio_ingestion/mediaing/): media URLs, fetched blobs as
  * `binary` columns with typed metadata, and derivative generation.
  *
  * The container has no imaging or HTTP libraries, so the FETCH and
  * DECODE kernels are injectable functions with deterministic fakes —
  * the Spark-side plumbing (schemas, prefix partitioning, mapPartitions
  * batch shape, status-table MERGE inputs) is real and tested, and a
  * production deployment swaps the kernel only.
  */
object Media {

  /** media / objects / media_objects table schemas (db.py:804-827). */
  val mediaSchema: StructType = StructType(Seq(
    StructField("url", StringType), StructField("type", StringType),
    StructField("owner", StringType), StructField("mime", StringType),
    StructField("last_check", TimestampType),
    StructField("last_status", IntegerType)))

  val objectsSchema: StructType = StructType(Seq(
    StructField("etag", StringType), StructField("detected_mime", StringType),
    StructField("derivatives", BooleanType), StructField("bucket", StringType)))

  val mediaObjectsSchema: StructType = StructType(Seq(
    StructField("url", StringType), StructField("etag", StringType),
    StructField("modified", TimestampType)))

  /** DISTINCT ON (url) … ORDER BY modified DESC (db.py:624-656): latest
    * object association per url — `max_by` aggregation + joins, the
    * same single-pass shape as the store's latest-version view. */
  def mediaView(media: DataFrame, mediaObjects: DataFrame,
      objects: DataFrame): DataFrame = {
    val latestAssoc = mediaObjects
      .groupBy(col("url"))
      .agg(max(struct(col("modified"), col("etag"))).as("top"))
      .select(col("url"), col("top.etag").as("etag"),
        col("top.modified").as("assoc_modified"))
    media
      .join(latestAssoc, Seq("url"), "left")
      .join(objects, Seq("etag"), "left")
  }

  /** URL prefix for per-host fetch grouping (fetcher.py:183-201 groups
    * by prefix so one slow host never starves the rest). */
  def urlPrefix(url: Column): Column =
    regexp_extract(url, "^(https?://[^/]+)", 1)

  /** The reference's hardcoded never-fetch URL prefixes
    * (idigbio_ingestion/mediaing/__init__.py:5-13). */
  val IgnorePrefixes: Seq[String] = Seq(
    "http://media.idigbio.org/",
    "http://api.idigbio.org/v1/recordsets/",
    "https://api.idigbio.org/v2/media/",
    "http://api.idigbio.org/v2/media/",
    "http://www.tropicos.org/",
    "http://n2t.net/ark:/65665/",
    "http://arctos.database.museum/")

  /** The media FETCH DECISION TABLE (fetcher.py:116-151 acquisition
    * side — q_media_api covers serving): which media rows need a
    * fetch, how they group into per-prefix work queues, and the
    * post-fetch status MERGE.
    *
    * Selection (get_items, fetcher.py:203-233): `type IS NOT NULL AND
    * (last_status IS NULL OR (last_status >= 400 AND last_check <
    * now − LAST_CHECK_INTERVAL))`, minus the hardcoded
    * [[IgnorePrefixes]] (`url NOT LIKE p || '%'`), ordered by url.
    * `reason` reports the FIRST failing conjunct in that order
    * (no_type / ignored_prefix / ok_status / recent_failure), or
    * `selected`; a NULL last_status selects unconditionally, and a
    * failed status with a NULL last_check is excluded (the reference
    * predicate's three-valued `last_check < now − interval`).
    * Grouping (PREFIX_RE + group_by_prefix,
    * fetcher.py:113,234-242): the work key is the
    * `^https?://[^/]*[/?]` match (NULL when the url has no such
    * prefix — those still fetch, in the prefixless queue), and
    * `fetch_seq` is the row's position in its queue (the reference
    * sorts by url, so per-prefix groups are the contiguous runs of
    * that sort). DELIBERATE SIMPLIFICATION for the prefixless rows:
    * itertools.groupby emits each CONTIGUOUS run of None-prefix urls
    * as its own group, and start_all_procs keys procs by prefix so
    * every None run after the first is dropped on the floor
    * (fetcher.py:243-257) — an accident of dict-keying, not a
    * semantic. Here all prefixless rows number as ONE merged
    * NULL-prefix queue in url order; the oracle replays the same
    * merged queue, so the gate is internally consistent while
    * differing from the reference's first-run-only processing. The MERGE (update_db_status, fetcher.py:258-273):
    * fetched rows take `outcome` as new_status and a refreshed
    * last_check (`check_updated`); skipped rows keep last_status.
    *
    * `media`: (url, type, last_status, last_check); `now` a fixed
    * instant (the gate pins it so both engines replay the same
    * interval arithmetic); `outcome` the per-row fetch result column
    * (production: the real fetcher's status; the gate injects a
    * deterministic fake). One scan + one per-prefix window over the
    * selected subset — no joins, no global window. */
  def fetchDecisions(media: DataFrame, now: Column, outcome: Column,
      ignorePrefixes: Seq[String] = IgnorePrefixes,
      lastCheckMonths: Int = 1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cutoff = now - expr(s"INTERVAL $lastCheckMonths MONTHS")
    val ignored = ignorePrefixes.map(p => col("url").startsWith(p))
      .reduceOption(_ || _).getOrElse(lit(false))
    val pfx = regexp_extract(col("url"), "^https?://[^/]*[/?]", 0)
    // the selection disjunction verbatim (get_items, fetcher.py:212-214):
    // NULL last_status selects UNCONDITIONALLY (never-fetched rows fetch
    // regardless of last_check), and the stale-failure arm requires a
    // NON-NULL last_check < cutoff — SQL three-valued logic excludes a
    // failed row that was never check-stamped, so the chain must too
    val reason = when(col("type").isNull, "no_type")
      .when(ignored, "ignored_prefix")
      .when(col("last_status").isNull, "selected")
      .when(col("last_status") < 400, "ok_status")
      .when(col("last_check").isNotNull && col("last_check") < cutoff,
        "selected")
      .otherwise("recent_failure")
    val base = media.select(col("url"),
      when(length(pfx) > 0, pfx).as("prefix"),
      reason.as("reason"), col("last_status"), outcome.as("_out"))
    // the per-queue position counts SELECTED rows only (a skip must
    // not occupy a slot): a running conditional count over ONE window
    // — a filter + row_number + union would scan the input twice
    val seqW = Window.partitionBy(col("prefix")).orderBy(col("url"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base
      .withColumn("fetch_seq",
        when(col("reason") === "selected",
          sum(when(col("reason") === "selected", 1)).over(seqW)
            .cast("int")))
      .select(col("url"), col("prefix"),
        when(col("reason") === "selected", "fetch").otherwise("skip")
          .as("decision"),
        col("reason"),
        col("last_status"),
        when(col("reason") === "selected", col("_out"))
          .otherwise(col("last_status")).as("new_status"),
        (col("reason") === "selected").as("check_updated"),
        col("fetch_seq"))
  }

  /** The fetched-blob row produced by [[fetchBatch]]. */
  val fetchResultSchema: StructType = StructType(Seq(
    StructField("url", StringType),
    StructField("status", IntegerType),
    StructField("etag", StringType),          // md5 of the blob, like calcFileHash
    StructField("detected_mime", StringType),
    StructField("content", BinaryType)))

  /** Fetch pending media: repartition by host prefix (each partition =
    * one host's queue, executed by one task — the reference's
    * per-prefix subprocess, without the subprocesses), then
    * mapPartitions over the injectable fetch kernel.
    *
    * The default kernel is a deterministic fake: content bytes derived
    * from the url's md5, status 200. */
  def fetchBatch(pending: DataFrame,
      fetcher: String => (Int, Array[Byte], String) = fakeFetcher)
      : DataFrame = {
    val spark = pending.sparkSession
    val urlIdx = pending.schema.fieldIndex("url")
    val rows = pending
      .repartition(urlPrefix(col("url")))
      .rdd.mapPartitions { it =>
        it.map { r =>
          val url = r.getString(urlIdx)
          val (status, bytes, mime) = fetcher(url)
          val md = java.security.MessageDigest.getInstance("MD5")
          val etag = md.digest(bytes).map(b => f"$b%02x").mkString
          Row(url, status, etag, mime, bytes)
        }
      }
    spark.createDataFrame(rows, fetchResultSchema)
  }

  /** Deterministic fake fetch kernel (offline default — the container
    * has no egress; [[httpFetcher]] is the real one). */
  def fakeFetcher(url: String): (Int, Array[Byte], String) = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val seed = md.digest(url.getBytes("UTF-8"))
    // 1 KiB of deterministic bytes
    val content = Array.tabulate[Byte](1024)(i => (seed(i % 16) + i).toByte)
    val mime = if (url.endsWith(".jpg")) "image/jpeg" else "application/octet-stream"
    (200, content, mime)
  }

  /** REAL HTTP fetch kernel — the production counterpart of
    * [[fakeFetcher]], reproducing the reference's GET semantics
    * (fetcher.py:213-245: status recorded as-is, body hashed, declared
    * content-type kept; a connection-level failure records status 0
    * the way its requests-exception path records a non-HTTP error).
    * Pure JDK (`HttpURLConnection` built per call, so the kernel
    * closure stays serializable for executors). Exercised in MediaSpec
    * against an in-process loopback server — this container has no
    * egress, but the kernel is the real network path. */
  def httpFetcher(url: String): (Int, Array[Byte], String) =
    try {
      val conn = new java.net.URI(url).toURL.openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      conn.setConnectTimeout(10000)
      conn.setReadTimeout(30000)
      conn.setRequestProperty("User-Agent", "graft-media-fetcher/1.0")
      val status = conn.getResponseCode
      val mime = Option(conn.getContentType).getOrElse("application/octet-stream")
      val is = if (status >= 400) conn.getErrorStream else conn.getInputStream
      val bytes =
        if (is == null) Array.emptyByteArray
        else try is.readAllBytes() finally is.close()
      (status, bytes, mime)
    } catch {
      // any per-URL failure — connection error, malformed URL
      // (URISyntaxException/IllegalArgumentException from toURL), bad
      // header — records status 0 and lets the batch continue, like the
      // reference's InvalidURL→UNREQUESTABLE / generic→UNHANDLED_FAILURE
      // per-row paths (fetcher.py:239-245); one scraped junk URL must
      // never fail the whole fetch stage
      case scala.util.control.NonFatal(_) => (0, Array.emptyByteArray, "")
    }

  /** Derivative widths (derivatives.py:24-27). */
  val Widths: Map[String, Int] = Map("thumbnail" -> 260, "webview" -> 600)

  /** One derivative row per (etag, kind). */
  val derivativeSchema: StructType = StructType(Seq(
    StructField("etag", StringType),
    StructField("deriv", StringType),
    StructField("width", IntegerType),
    StructField("content", BinaryType)))

  /** Derivatives blacklist gate (blacklists/derivatives.py: a ~1,200-
    * etag `NOT IN` tuple of known-broken media, applied so they stop
    * retrying every derivative run). As a dataset op the list is a
    * broadcast anti-join on etag — the set stays a table (updatable,
    * auditable) instead of a literal baked into every query, and the
    * fact side never shuffles. */
  def filterBlacklist(blobs: DataFrame, blacklist: DataFrame): DataFrame =
    blobs.join(
      org.apache.spark.sql.functions.broadcast(blacklist.select("etag")),
      Seq("etag"), "left_anti")

  /** Generate thumbnail/webview derivatives for fetched blobs via an
    * injectable resize kernel (derivatives.py:162-193, 293-305). The
    * fake kernel "resizes" by hashing the source bytes with the target
    * width — deterministic, size-bounded, schema-correct. */
  def derivatives(blobs: DataFrame,
      resize: (Array[Byte], Int) => Array[Byte] = fakeResize): DataFrame = {
    val spark = blobs.sparkSession
    val etagIdx = blobs.schema.fieldIndex("etag")
    val contentIdx = blobs.schema.fieldIndex("content")
    val kinds = Widths.toSeq.sortBy(_._1)
    val rows = blobs.rdd.mapPartitions { it =>
      it.flatMap { r =>
        val etag = r.getString(etagIdx)
        val content = r.getAs[Array[Byte]](contentIdx)
        kinds.map { case (kind, w) =>
          Row(etag, kind, w, resize(content, w))
        }
      }
    }
    spark.createDataFrame(rows, derivativeSchema)
  }

  def fakeResize(bytes: Array[Byte], width: Int): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(bytes)
    md.update(width.toString.getBytes("UTF-8"))
    md.digest()
  }

  /** Raised for undecodable bytes, like the reference's BadImageError
    * (derivatives.py:44-51). */
  final class BadImageException(msg: String) extends RuntimeException(msg)

  /** Deterministic RGB test pattern encoded as JPEG — lets the REAL
    * decode/resize kernels be driven end-to-end from plain table rows
    * in environments with no blob store (this one ships no image
    * fixtures in the sf dirs). Seeded per record so every blob is
    * distinct; pure JDK. */
  def synthImageJpeg(seed: Long, w: Int = 320, h: Int = 240): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = (x * 7 + seed) & 0xff
        val g = (y * 5 + seed * 3) & 0xff
        val b = (x + y + seed * 7) & 0xff
        img.setRGB(x, y, ((r << 16) | (g << 8) | b).toInt)
        x += 1
      }
      y += 1
    }
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpeg", buf)
    buf.toByteArray
  }

  /** REAL resize kernel via javax.imageio — the production counterpart
    * of [[fakeResize]], reproducing resize_image + img_to_buffer
    * (derivatives.py:285-305): downscale-only to the target width,
    * bilinear interpolation, height = floor(h · w'/w), then JPEG
    * encode at quality 0.95 regardless of input format. Pure JDK —
    * no external imaging library. */
  def imageResize(bytes: Array[Byte], width: Int): Array[Byte] = {
    import java.awt.RenderingHints
    import java.awt.image.BufferedImage
    import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}
    val img = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    if (img == null) throw new BadImageException(s"undecodable image (${bytes.length} bytes)")
    // resize_image: only shrink; height truncates like int() in the ref
    val out =
      if (img.getWidth > width) {
        val h = (img.getHeight.toFloat * (width.toFloat / img.getWidth.toFloat)).toInt
        val scaled = new BufferedImage(width, h, BufferedImage.TYPE_INT_RGB)
        val g = scaled.createGraphics()
        g.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
          RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, width, h, null)
        g.dispose()
        scaled
      } else if (img.getType == BufferedImage.TYPE_INT_RGB) img
      else { // JPEG writer needs an opaque raster (PNG/alpha inputs)
        val rgb = new BufferedImage(img.getWidth, img.getHeight,
          BufferedImage.TYPE_INT_RGB)
        val g = rgb.createGraphics(); g.drawImage(img, 0, 0, null); g.dispose()
        rgb
      }
    // img_to_buffer: JPEG, quality 95
    val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(0.95f)
    val buf = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(buf)
    try {
      writer.setOutput(ios)
      writer.write(null, new IIOImage(out, null, null), param)
    } finally { ios.close(); writer.dispose() }
    buf.toByteArray
  }

  /** Synthetic image with seed-dependent LOW-frequency structure: an
    * 8×8 grid of flat gray blocks whose values derive from the seed.
    * [[synthImageJpeg]]'s high-frequency gradient averages to uniform
    * mid-gray under an 8×8 downscale (every seed hashes alike — the
    * degenerate case for average-hashing), so perceptual-hash
    * fixtures need block images whose hash actually carries ~half the
    * seed's bits. */
  def synthImageBlocksJpeg(seed: Long, w: Int = 320, h: Int = 240): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val block = (y * 8 / h) * 8 + (x * 8 / w)
        val v = (graft.functions.BloomKernel.mix(seed * 64 + block) & 0xff).toInt
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpeg", buf)
    buf.toByteArray
  }

  /** Re-encode with `dots` single black pixels at seed-deterministic
    * positions — the controlled small perturbation near-dup fixtures
    * need: a handful of dots barely moves block averages (hamming
    * 0–2) while a different seed's block pattern moves ~32 bits. */
  def addNoiseDots(bytes: Array[Byte], seed: Long, dots: Int): Array[Byte] = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    val (w, h) = (img.getWidth, img.getHeight)
    var i = 0
    while (i < dots) {
      val p = graft.functions.BloomKernel.mix(seed * 1000 + i)
      img.setRGB(((p & 0x7fffffff) % w).toInt,
        (((p >>> 32) & 0x7fffffff) % h).toInt, 0x000000)
      i += 1
    }
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpeg", buf)
    buf.toByteArray
  }

  /** Average perceptual hash (aHash): decode, bilinear-downscale to
    * 8×8, gray = (r+g+b)/3, bit k set iff cell k ≥ the 64-cell mean
    * (row-major, MSB first). The standard cheap near-duplicate signal
    * for image corpora — re-encodes, small edits and resizes keep the
    * hash within a few bits, so hamming-banded joins find them
    * without pixel comparison. Pure JDK, deterministic in the bytes. */
  def aHash64(bytes: Array[Byte]): Long = {
    import java.awt.RenderingHints
    import java.awt.image.BufferedImage
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    if (img == null) throw new BadImageException(
      s"undecodable image (${bytes.length} bytes)")
    val small = new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB)
    val g = small.createGraphics()
    g.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
      RenderingHints.VALUE_INTERPOLATION_BILINEAR)
    g.drawImage(img, 0, 0, 8, 8, null)
    g.dispose()
    val gray = new Array[Int](64)
    var mean = 0L
    var i = 0
    while (i < 64) {
      val rgb = small.getRGB(i % 8, i / 8)
      gray(i) = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
      mean += gray(i)
      i += 1
    }
    val m = mean / 64.0
    var hash = 0L
    i = 0
    while (i < 64) {
      hash = (hash << 1) | (if (gray(i) >= m) 1L else 0L)
      i += 1
    }
    hash
  }

  /** Seed-structured PCM-16 WAV: 64 segments whose amplitudes derive
    * from the seed — the low-frequency envelope the energy-difference
    * fingerprint keys on. `gain` scales every sample (the fingerprint
    * must be invariant); `flipSegs` overwrites that many segment
    * amplitudes (a controlled small edit). Fixture twin of
    * [[synthImageBlocksJpeg]] for the audio modality. */
  def synthWav(seed: Long, gain: Double = 1.0, flipSegs: Int = 0): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val rate = 8000
    val n = rate
    val segLen = n / 64
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val seg = math.min(63, i / segLen)
      val mixed = graft.functions.BloomKernel.mix(
        if (seg < flipSegs) seed * 977 + seg + 31337 else seed * 977 + seg)
      val amp = 2000 + ((mixed & 0x7fffffff) % 18000)
      val v = (math.sin(i * 0.9) * amp * gain).toInt.toShort
      pcm(i * 2) = (v & 0xff).toByte
      pcm(i * 2 + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(rate.toFloat, 16, 1, true, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val buf = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, buf)
    buf.toByteArray
  }

  /** Energy-difference audio fingerprint: 65 RMS bars from the same
    * real javax.sound kernel the waveform derivative uses, bit i set
    * iff bar i+1 is louder than bar i — the classic gain-invariant
    * acoustic signature (peaks are max-normalized, so amplitude
    * scaling provably cannot move ANY bit; re-encodes and small edits
    * move a few). Feeds [[audioNearDups]]. */
  def audioFingerprint64(bytes: Array[Byte]): Long = {
    val bars = waveformPeaks(bytes, barCount = 65)
    var h = 0L
    var i = 0
    while (i < 64) {
      h = (h << 1) | (if (bars(i + 1) > bars(i)) 1L else 0L)
      i += 1
    }
    h
  }

  /** Audio near-duplicate pairs: [[audioFingerprint64]] through the
    * same banded hamming join as [[imageNearDups]]. */
  def audioNearDups(blobs: DataFrame, idCol: String, bytesCol: String,
      maxHamming: Int = 3): DataFrame =
    hammingNearDups(blobs, idCol, bytesCol, audioFingerprint64, maxHamming)

  /** Video near-duplicate pairs — the third modality on the same
    * discipline: sample `nFrames` frames per blob with the REAL MJPEG
    * kernel ([[mjpegFrameDecoder]]), aHash each frame, band per
    * (frame position, band) so only same-position frames ever join,
    * and call two videos near-duplicates when at least `minClose`
    * sampled positions land within `maxHamming` bits — re-encodes and
    * watermarks stay close on most frames; different content isn't
    * close anywhere. Output (id_1, id_2, n_close), id_1 < id_2. */
  def videoNearDups(blobs: DataFrame, idCol: String, bytesCol: String,
      nFrames: Int = 4, maxHamming: Int = 3, minClose: Int = 3): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val spark = blobs.sparkSession
    val idIdx = blobs.schema.fieldIndex(idCol)
    val bIdx = blobs.schema.fieldIndex(bytesCol)
    val hashSchema = StructType(Seq(
      StructField("id", StringType), StructField("fidx", IntegerType),
      StructField("h", LongType)))
    val hashes = spark.createDataFrame(
      blobs.rdd.flatMap { r =>
        mjpegFrameDecoder(r.getAs[Array[Byte]](bIdx), nFrames).zipWithIndex
          .map { case (f, i) => Row(r.getString(idIdx), i, aHash64(f)) }
      }, hashSchema)
    val nBands = maxHamming + 1
    val bandWidth = 64 / nBands
    val banded = hashes.select(col("id"), col("fidx"), col("h"),
      explode(array((0 until nBands).map { b =>
        val lo = b * bandWidth
        val width = if (b == nBands - 1) 64 - lo else bandWidth
        struct(lit(b).as("band"),
          shiftrightunsigned(col("h"), lo)
            .bitwiseAND(lit(if (width == 64) -1L else (1L << width) - 1))
            .as("key"))
      }: _*)).as("bk"))
      .select(col("id"), col("fidx"), col("h"), col("bk.band"), col("bk.key"))
    banded.as("a").join(banded.as("b"),
        col("a.fidx") === col("b.fidx") &&
          col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_1"), col("b.id").as("id_2"),
        col("a.fidx").as("fidx"),
        bit_count(col("a.h").bitwiseXOR(col("b.h"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .groupBy(col("id_1"), col("id_2"))
      .agg(count(lit(1)).as("n_close"))
      .filter(col("n_close") >= minClose)
  }

  /** Perceptual near-duplicate pairs over an image corpus: aHash every
    * blob (one decode per row, partition-parallel), pigeonhole-band
    * the 64-bit hashes into `maxHamming + 1` disjoint bands (two
    * hashes within the hamming bound MUST agree on at least one whole
    * band), equi-join per band, verify with bit_count(xor) — the
    * SimHash discipline ([[graft.operators.TextDedup]]) applied to
    * the multimodal column: never an all-pairs image comparison, and
    * the only per-pair work is one XOR. Output (id_1, id_2, hamming),
    * id_1 < id_2, distinct. */
  def imageNearDups(blobs: DataFrame, idCol: String, bytesCol: String,
      maxHamming: Int = 3): DataFrame =
    hammingNearDups(blobs, idCol, bytesCol, aHash64, maxHamming)

  /** The shared banded hamming join both modalities run. */
  private def hammingNearDups(blobs: DataFrame, idCol: String,
      bytesCol: String, hashFn: Array[Byte] => Long,
      maxHamming: Int): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val spark = blobs.sparkSession
    val idIdx = blobs.schema.fieldIndex(idCol)
    val bIdx = blobs.schema.fieldIndex(bytesCol)
    val hashSchema = StructType(Seq(
      StructField("id", StringType), StructField("h", LongType)))
    val hashes = spark.createDataFrame(
      blobs.rdd.map(r => Row(r.getString(idIdx),
        hashFn(r.getAs[Array[Byte]](bIdx)))), hashSchema)
    val nBands = maxHamming + 1
    val bandWidth = 64 / nBands
    val banded = hashes.select(col("id"), col("h"),
      explode(array((0 until nBands).map { b =>
        // band b = bits [b*w, (b+1)*w) (last band takes the remainder)
        val lo = b * bandWidth
        val width = if (b == nBands - 1) 64 - lo else bandWidth
        struct(lit(b).as("band"),
          shiftrightunsigned(col("h"), lo)
            .bitwiseAND(lit(if (width == 64) -1L else (1L << width) - 1))
            .as("key"))
      }: _*)).as("bk"))
      .select(col("id"), col("h"), col("bk.band"), col("bk.key"))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_1"), col("b.id").as("id_2"),
        bit_count(col("a.h").bitwiseXOR(col("b.h"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Decoded (width, height) of an image blob, or null when
    * undecodable — the metadata probe for multimodal binary columns. */
  def imageDims(bytes: Array[Byte]): Option[(Int, Int)] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    Option(img).map(i => (i.getWidth, i.getHeight))
  }

  // --- audio waveform derivative (sounds bucket) ------------------------

  /** Per-bar loudness peaks of an audio blob — the feature-extraction
    * half of the reference's waveform derivative (mediaing/waveform.py
    * :17-42): split into `barCount` chunks, RMS per chunk, normalize to
    * `dbCeiling` as int((rms/max)·ceiling). REAL decode via
    * javax.sound.sampled. 16-bit PCM assumed, first channel read.
    *
    * SCOPE DECISION (closed round 8): the decode seam is WAV/AIFF PCM —
    * what the pure-JDK javax.sound.sampled SPI ships. The reference's
    * mp3/ogg path shells out to ffmpeg via pydub (derivatives.py:338,
    * fixture whip-poor-will.mp3); no decoder for those formats exists
    * in the JDK, none can be vendored into this zero-egress build, and
    * on a cluster the right integration is the same as the
    * reference's: an external transcoder in front of this seam. MP3
    * blobs therefore take the BadAudio failure path — byte-identical
    * behavior to the reference running without ffmpeg installed. A
    * deployment with a JVM mp3 SPI (e.g. a Tritonus-style plugin on
    * the classpath) lights this kernel up unchanged, because
    * AudioSystem discovers decoders through the SPI registry. */
  def waveformPeaks(bytes: Array[Byte], barCount: Int = 107,
      dbCeiling: Int = 60): Array[Int] = {
    import javax.sound.sampled.AudioSystem
    val in =
      try AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
      catch { case e: Exception =>
        throw new BadImageException(s"undecodable audio: ${e.getMessage}") }
    val fmt = in.getFormat
    val frameSize = fmt.getFrameSize
    if (frameSize < 2 || fmt.getSampleSizeInBits != 16)
      throw new BadImageException(
        s"unsupported sample format: ${fmt.getSampleSizeInBits}-bit " +
          s"(16-bit PCM expected)")
    val data = in.readAllBytes()
    val frames = data.length / frameSize
    val chunk = math.max(1, frames / barCount)
    val bigEndian = fmt.isBigEndian
    def sample(frame: Int): Int = {
      val off = frame * frameSize // first channel of the frame
      val (a, b) = (data(off) & 0xff, data(off + 1) & 0xff)
      val s = if (bigEndian) (a << 8) | b else (b << 8) | a
      (s << 16) >> 16 // sign-extend 16-bit
    }
    val rms = Array.tabulate(barCount) { i =>
      val start = i * chunk
      val end = math.min(start + chunk, frames)
      if (end <= start) 0.0
      else {
        var acc = 0.0
        var f = start
        while (f < end) { val s = sample(f).toDouble; acc += s * s; f += 1 }
        math.sqrt(acc / (end - start))
      }
    }
    val max = rms.max
    if (max == 0.0) Array.fill(barCount)(0)
    else rms.map(r => ((r / max) * dbCeiling).toInt)
  }

  /** Waveform bar image from an audio blob (waveform.py:58-77 layout:
    * 840×150 canvas, 4px bars on an 8px grid, value·2 bar heights
    * around the 64px midline), JPEG-encoded. The reference's duration
    * caption needs a TTF font file — absent in this container — so the
    * caption is omitted (documented divergence); bars are exact. */
  def waveformImage(bytes: Array[Byte]): Array[Byte] = {
    import java.awt.Color
    import java.awt.image.BufferedImage
    val peaks = waveformPeaks(bytes)
    val im = new BufferedImage(840, 150, BufferedImage.TYPE_INT_RGB)
    val g = im.createGraphics()
    g.setColor(new Color(0xf5, 0xf5, 0xf5)); g.fillRect(0, 0, 840, 150)
    g.setColor(new Color(0x42, 0x42, 0x42))
    peaks.zipWithIndex.foreach { case (v, i) =>
      if (v > 0) g.fillRect(i * 8 + 2, 64 - v, 4, math.max(1, v * 2))
    }
    g.dispose()
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "jpeg", buf)
    buf.toByteArray
  }

  // --- video frame sampling (multimodal plumbing) -----------------------

  /** One sampled frame per (etag, frame_idx). */
  val frameSchema: StructType = StructType(Seq(
    StructField("etag", StringType),
    StructField("frame_idx", IntegerType),
    StructField("frame", BinaryType)))

  /** Sample `n` frames from each video blob via an injectable decode
    * kernel — the video member of the multimodal column family. The JDK
    * has no video decoder, so the DEFAULT KERNEL IS A DETERMINISTIC
    * STUB (content-seeded fake frames); the Spark-side plumbing —
    * per-partition batch shape, schema, one output row per sampled
    * frame — is real, and a production deployment injects a JNI/ffmpeg
    * kernel with the same signature. */
  def sampleFrames(blobs: DataFrame, n: Int,
      decoder: (Array[Byte], Int) => Seq[Array[Byte]] = fakeFrameDecoder)
      : DataFrame = {
    val spark = blobs.sparkSession
    val etagIdx = blobs.schema.fieldIndex("etag")
    val contentIdx = blobs.schema.fieldIndex("content")
    val rows = blobs.rdd.mapPartitions { it =>
      it.flatMap { r =>
        val etag = r.getString(etagIdx)
        val frames = decoder(r.getAs[Array[Byte]](contentIdx), n)
        frames.zipWithIndex.map { case (f, i) => Row(etag, i, f) }
      }
    }
    spark.createDataFrame(rows, frameSchema)
  }

  /** STUB video decode (for codecs the JDK cannot read):
    * deterministic 64-byte fake frames derived from the blob hash.
    * [[mjpegFrameDecoder]] is the real kernel for MJPEG-AVI. */
  def fakeFrameDecoder(bytes: Array[Byte], n: Int): Seq[Array[Byte]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val seed = md.digest(bytes)
    (0 until n).map(i =>
      Array.tabulate[Byte](64)(j => (seed(j % 16) + i * 31 + j).toByte))
  }

  /** All video frames of an MJPEG AVI blob, as raw JPEG byte arrays.
    * MJPEG is the one video codec decodable with the plain JDK: the
    * container is RIFF (chunks `[fourcc][le32 size][body][pad to even]`,
    * `RIFF`/`LIST` nesting with a 4-byte list type), and every `..dc` /
    * `..db` movi chunk body IS a complete JPEG that javax.imageio
    * reads. A structural walk, not a codec. */
  def mjpegAviFrames(bytes: Array[Byte]): Seq[Array[Byte]] = {
    def fourcc(off: Int) = new String(bytes, off, 4, "US-ASCII")
    def u32(off: Int): Int =
      (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8) |
        ((bytes(off + 2) & 0xff) << 16) | ((bytes(off + 3) & 0xff) << 24)
    if (bytes.length < 12 || fourcc(0) != "RIFF" || fourcc(8) != "AVI ")
      throw new BadImageException(s"not a RIFF/AVI blob (${bytes.length} bytes)")
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    def walk(start: Int, end: Int): Unit = {
      var p = start
      while (p + 8 <= end) {
        val id = fourcc(p)
        val sz = u32(p + 4)
        val body = p + 8
        if (sz < 0 || body + sz > end)
          throw new BadImageException(s"truncated AVI chunk $id at $p")
        if (id == "LIST" && sz >= 4) walk(body + 4, body + sz)
        else if (id.length == 4 && (id.endsWith("dc") || id.endsWith("db")) && sz > 0)
          frames += java.util.Arrays.copyOfRange(bytes, body, body + sz)
        p = body + sz + (sz & 1)
      }
    }
    walk(12, math.min(bytes.length.toLong, 8L + u32(4)).toInt)
    frames.toSeq
  }

  /** REAL video frame-sample kernel for MJPEG AVI: decode the frame
    * list via [[mjpegAviFrames]] and sample `n` frames evenly across
    * the clip (inclusive endpoints), returning the raw JPEG bytes of
    * each sampled frame. Undecodable/other-codec blobs raise
    * [[BadImageException]] like the image path. */
  def mjpegFrameDecoder(bytes: Array[Byte], n: Int): Seq[Array[Byte]] = {
    val all = mjpegAviFrames(bytes)
    if (all.isEmpty) throw new BadImageException("AVI with no video frames")
    if (n >= all.size) all
    else if (n <= 1) Seq(all(all.size / 2))
    else (0 until n).map(i => all((i.toLong * (all.size - 1) / (n - 1)).toInt))
  }

  /** Deterministic MJPEG AVI test clip (RIFF/hdrl/strl/movi with MJPG
    * stream headers and one `00dc` JPEG chunk per frame) — the video
    * counterpart of [[synthImageJpeg]], so the REAL frame-sample kernel
    * is drivable with no video fixtures in the container. */
  def synthMjpegAvi(seed: Long, nFrames: Int, w: Int = 64, h: Int = 48): Array[Byte] =
    mjpegAviFromJpegs((0 until nFrames).map(i => synthImageJpeg(seed + i, w, h)), w, h)

  /** Assemble ANY JPEG list into a well-formed MJPEG-AVI — the fixture
    * builder behind [[synthMjpegAvi]] and the video-fingerprint specs
    * (which need block-structured frames; the gradient frames hash
    * degenerately, see [[synthImageBlocksJpeg]]). */
  def mjpegAviFromJpegs(jpegs: Seq[Array[Byte]], w: Int, h: Int): Array[Byte] = {
    val nFrames = jpegs.size
    def le32(v: Int) = Array[Byte](
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = if (body.length % 2 == 1) Array[Byte](0) else Array.emptyByteArray
      id.getBytes("US-ASCII") ++ le32(body.length) ++ body ++ pad
    }
    def list(typ: String, children: Array[Byte]): Array[Byte] =
      chunk("LIST", typ.getBytes("US-ASCII") ++ children)
    // minimal-but-well-formed headers: avih (56 B) + strh (56 B) + strf (40 B)
    val avih = chunk("avih", le32(40000) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(nFrames) ++ le32(0) ++ le32(1) ++ le32(0) ++ le32(w) ++ le32(h) ++
      Array.fill[Byte](16)(0))
    val strh = chunk("strh", "vids".getBytes("US-ASCII") ++
      "MJPG".getBytes("US-ASCII") ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(1) ++ le32(25) ++ le32(0) ++ le32(nFrames) ++ le32(0) ++
      le32(0) ++ le32(0) ++ Array.fill[Byte](8)(0))
    val strf = chunk("strf", le32(40) ++ le32(w) ++ le32(h) ++
      Array[Byte](1, 0, 24, 0) ++ "MJPG".getBytes("US-ASCII") ++
      le32(w * h * 3) ++ Array.fill[Byte](16)(0))
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
    val movi = list("movi", jpegs.map(chunk("00dc", _)).reduce(_ ++ _))
    val payload = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    "RIFF".getBytes("US-ASCII") ++ le32(payload.length) ++ payload
  }

  /** mime → storage bucket with validation flag (media_validation.py).*/
  def bucketFor(mime: Column): Column =
    graft.etl.Vocab.defaultBuckets.foldLeft(when(lit(false), lit("")))(
      (acc, kv) => acc.when(mime === kv._1, kv._2))

  /** get_media_url (idb/data_api/v2_media.py:28-39): the storage URL
    * for the base object, or for a derivative ONLY once derivatives
    * were generated and only for the three known sizes (DERIVATIONS,
    * :26). `deriv` null means the base object. bucketname pins
    * config.ENV to 'prod' (db.py:727-729 formats the env in). */
  def mediaUrl(bucket: Column, etag: Column, derivatives: Column,
      deriv: Column): Column = {
    val bucketname = concat(lit("idigbio-"), bucket, lit("-prod"))
    when(bucket.isNotNull && etag.isNotNull,
      when(deriv.isNull,
        concat(lit("https://s.idigbio.org/"), bucketname, lit("/"), etag))
      .when(deriv.isin("thumbnail", "webview", "fullsize") && derivatives,
        concat(lit("https://s.idigbio.org/"), bucketname, lit("-"), deriv,
          lit("/"), etag, lit(".jpg"))))
  }

  /** respond_to_record's decision table (v2_media.py:59-103) as three
    * columns over (mediaUrl, mime, typeOrBucket, lastStatus):
    * (response kind: redirect | svg, placeholder text, cache max-age
    * seconds). A resolvable URL redirects (4-day cache); otherwise an
    * SVG placeholder: "No Preview" when the mime or bucket is unknown
    * (1-day), "Preview Pending" when the object was never fetched
    * (last_status null, 10-minute), "No Preview" after a failed fetch
    * (1-day). */
  def respondToRecord(mediaUrl: Column, mime: Column,
      typeOrBucket: Column, lastStatus: Column): (Column, Column, Column) = {
    val text = when(mediaUrl.isNotNull, lit(null).cast("string"))
      .when(mime.isNull || typeOrBucket.isNull, lit("No Preview"))
      .when(lastStatus.isNull, lit("Preview Pending"))
      .otherwise(lit("No Preview"))
    val cache = when(mediaUrl.isNotNull, lit(4 * 24 * 60 * 60))
      .when(mime.isNull || typeOrBucket.isNull, lit(24 * 60 * 60))
      .when(lastStatus.isNull, lit(600))
      .otherwise(lit(24 * 60 * 60))
    val kind = when(mediaUrl.isNotNull, lit("redirect")).otherwise(lit("svg"))
    (kind, text, cache.cast("long"))
  }
}
