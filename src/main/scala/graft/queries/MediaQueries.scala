package graft.queries

import graft.Tables
import graft.media.Media
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Media url/etag resolution (db.py:624-656 DISTINCT ON) as a
  * CORRECTNESS query: media tables derived from events — urls from
  * event ids, associations from props bodies, buckets from types. */
object MediaQueries {

  def qMediaResolution(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val media = ev.select(
        concat(lit("http://media.example/"), col("event_id") % 300).as("url"),
        lit("images").as("type"), lit(null).cast("string").as("owner"),
        lit("image/jpeg").as("mime"),
        lit(null).cast("timestamp").as("last_check"),
        lit(null).cast("int").as("last_status"))
      .distinct()
    val mediaObjects = ev.select(
      concat(lit("http://media.example/"), col("event_id") % 300).as("url"),
      md5(col("props")).as("etag"),
      col("ts").as("modified"))
    val objects = ev.select(
        md5(col("props")).as("etag"),
        when(col("event_type") === "click", "image/jpeg")
          .otherwise("video/mp4").as("detected_mime"))
      .groupBy(col("etag"))
      .agg(min(col("detected_mime")).as("detected_mime"))
      .withColumn("derivatives", lit(false))
      .withColumn("bucket", Media.bucketFor(col("detected_mime")))
    Media.mediaView(media, mediaObjects, objects)
      .select(col("url"), col("etag"), col("detected_mime"), col("bucket"))
      .orderBy(col("url"))
  }

  val qMediaResolutionSql: String =
    """WITH mo AS (SELECT 'http://media.example/' || (event_id % 300) AS url,
      |    md5(props) AS etag, ts AS modified FROM events),
      |latest AS (SELECT url, etag FROM (
      |  SELECT *, row_number() OVER (PARTITION BY url
      |    ORDER BY modified DESC, etag DESC) AS rn FROM mo) WHERE rn = 1),
      |objs AS (SELECT md5(props) AS etag,
      |    min(CASE WHEN event_type = 'click' THEN 'image/jpeg'
      |             ELSE 'video/mp4' END) AS detected_mime
      |  FROM events GROUP BY 1)
      |SELECT latest.url, latest.etag, objs.detected_mime,
      |  CASE objs.detected_mime WHEN 'image/jpeg' THEN 'images'
      |       WHEN 'video/mp4' THEN 'video' END AS bucket
      |FROM latest LEFT JOIN objs USING (etag)
      |ORDER BY url""".stripMargin

  /** The media API's serving decision — `GET /v2/media/<uuid>[.json]`
    * (idb/data_api/v2_media.py:28-103: get_media_url +
    * respond_to_record) — composed over the media view for every
    * (url × derivative) combination the routes serve (base +
    * thumbnail/webview/fullsize):
    *
    *  - a resolvable storage URL (bucket+etag known; derivative URLs
    *    only once derivatives were generated) → redirect, 4-day cache;
    *  - unknown mime or bucket → "No Preview" SVG, 1-day;
    *  - never fetched (last_status null) → "Preview Pending", 600 s;
    *  - fetched but failed → "No Preview", 1-day.
    *
    * The fixture varies every input the table dispatches on: urls
    * without any object association (%13 — unresolvable), media rows
    * with unknown mime (%7) / type (%11), unfetched (%5) and failed
    * (%3) statuses, and a derivatives flag split by etag prefix. */
  def qMediaApi(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val urlId = col("event_id") % 300
    val media = ev.select(
        concat(lit("http://media.example/"), urlId).as("url"),
        when(urlId % 11 === 0, lit(null).cast("string"))
          .otherwise(lit("images")).as("type"),
        when(urlId % 7 === 0, lit(null).cast("string"))
          .otherwise(lit("image/jpeg")).as("mime"),
        when(urlId % 5 === 0, lit(null).cast("int"))
          .when(urlId % 3 === 0, lit(500)).otherwise(lit(200))
          .as("last_status"))
      .distinct()
    val mediaObjects = ev.where(urlId % 13 =!= 0).select(
      concat(lit("http://media.example/"), urlId).as("url"),
      md5(col("props")).as("etag"), col("ts").as("modified"))
    val objects = ev.select(
        md5(col("props")).as("etag"),
        when(col("event_type") === "click", "image/jpeg")
          .otherwise("video/mp4").as("detected_mime"))
      .groupBy(col("etag"))
      .agg(min(col("detected_mime")).as("detected_mime"))
      .withColumn("derivatives", substring(col("etag"), 1, 1) <= "7")
      .withColumn("bucket", Media.bucketFor(col("detected_mime")))
    val exploded = Media.mediaView(media, mediaObjects, objects)
      .select(col("*"), explode(array(lit(null).cast("string"),
        lit("thumbnail"), lit("webview"), lit("fullsize"))).as("deriv"))
    val mu = Media.mediaUrl(col("bucket"), col("etag"),
      col("derivatives"), col("deriv"))
    val (kind, text, cache) = Media.respondToRecord(mu,
      coalesce(col("detected_mime"), col("mime")),
      coalesce(col("type"), col("bucket")), col("last_status"))
    exploded.select(col("url"),
        coalesce(col("deriv"), lit("full")).as("deriv"),
        kind.as("response"), mu.as("media_url"), text.as("text"),
        cache.as("cache_s"))
      .orderBy(col("url"), col("deriv"))
  }

  val qMediaApiSql: String =
    """WITH m AS (SELECT DISTINCT
      |    'http://media.example/' || (event_id % 300) AS url,
      |    CASE WHEN (event_id % 300) % 11 = 0 THEN NULL
      |         ELSE 'images' END AS type,
      |    CASE WHEN (event_id % 300) % 7 = 0 THEN NULL
      |         ELSE 'image/jpeg' END AS mime,
      |    CASE WHEN (event_id % 300) % 5 = 0 THEN NULL
      |         WHEN (event_id % 300) % 3 = 0 THEN 500
      |         ELSE 200 END AS last_status
      |  FROM events),
      |mo AS (SELECT 'http://media.example/' || (event_id % 300) AS url,
      |    md5(props) AS etag, ts AS modified FROM events
      |  WHERE (event_id % 300) % 13 != 0),
      |latest AS (SELECT url, etag FROM (
      |  SELECT *, row_number() OVER (PARTITION BY url
      |    ORDER BY modified DESC, etag DESC) AS rn FROM mo) WHERE rn = 1),
      |objs AS (SELECT md5(props) AS etag,
      |    min(CASE WHEN event_type = 'click' THEN 'image/jpeg'
      |             ELSE 'video/mp4' END) AS detected_mime
      |  FROM events GROUP BY 1),
      |v AS (SELECT m.url, m.type, m.mime, m.last_status, latest.etag,
      |    objs.detected_mime,
      |    (substr(latest.etag, 1, 1) <= '7') AS derivatives,
      |    CASE objs.detected_mime WHEN 'image/jpeg' THEN 'images'
      |         WHEN 'video/mp4' THEN 'video' END AS bucket
      |  FROM m LEFT JOIN latest USING (url)
      |  LEFT JOIN objs ON objs.etag = latest.etag),
      |x AS (SELECT v.*, d.deriv FROM v CROSS JOIN (SELECT unnest([
      |    CAST(NULL AS VARCHAR), 'thumbnail', 'webview', 'fullsize'])
      |    AS deriv) d),
      |r AS (SELECT url, deriv, last_status,
      |    coalesce(detected_mime, mime) AS eff_mime,
      |    coalesce(type, bucket) AS eff_tb,
      |    CASE WHEN bucket IS NOT NULL AND etag IS NOT NULL THEN
      |      CASE WHEN deriv IS NULL THEN
      |        'https://s.idigbio.org/idigbio-'||bucket||'-prod/'||etag
      |      WHEN deriv IN ('thumbnail','webview','fullsize')
      |          AND derivatives THEN
      |        'https://s.idigbio.org/idigbio-'||bucket||'-prod-'||deriv
      |          ||'/'||etag||'.jpg'
      |      END END AS media_url
      |  FROM x)
      |SELECT url, coalesce(deriv, 'full') AS deriv,
      |  CASE WHEN media_url IS NOT NULL THEN 'redirect'
      |       ELSE 'svg' END AS response,
      |  media_url,
      |  CASE WHEN media_url IS NOT NULL THEN NULL
      |       WHEN eff_mime IS NULL OR eff_tb IS NULL THEN 'No Preview'
      |       WHEN last_status IS NULL THEN 'Preview Pending'
      |       ELSE 'No Preview' END AS text,
      |  CAST(CASE WHEN media_url IS NOT NULL THEN 345600
      |       WHEN eff_mime IS NULL OR eff_tb IS NULL THEN 86400
      |       WHEN last_status IS NULL THEN 600
      |       ELSE 86400 END AS BIGINT) AS cache_s
      |FROM r ORDER BY url, coalesce(deriv, 'full')""".stripMargin

  /** Image-derivative generation (derivatives.py:162-193) through the
    * REAL javax.imageio resize kernel, driven end-to-end from table
    * rows via deterministic synthesized JPEGs (this environment has no
    * blob store). The binary outputs themselves are not
    * SQL-expressible, but their deterministic scalar FACTS are, so the
    * query emits those and is hash-gated against a constants oracle:
    * the decoded derivative dimensions prove the full encode → resize
    * → re-decode roundtrip (320×240 sources shrink to 260×195
    * thumbnails and pass through, re-encoded, for the 600px webview —
    * exactly the reference's downscale-only rule), and the encoded
    * byte length pins the JPEG writer's exact output per seed
    * (constants printed by [[graft.MediaOracleGen]], stable because
    * the pipeline is pure JDK and fully deterministic).
    *
    * Seeds are normalized to the blob's rank (1..50) rather than the
    * raw orderkey so every scale factor synthesizes the SAME 50 blobs
    * — the byte-length constants hold at any SF with ≥ 50 orders. The
    * single-partition window is fine here: it ranks an
    * already-limited 50-row fixture, not a data-sized table. */
  def qMediaDerivative(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types._
    val ids = Tables.orders(s, dir)
      .select(col("o_orderkey")).orderBy(col("o_orderkey")).limit(50)
      .select(row_number().over(Window.orderBy(col("o_orderkey"))).as("id"))
    val blobSchema = StructType(Seq(
      StructField("etag", StringType), StructField("content", BinaryType)))
    val blobs = s.createDataFrame(
      ids.rdd.map(r => Row(f"img${r.getInt(0)}%06d",
        Media.synthImageJpeg(r.getInt(0).toLong))), blobSchema)
    val derivs = Media.derivatives(blobs, Media.imageResize)
    val outSchema = StructType(Seq(
      StructField("etag", StringType), StructField("kind", StringType),
      StructField("width", IntegerType), StructField("out_w", IntegerType),
      StructField("out_h", IntegerType), StructField("n_bytes", IntegerType)))
    val rows = derivs.rdd.map { r =>
      val content = r.getAs[Array[Byte]](3)
      val dims = Media.imageDims(content).getOrElse((-1, -1))
      Row(r.getString(0), r.getString(1), r.getInt(2), dims._1, dims._2,
        content.length)
    }
    s.createDataFrame(rows, outSchema).orderBy(col("etag"), col("kind"))
  }

  /** Perceptual-hash image dedup under the driver gate: 30
    * seed-normalized block images + a 3000-dot perturbed re-encode of
    * every 5th, paired by [[Media.imageNearDups]] (real javax.imageio
    * decode → aHash64 → pigeonhole banding → bit_count verify). The
    * oracle pins the ground-truth pairs ([[graft.PhashOracleGen]]
    * brute-forces all 630 hash pairs) — including that rank 20's
    * perturbation drifts PAST the hamming bound and must NOT pair. */
  def qMediaPhash(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types._
    val ids = Tables.orders(s, dir)
      .select(col("o_orderkey")).orderBy(col("o_orderkey")).limit(30)
      .select(row_number().over(Window.orderBy(col("o_orderkey"))).as("id"))
    val blobSchema = StructType(Seq(
      StructField("id", StringType), StructField("content", BinaryType)))
    val blobs = s.createDataFrame(
      ids.rdd.flatMap { r =>
        val rank = r.getInt(0)
        val base = Media.synthImageBlocksJpeg(rank.toLong)
        Seq(Row(f"img$rank%06d", base)) ++
          (if (rank % 5 == 0)
            Seq(Row(f"img$rank%06dn",
              Media.addNoiseDots(base, rank.toLong, 3000)))
          else Nil)
      }, blobSchema)
    Media.imageNearDups(blobs, "id", "content", maxHamming = 3)
      .orderBy(col("id_1"), col("id_2"))
  }

  val qMediaPhashSql: String =
    """SELECT * FROM (VALUES
      |  ('img000005', 'img000005n', 1),
      |  ('img000010', 'img000010n', 3),
      |  ('img000015', 'img000015n', 2),
      |  ('img000025', 'img000025n', 2),
      |  ('img000030', 'img000030n', 0)
      |) AS t(id_1, id_2, hamming) ORDER BY id_1, id_2""".stripMargin

  /** Audio-fingerprint dedup under the driver gate: 30 seed-normalized
    * WAVs + gain-scaled copies (every 5th) + 2-segment edits (every
    * 7th) through [[Media.audioNearDups]] — real javax.sound decode,
    * gain-invariance visible in the oracle (every gain pair at
    * hamming 0). Ground truth brute-forced by
    * [[graft.AudioOracleGen]]. */
  def qMediaAudio(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types._
    val ids = Tables.orders(s, dir)
      .select(col("o_orderkey")).orderBy(col("o_orderkey")).limit(30)
      .select(row_number().over(Window.orderBy(col("o_orderkey"))).as("id"))
    val blobSchema = StructType(Seq(
      StructField("id", StringType), StructField("content", BinaryType)))
    val blobs = s.createDataFrame(
      ids.rdd.flatMap { r =>
        val rank = r.getInt(0)
        Seq(Row(f"au$rank%06d", Media.synthWav(rank.toLong))) ++
          (if (rank % 5 == 0)
            Seq(Row(f"au$rank%06dg", Media.synthWav(rank.toLong, gain = 0.5)))
          else Nil) ++
          (if (rank % 7 == 0)
            Seq(Row(f"au$rank%06de", Media.synthWav(rank.toLong, flipSegs = 2)))
          else Nil)
      }, blobSchema)
    Media.audioNearDups(blobs, "id", "content", maxHamming = 3)
      .orderBy(col("id_1"), col("id_2"))
  }

  val qMediaAudioSql: String =
    """SELECT * FROM (VALUES
      |  ('au000005', 'au000005g', 0),
      |  ('au000007', 'au000007e', 0),
      |  ('au000010', 'au000010g', 0),
      |  ('au000014', 'au000014e', 2),
      |  ('au000015', 'au000015g', 0),
      |  ('au000020', 'au000020g', 0),
      |  ('au000021', 'au000021e', 1),
      |  ('au000025', 'au000025g', 0),
      |  ('au000028', 'au000028e', 1),
      |  ('au000030', 'au000030g', 0)
      |) AS t(id_1, id_2, hamming) ORDER BY id_1, id_2""".stripMargin

  /** Video near-dup dedup under the driver gate: 12 seed-normalized
    * 4-frame MJPEG-AVIs + dot-perturbed re-encodes of every 3rd
    * through [[Media.videoNearDups]] (real MJPEG frame decode).
    * Ground truth brute-forced by [[graft.VideoOracleGen]] — note
    * vid0006 pairs on only 3 of 4 positions, exercising the minClose
    * floor. */
  def qMediaVideo(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types._
    val ids = Tables.orders(s, dir)
      .select(col("o_orderkey")).orderBy(col("o_orderkey")).limit(12)
      .select(row_number().over(Window.orderBy(col("o_orderkey"))).as("id"))
    val blobSchema = StructType(Seq(
      StructField("id", StringType), StructField("content", BinaryType)))
    val blobs = s.createDataFrame(
      ids.rdd.flatMap { r =>
        val rank = r.getInt(0)
        Seq(Row(f"vid$rank%04d", Media.mjpegAviFromJpegs(
          graft.VideoOracleGen.frames(rank.toLong, noisy = false), 64, 48))) ++
          (if (rank % 3 == 0)
            Seq(Row(f"vid$rank%04dn", Media.mjpegAviFromJpegs(
              graft.VideoOracleGen.frames(rank.toLong, noisy = true), 64, 48)))
          else Nil)
      }, blobSchema)
    Media.videoNearDups(blobs, "id", "content",
        nFrames = 4, maxHamming = 3, minClose = 3)
      .orderBy(col("id_1"), col("id_2"))
  }

  val qMediaVideoSql: String =
    """SELECT * FROM (VALUES
      |  ('vid0003', 'vid0003n', CAST(4 AS BIGINT)),
      |  ('vid0006', 'vid0006n', CAST(3 AS BIGINT)),
      |  ('vid0009', 'vid0009n', CAST(4 AS BIGINT)),
      |  ('vid0012', 'vid0012n', CAST(4 AS BIGINT))
      |) AS t(id_1, id_2, n_close) ORDER BY id_1, id_2""".stripMargin

  /** Constants oracle for [[qMediaDerivative]]: dimensions derive from
    * the downscale-only rule; byte lengths are the pinned encoder
    * facts. `nBytesValues` is generated by [[graft.MediaOracleGen]]. */
  def qMediaDerivativeSql(nBytesValues: String): String =
    s"""WITH ids AS (
       |  SELECT row_number() OVER (ORDER BY o_orderkey) AS id
       |  FROM (SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 50)),
       |kinds(kind, tgt, out_w, out_h) AS (VALUES
       |  ('thumbnail', 260, 260, 195), ('webview', 600, 320, 240)),
       |nb(id2, kind2, n_bytes) AS (VALUES $nBytesValues),
       |base AS (
       |  SELECT 'img' || lpad(CAST(id AS VARCHAR), 6, '0') AS etag,
       |         id, kind, tgt, out_w, out_h
       |  FROM ids CROSS JOIN kinds)
       |SELECT etag, kind, tgt AS width, out_w, out_h, n_bytes
       |FROM base JOIN nb ON id = id2 AND kind = kind2
       |ORDER BY etag, kind""".stripMargin

  /** The media fetch decision table ([[Media.fetchDecisions]] —
    * fetcher.py:116-151 acquisition: q_media_api covers serving, this
    * covers WHICH urls get fetched, in what per-prefix queue order,
    * and the post-fetch status MERGE). The fixture's 400-url space
    * (event_id % 400) varies every selection input: two hardcoded
    * ignore prefixes, a prefixless url (PREFIX_RE no-match → the
    * NULL-prefix queue), missing type (%11), never-fetched (%5 null
    * status), OK (200), and failed statuses (404/500) whose
    * last_check — a deterministic per-url day offset — lands both
    * sides of the 1-month staleness cutoff from the pinned `now`
    * (2024-02-20); sf0.01 mix: ignored 43 / no_type 37 / ok 148 /
    * recent_failure 68 / selected 104 (never-fetched rows select
    * regardless of check age). The simulated fetch outcome cycles 404/500/
    * VALIDATION_FAILURE(1001)/200 over %10. The oracle replays the
    * full conjunctive selection, the PREFIX_RE grouping, the
    * per-queue row numbering, and the MERGE arithmetic. */
  def qMediaFetch(s: SparkSession, dir: String): DataFrame = {
    // distinct on the 400-value uid FIRST, then derive the wide row —
    // the corpus-sized scan aggregates one integer, not the url CASE /
    // timestamp derivations (the oracle does the same)
    val uid = col("uid")
    val url = when(uid % 17 === 0,
        concat(lit("http://media.idigbio.org/x"), uid))
      .when(uid % 17 === 1,
        concat(lit("http://www.tropicos.org/img/"), uid))
      .when(uid % 17 === 2, concat(lit("notaurl-"), uid))
      .when(uid % 17 <= 9, concat(lit("http://media.example/f/"), uid))
      .otherwise(concat(lit("https://cdn.other.org?id="), uid))
    val media = Tables.events(s, dir)
      .select((col("event_id") % 400).as("uid")).distinct()
      .select(
        url.as("url"),
        when(uid % 11 === 0, lit(null).cast("string"))
          .otherwise(lit("images")).as("type"),
        when(uid % 5 === 0, lit(null).cast("int"))
          .when(uid % 3 === 0, lit(404))
          .when(uid % 7 === 0, lit(500))
          .otherwise(lit(200)).as("last_status"),
        date_add(lit(java.sql.Date.valueOf("2024-01-01")),
          (uid % 50).cast("int")).cast("timestamp").as("last_check"),
        when(uid % 10 === 0, lit(404))
          .when(uid % 10 === 1, lit(500))
          .when(uid % 10 === 2, lit(1001))
          .otherwise(lit(200)).as("outcome"))
    Media.fetchDecisions(media,
        now = lit(java.sql.Timestamp.valueOf("2024-02-20 00:00:00")),
        outcome = col("outcome"))
      .orderBy(col("url"))
  }

  val qMediaFetchSql: String =
    """WITH ids AS (SELECT DISTINCT (event_id % 400) AS uid FROM events),
      |m AS (SELECT
      |    CASE WHEN uid % 17 = 0 THEN 'http://media.idigbio.org/x' || uid
      |         WHEN uid % 17 = 1 THEN 'http://www.tropicos.org/img/' || uid
      |         WHEN uid % 17 = 2 THEN 'notaurl-' || uid
      |         WHEN uid % 17 <= 9 THEN 'http://media.example/f/' || uid
      |         ELSE 'https://cdn.other.org?id=' || uid END AS url,
      |    CASE WHEN uid % 11 = 0 THEN NULL ELSE 'images' END AS type,
      |    CASE WHEN uid % 5 = 0 THEN NULL WHEN uid % 3 = 0 THEN 404
      |         WHEN uid % 7 = 0 THEN 500 ELSE 200 END AS last_status,
      |    CAST(DATE '2024-01-01' + CAST(uid % 50 AS INT) AS TIMESTAMP)
      |      AS last_check,
      |    CASE WHEN uid % 10 = 0 THEN 404 WHEN uid % 10 = 1 THEN 500
      |         WHEN uid % 10 = 2 THEN 1001 ELSE 200 END AS outcome
      |  FROM ids),
      |d AS (SELECT url,
      |    CASE WHEN regexp_matches(url, '^https?://[^/]*[/?]')
      |         THEN regexp_extract(url, '^https?://[^/]*[/?]')
      |         END AS prefix,
      |    CASE WHEN type IS NULL THEN 'no_type'
      |         WHEN url LIKE 'http://media.idigbio.org/%'
      |           OR url LIKE 'http://api.idigbio.org/v1/recordsets/%'
      |           OR url LIKE 'https://api.idigbio.org/v2/media/%'
      |           OR url LIKE 'http://api.idigbio.org/v2/media/%'
      |           OR url LIKE 'http://www.tropicos.org/%'
      |           OR url LIKE 'http://n2t.net/ark:/65665/%'
      |           OR url LIKE 'http://arctos.database.museum/%'
      |           THEN 'ignored_prefix'
      |         WHEN last_status IS NULL THEN 'selected'
      |         WHEN last_status < 400 THEN 'ok_status'
      |         WHEN last_check IS NOT NULL AND last_check <
      |             TIMESTAMP '2024-02-20 00:00:00' - INTERVAL 1 MONTH
      |           THEN 'selected'
      |         ELSE 'recent_failure' END AS reason,
      |    last_status, outcome FROM m),
      |seq AS (SELECT url, CAST(row_number() OVER (PARTITION BY prefix
      |      ORDER BY url) AS INT) AS fetch_seq
      |  FROM d WHERE reason = 'selected')
      |SELECT d.url, d.prefix,
      |  CASE WHEN d.reason = 'selected' THEN 'fetch'
      |       ELSE 'skip' END AS decision,
      |  d.reason, d.last_status,
      |  CASE WHEN d.reason = 'selected' THEN d.outcome
      |       ELSE d.last_status END AS new_status,
      |  (d.reason = 'selected') AS check_updated,
      |  seq.fetch_seq
      |FROM d LEFT JOIN seq USING (url)
      |ORDER BY url""".stripMargin
}
