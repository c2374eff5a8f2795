package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ingestion-side join/aggregation semantics (SURVEY §2.3, §2.4):
  * identity resolution with conflict checks, suffix-match identifier
  * lookup, the DQ flag report, and ingest summary counters. */
object IngestQueries {

  /** Ingest identity join (db_check.py:277-339): incoming rows probe
    * the identifier dimension by candidate id; resolved → existing
    * uuid, unresolved → "new"; an id claimed by rows of two different
    * parents is a conflict (cross-record ID violation :304-314).
    * Broadcast-hash join of the batch against the dimension. */
  def qIngestIdentity(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    // identifier dimension: ids seen on day 1 map to their entity
    val dim = ev.filter(to_date(col("ts")) === "2024-01-01")
      .select(concat(lit("id:"), col("event_id") % 5000).as("identifier"),
        concat(lit("u"), col("user_id")).as("uuids_id"))
      .groupBy(col("identifier"))
      .agg(min(col("uuids_id")).as("uuids_id"),
        (countDistinct(col("uuids_id")) > 1).as("id_conflict"))
    // incoming batch: day 2 rows with the same candidate-id scheme
    val incoming = ev.filter(to_date(col("ts")) === "2024-01-02")
      .select(col("event_id"),
        concat(lit("id:"), col("event_id") % 5000).as("identifier"),
        concat(lit("u"), col("user_id")).as("claimed"))
    incoming.join(dim, Seq("identifier"), "left")
      .select(col("event_id"), col("identifier"),
        coalesce(col("uuids_id"), lit("new")).as("resolved"),
        coalesce(col("id_conflict"), lit(false)).as("id_conflict"),
        (col("uuids_id").isNotNull && col("uuids_id") =!= col("claimed"))
          .as("foreign_claim"))
      .orderBy(col("event_id"))
  }

  val qIngestIdentitySql: String =
    """WITH dim AS (
      |  SELECT 'id:' || (event_id % 5000) AS identifier,
      |    min('u' || user_id) AS uuids_id,
      |    count(DISTINCT 'u' || user_id) > 1 AS id_conflict
      |  FROM events WHERE CAST(ts AS DATE) = DATE '2024-01-01' GROUP BY 1),
      |inc AS (
      |  SELECT event_id, 'id:' || (event_id % 5000) AS identifier,
      |    'u' || user_id AS claimed
      |  FROM events WHERE CAST(ts AS DATE) = DATE '2024-01-02')
      |SELECT inc.event_id, inc.identifier,
      |  coalesce(dim.uuids_id, 'new') AS resolved,
      |  coalesce(dim.id_conflict, false) AS id_conflict,
      |  (dim.uuids_id IS NOT NULL AND dim.uuids_id != inc.claimed) AS foreign_claim
      |FROM inc LEFT JOIN dim USING (identifier)
      |ORDER BY event_id""".stripMargin

  /** Associated-specimen suffix-match join (db_check.py:385-413):
    * `identifier LIKE '%suffix'` resolved as a reversed-PREFIX match
    * against the broadcast dimension, so the probe is `startswith` on
    * reversed strings — sargable, and range-partitionable on the
    * reversed dimension at scale. */
  def qSuffixMatch(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val dim = ev.select(concat(lit("urn:cat:"), col("event_id")).as("identifier"),
      concat(lit("u"), col("user_id")).as("uuids_id")).distinct()
    // references carry only the trailing digits of the catalog number
    val refs = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"),
        concat(lit("cat:"), col("event_id")).as("ref_suffix"))
      .distinct()
    // A raw startswith condition plans as a nested-loop join (minutes at
    // sf0.1, unusable at scale). Any match agrees on the first K chars
    // of the REVERSED strings, so equi-join on that blocking key (all
    // refs here are >= K chars) and keep startswith as the residual —
    // a plain hash join probing ~|alphabet|^K-sized buckets.
    val K = 4
    val dimKeyed = dim.withColumn("_rk", substring(reverse(col("identifier")), 1, K))
    val refKeyed = refs.withColumn("_rk", substring(reverse(col("ref_suffix")), 1, K))
    refKeyed.join(dimKeyed, Seq("_rk"))
      .where(reverse(col("identifier")).startsWith(reverse(col("ref_suffix"))))
      .select(col("event_id"), col("identifier"), col("uuids_id"))
      .orderBy(col("event_id"), col("identifier"))
  }

  val qSuffixMatchSql: String =
    """WITH dim AS (SELECT DISTINCT 'urn:cat:' || event_id AS identifier,
      |    'u' || user_id AS uuids_id FROM events),
      |refs AS (SELECT DISTINCT event_id, 'cat:' || event_id AS ref_suffix
      |  FROM events WHERE event_type = 'purchase')
      |SELECT refs.event_id, dim.identifier, dim.uuids_id
      |FROM refs JOIN dim ON dim.identifier LIKE '%' || refs.ref_suffix
      |ORDER BY refs.event_id, dim.identifier""".stripMargin

  /** DQ flag report (idb/reporting/dq_flags.py:44-80): per recordset,
    * exploded flag counts plus dqs stats (order-independent min/max/
    * count — avg is derivable and float-order-dependent, so not
    * hash-compared). Flags derive from event fields like the enrich
    * pipeline's checks. */
  def qDqReport(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val flagged = ev.select(
      concat(lit("rs"), col("user_id") % 5).as("recordset"),
      (col("value") / 100.0).as("dqs"),
      // conditional-array concat instead of array_compact(array(...)):
      // array_compact rewrites to ArrayFilter (CodegenFallback) and
      // kicks the projection out of WholeStageCodegen
      concat(
        when(col("value") < 1.0, array(lit("low_value")))
          .otherwise(array().cast("array<string>")),
        when(col("event_type") === "error", array(lit("is_error")))
          .otherwise(array().cast("array<string>"))).as("flags"))
    val flagCounts = flagged
      .select(col("recordset"), explode(col("flags")).as("flag"))
      .groupBy(col("recordset"), col("flag"))
      .agg(count(lit(1)).as("n"))
    val dqsStats = flagged.groupBy(col("recordset"))
      .agg(min(col("dqs")).as("dqs_min"), max(col("dqs")).as("dqs_max"),
        count(lit(1)).as("dqs_count"))
    flagCounts.join(dqsStats, Seq("recordset"))
      .orderBy(col("recordset"), col("flag"))
  }

  val qDqReportSql: String =
    """WITH flagged AS (
      |  SELECT 'rs' || (user_id % 5) AS recordset, value / 100.0 AS dqs,
      |    CASE WHEN value < 1.0 THEN 1 ELSE 0 END AS f_low,
      |    CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS f_err
      |  FROM events),
      |fc AS (
      |  SELECT recordset, 'low_value' AS flag,
      |    CAST(sum(f_low) AS BIGINT) AS n FROM flagged
      |  GROUP BY 1 HAVING sum(f_low) > 0
      |  UNION ALL
      |  SELECT recordset, 'is_error', CAST(sum(f_err) AS BIGINT) FROM flagged
      |  GROUP BY 1 HAVING sum(f_err) > 0),
      |ds AS (SELECT recordset, min(dqs) AS dqs_min, max(dqs) AS dqs_max,
      |         count(*) AS dqs_count FROM flagged GROUP BY 1)
      |SELECT fc.recordset, fc.flag, fc.n, ds.dqs_min, ds.dqs_max, ds.dqs_count
      |FROM fc JOIN ds USING (recordset)
      |ORDER BY recordset, flag""".stripMargin

  /** Ingest summary counters (db_check.py:456-475): create/update/
    * delete/unchanged outcome counts per batch — the resume-action
    * classification rolled up. */
  // ---------------------------------------------------------------------
  // q_ingest_suspects: the summary quality gate (ds_sum_counts.py:52-97)
  // over synthesized per-recordset counter rows. Twelve fixture classes
  // hit every rule of the ordered cascade (plus the benign fallthrough);
  // the oracle replays the identical cascade in SQL over the same
  // counters, including the ratio thresholds with true division.
  // ---------------------------------------------------------------------

  def qIngestSuspects(s: SparkSession, dir: String): DataFrame = {
    val c = graft.Tables.customer(s, dir)
    val k = col("c_custkey")
    val cls = k % 12
    def pick(vals: Seq[Int]): Column =
      vals.zipWithIndex.tail.foldLeft(when(cls === 0, vals.head))(
        (acc, vi) => acc.when(cls === vi._2, vi._1)).cast("long")
    //            cls:  0    1    2    3    4    5    6    7    8    9   10   11
    val rc   = pick(Seq(100,   0, 100,   0, 100, 100, 100, 100, 100, 100, 100, 100))
    val rcr  = pick(Seq( 10,   0, 100,   0,  20,  10,  50,  10,  10,  10,  10,  10))
    val rup  = pick(Seq( 90,   0,   0,   0,  60,  60,  50,  90,  90,  90,  90,  90))
    val rdel = pick(Seq(  0,   0,   0,   5,  20,  30,   0,   0,   0,   0,   0,   0))
    val mc   = pick(Seq( 50,   0,  50,  10,  50,  50,  50,  50,   0, 500, 500, 100))
    val mcr  = pick(Seq( 10,   0,  10,   2,  10,  10,  10,  50,   0,  10, 250,  20))
    val mup  = pick(Seq( 40,   0,  40,   8,  40,  40,  40,   0,   0, 450, 250,  60))
    val mdel = pick(Seq(  0,   0,   0,   0,   0,   0,   0,   0,   3,  40,   0,  20))
    val counters = c.orderBy(k).select(
      k.as("id"), (cls =!= 0).as("datafile_ok"),
      rc.as("rc"), rcr.as("rcr"), rup.as("rup"), rdel.as("rdel"),
      mc.as("mc"), mcr.as("mcr"), mup.as("mup"), mdel.as("mdel"))
    counters.select(col("id"),
      graft.ingest.SummaryChecks.suspectTag(col("datafile_ok"),
        col("rc"), col("rcr"), col("rup"), col("rdel"),
        col("mc"), col("mcr"), col("mup"), col("mdel")).as("tag"))
  }

  val qIngestSuspectsSql: String = {
    def pickSql(vals: Seq[Int]): String =
      "CASE c_custkey % 12 " + vals.zipWithIndex.map { case (v, i) =>
        s"WHEN $i THEN $v" }.mkString(" ") + " END"
    val rc   = pickSql(Seq(100,   0, 100,   0, 100, 100, 100, 100, 100, 100, 100, 100))
    val rcr  = pickSql(Seq( 10,   0, 100,   0,  20,  10,  50,  10,  10,  10,  10,  10))
    val rup  = pickSql(Seq( 90,   0,   0,   0,  60,  60,  50,  90,  90,  90,  90,  90))
    val rdel = pickSql(Seq(  0,   0,   0,   5,  20,  30,   0,   0,   0,   0,   0,   0))
    val mc   = pickSql(Seq( 50,   0,  50,  10,  50,  50,  50,  50,   0, 500, 500, 100))
    val mcr  = pickSql(Seq( 10,   0,  10,   2,  10,  10,  10,  50,   0,  10, 250,  20))
    val mup  = pickSql(Seq( 40,   0,  40,   8,  40,  40,  40,   0,   0, 450, 250,  60))
    val mdel = pickSql(Seq(  0,   0,   0,   0,   0,   0,   0,   0,   3,  40,   0,  20))
    s"""WITH ctr AS (
       |  SELECT c_custkey AS id, c_custkey % 12 != 0 AS datafile_ok,
       |    $rc AS rc, $rcr AS rcr, $rup AS rup, $rdel AS rdel,
       |    $mc AS mc, $mcr AS mcr, $mup AS mup, $mdel AS mdel
       |  FROM customer)
       |SELECT id,
       |  CASE
       |    WHEN NOT datafile_ok THEN 'DATAFILE_NOT_OK'
       |    WHEN rc = 0 AND mc = 0 THEN 'NO_RECORDS'
       |    WHEN rc > 0 AND rcr = rc AND rup = 0 AND rdel = 0 THEN 'ALLNEW_RECORDS'
       |    WHEN rc = 0 AND rdel > 0 THEN 'DELETED_ALL_RECORDS'
       |    WHEN rdel > 0 AND CAST(rcr AS DOUBLE)/rdel > 0.9
       |      AND CAST(rcr AS DOUBLE)/rdel < 1.1
       |      AND CAST(rcr AS DOUBLE)/rc > 0.1 THEN 'RECORDS_CHURN'
       |    WHEN rc > 0 AND CAST(rdel AS DOUBLE)/rc > 0.2 THEN 'DELETED_MANY_RECORDS'
       |    WHEN rc > 0 AND CAST(rcr AS DOUBLE)/rc > 0.45 THEN 'MANY_NEW_RECORDS'
       |    WHEN mc > 0 AND mcr = mc AND mup = 0 AND mdel = 0 THEN 'ALLNEW_MEDIA'
       |    WHEN mc = 0 AND mdel > 0 THEN 'DELETED_ALL_MEDIA'
       |    WHEN mc > 400 AND CAST(mdel AS DOUBLE)/mc > 0.06 THEN 'DELETED_MANY_MEDIA'
       |    WHEN mc > 400 AND CAST(mcr AS DOUBLE)/mc > 0.4 THEN 'MANY_NEW_MEDIA'
       |    WHEN mdel > 0 AND CAST(mcr AS DOUBLE)/mdel > 0.9
       |      AND CAST(mcr AS DOUBLE)/mdel < 1.1
       |      AND CAST(mcr AS DOUBLE)/mc > 0.1 THEN 'MEDIA_CHURN'
       |  END AS tag
       |FROM ctr ORDER BY id""".stripMargin
  }

  def qIngestSummary(s: SparkSession, dir: String): DataFrame =
    StreamQueries.qResumeActions(s, dir)
      .groupBy(col("action")).agg(count(lit(1)).as("n"))
      .orderBy(col("action"))

  val qIngestSummarySql: String =
    s"""WITH actions AS (${StreamQueries.qResumeActionsSql})
       |SELECT action, COUNT(*) AS n FROM actions
       |GROUP BY action ORDER BY action""".stripMargin

  /** JSON-lines round trip through the driver gate: the documents
    * table is dumped via [[graft.ingest.JsonLines.write]] (one
    * {"id", "data"} object per line — the reference API's record dump
    * format), read back via [[graft.ingest.JsonLines.read]], and
    * reduced to per-source fidelity aggregates (row count, id sum,
    * char sum, an md5-derived content checksum of every text, and the
    * parse-flag count). The oracle computes the same aggregates
    * straight from the parquet, so any loss, mangling, duplication or
    * parse flag anywhere in dump→parse round trip goes gate-red.
    * Scale: the dump and the re-read are both line-parallel scans
    * (to_json/from_json are codegen expressions); the aggregate is the
    * only exchange, moving 20 reduced rows. */
  def qJsonl(s: SparkSession, dir: String): DataFrame = {
    // FIXED per-(jvm,sf) path, overwritten each call — a fresh temp
    // dir per invocation would leak one dump per run (see qGeohashPrune)
    val tmp = sys.props("java.io.tmpdir") +
      s"/graft_jsonl_${Integer.toHexString(dir.hashCode)}/docs"
    val docs = Tables.documents(s, dir).select(
      col("doc_id").cast("string").as("id"),
      map(lit("source"), col("source"),
          lit("n_chars"), col("n_chars").cast("string"),
          lit("text"), col("text")).as("data"))
    graft.ingest.JsonLines.write(docs, "id", "data", tmp)
    graft.ingest.JsonLines.read(s, tmp)
      .select(
        col("data")("source").as("source"),
        col("id").cast("long").as("idv"),
        col("data")("n_chars").cast("long").as("nc"),
        col("data")("text").as("text"),
        size(col("flags")).as("nflags"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"),
        sum(col("idv")).as("idsum"),
        sum(col("nc")).as("chars"),
        sum(conv(substring(md5(col("text")), 1, 15), 16, 10).cast("long")
            % 1000000007L)
          .as("checksum"),
        sum(col("nflags")).as("bad"))
      .orderBy(col("source"))
  }

  /** EML parser under the driver gate: one synthesized collection-
    * metadata document per `source` (title, creator with email,
    * bare-surname contact, rights, gbif logo URL) is parsed through
    * [[graft.ingest.Eml.parse]] and re-emitted as columns; the oracle
    * derives the same values directly, so any field the parser drops,
    * mangles or mis-scopes (title vs rights vs the nested logo path)
    * goes gate-red. Parsing is driver-side over ~20 bounded docs —
    * the recordsets-dimension shape, as in the reference. */
  def qEml(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sources = Tables.documents(s, dir).select(col("source")).distinct()
      .collect().map(_.getString(0)).sorted
    val rows = sources.toSeq.map { src =>
      val xml =
        s"""<eml><dataset>
           |<title>Collection $src</title>
           |<creator><individualName><givenName>Ada</givenName><surName>$src</surName></individualName>
           |<electronicMailAddress>$src@example.org</electronicMailAddress></creator>
           |<contact><individualName><surName>Curator-$src</surName></individualName></contact>
           |<intellectualRights>CC-BY $src</intellectualRights>
           |<additionalMetadata><metadata><gbif><resourceLogoUrl>http://logo.example/$src.png</resourceLogoUrl></gbif></metadata></additionalMetadata>
           |</dataset></eml>""".stripMargin
      val m = graft.ingest.Eml.parse(xml)
      (src, m.collectionName.orNull, m.rights.orNull, m.logoUrl.orNull,
        m.contacts.size.toLong, m.contacts.flatMap(_.email).headOption.orNull)
    }
    rows.toDF("source", "collection_name", "rights", "logo_url",
        "n_contacts", "first_email")
      .orderBy(col("source"))
  }

  val qEmlSql: String =
    """SELECT source,
      |  'Collection ' || source AS collection_name,
      |  'CC-BY ' || source AS rights,
      |  'http://logo.example/' || source || '.png' AS logo_url,
      |  CAST(2 AS BIGINT) AS n_contacts,
      |  source || '@example.org' AS first_email
      |FROM (SELECT DISTINCT source FROM documents)
      |ORDER BY source""".stripMargin

  /** RSS harvester under the driver gate: one synthesized feed with an
    * item per source — versioned IPT guids (recordId must strip the
    * /v2.1 suffix and lowercase), alternating eml/emllink tag
    * variants, rotating pubDates — parsed via Rss.parse, identified
    * via Rss.recordId, and diffed against a known-recordsets map
    * (even-indexed sources known at pubDate 2024-01-01). The emitted
    * (rid, title, eml_link, is_new, is_changed) row set is derived
    * independently by the oracle, so a parse, id-normalization or
    * diff regression goes gate-red. Driver-side over ~20 bounded
    * items — the harvest-loop shape. */
  def qRss(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sources = Tables.documents(s, dir).select(col("source")).distinct()
      .collect().map(_.getString(0)).sorted
    val items = sources.zipWithIndex.map { case (src, i) =>
      val emlTag =
        if (i % 2 == 0) s"<eml>http://eml.example/$src</eml>"
        else s"<emllink>http://eml.example/$src</emllink>"
      s"""<item><title>Feed $src</title>
         |<guid>http://ipt.example/resource?r=$src/v2.1</guid>
         |$emlTag
         |<pubDate>2024-01-0${i % 3 + 1}</pubDate></item>""".stripMargin
    }
    val feed = s"<rss><channel>${items.mkString("\n")}</channel></rss>"
    val entries = graft.ingest.Rss.parse(feed)
    val known: Map[String, String] = sources.zipWithIndex.collect {
      case (src, i) if i % 2 == 0 =>
        graft.ingest.Rss.recordId("http://ipt.example/",
          Some(s"http://ipt.example/resource?r=$src/v2.1")).get -> "2024-01-01"
    }.toMap
    val (fresh, changed) = graft.ingest.Rss.diff(
      entries.map(e => e.copy(
        id = graft.ingest.Rss.recordId("http://ipt.example/", e.id))),
      known)
    val freshIds = fresh.flatMap(_.id).toSet
    val changedIds = changed.flatMap(_.id).toSet
    val rows = sources.toSeq.zip(entries).map { case (src, e) =>
      val rid = graft.ingest.Rss.recordId("http://ipt.example/", e.id).get
      (src, rid, e.title.orNull, e.emlLink.orNull,
        freshIds.contains(rid), changedIds.contains(rid))
    }
    rows.toDF("source", "rid", "title", "eml_link", "is_new", "is_changed")
      .orderBy(col("source"))
  }

  val qRssSql: String =
    """WITH s AS (SELECT source,
      |    row_number() OVER (ORDER BY source) - 1 AS i
      |  FROM (SELECT DISTINCT source FROM documents))
      |SELECT source,
      |  lower('http://ipt.example/resource?r=' || source) AS rid,
      |  'Feed ' || source AS title,
      |  'http://eml.example/' || source AS eml_link,
      |  i % 2 = 1 AS is_new,
      |  i % 2 = 0 AND i % 3 != 0 AS is_changed
      |FROM s ORDER BY source""".stripMargin

  val qJsonlSql: String =
    """SELECT source, count(*) AS n,
      |  CAST(sum(doc_id) AS BIGINT) AS idsum,
      |  CAST(sum(n_chars) AS BIGINT) AS chars,
      |  CAST(sum(try_cast('0x' || substr(md5(text), 1, 15) AS BIGINT)
      |    % 1000000007) AS BIGINT) AS checksum,
      |  CAST(0 AS BIGINT) AS bad
      |FROM documents GROUP BY source ORDER BY source""".stripMargin
}
