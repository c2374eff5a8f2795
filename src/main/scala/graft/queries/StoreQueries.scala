package graft.queries

import graft.Tables
import graft.store.RecordStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The versioned record store exercised end-to-end. The five store
  * tables are derived deterministically from `events` (the append log):
  * each user is a record entity, each event appends a version whose body
  * is the event's props, identifiers are event ids, and a sibling edge
  * links the record to a synthetic mediarecord entity. The DuckDB
  * oracle rebuilds the same model in SQL and must match the composed
  * `idigbio_uuids_data` view (db.py:37-108) row for row.
  */
object StoreQueries {

  /** events → store tables. The four derived tables that cost a
    * shuffle to build (the two distinct-ed registries, the
    * content-addressed body table, the version window over the log)
    * are staged once per (session, dir) via [[graft.Staging]] — nine
    * gates (the store/stream families) previously re-derived the whole
    * model from the raw event log each, so q_item_view's plan scanned
    * events.parquet 48 times and paid 40 exchanges (r21 plan audit).
    * In production these ARE the store's Postgres tables (db.py:
    * 266-316) — reading them as staged tables models the real read
    * path, exactly like the download:records/media/edges stagings.
    * `identifiers` stays a plain map-only projection (no shuffle to
    * save, and copying the full log into executor storage would cost
    * more than the scan it replaces). */
  def storeFrom(s: SparkSession, dir: String): RecordStore = {
    def staged(key: String)(b: => DataFrame): DataFrame =
      graft.Staging.stage(s, s"store:$key:$dir")(b)
    val ev = Tables.events(s, dir)
    val uuids = staged("uuids") {
      val recordUuids = ev.select(concat(lit("u"), col("user_id")).as("uuid"),
          lit("records").as("type"),
          concat(lit("rs"), col("user_id") % 5).as("parent"),
          (col("user_id") % 97 === 0).as("deleted"))
        .distinct()
      val mediaUuids = ev.select(concat(lit("m"), col("event_id") % 200).as("uuid"),
          lit("mediarecords").as("type"),
          concat(lit("rs"), col("event_id") % 5).as("parent"),
          lit(false).as("deleted"))
        .distinct()
      recordUuids.unionByName(mediaUuids)
    }
    val uuidsData = staged("vlog") {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      ev.select(
        concat(lit("u"), col("user_id")).as("uuids_id"),
        md5(col("props")).as("data_etag"),
        col("ts").as("modified"),
        (row_number().over(w) - 1).cast("long").as("version"))
    }
    val data = staged("data") {
      ev.select(md5(col("props")).as("etag"), col("props").as("data"))
        .distinct()
    }
    val identifiers = ev.select(
      concat(lit("ev:"), col("event_id")).as("identifier"),
      concat(lit("u"), col("user_id")).as("uuids_id"))
    val siblings = staged("sib") {
      ev.select(
        concat(lit("u"), col("user_id")).as("r1"),
        concat(lit("m"), col("event_id") % 200).as("r2"))
        .distinct()
    }
    RecordStore(uuids, data, uuidsData, identifiers, siblings)
  }

  private val modelSql =
    """ru AS (SELECT DISTINCT 'u' || user_id AS uuid,
      |         'rs' || (user_id % 5) AS parent,
      |         (user_id % 97 = 0) AS deleted
      |       FROM events),
      |vlog AS (SELECT 'u' || user_id AS uuids_id, md5(props) AS data_etag,
      |           ts AS modified, props,
      |           CAST(row_number() OVER (PARTITION BY user_id
      |             ORDER BY ts, event_id) - 1 AS BIGINT) AS version
      |         FROM events)""".stripMargin

  /** The composed store view: latest version + sorted recordids +
    * sibling media + content body, non-deleted records only. */
  def qStoreView(s: SparkSession, dir: String): DataFrame = {
    val st = storeFrom(s, dir)
    st.uuidsDataView
      .filter(col("type") === "records" && !col("deleted"))
      .select(
        col("uuid"), col("parent"), col("etag"), col("version"), col("modified"),
        array_join(col("recordids"), ",").as("recordids_csv"),
        size(element_at(col("siblings"), "mediarecords")).as("n_media"),
        // try_element_at: an empty mediarecords edge list is a null
        // first_media (DuckDB [1] semantics), not an ANSI OOB error
        try_element_at(element_at(col("siblings"), "mediarecords"), lit(1))
          .as("first_media"),
        col("data").as("body"))
      .orderBy(col("uuid"))
  }

  val qStoreViewSql: String =
    s"""WITH $modelSql,
       |latest AS (
       |  SELECT uuids_id, data_etag, modified, version, props FROM (
       |    SELECT *, row_number() OVER (PARTITION BY uuids_id
       |      ORDER BY modified DESC, version DESC) AS rn FROM vlog) WHERE rn = 1),
       |ids AS (SELECT 'u' || user_id AS uuids_id,
       |          list_sort(list('ev:' || event_id)) AS recordids
       |        FROM events GROUP BY 1),
       |sib AS (SELECT 'u' || user_id AS uuids_id,
       |          count(DISTINCT 'm' || (event_id % 200)) AS n_media,
       |          min('m' || (event_id % 200)) AS first_media
       |        FROM events GROUP BY 1)
       |SELECT ru.uuid, ru.parent, latest.data_etag AS etag, latest.version,
       |  latest.modified,
       |  array_to_string(ids.recordids, ',') AS recordids_csv,
       |  CAST(sib.n_media AS INT) AS n_media, sib.first_media,
       |  latest.props AS body
       |FROM ru
       |JOIN latest ON latest.uuids_id = ru.uuid
       |JOIN ids ON ids.uuids_id = ru.uuid
       |JOIN sib ON sib.uuids_id = ru.uuid
       |WHERE NOT ru.deleted
       |ORDER BY ru.uuid""".stripMargin

  /** The §3.1 ITEM-VIEW envelope — the reference's most-called read
    * path (`GET /v2/view/<type>/<uuid>` → `format_item`,
    * idb/data_api/v2.py:101-123 assembling :17-55; store read
    * `get_item`, idb/postgres_backend/db.py:318-346) — composed as ONE
    * gate over a uuid slice, in all three version modes:
    *
    *  - `latest` (version=None): the master query's latest-version
    *    lateral, `WHERE deleted=false` (db.py:344-346) — a deleted
    *    record 404s here;
    *  - `v0` (version=N): the all-versions join filtered to the
    *    requested version, which IGNORES the deleted flag
    *    (db.py:334-341 "Fetch by version ignores the deleted flag");
    *  - `all` (version=all): one row PER VERSION, ordered version ASC
    *    (db.py:321-332), deleted included.
    *
    * Envelope fields per format_item: the parent link (PARENT_MAP —
    * a record's parent is its recordset; the gate carries the linked
    * uuid, the url_for wrapper being server config), the sibling
    * links map's mediarecords list (sorted, as csv), the recordIds
    * list (sorted, as csv), and the version body. Every relational
    * piece is the store's own view ([[RecordStore.latestVersions]] /
    * identifiersView / siblingsView) — the gate makes the ASSEMBLY
    * and the version-mode asymmetry oracle-checked, not just the
    * pieces. One aggregate per view + uuid-keyed joins; at scale the
    * slice filter pushes to the uuid-bucketed store scan. */
  def qItemView(s: SparkSession, dir: String): DataFrame = {
    val st = storeFrom(s, dir)
    val requested = st.uuids
      .filter(col("type") === "records" &&
        expr("CAST(substr(uuid, 2) AS BIGINT) % 10 = 0"))
    val env0 = requested
      .join(st.identifiersView.withColumnRenamed("uuids_id", "uuid"),
        Seq("uuid"), "left")
      .join(st.siblingsView.withColumnRenamed("uuids_id", "uuid"),
        Seq("uuid"), "left")
      .select(col("uuid"), col("parent"), col("deleted"),
        array_join(col("recordids"), ",").as("recordids_csv"),
        array_join(element_at(col("siblings"), "mediarecords"), ",")
          .as("media_links_csv"))
    // env feeds all THREE variant legs — uncut, each leg re-expanded
    // the identifiers aggregation (over the map-only events projection)
    // and the two-level siblings aggregation (guide §7.2 duplicated
    // subtrees; the DownloadQueries.cutRegistered discipline). The cut
    // table is slice-sized (the %10 uuid sample plus csv strings).
    val env = {
      val (cut, rdd) = graft.operators.Graph.localCut(env0)
      graft.Staging.registerPinned(s, rdd)
      cut
    }
    val vers = st.uuidsData.withColumnRenamed("uuids_id", "uuid")
      .join(st.data.withColumnRenamed("etag", "_e"),
        col("data_etag") === col("_e"), "left")
      .select(col("uuid"), col("version"), col("data_etag").as("etag"),
        col("modified"), col("data").as("body"))
    val latest = st.latestVersions.withColumnRenamed("uuids_id", "uuid")
      .join(st.data.withColumnRenamed("etag", "_e"),
        col("etag") === col("_e"), "left")
      .select(col("uuid"), col("version"), col("etag"),
        col("modified"), col("data").as("body"))
    def shape(rows: DataFrame, variant: String) = rows
      .select(col("uuid"), lit(variant).as("variant"), col("version"),
        col("etag"), col("modified"), col("parent"),
        col("recordids_csv"), col("media_links_csv"), col("body"))
    shape(env.filter(!col("deleted")).join(latest, Seq("uuid")), "latest")
      .unionByName(shape(env.join(vers, Seq("uuid")), "all"))
      .unionByName(shape(env.join(vers.filter(col("version") === 0L),
        Seq("uuid")), "v0"))
      .orderBy(col("uuid"), col("variant"), col("version"))
  }

  val qItemViewSql: String =
    s"""WITH $modelSql,
       |req AS (SELECT uuid, parent, deleted FROM ru
       |        WHERE CAST(substr(uuid, 2) AS BIGINT) % 10 = 0),
       |ids AS (SELECT 'u' || user_id AS uuid,
       |          array_to_string(list_sort(list('ev:' || event_id)), ',')
       |            AS recordids_csv
       |        FROM events GROUP BY 1),
       |sib AS (SELECT 'u' || user_id AS uuid,
       |          array_to_string(list_sort(
       |            list(DISTINCT 'm' || (event_id % 200))), ',')
       |            AS media_links_csv
       |        FROM events GROUP BY 1),
       |env AS (SELECT req.uuid, req.parent, req.deleted,
       |          ids.recordids_csv, sib.media_links_csv
       |        FROM req JOIN ids USING (uuid) JOIN sib USING (uuid)),
       |vers AS (SELECT uuids_id AS uuid, version, data_etag AS etag,
       |           modified, props AS body FROM vlog),
       |latest AS (SELECT uuid, version, etag, modified, body FROM (
       |  SELECT v.*, row_number() OVER (PARTITION BY uuid
       |    ORDER BY modified DESC, version DESC) AS rn FROM vers v)
       |  WHERE rn = 1)
       |SELECT uuid, variant, version, etag, modified, parent,
       |  recordids_csv, media_links_csv, body FROM (
       |  SELECT e.uuid, 'latest' AS variant, l.version, l.etag,
       |    l.modified, e.parent, e.recordids_csv, e.media_links_csv,
       |    l.body
       |  FROM env e JOIN latest l USING (uuid) WHERE NOT e.deleted
       |  UNION ALL
       |  SELECT e.uuid, 'all', v.version, v.etag, v.modified, e.parent,
       |    e.recordids_csv, e.media_links_csv, v.body
       |  FROM env e JOIN vers v USING (uuid)
       |  UNION ALL
       |  SELECT e.uuid, 'v0', v.version, v.etag, v.modified, e.parent,
       |    e.recordids_csv, e.media_links_csv, v.body
       |  FROM env e JOIN vers v USING (uuid) WHERE v.version = 0
       |) ORDER BY uuid, variant, version""".stripMargin

  /** The §3.1 SUBITEM endpoint — `GET /v2/view/<t>/<uuid>/<subtype>`
    * (idb/data_api/v2.py:57-90): the paged children list of a parent
    * entity, each child in the `format_list_item` envelope (uuid,
    * etag, modified, version, parent — v2.py:17-35), plus `itemCount`
    * = the parent's TOTAL child count regardless of the page
    * (get_children_list / get_children_count,
    * idb/postgres_backend/db.py:387-425: `WHERE deleted=false AND
    * type=%s AND parent=%s ORDER BY uuid LIMIT %s OFFSET %s`).
    *
    * The gate drives every recordset parent through one page
    * (limit 7, offset 3) in a single frame. Paging executes on the
    * custom heap operator ([[graft.plans.TopKPerGroup]]) with
    * k = offset+limit per parent — bounded heaps on the one
    * parent-keyed shuffle, no full per-parent sort (the q_paging
    * discipline applied per group); the count is one aggregate joined
    * back on the parent key. */
  def qSubitemView(s: SparkSession, dir: String): DataFrame = {
    val limit = 7
    val offset = 3
    val st = storeFrom(s, dir)
    val children = st.uuids
      .filter(col("type") === "records" && !col("deleted"))
      .join(st.latestVersions.withColumnRenamed("uuids_id", "uuid"),
        Seq("uuid"))
    val page = graft.plans.TopKPerGroup.topKSorted(
        children, Seq("parent"), Seq("uuid" -> true),
        k = offset + limit, rankName = "rank")
      .where(col("rank") > offset)
    val counts = st.uuids
      .filter(col("type") === "records" && !col("deleted"))
      .groupBy(col("parent")).agg(count(lit(1)).as("item_count"))
    page.join(counts, Seq("parent"))
      .select(col("parent"), col("rank").cast("long").as("rank"),
        col("uuid"), col("etag"), col("version"), col("modified"),
        col("item_count"))
      .orderBy(col("parent"), col("rank"))
  }

  val qSubitemViewSql: String =
    s"""WITH $modelSql,
       |latest AS (SELECT uuids_id, data_etag, modified, version FROM (
       |  SELECT *, row_number() OVER (PARTITION BY uuids_id
       |    ORDER BY modified DESC, version DESC) AS rn FROM vlog)
       |  WHERE rn = 1),
       |kids AS (SELECT ru.uuid, ru.parent, l.data_etag AS etag,
       |    l.version, l.modified,
       |    CAST(row_number() OVER (PARTITION BY ru.parent
       |      ORDER BY ru.uuid) AS BIGINT) AS rank
       |  FROM ru JOIN latest l ON l.uuids_id = ru.uuid
       |  WHERE NOT ru.deleted),
       |cnt AS (SELECT parent, count(*) AS item_count FROM ru
       |        WHERE NOT deleted GROUP BY 1)
       |SELECT k.parent, k.rank, k.uuid, k.etag, k.version, k.modified,
       |  CAST(c.item_count AS BIGINT) AS item_count
       |FROM kids k JOIN cnt c USING (parent)
       |WHERE k.rank > 3 AND k.rank <= 10
       |ORDER BY k.parent, k.rank""".stripMargin

  /** The §3.3 INCREMENTAL index run — `idb index incremental` →
    * `type_yield_modified` (idb/indexing/index_from_postgres.py:68-160,
    * :323-325) composed as one gate:
    *
    *  - the WATERMARK is the index's own max datemodified, rounded UP
    *    to whole seconds (`utcfromtimestamp(ceil(ms/1000))`, :88-89 —
    *    the quirk is observable here because the fixture carries
    *    sub-second timestamps); the "already-indexed" prefix is
    *    modeled as every version before Jan 20;
    *  - the delta is EVERY VERSION of every record with
    *    modified > watermark (:92-96 — not just the latest; ES
    *    convergence depends on processing them in ascending modified
    *    order, which is the gate's output ordering);
    *  - each delta version runs the index_record dispatch: a
    *    tombstoned entity's post-watermark versions present the
    *    tombstone etag (delete_item's upsert, db.py:348-351) and
    *    become uuid-only DELETE actions; the rest carry the VERSION's
    *    body (not the entity's latest).
    *
    * Scale shape: one scalar watermark aggregate broadcast into a
    * predicate on the version log (at scale a modified-partitioned
    * log prunes to the delta's partitions), then key-aligned joins —
    * the full-run composition (q_index_run) restricted to the delta. */
  def qIndexRunIncr(s: SparkSession, dir: String): DataFrame = {
    val st = storeFrom(s, dir)
    val wm = st.uuidsData
      .where(col("modified") < lit("2024-01-20").cast("timestamp"))
      .agg(timestamp_seconds(
        ceil(unix_millis(max(col("modified")).cast("timestamp")) /
          lit(1000.0)).cast("long")).as("wm"))
    val reg = st.uuids.where(col("type") === "records")
    st.uuidsData.crossJoin(broadcast(wm))
      .where(col("modified") > col("wm"))
      .join(reg, col("uuids_id") === reg("uuid"))
      .join(st.data.withColumnRenamed("etag", "_e"),
        col("data_etag") === col("_e"), "left")
      .select(col("uuid"), col("version"), col("modified"),
        when(col("deleted"), "delete").otherwise("index").as("op"),
        when(col("deleted"),
            lit(graft.store.RecordStore.TombstoneEtag))
          .otherwise(col("data_etag")).as("etag"),
        when(col("deleted"), lit(null).cast("string"))
          .otherwise(col("data")).as("body"),
        when(col("deleted"), lit(null).cast("string"))
          .otherwise(col("parent")).as("parent"))
      .orderBy(col("modified"), col("uuid"), col("version"))
  }

  val qIndexRunIncrSql: String =
    s"""WITH $modelSql,
       |wm AS (SELECT make_timestamp(CAST(ceil(
       |    epoch_ms(max(modified))/1000.0) AS BIGINT) * 1000000) AS wm
       |  FROM vlog WHERE modified < TIMESTAMP '2024-01-20'),
       |delta AS (SELECT v.* FROM vlog v, wm WHERE v.modified > wm.wm)
       |SELECT v.uuids_id AS uuid, v.version, v.modified,
       |  CASE WHEN ru.deleted THEN 'delete' ELSE 'index' END AS op,
       |  CASE WHEN ru.deleted
       |    THEN '${graft.store.RecordStore.TombstoneEtag}'
       |    ELSE v.data_etag END AS etag,
       |  CASE WHEN ru.deleted THEN NULL ELSE v.props END AS body,
       |  CASE WHEN ru.deleted THEN NULL ELSE ru.parent END AS parent
       |FROM delta v JOIN ru ON ru.uuid = v.uuids_id
       |ORDER BY modified, uuid, version""".stripMargin

  /** has_child semi-join over the sibling-derived child arrays
    * (download.py:407-412): records with at least one even-numbered
    * mediarecord child. */
  def qHasChild(s: SparkSession, dir: String): DataFrame = {
    val st = storeFrom(s, dir)
    val media = st.siblings
      .groupBy(col("r2").as("media_id"))
      .agg(sort_array(collect_list(col("r1"))).as("records"))
      .filter(expr("CAST(substr(media_id, 2) AS INT) % 2 = 0"))
    val parents = st.uuids.filter(col("type") === "records" && !col("deleted"))
      .select(col("uuid"))
    st.hasChild(parents, media, "records", "uuid")
      .distinct()
      .orderBy(col("uuid"))
  }

  val qHasChildSql: String =
    """WITH ru AS (SELECT DISTINCT 'u' || user_id AS uuid,
      |              (user_id % 97 = 0) AS deleted FROM events),
      |sib AS (SELECT DISTINCT 'u' || user_id AS r1,
      |          'm' || (event_id % 200) AS r2 FROM events)
      |SELECT DISTINCT ru.uuid FROM ru
      |WHERE NOT ru.deleted AND EXISTS (
      |  SELECT 1 FROM sib
      |  WHERE sib.r1 = ru.uuid
      |    AND CAST(substr(sib.r2, 2) AS INT) % 2 = 0)
      |ORDER BY ru.uuid""".stripMargin

  /** version+1 assignment for an incoming batch (db.py:144-155): the
    * next version per uuid is max(existing)+1, via one aggregate of the
    * log — SURVEY §2.5's missing window pattern, done without a window. */
  def qVersionAssign(s: SparkSession, dir: String): DataFrame = {
    val st = storeFrom(s, dir)
    val incoming = st.uuids.filter(col("type") === "records")
      .select(col("uuid"), md5(col("uuid")).as("etag"))
    st.assignVersions(incoming)
      .select(col("uuid"), col("version").as("next_version"))
      .orderBy(col("uuid"))
  }

  val qVersionAssignSql: String =
    """WITH ru AS (SELECT DISTINCT 'u' || user_id AS uuid FROM events),
      |counts AS (SELECT 'u' || user_id AS uuid, COUNT(*) AS n
      |           FROM events GROUP BY 1)
      |SELECT ru.uuid, CAST(counts.n AS BIGINT) AS next_version
      |FROM ru JOIN counts USING (uuid) ORDER BY uuid""".stripMargin

  /** Content-addressed write dedup (db.py:132-138): how many of an
    * incoming batch's bodies are genuinely new. */
  def qEtagDedup(s: SparkSession, dir: String): DataFrame = {
    val st = storeFrom(s, dir)
    // incoming: all day-1 bodies plus a synthetic new one per user
    val ev = Tables.events(s, dir)
    val incoming = ev.filter(to_date(col("ts")) === "2024-01-01")
      .select(md5(col("props")).as("etag"))
      .unionAll(ev.select(md5(concat(lit("new"), col("user_id"))).as("etag")))
      .distinct()
    st.newBodies(incoming)
      .orderBy(col("etag"))
  }

  val qEtagDedupSql: String =
    """WITH store_etags AS (SELECT DISTINCT md5(props) AS etag FROM events),
      |incoming AS (
      |  SELECT DISTINCT md5(props) AS etag FROM events
      |  WHERE CAST(ts AS DATE) = DATE '2024-01-01'
      |  UNION
      |  SELECT DISTINCT md5('new' || user_id) FROM events)
      |SELECT etag FROM incoming
      |WHERE etag NOT IN (SELECT etag FROM store_etags)
      |ORDER BY etag""".stripMargin

  /** The ANNOTATIONS store (idb/annotations/loader.py:20-50 +
    * apply.py:34-45): community/ePANDDA corrections submitted against
    * a record, upserted by source_id —
    * `INSERT ... ON CONFLICT (source_id) DO UPDATE SET v, updated_at`.
    * The conflict clause is the whole semantic: a re-submission
    * replaces ONLY the annotation body and timestamp; the row's
    * identity (the annotated record `uuids_id`, the submitting
    * `source`, the moderation `approved` flag) keeps its FIRST-insert
    * value — loader.py's DO UPDATE lists exactly v and updated_at, so
    * a resubmitted annotation never re-targets, re-attributes, or
    * self-approves. Replayed relationally as one aggregate over the
    * submission log: min_by(·, arrival) for the insert-only columns,
    * max_by(·, arrival) for the upserted ones, count(*) as the
    * submission tally (get_annotations' per-record fetch is then a
    * uuids_id-keyed read of this view).
    *
    * The submission stream derives from `events` (the harness append
    * log): event_id % 200 forms the source_id conflict key (~heavy
    * multi-submission traffic), arrival order is event_id — the
    * executemany iteration order of the reference loader.
    *
    * Scale shape: ONE hash aggregation keyed by source_id with
    * map-side combine (min_by/max_by/count are all mergeable); at
    * 100 TB the store is maintained per ingest batch by the same
    * merge, never re-scanned. */
  def qAnnotations(s: SparkSession, dir: String): DataFrame =
    graft.store.RecordStore.annotationsUpsert(
      Tables.events(s, dir)
        .select(
          concat(lit("ann"), col("event_id") % 200).as("source_id"),
          concat(lit("u"), col("user_id") % 50).as("uuids_id"),
          lower(col("props")).as("v"), // loader.py json.dumps(v).lower()
          col("event_type").as("source"),
          (col("value") > 0.5).as("approved"),
          col("ts").as("updated_at"),
          col("event_id").as("arr")))
      .select(col("source_id"), col("uuids_id"), col("v"), col("source"),
        col("approved"), col("updated_at"), col("n_submits"))
      .orderBy(col("source_id"))

  val qAnnotationsSql: String =
    """WITH sub AS (
      |  SELECT 'ann' || (event_id % 200) AS source_id,
      |    'u' || (user_id % 50) AS uuids_id,
      |    lower(props) AS v,
      |    event_type AS source,
      |    value > 0.5 AS approved,
      |    ts AS updated_at,
      |    event_id AS arr
      |  FROM events)
      |SELECT source_id,
      |  min_by(uuids_id, arr) AS uuids_id,
      |  max_by(v, arr) AS v,
      |  min_by(source, arr) AS source,
      |  min_by(approved, arr) AS approved,
      |  max_by(updated_at, arr) AS updated_at,
      |  count(*) AS n_submits
      |FROM sub GROUP BY 1 ORDER BY source_id""".stripMargin
}
