package graft.export

import graft.dsl.{Predicate, QValue, Query, Term}
import graft.etl.FieldSchema

/** The §3.2 bulk-download composition — the reference's #1 user path
  * (idigbio_workers/lib/download.py).
  *
  * A download runs TWO queries, cross-injected (`generate_queries`,
  * download.py:360-430): the record side gains
  * `has_child{mediarecords: mq}` so only records with a matching media
  * child export, and the media side gains `has_parent{records: rq,
  * inner_hits: {_source: [scientificname, locality, ...]}}` so only
  * media of a matching record export — each media row carrying the
  * first matching parent's projected fields (consumed at
  * download.py:244-253 by the unique* id functions). The composed pair
  * then drives the archive members (`generate_dwca_files`, :478-577):
  * core CSV, raw-body extensions, the multimedia extension (whose
  * coreid is the media doc's first indexed parent, :235), both citation
  * files (:134-147) and the meta.xml manifest.
  *
  * This object holds the QUERY-LEVEL composition (pure AST/field-list
  * logic); the relational halves are
  * [[graft.store.RecordStore.innerHits]] (has_parent + carry) and
  * [[graft.store.RecordStore.hasChild]] / a plain semi-join, and the
  * member emission reuses [[Exports]] (csvFormat, uniquevals,
  * citationCounts, makeFileBlock/makeMeta, writeDwcaZip). The composed
  * gate is [[graft.queries.DownloadQueries]].
  */
object Download {

  /** inner_hits `_source` projection (download.py:385-388): the index
    * terms and their raw twins the unique* id functions read. */
  val innerHitsFields: Seq[String] = Seq(
    "scientificname", "locality",
    "data.dwc:scientificName", "data.dwc:locality")

  /** The composed query pair. `rq`/`mq` are each side's own and-list
    * (implicit AND, like the DSL root); the relational injections —
    * which our engine runs as joins, not predicates — surface as flags:
    * `rqHasChild` ⇔ the reference appended `has_child{mediarecords:mq}`
    * to rq_and (download.py:407-412), `mqHasParent` ⇔ it appended
    * `has_parent{records:rq, inner_hits}` to mq_and (:381-389).
    * `innerHits` is the parent `_source` list (empty when no parent
    * query, i.e. no carry). */
  final case class ComposedQueries(
      rq: Seq[Predicate],
      mq: Seq[Predicate],
      rqHasChild: Boolean,
      mqHasParent: Boolean,
      innerHits: Seq[String])

  /** `generate_queries` (download.py:360-430). Empty queries normalize
    * to absent (:373-376 treats `{filtered:{filter:{}}}` as None); a
    * mediarecords core adds `hasImage: true` to the RECORD side
    * (:366-371); absent sides contribute `match_all` (a no-op in an
    * AND-fold) and no relational injection. */
  def generateQueries(
      recordQuery: Option[Query],
      mediaQuery: Option[Query],
      coreType: String = "records"): ComposedQueries = {
    val rqOpt = recordQuery.filter(_.predicates.nonEmpty)
    val mqOpt = mediaQuery.filter(_.predicates.nonEmpty)
    val rqAnd =
      (if (coreType == "mediarecords") Seq(Term("hasImage", QValue.B(true)))
       else Seq.empty[Predicate]) ++
        rqOpt.map(_.predicates).getOrElse(Nil)
    val mqAnd = mqOpt.map(_.predicates).getOrElse(Nil)
    ComposedQueries(
      rq = rqAnd,
      mq = mqAnd,
      rqHasChild = mqOpt.isDefined,
      mqHasParent = rqOpt.isDefined,
      innerHits = if (rqOpt.isDefined) innerHitsFields else Nil)
  }

  /** Field-list split (generate_dwca_files, download.py:536-556):
    * quoted names are dropped (acceptable_field_name, :228-229),
    * `data.*` fields go to the raw member, the rest to the indexterms
    * member. Returns (indexterms fields, raw fields). */
  def splitFields(fields: Seq[String]): (Seq[String], Seq[String]) = {
    val keep = fields.filterNot(_.startsWith("\""))
    (keep.filterNot(_.startsWith("data.")), keep.filter(_.startsWith("data.")))
  }

  /** Index-field → long-name conversion for CSV headers / meta.xml
    * field terms (make_file, download.py:303-310): fields with no long
    * name are DROPPED from the member, exactly as the reference filters
    * `filtered_fields`. */
  def convertFields(t: String, fields: Seq[String]): Seq[String] =
    fields.flatMap(FieldSchema.longNames.getOrElse(t, Map.empty).get)

  /** Raw-member header names (make_file, download.py:301-302): strip
    * the `data.` prefix, keep the raw term. */
  def rawFieldNames(fields: Seq[String]): Seq[String] =
    fields.map(_.stripPrefix("data."))

  /** Distributed download query-hash over a FLAT `map<string,string>`
    * params column — [[graft.hash.Etags.objectHasher]]'s recursion for
    * a dict of scalars (etags.py:41-79): each value hashes alone, the
    * dict hashes the concatenation of sorted `key ++ digest(value)`
    * pairs, None hashes as the empty string. md5 where the reference
    * passes "sha1" (v2_download.py:77) so the DuckDB oracle — which
    * has no sha1 — can replay the identical bytes; the recursion, the
    * key sort, and therefore the DEDUP EQUALITY the hash exists for
    * are digest-independent. Pure built-ins, stays in codegen. */
  def queryHashColumn(params: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val entries = array_sort(map_entries(params))
    md5(array_join(transform(entries,
      e => concat(e.getField("key"),
        md5(coalesce(e.getField("value"), lit(""))))), ""))
  }

  /** The download task dedup window (v2_download.py:77-99): a request's
    * params hash to a query key; unless `force`, the key's live redis
    * entry — the task most recently enqueued for that hash, valid for
    * `validHours` (QUERY_VALID_TIME = 23 h, :20) from its creation — is
    * REUSED, except when its task status reads FAILURE/UNKNOWN (:85-87);
    * every other path enqueues a fresh task. (The 30-day task-data TTL
    * is unreachable through this window: the 23 h hash key always dies
    * first, so a live hash implies live task data.)
    *
    * `requests`: (req_id, query_hash, req_time, force);
    * `tasks`: (query_hash, tid, created timestamp, task_status) — the
    * enqueue log. Decision per request:
    *   forced | no_task | expired | failed_status → enqueue;
    *   valid_task → reuse (with the reused tid).
    *
    * Shape: "latest task created ≤ req_time per request" is an AS-OF
    * join, executed as the union-and-window form: both streams union
    * with a row-kind tag, ONE window per query_hash ordered by
    * (time, kind, tid) carries each request the last preceding task
    * row via last(·, ignoreNulls) — cost is one shuffle + per-hash
    * sort, LINEAR in requests + tasks. (The naive equi-join on
    * query_hash then max_by is requests × tasks-per-hash — measured
    * quadratic death at the 100× stress: 40 hashes × 100× both sides
    * ≈ 47 B candidate pairs before the filter.) At equal timestamps
    * the task sorts before the request (a SET at t is visible to a
    * GET at t), and among same-instant re-enqueues the max tid wins
    * (the most-recently-SET convention the oracle replays). Output:
    * (req_id, query_hash, decision, reason, reused_tid). */
  def dedupDecisions(requests: org.apache.spark.sql.DataFrame,
      tasks: org.apache.spark.sql.DataFrame,
      validHours: Int = 23): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val createdType = tasks.schema("created").dataType
    val taskStruct = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("tid",
        tasks.schema("tid").dataType),
      org.apache.spark.sql.types.StructField("created", createdType),
      org.apache.spark.sql.types.StructField("task_status",
        tasks.schema("task_status").dataType)))
    // the task fields ride ONE struct through the window: three
    // independent last(ignoreNulls) calls would desynchronize on a task
    // row with a NULL field (tid from the newest task, status from an
    // older one)
    // a task with NULL `created` can never be the as-of pick: the
    // reference's redis entry always carries its SET time, so a NULL
    // stamp is corrupt input, and letting it through diverges the
    // engines (Spark's window sorts NULL _t first and carries the
    // task — the three-valued !valid then falls through to reuse —
    // while an oracle's `created <= req_time` join excludes it)
    val tRows = tasks.where(col("created").isNotNull).select(col("query_hash"),
      col("created").as("_t"), lit(1).as("_is_req"),
      col("tid").as("_tid"),
      struct(col("tid"), col("created"), col("task_status")).as("_task"),
      lit(null).cast(requests.schema("req_id").dataType).as("req_id"),
      lit(null).cast("boolean").as("force"),
      lit(null).cast(requests.schema("req_time").dataType).as("req_time"))
    val rRows = requests.select(col("query_hash"),
      col("req_time").as("_t"), lit(2).as("_is_req"),
      lit(null).cast(tasks.schema("tid").dataType).as("_tid"),
      lit(null).cast(taskStruct).as("_task"),
      col("req_id"), col("force"), col("req_time"))
    // tasks (kind 1) sort before requests (kind 2) at equal _t; among
    // tasks at one instant the LAST in (tid asc) order — max tid — is
    // what last() picks up
    val w = Window.partitionBy(col("query_hash"))
      .orderBy(col("_t"), col("_is_req"), col("_tid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = tRows.unionByName(rRows)
      .withColumn("_lt", last(col("_task"), ignoreNulls = true).over(w))
      .where(col("_is_req") === 2)
      .select(col("req_id"), col("query_hash"), col("req_time"),
        col("force"), col("_lt.tid").as("_tid"),
        col("_lt.created").as("_created"),
        col("_lt.task_status").as("_status"))
    val valid = col("req_time") <
      col("_created") + expr(s"INTERVAL $validHours HOURS")
    carried
      .select(col("req_id"), col("query_hash"),
        when(col("force"), lit("enqueue"))
          .when(col("_tid").isNull, lit("enqueue"))
          .when(!valid, lit("enqueue"))
          .when(col("_status").isin("FAILURE", "UNKNOWN"), lit("enqueue"))
          .otherwise(lit("reuse")).as("decision"),
        when(col("force"), lit("forced"))
          .when(col("_tid").isNull, lit("no_task"))
          .when(!valid, lit("expired"))
          .when(col("_status").isin("FAILURE", "UNKNOWN"),
            lit("failed_status"))
          .otherwise(lit("valid_task")).as("reason"),
        when(!col("force") && col("_tid").isNotNull && valid &&
            !col("_status").isin("FAILURE", "UNKNOWN"), col("_tid"))
          .as("reused_tid"))
  }
}
