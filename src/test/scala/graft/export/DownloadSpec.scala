package graft.export

import graft.SparkSpec
import graft.dsl.{Prefix, QValue, Query, Term, Terms}
import graft.store.RecordStore
import org.apache.spark.sql.functions._

/** The §3.2 bulk-download composition contract
  * (idigbio_workers/lib/download.py:360-430, :536-556, :244-253):
  * query cross-injection flags, field-list splitting, and the
  * has_parent + inner_hits first-matching-parent carry. */
class DownloadSpec extends SparkSpec {
  import spark.implicits._

  private val rq = Query.parse(
    """{"genus": ["a", "b"], "locality": {"type": "prefix", "value": "x"}}""")
  private val mq = Query.parse("""{"format": "image/jpeg"}""")

  test("generateQueries: both sides present cross-inject — record side " +
      "gains has_child, media side gains has_parent with the inner_hits " +
      "_source list (download.py:381-412)") {
    val cq = Download.generateQueries(Some(rq), Some(mq))
    assert(cq.rqHasChild && cq.mqHasParent)
    assert(cq.innerHits == Seq("scientificname", "locality",
      "data.dwc:scientificName", "data.dwc:locality"))
    assert(cq.rq == rq.predicates && cq.mq == mq.predicates)
  }

  test("generateQueries: absent or EMPTY queries normalize to no " +
      "injection (download.py:373-376), and a mediarecords core adds " +
      "hasImage:true to the RECORD side (:366-371)") {
    val none = Download.generateQueries(None, None)
    assert(!none.rqHasChild && !none.mqHasParent && none.innerHits.isEmpty)
    assert(none.rq.isEmpty && none.mq.isEmpty)
    val empty = Download.generateQueries(Some(Query(Nil)), Some(Query(Nil)))
    assert(!empty.rqHasChild && !empty.mqHasParent,
      "the empty query is match-all — no relational injection")
    val mediaCore = Download.generateQueries(None, Some(mq), "mediarecords")
    assert(mediaCore.rq == Seq(Term("hasImage", QValue.B(true))),
      "media core constrains records to hasImage")
    assert(mediaCore.rqHasChild && !mediaCore.mqHasParent)
  }

  test("splitFields: quoted names dropped, data.* to raw, rest to " +
      "indexterms, order preserved (download.py:536-556); raw header " +
      "names strip the data. prefix (:301-302)") {
    val (idx, raw) = Download.splitFields(
      Seq("genus", "data.dwc:locality", "\"bad", "locality", "data.props"))
    assert(idx == Seq("genus", "locality"))
    assert(raw == Seq("data.dwc:locality", "data.props"))
    assert(Download.rawFieldNames(raw) == Seq("dwc:locality", "props"))
  }

  test("convertFields: long-name conversion DROPS fields with no long " +
      "name instead of passing them through (download.py:303-310)") {
    val out = Download.convertFields("records",
      Seq("genus", "nosuchfield", "scientificname"))
    assert(out == Seq("dwc:genus", "dwc:scientificName"))
  }

  test("innerHits: each child carries the FIRST (smallest-key) matching " +
      "parent's columns; children with no matching parent drop out; " +
      "non-matching parents never contribute a hit (download.py:244-253)") {
    val parents = Seq(
      ("u10", "Genus one", "Loc A", true),
      ("u2", "Genus two", "Loc B", true),
      ("u3", "Genus three", "Loc C", false)) // does not match the query
      .toDF("uuid", "sci", "loc", "matches")
    val children = Seq(("m1", "image/jpeg"), ("m2", "image/jpeg"),
      ("m3", "image/jpeg")).toDF("media_uuid", "format")
    val edges = Seq(
      ("m1", "u10"), ("m1", "u2"), // two matching parents
      ("m2", "u3"),                // only a non-matching parent
      ("m3", "u2")).toDF("r2", "r1")
    val out = RecordStore.innerHits(
        children, "media_uuid",
        parents.where(col("matches")), "uuid",
        edges, "r2", "r1",
        carry = Seq("sci" -> "sci", "loc" -> "loc"),
        hitKeyName = "parent_uuid")
      .select("media_uuid", "parent_uuid", "sci", "loc")
      .as[(String, String, String, String)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      // "u10" < "u2" lexicographically — the deterministic first hit
      ("m1", "u10", "Genus one", "Loc A"),
      ("m3", "u2", "Genus two", "Loc B")))
  }

  test("unique-core meta: the locality uniquevals file IS the core " +
      "(rowType Location, value + idigbio:itemCount fields); occurrence " +
      "and multimedia ride as extensions; the raw member is dropped on " +
      "its empty field list (download.py:297-298, :318-345, :558-568)") {
    val meta = graft.queries.DownloadQueries.metaXmlUnique
    val coreAt = meta.indexOf("<core ")
    assert(coreAt >= 0 && meta.indexOf("<core ", coreAt + 1) < 0,
      "exactly one core block")
    assert(meta.contains("<location>locality.csv</location>"))
    assert(meta.contains(
      """rowType="http://rs.tdwg.org/dwc/terms/Location""""))
    assert(meta.contains(
      """term="http://portal.idigbio.org/terms/itemCount""""))
    assert(!meta.contains("occurrence_raw"),
      "empty raw field list must drop the member")
    // the media extension's id under a unique core is
    // uuid5(locality-namespace, FIRST matching parent's locality) —
    // carry value and id function composed (download.py:244-253):
    // column and driver implementations must agree on the carry
    val s2 = spark
    import s2.implicits._
    val ids = Seq("Locality 1", "Locality 10", "")
      .toDF("parent_locality")
      .select(Exports.identifyLocality(col("parent_locality")))
      .as[String].collect().toSeq
    assert(ids == Seq("Locality 1", "Locality 10", "")
      .map(Exports.uuid5(Exports.localityNamespace, _)))
  }

  test("metaXml member blocks: core first with expanded term URIs; " +
      "extensions carry coreid index 0 (download.py:558, meta_xml.py)") {
    val meta = graft.queries.DownloadQueries.metaXml
    val coreAt = meta.indexOf("<core ")
    val extAt = meta.indexOf("<extension ")
    assert(coreAt >= 0 && extAt > coreAt, "core block must come first")
    assert(meta.contains(
      """term="http://rs.tdwg.org/dwc/terms/scientificName""""))
    assert(meta.contains("""term="http://rs.tdwg.org/ac/terms/accessURI""""))
    assert(meta.contains("""<id index="0" />"""))
    assert(meta.contains("""<coreid index="0" />"""))
    // the raw member's field survives un-prefixed (no namespace)
    assert(meta.contains("""term="props""""))
  }

  test("queryHashColumn: matches the driver-side objectHasher recursion " +
      "for a flat string dict (etags.py:41-79 — md5 variant), and key " +
      "order does not matter") {
    import graft.hash.Etags
    import graft.hash.Etags.V
    val expect = Etags.objectHasher("md5", V.O(Seq(
      "rq" -> V.S("genus:q7"), "form" -> V.S("dwca-csv"),
      "core_type" -> V.S("records"))))
    val got = Seq(1).toDF("x").select(
      Download.queryHashColumn(map(
        lit("core_type"), lit("records"),
        lit("rq"), lit("genus:q7"),
        lit("form"), lit("dwca-csv"))).as("h"))
      .collect().head.getString(0)
    assert(got === expect)
  }

  test("dedupDecisions: the v2_download dedup window (77-99) — forced, " +
      "missing, expired, failed-status enqueue; a valid most-recently-" +
      "set task is reused; most-recent wins among candidates") {
    val t0 = java.sql.Timestamp.valueOf("2024-03-01 00:00:00")
    def ts(hours: Double) = new java.sql.Timestamp(
      t0.getTime + (hours * 3600 * 1000).toLong)
    val tasks = Seq(
      // hash A: an old SUCCESS (expired for late requests) and a
      // fresh SUCCESS — most-recently-set wins
      ("A", "t1", ts(0), "SUCCESS"),
      ("A", "t2", ts(30), "SUCCESS"),
      // hash B: latest is FAILURE (an older SUCCESS must NOT rescue it
      // — redis holds only the last-set tid)
      ("B", "t3", ts(0), "SUCCESS"),
      ("B", "t4", ts(1), "FAILURE"),
      // hash C: valid but created AFTER the request (not yet set)
      ("C", "t5", ts(50), "SUCCESS"))
      .toDF("query_hash", "tid", "created", "task_status")
    val requests = Seq(
      ("r1", "A", ts(31), false),  // fresh t2 valid → reuse t2
      ("r2", "A", ts(31), true),   // forced → enqueue
      ("r3", "A", ts(54), false),  // t2 + 23h = 53h < 54h → expired
      ("r4", "B", ts(2), false),   // latest is FAILURE → enqueue
      ("r5", "C", ts(10), false),  // only future task → no_task
      ("r6", "D", ts(10), false))  // unseen hash → no_task
      .toDF("req_id", "query_hash", "req_time", "force")
    val got = Download.dedupDecisions(requests, tasks)
      .orderBy("req_id")
      .collect()
      .map(r => (r.getString(0), r.getString(2), r.getString(3),
        Option(r.getString(4))))
    assert(got.toSeq === Seq(
      ("r1", "reuse", "valid_task", Some("t2")),
      ("r2", "enqueue", "forced", None),
      ("r3", "enqueue", "expired", None),
      ("r4", "enqueue", "failed_status", None),
      ("r5", "enqueue", "no_task", None),
      ("r6", "enqueue", "no_task", None)))
  }

  test("dedupDecisions: the boundary is exact — a request exactly " +
      "23 h after creation is expired (redis TTL), one ms before is " +
      "valid") {
    val t0 = java.sql.Timestamp.valueOf("2024-03-01 00:00:00")
    def ms(m: Long) = new java.sql.Timestamp(t0.getTime + m)
    val tasks = Seq(("A", "t1", ms(0), "SUCCESS"))
      .toDF("query_hash", "tid", "created", "task_status")
    val edge = 23L * 3600 * 1000
    val requests = Seq(
      ("r1", "A", ms(edge - 1), false),
      ("r2", "A", ms(edge), false))
      .toDF("req_id", "query_hash", "req_time", "force")
    val got = Download.dedupDecisions(requests, tasks)
      .orderBy("req_id").collect().map(r => (r.getString(0), r.getString(3)))
    assert(got.toSeq === Seq(("r1", "valid_task"), ("r2", "expired")))
  }
}
