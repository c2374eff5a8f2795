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
}
