package graft.ingest

/** Publisher RSS/IPT feed parsing
  * (idigbio_ingestion/update_publisher_recordset.py:155-349): the
  * driver-side harvest loop polls each publisher's feed, diffs the
  * entries against the recordsets dimension, and upserts changed rows.
  * Feed FETCH is environment-dependent; this module owns the parse +
  * diff logic, both pure.
  */
object Rss {

  /** One feed entry → candidate recordset row. */
  final case class Entry(
      title: Option[String],
      link: Option[String],
      emlLink: Option[String],
      id: Option[String],
      pubDate: Option[String])

  /** Parse an RSS 2.0 / IPT feed document (update_publisher_recordset
    * .py:199-349 pulls the same fields, tolerating missing tags). */
  def parse(xml: String): Seq[Entry] = {
    val root = scala.xml.XML.loadString(xml)
    (root \\ "item").map { item =>
      def t(names: String*): Option[String] =
        names.iterator
          .map(n => (item \ n).text.trim)
          .find(_.nonEmpty)
      Entry(
        title = t("title"),
        link = t("link"),
        // IPT feeds carry the EML link in ipt:eml / emllink variants
        emlLink = t("eml", "emllink", "ipt:eml"),
        id = t("guid", "id", "link"),
        pubDate = t("pubDate", "date"))
    }
  }

  /** id_func (update_publisher_recordset.py:61-96): the recordid
    * identity key for a feed entry — the entry's own id/guid, or for
    * Symbiota feeds (which carry only a `collid`) the portal's
    * collprofiles URL built from portal_url + collid. IPT ids drop a
    * trailing `/v<major>[.<minor>]` version suffix so re-published
    * versions keep one identity; the result is lowercased. */
  def recordId(portalUrl: String, id: Option[String],
      collid: Option[String] = None): Option[String] = {
    val base = id.orElse(collid.map(c =>
      s"${portalUrl}collections/misc/collprofiles.php?collid=$c"))
    val VersionSuffix = "^(.*)/v[0-9]*(\\.)?[0-9]*$".r
    base.map {
      case VersionSuffix(stem, _) => stem.toLowerCase
      case other => other.toLowerCase
    }
  }

  /** Diff feed entries against known recordsets: returns (new entries,
    * changed entries) by id; "changed" = pubDate differs (the
    * reference's harvest-date/etag comparison). */
  def diff(entries: Seq[Entry], known: Map[String, String])
      : (Seq[Entry], Seq[Entry]) = {
    val withId = entries.filter(_.id.isDefined)
    val fresh = withId.filterNot(e => known.contains(e.id.get))
    val changed = withId.filter(e => known.get(e.id.get) match {
      case Some(prev) => e.pubDate.exists(_ != prev)
      case None       => false
    })
    (fresh, changed)
  }
}
