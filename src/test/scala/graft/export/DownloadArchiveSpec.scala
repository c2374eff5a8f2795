package graft.export

import graft.SparkSpec
import graft.ingest.Dwca
import graft.queries.DownloadQueries
import org.apache.spark.sql.functions._

/** The composed §3.2 download, PHYSICALLY: [[DownloadQueries
  * .writeArchive]] writes the real zip (CSV members through the
  * csvFormat encoding, citation files, meta.xml), and the full
  * [[Dwca]] reader parses it back — the bulk-download writer and the
  * archive reader gated against each other over the same composed
  * relations the q_download manifest hashes. */
class DownloadArchiveSpec extends SparkSpec {

  test("writeArchive -> unzip -> Dwca.read round-trips the composed " +
      "download: member row counts match the q_download manifest, " +
      "core columns carry the long-named terms, the media extension " +
      "joins back through coreid, and the DSL filters survive") {
    val dir = "/root/testdata/sf0.001"
    val base = sys.props("java.io.tmpdir") + "/graft_download_archive"
    new java.io.File(base).mkdirs()
    val zip = DownloadQueries.writeArchive(spark, dir, s"$base/download.zip")
    val unzipped = Dwca.unzip(zip, target = Some(s"$base/x"))
    val (core, exts) = Dwca.read(spark, unzipped)

    val manifest = DownloadQueries.qDownload(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(manifest("occurrence.csv") > 0, "fixture must export rows")
    assert(core.count() === manifest("occurrence.csv"))
    val media = exts("dwc:Multimedia")
    assert(media.count() === manifest("multimedia.csv"))
    val raw = exts("dwc:Occurrence")
    assert(raw.count() === manifest("occurrence_raw.csv"))

    // the DSL record filter survives the round trip: every exported
    // genus is one of the terms-OR values, every locality matches the
    // prefix
    val genera = core.select(lower(col("`dwc:genus`"))).distinct()
      .collect().map(_.getString(0)).toSet
    assert(genera.nonEmpty &&
      genera.subsetOf(Set("genus1", "genus3", "genus5")))
    assert(core.where(!lower(col("`dwc:locality`"))
      .startsWith("locality 1")).count() === 0)
    // the media filter survives too
    assert(media.where(col("`dcterms:format`") =!= "image/jpeg")
      .count() === 0)

    // occurrence_raw is the 1:1 raw-body twin of the core (coreid =
    // the record's own id, make_file's non-core id_field)
    assert(Dwca.joinExtension(core, raw)
      .where(col("id").isNull).count() === 0)
    assert(raw.select(col("props")).where(col("props").isNull)
      .count() === 0, "every raw row carries the latest stored body")

    // multimedia coreids are first INDEXED parents — some resolve into
    // the rq-filtered core, and unresolved ones are the documented
    // records[0]-outside-the-export case, never an empty coreid here
    val joined = Dwca.joinExtension(core, media)
    assert(joined.where(col("coreid") === "").count() === 0)
    assert(joined.where(col("id").isNotNull).count() > 0,
      "at least one media row must resolve to an exported core record")

    // citation files ride in the zip (no meta block, like the
    // reference's FileArtifact(meta_block=None))
    val names = new java.io.File(unzipped).list().toSet
    assert(names.contains("records.citation.csv"))
    assert(names.contains("mediarecords.citation.csv"))
    val metaText = java.nio.file.Files.readString(
      java.nio.file.Paths.get(unzipped, "meta.xml"))
    assert(!metaText.contains("citation"),
      "citation files must not appear in meta.xml")
  }
}
