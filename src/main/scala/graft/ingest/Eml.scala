package graft.ingest

/** EML metadata parser (idigbio_ingestion/lib/eml.py:13-172):
  * driver-side XML parse of a recordset's collection metadata — name,
  * contacts, rights, logo — feeding the recordsets dimension. */
object Eml {

  final case class Contact(firstName: Option[String], lastName: Option[String],
      email: Option[String], role: Option[String])

  final case class EmlMeta(
      collectionName: Option[String],
      rights: Option[String],
      logoUrl: Option[String],
      contacts: Seq[Contact])

  def parse(emlText: String): EmlMeta = {
    val root = scala.xml.XML.loadString(emlText)
    val ds = root \ "dataset"
    def textOf(n: scala.xml.NodeSeq): Option[String] = {
      val t = n.text.trim
      if (t.isEmpty) None else Some(t)
    }
    def contact(node: scala.xml.Node, role: Option[String]): Contact =
      Contact(
        textOf(node \ "individualName" \ "givenName"),
        textOf(node \ "individualName" \ "surName"),
        textOf(node \ "electronicMailAddress"),
        role)
    val contacts =
      (ds \ "creator").map(contact(_, Some("creator"))) ++
      (ds \ "metadataProvider").map(contact(_, Some("metadataProvider"))) ++
      (ds \ "contact").map(contact(_, Some("contact"))) ++
      (ds \ "associatedParty").map(n =>
        contact(n, textOf(n \ "role").orElse(Some("associatedParty"))))
    EmlMeta(
      collectionName = textOf(ds \ "title"),
      rights = textOf(ds \ "intellectualRights"),
      logoUrl = textOf(ds \ "additionalMetadata" \ "metadata" \ "gbif" \ "resourceLogoUrl")
        .orElse(textOf(root \\ "resourceLogoUrl")),
      contacts = contacts.distinct)
  }
}
