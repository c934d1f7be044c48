package graft.ext

import java.io.StringReader

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** sitemap.xml — the FRONTIER-SEEDING side of the crawl door
  * (sitemaps.org protocol 0.9): a host's robots.txt names sitemap URLs
  * ([[Robots.sitemapTable]]); each sitemap is either a `<urlset>` of
  * page entries (loc, lastmod, priority) or a `<sitemapindex>` naming
  * child sitemaps, and ships plain or gzipped.
  *
  * Parsing is StAX pull (the [[graft.osm.OsmXml]] discipline: external
  * entities and DTDs off, local names only so namespace prefixes are
  * irrelevant), per host on executors — sitemaps are KB–MB documents at
  * millions-of-hosts scale, so the natural sharding is one body per
  * row, never a driver-side parse.
  */
object Sitemaps {

  /** One sitemap entry: `kind` is `url` (a page, from a urlset) or
    * `sitemap` (a child sitemap, from a sitemapindex). `lastmod` and
    * `priority` are kept VERBATIM as written (W3C datetime / decimal
    * strings — interpreting them is the consumer's typed decision).
    */
  final case class Entry(kind: String, loc: String,
    lastmod: Option[String], priority: Option[String])

  /** Pull-parse one sitemap document. Entries are `<url>` children of
    * `<urlset>` and `<sitemap>` children of `<sitemapindex>`; within an
    * entry, `loc`/`lastmod`/`priority` text is gathered and trimmed. An
    * entry without a `loc` is malformed and dropped. Unknown elements
    * are ignored (the protocol allows extensions).
    */
  def parseXml(xml: String): Seq[Entry] = {
    val factory = XMLInputFactory.newInstance()
    factory.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES,
      false)
    factory.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    val r = factory.createXMLStreamReader(new StringReader(xml))
    val out = Seq.newBuilder[Entry]
    var kind: String = null // inside a <url> or <sitemap> entry
    var field: String = null // inside loc/lastmod/priority
    var loc, lastmod, priority: StringBuilder = null
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "url" | "sitemap" if kind == null =>
              kind = if (r.getLocalName == "url") "url" else "sitemap"
              loc = new StringBuilder
              lastmod = null
              priority = null
            case "loc" if kind != null => field = "loc"
            case "lastmod" if kind != null =>
              field = "lastmod"; lastmod = new StringBuilder
            case "priority" if kind != null =>
              field = "priority"; priority = new StringBuilder
            case _ => // urlset/sitemapindex roots, extensions — ignored
          }
        case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
          if (field != null) {
            val sb = field match {
              case "loc" => loc
              case "lastmod" => lastmod
              case _ => priority
            }
            sb.append(r.getText)
          }
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "loc" | "lastmod" | "priority" => field = null
            case "url" | "sitemap" if kind != null =>
              val l = loc.toString.trim
              if (l.nonEmpty)
                out += Entry(kind, l,
                  Option(lastmod).map(_.toString.trim).filter(_.nonEmpty),
                  Option(priority).map(_.toString.trim).filter(_.nonEmpty))
              kind = null
            case _ =>
          }
        case _ =>
      }
    }
    r.close()
    out.result()
  }

  /** Single-stream gzip (a `.xml.gz` sitemap is ONE member, unlike the
    * per-record members of a `.warc.gz`).
    */
  def gunzip(bytes: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try in.readAllBytes() finally in.close()
  }

  def gzip(bytes: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.util.zip.GZIPOutputStream(bos)
    out.write(bytes)
    out.close()
    bos.toByteArray
  }

  /** Frontier seeds from fetched sitemap bodies: per (host, body, gz)
    * row, the parsed entries as
    * (hostCol, kind, loc, lastmod, priority) — a narrow flatMap, one
    * body per task row.
    */
  def seeds(df: DataFrame, hostCol: String, bodyCol: String,
      gzCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(hostCol).cast("string"), col(bodyCol), col(gzCol))
      .as[(String, Array[Byte], Boolean)]
      .flatMap { case (host, body, gz) =>
        val xml = new String(if (gz) gunzip(body) else body, "UTF-8")
        parseXml(xml).map(e =>
          (host, e.kind, e.loc, e.lastmod.orNull, e.priority.orNull))
      }
      .toDF(hostCol, "kind", "loc", "lastmod", "priority")
  }
}
