package graft.pipeline

import scala.io.Source

/** S5 — the YAML config source (`config.example.yaml`,
  * `update_ways_metadata.py:133-134`): driver-side configuration, never a
  * DataFrame. The reference's file is a two-level map (section → key →
  * scalar); this hand-rolled subset parser covers exactly that shape
  * (zero-egress env: no YAML library), with quoted strings and comments.
  */
case class EngineConfig(sections: Map[String, Map[String, String]]) {
  def apply(section: String): Map[String, String] =
    sections.getOrElse(section, Map.empty)
  def get(section: String, key: String): Option[String] =
    sections.get(section).flatMap(_.get(key))
}

object EngineConfig {

  def parse(text: String): EngineConfig = {
    val sections = scala.collection.mutable.LinkedHashMap
      .empty[String, scala.collection.mutable.LinkedHashMap[String, String]]
    var current: Option[String] = None
    for (raw <- text.linesIterator) {
      val noComment = stripComment(raw)
      if (noComment.trim.nonEmpty) {
        val indented = noComment.startsWith(" ") || noComment.startsWith("\t")
        val line = noComment.trim
        line.indexOf(':') match {
          case -1 => // bare scalar line — not in the reference shape; skip
          case i =>
            val key = line.substring(0, i).trim
            val value = unquote(line.substring(i + 1).trim)
            if (!indented) {
              current = Some(key)
              sections.getOrElseUpdate(key,
                scala.collection.mutable.LinkedHashMap.empty)
              if (value.nonEmpty) // top-level scalar: keep under ""
                sections(key)("") = value
            } else current.foreach { s => sections(s)(key) = value }
        }
      }
    }
    EngineConfig(sections.map { case (k, v) => k -> v.toMap }.toMap)
  }

  def load(path: String): EngineConfig = {
    val src = Source.fromFile(path, "UTF-8")
    try parse(src.mkString) finally src.close()
  }

  private def stripComment(line: String): String = {
    // strip an unquoted trailing comment
    var inQuote = false
    val sb = new StringBuilder
    for (c <- line) {
      if (c == '"' || c == '\'') inQuote = !inQuote
      if (c == '#' && !inQuote) return sb.toString
      sb += c
    }
    sb.toString
  }

  private def unquote(s: String): String =
    if (s.length >= 2 &&
      ((s.head == '"' && s.last == '"') || (s.head == '\'' && s.last == '\'')))
      s.substring(1, s.length - 1)
    else s
}
