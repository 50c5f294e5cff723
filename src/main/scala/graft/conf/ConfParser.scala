package graft.conf

/** Classic-mode config reader — the `[SECTION]` + `Key  Value` format the
  * reference's CLI consumes (`src/fluent-bit.c:368-530` flb_service_conf;
  * parser files `src/flb_parser.c:356-527`). Comments start with `#`;
  * keys are case-insensitive; a key's value is the rest of the line.
  */
object ConfParser {

  final case class Section(name: String, entries: Seq[(String, String)]) {
    def get(key: String): Option[String] =
      entries.collectFirst { case (k, v) if k.equalsIgnoreCase(key) => v }
    def getAll(key: String): Seq[String] =
      entries.collect { case (k, v) if k.equalsIgnoreCase(key) => v }
  }

  def parse(text: String): Seq[Section] = {
    val sections = scala.collection.mutable.ArrayBuffer.empty[Section]
    var current: Option[(String, scala.collection.mutable.ArrayBuffer[(String, String)])] = None
    text.linesIterator.foreach { raw =>
      val line = raw.trim
      if (line.nonEmpty && !line.startsWith("#")) {
        if (line.startsWith("[") && line.endsWith("]")) {
          current.foreach { case (n, es) => sections += Section(n, es.toSeq) }
          current = Some((line.substring(1, line.length - 1).toUpperCase, scala.collection.mutable.ArrayBuffer.empty))
        } else current match {
          case Some((_, es)) =>
            val sp = line.indexWhere(_.isWhitespace)
            if (sp > 0) es += ((line.substring(0, sp), line.substring(sp).trim))
            else es += ((line, ""))
          case None => // stray line outside any section — reference ignores
        }
      }
    }
    current.foreach { case (n, es) => sections += Section(n, es.toSeq) }
    sections.toSeq
  }
}
