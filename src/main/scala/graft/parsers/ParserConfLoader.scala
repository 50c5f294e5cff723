package graft.parsers

import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.conf.ConfParser

/** Load `[PARSER]` definitions from a parsers.conf text — the reference's
  * parser-file loader surface (`src/flb_parser.c:356-527`): Name, Format
  * (regex|json), Regex (with `/pat/` slash trimming handled by
  * [[ParserDef.cleanRegex]]), Time_Key/Time_Format/Time_Keep/Time_Offset,
  * `Types k:integer k2:float …` (`flb_parser.c:301-353`), and decoder
  * rules `Decode_Field_As <backend> <key>` (recorded; applied by callers
  * via [[graft.functions.Decoders]]).
  *
  * Group names: Onigmo allows `_` in named groups, java.util.regex does
  * not — the loader strips underscores from group names inside the
  * pattern and records the mapping in [[ParserDef.fieldAliases]] so the
  * OUTPUT record keys keep their original spelling (`pod_name` etc.).
  */
object ParserConfLoader {

  /** One decoder rule (`src/flb_parser_decoder.c:631-741` loader):
    * `Decode_Field <backend> <key> [action]` (decoded JSON appended as
    * EXTRA keys) vs `Decode_Field_As` (in-place value replacement), with
    * optional `try_next` (on failure, try the next rule) / `do_next`
    * (on success, keep going) action.
    */
  final case class DecoderRule(backend: String, key: String,
                               action: String = "", inPlace: Boolean = true)

  /** Sanitize Onigmo group names for java.util.regex: `pod_name` →
    * `podname` inside the pattern (underscores are invalid in Java group
    * names). Returns (rewritten pattern, sanitized→original name map).
    */
  def sanitizeGroupNames(pattern: String): (String, Map[String, String]) = {
    val rx = "\\(\\?<([A-Za-z0-9_]+)>".r
    var mapping = Map.empty[String, String]
    val rewritten = rx.replaceAllIn(pattern, m => {
      val orig = m.group(1)
      val clean = orig.replace("_", "")
      mapping += (clean -> orig)
      java.util.regex.Matcher.quoteReplacement(s"(?<$clean>")
    })
    (rewritten, mapping)
  }

  def load(text: String): Map[String, ParserDef] = {
    ConfParser.parse(text).filter(_.name == "PARSER").flatMap { s =>
      s.get("Name").map { name =>
        val format = s.get("Format").map(_.toLowerCase) match {
          case Some("regex") => RegexFormat
          case Some("json")  => JsonFormat
          case other => throw new IllegalArgumentException(s"parser $name: unsupported Format $other")
        }
        val (regex, aliases) = sanitizeGroupNames(s.get("Regex").getOrElse(""))
        val types: Map[String, String] = s.get("Types")
          .map(_.split("\\s+").flatMap { kv =>
            kv.split(":") match { case Array(k, t) => Some(k -> t); case _ => None }
          }.toMap).getOrElse(Map.empty)
        val timeKeep = s.get("Time_Keep").exists(v => v.equalsIgnoreCase("On") || v.equalsIgnoreCase("true"))
        val timeOffset = s.get("Time_Offset").map(graft.core.TimeParse.parseTzOffset).getOrElse(0)
        // decoder rules in ENCOUNTER order (the chain is order-sensitive)
        val decoders: Seq[DecoderRule] = s.entries.collect {
          case (k, v) if k.equalsIgnoreCase("Decode_Field") || k.equalsIgnoreCase("Decode_Field_As") =>
            val parts = v.trim.split("\\s+")
            val backend = parts(0).toLowerCase
            // backend validated at LOAD time like the reference's
            // flb_parser_decoder_list_create (unknown name → config error)
            if (!Set("escaped", "escaped_utf8", "json").contains(backend))
              throw new IllegalArgumentException(
                s"parser $name: unknown decoder backend '$backend'")
            val action = if (parts.length > 2) parts(2).toLowerCase else ""
            if (action.nonEmpty && action != "try_next" && action != "do_next")
              throw new IllegalArgumentException(
                s"parser $name: unknown decoder action '$action'")
            DecoderRule(backend = backend, key = parts(1), action = action,
              inPlace = k.equalsIgnoreCase("Decode_Field_As"))
        }
        name -> ParserDef(
          name = name,
          format = format,
          regex = regex,
          timeKey = s.get("Time_Key"),
          timeFormat = s.get("Time_Format"), // first Time_Format wins (like flb list order)
          timeKeep = timeKeep,
          timeOffsetSec = timeOffset,
          types = types,
          decoders = decoders,
          fieldAliases = aliases.filter { case (k, v) => k != v },
          jsonSchema = if (format == JsonFormat) Some(StructType(Seq(
            // schema-on-read default for conf-loaded json parsers: common
            // docker fields; callers with other shapes pass their own
            StructField("log", StringType), StructField("stream", StringType),
            StructField("time", StringType)))) else None)
      }
    }.toMap
  }
}
