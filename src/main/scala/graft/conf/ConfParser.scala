package graft.conf

/** Classic-mode config reader — the `[SECTION]` + `Key  Value` format the
  * reference's CLI consumes (`src/fluent-bit.c:368-530` flb_service_conf;
  * parser files `src/flb_parser.c:356-527`). Comments start with `#`;
  * keys are case-insensitive; a key's value is the rest of the line.
  *
  * Values go through environment-variable translation
  * (`src/flb_env.c:177` flb_env_var_translate): every `${NAME}` is
  * replaced from the config's variable store — `@SET` metas first, then
  * the real environment — with a `HOSTNAME` preset
  * (`flb_env.c:63-88`). An unset variable warns and substitutes the
  * empty string; a value that was ONLY an unset variable becomes `""`.
  * Meta commands (`@SET k=v`, `src/flb_meta.c:28-68`) may appear on any
  * line and, mirroring `src/fluent-bit.c:386-391` (all metas run before
  * section properties are applied), take effect file-wide regardless of
  * position.
  */
object ConfParser {

  final case class Section(name: String, entries: Seq[(String, String)]) {
    def get(key: String): Option[String] =
      entries.collectFirst { case (k, v) if k.equalsIgnoreCase(key) => v }
    def getAll(key: String): Seq[String] =
      entries.collect { case (k, v) if k.equalsIgnoreCase(key) => v }
  }

  /** Variable store mirroring `struct flb_env`: an internal hash fed by
    * `@SET`, falling back to the real environment, with the `HOSTNAME`
    * preset. `real` is injectable so specs don't depend on the process
    * environment.
    */
  final class Env(real: String => Option[String] = k => sys.env.get(k)) {
    private val ht = scala.collection.mutable.Map.empty[String, String]
    // flb_env.c:63-88 — ${HOSTNAME} is preset from gethostname() when the
    // shell didn't export it as a real variable. Resolved LAZILY on the
    // first HOSTNAME miss: getLocalHost is a DNS lookup that can block for
    // seconds on hosts whose own name doesn't resolve, and ConfPipeline
    // constructs an Env per load whether or not ${HOSTNAME} is referenced.
    private lazy val localHostname: Option[String] =
      try Some(java.net.InetAddress.getLocalHost.getHostName)
      catch { case _: java.net.UnknownHostException => None }
    def set(key: String, value: String): Unit = ht(key) = value
    def get(key: String): Option[String] =
      ht.get(key).orElse(real(key)).orElse(
        if (key == "HOSTNAME") localHostname else None)

    /** flb_env_var_translate (`flb_env.c:177-264`): replace each
      * `${NAME}`; unset → warn + empty; unterminated `${` is left as-is.
      */
    def translate(value: String): String = {
      if (!value.contains("${")) return value
      val out = new StringBuilder
      var i = 0
      while (i < value.length) {
        val start = value.indexOf("${", i)
        if (start < 0) { out.append(value.substring(i)); i = value.length }
        else {
          val end = value.indexOf('}', start + 2)
          if (end < 0) { out.append(value.substring(i)); i = value.length }
          else {
            out.append(value.substring(i, start))
            val name = value.substring(start + 2, end)
            get(name) match {
              case Some(v) => out.append(v)
              case None =>
                System.err.println(s"[env] variable $${$name} is used but not set")
            }
            i = end + 1
          }
        }
      }
      out.toString
    }
  }

  /** Meta-command pre-pass (`flb_meta.c:72-78`): only `SET` is known;
    * params split at the first `=` (`flb_meta.c:37-68`).
    */
  private def runMetas(text: String, env: Env): Unit =
    text.linesIterator.map(_.trim).filter(_.startsWith("@")).foreach { line =>
      val body = line.substring(1)
      val sp = body.indexWhere(_.isWhitespace)
      val (cmd, params) =
        if (sp > 0) (body.substring(0, sp), body.substring(sp).trim)
        else (body, "")
      if (cmd.equalsIgnoreCase("SET")) {
        val eq = params.indexOf('=')
        if (eq > 0) env.set(params.substring(0, eq).trim, params.substring(eq + 1).trim)
        else System.err.println(s"[meta SET] invalid parameter '$params'")
      } // unknown meta commands are ignored (flb_meta_run returns -1)
    }

  def parse(text: String): Seq[Section] = parse(text, new Env())

  def parse(text: String, env: Env): Seq[Section] = {
    runMetas(text, env)
    val sections = scala.collection.mutable.ArrayBuffer.empty[Section]
    var current: Option[(String, scala.collection.mutable.ArrayBuffer[(String, String)])] = None
    text.linesIterator.foreach { raw =>
      val line = raw.trim
      if (line.nonEmpty && !line.startsWith("#") && !line.startsWith("@")) {
        if (line.startsWith("[") && line.endsWith("]")) {
          current.foreach { case (n, es) => sections += Section(n, es.toSeq) }
          current = Some((line.substring(1, line.length - 1).toUpperCase, scala.collection.mutable.ArrayBuffer.empty))
        } else current match {
          case Some((_, es)) =>
            val sp = line.indexWhere(_.isWhitespace)
            if (sp > 0) es += ((line.substring(0, sp), env.translate(line.substring(sp).trim)))
            else es += ((line, ""))
          case None => // stray line outside any section — reference ignores
        }
      }
    }
    current.foreach { case (n, es) => sections += Section(n, es.toSeq) }
    sections.toSeq
  }
}
