package graft.sources

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** `in_serial` record-formation semantics
  * (`plugins/in_serial/in_serial.c:100-225`): the device byte stream
  * becomes `{msg}` records three ways —
  *
  *   - **Separator set**: split on the configured separator; an EMPTY
  *     segment consumes just the separator and emits nothing
  *     (in_serial.c:173-176); the tail after the last separator stays
  *     buffered waiting for more bytes, so a batch payload's
  *     unterminated tail is dropped (separator-terminated records only).
  *     A leading NUL (FTDI handshake, in_serial.c:146-149) and then a
  *     leading CR/LF (in_serial.c:152-159) are stripped — the reference
  *     applies these checks per read chunk; batch-wise they can only
  *     ever fire at stream start, where they are applied once.
  *   - **Format json**: the stream is a concatenation of JSON values
  *     (flb_pack_json_state with multiple=TRUE); each top-level value
  *     becomes one record with the value under `msg`
  *     (process_pack, in_serial.c:69-94). An INCOMPLETE trailing value
  *     keeps the complete prefix (the PART-salvage loop,
  *     flb_pack.c:274-306) — batch-wise the tail is dropped; an INVALID
  *     byte anywhere fails the WHOLE buffer (strict jsmn tokenises all
  *     of it first — FLB_ERR_JSON_INVAL emits nothing,
  *     in_serial.c:190-196).
  *
  *   The leading NUL/CR strip runs before ALL THREE modes (the checks
  *   sit ahead of the format dispatch in the collect loop).
  *   - **Neither**: the whole chunk is one `msg` record
  *     (in_serial.c:221-224).
  *
  * The tty itself (bitrate ioctls, Min_Bytes VMIN) is an offline
  * non-goal; the conf face reads the configured `File` — the same
  * property the reference uses for the device path.
  */
object Serial {

  /** Column-level separator split (runs distributed): segments of
    * `payload` terminated by `separator`, empties skipped, unterminated
    * tail dropped, leading NUL-then-CR/LF stripped once at stream start.
    */
  def segments(payload: Column, separator: String): Column = {
    val cleaned = regexp_replace(payload, "^\\x00?[\\r\\n]?", "")
    val parts = split(cleaned, Pattern.quote(separator), -1)
    // split yields N+1 parts for N separators: the last is the
    // unterminated tail — slice it off, then drop empties
    filter(slice(parts, lit(1), size(parts) - 1), _ =!= "")
  }

  /** The pre-dispatch strip (NUL then CR/LF, once at stream start) —
    * shared by every mode and the conf face's whole-chunk branch.
    */
  def stripLead(payload: String): String =
    payload.replaceFirst("^\\x00?[\\r\\n]?", "")

  /** Driver-side split for the conf face (same semantics, plain Scala). */
  def segmentsLocal(payload: String, separator: String): Seq[String] = {
    val parts = stripLead(payload).split(Pattern.quote(separator), -1)
    parts.dropRight(1).filter(_.nonEmpty).toSeq
  }

  // shared: ObjectMapper construction is expensive and the instance is
  // thread-safe for readTree/writeValueAsString
  @transient private lazy val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Format json: successive top-level JSON values of the stream as
    * compact text (string scalars kept verbatim like the mqtt face).
    * Failure semantics mirror flb_pack_json_state: an EOF mid-value
    * (PART) keeps the complete prefix; an invalid byte (INVAL) fails
    * the whole buffer — nothing is emitted, including values before the
    * corruption, because strict jsmn tokenises the full buffer first.
    */
  def jsonStream(text: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    try {
      val m = mapper
      val it = m.readValues(
        m.createParser(stripLead(text)), classOf[com.fasterxml.jackson.databind.JsonNode])
      while (it.hasNext) {
        val v = it.next()
        out += (if (v.isTextual) v.asText else m.writeValueAsString(v))
      }
      out.toSeq
    } catch {
      case e: Exception =>
        // MappingIterator wraps parse failures in RuntimeException —
        // walk the cause chain to classify EOF (PART) vs invalid (INVAL)
        var c: Throwable = e
        while (c != null &&
               !c.isInstanceOf[com.fasterxml.jackson.core.io.JsonEOFException])
          c = c.getCause
        if (c != null) out.toSeq // PART: EOF mid-value keeps the prefix
        else Seq.empty           // INVAL: the whole buffer fails
    }
  }
}
