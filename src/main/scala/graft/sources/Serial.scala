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
  *     (process_pack, in_serial.c:69-94). An incomplete trailing value
  *     stays buffered (dropped batch-wise); an invalid stream is skipped
  *     from the point of corruption (FLB_ERR_JSON_INVAL resets state).
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

  /** Driver-side split for the conf face (same semantics, plain Scala). */
  def segmentsLocal(payload: String, separator: String): Seq[String] = {
    val cleaned = payload.replaceFirst("^\\x00?[\\r\\n]?", "")
    val parts = cleaned.split(Pattern.quote(separator), -1)
    parts.dropRight(1).filter(_.nonEmpty).toSeq
  }

  /** Format json: successive top-level JSON values of the stream as
    * compact text (string scalars kept verbatim like the mqtt face); an
    * incomplete or invalid tail is dropped from the point of failure.
    */
  def jsonStream(text: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    try {
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      val it = m.readValues(
        m.createParser(text), classOf[com.fasterxml.jackson.databind.JsonNode])
      while (it.hasNext) {
        val v = it.next()
        out += (if (v.isTextual) v.asText else m.writeValueAsString(v))
      }
    } catch { case _: Exception => () } // FLB_ERR_JSON_PART / _INVAL tail
    out.toSeq
  }
}
