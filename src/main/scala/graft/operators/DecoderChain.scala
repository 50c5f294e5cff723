package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, StringType}

import graft.functions.Decoders
import graft.parsers.ParserConfLoader.DecoderRule

/** Config-driven decoder rule chains over a `map<string,string>` record —
  * the `Decode_Field` / `Decode_Field_As` machinery of the reference parser
  * (`src/flb_parser_decoder.c`):
  *
  *   - rules are grouped per key and applied in FILE ORDER
  *     (`flb_parser_decoder_do`, `:554-629` rule loop);
  *   - `Decode_Field_As` replaces the value IN PLACE; chained rules see
  *     the decoded buffer (`data_sds` copy, `:596-608`);
  *   - `Decode_Field` with the `json` backend keeps the original value and
  *     APPENDS the decoded object's keys at the end of the record
  *     (`extra_keys`, `:320-358`);
  *   - actions: default = stop after the first decisive rule; `try_next` =
  *     on failure fall through to the next rule; `do_next` = on success
  *     keep applying (`:585-592, 622-628`);
  *   - one-success-per-key: a `Decode_Field … do_next` whose key already
  *     has a successful `Decode_Field` is skipped (`:471-479, 556-561`).
  *
  * Backends: `escaped`, `escaped_utf8` (always succeed on a string value),
  * `json` (succeeds iff the value parses as a JSON object).
  *
  * Documented deviations (MapType carrier, SURVEY §7.5.3):
  *   - extra keys cannot duplicate existing keys in a Spark map — on
  *     conflict the EXTRA (decoded) value wins, matching what a JSON
  *     consumer of the reference's duplicate-keyed msgpack would observe;
  *   - `Decode_Field_As json` validates but keeps the decoded TEXT (a map
  *     of strings cannot hold a nested object); subsequent rules on that
  *     key are skipped exactly like the reference's non-string in_type
  *     guard (`:565-567`).
  */
object DecoderChain {

  private val MapSS = MapType(StringType, StringType)

  /** Per-rule, per-key fold state — all plain column expressions. */
  private final case class St(data: Column, halted: Column,
                              isDec: Column, isDecAs: Column,
                              asNonString: Column, extra: Column)

  /** Apply one key's rule list to the record map `m`. */
  private def applyKey(m: Column, key: String, rules: Seq[DecoderRule]): Column = {
    val v0 = element_at(m, key)
    var st = St(v0, lit(false), lit(false), lit(false), lit(false),
      lit(null).cast(MapSS))
    rules.foreach { r =>
      // skip: halted chain; DEFAULT-do_next after a DEFAULT success;
      // anything after a DEC_AS produced a non-string value
      val skip = st.halted ||
        (if (!r.inPlace && r.action == "do_next") st.isDec else lit(false)) ||
        st.asNonString
      val jsonMap = if (r.backend == "json") from_json(st.data, MapSS) else lit(null).cast(MapSS)
      val success: Column = r.backend match {
        case "json" => jsonMap.isNotNull
        case _      => lit(true)
      }
      val decoded: Column = r.backend match {
        case "escaped"      => Decoders.escaped(st.data)
        case "escaped_utf8" => Decoders.escapedUtf8(st.data)
        case "json"         => st.data // validated; text kept (see scaladoc)
      }
      val applied = !skip && success
      val newData = if (r.inPlace) when(applied, decoded).otherwise(st.data) else st.data
      val newIsDec = if (!r.inPlace) st.isDec || applied else st.isDec
      val newIsDecAs = if (r.inPlace) st.isDecAs || applied else st.isDecAs
      val newAsNonString =
        if (r.inPlace && r.backend == "json") st.asNonString || applied else st.asNonString
      val newExtra =
        if (!r.inPlace && r.backend == "json") when(applied, jsonMap).otherwise(st.extra)
        else st.extra
      val haltOnSuccess = r.action != "do_next"
      val haltOnFail = r.action != "try_next" && r.action != "do_next"
      val newHalted = st.halted ||
        when(skip, lit(false))
          .otherwise(when(success, lit(haltOnSuccess)).otherwise(lit(haltOnFail)))
      st = St(newData, newHalted, newIsDec, newIsDecAs, newAsNonString, newExtra)
    }
    // in-place replacement preserves key POSITION (transform_values)
    val replaced = when(st.isDecAs,
      transform_values(m, (k2, v2) => when(k2 === key, st.data).otherwise(v2)))
      .otherwise(m)
    // extra keys appended at the END; on conflict the decoded value wins.
    // Membership test is map_contains_key, NOT element_at(..).isNull — a
    // decoded JSON value of null ({"stream": null}) is PRESENT with a null
    // value, and missing it here would leave the original key in place and
    // make map_concat throw on the duplicate (mapKeyDedupPolicy=EXCEPTION)
    val withExtra = when(st.isDec && st.extra.isNotNull,
      map_concat(
        map_filter(replaced, (k2, _) => !map_contains_key(st.extra, k2)),
        st.extra))
      .otherwise(replaced)
    when(v0.isNull, m).otherwise(withExtra)
  }

  /** Apply a parser's decoder rules to a map record column. Keys keep
    * their rules in encounter order; keys are processed in first-mention
    * order (the reference walks the record's keys, each against its own
    * ruleset — record order and rule-key order coincide on the shipped
    * configs).
    */
  def apply(m: Column, rules: Seq[DecoderRule]): Column = {
    val keys = rules.map(_.key).distinct
    keys.foldLeft(m)((acc, k) => applyKey(acc, k, rules.filter(_.key == k)))
  }
}
