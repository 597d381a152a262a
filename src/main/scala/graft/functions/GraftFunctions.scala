package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level scalar helpers mirroring the reference's scalar surface
  * (SURVEY.md §2.9). All are compositions of built-in, codegen'd
  * `org.apache.spark.sql.functions` — no UDFs in the hot path.
  */
object GraftFunctions {

  /** JS `parseInt` parity (reference
    * `script/extract-text-lines-from-alto.js:23973-23976`): strip any
    * leading whitespace (JS strips all WhiteSpace/LineTerminator chars,
    * so `parseInt("\t42") == 42` — handled by `\s` in the regex, not
    * `trim` which only strips spaces), then parse the longest leading
    * `[+-]?digits` prefix; no digit prefix → null. `parseInt("12.7") ==
    * 12`, `parseInt("") == NaN` (→ null here), `parseInt(" 42px") == 42`.
    *
    * Out of scope (documented divergence): JS radix auto-detection of
    * hex literals (`parseInt("0x10") == 16`; here → 0). ALTO coordinate
    * attributes (HPOS/VPOS/WIDTH/HEIGHT) are decimal per the schema, so
    * the hex branch is unreachable on the domain this mirrors.
    * Built from regexp_extract + cast, so it stays inside whole-stage
    * codegen (vs. a boxed Scala UDF).
    */
  def parseIntJs(c: Column): Column = {
    val prefix = regexp_extract(c, "^\\s*([+-]?\\d+)", 1)
    when(prefix === "", lit(null)).otherwise(prefix).cast("int")
  }

  /** `os.path.basename(url)` parity (reference `flows/main_flow.py:143`). */
  def basename(c: Column): Column = substring_index(c, "/", -1)

  /** S3 object key for a document: `basename(url) + ".json"`
    * (reference `flows/main_flow.py:143`). */
  def s3Key(urlCol: Column): Column = concat(basename(urlCol), lit(".json"))

  /** Public object URL `{endpoint}/{bucket}/{key}`
    * (reference `flows/main_flow.py:150`). */
  def publicUrl(endpoint: String, bucket: String, keyCol: Column): Column =
    concat_ws("/", lit(endpoint), lit(bucket), keyCol)

  /** UTF-8 encode for a binary sink payload (reference
    * `flows/main_flow.py:144`). */
  def utf8Bytes(c: Column): Column = encode(c, "UTF-8")
}
