package graft.operators

import graft.functions.CrossHash
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection / redaction signals — the pre-release scrub pass a
  * training-data pipeline runs (C4-style): count email addresses,
  * IPv4 addresses, and US-style phone numbers per document, and
  * fingerprint the redacted text so a downstream stage can verify the
  * scrub actually happened (fingerprint changes iff something was
  * redacted).
  *
  * Every column is a narrow per-row regex over the text — a pure map
  * stage that pipelines inside the scan at any scale, no shuffle but
  * the presentation sort. Patterns use only syntax shared by Java
  * regex (Spark) and RE2 (DuckDB oracle): no lookaround, no
  * backreferences.
  */
object Pii {

  val EmailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pat  = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val PhonePat = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"

  /** `(doc_id, n_emails, n_ipv4, n_phones, redacted_fp)` over a text
    * column; `redacted_fp` is the cross-engine charFold hash of the
    * text with all three PII classes replaced by type tags.
    */
  def piiStats(docs: DataFrame, text: Column = col("text")): DataFrame = {
    val redacted =
      regexp_replace(
        regexp_replace(
          regexp_replace(text, EmailPat, "<EMAIL>"),
          Ipv4Pat, "<IP>"),
        PhonePat, "<PHONE>")
    docs.select(
      col("doc_id"),
      regexp_count(text, lit(EmailPat)).cast("long").as("n_emails"),
      regexp_count(text, lit(Ipv4Pat)).cast("long").as("n_ipv4"),
      regexp_count(text, lit(PhonePat)).cast("long").as("n_phones"),
      CrossHash.charFold(redacted).as("redacted_fp"))
      .orderBy("doc_id")
  }

  /** DuckDB oracle for [[piiStats]] applied to a bound text
    * expression `x` (DuckDB regexp_replace needs the 'g' flag to
    * replace all occurrences — Spark's replaces all by default).
    */
  def sqlPiiStats(x: String): String = {
    val red =
      s"regexp_replace(regexp_replace(regexp_replace($x, '$EmailPat', '<EMAIL>', 'g'), '$Ipv4Pat', '<IP>', 'g'), '$PhonePat', '<PHONE>', 'g')"
    s"""SELECT doc_id,
       |  len(regexp_extract_all($x, '$EmailPat'))::BIGINT AS n_emails,
       |  len(regexp_extract_all($x, '$Ipv4Pat'))::BIGINT AS n_ipv4,
       |  len(regexp_extract_all($x, '$PhonePat'))::BIGINT AS n_phones,
       |  ${CrossHash.sqlCharFold(red)} AS redacted_fp
       |FROM documents ORDER BY doc_id""".stripMargin
  }
}
