package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction for training-data curation: emails, IPv4
  * addresses, and NANP-style phone numbers via anchored regexes, with a
  * single-pass redaction that replaces each class with a typed placeholder.
  *
  * The patterns deliberately stay within the regex subset that Java's
  * engine and RE2-based engines (the DuckDB oracle) evaluate identically —
  * character classes, bounded repetition, and `\b` word boundaries; no
  * backreferences or lookaround — so counts and redacted text reproduce
  * bit-for-bit across engines.
  *
  * 100 TB notes: every function is a codegen'd `regexp_*` column expression
  * (no UDFs), evaluated at scan speed; redaction composes three
  * `regexp_replace` passes in one projection, ordered email → IP → phone so
  * classes never partially rewrite each other's matches.
  */
object Pii {

  val emailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Pattern: String = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val phonePattern: String = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

  private def countMatches(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0))).cast("long")

  def emailCount(text: Column): Column = countMatches(text, emailPattern)
  def ipv4Count(text: Column): Column = countMatches(text, ipv4Pattern)
  def phoneCount(text: Column): Column = countMatches(text, phonePattern)

  /** total PII hits of all classes */
  def piiCount(text: Column): Column =
    emailCount(text) + ipv4Count(text) + phoneCount(text)

  /** replace every detected span with its class placeholder */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailPattern, "<EMAIL>"),
        ipv4Pattern, "<IP>"),
      phonePattern, "<PHONE>")
}
