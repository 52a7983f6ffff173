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

  /** 16-digit payment-card candidates: plain runs or 4-4-4-4 groups split
    * by dash/space. Shape alone over-fires on order ids and timestamps, so
    * detection is two-stage: the regex finds CANDIDATES, [[luhnValid]]
    * confirms them — the precision/recall split every production PII
    * scrubber makes (redact all card-shaped spans, alert only on
    * checksum-confirmed ones).
    */
  val cardPattern: String =
    "\\b(\\d{16}|\\d{4}[- ]\\d{4}[- ]\\d{4}[- ]\\d{4})\\b"

  /** card-shaped candidate spans in `text` (possibly dash/space grouped) */
  def cardCandidates(text: Column): Column =
    regexp_extract_all(text, lit(cardPattern), lit(0))

  /** Luhn (mod-10) checksum validity of a 16-digit string: double every
    * second digit from the right, fold digit overflow (d·2−9), total ≡ 0
    * mod 10. Pure codegen'd integer arithmetic over `substr` — a fixed
    * 16-term fold, no UDF — and expressible verbatim in SQL, so an
    * external engine confirms the same candidates.
    */
  def luhnValid(digits: Column): Column = {
    val total = aggregate(sequence(lit(1), lit(16)), lit(0), (acc, p) => {
      val d = digits.substr(p, lit(1)).cast("int")
      // 1-based position p from the left in a 16-digit string sits at
      // 17−p from the right: double when that is even (p odd)
      val dd = when(((lit(17) - p) % 2) === 0, d * 2).otherwise(d)
      acc + when(dd > 9, dd - 9).otherwise(dd)
    })
    (length(digits) === 16) && (total % 10 === 0)
  }

  /** card-shaped candidate count (pre-checksum) */
  def cardCandidateCount(text: Column): Column =
    size(cardCandidates(text)).cast("long")

  /** checksum-CONFIRMED card count: candidates surviving [[luhnValid]]
    * after separator strip
    */
  def cardCount(text: Column): Column =
    size(filter(cardCandidates(text),
      c => luhnValid(regexp_replace(c, "[- ]", "")))).cast("long")

  /** replace every card-SHAPED span with the placeholder (conservative:
    * shape is enough to redact; the checksum only gates alerting)
    */
  def redactCards(text: Column): Column =
    regexp_replace(text, cardPattern, "<CARD>")
}
