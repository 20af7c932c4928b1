package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction for training-data curation (SURVEY §2
  * op 82). A corpus headed for pre-training must strip emails, phone
  * numbers, and host addresses (see e.g. the C4/RefinedWeb cleaning
  * recipes); at 100 TB that has to be pure per-row column algebra —
  * these are regexp built-ins only (codegen'd, embarrassingly
  * parallel, no shuffle, no UDF).
  *
  * Pattern notes: every regex sticks to the syntax subset that Java
  * `Pattern` (Spark) and RE2 (the DuckDB oracle) interpret
  * identically — character classes, bounded repetition, and ASCII
  * word boundaries; no lookaround, no backreferences.
  */
object Pii {
  /** user@host.tld — the standard permissive email shape. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** NANP-ish local phone: exchange-line, e.g. 555-0134. */
  val PhonePattern = "\\b[0-9]{3}-[0-9]{4}\\b"

  /** Dotted-quad IPv4 (permissive octets; curation-recall over rigor). */
  val Ipv4Pattern = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** Count of non-overlapping matches of `pattern` in `text`. */
  def countMatches(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  def emailCount(text: Column): Column = countMatches(text, EmailPattern)
  def phoneCount(text: Column): Column = countMatches(text, PhonePattern)
  def ipv4Count(text: Column): Column = countMatches(text, Ipv4Pattern)

  /** True if the text contains any recognized PII. */
  def hasPii(text: Column): Column =
    emailCount(text) + phoneCount(text) + ipv4Count(text) > 0

  /** Redact all recognized PII with typed placeholders. Order matters:
    * emails first (an email can embed digits/dots that the narrower
    * patterns would partially eat), then IPv4 (dotted digits), then
    * phone (dashed digits).
    */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, "[EMAIL]"),
        Ipv4Pattern, "[IP]"),
      PhonePattern, "[PHONE]")
}
