package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction for training-data curation — the
  * scrub-before-train pass every large corpus pipeline runs (emails,
  * phone numbers, long digit runs) before text reaches a tokenizer.
  *
  * Everything here is a pure column expression: detection is a regex
  * predicate/count, redaction a deterministic rewrite, so the pass
  * stays inside whole-stage codegen and the scrubbed output is
  * bit-reproducible (and therefore oracle-checkable) — no UDFs.
  *
  * Regex subset contract: patterns stick to character classes, bounded
  * repetition and alternation-free forms that mean the same thing in
  * Java regex (Spark) and RE2 (DuckDB), which is what lets the same
  * pattern serve both the engine and the oracle.
  *
  * At 100 TB this is a narrow projection over the text column —
  * no shuffle, no state; cost ∝ scanned bytes, trivially partitioned.
  */
object Pii {

  /** Phone in the TPC-H shape `CC-NNN-NNN-NNNN` (2-digit country code,
    * hyphenated groups) — the phone format of `customer.c_phone` /
    * `supplier.s_phone`. */
  val PhonePattern = "[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}"

  /** Email-ish: local@domain.tld over a conservative charset. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Digit runs of >= 6 — account-number / id-like material. */
  val DigitRunPattern = "[0-9]{6,}"

  /** True when the text contains a phone-shaped substring. */
  def hasPhone(c: Column): Column = c.rlike(PhonePattern)

  def hasEmail(c: Column): Column = c.rlike(EmailPattern)

  /** Replace every digit with '#'. Full redaction for free-text
    * columns where any digit may be identifying. */
  def maskDigits(c: Column): Column = regexp_replace(c, "[0-9]", "#")

  /** Phone redaction preserving the last `keep` characters — the
    * usual "ends in 2988" audit affordance: digits in the prefix are
    * masked, the tail is kept verbatim. */
  def maskPhoneKeepLast(c: Column, keep: Int = 4): Column =
    when(c.isNull, lit(null).cast("string")).otherwise(
      concat(
        maskDigits(c.substr(lit(1), length(c) - keep)),
        c.substr(length(c) - (keep - 1), lit(keep))))

  /** Count of digit characters — a cheap "how identifying is this
    * field" signal (len minus len-after-strip; no regex count needed,
    * so the same expression exists in every SQL dialect). */
  def digitCount(c: Column): Column =
    (length(c) - length(regexp_replace(c, "[0-9]", ""))).cast("long")

  /** Redact account-number-like digit runs wholesale (each >=6-digit
    * run collapses to the fixed tag, so downstream tokenization sees
    * one vocabulary item, not a unique token per account). */
  def redactDigitRuns(c: Column, tag: String = "<ID>"): Column =
    regexp_replace(c, DigitRunPattern, tag)
}
