package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Caption normalization (SURVEY.md §2.2 P1): pure built-in column
  * functions (codegen'd) with an exactly-matching Scala implementation for
  * fixtures and test oracles.
  *
  * Pipeline: lowercase → non-alphanumerics → space → collapse whitespace →
  * trim. (No Unicode NFC: fixtures are ASCII by construction; Spark has no
  * native normalizer and a UDF here would break codegen for marginal
  * benefit — documented divergence.)
  */
object Text {
  private val NonAlnum = "[^\\p{L}\\p{N}\\s]"
  private val Spaces = "\\s+"

  def normalizeCol(caption: Column): Column =
    trim(regexp_replace(regexp_replace(lower(caption), NonAlnum, " "), Spaces, " "))

  /** Scala twin of [[normalizeCol]] — MUST stay semantically identical
    * (asserted by TextSpec round-trip property test).
    */
  def normalize(caption: String): String = {
    if (caption == null) return null
    caption.toLowerCase
      .replaceAll(NonAlnum, " ")
      .replaceAll(Spaces, " ")
      .trim
  }
}
