package graft.compare

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Soundex-style phonetic key for fuzzy name blocking/comparison — the
  * phonetic signal Splink-family linkage pipelines attach next to string
  * similarity (reference comparisons operate on cleaned names; a phonetic key
  * blocks "Robert"/"Rupert" together where an equi-key cannot).
  *
  * Deliberately a SIMPLIFIED soundex: the classic letter→digit classes,
  * adjacent-duplicate collapse, first letter kept, zeros dropped, padded to 3
  * digits — but WITHOUT the H/W-transparency rule (American Soundex treats
  * codes separated only by H/W as duplicates; e.g. ASHCRAFT → A226 here vs
  * A261 classic). The simplification keeps the whole key a chain of built-in
  * codegen'd functions (`translate`/`regexp_replace`/`rpad`) with bit-identical
  * replay on any ANSI engine — no UDF, no custom expression, and the exact
  * same spec renders as oracle SQL.
  *
  * Scale: row-local, whole-stage-codegen, zero shuffles; as a blocking key it
  * feeds `blocking/PairGenerator` like any other column.
  */
object Phonetic {

  private val From = "AEIOUYHWBFPVCGJKQSXZDTLMNR"
  private val To = "00000000" + "1111" + "22222222" + "33" + "4" + "55" + "6"

  /** Phonetic key: first letter + 3 digits (e.g. robert → R163); null when the
    * input has no letters (or is null).
    */
  def phoneticKey(c: Column): Column = {
    val s = upper(regexp_replace(c.cast("string"), "[^A-Za-z]", ""))
    // collapse each digit's runs separately: the digit alphabet is 0-6, and a
    // backreference pattern like (.)\1+ would not replay on RE2-based engines
    val collapsed = (0 to 6).foldLeft(translate(s, From, To)) { (acc, d) =>
      regexp_replace(acc, s"$d{2,}", d.toString)
    }
    val tail = translate(collapsed.substr(lit(2), length(collapsed)), "0", "")
    when(length(s) === 0, lit(null).cast("string"))
      .otherwise(concat(substring(s, 1, 1), rpad(substring(tail, 1, 3), 3, "0")))
  }
}
