package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Subtitle/caption parsing for video-corpus curation: SRT cue extraction with the
  * per-cue timing and density stats (duration, chars-per-second) a caption-quality
  * gate filters on — over-fast or over-long cues are the standard junk signals in
  * crawled caption corpora. All row-local: one split + explode (a generator, not a
  * shuffle) + codegen'd regexp extraction, so parsing runs at scan speed.
  *
  * Regexes stay in the Java ∩ RE2 subset (no backreferences, no lookarounds) so
  * the DuckDB oracle replays them verbatim.
  */
object Captions {

  /** `HH:MM:SS,mmm` (SRT) or `HH:MM:SS.mmm` (VTT-style) — 8 capture groups for
    * start/end when doubled around ` --> `.
    */
  private val Time = "(\\d{2}):(\\d{2}):(\\d{2})[,.](\\d{3})"

  /** Cue header: index line + timing line at the start of a cue block. */
  private val CueHead = s"^(\\d+)\\n$Time --> $Time"

  /** Parse SRT text into one row per valid cue:
    * `(id, cue_index, start_ms, end_ms, duration_ms, cue_text, n_chars, cps)`.
    * Line endings are normalized first (`\r\n`/`\r` → `\n`) — real-world SRT is
    * predominantly CRLF and the parse is the validity gate, so without this every
    * CRLF caption would be silently dropped as junk.
    * Cue blocks are split on blank lines; blocks whose header doesn't match the
    * `index\nstart --> end` shape are dropped (the parse IS the validity gate).
    * `cps` is NULL for non-positive durations — a zero/negative-length cue has no
    * defined rate and flagging beats a division artifact.
    */
  def parseSrt(df: DataFrame, idCol: Column, srtCol: Column): DataFrame = {
    def ms(base: Int): Column =
      (0 until 4).map(g => regexp_extract(col("cue"), CueHead, base + g).cast("long") *
        lit(Array(3600000L, 60000L, 1000L, 1L)(g))).reduce(_ + _)
    df.select(idCol.as("id"),
        explode(split(regexp_replace(srtCol, "\\r\\n?", "\n"),
          "\\n[ \\t]*\\n+")).as("cue"))
      .filter(regexp_extract(col("cue"), CueHead, 1) =!= "")
      .select(col("id"),
        regexp_extract(col("cue"), CueHead, 1).cast("int").as("cue_index"),
        ms(2).as("start_ms"), ms(6).as("end_ms"),
        regexp_replace(
          regexp_replace(col("cue"), s"$CueHead\\n?", ""), "\\n", " ").as("cue_text"))
      .withColumn("duration_ms", col("end_ms") - col("start_ms"))
      .withColumn("n_chars", length(col("cue_text")).cast("long"))
      .withColumn("cps",
        when(col("duration_ms") <= 0, lit(null).cast("double"))
          .otherwise(col("n_chars").cast("double") * 1000.0 / col("duration_ms")))
      .select("id", "cue_index", "start_ms", "end_ms", "duration_ms",
        "cue_text", "n_chars", "cps")
  }
}
