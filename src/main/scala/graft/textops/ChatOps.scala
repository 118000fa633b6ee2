package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SFT / chat-format data QA: the validation gate a fine-tuning pipeline runs over
  * JSON conversation records before tokenization. Every check is a row-local
  * expression over the parsed message array (one `from_json` + higher-order
  * functions — no UDFs, no shuffles), so the gate runs at scan speed over a
  * 100 TB conversation dump and the kept/flagged split is a plain filter.
  */
object ChatOps {

  /** `[{"role": ..., "content": ...}, ...]` */
  val MessageSchema: ArrayType = ArrayType(StructType(Seq(
    StructField("role", StringType),
    StructField("content", StringType))))

  /** Validate chat records. Checks (each its own output column, `valid` is their
    * conjunction): parseable JSON; non-empty; after an optional leading `system`
    * turn the body strictly alternates user/assistant starting with `user` and
    * ending with `assistant`; no whitespace-only/missing content; whitespace
    * token total ≤ `maxTokens`. A `system` turn is allowed but not required.
    *
    * Output: `(rec_id, invalid_json, n_turns, has_system, starts_user,
    * alternates, ends_assistant, has_empty_content, total_tokens, valid)`.
    */
  def validateChat(
      df: DataFrame,
      idCol: Column,
      jsonCol: Column,
      maxTokens: Int): DataFrame = {
    require(maxTokens >= 1, s"maxTokens must be >= 1, got $maxTokens")
    // Generate barrier: every flag column references `msgs`, and projection
    // collapse + filter inlining would otherwise copy the from_json into EVERY
    // reference (measured 66 parses/row in the ep15 plan). Catalyst cannot
    // inline expressions across a Generate, so explode(array(...)) pins the
    // parse to exactly once per row; a 1-element explode preserves null rows.
    val parsed = df
      .select(idCol.as("rec_id"), from_json(jsonCol, MessageSchema).as("msgs0"))
      .select(col("rec_id"), explode(array(col("msgs0"))).as("msgs"))
    val invalid = col("msgs").isNull
    val roles = transform(col("msgs"), m => m.getField("role"))
    val body = when(try_element_at(roles, lit(1)) === "system",
      slice(roles, lit(2), size(roles))).otherwise(roles)
    val alternates = forall(
      zip_with(col("body"), sequence(lit(1), size(col("body"))), (r, i) =>
        coalesce(r === when(i % 2 === 1, lit("user")).otherwise(lit("assistant")),
          lit(false))),
      x => x)
    val emptyContent = exists(col("msgs"), m =>
      coalesce(length(trim(m.getField("content"))) === 0, lit(true)))
    val tokensTotal = aggregate(col("msgs"), lit(0L), (acc, m) =>
      acc + TextOps.tokenCount(coalesce(m.getField("content"), lit(""))))
    parsed
      .withColumn("invalid_json", invalid)
      .withColumn("n_turns", when(invalid, lit(0)).otherwise(size(col("msgs"))))
      .withColumn("has_system",
        coalesce(try_element_at(roles, lit(1)) === "system", lit(false)))
      .withColumn("body", when(invalid, array().cast("array<string>")).otherwise(body))
      .withColumn("starts_user",
        coalesce(try_element_at(col("body"), lit(1)) === "user", lit(false)))
      .withColumn("alternates",
        when(size(col("body")) === 0, lit(false)).otherwise(alternates))
      .withColumn("ends_assistant",
        coalesce(try_element_at(col("body"), lit(-1)) === "assistant", lit(false)))
      .withColumn("has_empty_content",
        when(invalid, lit(false)).otherwise(coalesce(emptyContent, lit(false))))
      .withColumn("total_tokens",
        when(invalid, lit(0L)).otherwise(coalesce(tokensTotal, lit(0L))))
      .withColumn("valid",
        !col("invalid_json") && col("n_turns") > 0 && col("starts_user") &&
          col("alternates") && col("ends_assistant") && !col("has_empty_content") &&
          col("total_tokens") <= maxTokens)
      .select("rec_id", "invalid_json", "n_turns", "has_system", "starts_user",
        "alternates", "ends_assistant", "has_empty_content", "total_tokens", "valid")
  }
}
