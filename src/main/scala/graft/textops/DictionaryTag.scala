package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dictionary (gazetteer) entity tagging: find every occurrence of a bounded
  * alias table's surface forms in each document's token stream — the NER-lite
  * primitive behind PII tagging, blocklist auditing, and entity-frequency
  * profiling of a training corpus. No model: matching is exact on
  * lowercase-normalized token n-grams, which is what production gazetteer
  * passes (Aho-Corasick over tokens) compute; here the automaton is replaced
  * by an n-gram explode + broadcast equi-join, which Catalyst turns into one
  * corpus scan with a hash probe per gram.
  *
  * Scale shape: the gram explode is tokens × maxWords rows (linear in corpus
  * size, bounded multiplier), the alias side is broadcast (gazetteer tables
  * are small by construction), and the longest-match window partitions by
  * (doc, position) — never a global sort. At 100 TB this is one pass.
  */
object DictionaryTag {

  /** Tag `df`'s text with the alias table (`alias`, `entity`): lowercase
    * token n-grams up to `maxWords` join the normalized aliases; overlapping
    * candidates at the SAME start position resolve longest-match-wins (ties
    * by alias, deterministically); matches that start inside a longer match
    * are kept (flat mention counting, not span consumption). Output: one row
    * per (id, entity) with the mention count and first match position.
    */
  def tag(
      df: DataFrame,
      idCol: String,
      textCol: Column,
      aliases: DataFrame,
      maxWords: Int = 3): DataFrame = {
    require(maxWords >= 1, s"maxWords must be >= 1, got $maxWords")
    val al = aliases.select(lower(col("alias")).as("gram"), col("entity"))
    val toks = df.select(col(idCol).as("id"), TextOps.tokens(lower(textCol)).as("toks"))
    val grams = toks
      .select(col("id"), col("toks"), posexplode(col("toks")).as(Seq("pos", "_t")))
      .select(col("id"), col("pos"),
        explode(array((1 to maxWords).map(lit): _*)).as("len"), col("toks"))
      .filter(col("pos") + col("len") <= size(col("toks")))
      .select(col("id"), col("pos"), col("len"),
        array_join(slice(col("toks"), col("pos") + 1, col("len")), " ").as("gram"))
    val matched = grams.join(broadcast(al), Seq("gram"))
    val w = Window.partitionBy("id", "pos").orderBy(col("len").desc, col("gram").asc)
    matched.withColumn("_rk", row_number().over(w)).filter(col("_rk") === 1)
      .groupBy(col("id"), col("entity"))
      .agg(count(lit(1)).as("n_mentions"), min("pos").as("first_pos"))
  }
}
