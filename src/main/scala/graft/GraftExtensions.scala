package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.unsafe.types.UTF8String

import graft.expressions._

/** Spark extension entry point: registers every graft expression as a SQL function, so
  * the engine's surface is usable from plain `spark.sql(...)` — not only the Column
  * facade ([[graft.functions]]).
  *
  *   - cluster / spark-submit: `--conf spark.sql.extensions=graft.GraftExtensions`
  *   - live session: `GraftExtensions.register(spark)`
  *
  * Static parameters (shingle width, winnowing window, aggregate thresholds) are
  * taken from foldable literal arguments; aggregate attribute names are derived from
  * each argument's SQL text, matching what the Column facade derives from the
  * caller-supplied name pairs.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.descriptions.foreach(ext.injectFunction)
}

object GraftExtensions {

  /** Register all functions on an already-running session. */
  def register(spark: SparkSession): Unit =
    descriptions.foreach { case (id, info, builder) =>
      org.apache.spark.sql.graftbridge.Bridge
        .registerFunction(spark, id.funcName, info, builder)
    }

  private def litInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got ${other.sql}")
  }

  private def litLong(e: Expression, what: String): Long = e match {
    case Literal(v: Int, _) => v.toLong
    case Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got ${other.sql}")
  }

  private def litBool(e: Expression, what: String): Boolean = e match {
    case Literal(v: Boolean, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be a boolean literal, got ${other.sql}")
  }

  private def litString(e: Expression, what: String): String = e match {
    case Literal(v: UTF8String, _) => v.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a string literal, got ${other.sql}")
  }

  /** Attribute name for aggregate map keys: the bare column name for attributes
    * (no `t.` qualifier), the un-backquoted SQL text for computed arguments.
    */
  private def sqlName(e: Expression): String = e match {
    case n: org.apache.spark.sql.catalyst.expressions.NamedExpression => n.name
    case other => other.sql.replace("`", "")
  }

  private def arity(name: String, args: Seq[Expression], ns: Range): Unit =
    require(ns.contains(args.length),
      s"$name expects ${ns.min}${if (ns.min == ns.max) "" else s"..${ns.max}"} " +
        s"arguments, got ${args.length}")

  private def fn(name: String, usage: String)(
      builder: Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo("graft", null, name, usage, ""),
      builder)

  /** (name, info, builder) triples — the single source for both registration paths. */
  private[graft] val descriptions: Seq[
      (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    fn("jaro_winkler", "jaro_winkler(l, r) - Jaro-Winkler similarity in [0,1].") { a =>
      arity("jaro_winkler", a, 2 to 2); JaroWinkler(a(0), a(1))
    },
    fn("strip_accents",
      "strip_accents(s) - drop diacritics (NFD decompose, remove combining marks).") { a =>
      arity("strip_accents", a, 1 to 1); StripAccents(a(0))
    },
    fn("vocab_encode",
      "vocab_encode(tokens, vocab_json, unk) - token ids from a bounded vocab; " +
        "vocab_json is a {\"token\": id} object literal.") { a =>
      arity("vocab_encode", a, 2 to 3)
      val json = litString(a(1), "vocab_json")
      val vocab = graft.model.Json.parse(json).asInstanceOf[Map[String, Any]]
        .map { case (k, v) => k -> v.asInstanceOf[Double].toInt }
      VocabEncode(a(0), vocab, if (a.length > 2) litInt(a(2), "unk") else 0)
    },
    fn("bounded_levenshtein",
      "bounded_levenshtein(l, r, t) - Levenshtein distance if <= t, else -1.") { a =>
      arity("bounded_levenshtein", a, 3 to 3)
      BoundedLevenshtein(a(0), a(1), litInt(a(2), "t"))
    },
    fn("char_set_jaccard", "char_set_jaccard(l, r) - character-set Jaccard.") { a =>
      arity("char_set_jaccard", a, 2 to 2); CharSetJaccard(a(0), a(1))
    },
    fn("token_set_jaccard", "token_set_jaccard(l, r) - whitespace-token-set Jaccard.") { a =>
      arity("token_set_jaccard", a, 2 to 2); TokenSetJaccard(a(0), a(1))
    },
    fn("lcs_length",
      "lcs_length(l, r) - longest-common-subsequence length of two string arrays.") { a =>
      arity("lcs_length", a, 2 to 2); LcsLength(a(0), a(1))
    },
    fn("nfc_normalize", "nfc_normalize(s) - Unicode NFC canonical composition.") { a =>
      arity("nfc_normalize", a, 1 to 1); NfcNormalize(a(0))
    },
    fn("char_entropy",
      "char_entropy(s) - Shannon entropy (bits/char) of the character distribution.") { a =>
      arity("char_entropy", a, 1 to 1); CharEntropy(a(0))
    },
    fn("ngram_overlap_stats",
      "ngram_overlap_stats(cand, ref, maxN[, charMode]) - clipped n-gram overlap " +
        "stats array for orders 1..maxN.") { a =>
      arity("ngram_overlap_stats", a, 3 to 4)
      NgramOverlapStats(a(0), a(1), litInt(a(2), "maxN"),
        if (a.length > 3) litBool(a(3), "charMode") else false)
    },
    fn("char_shingles",
      "char_shingles(text, n) - char n-grams of the whitespace-stripped string.") { a =>
      arity("char_shingles", a, 2 to 2); CharShingles(a(0), litInt(a(1), "n"))
    },
    fn("array_dot", "array_dot(l, r) - dot product of two array<double>.") { a =>
      arity("array_dot", a, 2 to 2); ArrayDot(a(0), a(1))
    },
    fn("array_normalize", "array_normalize(v) - unit-normalized array<double>.") { a =>
      arity("array_normalize", a, 1 to 1); ArrayNormalize(a(0))
    },
    fn("md5_prefix_long", "md5_prefix_long(s) - first 8 md5 bytes as a long.") { a =>
      arity("md5_prefix_long", a, 1 to 1); Md5PrefixLong(a(0))
    },
    fn("word_shingles",
      "word_shingles(text, n[, distinct]) - word n-gram shingles, with multiplicity " +
        "unless distinct=true (matches graft.textops.TextOps.shingles).") { a =>
      arity("word_shingles", a, 2 to 3)
      WordShingles(a(0), litInt(a(1), "n"),
        if (a.length > 2) litBool(a(2), "distinct") else false)
    },
    fn("rolling_fingerprints",
      "rolling_fingerprints(text, k, w) - winnowing fingerprints.") { a =>
      arity("rolling_fingerprints", a, 3 to 3)
      RollingFingerprints(a(0), litInt(a(1), "k"), litInt(a(2), "w"))
    },
    fn("simhash64",
      "simhash64(text) - 64-bit SimHash of the distinct token set; NULL if token-less.") { a =>
      arity("simhash64", a, 1 to 1); SimHash64(a(0))
    },
    fn("minhash_signatures",
      "minhash_signatures(text, k, n) - k min-md5 MinHash values over word n-gram " +
        "shingles; NULL if shingle-less.") { a =>
      arity("minhash_signatures", a, 3 to 3)
      MinhashSignatures(a(0), litInt(a(1), "k"), litInt(a(2), "n"))
    },
    fn("repetition_stats",
      "repetition_stats(text) - struct of Gopher-style repetition counters.") { a =>
      arity("repetition_stats", a, 1 to 1); RepetitionStats(a(0))
    },
    fn("cdc_chunks",
      "cdc_chunks(bin, minSize, avgBits, maxSize) - content-defined gear-hash " +
        "chunks as array<struct<offset, length, hash>>.") { a =>
      arity("cdc_chunks", a, 4 to 4)
      CdcChunks(a(0), litInt(a(1), "minSize"), litInt(a(2), "avgBits"),
        litInt(a(3), "maxSize"))
    },
    fn("combinations",
      "combinations(n, elements) - all n-combinations as a nested array.") { a =>
      arity("combinations", a, 2 to 2); ArrayCombinations(a(0), a(1))
    },
    fn("partial_combinations",
      "partial_combinations(n, partial, elements) - extend a partial combination.") { a =>
      arity("partial_combinations", a, 3 to 3)
      PartialCombinations(a(0), a(1), a(2))
    },
    fn("to_splink_rule",
      "to_splink_rule(combination) - render a blocking-rule SQL string.") { a =>
      arity("to_splink_rule", a, 1 to 1); ToSplinkRule(a(0))
    },
    fn("entropy_agg",
      "entropy_agg(base, col, ...) - per-column Shannon entropy map (aggregate).") { a =>
      arity("entropy_agg", a, 2 to Int.MaxValue - 1)
      val cols = a.drop(1)
      EntropyAgg(cols, cols.map(sqlName), litInt(a.head, "base"))
    },
    fn("merge_count_map_agg",
      "merge_count_map_agg(m) - key-wise sum of count maps (aggregate).") { a =>
      arity("merge_count_map_agg", a, 1 to 1); MergeCountMapAgg(a(0))
    },
    fn("array_avg_agg",
      "array_avg_agg(v) - element-wise average of array<double> rows (aggregate).") { a =>
      arity("array_avg_agg", a, 1 to 1); ArrayAvgAgg(a(0))
    },
    fn("combinatorial_count_agg",
      "combinatorial_count_agg(n, threshold, top_k, col, ...) - co-occurrence counts " +
        "over every n-combination of the columns (aggregate).") { a =>
      arity("combinatorial_count_agg", a, 4 to Int.MaxValue - 1)
      val cols = a.drop(3)
      CombinatorialCountAgg(cols, cols.map(sqlName),
        litInt(a(0), "n"), litLong(a(1), "threshold"), litInt(a(2), "top_k"))
    },
    fn("hash_draw",
      "hash_draw(key, salt) - deterministic 8-hex-digit md5 sampling draw.") { a =>
      arity("hash_draw", a, 2 to 2)
      // raw Catalyst form of Curation.hashDraw (a registry builder can't round-trip
      // through the Column API — ColumnNodeExpression is unevaluable)
      import org.apache.spark.sql.catalyst.expressions.{Cast, Concat, Md5, Substring}
      import org.apache.spark.sql.types.StringType
      Substring(
        Md5(Cast(
          Concat(Seq(Literal(litString(a(1), "salt") + ":"), Cast(a(0), StringType))),
          org.apache.spark.sql.types.BinaryType)),
        Literal(1), Literal(8))
    })
}
