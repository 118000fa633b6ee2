package graft.textops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines: tokenization,
  * quality scoring, language-ID heuristics, fingerprinting. All pure column
  * expressions (codegen'd, no UDFs) so they run at full scan speed over 100 TB of
  * documents and push down through Catalyst.
  */
object TextOps {

  /** Whitespace tokens, empty-safe. */
  def tokens(c: Column): Column =
    filter(split(trim(c), "\\s+"), t => length(t) > 0)

  def tokenCount(c: Column): Column = size(tokens(c))

  /** GPT-2-style pre-tokenizer pattern (contractions | leading-space letter runs |
    * digit runs | punctuation runs | whitespace), restricted to the lookahead-free
    * subset so Java regex (Spark) and RE2 (DuckDB oracle) agree match-for-match.
    * Subword counts from this pattern approximate BPE token counts well enough for
    * corpus budgeting — the usual pipeline use — without a vocabulary file.
    */
  val BpeishPattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+|\\s+"

  /** BPE-ish subword count: one codegen'd `regexp_count` pass, no match-array
    * materialization.
    */
  def bpeishTokenCount(c: Column): Column =
    regexp_count(c, lit(BpeishPattern))

  def distinctTokens(c: Column): Column = array_distinct(tokens(c))

  /** Word n-gram shingles `["a b c", "b c d", ...]` — native single-pass expression
    * (the HOF composition re-tokenizes per element; see [[graft.expressions.WordShingles]]).
    * Keeps duplicate shingles (wrap in `array_distinct` or use [[distinctShingles]]).
    */
  def shingles(c: Column, n: Int): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.expressions.WordShingles(
        org.apache.spark.sql.graftbridge.Bridge.expression(c), n, distinct = false))

  /** Distinct word n-gram shingles in one pass — the dedup hot path. */
  def distinctShingles(c: Column, n: Int): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.expressions.WordShingles(
        org.apache.spark.sql.graftbridge.Bridge.expression(c), n, distinct = true))

  /** Document fingerprint: md5 over the sorted distinct token set — robust to word
    * order and duplication, cheap to group on for near-dup candidate pruning.
    */
  def fingerprint(c: Column): Column =
    md5(array_join(array_sort(distinctTokens(c)), " "))

  /** Case + accent folding for match-insensitive dedup/comparison keys:
    * `lower(strip_accents(text))` in one codegen'd scan (ASCII fast path inside).
    */
  def foldText(c: Column): Column =
    lower(graft.functions.strip_accents(c))

  /** Shannon entropy (bits/char) of the character distribution — the
    * compression-proxy junk gate (base64/binary spill high, filler low).
    */
  def charEntropy(c: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.expressions.CharEntropy(
        org.apache.spark.sql.graftbridge.Bridge.expression(c)))

  /** Unicode NFC canonical composition — run before any hash/equality keying of
    * crawled text (decomposed combining marks split dedup keys otherwise).
    */
  def nfcNormalize(c: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.expressions.NfcNormalize(
        org.apache.spark.sql.graftbridge.Bridge.expression(c)))

  /** Ratio of non-alphanumeric, non-space characters. */
  def punctRatio(c: Column): Column =
    when(length(c) === 0, lit(0.0))
      .otherwise(length(regexp_replace(c, "[A-Za-z0-9\\s]", "")).cast("double") / length(c))

  /** Fraction of tokens that appear in `words`. */
  def wordSetRatio(c: Column, words: Seq[String]): Column = {
    val toks = tokens(c)
    when(size(toks) === 0, lit(0.0))
      .otherwise(size(filter(toks, t => t.isInCollection(words))).cast("double") / size(toks))
  }

  val EnglishStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that", "for", "on", "with")

  /** Composite quality score ∈ [0,1]: length saturation + low punctuation + stopword
    * presence — the standard cheap heuristics for pretraining-corpus filtering.
    */
  def qualityScore(c: Column): Column = {
    val lenScore = least(lit(1.0), tokenCount(c).cast("double") / lit(100.0))
    val punct = lit(1.0) - punctRatio(c)
    val stop = wordSetRatio(c, EnglishStopwords)
    lit(0.4) * lenScore + lit(0.3) * punct + lit(0.3) * stop
  }

  // ---- Gopher rule stats (Rae et al. 2021, appendix A1.1) -------------------
  // Each stat is a plain codegen'd column expression over one tokenization /
  // line-split; divisions are exact-int-over-exact-int doubles, so the rule
  // BOOLEANS reproduce bit-for-bit on any engine (the DuckDB oracle compares them
  // unrounded). Patterns stay in the Java-regex ∩ RE2 subset.

  /** Mean token length in characters (0 for token-less docs). */
  def meanWordLength(c: Column): Column = {
    val toks = tokens(c)
    coalesce(
      aggregate(toks, lit(0), (acc, t) => acc + length(t)).cast("double")
        / nullif(size(toks), lit(0)),
      lit(0.0))
  }

  /** Hash/ellipsis symbols per token — the Gopher symbol-to-word ratio. */
  def symbolWordRatio(c: Column): Column =
    coalesce(
      regexp_count(c, lit("#|\\.\\.\\.")).cast("double") / nullif(tokenCount(c), lit(0)),
      lit(0.0))

  private def lineFraction(c: Column, linePattern: String): Column = {
    val lines = split(c, "\n")
    coalesce(
      size(filter(lines, l => l.rlike(linePattern))).cast("double")
        / nullif(size(lines), lit(0)),
      lit(0.0))
  }

  /** Fraction of lines starting with a bullet marker. */
  def bulletLineFraction(c: Column): Column = lineFraction(c, "^\\s*[-*•]")

  /** Fraction of lines ending with an ellipsis. */
  def ellipsisLineFraction(c: Column): Column = lineFraction(c, "\\.\\.\\.$")

  /** Fraction of tokens containing at least one alphabetic character. */
  def alphaWordFraction(c: Column): Column = {
    val toks = tokens(c)
    coalesce(
      size(filter(toks, t => t.rlike("[A-Za-z]"))).cast("double")
        / nullif(size(toks), lit(0)),
      lit(0.0))
  }

  /** The Gopher keep/drop decision from the published thresholds (word count in
    * [minWords, maxWords], mean word length in [3, 10], symbol ratio < 0.1, bullet
    * lines < 0.9, ellipsis lines < 0.3, alpha-word fraction > 0.8, ≥ 2 stopword
    * hits). Thresholds compare UNROUNDED exact ratios — reproducible cross-engine.
    * `minWords` defaults to 50 as published; corpora of short documents tune it.
    */
  def passesGopherRules(c: Column, minWords: Int = 50, maxWords: Int = 100000): Column = {
    val n = tokenCount(c)
    // multilingual stopword list: English stopwords ∪ every language's markers
    // (the published rule is English-only; the union keeps it meaningful corpus-wide)
    val stopList = (EnglishStopwords ++ LangMarkers.flatMap(_._2)).distinct
    val stopHits = size(filter(tokens(c), t => t.isInCollection(stopList)))
    (n >= minWords) && (n <= maxWords) &&
      (meanWordLength(c) >= 3.0) && (meanWordLength(c) <= 10.0) &&
      (symbolWordRatio(c) < 0.1) &&
      (bulletLineFraction(c) < 0.9) &&
      (ellipsisLineFraction(c) < 0.3) &&
      (alphaWordFraction(c) > 0.8) &&
      (stopHits >= 2)
  }

  /** URL pattern — lookahead-free so Java regex (Spark) and RE2 (the DuckDB oracle)
    * agree match-for-match; covers the http(s) links a web corpus carries.
    */
  val UrlPattern: String = "https?://[A-Za-z0-9._~:/?#@!$&'()*+,;=%-]+"

  /** Encoding-damage signals: the Unicode replacement char (U+FFFD — the classic
    * mojibake tell) plus C0/C1 control characters other than tab/LF/CR. The class
    * stays in the Java-regex ∩ RE2 subset (`\x{..}` escapes) so the DuckDB oracle
    * matches char-for-char; all members are BMP, so Spark's UTF-16 `length` and
    * DuckDB's codepoint `length` agree on every ratio divisor.
    */
  val MojibakePattern: String =
    "[\\x{00}-\\x{08}\\x{0B}\\x{0C}\\x{0E}-\\x{1F}\\x{7F}-\\x{9F}\\x{FFFD}]"

  def mojibakeCount(c: Column): Column = regexp_count(c, lit(MojibakePattern))

  /** Damaged-character fraction, 0 for empty docs — the drop-broken-decodes filter. */
  def mojibakeRatio(c: Column): Column =
    when(length(c) === 0, lit(0.0))
      .otherwise(mojibakeCount(c).cast("double") / length(c))

  /** Link count per document (C4/FineWeb-style link-density quality signal). */
  def urlCount(c: Column): Column = regexp_count(c, lit(UrlPattern))

  /** Links per token, 0 for token-less docs — link-heavy pages are boilerplate-prone.
    * `nullif`/`coalesce` form so the tokenization is referenced ONCE (a zero-guard
    * `when` would re-inline the split+filter pipeline for the guard and the divisor).
    */
  def urlDensity(c: Column): Column =
    coalesce(urlCount(c).cast("double") / nullif(tokenCount(c), lit(0)), lit(0.0))

  /** URL canonicalization (the dedup/blocklist/domain-mixing preprocessor): strip
    * the `#fragment`, drop `utm_*` tracking params (keeping the rest of the query),
    * lowercase the `scheme://host` prefix, trim trailing punctuation and a trailing
    * slash. Deliberately a pure regex chain with NO capture-group replacements —
    * Java (`$1`) and RE2 (`\1`) replacement syntax differ, so avoiding backrefs is
    * what lets the DuckDB oracle replay the chain verbatim.
    */
  def canonicalizeUrl(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*", "")
    // &utm_x=v anywhere; then ?utm_x=v& keeping the ?; then a ?utm_x=v tail
    val noAmpUtm = regexp_replace(noFrag, "&utm_[A-Za-z_]+=[^&#]*", "")
    val noQUtmMid = regexp_replace(noAmpUtm, "\\?utm_[A-Za-z_]+=[^&#]*&", "?")
    val noUtm = regexp_replace(noQUtmMid, "\\?utm_[A-Za-z_]+=[^&#]*$", "")
    val prefix = regexp_extract(noUtm, "^(https?://[^/?#]*)", 1)
    val lowered = concat(lower(prefix), noUtm.substr(length(prefix) + 1, lit(1000000)))
    regexp_replace(regexp_replace(lowered, "[.,;:!?]+$", ""), "/$", "")
  }

  /** HTML → text extraction (the "wet extraction" step upstream of every quality
    * filter when the corpus arrives as crawled markup): drop script/style blocks
    * with their CONTENT, turn block-level boundaries (`<br>`, `</p>`, `</div>`,
    * `</li>`, `</h1..6>`, `</tr>`) into newlines, strip every remaining tag,
    * decode the six ubiquitous entities (`&lt; &gt; &quot; &#39; &nbsp;` first,
    * `&amp;` LAST so `&amp;lt;` decodes to the literal `&lt;`, not `<`), then
    * normalize whitespace (collapse runs, trim around newlines, single newlines).
    * Pure RE2-safe regex chain — no backrefs, no lookaround — so a SQL oracle
    * replays it verbatim (same constraint as [[canonicalizeUrl]]). Row-local and
    * codegen'd: no shuffle, no UDF.
    */
  def stripHtml(c: Column): Column = {
    val noScript = regexp_replace(c, "(?is)<script[^>]*>.*?</script>", "")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", "")
    val blocks = regexp_replace(noStyle, "(?i)<(br|/p|/div|/li|/h[1-6]|/tr)[^>]*>", "\n")
    val noTags = regexp_replace(blocks, "<[^>]*>", "")
    val ent = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (acc, (pat, rep)) => regexp_replace(acc, pat, rep) }
    val oneSpace = regexp_replace(ent, "[ \\t]+", " ")
    val tightNl = regexp_replace(oneSpace, " ?\\n ?", "\n")
    val oneNl = regexp_replace(tightNl, "\\n+", "\n")
    trim(regexp_replace(oneNl, "^\\n+|\\n+$", ""))
  }

  /** Registrable host of a (canonicalized) URL — the domain-histogram group key. */
  def urlHost(u: Column): Column = regexp_extract(u, "^https?://([^/?#]*)", 1)

  /** All canonicalized URLs of a document, row-local (explode downstream). */
  def canonicalUrls(c: Column): Column =
    transform(regexp_extract_all(c, lit(UrlPattern), lit(0)), u => canonicalizeUrl(u))

  /** Language marker words per language, in priority order for tie-breaking. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "is"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un"),
    "es" -> Seq("el", "los", "las", "y", "que", "un"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "zh" -> Seq("的", "是", "了", "在", "有"))

  /** Marker-hit count (with multiplicity) for one language. */
  def langScore(c: Column, markers: Seq[String]): Column =
    size(filter(tokens(c), t => t.isInCollection(markers)))

  /** N-gram-heuristic language ID: the first language (in [[LangMarkers]] order) whose
    * marker-hit count equals the maximum; `und` when no marker hits at all.
    */
  def langId(c: Column): Column = {
    val scores = LangMarkers.map { case (lang, ms) => lang -> langScore(c, ms) }
    val maxScore = greatest(scores.map(_._2): _*)
    // foldRight keeps the FIRST matching language as the outermost `when`
    scores.foldRight(lit("und")) { case ((lang, s), acc) =>
      when(s === maxScore && maxScore > 0, lit(lang)).otherwise(acc)
    }
  }
}
