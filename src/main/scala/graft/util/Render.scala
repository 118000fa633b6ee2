package graft.util

/** Shared literal/string renderers for builder-authored artifacts (oracle SQL,
  * harness JSON). Centralized because both have bitten before: a driver json.load
  * once failed on an unescaped control char, and `f"%e"` formatting is
  * locale-sensitive (a comma-decimal default locale would render `1,2e-07` and
  * break the oracle SQL syntactically).
  */
object Render {

  /** A double as a SQL literal that DuckDB parses back to the same IEEE value:
    * Scala's shortest-round-trip `toString` when plain, locale-pinned scientific
    * notation otherwise.
    */
  def sqlDouble(x: Double): String = {
    val s = x.toString
    if (s.contains("E")) String.format(java.util.Locale.ROOT, "%.20e", Double.box(x))
    else s
  }

  /** JSON string literal: escapes backslash, quote, and ALL control chars (<0x20)
    * so builder-authored SQL with tabs/CRs can never break the driver's json.load.
    */
  def jsonString(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
