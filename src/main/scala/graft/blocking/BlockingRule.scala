package graft.blocking

/** The engine's blocking-rule language: an OR of AND-equality clauses over columns,
  * rendered as `"(l.a = r.a AND l.b = r.b) OR (l.c = r.c)"` by
  * [[graft.expressions.ToSplinkRule]] and parsed back here (SURVEY §7.3 — the inverse of
  * E7; consumed the way the reference splits rules at autolinker.py:519-521,545).
  */
final case class BlockingRule(branches: Seq[Seq[String]]) {
  def render: String = graft.expressions.ToSplinkRule.render(
    branches.map(_.mkString(",")))
  def columns: Seq[String] = branches.flatten.distinct
}

object BlockingRule {
  private val Eq = """l\.([A-Za-z0-9_]+)\s*=\s*r\.\1""".r

  /** Parses `"(l.a = r.a AND l.b = r.b) OR (l.c = r.c)"` → branches [[a,b],[c]].
    * Also accepts unparenthesized single branches (`"l.a = r.a"`) and the `"A&B"`
    * column-list shorthand the reference uses for training rules (autolinker.py:227-253).
    */
  def parse(rule: String): BlockingRule = {
    val trimmed = rule.trim
    if (!trimmed.contains("=")) {
      // "A&B" shorthand → single AND branch
      return BlockingRule(Seq(trimmed.split("&").map(_.trim).filter(_.nonEmpty).toSeq))
    }
    val branches = trimmed.split("(?i)\\)\\s+OR\\s+\\(").map { br =>
      val clean = br.replaceAll("[()]", "")
      clean.split("(?i)\\s+AND\\s+").map { eq =>
        Eq.findFirstMatchIn(eq.trim) match {
          case Some(m) => m.group(1)
          case None => throw new IllegalArgumentException(
            s"cannot parse equality clause '$eq' in rule '$rule'")
        }
      }.toSeq
    }.toSeq
    BlockingRule(branches)
  }
}
