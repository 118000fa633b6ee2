package graft.model

/** Per-column comparison specification (J2).
  *
  * Gamma convention (Splink 3.x semantics, reference call sites
  * python/arc/autolinker/autolinker.py:452-457):
  *   -1 = either side null (column excluded from scoring)
  *    0 = "all other" (no similarity)
  *    1 = similarity within threshold (levenshtein <= t; jaccard/jaro_winkler >= t)
  *    2 = exact equality
  */
case class ComparisonSpec(column: String, metric: String, threshold: Double) {
  require(Set("levenshtein", "jaccard", "jaro_winkler").contains(metric),
    s"unknown metric $metric")
  def numLevels: Int = 3
}

/** m/u probability vectors indexed by gamma level 0..2 (J9 model payload). */
case class ColumnParams(m: Array[Double], u: Array[Double]) {
  override def toString: String =
    s"ColumnParams(m=${m.mkString("[", ",", "]")}, u=${u.mkString("[", ",", "]")})"
}

/** A trained Fellegi-Sunter model: prior λ, per-column comparison specs + m/u, and the
  * blocking rules used at predict time (reference settings dict autolinker.py:538-546;
  * serialized like splink_mlflow.py:113-118).
  */
case class TrainedModel(
    lambda: Double,
    comparisons: Seq[ComparisonSpec],
    params: Map[String, ColumnParams],
    blockingRules: Seq[String]) {

  def toJson: String = {
    def arr(a: Array[Double]) = a.mkString("[", ",", "]")
    val comps = comparisons.map { c =>
      s"""{"column":${Json.quote(c.column)},"metric":${Json.quote(c.metric)},"threshold":${c.threshold}}"""
    }.mkString("[", ",", "]")
    val ps = params.toSeq.sortBy(_._1).map { case (k, p) =>
      s"""${Json.quote(k)}:{"m":${arr(p.m)},"u":${arr(p.u)}}"""
    }.mkString("{", ",", "}")
    val rules = blockingRules.map(Json.quote).mkString("[", ",", "]")
    s"""{"lambda":$lambda,"comparisons":$comps,"params":$ps,"blocking_rules":$rules}"""
  }
}

object TrainedModel {
  def fromJson(s: String): TrainedModel = {
    val v = Json.parse(s).asInstanceOf[Map[String, Any]]
    def d(x: Any): Double = x.asInstanceOf[Double]
    val comps = v("comparisons").asInstanceOf[List[Any]].map { c =>
      val m = c.asInstanceOf[Map[String, Any]]
      ComparisonSpec(m("column").asInstanceOf[String], m("metric").asInstanceOf[String],
        d(m("threshold")))
    }
    val params = v("params").asInstanceOf[Map[String, Any]].map { case (k, pv) =>
      val m = pv.asInstanceOf[Map[String, Any]]
      k -> ColumnParams(
        m("m").asInstanceOf[List[Any]].map(d).toArray,
        m("u").asInstanceOf[List[Any]].map(d).toArray)
    }
    val rules = v("blocking_rules").asInstanceOf[List[Any]].map(_.asInstanceOf[String])
    TrainedModel(d(v("lambda")), comps, params, rules)
  }
}

/** Minimal JSON codec for model (de)serialization — no external deps by design. */
object Json {
  def quote(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** Parses objects→Map, arrays→List, numbers→Double, plus strings/booleans/null. */
  def parse(s: String): Any = {
    val p = new Parser(s)
    val v = p.value()
    p.skipWs()
    require(p.eof, s"trailing JSON content at ${p.pos}")
    v
  }

  private final class Parser(s: String) {
    var pos = 0
    def eof: Boolean = pos >= s.length
    def skipWs(): Unit = while (!eof && s.charAt(pos).isWhitespace) pos += 1
    def expect(c: Char): Unit = {
      skipWs()
      require(!eof && s.charAt(pos) == c, s"expected '$c' at $pos")
      pos += 1
    }
    def value(): Any = {
      skipWs()
      s.charAt(pos) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => str()
        case 't' => lit("true", true)
        case 'f' => lit("false", false)
        case 'n' => lit("null", null)
        case _ => num()
      }
    }
    private def lit(text: String, v: Any): Any = {
      require(s.startsWith(text, pos), s"bad literal at $pos"); pos += text.length; v
    }
    private def obj(): Map[String, Any] = {
      expect('{'); skipWs()
      if (s.charAt(pos) == '}') { pos += 1; return Map.empty }
      val b = Map.newBuilder[String, Any]
      var done = false
      while (!done) {
        skipWs()
        val k = str()
        expect(':')
        b += (k -> value())
        skipWs()
        if (s.charAt(pos) == ',') pos += 1 else { expect('}'); done = true }
      }
      b.result()
    }
    private def arr(): List[Any] = {
      expect('['); skipWs()
      if (s.charAt(pos) == ']') { pos += 1; return Nil }
      val b = List.newBuilder[Any]
      var done = false
      while (!done) {
        b += value()
        skipWs()
        if (s.charAt(pos) == ',') pos += 1 else { expect(']'); done = true }
      }
      b.result()
    }
    private def str(): String = {
      expect('"')
      val sb = new StringBuilder
      while (s.charAt(pos) != '"') {
        val c = s.charAt(pos)
        if (c == '\\') {
          pos += 1
          s.charAt(pos) match {
            case '"' => sb += '"'
            case '\\' => sb += '\\'
            case '/' => sb += '/'
            case 'n' => sb += '\n'
            case 'r' => sb += '\r'
            case 't' => sb += '\t'
            case 'b' => sb += '\b'
            case 'f' => sb += '\f'
            case 'u' =>
              sb += Integer.parseInt(s.substring(pos + 1, pos + 5), 16).toChar
              pos += 4
          }
        } else sb += c
        pos += 1
      }
      pos += 1
      sb.toString
    }
    private def num(): Double = {
      val start = pos
      while (!eof && (s.charAt(pos).isDigit || "+-.eE".contains(s.charAt(pos)))) pos += 1
      s.substring(start, pos).toDouble
    }
  }
}
