package graft

import org.apache.spark.sql.SparkSessionExtensions

class ExtensionsSpec extends SparkSpec {

  test("registered SQL functions match the Column facade") {
    GraftExtensions.register(spark)
    import spark.implicits._

    val sim = spark.sql("SELECT jaro_winkler('martha', 'marhta') AS s").as[Double].first()
    assert(math.abs(sim - 0.9611111111111111) < 1e-9)

    val sh = spark.sql("SELECT word_shingles('a b c d', 3) AS s").as[Seq[String]].first()
    assert(sh === Seq("a b c", "b c d"))

    // default keeps multiplicity (matches TextOps.shingles); distinct=true dedups
    val dup = spark.sql("SELECT word_shingles('a b a b a', 2) AS s").as[Seq[String]].first()
    assert(dup === Seq("a b", "b a", "a b", "b a"))
    val dis = spark.sql("SELECT word_shingles('a b a b a', 2, true) AS s")
      .as[Seq[String]].first()
    assert(dis === Seq("a b", "b a"))

    val dot = spark.sql("SELECT array_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .as[Double].first()
    assert(dot === 11.0)

    val draw = spark.sql("SELECT hash_draw(42, 'mix1') AS d").as[String].first()
    assert(draw.matches("[0-9a-f]{8}"))

    // aggregates resolve through the registry and wrap correctly
    Seq(("a", "x"), ("a", "y"), ("b", "x")).toDF("c1", "c2").createOrReplaceTempView("t")
    val ent = spark.sql("SELECT entropy_agg(0, c1, c2) AS e FROM t")
      .selectExpr("e['c1']").as[Double].first()
    // entropy of {a:2, b:1}: −Σ p·log10(p) / log10(#distinct=2)
    val expected =
      -(2.0 / 3 * math.log10(2.0 / 3) + 1.0 / 3 * math.log10(1.0 / 3)) / math.log10(2.0)
    assert(math.abs(ent - expected) < 1e-9)

    val combo = spark.sql(
      "SELECT combinatorial_count_agg(1, 0, 1000, c1) AS m FROM t")
      .selectExpr("m['c1;a']").as[Long].first()
    assert(combo === 2L)

    // round-4 registrations
    val pooled = spark.sql(
      "SELECT array_avg_agg(v) AS m FROM (SELECT array(1.0d, 3.0d) AS v UNION ALL SELECT array(3.0d, 5.0d))")
      .as[Seq[Double]].first()
    assert(pooled === Seq(2.0, 4.0))

    val lev = spark.sql("SELECT bounded_levenshtein('kitten', 'sitting', 3) AS d")
      .as[Int].first()
    assert(lev === 3)
    val levOver = spark.sql("SELECT bounded_levenshtein('kitten', 'sitting', 2) AS d")
      .as[Int].first()
    assert(levOver === -1)
    val folded = spark.sql("SELECT strip_accents('Café NAÏVE') AS s").as[String].first()
    assert(folded === "Cafe NAIVE")
    val ids = spark.sql(
      """SELECT vocab_encode(array('a', 'b', 'zz'), '{"a": 1, "b": 2}') AS ids""")
      .as[Seq[Int]].first()
    assert(ids === Seq(1, 2, 0))
  }

  test("non-literal static parameters are rejected with a clear error") {
    GraftExtensions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT word_shingles('a b c', length('xx')) AS s").collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }

  test("the extensions class injects every description without error") {
    new GraftExtensions().apply(new SparkSessionExtensions)
  }

  test("type-checked functions: NULL coerces (null-safe NULL out), wrong types fail analysis") {
    GraftExtensions.register(spark)
    // ImplicitCastInputTypes: NULL literals stay usable (pre-r10 behavior)...
    val r = spark.sql(
      "SELECT char_entropy(NULL) AS e, nfc_normalize(NULL) AS n, " +
        "lcs_length(NULL, array('a')) AS l").first()
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
    // ...while a non-coercible argument fails AT ANALYSIS with a typed error,
    // not a ClassCastException inside codegen (the r10 ADVICE fix)
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT lcs_length(map('a', 1), map('b', 2)) AS l").collect()
    }
    assert(e.getMessage.toLowerCase.contains("type"))
  }
}
