package graft

import org.apache.spark.sql.functions._

import graft.textops.ChatOps

class ChatOpsSpec extends SparkSpec {
  import spark.implicits._

  private def run(recs: (Long, String)*) =
    ChatOps.validateChat(recs.toDF("id", "conv"), col("id"), col("conv"), maxTokens = 10)
      .orderBy("id")
      .as[(Long, Boolean, Int, Boolean, Boolean, Boolean, Boolean, Boolean, Long, Boolean)]
      .collect()

  test("validateChat: a well-formed conversation passes every check") {
    val out = run((1L,
      """[{"role":"system","content":"be brief"},
        |{"role":"user","content":"hi there"},
        |{"role":"assistant","content":"hello"}]""".stripMargin)).head
    assert(out === ((1L, false, 3, true, true, true, true, false, 5L, true)))
  }

  test("validateChat: malformed JSON is flagged with zeroed stats") {
    val out = run((1L, """[{"role":"user","content":"hi""")).head
    assert(out._2 && out._3 === 0 && out._9 === 0L && !out._10)
  }

  test("validateChat: role-order defects - swap, dangling user, double user") {
    val out = run(
      (1L, """[{"role":"assistant","content":"a"},{"role":"user","content":"u"}]"""),
      (2L, """[{"role":"user","content":"u"},{"role":"assistant","content":"a"},{"role":"user","content":"u2"}]"""),
      (3L, """[{"role":"user","content":"u"},{"role":"user","content":"u2"}]"""))
    assert(!out(0)._5 && !out(0)._10) // starts_user false
    assert(out(1)._5 && out(1)._6 && !out(1)._7 && !out(1)._10) // ends_assistant false
    assert(!out(2)._6 && !out(2)._10) // alternates false
  }

  test("validateChat: whitespace-only and missing content both flag empty") {
    val out = run(
      (1L, """[{"role":"user","content":"  "},{"role":"assistant","content":"a"}]"""),
      (2L, """[{"role":"user","content":"u"},{"role":"assistant"}]"""))
    assert(out(0)._8 && !out(0)._10)
    assert(out(1)._8 && !out(1)._10)
  }

  test("validateChat: token budget, empty array, system not required") {
    val out = run(
      (1L, """[{"role":"user","content":"one two three four five six"},{"role":"assistant","content":"seven eight nine ten eleven"}]"""),
      (2L, "[]"),
      (3L, """[{"role":"user","content":"q"},{"role":"assistant","content":"a"}]"""))
    assert(out(0)._9 === 11L && !out(0)._10) // 11 > 10 budget
    assert(out(1)._3 === 0 && !out(1)._10)
    assert(!out(2)._4 && out(2)._10) // no system, still valid
  }
}
