package graft.ops

import graft.SparkSpec

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ev = Seq(
    // u1 completes the funnel in order
    (1L, "view", 10L), (1L, "click", 20L), (1L, "buy", 30L),
    // u2 clicks BEFORE viewing: click doesn't count, buy neither
    (2L, "click", 5L), (2L, "view", 10L), (2L, "buy", 4L),
    // u3 views then clicks; no buy
    (3L, "view", 1L), (3L, "click", 2L),
    // u4 same-timestamp click: strictly-after excludes it
    (4L, "view", 7L), (4L, "click", 7L)
  ).toDF("user_id", "event_type", "ts")

  test("stepwise ordered conversion with strictly-after semantics") {
    val out = Funnel.steps(ev, "user_id", "event_type", "ts",
        Seq("view", "click", "buy"))
      .as[(Int, String, Long)].collect().toSet
    assert(out == Set((1, "view", 4L), (2, "click", 2L), (3, "buy", 1L)))
  }

  test("greedy earliest-first finds a valid ordering when one exists") {
    // u5: view@10, click@15, view@20 — funnel view->click must count u5
    // via the FIRST view, and a (view,click,view) 3-step funnel needs
    // the second view after the click
    val e2 = Seq((5L, "view", 10L), (5L, "click", 15L), (5L, "view", 20L))
      .toDF("user_id", "event_type", "ts")
    val two = Funnel.steps(e2, "user_id", "event_type", "ts",
        Seq("view", "click")).as[(Int, String, Long)].collect().toSet
    assert(two == Set((1, "view", 1L), (2, "click", 1L)))
    val three = Funnel.steps(e2, "user_id", "event_type", "ts",
        Seq("view", "click", "view")).as[(Int, String, Long)].collect().toSet
    assert(three == Set((1, "view", 1L), (2, "click", 1L), (3, "view", 1L)))
  }

  test("a step type absent from the data zeroes the tail, not the head") {
    val out = Funnel.steps(ev, "user_id", "event_type", "ts",
        Seq("view", "signup", "buy"))
      .as[(Int, String, Long)].collect().toSet
    assert(out == Set((1, "view", 4L), (2, "signup", 0L), (3, "buy", 0L)))
  }
}
