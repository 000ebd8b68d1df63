package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regression guards: the properties that matter at 100 TB,
  * asserted so a refactor can't silently lose them. */
class PlanSpec extends AnyFunSuite {
  import SparkFixture.spark

  private val dir = "/root/testdata/sf0.001"
  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("time-range scan pushes the ns range into the parquet reader") {
    val p = plan("t1_time_scan")
    assert(p.contains("PushedFilters:"))
    assert(p.contains("GreaterThanOrEqual(ts,17044128"),
      s"ts range not pushed down:\n$p")
  }

  test("raw projection prunes the read schema to selected columns") {
    val p = plan("t1_time_scan")
    assert(!p.contains("props"), "unprojected column 'props' reached the scan")
  }

  test("knn and top-k limit compile to per-partition TakeOrderedAndProject") {
    assert(plan("s1_knn").contains("TakeOrderedAndProject"))
    assert(plan("o2_topk_limit").contains("TakeOrderedAndProject"))
  }

  test("dimension joins broadcast (no shuffle on the dim side)") {
    val p = plan("j1_revenue_nation")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast joins:\n$p")
  }

  test("windowed aggregation is a single exchange (partial agg map-side)") {
    val p = plan("a8_window")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"expected exactly one shuffle, got $exchanges:\n$p")
  }

  test("IVF cell assignment is shuffle-free (row-local argmax over broadcast centroids)") {
    val emb = graft.sources.Tables.embeddings(spark, dir)
    val cents = graft.operators.Similarity.ivfTrain(emb, nlist = 16, iters = 1)
    val p = graft.operators.Similarity.assignCells(emb, cents)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"assignment must not shuffle:\n$p")
  }

  test("salted aggregation equals the plain aggregate") {
    import org.apache.spark.sql.functions._
    val ev = graft.sources.Tables.events(spark, dir)
    val salted = graft.operators.Salted.aggregate(ev, Seq("event_type"), "value")
      .collect().map(r => r.getString(0) ->
        (math.round(r.getDouble(1) * 1000), r.getLong(2))).toMap
    val plain = ev.groupBy(col("event_type"))
      .agg(sum(coalesce(col("value"), lit(0.0))), count(col("value")))
      .collect().map(r => r.getString(0) ->
        (math.round(r.getDouble(1) * 1000), r.getLong(2))).toMap
    assert(salted == plain)
  }
}
