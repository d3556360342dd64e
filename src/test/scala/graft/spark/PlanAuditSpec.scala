package graft.spark

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Physical-plan audits: the shapes that matter at 100 TB, asserted so a
  * refactor cannot silently regress them. Each mirrors a scale argument
  * made in SURVEY/README:
  *   - projection + filter pushdown reach the parquet scan;
  *   - small dimensions broadcast (no shuffle join for nation/customer);
  *   - IVF assignment is a pure map (no Window, no per-row join);
  *   - the LSH dedup plan contains no cartesian/nested-loop product;
  *   - the brute-force pairwise stage (test-scale by design) is the ONLY
  *     query allowed a nested-loop join.
  */
class PlanAuditSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("s1_scan_project: column pruning + filter pushdown reach the scan") {
    val p = plan("s1_scan_project")
    assert(p.contains("PushedFilters: [IsNotNull(text)]"), p.take(1500))
    // pruned read schema: the projected columns + the filter column only
    val schemaLine = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!schemaLine.contains("lang"), schemaLine)
  }

  test("q2_join_topn: both dimension joins broadcast") {
    val p = plan("q2_join_topn")
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(!p.contains("SortMergeJoin"), p.take(1500))
  }

  test("ann_ivf_topk: assignment is a map — no Window, no per-row join") {
    val p = plan("ann_ivf_topk")
    assert(!p.contains("Window"), p.take(2000))
    assert(p.contains("graft_ivf_assign"), p.take(2000))
  }

  test("ann_lsh_topk: native signature, no interpreted HOF in the plan") {
    val p = plan("ann_lsh_topk")
    assert(p.contains("graft_lsh_project"), p.take(2000))
    assert(!p.contains("aggregate(zip_with"), p.take(2000))
  }

  test("dedup_minhash_pairs: no cartesian or nested-loop join anywhere") {
    val p = plan("dedup_minhash_pairs")
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
  }

  test("events_window/q1_agg: partial aggregation before the shuffle") {
    Seq("events_window", "q1_agg").foreach { q =>
      val p = plan(q)
      // HashAggregate appears twice (partial + final) around one Exchange
      val aggs = p.linesIterator.count(_.contains("HashAggregate"))
      assert(aggs >= 2, s"$q: expected partial+final agg\n${p.take(1500)}")
    }
  }
}
