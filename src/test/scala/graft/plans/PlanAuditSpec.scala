package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** The failing-spec version of the advisory `tools/PlanAudit` sweep
  * (round-9, VERDICT r8 item 7): every registered query's PHYSICAL
  * plan is walked, and a cartesian anywhere — or a
  * BroadcastNestedLoopJoin outside the explicit allowlist — fails the
  * suite. This is the structural half of the 100 TB contract: a plan
  * with an unkeyed n×m join is broken at scale regardless of local
  * wall time, so it must not be able to land silently.
  *
  * The BNLJ allowlist is the set of queries whose nested-loop side is
  * BOUNDED BY CONSTRUCTION (a broadcast query set, a 1-row aggregate,
  * or corpus-constant stats — never a data-scaled relation):
  *  - similarity_topk / filtered_topk / media_embed_topk:
  *    `crossJoin(broadcast(queries))` — the fixed top-k query set.
  *  - fk_violations: two 1-row aggregates crossed into one row.
  *  - q22_dormant_rich: TPC-H Q22's scalar avg-balance subquery.
  *  - tfidf_top_terms / bm25_search: corpus-constant doc-count/IDF
  *    scalars joined onto the term stream.
  * CartesianProduct has NO allowlist: since the round-9 cosine_pairs
  * rework (cell-bound pruning + salted block equi-joins) no registered
  * plan needs one.
  *
  * Driver-side collects stay out of scope here — the bounded ones
  * (IVF codebooks, BPE vocab, upsert dt-lists) are documented serving
  * constants, and a plan-string audit cannot see them anyway; the
  * VERDICT-tracked inventory lives in their scaladocs. */
class PlanAuditSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private val bnljAllowed = Set(
    "similarity_topk", "filtered_topk", "media_embed_topk",
    "fk_violations", "q22_dormant_rich", "tfidf_top_terms", "bm25_search")

  test("no registered plan contains a cartesian; BNLJ only on bounded broadcast sides") {
    val bad = Seq.newBuilder[String]
    graft.SparkEntry.registry.foreach { case (name, q) =>
      val plan =
        try q.fn(spark, dir).queryExecution.executedPlan.toString
        catch {
          case e: Throwable =>
            bad += s"$name: plan build failed: " +
              String.valueOf(e.getMessage).take(120)
            ""
        }
      if (plan.contains("CartesianProduct"))
        bad += s"$name: CartesianProduct in physical plan"
      if (plan.contains("BroadcastNestedLoopJoin") && !bnljAllowed(name))
        bad += s"$name: BroadcastNestedLoopJoin outside the allowlist"
    }
    val failures = bad.result()
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("BNLJ allowlist stays tight: allowlisted queries do plan a BNLJ") {
    // an entry that stops planning a BNLJ should be REMOVED — a stale
    // allowlist row is a latent hole, not a convenience
    val stale = bnljAllowed.filter { name =>
      val q = graft.SparkEntry.registry.find(_._1 == name)
        .getOrElse(fail(s"allowlisted query $name is not registered"))._2
      !q.fn(spark, dir).queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin")
    }
    assert(stale.isEmpty, s"allowlist rows no longer needed: $stale")
  }
}
