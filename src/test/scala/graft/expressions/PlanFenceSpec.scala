package graft.expressions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** The r17 optimizer fence (VERDICT r16 item 1): same values as the
  * unfenced expression on both the codegen and interpreted paths, and
  * the one property it exists for — project collapsing may NOT inline
  * the fenced alias into its consumers, so a chain's optimized tree
  * stays O(sum of stages) instead of O(product). */
class PlanFenceSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def chain(fence: org.apache.spark.sql.Column =>
      org.apache.spark.sql.Column) = {
    // range (not a LocalRelation: ConvertToLocalRelation would
    // pre-evaluate the whole projection and hide the rewrite); a is
    // referenced by a filter AND a downstream projection — the shape
    // where pushdown+collapse duplicate the producing expression
    val base = spark.range(64)
      .select(concat(lit("path/Seg-"), $"id", lit("/x")).as("s"))
    base
      .withColumn("a", fence(regexp_replace(upper($"s"), "SEG-", "#")))
      .filter($"a".startsWith("PATH"))
      .withColumn("b", concat($"a", lit("|"), reverse($"a")))
      .select("s", "b")
  }

  test("fenced chain returns bit-identical rows to the unfenced chain") {
    val plain = chain(identity).collect().map(_.toSeq).toSeq
    val fenced = chain(PlanFence(_)).collect().map(_.toSeq).toSeq
    assert(plain.nonEmpty && fenced === plain)
  }

  test("fence stops the optimizer duplicating the alias into consumers") {
    def evalCount(df: org.apache.spark.sql.DataFrame): Int =
      "regexp_replace".r
        .findAllIn(df.queryExecution.optimizedPlan.toString).length
    // unfenced: filter pushdown + collapse substitute the regex into
    // both the pushed Filter and the consuming Project (2 evals/row);
    // fenced: exactly one evaluation survives as its own Project stage
    assert(evalCount(chain(identity)) > 1)
    assert(evalCount(chain(PlanFence(_))) === 1)
  }

  test("fence preserves nulls and evaluates once on the interpreted path") {
    val rows = Seq(Some("x"), None).toDF("s")
      .withColumn("f", PlanFence(upper($"s")))
      .collect()
    assert(rows.map(r => Option(r.get(1))).toSeq === Seq(Some("X"), None))
  }
}
