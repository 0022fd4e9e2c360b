package graft.expressions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class CmsExpressionSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  /** Sketch + threshold over the real documents token stream — the
    * exact shape heavyHittersOf feeds the expression. */
  private lazy val (sketchBytes, thr, tok) = {
    val t = graft.util.Tables.t(spark, dir, "documents")
      .select(explode(graft.ops.TextAnalysis.tokens(col("text"))).as("word"))
    val first = t.agg(
      expr("count_min_sketch(word, 0.001d, 0.99d, 42)").as("cms"),
      count(lit(1)).as("total")).head()
    (first.getAs[Array[Byte]](0), first.getLong(1) / 1000L, t)
  }

  test("expression probe is identical to a driver-side estimateCount(String) probe") {
    import spark.implicits._
    // the semantics the replaced UDF had: deserialize the sketch,
    // probe with the token as a java.lang.String
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(sketchBytes))
    val words = tok.distinct().as[String].collect()
    assert(words.length > 20) // meaningful vocabulary, not a toy
    // threshold at the median estimate so the filter provably SPLITS
    // the vocabulary — a threshold every (or no) word clears would
    // pass vacuously
    val ests = words.map(w => cms.estimateCount(w)).sorted
    val midThr = ests(ests.length / 2)
    val expect = words.filter(w => cms.estimateCount(w) > midThr).toSet
    val got = tok.distinct()
      .filter(CmsCountGreaterThan(col("word"), sketchBytes, midThr))
      .as[String].collect().toSet
    assert(got == expect)
    assert(got.nonEmpty && got.size < words.length,
      s"degenerate filter (${got.size}/${words.length}) proves nothing")
  }

  test("cms_count_gt resolves from SQL text through the FunctionRegistry") {
    import spark.implicits._
    // the SQL-parity story of the expression family (float_dot,
    // hyperplane_sigs, cms_count_gt): a pure-SQL user passes the
    // serialized sketch as a BINARY literal and an integer threshold
    val hex = sketchBytes.map(b => f"$b%02x").mkString
    tok.distinct().createOrReplaceTempView("graft_cms_sql")
    val viaSql = spark.sql(
      s"SELECT word FROM graft_cms_sql WHERE cms_count_gt(word, X'$hex', $thr)")
      .as[String].collect().toSet
    val viaColumn = tok.distinct()
      .filter(CmsCountGreaterThan(col("word"), sketchBytes, thr))
      .as[String].collect().toSet
    assert(viaSql == viaColumn)
    assert(viaSql.nonEmpty, "vacuous SQL-parity check")
    // literal contract is enforced, not silently mis-planned
    val err = intercept[Exception](spark.sql(
      "SELECT cms_count_gt(word, word, 1) FROM graft_cms_sql").collect())
    assert(err.getMessage.contains("BINARY literal"))
  }

  test("expression survives codegen with fallback disabled; null word -> null") {
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      // doGenCode must compile and run — a broken codegen path would
      // throw here instead of silently falling back to interpretation
      val n = tok.filter(CmsCountGreaterThan(col("word"), sketchBytes, thr))
        .count()
      assert(n > 0)
      val rows = Seq(Some("the"), None).toDF("word")
        .select(CmsCountGreaterThan(col("word"), sketchBytes, -1L).as("hit"))
        .collect()
      assert(rows(0).getBoolean(0)) // any present token has count > -1
      assert(rows(1).isNullAt(0))
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }
}
