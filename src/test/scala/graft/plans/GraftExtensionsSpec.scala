package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.expressions.{FloatDot, HyperplaneSigs}

class GraftExtensionsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def emb = graft.util.Tables.t(spark, dir, "embeddings")

  test("SQL float_dot resolves and matches the Column API bit-for-bit") {
    import spark.implicits._
    emb.createOrReplaceTempView("ext_emb")
    val viaSql = spark.sql(
      "SELECT vec_id, float_dot(embedding, embedding) AS d FROM ext_emb")
      .as[(Long, Double)].collect().toMap
    val viaCol = emb.select(col("vec_id"),
      FloatDot(col("embedding"), col("embedding")).as("d"))
      .as[(Long, Double)].collect().toMap
    assert(viaSql.nonEmpty && viaSql == viaCol)
  }

  test("SQL hyperplane_sigs takes literal shape args and matches the API") {
    import spark.implicits._
    emb.createOrReplaceTempView("ext_emb")
    val viaSql = spark.sql(
      "SELECT vec_id, hyperplane_sigs(embedding, 8, 4) AS s FROM ext_emb")
      .as[(Long, Seq[Long])].collect().toMap
    val viaCol = emb.select(col("vec_id"),
      HyperplaneSigs(col("embedding"), nBits = 8, nTables = 4).as("s"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(viaSql.nonEmpty && viaSql == viaCol)
  }

  test("hyperplane_sigs rejects non-literal shape args") {
    emb.createOrReplaceTempView("ext_emb")
    val e = intercept[Exception] {
      spark.sql(
        "SELECT hyperplane_sigs(embedding, CAST(vec_id AS INT), 4) " +
          "FROM ext_emb").collect()
    }
    assert(e.getMessage.contains("literal"))
  }
}
