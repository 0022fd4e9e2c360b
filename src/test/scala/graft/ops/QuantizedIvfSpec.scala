package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** X31+X4 gates for the quantized IVF serving path: the brute-force
  * anchor (probe everything + uncut rerank ≡ exact top-k, quantization
  * included), the recall bound at the registered serving settings, the
  * int8 honesty of the store (1-byte codes on disk, smaller than the
  * full-precision store), and the dequantization identity against the
  * [[Similarity.quantizeInt8]] arithmetic. */
class QuantizedIvfSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("probing ALL cells with an uncut rerank reproduces brute force exactly (X31+X4)") {
    import spark.implicits._
    // nProbe = maxCells probes every cell; a rerank factor covering
    // the whole corpus disables the shortlist cut — what remains is
    // exact scoring of every candidate, which must equal the
    // brute-force baseline ROW FOR ROW (scores included): the ivfTopK
    // anchor, now holding through the quantized stage
    val quant = Similarity.ivfQuantizedProbe(spark, dir,
      nProbe = 16, rerankFactor = 10000)
      .as[(Long, Long, Double, Int)].collect().toSeq
    val brute = Similarity.cosineTopK(spark, dir)
      .as[(Long, Long, Double, Int)].collect().toSeq
    assert(quant == brute)
  }

  test("quantization costs (almost) no recall vs the full-precision probe (X31+X4)") {
    import spark.implicits._
    // the meaningful bound ISOLATES the quantization loss: both runs
    // prune the same cells at the registered serving settings, so any
    // recall gap between them is the int8 stage (recall vs exact
    // brute force is the nProbe/maxCells knob, owned by the IVF
    // family's own specs). Deterministic corpus + deterministic
    // arithmetic → a fixed number; a quantization regression that
    // quietly degrades serving recall fails here.
    val quant = Similarity.ivfQuantizedProbe(spark, dir)
      .as[(Long, Long, Double, Int)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val fullp = Similarity.ivfProbeTopK(spark, dir)
      .as[(Long, Long, Double, Int)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(quant.keySet == fullp.keySet)
    val recalls = fullp.map { case (q, exact) =>
      quant(q).intersect(exact).size.toDouble / exact.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9,
      s"mean recall@10 of int8-vs-float serving degraded to $mean")
  }

  test("the store is honest int8: 1-byte codes, smaller than the full store (X31)") {
    val qidx = Similarity.ivfBuildQuantizedIndex(spark, dir)
    val base = Similarity.ivfBuildIndex(spark, dir)
    val schema = spark.read.parquet(s"$qidx/cells").schema
    assert(schema("qcodes").dataType ==
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.ByteType),
      s"qcodes must be int8 on disk, got ${schema("qcodes").dataType}")
    def bytes(p: String): Long = {
      val root = java.nio.file.Paths.get(p)
      val ls = java.nio.file.Files.walk(root)
      try ls.toArray.map(_.asInstanceOf[java.nio.file.Path])
        .filter(f => java.nio.file.Files.isRegularFile(f))
        .map(f => java.nio.file.Files.size(f)).sum
      finally ls.close()
    }
    val qb = bytes(s"$qidx/cells")
    val fb = bytes(s"$base/cells")
    assert(qb < fb,
      s"quantized store ($qb B) must be smaller than full ($fb B)")
    // same row count — every vector of the full store is served
    assert(spark.read.parquet(s"$qidx/cells").count() ==
      spark.read.parquet(s"$base/cells").count())
  }

  test("stored codes dequantize exactly per the quantizeInt8 arithmetic (X31)") {
    import spark.implicits._
    val qidx = Similarity.ivfBuildQuantizedIndex(spark, dir)
    // recompute codes from the raw vectors with the registered
    // quantization chain and compare against the STORED bytes
    val recomputed = graft.util.Tables.t(spark, dir, "embeddings")
      .withColumn("v", transform(col("embedding"), x => x.cast("double")))
      .withColumn("vmin", array_min(col("v")))
      .withColumn("scale",
        (array_max(col("v")) - array_min(col("v"))) / lit(255.0))
      .select(col("vec_id"), transform(col("v"), x =>
        when(col("scale") === 0.0, lit(0L)).otherwise(
          least(lit(255L), floor((x - col("vmin")) / col("scale"))
            .cast("long")))).as("codes"))
      .as[(Long, Seq[Long])].collect().toMap
    val stored = spark.read.parquet(s"$qidx/cells")
      .select(col("vec_id"), transform(col("qcodes"),
        b => b.cast("long") + 128L).as("codes"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(stored.nonEmpty && stored.keySet.subsetOf(recomputed.keySet))
    stored.foreach { case (id, cs) =>
      assert(cs == recomputed(id), s"vec $id codes drifted")
    }
  }
}
