package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Robustness battery for the media decode stage — the binary twin of
  * [[HostileEmbeddingsSpec]]: a crawl delivers truncated downloads,
  * mislabeled formats, and zero-byte files, and ONE such asset inside
  * a corpus-wide `mapPartitions` decode must not kill the job through
  * task-retry exhaustion. The codec itself stays STRICT (throwing on
  * malformed input is the right per-asset contract); the pipeline
  * stage excludes what it cannot decode — the same admission rule as
  * the zero-norm embedding guard. */
class HostileMediaSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("the decode stage excludes corrupt assets instead of dying") {
    import spark.implicits._
    val w = 8; val h = 8
    val good = PpmCodec.encode(w, h,
      Array.tabulate(w * h * 3)(i => (i % 251).toByte))
    val corrupt: Seq[(Long, Array[Byte])] = Seq(
      1L -> good,
      2L -> Array.empty[Byte],                        // zero-byte file
      3L -> "not a ppm at all".getBytes("UTF-8"),     // wrong format
      4L -> good.take(good.length / 2),               // truncated raster
      5L -> "P6\n8 8\n255\n".getBytes("UTF-8"),       // header, no body
      6L -> good)
    val media = corrupt.toDF("media_id", "payload")
    val embedded = Multimodal.embedDf(media)
      .select("media_id").as[Long].collect().toSet
    assert(embedded == Set(1L, 6L),
      s"decodable set wrong: $embedded")
    // the codec contract itself stays strict
    intercept[IllegalArgumentException] {
      PpmCodec.decode("garbage".getBytes("UTF-8"))
    }
  }
}
