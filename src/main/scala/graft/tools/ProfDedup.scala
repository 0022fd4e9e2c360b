package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.util.{GraftSession, Tables}
import graft.ops.Dedup

/** Scratch profiler for the near-dup pipeline (not part of the shipped
  * API; delete when the investigation is done). Every measured frame is
  * REBUILT inside the timed closure — a pre-built DataFrame reuses its
  * shuffle map outputs across repeated actions and reads artificially
  * fast. */
object ProfDedup {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("prof-dedup",
      master = Some("local[32]")).getOrCreate()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def time(name: String)(f: => Long): Unit = {
      f // warm codegen/JIT once
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); val n = f
        (System.nanoTime() - t0) / 1e9 -> n
      }
      println(f"PROF $name%-28s ${runs.map(_._1).min}%8.3f s  rows=${runs.head._2}")
    }

    def sigs(): DataFrame = Dedup.bandSignatures(spark, dir)
    def buckets(): DataFrame = sigs()
      .groupBy(col("band"), col("sig"))
      .agg(sort_array(collect_list(col("doc_id"))).as("docs"))
      .filter(size(col("docs")) > 1)
    def exploded(): DataFrame = buckets()
      .select(explode(flatten(transform(col("docs"), (a, i) =>
        transform(slice(col("docs"), i + 2, size(col("docs"))), b =>
          struct(a.as("doc_a"), b.as("doc_b")))))).as("p"))
    def full(): DataFrame = exploded()
      .groupBy(col("p.doc_a"), col("p.doc_b"))
      .agg(count(lit(1)).as("n_bands"))
      .filter(col("n_bands") >= 4)

    time("signatures")(sigs().agg(count(col("sig"))).head().getLong(0))
    time("buckets")(buckets().count())
    time("exploded")(exploded().count())
    time("full-pairs")(full().count())
    time("nearDupPairs")(Dedup.nearDupPairs(spark, dir).count())

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    time("pairs-noAQE")(Dedup.nearDupPairs(spark, dir).count())
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    time("pairs-8part")(Dedup.nearDupPairs(spark, dir).count())
    spark.conf.set("spark.sql.shuffle.partitions", "32")

    time("dedupGroups")(Dedup.dedupGroups(spark, dir).count())
    spark.stop()
  }
}
