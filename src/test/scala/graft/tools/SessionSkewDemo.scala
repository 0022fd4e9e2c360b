package graft.tools

import org.apache.spark.sql.functions._
import graft.util.{GraftSession, Skew}

/** Sample-code driver for GraftSession + Skew through the public API.
  * Run: sbt "Test/runMain graft.tools.SessionSkewDemo" */
object SessionSkewDemo {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("demo", cpus = 8)
    spark.sparkContext.setLogLevel("ERROR")
    println("CONF aqe=" + spark.conf.get("spark.sql.adaptive.enabled")
      + " skewJoin=" + spark.conf.get("spark.sql.adaptive.skewJoin.enabled")
      + " shuffle=" + spark.conf.get("spark.sql.shuffle.partitions")
      + " tz=" + spark.conf.get("spark.sql.session.timeZone"))
    // skewed join on real testdata: orders (hot synthetic key) x customer
    val orders = graft.util.Tables.t(spark, "/root/testdata/sf0.01", "orders")
      .withColumn("k", when(col("o_orderkey") % 10 < 8, 1L) // 80% hot key
        .otherwise(col("o_custkey")))
    val dim = graft.util.Tables.t(spark, "/root/testdata/sf0.01", "customer")
      .select(col("c_custkey").as("k"), col("c_name"))
    val plain = orders.join(dim, Seq("k")).count()
    val salted = Skew.saltedJoin(orders, dim, Seq("k"), nSalts = 16).count()
    println(s"JOIN plain=$plain salted=$salted equal=${plain == salted}")
    val direct = orders.groupBy("k").agg(sum("o_totalprice").as("s")).count()
    val sagg = Skew.saltedAgg(orders, Seq("k"), 16,
      Seq(sum("o_totalprice").as("s")), Seq(sum("s").as("s"))).count()
    println(s"AGG direct=$direct salted=$sagg equal=${direct == sagg}")
    spark.stop()
  }
}
