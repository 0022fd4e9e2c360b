package graft.tools

import org.apache.spark.sql.functions._

object CodegenCheck {
  def main(args: Array[String]): Unit = {
    val spark = graft.util.GraftSession.local("cg", 4)
    spark.sparkContext.setLogLevel("ERROR")
    // a pure projection over FloatDot - the shape whole-stage codegen fuses
    val df = graft.util.Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
      .select(graft.ops.Similarity.dot(col("embedding"), col("embedding")).as("d"))
    val cg = org.apache.spark.sql.execution.debug.codegenString(
      df.queryExecution.executedPlan)
    println("WSCG_SUBTREES=" + cg.linesIterator.count(_.contains("WholeStageCodegen")))
    println("GETFLOAT_LINES=" + cg.linesIterator.count(_.contains("getFloat")))
    cg.linesIterator.filter(_.contains("getFloat")).take(2)
      .foreach(l => println("LINE: " + l.trim.take(120)))
    // and the value is right
    val v = df.head().getDouble(0)
    println(f"NORM_SQ_SAMPLE=$v%.6f")
    spark.stop()
  }
}
