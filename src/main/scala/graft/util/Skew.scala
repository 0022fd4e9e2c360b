package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot keys at scale.
  *
  * AQE's skew-join splitting (on in [[GraftSession]]) is the first
  * line of defense; these are the explicit fallbacks for plans AQE
  * can't rescue — a shuffled join where one key holds a double-digit
  * percentage of rows, or a groupBy whose hot key swamps one reducer
  * before the partial aggregate can help (e.g. collect-style aggs).
  */
object Skew {

  private val SaltCol = "__graft_salt"

  /** Deterministic content-derived salt in [0, nSalts): hashing the
    * row's own columns means a task retry that recomputes the row
    * assigns it the SAME salt — a random or id-derived salt can change
    * on recompute after a shuffle-fetch failure and duplicate/drop rows
    * downstream (the SPARK-23207 class of bug). Exact-duplicate rows
    * share a salt (they can't be told apart), which only matters if the
    * hot key's rows are all byte-identical — then salting can't help
    * anyway.
    *
    * Type restriction: only hash-supported columns participate
    * (xxhash64 raises AnalysisException on e.g. MapType); a schema with
    * no hashable column at all cannot be content-salted and fails with
    * a clear message rather than Spark's analysis error. */
  private def contentSalt(df: DataFrame, nSalts: Int): Column = {
    def hashable(dt: org.apache.spark.sql.types.DataType): Boolean =
      dt match {
        case _: org.apache.spark.sql.types.MapType => false
        case s: org.apache.spark.sql.types.StructType =>
          s.fields.forall(f => hashable(f.dataType))
        case a: org.apache.spark.sql.types.ArrayType =>
          hashable(a.elementType)
        case _ => true
      }
    val cols = df.schema.fields.filter(f => hashable(f.dataType))
      .map(f => col(f.name))
    require(cols.nonEmpty,
      "contentSalt: no hash-supported columns in schema " +
        df.schema.simpleString)
    pmod(xxhash64(cols.toIndexedSeq: _*), lit(nSalts)).cast("int")
  }

  /** Salted shuffle join: the skewed (big) side gets a uniform salt in
    * [0, nSalts); the small side is replicated once per salt value, so
    * every (key, salt) bucket joins correctly and the hot key's rows
    * spread over nSalts reducers instead of one.
    *
    * Cost: small side shuffles ×nSalts — use for moderate right sides
    * (if it were broadcast-small you'd broadcast instead and skew
    * wouldn't matter). */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      nSalts: Int): DataFrame = {
    require(nSalts > 0, "nSalts must be positive")
    val salted = big.withColumn(SaltCol, contentSalt(big, nSalts))
    val replicated = small.withColumn(SaltCol,
      explode(sequence(lit(0), lit(nSalts - 1))))
    salted.join(replicated, keys :+ SaltCol).drop(SaltCol)
  }

  /** Two-phase salted aggregation: groupBy(keys + salt) first (hot key
    * split across nSalts reducers), then re-aggregate the partials by
    * the real keys. `partialAggs`/`finalAggs` must be an associative
    * pair (sum/sum, count/sum, min/min, ...). */
  def saltedAgg(df: DataFrame, keys: Seq[String], nSalts: Int,
      partialAggs: Seq[Column], finalAggs: Seq[Column]): DataFrame = {
    require(nSalts > 0, "nSalts must be positive")
    val salted = df.withColumn(SaltCol, contentSalt(df, nSalts))
    val partial = salted
      .groupBy((keys :+ SaltCol).map(col): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
    partial
      .groupBy(keys.map(col): _*)
      .agg(finalAggs.head, finalAggs.tail: _*)
  }
}
