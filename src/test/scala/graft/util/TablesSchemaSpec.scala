package graft.util

import org.scalatest.funsuite.AnyFunSuite

/** Testdata-schema canary: pins the ENGINE-FACING schema (post
  * [[Tables.t]], i.e. after events-ts normalization) of all 10 driver
  * tables against the live testdata dir. Round 7 lost 16 queries to a
  * silent testdata regeneration (`events.ts` flipped parquet unit from
  * NANOS to micros) that surfaced as scattered AnalysisExceptions; this
  * suite makes the next drift fail in ONE place and NAME the column.
  * Encodings the adaptive reader absorbs by design (ts as nanos-long /
  * NTZ / instant — [[Tables.normalizeEventTs]]) all converge to the
  * same engine schema and keep this green. */
class TablesSchemaSpec extends AnyFunSuite {

  private val spark = graft.SparkTestSession.spark

  /** Every scale factor present on this box — the gate/bench run at
    * sf0.1 while this canary used to check only sf0.001, which left
    * the silent-drift mode it documents (a >64-dim regeneration of
    * ONE sf dir truncating identically on both engines) unpinned at
    * the scale the gate actually uses. Schema-adaptive per the
    * drift-defense convention: whatever sf dirs exist are checked. */
  private val dirs: Seq[String] = {
    val root = new java.io.File("/root/testdata")
    val found = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("sf"))
      .map(_.getAbsolutePath).sorted.toSeq
    assert(found.nonEmpty, "no /root/testdata/sf* dirs present")
    found
  }

  private val expected: Map[String, Seq[(String, String)]] = Map(
    "region" -> Seq("r_regionkey" -> "int", "r_name" -> "string"),
    "nation" -> Seq("n_nationkey" -> "int", "n_name" -> "string",
      "n_regionkey" -> "int"),
    "customer" -> Seq("c_custkey" -> "bigint", "c_name" -> "string",
      "c_nationkey" -> "int", "c_acctbal" -> "double",
      "c_mktsegment" -> "string"),
    "supplier" -> Seq("s_suppkey" -> "bigint", "s_name" -> "string",
      "s_nationkey" -> "int", "s_acctbal" -> "double"),
    "part" -> Seq("p_partkey" -> "bigint", "p_name" -> "string",
      "p_brand" -> "string", "p_type" -> "string", "p_size" -> "int",
      "p_retailprice" -> "double"),
    "orders" -> Seq("o_orderkey" -> "bigint", "o_custkey" -> "bigint",
      "o_orderstatus" -> "string", "o_totalprice" -> "double",
      "o_orderdate" -> "timestamp_ntz", "o_orderpriority" -> "string"),
    "lineitem" -> Seq("l_orderkey" -> "bigint", "l_partkey" -> "bigint",
      "l_suppkey" -> "bigint", "l_linenumber" -> "int",
      "l_quantity" -> "double", "l_extendedprice" -> "double",
      "l_discount" -> "double", "l_tax" -> "double",
      "l_returnflag" -> "string", "l_linestatus" -> "string",
      "l_shipdate" -> "timestamp_ntz"),
    // ts is "timestamp" (an instant), NOT the raw file type: Tables.t
    // normalizes every supported on-disk unit to session-TZ Timestamp.
    "events" -> Seq("event_id" -> "bigint", "ts" -> "timestamp",
      "user_id" -> "bigint", "event_type" -> "string",
      "value" -> "double", "props" -> "string"),
    "documents" -> Seq("doc_id" -> "bigint", "text" -> "string",
      "lang" -> "string", "source" -> "string", "n_chars" -> "bigint"),
    "embeddings" -> Seq("vec_id" -> "bigint",
      "embedding" -> "array<float>", "label" -> "int"))

  test("all 10 driver tables read with the engine-expected schema") {
    assert(expected.keySet == Tables.names.toSet,
      "canary must cover exactly the driver table set")
    val drift = dirs.flatMap { dir =>
      Tables.names.flatMap { name =>
        val got = Tables.t(spark, dir, name).schema.fields
          .map(f => f.name -> f.dataType.simpleString).toSeq
        val want = expected(name)
        if (got == want) Nil
        else {
          // Name the drifted columns, not just the table.
          val gm = got.toMap; val wm = want.toMap
          val cols = (gm.keySet ++ wm.keySet).toSeq.sorted.flatMap { c =>
            (wm.get(c), gm.get(c)) match {
              case (Some(w), Some(g)) if w != g =>
                Some(s"$dir $name.$c: expected $w, testdata reads $g")
              case (Some(w), None) =>
                Some(s"$dir $name.$c: expected $w, MISSING")
              case (None, Some(g)) =>
                Some(s"$dir $name.$c: UNEXPECTED ($g)")
              case _ => None
            }
          }
          if (cols.nonEmpty) cols
          else Seq(s"$dir $name: column ORDER drifted — got " +
            got.map(_._1).toString)
        }
      }
    }
    assert(drift.isEmpty, "\nTESTDATA SCHEMA DRIFT:\n" + drift.mkString("\n"))
  }

  test("testdata value invariants the oracles lean on hold (dims, ASCII)") {
    import org.apache.spark.sql.functions._
    dirs.foreach { dir =>
      // Embedding dimensionality: the quantized-centroid aggregator, its
      // DuckDB oracle (range(1,65)) and the LSH coefficient oracle all
      // assume EXACTLY 64 dims. A wider regeneration would otherwise
      // TRUNCATE silently on both sides and still hash-match — this
      // canary makes a dim drift loud and named instead, at EVERY sf
      // present (the gate runs sf0.01, bench sf0.1 — a drift in just
      // one dir must not slip past a canary that checks another).
      val dims = Tables.t(spark, dir, "embeddings")
        .agg(min(size(col("embedding"))).as("lo"),
          max(size(col("embedding"))).as("hi"))
        .collect().head
      assert(dims.getInt(0) == 64 && dims.getInt(1) == 64,
        s"$dir: embedding dims drifted to " +
          s"[${dims.getInt(0)}, ${dims.getInt(1)}] " +
          "— update CentroidAgg.centroidQ(64), the centroid_udaf oracle " +
          "(range(1,65)) and the ann_lsh_pairs coefficient oracle " +
          "(range(0,64)) together")
      // documents.text ASCII-ness: the bpe_train oracle splits words into
      // chars with DuckDB string_split('') (code points) while Spark
      // split("") yields UTF-16 units — identical only for ASCII; the
      // multimodal_media oracle's byte-slicing makes the same assumption.
      val nonAscii = Tables.t(spark, dir, "documents")
        .filter(not(col("text").rlike("^[\\x00-\\x7F]*$"))).count()
      assert(nonAscii == 0,
        s"$dir: $nonAscii documents contain non-ASCII text — the " +
          "bpe_train and multimodal_media oracles assume ASCII (UTF-16 " +
          "unit vs code point split parity); revisit both before " +
          "trusting the gate")
    }
  }
}
