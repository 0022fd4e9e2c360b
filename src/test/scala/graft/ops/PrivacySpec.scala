package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class PrivacySpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private lazy val redacted = Privacy.piiRedact(spark, "unused").cache()

  test("no PII shape survives redaction") {
    // Run the detectors over the REDACTED text: every count must be 0.
    val leftovers = redacted.select(
      Privacy.Rules.zipWithIndex.map { case ((pat, _), i) =>
        sum(size(regexp_extract_all(col("redacted"), lit(pat), lit(0))))
          .as(s"k$i")
      }: _*).collect()(0)
    (0 until Privacy.Rules.size).foreach { i =>
      assert(leftovers.getLong(i) == 0L, s"rule $i leaked through")
    }
    // and no raw '@' or 'http' remains outside the placeholder tokens
    assert(redacted.filter(col("redacted").contains("@")).count() == 0)
    assert(redacted.filter(col("redacted").contains("http")).count() == 0)
  }

  test("counts match the generator's embedding schedule") {
    // gen_pii_fixture.py embeds an email when i%3==0 plus two more when
    // i%7==0; a URL when i%4==0 or i%11==0; spot-check aggregates.
    val agg = redacted.agg(
      sum("n_email").as("e"), sum("n_url").as("u"),
      sum("n_ip").as("i"), sum("n_phone").as("p")).collect()(0)
    val expEmail = (0 until 400).map(i =>
      (if (i % 3 == 0) 1 else 0) + (if (i % 7 == 0) 2 else 0)).sum
    val expUrl = (0 until 400).map(i =>
      (if (i % 11 == 0) 1 else 0) + (if (i % 4 == 0) 1 else 0)).sum
    val expIp = (0 until 400).map(i =>
      (if (i % 5 == 0) 1 else 0) + (if (i % 11 == 0) 1 else 0)).sum
    val expPhone = (0 until 400).count(_ % 6 == 0)
    assert(agg.getLong(0) == expEmail)
    assert(agg.getLong(1) == expUrl)
    assert(agg.getLong(2) == expIp)
    assert(agg.getLong(3) == expPhone)
  }

  test("redaction preserves non-PII text") {
    val r = redacted.filter(col("doc_id") === 1).select("redacted")
      .collect()(0).getString(0)
    assert(r == "over a lazy dog while data flows through")
  }
}
