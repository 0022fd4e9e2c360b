package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** X87 — robots/REP admission gate: the per-URL fetch-permission
  * verdict a polite frontier computes before scheduling anything the
  * [[HtmlExtract.crawlBudget]] windows allow. Input is the PARSED
  * robots relation a fetcher persists — one row per directive line,
  * `(host, agent, directive, value, rule_order)` — matched against
  * the resolved frontier URLs ([[HtmlExtract.resolvedUrls]]).
  *
  * Semantics are a deterministic, documented subset of RFC 9309:
  *  - only `agent = *` groups are honored (single-agent subset; rows
  *    for other agents are ignored — the fixture plants some);
  *  - a rule matches when the URL's path (scheme+host stripped; empty
  *    path reads as `/`) STARTS WITH the rule value; no `*`/`$`
  *    wildcards (documented subset);
  *  - empty-value rules are dropped (RFC: `Disallow:` with no value
  *    imposes no restriction);
  *  - LONGEST match wins; on a length tie `allow` wins (RFC 9309
  *    §2.2.2), then `rule_order` breaks exact duplicates;
  *  - no matching rule (or no rules for the host) → allowed;
  *  - `crawl-delay` (min over the host's `*` rows, seconds) overrides
  *    the default politeness delay.
  *
  * Every step is replayed by the DuckDB oracle from the same two
  * committed fixtures — prefix match via `startsWith`/`starts_with`,
  * the winner via an identical window.
  *
  * Scale shape: the rules relation is frontier-host-bounded and tiny
  * (a few directives per host) — broadcast; the per-URL prefix match
  * and the winner window partition on (host, url) with rules-per-host
  * fan-out only. At 100 TB this is billions of URLs × a broadcast
  * rules table — one shuffle for the verdict window, nothing
  * corpus-sized. Note: the frontier's resolve projection exceeds the
  * 64 KB whole-stage-codegen method limit (janino refuses the fused
  * stage and Spark falls back to per-operator codegen — correct by
  * design, logged once per run); the stage is a single pass and the
  * ScaleStress leg shows the fallback costs nothing detectable at
  * 100×. */
object Robots {

  val FixtureCsv = s"${Ingest.FixtureDir}/corpus/robots_rules.csv"

  val DefaultDelayMs: Long = HtmlExtract.BaseDelayMs

  private[graft] def fixtureRules(spark: SparkSession): DataFrame = {
    val schema = StructType(Seq(
      StructField("host", StringType), StructField("agent", StringType),
      StructField("directive", StringType),
      StructField("value", StringType),
      StructField("rule_order", LongType)))
    spark.read.option("header", "true").schema(schema).csv(FixtureCsv)
  }

  /** X87 registered query: the verdict relation over the fixture
    * corpus's resolved frontier and the fixture robots rules. */
  def robotsGate(spark: SparkSession, dir: String): DataFrame =
    robotsGateFrom(
      HtmlExtract.resolvedUrls(HtmlExtract.fixturePages(spark)),
      fixtureRules(spark))

  private[graft] def robotsGateFrom(urls: DataFrame,
      rules: DataFrame): DataFrame =
    robotsVerdictsFor(
      urls.filter(!col("host").isin("(non-http)", "(unresolved)"))
        .select(col("host"), col("r").as("url")).distinct(),
      rules)

  /** The verdict relation over an ALREADY-PREPARED distinct
    * (host, url) frontier — the composed-pipeline form
    * ([[HtmlExtract]]'s X89 schedule feeds the NOVEL frontier). */
  private[graft] def robotsVerdictsFor(hostUrls: DataFrame,
      rules: DataFrame): DataFrame = {
    val frontier = hostUrls
      // REP paths always lead with '/': a path-less URL reads as '/',
      // and a query-only URL (`http://h?x=1`) as '/?x=1'
      .withColumn("path",
        when(regexp_replace(col("url"), HtmlExtract.RootPattern, "")
          .startsWith("/"),
          regexp_replace(col("url"), HtmlExtract.RootPattern, ""))
          .otherwise(concat(lit("/"),
            regexp_replace(col("url"), HtmlExtract.RootPattern, ""))))
      // the resolve tree behind `url` is optimizer-expensive and two
      // consumers (match join + default-allow anti side) would
      // duplicate it — frontier is distinct-URL-sized
      .localCheckpoint()
    val pathRules = broadcast(rules
      .filter(col("agent") === "*" &&
        col("directive").isin("allow", "disallow") &&
        col("value") =!= ""))
    val best = frontier.join(pathRules, Seq("host"))
      .filter(col("path").startsWith(col("value")))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("host"), col("url"))
          .orderBy(length(col("value")).desc, col("directive"),
            col("rule_order"))))
      .filter(col("rn") === 1)
      .select(col("host"), col("url"), col("directive"), col("value"))
    val delays = broadcast(rules
      .filter(col("agent") === "*" && col("directive") === "crawl-delay")
      .groupBy(col("host"))
      .agg(min(col("value").cast("long")).as("delay_s")))
    frontier
      .join(best, Seq("host", "url"), "left")
      .join(delays, Seq("host"), "left")
      .select(col("host"), col("url"),
        coalesce(col("directive") === "allow", lit(true)).as("allowed"),
        coalesce(concat(col("directive"), lit(":"), col("value")),
          lit("(default)")).as("rule"),
        coalesce(col("delay_s") * 1000L, lit(DefaultDelayMs))
          .as("delay_ms"))
      .orderBy("host", "url")
  }

  // ---- X89: composed frontier schedule -------------------------------

  /** X89 — the composed FRONTIER pipeline, one registered query for
    * the whole scheduling chain a crawler runs between two fetch
    * rounds: resolved outlinks → NOVEL discovery (X88 anti-join
    * against the crawled set) → robots verdicts (X87) → per-host
    * fetch plan over the ALLOWED novel URLs with the robots
    * crawl-delay driving the X86 window arithmetic. The output row
    * (host, admitted URL backlog, effective delay, slots per window,
    * windows to drain) is the relation a fetch scheduler consumes
    * directly.
    *
    * Each stage is the already-proven operator (same constants, same
    * windows); the oracle splices the same proven CTE blocks. Scale
    * shape: the X88 anti-join and X87 broadcast match dominate; the
    * plan stays URL-sized end to end, and the schedule rollup is
    * host-bounded. */
  def frontierSchedule(spark: SparkSession, dir: String): DataFrame = {
    val pages = HtmlExtract.fixturePages(spark)
    frontierScheduleFrom(HtmlExtract.frontierNovelFrom(pages),
      fixtureRules(spark))
  }

  private[graft] def frontierScheduleFrom(novel: DataFrame,
      rules: DataFrame): DataFrame =
    robotsVerdictsFor(novel.select(col("host"), col("url")), rules)
      .filter(col("allowed"))
      .groupBy(col("host"))
      .agg(count(lit(1)).as("n_urls"),
        // delay is per-host constant by construction; min() is the
        // deterministic way to carry it through the rollup
        min(col("delay_ms")).as("delay_ms"))
      .withColumn("slots_per_window",
        expr(s"${HtmlExtract.WindowMs}L div delay_ms"))
      .withColumn("n_windows",
        expr("(n_urls + slots_per_window - 1L) div slots_per_window"))
      .select(col("host"), col("n_urls"), col("delay_ms"),
        col("slots_per_window"), col("n_windows"))
      .orderBy("host")
}
