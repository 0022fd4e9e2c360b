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
  *  - `crawl-delay` (min over the host's `*` rows, seconds — parsed
  *    through double so fractional values count, ceil'd to whole ms;
  *    non-numeric values ignored) overrides the default politeness
  *    delay.
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
      HtmlExtract.fixtureResolved(spark),
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
    val delays = broadcast(declaredDelays(rules)
      .withColumnRenamed("declared_delay_ms", "rb_delay_ms"))
    frontier
      .join(best, Seq("host", "url"), "left")
      .join(delays, Seq("host"), "left")
      .select(col("host"), col("url"),
        coalesce(col("directive") === "allow", lit(true)).as("allowed"),
        coalesce(concat(col("directive"), lit(":"), col("value")),
          lit("(default)")).as("rule"),
        coalesce(col("rb_delay_ms"), lit(DefaultDelayMs))
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
    frontierScheduleFrom(
      HtmlExtract.frontierNovelFrom(pages,
        Some(HtmlExtract.fixtureResolved(spark))),
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

  // ---- X100: raw robots.txt parsing -----------------------------------

  /** Raw robots bodies as a fetcher stores them: one `<host>.txt`
    * file per host. */
  val RawFixtureDir = s"${Ingest.FixtureDir}/corpus/robots"
  /** Host from the stored file name. */
  val RobotsFilePattern = "([^/]+)\\.txt$"
  /** `key: value` — the directive key runs to the FIRST colon (RFC
    * 9309 line grammar); the value is the rest, so colons inside
    * values (sitemap URLs) survive. */
  val DirectivePattern = "^([A-Za-z-]+)\\s*:\\s*(.*)$"
  /** A comment runs from `#` to end of line. */
  val CommentPattern = "#.*$"
  /** CRLF bodies: the stray `\r` a `\n` split leaves behind. */
  val CrPattern = "\\r$"

  /** X100 — raw robots.txt PARSING: turns the fetched bodies into the
    * `(host, agent, directive, value, rule_order)` relation [[robotsGate]]
    * consumes — completing the REP path (X100 parses, X87 judges,
    * X89 schedules). Deterministic line grammar both engines replay:
    * comment strip (`#` to EOL), CRLF tolerance, blank/junk lines
    * dropped, `key: value` with case-insensitive keys and spaces
    * around the colon, values keeping their internal colons.
    *
    * GROUP semantics (RFC 9309 §2.2.1): consecutive `user-agent`
    * lines form ONE group header and every following rule line
    * belongs to ALL of them — derived relationally: a header RUN
    * starts at a `user-agent` line whose predecessor is not one
    * (lag window), `run_id` is the running count of run starts, and
    * rules join their run's agents. Rules before any header are
    * invalid per the RFC and drop (`run_id` 0) — EXCEPT `sitemap`,
    * which RFC 9309 treats as a non-group record: sitemap lines are
    * emitted unconditionally (agent `*`, one row each) wherever they
    * appear, including before the first group — the common
    * top-of-file placement (ADVICE r15). Other unknown directives
    * inside groups are parsed faithfully — consumers filter, the
    * parser does not police. Empty values survive (`Disallow:` with
    * no value is MEANINGFUL — it clears restrictions; X87 drops it
    * at judge time). `rule_order` numbers each host's (line, agent)
    * pairs in document order — the tie-breaker X87's winner window
    * expects.
    *
    * Scale shape: robots bodies are tiny and host-keyed; the windows
    * partition per host (bounded by lines-per-file), the agent join
    * fans out rules × their group's agents only. At 100 TB of corpus
    * this relation stays frontier-host-sized. */
  def robotsParse(spark: SparkSession, dir: String): DataFrame =
    robotsParseFrom(rawRobots(spark))

  /** Per-host PUBLISHER-declared crawl delay (ms) from a parsed rules
    * relation — agent `*` rows only, min seconds on duplicates (the
    * X87 verdict convention), converted to ms. The relation the X86
    * budget joins so the publisher's declared value wins over the
    * link-mass heuristic: a crawler that parses `Crawl-delay` and
    * then ignores it is not polite, it is merely well-documented.
    * Host-bounded.
    *
    * The value parses through DOUBLE, not long (ADVICE r15):
    * fractional delays (`Crawl-delay: 0.5`) are common in the wild
    * and an integer cast silently nulled them into the heuristic
    * fallback. `ceil(seconds · 1000)` rounds UP to whole ms — the
    * polite direction — and both engines run the identical IEEE
    * chain (`TRY_CAST AS DOUBLE` mirrors Spark's null-on-junk cast).
    * Non-numeric values are filtered BEFORE the agg on both sides so
    * a host whose only declared value is junk gets no row (default
    * delay) rather than a null one. */
  private[graft] def declaredDelays(rules: DataFrame): DataFrame =
    rules
      // try_cast, not cast: under ANSI a junk value would otherwise
      // fail the job; null-on-junk is exactly the DuckDB TRY_CAST the
      // oracle uses
      .filter(col("agent") === "*" && col("directive") === "crawl-delay" &&
        col("value").try_cast("double").isNotNull)
      .groupBy(col("host"))
      .agg(ceil(min(col("value").try_cast("double")) * 1000d).cast("long")
        .as("declared_delay_ms"))

  /** Session-memoized lazy checkpoint of the parsed fixture robots
    * relation — the X100 parse (per-host line windows) is cheap to
    * run but its windowed plan re-planned per consumer (r16: the
    * discovery feed's robots channel and the crawl budget's declared
    * delays both splice it). Cold-cleared per bench pass with the
    * rest of [[graft.util.CkptMemo]]; the registered `robots_parse`
    * query stays a direct computation — it PRICES the parse. */
  private[graft] def fixtureParsed(spark: SparkSession): DataFrame =
    graft.util.CkptMemo.of(spark, "rb_parsed",
        graft.util.Tables.listingTag(spark, RawFixtureDir)) {
      robotsParseFrom(rawRobots(spark)).localCheckpoint(false)
    }

  private[graft] def rawRobots(spark: SparkSession): DataFrame =
    spark.read.option("wholetext", "true").text(RawFixtureDir)
      .select(
        regexp_extract(input_file_name(), RobotsFilePattern, 1)
          .as("host"),
        col("value").as("body"))

  private[graft] def robotsParseFrom(files: DataFrame): DataFrame = {
    val byLine = Window.partitionBy(col("host")).orderBy(col("line_no"))
    val lines = files
      .select(col("host"), posexplode(split(col("body"), "\n")))
      .select(col("host"), col("pos").as("line_no"),
        trim(regexp_replace(regexp_replace(col("col"), CrPattern, ""),
          CommentPattern, "")).as("clean"))
      .filter(col("clean") =!= "")
      .select(col("host"), col("line_no"),
        lower(regexp_extract(col("clean"), DirectivePattern, 1))
          .as("key"),
        trim(regexp_extract(col("clean"), DirectivePattern, 2))
          .as("value"))
      .filter(col("key") =!= "")
    val runs = lines
      .withColumn("is_ua", col("key") === "user-agent")
      .withColumn("run_start", col("is_ua") &&
        !coalesce(lag(col("is_ua"), 1).over(byLine), lit(false)))
      .withColumn("run_id",
        sum(when(col("run_start"), 1L).otherwise(0L)).over(
          byLine.rowsBetween(Window.unboundedPreceding,
            Window.currentRow)))
    val agents = runs.filter(col("is_ua"))
      .select(col("host"), col("run_id"), lower(col("value")).as("agent"))
    // `sitemap` is a NON-GROUP record (RFC 9309 §2.2.4 / the sitemaps
    // protocol): it commonly appears at the TOP of robots.txt before
    // any user-agent group, and its placement inside a group carries
    // no scoping — so sitemap lines are emitted UNCONDITIONALLY, one
    // row each, with agent `*` (ADVICE r15: the group join dropped
    // pre-group declarations, silently starving the X101 robots
    // channel; the in-group form also no longer fans out per agent).
    val sitemaps = lines.filter(col("key") === "sitemap")
      .select(col("host"), lit("*").as("agent"), col("line_no"),
        lit("sitemap").as("directive"), col("value"))
    val rules = runs
      .filter(!col("is_ua") && col("key") =!= "sitemap" &&
        col("run_id") > 0)
      .select(col("host"), col("run_id"), col("line_no"),
        col("key").as("directive"), col("value"))
    rules.join(agents, Seq("host", "run_id"))
      .select(col("host"), col("agent"), col("line_no"),
        col("directive"), col("value"))
      .unionByName(sitemaps)
      .withColumn("rule_order", row_number().over(
        Window.partitionBy(col("host"))
          .orderBy(col("line_no"), col("agent"))).cast("long"))
      .select(col("host"), col("agent"), col("directive"),
        col("value"), col("rule_order"))
      .orderBy("host", "rule_order")
  }
}
