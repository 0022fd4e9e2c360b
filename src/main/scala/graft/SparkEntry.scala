package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] is one operator from SURVEY.md §2; the
  * paired [[oracleSql]] is the DuckDB-equivalent SQL the driver runs on
  * the same parquet tables for a hash-compare. Column names and ordering
  * are aligned on both sides; float aggregates use the exact-decimal
  * accumulation trick (graft.util.Tables.dsum) on both engines.
  */
object SparkEntry {

  /** One registered query: Spark builder + optional DuckDB oracle. */
  final case class Q(
      fn: (SparkSession, String) => DataFrame,
      oracle: Option[String])

  /** Shared DuckDB snippet: exact decimal sum of a double expr, as
    * double — via VARCHAR so the decimal→double conversion is correctly
    * rounded, matching Tables.dsum (see its scaladoc). */
  private def osum(expr: String): String =
    s"CAST(CAST(sum(CAST($expr AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE)"

  /** DuckDB read of a customers fixture CSV with the declared schema
    * (mirrors the loader's explicit StructType read). */
  private def ocsv(file: String, dt: String): String =
    s"""SELECT id, name, city, bal, '$dt' AS dt
       FROM read_csv('${Ingest.FixtureDir}/inbound/sap/customers/$file',
         header=true, columns={'id':'INTEGER','name':'VARCHAR',
         'city':'VARCHAR','bal':'DOUBLE','junk':'VARCHAR'})"""

  /** Audit columns as the oracle sees them (pinned clock, epoch µs). */
  private val oAudit =
    """epoch_us(TIMESTAMP '2024-07-01 00:00:00') AS cret_ts_us,
       epoch_us(TIMESTAMP '2024-07-01 00:00:00') AS updt_ts_us,
       'graft-spark' AS cret_nm, 'graft-spark' AS updt_nm"""

  /** Shared oracle for the ORC / JSON roundtrip queries: the same
    * aggregate over the original parquet — content preservation is the
    * claim, so the oracle never sees the roundtripped files. */
  private val formatOracle = s"""
      SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
        ${osum("o_totalprice")} AS sum_price,
        min(epoch_us(o_orderdate)) AS min_date_us,
        max(epoch_us(o_orderdate)) AS max_date_us,
        CAST(sum(o_custkey) AS BIGINT) AS custkey_sum
      FROM orders GROUP BY 1, 2 ORDER BY 1, 2"""

  /** Contents of an append of every fixture CSV — the shared oracle for
    * the compaction and backfill maintenance queries (both must be
    * contents-preserving no-ops relative to a plain append). */
  private val allFourCsvs = s"""
      WITH f AS (
        ${ocsv("customers_20240628.csv", "2024-06-28")}
        UNION ALL
        ${ocsv("customers_r2_20240628.csv", "2024-06-28")}
        UNION ALL
        ${ocsv("customers_20240629.csv", "2024-06-29")}
        UNION ALL
        ${ocsv("customers_20240630.csv.gz", "2024-06-30")})
      SELECT id, name, city, bal, dt, $oAudit
      FROM f ORDER BY dt, id"""

  /** Shared CTE stack of `seq_packing` and `shard_export`: tokenize,
    * content-hash shard assignment, within-shard running token count,
    * pack rule — ONE definition, so a tokenizer or pack-rule change
    * can never leave one oracle silently stale. Ends with CTE `p`
    * = (doc_id, shard, pack_id, n_tok, cum_tok). */
  private lazy val seqPackingOracleCte = """
      WITH d AS (
        SELECT doc_id,
          CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
            x -> x <> '')) AS BIGINT) AS n_tok,
          md5('pack:' || CAST(doc_id AS VARCHAR)) AS h,
          CAST(CAST(('0x' || substring(
            md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
            % 8 AS INTEGER) AS shard
        FROM documents),
      c AS (
        SELECT doc_id, shard, n_tok,
          CAST(sum(n_tok) OVER (
            PARTITION BY shard ORDER BY h, doc_id) AS BIGINT) AS cum_tok
        FROM d),
      p AS (
        SELECT doc_id, shard,
          CAST(floor((cum_tok - n_tok) / 512.0) AS BIGINT) AS pack_id,
          n_tok, cum_tok
        FROM c)"""

  /** Shared DuckDB oracle of the IVF family (`ann_ivf_topk`,
    * `ann_ivf_probe`, `ann_ivf_append`, `ann_filtered_probe`): the
    * oracle recomputes the WHOLE pipeline independently —
    *
    *  1. bounded coarse codebook: per-cell (`label % 16`) per-dim mean
    *     over the codebook corpus (`cbWhere` restricts it for the
    *     append query), float-downcast exactly like the engine's
    *     routing (`Similarity.cellDotStructs` downcasts the collected
    *     double centroids to float). The downcast is ALSO what makes
    *     an independent recomputation exact: CentroidAgg's double sums
    *     merge in task order and DuckDB's avg in scan order, so the
    *     DOUBLE means can differ by ulps — but both land on the same
    *     FLOAT with overwhelming probability, and routing only ever
    *     sees the float-downcast codebook. Verified exact at sf0.01
    *     and sf0.1 against both the inline and the persisted-index
    *     realizations.
    *  2. routing: `list_dot_product` (the same sequential double fold
    *     as the codegen FloatDot) argmax over the ≤16 cells, ties to
    *     the LARGER cell id — matching `argmaxCell`'s
    *     greatest-over-(score, cell) structs and the probe slice of
    *     `array_sort` + take-last; `crn = 1` is a vector's assigned
    *     cell, `crn <= 2` a query's probed cells (nProbe = 2).
    *  3. scoring: exact double cosine over the probed cells'
    *     candidates (`candAnd` adds the metadata predicate for the
    *     filtered query), `row_number` ties by vec_id, top-10 —
    *     identical to the brute-force `similarity_topk` oracle tail.
    *
    * ONE definition for all four queries on purpose: inline, probe,
    * append and filtered-probe must stay realizations of the same
    * routing semantics (the parity specs in SimilaritySpec pin the
    * Spark side of that claim; this pins the oracle side). */
  /** Generated chained-CTE oracle for `bpe_train`: replays the full
    * iterative argmax-and-merge in DuckDB, one (pairs → best → merged
    * vocab) CTE triple per merge rank. Two key mechanics:
    *  - words ride as DOUBLE-SPACE-joined symbol strings
    *    (`' a  b  c '`): a merge is then ONE plain `replace` of
    *    `' l  r '` with `' lr '`, and because replace scans
    *    left-to-right continuing AFTER each replacement, its
    *    semantics are EXACTLY the engine's greedy fold
    *    ([[graft.ops.BpeTrain]] `applyMerge`, incl. the odd/even
    *    run cases aaa→[aa,a], aaaa→[aa,aa]) — the single-space
    *    encoding would consume the shared separator and miss every
    *    second merge of a run, and regex lookahead is unavailable
    *    (DuckDB is RE2). Tokens are whitespace-split so symbols can
    *    never contain the separator.
    *  - every CTE is MATERIALIZED: `w{k}` is referenced twice (pair
    *    count + next merge), and DuckDB's default inlining would
    *    re-evaluate the whole chain per reference — 2^nMerges blowup
    *    (measured: the inlined form never finishes at 12 merges; the
    *    materialized form runs in ~0.5s).
    * Tie-break matches the engine: `ORDER BY cnt DESC, l, r` over
    * binary-collated strings. */
  private def bpeOracle(nMerges: Int): String =
    "WITH " + bpeCtes(nMerges, finalVocab = false).mkString(",\n") +
      "\n" +
      (1 to nMerges).map { k =>
        s"""SELECT $k AS rank, l AS "left", r AS "right",
           l || r AS merged, cnt AS weighted_count FROM p$k"""
      }.mkString(" UNION ALL ") + " ORDER BY rank"

  /** Oracle for `bpe_encode`: the SAME materialized merge chain as
    * [[bpeOracle]], extended through the final vocabulary state
    * w{nMerges}; the word → n_symbols map is then read straight off it
    * (strip the separators to recover the word — symbols can never
    * contain a space — and count the double-space-split symbols), and
    * every document's exploded words join to it for the per-doc token
    * stats. One CTE generator for train AND encode on purpose: a
    * tokenizer-semantics change can never leave one oracle silently
    * stale. */
  private def bpeEncodeOracle(nMerges: Int): String =
    "WITH " + bpeCtes(nMerges, finalVocab = true).mkString(",\n") + s""",
      enc AS (SELECT replace(trim(s), ' ', '') AS word,
          CAST(len(string_split(trim(s), '  ')) AS BIGINT) AS n_sym
        FROM w$nMerges),
      dw AS (SELECT doc_id, unnest(list_filter(
          string_split_regex(lower(text), '\\s+'), x -> x <> ''))
          AS word FROM documents)
      SELECT doc_id, count(*) AS n_words,
        CAST(sum(e.n_sym) AS BIGINT) AS n_tokens,
        CAST(sum(length(dw.word)) AS BIGINT) AS n_chars_alpha,
        CAST(sum(length(dw.word)) AS DOUBLE) / sum(e.n_sym)
          AS chars_per_token
      FROM dw JOIN enc e USING (word)
      GROUP BY doc_id ORDER BY doc_id"""

  private def bpeCtes(nMerges: Int, finalVocab: Boolean): Seq[String] = {
    val parts = Seq.newBuilder[String]
    parts += """w0 AS MATERIALIZED (
        SELECT ' ' || array_to_string(string_split(word, ''), '  ')
            || ' ' AS s,
          count(*) AS freq
        FROM (SELECT unnest(list_filter(
            string_split_regex(lower(text), '\s+'), x -> x <> ''))
            AS word FROM documents)
        GROUP BY 1)"""
    for (k <- 1 to nMerges) {
      parts += s"""p$k AS MATERIALIZED (
        SELECT l, r, cnt FROM (
          SELECT p.l AS l, p.r AS r,
            CAST(sum(freq) AS BIGINT) AS cnt FROM (
            SELECT freq, unnest(list_transform(range(1, len(syms)),
              i -> struct_pack(l := syms[i], r := syms[i+1]))) AS p
            FROM (SELECT string_split(trim(s), '  ') AS syms, freq
                  FROM w${k - 1}))
          GROUP BY 1, 2)
        ORDER BY cnt DESC, l, r LIMIT 1)"""
      if (k < nMerges || finalVocab)
        parts += s"""w$k AS MATERIALIZED (
        SELECT replace(s, ' ' || p.l || '  ' || p.r || ' ',
                          ' ' || p.l || p.r || ' ') AS s, freq
        FROM w${k - 1}, p$k p)"""
    }
    parts.result()
  }

  /** Shared codebook + routing CTE prefix of the IVF family oracle
    * AND the `semdedup` oracle: per-cell float-downcast centroids,
    * per-vector argmax routing (`assign`). Factored so the semantic
    * dedup oracle can never drift from the routing the four IVF
    * queries have already proven exact. Yields CTEs
    * cbu/cb/e/route/assign (no leading WITH). */
  private def ivfRouteCtes(cbWhere: String = ""): String = s"""
      cbu AS (
        SELECT CAST(label % 16 AS INTEGER) AS cell, r.i AS dim,
               avg(CAST(embedding[r.i] AS DOUBLE)) AS c
        FROM embeddings, range(1, 65) r(i)
        $cbWhere
        GROUP BY 1, 2),
      cb AS (
        SELECT cell,
               list(CAST(CAST(c AS FLOAT) AS DOUBLE) ORDER BY dim)
                 AS centroid
        FROM cbu GROUP BY cell),
      e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
            FROM embeddings),
      route AS (
        SELECT vec_id, cell,
               row_number() OVER (PARTITION BY vec_id
                 ORDER BY list_dot_product(e, centroid) DESC, cell DESC)
                 AS crn
        FROM e, cb),
      assign AS (SELECT vec_id, cell FROM route WHERE crn = 1)"""

  private def ivfOracle(cbWhere: String = "", candAnd: String = ""): String =
    s"""
      WITH ${ivfRouteCtes(cbWhere)},
      probes AS (SELECT vec_id AS q_id, cell FROM route
                 WHERE vec_id < 8 AND crn <= 2),
      q AS (SELECT vec_id AS q_id, e AS qe FROM e WHERE vec_id < 8),
      s AS (
        SELECT p.q_id, c.vec_id,
               list_dot_product(q.qe, c.e) /
                 (sqrt(list_dot_product(q.qe, q.qe)) *
                  sqrt(list_dot_product(c.e, c.e))) AS score
        FROM probes p
        JOIN q ON q.q_id = p.q_id
        JOIN assign a ON a.cell = p.cell
        JOIN e c ON c.vec_id = a.vec_id
        WHERE c.vec_id <> p.q_id $candAnd),
      r AS (SELECT *, row_number() OVER (
              PARTITION BY q_id ORDER BY score DESC, vec_id) AS rn FROM s)
      SELECT q_id, vec_id, score, CAST(rn AS INTEGER) AS rn
      FROM r WHERE rn <= 10 ORDER BY q_id, rn"""

  /** Shared by `neardup_probe` (batch) and `neardup_stream` (the
    * streaming probe-and-maintain form) — both must produce exactly
    * the cross (batch × corpus) near-dup pairs. */
  private lazy val neardupProbeOracle = """
      WITH tok AS (SELECT doc_id,
          list_filter(string_split_regex(lower(text), '\s+'),
            x -> x <> '') AS w
        FROM documents),
      sh AS (SELECT DISTINCT doc_id,
          unnest(list_transform(range(1, len(w) - 1),
            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle
        FROM tok WHERE len(w) >= 3),
      sig AS (SELECT doc_id, b.band,
          min(md5(b.band || ':' || shingle)) AS sig
        FROM sh, (SELECT unnest(range(0, 8)) AS band) b GROUP BY 1, 2)
      SELECT a.doc_id AS new_doc, b.doc_id AS corpus_doc,
        count(*) AS n_bands
      FROM sig a JOIN sig b ON a.band = b.band AND a.sig = b.sig
      WHERE a.doc_id % 7 = 0 AND b.doc_id % 7 <> 0
      GROUP BY 1, 2 HAVING count(*) >= 4
      ORDER BY new_doc, corpus_doc"""

  /** The X81 gate-statistics CTE block, name-prefixed so it can be
    * spliced into oracles with their own CTE namespaces (the
    * incremental pipeline's stage-1 replay shares it verbatim with
    * the standalone probe oracles): rebuilds the persisted gate
    * statistics from scratch — corpus-side bounds, the NAIVE-rank
    * margin cutoff (re-gate-checking the X80 decomposition), and the
    * temperature rates — then assembles the per-batch-doc verdict
    * relation `<p>v`. */
  private def qgateCtes(p: String): String = s"""
      ${p}corpus AS (SELECT * FROM documents WHERE doc_id % 7 <> 0),
      ${p}batch AS (SELECT doc_id, source, lang, n_chars
        FROM documents WHERE doc_id % 7 = 0),
      ${p}b AS (SELECT lang, quantile_cont(n_chars, 0.02) AS lo,
          quantile_cont(n_chars, 0.98) AS hi FROM ${p}corpus GROUP BY 1),
      ${p}tok AS (SELECT doc_id,
          list_filter(string_split_regex(lower(text), '\\s+'),
            x -> x <> '') AS w
        FROM documents),
      ${p}g AS (
        SELECT doc_id, unnest(w) AS g FROM ${p}tok
        UNION ALL
        SELECT doc_id, unnest(list_transform(range(1, len(w)),
            i -> w[i] || ' ' || w[i+1])) AS g
        FROM ${p}tok WHERE len(w) >= 2),
      ${p}wt AS (SELECT doc_id,
          (CAST(('0x' || substring(md5('qw:' || CAST(
              CAST(('0x' || substring(md5('qf:' || g), 1, 8)) AS BIGINT)
                % 1024 AS VARCHAR)), 1, 8)) AS BIGINT) % 2001 - 1000)
            / 1000.0 AS wgt
        FROM ${p}g),
      ${p}sc AS (SELECT doc_id,
          CAST(CAST(sum(CAST(wgt AS DECIMAL(30,8))) AS VARCHAR)
            AS DOUBLE) / count(*) AS margin
        FROM ${p}wt GROUP BY doc_id),
      ${p}cr AS (SELECT s.doc_id, d.source, s.margin,
          row_number() OVER (PARTITION BY d.source
            ORDER BY s.margin DESC, s.doc_id) AS rnk,
          count(*) OVER (PARTITION BY d.source) AS n
        FROM ${p}sc s JOIN ${p}corpus d USING (doc_id)),
      ${p}cut AS (SELECT source, min(margin) AS cutoff FROM ${p}cr
        WHERE rnk <= (n * 60 + 99) // 100 GROUP BY 1),
      ${p}ct AS (SELECT d.source,
          CAST(sum(len(list_filter(
            string_split_regex(lower(d.text), '\\s+'),
            x -> x <> ''))) AS BIGINT) AS src_tok
        FROM ${p}corpus d GROUP BY 1),
      ${p}gg AS (SELECT CAST(sum(src_tok) AS BIGINT) AS tot,
          CAST(sum(CAST(floor(sqrt(CAST(src_tok AS DOUBLE)))
            AS BIGINT)) AS BIGINT) AS s_sum FROM ${p}ct),
      ${p}r AS (SELECT ${p}ct.source, CASE WHEN ${p}ct.src_tok = 0 THEN 0
          ELSE least(1000000,
            (((${p}gg.tot * 2 // 5) * 1000000 // ${p}gg.s_sum) *
              CAST(floor(sqrt(CAST(${p}ct.src_tok AS DOUBLE))) AS BIGINT))
              // ${p}ct.src_tok)
        END AS rate_ppm FROM ${p}ct, ${p}gg),
      ${p}v AS (SELECT t.doc_id, t.source, t.lang, t.n_chars,
          sc.margin,
          COALESCE(t.n_chars >= b.lo AND t.n_chars <= b.hi, false)
            AS keep_length,
          COALESCE(sc.margin >= cut.cutoff, false) AS keep_quality,
          COALESCE(CAST(('0x' || substring(md5('qgate:' ||
              CAST(t.doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000000
            < r.rate_ppm, false) AS keep_sample
        FROM ${p}batch t
        LEFT JOIN ${p}sc sc USING (doc_id)
        LEFT JOIN ${p}b b USING (lang)
        LEFT JOIN ${p}cut cut USING (source)
        LEFT JOIN ${p}r r USING (source))"""

  /** Shared oracle of `quality_gate_probe` (X81) and
    * `quality_gate_stream` (X81b) — [[qgateCtes]] with the bare
    * namespace plus the verdict projection. */
  private lazy val qualityGateOracle = s"""
      WITH ${qgateCtes("")}
      SELECT doc_id, source, lang, n_chars, margin, keep_length,
        keep_quality, keep_sample,
        keep_length AND keep_quality AND keep_sample AS admit
      FROM v ORDER BY doc_id"""

  /** The X82 extraction CTE block, name-prefixed so composed oracles
    * (the X84 crawl pipeline) can splice it: replays the full
    * deterministic extraction chain from the shared pattern constants
    * and ends in `<p>out` — the extractor's complete output
    * relation. */
  private def htmlCtes(p: String): String = {
    import HtmlExtract._
    def sq(x: String) = x.replace("'", "''")
    val regions = RegionRules.foldLeft("html")((acc, pat) =>
      s"regexp_replace($acc, '${sq(pat)}', ' ', 'g')")
    def strip(x: String) =
      s"regexp_replace($x, '${sq(TagPattern)}', ' ', 'g')"
    def coll(x: String) =
      s"trim(regexp_replace($x, '${sq(WsPattern)}', ' ', 'g'))"
    val decoded = Entities.foldLeft(strip("regions")) {
      case (acc, (ent, ch)) => s"replace($acc, '${sq(ent)}', '${sq(ch)}')" }
    s"""
      ${p}d AS (
        SELECT doc_id, source, html FROM read_csv('$FixtureCsv',
          header=true, columns={'doc_id':'BIGINT','source':'VARCHAR',
          'page_url':'VARCHAR','html':'VARCHAR'})),
      ${p}r AS (SELECT doc_id, source, html, $regions AS regions
        FROM ${p}d),
      ${p}s AS (SELECT doc_id, source, html, regions,
          regexp_extract_all(regions, '${sq(AnchorPattern)}', 1)
            AS anchors,
          GREATEST(1, len(${coll(strip("regions"))})) AS body_chars
        FROM ${p}r),
      ${p}x AS (SELECT *, CAST(COALESCE(list_sum(list_transform(anchors,
            a -> len(${coll(strip("a"))}))), 0) AS BIGINT) AS link_chars
        FROM ${p}s),
      ${p}t AS (SELECT *, ${coll(decoded)} AS text FROM ${p}x),
      ${p}out AS (SELECT doc_id, source, text,
        CAST(len(text) AS BIGINT) AS text_len,
        CAST(len(anchors) AS BIGINT) AS n_links,
        link_chars,
        CAST(link_chars AS DOUBLE) / body_chars AS link_density,
        (regexp_matches(html, '${sq(BoilerTagPattern)}') OR
         CAST(link_chars AS DOUBLE) / body_chars > $LinkDensityCut)
          AS boilerplate_flag
        FROM ${p}t)"""
  }

  /** Shared oracle of `html_extract` (X82) and its streaming twin
    * `html_extract_stream` (X82b) — [[htmlCtes]] with the bare
    * namespace. */
  private lazy val htmlExtractOracle: String = s"""
      WITH ${htmlCtes("")}
      SELECT * FROM out ORDER BY doc_id"""

  /** The per-link resolved-URL CTE chain (ends in `h`: doc_id, p, u,
    * res, host) — the shared base of the X83b rollup oracle, the X86
    * budget and the X87 robots gate (the full normalize +
    * RFC-3986-lite resolve chain from the shared pattern constants).
    * No leading WITH. */
  private lazy val resolvedUrlsCtes: String = {
    import HtmlExtract._
    def sq(x: String) = x.replace("'", "''")
    s"""d AS (
        SELECT doc_id, page_url, html FROM read_csv('$FixtureCsv',
          header=true, columns={'doc_id':'BIGINT','source':'VARCHAR',
          'page_url':'VARCHAR','html':'VARCHAR'})),
      l AS (SELECT doc_id, ${normalizeUrlSql("page_url")} AS p,
          unnest(regexp_extract_all(html, '${sq(HrefPattern)}', 1))
            AS url
        FROM d),
      n AS (SELECT doc_id, p, ${normalizeUrlSql("url")} AS u FROM l),
      r AS (SELECT doc_id, p, u, ${resolveUrlSql("u", "p")} AS res
        FROM n),
      h AS (SELECT doc_id, p, u, res,
          CASE
            WHEN regexp_matches(u, '${sq(AnySchemePattern)}')
              AND NOT regexp_matches(u, '${sq(HostPattern)}')
              THEN '(non-http)'
            WHEN res IS NULL
              OR regexp_extract(res, '${sq(HostPattern)}', 1) = ''
              THEN '(unresolved)'
            ELSE regexp_extract(res, '${sq(HostPattern)}', 1)
          END AS host
        FROM r)"""
  }

  /** Distinct fetchable resolved frontier `(host, url)` over `h` —
    * the X88 discovery base every frontier oracle shares. No leading
    * WITH. */
  private def fetchableFrontierCte(name: String): String =
    s"""$name AS (SELECT DISTINCT host, res AS url FROM h
        WHERE host NOT IN ('(non-http)', '(unresolved)'))"""

  /** The crawled corpus's distinct normalized page URLs — the seen
    * set every novelty anti-join subtracts. No leading WITH. */
  private def seenUrlsCte(name: String): String =
    s"""$name AS (SELECT DISTINCT
        ${HtmlExtract.normalizeUrlSql("page_url")} AS url
      FROM d WHERE page_url IS NOT NULL AND page_url <> '')"""

  /** The X96 two-level trap rollup over `h` (no WITH, `p`-prefixed):
    * `${p}base` (fetchable rows with query-stripped path) →
    * `${p}pp` (distinct variants per path) → `${p}ppd` (+ depth) —
    * shared by the X96 oracle and X99's trap verdict. */
  private def trapRollupCtes(p: String): String = {
    def sq(x: String) = x.replace("'", "''")
    val pq = sq(HtmlExtract.PageQueryPattern)
    val root = sq(HtmlExtract.RootPattern)
    s"""${p}base AS (SELECT host,
        regexp_replace(res, '$pq', '', 'g') AS path, res
      FROM h WHERE host NOT IN ('(non-http)', '(unresolved)')),
    ${p}pp AS (SELECT host, path, count(DISTINCT res) AS variants
      FROM ${p}base GROUP BY 1, 2),
    ${p}ppd AS (SELECT host, variants,
        length(regexp_replace(path, '$root', '', 'g')) -
          length(replace(regexp_replace(path, '$root', '', 'g'),
            '/', '')) AS depth
      FROM ${p}pp)"""
  }

  /** Shared oracle of `link_hosts_resolved` (X83b) and the CTE base
    * of the `crawl_budget` (X86) schedule. */
  private lazy val linkHostsResolvedOracle: String = s"""
      WITH $resolvedUrlsCtes
      SELECT host, CAST(count(*) AS BIGINT) AS n_links,
        CAST(count(DISTINCT doc_id) AS BIGINT) AS n_pages,
        CAST(count(DISTINCT p) AS BIGINT) AS n_source_pages,
        CAST(count(DISTINCT COALESCE(res, u)) AS BIGINT) AS n_urls
      FROM h GROUP BY host ORDER BY host"""

  /** The robots verdict CTE block over a (host, url) frontier CTE
    * named `frontier` — fp/ru/m/best/cd ending in `v` (host, url,
    * allowed, rule, delay_ms); shared by `robots_gate` (X87) and the
    * composed `frontier_schedule` (X89). No leading WITH, no trailing
    * comma. */
  private def robotsVerdictCtes(frontier: String): String = {
    val rulesCsv = s"""read_csv('${Robots.FixtureCsv}', header=true,
          columns={'host':'VARCHAR','agent':'VARCHAR',
            'directive':'VARCHAR','value':'VARCHAR',
            'rule_order':'BIGINT'})"""
    s"""fp AS (SELECT host, url,
          CASE WHEN starts_with(
              regexp_replace(url, '^https?://[^/?]+', ''), '/')
            THEN regexp_replace(url, '^https?://[^/?]+', '')
            ELSE '/' || regexp_replace(url, '^https?://[^/?]+', '')
          END AS path
        FROM $frontier),
      ru AS (SELECT host, directive, value, rule_order
        FROM $rulesCsv
        WHERE agent = '*' AND directive IN ('allow', 'disallow')
          AND value <> ''),
      m AS (SELECT fp.host, fp.url, ru.directive, ru.value,
          row_number() OVER (PARTITION BY fp.host, fp.url
            ORDER BY len(ru.value) DESC, ru.directive, ru.rule_order)
            AS rn
        FROM fp JOIN ru ON fp.host = ru.host
          AND starts_with(fp.path, ru.value)),
      best AS (SELECT host, url, directive, value FROM m WHERE rn = 1),
      cd AS (SELECT host,
          CAST(ceil(min(TRY_CAST(value AS DOUBLE)) * 1000) AS BIGINT)
            AS delay_ms
        FROM $rulesCsv
        WHERE agent = '*' AND directive = 'crawl-delay'
          AND TRY_CAST(value AS DOUBLE) IS NOT NULL GROUP BY 1),
      v AS (SELECT fp.host, fp.url,
        COALESCE(b.directive = 'allow', TRUE) AS allowed,
        COALESCE(b.directive || ':' || b.value, '(default)') AS rule,
        CAST(COALESCE(cd.delay_ms, ${Robots.DefaultDelayMs})
          AS BIGINT) AS delay_ms
      FROM fp LEFT JOIN best b ON fp.host = b.host AND fp.url = b.url
        LEFT JOIN cd ON fp.host = cd.host)"""
  }

  /** Oracle of `link_pagerank` (X90): the host edge set over the
    * shared resolve chain, then [[LinkGraph.Iters]] UNROLLED
    * power-method rounds — per-round in-mass and dangling mass via
    * the exact decimal accumulator ([[osum]], = Tables.dsum), every
    * other step a single IEEE-exact double op, so after 10 rounds the
    * raw doubles hash-compare. Constants interpolate from
    * [[LinkGraph]] so engine and oracle cannot drift. */
  /** The pagerank CTE chain (no leading WITH, `ns`-prefixed names):
    * edge derivation over `hRel` (a relation with the resolved-chain
    * columns p/host) through `${ns}pr{iters}` (final ranks) plus
    * degree rollups — shared by the X90 oracle, the X99 composed
    * priority (bare ns over `h`) and the X90b warm-start probe (base
    * chain over the batch-excluded slice, then warm rounds over the
    * full graph via `start`). `start` overrides the uniform pr0 with
    * an arbitrary SELECT (host, rank). */
  private def pagerankCtesNs(ns: String, hRel: String, iters: Int,
      start: Option[String] = None): String = {
    def sq(x: String) = x.replace("'", "''")
    val srcE = s"regexp_extract(p, '${sq(HtmlExtract.HostPattern)}', 1)"
    // Every round's CTEs are MATERIALIZED: pr(i-1) is referenced
    // twice per round, and an inlining planner would otherwise expand
    // the 10-round chain into 2^10 copies of the resolve regex tree.
    val rounds = (1 to iters).map { i =>
      s"""${ns}c$i AS MATERIALIZED (SELECT e.dst,
          ${osum("q.rank / CAST(od.out_deg AS DOUBLE)")} AS s
        FROM ${ns}e e JOIN ${ns}pr${i - 1} q ON e.src = q.host
          JOIN ${ns}od od ON e.src = od.src GROUP BY 1),
      ${ns}g$i AS MATERIALIZED (
        SELECT COALESCE(${osum("q.rank")}, 0.0) AS dang
        FROM ${ns}pr${i - 1} q LEFT JOIN ${ns}od od ON q.host = od.src
        WHERE od.src IS NULL),
      ${ns}pr$i AS MATERIALIZED (SELECT no.host,
          ((${LinkGraph.Teleport} / nn.nd) +
           (${LinkGraph.Damping} * (COALESCE(c.s, 0.0) +
             (g.dang / nn.nd)))) AS rank
        FROM ${ns}nodes no LEFT JOIN ${ns}c$i c ON no.host = c.dst
        CROSS JOIN ${ns}g$i g CROSS JOIN ${ns}nn nn)"""
    }.mkString(",\n      ")
    val pr0 = start.getOrElse(
      s"SELECT host, (1.0 / nd) AS rank FROM ${ns}nodes CROSS JOIN ${ns}nn")
    s"""${ns}e AS MATERIALIZED (
        SELECT DISTINCT $srcE AS src, host AS dst
        FROM $hRel
        WHERE $srcE IS NOT NULL AND $srcE <> ''
          AND host NOT IN ('(non-http)', '(unresolved)')
          AND $srcE <> host),
      ${ns}od AS MATERIALIZED (
        SELECT src, count(*) AS out_deg FROM ${ns}e GROUP BY 1),
      ${ns}idg AS (SELECT dst, count(*) AS in_deg FROM ${ns}e GROUP BY 1),
      ${ns}nodes AS MATERIALIZED (
        SELECT src AS host FROM ${ns}e UNION SELECT dst FROM ${ns}e),
      ${ns}nn AS MATERIALIZED (
        SELECT CAST(count(*) AS DOUBLE) AS nd FROM ${ns}nodes),
      ${ns}pr0 AS MATERIALIZED ($pr0),
      $rounds"""
  }

  /** The bare-namespace chain over `h` — X90 and X99. */
  private lazy val pagerankCtes: String =
    pagerankCtesNs("", "h", LinkGraph.Iters)

  private lazy val linkPagerankOracle: String = {
    s"""
      WITH $resolvedUrlsCtes,
      $pagerankCtes
      SELECT p.host,
        CAST(COALESCE(idg.in_deg, 0) AS BIGINT) AS in_deg,
        CAST(COALESCE(od.out_deg, 0) AS BIGINT) AS out_deg,
        p.rank
      FROM pr${LinkGraph.Iters} p
        LEFT JOIN idg ON p.host = idg.dst
        LEFT JOIN od ON p.host = od.src
      ORDER BY p.rank DESC, p.host"""
  }

  /** The sitemap declared-URL CTE chain (no leading WITH, sm_
    * namespace, ends in `sm_g`: host, url, lastmod — parsed,
    * normalized, own-host-validated, duplicate locs folded to the
    * latest lastmod) — shared by the X98 oracle and the X101 merged
    * discovery feed. */
  private lazy val sitemapDeclaredCtes: String = {
    def sq(x: String) = x.replace("'", "''")
    s"""sm_s AS (SELECT lower(host) AS host, xml FROM read_csv(
          '${Sitemap.FixtureCsv}', header=true,
          columns={'host':'VARCHAR','sitemap_url':'VARCHAR',
          'xml':'VARCHAR'})),
      sm_b AS (SELECT host, unnest(regexp_extract_all(xml,
            '${sq(Sitemap.UrlBlockPattern)}', 0)) AS b
        FROM sm_s),
      sm_e AS (SELECT host,
          ${HtmlExtract.normalizeUrlSql(
            s"regexp_extract(b, '${sq(Sitemap.LocPattern)}', 1)")}
            AS url,
          try_cast(nullif(regexp_extract(b,
            '${sq(Sitemap.LastmodPattern)}', 1), '') AS DATE)
            AS lastmod
        FROM sm_b),
      sm_v AS (SELECT * FROM sm_e WHERE url <> ''
        AND regexp_extract(url, '${sq(HtmlExtract.HostPattern)}', 1)
          = host),
      sm_g AS (SELECT host, url, max(lastmod) AS lastmod
        FROM sm_v GROUP BY 1, 2)"""
  }

  /** The X100 raw-robots PARSE chain (no leading WITH, `rp_`
    * namespace, ends in `rp_rules`: host, agent, directive, value,
    * rule_order) — the committed robots bodies through the full line
    * grammar + RFC 9309 group-header windows. Shared by the
    * `robots_parse` oracle, the `crawl_budget` declared-delay join
    * (X86 obeys the publisher's Crawl-delay) and the `discovery_feed`
    * robots-declared sitemap channel (X101). */
  private lazy val robotsParsedCtes: String = {
    import Robots._
    def sq(x: String) = x.replace("'", "''")
    val dp = sq(DirectivePattern)
    s"""rp_f AS (SELECT
          regexp_extract(filename, '${sq(RobotsFilePattern)}', 1)
            AS host,
          content AS body
        FROM read_text('$RawFixtureDir/*.txt')),
      rp_l0 AS (SELECT host,
          unnest(list_transform(range(1, len(ls) + 1), i -> i))
            AS line_no,
          unnest(ls) AS raw
        FROM (SELECT host, string_split(body, chr(10)) AS ls
          FROM rp_f)),
      rp_l1 AS (SELECT host, line_no,
          trim(regexp_replace(regexp_replace(raw,
            '${sq(CrPattern)}', '', 'g'),
            '${sq(CommentPattern)}', '', 'g')) AS clean
        FROM rp_l0),
      rp_l2 AS (SELECT host, line_no,
          lower(regexp_extract(clean, '$dp', 1)) AS key,
          trim(regexp_extract(clean, '$dp', 2)) AS value
        FROM rp_l1 WHERE clean <> ''),
      rp_l3 AS (SELECT * FROM rp_l2 WHERE key <> ''),
      rp_rn AS (SELECT *, (key = 'user-agent') AS is_ua,
          ((key = 'user-agent') AND NOT COALESCE(
            lag(key = 'user-agent') OVER (
              PARTITION BY host ORDER BY line_no), false)) AS run_start
        FROM rp_l3),
      rp_ri AS (SELECT *, sum(CASE WHEN run_start THEN 1 ELSE 0 END)
          OVER (PARTITION BY host ORDER BY line_no
            ROWS UNBOUNDED PRECEDING) AS run_id
        FROM rp_rn),
      rp_ag AS (SELECT host, run_id, lower(value) AS agent
        FROM rp_ri WHERE is_ua),
      rp_ru AS (SELECT host, run_id, line_no, key AS directive, value
        FROM rp_ri
        WHERE NOT is_ua AND key <> 'sitemap' AND run_id > 0),
      rp_sm AS (SELECT host, '*' AS agent, 'sitemap' AS directive,
          value, line_no
        FROM rp_l3 WHERE key = 'sitemap'),
      rp_rules AS (SELECT host, agent, directive, value,
          CAST(row_number() OVER (PARTITION BY host
            ORDER BY line_no, agent) AS BIGINT) AS rule_order
        FROM (SELECT ru.host, ag.agent, ru.directive, ru.value,
            ru.line_no
          FROM rp_ru ru
          JOIN rp_ag ag ON ru.host = ag.host AND ru.run_id = ag.run_id
          UNION ALL SELECT host, agent, directive, value, line_no
          FROM rp_sm))"""
  }

  /** The X102 Gopher rule CTE block over a (doc_id, w) token relation
    * `src` (no leading WITH, `p`-prefixed, ends in `${p}fl`:
    * doc_id, n_words, fails) — ONE definition for the standalone
    * `gopher_rules` oracle and the X108 pipeline's quality gate, so a
    * threshold change can never leave one of them silently stale. */
  private def gopherCtes(src: String, p: String,
      minWords: Long = QualitySignals.GopherMinWords): String = {
    import QualitySignals._
    val mean = """(CAST(list_sum(list_transform(w, x -> len(x)))
      AS DOUBLE) / CAST(nullif(n, 0) AS DOUBLE))"""
    val stops = GopherStops.map(s =>
      s"(CASE WHEN list_contains(w, '$s') THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""${p}b AS (SELECT doc_id, w, len(w) AS n FROM $src),
      ${p}sc AS (SELECT doc_id, CAST(n AS BIGINT) AS n_words,
          CASE WHEN n < $minWords OR n > $GopherMaxWords
            THEN 'word_count' END AS f1,
          CASE WHEN $mean < $GopherMinMeanLen
            OR $mean > $GopherMaxMeanLen
            THEN 'mean_word_len' END AS f2,
          CASE WHEN CAST(len(list_filter(w, x -> contains(x, '#')))
              AS DOUBLE) / CAST(nullif(n, 0) AS DOUBLE)
              > $GopherMaxHashRatio
            THEN 'hash_ratio' END AS f3,
          CASE WHEN CAST(len(list_filter(w, x -> contains(x, '...')))
              AS DOUBLE) / CAST(nullif(n, 0) AS DOUBLE)
              > $GopherMaxEllipsisRatio
            THEN 'ellipsis_ratio' END AS f4,
          CASE WHEN CAST(len(list_filter(w,
              x -> regexp_matches(x, '[a-z]')))
              AS DOUBLE) / CAST(nullif(n, 0) AS DOUBLE)
              < $GopherMinAlphaFrac
            THEN 'alpha_words' END AS f5,
          CASE WHEN ($stops) < $GopherMinStopwords
            THEN 'stopwords' END AS f6
        FROM ${p}b),
      ${p}bg AS (SELECT doc_id, unnest(list_transform(range(1, len(w)),
          i -> w[i] || ' ' || w[i + 1])) AS g FROM $src),
      ${p}bgc AS (SELECT doc_id, g, count(*) AS c FROM ${p}bg
        GROUP BY 1, 2),
      ${p}bi AS (SELECT doc_id, CAST(max(c) AS DOUBLE) /
          CAST(sum(c) AS DOUBLE) AS top_bi FROM ${p}bgc GROUP BY 1),
      ${p}tg AS (SELECT doc_id,
          unnest(list_transform(range(1, len(w) - 1),
            i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])) AS g
        FROM $src),
      ${p}tri AS (SELECT doc_id,
          CAST(count(*) - count(DISTINCT g) AS DOUBLE) /
          CAST(count(*) AS DOUBLE) AS dup_tri FROM ${p}tg GROUP BY 1),
      ${p}j AS (SELECT ${p}sc.*, ${p}bi.top_bi, ${p}tri.dup_tri
        FROM ${p}sc LEFT JOIN ${p}bi USING (doc_id)
          LEFT JOIN ${p}tri USING (doc_id)),
      ${p}fl AS (SELECT doc_id, n_words,
          list_filter([f1, f2, f3, f4, f5, f6,
            CASE WHEN top_bi > $GopherMaxTopBigram
              THEN 'top_bigram' END,
            CASE WHEN dup_tri > $GopherMaxDupTrigram
              THEN 'dup_trigram' END],
            x -> x IS NOT NULL) AS fails
        FROM ${p}j)"""
  }

  /** The shared dHash signature CTE chain of the X106b/X106c media
    * near-dup oracles (no leading WITH, ends in `sig`: id, dh_lo,
    * dh_hi): base + planted-variant images re-derived from the
    * generating document text, sampled on the 9x8 grid, grayscaled,
    * bit-packed into the two 32-bit halves. */
  private lazy val mediaDhashCtes: String = {
    import MediaNeardup._
    s"""dims AS (SELECT doc_id, text,
          CAST(8 + doc_id % 9 AS INT) AS w0,
          CAST(8 + (doc_id // 9) % 7 AS INT) AS h0
        FROM documents),
      imgs AS (
        SELECT 'doc_' || doc_id AS id, text, w0, w0 AS sw, h0 AS sh,
          false AS up, false AS br FROM dims
        UNION ALL
        SELECT 'doc_' || doc_id || '_up', text, w0, 2 * w0, 2 * h0,
          true, false FROM dims WHERE doc_id % $VariantMod = 0
        UNION ALL
        SELECT 'doc_' || doc_id || '_br', text, w0, w0, h0,
          false, true FROM dims WHERE doc_id % $VariantMod = 4),
      s1 AS (SELECT id, text, w0, up, br,
          CAST(j % $GridW AS INT) AS gx,
          CAST(j // $GridW AS INT) AS gy,
          (j % $GridW) * sw // $GridW AS sx,
          (j // $GridW) * sh // $GridH AS sy
        FROM (SELECT *, unnest(range(0, ${GridW * GridH})) AS j
          FROM imgs)),
      s2 AS (SELECT id, text, br, gx, gy,
          3 * ((CASE WHEN up THEN sy // 2 ELSE sy END) * w0 +
               (CASE WHEN up THEN sx // 2 ELSE sx END)) AS pidx
        FROM s1),
      s3 AS (SELECT id, gx, gy,
          (LEAST(255, ord(substring(text,
              CAST((pidx + 0) % len(text) AS INT) + 1, 1)) +
             CASE WHEN br THEN $BrightDelta ELSE 0 END)
           + LEAST(255, ord(substring(text,
              CAST((pidx + 1) % len(text) AS INT) + 1, 1)) +
             CASE WHEN br THEN $BrightDelta ELSE 0 END)
           + LEAST(255, ord(substring(text,
              CAST((pidx + 2) % len(text) AS INT) + 1, 1)) +
             CASE WHEN br THEN $BrightDelta ELSE 0 END)) // 3 AS gray
        FROM s2),
      bits AS (SELECT id, gy, gx,
          CASE WHEN gray > nxt THEN 1 ELSE 0 END AS bit
        FROM (SELECT id, gy, gx, gray,
            lead(gray) OVER (PARTITION BY id, gy ORDER BY gx) AS nxt
          FROM s3)
        WHERE gx < ${GridW - 1}),
      sig AS (SELECT id,
          CAST(sum(CASE WHEN gy < 4
            THEN bit * (CAST(1 AS BIGINT) << (gy * 8 + gx))
            ELSE 0 END) AS BIGINT) AS dh_lo,
          CAST(sum(CASE WHEN gy >= 4
            THEN bit * (CAST(1 AS BIGINT) << ((gy - 4) * 8 + gx))
            ELSE 0 END) AS BIGINT) AS dh_hi
        FROM bits GROUP BY 1)"""
  }

  /** The banded candidate-pair CTE chain over a (id, dh_lo, dh_hi)
    * signature CTE `src` (no leading WITH, ends in `hm`: id_a, id_b,
    * hamming — 16-bit chunk buckets, MaxBucket-capped, pair-distinct,
    * exact Hamming) — ONE pair engine for every 64-bit perceptual
    * fingerprint: the X106b/X106d/X106e image oracles and the X109b
    * audio oracle all splice it. */
  private def mediaPairCtes(src: String = "sig"): String = {
    import MediaNeardup._
    s"""ch AS (
        SELECT id, dh_lo, dh_hi, 0 AS chunk, dh_lo % 65536 AS cval
          FROM $src
        UNION ALL SELECT id, dh_lo, dh_hi, 1, (dh_lo // 65536) % 65536
          FROM $src
        UNION ALL SELECT id, dh_lo, dh_hi, 2, dh_hi % 65536 FROM $src
        UNION ALL SELECT id, dh_lo, dh_hi, 3, (dh_hi // 65536) % 65536
          FROM $src),
      bk AS (SELECT chunk, cval FROM ch GROUP BY 1, 2
        HAVING count(*) BETWEEN 2 AND $MaxBucket),
      cm AS (SELECT ch.* FROM ch JOIN bk USING (chunk, cval)),
      cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b,
          a.dh_lo AS lo_a, b.dh_lo AS lo_b,
          a.dh_hi AS hi_a, b.dh_hi AS hi_b
        FROM cm a JOIN cm b
          ON a.chunk = b.chunk AND a.cval = b.cval AND a.id < b.id),
      hm AS (SELECT id_a, id_b,
          CAST(bit_count(xor(lo_a, lo_b)) + bit_count(xor(hi_a, hi_b))
            AS INT) AS hamming
        FROM cand)"""
  }

  /** Shared oracle of `media_neardup_probe` (X106c) and its streaming
    * twin `media_probe_stream` (X106f — byte-equal by construction,
    * both run `MediaNeardup.probeAgainstIndex`): the batch (variant)
    * signatures banded-joined against the base-asset index with the
    * index-side occupancy cap, exact Hamming filter. */
  private lazy val mediaProbeOracle: String = {
    import MediaNeardup._
    s"""
      WITH $mediaDhashCtes,
      nb AS (SELECT id, dh_lo, dh_hi FROM sig
        WHERE NOT regexp_matches(id, '^doc_[0-9]+$$')),
      co AS (SELECT id, dh_lo, dh_hi FROM sig
        WHERE regexp_matches(id, '^doc_[0-9]+$$')),
      chn AS (
        SELECT id, dh_lo, dh_hi, 0 AS chunk, dh_lo % 65536 AS cval
          FROM nb
        UNION ALL SELECT id, dh_lo, dh_hi, 1, (dh_lo // 65536) % 65536
          FROM nb
        UNION ALL SELECT id, dh_lo, dh_hi, 2, dh_hi % 65536 FROM nb
        UNION ALL SELECT id, dh_lo, dh_hi, 3, (dh_hi // 65536) % 65536
          FROM nb),
      chc0 AS (
        SELECT id, dh_lo, dh_hi, 0 AS chunk, dh_lo % 65536 AS cval
          FROM co
        UNION ALL SELECT id, dh_lo, dh_hi, 1, (dh_lo // 65536) % 65536
          FROM co
        UNION ALL SELECT id, dh_lo, dh_hi, 2, dh_hi % 65536 FROM co
        UNION ALL SELECT id, dh_lo, dh_hi, 3, (dh_hi // 65536) % 65536
          FROM co),
      bkc AS (SELECT chunk, cval FROM chc0 GROUP BY 1, 2
        HAVING count(*) <= $MaxBucket),
      chc AS (SELECT chc0.* FROM chc0 JOIN bkc USING (chunk, cval)),
      cand AS (SELECT DISTINCT n.id AS new_id, c.id AS corpus_id,
          n.dh_lo AS n_lo, n.dh_hi AS n_hi,
          c.dh_lo AS c_lo, c.dh_hi AS c_hi
        FROM chn n JOIN chc c
          ON n.chunk = c.chunk AND n.cval = c.cval),
      hm AS (SELECT new_id, corpus_id,
          CAST(bit_count(xor(n_lo, c_lo)) + bit_count(xor(n_hi, c_hi))
            AS INT) AS hamming
        FROM cand)
      SELECT new_id, corpus_id, hamming FROM hm
      WHERE hamming <= $HammingMax ORDER BY new_id, corpus_id"""
  }

  /** The X109 audio store CTE chain (no leading WITH): `ai` — one row
    * per clip (base + planted resample/gain variants) with its
    * geometry and variant flags, re-derived from the generating
    * document text exactly like the engine's store build. Shared by
    * the X109a stats oracle and the X109b signature chain. */
  private lazy val audioStoreCtes: String = {
    import AudioNeardup._
    s"""ad AS (SELECT doc_id, text,
          CAST(240 + (doc_id % 5) * 60 AS INT) AS n0,
          CAST(8000 + (doc_id % 3) * 2000 AS INT) AS r0
        FROM documents),
      ai AS (
        SELECT 'doc_' || doc_id AS id, text, n0 AS ns, r0 AS rate,
          false AS rs, false AS gn FROM ad
        UNION ALL
        SELECT 'doc_' || doc_id || '_rs', text, 2 * n0, 2 * r0,
          true, false FROM ad WHERE doc_id % $VariantMod = $RsMod
        UNION ALL
        SELECT 'doc_' || doc_id || '_gn', text, n0, r0,
          false, true FROM ad WHERE doc_id % $VariantMod = $GnMod)"""
  }

  /** The amplitude of (0-based) sample index `i` of a clip row of
    * `ai` — the engine's `(textByte(j mod len) − 128) · 64` base
    * chain with the resample index fold and the gain doubling. */
  private def audioSampleSql(i: String): String =
    s"""(ord(substring(text, CAST(
        (CASE WHEN rs THEN ($i) // 2 ELSE ($i) END) % len(text)
        AS INT) + 1, 1)) - 128) * 64 *
      (CASE WHEN gn THEN 2 ELSE 1 END)"""

  /** The X109b fingerprint chain over `ai` (no leading WITH, ends in
    * `asig`: id, dh_lo, dh_hi) — 65 point-sampled amplitudes, 64
    * comparison bits, two 32-bit halves. */
  private lazy val audioSigCtes: String = {
    import AudioNeardup._
    s"""apt AS (SELECT id, x, ${audioSampleSql(s"x * ns // $Points")}
          AS v
        FROM ai, (SELECT unnest(range(0, $Points)) AS x)),
      abt AS (SELECT id, x, CASE WHEN v > nxt THEN 1 ELSE 0 END AS bit
        FROM (SELECT id, x, v,
            lead(v) OVER (PARTITION BY id ORDER BY x) AS nxt
          FROM apt)
        WHERE x < ${Points - 1}),
      asig AS (SELECT id,
          CAST(sum(CASE WHEN x < 32
            THEN bit * (CAST(1 AS BIGINT) << x) ELSE 0 END)
            AS BIGINT) AS dh_lo,
          CAST(sum(CASE WHEN x >= 32
            THEN bit * (CAST(1 AS BIGINT) << (x - 32)) ELSE 0 END)
            AS BIGINT) AS dh_hi
        FROM abt GROUP BY 1)"""
  }

  /** The X110 video store CTE chain (no leading WITH): `vi` — one row
    * per clip (base + planted temporal/brightness variants) with its
    * geometry, frame count, rate and variant flags, re-derived from
    * the generating document text exactly like the engine's store
    * build. */
  private lazy val videoStoreCtes: String = {
    import VideoNeardup._
    s"""vd AS (SELECT doc_id, text,
          CAST(8 + doc_id % 9 AS INT) AS w0,
          CAST(8 + (doc_id // 9) % 7 AS INT) AS h0,
          CAST(4 + doc_id % 4 AS INT) AS nf0,
          CAST(10 + doc_id % 5 AS INT) AS fn0
        FROM documents),
      vi AS (
        SELECT 'doc_' || doc_id AS id, text, w0, h0, nf0 AS nf,
          fn0 AS fnum, 1 AS fden, false AS rt, false AS br,
          false AS cl FROM vd
        UNION ALL
        SELECT 'doc_' || doc_id || '_rt', text, w0, h0, 2 * nf0,
          2 * fn0, 1, true, false, false FROM vd
        WHERE doc_id % $VariantMod = $RtMod
        UNION ALL
        SELECT 'doc_' || doc_id || '_cl', text, w0, h0, nf0 - $ClDrop,
          fn0, 1, false, false, true FROM vd
        WHERE doc_id % $VariantMod = $ClMod
        UNION ALL
        SELECT 'doc_' || doc_id || '_br', text, w0, h0, nf0, fn0, 1,
          false, true, false FROM vd
        WHERE doc_id % $VariantMod = $BrMod)"""
  }

  /** The luma byte of (frame `f`, pixel `i`) of a `vi` clip row: the
    * engine's `textByte((17·bf + i) mod len)` chain with the variant
    * index folds (rt: duplicated frames, cl: leading-trim offset) and
    * the +4 brightness shift (LEAST mirrors the engine's clamp,
    * unreachable on ASCII planes). */
  private def videoYSql(f: String, i: String): String = {
    import VideoNeardup._
    s"""LEAST(255, ord(substring(text, CAST(
        ($FrameStride * (CASE WHEN rt THEN ($f) // 2
            WHEN cl THEN ($f) + $ClDrop ELSE ($f) END)
          + ($i)) % len(text) AS INT) + 1, 1)) +
      CASE WHEN br THEN $BrightDelta ELSE 0 END)"""
  }

  /** The per-frame luma dHash chain over a CTE `src` carrying
    * (text, w0, h0, rt, br, cl, fi, `keys`...) — ends in `${p}sig`:
    * keys..., dh_lo, dh_hi. `keys` lets the X110b oracle hash three
    * sampled frames per clip while X110c hashes one and X110d all. */
  private def videoDhashCtes(src: String, p: String,
      keys: Seq[String]): String = {
    import MediaNeardup.{GridW, GridH}
    val ks = keys.mkString(", ")
    s"""${p}g1 AS (SELECT $ks, text, rt, br, cl, fi, w0, h0,
          CAST(j % $GridW AS INT) AS gx,
          CAST(j // $GridW AS INT) AS gy,
          (j % $GridW) * w0 // $GridW AS sx,
          (j // $GridW) * h0 // $GridH AS sy
        FROM $src, (SELECT unnest(range(0, ${GridW * GridH})) AS j)),
      ${p}g2 AS (SELECT $ks, gx, gy,
          ${videoYSql("fi", "sy * w0 + sx")} AS yv
        FROM ${p}g1),
      ${p}gb AS (SELECT $ks, gy, gx,
          CASE WHEN yv > nxt THEN 1 ELSE 0 END AS bit
        FROM (SELECT *, lead(yv) OVER (PARTITION BY $ks, gy
            ORDER BY gx) AS nxt
          FROM ${p}g2)
        WHERE gx < ${GridW - 1}),
      ${p}sig AS (SELECT $ks,
          CAST(sum(CASE WHEN gy < 4
            THEN bit * (CAST(1 AS BIGINT) << (gy * 8 + gx))
            ELSE 0 END) AS BIGINT) AS dh_lo,
          CAST(sum(CASE WHEN gy >= 4
            THEN bit * (CAST(1 AS BIGINT) << ((gy - 4) * 8 + gx))
            ELSE 0 END) AS BIGINT) AS dh_hi
        FROM ${p}gb GROUP BY $ks)"""
  }

  /** The X110d shingle-pair chain over the `vi` store: every frame's
    * luma dHash, consecutive-frame shingles (distinct per clip),
    * occupancy cap, and the equality self-join — ends in `pr`
    * (id_a, id_b, shared) and `nsh` (id, n_sh), the containment
    * ingredients shared by `video_subclip` and `video_canonical`. */
  private lazy val videoShingleCtes: String = {
    import VideoNeardup._
    s"""vaf AS (SELECT id, text, w0, h0, rt, br, cl,
          unnest(range(0, nf)) AS fi FROM vi),
      ${videoDhashCtes("vaf", "va", Seq("id", "fi"))},
      shp AS (SELECT id, dh_lo AS a_lo, dh_hi AS a_hi,
          lead(dh_lo) OVER w AS b_lo, lead(dh_hi) OVER w AS b_hi
        FROM vasig WINDOW w AS (PARTITION BY id ORDER BY fi)),
      shd AS (SELECT DISTINCT id, a_lo, a_hi, b_lo, b_hi FROM shp
        WHERE b_lo IS NOT NULL),
      nsh AS (SELECT id, count(*) AS n_sh FROM shd GROUP BY 1),
      occ AS (SELECT a_lo, a_hi, b_lo, b_hi FROM shd
        GROUP BY 1, 2, 3, 4 HAVING count(*) <= $MaxBucket),
      cap AS (SELECT shd.* FROM shd
        JOIN occ USING (a_lo, a_hi, b_lo, b_hi)),
      pr AS (SELECT a.id AS id_a, b.id AS id_b, count(*) AS shared
        FROM cap a JOIN cap b USING (a_lo, a_hi, b_lo, b_hi)
        WHERE a.id < b.id GROUP BY 1, 2)"""
  }

  /** The X76 MinHash drop chain (needs a leading WITH RECURSIVE):
    * 3-gram shingles → 8-band min-signatures → banded pairs (≥ 4
    * agreeing bands) → component walk → `dr(doc_id)`, the
    * NON-CANONICAL members the dedup manifest collapses. Shared by
    * `dedup_apply` (X76b) and `asset_gc` (X112) so the two write-back
    * oracles can never disagree about which documents died. */
  private lazy val dedupDropCtes: String =
    """tok AS (SELECT doc_id,
          list_filter(string_split_regex(lower(text), '\s+'),
            x -> x <> '') AS w
        FROM documents),
      sh AS (SELECT DISTINCT doc_id,
          unnest(list_transform(range(1, len(w) - 1),
            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle
        FROM tok WHERE len(w) >= 3),
      sig AS (SELECT doc_id, b.band,
          min(md5(b.band || ':' || shingle)) AS sig
        FROM sh, (SELECT unnest(range(0, 8)) AS band) b GROUP BY 1, 2),
      pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM sig a JOIN sig b
          ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
        GROUP BY 1, 2 HAVING count(*) >= 4),
      edges AS (SELECT doc_a AS s, doc_b AS d FROM pairs
        UNION SELECT doc_b, doc_a FROM pairs),
      walk AS (
        SELECT s, d FROM edges
        UNION
        SELECT w.s, e.d FROM walk w JOIN edges e ON w.d = e.s),
      lbl AS (SELECT s AS doc_id, least(s, min(d)) AS group_id
        FROM walk GROUP BY s),
      dr AS (SELECT doc_id FROM lbl WHERE doc_id <> group_id)"""

  /** The per-document cross-modal asset arithmetic (no leading WITH)
    * — ends in `mm`: doc_id, per-modality asset counts and decoded
    * unit sums, re-derived from the three stores' generation
    * formulas. Shared by `multimodal_manifest` (X111) and `asset_gc`
    * (X112). */
  private lazy val assetArithCte: String = {
    import VideoNeardup.{VariantMod, RtMod, ClMod, BrMod, ClDrop}
    import AudioNeardup.{RsMod, GnMod}
    s"""ma AS (SELECT doc_id,
          CAST(8 + doc_id % 9 AS BIGINT) AS w0,
          CAST(8 + (doc_id // 9) % 7 AS BIGINT) AS h0,
          CAST(240 + (doc_id % 5) * 60 AS BIGINT) AS ns,
          CAST(4 + doc_id % 4 AS BIGINT) AS nf,
          doc_id % $VariantMod AS v
        FROM documents),
      mm AS (SELECT doc_id,
        CAST(CASE WHEN v IN (0, 4) THEN 2 ELSE 1 END AS BIGINT)
          AS n_image,
        CAST(w0 * h0 * (1 + CASE WHEN v = 0 THEN 4
          WHEN v = 4 THEN 1 ELSE 0 END) AS BIGINT) AS image_px,
        CAST(CASE WHEN v IN ($RsMod, $GnMod) THEN 2 ELSE 1 END
          AS BIGINT) AS n_audio,
        CAST(ns * (1 + CASE WHEN v = $RsMod THEN 2
          WHEN v = $GnMod THEN 1 ELSE 0 END) AS BIGINT)
          AS audio_samples,
        CAST(CASE WHEN v IN ($RtMod, $ClMod, $BrMod) THEN 2 ELSE 1 END
          AS BIGINT) AS n_video,
        CAST(nf + CASE WHEN v = $RtMod THEN 2 * nf
          WHEN v = $ClMod THEN nf - $ClDrop
          WHEN v = $BrMod THEN nf ELSE 0 END AS BIGINT)
          AS video_frames,
        CAST(CASE WHEN v = 7 THEN 3 ELSE 4 END AS BIGINT) AS n_assets
      FROM ma)"""
  }

  /** Shared oracle of `discovery_feed` (X101) and its streaming twin
    * `discovery_feed_stream` (X101b — byte-equal by construction,
    * both assemble through `Sitemap.discoveryFeedAssemble`): the
    * outlink-novel ∪ sitemap-novel ∪ robots-declared three-channel
    * merge with sorted provenance and the freshness hint. */
  private lazy val discoveryFeedOracle: String = {
    def sq(x: String) = x.replace("'", "''")
    s"""
      WITH $resolvedUrlsCtes,
      $sitemapDeclaredCtes,
      $robotsParsedCtes,
      ${fetchableFrontierCte("fo")},
      ${seenUrlsCte("seenx")},
      no AS (SELECT host, url, 'outlink' AS via,
          CAST(NULL AS DATE) AS lastmod
        FROM fo ANTI JOIN seenx USING (url)),
      ns AS (SELECT g.host, g.url, 'sitemap' AS via, g.lastmod
        FROM sm_g g ANTI JOIN seenx ON g.url = seenx.url),
      rs0 AS (SELECT DISTINCT
          regexp_extract(url, '${sq(HtmlExtract.HostPattern)}', 1)
            AS host, url
        FROM (SELECT ${HtmlExtract.normalizeUrlSql("value")} AS url
          FROM rp_rules WHERE directive = 'sitemap')
        WHERE url <> ''
          AND regexp_extract(url, '${sq(HtmlExtract.HostPattern)}', 1)
            <> ''),
      rs AS (SELECT host, url, 'robots' AS via,
          CAST(NULL AS DATE) AS lastmod
        FROM rs0 ANTI JOIN seenx USING (url)),
      u AS (SELECT * FROM no UNION ALL SELECT * FROM ns
        UNION ALL SELECT * FROM rs)
      SELECT host, url,
        array_to_string(list_sort(array_agg(DISTINCT via)), '+')
          AS via,
        max(lastmod) AS lastmod
      FROM u GROUP BY 1, 2 ORDER BY host, url"""
  }

  /** Shared oracle of `crawl_ingest` (X84) and its streaming twin
    * `crawl_ingest_stream` (X84b): the X82 CTE block, the admission +
    * exact-dedup stages, the proven X3 signature CTEs
    * (tok/shingle/salted-band-min — the neardup_probe shapes), the
    * one-pass larger-side near-dup drop, and the source manifest. */
  private lazy val crawlIngestOracle: String = s"""
      WITH ${htmlCtes("")},
      adm AS (SELECT * FROM out
        WHERE NOT boilerplate_flag
          AND text_len >= ${HtmlExtract.MinTextLen}),
      uniq AS (SELECT * FROM (
          SELECT *, row_number() OVER (
            PARTITION BY md5(text) ORDER BY doc_id) AS rn
          FROM adm)
        WHERE rn = 1),
      utok AS (SELECT doc_id, source, text_len,
          list_filter(string_split_regex(lower(text), '\\s+'),
            x -> x <> '') AS w
        FROM uniq),
      ush AS (SELECT DISTINCT doc_id,
          unnest(list_transform(range(1, len(w) - 1),
            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle
        FROM utok WHERE len(w) >= 3),
      usig AS (SELECT doc_id, b.band,
          min(md5(b.band || ':' || shingle)) AS sig
        FROM ush, (SELECT unnest(range(0, 8)) AS band) b GROUP BY 1, 2),
      upr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM usig a JOIN usig b
          ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
        GROUP BY 1, 2 HAVING count(*) >= 4),
      udrop AS (SELECT DISTINCT doc_b AS doc_id FROM upr),
      fin AS (SELECT * FROM utok ANTI JOIN udrop USING (doc_id)),
      p AS (SELECT source, count(*) AS n_pages FROM out GROUP BY 1),
      a AS (SELECT source, count(*) AS n_admitted FROM adm GROUP BY 1),
      u AS (SELECT source, count(*) AS n_unique FROM uniq GROUP BY 1),
      f AS (SELECT source, count(*) AS n_final,
          CAST(sum(CAST(len(w) AS BIGINT)) AS BIGINT) AS n_tokens,
          CAST(sum(text_len) AS BIGINT) AS n_chars
        FROM fin GROUP BY 1)
      SELECT p.source, p.n_pages,
        COALESCE(a.n_admitted, 0) AS n_admitted,
        COALESCE(u.n_unique, 0) AS n_unique,
        COALESCE(f.n_final, 0) AS n_final,
        COALESCE(f.n_tokens, 0) AS n_tokens,
        COALESCE(f.n_chars, 0) AS n_chars
      FROM p LEFT JOIN a USING (source) LEFT JOIN u USING (source)
        LEFT JOIN f USING (source)
      ORDER BY source"""

  /** Shared oracle for the batch upsert and its true-streaming twin:
    * three fixture batches merged on (id, dt), whichever engine path
    * landed them. */
  private lazy val upsertOracle = s"""
      WITH a AS (${ocsv("customers_20240628.csv", "2024-06-28")}),
      b AS (${ocsv("customers_r2_20240628.csv", "2024-06-28")}),
      c AS (${ocsv("customers_20240629.csv", "2024-06-29")}),
      m1 AS (SELECT * FROM a ANTI JOIN b USING (id, dt)
             UNION ALL SELECT * FROM b),
      m2 AS (SELECT * FROM m1 ANTI JOIN c USING (id, dt)
             UNION ALL SELECT * FROM c)
      SELECT id, name, city, bal, dt, $oAudit
      FROM m2 ORDER BY dt, id"""

  val registry: Seq[(String, Q)] = Seq(
    "ingest_append" -> Q(Ingest.ingestAppend, Some(s"""
      WITH f AS (
        ${ocsv("customers_20240628.csv", "2024-06-28")}
        UNION ALL
        ${ocsv("customers_20240630.csv.gz", "2024-06-30")})
      SELECT id, name, city, bal, dt, $oAudit
      FROM f ORDER BY dt, id""")),

    "ingest_overwrite" -> Q(Ingest.ingestOverwrite, Some(s"""
      SELECT id, name, city, bal, junk, '2024-06-30' AS dt, $oAudit
      FROM read_csv(
        '${Ingest.FixtureDir}/inbound/sap/customers/customers_20240630.csv.gz',
        header=true, all_varchar=true)
      ORDER BY id""")),

    "ingest_upsert" -> Q(Ingest.ingestUpsert, Some(upsertOracle)),

    // Declarative per-column timestamp normalization: the config (not
    // loader code) declares each event-time column's source unit; the
    // oracle recomputes the magnitude dispatch in DuckDB integer
    // arithmetic (`//` = integer division — double math would corrupt
    // the nano-epoch rows).
    "ingest_ts_normalize" -> Q(Ingest.ingestTsNormalize, Some(s"""
      SELECT id,
        ev_ms * 1000 AS ev_ms_us,
        CASE WHEN abs(ev_mixed) >= 100000000000000000 THEN ev_mixed // 1000
             WHEN abs(ev_mixed) >= 100000000000000 THEN ev_mixed
             WHEN abs(ev_mixed) >= 100000000000 THEN ev_mixed * 1000
             ELSE ev_mixed * 1000000 END AS ev_mixed_us,
        epoch_us(CAST(ev_iso AS TIMESTAMP)) AS ev_iso_us,
        note, '2024-06-28' AS dt, $oAudit
      FROM read_csv(
        '${Ingest.FixtureDir}/inbound/sap/signals/signals_20240628.csv',
        header=true, columns={'id':'INTEGER','ev_ms':'BIGINT',
          'ev_mixed':'BIGINT','ev_iso':'VARCHAR','note':'VARCHAR'})
      ORDER BY id""")),

    // Snapshot time-travel (SnapshotLog): three upsert batches commit
    // versions 1..3; the query returns the table AS OF VERSION 2, so
    // the oracle is the upsert of the first TWO files only — reading
    // the live (v3) state, a mis-retired copy, or a stale manifest all
    // hash-fail. Ledger shape + v3≡live pinned by in-query requires.
    "read_at_version" -> Q(Ingest.ingestTimeTravel, Some(s"""
      WITH a AS (${ocsv("customers_20240628.csv", "2024-06-28")}),
      b AS (${ocsv("customers_r2_20240628.csv", "2024-06-28")}),
      m1 AS (SELECT * FROM a ANTI JOIN b USING (id, dt)
             UNION ALL SELECT * FROM b)
      SELECT id, name, city, bal, dt, $oAudit
      FROM m1 ORDER BY dt, id""")),

    // Version-to-version CDC (the change-data-feed shape): diff of the
    // v1 and v3 snapshot reconstructions on (id, dt). The oracle
    // rebuilds both states from the CSVs and classifies independently;
    // the merge never deletes, so any 'delete' row hash-fails.
    "version_changes" -> Q(Ingest.ingestVersionChanges, Some(s"""
      WITH a AS (${ocsv("customers_20240628.csv", "2024-06-28")}),
      b AS (${ocsv("customers_r2_20240628.csv", "2024-06-28")}),
      c AS (${ocsv("customers_20240629.csv", "2024-06-29")}),
      m1 AS (SELECT * FROM a ANTI JOIN b USING (id, dt)
             UNION ALL SELECT * FROM b),
      m2 AS (SELECT * FROM m1 ANTI JOIN c USING (id, dt)
             UNION ALL SELECT * FROM c)
      SELECT coalesce(a.id, m2.id) AS id,
        coalesce(a.dt, m2.dt) AS dt,
        CASE WHEN a.id IS NULL THEN 'insert'
          WHEN m2.id IS NULL THEN 'delete' ELSE 'update' END AS change_type,
        a.name AS old_name, m2.name AS new_name,
        a.city AS old_city, m2.city AS new_city,
        a.bal AS old_bal, m2.bal AS new_bal
      FROM a FULL JOIN m2 ON a.id = m2.id AND a.dt = m2.dt
      WHERE a.id IS NULL OR m2.id IS NULL
        OR NOT (a.name IS NOT DISTINCT FROM m2.name
          AND a.city IS NOT DISTINCT FROM m2.city
          AND a.bal IS NOT DISTINCT FROM m2.bal)
      ORDER BY dt, id""")),

    // CDC-driven incremental aggregate maintenance: the Spark side
    // brings a v1 per-dt rollup to v3 by retract/apply over the change
    // feed (never rescanning v3); the oracle aggregates the fully
    // merged state DIRECTLY — so a wrong retraction or a premature
    // double rounding hash-fails. Decimal-exact sums, string-routed
    // to double on both sides.
    "cdc_rollup" -> Q(Ingest.ingestCdcRollup, Some(s"""
      SELECT dt, count(*) AS n_rows,
        CAST(CAST(sum(CAST(bal AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE)
          AS sum_bal
      FROM ($upsertOracle)
      GROUP BY dt ORDER BY dt""")),

    // X92 — recrawl scheduling from observed change rates: replay the
    // three snapshot versions, lag-window per merged key, bucket the
    // change rate into refresh tiers, whole-day date arithmetic. The
    // oracle rebuilds all three version states from the CSVs and
    // replays the identical window/bucket/date chain.
    "recrawl_schedule" -> Q(Ingest.ingestRecrawlSchedule, Some(s"""
      WITH a AS (${ocsv("customers_20240628.csv", "2024-06-28")}),
      b AS (${ocsv("customers_r2_20240628.csv", "2024-06-28")}),
      c AS (${ocsv("customers_20240629.csv", "2024-06-29")}),
      m1 AS (SELECT * FROM a ANTI JOIN b USING (id, dt)
             UNION ALL SELECT * FROM b),
      m2 AS (SELECT * FROM m1 ANTI JOIN c USING (id, dt)
             UNION ALL SELECT * FROM c),
      obs AS (
        SELECT id, dt, name, city, bal, 1 AS v,
          DATE '2024-06-28' AS batch_dt FROM a
        UNION ALL
        SELECT id, dt, name, city, bal, 2 AS v,
          DATE '2024-06-28' AS batch_dt FROM m1
        UNION ALL
        SELECT id, dt, name, city, bal, 3 AS v,
          DATE '2024-06-29' AS batch_dt FROM m2),
      fl AS (SELECT *, lag(v) OVER w AS pv,
          (lag(v) OVER w IS NOT NULL AND NOT (
            name IS NOT DISTINCT FROM lag(name) OVER w AND
            city IS NOT DISTINCT FROM lag(city) OVER w AND
            bal IS NOT DISTINCT FROM lag(bal) OVER w)) AS changed
        FROM obs WINDOW w AS (PARTITION BY id, dt ORDER BY v)),
      s AS (SELECT id, dt, count(*) AS n_obs,
          CAST(sum(CASE WHEN changed THEN 1 ELSE 0 END) AS BIGINT)
            AS n_changes,
          max(CASE WHEN changed OR pv IS NULL THEN batch_dt END)
            AS last_event_dt
        FROM fl GROUP BY 1, 2),
      t AS (SELECT *, CASE WHEN n_obs > 1
          THEN CAST(n_changes AS DOUBLE) / CAST(n_obs - 1 AS DOUBLE)
          ELSE 0.0 END AS change_rate FROM s),
      u AS (SELECT *, CASE WHEN change_rate >= 0.5 THEN 'hot'
          WHEN n_changes > 0 THEN 'warm' ELSE 'cold' END AS tier
        FROM t),
      x AS (SELECT *, CASE tier WHEN 'hot' THEN 1 WHEN 'warm' THEN 7
          ELSE 30 END AS interval_days FROM u)
      SELECT id, dt, n_obs, n_changes, change_rate, tier,
        CAST(interval_days AS BIGINT) AS interval_days,
        CAST(last_event_dt AS VARCHAR) AS last_event_dt,
        CAST(last_event_dt + interval_days AS VARCHAR) AS next_fetch_dt
      FROM x ORDER BY dt, id""")),

    // S2 hard mode: RFC-4180 doubled quotes, delimiters and NEWLINES
    // inside quoted fields, 3,000 rows — both engines parse the same
    // bytes with their own CSV readers, so quote/newline handling is
    // pinned cross-engine.
    "ingest_multiline" -> Q(Ingest.ingestMultiline, Some(s"""
      SELECT id, name, city, bal, '2024-07-01' AS dt, $oAudit
      FROM read_csv(
        '${Ingest.FixtureDir}/inbound/sap/customers_big/customers_20240701.csv',
        header=true, columns={'id':'INTEGER','name':'VARCHAR',
          'city':'VARCHAR','bal':'DOUBLE','junk':'VARCHAR'})
      ORDER BY id""")),

    // Hive partition escaping under merge: dt carries '/', ':' and '='
    // through first-load, staged-swap merge, and read-back; the oracle
    // sees it as a plain constant, so any escaping break hash-fails.
    "ingest_escaped_dt" -> Q(Ingest.ingestEscapedDt, Some(s"""
      WITH a AS (${ocsv("customers_20240628.csv", "2024/06:28=x")}),
      b AS (${ocsv("customers_r2_20240628.csv", "2024/06:28=x")}),
      m AS (SELECT * FROM a ANTI JOIN b USING (id, dt)
            UNION ALL SELECT * FROM b)
      SELECT id, name, city, bal, dt, $oAudit
      FROM m ORDER BY id""")),

    // Maintenance twins: same contents-oracle as an append of all four
    // fixture files; the operation under test (file-count-reducing
    // compaction / ledger-idempotent backfill replay) is enforced by
    // in-query `require`s, so a regression fails the row.
    "ingest_compact" -> Q(Ingest.ingestCompact, Some(allFourCsvs)),
    "ingest_backfill" -> Q(Ingest.ingestBackfill, Some(allFourCsvs)),

    // True-streaming twin of ingest_upsert: the same three files land in
    // a WATCHED dir against a running StreamingQuery (one micro-batch
    // each, foreachBatch -> the batch merge), so the gate itself
    // exercises writeStream + checkpointed file discovery. Shares the
    // SAME oracle value — the claim is byte-identical curated contents.
    "ingest_stream" -> Q(Ingest.ingestStream, Some(upsertOracle)),

    "q1_pricing_summary" -> Q(Analytics.q1PricingSummary, Some(s"""
      SELECT l_returnflag, l_linestatus,
        ${osum("l_quantity")} AS sum_qty,
        ${osum("l_extendedprice")} AS sum_base_price,
        ${osum("l_extendedprice*(1.0-l_discount)")} AS sum_disc_price,
        ${osum("l_extendedprice*(1.0-l_discount)*(1.0+l_tax)")} AS sum_charge,
        ${osum("l_quantity")}/count(*) AS avg_qty,
        ${osum("l_extendedprice")}/count(*) AS avg_price,
        ${osum("l_discount")}/count(*) AS avg_disc,
        count(*) AS count_order
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY 1, 2 ORDER BY 1, 2""")),

    "q3_top_revenue" -> Q(Analytics.q3TopRevenue, Some(s"""
      SELECT l_orderkey,
        ${osum("l_extendedprice*(1.0-l_discount)")} AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment = 'BUILDING'
      GROUP BY 1 ORDER BY revenue DESC, l_orderkey LIMIT 10""")),

    "q5_revenue_by_nation" -> Q(Analytics.q5RevenueByNation, Some(s"""
      SELECT r_name, n_name,
        ${osum("l_extendedprice*(1.0-l_discount)")} AS revenue,
        count(*) AS n_items
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY 1, 2 ORDER BY 1, 2""")),

    "q9_nation_brand" -> Q(Analytics.q9RevenueByNationBrand, Some(s"""
      SELECT n_name, p_brand,
        ${osum("l_extendedprice*(1.0-l_discount)")} AS revenue,
        count(*) AS n_items
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE p_size >= 25
      GROUP BY 1, 2 ORDER BY 1, 2""")),

    "topk_orders" -> Q(Analytics.topKOrders, Some("""
      SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""")),

    // Custom whole-operator extension (plans/TopKPerKey): per-key top-k
    // with partition-local bounded heaps — the shuffle carries at most
    // partitions×keys×k rows where the row_number oracle shuffles the
    // whole table. Total order (price desc, orderkey) ⇒ deterministic.
    "topk_per_key" -> Q((s, d) => {
      import org.apache.spark.sql.functions.col
      graft.plans.TopK.topKPerKey(
          graft.util.Tables.t(s, d, "orders")
            .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice")),
          Seq(col("o_custkey")),
          Seq(col("o_totalprice").desc, col("o_orderkey")), 3)
        .orderBy("o_custkey", "o_orderkey")
    }, Some("""
      SELECT o_custkey, o_orderkey, o_totalprice FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
          row_number() OVER (PARTITION BY o_custkey
            ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders) WHERE rn <= 3
      ORDER BY o_custkey, o_orderkey""")),

    "rollup_nation" -> Q(Analytics.rollupNation, Some(s"""
      SELECT r_name, n_name, count(*) AS n_cust,
        ${osum("c_acctbal")} AS sum_bal
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY ROLLUP(r_name, n_name)
      ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""")),

    "cube_orders" -> Q(Analytics.cubeOrders, Some(s"""
      SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
        ${osum("o_totalprice")} AS sum_price
      FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
      ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""")),

    "dedup_exact" -> Q(Analytics.dedupExact, Some("""
      SELECT DISTINCT l_returnflag, l_linestatus, l_orderkey
      FROM lineitem ORDER BY 1, 2, 3""")),

    "dedup_keep_latest" -> Q(Analytics.dedupKeepLatest, Some("""
      SELECT o_custkey, o_orderkey, o_totalprice FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
          row_number() OVER (PARTITION BY o_custkey
            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders) WHERE rn = 1 ORDER BY o_custkey""")),

    "window_events" -> Q(Analytics.windowEvents, Some("""
      SELECT user_id, CAST(rn AS INTEGER) AS rn, event_id, event_type,
        prev_type, run_value FROM (
        SELECT user_id, event_id, event_type,
          row_number() OVER w AS rn,
          lag(event_type, 1) OVER w AS prev_type,
          CAST(CAST(sum(CAST(value AS DECIMAL(30,8))) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS VARCHAR)
            AS DOUBLE) AS run_value
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      WHERE rn <= 3 ORDER BY user_id, rn""")),

    "tumbling_window" -> Q(Analytics.tumblingWindow, Some(s"""
      SELECT epoch_us(date_trunc('hour', ts)) AS w_start_us, event_type,
        count(*) AS n_events, ${osum("value")} AS sum_value
      FROM events GROUP BY 1, 2 ORDER BY 1, 2""")),

    // Sliding windows: every event covered by the 4 hop-aligned 1-hour
    // windows; the oracle materializes the hops explicitly.
    "sliding_window" -> Q(Analytics.slidingWindow, Some(s"""
      SELECT epoch_us(time_bucket(INTERVAL 15 MINUTE, ts)
          - k.k * INTERVAL 15 MINUTE) AS w_start_us,
        event_type, count(*) AS n_events, ${osum("value")} AS sum_value
      FROM events, (SELECT unnest(range(4)) AS k) k
      GROUP BY 1, 2 ORDER BY 1, 2""")),

    "session_window" -> Q(Analytics.sessionWindow, Some(s"""
      WITH e AS (
        SELECT user_id, event_id, ts, value,
          lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM events),
      s AS (
        SELECT *, CASE WHEN prev_ts IS NULL
            OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
          THEN 1 ELSE 0 END AS new_sess FROM e),
      g AS (
        SELECT *, sum(new_sess) OVER (PARTITION BY user_id
          ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
        FROM s)
      SELECT user_id, CAST(sess_id AS BIGINT) AS sess_id,
        count(*) AS n_events,
        epoch_us(min(ts)) AS sess_start_us,
        epoch_us(max(ts)) AS sess_end_us,
        ${osum("value")} AS sum_value
      FROM g GROUP BY 1, 2 ORDER BY 1, 2""")),

    "set_ops" -> Q(Analytics.setOps, Some("""
      SELECT c_nationkey, 'building_only' AS tag FROM (
        SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
        EXCEPT
        SELECT c_nationkey FROM customer WHERE c_mktsegment = 'MACHINERY')
      UNION ALL
      SELECT c_nationkey, 'both' AS tag FROM (
        SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
        INTERSECT
        SELECT c_nationkey FROM customer WHERE c_mktsegment = 'MACHINERY')
      ORDER BY tag, c_nationkey""")),

    "semi_join" -> Q(Analytics.semiJoin, Some("""
      SELECT c_custkey, c_name, c_mktsegment FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      ORDER BY c_custkey""")),

    "anti_join" -> Q(Analytics.antiJoin, Some("""
      SELECT c_custkey, c_name, c_mktsegment FROM customer c
      WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
        AND o.o_orderdate >= TIMESTAMP '1998-01-01')
      ORDER BY c_custkey""")),

    "asof_join" -> Q(Analytics.asofJoin, Some("""
      SELECT event_id, user_id, asof_orderkey, asof_orderdate_us FROM (
        SELECT e.event_id, e.user_id,
          o.o_orderkey AS asof_orderkey,
          epoch_us(o.o_orderdate) AS asof_orderdate_us,
          row_number() OVER (PARTITION BY e.event_id
            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        FROM events e LEFT JOIN orders o
          ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts)
      WHERE rn = 1 ORDER BY event_id""")),

    "json_extract" -> Q(Analytics.jsonExtract, Some("""
      SELECT event_type, count(*) AS n,
        CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER))
          AS BIGINT) AS sum_k,
        min(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k,
        max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
      FROM events GROUP BY 1 ORDER BY 1""")),

    "agg_distinct" -> Q(Analytics.aggDistinct, Some("""
      SELECT o_orderstatus, count(*) AS n,
        count(DISTINCT o_custkey) AS n_cust,
        count(DISTINCT o_orderpriority) AS n_prio
      FROM orders GROUP BY 1 ORDER BY 1""")),

    "grouping_sets" -> Q(Analytics.groupingSetsOrders, Some(s"""
      SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
        ${osum("o_totalprice")} AS sum_price
      FROM orders
      GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
      ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""")),

    "except_all" -> Q(Analytics.exceptAllOrders, Some("""
      SELECT o_custkey, count(*) AS n_pre98 FROM (
        SELECT o_custkey FROM orders
        EXCEPT ALL
        SELECT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1998-01-01')
      GROUP BY 1 ORDER BY 1""")),

    "json_functions" -> Q(Analytics.jsonFunctions, Some("""
      SELECT event_type,
        CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER))
          AS BIGINT) AS sum_k,
        count(json_extract_string(props, '$.k')) AS n_tuple,
        min(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k,
        max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
      FROM events GROUP BY 1 ORDER BY 1""")),

    "similarity_topk" -> Q((s, d) => Similarity.cosineTopK(s, d), Some("""
      WITH q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qe
                 FROM embeddings WHERE vec_id < 8),
      c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
      s AS (SELECT q_id, vec_id,
              list_dot_product(qe, e) /
                (sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(e, e)))
                AS score
            FROM c, q WHERE vec_id <> q_id),
      r AS (SELECT *, row_number() OVER (
              PARTITION BY q_id ORDER BY score DESC, vec_id) AS rn FROM s)
      SELECT q_id, vec_id, score, CAST(rn AS INTEGER) AS rn
      FROM r WHERE rn <= 10 ORDER BY q_id, rn""")),

    // X4e — metadata-filtered vector search (pre-filter strategy:
    // predicate pruned at the scan, exact scoring on the filtered
    // set — never a post-filtered overfetch).
    "filtered_topk" -> Q((s, d) => Similarity.filteredTopK(s, d), Some("""
      WITH q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qe
                 FROM embeddings WHERE vec_id < 8),
      c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
            FROM embeddings WHERE label % 2 = 0),
      s AS (SELECT q_id, vec_id,
              list_dot_product(qe, e) /
                (sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(e, e)))
                AS score
            FROM c, q WHERE vec_id <> q_id),
      r AS (SELECT *, row_number() OVER (
              PARTITION BY q_id ORDER BY score DESC, vec_id) AS rn FROM s)
      SELECT q_id, vec_id, score, CAST(rn AS INTEGER) AS rn
      FROM r WHERE rn <= 10 ORDER BY q_id, rn""")),

    "embedding_stats" -> Q(Similarity.embeddingStats, Some(s"""
      WITH e AS (SELECT label,
          sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                CAST(embedding AS DOUBLE[]))) AS nrm,
          CAST(embedding[1] AS DOUBLE) AS e1,
          CAST(embedding[2] AS DOUBLE) AS e2
        FROM embeddings)
      SELECT label, count(*) AS n_vecs, ${osum("nrm")} AS sum_norm,
        min(nrm) AS min_norm, max(nrm) AS max_norm,
        ${osum("e1")} AS sum_e1, ${osum("e2")} AS sum_e2
      FROM e GROUP BY 1 ORDER BY 1""")),

    "q7_volume_shipping" -> Q((s, d) => Analytics.q7VolumeShipping(s, d),
      Some(s"""
      SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
        ${osum("l.l_extendedprice*(1.0-l.l_discount)")} AS revenue,
        count(*) AS n_items
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation sn ON s.s_nationkey = sn.n_nationkey
      JOIN nation cn ON c.c_nationkey = cn.n_nationkey
      WHERE (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
         OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1')
      GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""")),

    "q10_returned_items" -> Q(Analytics.q10ReturnedItems, Some(s"""
      SELECT c.c_custkey, c.c_name, n.n_name,
        ${osum("l.l_extendedprice*(1.0-l.l_discount)")} AS revenue,
        count(*) AS n_items
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      WHERE l.l_returnflag = 'R'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        AND o.o_orderdate < TIMESTAMP '1996-04-01'
      GROUP BY 1, 2, 3 ORDER BY revenue DESC, c_custkey LIMIT 20""")),

    "q18_large_orders" -> Q((s, d) => Analytics.q18LargeOrders(s, d),
      Some(s"""
      WITH big AS (
        SELECT l_orderkey, ${osum("l_quantity")} AS sum_qty
        FROM lineitem GROUP BY 1
        HAVING ${osum("l_quantity")} > 300.0)
      SELECT c.c_custkey, c.c_name, o.o_orderkey,
        epoch_us(o.o_orderdate) AS o_orderdate_us,
        o.o_totalprice, big.sum_qty
      FROM big
      JOIN orders o ON big.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      ORDER BY big.sum_qty DESC, o.o_orderkey""")),

    // Salted two-phase aggregation: the oracle is the PLAIN group-by —
    // decimal partials re-aggregate to exactly the direct sum, which is
    // the whole point of the salting contract.
    "skew_agg" -> Q((s, d) => Analytics.skewAgg(s, d), Some(s"""
      SELECT event_type, ${osum("value")} AS sum_value,
        count(*) AS n_events
      FROM events GROUP BY 1 ORDER BY 1""")),

    // Salted join: the oracle is the PLAIN join against the same
    // literal weights dim — the salting contract is exact result
    // equivalence, whatever the key distribution.
    "skew_join" -> Q((s, d) => Analytics.skewJoin(s, d), Some(s"""
      WITH w(event_type, weight) AS (VALUES
        ('click', 1.0), ('view', 0.5), ('purchase', 10.0),
        ('signup', 5.0), ('error', 0.0))
      SELECT e.event_type,
        ${osum("e.value * w.weight")} AS weighted_value,
        count(*) AS n_events
      FROM events e JOIN w ON e.event_type = w.event_type
      GROUP BY 1 ORDER BY 1""")),

    // Dynamic partition pruning: the Spark side reads a
    // dt-partitioned store through a join whose partition list exists
    // only in the dim's rows (LayoutSpec pins the dynamicpruning
    // partition filter); the oracle runs the same semi-join on the
    // raw table — green proves the pruned scan lost nothing.
    "dpp_scan" -> Q(Layout.dppScan, Some(s"""
      WITH hot AS (
        SELECT dt FROM (
          SELECT CAST(ts AS DATE) AS dt, ${osum("value")} AS revenue
          FROM events WHERE event_type = 'purchase'
          GROUP BY 1 ORDER BY revenue DESC, dt LIMIT 3)
        WHERE revenue > 0)
      SELECT strftime(CAST(e.ts AS DATE), '%Y-%m-%d') AS day,
        count(*) AS n_events, ${osum("e.value")} AS sum_value,
        count(DISTINCT e.user_id) AS n_users
      FROM events e JOIN hot ON CAST(e.ts AS DATE) = hot.dt
      GROUP BY 1 ORDER BY 1""")),

    // Z-order clustered box scan: the Spark side prunes the
    // z-clustered store to the quadtree cells the box intersects
    // (LayoutSpec pins <=6 of 16 cells read); the oracle is the plain
    // 2-D box WHERE on the raw table.
    "zorder_box" -> Q(Layout.zorderBox, Some(s"""
      WITH b AS (SELECT min(CAST(ts AS DATE)) AS d0,
        min(user_id) AS umin, max(user_id) AS umax FROM events)
      SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
        count(*) AS n_events, ${osum("value")} AS sum_value
      FROM events, b
      WHERE user_id BETWEEN b.umin + (b.umax - b.umin + 1) // 4
          AND b.umin + (b.umax - b.umin + 1) // 2 - 1
        AND CAST(ts AS DATE) BETWEEN b.d0 + 9 AND b.d0 + 18
      GROUP BY 1 ORDER BY 1""")),

    // Bloom-filter semi-join reduction: the oracle is the PLAIN
    // region-filtered supplier join — bloom pre-filtering must be
    // lossless (no false negatives; false positives die in the join).
    "bloom_join" -> Q(JoinReduction.bloomJoin, Some(s"""
      SELECT n.n_name,
        ${osum("l.l_extendedprice * (1.0 - l.l_discount)")} AS revenue,
        count(*) AS n_lines
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'ASIA'
      GROUP BY 1 ORDER BY 1""")),

    // Format roundtrips: write orders through ORC / JSON-lines, read
    // back, aggregate; oracle aggregates the ORIGINAL parquet — green
    // means the format path preserved content exactly.
    "orc_roundtrip" -> Q(Formats.orcRoundtrip, Some(formatOracle)),
    "json_roundtrip" -> Q(Formats.jsonRoundtrip, Some(formatOracle)),
    "csv_roundtrip" -> Q(Formats.csvRoundtrip, Some(formatOracle)),

    // S6 — binaryFile source: per-document fixture files written
    // executor-side, read back through the binary-directory scan,
    // featurized as (id-from-path, byte length, content md5). Oracle
    // recomputes both from the documents table — green proves the
    // write → binary scan round trip is byte-exact (testdata text is
    // ASCII, pinned by TablesSchemaSpec, so octet_length(encode()) is
    // the exact byte count).
    "binary_ingest" -> Q(Formats.binaryIngest, Some("""
      SELECT doc_id,
        CAST(octet_length(encode(text)) AS BIGINT) AS length,
        md5(text) AS content_md5
      FROM documents ORDER BY doc_id""")),

    // X93 — content-type sniffing over the committed binary fixture:
    // magic-byte detection vs what the extension promises, rolled up
    // per detected type. Both CASE chains generate from the shared
    // MagicTypes/ExtTypes constants; both engines read the same bytes
    // on disk (the robots_rules fixture pattern).
    "mime_sniff" -> Q((s, d) => Formats.mimeSniff(s, d), Some {
      val det = Formats.MagicTypes.map { case (p, tp) =>
        s"WHEN starts_with(px, '$p') THEN '$tp'"
      }.mkString(" ")
      val prom = Formats.ExtTypes.map { case (e, tp) =>
        s"WHEN ext = '$e' THEN '$tp'"
      }.mkString(" ")
      s"""
      WITH f AS (SELECT
          CAST(octet_length(content) AS BIGINT) AS length,
          left(hex(content), 16) AS px,
          lower(regexp_extract(filename, '\\.([A-Za-z0-9]+)$$', 1))
            AS ext
        FROM read_blob('${Formats.BinmixDir}/*')
        -- Spark's binaryFile source silently skips ZERO-BYTE files;
        -- the fixture plants one (empty.jpg) and MultimodalSpec pins
        -- the skip — the oracle matches the source's visible set
        WHERE octet_length(content) > 0),
      c AS (SELECT length,
          CASE $det ELSE 'unknown' END AS detected,
          CASE $prom ELSE 'unknown' END AS promised
        FROM f)
      SELECT detected, count(*) AS n_files,
        CAST(sum(length) AS BIGINT) AS n_bytes,
        CAST(sum(CASE WHEN promised <> detected THEN 1 ELSE 0 END)
          AS BIGINT) AS n_ext_mismatch
      FROM c GROUP BY 1 ORDER BY 1"""
    }),

    // X106 — exact binary dedup over the asset dir: same bytes under
    // different names collapse. Spark keys groups on the raw-byte
    // md5 (no hex copy in the scan projection); DuckDB 1.0.0 has no
    // binary md5, so the oracle groups by the blob itself — the
    // digest is an internal key, groups are identified by canonical.
    "asset_dedup" -> Q((s, d) => Formats.assetDedup(s, d), Some {
      val det = Formats.MagicTypes.map { case (p, tp) =>
        s"WHEN starts_with(px, '$p') THEN '$tp'"
      }.mkString(" ")
      s"""
      WITH f AS (SELECT
          content,
          CAST(octet_length(content) AS BIGINT) AS length,
          left(hex(content), 16) AS px,
          regexp_extract(filename, '([^/]+)$$', 1) AS name
        FROM read_blob('${Formats.BinmixDir}/*')
        WHERE octet_length(content) > 0),
      c AS (SELECT content, length, name,
          CASE $det ELSE 'unknown' END AS detected
        FROM f)
      SELECT min(detected) AS detected,
        count(*) AS n_files,
        CAST(sum(length) AS BIGINT) AS n_bytes,
        array_to_string(list_sort(array_agg(name)), '+') AS files,
        min(name) AS canonical
      FROM c GROUP BY content HAVING count(*) >= 2
      ORDER BY canonical"""
    }),

    // X106b — PERCEPTUAL media near-dup: dHash (9×8 nearest-neighbor
    // grid, horizontal-neighbor bits) over REAL decoded PPM pixels,
    // banded 16-bit-chunk Hamming join (the simhash machinery). The
    // oracle re-derives every pixel from the generating document text
    // (the media_embed_topk pattern), including the planted 2×-upscale
    // and +4-brightness re-encode twins whose BYTES differ (exact
    // asset_dedup misses them) but whose hashes pair at hamming 0.
    "media_neardup" -> Q(
      (s, d) => MediaNeardup.mediaNeardup(s, d), Some {
        import MediaNeardup._
        s"""
      WITH $mediaDhashCtes,
      ${mediaPairCtes()}
      SELECT id_a, id_b, hamming FROM hm
      WHERE hamming <= $HammingMax ORDER BY id_a, id_b"""
      }),

    // X106d — media canonical consolidation: connected components
    // over the X106b pair relation (recursive-CTE walk, string ids
    // labeled by their lexicographic minimum — the host_clusters
    // convention), singletons emitted as 1-member groups so the
    // output is a full asset manifest with the keeper per group.
    "media_canonical" -> Q(
      (s, d) => MediaNeardup.mediaCanonical(s, d), Some {
        import MediaNeardup._
        s"""
      WITH RECURSIVE $mediaDhashCtes,
      ${mediaPairCtes()},
      mnp AS (SELECT id_a, id_b FROM hm
        WHERE hamming <= $HammingMax),
      edges AS (SELECT id_a AS s, id_b AS d FROM mnp
        UNION SELECT id_b, id_a FROM mnp),
      walk AS (
        SELECT s, d FROM edges
        UNION
        SELECT w.s, e.d FROM walk w JOIN edges e ON w.d = e.s),
      lbl AS (SELECT s AS id, least(s, min(d)) AS group_id
        FROM walk GROUP BY s),
      g AS (SELECT sg.id, COALESCE(l.group_id, sg.id) AS group_id
        FROM sig sg LEFT JOIN lbl l ON sg.id = l.id)
      SELECT group_id, min(id) AS canonical,
        count(*) AS n_members,
        array_to_string(list_sort(array_agg(id)), '+') AS members
      FROM g GROUP BY 1 ORDER BY 1"""
      }),

    // X106e — the media dedup-apply twin: the X106d manifest EXECUTED
    // against the asset store (retire-then-link consolidation) and
    // the persisted signature index (file-granular rewrite minus the
    // dropped ids). The engine reads the manifest BACK from the
    // written store; the oracle re-derives every expected count from
    // the dHash chain, so a wrong write hash-fails on arithmetic.
    "media_apply" -> Q(
      (s, d) => MediaNeardup.mediaApply(s, d), Some {
        import MediaNeardup._
        s"""
      WITH RECURSIVE $mediaDhashCtes,
      ${mediaPairCtes()},
      mnp AS (SELECT id_a, id_b FROM hm
        WHERE hamming <= $HammingMax),
      edges AS (SELECT id_a AS s, id_b AS d FROM mnp
        UNION SELECT id_b, id_a FROM mnp),
      walk AS (
        SELECT s, d FROM edges
        UNION
        SELECT w.s, e.d FROM walk w JOIN edges e ON w.d = e.s),
      lbl AS (SELECT s AS id, least(s, min(d)) AS group_id
        FROM walk GROUP BY s),
      dr AS (SELECT id FROM lbl WHERE id <> group_id),
      cls AS (SELECT id, CASE
          WHEN regexp_matches(id, '_up$$') THEN 'up'
          WHEN regexp_matches(id, '_br$$') THEN 'br'
          ELSE 'base' END AS asset_class
        FROM sig),
      b AS (SELECT asset_class, count(*) AS n_before FROM cls
        GROUP BY 1),
      r AS (SELECT asset_class, count(*) AS n_removed
        FROM cls SEMI JOIN dr USING (id) GROUP BY 1)
      SELECT b.asset_class, b.n_before,
        CAST(COALESCE(r.n_removed, 0) AS BIGINT) AS n_removed,
        CAST(b.n_before - COALESCE(r.n_removed, 0) AS BIGINT)
          AS n_after,
        CAST(CASE WHEN b.asset_class = 'base'
          THEN b.n_before - COALESCE(r.n_removed, 0) ELSE 0 END
          AS BIGINT) AS n_indexed_after
      FROM b LEFT JOIN r USING (asset_class)
      ORDER BY asset_class"""
      }),

    // X109a — WAV audio ingest: real RIFF/PCM decode over the
    // generated clip store (base + planted resample/gain variants);
    // per-clip integer stats (parsed rate, sample count, integer-ms
    // duration, amplitude min/max/sum) the oracle re-derives from the
    // generating document text.
    "audio_ingest" -> Q(
      (s, d) => AudioNeardup.audioIngest(s, d), Some(s"""
      WITH $audioStoreCtes,
      sm AS (SELECT id, rate, ns, unnest(range(0, ns)) AS i,
          text, rs, gn
        FROM ai),
      sv AS (SELECT id, rate, ns, ${audioSampleSql("i")} AS v FROM sm)
      SELECT id, rate AS sample_rate, CAST(ns AS BIGINT) AS n_samples,
        CAST(ns * 1000 // rate AS BIGINT) AS duration_ms,
        CAST(min(v) AS BIGINT) AS amp_min,
        CAST(max(v) AS BIGINT) AS amp_max,
        CAST(sum(v) AS BIGINT) AS amp_sum
      FROM sv GROUP BY id, rate, ns ORDER BY id""")),

    // X109b — perceptual audio near-dup: the 1-D dHash analog (65
    // point-sampled amplitudes → 64 comparison bits) through the
    // SHARED banded Hamming pair engine; the planted 2×-resample and
    // 2×-gain re-encodes pair with their base at hamming 0 while
    // byte-exact dedup provably misses them.
    "audio_neardup" -> Q(
      (s, d) => AudioNeardup.audioNeardup(s, d), Some {
        import AudioNeardup._
        s"""
      WITH $audioStoreCtes,
      $audioSigCtes,
      ${mediaPairCtes("asig")}
      SELECT id_a, id_b, hamming FROM hm
      WHERE hamming <= $HammingMax ORDER BY id_a, id_b"""
      }),

    // X110a — Y4M video ingest: real stream-header + planar-frame
    // decode over the generated clip store (base + planted temporal/
    // brightness variants); per-clip integer stats the oracle
    // re-derives from the generating document text.
    "video_ingest" -> Q(
      (s, d) => VideoNeardup.videoIngest(s, d), Some(s"""
      WITH $videoStoreCtes,
      vfp AS (SELECT id, text, w0, h0, nf, rt, br, cl,
          unnest(range(0, nf)) AS f
        FROM vi),
      vpx AS (SELECT id, ${videoYSql("f", "i")} AS y
        FROM (SELECT *, unnest(range(0, w0 * h0)) AS i FROM vfp)),
      vs AS (SELECT id, CAST(sum(y) AS BIGINT) AS y_sum FROM vpx
        GROUP BY 1)
      SELECT vi.id, vi.w0 AS width, vi.h0 AS height,
        CAST(vi.nf AS INT) AS n_frames, vi.fnum AS fps_num,
        vi.fden AS fps_den,
        CAST(vi.nf * 1000 * vi.fden // vi.fnum AS BIGINT)
          AS duration_ms,
        vs.y_sum
      FROM vi JOIN vs USING (id) ORDER BY id""")),

    // X110b — FRAME SAMPLING: three sampled frames per clip (first /
    // temporal middle / last), per-frame luma stats + the frame's
    // 64-bit luma dHash — the multimodal frame-extract stage with a
    // typed row per frame; the temporal variant's sampled CONTENT
    // maps to the base's frames by construction.
    "video_frames" -> Q(
      (s, d) => VideoNeardup.videoFrames(s, d), Some(s"""
      WITH $videoStoreCtes,
      vsf AS (SELECT id, text, w0, h0, rt, br, cl,
          unnest(['first', 'mid', 'last']) AS pos,
          unnest([0, nf // 2, nf - 1]) AS fi
        FROM vi),
      vst AS (SELECT id, pos, fi,
          CAST(min(y) AS BIGINT) AS y_min,
          CAST(max(y) AS BIGINT) AS y_max,
          CAST(sum(y) AS BIGINT) AS y_sum
        FROM (SELECT id, pos, fi, ${videoYSql("fi", "i")} AS y
          FROM (SELECT *, unnest(range(0, w0 * h0)) AS i FROM vsf))
        GROUP BY 1, 2, 3),
      ${videoDhashCtes("vsf", "vf", Seq("id", "pos", "fi"))}
      SELECT vst.id, vst.pos, CAST(vst.fi AS INT) AS frame_idx,
        vst.y_min, vst.y_max, vst.y_sum, vfsig.dh_lo, vfsig.dh_hi
      FROM vst JOIN vfsig USING (id, pos, fi)
      ORDER BY id, frame_idx, pos""")),

    // X110c — keyframe perceptual near-dup: the temporal-middle
    // frame's luma dHash through the SHARED banded Hamming engine;
    // the planted 2×-temporal and +4-brightness re-encodes pair with
    // their base at hamming 0 while byte-exact dedup provably misses
    // them.
    "video_neardup" -> Q(
      (s, d) => VideoNeardup.videoNeardup(s, d), Some {
        import VideoNeardup._
        s"""
      WITH $videoStoreCtes,
      vmf AS (SELECT id, text, w0, h0, rt, br, cl, nf // 2 AS fi
        FROM vi),
      ${videoDhashCtes("vmf", "vm", Seq("id"))},
      vsig AS (SELECT id, dh_lo, dh_hi FROM vmsig),
      ${mediaPairCtes("vsig")}
      SELECT id_a, id_b, hamming FROM hm
      WHERE hamming <= $HammingMax ORDER BY id_a, id_b"""
      }),

    // X110d — temporal SUBCLIP near-dup: clips sharing most of the
    // smaller side's consecutive-frame-hash shingles. The channel
    // that closes the keyframe path's temporal blind spot: the
    // planted leading-trim `_cl` re-edits (which `video_neardup`'s
    // middle-frame hash structurally misses) hit containment 1.0,
    // and the `_rt`/`_br` classes are subsumed.
    "video_subclip" -> Q(
      (s, d) => VideoNeardup.videoSubclip(s, d), Some {
        import VideoNeardup._
        s"""
      WITH $videoStoreCtes,
      $videoShingleCtes
      SELECT id_a, id_b, shared,
        CAST(shared AS DOUBLE) / least(na.n_sh, nb.n_sh) AS containment
      FROM pr JOIN nsh na ON pr.id_a = na.id
        JOIN nsh nb ON pr.id_b = nb.id
      WHERE CAST(shared AS DOUBLE) / least(na.n_sh, nb.n_sh)
        >= $MinContain
      ORDER BY id_a, id_b"""
      }),

    // X110e — video canonical consolidation: components over the
    // UNION of the keyframe and subclip channels (recursive-CTE
    // walk, the media_canonical convention), keeper elected by the
    // modality's own rule — LONGEST decoded duration, tie → min id
    // (in a subclip group the superclip carries the trim's entire
    // content). Singletons emitted: a full clip manifest.
    "video_canonical" -> Q(
      (s, d) => VideoNeardup.videoCanonical(s, d), Some {
        import VideoNeardup._
        s"""
      WITH RECURSIVE $videoStoreCtes,
      $videoShingleCtes,
      scp AS (SELECT id_a, id_b
        FROM pr JOIN nsh na ON pr.id_a = na.id
          JOIN nsh nb ON pr.id_b = nb.id
        WHERE CAST(shared AS DOUBLE) / least(na.n_sh, nb.n_sh)
          >= $MinContain),
      vmf AS (SELECT id, text, w0, h0, rt, br, cl, nf // 2 AS fi
        FROM vi),
      ${videoDhashCtes("vmf", "vm", Seq("id"))},
      vsig AS (SELECT id, dh_lo, dh_hi FROM vmsig),
      ${mediaPairCtes("vsig")},
      knp AS (SELECT id_a, id_b FROM hm
        WHERE hamming <= $HammingMax),
      allp AS (SELECT * FROM scp UNION SELECT * FROM knp),
      edges AS (SELECT id_a AS s, id_b AS d FROM allp
        UNION SELECT id_b, id_a FROM allp),
      walk AS (
        SELECT s, d FROM edges
        UNION
        SELECT w.s, e.d FROM walk w JOIN edges e ON w.d = e.s),
      lbl AS (SELECT s AS id, least(s, min(d)) AS group_id
        FROM walk GROUP BY s),
      g AS (SELECT vi.id,
          vi.nf * 1000 * vi.fden // vi.fnum AS dur,
          COALESCE(l.group_id, vi.id) AS group_id
        FROM vi LEFT JOIN lbl l ON vi.id = l.id),
      k AS (SELECT group_id, id AS canonical FROM g
        QUALIFY row_number() OVER (PARTITION BY group_id
          ORDER BY dur DESC, id) = 1),
      a AS (SELECT group_id, count(*) AS n_members,
          array_to_string(list_sort(array_agg(id)), '+') AS members
        FROM g GROUP BY 1)
      SELECT a.group_id, k.canonical, a.n_members, a.members
      FROM a JOIN k USING (group_id) ORDER BY group_id"""
      }),

    // X106c — incremental perceptual probe: the incoming re-encode
    // batch's dHash signatures (the variant assets, decoded
    // batch-side only) against the persisted base-asset index; same
    // shared sig chain, banded join with the index side
    // MaxBucket-capped (ADVICE r15: the batch bound bounds only one
    // side — a flat-image mega-bucket in the corpus must not fan
    // every probe out), exact Hamming filter. The oracle is SHARED
    // with the X106f streaming twin (byte-equal by construction —
    // both run MediaNeardup.probeAgainstIndex).
    "media_neardup_probe" -> Q(
      (s, d) => MediaNeardup.mediaNeardupProbe(s, d),
      Some(mediaProbeOracle)),

    // X106f — streaming media ingest: variant assets land as REAL
    // files in two arrivals (binaryFile file-stream source); each
    // micro-batch decodes batch-side only and probes the persisted
    // signature index, verdicts accumulating idempotently per
    // batch_id — byte-equal to the batch probe, same oracle.
    "media_probe_stream" -> Q(
      (s, d) => graft.streaming.MediaStream.mediaProbeStreamQuery(s, d),
      Some(mediaProbeOracle)),


    // Parquet schema evolution: two file generations (one without the
    // o_totalprice column) merged by a mergeSchema read; oracle splits
    // the ORIGINAL parquet the same even/odd way.
    "schema_evolution" -> Q(Formats.schemaEvolution, Some(s"""
      SELECT count(*) AS n_rows,
        count(CASE WHEN o_orderkey % 2 <> 0 THEN o_totalprice END)
          AS n_evolved,
        CAST(sum(o_custkey) AS BIGINT) AS custkey_sum,
        ${osum("CASE WHEN o_orderkey % 2 <> 0 THEN o_totalprice END")}
          AS evolved_price_sum
      FROM orders""")),

    // CDC snapshot diff of the two committed fixture days: full-outer
    // join on the pk, null-safe payload compare (id 11's NULL bal),
    // insert/update/delete classification.
    "snapshot_diff" -> Q(Inspect.fixtureDayDiff, Some(s"""
      WITH o AS (SELECT id, name, city, bal
          FROM read_csv('${Ingest.FixtureDir}/inbound/sap/customers/customers_20240628.csv',
            header=true, columns={'id':'INTEGER','name':'VARCHAR',
            'city':'VARCHAR','bal':'DOUBLE','junk':'VARCHAR'})),
        n AS (SELECT id, name, city, bal
          FROM read_csv('${Ingest.FixtureDir}/inbound/sap/customers/customers_20240629.csv',
            header=true, columns={'id':'INTEGER','name':'VARCHAR',
            'city':'VARCHAR','bal':'DOUBLE','junk':'VARCHAR'}))
      SELECT coalesce(o.id, n.id) AS id,
        CASE WHEN o.id IS NULL THEN 'insert'
          WHEN n.id IS NULL THEN 'delete' ELSE 'update' END AS change_type,
        o.name AS old_name, n.name AS new_name,
        o.city AS old_city, n.city AS new_city,
        o.bal AS old_bal, n.bal AS new_bal
      FROM o FULL JOIN n ON o.id = n.id
      WHERE o.id IS NULL OR n.id IS NULL
        OR NOT (o.name IS NOT DISTINCT FROM n.name
          AND o.city IS NOT DISTINCT FROM n.city
          AND o.bal IS NOT DISTINCT FROM n.bal)
      ORDER BY id""")),

    // Incremental aggregate maintenance: three persisted merge steps;
    // oracle = FULL recompute — green proves batch boundaries are
    // invisible (decimal state makes the merge exactly associative).
    "incremental_rollup" -> Q(Incremental.incrementalRollup, Some(s"""
      SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS n_events,
        ${osum("value")} AS sum_value
      FROM events GROUP BY 1, 2 ORDER BY 1, 2""")),

    // FK integrity audit: the oracle keeps one correlated NOT EXISTS
    // per relation; the Spark side is the one-scan-per-fact-table
    // flags-and-conditional-sums decorrelation.
    "fk_violations" -> Q(Inspect.fkViolations, Some("""
      SELECT 'lineitem->orders' AS relation, count(*) AS n_orphans
      FROM lineitem l WHERE NOT EXISTS (
        SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
      UNION ALL
      SELECT 'lineitem->part', count(*) FROM lineitem l
      WHERE NOT EXISTS (
        SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
      UNION ALL
      SELECT 'lineitem->supplier', count(*) FROM lineitem l
      WHERE NOT EXISTS (
        SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey)
      UNION ALL
      SELECT 'orders->customer', count(*) FROM orders o
      WHERE NOT EXISTS (
        SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
      ORDER BY relation""")),

    // Fixed-width histogram: floor of a double division buckets
    // identically in both engines.
    "price_histogram" -> Q(Inspect.priceHistogram, Some(s"""
      SELECT CAST(floor(o_totalprice / 25000.0) AS BIGINT) AS bucket,
        count(*) AS n, ${osum("o_totalprice")} AS sum_value
      FROM orders GROUP BY 1 ORDER BY 1""")),

    // One-pass per-column table profile (exact distincts; min/max as
    // strings — non-double columns only, engines render doubles
    // differently).
    "table_profile" -> Q(Inspect.ordersProfile, Some("""
      SELECT 'o_custkey' AS column_name, count(*) AS n_rows,
        count(*) - count(o_custkey) AS n_nulls,
        count(DISTINCT o_custkey) AS n_distinct,
        CAST(min(o_custkey) AS VARCHAR) AS min_val,
        CAST(max(o_custkey) AS VARCHAR) AS max_val FROM orders
      UNION ALL
      SELECT 'o_orderkey', count(*), count(*) - count(o_orderkey),
        count(DISTINCT o_orderkey), CAST(min(o_orderkey) AS VARCHAR),
        CAST(max(o_orderkey) AS VARCHAR) FROM orders
      UNION ALL
      SELECT 'o_orderpriority', count(*), count(*) - count(o_orderpriority),
        count(DISTINCT o_orderpriority), min(o_orderpriority),
        max(o_orderpriority) FROM orders
      UNION ALL
      SELECT 'o_orderstatus', count(*), count(*) - count(o_orderstatus),
        count(DISTINCT o_orderstatus), min(o_orderstatus),
        max(o_orderstatus) FROM orders
      ORDER BY column_name""")),

    // HLL twin of table_profile, gate form: the sketch estimate is
    // engine-specific, but its ERROR CONTRACT is deterministic — the
    // query computes exact distinct + sketch in one aggregate and
    // emits the bound verdict as a boolean, so the oracle checks the
    // exact profile AND that the sketch held its guarantee. The pure
    // Expand-free serving form stays Inspect.ordersProfileApprox,
    // error-bounded in InspectSpec.
    "table_profile_approx" -> Q(Inspect.ordersProfileApproxGate, Some("""
      SELECT 'o_custkey' AS column_name, count(*) AS n_rows,
        count(*) - count(o_custkey) AS n_nulls,
        count(DISTINCT o_custkey) AS n_distinct,
        CAST(min(o_custkey) AS VARCHAR) AS min_val,
        CAST(max(o_custkey) AS VARCHAR) AS max_val,
        true AS approx_ok FROM orders
      UNION ALL
      SELECT 'o_orderkey', count(*), count(*) - count(o_orderkey),
        count(DISTINCT o_orderkey), CAST(min(o_orderkey) AS VARCHAR),
        CAST(max(o_orderkey) AS VARCHAR), true FROM orders
      UNION ALL
      SELECT 'o_orderpriority', count(*),
        count(*) - count(o_orderpriority),
        count(DISTINCT o_orderpriority), min(o_orderpriority),
        max(o_orderpriority), true FROM orders
      UNION ALL
      SELECT 'o_orderstatus', count(*), count(*) - count(o_orderstatus),
        count(DISTINCT o_orderstatus), min(o_orderstatus),
        max(o_orderstatus), true FROM orders
      ORDER BY column_name""")),

    // Declarative one-pass data-quality audit: six expectations over
    // orders computed in a single aggregate; oracle recomputes every
    // metric independently.
    "dq_audit" -> Q(Inspect.ordersDqAudit, Some("""
      WITH a AS (
        SELECT
          CASE WHEN count(*) >= 1 THEN 0 ELSE 1 END AS m_nonempty,
          count(*) - count(DISTINCT o_orderkey) AS m_pk,
          count(*) - count(o_totalprice) AS m_complete,
          sum(CASE WHEN o_totalprice <= 0.0 THEN 1 ELSE 0 END) AS m_pos,
          sum(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END)
            AS m_status,
          sum(CASE WHEN CAST(o_orderdate AS DATE) < DATE '1990-01-01'
            OR CAST(o_orderdate AS DATE) > DATE '2005-12-31'
            THEN 1 ELSE 0 END) AS m_date,
          count(*) - count(o_orderdate) AS m_date_complete
        FROM orders),
      u AS (
        SELECT 'a_nonempty' AS check_name, CAST(m_nonempty AS DOUBLE) AS metric FROM a
        UNION ALL SELECT 'b_pk_unique', CAST(m_pk AS DOUBLE) FROM a
        UNION ALL SELECT 'c_price_complete', CAST(m_complete AS DOUBLE) FROM a
        UNION ALL SELECT 'd_price_positive', CAST(m_pos AS DOUBLE) FROM a
        UNION ALL SELECT 'e_status_domain', CAST(m_status AS DOUBLE) FROM a
        UNION ALL SELECT 'f_date_envelope', CAST(m_date AS DOUBLE) FROM a
        UNION ALL SELECT 'g_date_complete', CAST(m_date_complete AS DOUBLE) FROM a)
      SELECT check_name, metric, CAST(0 AS DOUBLE) AS threshold,
        metric <= 0 AS pass
      FROM u ORDER BY check_name""")),

    // X94 — event-volume anomaly detection: per-(type, day) counts
    // z-scored against the type's own daily series. mean/var from
    // exact integer sums (Σn, Σn², k) so every double op is
    // IEEE-exact; var>0 guarded BEFORE sqrt (NaN comparison semantics
    // differ across engines). Every bucket kept (monitoring series).
    "event_anomaly" -> Q((s, d) => Inspect.eventAnomaly(s, d), Some(s"""
      WITH b AS (SELECT event_type, date_trunc('day', ts) AS day,
          count(*) AS n
        FROM events GROUP BY 1, 2),
      s AS (SELECT event_type, count(*) AS k, sum(n) AS sn,
          sum(CAST(n AS HUGEINT) * n) AS snn
        FROM b GROUP BY 1),
      j AS (SELECT b.event_type, b.day, b.n,
          CAST(s.sn AS DOUBLE) / CAST(s.k AS DOUBLE) AS mean,
          (CAST(s.snn AS DOUBLE) / CAST(s.k AS DOUBLE)) -
            ((CAST(s.sn AS DOUBLE) / CAST(s.k AS DOUBLE)) *
             (CAST(s.sn AS DOUBLE) / CAST(s.k AS DOUBLE))) AS vr
        FROM b JOIN s USING (event_type)),
      z AS (SELECT *, CASE WHEN vr > 0.0
          THEN (CAST(n AS DOUBLE) - mean) / sqrt(vr)
          ELSE 0.0 END AS z
        FROM j)
      SELECT event_type, epoch_us(day) AS day_us, n, mean, z,
        (vr > 0.0 AND abs(z) >= ${Inspect.AnomalyZ}) AS is_anomaly
      FROM z ORDER BY event_type, day_us""")),

    // Per-window data-quality monitor, batch twin of the streaming
    // form (StreamingSpec pins stream == batch); oracle recomputes the
    // violation counts per hour window.
    "dq_window" -> Q((s, d) =>
      graft.streaming.StreamingOps
        .dqWindow(graft.util.Tables.t(s, d, "events"))
        .orderBy("w_start_us"),
      Some(s"""
      SELECT epoch_us(date_trunc('hour', ts)) AS w_start_us,
        count(*) AS n_events,
        CAST(sum(CASE WHEN value <= 0.0 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_nonpositive,
        CAST(sum(CASE WHEN event_type NOT IN
          ('click','view','purchase','signup','error')
          THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_type,
        CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS n_null_user
      FROM events GROUP BY 1 ORDER BY 1""")),

    // Stream-stream interval-join twin, run in batch mode: same code,
    // same plan shape (equi key + time residual), oracle = the interval
    // self-join in SQL. StreamJoinSpec pins batch/stream parity.
    "click_attribution" -> Q((s, d) =>
      graft.streaming.StreamingOps
        .clickViewAttribution(graft.util.Tables.t(s, d, "events"))
        .orderBy("click_id", "view_id"),
      Some("""
      SELECT c.user_id, c.event_id AS click_id, v.event_id AS view_id,
        epoch_us(v.ts) - epoch_us(c.ts) AS lag_us, v.value AS view_value
      FROM events c JOIN events v ON c.user_id = v.user_id
      WHERE c.event_type = 'click' AND v.event_type = 'view'
        AND v.ts >= c.ts AND v.ts <= c.ts + INTERVAL 10 MINUTE
      ORDER BY click_id, view_id""")),

    // Bucketed co-located join: pay the partitioning at write time,
    // join with zero shuffle at read time (BucketingSpec pins the
    // exchange-free plan); contents — and thus the oracle — are
    // bucketing-invariant.
    "bucketed_join" -> Q(Bucketing.bucketedJoin, Some(s"""
      SELECT o_orderpriority, o_orderstatus, count(*) AS n_items,
        ${osum("l_extendedprice*(1.0-l_discount)")} AS revenue,
        ${osum("l_quantity")} AS sum_qty
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1, 2 ORDER BY 1, 2""")),

    "q13_order_dist" -> Q(Analytics.q13OrderDist, Some("""
      WITH pc AS (
        SELECT o_custkey, count(*) AS cnt FROM orders
        WHERE o_orderpriority <> '1-URGENT' GROUP BY 1),
      j AS (
        SELECT COALESCE(pc.cnt, 0) AS c_count
        FROM customer LEFT JOIN pc ON c_custkey = o_custkey)
      SELECT c_count, count(*) AS custdist
      FROM j GROUP BY 1 ORDER BY custdist DESC, c_count DESC""")),

    "q22_dormant_rich" -> Q((s, d) => Analytics.q22DormantRich(s, d),
      Some(s"""
      WITH pos AS (
        SELECT sum(CAST(c_acctbal AS DECIMAL(12,2))) AS sum_pos,
          CAST(count(*) AS DECIMAL(10,0)) AS n_pos
        FROM customer WHERE c_acctbal > 0),
      d AS (
        SELECT c.c_nationkey, c.c_acctbal FROM customer c
        WHERE NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey
            AND o.o_orderdate >= TIMESTAMP '1999-01-01'))
      SELECT c_nationkey, count(*) AS n_cust,
        ${osum("c_acctbal")} AS total_bal
      FROM d, pos
      WHERE CAST(c_acctbal AS DECIMAL(12,2)) * n_pos > sum_pos
      GROUP BY 1 ORDER BY 1""")),

    // Remaining TPC-H shapes over the trimmed schemas (QueryShapes
    // scaladoc explains each adaptation; no partsupp table, lateness is
    // l_shipdate vs o_orderdate). Oracles keep the spec's correlated /
    // EXISTS formulations where the Spark side decorrelates, so a green
    // row proves the rewrite, not just the arithmetic.
    "q6_forecast" -> Q(QueryShapes.q6Forecast, Some(s"""
      SELECT ${osum("l_extendedprice*l_discount")} AS revenue,
        count(*) AS n_lines
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
        AND l_discount BETWEEN 0.05 AND 0.07
        AND l_quantity < 24""")),

    "q4_priority_check" -> Q(QueryShapes.q4PriorityCheck, Some("""
      SELECT o_orderpriority, count(*) AS order_count
      FROM orders o
      WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
        AND o.o_orderdate < TIMESTAMP '1996-07-01'
        AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
      GROUP BY 1 ORDER BY 1""")),

    "q8_market_share" -> Q((s, d) => QueryShapes.q8MarketShare(s, d),
      Some(s"""
      SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
        ${osum("CASE WHEN sn.n_name = 'NATION_2' " +
          "THEN l.l_extendedprice*(1.0-l.l_discount) ELSE 0.0 END")}
          / ${osum("l.l_extendedprice*(1.0-l.l_discount)")} AS mkt_share
      FROM lineitem l
      JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = 'PROMO'
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation cn ON c.c_nationkey = cn.n_nationkey
      JOIN region r ON cn.n_regionkey = r.r_regionkey AND r.r_name = 'ASIA'
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation sn ON s.s_nationkey = sn.n_nationkey
      WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
        AND o.o_orderdate < TIMESTAMP '1998-01-01'
      GROUP BY 1 ORDER BY 1""")),

    "q12_late_lines" -> Q(QueryShapes.q12LateLines, Some("""
      SELECT l_returnflag,
        count(*) FILTER (WHERE o_orderpriority IN ('1-URGENT','2-HIGH'))
          AS high_line_count,
        count(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT','2-HIGH'))
          AS low_line_count
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
        AND l.l_shipdate < TIMESTAMP '1998-01-01'
        AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
      GROUP BY 1 ORDER BY 1""")),

    "q14_promo_effect" -> Q(QueryShapes.q14PromoEffect, Some(s"""
      SELECT (100.0 * ${osum("CASE WHEN p.p_type = 'PROMO' " +
          "THEN l.l_extendedprice*(1.0-l.l_discount) ELSE 0.0 END")})
          / ${osum("l.l_extendedprice*(1.0-l.l_discount)")} AS promo_revenue
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE l.l_shipdate >= TIMESTAMP '1997-03-01'
        AND l.l_shipdate < TIMESTAMP '1997-04-01'""")),

    "q15_top_supplier" -> Q(QueryShapes.q15TopSupplier, Some(s"""
      WITH rev AS (
        SELECT l_suppkey,
          ${osum("l_extendedprice*(1.0-l_discount)")} AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1997-04-01'
        GROUP BY 1)
      SELECT s.s_suppkey, s.s_name, rev.total_revenue
      FROM supplier s JOIN rev ON s.s_suppkey = rev.l_suppkey
      WHERE rev.total_revenue = (SELECT max(total_revenue) FROM rev)
      ORDER BY s.s_suppkey""")),

    // Oracle keeps the CORRELATED per-part average (threshold ordered
    // (sum/count)*0.2 exactly like davg(qty)*0.2 on the Spark side).
    "q17_small_qty" -> Q((s, d) => QueryShapes.q17SmallQty(s, d), Some(s"""
      WITH brand_parts AS (
        SELECT p_partkey FROM part
        WHERE p_brand = 'Brand#1' AND p_size <= 25),
      thr AS (
        SELECT l_partkey,
          (${osum("l_quantity")} / count(*)) * 0.2 AS qty_thr
        FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM brand_parts)
        GROUP BY 1)
      SELECT ${osum("l.l_extendedprice")} / 7.0 AS avg_yearly,
        count(*) AS n_lines
      FROM lineitem l
      JOIN thr ON l.l_partkey = thr.l_partkey
      WHERE l.l_quantity < thr.qty_thr""")),

    "q19_disjunctive" -> Q(QueryShapes.q19Disjunctive, Some(s"""
      SELECT ${osum("l.l_extendedprice*(1.0-l.l_discount)")} AS revenue,
        count(*) AS n_lines
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 10
          AND l.l_quantity BETWEEN 1 AND 20)
         OR (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 10 AND 25
          AND l.l_quantity BETWEEN 10 AND 30)
         OR (p.p_brand = 'Brand#20' AND p.p_size BETWEEN 20 AND 40
          AND l.l_quantity BETWEEN 20 AND 40)""")),

    // Oracle keeps the spec's double correlated EXISTS / NOT EXISTS;
    // the Spark side is the decorrelated grouped-pass rewrite.
    "q21_waiting_supplier" -> Q(QueryShapes.q21WaitingSupplier, Some("""
      SELECT s.s_name, count(*) AS numwait
      FROM supplier s
      JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
      JOIN orders o ON o.o_orderkey = l1.l_orderkey
      WHERE o.o_orderstatus = 'F'
        AND l1.l_shipdate > o.o_orderdate + INTERVAL 365 DAY
        AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > o.o_orderdate + INTERVAL 365 DAY)
      GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 20""")),

    // PII scrub over the committed fixture corpus (testdata documents
    // have no PII-shaped strings) — both engines read the same CSV and
    // apply the identical ordered regex chain; counts on original text.
    "pii_redact" -> Q((s, d) => Privacy.piiRedact(s, d), Some {
      val Seq(u, e, i, p) = Privacy.Rules.map(_._1)
      s"""
      WITH d AS (
        SELECT doc_id, source, text FROM read_csv('${Privacy.FixtureCsv}',
          header=true, columns={'doc_id':'BIGINT','source':'VARCHAR',
          'text':'VARCHAR'}))
      SELECT doc_id, source,
        regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
          '$u', '<URL>', 'g'), '$e', '<EMAIL>', 'g'), '$i', '<IP>', 'g'),
          '$p', '<PHONE>', 'g') AS redacted,
        CAST(len(regexp_extract_all(text, '$u')) AS BIGINT) AS n_url,
        CAST(len(regexp_extract_all(text, '$e')) AS BIGINT) AS n_email,
        CAST(len(regexp_extract_all(text, '$i')) AS BIGINT) AS n_ip,
        CAST(len(regexp_extract_all(text, '$p')) AS BIGINT) AS n_phone
      FROM d ORDER BY doc_id"""
    }),

    // X82 — HTML boilerplate extraction over the committed fixture
    // corpus: both engines read the same CSV and replay the identical
    // ordered region-removal / tag-strip / entity-decode / collapse
    // chain (Java-regex ∩ RE2 subset; plain substring replace for
    // entities), so text, counts and flags are bit-equal.
    "html_extract" ->
      Q((s, d) => HtmlExtract.htmlExtract(s, d), Some(htmlExtractOracle)),

    // X82b — the STREAMING twin: fixture pages in two file arrivals
    // through a real StreamingQuery; accumulated rows byte-equal to
    // the batch extractor, same oracle.
    "html_extract_stream" -> Q(
      (s, d) => graft.streaming.ExtractStream.extractStreamQuery(s, d),
      Some(htmlExtractOracle)),

    // X84 — the composed crawl-entry pipeline: extraction → admission
    // (non-boilerplate, long enough) → exact dedup on EXTRACTED text
    // → MinHash near-dup collapse (8 bands, agree ≥ 4, one-pass drop
    // of every pair's larger doc) → per-source manifest. The oracle
    // splices the shared X82 CTE block and the proven X3 signature
    // CTEs (tok/shingle/salted-band-min, the neardup_probe shapes)
    // and replays every stage.
    "crawl_ingest" -> Q(
      (s, d) => HtmlExtract.crawlIngest(s, d), Some(crawlIngestOracle)),

    // X84b — the STREAMING crawl entry, composed: fixture pages in
    // two file arrivals; each micro-batch extracts + admits once and
    // appends slim per-batch state (md5 keys, MinHash signatures,
    // token mass); the manifest fold over the accumulated state is
    // byte-equal to the batch pipeline — same oracle.
    "crawl_ingest_stream" -> Q(
      (s, d) => graft.streaming.CrawlStream.crawlStreamQuery(s, d),
      Some(crawlIngestOracle)),

    // X83 — outlink host aggregation: every href URL normalized
    // (lowercase, fragment + utm params stripped) and rolled up per
    // host — the crawl-frontier statistic. Same regex subset
    // discipline; both engines replay the identical chain.
    "link_hosts" -> Q((s, d) => HtmlExtract.linkHosts(s, d), Some {
      import HtmlExtract._
      def sq(x: String) = x.replace("'", "''")
      s"""
      WITH d AS (
        SELECT doc_id, html FROM read_csv('$FixtureCsv',
          header=true, columns={'doc_id':'BIGINT','source':'VARCHAR',
          'page_url':'VARCHAR','html':'VARCHAR'})),
      l AS (SELECT doc_id,
          unnest(regexp_extract_all(html, '${sq(HrefPattern)}', 1))
            AS url
        FROM d),
      n AS (SELECT doc_id, ${normalizeUrlSql("url")} AS u
        FROM l),
      h AS (SELECT doc_id, u,
          CASE WHEN regexp_extract(u, '${sq(HostPattern)}', 1) = ''
            THEN '(relative)'
            ELSE regexp_extract(u, '${sq(HostPattern)}', 1) END AS host
        FROM n)
      SELECT host, CAST(count(*) AS BIGINT) AS n_links,
        CAST(count(DISTINCT doc_id) AS BIGINT) AS n_pages,
        CAST(count(DISTINCT u) AS BIGINT) AS n_urls
      FROM h GROUP BY host ORDER BY host"""
    }),

    // X85 — takedown/deletion propagation: the weekly compliance
    // delete. The deterministic list doc_id % 97 == 0 is removed from
    // the corpus via a file-granular retire-then-rewrite into a
    // listing-tag-keyed store; the manifest's n_after is READ BACK
    // from the rewritten corpus, so a write-back that dropped the
    // wrong rows (or none) fails the oracle's arithmetic. Removed
    // token/char mass uses the shared tokenizer both engines replay.
    "takedown_propagate" -> Q(
      (s, d) => Takedown.takedownPropagate(s, d), Some(s"""
      SELECT source,
        CAST(count(*) AS BIGINT) AS n_before,
        CAST(count(*) FILTER (WHERE doc_id % ${Takedown.TakedownMod} = 0)
          AS BIGINT) AS n_removed,
        CAST(count(*) FILTER (WHERE doc_id % ${Takedown.TakedownMod} <> 0)
          AS BIGINT) AS n_after,
        CAST(COALESCE(sum(CASE WHEN doc_id % ${Takedown.TakedownMod} = 0
          THEN len(list_filter(string_split_regex(lower(text), '\\s+'),
            x -> x <> '')) END), 0) AS BIGINT) AS removed_tokens,
        CAST(COALESCE(sum(CASE WHEN doc_id % ${Takedown.TakedownMod} = 0
          THEN n_chars END), 0) AS BIGINT) AS removed_chars
      FROM documents GROUP BY source ORDER BY source""")),

    // X83b — the RESOLVED frontier rollup: hrefs normalized then
    // resolved against each page's own page_url (RFC-3986-lite: page
    // scheme for protocol-relative, page root for root-relative, page
    // base dir for relative paths; non-http schemes fenced into a
    // (non-http) bucket, null page URLs fail closed to (unresolved)).
    // The oracle replays the full normalize+resolve chain from the
    // shared pattern constants.
    "link_hosts_resolved" -> Q(
      (s, d) => HtmlExtract.linkHostsResolved(s, d),
      Some(linkHostsResolvedOracle)),

    // X88 — novel-frontier discovery: distinct fetchable resolved
    // outlinks ANTI-JOIN the crawled-URL set (normalized page_urls) —
    // the feed the robots/budget gates consume. Fragment-only self
    // links resolve to their own page and drop out by construction.
    "frontier_novel" -> Q(
      (s, d) => HtmlExtract.frontierNovel(s, d), Some(s"""
      WITH $resolvedUrlsCtes,
      ${fetchableFrontierCte("f")},
      ${seenUrlsCte("seen")}
      SELECT host, url FROM f ANTI JOIN seen USING (url)
      ORDER BY host, url""")),

    // X88b — the incremental novelty probe: one fetch round's
    // outlinks (doc_id % 4 batch) against the PERSISTED seen store;
    // the oracle restricts the outlink side to the batch and rebuilds
    // the seen set from the full corpus.
    "frontier_novel_probe" -> Q(
      (s, d) => HtmlExtract.frontierNovelProbe(s, d), Some(s"""
      WITH $resolvedUrlsCtes,
      f0 AS (SELECT DISTINCT h.host, h.res AS url FROM h
        JOIN d USING (doc_id)
        WHERE h.host NOT IN ('(non-http)', '(unresolved)')
          AND d.doc_id % 4 = 0),
      ${seenUrlsCte("seen")}
      SELECT host, url FROM f0 ANTI JOIN seen USING (url)
      ORDER BY host, url""")),

    // X87 — robots/REP admission gate: per resolved frontier URL, the
    // fetch-permission verdict against the parsed robots relation
    // (agent-* subset, startsWith prefix match, longest-match wins,
    // allow wins ties, empty-value rules dropped, crawl-delay
    // overrides) — both engines replay the identical window.
    "robots_gate" -> Q(
      (s, d) => Robots.robotsGate(s, d), Some(s"""
      WITH $resolvedUrlsCtes,
      ${fetchableFrontierCte("f")},
      ${robotsVerdictCtes("f")}
      SELECT host, url, allowed, rule, delay_ms
      FROM v ORDER BY host, url""")),

    // X89 — the composed FRONTIER pipeline: novel discovery (X88
    // anti-join) → robots verdicts (X87) → per-host fetch plan over
    // the ALLOWED novel URLs with the robots crawl-delay driving the
    // X86 window arithmetic. The oracle splices the same proven CTE
    // blocks end to end.
    "frontier_schedule" -> Q(
      (s, d) => Robots.frontierSchedule(s, d), Some(s"""
      WITH $resolvedUrlsCtes,
      ${fetchableFrontierCte("f0")},
      ${seenUrlsCte("seen")},
      f AS (SELECT host, url FROM f0 ANTI JOIN seen USING (url)),
      ${robotsVerdictCtes("f")},
      a AS (SELECT host, CAST(count(*) AS BIGINT) AS n_urls,
          CAST(min(delay_ms) AS BIGINT) AS delay_ms
        FROM v WHERE allowed GROUP BY 1)
      SELECT host, n_urls, delay_ms,
        CAST(${HtmlExtract.WindowMs} // delay_ms AS BIGINT)
          AS slots_per_window,
        CAST((n_urls + ${HtmlExtract.WindowMs} // delay_ms - 1) //
          (${HtmlExtract.WindowMs} // delay_ms) AS BIGINT)
          AS n_windows
      FROM a ORDER BY host""")),

    // X95 — paragraph-level KEEP-FIRST dedup (C4/Dolma semantics —
    // distinct from span_scrub's drop-all): <p> blocks tag-stripped
    // and collapsed, one corpus-wide window over the paragraph hash,
    // earliest (doc_id, position) survives, kept text rebuilt in
    // order and md5'd.
    "paragraph_dedup" -> Q(
      (s, d) => HtmlExtract.paragraphDedup(s, d), Some {
        def sq(x: String) = x.replace("'", "''")
        def strip(x: String) =
          s"regexp_replace($x, '${sq(HtmlExtract.TagPattern)}', ' ', 'g')"
        def coll(x: String) =
          s"trim(regexp_replace($x, '${sq(HtmlExtract.WsPattern)}', ' ', 'g'))"
        s"""
      WITH d AS (SELECT doc_id, html FROM read_csv(
          '${HtmlExtract.FixtureCsv}',
          header=true, columns={'doc_id':'BIGINT','source':'VARCHAR',
          'page_url':'VARCHAR','html':'VARCHAR'})),
      pl AS (SELECT doc_id,
          unnest(list_transform(range(1, len(ps) + 1), i -> i)) AS idx,
          unnest(ps) AS raw
        FROM (SELECT doc_id, regexp_extract_all(html,
            '${sq(HtmlExtract.ParaPattern)}', 1) AS ps FROM d)),
      p0 AS (SELECT doc_id, idx, ${coll(strip("raw"))} AS text FROM pl),
      p AS (SELECT * FROM p0 WHERE text <> ''),
      k AS (SELECT *, row_number() OVER (PARTITION BY md5(text)
          ORDER BY doc_id, idx) AS rn FROM p),
      kk AS (SELECT * FROM k WHERE rn = 1),
      tot AS (SELECT doc_id, count(*) AS n_paras FROM p GROUP BY 1),
      ka AS (SELECT doc_id, count(*) AS n_kept,
          md5(string_agg(text, ' ' ORDER BY idx)) AS kept_md5
        FROM kk GROUP BY 1)
      SELECT t.doc_id, t.n_paras,
        CAST(COALESCE(ka.n_kept, 0) AS BIGINT) AS n_kept, ka.kept_md5
      FROM tot t LEFT JOIN ka USING (doc_id) ORDER BY doc_id"""
      }),

    // X90 — host-graph PageRank: the global link-authority signal a
    // frontier priority folds in. Distinct fetchable host→host edges
    // (self-edges dropped) from the shared resolve chain; 10 unrolled
    // power-method rounds, in-mass + dangling mass decimal-summed so
    // both engines walk bit-identical rank vectors.
    "link_pagerank" -> Q(
      (s, d) => LinkGraph.linkPagerank(s, d), Some(linkPagerankOracle)),

    // X86 — per-host crawl budget: the politeness schedule a frontier
    // consumes, over the resolved rollup (shared CTE). The delay
    // OBEYS the publisher: the X100-parsed Crawl-delay (agent *, min
    // seconds, ms) wins; the two-tier link-mass heuristic (hot hosts
    // back off) is only the fallback. Slots per window (clamped ≥ 1),
    // integer-ceiling windows to drain the backlog — an all-int64
    // chain both engines replay with floor division.
    "crawl_budget" -> Q(
      (s, d) => HtmlExtract.crawlBudget(s, d), Some(s"""
      WITH lhr AS ($linkHostsResolvedOracle),
      $robotsParsedCtes,
      rp_cd AS (SELECT host,
          CAST(ceil(min(TRY_CAST(value AS DOUBLE)) * 1000) AS BIGINT)
            AS declared_ms
        FROM rp_rules
        WHERE agent = '*' AND directive = 'crawl-delay'
          AND TRY_CAST(value AS DOUBLE) IS NOT NULL
        GROUP BY 1),
      a AS (SELECT l.host, l.n_urls,
          CAST(COALESCE(cd.declared_ms,
            CASE WHEN l.n_links >= ${HtmlExtract.HotLinkCut}
              THEN ${HtmlExtract.HotDelayMs}
              ELSE ${HtmlExtract.BaseDelayMs} END) AS BIGINT)
            AS crawl_delay_ms
        FROM lhr l LEFT JOIN rp_cd cd ON l.host = cd.host
        WHERE l.host NOT IN ('(non-http)', '(unresolved)')),
      b AS (SELECT host, n_urls, crawl_delay_ms,
          GREATEST(CAST(1 AS BIGINT),
            CAST(${HtmlExtract.WindowMs} // crawl_delay_ms AS BIGINT))
            AS slots_per_window
        FROM a)
      SELECT host, n_urls, crawl_delay_ms, slots_per_window,
        CAST((n_urls + slots_per_window - 1) // slots_per_window
          AS BIGINT) AS n_windows
      FROM b ORDER BY host""")),

    // X105 — crawl neighborhoods: weakly-connected components over
    // the host graph, min-label = lexicographic minimum host. The
    // oracle derives the same labels from the recursive-CTE walk —
    // the pointer-jump decomposition is gate-checked every run.
    "host_clusters" -> Q(
      (s, d) => LinkGraph.hostClusters(s, d), Some {
        def sq(x: String) = x.replace("'", "''")
        val srcE =
          s"regexp_extract(p, '${sq(HtmlExtract.HostPattern)}', 1)"
        s"""
      WITH RECURSIVE $resolvedUrlsCtes,
      he AS (SELECT DISTINCT $srcE AS src, host AS dst
        FROM h
        WHERE $srcE IS NOT NULL AND $srcE <> ''
          AND host NOT IN ('(non-http)', '(unresolved)')
          AND $srcE <> host),
      up AS (SELECT DISTINCT least(src, dst) AS a,
          greatest(src, dst) AS b FROM he),
      edges AS (SELECT a AS s, b AS d FROM up
        UNION SELECT b, a FROM up),
      walk AS (
        SELECT s, d FROM edges
        UNION
        SELECT w.s, e.d FROM walk w JOIN edges e ON w.d = e.s),
      lbl AS (SELECT s AS host, least(s, min(d)) AS cluster
        FROM walk GROUP BY s),
      sz AS (SELECT cluster, count(*) AS n_hosts FROM lbl GROUP BY 1)
      SELECT l.host, l.cluster, s.n_hosts
      FROM lbl l JOIN sz s USING (cluster)
      ORDER BY l.host"""
      }),

    // X90b — warm-start rank refresh: the base chain (batch slice
    // excluded) rebuilds yesterday's stored vector, then WarmIters
    // rounds run over the FULL graph from that start (new hosts enter
    // at the grown graph's uniform share). The oracle replays the
    // identical 10+2 unrolled rounds; the approximation QUALITY is
    // the spec's job, cross-engine equality is this gate's.
    "link_pagerank_probe" -> Q(
      (s, d) => LinkGraph.linkPagerankProbe(s, d), Some {
        val warmStart = s"""SELECT no.host,
            COALESCE(b.rank, 1.0 / nn.nd) AS rank
          FROM fnodes no
          LEFT JOIN bpr${LinkGraph.Iters} b ON no.host = b.host
          CROSS JOIN fnn nn"""
        s"""
      WITH $resolvedUrlsCtes,
      hb AS (SELECT * FROM h
        WHERE doc_id % ${LinkGraph.ProbeBatchMod} <> 0),
      ${pagerankCtesNs("b", "hb", LinkGraph.Iters)},
      ${pagerankCtesNs("f", "h", LinkGraph.WarmIters,
          Some(warmStart))}
      SELECT p.host,
        CAST(COALESCE(idg.in_deg, 0) AS BIGINT) AS in_deg,
        CAST(COALESCE(od.out_deg, 0) AS BIGINT) AS out_deg,
        p.rank
      FROM fpr${LinkGraph.WarmIters} p
        LEFT JOIN fidg idg ON p.host = idg.dst
        LEFT JOIN fod od ON p.host = od.src
      ORDER BY p.rank DESC, p.host"""
      }),

    // X101 — merged discovery feed: outlink-novel ∪ sitemap-novel ∪
    // robots-declared sitemap URLs (the X100 parse's Sitemap:
    // directives — the third channel a real crawl reads on every
    // host), one row per (host, url) with sorted channel provenance
    // and the sitemap freshness hint; all channels share the
    // normalize chain, so cross-channel duplicates fold by
    // construction.
    "discovery_feed" -> Q(
      (s, d) => Sitemap.discoveryFeed(s, d),
      Some(discoveryFeedOracle)),

    // X101b — streaming discovery feed: per-arrival batch-sized
    // outlink/seen state appends, feed assembled at read time through
    // the SAME channel folds — byte-equal to batch over the
    // accumulated arrivals, so it shares the X101 oracle verbatim.
    "discovery_feed_stream" -> Q(
      (s, d) => graft.streaming.DiscoveryStream.discoveryStreamQuery(s, d),
      Some(discoveryFeedOracle)),

    // X100 — raw robots.txt parsing: fetched bodies → the rules
    // relation X87 consumes. Line grammar (comments, CRLF, spaced
    // colons, case-insensitive keys) + RFC 9309 group headers derived
    // relationally (lag → run starts → running-sum run_id → rules
    // join their run's agents). Both engines replay the identical
    // window chain over the same committed files.
    "robots_parse" -> Q(
      (s, d) => Robots.robotsParse(s, d), Some(s"""
      WITH $robotsParsedCtes
      SELECT host, agent, directive, value, rule_order
      FROM rp_rules ORDER BY host, rule_order""")),

    // X99 — composed frontier priority: per novel-backlog host, one
    // score folding X90 authority × X84-admission quality (AdmitPrior
    // for never-crawled hosts), zeroed by the X96 trap verdict. The
    // oracle splices the proven pagerank/extraction/novelty/trap CTE
    // blocks end to end (htmlCtes under the q namespace — the
    // resolved chain already owns the bare d).
    "host_priority" -> Q(
      (s, d) => LinkGraph.hostPriority(s, d), Some {
        import HtmlExtract._
        def sq(x: String) = x.replace("'", "''")
        s"""
      WITH $resolvedUrlsCtes,
      $pagerankCtes,
      ${htmlCtes("q")},
      ${fetchableFrontierCte("nvf")},
      ${seenUrlsCte("seenu")},
      nv AS (SELECT host, count(*) AS n_novel FROM
          (SELECT nvf.host, nvf.url FROM nvf ANTI JOIN seenu USING (url))
        GROUP BY 1),
      ph AS (SELECT doc_id,
          regexp_extract(${normalizeUrlSql("page_url")},
            '${sq(HostPattern)}', 1) AS host
        FROM d WHERE page_url IS NOT NULL AND page_url <> ''),
      ar AS (SELECT ph.host,
          CAST(sum(CASE WHEN NOT q.boilerplate_flag
              AND q.text_len >= $MinTextLen THEN 1 ELSE 0 END)
            AS DOUBLE) / CAST(count(*) AS DOUBLE) AS admit_rate
        FROM ph JOIN qout q USING (doc_id)
        WHERE ph.host IS NOT NULL AND ph.host <> '' GROUP BY 1),
      ${trapRollupCtes("t")},
      tr AS (SELECT host,
          (max(variants) >= $TrapVariants
            OR max(depth) >= $TrapDepth) AS trap_flag
        FROM tppd GROUP BY 1)
      SELECT nv.host, nv.n_novel,
        COALESCE(p.rank, 0.0) AS rank,
        COALESCE(ar.admit_rate, ${LinkGraph.AdmitPrior}) AS admit_rate,
        COALESCE(tr.trap_flag, false) AS trap_flag,
        CASE WHEN COALESCE(tr.trap_flag, false) THEN 0.0
          ELSE COALESCE(p.rank, 0.0) *
            COALESCE(ar.admit_rate, ${LinkGraph.AdmitPrior})
        END AS priority
      FROM nv LEFT JOIN pr${LinkGraph.Iters} p ON nv.host = p.host
        LEFT JOIN ar ON nv.host = ar.host
        LEFT JOIN tr ON nv.host = tr.host
      ORDER BY priority DESC, nv.host"""
      }),

    // X98 — sitemap ingestion: the publisher-DECLARED frontier. <url>
    // blocks parsed with the X82 regex discipline (no XML library —
    // neither engine's would replay the other's), locs normalized by
    // the SHARED chain so the two discovery feeds agree on URL
    // identity, cross-host locs dropped (protocol rule), duplicate
    // locs keep the latest lastmod, every survivor flagged novel
    // against the crawled corpus's page_urls.
    "sitemap_ingest" -> Q(
      (s, d) => Sitemap.sitemapIngest(s, d), Some(s"""
      WITH $sitemapDeclaredCtes,
      pd AS (SELECT page_url FROM read_csv(
          '${HtmlExtract.FixtureCsv}', header=true,
          columns={'doc_id':'BIGINT','source':'VARCHAR',
          'page_url':'VARCHAR','html':'VARCHAR'})),
      seen AS (SELECT DISTINCT
          ${HtmlExtract.normalizeUrlSql("page_url")} AS url
        FROM pd WHERE page_url IS NOT NULL AND page_url <> '')
      SELECT g.host, g.url, g.lastmod,
        (seen.url IS NULL) AS is_novel
      FROM sm_g g LEFT JOIN seen ON g.url = seen.url
      ORDER BY g.host, g.url""")),

    // X97 — anchor-text aggregation: per target host, the top-3
    // anchor terms of all links pointing at it (count DESC, term ASC)
    // — href and link text parsed from the same anchor element,
    // resolved via the shared chain. The Spark side runs the X40
    // TopKPerKey custom physical operator; the oracle derives the
    // same rows from the naive row_number window, gate-checking the
    // operator every run.
    "anchor_text" -> Q(
      (s, d) => HtmlExtract.anchorText(s, d), Some {
        import HtmlExtract._
        def sq(x: String) = x.replace("'", "''")
        s"""
      WITH d AS (SELECT doc_id, page_url, html FROM read_csv(
          '$FixtureCsv', header=true,
          columns={'doc_id':'BIGINT','source':'VARCHAR',
          'page_url':'VARCHAR','html':'VARCHAR'})),
      e AS (SELECT ${normalizeUrlSql("page_url")} AS p,
          unnest(regexp_extract_all(html,
            '${sq(AnchorElemPattern)}', 0)) AS el
        FROM d),
      x AS (SELECT p, regexp_extract(el, '${sq(HrefPattern)}', 1)
            AS url,
          trim(regexp_replace(regexp_replace(
            regexp_extract(el, '${sq(AnchorPattern)}', 1),
            '${sq(TagPattern)}', ' ', 'g'),
            '${sq(WsPattern)}', ' ', 'g')) AS atext
        FROM e),
      f AS (SELECT p, ${normalizeUrlSql("url")} AS u, atext FROM x
        WHERE url <> '' AND atext <> ''),
      r AS (SELECT u, ${resolveUrlSql("u", "p")} AS res, atext FROM f),
      h AS (SELECT CASE
            WHEN regexp_matches(u, '${sq(AnySchemePattern)}')
              AND NOT regexp_matches(u, '${sq(HostPattern)}')
              THEN '(non-http)'
            WHEN res IS NULL
              OR regexp_extract(res, '${sq(HostPattern)}', 1) = ''
              THEN '(unresolved)'
            ELSE regexp_extract(res, '${sq(HostPattern)}', 1)
          END AS host, atext
        FROM r),
      t AS (SELECT host,
          unnest(list_filter(string_split_regex(lower(atext), '\\s+'),
            w -> w <> '')) AS term
        FROM h WHERE host NOT IN ('(non-http)', '(unresolved)')),
      c AS (SELECT host, term, count(*) AS n FROM t GROUP BY 1, 2),
      k AS (SELECT *, row_number() OVER (PARTITION BY host
          ORDER BY n DESC, term) AS rank FROM c)
      SELECT host, rank, term, n FROM k WHERE rank <= $AnchorTopK
      ORDER BY host, rank"""
      }),

    // X96 — crawl-trap detection: per fetchable host, the worst
    // query-stripped path's distinct-variant count (session-id /
    // faceted-nav explosion) and the deepest path (calendar/symlink
    // digs); trap verdict when either crosses its shared threshold.
    // The oracle replays the resolve chain + the same two-level
    // rollup with the naive GROUP BYs.
    "crawl_traps" -> Q(
      (s, d) => HtmlExtract.crawlTraps(s, d), Some(s"""
      WITH $resolvedUrlsCtes,
      ${trapRollupCtes("")}
      SELECT host, CAST(sum(variants) AS BIGINT) AS n_urls,
        count(*) AS n_paths,
        CAST(max(variants) AS BIGINT) AS max_variants,
        CAST(max(depth) AS BIGINT) AS max_depth,
        (max(variants) >= ${HtmlExtract.TrapVariants}
          OR max(depth) >= ${HtmlExtract.TrapDepth}) AS trap_flag
      FROM ppd GROUP BY host ORDER BY host""")),

    // Token-budget chunking with overlap (the splitting complement of
    // seq_packing): same tokenization both engines, list_slice vs
    // slice on identical integer boundaries — exact.
    "doc_chunk" -> Q((s, d) => Reshape.docChunk(s, d), Some("""
      WITH d AS (
        SELECT doc_id,
          list_filter(string_split_regex(lower(text), '\s+'),
            x -> x <> '') AS toks
        FROM documents),
      n AS (
        SELECT doc_id, toks,
          GREATEST(1, CAST(ceil((len(toks) - 8) / 56.0) AS BIGINT))
            AS nchunks
        FROM d),
      e AS (
        SELECT doc_id, toks, unnest(range(nchunks)) AS chunk_id FROM n)
      SELECT doc_id, chunk_id,
        CAST(len(list_slice(toks, chunk_id*56 + 1, chunk_id*56 + 64))
          AS BIGINT) AS n_tokens,
        -- array_to_string([]) is NULL in DuckDB but Spark's array_join
        -- is '' — COALESCE only the empty case; a NULL token list (NULL
        -- text) stays NULL to match array_join's NULL propagation
        CASE WHEN toks IS NULL THEN NULL
          ELSE COALESCE(array_to_string(
            list_slice(toks, chunk_id*56 + 1, chunk_id*56 + 64), ' '), '')
        END AS chunk_text
      FROM e ORDER BY doc_id, chunk_id""")),

    "seq_packing" -> Q((s, d) => Reshape.seqPacking(s, d), Some(s"""
      $seqPackingOracleCte
      SELECT doc_id, shard, pack_id, n_tok, cum_tok
      FROM p ORDER BY doc_id""")),

    // Shard export + manifest: seq_packing written one dir per shard,
    // manifest computed from the WRITTEN files — the oracle aggregates
    // the same assignment directly, so the export roundtrip (layout,
    // completeness, readback types) is what's being checked.
    "shard_export" -> Q((s, d) => Reshape.shardExport(s, d), Some(s"""
      $seqPackingOracleCte
      SELECT shard, count(*) AS n_docs,
        CAST(count(DISTINCT pack_id) AS BIGINT) AS n_packs,
        CAST(sum(n_tok) AS BIGINT) AS n_tokens,
        CAST(max(cum_tok) AS BIGINT) AS max_cum_tok
      FROM p GROUP BY shard ORDER BY shard""")),

    "domain_mix_sample" -> Q(Reshape.domainMixSample, Some {
      val values = Reshape.MixRates
        .map { case (src, r) => s"('$src', $r)" }.mkString(", ")
      s"""
      WITH r AS (SELECT * FROM (VALUES $values) AS t(source, rate)),
      s AS (
        SELECT d.doc_id, d.source, d.lang, r.rate,
          CAST(CAST(('0x' || substring(
            md5('mix:' || CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
            % 100 AS INTEGER) AS bucket
        FROM documents d JOIN r ON d.source = r.source)
      SELECT doc_id, source, lang, bucket
      FROM s WHERE bucket < rate ORDER BY doc_id"""
    }),

    // X78 — temperature-smoothed source mixture (α = 1/2): rates are
    // DERIVED from the corpus's token distribution via floor(sqrt)
    // (IEEE sqrt is correctly rounded — bit-identical cross-engine)
    // and an int64 floor-division chain the oracle replays verbatim.
    "temperature_mix" -> Q(
      (s, d) => Reshape.temperatureMix(s, d), Some("""
      WITH tok AS (SELECT doc_id, source,
          CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
            x -> x <> '')) AS BIGINT) AS n_tok
        FROM documents),
      st AS (SELECT source, CAST(sum(n_tok) AS BIGINT) AS src_tok,
          CAST(floor(sqrt(CAST(sum(n_tok) AS DOUBLE))) AS BIGINT) AS s_i
        FROM tok GROUP BY 1),
      g AS (SELECT CAST(sum(src_tok) AS BIGINT) AS tot_tok,
          CAST(sum(s_i) AS BIGINT) AS s_sum FROM st),
      r AS (SELECT st.source,
          CASE WHEN st.src_tok = 0 THEN 0
            ELSE least(1000000,
              (((g.tot_tok * 2 // 5) * 1000000 // g.s_sum) * st.s_i)
                // st.src_tok)
          END AS rate_ppm
        FROM st, g)
      SELECT t.doc_id, t.source, t.n_tok,
        CAST(r.rate_ppm AS BIGINT) AS rate_ppm
      FROM tok t JOIN r USING (source)
      WHERE CAST(('0x' || substring(md5('tmix:' ||
          CAST(t.doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000000
        < r.rate_ppm
      ORDER BY t.doc_id""")),

    // X75 — token-budget domain mix: per-source greedy selection in
    // md5-coin order until the TOKEN budget fills (crossing doc
    // included). The engine runs the two-phase bucketed form (no
    // source-wide sort partition); the oracle replays the naive
    // one-window prefix — same integers, so the equality gate-checks
    // the decomposition every run.
    "token_budget_mix" -> Q(
      (s, d) => Reshape.tokenBudgetMix(s, d), Some {
      val values = Reshape.TokenBudgets
        .map { case (src, b) => s"('$src', $b)" }.mkString(", ")
      s"""
      WITH tok AS (SELECT doc_id, source,
          list_filter(string_split_regex(lower(text), '\\s+'),
            x -> x <> '') AS w
        FROM documents),
      d AS (SELECT doc_id, source, CAST(len(w) AS BIGINT) AS n_tok,
          CAST(('0x' || substring(md5('tbm:' ||
            CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000000
            AS coin
        FROM tok),
      -- CAST: DuckDB's windowed sum(BIGINT) widens to HUGEINT, which
      -- the driver's pandas bridge reads as float64 — the values are
      -- identical but the schema row would go red
      r AS (SELECT *, CAST(sum(n_tok) OVER (PARTITION BY source
            ORDER BY coin, doc_id ROWS UNBOUNDED PRECEDING) - n_tok
            AS BIGINT) AS cum_before
        FROM d),
      b AS (SELECT * FROM (VALUES $values) AS t(source, budget))
      SELECT r.doc_id, r.source, r.n_tok, r.cum_before
      FROM r JOIN b USING (source)
      WHERE r.cum_before < b.budget
      ORDER BY r.source, r.doc_id"""
    }),

    "embedding_quantize" -> Q(Similarity.quantizeInt8, Some("""
      WITH e AS (SELECT vec_id, label,
          CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      r AS (SELECT vec_id, label, v, list_min(v) AS vmin,
          list_max(v) AS vmax,
          (list_max(v) - list_min(v)) / 255.0 AS scale FROM e),
      c AS (SELECT *, list_transform(v, x ->
          CASE WHEN scale = 0 THEN 0
            ELSE least(255, CAST(floor((x - vmin) / scale) AS BIGINT))
          END) AS codes FROM r),
      er AS (SELECT *, list_transform(range(1, len(v) + 1), i ->
          abs(v[i] - (vmin + (CAST(codes[i] AS DOUBLE) + 0.5) * scale)))
          AS errs FROM c)
      SELECT vec_id, label, CAST(len(v) AS INTEGER) AS n_dims,
        vmin, vmax,
        -- COALESCE: array_to_string([]) is NULL in DuckDB, '' for
        -- Spark's concat_ws — a zero-dim/NULL vector would diverge
        md5(COALESCE(array_to_string(codes, ','), '')) AS code_fp,
        list_max(errs) AS max_abs_err,
        list_sum(list_transform(errs, x -> x * x)) AS sse
      FROM er ORDER BY vec_id""")),

    // Native expressions reached through SQL TEXT (FunctionRegistry via
    // SparkSessionExtensions) — the resolution path a SQL-only user
    // takes; float_dot is bit-identical to list_dot_product on doubles.
    "sql_native_dot" -> Q(Similarity.sqlNativeDot, Some("""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
        FROM embeddings)
      SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        list_dot_product(a.emb, b.emb) AS dot
      FROM e a JOIN e b ON b.vec_id = a.vec_id + 1
      ORDER BY a_id""")),

    // X17 Aggregator UDAF, fixed-point (QuantizedCentroidAgg): each
    // element floor-quantized to a long BEFORE summation, so the
    // aggregate is order-independent and the oracle recomputes the
    // identical multiply/floor/sum/divide chain over unnested arrays —
    // bit-identical doubles, full hash gate. The double-path twin
    // (CentroidAgg) stays pinned in SimilaritySpec.
    // The WHERE guard makes corpus drift loud: the aggregator SKIPS a
    // NULL embedding row (n not incremented) and truncates a short
    // array via min(dim, len), while an unguarded count(*) oracle
    // would count the NULL row and sum-skip the short one — a drifted
    // corpus could then diverge semi-silently. Guarded, any NULL or
    // non-64-len row is excluded from the oracle while the engine
    // still counts the short one → rows/hash mismatch, named query.
    // (TablesSchemaSpec pins the healthy invariant at every sf dir.)
    "centroid_udaf" -> Q(Similarity.centroidByLabelFlat, Some("""
      WITH q AS (
        SELECT label, r.i - 1 AS dim,
          CAST(floor(CAST(embedding[r.i] AS DOUBLE) * 1000000000.0)
            AS BIGINT) AS qv
        FROM embeddings, range(1, 65) r(i)
        WHERE embedding IS NOT NULL AND len(embedding) = 64),
      g AS (SELECT label, dim, CAST(sum(qv) AS BIGINT) AS s,
              count(*) AS n
            FROM q GROUP BY 1, 2)
      SELECT label, CAST(dim AS INTEGER) AS dim,
        CAST(s AS DOUBLE) / 1000000000.0 / n AS centroid_val,
        n AS n_vecs
      FROM g ORDER BY label, dim""")),

    // Distributed BPE merge training: the iterative argmax-and-merge
    // IS SQL-expressible — as a generated chain of materialized CTEs,
    // one (pair-count → argmax → merge) triple per rank (see
    // [[bpeOracle]]) — so the full 12-merge sequence is hash-checked.
    // BpeTrainSpec's driver-side reference implementation stays as
    // defense in depth.
    "bpe_train" -> Q((s, d) => BpeTrain.bpeTrain(s, d),
      Some(bpeOracle(12))),

    // X63 — encode with the trained tokenizer: per-doc token stats
    // from applying the 12 learned merges. Oracle = the same
    // materialized CTE chain extended through the final vocabulary
    // (see [[bpeEncodeOracle]]), so train and encode can never drift.
    "bpe_encode" -> Q((s, d) => BpeTrain.bpeEncode(s, d),
      Some(bpeEncodeOracle(12))),

    // X103 — tokenizer fertility per language: exact integer sums over
    // the X63 per-doc encoding joined to declared langs, ratios as
    // single exact divisions; the oracle replays the full merge chain
    // through the shared bpe CTE stack.
    "bpe_fertility" -> Q((s, d) => BpeTrain.bpeFertility(s, d), Some {
      val n = 12
      "WITH " + bpeCtes(n, finalVocab = true).mkString(",\n") + s""",
      enc AS (SELECT replace(trim(s), ' ', '') AS word,
          CAST(len(string_split(trim(s), '  ')) AS BIGINT) AS n_sym
        FROM w$n),
      dw AS (SELECT doc_id, unnest(list_filter(
          string_split_regex(lower(text), '\\s+'), x -> x <> ''))
          AS word FROM documents),
      pd AS (SELECT doc_id, count(*) AS n_words,
          CAST(sum(e.n_sym) AS BIGINT) AS n_tokens,
          CAST(sum(length(dw.word)) AS BIGINT) AS n_chars
        FROM dw JOIN enc e USING (word)
        GROUP BY doc_id),
      dl AS (SELECT doc_id, lang FROM documents)
      SELECT lang, count(*) AS n_docs,
        CAST(sum(n_words) AS BIGINT) AS n_words,
        CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
        CAST(sum(n_chars) AS BIGINT) AS n_chars,
        CAST(sum(n_tokens) AS DOUBLE) / CAST(sum(n_words) AS DOUBLE)
          AS tokens_per_word,
        CAST(sum(n_chars) AS DOUBLE) / CAST(sum(n_tokens) AS DOUBLE)
          AS chars_per_token
      FROM pd JOIN dl USING (doc_id)
      GROUP BY lang ORDER BY lang"""
    }),

    // Sketch-guided exact heavy hitters: the oracle is the plain
    // HAVING-threshold count — the CMS candidate pass must be
    // output-invisible (no false negatives by construction).
    "heavy_hitters" -> Q((s, d) => CorpusStats.heavyHitters(s, d), Some("""
      WITH tok AS (
        SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
          x -> x <> '')) AS word FROM documents),
      tot AS (SELECT count(*) AS n FROM tok)
      SELECT word, count(*) AS n FROM tok GROUP BY 1
      HAVING count(*) > (SELECT n // 1000 FROM tot)
      ORDER BY n DESC, word""")),

    "word_freq" -> Q((s, d) => TextAnalysis.wordFreq(s, d), Some("""
      SELECT word, count(*) AS n FROM (
        SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
          x -> x <> '')) AS word FROM documents)
      GROUP BY 1 ORDER BY n DESC, word LIMIT 50""")),

    "text_quality" -> Q(TextAnalysis.textQuality, Some("""
      WITH d AS (SELECT doc_id, lang, source,
          list_filter(string_split_regex(lower(text), '\s+'),
            x -> x <> '') AS w
        FROM documents)
      SELECT doc_id, lang, source,
        CAST(len(w) AS INTEGER) AS n_tokens,
        CAST(list_sum(list_transform(w, x -> length(x))) AS BIGINT)
          AS n_token_chars,
        CAST(list_sum(list_transform(w, x -> length(x))) AS DOUBLE) / NULLIF(len(w), 0)
          AS avg_token_len,
        CAST(len(list_filter(w, x -> list_contains(
          ['the','a','of','and','to'], x))) AS DOUBLE) / NULLIF(len(w), 0) AS stop_ratio,
        CAST(len(list_distinct(w)) AS DOUBLE) / NULLIF(len(w), 0) AS uniq_ratio
      FROM d ORDER BY doc_id""")),

    "lang_stats" -> Q(TextAnalysis.langStats, Some("""
      SELECT lang, count(*) AS n_docs,
        CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        CAST(sum(n_chars) AS DOUBLE) / count(*) AS avg_chars,
        count(DISTINCT source) AS n_sources
      FROM documents GROUP BY 1 ORDER BY 1""")),

    // X73 — declared-vs-detected language audit. The langIdScore
    // argmax (greatest over (score, lang) structs, 'und' at zero) is
    // replayed by DuckDB's max over struct_pack — struct comparison
    // is field-order lexicographic in both engines. The VALUES list
    // mirrors TextAnalysis.LangMarkers.
    // X104 — Unicode script-mix audit: per-class codepoint counts,
    // dominant script (fixed tiebreak order), declared-lang script
    // expectation — every chain generated from the shared constants.
    "script_mix" -> Q((s, d) => TextAnalysis.scriptMix(s, d), Some {
      import TextAnalysis._
      def sq(x: String) = x.replace("'", "''")
      val cnts = ScriptClasses.map { case (n, p) =>
        s"""CAST(length(t) - length(regexp_replace(t, '${sq(p)}',
          '', 'g')) AS BIGINT) AS n_$n""" }.mkString(",\n          ")
      val mx = "greatest(" +
        ScriptClasses.map(c => s"n_${c._1}").mkString(", ") + ")"
      val domChain = ScriptClasses.map { case (n, _) =>
        s"WHEN n_$n = mx THEN '$n'" }.mkString("\n            ")
      val expChain = LangScript.map { case (l, s2) =>
        s"WHEN lang = '$l' THEN '$s2'" }.mkString(" ")
      val names = ScriptClasses.map(c => s"n_${c._1}").mkString(", ")
      s"""
      WITH d AS (SELECT doc_id, lang, COALESCE(text, '') AS t
        FROM documents),
      c AS (SELECT doc_id, lang, CAST(length(t) AS BIGINT) AS n_chars,
          $cnts
        FROM d),
      m AS (SELECT *, $mx AS mx FROM c),
      dom AS (SELECT *, CASE WHEN mx = 0 THEN 'none'
            $domChain
          END AS dominant FROM m),
      ex AS (SELECT *, CASE $expChain END AS expected FROM dom)
      SELECT doc_id, lang, n_chars, $names, dominant,
        (expected IS NOT NULL AND dominant <> 'none'
          AND dominant <> expected) AS script_mismatch
      FROM ex ORDER BY doc_id"""
    }),

    "lang_mismatch" -> Q(TextAnalysis.langMismatch, Some("""
      WITH d AS (SELECT doc_id, source, lang,
          list_filter(string_split_regex(lower(text), '\s+'),
            x -> x <> '') AS w
        FROM documents),
      sc AS (SELECT d.doc_id, d.source, d.lang, m.lg,
          len(list_filter(d.w, x -> list_contains(m.ws, x))) AS s
        FROM d, (VALUES
          ('de', ['der','die','das','und','ist']),
          ('en', ['the','a','of','and','to']),
          ('es', ['el','los','las','y','es']),
          ('fr', ['le','la','les','et','est']),
          ('zh', ['的','是','在','了','不'])) m(lg, ws)),
      best AS (SELECT doc_id, source, lang,
          max(struct_pack(s := s, lg := lg)) AS b
        FROM sc GROUP BY 1, 2, 3),
      p AS (SELECT doc_id, source, lang,
          CASE WHEN b.s > 0 THEN b.lg ELSE 'und' END AS pred
        FROM best)
      SELECT source, lang, count(*) AS n_docs,
        CAST(sum(CASE WHEN pred <> lang THEN 1 ELSE 0 END) AS BIGINT)
          AS n_mismatch,
        CAST(sum(CASE WHEN pred <> lang THEN 1 ELSE 0 END) AS DOUBLE)
          / count(*) AS mismatch_rate
      FROM p GROUP BY 1, 2 ORDER BY 1, 2""")),

    "doc_fingerprint" -> Q(TextAnalysis.docFingerprint, Some("""
      WITH d AS (SELECT doc_id,
          list_filter(string_split_regex(lower(text), '\s+'),
            x -> x <> '') AS w
        FROM documents)
      -- COALESCE('' on empty/NULL): Spark's concat_ws treats a NULL or
      -- empty token array as '', while array_to_string([]) is NULL here
      SELECT doc_id,
        md5(COALESCE(array_to_string(w, ' '), '')) AS fingerprint,
        CAST(len(w) AS INTEGER) AS n_tokens
      FROM d ORDER BY doc_id""")),

    "neardup_minhash" -> Q(
      (s, d) => Dedup.nearDupPairsCached(s, d).orderBy("doc_a", "doc_b"),
      Some("""
      WITH tok AS (SELECT doc_id,
          list_filter(string_split_regex(lower(text), '\s+'),
            x -> x <> '') AS w
        FROM documents),
      sh AS (SELECT DISTINCT doc_id,
          unnest(list_transform(range(1, len(w) - 1),
            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle
        FROM tok WHERE len(w) >= 3),
      sig AS (SELECT doc_id, b.band,
          min(md5(b.band || ':' || shingle)) AS sig
        FROM sh, (SELECT unnest(range(0, 8)) AS band) b GROUP BY 1, 2),
      pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          count(*) AS n_bands
        FROM sig a JOIN sig b
          ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
      SELECT doc_a, doc_b, n_bands FROM pairs
      WHERE n_bands >= 4 ORDER BY doc_a, doc_b""")),

    // X3e — incremental near-dup: probe the doc_id%7==0 "incoming
    // batch" against the persisted corpus signature index; only the
    // batch is shingled, the corpus side is a broadcast-probed index
    // scan. The oracle recomputes both sides' signatures and keeps
    // cross (batch × corpus) pairs only.
    "neardup_probe" -> Q(
      (s, d) => Dedup.neardupProbe(s, d), Some(neardupProbeOracle)),

    // X57b — the STREAMING form: same probe semantics micro-batch by
    // micro-batch through a real StreamingQuery, with the signature
    // index MAINTAINED (batch signatures appended) as docs arrive;
    // accumulated pairs must equal the batch probe, so the oracle is
    // shared. The in-query require additionally pins the maintained
    // index against a from-scratch rebuild.
    "neardup_stream" -> Q(
      (s, d) => graft.streaming.NeardupStream.neardupStreamQuery(s, d),
      Some(neardupProbeOracle)),

    // X58 — exact repeated-span scrub: 8-token windows occurring more
    // than once corpus-wide are dropped from every doc; output is the
    // per-doc scrub accounting + md5 of the rebuilt text (full content
    // check without corpus-sized result rows).
    "span_scrub" -> Q((s, d) => Dedup.repeatedSpanScrub(s, d), Some("""
      WITH tok AS (SELECT doc_id,
          list_filter(string_split_regex(lower(text), '\s+'),
            x -> x <> '') AS w
        FROM documents),
      win AS (SELECT doc_id, i, array_to_string(w[i:i+7], ' ') AS win
        FROM tok, unnest(range(1, len(w) - 6)) r(i)),
      rep AS (SELECT win FROM win GROUP BY win HAVING count(*) > 1),
      starts AS (SELECT doc_id, list(i) AS ss
        FROM win JOIN rep USING (win) GROUP BY doc_id),
      c AS (SELECT t.doc_id, t.w, COALESCE(s.ss, CAST([] AS BIGINT[])) AS ss
        FROM tok t LEFT JOIN starts s USING (doc_id)),
      k AS (SELECT doc_id, len(w) AS n_tokens,
          list_transform(list_filter(range(1, len(w) + 1), i ->
            len(list_filter(ss, s -> i >= s AND i < s + 8)) = 0),
            i -> w[i]) AS kept
        FROM c)
      SELECT doc_id, n_tokens, CAST(len(kept) AS BIGINT) AS n_kept,
        -- a fully-scrubbed doc has kept = [] and DuckDB's
        -- array_to_string([]) is NULL where Spark's concat_ws is '' —
        -- coalesce so both engines hash the empty string
        md5(COALESCE(array_to_string(kept, ' '), '')) AS clean_md5
      FROM k ORDER BY doc_id""")),

    // X107 — event-sequence mining: most common 3-step event-type
    // paths over per-user timelines, (ts, event_id) tiebreak, top-20
    // by (count DESC, path ASC) — the discovery twin of the funnel.
    "event_paths" -> Q((s, d) => Analytics.eventPaths(s, d), Some(s"""
      WITH e AS (SELECT user_id, ts, event_id, event_type,
          lead(event_type, 1) OVER w AS e2,
          lead(event_type, 2) OVER w AS e3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      p AS (SELECT event_type || ' > ' || e2 || ' > ' || e3 AS path
        FROM e WHERE e2 IS NOT NULL AND e3 IS NOT NULL)
      SELECT path, count(*) AS n FROM p GROUP BY path
      ORDER BY n DESC, path LIMIT ${Analytics.PathTopK}""")),

    "funnel" -> Q(Analytics.funnel, Some("""
      WITH e AS (
        SELECT user_id, event_id, ts, event_type,
          lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM events),
      s AS (
        SELECT *, CASE WHEN prev_ts IS NULL
            OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
          THEN 1 ELSE 0 END AS new_sess FROM e),
      g AS (
        SELECT *, sum(new_sess) OVER (PARTITION BY user_id
          ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
        FROM s),
      f AS (
        SELECT user_id, sess_id,
          min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS t_view,
          min(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS t_click,
          min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
            AS t_purchase
        FROM g GROUP BY 1, 2)
      SELECT count(*) AS n_sessions,
        count(CASE WHEN t_view IS NOT NULL THEN 1 END) AS n_view,
        count(CASE WHEN t_click > t_view THEN 1 END) AS n_view_click,
        count(CASE WHEN t_click > t_view AND t_purchase > t_click THEN 1 END)
          AS n_view_click_purchase
      FROM f""")),

    "clean_corpus" -> Q((s, d) => TextAnalysis.cleanCorpus(s, d), Some("""
      WITH d AS (SELECT doc_id, lang, source,
          list_filter(string_split_regex(lower(text), '\s+'),
            x -> x <> '') AS w
        FROM documents),
      q AS (SELECT doc_id, lang, source,
          CAST(len(w) AS INTEGER) AS n_tokens,
          CAST(len(list_distinct(w)) AS DOUBLE) / NULLIF(len(w), 0)
            AS uniq_ratio
        FROM d
        WHERE len(w) >= 20
          AND CAST(len(list_distinct(w)) AS DOUBLE) / NULLIF(len(w), 0)
            >= 0.35),
      -- shingle/signature work restricted to quality survivors (band
      -- agreement is per-pair, so the survivor-pair set is unchanged)
      sh AS (SELECT DISTINCT d.doc_id,
          unnest(list_transform(range(1, len(w) - 1),
            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g
        FROM d SEMI JOIN q USING (doc_id) WHERE len(w) >= 3),
      sig AS (SELECT doc_id, b.band,
          min(md5(b.band || ':' || g)) AS sig
        FROM sh, (SELECT unnest(range(0, 8)) AS band) b GROUP BY 1, 2),
      pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b FROM sig a
          JOIN sig b
          ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
        GROUP BY 1, 2 HAVING count(*) >= 4),
      dup AS (SELECT DISTINCT doc_b AS doc_id FROM pairs)
      SELECT doc_id, lang, source, n_tokens, uniq_ratio
      FROM q ANTI JOIN dup USING (doc_id)
      ORDER BY doc_id""")),

    "simhash_pairs" -> Q((s, d) => Dedup.simhashPairs(s, d), Some {
      // 64-bit simhash as two 32-bit halves (see Dedup.simhashPairsFor:
      // 1 << 63 overflows signed 64-bit in both engines).
      def sums(src: String, pre: String) = (0 until 32).map(j =>
        s"sum(CASE WHEN ($src >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS $pre$j")
        .mkString(", ")
      def half(pre: String) = (0 until 32).map(j =>
        s"(CASE WHEN $pre$j > 0 THEN (1::BIGINT << $j) ELSE 0 END)")
        .mkString(" + ")
      // four 16-bit chunks: pigeonhole-complete for hamming <= 3
      val chunkCond = Seq(
        "(a.sim_lo & 65535) = (b.sim_lo & 65535)",
        "((a.sim_lo >> 16) & 65535) = ((b.sim_lo >> 16) & 65535)",
        "(a.sim_hi & 65535) = (b.sim_hi & 65535)",
        "((a.sim_hi >> 16) & 65535) = ((b.sim_hi >> 16) & 65535)")
        .mkString(" OR ")
      s"""
      WITH tok AS (SELECT doc_id,
          list_filter(string_split_regex(lower(text), '\\s+'),
            x -> x <> '') AS w
        FROM documents),
      sh0 AS (SELECT DISTINCT doc_id,
          unnest(list_transform(range(1, len(w) - 1),
            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g
        FROM tok WHERE len(w) >= 3),
      h AS (SELECT doc_id,
          CAST(('0x' || substring(md5(g), 1, 8)) AS BIGINT) AS hlo,
          CAST(('0x' || substring(md5(g), 9, 8)) AS BIGINT) AS hhi
        FROM sh0),
      s AS (SELECT doc_id, ${sums("hlo", "l")}, ${sums("hhi", "u")}
        FROM h GROUP BY 1),
      sig AS (SELECT doc_id, ${half("l")} AS sim_lo, ${half("u")} AS sim_hi
        FROM s),
      pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
          CAST(bit_count(CAST(xor(a.sim_lo, b.sim_lo) AS BIT)) +
               bit_count(CAST(xor(a.sim_hi, b.sim_hi) AS BIT)) AS INTEGER)
            AS hamming
        FROM sig a JOIN sig b
          ON ($chunkCond) AND a.doc_id < b.doc_id)
      SELECT doc_a, doc_b, hamming FROM pairs
      WHERE hamming <= 3 ORDER BY doc_a, doc_b"""
    }),

    "ngram_jaccard" -> Q((s, d) => Dedup.ngramJaccard(s, d), Some("""
      WITH tok AS (SELECT doc_id,
          list_filter(string_split_regex(lower(text), '\s+'),
            x -> x <> '') AS w
        FROM documents),
      sh AS (SELECT DISTINCT doc_id,
          unnest(list_transform(range(1, len(w) - 1),
            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g
        FROM tok WHERE len(w) >= 3),
      sig AS (SELECT doc_id, b.band,
          min(md5(b.band || ':' || g)) AS sig
        FROM sh, (SELECT unnest(range(0, 8)) AS band) b GROUP BY 1, 2),
      pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          count(*) AS n_bands
        FROM sig a JOIN sig b
          ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
        GROUP BY 1, 2 HAVING count(*) >= 4),
      sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
      inter AS (SELECT p.doc_a, p.doc_b, count(*) AS inter
        FROM pairs p
        JOIN sh a ON a.doc_id = p.doc_a
        JOIN sh b ON b.doc_id = p.doc_b AND b.g = a.g
        GROUP BY 1, 2)
      SELECT p.doc_a, p.doc_b, p.n_bands, i.inter,
        sa.n AS n_a, sb.n AS n_b,
        CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter) AS jaccard
      FROM pairs p
      JOIN inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b
      JOIN sizes sa ON sa.doc_id = p.doc_a
      JOIN sizes sb ON sb.doc_id = p.doc_b
      ORDER BY p.doc_a, p.doc_b""")),

    // X62 — EXACT set-similarity self-join (prefix-filtered AllPairs/
    // PPJoin shape). The oracle is the BRUTE-FORCE shingle join — no
    // prefix logic on purpose: the engine's prefix filter claims
    // losslessness, so the gate checks it against ground truth every
    // run. Candidate pruning on the engine side can therefore never
    // hide a miss.
    "jaccard_prefix_join" ->
      Q((s, d) => Dedup.jaccardPrefixJoin(s, d), Some("""
      WITH tok AS (SELECT doc_id,
          list_filter(string_split_regex(lower(text), '\s+'),
            x -> x <> '') AS w
        FROM documents),
      sh AS (SELECT DISTINCT doc_id,
          unnest(list_transform(range(1, len(w) - 1),
            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g
        FROM tok WHERE len(w) >= 3),
      sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
      i AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          count(*) AS inter
        FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
      SELECT doc_a, doc_b, inter, sa.n AS n_a, sb.n AS n_b,
        CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) AS jaccard
      FROM i JOIN sz sa ON sa.doc_id = doc_a
             JOIN sz sb ON sb.doc_id = doc_b
      WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.7
      ORDER BY doc_a, doc_b""")),

    // X67 — exact containment join: the oracle is the BRUTE-FORCE
    // shingle join over ORDERED pairs, so the prefix machinery's
    // losslessness for the asymmetric relation is gate-checked too.
    "containment_join" ->
      Q((s, d) => Dedup.containmentJoin(s, d), Some("""
      WITH tok AS (SELECT doc_id,
          list_filter(string_split_regex(lower(text), '\s+'),
            x -> x <> '') AS w
        FROM documents),
      sh AS (SELECT DISTINCT doc_id,
          unnest(list_transform(range(1, len(w) - 1),
            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g
        FROM tok WHERE len(w) >= 3),
      sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
      i AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          count(*) AS inter
        FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id <> b.doc_id
        GROUP BY 1, 2)
      SELECT doc_a, doc_b, inter, sa.n AS n_a, sb.n AS n_b,
        CAST(inter AS DOUBLE) / sa.n AS containment
      FROM i JOIN sz sa ON sa.doc_id = doc_a
             JOIN sz sb ON sb.doc_id = doc_b
      WHERE CAST(inter AS DOUBLE) / sa.n >= 0.9
      ORDER BY doc_a, doc_b""")),

    // X62b — incremental Jaccard probe against the persisted
    // set-similarity index: the doc_id%7==0 "incoming batch" vs the
    // rest; only the batch is shingled, the index streams. Oracle is
    // the BRUTE-FORCE cross-pair join — the one-sided prefix filter's
    // losslessness is gate-checked every run.
    "jaccard_probe" -> Q((s, d) => Dedup.jaccardProbe(s, d), Some("""
      WITH tok AS (SELECT doc_id,
          list_filter(string_split_regex(lower(text), '\s+'),
            x -> x <> '') AS w
        FROM documents),
      sh AS (SELECT DISTINCT doc_id,
          unnest(list_transform(range(1, len(w) - 1),
            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g
        FROM tok WHERE len(w) >= 3),
      sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
      i AS (SELECT a.doc_id AS new_doc, b.doc_id AS corpus_doc,
          count(*) AS inter
        FROM sh a JOIN sh b ON a.g = b.g
        WHERE a.doc_id % 7 = 0 AND b.doc_id % 7 <> 0
        GROUP BY 1, 2)
      SELECT new_doc, corpus_doc, inter, sa.n AS n_a, sb.n AS n_b,
        CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) AS jaccard
      FROM i JOIN sz sa ON sa.doc_id = new_doc
             JOIN sz sb ON sb.doc_id = corpus_doc
      WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.7
      ORDER BY new_doc, corpus_doc""")),

    // X67b — incremental containment probe: batch docs ≥ 0.9 contained
    // in a corpus doc, via the same persisted index. Brute-force
    // cross-pair oracle again.
    "containment_probe" ->
      Q((s, d) => Dedup.containmentProbe(s, d), Some("""
      WITH tok AS (SELECT doc_id,
          list_filter(string_split_regex(lower(text), '\s+'),
            x -> x <> '') AS w
        FROM documents),
      sh AS (SELECT DISTINCT doc_id,
          unnest(list_transform(range(1, len(w) - 1),
            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g
        FROM tok WHERE len(w) >= 3),
      sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
      i AS (SELECT a.doc_id AS new_doc, b.doc_id AS corpus_doc,
          count(*) AS inter
        FROM sh a JOIN sh b ON a.g = b.g
        WHERE a.doc_id % 7 = 0 AND b.doc_id % 7 <> 0
        GROUP BY 1, 2)
      SELECT new_doc, corpus_doc, inter, sa.n AS n_a, sb.n AS n_b,
        CAST(inter AS DOUBLE) / sa.n AS containment
      FROM i JOIN sz sa ON sa.doc_id = new_doc
             JOIN sz sb ON sb.doc_id = corpus_doc
      WHERE CAST(inter AS DOUBLE) / sa.n >= 0.9
      ORDER BY new_doc, corpus_doc""")),

    // X71 — exact edit-distance self-join (PassJoin partition filter).
    // The oracle is the BRUTE-FORCE levenshtein join (length prefilter
    // only, which is trivially lossless) — the engine's segment/
    // pigeonhole candidate filter claims losslessness, so the gate
    // checks it against ground truth every run, exactly like the
    // Jaccard prefix filter's contract.
    "edit_distance_join" ->
      Q((s, d) => EditDistance.editDistanceJoin(s, d), Some("""
      WITH d AS (SELECT doc_id, text, length(text) AS len
        FROM documents)
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        CAST(a.len AS BIGINT) AS len_a, CAST(b.len AS BIGINT) AS len_b,
        CAST(levenshtein(a.text, b.text) AS BIGINT) AS dist
      FROM d a JOIN d b
        ON a.doc_id < b.doc_id AND abs(a.len - b.len) <= 8
      WHERE levenshtein(a.text, b.text) <= 8
      ORDER BY doc_a, doc_b""")),

    // X71b — incremental edit-distance probe against the persisted
    // segment index (batch = doc_id%7==0, the probe convention).
    // Brute-force cross-pair oracle, same losslessness contract as
    // the self-join — both probe directions (corpus-shorter via the
    // persisted segments, batch-shorter via on-the-fly corpus
    // windows) are gate-checked against ground truth every run.
    "edit_distance_probe" ->
      Q((s, d) => EditDistance.editDistanceProbe(s, d), Some("""
      WITH d AS (SELECT doc_id, text, length(text) AS len
        FROM documents)
      SELECT a.doc_id AS new_doc, b.doc_id AS corpus_doc,
        CAST(a.len AS BIGINT) AS len_a, CAST(b.len AS BIGINT) AS len_b,
        CAST(levenshtein(a.text, b.text) AS BIGINT) AS dist
      FROM d a JOIN d b
        ON a.doc_id % 7 = 0 AND b.doc_id % 7 <> 0
          AND abs(a.len - b.len) <= 8
      WHERE levenshtein(a.text, b.text) <= 8
      ORDER BY new_doc, corpus_doc""")),

    "cosine_pairs" -> Q((s, d) => Similarity.cosinePairs(s, d), Some("""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
        FROM embeddings)
      SELECT a.vec_id AS a, b.vec_id AS b,
        list_dot_product(a.emb, b.emb) /
          (sqrt(list_dot_product(a.emb, a.emb)) *
           sqrt(list_dot_product(b.emb, b.emb))) AS score
      FROM e a, e b
      WHERE a.vec_id < b.vec_id
        AND list_dot_product(a.emb, b.emb) /
          (sqrt(list_dot_product(a.emb, a.emb)) *
           sqrt(list_dot_product(b.emb, b.emb))) > 0.4
      ORDER BY a, b""")),

    // X4 scale paths — the ANN operators a 100 TB corpus actually runs.
    // The IVF family carries the full shared [[ivfOracle]] (codebook
    // recomputed independently, float-downcast routing, exact scoring).
    // ann_lsh_pairs' md5-derived plane coefficients let the oracle
    // replay the whole pipeline: coefficient matrix (the engine's
    // md5Long32 twin), sequential-fold projections (list_dot_product —
    // same IEEE order as the fused codegen loop), sign-bit buckets,
    // banded candidate self-join, exact rescore. The recall-vs-brute
    // bound stays pinned in SimilaritySpec as defense in depth.
    "ann_lsh_pairs" -> Q((s, d) => Similarity.lshPairs(s, d), Some("""
      WITH coef AS (
        SELECT t.t, j.j, i.i,
          CAST(CAST(('0x' || substring(
              md5('hp:' || t.t || ':' || j.j || ':' || i.i), 1, 8))
            AS BIGINT) % 1000000 AS DOUBLE) / 1000000.0 - 0.5 AS c
        FROM range(0, 8) t(t), range(0, 8) j(j), range(0, 64) i(i)),
      cv AS (SELECT t, j, list(c ORDER BY i) AS cs FROM coef
             GROUP BY t, j),
      e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
            FROM embeddings),
      proj AS (SELECT e.vec_id, cv.t, cv.j,
          list_dot_product(e.emb, cv.cs) AS p
        FROM e, cv),
      sig AS (SELECT vec_id, t,
          sum(CASE WHEN p >= 0 THEN 1 << j ELSE 0 END) AS bucket
        FROM proj GROUP BY vec_id, t),
      pairs AS (SELECT DISTINCT a.vec_id AS a, b.vec_id AS b
        FROM sig a JOIN sig b ON a.t = b.t AND a.bucket = b.bucket
        WHERE a.vec_id < b.vec_id),
      scored AS (SELECT p.a, p.b,
          list_dot_product(ea.emb, eb.emb) /
            (sqrt(list_dot_product(ea.emb, ea.emb)) *
             sqrt(list_dot_product(eb.emb, eb.emb))) AS score
        FROM pairs p
        JOIN e ea ON ea.vec_id = p.a
        JOIN e eb ON eb.vec_id = p.b)
      SELECT a, b, score FROM scored WHERE score > 0.4
      ORDER BY a, b""")),
    // X61 — SemDeDup-style semantic dedup: coarse-codebook routing
    // (the proven IVF `assign` CTE, shared via [[ivfRouteCtes]]) +
    // exact within-cell cosine, drop-if-lower-id-neighbor. One row
    // per corpus vector with its keep/drop verdict.
    "semdedup" -> Q((s, d) => Similarity.semDedup(s, d), Some(s"""
      WITH ${ivfRouteCtes()},
      p AS (
        SELECT a.vec_id AS a_id, b.vec_id AS b_id
        FROM assign a
        JOIN assign b ON a.cell = b.cell AND a.vec_id < b.vec_id
        JOIN e ea ON ea.vec_id = a.vec_id
        JOIN e eb ON eb.vec_id = b.vec_id
        WHERE list_dot_product(ea.e, eb.e) /
              (sqrt(list_dot_product(ea.e, ea.e)) *
               sqrt(list_dot_product(eb.e, eb.e))) > 0.4),
      d AS (SELECT b_id AS vec_id, min(a_id) AS dup_of,
            count(*) AS n_near FROM p GROUP BY 1)
      SELECT s.vec_id, s.cell, d.dup_of IS NULL AS kept, d.dup_of,
        CAST(COALESCE(d.n_near, 0) AS BIGINT) AS n_near
      FROM assign s LEFT JOIN d USING (vec_id)
      ORDER BY s.vec_id""")),

    // X61b — semdedup with MULTI-PROBE pair generation: both sides
    // listed under their top-2 cells (crn <= 2 — the shared route
    // CTE's contract), pairs deduped before the verdict agg; reported
    // cell stays the crn-1 assignment. Closes semdedup's measured
    // straddle-miss class (recall table, SCALE_NOTES round 11).
    "semdedup_probe" -> Q(
      (s, d) => Similarity.semDedupProbe(s, d), Some(s"""
      WITH ${ivfRouteCtes()},
      a2 AS (SELECT vec_id, cell FROM route WHERE crn <= 2),
      p AS (
        SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
        FROM a2 a
        JOIN a2 b ON a.cell = b.cell AND a.vec_id < b.vec_id
        JOIN e ea ON ea.vec_id = a.vec_id
        JOIN e eb ON eb.vec_id = b.vec_id
        WHERE list_dot_product(ea.e, eb.e) /
              (sqrt(list_dot_product(ea.e, ea.e)) *
               sqrt(list_dot_product(eb.e, eb.e))) > 0.4),
      d AS (SELECT b_id AS vec_id, min(a_id) AS dup_of,
            count(*) AS n_near FROM p GROUP BY 1)
      SELECT s.vec_id, s.cell, d.dup_of IS NULL AS kept, d.dup_of,
        CAST(COALESCE(d.n_near, 0) AS BIGINT) AS n_near
      FROM assign s LEFT JOIN d USING (vec_id)
      ORDER BY s.vec_id""")),

    // X61c — TRUE greedy keep-first semdedup (the paper's retention
    // semantics; the registered semdedup rule transitively
    // over-prunes). The oracle REPLAYS the sequential greedy
    // recurrence one vertex per recursion step, carrying the kept set
    // as a list — an independent serial implementation of the
    // id-order schedule the engine runs as parallel rounds, so the
    // round algorithm's equivalence to the greedy definition is
    // gate-checked on real data every run.
    "semdedup_greedy" -> Q(
      (s, d) => Similarity.semDedupGreedy(s, d), Some(s"""
      WITH RECURSIVE ${ivfRouteCtes()},
      p AS (
        SELECT a.vec_id AS a_id, b.vec_id AS b_id
        FROM assign a
        JOIN assign b ON a.cell = b.cell AND a.vec_id < b.vec_id
        JOIN e ea ON ea.vec_id = a.vec_id
        JOIN e eb ON eb.vec_id = b.vec_id
        WHERE list_dot_product(ea.e, eb.e) /
              (sqrt(list_dot_product(ea.e, ea.e)) *
               sqrt(list_dot_product(eb.e, eb.e))) > 0.4),
      pv AS (SELECT v, row_number() OVER (ORDER BY v) AS rn
        FROM (SELECT a_id AS v FROM p UNION SELECT b_id FROM p)),
      greedy AS (
        SELECT 0 AS step, CAST([] AS BIGINT[]) AS kept
        UNION ALL
        SELECT g.step + 1,
          CASE WHEN EXISTS (SELECT 1 FROM p JOIN pv o
                ON p.b_id = o.v AND o.rn = g.step + 1
              WHERE list_contains(g.kept, p.a_id))
            THEN g.kept
            ELSE list_append(g.kept,
              (SELECT v FROM pv WHERE rn = g.step + 1)) END
        FROM greedy g WHERE g.step < (SELECT count(*) FROM pv)),
      fin AS (SELECT kept FROM greedy
        WHERE step = (SELECT count(*) FROM pv)),
      d AS (SELECT p.b_id AS vec_id, min(p.a_id) AS dup_of,
            count(*) AS n_near
        FROM p, fin
        WHERE list_contains(fin.kept, p.a_id)
          AND NOT list_contains(fin.kept, p.b_id)
        GROUP BY 1)
      SELECT s.vec_id, s.cell, d.dup_of IS NULL AS kept, d.dup_of,
        CAST(COALESCE(d.n_near, 0) AS BIGINT) AS n_near
      FROM assign s LEFT JOIN d USING (vec_id)
      ORDER BY s.vec_id""")),

    // X65 — embedding outliers: top-5 farthest-from-centroid vectors
    // per routed cell (squared-L2 expanded into three shared-fold
    // dots, centroid float-downcast like the routing codebook).
    "embedding_outliers" ->
      Q((s, d) => Similarity.embeddingOutliers(s, d), Some(s"""
      WITH ${ivfRouteCtes()},
      cbf AS (SELECT cell, centroid,
          list_dot_product(centroid, centroid) AS cc FROM cb),
      dm AS (SELECT a.vec_id, a.cell,
          list_dot_product(ee.e, ee.e)
            - 2 * list_dot_product(ee.e, c.centroid) + c.cc AS dist2
        FROM assign a
        JOIN e ee ON ee.vec_id = a.vec_id
        JOIN cbf c ON c.cell = a.cell),
      r AS (SELECT *, row_number() OVER (
            PARTITION BY cell ORDER BY dist2 DESC, vec_id) AS rn
        FROM dm)
      SELECT cell, vec_id, dist2, CAST(rn AS INTEGER) AS rn
      FROM r WHERE rn <= 5 ORDER BY cell, rn""")),

    // X66 — semantic eval-set decontamination: deterministic 2% eval
    // slice, best cell-local cosine match per remaining vector, flag
    // at tau. Shares the proven IVF routing CTEs; the md5 slice coin
    // is the engine's standard reproducible-bucket idiom.
    "semantic_decon" -> Q(
      (s, d) => Similarity.semanticDecontaminate(s, d), Some(s"""
      WITH ${ivfRouteCtes()},
      coin AS (SELECT vec_id,
          CAST(('0x' || substring(md5('sdecon:' ||
            CAST(vec_id AS VARCHAR)), 1, 8)) AS BIGINT) % 50 AS b
        FROM embeddings),
      ev AS (SELECT r.vec_id AS eval_id, r.cell, ee.e AS ee
        FROM route r JOIN e ee ON ee.vec_id = r.vec_id
        JOIN coin c ON c.vec_id = r.vec_id
        WHERE c.b = 0 AND r.crn <= 2),
      tr AS (SELECT a.vec_id, a.cell, ee.e
        FROM assign a JOIN e ee ON ee.vec_id = a.vec_id
        JOIN coin c ON c.vec_id = a.vec_id WHERE c.b <> 0),
      s AS (SELECT t.vec_id, v.eval_id,
          list_dot_product(t.e, v.ee) /
            (sqrt(list_dot_product(t.e, t.e)) *
             sqrt(list_dot_product(v.ee, v.ee))) AS score
        FROM tr t JOIN ev v ON v.cell = t.cell),
      r AS (SELECT *, row_number() OVER (PARTITION BY vec_id
          ORDER BY score DESC, eval_id) AS rn FROM s)
      SELECT vec_id, eval_id, score, score >= 0.6 AS contaminated
      FROM r WHERE rn = 1 ORDER BY vec_id""")),

    // X66b — semantic decon with BOTH-SIDES top-2 probing: the train
    // side lists under crn <= 2 like the eval side (duplicate pair
    // rows from doubly-shared cells collapse in the rank/max), the
    // straddle-recall fix the round-11 measurement motivated.
    "semantic_decon_probe" -> Q(
      (s, d) => Similarity.semanticDeconProbe(s, d), Some(s"""
      WITH ${ivfRouteCtes()},
      coin AS (SELECT vec_id,
          CAST(('0x' || substring(md5('sdecon:' ||
            CAST(vec_id AS VARCHAR)), 1, 8)) AS BIGINT) % 50 AS b
        FROM embeddings),
      ev AS (SELECT r.vec_id AS eval_id, r.cell, ee.e AS ee
        FROM route r JOIN e ee ON ee.vec_id = r.vec_id
        JOIN coin c ON c.vec_id = r.vec_id
        WHERE c.b = 0 AND r.crn <= 2),
      tr AS (SELECT r.vec_id, r.cell, ee.e
        FROM route r JOIN e ee ON ee.vec_id = r.vec_id
        JOIN coin c ON c.vec_id = r.vec_id
        WHERE c.b <> 0 AND r.crn <= 2),
      s AS (SELECT t.vec_id, v.eval_id,
          list_dot_product(t.e, v.ee) /
            (sqrt(list_dot_product(t.e, t.e)) *
             sqrt(list_dot_product(v.ee, v.ee))) AS score
        FROM tr t JOIN ev v ON v.cell = t.cell),
      r AS (SELECT *, row_number() OVER (PARTITION BY vec_id
          ORDER BY score DESC, eval_id) AS rn FROM s)
      SELECT vec_id, eval_id, score, score >= 0.6 AS contaminated
      FROM r WHERE rn = 1 ORDER BY vec_id""")),

    "ann_ivf_topk" -> Q((s, d) => Similarity.ivfTopK(s, d),
      Some(ivfOracle())),
    // Persisted-index serving split: build once (codebook +
    // cell-partitioned vectors), probe by reading ONLY the routed cell
    // directories. Same oracle as the inline form — the cached index
    // codebook is a different CentroidAgg realization, which the
    // oracle's float-downcast routing absorbs; SimilaritySpec
    // additionally pins probe ≡ ann_ivf_topk row-for-row.
    "ann_ivf_probe" -> Q((s, d) => Similarity.ivfProbeTopK(s, d),
      Some(ivfOracle())),

    // X4d — IVF APPEND maintenance: vec_id%11==0 vectors join a
    // freshly-built corpus index as appended cell files (codebook
    // unmoved), then the appended store is probed. The oracle builds
    // its codebook from the PRE-APPEND corpus slice only — the append
    // contract — and routes/scores ALL vectors with it, exactly the
    // appended store's content; SimilaritySpec additionally pins
    // probe-of-appended ≡ inline ivfTopK with the same codebook.
    "ann_ivf_append" -> Q((s, d) => Similarity.ivfAppend(s, d),
      Some(ivfOracle(cbWhere = "WHERE vec_id % 11 <> 0"))),

    // X31+X4 — quantized IVF serving: the probed cells are scored
    // against int8 codes through the exact replayable dequantization
    // (vmin + (code+0.5)·scale, the embedding_quantize arithmetic),
    // top RerankFactor·k per query survive to a full-precision
    // re-rank. The oracle recomputes codes from the raw vectors and
    // replays the same two-stage ranking.
    "ann_ivf_quantized" -> Q(
      (s, d) => Similarity.ivfQuantizedProbe(s, d), Some(s"""
      WITH ${ivfRouteCtes()},
      probes AS (SELECT vec_id AS q_id, cell FROM route
                 WHERE vec_id < 8 AND crn <= 2),
      q AS (SELECT vec_id AS q_id, e AS qe FROM e WHERE vec_id < 8),
      qz AS (SELECT vec_id, e,
          list_min(e) AS vmin,
          (list_max(e) - list_min(e)) / 255.0 AS scale
        FROM e),
      dq AS (SELECT vec_id,
          list_transform(e, x -> vmin + (CAST(
            CASE WHEN scale = 0 THEN 0
              ELSE least(255, CAST(floor((x - vmin) / scale) AS BIGINT))
            END AS DOUBLE) + 0.5) * scale) AS d
        FROM qz),
      sa AS (SELECT p.q_id, a.vec_id,
          list_dot_product(q.qe, d.d) /
            (sqrt(list_dot_product(q.qe, q.qe)) *
             sqrt(list_dot_product(d.d, d.d))) AS ascore
        FROM probes p
        JOIN q ON q.q_id = p.q_id
        JOIN assign a ON a.cell = p.cell
        JOIN dq d ON d.vec_id = a.vec_id
        WHERE a.vec_id <> p.q_id),
      ra AS (SELECT q_id, vec_id, row_number() OVER (
          PARTITION BY q_id ORDER BY ascore DESC, vec_id) AS arn
        FROM sa),
      cut AS (SELECT q_id, vec_id FROM ra
        WHERE arn <= ${Similarity.RerankFactor * 10}),
      s AS (SELECT cut.q_id, cut.vec_id,
          list_dot_product(q.qe, c.e) /
            (sqrt(list_dot_product(q.qe, q.qe)) *
             sqrt(list_dot_product(c.e, c.e))) AS score
        FROM cut JOIN q USING (q_id) JOIN e c ON c.vec_id = cut.vec_id),
      r AS (SELECT *, row_number() OVER (
              PARTITION BY q_id ORDER BY score DESC, vec_id) AS rn
        FROM s)
      SELECT q_id, vec_id, score, CAST(rn AS INTEGER) AS rn
      FROM r WHERE rn <= 10 ORDER BY q_id, rn""")),

    // X4e over the serving path — metadata-filtered probe of the
    // persisted IVF index: the label predicate prunes INSIDE the index
    // scan, composing with the static cell partition pruning. The
    // oracle applies the predicate to the probed cells' CANDIDATES
    // only (queries stay unfiltered), the pre-filter strategy both
    // engines implement; parity ≡ inline ivfTopK with the same
    // persisted codebook + predicate stays pinned in SimilaritySpec.
    "ann_filtered_probe" ->
      Q((s, d) => Similarity.filteredProbeTopK(s, d),
        Some(ivfOracle(candAnd = "AND c.label % 2 = 0"))),

    "token_counts" -> Q(TextAnalysis.tokenCounts, Some("""
      WITH d AS (SELECT doc_id, text,
          list_filter(string_split_regex(lower(text), '\s+'),
            x -> x <> '') AS w,
          regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9\s]') AS b
        FROM documents)
      SELECT doc_id,
        CAST(len(w) AS INTEGER) AS ws_tokens,
        CAST(len(b) AS INTEGER) AS bpe_tokens,
        CAST(length(text) AS INTEGER) AS n_chars_text,
        CAST(len(b) AS DOUBLE) / NULLIF(len(w), 0) AS tokens_per_word
      FROM d ORDER BY doc_id""")),

    // X111 — the cross-modal asset manifest: one row per document
    // with decoded counts/unit-sums over ALL THREE asset stores
    // (PPM image incl. up/br variants at doc_id ≡ 0/4 mod 8, WAV
    // audio at 2/6, Y4M video at 1/3/5). The oracle re-derives every
    // figure from the store-generation arithmetic — a decode drift
    // in any codec hash-fails here.
    "multimodal_manifest" -> Q(
      (s, d) => MediaManifest.multimodalManifest(s, d), Some(s"""
      WITH $assetArithCte
      SELECT doc_id, n_image, image_px, n_audio, audio_samples,
        n_video, video_frames, n_assets
      FROM mm ORDER BY doc_id""")),

    // X113 — multimodal sequence packing: seq_packing's shard/window
    // arithmetic with each document priced at text tokens + decoded
    // media token cost of its BASE assets (variants are re-encodes —
    // dedup's job, not the packer's). Integer token model both
    // engines replay exactly.
    "multimodal_pack" -> Q(
      (s, d) => MediaManifest.multimodalPack(s, d), Some {
        import MediaManifest._
        s"""
      WITH d AS (SELECT doc_id,
          CAST(len(list_filter(string_split_regex(lower(text), '\\s+'),
            x -> x <> '')) AS BIGINT) AS n_tok,
          md5('pack:' || CAST(doc_id AS VARCHAR)) AS h,
          CAST(CAST(('0x' || substring(
            md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
            % $PackShards AS INTEGER) AS shard,
          CAST(8 + doc_id % 9 AS BIGINT) AS w0,
          CAST(8 + (doc_id // 9) % 7 AS BIGINT) AS h0,
          CAST(240 + (doc_id % 5) * 60 AS BIGINT) AS ns,
          CAST(4 + doc_id % 4 AS BIGINT) AS nf
        FROM documents),
      m AS (SELECT doc_id, n_tok, h, shard,
          CAST((w0 * h0 + ${ImgPatchPx - 1}) // $ImgPatchPx
            + (ns + ${AudFrameSamples - 1}) // $AudFrameSamples
            + (nf * w0 * h0 + ${ImgPatchPx - 1}) // $ImgPatchPx
            AS BIGINT) AS media_tok
        FROM d),
      c AS (SELECT doc_id, shard, n_tok, media_tok,
          n_tok + media_tok AS total_tok,
          CAST(sum(n_tok + media_tok) OVER (
            PARTITION BY shard ORDER BY h, doc_id) AS BIGINT)
            AS cum_tok
        FROM m),
      p AS (SELECT doc_id, shard, n_tok, media_tok, total_tok,
          cum_tok,
          CAST(floor((cum_tok - total_tok) / ${PackBudget}.0)
            AS BIGINT) AS pack_id
        FROM c)
      SELECT doc_id, shard, n_tok, media_tok, total_tok, cum_tok,
        pack_id
      FROM p ORDER BY doc_id"""
      }),

    // X112 — cross-modal asset GC: the text dedup manifest's drop
    // list executed against ALL THREE asset stores (retire-then-link,
    // read-back manifest). The oracle re-derives every count AND the
    // retired unit mass from the drop chain + the store-generation
    // arithmetic, so a GC that linked or retired the wrong files
    // hash-fails.
    "asset_gc" -> Q(
      (s, d) => AssetGc.assetGc(s, d), Some(s"""
      WITH RECURSIVE $dedupDropCtes,
      $assetArithCte,
      mj AS (SELECT mm.*, (dr.doc_id IS NOT NULL) AS dropped
        FROM mm LEFT JOIN dr ON mm.doc_id = dr.doc_id)
      SELECT 'audio' AS modality,
        CAST(sum(n_audio) AS BIGINT) AS n_before,
        CAST(sum(CASE WHEN dropped THEN n_audio ELSE 0 END) AS BIGINT)
          AS n_removed,
        CAST(sum(CASE WHEN NOT dropped THEN n_audio ELSE 0 END)
          AS BIGINT) AS n_after,
        CAST(sum(CASE WHEN dropped THEN audio_samples ELSE 0 END)
          AS BIGINT) AS units_removed
      FROM mj
      UNION ALL
      SELECT 'image',
        CAST(sum(n_image) AS BIGINT),
        CAST(sum(CASE WHEN dropped THEN n_image ELSE 0 END) AS BIGINT),
        CAST(sum(CASE WHEN NOT dropped THEN n_image ELSE 0 END)
          AS BIGINT),
        CAST(sum(CASE WHEN dropped THEN image_px ELSE 0 END) AS BIGINT)
      FROM mj
      UNION ALL
      SELECT 'video',
        CAST(sum(n_video) AS BIGINT),
        CAST(sum(CASE WHEN dropped THEN n_video ELSE 0 END) AS BIGINT),
        CAST(sum(CASE WHEN NOT dropped THEN n_video ELSE 0 END)
          AS BIGINT),
        CAST(sum(CASE WHEN dropped THEN video_frames ELSE 0 END)
          AS BIGINT)
      FROM mj
      ORDER BY modality""")),

    "multimodal_media" -> Q(Multimodal.mediaFeatures, Some("""
      WITH m AS (SELECT doc_id AS media_id, lang, source, n_chars, text,
          CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes
        FROM documents)
      -- testdata text is pure ASCII (verified), so char slicing + encode
      -- equals byte slicing of the blob (DuckDB 1.0 lacks BLOB substring)
      SELECT media_id, lang, source, n_chars, n_bytes,
        sha256(text) AS content_sha,
        hex(encode(substring(text, 1, 8))) AS head_hex,
        hex(encode(substring(text, 1, 1))) AS frame_0,
        hex(encode(substring(text, n_bytes // 2, 1))) AS frame_mid,
        hex(encode(substring(text, n_bytes, 1))) AS frame_last
      FROM m ORDER BY media_id""")),

    // X16c — media resize: stride-4 byte decimation (the codec-free
    // spatial-downsample stand-in); the oracle recomputes the exact
    // resampled bytes and their sha256.
    "media_resize" -> Q((s, d) => Multimodal.mediaResize(s, d), Some("""
      WITH m AS (SELECT doc_id AS media_id, text,
          CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        FROM documents),
      -- decimation positions are CHARACTER-based on both engines
      -- (length(), not octet_length — they differ on non-ASCII text);
      -- a NULL payload propagates to NULL, matching the Spark side
      -- the CASE keeps NULL→NULL exact while COALESCE maps the empty
      -- payload's array_to_string([]) = NULL back to Spark's ''
      r AS (SELECT media_id, n_bytes,
          CASE WHEN text IS NULL THEN NULL
            ELSE COALESCE(array_to_string(list_transform(
              range(1, CAST(ceil(length(text) / 4.0) AS BIGINT) + 1),
              i -> substring(text, CAST((i - 1) * 4 + 1 AS INTEGER), 1)),
              ''), '')
          END AS rs
        FROM m)
      SELECT media_id, n_bytes,
        CAST(octet_length(encode(rs)) AS BIGINT) AS resized_bytes,
        sha256(rs) AS resized_sha
      FROM r ORDER BY media_id""")),

    // X16b — decode → embed → top-k media retrieval: the mapPartitions
    // decode stage's fake embedding is reproduced in SQL (first 32 md5
    // bits per feature, rounded through FLOAT exactly like the Scala
    // side), so the whole multimodal pipeline is oracle-checked
    // end-to-end, float rounding included.
    // Real-decode multimodal retrieval (round 10): the engine writes
    // one PPM (P6) asset per document — raster = the doc's ASCII
    // bytes repeated cyclically over a per-doc geometry (w = 8 +
    // id % 9, h = 8 + (id/9) % 7) — reads it back through binaryFile,
    // PARSES the header+raster for real (PpmCodec) and embeds pixel
    // statistics. The oracle replays the identical feature chain from
    // the generating text: per-channel integer sums/maxima over the
    // same cyclic raster (ord() of the ASCII char = the pixel byte —
    // ASCII-ness pinned by TablesSchemaSpec), one double division +
    // one float rounding per feature, then the same cosine top-k tail.
    "media_embed_topk" -> Q((s, d) => Multimodal.mediaEmbedTopK(s, d),
      Some("""
      WITH dims AS (SELECT doc_id AS media_id, text,
          CAST(8 + doc_id % 9 AS INT) AS w,
          CAST(8 + (doc_id // 9) % 7 AS INT) AS h
        FROM documents),
      -- per-byte stream with channel AND 2x2 tile membership (pixel
      -- p = i//3 at (x, y) = (p%w, p//w) lands in tile
      -- (2y//h)*2 + (2x//w)) — the round-11 patch-level features
      pb AS (SELECT media_id, w, h, CAST(i % 3 AS INT) AS ch,
          CAST((2 * ((i // 3) // w) // h) * 2
            + (2 * ((i // 3) % w) // w) AS INT) AS t,
          ord(substring(text, CAST(i % len(text) AS INT) + 1, 1)) AS b
        FROM (SELECT media_id, w, h, text,
                unnest(range(0, w * h * 3)) AS i
              FROM dims)),
      fs AS (SELECT media_id, w, h,
          sum(CASE WHEN ch = 0 THEN b END) AS s0,
          sum(CASE WHEN ch = 1 THEN b END) AS s1,
          sum(CASE WHEN ch = 2 THEN b END) AS s2,
          max(CASE WHEN ch = 0 THEN b END) AS x0,
          max(CASE WHEN ch = 1 THEN b END) AS x1,
          max(CASE WHEN ch = 2 THEN b END) AS x2,
          sum(b) AS st
        FROM pb GROUP BY 1, 2, 3),
      ts AS (SELECT media_id, t,
          sum(CASE WHEN ch = 0 THEN b END) AS t0,
          sum(CASE WHEN ch = 1 THEN b END) AS t1,
          sum(CASE WHEN ch = 2 THEN b END) AS t2,
          count(CASE WHEN ch = 0 THEN 1 END) AS tn
        FROM pb GROUP BY 1, 2),
      tm AS (SELECT media_id,
          list(CAST(CAST(t0 AS DOUBLE) / tn AS FLOAT) ORDER BY t) AS m0,
          list(CAST(CAST(t1 AS DOUBLE) / tn AS FLOAT) ORDER BY t) AS m1,
          list(CAST(CAST(t2 AS DOUBLE) / tn AS FLOAT) ORDER BY t) AS m2
        FROM ts GROUP BY 1),
      emb AS (SELECT fs.media_id, CAST([
          CAST(CAST(s0 AS DOUBLE) / (w * h) AS FLOAT),
          CAST(CAST(s1 AS DOUBLE) / (w * h) AS FLOAT),
          CAST(CAST(s2 AS DOUBLE) / (w * h) AS FLOAT),
          CAST(x0 AS FLOAT), CAST(x1 AS FLOAT), CAST(x2 AS FLOAT),
          CAST(CAST(w AS DOUBLE) / h AS FLOAT),
          CAST(CAST(st AS DOUBLE) / (3 * w * h) AS FLOAT),
          m0[1], m1[1], m2[1], m0[2], m1[2], m2[2],
          m0[3], m1[3], m2[3], m0[4], m1[4], m2[4]]
          AS FLOAT[]) AS fe
        FROM fs JOIN tm USING (media_id)),
      e2 AS (SELECT media_id, CAST(fe AS DOUBLE[]) AS e FROM emb),
      q AS (SELECT media_id AS q_id, e AS qe FROM e2 WHERE media_id < 4),
      s AS (SELECT q_id, media_id AS vec_id,
          list_dot_product(qe, e) /
            (sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(e, e)))
            AS score
        FROM e2, q WHERE media_id <> q_id),
      r AS (SELECT *, row_number() OVER (
              PARTITION BY q_id ORDER BY score DESC, vec_id) AS rn FROM s)
      SELECT q_id, vec_id, score, CAST(rn AS INTEGER) AS rn
      FROM r WHERE rn <= 5 ORDER BY q_id, rn""")),

    "pivot_orders" -> Q(Reshape.pivotOrders, Some {
      def cnt(s: String) =
        s"count(CASE WHEN o_orderstatus = '$s' THEN 1 END)"
      def psum(s: String) =
        s"""CAST(CAST(sum(CASE WHEN o_orderstatus = '$s'
           THEN CAST(o_totalprice AS DECIMAL(30,8)) END) AS VARCHAR)
           AS DOUBLE)"""
      s"""
      SELECT o_orderpriority,
        ${cnt("F")} AS n_f, ${psum("F")} AS price_f,
        ${cnt("O")} AS n_o, ${psum("O")} AS price_o,
        ${cnt("P")} AS n_p, ${psum("P")} AS price_p
      FROM orders GROUP BY 1 ORDER BY 1"""
    }),

    "unpivot_metrics" -> Q(Reshape.unpivotMetrics, Some(s"""
      WITH w AS (SELECT l_returnflag,
          ${osum("l_quantity")} AS qty,
          ${osum("l_extendedprice")} AS price,
          ${osum("l_discount")} AS disc
        FROM lineitem GROUP BY 1)
      SELECT l_returnflag, 'qty' AS metric, qty AS value FROM w
      UNION ALL
      SELECT l_returnflag, 'price' AS metric, price AS value FROM w
      UNION ALL
      SELECT l_returnflag, 'disc' AS metric, disc AS value FROM w
      ORDER BY l_returnflag, metric""")),

    // Approx-percentile twin, gate form: the GK sketch value is
    // engine-specific, but its rank-error contract is audited
    // in-engine (rank interval of the returned element vs
    // p·n ± n/accuracy) and emitted as booleans next to exact
    // min/max/count — every column DuckDB-reproducible. The pure
    // one-pass serving form stays Reshape.percentilesApprox,
    // error-bounded in ReshapeSpec.
    "percentiles_approx" ->
      Q((s, d) => Reshape.percentilesApproxGate(s, d), Some("""
      SELECT l_returnflag, min(l_quantity) AS q_min,
        max(l_quantity) AS q_max, count(*) AS n,
        true AS p50_ok, true AS p90_ok, true AS p99_ok
      FROM lineitem GROUP BY 1 ORDER BY 1""")),

    "percentiles" -> Q(Reshape.percentiles, Some("""
      SELECT l_returnflag,
        quantile_cont(l_quantity, 0.5) AS p50,
        quantile_cont(l_quantity, 0.9) AS p90,
        quantile_cont(l_quantity, 0.99) AS p99,
        min(l_quantity) AS q_min, max(l_quantity) AS q_max,
        count(*) AS n
      FROM lineitem GROUP BY 1 ORDER BY 1""")),

    "array_suite" -> Q(Reshape.arraySuite, Some {
      val sum8 = (1 to 8).map(i => s"a8[$i]").mkString(" + ")
      val sumsq8 = (1 to 8).map(i => s"a8[$i]*a8[$i]").mkString(" + ")
      s"""
      WITH e AS (SELECT vec_id,
          (CAST(embedding AS DOUBLE[]))[1:8] AS a8 FROM embeddings)
      SELECT vec_id,
        CAST(len(a8) AS INTEGER) AS n,
        a8[1] AS first_el,
        a8[8] AS last_el,
        list_sort(a8)[1] AS sorted_min,
        list_sort(a8)[8] AS sorted_max,
        list_min(a8) AS a_min,
        list_max(a8) AS a_max,
        CAST(len(list_filter(a8, x -> x > 0.0)) AS INTEGER) AS n_pos,
        $sum8 AS sum8,
        $sumsq8 AS sumsq8
      FROM e ORDER BY vec_id"""
    }),

    // Deterministic 80/10/10 split assignment: the oracle re-derives
    // every doc's split from the same md5 bucket, so a green row pins
    // the full assignment (not just the counts' plausibility).
    "train_split" -> Q((s, d) => Reshape.trainSplit(s, d), Some("""
      WITH b AS (SELECT source, n_chars,
          CAST(('0x' || substring(md5('split:' || CAST(doc_id AS VARCHAR)),
            1, 8)) AS BIGINT) % 100 AS bucket
        FROM documents)
      SELECT source,
        CASE WHEN bucket < 80 THEN 'train'
          WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
        count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
      FROM b GROUP BY 1, 2 ORDER BY 1, 2""")),

    // X72 — leakage-safe split: the train/val/test coin keyed by the
    // NEAR-DUP GROUP label (dedup_groups' components; singletons =
    // own id), so near-duplicates can never straddle the train/eval
    // boundary. Oracle = the proven dedup_groups recursive-CTE
    // component chain + the md5 split coin over the group label; the
    // full per-doc assignment is pinned row-for-row.
    "leakage_safe_split" ->
      Q((s, d) => Reshape.leakageSafeSplit(s, d), Some("""
      WITH RECURSIVE tok AS (SELECT doc_id,
          list_filter(string_split_regex(lower(text), '\s+'),
            x -> x <> '') AS w
        FROM documents),
      sh AS (SELECT DISTINCT doc_id,
          unnest(list_transform(range(1, len(w) - 1),
            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle
        FROM tok WHERE len(w) >= 3),
      sig AS (SELECT doc_id, b.band,
          min(md5(b.band || ':' || shingle)) AS sig
        FROM sh, (SELECT unnest(range(0, 8)) AS band) b GROUP BY 1, 2),
      pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM sig a JOIN sig b
          ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
        GROUP BY 1, 2 HAVING count(*) >= 4),
      edges AS (SELECT doc_a AS s, doc_b AS d FROM pairs
        UNION SELECT doc_b, doc_a FROM pairs),
      walk AS (
        SELECT s, d FROM edges
        UNION
        SELECT w.s, e.d FROM walk w JOIN edges e ON w.d = e.s),
      lbl AS (SELECT s AS doc_id, least(s, min(d)) AS group_id
        FROM walk GROUP BY s),
      g AS (SELECT d.doc_id,
          COALESCE(l.group_id, d.doc_id) AS group_id
        FROM documents d LEFT JOIN lbl l USING (doc_id)),
      b AS (SELECT doc_id, group_id,
          CAST(('0x' || substring(md5('lsplit:' ||
            CAST(group_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS bucket
        FROM g)
      SELECT doc_id, group_id,
        CASE WHEN bucket < 80 THEN 'train'
          WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split
      FROM b ORDER BY doc_id""")),

    "sample_stratified" -> Q(Reshape.sampleStratified, Some("""
      WITH s AS (SELECT c_custkey, c_mktsegment, c_acctbal,
          CAST(('0x' || substring(md5('smpl:' || CAST(c_custkey AS VARCHAR)),
            1, 8)) AS BIGINT) % 100 AS bucket
        FROM customer)
      SELECT c_custkey, c_mktsegment, c_acctbal,
        CAST(bucket AS INTEGER) AS bucket
      FROM s
      WHERE bucket < CASE WHEN c_mktsegment = 'BUILDING' THEN 20 ELSE 5 END
      ORDER BY c_custkey""")),

    // X20b — exact-k deterministic stratified take (the eval-set /
    // few-shot-pool shape): exactly min(k, |stratum|) docs per lang by
    // content-derived md5 rank — rate-based sample_stratified's
    // exact-count sibling. Rank + window both md5Long32-twinnable.
    "take_stratified" -> Q((s, d) => Reshape.takeStratified(s, d), Some("""
      WITH r AS (SELECT lang, doc_id, n_chars,
          row_number() OVER (PARTITION BY lang ORDER BY
            CAST(('0x' || substring(
              md5('take:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT),
            doc_id) AS rn
        FROM documents)
      SELECT lang, CAST(rn AS INTEGER) AS rn, doc_id, n_chars
      FROM r WHERE rn <= 25 ORDER BY lang, rn""")),

    // X36b — cumulative-share coverage selection: the minimal prefix
    // of sources (by token mass) covering >= 90% of corpus tokens —
    // the corpus-audit decision domain_mix_sample acts on. Window
    // state is source-cardinality-sized, never corpus-sized.
    "coverage_select" -> Q((s, d) => Reshape.coverageSelect(s, d), Some("""
      WITH s AS (SELECT source,
          CAST(sum(len(list_filter(string_split_regex(lower(text), '\s+'),
            x -> x <> ''))) AS BIGINT) AS tokens
        FROM documents GROUP BY 1),
      c AS (SELECT source, tokens,
          sum(tokens) OVER (ORDER BY tokens DESC, source
            ROWS UNBOUNDED PRECEDING) AS cum_tokens,
          sum(tokens) OVER () AS total FROM s)
      SELECT source, tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
      FROM c
      WHERE CAST(cum_tokens - tokens AS DOUBLE) < 0.9 * CAST(total AS DOUBLE)
      ORDER BY tokens DESC, source""")),

    "range_join" -> Q(Reshape.rangeJoinBucketed, Some(s"""
      WITH m AS (
        SELECT e.event_id, count(*) AS n_orders,
          ${osum("o.o_totalprice")} AS sum_price
        FROM events e JOIN orders o
          ON e.user_id = o.o_custkey
         AND o.o_orderdate >= e.ts - INTERVAL 7 DAY
         AND o.o_orderdate <= e.ts
        GROUP BY 1)
      SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
        COALESCE(m.n_orders, 0) AS n_orders, m.sum_price
      FROM events e LEFT JOIN m USING (event_id)
      ORDER BY event_id""")),

    "dedup_groups" -> Q((s, d) => Dedup.dedupGroups(s, d), Some("""
      WITH RECURSIVE tok AS (SELECT doc_id,
          list_filter(string_split_regex(lower(text), '\s+'),
            x -> x <> '') AS w
        FROM documents),
      sh AS (SELECT DISTINCT doc_id,
          unnest(list_transform(range(1, len(w) - 1),
            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle
        FROM tok WHERE len(w) >= 3),
      sig AS (SELECT doc_id, b.band,
          min(md5(b.band || ':' || shingle)) AS sig
        FROM sh, (SELECT unnest(range(0, 8)) AS band) b GROUP BY 1, 2),
      pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM sig a JOIN sig b
          ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
        GROUP BY 1, 2 HAVING count(*) >= 4),
      edges AS (SELECT doc_a AS s, doc_b AS d FROM pairs
        UNION SELECT doc_b, doc_a FROM pairs),
      walk AS (
        SELECT s, d FROM edges
        UNION
        SELECT w.s, e.d FROM walk w JOIN edges e ON w.d = e.s),
      lbl AS (SELECT s AS doc_id, least(s, min(d)) AS group_id
        FROM walk GROUP BY s),
      sz AS (SELECT group_id, count(*) AS grp_size FROM lbl GROUP BY 1)
      SELECT l.doc_id, l.group_id, s.grp_size
      FROM lbl l JOIN sz s USING (group_id)
      ORDER BY l.doc_id""")),

    // X79 — cross-source near-dup overlap matrix: unordered source
    // pairs normalized lo ≤ hi; the pairs CTE is the proven LSH
    // replay (no components needed — cells aggregate raw pairs).
    "source_overlap_matrix" -> Q(
      (s, d) => Dedup.sourceOverlapMatrix(s, d), Some("""
      WITH tok AS (SELECT doc_id,
          list_filter(string_split_regex(lower(text), '\s+'),
            x -> x <> '') AS w
        FROM documents),
      sh AS (SELECT DISTINCT doc_id,
          unnest(list_transform(range(1, len(w) - 1),
            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle
        FROM tok WHERE len(w) >= 3),
      sig AS (SELECT doc_id, b.band,
          min(md5(b.band || ':' || shingle)) AS sig
        FROM sh, (SELECT unnest(range(0, 8)) AS band) b GROUP BY 1, 2),
      pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM sig a JOIN sig b
          ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
        GROUP BY 1, 2 HAVING count(*) >= 4),
      m AS (SELECT doc_id, source, n_chars FROM documents),
      e AS (SELECT least(a.source, b.source) AS source_lo,
          greatest(a.source, b.source) AS source_hi,
          a.n_chars + b.n_chars AS ch
        FROM pairs p JOIN m a ON p.doc_a = a.doc_id
          JOIN m b ON p.doc_b = b.doc_id)
      SELECT source_lo, source_hi, count(*) AS n_pairs,
        CAST(sum(ch) AS BIGINT) AS pair_chars
      FROM e GROUP BY 1, 2 ORDER BY 1, 2""")),

    // X76 — canonical consolidation per near-dup group (keeper +
    // provenance + singleton rows). Components replay via the proven
    // recursive CTE; the sources list sorts on both engines before
    // joining, so the string is deterministic.
    "dedup_canonical" -> Q(
      (s, d) => Dedup.dedupCanonical(s, d), Some("""
      WITH RECURSIVE tok AS (SELECT doc_id,
          list_filter(string_split_regex(lower(text), '\s+'),
            x -> x <> '') AS w
        FROM documents),
      sh AS (SELECT DISTINCT doc_id,
          unnest(list_transform(range(1, len(w) - 1),
            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle
        FROM tok WHERE len(w) >= 3),
      sig AS (SELECT doc_id, b.band,
          min(md5(b.band || ':' || shingle)) AS sig
        FROM sh, (SELECT unnest(range(0, 8)) AS band) b GROUP BY 1, 2),
      pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM sig a JOIN sig b
          ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
        GROUP BY 1, 2 HAVING count(*) >= 4),
      edges AS (SELECT doc_a AS s, doc_b AS d FROM pairs
        UNION SELECT doc_b, doc_a FROM pairs),
      walk AS (
        SELECT s, d FROM edges
        UNION
        SELECT w.s, e.d FROM walk w JOIN edges e ON w.d = e.s),
      lbl AS (SELECT s AS doc_id, least(s, min(d)) AS group_id
        FROM walk GROUP BY s),
      g AS (SELECT d.doc_id, d.source, d.n_chars,
          COALESCE(l.group_id, d.doc_id) AS group_id
        FROM documents d LEFT JOIN lbl l USING (doc_id))
      SELECT group_id, min(doc_id) AS canonical_doc,
        count(*) AS n_members,
        count(DISTINCT source) AS n_sources,
        string_agg(DISTINCT source, ',' ORDER BY source) AS sources,
        CAST(sum(n_chars) AS BIGINT) AS sum_chars
      FROM g GROUP BY 1 ORDER BY 1""")),

    // X76b — the canonical manifest APPLIED: non-canonical near-dup
    // members dropped from the lake via the takedown retire-then-
    // rewrite; n_after is read BACK from the rewritten corpus, so the
    // oracle's n_before - n_removed arithmetic hash-checks the WRITE.
    "dedup_apply" -> Q(
      (s, d) => Takedown.dedupApply(s, d), Some(s"""
      WITH RECURSIVE $dedupDropCtes,
      b AS (SELECT d.source, count(*) AS n_before,
          CAST(sum(CASE WHEN dr.doc_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_removed,
          CAST(sum(CASE WHEN dr.doc_id IS NOT NULL THEN d.n_chars END)
            AS BIGINT) AS removed_chars
        FROM documents d LEFT JOIN dr ON d.doc_id = dr.doc_id
        GROUP BY 1)
      SELECT source, n_before, n_removed,
        n_before - n_removed AS n_after,
        COALESCE(removed_chars, 0) AS removed_chars
      FROM b ORDER BY source""")),

    // X77 — per-language calibrated length-outlier report: exact
    // percentile bounds (quantile_cont twin) + per-doc verdicts. The
    // join is NULL-SAFE (IS NOT DISTINCT FROM): a null-lang doc keeps
    // its verdict against the null stratum instead of vanishing.
    "length_outliers" -> Q(
      (s, d) => QualitySignals.lengthOutliers(s, d), Some("""
      WITH b AS (SELECT lang,
          quantile_cont(n_chars, 0.02) AS lo,
          quantile_cont(n_chars, 0.98) AS hi
        FROM documents GROUP BY 1)
      SELECT d.doc_id, d.lang, d.n_chars, b.lo, b.hi,
        d.n_chars >= b.lo AND d.n_chars <= b.hi AS keep
      FROM documents d JOIN b ON d.lang IS NOT DISTINCT FROM b.lang
      ORDER BY d.doc_id""")),

    "scrub_normalize" -> Q(TextAnalysis.scrubNormalize, Some("""
      WITH d AS (SELECT doc_id, lang,
          list_filter(string_split_regex(lower(text), '\s+'),
            x -> x <> '') AS w
        FROM documents),
      k AS (SELECT doc_id, lang, w,
          list_filter(w, x -> NOT list_contains(
            ['the','a','of','and','to'], x) AND length(x) >= 2) AS k
        FROM d),
      c AS (SELECT doc_id, lang, w, k,
          CASE WHEN len(k) <= 1 THEN k
          ELSE k[1:1] || list_filter(
            list_transform(range(2, len(k) + 1),
              i -> CASE WHEN k[i] <> k[i-1] THEN k[i] END),
            x -> x IS NOT NULL)
          END AS c
        FROM k)
      SELECT doc_id, lang,
        CAST(len(w) AS INTEGER) AS n_raw,
        CAST(len(k) AS INTEGER) AS n_kept,
        CAST(len(c) AS INTEGER) AS n_collapsed,
        CAST(len(w) - len(k) AS INTEGER) AS n_stopped,
        CAST(len(k) - len(c) AS INTEGER) AS n_repeats,
        -- COALESCE: concat_ws on the Spark side yields '' for an
        -- all-stopword (empty/NULL) token list; array_to_string → NULL
        md5(COALESCE(array_to_string(c, ' '), '')) AS scrub_fp,
        COALESCE(array_to_string(c[1:5], ' '), '') AS head5
      FROM c ORDER BY doc_id""")),

    "scalar_suite" -> Q(Analytics.scalarSuite, Some("""
      SELECT o_orderkey,
        CAST(year(o_orderdate) AS INTEGER) AS yr,
        CAST(month(o_orderdate) AS INTEGER) AS mo,
        CAST(day(o_orderdate) AS INTEGER) AS dom,
        epoch_us(date_trunc('month', o_orderdate)) AS month_start_us,
        CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31')
          AS INTEGER) AS days_to_eoy,
        concat_ws('|', o_orderstatus, o_orderpriority) AS tag,
        upper(substring(o_orderpriority, 1, 4)) AS prio4,
        CAST(CAST(o_totalprice AS DECIMAL(18,1)) AS DOUBLE) AS price_r1,
        abs(o_totalprice - 100000.0) AS dist_100k,
        CAST(floor(o_totalprice / 1000.0) AS BIGINT) AS price_kbin
      FROM orders WHERE o_orderkey % 97 = 0 ORDER BY o_orderkey""")),

    // Corpus-level statistics (CorpusStats.scala). DuckDB reproduces
    // the 32-bit md5-prefix hash with an explicit hex-digit fold (no
    // conv() in DuckDB 1.0); all ratios are single double divisions of
    // exact integers, so values hash-match bit-for-bit.
    "kmv_distinct" -> Q((s, d) => CorpusStats.kmvDistinct(s, d), Some("""
      WITH words AS (SELECT DISTINCT lang,
          unnest(list_filter(string_split_regex(lower(text), '\s+'),
            x -> x <> '')) AS word
        FROM documents),
      hashed AS (SELECT lang, word,
          CAST(list_sum(list_transform(range(1, 9), i ->
            (strpos('0123456789abcdef',
               substring(md5(word), i, 1)) - 1) * 16.0**(8 - i)))
            AS BIGINT) AS hv
        FROM words),
      ranked AS (SELECT lang, hv,
          row_number() OVER (PARTITION BY lang ORDER BY hv, word) AS rn
        FROM hashed),
      kth AS (SELECT lang, hv AS kth_hv FROM ranked WHERE rn = 64),
      exact AS (SELECT lang, count(*) AS exact_distinct
        FROM words GROUP BY 1)
      SELECT e.lang, e.exact_distinct,
        coalesce((63.0 * 4294967296.0) / CAST(kth_hv AS DOUBLE),
          CAST(exact_distinct AS DOUBLE)) AS kmv_estimate
      FROM exact e LEFT JOIN kth k ON e.lang = k.lang
      ORDER BY e.lang""")),

    "tfidf_top_terms" -> Q((s, d) => CorpusStats.tfidfTopTerms(s, d), Some("""
      WITH tok AS (SELECT doc_id,
          unnest(list_filter(string_split_regex(lower(text), '\s+'),
            x -> x <> '')) AS term
        FROM documents),
      dt AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
      dfreq AS (SELECT term, count(*) AS df FROM dt GROUP BY 1),
      n AS (SELECT count(*) AS n_docs FROM documents),
      scored AS (SELECT dt.doc_id, dt.term, dt.tf, dfreq.df,
          CAST(dt.tf AS DOUBLE) *
            (CAST(n.n_docs AS DOUBLE) / CAST(dfreq.df AS DOUBLE)) AS score
        FROM dt JOIN dfreq USING (term) CROSS JOIN n
        WHERE dt.doc_id % 50 = 0),
      ranked AS (SELECT *, row_number() OVER (PARTITION BY doc_id
          ORDER BY score DESC, term) AS rank FROM scored)
      SELECT doc_id, CAST(rank AS INTEGER) AS rank, term, tf, df, score
      FROM ranked WHERE rank <= 5 ORDER BY doc_id, rank""")),

    // BM25-shaped retrieval (raw Lucene idf argument — no ln, which is
    // not bit-identical cross-engine; tf saturation + length norm are
    // standard k1=1.2, b=0.75). Both engines build the identical
    // arithmetic tree per factor, and the per-doc sum goes through
    // decimal so partition order can't change the hash.
    "bm25_search" -> Q((s, d) => CorpusStats.bm25Search(s, d), Some("""
      WITH tok AS (SELECT doc_id,
          list_filter(string_split_regex(lower(text), '\s+'),
            x -> x <> '') AS w
        FROM documents),
      d AS (SELECT doc_id, len(w) AS dl, w FROM tok),
      stats AS (SELECT count(*) AS n_docs,
          CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM d),
      terms AS (SELECT doc_id, dl, u.term FROM d, unnest(w) AS u(term)
        WHERE u.term IN ('join', 'window', 'dup')),
      tf AS (SELECT doc_id, dl, term, count(*) AS tf
        FROM terms GROUP BY 1, 2, 3),
      dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      scored AS (SELECT tf.doc_id,
          ((CAST(n_docs - df AS DOUBLE) + 0.5) /
            (CAST(df AS DOUBLE) + 0.5) + 1.0) *
          ((CAST(tf AS DOUBLE) * (1.2 + 1.0)) /
            (CAST(tf AS DOUBLE) +
              1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / avgdl))))
          AS term_score
        FROM tf JOIN dfreq USING (term) CROSS JOIN stats)
      SELECT doc_id, count(*) AS n_matched,
        CAST(CAST(sum(CAST(term_score AS DECIMAL(30,8))) AS VARCHAR)
          AS DOUBLE) AS score
      FROM scored GROUP BY 1 ORDER BY score DESC, doc_id LIMIT 20""")),

    "inverted_index" -> Q((s, d) => CorpusStats.invertedIndex(s, d), Some("""
      WITH postings AS (SELECT DISTINCT doc_id,
          unnest(list_filter(string_split_regex(lower(text), '\s+'),
            x -> x <> '')) AS term
        FROM documents),
      h AS (SELECT term, doc_id,
          CAST(list_sum(list_transform(range(1, 9), i ->
            (strpos('0123456789abcdef',
               substring(md5(CAST(doc_id AS VARCHAR)), i, 1)) - 1)
              * 16.0**(8 - i))) AS BIGINT) AS hv
        FROM postings)
      SELECT term, count(*) AS df, min(doc_id) AS min_doc,
        max(doc_id) AS max_doc, bit_xor(hv) AS posting_fp
      FROM h GROUP BY 1 HAVING count(*) >= 20 ORDER BY term""")),

    "bigram_novelty" -> Q((s, d) => CorpusStats.bigramNovelty(s, d), Some("""
      WITH d AS (SELECT doc_id,
          list_filter(string_split_regex(lower(text), '\s+'),
            x -> x <> '') AS w
        FROM documents),
      g AS (SELECT doc_id, unnest(list_distinct(
          CASE WHEN len(w) >= 2 THEN list_transform(range(1, len(w)),
            i -> w[i] || ' ' || w[i + 1]) ELSE [] END)) AS g
        FROM d),
      gdf AS (SELECT g, count(*) AS gdf FROM g GROUP BY 1)
      SELECT doc_id, count(*) AS n_bigrams,
        CAST(sum(CASE WHEN gdf.gdf = 1 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_unique,
        CAST(sum(CASE WHEN gdf.gdf = 1 THEN 1 ELSE 0 END) AS DOUBLE) /
          CAST(count(*) AS DOUBLE) AS novelty,
        CAST(CAST(sum(gdf.gdf) AS BIGINT) AS DOUBLE) /
          CAST(count(*) AS DOUBLE) AS mean_df
      FROM g JOIN gdf USING (g) GROUP BY doc_id ORDER BY doc_id""")),

    // Corpus quality signals (QualitySignals.scala): repetition
    // scoring, eval-set decontamination, Zipf frequency spectrum.
    "ngram_repetition" -> Q(
      (s, d) => QualitySignals.ngramRepetition(s, d), Some("""
      WITH d AS (SELECT doc_id,
          list_filter(string_split_regex(lower(text), '\s+'),
            x -> x <> '') AS w
        FROM documents),
      dd AS (SELECT doc_id, w FROM d WHERE len(w) >= 3),
      bg AS (SELECT doc_id, unnest(list_transform(range(1, len(w)),
          i -> w[i] || ' ' || w[i + 1])) AS g FROM dd),
      bgc AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2),
      bi AS (SELECT doc_id, max(c) AS top_bigram_n,
          CAST(sum(c) AS BIGINT) AS n_bigrams FROM bgc GROUP BY 1),
      tg AS (SELECT doc_id, unnest(list_transform(range(1, len(w) - 1),
          i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])) AS g FROM dd),
      tri AS (SELECT doc_id, count(*) AS n_trigrams,
          count(DISTINCT g) AS n_distinct_trigrams FROM tg GROUP BY 1)
      SELECT bi.doc_id, n_bigrams, top_bigram_n,
        CAST(top_bigram_n AS DOUBLE) / CAST(n_bigrams AS DOUBLE)
          AS top_bigram_frac,
        n_trigrams, n_distinct_trigrams,
        CAST(n_trigrams - n_distinct_trigrams AS DOUBLE) /
          CAST(n_trigrams AS DOUBLE) AS dup_trigram_frac
      FROM bi JOIN tri ON bi.doc_id = tri.doc_id
      ORDER BY bi.doc_id""")),

    // X102 — Gopher rule battery with REASONS: every rule evaluated,
    // failed names sorted and '+'-joined, pass verdict. Thresholds
    // interpolate from the shared constants; ratio rules on token-less
    // docs evaluate NULL → not-failed (word_count catches them), and
    // the repetition rules pass vacuously below 2/3 tokens — the same
    // CASE semantics both engines replay.
    "gopher_rules" -> Q(
      (s, d) => QualitySignals.gopherRules(s, d), Some(s"""
      WITH d AS (SELECT doc_id,
          list_filter(string_split_regex(lower(text), '\\s+'),
            x -> x <> '') AS w
        FROM documents),
      ${gopherCtes("d", "")}
      SELECT doc_id, n_words,
        array_to_string(list_sort(fails), '+') AS failed,
        (len(fails) = 0) AS pass
      FROM fl ORDER BY doc_id""")),

    "decontaminate" -> Q(
      (s, d) => QualitySignals.decontaminate(s, d), Some("""
      WITH d AS (SELECT doc_id,
          list_filter(string_split_regex(lower(text), '\s+'),
            x -> x <> '') AS w
        FROM documents),
      sh AS (SELECT DISTINCT doc_id,
          unnest(list_transform(range(1, len(w) - 3), i ->
            w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' ||
            w[i+3] || ' ' || w[i+4])) AS shingle
        FROM d WHERE len(w) >= 5),
      ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0),
      tr AS (SELECT s.doc_id, count(*) AS n_shingles,
          CAST(sum(CASE WHEN ev.shingle IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_overlap
        FROM sh s LEFT JOIN ev ON s.shingle = ev.shingle
        WHERE s.doc_id % 97 <> 0 GROUP BY 1)
      SELECT doc_id, n_shingles, n_overlap,
        CAST(n_overlap AS DOUBLE) / CAST(n_shingles AS DOUBLE)
          AS overlap_frac
      FROM tr WHERE n_overlap > 0 ORDER BY doc_id""")),

    // X64 — word-rarity quality score: mean inverse unigram
    // probability (log-free perplexity proxy — transcendental log is
    // a cross-engine last-ulp risk) + hapax count; decimal-accumulated
    // mean so partition order can't move a bit.
    "word_rarity" -> Q(
      (s, d) => QualitySignals.wordRarity(s, d), Some("""
      WITH wds AS (SELECT doc_id, unnest(list_filter(
          string_split_regex(lower(text), '\s+'), x -> x <> ''))
          AS word FROM documents),
      fr AS (SELECT word, count(*) AS f FROM wds GROUP BY 1),
      tot AS (SELECT CAST(sum(f) AS DOUBLE) AS total FROM fr)
      SELECT doc_id, count(*) AS n_words,
        CAST(sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_hapax,
        CAST(CAST(sum(CAST(total / f AS DECIMAL(30,8))) AS VARCHAR)
          AS DOUBLE) / count(*) AS mean_inv_p
      FROM wds JOIN fr USING (word), tot
      GROUP BY doc_id ORDER BY doc_id""")),

    // X68 — hashed-n-gram linear quality scorer (fastText-style
    // inference architecture, deterministic md5-derived weights so
    // the oracle replays the whole scorer: unigram+bigram features →
    // md5 bucket → fixed weight → decimal-accumulated mean margin →
    // keep verdict).
    "quality_score" -> Q(
      (s, d) => QualitySignals.qualityScore(s, d), Some("""
      WITH tok AS (SELECT doc_id,
          list_filter(string_split_regex(lower(text), '\s+'),
            x -> x <> '') AS w
        FROM documents),
      g AS (
        SELECT doc_id, unnest(w) AS g FROM tok
        UNION ALL
        SELECT doc_id, unnest(list_transform(range(1, len(w)),
            i -> w[i] || ' ' || w[i+1])) AS g
        FROM tok WHERE len(w) >= 2),
      wt AS (SELECT doc_id,
          (CAST(('0x' || substring(md5('qw:' || CAST(
              CAST(('0x' || substring(md5('qf:' || g), 1, 8)) AS BIGINT)
                % 1024 AS VARCHAR)), 1, 8)) AS BIGINT) % 2001 - 1000)
            / 1000.0 AS wgt
        FROM g)
      SELECT doc_id, count(*) AS n_feats,
        CAST(CAST(sum(CAST(wgt AS DECIMAL(30,8))) AS VARCHAR)
          AS DOUBLE) / count(*) AS margin,
        CAST(CAST(sum(CAST(wgt AS DECIMAL(30,8))) AS VARCHAR)
          AS DOUBLE) / count(*) >= 0.0 AS keep
      FROM wt GROUP BY doc_id ORDER BY doc_id""")),

    // X80 — per-source top-q% by classifier margin. The engine runs
    // the two-phase (source, margin-bucket) rank decomposition; the
    // oracle replays the NAIVE one-window rank — same integers, so
    // the decomposition's equality is gate-checked every run.
    "quality_calibrated" -> Q(
      (s, d) => QualitySignals.qualityCalibrated(s, d), Some("""
      WITH tok AS (SELECT doc_id,
          list_filter(string_split_regex(lower(text), '\s+'),
            x -> x <> '') AS w
        FROM documents),
      g AS (
        SELECT doc_id, unnest(w) AS g FROM tok
        UNION ALL
        SELECT doc_id, unnest(list_transform(range(1, len(w)),
            i -> w[i] || ' ' || w[i+1])) AS g
        FROM tok WHERE len(w) >= 2),
      wt AS (SELECT doc_id,
          (CAST(('0x' || substring(md5('qw:' || CAST(
              CAST(('0x' || substring(md5('qf:' || g), 1, 8)) AS BIGINT)
                % 1024 AS VARCHAR)), 1, 8)) AS BIGINT) % 2001 - 1000)
            / 1000.0 AS wgt
        FROM g),
      sc AS (SELECT doc_id,
          CAST(CAST(sum(CAST(wgt AS DECIMAL(30,8))) AS VARCHAR)
            AS DOUBLE) / count(*) AS margin
        FROM wt GROUP BY doc_id),
      j AS (SELECT s.doc_id, d.source, s.margin
        FROM sc s JOIN documents d USING (doc_id)),
      r AS (SELECT doc_id, source, margin,
          CAST(row_number() OVER (PARTITION BY source
            ORDER BY margin DESC, doc_id) AS BIGINT) AS src_rank,
          count(*) OVER (PARTITION BY source) AS n_scored
        FROM j)
      SELECT doc_id, source, margin, src_rank
      FROM r WHERE src_rank <= (n_scored * 60 + 99) // 100
      ORDER BY doc_id""")),

    // X81 — the composed online admission gate (serving split of
    // X77/X78/X80): batch = doc_id % 7 == 0, ALL statistics derived
    // from the corpus side only. The oracle rebuilds bounds, the
    // naive-rank cutoff, and the temperature rates from scratch —
    // gate-checking the persisted-index build AND the two-phase rank
    // decomposition behind the cutoff in one query.
    "quality_gate_probe" -> Q(
      (s, d) => QualitySignals.qualityGateProbe(s, d),
      Some(qualityGateOracle)),

    // X81b — the STREAMING admission gate: same verdicts accumulated
    // through a real StreamingQuery in two file arrivals, same oracle.
    "quality_gate_stream" -> Q(
      (s, d) => graft.streaming.GateStream.gateStreamQuery(s, d),
      Some(qualityGateOracle)),

    // X74 — quality-weighted sampling: keep probability clamp(0.5 +
    // X68 margin, 0, 1) against the md5 coin — every arithmetic step
    // (decimal margin, double add, least/greatest clamp, /1e6) is
    // bit-identical cross-engine, so the oracle pins the exact kept
    // set, not a rate.
    "weighted_sample" -> Q(
      (s, d) => Reshape.weightedSample(s, d), Some("""
      WITH tok AS (SELECT doc_id,
          list_filter(string_split_regex(lower(text), '\s+'),
            x -> x <> '') AS w
        FROM documents),
      g AS (
        SELECT doc_id, unnest(w) AS g FROM tok
        UNION ALL
        SELECT doc_id, unnest(list_transform(range(1, len(w)),
            i -> w[i] || ' ' || w[i+1])) AS g
        FROM tok WHERE len(w) >= 2),
      wt AS (SELECT doc_id,
          (CAST(('0x' || substring(md5('qw:' || CAST(
              CAST(('0x' || substring(md5('qf:' || g), 1, 8)) AS BIGINT)
                % 1024 AS VARCHAR)), 1, 8)) AS BIGINT) % 2001 - 1000)
            / 1000.0 AS wgt
        FROM g),
      sc AS (SELECT doc_id,
          CAST(CAST(sum(CAST(wgt AS DECIMAL(30,8))) AS VARCHAR)
            AS DOUBLE) / count(*) AS margin
        FROM wt GROUP BY doc_id),
      s AS (SELECT doc_id, margin,
          least(1.0, greatest(0.0, 0.5 + margin)) AS keep_p,
          CAST(CAST(('0x' || substring(md5('wsmp:' ||
            CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000000
            AS DOUBLE) / 1000000.0 AS coin
        FROM sc)
      SELECT doc_id, margin, keep_p, coin FROM s
      WHERE coin < keep_p ORDER BY doc_id""")),

    // X69 — the COMPOSED end-to-end corpus pipeline (VERDICT r10 item
    // 1): quality gate → exact dedup → near-dup CC → span scrub →
    // containment strip → n-gram + semantic decontamination →
    // semdedup → rarity + classifier filters → chunk → pack → shard
    // export, each stage over the previous stage's survivors (and,
    // post-scrub, its token state). Output = one accounting row per
    // stage + the written-shard manifest, so the oracle pins every
    // stage boundary and the physical export in one hash. The oracle
    // replays the ENTIRE chain in DuckDB — near-dup groups via a
    // recursive transitive closure, containment via the brute-force
    // shingle join (gate-checking the engine's prefix filter under
    // composition), the semantic stages via the proven IVF route CTEs.
    "corpus_pipeline" -> Q(
      (s, d) => CorpusPipeline.corpusPipeline(s, d), Some(s"""
      WITH RECURSIVE tok AS MATERIALIZED (
        SELECT doc_id, list_filter(string_split_regex(lower(text),
          '\\s+'), x -> x <> '') AS w
        FROM documents),
      s1 AS MATERIALIZED (SELECT doc_id, w FROM tok
        WHERE len(w) >= 20
          AND CAST(len(list_distinct(w)) AS DOUBLE)
            / NULLIF(len(w), 0) >= 0.35),
      s2 AS MATERIALIZED (SELECT doc_id, w FROM (
          SELECT doc_id, w, row_number() OVER (
            PARTITION BY md5(array_to_string(w, ' '))
            ORDER BY doc_id) AS rn
          FROM s1) WHERE rn = 1),
      sh2 AS MATERIALIZED (SELECT DISTINCT doc_id,
          unnest(list_transform(range(1, len(w) - 1),
            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g
        FROM s2 WHERE len(w) >= 3),
      sig2 AS MATERIALIZED (SELECT doc_id, b.band, min(md5(b.band || ':' || g)) AS sig
        FROM sh2, (SELECT unnest(range(0, 8)) AS band) b GROUP BY 1, 2),
      pr3 AS MATERIALIZED (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM sig2 a JOIN sig2 b
          ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
        GROUP BY 1, 2 HAVING count(*) >= 4),
      edges AS MATERIALIZED (SELECT doc_a AS x, doc_b AS y FROM pr3
        UNION SELECT doc_b, doc_a FROM pr3),
      reach(src, dst) AS (
        SELECT x, x FROM (SELECT DISTINCT x FROM edges)
        UNION
        SELECT r.src, e2.y FROM reach r JOIN edges e2 ON e2.x = r.dst),
      lab AS MATERIALIZED (SELECT src AS doc_id, min(dst) AS grp FROM reach
        GROUP BY 1),
      s3 AS MATERIALIZED (SELECT s2.doc_id, s2.w FROM s2 LEFT JOIN lab USING (doc_id)
        WHERE lab.grp IS NULL OR lab.grp = s2.doc_id),
      win4 AS MATERIALIZED (SELECT doc_id, i, array_to_string(w[i:i+7], ' ') AS win
        FROM s3, unnest(range(1, len(w) - 6)) r(i)),
      rep4 AS MATERIALIZED (SELECT win FROM win4 GROUP BY win HAVING count(*) > 1),
      st4 AS MATERIALIZED (SELECT doc_id, list(i) AS ss FROM win4 JOIN rep4
        USING (win) GROUP BY doc_id),
      s4 AS MATERIALIZED (SELECT s3.doc_id,
          list_transform(list_filter(range(1, len(w) + 1),
            i -> len(list_filter(COALESCE(st4.ss, CAST([] AS BIGINT[])),
              s -> i >= s AND i < s + 8)) = 0),
            i -> w[i]) AS w
        FROM s3 LEFT JOIN st4 USING (doc_id)),
      sh4 AS MATERIALIZED (SELECT DISTINCT doc_id,
          unnest(list_transform(range(1, len(w) - 1),
            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g
        FROM s4 WHERE len(w) >= 3),
      sz4 AS MATERIALIZED (SELECT doc_id, count(*) AS n FROM sh4 GROUP BY 1),
      cp AS MATERIALIZED (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          count(*) AS inter
        FROM sh4 a JOIN sh4 b ON a.g = b.g AND a.doc_id <> b.doc_id
        GROUP BY 1, 2),
      cdrop AS MATERIALIZED (SELECT DISTINCT doc_a AS doc_id
        FROM cp JOIN sz4 ON sz4.doc_id = cp.doc_a
        WHERE CAST(inter AS DOUBLE) / sz4.n >= 0.9),
      s5 AS MATERIALIZED (SELECT s4.doc_id, s4.w FROM s4 ANTI JOIN cdrop
        USING (doc_id)),
      sh5 AS MATERIALIZED (SELECT DISTINCT doc_id,
          unnest(list_transform(range(1, len(w) - 3),
            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' ||
                 w[i+3] || ' ' || w[i+4])) AS g
        FROM s5 WHERE len(w) >= 5),
      ev6 AS MATERIALIZED (SELECT DISTINCT g FROM sh5 WHERE doc_id % 97 = 0),
      ndrop AS MATERIALIZED (SELECT DISTINCT s.doc_id FROM sh5 s
        JOIN ev6 USING (g) WHERE s.doc_id % 97 <> 0),
      s6 AS MATERIALIZED (SELECT s5.doc_id, s5.w FROM s5 ANTI JOIN ndrop
        USING (doc_id) WHERE s5.doc_id % 97 <> 0),
      ${ivfRouteCtes()},
      -- stage 7 pairs via the crn <= 2 MULTI-PROBE listing (X61b) —
      -- both sides listed under their top-2 cells
      a2p AS MATERIALIZED (SELECT vec_id, cell FROM route
        WHERE crn <= 2),
      sem7 AS MATERIALIZED (SELECT DISTINCT a.vec_id
        FROM a2p a JOIN a2p b
          ON a.cell = b.cell AND b.vec_id < a.vec_id
        JOIN e ea ON ea.vec_id = a.vec_id
        JOIN e eb ON eb.vec_id = b.vec_id
        JOIN s6 sa ON sa.doc_id = a.vec_id
        JOIN s6 sb ON sb.doc_id = b.vec_id
        WHERE list_dot_product(ea.e, eb.e) /
          (sqrt(list_dot_product(ea.e, ea.e)) *
           sqrt(list_dot_product(eb.e, eb.e))) > 0.4),
      s7 AS MATERIALIZED (SELECT s6.doc_id, s6.w FROM s6
        ANTI JOIN sem7 ON s6.doc_id = sem7.vec_id),
      coin AS MATERIALIZED (SELECT vec_id,
          CAST(('0x' || substring(md5('sdecon:' ||
            CAST(vec_id AS VARCHAR)), 1, 8)) AS BIGINT) % 50 AS b
        FROM embeddings),
      ev8 AS MATERIALIZED (SELECT r.vec_id AS eval_id, r.cell, ee.e AS ee
        FROM route r JOIN e ee ON ee.vec_id = r.vec_id
        JOIN coin c ON c.vec_id = r.vec_id
        WHERE c.b = 0 AND r.crn <= 2),
      sc8 AS MATERIALIZED (SELECT t.vec_id,
          max(list_dot_product(te.e, v.ee) /
            (sqrt(list_dot_product(te.e, te.e)) *
             sqrt(list_dot_product(v.ee, v.ee)))) AS best
        FROM assign t JOIN e te ON te.vec_id = t.vec_id
        JOIN coin c ON c.vec_id = t.vec_id
        JOIN s7 s ON s.doc_id = t.vec_id
        JOIN ev8 v ON v.cell = t.cell
        WHERE c.b <> 0 GROUP BY 1),
      sdrop AS MATERIALIZED (
        SELECT vec_id FROM sc8 WHERE best >= 0.6
        UNION SELECT c.vec_id FROM coin c
          JOIN s7 s ON s.doc_id = c.vec_id WHERE c.b = 0),
      s8 AS MATERIALIZED (SELECT s7.doc_id, s7.w FROM s7
        ANTI JOIN sdrop ON s7.doc_id = sdrop.vec_id),
      wrd AS MATERIALIZED (SELECT doc_id, unnest(w) AS word FROM s8),
      fr AS MATERIALIZED (SELECT word, count(*) AS f FROM wrd GROUP BY 1),
      tot AS MATERIALIZED (SELECT CAST(sum(f) AS DOUBLE) AS total FROM fr),
      rar AS MATERIALIZED (SELECT doc_id,
          CAST(CAST(sum(CAST(total / f AS DECIMAL(30,8))) AS VARCHAR)
            AS DOUBLE) / count(*) AS mip
        FROM wrd JOIN fr USING (word), tot GROUP BY doc_id),
      s9 AS MATERIALIZED (SELECT s8.doc_id, s8.w FROM s8 LEFT JOIN rar
        USING (doc_id) WHERE rar.mip IS NULL OR rar.mip <= 40.0),
      qg AS MATERIALIZED (
        SELECT doc_id, unnest(w) AS g FROM s9
        UNION ALL
        SELECT doc_id, unnest(list_transform(range(1, len(w)),
            i -> w[i] || ' ' || w[i+1])) AS g
        FROM s9 WHERE len(w) >= 2),
      qw AS MATERIALIZED (SELECT doc_id,
          (CAST(('0x' || substring(md5('qw:' || CAST(
              CAST(('0x' || substring(md5('qf:' || g), 1, 8)) AS BIGINT)
                % 1024 AS VARCHAR)), 1, 8)) AS BIGINT) % 2001 - 1000)
            / 1000.0 AS wgt
        FROM qg),
      qs AS MATERIALIZED (SELECT doc_id,
          CAST(CAST(sum(CAST(wgt AS DECIMAL(30,8))) AS VARCHAR)
            AS DOUBLE) / count(*) AS margin
        FROM qw GROUP BY 1),
      s10 AS MATERIALIZED (SELECT s9.doc_id, s9.w FROM s9 LEFT JOIN qs
        USING (doc_id) WHERE qs.margin IS NULL OR qs.margin >= -0.12),
      nch AS MATERIALIZED (SELECT doc_id, w,
          GREATEST(1, CAST(ceil((len(w) - 8) / 56.0) AS BIGINT))
            AS nchunks
        FROM s10),
      ch AS MATERIALIZED (SELECT doc_id, unnest(range(nchunks)) AS chunk_id, w
        FROM nch),
      ch2 AS MATERIALIZED (SELECT doc_id, chunk_id,
          CAST(len(list_slice(w, chunk_id*56 + 1, chunk_id*56 + 64))
            AS BIGINT) AS n_tok
        FROM ch),
      pk AS MATERIALIZED (SELECT doc_id, chunk_id, n_tok,
          CAST(doc_id AS VARCHAR) || ':' || CAST(chunk_id AS VARCHAR)
            AS key
        FROM ch2),
      pk2 AS MATERIALIZED (SELECT doc_id, chunk_id, n_tok,
          md5('pack:' || key) AS h,
          CAST(CAST(('0x' || substring(md5('shard:' || key), 1, 8))
            AS BIGINT) % 8 AS INTEGER) AS shard
        FROM pk),
      pk3 AS MATERIALIZED (SELECT *, CAST(sum(n_tok) OVER (PARTITION BY shard
          ORDER BY h, doc_id, chunk_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS cum_tok FROM pk2),
      pk4 AS MATERIALIZED (SELECT *,
          CAST(floor((cum_tok - n_tok) / 512.0) AS BIGINT) AS pack_id
        FROM pk3),
      acc AS MATERIALIZED (
        SELECT '00_ingest' AS stage, count(*) AS n_docs,
          COALESCE(CAST(sum(len(w)) AS BIGINT), 0) AS n_tokens FROM tok
        UNION ALL SELECT '01_quality', count(*),
          COALESCE(CAST(sum(len(w)) AS BIGINT), 0) FROM s1
        UNION ALL SELECT '02_exact', count(*),
          COALESCE(CAST(sum(len(w)) AS BIGINT), 0) FROM s2
        UNION ALL SELECT '03_neardup', count(*),
          COALESCE(CAST(sum(len(w)) AS BIGINT), 0) FROM s3
        UNION ALL SELECT '04_spanscrub', count(*),
          COALESCE(CAST(sum(len(w)) AS BIGINT), 0) FROM s4
        UNION ALL SELECT '05_contain', count(*),
          COALESCE(CAST(sum(len(w)) AS BIGINT), 0) FROM s5
        UNION ALL SELECT '06_decon_ngram', count(*),
          COALESCE(CAST(sum(len(w)) AS BIGINT), 0) FROM s6
        UNION ALL SELECT '07_semdedup', count(*),
          COALESCE(CAST(sum(len(w)) AS BIGINT), 0) FROM s7
        UNION ALL SELECT '08_decon_sem', count(*),
          COALESCE(CAST(sum(len(w)) AS BIGINT), 0) FROM s8
        UNION ALL SELECT '09_rarity', count(*),
          COALESCE(CAST(sum(len(w)) AS BIGINT), 0) FROM s9
        UNION ALL SELECT '10_quality_score', count(*),
          COALESCE(CAST(sum(len(w)) AS BIGINT), 0) FROM s10
        UNION ALL SELECT '11_chunk', count(*),
          COALESCE(CAST(sum(n_tok) AS BIGINT), 0) FROM ch2)
      SELECT stage, CAST(-1 AS INTEGER) AS shard, n_docs,
        CAST(0 AS BIGINT) AS n_packs, n_tokens FROM acc
      UNION ALL
      SELECT '12_shard' AS stage, shard, count(*) AS n_docs,
        CAST(count(DISTINCT pack_id) AS BIGINT) AS n_packs,
        CAST(sum(n_tok) AS BIGINT) AS n_tokens
      FROM pk4 GROUP BY 2
      ORDER BY stage, shard""")),

    // X70 — the INCREMENTAL (daily-batch) pipeline: the doc_id%7==0
    // batch flows through every cleaning stage against the EXISTING
    // corpus's serving artifacts (canonical hashes, signature index,
    // set-similarity index, listed cells, frequency model) — the
    // composition of the round's probe splits. The oracle replays
    // each stage with brute-force batch×corpus relations.
    "corpus_pipeline_incr" -> Q(
      (s, d) => CorpusPipeline.corpusPipelineIncr(s, d), Some(s"""
      WITH ${qgateCtes("qg")},
      itok AS MATERIALIZED (
        SELECT doc_id, list_filter(string_split_regex(lower(text),
          '\\s+'), x -> x <> '') AS w
        FROM documents),
      bt AS MATERIALIZED (SELECT doc_id, w FROM itok
        WHERE doc_id % 7 = 0),
      ct AS MATERIALIZED (SELECT doc_id, w FROM itok
        WHERE doc_id % 7 <> 0),
      -- stage 1 = the X81 calibrated admission verdict (qgv), replayed
      -- from scratch by the shared gate CTE block — not the rebuild's
      -- fixed token-ratio rule
      ib1 AS MATERIALIZED (SELECT bt.doc_id, bt.w FROM bt
        JOIN qgv v USING (doc_id)
        WHERE v.keep_length AND v.keep_quality AND v.keep_sample),
      chash AS MATERIALIZED (
        SELECT DISTINCT md5(array_to_string(w, ' ')) AS k FROM ct),
      ib2 AS MATERIALIZED (SELECT doc_id, w FROM (
          SELECT doc_id, w, md5(array_to_string(w, ' ')) AS k,
            row_number() OVER (
              PARTITION BY md5(array_to_string(w, ' '))
              ORDER BY doc_id) AS rn
          FROM ib1)
        WHERE rn = 1 AND k NOT IN (SELECT k FROM chash)),
      shB AS MATERIALIZED (SELECT DISTINCT doc_id,
          unnest(list_transform(range(1, len(w) - 1),
            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g
        FROM ib2 WHERE len(w) >= 3),
      shC AS MATERIALIZED (SELECT DISTINCT doc_id,
          unnest(list_transform(range(1, len(w) - 1),
            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g
        FROM ct WHERE len(w) >= 3),
      sigB AS MATERIALIZED (SELECT doc_id, b.band,
          min(md5(b.band || ':' || g)) AS sig
        FROM shB, (SELECT unnest(range(0, 8)) AS band) b GROUP BY 1, 2),
      sigC AS MATERIALIZED (SELECT doc_id, b.band,
          min(md5(b.band || ':' || g)) AS sig
        FROM shC, (SELECT unnest(range(0, 8)) AS band) b GROUP BY 1, 2),
      nd3x AS MATERIALIZED (SELECT a.doc_id, b.doc_id AS cd
        FROM sigB a JOIN sigC b ON a.band = b.band AND a.sig = b.sig
        GROUP BY 1, 2 HAVING count(*) >= 4),
      nd3w AS MATERIALIZED (SELECT a.doc_id AS da, b.doc_id AS db
        FROM sigB a JOIN sigB b
          ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
        GROUP BY 1, 2 HAVING count(*) >= 4),
      id3 AS MATERIALIZED (SELECT DISTINCT doc_id FROM (
        SELECT doc_id FROM nd3x UNION ALL SELECT db FROM nd3w)),
      ib3 AS MATERIALIZED (SELECT ib2.doc_id, ib2.w FROM ib2
        ANTI JOIN id3 USING (doc_id)),
      shB3 AS MATERIALIZED (SELECT DISTINCT doc_id,
          unnest(list_transform(range(1, len(w) - 1),
            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g
        FROM ib3 WHERE len(w) >= 3),
      szB3 AS MATERIALIZED (SELECT doc_id, count(*) AS n FROM shB3
        GROUP BY 1),
      c4x AS MATERIALIZED (SELECT a.doc_id, b.doc_id AS cd,
          count(*) AS inter
        FROM shB3 a JOIN shC b ON a.g = b.g GROUP BY 1, 2),
      id4x AS MATERIALIZED (SELECT DISTINCT c4x.doc_id
        FROM c4x JOIN szB3 s ON s.doc_id = c4x.doc_id
        WHERE CAST(inter AS DOUBLE) / s.n >= 0.9),
      c4w AS MATERIALIZED (SELECT a.doc_id, b.doc_id AS cd,
          count(*) AS inter
        FROM shB3 a JOIN shB3 b ON a.g = b.g AND a.doc_id <> b.doc_id
        GROUP BY 1, 2),
      id4w AS MATERIALIZED (SELECT DISTINCT c4w.doc_id
        FROM c4w JOIN szB3 s ON s.doc_id = c4w.doc_id
        WHERE CAST(inter AS DOUBLE) / s.n >= 0.9),
      ib4 AS MATERIALIZED (SELECT ib3.doc_id, ib3.w FROM ib3
        WHERE doc_id NOT IN (SELECT doc_id FROM id4x)
          AND doc_id NOT IN (SELECT doc_id FROM id4w)),
      evsh AS MATERIALIZED (SELECT DISTINCT
          unnest(list_transform(range(1, len(w) - 3),
            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' ||
                 w[i+3] || ' ' || w[i+4])) AS g
        FROM itok WHERE doc_id % 97 = 0 AND len(w) >= 5),
      g5b AS MATERIALIZED (SELECT DISTINCT doc_id,
          unnest(list_transform(range(1, len(w) - 3),
            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' ||
                 w[i+3] || ' ' || w[i+4])) AS g
        FROM ib4 WHERE len(w) >= 5),
      id5 AS MATERIALIZED (SELECT DISTINCT doc_id FROM g5b
        SEMI JOIN evsh USING (g) WHERE doc_id % 97 <> 0),
      ib5 AS MATERIALIZED (SELECT ib4.doc_id, ib4.w FROM ib4
        ANTI JOIN id5 USING (doc_id) WHERE ib4.doc_id % 97 <> 0),
      ${ivfRouteCtes()},
      ili AS MATERIALIZED (SELECT vec_id, cell FROM route
        WHERE crn <= 2),
      id6 AS MATERIALIZED (SELECT DISTINCT x.vec_id AS doc_id
        FROM ili x JOIN ili y
          ON x.cell = y.cell AND x.vec_id <> y.vec_id
        JOIN ib5 sx ON sx.doc_id = x.vec_id
        JOIN e ex ON ex.vec_id = x.vec_id
        JOIN e ey ON ey.vec_id = y.vec_id
        LEFT JOIN ib5 sy ON sy.doc_id = y.vec_id
        WHERE (y.vec_id % 7 <> 0
            OR (sy.doc_id IS NOT NULL AND y.vec_id < x.vec_id))
          AND list_dot_product(ex.e, ey.e) /
            (sqrt(list_dot_product(ex.e, ex.e)) *
             sqrt(list_dot_product(ey.e, ey.e))) > 0.4),
      ib6 AS MATERIALIZED (SELECT ib5.doc_id, ib5.w FROM ib5
        ANTI JOIN id6 USING (doc_id)),
      icoin AS MATERIALIZED (SELECT vec_id,
          CAST(('0x' || substring(md5('sdecon:' ||
            CAST(vec_id AS VARCHAR)), 1, 8)) AS BIGINT) % 50 AS b
        FROM embeddings),
      iev AS MATERIALIZED (SELECT r.vec_id AS eval_id, r.cell,
          ee.e AS ee
        FROM route r JOIN e ee ON ee.vec_id = r.vec_id
        JOIN icoin c ON c.vec_id = r.vec_id
        WHERE c.b = 0 AND r.crn <= 2),
      isc AS MATERIALIZED (SELECT t.vec_id,
          max(list_dot_product(te.e, v.ee) /
            (sqrt(list_dot_product(te.e, te.e)) *
             sqrt(list_dot_product(v.ee, v.ee)))) AS best
        FROM assign t JOIN e te ON te.vec_id = t.vec_id
        JOIN icoin c ON c.vec_id = t.vec_id
        JOIN ib6 s ON s.doc_id = t.vec_id
        JOIN iev v ON v.cell = t.cell
        WHERE c.b <> 0 GROUP BY 1),
      id7 AS MATERIALIZED (
        SELECT vec_id FROM isc WHERE best >= 0.6
        UNION SELECT c.vec_id FROM icoin c
          JOIN ib6 s ON s.doc_id = c.vec_id WHERE c.b = 0),
      ib7 AS MATERIALIZED (SELECT ib6.doc_id, ib6.w FROM ib6
        ANTI JOIN id7 ON ib6.doc_id = id7.vec_id),
      cfr AS MATERIALIZED (SELECT word, count(*) AS f FROM (
          SELECT unnest(w) AS word FROM ct) GROUP BY 1),
      ictot AS MATERIALIZED (SELECT CAST(sum(f) AS DOUBLE) AS total
        FROM cfr),
      irar AS MATERIALIZED (SELECT doc_id,
          CAST(CAST(sum(CAST(total / f AS DECIMAL(30,8))) AS VARCHAR)
            AS DOUBLE) / count(*) AS mip
        FROM (SELECT doc_id, unnest(w) AS word FROM ib7)
        JOIN cfr USING (word), ictot GROUP BY doc_id),
      ib8 AS MATERIALIZED (SELECT ib7.doc_id, ib7.w FROM ib7
        LEFT JOIN irar USING (doc_id)
        WHERE irar.mip IS NULL OR irar.mip <= 40.0),
      iqg AS MATERIALIZED (
        SELECT doc_id, unnest(w) AS g FROM ib8
        UNION ALL
        SELECT doc_id, unnest(list_transform(range(1, len(w)),
            i -> w[i] || ' ' || w[i+1])) AS g
        FROM ib8 WHERE len(w) >= 2),
      iqw AS MATERIALIZED (SELECT doc_id,
          (CAST(('0x' || substring(md5('qw:' || CAST(
              CAST(('0x' || substring(md5('qf:' || g), 1, 8)) AS BIGINT)
                % 1024 AS VARCHAR)), 1, 8)) AS BIGINT) % 2001 - 1000)
            / 1000.0 AS wgt
        FROM iqg),
      iqs AS MATERIALIZED (SELECT doc_id,
          CAST(CAST(sum(CAST(wgt AS DECIMAL(30,8))) AS VARCHAR)
            AS DOUBLE) / count(*) AS margin
        FROM iqw GROUP BY 1),
      ib9 AS MATERIALIZED (SELECT ib8.doc_id, ib8.w FROM ib8
        LEFT JOIN iqs USING (doc_id)
        WHERE iqs.margin IS NULL OR iqs.margin >= -0.12),
      inch AS MATERIALIZED (SELECT doc_id, w,
          GREATEST(1, CAST(ceil((len(w) - 8) / 56.0) AS BIGINT))
            AS nchunks
        FROM ib9),
      ich AS MATERIALIZED (SELECT doc_id,
          unnest(range(nchunks)) AS chunk_id, w
        FROM inch),
      ich2 AS MATERIALIZED (SELECT doc_id, chunk_id,
          CAST(len(list_slice(w, chunk_id*56 + 1, chunk_id*56 + 64))
            AS BIGINT) AS n_tok
        FROM ich),
      ipk AS MATERIALIZED (SELECT doc_id, chunk_id, n_tok,
          CAST(doc_id AS VARCHAR) || ':' || CAST(chunk_id AS VARCHAR)
            AS key
        FROM ich2),
      ipk2 AS MATERIALIZED (SELECT doc_id, chunk_id, n_tok,
          md5('pack:' || key) AS h,
          CAST(CAST(('0x' || substring(md5('shard:' || key), 1, 8))
            AS BIGINT) % 8 AS INTEGER) AS shard
        FROM ipk),
      ipk3 AS MATERIALIZED (SELECT *, CAST(sum(n_tok) OVER (
          PARTITION BY shard ORDER BY h, doc_id, chunk_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS cum_tok FROM ipk2),
      ipk4 AS MATERIALIZED (SELECT *,
          CAST(floor((cum_tok - n_tok) / 512.0) AS BIGINT) AS pack_id
        FROM ipk3),
      iacc AS MATERIALIZED (
        SELECT '00_batch' AS stage, count(*) AS n_docs,
          COALESCE(CAST(sum(len(w)) AS BIGINT), 0) AS n_tokens FROM bt
        UNION ALL SELECT '01_quality', count(*),
          COALESCE(CAST(sum(len(w)) AS BIGINT), 0) FROM ib1
        UNION ALL SELECT '02_exact', count(*),
          COALESCE(CAST(sum(len(w)) AS BIGINT), 0) FROM ib2
        UNION ALL SELECT '03_neardup', count(*),
          COALESCE(CAST(sum(len(w)) AS BIGINT), 0) FROM ib3
        UNION ALL SELECT '04_contain', count(*),
          COALESCE(CAST(sum(len(w)) AS BIGINT), 0) FROM ib4
        UNION ALL SELECT '05_decon_ngram', count(*),
          COALESCE(CAST(sum(len(w)) AS BIGINT), 0) FROM ib5
        UNION ALL SELECT '06_semdedup', count(*),
          COALESCE(CAST(sum(len(w)) AS BIGINT), 0) FROM ib6
        UNION ALL SELECT '07_decon_sem', count(*),
          COALESCE(CAST(sum(len(w)) AS BIGINT), 0) FROM ib7
        UNION ALL SELECT '08_rarity', count(*),
          COALESCE(CAST(sum(len(w)) AS BIGINT), 0) FROM ib8
        UNION ALL SELECT '09_quality_score', count(*),
          COALESCE(CAST(sum(len(w)) AS BIGINT), 0) FROM ib9
        UNION ALL SELECT '10_chunk', count(*),
          COALESCE(CAST(sum(n_tok) AS BIGINT), 0) FROM ich2)
      SELECT stage, CAST(-1 AS INTEGER) AS shard, n_docs,
        CAST(0 AS BIGINT) AS n_packs, n_tokens FROM iacc
      UNION ALL
      SELECT '11_shard' AS stage, shard, count(*) AS n_docs,
        CAST(count(DISTINCT pack_id) AS BIGINT) AS n_packs,
        CAST(sum(n_tok) AS BIGINT) AS n_tokens
      FROM ipk4 GROUP BY 2
      ORDER BY stage, shard""")),

    // X108 — the END-TO-END WEB PIPELINE: raw fetched HTML → training
    // shards in one lineage (robots compliance → extraction +
    // admission → exact dedup → banded near-dup → paragraph
    // keep-first → Gopher gate → chunk/pack/physical shard export).
    // The oracle replays the WHOLE chain from the shared CTE blocks —
    // extraction, robots verdicts, the X84 minhash stages, the X95
    // paragraph winners, the X102 rule battery, the X69 pack
    // arithmetic — pinning every stage boundary and the export
    // roundtrip in one hash.
    "web_pipeline" -> Q(
      (s, d) => WebPipeline.webPipeline(s, d), Some {
        def sq(x: String) = x.replace("'", "''")
        def strip(x: String) =
          s"regexp_replace($x, '${sq(HtmlExtract.TagPattern)}', ' ', 'g')"
        def coll(x: String) =
          s"trim(regexp_replace($x, '${sq(HtmlExtract.WsPattern)}', ' ', 'g'))"
        def toks(x: String) =
          s"list_filter(string_split_regex(lower($x), '\\s+'), x -> x <> '')"
        s"""
      WITH ${htmlCtes("")},
      pu AS (SELECT doc_id,
          ${HtmlExtract.normalizeUrlSql("page_url")} AS url,
          html
        FROM read_csv('${HtmlExtract.FixtureCsv}', header=true,
          columns={'doc_id':'BIGINT','source':'VARCHAR',
          'page_url':'VARCHAR','html':'VARCHAR'})
        WHERE page_url IS NOT NULL AND page_url <> ''),
      pu2 AS (SELECT doc_id, url,
          regexp_extract(url, '${sq(HtmlExtract.HostPattern)}', 1)
            AS host, html
        FROM pu WHERE url <> ''),
      pfr AS (SELECT DISTINCT host, url FROM pu2 WHERE host <> ''),
      ${robotsVerdictCtes("pfr")},
      pok AS (SELECT DISTINCT pu2.doc_id FROM pu2
        JOIN v ON pu2.host = v.host AND pu2.url = v.url
        WHERE v.allowed),
      w2 AS (SELECT out.doc_id, out.text FROM out
        SEMI JOIN pok USING (doc_id)
        WHERE NOT boilerplate_flag
          AND text_len >= ${HtmlExtract.MinTextLen}),
      w3 AS (SELECT doc_id, text FROM (
          SELECT doc_id, text, row_number() OVER (
            PARTITION BY md5(text) ORDER BY doc_id) AS rn
          FROM w2) WHERE rn = 1),
      w3t AS (SELECT doc_id, text, ${toks("text")} AS w FROM w3),
      wsh AS (SELECT DISTINCT doc_id,
          unnest(list_transform(range(1, len(w) - 1),
            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle
        FROM w3t WHERE len(w) >= 3),
      wsig AS (SELECT doc_id, b.band,
          min(md5(b.band || ':' || shingle)) AS sig
        FROM wsh, (SELECT unnest(range(0, 8)) AS band) b GROUP BY 1, 2),
      wpr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM wsig a JOIN wsig b
          ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
        GROUP BY 1, 2 HAVING count(*) >= 4),
      wdrop AS (SELECT DISTINCT doc_b AS doc_id FROM wpr),
      w4 AS (SELECT w3t.* FROM w3t ANTI JOIN wdrop USING (doc_id)),
      wpg AS (SELECT doc_id, html FROM pu2 SEMI JOIN w4 USING (doc_id)),
      pl AS (SELECT doc_id,
          unnest(list_transform(range(1, len(ps) + 1), i -> i)) AS idx,
          unnest(ps) AS raw
        FROM (SELECT doc_id, regexp_extract_all(html,
            '${sq(HtmlExtract.ParaPattern)}', 1) AS ps FROM wpg)),
      pp0 AS (SELECT doc_id, idx, ${coll(strip("raw"))} AS ptext
        FROM pl),
      pp AS (SELECT * FROM pp0 WHERE ptext <> ''),
      pw AS (SELECT *, row_number() OVER (PARTITION BY md5(ptext)
          ORDER BY doc_id, idx) AS rn FROM pp),
      kp AS (SELECT doc_id, idx, ptext FROM pw WHERE rn = 1),
      reb AS (SELECT doc_id, string_agg(ptext, ' ' ORDER BY idx)
          AS rtext FROM kp GROUP BY 1),
      npz AS (SELECT doc_id, count(*) AS np FROM pp GROUP BY 1),
      st5 AS (SELECT w4.doc_id,
          CASE WHEN npz.np IS NOT NULL THEN COALESCE(reb.rtext, '')
            ELSE w4.text END AS text
        FROM w4 LEFT JOIN npz USING (doc_id)
          LEFT JOIN reb USING (doc_id)),
      t5 AS (SELECT doc_id, ${toks("text")} AS w FROM st5),
      ${gopherCtes("t5", "gp", WebPipeline.WebMinWords)},
      s6 AS (SELECT t5.doc_id, t5.w FROM t5
        JOIN gpfl ON t5.doc_id = gpfl.doc_id
        WHERE len(gpfl.fails) = 0),
      nch AS (SELECT doc_id, w, GREATEST(1,
          CAST(ceil((len(w) - ${CorpusPipeline.ChunkOverlap}) /
            ${(CorpusPipeline.ChunkSize -
              CorpusPipeline.ChunkOverlap).toDouble}) AS BIGINT))
            AS nchunks
        FROM s6),
      chq AS (SELECT doc_id, unnest(range(nchunks)) AS chunk_id, w
        FROM nch),
      ch2 AS (SELECT doc_id, chunk_id,
          CAST(len(list_slice(w,
            chunk_id * ${CorpusPipeline.ChunkSize -
              CorpusPipeline.ChunkOverlap} + 1,
            chunk_id * ${CorpusPipeline.ChunkSize -
              CorpusPipeline.ChunkOverlap} +
              ${CorpusPipeline.ChunkSize})) AS BIGINT) AS n_tok
        FROM chq),
      pkq AS (SELECT doc_id, chunk_id, n_tok,
          CAST(doc_id AS VARCHAR) || ':' || CAST(chunk_id AS VARCHAR)
            AS key
        FROM ch2),
      pk2 AS (SELECT doc_id, chunk_id, n_tok,
          md5('pack:' || key) AS h,
          CAST(CAST(('0x' || substring(md5('shard:' || key), 1, 8))
            AS BIGINT) % ${CorpusPipeline.NShards} AS INTEGER) AS shard
        FROM pkq),
      pk3 AS (SELECT *, CAST(sum(n_tok) OVER (PARTITION BY shard
          ORDER BY h, doc_id, chunk_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS cum_tok FROM pk2),
      pk4 AS (SELECT *,
          CAST(floor((cum_tok - n_tok) /
            ${CorpusPipeline.PackBudget.toDouble}) AS BIGINT) AS pack_id
        FROM pk3),
      acc AS (
        SELECT '00_fetch' AS stage, count(*) AS n_docs,
          CAST(0 AS BIGINT) AS n_tokens FROM d
        UNION ALL SELECT '01_robots', count(*), 0 FROM pok
        UNION ALL SELECT '02_extract', count(*),
          COALESCE(CAST(sum(len(${toks("text")})) AS BIGINT), 0)
          FROM w2
        UNION ALL SELECT '03_exact', count(*),
          COALESCE(CAST(sum(len(w)) AS BIGINT), 0) FROM w3t
        UNION ALL SELECT '04_neardup', count(*),
          COALESCE(CAST(sum(len(w)) AS BIGINT), 0) FROM w4
        UNION ALL SELECT '05_paradedup', count(*),
          COALESCE(CAST(sum(len(w)) AS BIGINT), 0) FROM t5
        UNION ALL SELECT '06_gopher', count(*),
          COALESCE(CAST(sum(len(w)) AS BIGINT), 0) FROM s6
        UNION ALL SELECT '07_chunk', count(*),
          COALESCE(CAST(sum(n_tok) AS BIGINT), 0) FROM ch2)
      SELECT stage, CAST(-1 AS INTEGER) AS shard, n_docs,
        CAST(0 AS BIGINT) AS n_packs, n_tokens FROM acc
      UNION ALL
      SELECT '08_shard' AS stage, shard, count(*) AS n_docs,
        CAST(count(DISTINCT pack_id) AS BIGINT) AS n_packs,
        CAST(sum(n_tok) AS BIGINT) AS n_tokens
      FROM pk4 GROUP BY 2
      ORDER BY stage, shard"""
      }),

    // X91 — bigram-LM quality score (the CCNet recipe): add-one
    // bigram LM trained on the doc_id%5 reference slice scores every
    // doc by MEAN bigram probability (not log-perplexity — ln is not
    // bit-identical cross-engine; the mean orders docs identically).
    // Model joins are keyed (corpus-scaled model, never broadcast);
    // the mean runs through the decimal accumulator.
    "ngram_lm_score" -> Q(
      (s, d) => QualitySignals.ngramLmScore(s, d), Some(s"""
      WITH tok AS (SELECT doc_id,
          list_filter(string_split_regex(lower(text), '\\s+'),
            x -> x <> '') AS w
        FROM documents),
      tk AS (SELECT doc_id, w FROM tok WHERE len(w) >= 2),
      bg AS (SELECT doc_id,
          unnest(list_transform(range(1, len(w)), i -> w[i])) AS w1,
          unnest(list_transform(range(1, len(w)),
            i -> w[i] || ' ' || w[i + 1])) AS g
        FROM tk),
      trbg AS (SELECT * FROM bg WHERE doc_id % 5 = 0),
      c2 AS (SELECT g, count(*) AS c2 FROM trbg GROUP BY 1),
      c1 AS (SELECT w1, count(*) AS c1 FROM trbg GROUP BY 1),
      v AS (SELECT CAST(count(DISTINCT t) AS DOUBLE) AS vd
        FROM (SELECT unnest(w) AS t FROM tk WHERE doc_id % 5 = 0)),
      p AS (SELECT bg.doc_id,
          ((CAST(COALESCE(c2.c2, 0) AS DOUBLE) + 1.0) /
           (CAST(COALESCE(c1.c1, 0) AS DOUBLE) + v.vd)) AS p,
          CASE WHEN c2.c2 IS NULL THEN 1 ELSE 0 END AS unseen
        FROM bg LEFT JOIN c2 USING (g) LEFT JOIN c1 USING (w1)
          CROSS JOIN v)
      SELECT doc_id, count(*) AS n_bigrams,
        CAST(sum(unseen) AS BIGINT) AS n_unseen,
        (${osum("p")} / count(*)) AS mean_p
      FROM p GROUP BY 1 ORDER BY 1""")),

    "zipf_spectrum" -> Q(
      (s, d) => QualitySignals.zipfSpectrum(s, d), Some("""
      WITH d AS (SELECT doc_id,
          list_filter(string_split_regex(lower(text), '\s+'),
            x -> x <> '') AS w
        FROM documents),
      p AS (SELECT doc_id, unnest(list_distinct(
          CASE WHEN len(w) >= 2 THEN list_transform(range(1, len(w)),
            i -> w[i] || ' ' || w[i + 1]) ELSE [] END)) AS term
        FROM d),
      dfreq AS (SELECT term, count(*) AS df FROM p GROUP BY 1)
      SELECT CAST(length(format('{:b}', df)) - 1 AS INTEGER) AS bucket,
        count(*) AS n_terms, min(df) AS min_df, max(df) AS max_df,
        min(term) AS first_term
      FROM dfreq GROUP BY 1 ORDER BY 1""")),
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Analytics.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (n, q) => n -> q.fn }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.collect { case (n, Q(_, Some(sql))) => n -> sql.trim }.toMap
}
