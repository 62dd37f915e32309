package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Web-corpus curation: URL hygiene and markup extraction — the stage a
 * CommonCrawl-scale pipeline runs BEFORE text filtering (CCNet §3.1,
 * RefinedWeb §3.2: URL filtering + per-domain caps + text extraction are
 * the first pass over every crawled page).
 *
 * Everything here is a narrow, codegen'd expression chain over one scan —
 * zero Exchange except [[domainCap]]'s single per-domain window. All
 * string semantics are engine-portable by construction (split_part /
 * array_sort / RE2-safe regexes — no backreferences, no \b, no \s), so
 * the DuckDB oracle replays every step value-for-value.
 *
 * URL grammar handled (documented contract, not full RFC 3986):
 * `scheme://host[:port][/path][?query][#fragment]` with '?' before '#'.
 * Userinfo, IPv6 bracket hosts, and relative references are out of scope
 * (crawl frontiers normalize those upstream).
 */
object Web {

  /** Multi-part public suffixes recognized by [[registeredDomainOf]] — a
    * deliberately small excerpt of the public-suffix list, enough to keep
    * `blog.example.co.uk` from collapsing to `co.uk`. Production swaps in
    * the full PSL as a broadcast set without changing the expression. */
  val MultiSuffixes: Seq[String] =
    Seq("co.uk", "ac.uk", "com.au", "co.jp", "com.br", "co.in")

  /** Query-parameter keys dropped by [[normalizeUrls]]: the standard
    * click-tracking params that make otherwise-identical pages look
    * distinct (the #1 cause of URL-level duplicate misses). */
  val TrackingKeys: Seq[String] = Seq("fbclid", "gclid", "msclkid", "ref")

  /** Scheme / host / port / path / query / fragment of a URL column under
    * the documented grammar. Missing parts are NULL (port additionally
    * NULL when absent); `path` is the raw path (possibly empty — see
    * [[normalizeUrls]] for the canonical form). Pure split_part/substring
    * chain: one kernel per row, no Exchange. */
  def parseUrls(df: DataFrame, urlCol: String): DataFrame = {
    val u = col(urlCol)
    // substring after the FIRST "://" — split_part's second segment would
    // truncate URLs whose query values embed "://" (outlink/redirect
    // params are everywhere in real crawls)
    val sep = locate("://", u)
    val rest = when(sep > 0, u.substr(sep + 3, length(u))).otherwise(lit(""))
    val authority =
      split_part(split_part(split_part(rest, lit("/"), lit(1)),
        lit("?"), lit(1)), lit("#"), lit(1))
    val tail = rest.substr(length(authority) + 1, length(rest))
    val portStr = split_part(authority, lit(":"), lit(2))
    df.withColumn("scheme", lower(split_part(u, lit("://"), lit(1))))
      .withColumn("host", lower(split_part(authority, lit(":"), lit(1))))
      .withColumn("port",
        // digit guard, not a bare cast: under ANSI mode a malformed
        // authority ("user:pass@host", "[::1]:443") would otherwise make
        // the cast THROW instead of degrading to NULL
        when(portStr.rlike("^[0-9]{1,9}$"), portStr.cast("int"))
          .otherwise(lit(null)))
      .withColumn("path",
        split_part(split_part(tail, lit("?"), lit(1)), lit("#"), lit(1)))
      .withColumn("query",
        when(tail.contains("?"),
          split_part(split_part(tail, lit("?"), lit(2)), lit("#"), lit(1)))
          .otherwise(lit(null)))
      .withColumn("fragment",
        when(tail.contains("#"), split_part(tail, lit("#"), lit(2)))
          .otherwise(lit(null)))
  }

  /** Canonical URL form for dedup keys and frontier hygiene:
    * scheme+host lowercased, default port dropped (http:80 / https:443),
    * empty path → "/", fragment dropped, tracking params removed
    * (`utm_*` prefixes plus [[TrackingKeys]]), remaining params sorted
    * bytewise so `?b=2&a=1` and `?a=1&b=2` collapse. Adds the parsed
    * columns plus `query_norm` and `url_norm`. The param list is a
    * handful of elements, so the filter/sort HOFs stay off the
    * per-character hot path. Narrow; zero Exchange. */
  def normalizeUrls(df: DataFrame, urlCol: String): DataFrame = {
    val parsed = parseUrls(df, urlCol)
    val params = filter(split(col("query"), "&"), p =>
      length(p) > 0 && !p.startsWith("utm_") &&
        !split_part(p, lit("="), lit(1)).isin(TrackingKeys: _*))
    val portNorm = when(
      (col("scheme") === "http" && col("port") === 80) ||
        (col("scheme") === "https" && col("port") === 443),
      lit(null)).otherwise(col("port"))
    parsed
      .withColumn("port", portNorm)
      .withColumn("path", when(length(col("path")) === 0, lit("/"))
        .otherwise(col("path")))
      .withColumn("query_norm",
        when(col("query").isNotNull && size(params) > 0,
          array_join(array_sort(params), "&")).otherwise(lit(null)))
      .withColumn("url_norm", concat(
        col("scheme"), lit("://"), col("host"),
        when(col("port").isNotNull, concat(lit(":"), col("port").cast("string")))
          .otherwise(lit("")),
        col("path"),
        when(col("query_norm").isNotNull, concat(lit("?"), col("query_norm")))
          .otherwise(lit(""))))
      .drop("fragment")
  }

  /** Registered (pay-level) domain of a lowercase host: last two labels,
    * or last three when the final two form a [[MultiSuffixes]] entry —
    * `www.news.example.co.uk` → `example.co.uk`. Hosts with one label
    * (e.g. `localhost`) pass through. */
  def registeredDomainOf(host: Column): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    val last2 = concat(element_at(labels, -2), lit("."), element_at(labels, -1))
    when(n >= 3 && last2.isin(MultiSuffixes: _*),
        concat(element_at(labels, -3), lit("."), last2))
      .when(n >= 2, last2)
      .otherwise(host)
  }

  /** RefinedWeb-style per-domain contribution cap + blocklist: rank each
    * document within its registered domain (by `idCol` — deterministic,
    * not arrival order) and keep the first `maxPerDomain`, unless the
    * domain is blocklisted. Returns
    * `(idCol, url, domain, domain_docs, domain_rank, keep)`.
    *
    * Scale shape: the parse is narrow; the ONLY Exchange is the
    * hash-partition on `domain` for the window (count + row_number share
    * one sort). Registered domains are Zipf-heavy but bounded
    * (~10^7 web-wide), and a hot domain is exactly what the cap
    * truncates — at 100 TB the window sort spills fine and AQE splits
    * nothing because the partition key IS the semantic unit. */
  def domainCap(
      df: DataFrame,
      idCol: String,
      urlCol: String,
      maxPerDomain: Long,
      blocklist: Seq[String] = Nil): DataFrame = {
    require(maxPerDomain >= 1, s"maxPerDomain must be >= 1, got $maxPerDomain")
    val w = Window.partitionBy(col("domain"))
    val parsed = parseUrls(df.select(col(idCol), col(urlCol)), urlCol)
      .withColumn("domain", registeredDomainOf(col("host")))
    parsed.select(
        col(idCol), col(urlCol), col("domain"),
        count(lit(1)).over(w).as("domain_docs"),
        row_number().over(w.orderBy(col(idCol))).as("domain_rank"))
      .withColumn("keep",
        col("domain_rank") <= maxPerDomain &&
          (if (blocklist.isEmpty) lit(true) else !col("domain").isin(blocklist: _*)))
  }

  /** SKEW-SAFE [[domainCap]] (the [[Curation.stratifiedSampleSalted]]
    * argument applied to domain capping): on a real crawl the domain
    * distribution is Zipf — one hot domain can hold percents of the whole
    * corpus, and [[domainCap]]'s per-domain window would hand that
    * domain's entire volume to ONE sort task. Here phase 1 ranks within
    * (domain, salt-bucket) — an independent id hash spreads the hot
    * domain over `salts` tasks — and keeps at most `maxPerDomain` rows
    * per bucket; the domain-global top-`maxPerDomain` by id is a subset
    * of the per-bucket winners (any globally-kept row is also in its own
    * bucket's top), so phase 2 re-ranks only the ≤ salts·maxPerDomain
    * survivors per domain — a bounded task at ANY skew. `domain_docs`
    * comes from a partial-agg groupBy and rejoins on the domain key
    * (equi-join: AQE skew-splits it, which a window sort cannot be).
    *
    * Same rows and `keep` decisions as [[domainCap]]; the one contract
    * difference is that `domain_rank` is NULL for over-cap rows (their
    * exact rank is what a bounded-task plan cannot afford, and the cap
    * never needs it). More Exchanges than the plain variant — use this
    * one when the domain distribution is unknown or skewed.
    *
    * Contract: `idCol` must be NUMERIC and UNIQUE. Both variants already
    * require uniqueness semantically (the id is the ranking tiebreaker —
    * duplicate ids make `row_number` over ties partition-order-dependent
    * in the plain variant too), and here the winners join back on the id,
    * so a duplicate would additionally multiply audit rows; the salt
    * bucket hashes the id as a long, so a non-numeric id nulls the
    * bucket and re-concentrates the hot domain. */
  def domainCapSalted(
      df: DataFrame,
      idCol: String,
      urlCol: String,
      maxPerDomain: Long,
      blocklist: Seq[String] = Nil,
      salt: Long = 7919L,
      salts: Int = 32): DataFrame = {
    require(maxPerDomain >= 1, s"maxPerDomain must be >= 1, got $maxPerDomain")
    require(salts > 0, s"salts must be positive, got $salts")
    val parsed = parseUrls(df.select(col(idCol), col(urlCol)), urlCol)
      .withColumn("domain", registeredDomainOf(col("host")))
      .select(col(idCol), col(urlCol), col("domain"))
    val counts = parsed.groupBy(col("domain"))
      .agg(count(lit(1)).as("domain_docs"))
    val bucket = mix64(col(idCol).cast("long"), salt)
    val phase1 = parsed
      .withColumn("graft_rank", row_number().over(
        Window.partitionBy(col("domain"), pmod(bucket, lit(salts.toLong)))
          .orderBy(col(idCol))))
      .where(col("graft_rank") <= maxPerDomain)
      .drop("graft_rank")
    val winners = phase1
      .withColumn("domain_rank", row_number().over(
        Window.partitionBy(col("domain")).orderBy(col(idCol))))
      .where(col("domain_rank") <= maxPerDomain)
      .select(col(idCol), col("domain_rank"))
    parsed
      .join(counts, Seq("domain"))
      .join(winners, Seq(idCol), "left")
      .select(col(idCol), col(urlCol), col("domain"),
        col("domain_docs"), col("domain_rank"))
      .withColumn("keep",
        col("domain_rank").isNotNull &&
          (if (blocklist.isEmpty) lit(true) else !col("domain").isin(blocklist: _*)))
  }

  /** Main-text extraction from HTML (the WET-file step of a crawl
    * pipeline): drop script/style subtrees, comments, then all tags;
    * decode the common named entities (single-pass order — `&amp;` last,
    * so `&amp;lt;` yields the literal `&lt;`); collapse whitespace runs.
    * Also extracts the (entity-decoded) `<title>`.
    *
    * Regex subset chosen for engine portability: no backreferences, no
    * `\b`, no `\s` — `(?is)` + non-greedy + explicit classes only, which
    * Java regex and RE2 evaluate identically. A full HTML5 tree parser is
    * out of scope; on real crawls this regex tier is the pre-filter and a
    * DOM pass runs on the survivors. One narrow kernel chain per row,
    * zero Exchange — scan-speed at any corpus size. */
  def htmlExtract(df: DataFrame, idCol: String, htmlCol: String): DataFrame =
    // two projections so the regex chain runs ONCE and n_chars reads the
    // materialized text column (CollapseProject keeps multiply-referenced
    // non-cheap aliases in their own projection; a single select would
    // re-run the whole chain for the length)
    df.select(
        col(idCol),
        extractedTitle(col(htmlCol)).as("title"),
        extractedText(col(htmlCol)).as("text"))
      .withColumn("n_chars", length(col("text")).cast("long"))

  private def decodeEntities(c: Column): Column = {
    val named = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
    named.foldLeft(c) { case (acc, (e, ch)) => replace(acc, lit(e), lit(ch)) }
  }

  private def collapseWs(c: Column): Column =
    trim(regexp_replace(c, "[ \\t\\r\\n]+", " "))

  /** The [[htmlExtract]] body-text chain as a reusable expression. */
  def extractedText(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script[^>]*>.*?</script[^>]*>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style[^>]*>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    collapseWs(decodeEntities(regexp_replace(noComment, "(?s)<[^>]*>", " ")))
  }

  /** The [[htmlExtract]] title chain as a reusable expression. */
  def extractedTitle(html: Column): Column =
    collapseWs(decodeEntities(
      regexp_extract(html, "(?is)<title[^>]*>(.*?)</title>", 1)))

  /** The whole crawl-side pipeline in ONE flow — raw (url, html) pages →
    * clean training-corpus candidates:
    *
    *   URL canonicalize + HTML extract    narrow, same single scan
    *   → per-registered-domain cap        Exchange 1 (domain window)
    *   → canonical-URL exact dedup        Exchange 2 (url_norm window)
    *   → length floor                     narrow
    *
    * The two exchanges are the two semantic keys and nothing else
    * shuffles; both windows rank by the id (deterministic, not arrival
    * order). Returns per-page audit rows
    * `(idCol, url_norm, domain, domain_rank, url_rank, n_chars, keep)` —
    * production filters `keep`, audits keep the evidence. For Zipf-hot
    * domains swap the cap stage for [[domainCapSalted]]'s two-phase
    * rank (same keeps). */
  def curateWeb(
      pages: DataFrame,
      idCol: String,
      urlCol: String,
      htmlCol: String,
      maxPerDomain: Long = 1000L,
      blocklist: Seq[String] = Nil,
      minChars: Long = 10L): DataFrame = {
    require(maxPerDomain >= 1, s"maxPerDomain must be >= 1, got $maxPerDomain")
    val base = normalizeUrls(pages, urlCol)
      .withColumn("domain", registeredDomainOf(col("host")))
      .withColumn("n_chars", length(extractedText(col(htmlCol))).cast("long"))
      .select(col(idCol), col("url_norm"), col("domain"), col("n_chars"))
    val wDom = Window.partitionBy(col("domain")).orderBy(col(idCol))
    val wUrl = Window.partitionBy(col("url_norm")).orderBy(col(idCol))
    base
      .withColumn("domain_rank", row_number().over(wDom).cast("long"))
      .withColumn("url_rank", row_number().over(wUrl).cast("long"))
      .withColumn("keep",
        col("domain_rank") <= maxPerDomain &&
          col("url_rank") === 1L &&
          col("n_chars") >= minChars &&
          (if (blocklist.isEmpty) lit(true) else !col("domain").isin(blocklist: _*)))
  }

  /** Page-level crawl directives, regex tier (same RE2∩Java subset as
    * [[htmlExtract]]): the `<link rel="canonical">` target — the page's
    * OWN statement of its canonical URL, which outranks the fetch URL as
    * a dedup key when present — and the robots `noindex` flag that
    * removes a page from the corpus regardless of content quality.
    * Attribute order is free in HTML, so both orders are matched and
    * coalesced; absent signals yield NULL / false. Narrow, zero
    * Exchange. Returns `(idCol, canonical, noindex)`. */
  def pageSignals(df: DataFrame, idCol: String, htmlCol: String): DataFrame = {
    val h = col(htmlCol)
    def nonEmpty(c: Column): Column = when(length(c) > 0, c).otherwise(lit(null))
    val canonical = coalesce(
      nonEmpty(regexp_extract(h,
        "(?is)<link[^>]*rel=\"canonical\"[^>]*href=\"([^\"]*)\"", 1)),
      nonEmpty(regexp_extract(h,
        "(?is)<link[^>]*href=\"([^\"]*)\"[^>]*rel=\"canonical\"", 1)))
    val noindex = h.rlike(
      "(?is)<meta[^>]*name=\"robots\"[^>]*content=\"[^\"]*noindex") ||
      h.rlike("(?is)<meta[^>]*content=\"[^\"]*noindex[^\"]*\"[^>]*name=\"robots\"")
    df.select(col(idCol), canonical.as("canonical"), noindex.as("noindex"))
  }

  /** `<a href="...">` targets, one row per anchor in document order.
    * RE2∩Java regex subset (the [[htmlExtract]] convention: no
    * backreferences, no \b, no \s) so the oracle replays the extraction
    * verbatim with DuckDB's regexp_extract_all. Relative targets are
    * kept here — [[domainEdges]] drops them when host extraction comes
    * up empty. Narrow, zero Exchange. */
  def extractLinks(df: DataFrame, idCol: String, htmlCol: String): DataFrame =
    df.select(col(idCol),
      explode(regexp_extract_all(col(htmlCol),
        lit("(?is)<a[^>]*href=\"([^\"]*)\""), lit(1))).as("href"))

  /** Registered-domain link graph of a crawl: one edge
    * `(src_domain, dst_domain)` per distinct cross-domain anchor, with
    * both endpoints reduced to pay-level domains ([[registeredDomainOf]]
    * over the [[parseUrls]] host). Self-links and anchors without an
    * absolute-URL host (relative hrefs, malformed authorities) are
    * dropped. Feed the result to [[Graph.pageRankFixed]] for crawl-
    * frontier authority scores — the CommonCrawl-style domain ranking
    * used to prioritize and quality-weight web sources.
    *
    * Scale shape: extraction + two parse chains are narrow scan-speed
    * expressions; the only Exchange is the distinct on the edge set,
    * which is bounded by distinct domain PAIRS (≪ anchor count — the
    * Zipf head collapses map-side). */
  def domainEdges(
      pages: DataFrame,
      idCol: String,
      urlCol: String,
      htmlCol: String): DataFrame = {
    val links = pages
      .select(col(idCol).as("__doc"), col(urlCol).as("__src_url"),
        col(htmlCol).as("__html"))
    val anchors = links.select(col("__doc"), col("__src_url"),
      explode(regexp_extract_all(col("__html"),
        lit("(?is)<a[^>]*href=\"([^\"]*)\""), lit(1))).as("__href"))
    val withDst = parseUrls(anchors, "__href")
      .select(col("__doc"), col("__src_url"), col("host").as("__dst_host"))
    val withBoth = parseUrls(withDst, "__src_url")
      .select(col("__doc"), col("host").as("__src_host"), col("__dst_host"))
    withBoth
      .select(registeredDomainOf(col("__src_host")).as("src_domain"),
        registeredDomainOf(col("__dst_host")).as("dst_domain"))
      .where(length(col("src_domain")) > 0 && length(col("dst_domain")) > 0 &&
        col("src_domain") =!= col("dst_domain"))
      .distinct()
  }

  /** Page-with-outlinks fixture for the link-graph verify query: two
    * absolute anchors on [[syntheticUrl]]-transformed ids (the second
    * only on even ids) plus one relative anchor that host extraction
    * must drop. */
  def syntheticLinkPage(id: Column, lang: Column): Column =
    concat(
      lit("<html><head><title>page "), id.cast("string"),
      lit("</title></head><body><p>intro</p><a class=\"x\" href=\""),
      syntheticUrl(id * 13 + 1, lang),
      lit("\">one</a>"),
      when(id % 2 === 0,
        concat(lit("<a href=\""), syntheticUrl(id * 13 + 5, lang),
          lit("\">two</a>"))).otherwise(lit("")),
      lit("<a href=\"/relative/p-"), id.cast("string"),
      lit("\">rel</a></body></html>"))

  /** robots.txt parser (REP / RFC 9309 grammar): comment-stripped,
    * case-insensitive directive lines grouped into user-agent groups —
    * consecutive `User-agent:` lines open ONE group that owns the
    * following allow/disallow rules; rules before any user-agent line
    * belong to no group and are dropped; empty-value rules (the
    * "Disallow:" = allow-everything idiom) are dropped (no rule IS
    * allow). Returns one row per (group member agent, rule):
    * `(domain, grp, agent, rule, pattern, plen)` with `plen` the raw
    * pattern length — the specificity key [[robotsScreen]] ranks by.
    *
    * Scale: robots corpora are one small file per domain; the parse is
    * a line explode + one domain-keyed window (tiny Exchange), and the
    * resulting rule table broadcasts to any crawl-sized URL screen. */
  def parseRobots(df: DataFrame, domainCol: String, textCol: String): DataFrame = {
    val lines = df.select(col(domainCol).as("domain"),
        posexplode(split(col(textCol), "\n")).as(Seq("ln", "raw")))
      .select(col("domain"), col("ln"),
        trim(regexp_replace(col("raw"), "#.*", "")).as("line"))
      .where(col("line").contains(":"))
      .select(col("domain"), col("ln"),
        lower(trim(substring_index(col("line"), ":", 1))).as("key"),
        trim(expr("substring(line, instr(line, ':') + 1)")).as("value"))
      .where(col("key").isin("user-agent", "allow", "disallow"))
    val w = Window.partitionBy(col("domain")).orderBy(col("ln"))
    val grouped = lines
      .withColumn("is_ua", col("key") === "user-agent")
      .withColumn("new_grp",
        (col("is_ua") && !coalesce(lag(col("is_ua"), 1).over(w), lit(false)))
          .cast("int"))
      .withColumn("grp", sum(col("new_grp")).over(w))
      .where(col("grp") >= 1)
    val agents = grouped.where(col("is_ua"))
      .select(col("domain"), col("grp"), lower(col("value")).as("agent"))
    val rules = grouped.where(!col("is_ua") && length(col("value")) > 0)
      .select(col("domain"), col("grp"), col("key").as("rule"),
        col("value").as("pattern"), length(col("value")).as("plen"))
    agents.join(rules, Seq("domain", "grp"))
      .select(col("domain"), col("grp"), col("agent"), col("rule"),
        col("pattern"), col("plen"))
  }

  /** A robots path pattern as a SQL LIKE pattern (backslash escape):
    * literal `%`/`_`/`\` escaped, `*` → `%`, a TRAILING `$` anchors the
    * match (no trailing `%`), otherwise prefix semantics (`%`
    * appended) — the RFC 9309 wildcard grammar expressed in the one
    * match primitive every engine shares. */
  def robotsLikePattern(p: Column): Column = {
    val anchored = p.endsWith("$")
    val core = when(anchored, p.substr(lit(1), length(p) - 1)).otherwise(p)
    val esc = regexp_replace(core, "([\\\\%_])", "\\\\$1")
    val lik = regexp_replace(esc, "\\*", "%")
    when(anchored, lik).otherwise(concat(lik, lit("%")))
  }

  /** Crawl-politeness screen: each URL judged against the applicable
    * robots rules under the RFC 9309 precedence — the agent's OWN
    * group(s) if any exist for the domain (the generic `*` groups are
    * then IGNORED, per spec), longest-pattern-wins across the combined
    * applicable rules, allow beats disallow on a length tie, and no
    * matching rule means allowed. Returns
    * `(id, domain, path, allowed, win_rule, win_plen)` with the winning
    * rule NULL when nothing matched.
    *
    * Scale: the rule table is per-domain-tiny and BROADCAST; the crawl
    * side is one narrow scan + a partial-aggregable per-URL max — no
    * crawl-sized shuffle beyond the id regroup. */
  def robotsScreen(
      urls: DataFrame,
      idCol: String,
      domainCol: String,
      pathCol: String,
      rules: DataFrame,
      agent: String): DataFrame = {
    val a = agent.toLowerCase(java.util.Locale.ROOT)
    val mine = rules.where(col("agent") === a || col("agent") === "*")
      .withColumn("pref", when(col("agent") === a, 1).otherwise(0))
    val maxPref = mine.groupBy(col("domain")).agg(max(col("pref")).as("mp"))
    val applicable = mine.join(maxPref, "domain")
      .where(col("pref") === col("mp"))
      .select(col("domain"), col("rule"), col("plen"),
        robotsLikePattern(col("pattern")).as("like_pat"))
    urls.select(col(idCol).as("id"), col(domainCol).as("domain"),
        col(pathCol).as("path"))
      .join(broadcast(applicable), Seq("domain"), "left")
      .withColumn("m", expr("path LIKE like_pat"))
      .groupBy(col("id"), col("domain"), col("path"))
      .agg(max(when(col("m"),
        struct(col("plen"),
          (col("rule") === "allow").cast("int").as("is_allow"),
          col("rule").as("rule")))).as("win"))
      .select(col("id"), col("domain"), col("path"),
        (col("win").isNull || col("win.is_allow") === 1).as("allowed"),
        col("win.rule").as("win_rule"), col("win.plen").as("win_plen"))
  }

  /** Deterministic synthetic robots.txt per domain id (the syntheticUrl
    * convention — replayed verbatim in the oracle): a `*` group with
    * prefix, wildcard (`/tmp*`, id%3=0) and anchored (`/p$`, id%4=0)
    * rules plus mixed key casing, leading whitespace, comments, and
    * blank lines; an exact `graftbot` group on odd ids (whose presence
    * makes the `*` group ignorable for graftbot); and a TWO-agent group
    * (`graftbot` + `otherbot`, id%5=0) with an empty Disallow — so
    * ids ≡ 5 (mod 10) exercise multi-group rule combining and even
    * multiples of 5 exercise star-ignored-without-own-rules. */
  def syntheticRobots(domId: Column): Column = concat(
    lit("# robots for domain "), domId.cast("string"), lit("\n"),
    lit("User-agent: *\nDisallow: /admin\n  Allow: /admin/public\n"),
    when(domId % 3 === 0, lit("disallow: /tmp*\n")).otherwise(lit("")),
    when(domId % 4 === 0, lit("ALLOW: /p$\n")).otherwise(lit("")),
    lit("\n"),
    when(domId % 2 === 1,
      concat(lit("User-agent: graftbot\nDisallow: /p"),
        (domId % 7).cast("string"), lit("\n"))).otherwise(lit("")),
    when(domId % 5 === 0,
      concat(lit("\nUser-agent: graftbot\nUser-agent: otherbot\nAllow: /p"),
        (domId % 7).cast("string"), lit("/ok\nDisallow:\n")))
      .otherwise(lit("")))

  /** Deterministic crawl-frontier paths for the robots fixture: eight
    * templates covering every rule shape — the /admin prefix, its
    * /admin/public carve-out, the graftbot /p<k> prefix and its /ok
    * carve-out, the /tmp* wildcard, the bare /p anchor, a neutral path,
    * and the /padmin prefix-confusion probe. */
  def syntheticCrawlPath(id: Column): Column = {
    val u = id % 8
    when(u === 0, lit("/admin"))
      .when(u === 1, concat(lit("/admin/public/r"), (id % 5).cast("string")))
      .when(u === 2, concat(lit("/p"), (id % 7).cast("string")))
      .when(u === 3, concat(lit("/p"), (id % 7).cast("string"), lit("/ok")))
      .when(u === 4, concat(lit("/tmp/cache"), (id % 3).cast("string")))
      .when(u === 5, lit("/p"))
      .when(u === 6, concat(lit("/content/a"), (id % 9).cast("string")))
      .otherwise(lit("/padmin"))
  }

  /** Deterministic messy-URL generator for the verify fixtures (the
    * syntheticPng convention: formula of the id, replayed verbatim in the
    * oracle SQL). Exercises every normalization rule: uppercase scheme +
    * host, default and explicit ports, empty paths, tracking-only and
    * mixed query strings, unsorted params, fragments, a blocklisted
    * domain, and a co.uk multi-suffix. */
  def syntheticUrl(id: Column, lang: Column): Column = {
    val s = (m: Int) => id % m
    val scheme = when(s(3) === 0, "HTTP").when(s(3) === 1, "https")
      .otherwise("http")
    val host = when(s(4) === 0,
        concat(lit("WWW.News-"), s(7).cast("string"), lit(".Example.COM")))
      .when(s(4) === 1,
        concat(lit("Blog"), s(5).cast("string"), lit(".example.co.uk")))
      .when(s(4) === 2,
        concat(lit("cdn"), s(6).cast("string"), lit(".site"),
          s(3).cast("string"), lit(".ORG")))
      .otherwise(lit("Tracker.bad-ads.com"))
    val port = when(s(5) === 0, ":80").when(s(5) === 1, ":8080").otherwise("")
    val path = when(s(6) === 0, "").otherwise(
      concat(lit("/"), lang, lit("/article-"), id.cast("string")))
    val query = when(s(4) === 1, concat(lit("?gclid=ad"), id.cast("string")))
      .when(s(2) === 0,
        concat(lit("?utm_source=feed&id="), s(100).cast("string"),
          lit("&utm_campaign=x&b=2&a=1")))
      .when(s(8) === 3,
        concat(lit("?z=9&a=3&fbclid=f"), s(9).cast("string")))
      .otherwise(lit(""))
    val frag = when(s(3) === 2, concat(lit("#sec-"), s(10).cast("string")))
      .otherwise(lit(""))
    concat(scheme, lit("://"), host, port, path, query, frag)
  }

  /** Minimal page with crawl directives for the q_page_signals fixture:
    * two thirds of pages declare a canonical link (half rel-first, half
    * href-first attribute order), a fifth carry robots noindex (half
    * with content-before-name order). */
  def syntheticPage(id: Column, text: Column): Column = {
    val canon = when(id % 3 === 0,
        concat(lit("<link rel=\"canonical\" href=\"https://canon.example.com/c/"),
          id.cast("string"), lit("\"/>")))
      .when(id % 3 === 1,
        concat(lit("<link href=\"https://canon.example.com/h/"),
          id.cast("string"), lit("\" rel=\"canonical\"/>")))
      .otherwise(lit(""))
    val robots = when(id % 10 === 0,
        lit("<meta name=\"robots\" content=\"noindex,nofollow\"/>"))
      .when(id % 10 === 5,
        lit("<meta content=\"noindex\" name=\"robots\"/>"))
      .otherwise(lit(""))
    concat(lit("<html><head>"), canon, robots, lit("</head><body><p>"),
      text, lit("</p></body></html>"))
  }

  /** Deterministic HTML page around a text column (same convention):
    * head with title/style/script (the script body contains `&&` and a
    * fake closing-tag-free `<` to exercise the non-greedy spans), a
    * comment, entity-bearing headline, and the body text in a classed
    * paragraph. */
  def syntheticHtml(id: Column, text: Column): Column =
    concat(
      lit("<!DOCTYPE html><html><head><title> Doc &quot;"),
      id.cast("string"),
      lit("&quot; &amp; more </title><style type=\"text/css\">body { color: #fff; }</style>"),
      lit("<script type=\"text/javascript\">if (a && b < 3) { x = \"</div>\"; }</script>"),
      lit("</head><body><!-- generated: id "),
      id.cast("string"),
      lit(" --><h1>Title &lt;"),
      (id % 10).cast("string"),
      lit("&gt;&nbsp;&#39;q&#39;</h1><p class=\"main\">"),
      text,
      lit("</p><div>tail</div></body></html>"))
}
