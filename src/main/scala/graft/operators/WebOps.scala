package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Web-graph operators — the crawl-level quality signals every
  * published LLM-data recipe computes BEFORE any per-document text
  * gate runs: URL canonicalization and URL-level dedup (C4 and
  * RefinedWeb both dedup by normalized URL before touching text —
  * Raffel et al. arXiv:1910.10683 §2.2, Penedo et al.
  * arXiv:2306.01116 §3.2), hyperlink extraction, the host-level link
  * graph, and fixed-point PageRank over it (host centrality is the
  * standard crawl-frontier quality weight — Page et al. 1999; Common
  * Crawl publishes exactly this host-level ranking artifact per
  * snapshot). Reference scope: the reference processes payment pages,
  * not crawls (kinesis-pay.php builds its own page at :187-279) — the
  * whole family is the LLM-pipeline mandate.
  *
  * Everything here is projections + keyed aggregates over string
  * functions both engines share (regexp subset: inline flags, classes,
  * non-capturing groups — no backrefs, no lookaround), so the family
  * is SQL-oracle-checked end-to-end. PageRank's arithmetic is integer
  * fixed-point (micro-units, floored integer division at every step —
  * the §6 determinism rule), so five power iterations reproduce
  * bit-for-bit in DuckDB's chained CTEs.
  */
object WebOps {

  /** Deterministic messy-URL fixture column — the URL-bearing column
    * for [[urlNormalize]]/[[urlDedup]]: the `documents` table carries
    * no URL, so the registered queries synthesize one per doc from
    * pure string concatenation (the [[TextOps.syntheticHtml]]
    * pattern — the DuckDB oracle constructs the identical string, so
    * normalization is hash-checked end-to-end). Every 4 consecutive
    * doc_ids share one CANONICAL page (group `g = doc_id div 4`,
    * host `h{g%20}.example.com`, path `/p/{g}`, kept param `v={g%3}`)
    * but each messy variant exercises different normalization rules:
    * uppercase scheme (id%3=0), uppercase host (id%5=0), `www.`
    * prefix (id%7=0), explicit `:80` (id%11=0), doubled path slashes
    * (odd ids), trailing slash (id%13=0), shuffled query-param order
    * (id parity), per-doc tracking params (`fbclid=x{id}` — dropped,
    * so the group still collapses), and a fragment (id%3=1).
    */
  def syntheticUrl(docId: Column): Column = {
    val id = docId.cast("long")
    val g = ((id - pmod(id, lit(4L))) / lit(4L)).cast("long")
    val host = concat(
      when(pmod(id, lit(7L)) === 0L, lit("www.")).otherwise(lit("")),
      lit("h"), pmod(g, lit(20L)).cast("string"), lit(".example.com"))
    val v = pmod(g, lit(3L)).cast("string")
    concat(
      when(pmod(id, lit(3L)) === 0L, lit("HTTP")).otherwise(lit("http")),
      lit("://"),
      when(pmod(id, lit(5L)) === 0L, upper(host)).otherwise(host),
      when(pmod(id, lit(11L)) === 0L, lit(":80")).otherwise(lit("")),
      when(pmod(id, lit(2L)) === 1L, lit("//p/")).otherwise(lit("/p/")),
      g.cast("string"),
      when(pmod(id, lit(13L)) === 0L, lit("/")).otherwise(lit("")),
      when(pmod(id, lit(2L)) === 0L,
        concat(lit("?utm_source=feed&v="), v, lit("&fbclid=x"),
          id.cast("string")))
        .otherwise(concat(lit("?v="), v, lit("&fbclid=x"),
          id.cast("string"), lit("&utm_medium=rss"))),
      when(pmod(id, lit(3L)) === 1L,
        concat(lit("#s"), pmod(id, lit(3L)).cast("string")))
        .otherwise(lit("")))
  }

  /** Deterministic link-bearing page fixture — the hyperlink column
    * for [[linkExtract]]/[[hostGraph]]: each doc's page carries two
    * ABSOLUTE anchors to derived hosts (`h{(6·id+1)%20}` clean —
    * 6 shares a factor with 20, so only odd-residue hosts receive
    * these links and the host graph gets a real in-degree SKEW for
    * pageRank to resolve, instead of the all-equal fixed point an
    * invertible multiplier would produce — and `h{(13·id+3)%20}`
    * deliberately messy: uppercase scheme+host, `www.`, `:80`,
    * doubled slashes, a tracking param, so the host-graph edge
    * derivation exercises the normalizer on real anchor values) and
    * one RELATIVE anchor that [[hostGraph]] must drop (no host to
    * resolve against without a base-URL join; the documented
    * contract).
    */
  def syntheticLinkedHtml(docId: Column, text: Column): Column = {
    val id = docId.cast("long")
    concat(
      lit("<html>"),
      when(pmod(id, lit(9L)) === 4L,
        lit("<head><meta name='robots' content='noindex,nofollow'></head>"))
        .when(pmod(id, lit(9L)) === 7L,
          lit("<head><meta name='robots' content='nofollow'></head>"))
        .otherwise(lit("")),
      lit("<body><h1>Doc "), id.cast("string"), lit("</h1>\n<p>"),
      text, lit("</p>\n<p>See <a href=\"http://h"),
      pmod(id * 6L + 1L, lit(20L)).cast("string"),
      lit(".example.com/p/"), pmod(id, lit(50L)).cast("string"),
      lit("\">doc "), pmod(id, lit(50L)).cast("string"),
      lit("</a> and <a href=\"HTTP://WWW.h"),
      pmod(id * 13L + 3L, lit(20L)).cast("string"),
      lit(".EXAMPLE.COM:80//p/"), pmod(id, lit(50L)).cast("string"),
      lit("/?utm_source=x\">two</a> and <a href='/local/"),
      pmod(id, lit(5L)).cast("string"),
      lit("'>rel</a>.</p></body></html>"))
  }

  // canonicalization pieces shared by urlNormalize and hostGraph's
  // anchor-side derivation — one definition, no drift
  private def schemeOf(u: Column): Column =
    lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.\\-]*)://", 1))

  private def hostOf(u: Column): Column = {
    val rest = regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.\\-]*://(.*)$", 1)
    val hostport = lower(regexp_extract(rest, "^([^/?#]*)", 1))
    val noWww = regexp_replace(hostport, "^www\\.", "")
    when(schemeOf(u) === "http", regexp_replace(noWww, ":80$", ""))
      .when(schemeOf(u) === "https", regexp_replace(noWww, ":443$", ""))
      .otherwise(noWww)
  }

  /** URL canonicalization — the dedup key every crawl pipeline derives
    * before its first text pass: lowercase scheme and host, strip a
    * `www.` prefix, strip the scheme-default port (`:80` http /
    * `:443` https — a NON-default port is identity and stays),
    * collapse duplicate path slashes, strip one trailing slash (the
    * root path `/` stays), drop the fragment (client-side only, never
    * a distinct resource), drop tracking parameters (`utm_*`,
    * `fbclid`, `gclid`, `ref`, `mc_eid` — the public click-id set),
    * and SORT the surviving query params (param order is not
    * identity). Two fetches of one page that differ only in these
    * decorations collapse to one canonical string; [[urlDedup]] keys
    * on it. Pure projection — zero shuffle, scan speed at 100 TB.
    *
    * Honest limits, stated: no percent-encoding normalization (both
    * engines would need a chr()-arithmetic decoder; `%2F` vs `/` stays
    * distinct) and no IDN/punycode folding — both are documented
    * no-ops of the simple canonicalizer, not silent bugs.
    */
  def urlNormalize(documents: DataFrame, urlCol: String = "url"): DataFrame = {
    val u = col(urlCol)
    documents.select(col("doc_id"), u.as("url"), hostOf(u).as("host"),
      urlCanonicalCol(u).as("url_canonical"))
  }

  /** The canonical-URL EXPRESSION behind [[urlNormalize]] — exposed so
    * stream stages can APPEND it to a frame whose other columns must
    * ride through (the textExtractCols convention); one definition,
    * no drift.
    */
  private[graft] def urlCanonicalCol(u: Column): Column = {
    val rest = regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.\\-]*://(.*)$", 1)
    val pqf = regexp_extract(rest, "^[^/?#]*(.*)$", 1)
    val rawPath = regexp_extract(pqf, "^([^?#]*)", 1)
    val collapsed = regexp_replace(rawPath, "/{2,}", "/")
    val nonEmpty = when(collapsed === "", lit("/")).otherwise(collapsed)
    val path = when(length(nonEmpty) > 1 && endswith(nonEmpty, lit("/")),
      substr(nonEmpty, lit(1), length(nonEmpty) - 1)).otherwise(nonEmpty)
    val rawQuery = regexp_extract(pqf, "\\?([^#]*)", 1)
    val params = filter(split(rawQuery, "&"), p =>
      p =!= "" && !(startswith(p, lit("utm_")) ||
        startswith(p, lit("fbclid=")) || startswith(p, lit("gclid=")) ||
        startswith(p, lit("ref=")) || startswith(p, lit("mc_eid="))))
    concat(schemeOf(u), lit("://"), hostOf(u), path,
      when(size(params) > 0,
        concat(lit("?"), array_join(array_sort(params), "&")))
        .otherwise(lit("")))
  }

  /** URL-level dedup over [[urlNormalize]]'s canonical key — the
    * stage-0 every published crawl recipe runs before any content
    * hash (same page fetched twice under decorated URLs never reaches
    * the text dedup): per doc, its canonical URL, the group's keeper
    * (`canonical_doc` = min doc_id — deterministic and stable, the
    * dedupGroups keep policy), the group size, and the keep flag.
    * One window partitioned by the canonical key — shuffles on it,
    * the correct key at 100 TB (canonical URLs are near-unique, so
    * partitions stay balanced; a pathological single-URL skew is a
    * crawler bug this report is how you find).
    */
  def urlDedup(documents: DataFrame, urlCol: String = "url"): DataFrame = {
    val w = Window.partitionBy("url_canonical")
    urlNormalize(documents, urlCol)
      .select(col("doc_id"), col("url_canonical"),
        min(col("doc_id")).over(w).as("canonical_doc"),
        count(lit(1)).over(w).as("group_size"))
      .withColumn("keep", col("doc_id") === col("canonical_doc"))
  }

  // quote-aware anchor-attribute body (the textExtract attrBody rule
  // applied here): runs of non-delimiter chars or complete quoted
  // strings, so a quoted '>' in an attribute BEFORE href cannot
  // truncate the tag match. Lazy so the scan stops at the first href.
  private val aAttrs = "(?:[^>\"']|\"[^\"]*\"|'[^']*')*?"

  /** Hyperlink extraction — every `<a href>` value, one row per
    * (doc, anchor): the raw edge list the link graph and any
    * anchor-text model derive from. The tag pattern is attribute-
    * QUOTE-AWARE (the hardened textExtract rule — `data-x="a>b"`
    * before the href cannot truncate the match) and anchor-scoped, so
    * `href` on a `<link>` or `<area>` is not an edge. One
    * regexp_extract_all projection + explode; scan speed, no shuffle.
    */
  def linkExtract(documents: DataFrame, htmlCol: String = "html"): DataFrame =
    documents.select(col("doc_id"),
      explode(regexp_extract_all(col(htmlCol),
        lit("(?is)<a\\s" + aAttrs + "href=[\"']([^\"']+)[\"']"),
        lit(1))).as("href"))

  /** Host-level link graph — (src_host, dst_host, n_links) edges:
    * source host from the page's own canonical URL
    * ([[urlNormalize]]), destination host from each ABSOLUTE anchor
    * through the same shared host derivation (lowercase, `www.`
    * stripped — one definition, no drift); relative anchors drop
    * (resolving them needs the page base URL — the documented
    * contract is absolute-only edges, which is what a host GRAPH
    * needs; relative links are by construction same-host). One
    * projection + one (src, dst)-keyed count: the output is
    * hosts², aggregate-sized next to the page scan.
    */
  def hostGraph(documents: DataFrame, urlCol: String = "url",
      htmlCol: String = "html"): DataFrame = {
    val src = urlNormalize(documents, urlCol)
      .select(col("doc_id"), col("host").as("src_host"))
    val dst = linkExtract(documents, htmlCol)
      .select(col("doc_id"), hostOf(col("href")).as("dst_host"))
      .where(col("dst_host") =!= "")
    src.join(dst, "doc_id")
      .groupBy("src_host", "dst_host")
      .agg(count(lit(1)).as("n_links"))
  }

  /** Anchor-text profile per destination host — the link-context
    * relevance signal retrieval-model training mines from crawls (the
    * anchor is the linking author's one-line description of the
    * target; aggregated anchors approximate queries the target
    * answers — the classic IR use, and the modern query-document
    * pair source): every `<a href>…</a>` pair, href resolved to its
    * canonical host through the SAME shared derivation as
    * [[hostGraph]] (absolute-only, same contract), anchor text
    * trimmed, one (dst_host, anchor, n) count. The paired extraction
    * rides ONE regex applied twice (group 1 = href, group 2 = body) —
    * match order is the document's, so zip_with aligns them by
    * construction. Honest limit, stated: anchors containing nested
    * tags keep them verbatim (group 2 is the raw body; run the
    * extractor's tag strip downstream if markup-free anchors are
    * needed).
    */
  def anchorText(documents: DataFrame, htmlCol: String = "html"): DataFrame = {
    val pat = "(?is)<a\\s" + aAttrs + "href=[\"']([^\"']+)[\"']" +
      aAttrs + ">(.*?)</a>"
    val pairs = zip_with(
      regexp_extract_all(col(htmlCol), lit(pat), lit(1)),
      regexp_extract_all(col(htmlCol), lit(pat), lit(2)),
      (h, t) => struct(h.as("href"), t.as("anchor")))
    documents.select(explode(pairs).as("z"))
      .select(hostOf(col("z.href")).as("dst_host"),
        trim(col("z.anchor")).as("anchor"))
      .where(col("dst_host") =!= "")
      .groupBy("dst_host", "anchor")
      .agg(count(lit(1)).as("n"))
  }

  /** Robots-meta gate — the opt-out every published crawl corpus
    * honors before training (`noindex` pages are the author saying
    * "do not use this"; C4's descendants and RefinedWeb both filter
    * on it): per page, the `<meta name="robots">` content verbatim
    * plus the two decision flags (`noindex`, `nofollow` — token
    * matches within the comma-separated directive list). Pure
    * projection, scan-local; pages with no directive carry the empty
    * string and false flags, so the gate composes as a simple
    * `!noindex` filter.
    */
  private def robotsContentOf(html: Column): Column =
    regexp_extract(lower(html),
      "<meta\\s+name=[\"']robots[\"']\\s+content=[\"']([^\"']*)[\"']", 1)

  private def robotsFlag(content: Column, directive: String): Column =
    size(filter(split(content, ","), d => trim(d) === directive)) > 0

  /** The `noindex` decision as a bare EXPRESSION — the stream-gate
    * door ([[graft.streaming.DocStream.curatePipelineFromWarc]] drops
    * opted-out pages with it before extraction pays for them); same
    * token-exact parse as [[metaRobots]], one definition.
    */
  private[graft] def noindexCol(html: Column): Column =
    robotsFlag(robotsContentOf(html), "noindex")

  def metaRobots(documents: DataFrame, htmlCol: String = "html"): DataFrame =
    documents
      .select(col("doc_id"), robotsContentOf(col(htmlCol)).as("robots"))
      .withColumn("noindex", robotsFlag(col("robots"), "noindex"))
      .withColumn("nofollow", robotsFlag(col("robots"), "nofollow"))

  /** Fixed-point PageRank over a weighted host graph (Page, Brin,
    * Motwani & Winograd 1999; damping 0.85) — the crawl-quality
    * centrality signal, as a deterministic query: ranks live in
    * micro-units (1.0 = 1 000 000), each of `iters` power iterations
    * computes rank'(v) = 150 000 + Σ_u (rank(u)·850000·w(u,v)) div
    * (1000000·outw(u)) with FLOORED integer division at the single
    * defined point (the §6 rule — Spark `div` and DuckDB `//` agree
    * on non-negative operands, so five chained-CTE iterations in the
    * oracle reproduce the ranks bit-for-bit). The simple variant:
    * dangling mass is not redistributed (a node with no outlinks
    * absorbs; the fixture graph has none) and ranks are per-node
    * scores, not a normalized distribution — the form used as a
    * quality FEATURE, where only the ordering and relative magnitude
    * matter.
    *
    * Scale shape: the edge frame is host-pairs (aggregate-sized next
    * to any page scan — the web is ~10⁸ hosts, not 10¹¹ pages) and
    * each iteration is one keyed join + one keyed aggregate over it —
    * the Pregel shape, shuffling on host ids, never on pages. The
    * prepared edge and node frames persist (MEMORY_AND_DISK) because
    * the unrolled plan references them per iteration — aggregate-sized
    * pins, the memoized-fixture retention rule. Overflow bound,
    * stated: rank·850000·w must stay under 2⁶³ — with total rank mass
    * ≤ nodes·10⁶ that holds to ~10⁹ edge weight on a 10⁶-host graph;
    * beyond that, pre-scale the weights (only their RATIO per source
    * host matters).
    */
  def pageRank(edges: DataFrame, srcCol: String = "src_host",
      dstCol: String = "dst_host", wCol: String = "n_links",
      iters: Int = 5, persistFrames: Boolean = true): DataFrame = {
    require(iters >= 1, s"pageRank: iters must be >= 1, got $iters")
    // persistFrames: the unrolled plan references the prepared edge
    // and node frames once per iteration, so by default they persist
    // (aggregate-sized pins). The pins are PER-CALL instances a lazy
    // result cannot unpersist — a long-lived driver invoking the
    // operator repeatedly should pass persistFrames = false and hand
    // in an already-persisted edge frame instead (the registry's
    // memoized host-graph pattern), keeping cache retention caller-
    // owned (review finding).
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    def pinned(df: DataFrame): DataFrame =
      if (persistFrames) df.persist(lvl) else df
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
      col(wCol).cast("long").as("w"))
    val outw = e.groupBy("src").agg(sum(col("w")).as("outw"))
    val ew = pinned(e.join(outw, "src"))
    val nodes = pinned(e.select(col("src").as("host"))
      .union(e.select(col("dst"))).distinct())
    var ranks = nodes.select(col("host"), lit(1000000L).as("rank_micro"))
    for (_ <- 1 to iters) {
      val inflow = ew.join(ranks.withColumnRenamed("host", "src"), "src")
        .select(col("dst").as("host"),
          expr("(rank_micro * 850000 * w) div (1000000 * outw)").as("c"))
        .groupBy("host").agg(sum(col("c")).as("inflow"))
      ranks = nodes.join(inflow, Seq("host"), "left")
        .select(col("host"),
          (lit(150000L) + coalesce(col("inflow"), lit(0L))).as("rank_micro"))
    }
    ranks
  }

  /** Encoding-damage audit — the mojibake/replacement-char scorecard
    * a curation pass runs where CCNet runs charset fixing (double-
    * encoded UTF-8 and lossy transcodes are the classic crawl damage;
    * a damaged page poisons every downstream tokenizer and dedup
    * hash): per doc, counts of U+FFFD replacement chars, the two
    * canonical double-UTF-8 markers (`Ã` U+00C3 — every Latin-1-as-
    * UTF-8 two-byte sequence starts with it — and the `â€`
    * Windows-1252 punctuation digraph), C0 control chars (legit text
    * has none beyond \t \n \r), and `damage_ppm` = damaged chars per
    * million (floored integer division, §6). Threshold-free by
    * design: the flags are exact counts, the consumer picks the gate
    * (is_damaged = any count > 0 is the strict one). Pure projection
    * — scan speed, zero shuffle.
    */
  def encodingAudit(documents: DataFrame): DataFrame = {
    val t = col("text")
    def occ(marker: String): Column =
      (length(t) - length(replace(t, lit(marker)))).cast("long")
    val nRep = occ("\uFFFD")
    val nC3 = occ("\u00C3")
    val nWin = (occ("\u00E2\u20AC").cast("double") / 2).cast("long")
    val nCtrl = (length(t) - length(regexp_replace(t,
      "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]", ""))).cast("long")
    documents
      .select(col("doc_id"), nRep.as("n_replacement"),
        nC3.as("n_double_utf8"), nWin.as("n_win1252"), nCtrl.as("n_ctrl"),
        greatest(length(t), lit(1)).cast("long").as("len_c"))
      .select(col("doc_id"), col("n_replacement"), col("n_double_utf8"),
        col("n_win1252"), col("n_ctrl"),
        expr("((n_replacement + n_double_utf8 + n_win1252 + n_ctrl)" +
          " * 1000000) div len_c").as("damage_ppm"))
  }

  /** Deterministic damage-injection fixture for [[encodingAudit]] —
    * the testdata text is clean ASCII by construction, so the
    * registered query plants each damage class on a disjoint residue
    * slice (`id%7=3` double-UTF-8 `cafÃ©`, `id%11=5` a replacement
    * char, `id%13=7` a C0 control) and the oracle mirrors the
    * injection with chr(); the untouched majority pins the
    * zero-damage path on every other row.
    */
  def syntheticDamage(docId: Column, text: Column): Column = {
    val id = docId.cast("long")
    val withMoji = when(pmod(id, lit(7L)) === 3L,
      concat(text, lit(" caf\u00C3\u00A9 and \u00E2\u20AC\u0153quote")))
      .otherwise(text)
    val withRep = when(pmod(id, lit(11L)) === 5L,
      concat(withMoji, lit(" x\uFFFD"))).otherwise(withMoji)
    when(pmod(id, lit(13L)) === 7L, concat(withRep, lit("\u0007")))
      .otherwise(withRep)
  }
}
