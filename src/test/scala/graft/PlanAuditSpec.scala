package graft

import graft.operators.Payments
import graft.sources.Tables

/** Plan audits: the scale properties SURVEY.md §5 promises, asserted
  * against the actual physical plans so they can't silently regress —
  * filter/column pushdown to the parquet scan, broadcast joins on
  * dims, no single-partition window stages.
  */
class PlanAuditSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"
  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("entry() flagship returns rows (the driver smoke-check)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q_audio_meta registered view: envelope csv-flattened losslessly, " +
      "no array column survives (driver row-sort contract)") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.ArrayType
    val df = SparkEntry.queries("q_audio_meta")(spark, dir)
    // the driver's pandas comparator crashes sorting array cells
    // (CORRECTNESS_r09's one red row) — the registered view must be
    // scalar-only
    assert(!df.schema.exists(_.dataType.isInstanceOf[ArrayType]),
      s"array column in the registered view: ${df.schema.treeString}")
    assert(df.columns.contains("envelope_csv"))
    // lossless vs the array API: csv cells parse back to the exact
    // float values (cast("string") of FloatType round-trips)
    val viaCsv = df.select(col("doc_id"), col("envelope_csv")).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("envelope_csv").split(",").map(_.toFloat).toSeq)
      .toMap
    val viaArr = graft.operators.AudioOps.extractAudioFeatures(
      graft.operators.AudioOps.syntheticAudio(
        Tables(spark, dir, "documents")))
      .collect().map(f => f.docId -> f.envelope.toSeq).toMap
    assert(viaCsv.keySet == viaArr.keySet)
    assert(viaCsv.forall { case (id, v) => v == viaArr(id) },
      "csv flatten must be lossless vs the array API")
    assert(df.count() > 0)
  }

  test("q1_agg: shipdate filter and column pruning reach the parquet scan") {
    val p = plan(Payments.pricingSummary(Tables(spark, dir, "lineitem")))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
    assert(!p.contains("l_partkey"), "scan must prune unused columns")
  }

  test("invoiceReconcile: dims are broadcast, never sort-merge joined") {
    val p = plan(Payments.invoiceReconcile(Tables(spark, dir, "orders"),
      Tables(spark, dir, "customer"), Tables(spark, dir, "nation")))
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("latestStatus: exactly one shuffle, keyed by the entity") {
    val p = plan(Payments.latestStatus(Tables(spark, dir, "events")))
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1)
    assert(p.contains("hashpartitioning(user_id"))
  }

  test("xrateAsof: event-sized window partitions by (currency, bucket), not symbol-only") {
    val df = Payments.xrateAsof(Tables(spark, dir, "events"))
    val p = plan(df)
    assert(!p.contains("SinglePartition"),
      "as-of carry-forward must never run a global window stage")
    // The event-sized carry-forward sort must shuffle on the composite
    // (currency, bucket) key — a symbol-only partitioning caps
    // parallelism at |symbols| (=2 here) at any cluster size.
    assert(p.linesIterator.exists(l =>
      l.contains("hashpartitioning(currency") && l.contains("bucket")),
      s"within-bucket window must hash on (currency, bucket):\n$p")
    // And the composite key is genuinely high-cardinality on the data:
    // more distinct (currency, bucket) groups than symbols.
    val events = Tables(spark, dir, "events")
    val nGroups = events
      .selectExpr("CASE WHEN event_id % 2 = 0 THEN 'KAU' ELSE 'KAG' END AS c",
        "floor(cast(ts as long) / 86400) AS b")
      .distinct().count()
    assert(nGroups > 2, s"expected > 2 (currency, bucket) groups, got $nGroups")
  }

  test("pollSample: sampling filter is partition-local (no pre-agg shuffle of raw rows)") {
    val df = Payments.pollSample(Tables(spark, dir, "events"))
    val p = plan(df)
    // one shuffle for the final groupBy only; the % filter runs at the scan
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1)
  }

  test("annLsh: bucket join is a hash join, never cartesian") {
    val p = plan(graft.operators.Similarity.annLsh(
      Tables(spark, dir, "embeddings")))
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("BroadcastHashJoin") || p.contains("ShuffledHashJoin"))
  }

  test("tfidfTop: doc bound pushed into the tf scan; df scan stays global") {
    val p = plan(graft.operators.TextOps.tfidfTop(
      Tables(spark, dir, "documents")))
    if (p.contains("InMemoryTableScan")) {
      // another operator's persisted frame matched a shared subtree
      // (the wordEntropy cache-substitution case): the bound cannot
      // push INTO a cache, so it must survive as a filter above it —
      // the parquet pushdown itself is asserted by the uncached shape
      assert(p.contains("< 100") || p.contains("LessThan(doc_id,100)"),
        s"the doc bound must still gate the cached tf branch:\n$p")
    } else {
      // Catalyst specializes the shared subtree: the bounded tf branch
      // reads only doc_id < 100 at the scan, the df branch reads all
      assert(p.contains("LessThan(doc_id,100)"),
        s"tf branch must push the doc bound to parquet:\n$p")
      val scans = p.linesIterator.count(_.contains("FileScan parquet"))
      assert(scans >= 2, "df branch keeps its own global scan")
    }
  }

  test("piiScrub: pure projection — zero exchanges, pruned scan") {
    val p = plan(graft.operators.TextOps.piiScrub(Tables(spark, dir, "documents")))
    assert(!p.contains("Exchange"), "PII scrubbing must be scan-local")
    assert(!p.contains("lang"), "scan must prune unused columns")
  }

  test("unigramLogProb: freq join is a hash join, never cartesian") {
    val p = plan(graft.operators.TextOps.unigramLogProb(
      Tables(spark, dir, "documents")))
    assert(!p.contains("CartesianProduct"))
    // the only nested-loop join is the broadcast of the single-row total
    assert(p.contains("BroadcastHashJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("SortMergeJoin"))
  }

  test("rateOhlc: map-side partial aggregation, no window, no tick shuffle") {
    val p = plan(Payments.rateOhlc(Tables(spark, dir, "events")))
    // the struct-keyed min_by/max_by plans as SortAggregate (struct
    // buffers are not hash-aggregable), but the PARTIAL agg still runs
    // below the exchange — one row per (currency, day) crosses the
    // network, never the raw ticks, and no per-group window runs
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1)
    assert(p.contains("hashpartitioning(currency"), s"expected composite key:\n$p")
    assert(p.contains("partial_min_by"),
      s"open/close must combine map-side below the exchange:\n$p")
    assert(!p.contains("Window"),
      s"OHLC must aggregate, never run a per-group window:\n$p")
  }

  test("domainMix: pure pushed-down filter — zero exchanges, pruned scan") {
    val p = plan(graft.operators.Curation.domainMix(
      Tables(spark, dir, "documents")))
    assert(!p.contains("Exchange"), s"mix sampling must not shuffle:\n$p")
    assert(!p.contains("n_chars"), "scan must prune unused columns")
  }

  test("packSequences: window partitions by shard, never a global sort") {
    val p = plan(graft.operators.Curation.packSequences(
      Tables(spark, dir, "documents")))
    assert(!p.contains("SinglePartition"),
      s"packing must stay sharded — a global cumsum is the scale-killer:\n$p")
    assert(p.contains("hashpartitioning(shard"), s"expected shard-keyed window:\n$p")
  }

  test("packStats: the audit adds no exchange beyond packSequences' shard shuffle") {
    val p = plan(graft.operators.Curation.packStats(
      Tables(spark, dir, "documents")))
    // window on shard, groupBy(shard, bin), groupBy(shard): the shard
    // hash satisfies every downstream clustering — exactly ONE shuffle
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1,
      s"the whole audit must ride the single shard exchange:\n$p")
    assert(!p.contains("SinglePartition"), s"no global stage:\n$p")
  }

  test("snapshotDiff: one keyed full-outer join; text is hashed below it") {
    val (o, n) = graft.operators.Curation.snapshotPair(
      Tables(spark, dir, "documents"))
    val p = plan(graft.operators.Curation.snapshotDiff(o, n))
    assert(p.contains("FullOuter"), s"diff must be a full-outer join:\n$p")
    assert(!p.contains("Cartesian") && !p.contains("BroadcastNestedLoop"),
      s"diff join must stay keyed on doc_id:\n$p")
    // the md5 projection runs scan-side, so only (doc_id, source, h)
    // rows shuffle — the corpus text itself never crosses the exchange.
    // Textual check (AdaptiveSparkPlanExec is a leaf, so a structural
    // collect cannot see inside): the node each Exchange reads from
    // must be a Project that hashes text (md5-in-expression is fine)
    // without emitting it as a bare column.
    val lines = p.linesIterator.toVector
    val exIdx = lines.zipWithIndex
      .filter(_._1.contains("Exchange hashpartitioning")).map(_._2)
    assert(exIdx.nonEmpty, s"expected keyed exchanges:\n$p")
    exIdx.foreach { i =>
      val feeder = lines(i + 1)
      // a BARE text output sits at the projection's top level (after
      // '[' or ', '); text consumed inside an expression is preceded
      // by '(' and is exactly the hashed-below-the-shuffle shape
      assert(feeder.contains("Project [") &&
        !feeder.matches(""".*(\[|, )text#\d+[,\]].*"""),
        s"shuffled rows must not carry raw text:\n$p")
    }
  }

  test("dataQuality: referential rules are anti-joins, never cartesian") {
    val p = plan(graft.operators.Payments.dataQuality(
      Tables(spark, dir, "orders"), Tables(spark, dir, "lineitem"),
      Tables(spark, dir, "customer"), Tables(spark, dir, "events")))
    assert(p.contains("LeftAnti"), s"orphan checks must be anti-joins:\n$p")
    assert(!p.contains("Cartesian") && !p.contains("BroadcastNestedLoop"),
      s"no rule may scan cross products:\n$p")
  }

  test("suppressedRevenue: dims broadcast; suppression adds no exchange") {
    val p = plan(graft.operators.Payments.suppressedRevenue(
      Tables(spark, dir, "orders"), Tables(spark, dir, "customer"),
      Tables(spark, dir, "nation")))
    assert(p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"),
      s"customer/nation must broadcast:\n$p")
  }

  test("snapshotDrift: one keyed full-outer join on (source, tok), never cartesian") {
    val (o, n) = graft.operators.Curation.snapshotPair(
      Tables(spark, dir, "documents"))
    val p = plan(graft.operators.Curation.snapshotDrift(o, n))
    assert(p.contains("FullOuter"), s"expected the full-outer tf join:\n$p")
    assert(!p.contains("Cartesian") && !p.contains("BroadcastNestedLoop"),
      s"drift must stay keyed:\n$p")
  }

  test("decontaminate: shingle join is a hash join, never cartesian") {
    val p = plan(graft.operators.Curation.decontaminate(
      Tables(spark, dir, "documents")))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"decontamination must equi-join on the shingle key:\n$p")
  }

  test("dupSpan: gram join stays an equi-join, never cartesian") {
    val p = plan(graft.operators.Dedup.dupSpan(
      Tables(spark, dir, "documents")))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"duplicated-gram lookup must equi-join on the gram key:\n$p")
  }

  test("dupSpanMerge: island window partitions by doc, never SinglePartition") {
    val p = plan(graft.operators.Dedup.dupSpanMerge(
      Tables(spark, dir, "documents")))
    assert(!p.contains("SinglePartition"),
      s"the gaps-and-islands merge must stay per-doc parallel:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"duplicated-gram lookup must equi-join on the gram key:\n$p")
  }

  test("topNgramFrac: per-doc argmax becomes WindowGroupLimit, no global sort") {
    val p = plan(graft.operators.TextOps.topNgramFrac(
      Tables(spark, dir, "documents")))
    assert(p.contains("WindowGroupLimit"),
      s"the rn=1 filter must prune before the window shuffle:\n$p")
    assert(!p.contains("SinglePartition"),
      s"the per-doc argmax must stay doc-parallel:\n$p")
  }

  test("curateCorpus: the composed pipeline plans no cartesian anywhere") {
    val p = plan(graft.operators.Curation.curateCorpus(
      Tables(spark, dir, "documents")))
    assert(!p.contains("CartesianProduct"),
      s"no stage of the pipeline may go all-pairs:\n$p")
  }

  test("dsirSelect: global top-k goes through WindowGroupLimit") {
    val p = plan(graft.operators.Curation.dsirSelect(
      Tables(spark, dir, "documents")))
    assert(p.contains("WindowGroupLimit"),
      s"the rank filter must prune per partition before the final stage:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("mixWeights: corpus shuffles once on lang; no cartesian") {
    val p = plan(graft.operators.Curation.mixWeights(
      Tables(spark, dir, "documents")))
    assert(p.contains("Exchange hashpartitioning(lang"),
      s"the per-lang aggregate must be the only corpus shuffle:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"the one-row totals must broadcast:\n$p")
  }

  test("probeScore: literal-weight scoring adds no exchange beyond hashEmbed's") {
    val docs = Tables(spark, dir, "documents")
    val base = plan(graft.operators.TextOps.hashEmbed(docs))
      .linesIterator.count(_.contains("Exchange"))
    val p = plan(graft.operators.Curation.probeScore(docs))
    assert(p.linesIterator.count(_.contains("Exchange")) == base,
      s"scoring must be a pure projection over the feature frame:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("cutSpans: ownership window partitions by gram; all joins keyed") {
    val p = plan(graft.operators.Dedup.cutSpans(
      Tables(spark, dir, "documents")))
    assert(!p.contains("SinglePartition"),
      s"gram ownership must stay gram-parallel:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"every join here has an equi-key:\n$p")
  }

  test("randomProject: pure projection — zero exchanges, zero joins") {
    val p = plan(graft.operators.Similarity.randomProject(
      Tables(spark, dir, "embeddings")))
    assert(!p.contains("Exchange"),
      s"the sign projection must run at scan speed:\n$p")
    assert(!p.contains("Join"), s"no join belongs in a projection:\n$p")
  }

  test("embedPca: after the one-aggregate fit, the projection is pure — " +
      "zero exchanges, kernel dots against literal axes") {
    val p = plan(graft.operators.Similarity.embedPca(
      Tables(spark, dir, "embeddings"), k = 4))
    assert(!p.contains("Exchange"),
      s"the PCA apply pass must run at scan speed:\n$p")
    assert(!p.contains("Join"), s"no join belongs in a projection:\n$p")
    assert(p.contains("dot_f32"),
      "projection must ride the codegen dot kernel")
    assert(!p.contains("label"), "scan must prune unused columns")
  }

  test("tokenBudget: histogram side broadcasts; corpus never globally sorts") {
    val p = plan(graft.operators.Curation.tokenBudget(
      Tables(spark, dir, "documents")))
    // the cutoff frame (langs x buckets) must come back as a broadcast,
    // and the only windows may be the tiny histogram cumsum and the
    // boundary bucket — never a single-partition pass over the corpus
    assert(p.contains("BroadcastHashJoin"),
      s"expected the bucket histogram broadcast back to the scan:\n$p")
    assert(!p.contains("SinglePartition"),
      s"token-budget selection must not sort the corpus globally:\n$p")
  }

  test("qualityTopK: rank filter becomes WindowGroupLimit (pre-shuffle top-k)") {
    val p = plan(graft.operators.Curation.qualityTopK(
      Tables(spark, dir, "documents")))
    assert(p.contains("WindowGroupLimit"),
      s"rnk <= k must rewrite to WindowGroupLimit:\n$p")
  }

  test("lengthHist: pure projection + aggregate — scan prunes to (lang, text)") {
    val p = plan(graft.operators.TextOps.lengthHist(
      Tables(spark, dir, "documents")))
    assert(!p.contains("doc_id"), "scan must prune unused columns")
    assert(p.contains("partial"), "aggregate must combine map-side")
  }

  test("native expressions stay inside whole-stage codegen") {
    val p = plan(Payments.hmacSign(Tables(spark, dir, "events")))
    // the signature projection must carry the codegen-stage marker
    // (`*(n) Project [...hmac...]`), i.e. not fall back to interpreted
    val hmacLine = p.linesIterator.find(_.contains("hmac_sha256_hex"))
    assert(hmacLine.exists(_.trim.startsWith("*(")),
      s"hmac projection not codegen'd:\n$p")
  }

  test("tokenChunks: zero exchanges — chunking runs at scan speed") {
    val p = plan(graft.operators.Curation.tokenChunks(
      Tables(spark, dir, "documents")))
    assert(!p.contains("Exchange"),
      s"chunk explode+slice must stay partition-local:\n$p")
    assert(!p.contains("lang"), "scan must prune unused columns")
  }

  test("blocklistFilter: pure projection + filter — zero exchanges") {
    val p = plan(graft.operators.TextOps.blocklistFilter(
      Tables(spark, dir, "documents")))
    assert(!p.contains("Exchange"), s"blocklist scoring must not shuffle:\n$p")
  }

  test("wordEntropy: two keyed aggregates, both map-side partial, no joins") {
    val p = plan(graft.operators.TextOps.wordEntropy(
      Tables(spark, dir, "documents")))
    // wordEntropy's (doc, tok) tf subtree is logically identical to the
    // frame unigramLogProb persists, so when that operator ran earlier
    // in the session the cache manager substitutes the InMemoryRelation
    // (whose nested build plan re-lists its own exchange under both AQE
    // sections). Audit the region ABOVE the cache boundary in that case
    // — one doc-keyed exchange — and the uncached two-exchange shape
    // otherwise.
    if (p.contains("InMemoryTableScan")) {
      val outer = p.linesIterator.takeWhile(!_.contains("InMemoryRelation")).toSeq
      assert(outer.count(_.contains("Exchange hashpartitioning")) == 1,
        s"expected exactly the doc aggregate exchange above the cached tf:\n$p")
    } else {
      assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 2,
        s"expected exactly (doc,tok) + doc aggregate exchanges:\n$p")
    }
    assert(!p.contains("Join"), "entropy needs no join")
    assert(p.contains("partial"), "aggregates must combine map-side")
  }

  test("pmiTop: small-input vocab broadcasts via stats (no forced hint); " +
      "top-k becomes WindowGroupLimit") {
    val p = plan(graft.operators.TextOps.pmiTop(
      Tables(spark, dir, "documents")))
    // no broadcast() hint on the unigram frame (unbounded at corpus
    // scale) — Catalyst's size stats must still pick broadcast at THIS
    // scale, proving the hint was never needed for the small case
    assert(p.contains("BroadcastHashJoin"),
      s"stats should broadcast the tiny uni frame here:\n$p")
    assert(!p.contains("SortMergeJoin"))
    assert(p.contains("WindowGroupLimit"),
      s"rnk <= k must rewrite to WindowGroupLimit:\n$p")
  }

  test("zipfSlope: top-R rank becomes WindowGroupLimit; no joins anywhere") {
    val p = plan(graft.operators.TextOps.zipfSlope(
      Tables(spark, dir, "documents")))
    assert(p.contains("WindowGroupLimit"),
      s"r <= topR must rewrite so partitions ship <= topR rows:\n$p")
    assert(!p.contains("Join"), "the fit is aggregates + one window only")
    assert(p.contains("partial"), "moment aggregates must combine map-side")
  }

  test("hashEmbedSparse: two keyed aggregates, no nested-loop anything") {
    val p = plan(graft.operators.TextOps.hashEmbedSparse(
      Tables(spark, dir, "documents")))
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("partial"), "count/norm aggregates must combine map-side")
  }

  test("bigramLogProb: keyed equi-joins only, single-row vocab broadcast") {
    val p = plan(graft.operators.TextOps.bigramLogProb(
      Tables(spark, dir, "documents")))
    assert(!p.contains("CartesianProduct"))
    // the only nested-loop is the single-row vocab-count cross join
    assert(p.linesIterator.count(_.contains("BroadcastNestedLoopJoin")) <= 1,
      s"only the 1-row vocab total may cross-join:\n$p")
    assert(p.contains("partial"))
  }

  test("ccnetBuckets: doc-sized window partitions by (lang, bin), not lang") {
    val p = plan(graft.operators.Curation.ccnetBuckets(
      Tables(spark, dir, "documents")))
    // the only corpus-sized sort must key on the composite — a plain
    // per-lang window would cap parallelism at |langs| (xrate lesson)
    assert(p.contains("hashpartitioning(lang") &&
      p.linesIterator.exists(l => l.contains("hashpartitioning(lang") &&
        l.contains("bin")),
      s"corpus window must partition by (lang, bin):\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("dsirScore: bucket-keyed equi-joins only; aggregates combine map-side") {
    val p = plan(graft.operators.Curation.dsirScore(
      Tables(spark, dir, "documents")))
    assert(!p.contains("CartesianProduct"))
    // the only nested-loop is the single-row totals cross join
    assert(p.linesIterator.count(_.contains("BroadcastNestedLoopJoin")) <= 1,
      s"only the 1-row totals frame may cross-join:\n$p")
    assert(p.contains("partial"))
  }

  test("sourceReport: two keyed aggregates joined on source, no cartesian") {
    val p = plan(graft.operators.TextOps.sourceReport(
      Tables(spark, dir, "documents")))
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("partial"), "mass aggregates must combine map-side")
  }

  test("oovRate: vocab broadcasts back; vocab rank becomes WindowGroupLimit") {
    val p = plan(graft.operators.TextOps.oovRate(
      Tables(spark, dir, "documents")))
    assert(p.contains("BroadcastHashJoin"), s"vocab join must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"))
    assert(p.contains("WindowGroupLimit"),
      s"vocab rank filter must rewrite to WindowGroupLimit:\n$p")
  }

  test("sourceOverlap: gram self-join is an equi-join, never cartesian") {
    val p = plan(graft.operators.Dedup.sourceOverlap(
      Tables(spark, dir, "documents")))
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"gram key must drive a hash equi-join:\n$p")
  }

  test("annIvfPq: corpus side has no join before the cell equi-join; no cartesian") {
    val p = plan(graft.operators.Similarity.annIvfPq(
      Tables(spark, dir, "embeddings")))
    assert(!p.contains("CartesianProduct"), s"no cartesian in IVF-PQ:\n$p")
    // the ADC candidate join is keyed on the probed cell
    assert(p.contains("BroadcastHashJoin") || p.contains("ShuffledHashJoin"),
      s"cell-keyed candidate join must be a hash join:\n$p")
  }

  test("annIvfPqLearned: same plan discipline as the fixed-cell variant") {
    val p = plan(graft.operators.Similarity.annIvfPqLearned(
      Tables(spark, dir, "embeddings")))
    assert(!p.contains("CartesianProduct"), s"no cartesian in learned IVF-PQ:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("ShuffledHashJoin"),
      s"cell-keyed candidate join must be a hash join:\n$p")
  }

  test("mixApply: langs-sized rates join broadcasts; documents never sort-merge") {
    val p = plan(graft.operators.Curation.mixApply(
      Tables(spark, dir, "documents")))
    assert(p.contains("BroadcastHashJoin"),
      s"the rates frame must broadcast onto the corpus scan:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"a corpus-side shuffle join defeats the one-scan admit:\n$p")
  }

  test("decontaminateBloom: the bloom prefilter is pushed below the distinct") {
    val df = graft.operators.Curation.decontaminateBloom(
      Tables(spark, dir, "documents"))
    val lp = df.queryExecution.optimizedPlan
    val bloomFilters = lp.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
        if f.condition.collectFirst {
          case b: org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain => b
        }.isDefined => f
    }
    assert(bloomFilters.nonEmpty, s"bloom membership filter missing:\n$lp")
    // pushed below the distinct = no Aggregate inside the filter's
    // subtree: the prefilter runs scan-side, BEFORE the first shuffle
    bloomFilters.foreach { f =>
      val aggsBelow = f.collect {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
      }
      assert(aggsBelow.isEmpty,
        s"bloom filter must sit below the distinct, not above it:\n$lp")
    }
  }

  test("winnow: doc-keyed window, never a global sort stage") {
    val p = plan(graft.operators.TextOps.winnow(
      Tables(spark, dir, "documents")))
    assert(!p.contains("SinglePartition"),
      s"winnowing must window per doc, never globally:\n$p")
    assert(p.contains("hashpartitioning(doc_id"),
      s"the window must shuffle on doc_id:\n$p")
  }

  test("winnowPairs: fingerprint self-join is an equi-join, never cartesian") {
    val p = plan(graft.operators.TextOps.winnowPairs(
      Tables(spark, dir, "documents")))
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"the fp key must drive a hash equi-join:\n$p")
  }

  test("bpeTokens: word-keyed equi-join only, never cartesian; " +
      "tf aggregate combines map-side") {
    val docs = Tables(spark, dir, "documents")
    val merges = graft.operators.TextOps.bpeLearn(docs, nMerges = 2)
    val p = plan(graft.operators.TextOps.bpeTokens(docs, merges))
    assert(!p.contains("Cartesian") && !p.contains("BroadcastNestedLoop"),
      s"fertility join must stay keyed:\n$p")
    assert(p.contains("partial_count") || p.contains("partial"),
      "the (doc, word) tf aggregate must combine map-side")
  }

  test("heavyHitters: Misra-Gries aggregate combines map-side partials") {
    val p = plan(graft.operators.TextOps.heavyHitters(
      Tables(spark, dir, "documents")))
    assert(p.contains("partial_mg_summary"),
      s"MG must aggregate partially per map task before the shuffle:\n$p")
    // the only exchange is the constant-size summary merge — the
    // token stream itself never shuffles
    assert(p.linesIterator.count(_.contains("Exchange")) == 1,
      s"exactly one (summary-sized) exchange expected:\n$p")
  }

  test("stratifiedSample: rank-<=-k rewrites to WindowGroupLimit, no global sort") {
    val p = plan(graft.operators.Curation.stratifiedSample(
      Tables(spark, dir, "documents")))
    assert(p.contains("WindowGroupLimit"),
      s"the k-per-stratum filter must bound the window input:\n$p")
    assert(!p.contains("SinglePartition"),
      s"per-lang sampling must never funnel to one partition:\n$p")
  }

  test("sourceKl: keyed aggregates + single-row broadcast, no cartesian beyond it") {
    val p = plan(graft.operators.TextOps.sourceKl(
      Tables(spark, dir, "documents")))
    assert(!p.contains("CartesianProduct"))
    // the only nested-loop join allowed is the broadcast of the
    // single-row corpus total (the unigramLogProb shape)
    assert(p.linesIterator.count(_.contains("BroadcastNestedLoopJoin")) <= 1,
      s"only the single-row total may broadcast-cross:\n$p")
  }

  test("decontaminateFuzzy: banded equi-joins only, never cartesian") {
    val p = plan(graft.operators.Curation.decontaminateFuzzy(
      Tables(spark, dir, "documents")))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"the fuzzy chain must stay banded + keyed:\n$p")
  }

  test("bm25Top: query filter precedes the tf shuffle; df/stats ride as broadcasts") {
    val df = graft.operators.TextOps.bm25Top(Tables(spark, dir, "documents"))
    val p = plan(df)
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("BroadcastHashJoin"), "df must broadcast onto tf")
    // the single-row stats frame is the only nested-loop broadcast
    assert(p.linesIterator.count(_.contains("BroadcastNestedLoopJoin")) <= 1, p)
    // the IN(query) filter must sit BELOW every aggregate in the
    // optimized tree: the exploded token stream shrinks to
    // O(matching docs x |query|) BEFORE it shuffles
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter}
    val optimized = df.queryExecution.optimizedPlan
    val hasQueryFilterBelowAgg = optimized.collect {
      case a: Aggregate => a.collectLeaves().nonEmpty && a.exists {
        case f: Filter => f.condition.toString.contains("spark")
        case _ => false
      }
    }
    assert(hasQueryFilterBelowAgg.exists(identity),
      s"IN-query filter must feed the tf aggregate from below:\n$optimized")
  }

  test("gramNovelty: keyed gram aggregates, no cartesian, no global window") {
    val p = plan(graft.operators.Dedup.gramNovelty(
      Tables(spark, dir, "documents")))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("SinglePartition"))
    // explode->distinct, first-doc agg, gram join-back, per-doc agg:
    // every exchange is hash-keyed and bounded
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) <= 5, p)
  }

  test("noveltyAgainst (q_novelty_incr): keyed gram joins; only the cut broadcast crosses") {
    val p = plan(SparkEntry.queries("q_novelty_incr")(spark, dir))
    assert(!p.contains("CartesianProduct"))
    // every nested-loop join must be the single-row cut broadcast
    // (it feeds three subtrees: index side, new-side shingles,
    // new-side first-doc agg); the gram joins themselves stay
    // hash-keyed — assert no BNLJ beyond those three
    assert(p.linesIterator.count(_.contains("BroadcastNestedLoopJoin")) <= 3, p)
    assert(p.contains("BroadcastHashJoin"), "gram joins must be hash joins")
    // the only SinglePartition exchange allowed is the one-row
    // max(doc_id) cut aggregate, never a corpus-sized stage
    assert(p.linesIterator.count(_.contains("Exchange SinglePartition")) <=
      p.linesIterator.count(_.contains("partial_max")), p)
  }

  test("sourceOverlapHll: sketch frame materialized once; pairwise stage never rescans the corpus") {
    val p = plan(graft.operators.Dedup.sourceOverlapHll(
      Tables(spark, dir, "documents")))
    assert(p.linesIterator.count(_.contains("InMemoryTableScan")) >= 2,
      s"both self-join sides must read the persisted sketch frame:\n$p")
    // the only FileScan allowed is INSIDE the cached relation's stored
    // build plan — the pairwise stage itself must start from the cache
    val firstScan = p.linesIterator.indexWhere(_.contains("FileScan"))
    val firstCache = p.linesIterator.indexWhere(_.contains("InMemoryTableScan"))
    assert(firstScan == -1 || firstCache < firstScan,
      s"pairwise stage must not rescan the corpus:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("compressRatio: pure projection — zero exchanges, codegen'd deflate kernel") {
    val p = plan(graft.operators.TextOps.compressRatio(
      Tables(spark, dir, "documents")))
    assert(!p.contains("Exchange"), s"scan-speed op must not shuffle:\n$p")
    // '*(n)' node prefixes are the WholeStageCodegen stage markers in
    // the executedPlan rendering — the deflate projection must carry one
    assert(p.linesIterator.exists(l => l.contains("*(1)") && l.contains("deflate_len")),
      s"deflate_len must stay inside codegen:\n$p")
  }

  test("textExtract: pure HOF projection — zero exchanges, no generate") {
    import org.apache.spark.sql.functions.col
    val docs = Tables(spark, dir, "documents").withColumn("html",
      graft.operators.TextOps.syntheticHtml(col("doc_id"), col("text")))
    val p = plan(graft.operators.TextOps.textExtract(docs))
    assert(!p.contains("Exchange"), s"scan-speed op must not shuffle:\n$p")
    // line order rides the array — an explode/groupBy round trip
    // (a Generate node) would need a window to restore it
    assert(!p.contains("Generate"), s"no explode round trip:\n$p")
  }

  test("q_semantic_decontaminate_ann: the serve plan scans the stored " +
      "codes and carries the artifacts as literals — zero training") {
    val idx = java.nio.file.Files
      .createTempDirectory("graft-semdecon-plan").toString
    val emb = Tables(spark, dir, "embeddings")
    graft.operators.Similarity.writeAnnIndex(emb, idx)
    val df = graft.operators.Curation.semanticDecontaminateAnn(
      spark, idx, emb)
    val p = plan(df)
    assert(p.contains(s"$idx/codes"),
      s"candidates must come from the stored code rows:\n$p")
    // Lloyd's/PQ training run through vector_mean aggregates and the
    // hash-ordered sample sort — their presence in the SERVE plan
    // would mean the decontamination retrains per run
    assert(!p.contains("vector_mean"),
      s"serve plan must not retrain centroids:\n$p")
    assert(!p.contains("TakeOrderedAndProject"),
      s"serve plan must not carry the PQ training sample sort:\n$p")
    // the training-side corpus (centroids/codebooks) rides as driver
    // literals, never a joined frame
    assert(!p.contains(s"$idx/centroids") && !p.contains(s"$idx/codebooks"),
      s"artifacts must be literals, not scans:\n$p")
  }

  test("trainOrder: doc_id-only scan, exactly one shuffle (the shard " +
      "key), window partitioned by shard — never a global sort") {
    val p = plan(graft.operators.Curation.trainOrder(
      Tables(spark, dir, "documents"), seed = 0, nShards = 8))
    assert(p.contains("ReadSchema: struct<doc_id:bigint>"),
      s"scan must prune to doc_id alone:\n$p")
    assert(p.linesIterator.count(_.contains("Exchange")) == 1,
      s"one hashpartitioning exchange on shard, nothing else:\n$p")
    assert(p.contains("hashpartitioning(shard"), p)
    assert(!p.contains("Exchange SinglePartition") &&
      !p.contains("rangepartitioning"),
      s"a global sort would serialize the epoch order:\n$p")
  }

  test("lmScoreFrom: the serve plan scans the stored model parquet " +
      "and joins it — no training aggregate over the model side") {
    val dir2 = java.nio.file.Files
      .createTempDirectory("graft-lmplan").toString
    val docs = Tables(spark, dir, "documents")
    graft.operators.TextOps.writeLmIndex(docs, dir2)
    val p = plan(graft.operators.TextOps.lmScoreFrom(spark, dir2, docs))
    assert(p.contains(s"$dir2/pairs") && p.contains(s"$dir2/firsts"),
      s"serve path must read the stored artifacts:\n$p")
    // vocab_size rides as a driver literal — no meta-side crossjoin
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"V must be a literal, not a joined frame:\n$p")
  }

  test("q_probe_serve: the serve plan carries the weights as a " +
      "literal — no sampling sort, no gradient rounds, no scan of " +
      "the index parquet") {
    val dir2 = java.nio.file.Files
      .createTempDirectory("graft-probeplan").toString
    val docs = Tables(spark, dir, "documents")
    graft.operators.Curation.writeProbeIndex(docs, dir2)
    val df = graft.operators.Curation.probeScoreFrom(spark, dir2, docs)
    val p = plan(df)
    // trainProbe's bounded sample is a TakeOrderedAndProject over
    // xxhash64 — its presence in the serve plan would mean the serve
    // path retrains (the pre-r10 probeScore shape)
    assert(!p.contains("TakeOrderedAndProject") && !p.contains("xxhash64"),
      s"serve plan must not contain the training sample sort:\n$p")
    assert(!p.contains(dir2),
      s"weights must ride as a literal, not a parquet scan:\n$p")
    // the physical aggregate elides its result projection, so the
    // kernel call is asserted on the optimized logical plan
    val lp = df.queryExecution.optimizedPlan.toString
    assert(lp.contains("dot_f32"),
      s"scoring must go through the codegen kernel:\n$lp")
  }

  test("q_dsir_serve: the serve plan scans the stored ratio rows " +
      "only — no counts scan, no training ratio aggregate, floor " +
      "from a local one-row frame") {
    val dir2 = java.nio.file.Files
      .createTempDirectory("graft-dsirplan").toString
    val docs = Tables(spark, dir, "documents")
    graft.operators.Curation.writeDsirIndex(docs, dir2)
    val p = plan(graft.operators.Curation.dsirScoreFrom(spark, dir2, docs))
    assert(p.contains(s"$dir2/ratio"),
      s"serve must read the stored ratio artifact:\n$p")
    assert(!p.contains(s"$dir2/counts") && !p.contains(s"$dir2/meta"),
      s"serve must not scan the monoid state or re-read meta:\n$p")
    // the floor rides as a broadcast one-row frame (often
    // constant-folded to a literal inside coalesce) — never a ratio
    // re-aggregation: no aggregate keyed on the label column exists
    assert(!p.contains("hashpartitioning(b#") ||
      !p.contains("partial_sum(ct"),
      s"serve must not recompute the trained counts:\n$p")
  }

  test("q_probe_eval: the AUC window runs over the score-aggregated " +
      "frame (bounded by the 6-dp codomain), never the corpus") {
    val df = SparkEntry.queries("q_probe_eval")(spark, dir)
    val p = plan(df)
    // the single-partition window is legal ONLY because a groupBy
    // on score runs first: assert the aggregate sits below the window
    val lines = p.linesIterator.toVector
    val winIdx = lines.indexWhere(_.contains("Window"))
    val aggBelow = lines.drop(winIdx).exists(l =>
      l.contains("HashAggregate") && l.contains("score"))
    assert(winIdx >= 0 && aggBelow,
      s"window must consume the per-score aggregate, not raw rows:\n$p")
    assert(df.count() == 1)
  }

  test("q_media_pipeline slice: filters the SHARED persisted media " +
      "fixtures instead of rendering its own (decode-once discipline)") {
    val df = SparkEntry.queries("q_media_pipeline")(spark, dir)
    val p = plan(df)
    // all three modality legs must start from cached fixture scans;
    // a slice-private render would show as mapPartitions over a
    // FileScan of documents OUTSIDE any InMemoryTableScan
    assert(p.contains("InMemoryTableScan"),
      s"slice must reuse the persisted fixtures:\n$p")
    val firstScan = p.linesIterator.indexWhere(_.contains("FileScan"))
    val firstCache = p.linesIterator.indexWhere(_.contains("InMemoryTableScan"))
    assert(firstScan == -1 || firstCache < firstScan,
      s"the %3 slice must not re-render from the documents scan:\n$p")
    assert(df.count() > 0)
  }

  test("mineBitext: the query batch broadcasts against the streaming " +
      "dst side — BNLJ under a broadcast exchange, never a cartesian") {
    val p = plan(graft.operators.Similarity.mineBitext(
      Tables(spark, dir, "embeddings"), Tables(spark, dir, "documents")))
    assert(!p.contains("CartesianProduct"),
      s"an unbroadcast pair enumeration would shuffle both sides:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") &&
      p.contains("BroadcastExchange"),
      s"the bounded query batch must ride a broadcast:\n$p")
    // every window (k-NN rank, mutual-best row_numbers) partitions by
    // a pair id — a single-partition stage would serialize the batch
    assert(!p.contains("Exchange SinglePartition"),
      s"margin windows must partition by pair ids:\n$p")
  }

  test("mineBitextIndexed: both k-NN legs scan the stored code rows; " +
      "artifacts ride as literals, never retrained") {
    val idx = java.nio.file.Files
      .createTempDirectory("graft-bitext-plan").toString
    val emb = Tables(spark, dir, "embeddings")
    graft.operators.Similarity.writeAnnIndex(emb, idx)
    val df = graft.operators.Similarity.mineBitextIndexed(
      spark, idx, emb, Tables(spark, dir, "documents"))
    val p = plan(df)
    assert(p.contains(s"$idx/codes"),
      s"candidates must come from the stored code rows:\n$p")
    assert(!p.contains("vector_mean"),
      s"serve plan must not retrain centroids:\n$p")
    assert(!p.contains(s"$idx/centroids") && !p.contains(s"$idx/codebooks"),
      s"artifacts must be literals, not scans:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("web-graph family: normalize/extract/audit are scan-local " +
      "projections; host graph is one keyed join + one aggregate; " +
      "pageRank never goes cartesian") {
    import org.apache.spark.sql.functions.col
    import graft.operators.WebOps
    val docs = Tables(spark, dir, "documents")
    val pages = docs
      .withColumn("url", WebOps.syntheticUrl(col("doc_id")))
      .withColumn("html",
        WebOps.syntheticLinkedHtml(col("doc_id"), col("text")))
    // pure projections: zero shuffle at any scale
    assert(!plan(WebOps.urlNormalize(pages)).contains("Exchange"),
      "urlNormalize must be scan-local")
    assert(!plan(WebOps.linkExtract(pages)).contains("Exchange"),
      "linkExtract must be scan-local")
    assert(!plan(WebOps.encodingAudit(docs)).contains("Exchange"),
      "encodingAudit must be scan-local")
    // host graph: the doc_id join + the (src, dst) count — keyed
    // exchanges only, no broadcast-nested-loop fallback
    val hg = plan(WebOps.hostGraph(pages))
    assert(!hg.contains("CartesianProduct") &&
      !hg.contains("BroadcastNestedLoopJoin"), hg)
    // pageRank: every iteration joins/aggregates on host keys; a
    // cartesian anywhere would be quadratic in the host count
    val pr = plan(WebOps.pageRank(WebOps.hostGraph(pages)))
    assert(!pr.contains("CartesianProduct") &&
      !pr.contains("BroadcastNestedLoopJoin"), pr)
    assert(!pr.contains("Exchange SinglePartition"),
      s"rank frames must stay host-partitioned:\n$pr")
  }
}
