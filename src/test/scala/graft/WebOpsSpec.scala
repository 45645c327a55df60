package graft

import org.apache.spark.sql.functions._

import graft.operators.WebOps

class WebOpsSpec extends SparkSuite {
  import spark.implicits._

  // ── urlNormalize ──────────────────────────────────────────────────

  test("urlNormalize: known answers for every canonicalization rule") {
    val cases = Seq(
      // scheme + host case, www, default port
      (1L, "HTTP://WWW.Example.COM:80/a/b",
        "example.com", "http://example.com/a/b"),
      // https default port strips, non-default port stays
      (2L, "https://site.org:443/x", "site.org", "https://site.org/x"),
      (3L, "http://site.org:8080/x", "site.org:8080",
        "http://site.org:8080/x"),
      // duplicate slashes collapse, trailing slash strips
      (4L, "http://h.io//a///b/", "h.io", "http://h.io/a/b"),
      // root path: empty becomes '/', and the root slash survives
      (5L, "http://h.io", "h.io", "http://h.io/"),
      (6L, "http://h.io/", "h.io", "http://h.io/"),
      // fragment drops, tracking params drop, survivors sort
      (7L, "http://h.io/p?z=2&utm_source=x&a=1&fbclid=y#frag",
        "h.io", "http://h.io/p?a=1&z=2"),
      // all params tracking -> no '?'
      (8L, "http://h.io/p?utm_medium=m&gclid=g&ref=r&mc_eid=e",
        "h.io", "http://h.io/p"),
      // a non-tracking param that merely CONTAINS 'ref' stays
      (9L, "http://h.io/p?preref=1", "h.io", "http://h.io/p?preref=1"))
    val out = WebOps.urlNormalize(
      cases.map(c => (c._1, c._2)).toDF("doc_id", "url"))
      .orderBy("doc_id").collect()
    cases.zip(out).foreach { case ((id, url, host, canon), row) =>
      assert(row.getAs[String]("host") == host, s"host of $url")
      assert(row.getAs[String]("url_canonical") == canon,
        s"canon of $url: got ${row.getAs[String]("url_canonical")}")
      assert(row.getAs[Long]("doc_id") == id)
    }
  }

  test("urlDedup: the synthetic fixture collapses groups of 4") {
    val docs = spark.range(0, 40).toDF("doc_id")
      .withColumn("url", WebOps.syntheticUrl(col("doc_id")))
    val r = WebOps.urlDedup(docs).collect()
    assert(r.length == 40)
    r.foreach { row =>
      val id = row.getAs[Long]("doc_id")
      val g = id / 4
      assert(row.getAs[Long]("canonical_doc") == g * 4,
        s"doc $id keeper")
      assert(row.getAs[Long]("group_size") == 4L, s"doc $id size")
      assert(row.getAs[Boolean]("keep") == (id % 4 == 0), s"doc $id keep")
      // every member of a group resolves to ONE canonical string
      assert(row.getAs[String]("url_canonical") ==
        s"http://h${g % 20}.example.com/p/$g?v=${g % 3}",
        s"doc $id canon: ${row.getAs[String]("url_canonical")}")
    }
  }

  // ── link graph ────────────────────────────────────────────────────

  test("linkExtract + hostGraph: absolute anchors normalize, relative drop") {
    val docs = Seq((10L, "t")).toDF("doc_id", "text")
      .withColumn("url", WebOps.syntheticUrl(col("doc_id")))
      .withColumn("html",
        WebOps.syntheticLinkedHtml(col("doc_id"), col("text")))
    val links = WebOps.linkExtract(docs).collect()
    assert(links.length == 3, links.mkString(";"))
    val edges = WebOps.hostGraph(docs).collect()
    // doc 10: src host h{(10/4)%20}=h2; dst one = h{(60+1)%20}=h1
    // clean; dst two = h{(130+3)%20}=h13 through the messy anchor
    // (uppercase+www+:80+doubled slashes); the relative anchor drops
    assert(edges.length == 2, edges.mkString(";"))
    val m = edges.map(r => (r.getAs[String]("dst_host"),
      (r.getAs[String]("src_host"), r.getAs[Long]("n_links")))).toMap
    assert(m("h1.example.com") == ("h2.example.com", 1L))
    assert(m("h13.example.com") == ("h2.example.com", 1L))
  }

  test("anchorText: href/body pairs align by match order, hosts " +
      "normalize, relative anchors drop") {
    val docs = Seq((10L, "t")).toDF("doc_id", "text")
      .withColumn("html",
        WebOps.syntheticLinkedHtml(col("doc_id"), col("text")))
    val r = WebOps.anchorText(docs).collect()
      .map(x => (x.getAs[String]("dst_host"), x.getAs[String]("anchor"),
        x.getAs[Long]("n"))).toSet
    // doc 10: clean anchor -> (h1, 'doc 10'), messy anchor -> (h13,
    // 'two') through the shared normalizer; '/local/0' has no host
    assert(r == Set(("h1.example.com", "doc 10", 1L),
      ("h13.example.com", "two", 1L)), s"got $r")
  }

  test("linkExtract + anchorText: a quoted '>' in an attribute BEFORE " +
      "href cannot truncate the tag (the textExtract attrBody rule)") {
    val html = "<p><a data-note=\"5 > 3\" href='http://a.io/x' " +
      "class='k'>kept</a> and <link href='http://css.io/s'></p>"
    val links = WebOps.linkExtract(Seq((1L, html)).toDF("doc_id", "html"))
      .collect().map(_.getAs[String]("href"))
    // the anchor survives its quoted '>'; the <link> href is NOT an
    // edge (anchor-scoped extraction)
    assert(links.toSeq == Seq("http://a.io/x"), links.mkString(";"))
    val anchors = WebOps.anchorText(Seq((1L, html)).toDF("doc_id", "html"))
      .collect().map(x => (x.getAs[String]("dst_host"),
        x.getAs[String]("anchor")))
    assert(anchors.toSeq == Seq(("a.io", "kept")), anchors.mkString(";"))
  }

  test("anchorText: aggregation counts repeated anchors per host") {
    val html = "<p><a href='http://a.io/1'>same</a> " +
      "<a href='http://a.io/2'>same</a> " +
      "<a href='http://a.io/3'>other</a></p>"
    val r = WebOps.anchorText(Seq((1L, html)).toDF("doc_id", "html"))
      .collect().map(x => x.getAs[String]("anchor") -> x.getAs[Long]("n"))
      .toMap
    assert(r == Map("same" -> 2L, "other" -> 1L), s"got $r")
  }

  test("metaRobots: directive TOKENS, not substrings; absent meta is " +
      "an empty pass") {
    val docs = Seq(
      (1L, "<html><head><meta name='robots' " +
        "content='noindex,nofollow'></head><body>x</body></html>"),
      (2L, "<html><head><META NAME=\"robots\" " +
        "CONTENT=\"nofollow\"></head><body>x</body></html>"),
      (3L, "<html><body>no meta at all</body></html>"),
      // 'noindexing' must NOT trip the noindex flag
      (4L, "<html><head><meta name='robots' " +
        "content='noindexing, nofollow '></head><body>x</body></html>"))
      .toDF("doc_id", "html")
    val r = WebOps.metaRobots(docs).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Boolean]("noindex"), x.getAs[Boolean]("nofollow"),
          x.getAs[String]("robots")))).toMap
    assert(r(1L) == ((true, true, "noindex,nofollow")), s"got ${r(1L)}")
    assert(r(2L) == ((false, true, "nofollow")), s"got ${r(2L)}")
    assert(r(3L) == ((false, false, "")), s"got ${r(3L)}")
    assert(r(4L) == ((false, true, "noindexing, nofollow ")), s"got ${r(4L)}")
  }

  // ── pageRank ──────────────────────────────────────────────────────

  test("pageRank: hand-computed two-node chain (dangling sink absorbs)") {
    val edges = Seq(("a", "b", 1L)).toDF("src_host", "dst_host", "n_links")
    // r0: a=b=1000000. iter1: b = 150000 + (1000000*850000*1) div
    // (1000000*1) = 1000000; a = 150000 (no inlinks). iter2+: b =
    // 150000 + (150000*850000) div 1000000 = 277500; a = 150000.
    val r = WebOps.pageRank(edges, iters = 5).collect()
      .map(x => x.getAs[String]("host") -> x.getAs[Long]("rank_micro"))
      .toMap
    assert(r("a") == 150000L, s"got $r")
    assert(r("b") == 277500L, s"got $r")
  }

  test("pageRank: symmetric 2-cycle is a fixed point at the start mass") {
    val edges = Seq(("a", "b", 2L), ("b", "a", 2L))
      .toDF("src_host", "dst_host", "n_links")
    // each node passes 85% of its mass to the other and receives the
    // same back: rank stays exactly 1000000 every iteration
    val r = WebOps.pageRank(edges, iters = 3).collect()
      .map(x => x.getAs[String]("host") -> x.getAs[Long]("rank_micro"))
      .toMap
    assert(r == Map("a" -> 1000000L, "b" -> 1000000L), s"got $r")
  }

  test("pageRank: weighted split routes rank by edge-weight ratio") {
    // a -> b (w=3), a -> c (w=1): b gets 3/4 of a's damped outflow
    val edges = Seq(("a", "b", 3L), ("a", "c", 1L))
      .toDF("src_host", "dst_host", "n_links")
    val r = WebOps.pageRank(edges, iters = 1).collect()
      .map(x => x.getAs[String]("host") -> x.getAs[Long]("rank_micro"))
      .toMap
    // outw(a)=4: b = 150000 + (1e6*850000*3) div (1e6*4) = 787500
    //            c = 150000 + (1e6*850000*1) div (1e6*4) = 362500
    assert(r("b") == 787500L, s"got $r")
    assert(r("c") == 362500L, s"got $r")
    assert(r("a") == 150000L, s"got $r")
  }

  test("pageRank: every node floors at the damping base; node set preserved") {
    val docs = spark.range(0, 60).toDF("doc_id")
      .withColumn("text", lit("w"))
      .withColumn("url", WebOps.syntheticUrl(col("doc_id")))
      .withColumn("html",
        WebOps.syntheticLinkedHtml(col("doc_id"), lit("w")))
    val edges = WebOps.hostGraph(docs)
    val nodes = edges.select(col("src_host").as("h"))
      .union(edges.select(col("dst_host"))).distinct().count()
    val r = WebOps.pageRank(edges).collect()
    assert(r.length == nodes)
    assert(r.forall(_.getAs[Long]("rank_micro") >= 150000L))
    // the non-invertible first-link multiplier skews in-degree toward
    // odd-residue hosts: the ranking must RESOLVE that skew, not
    // return the uniform fixed point (independently simulated: 282k
    // min vs 674k max after 5 iterations on the 60-doc graph)
    val ranks = r.map(_.getAs[Long]("rank_micro"))
    assert(ranks.max > ranks.min + 100000L,
      s"expected in-degree skew to separate ranks, got ${ranks.toSeq.sorted}")
  }

  // ── encodingAudit ─────────────────────────────────────────────────

  test("encodingAudit: known answers per damage class; clean text scores zero") {
    val docs = Seq(
      (1L, "perfectly clean ascii text"),
      (2L, "bad caf\u00C3\u00A9 marker"), // one U+00C3
      (3L, "smart \u00E2\u20AC\u0153quote\u00E2\u20AC\u009D here"), // two U+00E2 U+20AC digraphs
      (4L, "lost \uFFFD\uFFFD bytes"),
      (5L, "bell\u0007 and esc\u001B here"),
      (6L, "tab\tand\nnewline are fine")).toDF("doc_id", "text")
    val r = WebOps.encodingAudit(docs).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r(1L).getAs[Long]("damage_ppm") == 0L)
    assert(r(6L).getAs[Long]("damage_ppm") == 0L)
    assert(r(2L).getAs[Long]("n_double_utf8") == 1L)
    assert(r(3L).getAs[Long]("n_win1252") == 2L)
    assert(r(4L).getAs[Long]("n_replacement") == 2L)
    assert(r(5L).getAs[Long]("n_ctrl") == 2L)
    // ppm arithmetic: doc 4 has 2 damaged chars over 16 chars
    val len4 = "lost \uFFFD\uFFFD bytes".length.toLong
    assert(r(4L).getAs[Long]("damage_ppm") == 2000000L / len4)
  }

  test("encodingAudit: syntheticDamage plants disjoint residue slices") {
    val docs = spark.range(0, 100).toDF("doc_id")
      .withColumn("text", concat(lit("clean words here id "),
        col("doc_id").cast("string")))
      .withColumn("text",
        WebOps.syntheticDamage(col("doc_id"), col("text")))
    val r = WebOps.encodingAudit(docs).collect()
    r.foreach { row =>
      val id = row.getAs[Long]("doc_id")
      assert((row.getAs[Long]("n_double_utf8") > 0) == (id % 7 == 3),
        s"doc $id moji")
      assert((row.getAs[Long]("n_replacement") > 0) == (id % 11 == 5),
        s"doc $id rep")
      assert((row.getAs[Long]("n_ctrl") > 0) == (id % 13 == 7),
        s"doc $id ctrl")
      assert((row.getAs[Long]("damage_ppm") > 0) ==
        (id % 7 == 3 || id % 11 == 5 || id % 13 == 7), s"doc $id ppm")
    }
  }
}
