package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.TextOps
import graft.sources.Tables

class TextOpsSpec extends SparkSuite {
  import spark.implicits._

  test("sentSplit: terminator runs, trailing unterminated sentence, " +
      "empty and all-terminator docs vanish") {
    val docs = Seq(
      (1L, "One two. Three four! Five six? Trailing run"),
      (2L, "no terminators at all"),
      (3L, "..."),
      (4L, "")).toDF("doc_id", "text")
    val r = TextOps.sentSplit(docs).collect()
      .map(x => (x.getAs[Long]("doc_id"), x.getAs[Long]("sent_id")) ->
        ((x.getAs[String]("sentence"), x.getAs[Long]("n_tok")))).toMap
    assert(r.keySet.map(_._1) == Set(1L, 2L),
      s"docs 3/4 have no sentences: ${r.keySet}")
    assert(r((1L, 0L)) == (("One two.", 2L)), s"got ${r((1L, 0L))}")
    assert(r((1L, 1L)) == (("Three four!", 2L)))
    assert(r((1L, 2L)) == (("Five six?", 2L)))
    assert(r((1L, 3L)) == (("Trailing run", 2L)))
    assert(r((2L, 0L)) == (("no terminators at all", 4L)))
  }

  test("syntheticSentences: a period lands after every 12th word; " +
      "sentSplit recovers 12-word sentences plus the remainder") {
    val text = (1 to 30).map(i => s"w$i").mkString(" ")
    val out = TextOps.sentSplit(Seq((1L, text)).toDF("doc_id", "text")
      .withColumn("text", TextOps.syntheticSentences(col("text"))))
      .orderBy("sent_id").collect()
    assert(out.map(_.getAs[Long]("n_tok")).toSeq == Seq(12L, 12L, 6L),
      out.mkString(";"))
    assert(out(0).getAs[String]("sentence").endsWith("w12."))
  }

  test("sentSpanDedup: the C4 three-sentence-span rule — cross-doc " +
      "duplicate span keeps its first occurrence, within-doc repeats " +
      "collapse to the owner span, short docs ride through") {
    val docs = Seq(
      (1L, "s one. s two. s three. a tail"),
      (2L, "s one. s two. s three. b tail"),
      (3L, "x uniq. y uniq. z uniq. w uniq."),
      (4L, "r. r. r. r. r."),
      (5L, "short one. two.")).toDF("doc_id", "text")
    val r = TextOps.sentSpanDedup(docs).collect()
      .map(x => (x.getAs[Long]("doc_id"), x.getAs[Long]("sent_id")) ->
        x.getAs[Boolean]("keep")).toMap
    // doc 1 owns the duplicated (s one, s two, s three) span — all kept
    assert((0L to 3L).forall(i => r((1L, i))), s"doc 1: $r")
    // doc 2's occurrence is the non-owner: its covered sentences drop,
    // the tail survives
    assert((0L to 2L).forall(i => !r((2L, i))), s"doc 2 head: $r")
    assert(r((2L, 3L)), s"doc 2 tail: $r")
    // unique spans untouched
    assert((0L to 3L).forall(i => r((3L, i))), s"doc 3: $r")
    // within-doc repetition: spans at 0/1/2 share one hash, owner is
    // position 0; non-owners at 1 and 2 remove sentences 1-3 and 2-4
    assert(r((4L, 0L)) && (1L to 4L).forall(i => !r((4L, i))),
      s"doc 4: $r")
    // fewer than spanLen sentences -> no spans, everything kept
    assert(r((5L, 0L)) && r((5L, 1L)), s"doc 5: $r")
    // the rebuild materializes exactly the kept sentences in order
    val a = TextOps.sentSpanDedupApply(docs).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Long]("n_sents"), x.getAs[Long]("n_kept"),
          x.getAs[Long]("kept_tokens"),
          x.getAs[String]("text_clean")))).toMap
    assert(a(1L) == ((4L, 4L, 8L, "s one. s two. s three. a tail")),
      s"got ${a(1L)}")
    assert(a(2L) == ((4L, 1L, 2L, "b tail")), s"got ${a(2L)}")
    assert(a(4L) == ((5L, 1L, 1L, "r.")), s"got ${a(4L)}")
    assert(a(5L) == ((2L, 2L, 3L, "short one. two.")), s"got ${a(5L)}")
  }

  test("sentSpanDedup composes with the WARC front door (r13 verdict " +
      "#3): full-signed-range doc ids — negative and near-MaxValue, " +
      "the WarcSource xxhash64 shape — own spans via the lexicographic " +
      "struct min, no re-key needed") {
    // ids planted at the signed extremes: each would have WRAPPED the
    // r13 composite occ_key = doc_id·10⁹ + sent_id (and WarcSource
    // .docs' xxhash64(url) ids land anywhere in this range). The
    // NEGATIVE id arrives LAST in input order — ownership must follow
    // the id ordering, not insertion order.
    val idNeg = Long.MinValue + 17L
    val idBig = Long.MaxValue - 3L
    val idMid = -42L
    val docs = Seq(
      (idBig, "s one. s two. s three. a tail"),
      (idMid, "x uniq. y uniq. z uniq. w uniq."),
      (idNeg, "s one. s two. s three. b tail"))
      .toDF("doc_id", "text")
    val r = TextOps.sentSpanDedup(docs).collect()
      .map(x => (x.getAs[Long]("doc_id"), x.getAs[Long]("sent_id")) ->
        x.getAs[Boolean]("keep")).toMap
    assert(r.size == 12, s"12 sentences expected: $r")
    // the duplicated head span's owner is min(idNeg, idBig) = idNeg:
    // all its sentences keep, the idBig occurrence drops its covered
    // head and keeps the tail
    assert((0L to 3L).forall(i => r((idNeg, i))), s"owner doc: $r")
    assert((0L to 2L).forall(i => !r((idBig, i))), s"non-owner head: $r")
    assert(r((idBig, 3L)), s"non-owner tail survives: $r")
    // the unique-span doc rides through untouched
    assert((0L to 3L).forall(i => r((idMid, i))), s"unique doc: $r")
  }

  test("lineDedup: global first-occurrence-keeps over long lines, " +
      "short lines exempt, within-doc repeats collapse, empty lines " +
      "drop at the split; rebuild is the newline-join inverse") {
    val boiler = "SUBSCRIBE NOW FOR OUR VERY EXCITING NEWSLETTER"
    val docs = Seq(
      (1L, s"$boiler\nalpha body text\nOK"),
      // cross-doc repeat of the long line (doc 1 owns), plus blank
      // lines the split must drop and a trimmed \r
      (2L, s"$boiler\r\n\nbeta body text\nOK"),
      // within-doc repeat of its own long line: position 0 owns
      (3L, s"$boiler twice\n$boiler twice\ngamma tail"),
      (4L, "delta only")).toDF("doc_id", "text")
    val r = TextOps.lineDedup(docs).collect()
      .map(x => (x.getAs[Long]("doc_id"), x.getAs[Long]("line_id")) ->
        x.getAs[Boolean]("keep")).toMap
    // doc 1 owns the boilerplate; its short OK line is exempt
    assert(r((1L, 0L)) && r((1L, 1L)) && r((1L, 2L)), s"doc 1: $r")
    // doc 2's occurrence drops; empties are gone so ids are dense
    // (0 = boiler, 1 = beta body text, 2 = OK)
    assert(!r((2L, 0L)) && r((2L, 1L)) && r((2L, 2L)), s"doc 2: $r")
    // within-doc: position 0 owns, position 1 drops
    assert(r((3L, 0L)) && !r((3L, 1L)) && r((3L, 2L)), s"doc 3: $r")
    // short single-line docs ride through ("delta only" < 30 chars)
    assert(r((4L, 0L)), s"doc 4: $r")
    // the rebuild: kept lines newline-joined in document order
    val a = TextOps.lineDedupApply(docs).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Long]("n_lines"), x.getAs[Long]("n_kept"),
          x.getAs[String]("text_clean")))).toMap
    assert(a(1L) == ((3L, 3L, s"$boiler\nalpha body text\nOK")),
      s"got ${a(1L)}")
    assert(a(2L) == ((3L, 2L, "beta body text\nOK")), s"got ${a(2L)}")
    assert(a(3L) == ((3L, 2L, s"$boiler twice\ngamma tail")),
      s"got ${a(3L)}")
    assert(a(4L) == ((1L, 1L, "delta only")), s"got ${a(4L)}")

    // the registered fixture: the two planted long lines dedup to the
    // first id%9=4 doc, the exempt OK line keeps everywhere, and no
    // original (unique) doc text is ever dropped
    val fix = Seq(4L, 13L, 22L, 5L).toDF("doc_id")
      .withColumn("text", concat(lit("body text of doc "),
        col("doc_id").cast("string")))
      .withColumn("text",
        TextOps.syntheticLineDupes(col("doc_id"), col("text")))
    val f = TextOps.lineDedup(fix).collect()
      .map(x => (x.getAs[Long]("doc_id"), x.getAs[Long]("line_id")) ->
        x.getAs[Boolean]("keep")).toMap
    assert(f((4L, 0L)) && f((4L, 1L)), s"first planted doc owns: $f")
    assert(!f((13L, 0L)) && !f((13L, 1L)) && !f((22L, 0L)) && !f((22L, 1L)),
      s"later planted docs drop the block: $f")
    assert(f((13L, 2L)) && f((22L, 2L)), s"exempt OK line keeps: $f")
    assert(f((13L, 3L)) && f((22L, 3L)) && f((5L, 0L)),
      s"unique body text keeps: $f")
  }

  test("lineDedup composes with the WARC front door: full-signed-range " +
      "doc ids own lines via the lexicographic struct min") {
    val idNeg = Long.MinValue + 23L
    val idBig = Long.MaxValue - 7L
    val boiler = "copyright example corporation all rights reserved line"
    val docs = Seq(
      (idBig, s"$boiler\nbig doc body"),
      (idNeg, s"$boiler\nneg doc body")).toDF("doc_id", "text")
    val r = TextOps.lineDedup(docs).collect()
      .map(x => (x.getAs[Long]("doc_id"), x.getAs[Long]("line_id")) ->
        x.getAs[Boolean]("keep")).toMap
    // ownership follows the id ORDERING (negative < positive), not
    // input order or any composite-key arithmetic
    assert(r((idNeg, 0L)) && r((idNeg, 1L)), s"negative id owns: $r")
    assert(!r((idBig, 0L)) && r((idBig, 1L)), s"big id drops the dup: $r")
  }

  test("textExtract: known-answer boilerplate removal on a hand-built page") {
    val html =
      "<html><head><title>My Page</title><script>var a=1;</script>" +
        "<style>.x{}</style></head><body>\n" +
        "<nav><a href='/'>Home</a> | <a href='/b'>Blog</a></nav>\n" +
        "<p>the quick brown <b>fox</b> jumps over " +
        "<a href='/fox'>the lazy dog</a> again today</p>\n" +
        "<p>short line</p>\n" +
        "<div><a href='x'>one</a> <a href='y'>two</a> <a href='z'>three</a>" +
        " linky menu of words</div>\n" +
        "<footer>(c) 2026</footer></body></html>"
    val r = TextOps.textExtract(Seq((1L, html)).toDF("doc_id", "html"))
      .collect()(0)
    // lines after block-tag split: "My Page" (1), nav (2 words/2
    // links), the prose p (11 words incl the inline link+bold, 1
    // link), "short line" (2), the link-dense div (7 words/3 links >
    // 0.34), "(c) 2026" (1) — only the prose paragraph is content
    assert(r.getAs[Long]("n_lines") == 6L, s"got $r")
    assert(r.getAs[Long]("n_content_lines") == 1L, s"got $r")
    assert(r.getAs[Long]("n_boilerplate_lines") == 5L)
    val extract = r.getAs[String]("extract")
    assert(extract ==
      "the quick brown fox jumps over the lazy dog again today",
      s"got '$extract'")
    // inline tags kept the paragraph whole: bold text inlined, the
    // anchor's words retained behind the marker
    assert(extract.contains("brown fox jumps"))
    assert(r.getAs[Double]("kept_ratio") > 0.3 &&
      r.getAs[Double]("kept_ratio") < 0.8)
    // a page whose every line is boilerplate extracts to empty, 0 kept
    val tiny = TextOps.textExtract(
      Seq((2L, "<html><body><p>too few words</p></body></html>"))
        .toDF("doc_id", "html")).collect()(0)
    assert(tiny.getAs[Long]("n_content_lines") == 0L)
    assert(tiny.getAs[String]("extract") == "")
    assert(tiny.getAs[Double]("kept_ratio") == 0.0)
  }

  test("textExtract property: random page compositions — planted prose " +
      "survives verbatim in document order, inventories add up") {
    val rnd = new scala.util.Random(777)
    (0 until 10).foreach { trial =>
      val prose = (0 until 1 + rnd.nextInt(3)).map(i =>
        s"this is a genuinely long prose paragraph number p$i of " +
          s"trial t$trial with many extra words inside")
      // inline tags inside prose must NOT split the line: bold one
      // word, low-density-link another on odd trials
      val proseHtml = prose.map { s =>
        val w = s.split(" ")
        if (trial % 2 == 1) {
          w(3) = s"<b>${w(3)}</b>"
          w(7) = s"<a href='/x'>${w(7)}</a>"
        }
        s"<p>${w.mkString(" ")}</p>"
      }
      val boiler = rnd.shuffle(Seq(
        "<nav><a href='/'>Home</a> | <a href='/b'>Blog</a></nav>",
        "<footer>(c) 2026</footer>",
        "<div>short ad</div>")).take(1 + rnd.nextInt(3))
      // interleave, preserving prose order
      val frags = scala.collection.mutable.ArrayBuffer.empty[String]
      var pi = 0
      (proseHtml ++ boiler).indices.foreach { _ => }
      val slots = rnd.shuffle((0 until proseHtml.size + boiler.size).toList)
      val proseSlots = slots.take(proseHtml.size).sorted
      var bi = 0
      (0 until proseHtml.size + boiler.size).foreach { k =>
        if (proseSlots.contains(k)) { frags += proseHtml(pi); pi += 1 }
        else { frags += boiler(bi); bi += 1 }
      }
      val html = "<html><head><title>Trial Page</title></head><body>\n" +
        frags.mkString("\n") + "\n</body></html>"
      val r = TextOps.textExtract(Seq((trial.toLong, html))
        .toDF("doc_id", "html")).collect()(0)
      assert(r.getAs[Long]("n_lines") == 1L + frags.size,
        s"trial $trial: title + one line per fragment")
      assert(r.getAs[Long]("n_content_lines") == prose.size.toLong,
        s"trial $trial: exactly the prose lines are content")
      assert(r.getAs[Long]("n_boilerplate_lines") ==
        1L + frags.size - prose.size)
      assert(r.getAs[String]("extract") == prose.mkString(" "),
        s"trial $trial: prose must survive verbatim in document order")
      val kr = r.getAs[Double]("kept_ratio")
      assert(kr > 0.0 && kr < 1.0, s"trial $trial: kept_ratio $kr")
    }
  }

  test("textExtract hardened: real-web script bodies with '<', minified " +
      "JS, uppercase tags, comments, CDATA and quoted '>' never leak") {
    // the r11 verdict's What's-wrong #1: the old [^<]* strip let any
    // script containing '<' sail through the tag strip and leak JS
    // source into the extract as a plausible-looking prose line
    val html =
      "<html><head><title>T</title>" +
        "<script>if (a<b) {document.write(\"<p>injected paragraph of " +
        "stealth words</p>\")}</script>" +
        "<SCRIPT type=\"text/javascript\">var minified=function(){return " +
        "window.top.document.location.href&&other.things(here,now)};" +
        "</SCRIPT>" +
        "<STYLE>.x{color:red}</STYLE></head><body>\n" +
        "<!-- <p>commented prose paragraph that must never appear</p> -->\n" +
        "<![CDATA[ raw <markup> with enough words to pass the floor ]]>\n" +
        "<p>the genuine article text survives with many plain words " +
        "intact</p>\n" +
        "<div data-note=\"5 > 3\">Sponsored: buy now</div>\n" +
        "</body></html>"
    val r = TextOps.textExtract(Seq((1L, html)).toDF("doc_id", "html"))
      .collect()(0)
    val extract = r.getAs[String]("extract")
    assert(extract ==
      "the genuine article text survives with many plain words intact",
      s"got '$extract'")
    // zero JS / comment / CDATA tokens anywhere in the extract
    Seq("injected", "minified", "document", "function", "commented",
        "markup", "window").foreach { tok =>
      assert(!extract.contains(tok), s"'$tok' leaked into '$extract'") }
    // lines: title "T", the prose paragraph, the ad div — the quoted
    // '>' inside data-note must not split the div tag into a bogus line
    assert(r.getAs[Long]("n_lines") == 3L, s"got $r")
    assert(r.getAs[Long]("n_content_lines") == 1L, s"got $r")
  }

  test("textExtract: entity references decode in content; &amp; decodes " +
      "last; numeric refs normalize; escaped markup stays text") {
    val html = "<html><body>\n" +
      "<p>Fish &amp; chips &lt;cheap&gt; at Joe&#39;s &quot;diner&quot; " +
      "tonight&nbsp;with &#8217;quoted&#8217; friends</p>\n" +
      "<p>double escape &amp;lt; stays literal among five plain " +
      "words</p>\n</body></html>"
    val rows = TextOps.textExtract(Seq((1L, html)).toDF("doc_id", "html"))
      .collect()(0)
    val extract = rows.getAs[String]("extract")
    assert(extract ==
      "Fish & chips <cheap> at Joe's \"diner\" tonight with " +
        " quoted  friends " + // &#8217; → space (numeric-ref normalization)
        "double escape &lt; stays literal among five plain words",
      s"got '$extract'")
    // &lt;cheap&gt; decoded AFTER the tag strip: it is text, not a tag
    assert(extract.contains("<cheap>"))
    // &amp;lt; decodes to the literal '&lt;' the author escaped
    assert(extract.contains("&lt;"))
  }

  test("syntheticHtml fixture: adversarial skeleton keeps extract == " +
      "text; the seven inventory lines land as designed") {
    val text = "a genuinely long prose paragraph with quite a few words"
    val r = TextOps.textExtract(
        Seq((7L, text)).toDF("doc_id", "text").withColumn("html",
          TextOps.syntheticHtml(col("doc_id"), col("text"))))
      .collect()(0)
    // title, nav, h1, text, ad div, entity line, unclosed footer — the
    // script (with '<' in body), comment and CDATA lines vanish whole
    assert(r.getAs[Long]("n_lines") == 7L, s"got $r")
    assert(r.getAs[Long]("n_content_lines") == 1L, s"got $r")
    assert(r.getAs[String]("extract") == text,
      s"got '${r.getAs[String]("extract")}'")
  }

  test("langId picks the dominant stopword language, unknown without markers") {
    val d = Seq(
      (0L, "the cat is on a mat of straw and wool"),
      (1L, "der hund und die katze ist im garten"),
      (2L, "le chat est dans la maison"),
      (3L, "el perro y los gatos es con nosotros"),
      (4L, "nothing matches these marker words whatsoever")
    ).toDF("doc_id", "text")
    val r = TextOps.langId(d).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[String]("pred_lang")).toMap
    assert(r == Map(0L -> "en", 1L -> "de", 2L -> "fr", 3L -> "es", 4L -> "unknown"))
  }

  test("langConfusion: cells partition the corpus, shares are per-true-" +
      "lang ppm, diagonal carries the recall") {
    val d = Seq(
      (0L, "the cat is on a mat", "en", "s"), // correct en
      (1L, "the dog is a pet and", "en", "s"), // correct en
      (2L, "der hund und die katze ist", "en", "s"), // mislabeled: pred de
      (3L, "le chat est dans la maison", "fr", "s"), // correct fr
      (4L, "zzz qqq www", "fr", "s") // unknown
    ).toDF("doc_id", "text", "lang", "source")
    val r = TextOps.langConfusion(d).collect()
      .map(x => (x.getAs[String]("lang"), x.getAs[String]("pred_lang")) ->
        (x.getAs[Long]("n"), x.getAs[Long]("share_ppm"))).toMap
    assert(r.values.map(_._1).sum == 5L, "cells must partition the corpus")
    assert(r(("en", "en")) == ((2L, 666666L)))
    assert(r(("en", "de"))._1 == 1L)
    assert(r(("fr", "fr")) == ((1L, 500000L)))
    assert(r(("fr", "unknown")) == ((1L, 500000L)))
    // floored ppm shares sum to <= 1e6 per true lang, within cells-1
    Seq("en", "fr").foreach { l =>
      val s = r.collect { case ((`l`, _), (_, ppm)) => ppm }.sum
      assert(s <= 1000000L && s >= 1000000L - r.size)
    }
  }

  test("topNgramFrac: most frequent 3-gram, deterministic tie-break, exact frac") {
    val d = Seq(
      // 3-grams: "a b a" x2, "b a b" x2, "a b x" x1 — count tie broken
      // by gram string asc -> "a b a"; 13 chars, gram covers 2*5
      (0L, "a b a b a b x"),
      (1L, "one two three four"), // both 3-grams unique -> lexical first
      (2L, "x y")                 // < 3 tokens: no row
    ).toDF("doc_id", "text")
    val r = TextOps.topNgramFrac(d).collect()
      .map(x => (x.getAs[Long]("doc_id"), x.getAs[String]("top_gram"),
        x.getAs[Long]("n_occ"), x.getAs[Double]("char_frac"))).toSet
    assert(r == Set(
      (0L, "a b a", 2L, 10.0 / 13.0),
      (1L, "one two three", 1L, 13.0 / 18.0)))
  }

  test("BPE-ish tokenizer: letter runs, digit runs, single symbols") {
    val n = Seq("ab 12 cd!").toDF("text")
      .select(size(TextFunctions.bpeIshTokens(col("text"))).as("n"))
      .as[Int].head()
    assert(n == 4) // ab, 12, cd, !
  }

  test("piiScrub replaces emails/urls/long digit runs and counts matches") {
    val d = Seq(
      (0L, "contact bob.smith@example.com or see https://example.com/a?b=1 id 12345678 ok"),
      (1L, "plain prose with a small number 42 in it")
    ).toDF("doc_id", "text")
    val r = TextOps.piiScrub(d).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[String]("scrubbed"), x.getAs[Long]("n_email"),
          x.getAs[Long]("n_url"), x.getAs[Long]("n_num")))).toMap
    assert(r(0L) == (("contact <EMAIL> or see <URL> id <NUM> ok", 1L, 1L, 1L)))
    assert(r(1L) == (("plain prose with a small number 42 in it", 0L, 0L, 0L)))
  }

  test("repetitionRatio: duplicate-bigram fraction, short docs excluded") {
    val d = Seq(
      (0L, "a b a b a b"), // bigrams: ab,ba,ab,ba,ab -> 5 total, 2 distinct
      (1L, "all distinct words here"),
      (2L, "single")       // < 2 tokens: excluded
    ).toDF("doc_id", "text")
    val r = TextOps.repetitionRatio(d).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Long]("n_bigrams"), x.getAs[Long]("n_distinct"),
          x.getAs[Double]("rep_ratio")))).toMap
    assert(r(0L) == ((5L, 2L, 1.0 - 2.0 / 5.0)))
    assert(r(1L) == ((3L, 3L, 0.0)))
    assert(!r.contains(2L))
  }

  test("unigramLogProb: rare-token docs score lower than common-token docs") {
    // corpus: x appears 3 times, y once (total 4)
    val d = Seq((0L, "x x"), (1L, "x y")).toDF("doc_id", "text")
    val r = TextOps.unigramLogProb(d).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Long]("n_tokens"), x.getAs[Double]("avg_logprob")))).toMap
    def r6(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val lnX = r6(math.log(3.0 / 4.0)); val lnY = r6(math.log(1.0 / 4.0))
    assert(r(0L)._1 == 2L && r6(r(0L)._2) == r6(lnX.toDouble))
    assert(r(1L)._1 == 2L &&
      r6(r(1L)._2) == r6(((lnX + lnY) / 2).toDouble))
    assert(r(1L)._2 < r(0L)._2, "the rare-token doc must score lower")
  }

  test("rolling fingerprint is order-sensitive and deterministic") {
    val fps = Seq((0L, "a b"), (1L, "b a"), (2L, "a b")).toDF("doc_id", "text")
    val r = TextOps.fingerprint(fps).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[Long]("fingerprint")).toMap
    assert(r(0L) == r(2L))
    assert(r(0L) != r(1L))
  }

  test("multimodal metadata: byte length and md5 checksum of payload") {
    val d = Seq((7L, "hello")).toDF("doc_id", "text")
    val r = TextOps.multimodalMeta(d).collect().head
    assert(r.getAs[Long]("n_bytes") == 5L)
    assert(r.getAs[String]("checksum") == "5d41402abc4b2a76b9719d911017c592")
    assert(Set("jpeg", "png", "webp").contains(r.getAs[String]("format")))
  }

  test("cleanCorpus: drops short/low-quality docs, keeps first of dups") {
    val longGood = "the cat and the dog of a house is here and the end of it all"
    val d = Seq(
      (0L, longGood, "en", "s1"),
      (1L, longGood, "en", "s2"),                        // exact dup of 0
      (2L, "short text", "en", "s1"),                    // too short
      (3L, "xx yy zz aa bb cc dd ee ff gg hh ii", "en", "s1") // no stopwords
    ).toDF("doc_id", "text", "lang", "source")
    val kept = TextOps.cleanCorpus(d).collect().map(_.getAs[Long]("doc_id")).toSet
    assert(kept == Set(0L))
  }

  test("trainSplit: deterministic, partitions every doc exactly once") {
    val d = (0L until 200L).map(i => (i, s"document number $i with words", "en"))
      .toDF("doc_id", "text", "lang")
    val r1 = TextOps.trainSplit(d).collect()
      .map(r => (r.getAs[String]("split"), r.getAs[Long]("n_docs"))).toMap
    val r2 = TextOps.trainSplit(d).collect()
      .map(r => (r.getAs[String]("split"), r.getAs[Long]("n_docs"))).toMap
    assert(r1 == r2)
    assert(r1.values.sum == 200L)
    assert(r1.keySet.subsetOf(Set("train", "val", "test")))
    assert(r1("train") > r1.getOrElse("val", 0L))
  }

  test("lengthHist: fixed-width buckets account for every doc and token") {
    val d = Seq(
      (0L, "a b c", "en"),                         // 3 tokens -> bucket 0
      (1L, (1 to 17).map(i => s"t$i").mkString(" "), "en"), // 17 -> bucket 16
      (2L, (1 to 16).map(i => s"t$i").mkString(" "), "en"), // 16 -> bucket 16
      (3L, "x y", "de")                            // 2 tokens -> bucket 0
    ).toDF("doc_id", "text", "lang")
    val r = TextOps.lengthHist(d, width = 16).collect()
      .map(x => (x.getAs[String]("lang"), x.getAs[Long]("bucket_lo")) ->
        ((x.getAs[Long]("n_docs"), x.getAs[Long]("sum_tokens")))).toMap
    assert(r == Map(
      ("en", 0L) -> ((1L, 3L)),
      ("en", 16L) -> ((2L, 33L)),
      ("de", 0L) -> ((1L, 2L))))
  }

  test("vocabTopK and bigramTopK count correctly") {
    val d = Seq((0L, "a b a b a c")).toDF("doc_id", "text")
    val v = TextOps.vocabTopK(d, k = 2).collect()
      .map(r => (r.getAs[String]("token"), r.getAs[Long]("n"))).toMap
    assert(v == Map("a" -> 3L, "b" -> 2L))
    val b = TextOps.bigramTopK(d, k = 1).collect()
    assert(b.head.getAs[String]("bigram") == "a b" && b.head.getAs[Long]("n") == 2L)
  }

  test("winnow matches the local winnowing model; every window is covered") {
    val k = 4; val w = 5
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val texts = docs.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(gram: String): String =
      md.digest(gram.getBytes("UTF-8")).map("%02x".format(_))
        .mkString.take(15)
    val expected = texts.flatMap { case (id, text) =>
      val toks = text.split(" ", -1)
      if (toks.length < k) Seq.empty
      else {
        val keys = (0 to toks.length - k).map(p =>
          h(toks.slice(p, p + k).mkString(" ")) + f"$p%010d")
        ((w - 1) until keys.size).map(i =>
          (id, keys.slice(i - w + 1, i + 1).min)).distinct
          .map { case (d, sel) =>
            (d, sel.take(15), sel.drop(15).toLong) }
      }
    }.toSet
    val got = TextOps.winnow(docs, k, w).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("fp"),
        r.getAs[Long]("pos"))).toSet
    assert(got == expected)
    // the winnowing guarantee: every full window holds >= 1 selection
    val byDoc = got.groupBy(_._1).map { case (d, g) => d -> g.map(_._3) }
    texts.foreach { case (id, text) =>
      val n = text.split(" ", -1).length - k + 1
      if (n >= w) {
        val sel = byDoc(id)
        ((w - 1) until n).foreach(i =>
          assert(sel.exists(p => p > i - w && p <= i),
            s"doc $id window ending at $i has no fingerprint"))
      }
    }
  }

  test("winnow: docs sharing a long-enough run share a fingerprint; disjoint do not") {
    val k = 4; val w = 5
    // shared run of w+k-1 = 8 tokens guarantees a shared fingerprint
    val run = "s1 s2 s3 s4 s5 s6 s7 s8"
    val d = Seq(
      (0L, s"a b c d e $run x y z"),
      (1L, s"p q r $run m n o"),
      (2L, "k l m n o p q r s t u v w")
    ).toDF("doc_id", "text")
    val fps = TextOps.winnow(d, k, w).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("fp"))
      .groupBy(_._1).map { case (id, g) => id -> g.map(_._2).toSet }
    assert((fps(0L) & fps(1L)).nonEmpty,
      "a shared w+k-1 token run must share a fingerprint")
    assert((fps(0L) & fps(2L)).isEmpty && (fps(1L) & fps(2L)).isEmpty,
      "no shared grams, no shared fingerprints")
  }

  test("winnowPairs: overlapping docs pair up; boilerplate cap excludes saturated fps") {
    val run = (1 to 20).map(i => s"s$i").mkString(" ")
    val d = Seq(
      (0L, s"a b c d e $run x y z"),
      (1L, s"p q r $run m n o"),
      (2L, "k l m n o p q r s t u v w")
    ).toDF("doc_id", "text")
    val pairs = TextOps.winnowPairs(d).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Long]("n_shared")).toMap
    assert(pairs.contains((0L, 1L)),
      s"a 20-token shared run must produce a pair, got $pairs")
    assert(pairs((0L, 1L)) >= 2L)
    assert(pairs.keySet == Set((0L, 1L)), "doc 2 shares no grams")
    // cap: the same fingerprints in MORE than fpCap docs are
    // boilerplate and must not pair anyone
    val same = Seq.tabulate(3)(i => (i.toLong, run)).toDF("doc_id", "text")
    assert(TextOps.winnowPairs(same, fpCap = 2).collect().isEmpty,
      "fps saturating the cap are excluded")
    assert(TextOps.winnowPairs(same, fpCap = 3).collect().length == 3,
      "under the cap all three pairs surface")
  }

  test("heavyHitters: exact regime equals full token counts (capacity >= vocab)") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val exact = docs
      .select(explode(TextFunctions.tokenize(col("text"))).as("tok"))
      .where(col("tok") =!= "")
      .groupBy("tok").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getAs[String]("tok") -> r.getAs[Long]("n"))
      .filter(_._2 >= 2).toMap
    val got = TextOps.heavyHitters(docs).collect()
      .map(r => r.getAs[String]("token") -> r.getAs[Long]("est_count")).toMap
    assert(got == exact,
      "with capacity above the vocabulary MG must be exact")
  }

  test("heavyHitters: sketch regime honors the Misra-Gries bounds (capacity 4)") {
    // skewed stream: a=100, b=60, c=30, plus 40 distinct singletons;
    // N=230, k=4 -> bound N/(k+1)=46: a and b MUST survive, every
    // estimate undercounts by at most 46. 7 partitions force real
    // partial-summary merges.
    val words = Seq.fill(100)("a") ++ Seq.fill(60)("b") ++
      Seq.fill(30)("c") ++ (0 until 40).map(i => s"u$i")
    val truth = words.groupBy(identity).map { case (w, g) => w -> g.size.toLong }
    val n = words.size
    val bound = n / 5 // N/(capacity+1)
    val d = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text").repartition(7)
    val got = TextOps.heavyHitters(d, capacity = 4, minCount = 1).collect()
      .map(r => r.getAs[String]("token") -> r.getAs[Long]("est_count")).toMap
    assert(got.size <= 4, "summary may never exceed its capacity")
    got.foreach { case (tok, est) =>
      assert(est <= truth(tok), s"$tok overcounted: $est > ${truth(tok)}")
      assert(truth(tok) - est <= bound,
        s"$tok undercounted past N/(k+1): $est vs ${truth(tok)}")
    }
    truth.filter(_._2 > bound).keys.foreach { tok =>
      assert(got.contains(tok),
        s"$tok is more frequent than N/(k+1) and must be present")
    }
  }

  test("Tables.registerAll exposes the star schema to spark.sql") {
    graft.sources.Tables.registerAll(spark, "/root/testdata/sf0.001")
    assert(spark.sql("SELECT count(*) FROM lineitem").head().getLong(0) > 0)
    assert(spark.sql("SELECT count(*) FROM events WHERE value > 0").head().getLong(0) > 0)
  }

  test("maskSecret redacts digit runs") {
    val m = Seq("key=1234 user 56 ok").toDF("s")
      .select(TextFunctions.maskSecret(col("s")).as("m")).as[String].head()
    assert(m == "key=*** user *** ok")
  }

  test("wordEntropy: hand-computed values on degenerate and uniform docs") {
    val d = Seq(
      (0L, "a a a a"),      // one token: H = 0
      (1L, "a b c d"),      // uniform: H = ln(4)
      (2L, "a a b b")       // H = ln(4) - ln(2) = ln(2)
    ).toDF("doc_id", "text")
    val r = TextOps.wordEntropy(d).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[Double]("entropy")).toMap
    assert(math.abs(r(0L)) < 1e-6, s"got ${r(0L)}")
    assert(math.abs(r(1L) - math.log(4)) < 1e-5, s"got ${r(1L)}")
    assert(math.abs(r(2L) - math.log(2)) < 1e-5, s"got ${r(2L)}")
  }

  test("wordEntropy: matches an in-memory reference on the corpus") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val r = TextOps.wordEntropy(docs).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Long]("n_tokens"), x.getAs[Double]("entropy")))).toMap
    val ref = docs.select("doc_id", "text").collect().map { x =>
      val toks = x.getAs[String]("text").split(" ").filter(_.nonEmpty)
      val n = toks.length.toDouble
      val h = math.log(n) -
        toks.groupBy(identity).values.map(g =>
          g.length * math.log(g.length)).sum / n
      x.getAs[Long]("doc_id") -> ((toks.length.toLong, h))
    }.toMap
    assert(r.keySet == ref.keySet)
    for ((id, (n, h)) <- r) {
      assert(n == ref(id)._1)
      // 6dp per-term rounding bounds the drift from the float reference
      assert(math.abs(h - ref(id)._2) < 1e-4, s"doc $id: $h vs ${ref(id)._2}")
      assert(h >= -1e-6 && h <= math.log(n.toDouble) + 1e-6)
    }
  }

  test("pmiTop: perfectly-correlated pair outranks an independent pair") {
    // "x y" always co-occur (never apart); "a b" co-occur at chance
    val d = Seq(
      (0L, "x y a p x y b q"),
      (1L, "x y a r b s x y"),
      (2L, "x y b t a u x y"),
      (3L, "x y a v x y b w")
    ).toDF("doc_id", "text")
    val r = TextOps.pmiTop(d, k = 100, minCount = 2).collect()
      .map(x => (x.getAs[String]("w1"), x.getAs[String]("w2")) ->
        ((x.getAs[Long]("n_pair"), x.getAs[Double]("pmi")))).toMap
    assert(r.contains(("x", "y")), s"got ${r.keys}")
    val (nXy, pmiXy) = r(("x", "y"))
    assert(nXy == 8L)
    // every bigram containing x as w1 is "x y": PMI must exceed any
    // other pair passing the floor
    assert(r.values.map(_._2).max == pmiXy, s"x y not top: $r")
  }

  test("pmiTop: matches an in-memory reference on the corpus") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val r = TextOps.pmiTop(docs, k = 20).collect()
      .map(x => (x.getAs[String]("w1"), x.getAs[String]("w2")) ->
        x.getAs[Double]("pmi")).toMap
    val texts = docs.select("text").collect().map(_.getString(0))
    val uni = scala.collection.mutable.Map.empty[String, Long]
    val big = scala.collection.mutable.Map.empty[(String, String), Long]
    for (t <- texts) {
      val toks = t.split(" ", -1)
      toks.filter(_.nonEmpty).foreach(w => uni(w) = uni.getOrElse(w, 0L) + 1)
      toks.sliding(2).filter(_.length == 2).foreach { p =>
        val k = (p(0), p(1)); big(k) = big.getOrElse(k, 0L) + 1
      }
    }
    val nu = uni.values.sum.toDouble
    val np = big.values.sum.toDouble
    for (((w1, w2), pmi) <- r) {
      val expected = math.log(
        (big((w1, w2)) * nu * nu) / (np * uni(w1) * uni(w2)))
      assert(math.abs(pmi - expected) < 1e-5,
        s"($w1,$w2): $pmi vs $expected")
      assert(big((w1, w2)) >= 5)
    }
  }

  test("oovRate: rates against the top-v vocab, hand-checked") {
    // corpus freq: a=5, b=4, c=2, z=1 -> top-2 vocab = {a, b}
    val d = Seq(
      (0L, "a a b b c"),   // 1 OOV of 5
      (1L, "a b c z a"),   // 2 OOV of 5
      (2L, "a b b a")      // 0 OOV of 4
    ).toDF("doc_id", "text")
    val r = TextOps.oovRate(d, v = 2).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Long]("n_tok"), x.getAs[Long]("n_oov")))).toMap
    assert(r == Map(0L -> ((5L, 1L)), 1L -> ((5L, 2L)), 2L -> ((4L, 0L))))
  }

  test("blocklistFilter: flags exactly the docs containing a listed term") {
    val d = Seq(
      (0L, "clean text here"),
      (1L, "one bad term here"),
      (2L, "bad bad worse bad"),
      (3L, "badge is not bad-ge or bad")  // whole-token match only
    ).toDF("doc_id", "text")
    val r = TextOps.blocklistFilter(d, terms = Seq("bad", "worse")).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Long]("n_tok"), x.getAs[Long]("n_hits")))).toMap
    assert(r == Map(1L -> ((4L, 1L)), 2L -> ((4L, 4L)), 3L -> ((6L, 1L))))
  }

  test("bigramLogProb: order-sensitive where unigram scoring is blind") {
    // both docs have identical token MULTISETS -> identical unigram
    // scores by construction; only doc 0's bigrams match the corpus's
    // dominant transitions, so the bigram model must separate them
    val d = Seq(
      (0L, "a b a b a b"),
      (1L, "b a b a b a"),
      (2L, "a b a b a b a b"),
      (3L, "a b a b")
    ).toDF("doc_id", "text")
    val uni = TextOps.unigramLogProb(d).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[Double]("avg_logprob")).toMap
    assert(math.abs(uni(0L) - uni(1L)) < 1e-12, "unigram cannot separate these")
    val bi = TextOps.bigramLogProb(d).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[Double]("avg_logprob")).toMap
    // doc 1 starts b->a and contains one less a->b than doc 0's
    // pattern; corpus transitions are dominated by a->b so doc 0
    // must score at least as high, strictly higher than random order
    assert(bi(0L) > bi(1L), s"bigram model must see order: $bi")
  }

  test("bigramLogProb: whitespace runs do not mint phantom transitions") {
    val d = Seq(
      (0L, "a b a b"),
      (1L, "a  b a b") // doubled space: same word sequence, same score
    ).toDF("doc_id", "text")
    val r = TextOps.bigramLogProb(d).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Long]("n_bigrams"), x.getAs[Double]("avg_logprob")))).toMap
    assert(r(0L) == r(1L), s"'' tokens leaked into the bigram model: $r")
  }

  test("bigramLogProb matches an in-memory add-one bigram LM") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val r = TextOps.bigramLogProb(docs).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Long]("n_bigrams"), x.getAs[Double]("avg_logprob")))).toMap
    val texts = docs.select("doc_id", "text").collect()
      .map(x => x.getLong(0) -> x.getString(1))
    val pair = scala.collection.mutable.Map.empty[(String, String), Long]
    val vocabSet = scala.collection.mutable.Set.empty[String]
    for ((_, t) <- texts) {
      val ts = t.split(" ", -1).filter(_.nonEmpty)
      ts.foreach(vocabSet += _)
      for (w <- ts.sliding(2) if w.length == 2)
        pair((w(0), w(1))) = pair.getOrElse((w(0), w(1)), 0L) + 1
    }
    val first = pair.groupBy(_._1._1).map { case (w1, m) => w1 -> m.values.sum }
    val v = vocabSet.size
    for ((id, t) <- texts) {
      val ts = t.split(" ", -1).filter(_.nonEmpty)
      if (ts.length >= 2) {
        val bgs = ts.sliding(2).filter(_.length == 2).toSeq
        val exp = bgs.map { w =>
          BigDecimal(math.log((pair((w(0), w(1))) + 1).toDouble /
            (first(w(0)) + v).toDouble))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        }.sum / bgs.size
        val (n, got) = r(id)
        assert(n == bgs.size)
        assert(math.abs(got - exp) < 1e-9, s"doc $id: $got vs $exp")
      } else assert(!r.contains(id))
    }
  }

  test("hashEmbed: dense form equals sparse form and is unit-norm") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val sparse = TextOps.hashEmbedSparse(docs).collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .map { case (id, rows) =>
        id -> rows.map(r =>
          r.getAs[Long]("bucket") -> r.getAs[Double]("weight")).toMap
      }
    val dense = TextOps.hashEmbed(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getSeq[Float](r.fieldIndex("embedding"))).toMap
    assert(dense.keySet == sparse.keySet)
    for ((id, vec) <- dense) {
      assert(vec.length == 64)
      val norm2 = vec.map(x => x.toDouble * x).sum
      assert(math.abs(norm2 - 1.0) < 1e-3, s"doc $id norm2 $norm2")
      for ((b, w) <- sparse(id))
        assert(math.abs(vec(b.toInt) - w) < 1e-6)
      // zero everywhere the sparse form has no entry
      for (i <- 0 until 64 if !sparse(id).contains(i.toLong))
        assert(vec(i) == 0f)
    }
  }

  test("hashEmbed output drives the ANN family end-to-end") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val vecs = TextOps.hashEmbed(docs)
      .select(col("doc_id").as("vec_id"), col("embedding"))
    val nn = graft.operators.Similarity.annTopK(vecs, nQueries = 3, k = 5)
      .collect()
    assert(nn.nonEmpty, "hash embeddings must be consumable by annTopK")
    assert(nn.forall(r => !r.getAs[Double]("cos_sim").isNaN))
  }

  test("sourceReport: duplication and diversity per source, exact ratios") {
    val d = Seq(
      (0L, "a b c d", "s0"),
      (1L, "a b c d", "s0"), // exact dup of 0
      (2L, "a b e f", "s0"),
      (3L, "x x x x x", "s1") // templated: ttr collapses
    ).toDF("doc_id", "text", "source")
    val r = TextOps.sourceReport(d).collect()
      .map(x => x.getAs[String]("source") ->
        ((x.getAs[Long]("n_docs"), x.getAs[Long]("n_tokens"),
          x.getAs[Double]("ttr"), x.getAs[Double]("dup_rate")))).toMap
    val (n0, t0, ttr0, dup0) = r("s0")
    assert(n0 == 3 && t0 == 12)
    assert(math.abs(ttr0 - 6.0 / 12.0) < 1e-12) // a b c d e f over 12
    assert(math.abs(dup0 - (1.0 - 2.0 / 3.0)) < 1e-12) // 2 unique of 3
    val (n1, t1, ttr1, dup1) = r("s1")
    assert(n1 == 1 && t1 == 5)
    assert(math.abs(ttr1 - 1.0 / 5.0) < 1e-12)
    assert(dup1 == 0.0)
  }

  test("gopherGate: each rule fires on its own violation, keep on clean text") {
    // 60 words, all bigrams distinct (repeating one sentence would
    // legitimately fail the repetition rule)
    val longClean = ("the a of and is " +
      (1 to 55).map(i => s"wo${('a' + i / 26).toChar}${('a' + i % 26).toChar}")
        .mkString(" "))
    val d = Seq(
      (0L, longClean), // 60 words, clean: keep
      (1L, "the a of and is short"), // < 50 words: word_count
      (2L, Seq.fill(60)("## the a ## of ##").mkString(" ")), // symbols
      (3L, (Seq.fill(30)("12345 67890") ++ Seq("the", "a")).mkString(" ")), // numeric words
      (4L, Seq.fill(60)("zumba wumba").mkString(" ")), // no stopwords + repetition
      (5L, ("the a " + "xy " * 58).trim) // mean word length < 3
    ).toDF("doc_id", "text")
    val r = TextOps.gopherGate(d).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Boolean]("keep"), x.getAs[String]("fail_reasons")))).toMap
    assert(r(0L)._1, s"clean doc must keep: ${r(0L)}")
    assert(r(0L)._2 == "")
    assert(!r(1L)._1 && r(1L)._2.contains("word_count"))
    assert(!r(2L)._1 && r(2L)._2.contains("symbol_ratio"), r(2L).toString)
    assert(!r(3L)._1 && r(3L)._2.contains("alpha_ratio"), r(3L).toString)
    assert(!r(4L)._1 && r(4L)._2.contains("stopwords") &&
      r(4L)._2.contains("repetition"), r(4L).toString)
    assert(!r(5L)._1 && r(5L)._2.contains("word_length"), r(5L).toString)
    // reasons appear in fixed rule order
    assert(r(4L)._2 == "stopwords,repetition", r(4L)._2)
  }

  test("zipfSlope matches an in-memory least-squares fit and is negative") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val r = TextOps.zipfSlope(docs).collect()
      .map(x => x.getAs[String]("lang") ->
        ((x.getAs[Long]("k"), x.getAs[Double]("zipf_slope")))).toMap
    val byLang = docs.select("lang", "text").collect()
      .groupBy(_.getString(0)).map { case (l, rows) =>
        l -> rows.flatMap(_.getString(1).split(" ", -1)).filter(_.nonEmpty)
      }
    for ((lang, toks) <- byLang) {
      val freq = toks.groupBy(identity).map { case (t, xs) => t -> xs.length }
        .filter(_._2 >= 2).toSeq
        .sortBy { case (t, n) => (-n, t) }.take(1000)
      if (freq.length >= 2) {
        val xy = freq.zipWithIndex.map { case ((_, n), i) =>
          (math.round(math.log(i + 1.0) * 1000),
            math.round(math.log(n.toDouble) * 1000))
        }
        val k = xy.length.toLong
        val sx = xy.map(_._1).sum; val sy = xy.map(_._2).sum
        val sxy = xy.map(p => p._1 * p._2).sum
        val sxx = xy.map(p => p._1 * p._1).sum
        val exp = (k * sxy - sx * sy).toDouble / (k * sxx - sx * sx).toDouble
        val (gotK, gotS) = r(lang)
        assert(gotK == k, s"$lang: k $gotK vs $k")
        assert(math.abs(gotS - exp) < 1e-12, s"$lang: $gotS vs $exp")
        assert(gotS < 0, s"$lang: token frequencies must decay with rank")
      } else assert(!r.contains(lang))
    }
  }

  test("bm25Top matches a local reference model exactly and cuts at k") {
    val docs = Seq(
      (0L, "cat dog cat"),      // tf(cat)=2, tf(dog)=1, dl=3
      (1L, "cat mouse"),        // tf(cat)=1, dl=2
      (2L, "dog mouse bird"),   // tf(dog)=1, dl=3
      (3L, "cat cat cat cat"),  // tf(cat)=4, dl=4
      (4L, "fish fowl")         // no query terms: absent
    ).toDF("doc_id", "text")
    val query = Seq("cat", "dog")
    val r = TextOps.bm25Top(docs, query = query, k = 3).collect()
      .map(x => (x.getAs[Long]("doc_id"), x.getAs[Double]("score"),
        x.getAs[Long]("rnk"))).sortBy(_._3)

    // local model: the SAME double operations in the SAME order
    val n = 5; val avgdl = (3 + 2 + 3 + 4 + 2).toDouble / 5.0
    val tf = Map((0L, "cat") -> 2L, (0L, "dog") -> 1L, (1L, "cat") -> 1L,
      (2L, "dog") -> 1L, (3L, "cat") -> 4L)
    val dl = Map(0L -> 3L, 1L -> 2L, 2L -> 3L, 3L -> 4L)
    val df = Map("cat" -> 3L, "dog" -> 2L)
    def contrib(d: Long, t: String): BigDecimal = {
      val idf = math.log(1.0 + ((n - df(t)).toDouble + 0.5) / (df(t).toDouble + 0.5))
      val c = idf * ((tf((d, t)).toDouble * 2.2) /
        (tf((d, t)).toDouble + 1.2 * (0.25 + 0.75 * (dl(d).toDouble / avgdl))))
      BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    }
    val model = tf.keys.map(_._1).toSeq.distinct
      .map(d => d -> query.filter(t => tf.contains((d, t))).map(contrib(d, _)).sum.toDouble)
      .sortBy { case (d, s) => (-s, d) }
    assert(r.length == 3, "k cuts the frame")
    r.zip(model.take(3)).foreach { case ((gd, gs, _), (md, ms)) =>
      assert(gd == md && gs == ms, s"got ($gd,$gs) want ($md,$ms)")
    }
    // the multi-term doc outranks every single-term doc of equal tf
    assert(r.head._1 == 0L, "doc 0 matches both terms")
  }

  test("compressRatio: repetitive text gates low, diverse text passes, empty excluded") {
    val rep = Array.fill(200)("spam").mkString(" ")
    val div = (0 until 200).map(i => s"w${i * 7919}").mkString(" ")
    val docs = Seq((0L, rep), (1L, div), (2L, "")).toDF("doc_id", "text")
    val r = TextOps.compressRatio(docs).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Double]("ratio"), x.getAs[Boolean]("keep"),
          x.getAs[String]("fail_reasons")))).toMap
    assert(r.keySet == Set(0L, 1L), "empty doc has no ratio semantics")
    val (ratioRep, keepRep, whyRep) = r(0L)
    val (ratioDiv, keepDiv, whyDiv) = r(1L)
    assert(ratioRep < ratioDiv, "zlib must compress repetition harder")
    assert(!keepRep && whyRep == "too_repetitive")
    assert(keepDiv && whyDiv == "")
    // deterministic across runs (thread-local deflater state resets)
    val again = TextOps.compressRatio(docs).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[Double]("ratio")).toMap
    assert(again(0L) == ratioRep && again(1L) == ratioDiv)
  }

  private def lmScores(d: org.apache.spark.sql.DataFrame) =
    d.collect().map(x => x.getAs[Long]("doc_id") ->
      ((x.getAs[Long]("n_bigrams"), x.getAs[Double]("avg_logprob")))).toMap

  test("lmScoreFrom: the training corpus scored under its own stored " +
      "model equals the self-trained bigramLogProb bit-for-bit") {
    val d = Seq(
      (0L, "a b a b c"), (1L, "a b c d e"), (2L, "b c b c a b"),
      (3L, "single"), (4L, "")
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-lmidx").toString
    TextOps.writeLmIndex(d, dir)
    val served = lmScores(TextOps.lmScoreFrom(spark, dir, d))
    val self = lmScores(TextOps.bigramLogProb(d))
    assert(served == self, s"served=$served self=$self")
  }

  test("lmScoreFrom: unseen bigrams take the Laplace floor, and a " +
      "doc's frozen-model score is batch-independent") {
    // training corpus: vocab = {a, b, c} (V = 3); firsts: a→2, b→2
    val train = Seq((0L, "a b c"), (1L, "a b")).toDF("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-lmidx2").toString
    TextOps.writeLmIndex(train, dir)
    // novel tokens: n_pair→0, n_first→0 ⇒ ln(1 / V)
    val novel = Seq((10L, "x y")).toDF("doc_id", "text")
    val floor = BigDecimal(math.log(1.0 / 3.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = lmScores(TextOps.lmScoreFrom(spark, dir, novel))(10L)
    assert(got == ((1L, floor)), s"got $got want (1, $floor)")
    // seen first-word, unseen continuation: ln((0+1)/(n_first(a)+V))
    val half = Seq((11L, "a c")).toDF("doc_id", "text")
    val partial = BigDecimal(math.log(1.0 / (2 + 3).toDouble))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(lmScores(TextOps.lmScoreFrom(spark, dir, half))(11L) ==
      ((1L, partial)))
    // frozen scale: the same doc scores identically alone and in a
    // batch with other docs (bigramLogProb, self-trained, would
    // re-normalize — the property that distinguishes the serve leg)
    val batch = novel.unionByName(half)
      .unionByName(Seq((12L, "a b a b")).toDF("doc_id", "text"))
    val inBatch = lmScores(TextOps.lmScoreFrom(spark, dir, batch))
    assert(inBatch(10L) == got && inBatch(11L) == ((1L, partial)))
  }

  test("updateLmIndex: count surgery is BIT-EQUAL to a scratch " +
      "rebuild of the post-diff corpus, and fully retracted tokens " +
      "leave the vocabulary") {
    val snapA = Seq(
      (0L, "a b a b c"), (1L, "a b c d"), (2L, "q r q r"), // 2 retracts
      (3L, "b c a")
    ).toDF("doc_id", "text")
    // doc 2 retracted (its q/r tokens exist nowhere else — they must
    // leave V), doc 1 changed (retract old, add new), docs 10-11 added
    val retract = snapA.where(col("doc_id").isin(1L, 2L))
    val added = Seq(
      (1L, "a b c d e"), (10L, "c d c d"), (11L, "z z a")
    ).toDF("doc_id", "text")
    val postDiff = snapA.where(!col("doc_id").isin(1L, 2L))
      .unionByName(added)
    val idx = java.nio.file.Files
      .createTempDirectory("graft-lmsurgery").toString
    TextOps.writeLmIndex(snapA, s"$idx/v0")
    TextOps.updateLmIndex(spark, s"$idx/v0", s"$idx/v1", retract, added)
    TextOps.writeLmIndex(postDiff, s"$idx/scratch")
    def rows(p: String) = spark.read.parquet(p).collect()
      .map(_.toSeq).toSet
    for (part <- Seq("pairs", "firsts", "vocab", "meta"))
      assert(rows(s"$idx/v1/$part") == rows(s"$idx/scratch/$part"),
        s"artifact $part diverged")
    // q/r never re-added: V must have dropped them
    val vocab = spark.read.parquet(s"$idx/v1/vocab").collect()
      .map(_.getAs[String]("tok")).toSet
    assert(!vocab.contains("q") && !vocab.contains("r"))
    // and scoring through the surgered index equals the rebuild
    val probe = Seq((20L, "a b q r")).toDF("doc_id", "text")
    assert(lmScores(TextOps.lmScoreFrom(spark, s"$idx/v1", probe)) ==
      lmScores(TextOps.lmScoreFrom(spark, s"$idx/scratch", probe)))
    val err = intercept[IllegalArgumentException] {
      TextOps.updateLmIndex(spark, s"$idx/v1", s"$idx/v1", retract, added)
    }
    assert(err.getMessage.contains("cannot overwrite"))
  }

  test("trigramBackoffScore: hand-computed stupid-backoff arms — " +
      "attested trigram ratio, alpha bigram backoff, alpha-squared " +
      "add-one unigram floor — with per-path telemetry; short docs " +
      "emit no row") {
    // reference "a b c a b d": uni a2 b2 c1 d1 (N=6, V=4);
    // bi ab2 bc1 ca1 bd1; tri abc1 bca1 cab1 abd1
    val ref = Seq((0L, "a b c a b d", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val scored = Seq(
      (1L, "a b c x", "en", "s"),  // (a,b,c) hit 1/2; (b,c,x) uni floor
      (2L, "x a b", "en", "s"),    // (x,a,b): bi backoff 0.4*2/2
      (3L, "a b", "en", "s"))      // <3 tokens: no row
      .toDF("doc_id", "text", "lang", "source")
    val got = TextOps.trigramBackoffScore(scored, ref).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(!got.contains(3L))
    val (n1, h1, b1, u1, lp1) = got(1L)
    assert((n1, h1, b1, u1) == ((2L, 1L, 0L, 1L)), s"doc1 paths: ${got(1L)}")
    val exp1 = (math.rint(math.log(0.5) * 1e6) / 1e6 +
      math.rint(math.log(0.4 * 0.4 * 1.0 / 10.0) * 1e6) / 1e6) / 2.0
    assert(math.abs(lp1 - exp1) < 1e-9, s"doc1 lp $lp1 vs $exp1")
    val (n2, h2, b2, u2, lp2) = got(2L)
    assert((n2, h2, b2, u2) == ((1L, 0L, 1L, 0L)), s"doc2 paths: ${got(2L)}")
    val exp2 = math.rint(math.log(0.4 * 2.0 / 2.0) * 1e6) / 1e6
    assert(math.abs(lp2 - exp2) < 1e-9, s"doc2 lp $lp2 vs $exp2")
  }

  test("trigram serve round trip: the persisted count tables reproduce " +
      "the inline reference score exactly") {
    val ref = Seq((0L, "a b c a b d", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val scored = Seq((1L, "a b c x", "en", "s"), (2L, "x a b", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val path = s"/tmp/graft-test-warehouse/trigram-rt-${System.nanoTime}"
    TextOps.writeTrigramIndex(ref, path)
    def keyed(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSet
    val inline = keyed(TextOps.trigramBackoffScore(scored, ref))
    val served = keyed(TextOps.trigramScoreFrom(spark, path, scored))
    assert(served == inline, s"served $served vs inline $inline")
  }

  test("nfkcFold: the fixture's compatibility-damaged twin collapses " +
      "onto its ASCII pair, exactly the odd rows flag changed, and " +
      "char counts shrink where forms decompose-fold") {
    val d = spark.range(0, 10).toDF("doc_id")
      .withColumn("text", TextOps.syntheticNfkcText(col("doc_id")))
    val got = TextOps.nfkcFold(d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Boolean]("changed"), r.getAs[String]("text_nfkc"))))
      .toMap
    for (g <- 0L until 5L) {
      val (cEven, tEven) = got(2 * g)
      val (cOdd, tOdd) = got(2 * g + 1)
      assert(!cEven && cOdd, s"pair $g flags: $cEven/$cOdd")
      assert(tEven == tOdd, s"pair $g must collapse: '$tEven' vs '$tOdd'")
    }
  }

  test("codeBlocks: pre and inline code extract with entities decoded " +
      "and inner tags stripped; code nested in pre never double-counts; " +
      "block ids follow document order; block-free docs emit nothing") {
    val d = Seq(
      (1L, "<p>x</p><pre>a &lt; b\nc</pre><p><code>f() &amp;&amp; g()</code></p>"),
      (2L, "<pre><code>only pre</code></pre>"),
      (3L, "<p>no blocks at all</p>"),
      (4L, "<pre>first</pre><pre a=\"v>w\">second</pre>"))
      .toDF("doc_id", "html")
    val got = TextOps.codeBlocks(d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getString(3), r.getLong(4)))
    val d1 = got.filter(_._1 == 1L).sortBy(x => (x._2, x._3))
    assert(d1.toSeq == Seq(
      (1L, "code", 0L, "f() && g()", 1L),
      (1L, "pre", 0L, "a < b\nc", 2L)), s"${d1.toSeq}")
    assert(got.filter(_._1 == 2L).toSeq ==
      Seq((2L, "pre", 0L, "only pre", 1L)), "nested must not double")
    assert(!got.exists(_._1 == 3L))
    val d4 = got.filter(_._1 == 4L).sortBy(_._3).map(_._4)
    assert(d4.toSeq == Seq("first", "second"),
      s"quoted '>' attr must not truncate: ${d4.toSeq}")
  }

  test("scriptMix: per-script counts, dominance with priority ties, " +
      "none for unscripted text, floored ppm share") {
    val d = Seq(
      (1L, "abc xyz"),      // latin only
      (2L, "Яр abc"),       // latin 3 > cyrillic 2
      (3L, "中文網頁"),      // pure CJK
      (4L, "12 .. !"),      // no scripted char at all
      (5L, "ab ЯР"),        // 2-2 tie -> latin by priority
      (6L, "γγ 中中中"),     // cjk 3 > greek 2
      (7L, "한국 देव مرحبا")) // arabic 5 > hangul 2, devanagari 3
      .toDF("doc_id", "text")
    val got = TextOps.scriptMix(d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("dominant_script"), r.getAs[Long]("n_script"),
          r.getAs[Long]("n_dominant"), r.getAs[Long]("dominant_ppm"))))
      .toMap
    assert(got(1L) == (("latin", 6L, 6L, 1000000L)), s"got ${got(1L)}")
    assert(got(2L)._1 == "latin" && got(2L)._2 == 5L)
    assert(got(3L) == (("cjk", 4L, 4L, 1000000L)))
    assert(got(4L) == (("none", 0L, 0L, 0L)))
    assert(got(5L)._1 == "latin", s"tie must break to priority: ${got(5L)}")
    assert(got(6L)._1 == "cjk" && got(6L)._4 == 600000L)
    assert(got(7L)._1 == "arabic" && got(7L)._2 == 10L &&
      got(7L)._4 == 500000L, s"got ${got(7L)}")
  }
}
