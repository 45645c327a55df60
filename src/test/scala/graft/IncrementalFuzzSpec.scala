package graft

import graft.operators.{Dedup, Similarity}

/** Randomized differential fuzz for the cross-snapshot exactness
  * contracts: over generated corpora with planted families, verbatim
  * clones and degenerate rows, the incremental ops must equal the
  * joint run's at-least-one-new-side subset BIT FOR BIT on every
  * trial — the single-fixture specs in IncrementalDedupSpec prove the
  * machinery once; this hunts the composition edges (multi-member
  * stars straddling snapshots, clone-only news, degenerate hashes).
  */
class IncrementalFuzzSpec extends SparkSuite {
  import spark.implicits._

  test("embedDedupAgainst == joint nearDupPairsLsh new-involving subset " +
      "over randomized corpora") {
    val rnd = new scala.util.Random(1234)
    def unit(seed: Int): Array[Float] = {
      val r = new scala.util.Random(seed)
      val v = Array.fill(64)(r.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat)
    }
    def perturb(base: Array[Float], seed: Int): Array[Float] = {
      val r = new scala.util.Random(seed)
      val v = base.map(x => x + 0.08 * r.nextGaussian().toFloat)
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat)
    }
    (0 until 5).foreach { trial =>
      val nFam = 2 + rnd.nextInt(3)
      val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Float])]
      var id = 0L
      // families: a base + 2-4 perturbations + 0-2 verbatim clones
      (0 until nFam).foreach { f =>
        val base = unit(trial * 100 + f)
        rows += ((id, base)); id += 1
        (0 until 2 + rnd.nextInt(3)).foreach { p =>
          rows += ((id, perturb(base, trial * 1000 + f * 10 + p))); id += 1
        }
        (0 until rnd.nextInt(3)).foreach { _ =>
          // clone of a random existing family member
          rows += ((id, rows(rnd.nextInt(rows.size))._2)); id += 1
        }
      }
      // strangers + one degenerate zero vector
      (0 until 5).foreach { s2 =>
        rows += ((id, unit(99000 + trial * 10 + s2))); id += 1
      }
      rows += ((id, Array.fill(64)(0f))); id += 1
      // random snapshot split: old = ids below a cut (append-only)
      val cut = 1L + rnd.nextInt(rows.size - 1)
      val old = rows.filter(_._1 < cut).toSeq.toDF("vec_id", "embedding")
      val news = rows.filter(_._1 >= cut).toSeq.toDF("vec_id", "embedding")
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft-fuzz-lsh-$trial").toString
      Similarity.writeLshIndex(old, dir)
      def triples(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
          r.getAs[Double]("cos_sim"))).toSet
      val inc = triples(Similarity.embedDedupAgainst(spark, dir, news))
      val joint = triples(Similarity.nearDupPairsLsh(
        old.unionByName(news)))
        .filter { case (a, b, _) => a >= cut || b >= cut }
      assert(inc == joint,
        s"trial $trial (cut=$cut, n=${rows.size}): " +
          s"missing=${joint -- inc} extra=${inc -- joint}")
    }
  }

  test("perceptualDedupAgainst == joint perceptualPairsFrom new-involving " +
      "subset over randomized hash corpora") {
    val rnd = new scala.util.Random(77)
    (0 until 5).foreach { trial =>
      val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var id = 0L
      (0 until 3 + rnd.nextInt(3)).foreach { f =>
        val base = rnd.nextLong()
        rows += ((id, base)); id += 1
        // near members: flip 1-4 random bits
        (0 until 1 + rnd.nextInt(3)).foreach { _ =>
          var h = base
          (0 until 1 + rnd.nextInt(4)).foreach(_ =>
            h ^= 1L << rnd.nextInt(64))
          rows += ((id, h)); id += 1
        }
        // verbatim hash clones
        (0 until rnd.nextInt(3)).foreach { _ =>
          rows += ((id, rows(rnd.nextInt(rows.size))._2)); id += 1
        }
      }
      (0 until 4).foreach { _ => rows += ((id, rnd.nextLong())); id += 1 }
      val cut = 1L + rnd.nextInt(rows.size - 1)
      val old = rows.filter(_._1 < cut).toSeq.toDF("doc_id", "h64")
      val news = rows.filter(_._1 >= cut).toSeq.toDF("doc_id", "h64")
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft-fuzz-ph-$trial").toString
      Dedup.writePerceptualIndex(old, dir)
      def triples(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
          r.getAs[Long]("hamming"))).toSet
      val inc = triples(Dedup.perceptualDedupAgainst(
        Dedup.perceptualIndex(spark, dir), news))
      val joint = triples(Dedup.perceptualPairsFrom(
        old.unionByName(news)))
        .filter { case (a, b, _) => a >= cut || b >= cut }
      assert(inc == joint,
        s"trial $trial (cut=$cut, n=${rows.size}): " +
          s"missing=${joint -- inc} extra=${inc -- joint}")
    }
  }

  test("updateBandIndex surgery == scratch rebuild over randomized re-crawls " +
      "(snapshotDiff-driven)") {
    val rnd = new scala.util.Random(777)
    def doc(seed: Int): String = {
      val r = new scala.util.Random(seed)
      (0 until 20 + r.nextInt(20)).map(_ => s"w${r.nextInt(40)}").mkString(" ")
    }
    (0 until 6).foreach { trial =>
      // corpus with clone pairs so retraction can hit a non-rep star
      // member (the surgery must still equal the rebuild)
      val base = (0 until 12 + rnd.nextInt(8)).map { i =>
        (i.toLong, doc(trial * 100 + i), "en", "web")
      }
      val withClones = base ++ (0 until 3).map { c =>
        val src = base(rnd.nextInt(base.size))
        ((base.size + c).toLong, src._2, "en", "mirror")
      }
      val old = withClones.toDF("doc_id", "text", "lang", "source")
      // random re-crawl: drop some ids, revise some, add some new
      val ids = withClones.map(_._1)
      val removed = rnd.shuffle(ids).take(1 + rnd.nextInt(3)).toSet
      val changed = rnd.shuffle(ids.filterNot(removed)).take(rnd.nextInt(3)).toSet
      val recrawl = (withClones.filterNot(r => removed(r._1)).map {
        case (i, t, l, s2) =>
          (i, if (changed(i)) t + s" rev$trial" else t, l, s2)
      } ++ (0 until rnd.nextInt(3)).map { a =>
        ((100 + a).toLong, doc(9000 + trial * 10 + a), "en", "web")
      }).toDF("doc_id", "text", "lang", "source")
      val diff = graft.operators.Curation.snapshotDiff(old, recrawl)
      import org.apache.spark.sql.functions.col
      val retract = diff.where(col("status").isin("removed", "changed"))
        .select("doc_id")
      val readd = recrawl.join(
        diff.where(col("status").isin("added", "changed")).select("doc_id"),
        "doc_id")
      val dirA = java.nio.file.Files
        .createTempDirectory(s"graft-fuzz-idx-a$trial").toString
      val dirB = java.nio.file.Files
        .createTempDirectory(s"graft-fuzz-idx-b$trial").toString
      val dirC = java.nio.file.Files
        .createTempDirectory(s"graft-fuzz-idx-c$trial").toString
      Dedup.writeBandIndex(old, dirA)
      Dedup.updateBandIndex(spark, dirA, dirB, retract, readd)
      Dedup.writeBandIndex(recrawl, dirC)
      def sigRows(p: String) = spark.read.parquet(s"$p/sigs").collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getSeq[Long](1).toList).toSet
      def bandRowsOf(p: String) = spark.read.parquet(s"$p/bands").collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("band_idx"),
          r.getAs[Long]("band_hash"))).toSet
      assert(sigRows(dirB) == sigRows(dirC),
        s"trial $trial (removed=$removed changed=$changed): sigs diverged")
      assert(bandRowsOf(dirB) == bandRowsOf(dirC),
        s"trial $trial (removed=$removed changed=$changed): bands diverged")
    }
  }

  test("updateDsirIndex surgery == scratch rebuild over randomized " +
      "re-crawls (snapshotDiff-driven, count-monoid exactness)") {
    val rnd = new scala.util.Random(4242)
    def doc(seed: Int): String = {
      val r = new scala.util.Random(seed)
      (0 until 5 + r.nextInt(15)).map(_ => s"w${r.nextInt(30)}").mkString(" ")
    }
    (0 until 6).foreach { trial =>
      // ids span the % 10 == 7 target class; include clones and a
      // short doc (no bigrams) so deltas hit every feature shape
      val base = (0 until 14 + rnd.nextInt(6)).map { i =>
        (i.toLong, if (i == 3) "solo" else doc(trial * 100 + i), "en", "web")
      }
      val old = base.toDF("doc_id", "text", "lang", "source")
      val ids = base.map(_._1)
      val removed = rnd.shuffle(ids).take(1 + rnd.nextInt(3)).toSet
      val changed = rnd.shuffle(ids.filterNot(removed)).take(rnd.nextInt(3)).toSet
      val recrawl = (base.filterNot(r => removed(r._1)).map {
        case (i, t, l, s2) =>
          (i, if (changed(i)) t + s" rev$trial" else t, l, s2)
      } ++ (0 until rnd.nextInt(3)).map { a =>
        // new ids land in BOTH label classes across trials
        ((97 + a).toLong, doc(9000 + trial * 10 + a), "en", "web")
      }).toDF("doc_id", "text", "lang", "source")
      val diff = graft.operators.Curation.snapshotDiff(old, recrawl)
      import org.apache.spark.sql.functions.col
      val retract = old.join(
        diff.where(col("status").isin("removed", "changed"))
          .select("doc_id"), "doc_id")
      val readd = recrawl.join(
        diff.where(col("status").isin("added", "changed")).select("doc_id"),
        "doc_id")
      val dirA = java.nio.file.Files
        .createTempDirectory(s"graft-fuzz-dsir-a$trial").toString
      val dirB = java.nio.file.Files
        .createTempDirectory(s"graft-fuzz-dsir-b$trial").toString
      val dirC = java.nio.file.Files
        .createTempDirectory(s"graft-fuzz-dsir-c$trial").toString
      graft.operators.Curation.writeDsirIndex(old, dirA)
      graft.operators.Curation.updateDsirIndex(spark, dirA, dirB,
        retract, readd)
      graft.operators.Curation.writeDsirIndex(recrawl, dirC)
      def counts(p: String) = spark.read.parquet(s"$p/counts").collect()
        .map(r => (r.getAs[Long]("b"), r.getAs[Long]("ct"),
          r.getAs[Long]("cr"))).toSet
      def ratio(p: String) = spark.read.parquet(s"$p/ratio").collect()
        .map(r => (r.getAs[Long]("b"),
          r.getAs[java.math.BigDecimal]("lr"))).toSet
      def meta(p: String) = spark.read.parquet(s"$p/meta").collect()(0).toSeq
      assert(counts(dirB) == counts(dirC),
        s"trial $trial (removed=$removed changed=$changed): counts diverged")
      assert(ratio(dirB) == ratio(dirC),
        s"trial $trial: ratio diverged")
      assert(meta(dirB) == meta(dirC),
        s"trial $trial: meta diverged")
    }
  }
}
