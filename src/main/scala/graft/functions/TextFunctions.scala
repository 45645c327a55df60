package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Reusable column-function library (SURVEY.md §2C) — every helper is
  * a composition of codegen'd built-ins (no UDFs), so operators built
  * from these stay inside whole-stage codegen at 100 TB.
  */
object TextFunctions {

  /** Whitespace tokens. */
  def tokenize(text: Column): Column = split(text, " ")

  /** BPE-ish regex tokens: letter runs, digit runs, single symbols.
    * Same regex class semantics in Java regex (Spark) and RE2
    * (DuckDB oracle).
    */
  val bpeIshPattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"
  def bpeIshTokens(text: Column): Column =
    regexp_extract_all(text, lit(bpeIshPattern), lit(0))

  /** k-word shingles of a token array (array-valued form). Not deduped
    * by default: the minhash consumer is a min-aggregate
    * (duplicate-insensitive), so the per-doc distinct pass would be
    * pure overhead there.
    *
    * NOTE: `transform` is a HigherOrderFunction and evaluates its
    * lambda *interpreted* (outside codegen) — fine for bounded
    * baselines, but hot paths should use [[shingleStructs]] +
    * [[shingleFromStruct]] (explode the zip, then a codegen'd
    * projection), which measured ~10× faster at 50M shingles.
    */
  def shingles(toks: Column, k: Int, distinct: Boolean = false): Column = {
    // guard: fewer than k tokens means no shingles (sequence(0, <0)
    // would count DOWN and slice would throw on start 0)
    val sh = when(size(toks) >= k,
      transform(
        sequence(lit(0), size(toks) - k),
        i => concat_ws(" ", slice(toks, i + 1, lit(k)))))
      .otherwise(array())
    if (distinct) array_distinct(sh) else sh
  }

  /** Codegen-friendly shingling, step 1: zip the k shifted slices of
    * the token array into an array of k-field structs (one per
    * shingle). No lambdas — `arrays_zip`/`slice` are ordinary codegen
    * expressions.
    */
  def shingleStructs(toks: Column, k: Int): Column =
    arrays_zip((0 until k).map(i =>
      slice(toks, lit(i + 1), size(toks) - (k - 1))): _*)

  /** Step 2 (after exploding step 1): join one struct's fields into
    * the shingle string — a plain codegen'd projection.
    */
  def shingleFromStruct(z: Column, k: Int): Column =
    concat_ws(" ", (0 until k).map(i => z.getField(i.toString)): _*)

  /** The shingle JOIN/AGGREGATE key for an exploded [[shingleStructs]]
    * struct: the exact string (oracle-mirrorable), or — the flag-gated
    * 100 TB swap shared by `Curation.decontaminate` and `Dedup.dupSpan`
    * — xxhash64 over the struct's token FIELDS, so shuffles move
    * 8-byte keys and the concatenated string is never materialized.
    * One definition for both operators: their spec-asserted
    * hashed == exact identity cannot drift.
    */
  def shingleKey(z: Column, k: Int, hashed: Boolean): Column =
    if (hashed) xxhash64((0 until k).map(i => z.getField(i.toString)): _*)
    else shingleFromStruct(z, k)

  /** Per-language stopword marker sets for the lang-ID heuristic.
    * Deterministic preference order on ties: en > de > fr > es.
    */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "et", "est", "dans"),
    "es" -> Seq("el", "los", "y", "es", "con"))

  /** Count of tokens contained in `words` (non-distinct — frequency
    * matters for language scoring).
    */
  def stopwordCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(words)))

  /** Rolling document fingerprint over whitespace tokens: the 64-bit
    * state is folded left-to-right as acc = xxhash64(acc, token) — an
    * order-sensitive chained hash with no overflow (polynomial-style
    * wrapping multiply would trip ANSI mode). Partition-local
    * projection — zero shuffle.
    */
  def rollingFingerprint(text: Column): Column =
    aggregate(tokenize(text), lit(0L), (acc, t) => xxhash64(acc, t))

  /** Secret masking for audit logs (kinesis-pay.php:459): digit runs
    * (card/token/amount digits) are redacted. The single source of
    * truth for the redaction rule — `Payments.maskLog` and
    * `InvoiceLog.redact` both call this.
    */
  def maskSecret(s: Column): Column =
    regexp_replace(s, "[0-9]+", "***")

  /** Deterministic content-hash bucket in [0, n): first 8 hex chars of
    * md5(salt || text) as an integer, mod n — the engine-portable
    * sampling primitive behind `TextOps.trainSplit` and
    * `Curation.domainMix` (DuckDB mirror:
    * `CAST('0x' || substr(md5(salt || text), 1, 8) AS BIGINT) % n`).
    * Distinct salts give mutually independent bucketings, which is
    * what keeps the mix sample uncorrelated with the train/val/test
    * split.
    */
  def hashBucket(text: Column, n: Int, salt: String = ""): Column = {
    val keyed = if (salt.isEmpty) text else concat(lit(salt), text)
    pmod(conv(substring(md5(keyed), 1, 8), 16, 10).cast("long"), lit(n))
  }
}
