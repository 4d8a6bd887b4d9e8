package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, shingling, fingerprinting, language-ID heuristics and
  * quality metrics. All are built from codegen'd Catalyst functions
  * (no UDFs) so they stay inside whole-stage codegen, and all are
  * reproducible in ANSI SQL for the DuckDB oracle (md5-based hashing,
  * exact integer arithmetic).
  */
object TextFunctions {

  /** Whitespace tokenization. The corpus guarantees single-space
    * separation (verified: no double spaces/tabs in testdata), so a
    * plain split matches `string_split(text,' ')` in the oracle. */
  def tokens(c: Column): Column = split(c, " ")

  def tokenCount(c: Column): Column = size(tokens(c))

  /** Canonical form for fingerprinting: lower, collapse whitespace. */
  def normText(c: Column): Column =
    trim(lower(regexp_replace(c, "\\s+", " ")))

  /** Deterministic document fingerprint (md5 of normalized text) —
    * the exact-dedup key. */
  def fingerprint(c: Column): Column = md5(normText(c).cast("binary"))

  /** Unicode NFC normalization (native codegen'd expression
    * [[graft.expressions.NfcNormalize]] over the JDK normalizer —
    * Spark has no builtin): canonical composition, the first
    * transform a multi-crawler corpus needs before fingerprints /
    * tokenizers / regexes see the text. Zero-allocation on
    * already-normalized input. */
  def nfc(c: Column): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(graft.expressions.NfcNormalize(Bridge.expression(c)))
  }

  /** Seeded 60-bit hash: first 15 hex chars of md5("<seed>|<input>")
    * as a non-negative long. Chosen over xxhash64 because DuckDB can
    * reproduce it bit-for-bit (`CAST('0x'||substr(md5(..),1,15) AS
    * BIGINT)`), making MinHash/SimHash oracle-checkable. */
  def hash60(c: Column, seed: Int): Column = {
    import org.apache.spark.sql.graft.Bridge
    // native fused md5-prefix expression (graft.expressions.Md5Prefix60):
    // bit-identical to conv(substring(md5(...),1,15),16,10) but with no
    // hex-string allocation / base-16 parse per value
    Bridge.column(graft.expressions.Md5Prefix60(
      Bridge.expression(concat_ws("|", lit(seed.toString), c))))
  }

  /** MinHash permutation family: one md5 base hash per shingle, then k
    * cheap LCG permutations mh_i = (a_i·h + b_i) mod P over the 31-bit
    * reduction h = base mod P (P = 2³¹−1, Mersenne). a_i·h < 2⁶² so the
    * arithmetic is exact in int64 on both Spark and the DuckDB oracle.
    * Versus seeding md5 k times this cuts md5 calls k-fold — md5 is the
    * dominant cost of signature building at scale. */
  val MINHASH_P: Long = 2147483647L
  def minhashA(i: Int): Long = ((2654435761L * (i + 1)) % (MINHASH_P - 1)) + 1
  def minhashB(i: Int): Long = (40503L * (i + 7919)) % MINHASH_P

  /** h31: 31-bit base hash of a shingle (one md5). */
  def hash31(c: Column): Column = hash60(c, 0) % MINHASH_P

  /** i-th permuted minhash value from the h31 base column. */
  def minhashPerm(h31: Column, i: Int): Column =
    (h31 * minhashA(i) + minhashB(i)) % MINHASH_P

  /** Word n-gram shingles from a token array; empty array when the
    * document is shorter than n. Baseline builtin formulation — only
    * runs interpreted (higher-order fns are CodegenFallback) and
    * re-evaluates the token array per position; [[shinglesOf]] is the
    * equivalent native single-pass used by the operators. */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** Native one-pass word n-gram shingles DIRECTLY from the text
    * column — bit-identical to `shingles(tokens(text), n)` (see
    * [[graft.expressions.WordShingles]]), codegen-friendly, and O(text
    * + grams) instead of the interpreted O(tokens²) chain. */
  def shinglesOf(text: Column, n: Int): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(graft.expressions.WordShingles(Bridge.expression(text), n))
  }

  /** Tiny per-language stopword lexicons for the n-gram/stopword
    * language-ID heuristic. Deterministic and oracle-reproducible;
    * a production lexicon would be larger but identical in shape. */
  val lexicons: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit"),
    "en" -> Seq("the", "and", "is", "of", "to", "a", "in"),
    "es" -> Seq("el", "la", "los", "de", "que", "y", "en"),
    "fr" -> Seq("le", "la", "les", "et", "est", "de", "un"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "不"))

  /** Count of tokens present in a lexicon (with multiplicity). */
  def stopwordHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(w => w: Any): _*)))

  /** Language-ID: argmax of per-language stopword hits, alphabetical
    * tie-break, 'und' (undetermined) when no lexicon matches. */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val scores = lexicons.map { case (lang, ws) => lang -> stopwordHits(toks, ws) }
    val m = greatest(scores.map(_._2): _*)
    scores.foldRight(lit("und")) { case ((lang, s), tail) =>
      when(s === m && m > 0, lit(lang)).otherwise(tail)
    }
  }
}
