package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives for the large-scale training-data pipeline operators
  * (dedup, language/quality heuristics). Everything here is a per-row
  * expression — no shuffle, fully codegen-friendly, and deterministic across
  * engines (hashes derive from md5 hex, not engine-specific hash functions,
  * so DuckDB oracles can reproduce them bit-for-bit).
  */
object TextFunctions {

  /** 32-bit integer hash from the md5 hex prefix — engine-portable. */
  def md5PrefixHash(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct word n-gram shingles ("w1 w2 w3"). Empty when fewer than n
    * tokens (guarded: Spark's `sequence(1,0)` would count DOWN).
    */
  def shingles(text: Column, n: Int = 3): Column = {
    val tk = tokens(text)
    val make = transform(
      sequence(lit(1), size(tk) - lit(n - 1)),
      i => concat_ws(" ", (0 until n).map(o => element_at(tk, i + o)): _*))
    when(size(tk) < n, array().cast("array<string>"))
      .otherwise(array_distinct(make))
  }

  /** MinHash parameters: k permutations of h -> (a*h + b) mod p over the
    * Mersenne prime 2^31-1. Constants are fixed literals so the DuckDB oracle
    * can inline the identical family.
    */
  val MinhashP: Long = 2147483647L
  def minhashParams(k: Int): Seq[(Long, Long)] =
    (0 until k).map(j => (40503L * (j + 7) + 1L, 9176L * (j + 3) + 7L))

  /** One minhash signature value: min over shingles of (a*(h mod p)+b) mod p.
    * Per-row array fold — the signature of a 100 TB corpus needs zero
    * shuffles.
    */
  def minhashSig(shingleArr: Column, a: Long, b: Long): Column =
    array_min(transform(
      shingleArr,
      s => (lit(a) * (md5PrefixHash(s) % MinhashP) + lit(b)) % MinhashP))

  /** 32-bit SimHash over distinct tokens: bit j is set when the sum of
    * ±1 votes from each token's hash bit j is positive.
    */
  def simhash32(text: Column): Column = {
    val hs = transform(array_distinct(tokens(text)), t => md5PrefixHash(t))
    (0 until 32)
      .map { j =>
        val votes = aggregate(
          hs,
          lit(0L),
          (acc, h) =>
            acc + when(shiftright(h, j).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L))
        when(votes > 0, lit(1L << j)).otherwise(lit(0L))
      }
      .reduce(_ + _)
  }

  /** Stopword-membership count used by the quality/language heuristics. */
  def stopwordCount(tk: Column, stopwords: Seq[String]): Column =
    size(filter(tk, t => stopwords.map(w => t === w).reduce(_ || _)))
}
