package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives for the large-scale training-data pipeline operators
  * (scale EXTENSION per BASELINE.json's north star — no reference
  * counterpart)
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

  /** JVM-side md5 prefix hash — bit-identical to [[md5PrefixHash]]: the
    * first 4 digest bytes read as an unsigned big-endian int (= parsing the
    * first 8 hex chars).
    */
  private def md5Prefix(s: String, md: java.security.MessageDigest): Long = {
    md.reset()
    val d = md.digest(s.getBytes("UTF-8"))
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  private def shingleSeq(text: String, n: Int): IndexedSeq[String] = {
    val tk = text.split(' ')
    if (tk.length < n) Vector.empty
    else {
      val seen = scala.collection.mutable.LinkedHashSet.empty[String]
      var i = 0
      while (i <= tk.length - n) {
        seen += tk.slice(i, i + n).mkString(" ")
        i += 1
      }
      seen.toVector
    }
  }

  /** Distinct word n-gram shingles ("w1 w2 w3"). A row-level Scala kernel:
    * the equivalent `transform(sequence(...), concat_ws(element_at...))`
    * builtin runs interpreted per ELEMENT in Spark (profiled ~3.4 s for 1.5M
    * shingles vs ~0.3 s here); one deterministic scalar UDF call per row is
    * the faster shape until this becomes a codegen Expression.
    */
  def shingles(text: Column, n: Int = 3): Column = {
    val f = udf((t: String) => if (t == null) Seq.empty[String] else shingleSeq(t, n))
    f(text)
  }

  /** Distinct character n-grams (the char-level dedup granularity — catches
    * near-dups that word tokenization misses, e.g. punctuation/spacing
    * variants). Same row-level-kernel rationale as [[shingles]].
    */
  def charShingles(text: Column, n: Int = 5): Column = {
    val f = udf { (t: String) =>
      if (t == null || t.length < n) Seq.empty[String]
      else {
        val seen = scala.collection.mutable.LinkedHashSet.empty[String]
        var i = 0
        while (i <= t.length - n) { seen += t.substring(i, i + n); i += 1 }
        seen.toVector
      }
    }
    f(text)
  }

  /** Shingle hashes (md5-prefix mod p) directly — skips materializing the
    * shingle strings as a column when only the hashes are needed.
    */
  def shingleHashes(text: Column, n: Int = 3): Column = {
    val f = udf { (t: String) =>
      if (t == null) Seq.empty[Long]
      else {
        val md = java.security.MessageDigest.getInstance("MD5")
        shingleSeq(t, n).map(s => md5Prefix(s, md) % MinhashP)
      }
    }
    f(text)
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
    * ±1 votes from each token's hash bit j is positive. Row-level kernel for
    * the same reason as [[shingles]] (32 interpreted `aggregate` passes
    * profiled ~4.5 s at sf0.1 vs ~0.3 s here).
    */
  def simhash32(text: Column): Column = {
    val f = udf { (t: String) =>
      if (t == null) 0L
      else {
        val md = java.security.MessageDigest.getInstance("MD5")
        val votes = new Array[Int](32)
        val seen = scala.collection.mutable.HashSet.empty[String]
        t.split(' ').foreach { tok =>
          if (seen.add(tok)) {
            val h = md5Prefix(tok, md)
            var j = 0
            while (j < 32) {
              if (((h >> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
              j += 1
            }
          }
        }
        (0 until 32).map(j => if (votes(j) > 0) 1L << j else 0L).sum
      }
    }
    f(text)
  }

  /** Stopword-membership count used by the quality/language heuristics. */
  def stopwordCount(tk: Column, stopwords: Seq[String]): Column =
    size(filter(tk, t => stopwords.map(w => t === w).reduce(_ || _)))
}
