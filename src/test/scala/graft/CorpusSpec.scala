package graft

import org.apache.spark.sql.functions._

import graft.operators.{Bpe, Corpus, Profile, VectorOps, Vocab}

class CorpusSpec extends SparkSpec {
  import spark.implicits._

  test("trainMerges reproduces the textbook BPE run, ties break lexicographically") {
    // Sennrich et al.'s example shape: pair counts are
    // (e,s)=9, (s,t)=9, (w,e)=8, (l,o)=7, (o,w)=7, ... — (e,s) wins the
    // 9-tie lexicographically, then (es,t)=9 dominates round 2.
    val hist = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val merges = Bpe.trainMerges(hist, nMerges = 2)
    assert(merges === Seq(("e", "s"), ("es", "t")))
  }

  test("trainMerges never emits an a == b merge and stops when nothing repeats") {
    assert(Bpe.trainMerges(Seq(("aaaa", 10L)), nMerges = 5) === Seq.empty)
    // mixed: the (a,a) pairs outnumber everything but are ineligible; the
    // merged symbol then legitimately chains right-to-left up the run
    val merges = Bpe.trainMerges(Seq(("aaab", 10L)), nMerges = 5)
    assert(merges.forall { case (a, b) => a != b })
    assert(merges === Seq(("a", "b"), ("a", "ab"), ("a", "aab")))
  }

  test("bpeTokenCount applies merges greedily per word; empties and order match split semantics") {
    val merges = Seq(("e", "s"), ("es", "t"))
    val docs = Seq(
      (1L, "newest widest low"), // n,e,w,est | w,i,d,est | l,o,w = 4+4+3
      (2L, ""), // one empty word -> 0 tokens
      (3L, "a  b"), // middle empty word counts 0: 1+0+1
      (4L, "est est") // merged to one token each
    ).toDF("doc_id", "text")
    val out = docs
      .select(col("doc_id"), graft.functions.TextFunctions.bpeTokenCount(col("text"), merges))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 11L, 2L -> 0L, 3L -> 2L, 4L -> 2L))
  }

  test("bpeTokenCount under the committed table reassembles trained words to one token") {
    // "window value column" are fully reassembled by TrainedMerges; a word
    // the table never saw falls back to near-character granularity
    val docs = Seq((1L, "window value column"), (2L, "zzz qqq")).toDF("doc_id", "text")
    val out = docs
      .select(col("doc_id"),
        graft.functions.TextFunctions.bpeTokenCount(col("text"), Bpe.Merges))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) === 3L)
    assert(out(2L) === 6L) // no merge applies to zzz/qqq (a == b never trained)
  }

  test("charContamination finds an exact excerpt cut mid-word; within-doc repeats count once") {
    val leak = "zqxjvkwpfy bmtrgdlcns hqwzxcvbnm" // 32 chars, unique alphabet
    val train = Seq(
      // leak embedded TWICE, glued mid-word both times — within-doc distinct
      // windows must count once toward the overlap
      (1L, s"alpha${leak}omega and then ${leak}tail"),
      (2L, "completely unrelated training text with nothing shared at all")
    ).toDF("doc_id", "text")
    val bench = Seq((100L, leak)).toDF("doc_id", "text")
    val out = Corpus.charContamination(
      train, bench, col("doc_id"), col("text"), l = 25, minOverlap = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.length === 1)
    val (td, bd, n, frac) = out.head
    assert((td, bd) === (1L, 100L))
    // bench has 32-25+1 = 8 windows; every one appears in train doc 1, and
    // the doubled embedding must NOT inflate the count past 8
    assert(n === 8L)
    assert(frac === 1.0)
  }

  test("r10 kernels compile under CODEGEN_ONLY (no interpreted fallback)") {
    // rolling char-window hashes, winnowed packs, and the BPE counter are
    // hot-path Expressions — a doGenCode failure would silently fall back
    // to interpreted eval in a normal run, so pin the codegen path here.
    // The text MUST be non-foldable and the source a real leaf (range, not
    // a local Seq): ConstantFolding / ConvertToLocalRelation would
    // otherwise pre-evaluate the kernels INTERPRETED at optimization time
    // and the pin would assert nothing.
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val text = concat(
        lit("the quick brown fox jumps over the lazy dog agai"), // 48 chars
        $"id".cast("string")) // + "0" -> 49 chars, non-foldable
      val out = spark.range(1)
        .select(
          size(graft.functions.TextFunctions.charWindowHashSeq(text, 10)).as("nw"),
          size(graft.functions.TextFunctions.winnowedPackSeq(text, 10, 4)).as("ns"),
          graft.functions.TextFunctions.bpeTokenCount(text, Bpe.Merges).as("nb"))
        .collect().head
      assert(out.getInt(0) === 40) // 49 chars -> 40 10-char windows
      assert(out.getInt(1) > 0 && out.getInt(1) <= 40)
      assert(out.getLong(2) >= 10L) // >= one token per whitespace word
    } finally spark.conf.unset("spark.sql.codegen.factoryMode")
  }

  test("wordHistogram cuts deterministically by (count desc, word asc)") {
    val docs = Seq((1L, "b a b c a b"), (2L, "c a")).toDF("doc_id", "text")
    val hist = Bpe.wordHistogram(docs, col("text"), maxVocab = 2)
    assert(hist === Seq(("a", 3L), ("b", 3L))) // a ties b at 3, a first; c cut
  }

  test("vocabTopK counts tf and df, cuts by (tf desc, token)") {
    val docs = Seq(
      (1L, "a b a"),
      (2L, "b c"),
      (3L, "a")
    ).toDF("doc_id", "text")
    val out = Vocab.vocabTopK(docs, col("doc_id"), col("text"), 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // tf: a=3 (df 2), b=2 (df 2), c=1 — top-2 cut keeps a and b
    assert(out === Set(("a", 3L, 2L), ("b", 2L, 2L)))
  }

  test("bigramPmi: hand-computed pmi on a toy corpus, single-token docs add nothing") {
    val docs = Seq(
      (1L, "a b"),
      (2L, "a b"),
      (3L, "c"), // no bigram
      (4L, "a")
    ).toDF("doc_id", "text")
    val out = Vocab.bigramPmi(docs, col("text"), 10).collect()
    assert(out.length === 1)
    val r = out.head
    assert((r.getString(0), r.getString(1), r.getLong(2)) === ("a", "b", 2L))
    // p(ab)=2/2, p(a)=3/6, p(b)=2/6 → pmi = ln(1 / (0.5 * 1/3)) = ln(6)
    assert(math.abs(r.getDouble(3) - math.log(6.0)) < 1e-6)
  }

  test("bigramPerplexity: MLE conditionals, exact-sum mean, no-bigram docs kept") {
    val docs = Seq(
      (1L, "a b c"),  // bigrams: (a b), (b c)
      (2L, "a b a b"), // bigrams: (a b), (b a), (a b)
      (3L, "x")        // no bigrams
    ).toDF("doc_id", "text")
    val out = Vocab.bigramPerplexity(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.size === 3)
    // counts: (a b)=3, (b c)=1, (b a)=1; continuations: a→3, b→2
    // p(b|a)=1, p(c|b)=1/2, p(a|b)=1/2
    val nllAB = BigDecimal(math.round(-math.log(1.0) * 1e9)) / 1e9
    val nllHalf = BigDecimal(math.round(-math.log(0.5) * 1e9)) / 1e9
    val d1 = ((nllAB + nllHalf) / 2).toDouble
    val d2 = ((nllAB + nllHalf + nllAB) / 3).toDouble
    assert(out(1L).getLong(1) === 2L)
    assert(math.abs(out(1L).getDouble(2) - d1) < 1e-6)
    assert(math.abs(out(1L).getDouble(3) - math.exp(d1)) < 1e-5)
    assert(out(2L).getLong(1) === 3L)
    assert(math.abs(out(2L).getDouble(2) - d2) < 1e-6)
    assert(out(3L).getLong(1) === 0L)
    assert(out(3L).isNullAt(2) && out(3L).isNullAt(3))
  }

  test("deterministicSplit assigns every doc exactly one stable label at the cut proportions") {
    val docs = (0L until 2000L).toDF("doc_id")
    val cuts = Seq("train" -> 80, "val" -> 90, "test" -> 100)
    val a = Corpus.deterministicSplit(docs, $"doc_id", "s1", cuts)
    val counts = a.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.values.sum === 2000L)
    // hash buckets are uniform: 80/10/10 within a loose tolerance
    assert(counts("train") > 1400L && counts("val") > 100L && counts("test") > 100L)
    // re-evaluation is bit-stable
    val b = Corpus.deterministicSplit(docs, $"doc_id", "s1", cuts)
    assert(a.except(b).count() === 0L && b.except(a).count() === 0L)
    // a different salt is an independent assignment (some docs move)
    val c = Corpus.deterministicSplit(docs, $"doc_id", "s2", cuts)
    assert(a.join(c, "doc_id").filter(a("split") =!= c("split")).count() > 0L)
  }

  test("weightedSample is nested: raising a rate only ever adds documents") {
    val docs = (0L until 1000L).map(i => (i, s"src${i % 4}")).toDF("doc_id", "source")
    def sample(rate: Int) = Corpus
      .weightedSample(docs, $"doc_id", $"source", "mix", Map("src0" -> rate), 250)
      .select("doc_id")
    val lo = sample(300)
    val hi = sample(700)
    assert(lo.except(hi).count() === 0L) // lo ⊆ hi
    assert(hi.count() > lo.count())
  }

  test("contamination finds planted train/bench overlap and nothing else") {
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta eta")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon something else entirely"), // 3 shared 3-grams
      (2L, "totally disjoint words nothing shared here at all")
    ).toDF("doc_id", "text")
    val out = Corpus
      .contamination(train, bench, col("doc_id"), col("text"), minOverlap = 3L)
      .collect()
    assert(out.length === 1)
    assert(out(0).getAs[Long]("train_doc") === 1L)
    assert(out(0).getAs[Long]("n_overlap") === 3L)
  }

  test("repeatedSpans merges overlapping and adjacent cross-doc shingle hits into maximal spans") {
    // docs 1 and 2 share "one two three four five six" (tokens 1-6 of each):
    // with n=3 that is four repeated shingles at positions 1-4, overlapping
    // pairwise -> ONE merged span [1, 6] in both docs. doc 3 shares nothing.
    val docs = Seq(
      (1L, "one two three four five six aaa bbb ccc"),
      (2L, "one two three four five six ddd eee fff"),
      (3L, "totally different words with no shared trigram anywhere at all")
    ).toDF("doc_id", "text")
    val out = Corpus.repeatedSpans(docs, $"doc_id", $"text", n = 3, minDocs = 2L)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("span_start"),
        r.getAs[Long]("span_end"), r.getAs[Long]("span_tokens")))
      .sortBy(x => (x._1, x._2))
    assert(out.toSeq === Seq((1L, 1L, 6L, 6L), (2L, 1L, 6L, 6L)))
  }

  test("repeatedSpans keeps genuinely separate repeats as separate spans") {
    // shared trigram at the START and at the END of doc 1 with a unique
    // middle: hits at pos 1 (end 3) and pos 7 (end 9) do not touch
    // (7 > 3 + 1) -> two islands; doc 2 carries them contiguously -> check
    // its own merge behavior independently
    val docs = Seq(
      (1L, "red green blue unique1 unique2 unique3 cyan magenta yellow"),
      (2L, "red green blue cyan magenta yellow other tokens here")
    ).toDF("doc_id", "text")
    val out = Corpus.repeatedSpans(docs, $"doc_id", $"text", n = 3, minDocs = 2L)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("span_start"),
        r.getAs[Long]("span_end"), r.getAs[Long]("span_tokens")))
      .sortBy(x => (x._1, x._2))
    // doc 1: spans [1,3] and [7,9]; doc 2: "red green blue" at 1-3 and
    // "cyan magenta yellow" at 4-6 are ADJACENT (4 = 3 + 1) -> one span [1,6]
    assert(out.toSeq === Seq(
      (1L, 1L, 3L, 3L), (1L, 7L, 9L, 3L), (2L, 1L, 6L, 6L)))
  }

  test("repeatedCharSpans catches a shared char run the token form misses") {
    // docs share the 35-char run "alpha beta gamma delta epsilon zeta"
    // (6 tokens); with n=7 the TOKEN form finds nothing, while 25-char
    // windows align on the run at its (different) char offset in each doc
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta trailing words here"),
      (2L, "leadin, alpha beta gamma delta epsilon zeta"),
      (3L, "nothing shared with the others at all in this one")
    ).toDF("doc_id", "text")
    assert(Corpus.repeatedSpans(docs, $"doc_id", $"text", n = 7, minDocs = 2L).count() === 0)
    val out = Corpus.repeatedCharSpans(docs, $"doc_id", $"text", l = 25, minDocs = 2L)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("span_start"),
        r.getAs[Long]("span_end"), r.getAs[Long]("span_chars")))
      .sortBy(_._1)
    // doc 1: run starts at char 1, doc 2: after "leadin, " (8 chars) at 9;
    // both spans cover the full 35-char repeat
    assert(out.toSeq === Seq((1L, 1L, 35L, 35L), (2L, 9L, 43L, 35L)))
  }

  test("winnowedCharSpans keeps the detection guarantee at ~2.5x fewer fingerprints") {
    // same planted 35-char run as the t25 spec: >= L + w - 1 = 28 chars,
    // so the winnowing guarantee applies regardless of each doc's offset
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta trailing words here"),
      (2L, "leadin, alpha beta gamma delta epsilon zeta"),
      (3L, "nothing shared with the others at all in this one")
    ).toDF("doc_id", "text")
    val out = Corpus.winnowedCharSpans(docs, $"doc_id", $"text", l = 25, w = 4, minDocs = 2L)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("span_start"), r.getAs[Long]("span_end")))
      .sortBy(_._1)
    // both docs report ONE span covering (most of) the shared run —
    // winnowing may clip up to w-1 = 3 chars at each edge vs t25's exact
    // [1,35] / [9,43]
    assert(out.length === 2 && out.map(_._1).toSeq === Seq(1L, 2L))
    val Seq((_, s1, e1), (_, s2, e2)) = out.toSeq
    assert(s1 >= 1L && s1 <= 4L && e1 >= 32L && e1 <= 35L, s"doc1 span [$s1,$e1]")
    assert(s2 >= 9L && s2 <= 12L && e2 >= 40L && e2 <= 43L, s"doc2 span [$s2,$e2]")

    // sampling really is sparse: selected fingerprints << positions
    import graft.functions.TextFunctions
    val counts = docs.select(
      size(TextFunctions.winnowedPackSeq($"text", 25, 4)).as("sel"),
      size(TextFunctions.charWindowHashSeq($"text", 25)).as("all")).collect()
    counts.foreach { r =>
      assert(r.getAs[Int]("sel") < r.getAs[Int]("all"),
        s"winnowed ${r.getAs[Int]("sel")} not sparser than ${r.getAs[Int]("all")}")
    }
  }

  test("redactCharSpans removes exactly the repeated char runs, chars elsewhere survive") {
    // the t25 fixture: docs 1/2 share chars [1,35] / [9,43]; removal must
    // cut exactly those ranges and keep doc 3 verbatim with a row each
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta trailing words here"),
      (2L, "leadin, alpha beta gamma delta epsilon zeta"),
      (3L, "nothing shared with the others at all in this one")
    ).toDF("doc_id", "text")
    val out = Corpus.redactCharSpans(docs, $"doc_id", $"text", l = 25, minDocs = 2L)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_chars"),
        r.getAs[Long]("n_redacted"), r.getAs[String]("redacted_text")))
      .sortBy(_._1)
    assert(out.toSeq === Seq(
      (1L, 55L, 35L, " trailing words here"),
      (2L, 43L, 35L, "leadin, "),
      (3L, 49L, 0L, "nothing shared with the others at all in this one")))
  }

  test("redactSpans drops exactly the repeated spans and keeps every doc's accounting row") {
    // same fixture as the merge test: docs 1/2 share tokens 1-6, doc 3 is
    // clean -> redaction removes tokens 1-6 from docs 1/2, keeps doc 3
    // verbatim, and STILL returns a row for every input document
    val docs = Seq(
      (1L, "one two three four five six aaa bbb ccc"),
      (2L, "one two three four five six ddd eee fff"),
      (3L, "totally different words with no shared trigram anywhere at all")
    ).toDF("doc_id", "text")
    val out = Corpus.redactSpans(docs, $"doc_id", $"text", n = 3, minDocs = 2L)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_redacted"), r.getAs[String]("redacted_text")))
      .sortBy(_._1)
    assert(out.toSeq === Seq(
      (1L, 9L, 6L, "aaa bbb ccc"),
      (2L, 9L, 6L, "ddd eee fff"),
      (3L, 10L, 0L, "totally different words with no shared trigram anywhere at all")))
  }

  test("redactSpans fully-redacted documents survive as empty rows, and re-running finds nothing") {
    // docs 1 and 2 are IDENTICAL -> the whole text is one repeated span in
    // both; redaction empties them but the accounting rows remain. The
    // redacted corpus then has no cross-doc repeats left at all (both
    // empties tokenize to [''] < n), so a second pass is a fixed point.
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"),
      (3L, "something else entirely here now")
    ).toDF("doc_id", "text")
    val first = Corpus.redactSpans(docs, $"doc_id", $"text", n = 3, minDocs = 2L)
    val rows = first.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_redacted"),
        r.getAs[String]("redacted_text")))
      .sortBy(_._1)
    assert(rows.toSeq === Seq(
      (1L, 4L, ""), (2L, 4L, ""),
      (3L, 0L, "something else entirely here now")))
    val again = Corpus.redactSpans(
      first.select($"doc_id", $"redacted_text".as("text")),
      $"doc_id", $"text", n = 3, minDocs = 2L).collect()
    assert(again.forall(_.getAs[Long]("n_redacted") === 0L))
  }

  test("packSequences matches the single-window prefix sum for any bucket width") {
    val docs = (0L until 100L).map(i => (i, s"d$i", (i % 17 + 1).toInt)).toDF("doc_id", "t", "n")
    def run(w: Long) = Corpus
      .packSequences(docs, $"doc_id", $"n", seqLen = 16, bucketWidth = w)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "start_offset", "seq_id", "offset_in_seq", "n_seqs_spanned")
      .collect().toSeq
    val ref = run(1L) // bucket per doc: offsets come entirely from the bucket table
    assert(run(7L) === ref)
    assert(run(64L) === ref)
    // spot-check the packing invariants against a driver-side scan
    val ns = (0L until 100L).map(i => i % 17 + 1)
    val starts = ns.scanLeft(0L)(_ + _).init
    ref.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("start_offset") === starts(i))
      assert(r.getAs[Long]("seq_id") === starts(i) / 16)
      assert(r.getAs[Long]("offset_in_seq") === starts(i) % 16)
      val span = (starts(i) + ns(i) - 1) / 16 - starts(i) / 16 + 1
      assert(r.getAs[Long]("n_seqs_spanned") === span)
    }
  }

  test("profileColumns: per-column stats on a toy table incl nulls") {
    val df = Seq(
      (Some(1.0), Some("aa")),
      (Some(3.0), Some("b")),
      (None, Some("aa")),
      (Some(3.0), None)
    ).toDF("x", "s")
    val out = Profile.columns(df, numericCols = Seq("x"), stringCols = Seq("s"))
      .collect().map(r => r.getAs[String]("col_name") -> r).toMap
    assert(out.size === 2)
    val x = out("x")
    assert(x.getAs[Long]("n_rows") === 4L)
    assert(x.getAs[Long]("n_present") === 3L)
    assert(x.getAs[Long]("n_distinct") === 2L) // 1.0, 3.0
    assert(x.getAs[Double]("min_num") === 1.0)
    assert(x.getAs[Double]("max_num") === 3.0)
    assert(x.getAs[Double]("mean") === math.round((1.0 + 3.0 + 3.0) / 3 * 1e6) / 1e6)
    assert(x.isNullAt(x.fieldIndex("min_str")))
    assert(x.isNullAt(x.fieldIndex("avg_len")))
    val s = out("s")
    assert(s.getAs[Long]("n_present") === 3L)
    assert(s.getAs[Long]("n_distinct") === 2L) // "aa", "b"
    assert(s.getAs[String]("min_str") === "aa")
    assert(s.getAs[String]("max_str") === "b")
    assert(s.getAs[Double]("avg_len") === math.round((2 + 1 + 2) / 3.0 * 1e6) / 1e6)
    assert(s.isNullAt(s.fieldIndex("min_num")))
    assert(s.isNullAt(s.fieldIndex("mean")))
    // approx path: same shape, cardinalities within HLL tolerance on tiny sets
    val approx = Profile
      .columns(df, Seq("x"), Seq("s"), approxDistinct = true)
      .collect().map(r => r.getAs[String]("col_name") -> r.getAs[Long]("n_distinct")).toMap
    assert(approx("x") === 2L)
    assert(approx("s") === 2L)
    // misuse guards
    intercept[IllegalArgumentException](Profile.columns(df, Nil, Nil))
    intercept[IllegalArgumentException](Profile.columns(df, Seq("x"), Seq("x")))
  }

  test("quantizeInt8 bounds the per-element error by scale/2 and is exact on zeros") {
    val vecs = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = VectorOps.quantizeInt8(vecs, $"vec_id", $"embedding")
      .orderBy("vec_id").collect()
    val scale1 = out(0).getAs[Double]("scale")
    assert(math.abs(scale1 - 1.0 / 127.0) < 1e-15)
    val q1 = out(0).getSeq[Long](out(0).fieldIndex("q")).toSeq
    assert(q1 === Seq(64L, -127L, 32L, 0L))
    assert(out(0).getAs[Double]("recon_mse") <= (scale1 / 2) * (scale1 / 2) + 1e-15)
    // zero vector: guard scale=1, all-zero codes, zero error
    assert(out(1).getAs[Double]("scale") === 1.0)
    assert(out(1).getSeq[Long](out(1).fieldIndex("q")).toSeq === Seq(0L, 0L, 0L, 0L))
    assert(out(1).getAs[Double]("recon_mse") === 0.0)
  }

  test("bpeTokens agrees with bpeTokenCount and reassembles each word") {
    import graft.functions.TextFunctions
    import graft.operators.Bpe
    val docs = Seq(
      (1L, "the order can scan the window"),
      (2L, ""),                        // empty text: zero tokens
      (3L, "a  b"),                    // double space: empty word contributes none
      (4L, null.asInstanceOf[String])  // null text: null array, row drops on explode
    ).toDF("doc_id", "text")
    val both = docs.select(
      $"doc_id",
      TextFunctions.bpeTokenCount($"text", Bpe.Merges).as("n"),
      TextFunctions.bpeTokens($"text", Bpe.Merges).as("toks"))
    both.collect().foreach { r =>
      if (r.isNullAt(1)) assert(r.isNullAt(2))
      else assert(r.getSeq[String](2).size.toLong === r.getLong(1),
        s"doc ${r.getLong(0)}: token list disagrees with count kernel")
    }
    // tokens concatenated per doc reproduce the original text minus spacing:
    // merges never cross word boundaries
    val joined = both.filter($"doc_id" === 1L).head().getSeq[String](2).mkString
    assert(joined === "theordercanscanthewindow")
  }

  test("bpeTokensMarked marks exactly the word-final tokens (t14d)") {
    import graft.functions.{TextFunctions, TextKernels}
    import graft.operators.Bpe
    val docs = Seq(
      (1L, "the order can scan the window"),
      (2L, ""),                        // zero words -> zero tokens, zero markers
      (3L, "a  b"),                    // empty word between the spaces: no marker for it
      (4L, null.asInstanceOf[String])  // null text -> null array
    ).toDF("doc_id", "text")
    // one marker per NON-EMPTY word (doc 3's middle "word" is empty)
    val expectedMarkers = Map(1L -> 6, 2L -> 0, 3L -> 2)
    val out = docs.select(
      $"doc_id",
      TextFunctions.bpeTokens($"text", Bpe.Merges).as("plain"),
      TextFunctions.bpeTokensMarked($"text", Bpe.Merges).as("marked"))
    out.collect().foreach { r =>
      if (r.isNullAt(1)) assert(r.isNullAt(2))
      else {
        val plain = r.getSeq[String](1)
        val marked = r.getSeq[String](2)
        // marker is emission-only: stripping it reproduces the plain stream
        // (so counts match t14b's bpeTokenCount by construction)
        assert(marked.map(_.stripSuffix(TextKernels.EowMarker)) === plain,
          s"doc ${r.getLong(0)}: marked stream is not plain + markers")
        assert(marked.count(_.endsWith(TextKernels.EowMarker))
          === expectedMarkers(r.getLong(0)),
          s"doc ${r.getLong(0)}: marker count != non-empty word count")
      }
    }
  }

  test("bpeTokensMarked pre-escapes a literal '</w>' in input (r16, no suffix collision)") {
    import graft.functions.{TextFunctions, TextKernels}
    import graft.operators.Bpe
    // adversarial input: the marker appears VERBATIM inside words — without
    // the escape, unmarked tokens could end with '</w>' and a suffix test
    // (t14d's is_word_end, an external loader's endsWith) would misfire
    val docs = Seq(
      (1L, "abc</w> x</w>y the"),
      (2L, "</w>")
    ).toDF("doc_id", "text")
    val out = docs.select(
      $"doc_id",
      TextFunctions.bpeTokenCount($"text", Bpe.Merges).as("n"),
      TextFunctions.bpeTokensMarked($"text", Bpe.Merges).as("marked"))
    out.collect().foreach { r =>
      val marked = r.getSeq[String](2)
      val finals = marked.count(_.endsWith(TextKernels.EowMarker))
      val words = r.getLong(0) match { case 1L => 3; case 2L => 1 }
      assert(finals === words,
        s"doc ${r.getLong(0)}: suffix test found $finals word-final tokens, want $words")
      // the escape is length-preserving, so counts still match the
      // unmarked bpeTokenCount surface on this (letters-only-merges) table
      assert(marked.size.toLong === r.getLong(1))
      // input marker bytes surface as the documented escaped form
      assert(marked.mkString.contains(TextKernels.EowEscaped))
    }
  }
}
