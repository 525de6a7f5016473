package graft

import org.apache.spark.sql.functions._

import graft.operators.Corpus

/** Pathological repeat structure for the span-redaction family — the two
  * regimes a random corpus never produces:
  *
  *   - DENSE spans: shared n-grams at every third position, so the per-doc
  *     span array reaches its structural maximum (one span per n+1 tokens —
  *     the regime the collect_list span-array bound must survive, since
  *     merge cannot collapse islands separated by even one unique token);
  *   - TOTAL coverage: all docs identical / one giant repeated block, so
  *     merge must collapse everything into ONE span and redaction must
  *     empty the document exactly.
  *
  * Both granularities (token spans via [[Corpus.redactSpans]], char spans
  * via [[Corpus.redactCharSpans]]) — they splice through separate
  * higher-order aggregates.
  */
class AdversarialCorpusSpec extends SparkSpec {
  import spark.implicits._

  test("dense worst case: span array hits one span per n+1 tokens and splices exactly") {
    // every doc: (A B u_{d,k}) repeated — "A B" shared by ALL docs, u unique
    // per doc per position, so islands can never merge across the gap
    val m = 666 // spans per doc; len = 3m tokens
    def doc(d: Int): String =
      (0 until m).flatMap(k => Seq("A", "B", s"u${d}_$k")).mkString(" ")
    val docs = (1 to 6).map(i => (i.toLong, doc(i))).toDF("doc_id", "text")

    val spans = Corpus.repeatedSpans(docs, $"doc_id", $"text", n = 2, minDocs = 2L)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("span_start"), r.getAs[Long]("span_end")))
    val perDoc = spans.groupBy(_._1)
    assert(perDoc.keySet === (1L to 6L).toSet)
    perDoc.foreach { case (id, ss) =>
      assert(ss.length === m, s"doc $id: expected $m dense spans, got ${ss.length}")
      ss.sortBy(_._2).zipWithIndex.foreach { case ((_, s, e), k) =>
        assert(s === 3L * k + 1 && e === 3L * k + 2)
      }
    }

    val red = Corpus.redactSpans(docs, $"doc_id", $"text", n = 2, minDocs = 2L)
      .collect()
    assert(red.length === 6)
    red.foreach { r =>
      val d = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("n_tokens") === 3L * m)
      assert(r.getAs[Long]("n_redacted") === 2L * m)
      val expect = (0 until m).map(k => s"u${d}_$k").mkString(" ")
      assert(r.getAs[String]("redacted_text") === expect, s"doc $d splice drift")
    }
  }

  test("all-identical docs collapse to ONE full-coverage span and redact to empty") {
    val text = (0 until 300).map(i => s"t${i % 7}").mkString(" ")
    val docs = (1 to 20).map(i => (i.toLong, text)).toDF("doc_id", "text")

    val spans = Corpus.repeatedSpans(docs, $"doc_id", $"text", n = 4, minDocs = 2L)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("span_start"), r.getAs[Long]("span_end")))
    assert(spans.length === 20, "exactly one merged span per doc")
    spans.foreach { case (_, s, e) => assert(s === 1L && e === 300L) }

    val red = Corpus.redactSpans(docs, $"doc_id", $"text", n = 4, minDocs = 2L).collect()
    assert(red.length === 20)
    red.foreach { r =>
      assert(r.getAs[Long]("n_redacted") === 300L)
      assert(r.getAs[String]("redacted_text") === "")
    }
  }

  test("one giant repeated block (a single n-gram repeated) merges to one span") {
    // doc 1 IS one repeated token; doc 2 carries the same bigram so the
    // shingle clears minDocs — every position of doc 1 is covered
    val docs = Seq(
      (1L, Seq.fill(1200)("x").mkString(" ")),
      (2L, "x x x x")).toDF("doc_id", "text")
    val spans = Corpus.repeatedSpans(docs, $"doc_id", $"text", n = 2, minDocs = 2L)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("span_start"), r.getAs[Long]("span_end")))
    val d1 = spans.filter(_._1 == 1L)
    assert(d1.length === 1, s"expected one merged span, got ${d1.mkString(",")}")
    assert(d1.head._2 === 1L && d1.head._3 === 1200L)
    val red = Corpus.redactSpans(docs, $"doc_id", $"text", n = 2, minDocs = 2L)
      .filter(_.getAs[Long]("doc_id") == 1L).head()
    assert(red.getAs[Long]("n_redacted") === 1200L)
    assert(red.getAs[String]("redacted_text") === "")
  }

  test("char granularity: dense windows splice exactly; identical docs redact to empty") {
    // (QRST u_{d,k}) repeated: only the aligned 4-char windows repeat across
    // docs (windows straddling a unique char are unique), gap 1 char — the
    // char twin of the dense token case. Unique chars from the CJK block so
    // each is one codepoint and never collides across docs.
    val m = 200
    def doc(d: Int): String =
      (0 until m).map(k => "QRST" + (0x4E00 + d * 1000 + k).toChar).mkString
    val docs = (1 to 4).map(i => (i.toLong, doc(i))).toDF("doc_id", "text")

    val spans = Corpus.repeatedCharSpans(docs, $"doc_id", $"text", l = 4, minDocs = 2L)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("span_start"), r.getAs[Long]("span_end")))
    val perDoc = spans.groupBy(_._1)
    perDoc.foreach { case (id, ss) =>
      assert(ss.length === m, s"doc $id: expected $m dense char spans, got ${ss.length}")
      ss.sortBy(_._2).zipWithIndex.foreach { case ((_, s, e), k) =>
        assert(s === 5L * k + 1 && e === 5L * k + 4)
      }
    }
    val red = Corpus.redactCharSpans(docs, $"doc_id", $"text", l = 4, minDocs = 2L)
      .collect()
    assert(red.length === 4)
    red.foreach { r =>
      val d = r.getAs[Long]("doc_id")
      val expect = (0 until m).map(k => (0x4E00 + d.toInt * 1000 + k).toChar).mkString
      assert(r.getAs[String]("redacted_text") === expect, s"doc $d char splice drift")
    }

    val same = (1 to 8).map(i => (i.toLong, "abcdefgh" * 64)).toDF("doc_id", "text")
    val sameRed = Corpus.redactCharSpans(same, $"doc_id", $"text", l = 8, minDocs = 2L)
      .collect()
    assert(sameRed.length === 8)
    sameRed.foreach(r => assert(r.getAs[String]("redacted_text") === ""))
  }
}
