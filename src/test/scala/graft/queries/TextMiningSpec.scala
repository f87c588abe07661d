package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Semantic checks for the text-mining operators (TF-IDF keywords, PMI
  * collocations) beyond the cross-engine oracle: each test recomputes
  * the ground truth with a plain in-memory brute force (no Spark, no
  * SQL) and compares the operator's full output against it.
  */
class TextMiningSpec extends SparkSuite {

  private lazy val corpus: Map[Long, Array[String]] =
    graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ")).toMap

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("c4_tfidf matches an in-memory brute force") {
    val got = TextOps.c4Tfidf(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(got.nonEmpty)
    val nDocs = corpus.size.toLong
    val df = corpus.values.flatMap(_.distinct).groupBy(identity)
      .map { case (t, xs) => t -> xs.size.toLong }
    val want = corpus.toSeq.flatMap { case (id, toks) =>
      val nTok = toks.length.toLong
      val tf = toks.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
      tf.toSeq
        .map { case (t, c) =>
          (t, c, df(t), round6(c.toDouble * nDocs / (df(t) * nTok).toDouble))
        }
        .sortBy { case (t, _, _, s) => (-s, t) }
        .take(5).zipWithIndex
        .map { case ((t, c, d, s), i) => (id, i + 1, t, c, d, s) }
    }.sortBy(r => (r._1, r._2))
    assert(got.toSeq == want)
  }

  test("c4_vocab_growth matches an in-memory brute force") {
    val got = TextOps.c4VocabGrowth(spark, sf).collect()
      .map(r => ((r.getString(0), r.getLong(1)), (r.getLong(2), r.getLong(3))))
    assert(got.nonEmpty)
    val maxId = corpus.keys.max
    def firstDocs(terms: Map[Long, Seq[String]]): Map[String, Long] =
      terms.toSeq.flatMap { case (id, ts) => ts.map(_ -> id) }
        .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).min }
    val uni = firstDocs(corpus.view.mapValues(_.toSeq).toMap)
    val bi = firstDocs(corpus.view.mapValues(ts =>
      ts.toSeq.sliding(2).collect { case Seq(a, b) => s"$a $b" }.toSeq).toMap)
    def growth(gram: String, first: Map[String, Long]) = {
      val byBucket = first.values
        .groupBy(f => math.min(9L, f * 10 / (maxId + 1)))
        .view.mapValues(_.size.toLong).toSeq.sortBy(_._1)
      byBucket.scanLeft((("", 0L), (0L, 0L))) { case ((_, (_, cum)), (b, n)) =>
        ((gram, b), (n, cum + n))
      }.drop(1)
    }
    val want = growth("bi", bi) ++ growth("uni", uni)
    assert(got.toSeq == want.toSeq)
    // the curve is a proper cumsum ending at the full vocabulary size
    assert(got.filter(_._1._1 == "uni").map(_._2._2).max == uni.size.toLong)
    assert(got.filter(_._1._1 == "bi").map(_._2._2).max == bi.size.toLong)
  }

  test("c4_zipf matches an in-memory brute force") {
    val got = TextOps.c4Zipf(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(got.nonEmpty && got.length <= 50)
    val freq = corpus.values.flatten.groupBy(identity)
      .map { case (t, xs) => t -> xs.size.toLong }
    val nTotal = freq.values.sum
    val top = freq.toSeq.sortBy { case (t, f) => (-f, t) }.take(50)
    val f1 = top.head._2
    val want = top.zipWithIndex
      .scanLeft(((0, "", 0L, 0.0, 0.0), 0L)) { case ((_, cum), ((t, f), i)) =>
        val c = cum + f
        ((i + 1, t, f, round6((f * (i + 1)).toDouble / f1),
          round6(c.toDouble / nTotal)), c)
      }.drop(1).map(_._1)
    assert(got.toSeq == want)
    // rank 1 normalizes to exactly 1; coverage is monotone and <= 1
    assert(got.head._4 == 1.0)
    assert(got.map(_._5).sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
    assert(got.last._5 <= 1.0)
  }

  test("c4_pmi matches an in-memory brute force") {
    val got = TextOps.c4Pmi(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6)))
    assert(got.nonEmpty)
    val pairs = corpus.values.toSeq.flatMap { toks =>
      for {
        off <- 1 to 3
        i <- 0 until math.max(toks.length - off, 0)
      } yield {
        val (a, b) = (toks(i), toks(i + off))
        if (a <= b) (a, b) else (b, a)
      }
    }
    val cab = pairs.groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
    val uni = corpus.values.flatten.groupBy(identity)
      .map { case (t, xs) => t -> xs.size.toLong }
    val n = uni.values.sum
    val p = cab.values.sum
    val want = cab.toSeq
      .filter(_._2 >= 5)
      .map { case ((w1, w2), c) =>
        // mirror the engine/oracle association order exactly
        val lift = round6(c.toDouble * n * n / (p.toDouble * uni(w1) * uni(w2)))
        (w1, w2, c, uni(w1), uni(w2), lift)
      }
      .sortBy { case (w1, w2, _, _, _, l) => (-l, w1, w2) }
      .take(50).zipWithIndex
      .map { case ((w1, w2, c, c1, c2, l), i) => (i + 1, w1, w2, c, c1, c2, l) }
    assert(got.toSeq == want)
  }

  test("c4_bpe_merges matches an in-memory reference BPE") {
    // Plain-Scala Sennrich BPE: word-freq table, then 10 rounds of
    // (count adjacent pairs weighted by freq, argmax with (count desc,
    // lhs, rhs) ties, greedy left-to-right non-overlapping merge).
    val got = TextOps.c4BpeMerges(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3),
        r.getLong(4)))
    assert(got.length == 10)
    var vocab: Map[Vector[String], Long] = corpus.values
      .flatten.filter(_.nonEmpty).toSeq
      .groupBy(identity).map { case (w, xs) =>
        (w.map(_.toString).toVector :+ "</w>") -> xs.size.toLong
      }
    val want = (1 to 10).map { k =>
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      for ((syms, f) <- vocab; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) =
          counts.getOrElse((syms(i), syms(i + 1)), 0L) + f
      val ((a, b), cnt) = counts.toSeq
        .sortBy { case ((l, r), c) => (-c, l, r) }.head
      vocab = vocab.groupBy { case (syms, _) =>
        // greedy left-to-right merge
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += syms(i); i += 1 }
        }
        out.result()
      }.map { case (merged, entries) => merged -> entries.values.sum }
      (k, a, b, a + b, cnt)
    }
    assert(got.toSeq == want)
  }

  test("c4_chunk matches an in-memory sliding window and covers every token") {
    val got = TextOps.c4Chunk(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))
    assert(got.nonEmpty)
    val (window, stride) = (64, 48)
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String): String =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val want = corpus.toSeq.sortBy(_._1).flatMap { case (id, toks) =>
      if (toks.isEmpty) Seq.empty
      else {
        val n = toks.length
        val lastK = math.max(0, (math.max(n - window, 0) + stride - 1) / stride)
        (0 to lastK).map { k =>
          val chunk = toks.slice(k * stride, math.min(k * stride + window, n))
          (id, k + 1, k * stride + 1, chunk.length, md5hex(chunk.mkString(" ")))
        }
      }
    }
    assert(got.toSeq == want)
    // coverage: consecutive chunks overlap or touch, and the final chunk
    // reaches the document end — no token escapes every window
    corpus.foreach { case (id, toks) =>
      if (toks.nonEmpty) {
        val ch = want.filter(_._1 == id)
        assert(ch.head._3 == 1)
        ch.sliding(2).foreach {
          case Seq(a, b) => assert(b._3 <= a._3 + a._4, s"gap in doc $id")
          case _ => ()
        }
        assert(ch.last._3 + ch.last._4 - 1 == toks.length)
      }
    }
  }

  test("c4_bpe_encode matches an in-memory apply of the learned merges") {
    // Re-learn the merge table with the same plain-Scala BPE, apply it
    // word-by-word, and price every document.
    val words = corpus.values.flatten.filter(_.nonEmpty).toSeq
    var wordSyms: Map[String, Vector[String]] = words.distinct
      .map(w => w -> (w.map(_.toString).toVector :+ "</w>")).toMap
    val freqs = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (_ <- 1 to 10) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      for ((w, syms) <- wordSyms; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) =
          counts.getOrElse((syms(i), syms(i + 1)), 0L) + freqs(w)
      val ((a, b), _) = counts.toSeq
        .sortBy { case ((l, r), c) => (-c, l, r) }.head
      wordSyms = wordSyms.view.mapValues { syms =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += syms(i); i += 1 }
        }
        out.result()
      }.toMap
    }
    val want = corpus.toSeq.map { case (id, toks) =>
      val ws = toks.filter(_.nonEmpty)
      val bpe = ws.map(w => wordSyms(w).length.toLong).sum
      val ratio =
        if (ws.isEmpty) null
        else BigDecimal(bpe.toDouble / ws.length)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (id, ws.length.toLong, bpe, ratio)
    }.sortBy(_._1)
    val got = TextOps.c4BpeEncode(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getDouble(3)))
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) => assert(g == w, s"got $g want $w") }
  }
}
