package graft

import graft.ops.TextQueries
import graft.tables.Tables
import org.apache.spark.sql.functions.col

/** Brute-force driver-side oracles for the text-retrieval operators
  * (sf0.001) — independent recomputation in plain Scala, no SQL on either
  * side, so these catch semantic drift the DuckDB gate can't (e.g. both
  * engines agreeing on a wrong fold). */
class TextQueriesSpec extends SparkSpec {

  private lazy val corpus: Seq[(Long, Array[String])] =
    Tables(spark, sf).documents.select("doc_id", "text").collect().toSeq
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1))

  test("tfidf keywords match a driver-side recomputation (top-3, tie on term)") {
    val n = corpus.size.toDouble
    val tf: Map[(Long, String), Long] = corpus.flatMap { case (d, w) =>
      w.groupBy(identity).map { case (t, o) => (d, t) -> o.length.toLong }
    }.toMap
    val df: Map[String, Long] =
      tf.keys.groupBy(_._2).map { case (t, ks) => t -> ks.size.toLong }
    val want: Map[Long, Seq[(String, Double)]] = corpus.map { case (d, w) =>
      d -> w.distinct.toSeq
        .map(t => t -> tf((d, t)) * math.log(n / df(t)))
        .sortBy { case (t, s) => (-s, t) }.take(3)
    }.toMap
    val got = TextQueries.tfidfKeywords(spark, sf).collect()
      .groupBy(_.getLong(0))
    got.keySet shouldBe want.keySet
    got.foreach { case (d, rs) =>
      val byRank = rs.sortBy(_.getLong(1))
      byRank.map(_.getLong(1)).toSeq shouldBe (1L to byRank.length)
      byRank.map(_.getString(2)).toSeq shouldBe want(d).map(_._1)
      byRank.zip(want(d)).foreach { case (r, (_, s)) =>
        r.getDouble(3) shouldBe s +- 1e-6
      }
    }
  }

  test("bm25 matches a driver-side recomputation of the scoring formula") {
    val terms = TextQueries.Bm25Terms.toSet
    val n = corpus.size.toDouble
    val dl: Map[Long, Long] = corpus.map { case (d, w) => d -> w.length.toLong }.toMap
    val avgdl = dl.values.sum.toDouble / n
    val tf: Map[(Long, String), Long] = corpus.flatMap { case (d, w) =>
      w.filter(terms).groupBy(identity).map { case (t, o) => (d, t) -> o.length.toLong }
    }.toMap
    val df: Map[String, Long] =
      tf.keys.groupBy(_._2).map { case (t, ks) => t -> ks.size.toLong }
    val score: Map[Long, (Long, Double)] = tf.keys.groupBy(_._1).map {
      case (d, ks) =>
        val s = ks.toSeq.map(_._2).sorted.map { t =>
          val idf = math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5))
          idf * (tf((d, t)) * (TextQueries.Bm25K1 + 1.0)) /
            (tf((d, t)) + TextQueries.Bm25K1 *
              (1.0 - TextQueries.Bm25B + TextQueries.Bm25B * dl(d) / avgdl))
        }.sum
        d -> (ks.size.toLong, s)
    }
    val want = score.toSeq
      .map { case (d, (k, s)) => (d, k, BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) }
      .sortBy { case (d, _, s) => (-s, d) }.take(20)
    val got = TextQueries.bm25Search(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    got.map(_._1) shouldBe want.map(_._1)
    got.map(_._2) shouldBe want.map(_._2)
    got.zip(want).foreach { case ((_, _, g), (_, _, w)) => g shouldBe w +- 1e-6 }
  }

  test("unigram LM scores match a driver-side cross-entropy recomputation") {
    val counts = corpus.flatMap(_._2).groupBy(identity)
      .map { case (t, o) => t -> o.size.toLong }
    val n = counts.values.sum.toDouble
    val got = TextQueries.lmScore(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    got.length shouldBe corpus.size
    val byId = corpus.toMap
    got.foreach { case (d, nt, avg) =>
      val w = byId(d)
      nt shouldBe w.length.toLong
      val want = w.map(t => -math.log(counts(t) / n)).sum / w.length
      avg shouldBe want +- 1e-6
    }
  }

  test("pmi collocations match a driver-side recomputation (non-default min count)") {
    val uni = corpus.flatMap(_._2).groupBy(identity)
      .map { case (t, o) => t -> o.size.toLong }
    val nu = uni.values.sum.toDouble
    val bigrams = corpus.flatMap { case (_, w) => w.sliding(2).filter(_.length == 2) }
      .map(_.mkString(" "))
    val nb = bigrams.size.toDouble
    val want = bigrams.groupBy(identity)
      .collect { case (bg, o) if o.size >= 2 =>
        val Array(a, b) = bg.split(" ", 2)
        val pmi = math.log((o.size / nb) / ((uni(a) / nu) * (uni(b) / nu)))
        (bg, o.size.toLong,
          BigDecimal(pmi).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.toSeq.sortBy { case (bg, _, p) => (-p, bg) }.take(10)
    val got = TextQueries.pmiCollocations(spark, sf, minCount = 2, topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(4))).toSeq
    got.map(t => (t._1, t._2)) shouldBe want.map(t => (t._1, t._2))
    got.zip(want).foreach { case ((_, _, g), (_, _, w)) => g shouldBe w +- 1e-6 }
  }

  test("vocab census matches a driver-side recount per source") {
    val bySource = Tables(spark, sf).documents.select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1))).groupBy(_._1)
    val want = bySource.map { case (src, ds) =>
      val counts = ds.flatMap(_._2.split(" ", -1)).groupBy(identity)
        .map { case (_, o) => o.length.toLong }
      val nTok = counts.sum
      src -> (nTok, counts.size.toLong, counts.count(_ == 1L).toLong,
        counts.size.toDouble / nTok)
    }
    val got = TextQueries.vocabStats(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
    got.keySet shouldBe want.keySet
    want.foreach { case (src, (nTok, nTyp, nHap, ttr)) =>
      val (gTok, gTyp, gHap, gTtr) = got(src)
      (gTok, gTyp, gHap) shouldBe ((nTok, nTyp, nHap))
      gTtr shouldBe ttr +- 1e-6
      assert(gHap <= gTyp && gTyp <= gTok)
    }
  }

  test("bigram counts match a driver-side recomputation (top-50)") {
    val counts = corpus.flatMap { case (_, w) => w.sliding(2).filter(_.length == 2) }
      .map(_.mkString(" ")).groupBy(identity)
      .map { case (b, o) => b -> o.size.toLong }
    val want = counts.toSeq.sortBy { case (b, c) => (-c, b) }.take(50)
    val got = TextQueries.ngramCounts(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    got shouldBe want
  }

  test("PII scrub redacts exactly the planted email+phone, byte-identically") {
    import java.security.MessageDigest
    def h48(s: String): Long = java.lang.Long.parseLong(
      MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(12), 16)
    val texts = corpus.map { case (id, w) => id -> w.mkString(" ") }.toMap
    val got = TextQueries.piiScrub(spark, sf).collect()
    got.length shouldBe corpus.size
    got.foreach { r =>
      val text = texts(r.getLong(0))
      r.getLong(1) shouldBe 1L // one planted email, none in the fixture text
      r.getLong(2) shouldBe 1L // one planted phone
      val expected = text + " contact <EMAIL> or call <PHONE>"
      r.getLong(3) shouldBe expected.length.toLong
      r.getLong(4) shouldBe h48(expected)
    }
  }

  test("phrase search ≡ driver-side adjacent-token scan") {
    val phrase = TextQueries.PhraseTerms
    val want = Tables(spark, sf).documents
      .select(col("doc_id"), col("text")).collect()
      .map { r =>
        val toks = r.getString(1).split(' ')
        val hits = toks.indices.dropRight(1)
          .filter(i => toks(i) == phrase(0) && toks(i + 1) == phrase(1))
        r.getLong(0) -> hits
      }
      .filter(_._2.nonEmpty).toMap
    val got = TextQueries.phraseSearch(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    got.keySet shouldBe want.keySet
    want.foreach { case (doc, hits) =>
      got(doc) shouldBe ((hits.length.toLong, hits.head.toLong))
    }
  }

  test("OOV rate: vocab head covers itself; rates bounded and consistent") {
    val got = TextQueries.oovRate(spark, sf).collect()
    got.foreach { r =>
      val (n, oov, rate) =
        (r.getLong(1), r.getLong(2), r.getAs[Double]("oov_rate"))
      oov should be <= n
      rate shouldBe (oov.toDouble / n) +- 1e-6
    }
    // a vocab as large as the whole vocabulary ⇒ zero OOV everywhere
    val full = TextQueries.oovRate(spark, sf, vocabSize = 1000000).collect()
    full.foreach(_.getLong(2) shouldBe 0L)
  }
}
