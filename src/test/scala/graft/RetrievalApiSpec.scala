package graft

import org.apache.spark.sql.functions._
import graft.ops.{TextQueries, VectorQueries}
import graft.tables.Tables

/** The retrieval operators are a LIBRARY API — query terms, probe vector,
  * k, nprobe are arguments, and the registry closures merely pin the
  * oracle-checked defaults. These specs run each entry point at NON-default
  * arguments against a driver-side recomputation, so the parameters are
  * known-live (not accidentally shadowed by a baked-in constant). */
class RetrievalApiSpec extends SparkSpec {

  private lazy val vecs: Map[Long, Array[Double]] =
    Tables(spark, sf).embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().toSeq
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap

  private def cosine(a: Array[Double], b: Array[Double]): Double = {
    def dot(x: Array[Double], y: Array[Double]) =
      x.zip(y).foldLeft(0.0) { case (acc, (u, v)) => acc + u * v }
    dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
  }

  private def r6(d: Double): Double =
    BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private lazy val corpus: Seq[(Long, Array[String])] =
    Tables(spark, sf).documents.select("doc_id", "text").collect().toSeq
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1))

  test("similarVectors honors probeId and k") {
    val p = vecs(7L)
    val want = vecs.toSeq.filter(_._1 != 7L)
      .map { case (id, v) => (id, r6(cosine(p, v))) }
      .sortBy { case (id, c) => (-c, id) }.take(5)
    val got = VectorQueries.similarVectors(spark, sf, probeId = 7L, k = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    got shouldBe want
  }

  test("annLsh honors probeId and k: exact sims, probe excluded, k-capped") {
    val p = vecs(3L)
    val got = VectorQueries.annLsh(spark, sf, probeId = 3L, k = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    got.length should be <= 4
    got.map(_._1) should not contain 3L
    got.foreach { case (id, c) => c shouldBe r6(cosine(p, vecs(id))) }
    got.map(_._2) shouldBe got.map(_._2).sorted.reverse
  }

  test("ivfSearch honors probeId, k, and nprobe") {
    val cents = (0L until 10L).map(id => id -> vecs(id)).toMap
    def assign(v: Array[Double]): Long =
      cents.toSeq.map { case (c, cv) => (c, cosine(v, cv)) }
        .sortBy { case (c, d) => (-d, c) }.head._1
    val probe = vecs(7L)
    val probed = cents.toSeq.map { case (c, cv) => (c, cosine(cv, probe)) }
      .sortBy { case (c, d) => (-d, c) }.take(2).map(_._1).toSet
    val want = vecs.toSeq
      .filter { case (id, v) => id != 7L && probed(assign(v)) }
      .map { case (id, v) => (id, r6(cosine(v, probe))) }
      .sortBy { case (id, c) => (-c, id) }.take(5)
    val got = VectorQueries.ivfSearch(spark, sf, probeId = 7L, k = 5, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    got shouldBe want
  }

  test("bm25Search honors the query terms and k") {
    val terms = Seq("the", "of")
    val termSet = terms.toSet
    val n = corpus.size.toDouble
    val dl: Map[Long, Long] = corpus.map { case (d, w) => d -> w.length.toLong }.toMap
    val avgdl = dl.values.sum.toDouble / n
    val tf: Map[(Long, String), Long] = corpus.flatMap { case (d, w) =>
      w.filter(termSet).groupBy(identity).map { case (t, o) => (d, t) -> o.length.toLong }
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
      .map { case (d, (k, s)) => (d, k, r6(s)) }
      .sortBy { case (d, _, s) => (-s, d) }.take(7)
    want should not be empty // the non-default terms actually hit the corpus
    val got = TextQueries.bm25Search(spark, sf, terms, k = 7).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    got.map(_._1) shouldBe want.map(_._1)
    got.map(_._2) shouldBe want.map(_._2)
    got.zip(want).foreach { case ((_, _, g), (_, _, w)) => g shouldBe w +- 1e-6 }
  }

  test("tfidfKeywords honors topK") {
    val got = TextQueries.tfidfKeywords(spark, sf, topK = 1).collect()
    got.map(_.getLong(0)).distinct.length shouldBe got.length // one row per doc
    got.foreach(_.getLong(1) shouldBe 1L)
    // the topK=1 rows are exactly the rank-1 slice of the default run
    val top1OfDefault = TextQueries.tfidfKeywords(spark, sf)
      .filter(col("rk") === 1L).collect()
      .map(r => (r.getLong(0), r.getString(2))).toSet
    got.map(r => (r.getLong(0), r.getString(2))).toSet shouldBe top1OfDefault
  }

  test("ngramCounts honors n and topK (trigrams)") {
    val counts = corpus.flatMap { case (_, w) => w.sliding(3).filter(_.length == 3) }
      .map(_.mkString(" ")).groupBy(identity)
      .map { case (b, o) => b -> o.size.toLong }
    val want = counts.toSeq.sortBy { case (b, c) => (-c, b) }.take(10)
    val got = TextQueries.ngramCounts(spark, sf, n = 3, topK = 10).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    got shouldBe want
  }
}
