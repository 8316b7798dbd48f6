package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Equivalence pins for the round-19 codegen pair kernels: `graft_pairs`
  * and `graft_lane_agree` must match — element for element, in order — the
  * higher-order-function spellings they replaced in coPurchase, the MinHash
  * candidate generator, the LSH band sweep, and the curation near-dup
  * stage. Inputs cover duplicates, nulls (array, element, key field),
  * empties, and unequal signature lengths. */
class PairsExpandSpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(0xBEEF + i)))

  private val hofLong =
    """flatten(transform(xs, a ->
      |  transform(filter(xs, b -> b > a),
      |    b -> named_struct('a', a, 'b', b))))""".stripMargin

  test("graft_pairs ≡ nested transform/filter HOF on array<bigint>") {
    val elem = Gen.frequency(
      (9, Gen.chooseNum(0L, 12L).map(Option(_))), // small range → duplicates
      (1, Gen.const(Option.empty[Long])))
    val arr = Gen.frequency(
      (8, Gen.chooseNum(0, 9).flatMap(n => Gen.listOfN(n, elem))),
      (1, Gen.const(List.empty[Option[Long]])))
    val cases = samples(arr, 150).zipWithIndex
      .map { case (xs, i) =>
        (i.toLong, xs.map(_.map(java.lang.Long.valueOf).orNull)) }
    val df = spark.createDataFrame(cases).toDF("case_id", "xs")
    val rows = df.select(col("case_id"),
      expr("graft_pairs(xs)").as("native"), expr(hofLong).as("ref")).collect()
    rows should have length 150
    rows.foreach { r =>
      assert(r.getSeq[Any](1) == r.getSeq[Any](2),
        s"case ${r.getLong(0)}: native=${r.getSeq[Any](1)} ref=${r.getSeq[Any](2)}")
    }
  }

  test("graft_pairs on a NULL array is NULL, like the HOF") {
    val df = spark.sql("select cast(null as array<bigint>) as xs")
    val r = df.select(expr("graft_pairs(xs)"), expr(hofLong)).collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("graft_pairs ≡ HOF on array<struct<doc_id,sig>> (first-field key)") {
    // The dedup/curation shape: elements are (doc_id, sig) structs compared
    // on doc_id; emitted pairs carry the full structs. The reference HOF
    // extracts fields, so compare the projected quads.
    val lane = Gen.oneOf("aa", "bb", "cc")
    val docId = Gen.frequency(
      (9, Gen.chooseNum(0L, 9L).map(Option(_))), (1, Gen.const(Option.empty[Long])))
    val entry = for { d <- docId; s <- Gen.listOfN(4, lane) } yield (d, s)
    val arr = Gen.chooseNum(0, 7).flatMap(n => Gen.listOfN(n, entry))
    val cases = samples(arr, 120).zipWithIndex.map { case (xs, i) =>
      (i.toLong, xs.map { case (d, s) =>
        (d.map(java.lang.Long.valueOf).orNull, s) })
    }
    val df = spark.createDataFrame(cases).toDF("case_id", "xs")
      .selectExpr("case_id",
        "transform(xs, e -> named_struct('doc_id', e._1, 'sig', e._2)) as xs")
    val hof =
      """flatten(transform(xs, a ->
        |  transform(filter(xs, b -> b.doc_id > a.doc_id),
        |    b -> named_struct('da', a.doc_id, 'db', b.doc_id,
        |                      'sa', a.sig, 'sb', b.sig))))""".stripMargin
    val native =
      """transform(graft_pairs(xs), p ->
        |  named_struct('da', p.a.doc_id, 'db', p.b.doc_id,
        |               'sa', p.a.sig, 'sb', p.b.sig))""".stripMargin
    val rows = df.select(col("case_id"),
      expr(native).as("native"), expr(hof).as("ref")).collect()
    rows should have length 120
    rows.foreach { r =>
      assert(r.getSeq[Any](1) == r.getSeq[Any](2),
        s"case ${r.getLong(0)}: native=${r.getSeq[Any](1)} ref=${r.getSeq[Any](2)}")
    }
  }

  test("graft_lane_agree ≡ size(filter(zip_with(a, b, eq), id))") {
    val lane = Gen.frequency(
      (8, Gen.oneOf("0a1b2c3d", "ffffffff", "00000000", "").map(Option(_))),
      (2, Gen.const(Option.empty[String])))
    val sig = Gen.chooseNum(0, 20).flatMap(n => Gen.listOfN(n, lane))
    val cases = samples(Gen.zip(sig, sig), 150).zipWithIndex.map {
      case ((a, b), i) => (i.toLong, a.map(_.orNull), b.map(_.orNull)) }
    val df = spark.createDataFrame(cases).toDF("case_id", "a", "b")
    val rows = df.select(col("case_id"),
      expr("graft_lane_agree(a, b)").as("native"),
      expr("size(filter(zip_with(a, b, (x, y) -> x = y), v -> v))").as("ref"))
      .collect()
    rows should have length 150
    rows.foreach { r =>
      assert(r.getInt(1) == r.getInt(2),
        s"case ${r.getLong(0)}: native=${r.getInt(1)} ref=${r.getInt(2)}")
    }
    val nulls = spark.sql(
      "select graft_lane_agree(cast(null as array<string>), array('x')) n1, " +
        "graft_lane_agree(array('x'), cast(null as array<string>)) n2").collect()(0)
    assert(nulls.isNullAt(0) && nulls.isNullAt(1))
  }

  test("graft_pairs projection stays inside WholeStageCodegen") {
    // The point of the kernel: the expansion must not be CodegenFallback.
    // The explode(graft_pairs(...)) Generate node carries the codegen star.
    val df = spark.range(4).selectExpr("array(id, id + 1, id + 2) as xs")
      .selectExpr("explode(graft_pairs(xs)) as p")
      .selectExpr("p.a", "p.b")
    val p = plan(df)
    val genLine = p.linesIterator.find(_.contains("graft_pairs"))
    assert(genLine.isDefined, s"no graft_pairs node in:\n$p")
    assert(genLine.get.trim.matches("""^[+\-:\s]*\*\(\d+\).*"""),
      s"graft_pairs node not codegen'd (no *(n) prefix):\n$p")
    df.collect().length should be(12)
  }
}
