package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-3 additions: the minhash-based apply path, Avro round-trip,
  * and the semantics-preservation guarantees of the CosineSim rewrite
  * (null propagation + guarded pattern match). */
class Round3Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("minhash-based near-dup apply keeps exactly the exact-based survivors") {
    // LSH recall at J>=0.8 is ~0.9997 on this corpus — on the fixture
    // data the candidate set covers every true pair, so the two apply
    // paths must agree row-for-row
    val exact = SparkEntry.queries("dedup_apply_neardup")(spark, sf).collect().toSeq
    val lsh = SparkEntry.queries("dedup_apply_minhash")(spark, sf).collect().toSeq
    assert(lsh == exact)
  }

  test("avro round-trip is lossless vs the parquet original") {
    val back = SparkEntry.queries("src_avro_roundtrip")(spark, sf).collect().toSeq
    val orig = util.t(spark, sf, "events")
      .select(col("event_id"), col("user_id"), col("event_type"))
      .orderBy(col("event_id")).collect().toSeq
    assert(back.nonEmpty && back == orig)
  }

  test("CosineSim yields NULL on length mismatch and null elements, like the HOF form") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](1.0, 2.0)),   // clean
      (2L, Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](1.0)),        // ragged
      (3L, Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](1.0, 2.0))   // null elem
    ).toDF("id", "a", "b")
    // (comparing against Vectors.cosine here would be vacuous — the
    // session-wide ReplaceHofCosine rewrites it to CosineSim too; the
    // HOF null behavior being mirrored is: zip_with null-pads ragged
    // arrays and a null element poisons the aggregate fold → NULL)
    val out = df.select(col("id"),
        functions.CosineSim.cosine(col("a"), col("b")).as("nat"))
      .orderBy(col("id")).collect()
    assert(!out(0).isNullAt(1) && out(0).getDouble(1) == 1.0)
    assert(out(1).isNullAt(1), "ragged arrays must yield NULL")
    assert(out(2).isNullAt(1), "null elements must yield NULL")
  }

  test("ReplaceHofCosine does not rewrite a self-product zip_with") {
    // zip_with(a, b, (x,y) -> x*x) is NOT a dot product — the guarded
    // pattern must leave it (and the whole round/divide tree) alone
    val e = util.t(spark, sf, "embeddings").limit(10)
      .select(col("embedding").cast("array<double>").as("v"))
    val notDot = e.select(expr(
      """round(aggregate(zip_with(v, v, (x, y) -> x * x), 0D, (acc, x) -> acc + x) /
        | (sqrt(aggregate(v, 0D, (acc, x) -> acc + x * x)) *
        |  sqrt(aggregate(v, 0D, (acc, x) -> acc + x * x))), 6)""".stripMargin).as("c"))
    val optimized = notDot.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("graft_cosine"),
      s"self-product was wrongly rewritten to a dot product:\n$optimized")
    notDot.collect() // and it still evaluates
  }
}
