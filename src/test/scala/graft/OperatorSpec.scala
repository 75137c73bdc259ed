package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Batch operator sanity + the sketch-vs-exact containment/recall
  * guarantees that the DuckDB oracle can't express. */
class OperatorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  private def pairs(name: String) =
    SparkEntry.queries(name)(spark, sf)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("flagship q1 aggregates all six flag/status groups") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.length == 6)
    assert(rows.forall(_.getAs[Double]("sum_qty") > 0))
  }

  test("minhash-LSH output is contained in exact jaccard pairs, full recall on testdata") {
    val exact = pairs("dedup_jaccard_pairs")
    val sketch = pairs("dedup_minhash_lsh")
    assert(sketch.subsetOf(exact), "LSH produced a false positive")
    assert(sketch == exact, s"LSH recall ${sketch.size}/${exact.size} on planted near-dups")
  }

  test("ANN-LSH output is contained in exact cosine pairs") {
    // the exact ground truth is bounded to the vec_id < cosineBlock
    // block (oracle-only); compare the sketch within the same block
    val block = operators.Dedup.cosineBlock
    val exact = pairs("dedup_embedding_cosine")
    val sketch = pairs("sim_ann_lsh").filter(p => p._1 < block && p._2 < block)
    assert(sketch.subsetOf(exact), "ANN produced a false positive")
    assert(sketch.size >= (exact.size * 9) / 10, s"ANN recall ${sketch.size}/${exact.size} below 90%")
  }

  test("IVF top-k reaches 80% recall of brute force while pruning the search space") {
    val bf = SparkEntry.queries("sim_topk_bruteforce")(spark, sf)
      .select("q_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = SparkEntry.queries("sim_ivf_topk")(spark, sf)
      .select("q_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = ivf.intersect(bf).size.toDouble / bf.size
    assert(recall >= 0.8, s"IVF recall@5 = $recall")
  }

  test("simhash pairs respect the hamming bound") {
    val bad = SparkEntry.queries("dedup_simhash")(spark, sf)
      .filter(col("hamming") > 3).count()
    assert(bad == 0)
  }

  test("fingerprint is deterministic across runs") {
    val a = SparkEntry.queries("text_fingerprint")(spark, sf).collect().toSeq
    val b = SparkEntry.queries("text_fingerprint")(spark, sf).collect().toSeq
    assert(a == b)
  }

  test("top-k per group never exceeds k") {
    val over = SparkEntry.queries("q19_topk_per_group")(spark, sf)
      .groupBy("o_custkey").count().filter(col("count") > 3).count()
    assert(over == 0)
  }

  test("multimodal decode features are complete and sane") {
    val df = SparkEntry.queries("mm_decode_features")(spark, sf).cache()
    assert(df.select("media_type").distinct().count() == 3)
    // image/video rows: real PPM decode — dims in the synth range,
    // luma within [0,255], downsample halves the dims
    val img = df.filter(col("media_type") =!= "audio")
    assert(img.filter(col("width") < 4 || col("width") > 7 ||
      col("height") < 4 || col("height") > 7).count() == 0)
    assert(img.filter(col("mean_luma_micro") < 0 ||
      col("mean_luma_micro") > 255000000L).count() == 0)
    assert(img.filter(col("half_width") =!= expr("width div 2") ||
      col("half_height") =!= expr("height div 2")).count() == 0)
    // audio rows: real RIFF/WAV decode — synth rate and length, sane stats
    val aud = df.filter(col("media_type") === "audio")
    assert(aud.count() > 0)
    assert(aud.filter(col("sample_rate") =!= 8000).count() == 0)
    assert(aud.filter(col("n_samples") < 240 || col("n_samples") > 495).count() == 0)
    assert(aud.filter(col("mean_abs_micro") < 0 ||
      col("mean_abs_micro") > 32768000000L).count() == 0)
    assert(aud.filter(col("zero_crossings") >= col("n_samples")).count() == 0)
    df.unpersist()
  }

  test("audio frames cover each clip exactly") {
    val df = SparkEntry.queries("mm_audio_frames")(spark, sf)
    val perDoc = df.groupBy("doc_id")
      .agg(max("n_samples").as("n"), count(lit(1)).as("frames"))
    // frame count = ceil(n_samples / 160)
    assert(perDoc.filter(col("frames") =!= ceil(col("n") / lit(160.0)).cast("long"))
      .count() == 0)
    // mean squared amplitude is non-negative and bounded by peak²
    assert(df.filter(col("energy_mean_sq") < 0 ||
      col("energy_mean_sq") > 32768L * 32768L).count() == 0)
  }

  test("hash sampling is deterministic and near the target fraction") {
    val a = SparkEntry.queries("sample_hash_deterministic")(spark, sf)
    val total = util.t(spark, sf, "orders").count().toDouble
    val frac = a.count() / total
    assert(frac > 0.02 && frac < 0.08, s"sampled fraction $frac far from 5%")
    // repartitioning must not change membership
    val b = util.t(spark, sf, "orders").repartition(13)
      .filter(pmod(xxhash64(col("o_orderkey")), lit(20)) === 0)
    assert(b.count() == a.count())
  }

  test("every declared oracle name exists in queries") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
  }

  test("no oracle SQL is null or blank (a val declared after `all` is null)") {
    SparkEntry.registry.foreach { gq =>
      gq.oracle.foreach(sql => assert(sql != null && sql.trim.nonEmpty,
        s"${gq.name}: null/blank oracle — declaration-order initialization bug"))
    }
  }

  test("registry names are unique (a duplicate would silently shadow a query)") {
    val names = SparkEntry.registry.map(_.name)
    val dupes = names.groupBy(identity).filter(_._2.size > 1).keys
    assert(dupes.isEmpty, s"duplicate query names: ${dupes.mkString(", ")}")
  }

  test("graft_cosine is callable from SQL") {
    val r = spark.sql(
      "SELECT round(graft_cosine(array(1.0D, 2.0D), array(2.0D, 4.0D)), 6) AS c")
      .head().getDouble(0)
    assert(r == 1.0)
  }
}
