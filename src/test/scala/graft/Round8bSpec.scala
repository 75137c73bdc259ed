package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 second wave: prefix-filter similarity join, delete-vector
  * compaction, CDC changelog apply, DSIR importance weighting.
  */
class Round8bSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("prefix filtering prunes the candidate space and loses no pair") {
    val (sh, _, cand) = operators.Dedup.prefixFilterParts(spark, sf)
    val nCand = cand.count()
    // pairs sharing ANY shingle — what the full inverted-index join
    // would verify; the prefix candidates must be a strict subset
    val a = sh.select(col("doc_id").as("a_id"), col("s"))
    val b = sh.select(col("doc_id").as("b_id"), col("s"))
    val nAll = a.join(b, Seq("s")).filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id")).distinct().count()
    assert(nCand < nAll, s"prefix filter pruned nothing: $nCand vs $nAll")
    assert(nCand > 0)
    // losslessness (the prefix-filtering principle): the verified
    // output equals the exact ground truth row-for-row
    val got = operators.Dedup.prefixFilterPairs(spark, sf)
      .collect().map(_.toSeq).toSeq
    val want = operators.Dedup.jaccardPairs(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(got == want, s"prefix filter diverges from exact: ${want.diff(got).take(3)}")
  }

  test("dv compaction: fixture delete skew splits the file set at the 25% policy") {
    // the policy's premise on this fixture: the o_orderkey%16<3 delete
    // concentrates in files 0-2 (>=25% of each), while the thin price
    // tail leaves files 3-7 under the threshold with NON-empty vectors
    // (both manifest paths exercised: rewrite AND keep)
    val perFile = util.t(spark, sf, "orders")
      .withColumn("file_id", pmod(col("o_orderkey"), lit(8)))
      .withColumn("del",
        (col("o_orderkey") % 16 < 3 || col("o_totalprice") > 480000.0).cast("long"))
      .groupBy(col("file_id"))
      .agg(count(lit(1)).as("tot"), sum(col("del")).as("ndel"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val hot = perFile.filter { case (_, tot, ndel) => ndel * 4 >= tot }.map(_._1).toSet
    assert(hot == Set(0L, 1L, 2L), s"hot files $hot != {0,1,2}")
    val coldDeleted = perFile.filterNot(f => hot(f._1)).map(_._3).sum
    assert(coldDeleted > 0L, "cold files carry no delete vectors — keep path unexercised")
    // the compacted read reconstructs the logical table exactly
    val got = operators.Warehouse.q77DvCompaction(spark, sf)
      .collect().map(_.toSeq).toSeq
    val want = util.t(spark, sf, "orders")
      .filter(!(col("o_orderkey") % 16 < 3 || col("o_totalprice") > 480000.0))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_live"), util.dsum(col("o_totalprice")).as("live_total"))
      .orderBy(col("o_orderpriority"))
      .collect().map(_.toSeq).toSeq
    assert(got == want)
  }

  test("cdc apply converges under reversed arrival order and drops tombstones") {
    import operators.StreamingOps.{CdcOp, CdcApplyProcessor}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    import spark.implicits._
    val pk = "spark.sql.streaming.stateStore.providerClass"
    val prevProv = spark.conf.getOption(pk)
    spark.conf.set(pk,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val ctx = spark.sqlContext
      val log = util.t(spark, sf, "events")
        .select(col("user_id").cast("long").as("user_id"),
          when(col("event_id") % 10 === 0, "d").otherwise("u").as("op"),
          col("event_type").as("value"),
          unix_micros(col("ts")).as("us"),
          col("event_id").cast("long").as("event_id"))
        .as[CdcOp].collect()
      // REVERSED changelog order, split in two: the fold is commutative
      // max-by over the (us, event_id) total order, so even adversarial
      // delivery must converge to the same table
      val rev = log.sortBy(r => (-r.us, -r.event_id))
      val (a, b) = rev.splitAt(rev.length / 2)
      val ms = MemoryStream[CdcOp]
      val q = ms.toDS().groupByKey(_.user_id)
        .transformWithState(new CdcApplyProcessor, TimeMode.None(), OutputMode.Update())
        .writeStream.format("memory").queryName("cdc_rev")
        .option("checkpointLocation", util.scratchDir("cdc_rev_cp"))
        .outputMode(OutputMode.Update).start()
      ms.addData(a.toIndexedSeq); q.processAllAvailable()
      ms.addData(b.toIndexedSeq); q.processAllAvailable()
      q.stop()
      val got = operators.StreamingOps.cdcSnapshot(spark.table("cdc_rev"))
        .collect().map(_.toSeq).toSeq
      // batch twin: last op per key under the total order, tombstones out
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("us").desc, col("event_id").desc)
      val want = log.toSeq.toDF()
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1 && col("op") =!= "d")
        .select(col("user_id"), col("value"), timestamp_micros(col("us")).as("ts"))
        .orderBy(col("user_id"))
        .collect().map(_.toSeq).toSeq
      assert(got == want, s"cdc snapshot diverges: ${want.diff(got).take(3)}")
      // tombstones really remove keys: every key whose LAST op is a
      // delete must be absent from the snapshot
      val tombstoned = log.groupBy(_.user_id).filter { case (_, ops) =>
        ops.maxBy(r => (r.us, r.event_id)).op == "d"
      }.keySet
      val present = got.map(_.head.asInstanceOf[Long]).toSet
      assert(tombstoned.intersect(present).isEmpty,
        s"tombstoned keys survive: ${tombstoned.intersect(present).take(3)}")
    } finally {
      prevProv match {
        case Some(v) => spark.conf.set(pk, v); case None => spark.conf.unset(pk)
      }
    }
  }

  test("index add increments are bit-identical to the full build's slice") {
    val inc = operators.Similarity.indexAdd(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val stored = operators.Similarity.indexSliceSummary(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(inc.map(_._1) == Seq("assign_raw", "codes_pq"))
    assert(inc.forall(_._2 > 0), s"empty increment: $inc")
    // encode-against-frozen-codebooks must reproduce the build's rows
    // exactly: add-then-query == rebuild-then-query
    assert(inc == stored, s"incremental add diverges from full build:\n$inc\nvs\n$stored")
  }

  test("range search: exact precision, strong-match recall via the index") {
    val got = operators.Similarity.rangeSearch(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val truth = operators.Similarity.rangeSearchExact(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got.nonEmpty, "range search returned nothing at tau=0.3")
    // every returned row is exact-verified: precision 1 by construction
    assert(got.subsetOf(truth), s"false positives: ${got.diff(truth).take(3)}")
    // list recall on the strong stratum (planted near-dups, cos >= 0.45)
    val strong = truth.filter(_._3 >= 0.45)
    if (strong.nonEmpty) {
      val recall = strong.count(got).toDouble / strong.size
      assert(recall >= 0.8, s"strong-match recall $recall < 0.8 (${strong.size} strong)")
    }
  }

  test("partition evolution prunes both eras by their own scheme") {
    val reader = sources.FileSources.evolutionReader(spark, sf)
    val physical = reader.queryExecution.executedPlan.toString
    // both scans carry partition predicates — pruning is metadata-only
    // in each era, under each era's own scheme
    val pf = "PartitionFilters: \\[(?!\\])".r.findAllIn(physical).length
    assert(pf >= 2, s"expected partition filters on both era scans:\n$physical")
    assert(physical.contains("pmonth") && physical.contains("pday"))
    // the union equals the logical range scan
    val got = reader.agg(count(lit(1))).head().getLong(0)
    val want = util.t(spark, sf, "orders")
      .filter(col("o_orderdate") >= "2000-10-15" && col("o_orderdate") <= "2001-03-15")
      .count()
    assert(got == want && got > 0)
  }

  test("incremental ingest verdicts partition the batch and match recomputation") {
    val rows = operators.Dedup.incrementalIngest(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rows.nonEmpty)
    val nNew = util.t(spark, sf, "documents")
      .filter(col("doc_id") % 7 === 3).count()
    assert(rows.length == nNew, "every batch doc gets exactly one verdict")
    // the exact gate must agree with a direct norm-key recomputation
    val docs = util.t(spark, sf, "documents")
      .withColumn("norm", regexp_replace(trim(lower(col("text"))), " +", " "))
      .select(col("doc_id"), col("norm"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val exNorms = docs.filter(_._1 % 7 != 3).map(_._2).toSet
    val batch = docs.filter(_._1 % 7 == 3).sortBy(_._1)
    val seen = scala.collection.mutable.Set[String]()
    val expectExact = batch.filter { case (_, n) =>
      val d = exNorms(n) || seen(n); seen += n; d
    }.map(_._1).toSet
    val gotExact = rows.filter(_._2 == "dup_exact").map(_._1).toSet
    assert(gotExact == expectExact,
      s"exact gate diverges: ${gotExact.diff(expectExact).take(3)} / ${expectExact.diff(gotExact).take(3)}")
  }

  test("dynamic partition pruning fires on the fact scan") {
    val joined = operators.SqlSurface.q80Join(spark, sf)
    val physical = joined.queryExecution.executedPlan.toString
    assert(physical.toLowerCase.contains("dynamicpruning"),
      s"no dynamic pruning subquery in the fact scan:\n$physical")
    // and the result equals the static range it replaces
    val got = joined.agg(count(lit(1))).head().getLong(0)
    val want = util.t(spark, sf, "orders")
      .filter(col("o_orderdate") >= "1999-01-01" && col("o_orderdate") < "1999-04-01")
      .count()
    assert(got == want && got > 0)
  }

  test("byte-budget shards stay within budget plus one blob") {
    val rows = operators.Multimodal.shardByBytes(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    assert(rows.nonEmpty)
    val maxBlob = util.t(spark, sf, "documents")
      .agg(max(octet_length(encode(col("text"), "utf-8")).cast("long"))).head().getLong(0)
    // offset sharding: a shard absorbs the blob crossing its boundary,
    // so its size is < budget + that blob
    rows.foreach { case (src, shard, bytes) =>
      assert(bytes < 16384L + maxBlob, s"shard ($src, $shard) holds $bytes bytes")
    }
  }

  test("MIPS norm-augmentation reduction reproduces the inner-product ranking") {
    val byIp = operators.Similarity.mipsTopk(spark, sf)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.sortBy(_.getLong(1)).map(_.getLong(2)).toSeq }
    val byCos = operators.Similarity.mipsViaAugmentedCosine(spark, sf)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.sortBy(_.getLong(1)).map(_.getLong(2)).toSeq }
    assert(byIp.keySet == byCos.keySet && byIp.nonEmpty)
    byIp.foreach { case (q, ids) =>
      val aug = byCos(q)
      // cos(q~, x~) = ip/(|q|·M) is monotone in ip; the entry ranks on
      // the 1e-6 grid, so allow one boundary swap at the top-5 edge
      assert(ids.head == aug.head, s"query $q: top-1 differs ($ids vs $aug)")
      assert(ids.toSet.intersect(aug.toSet).size >= 4,
        s"query $q: augmented ranking diverges ($ids vs $aug)")
    }
  }

  test("dsir weights skew positive on the seed slice and keep tracks sign") {
    val rows = operators.TextAnalysis.dsirWeights(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(2), r.getBoolean(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, w, keep) =>
      assert(keep == (w > 0), s"doc $id keep=$keep but log_weight=$w")
    }
    // the DSIR premise: documents drawn from the target slice score
    // higher under the importance model than the rest on average
    val (seed, rest) = rows.partition(_._1 % 5 == 0)
    val mSeed = seed.map(_._2).sum / seed.length
    val mRest = rest.map(_._2).sum / rest.length
    assert(mSeed > mRest,
      s"seed mean $mSeed not above non-seed mean $mRest — importance model inverted")
  }
}
