package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 specs: the decimal Spearman rank-moment path at a row
  * count where int64 provably wraps, the IVF-tier mutual-NN twin
  * (recombination referee + overlap bound vs the exact tier), and a
  * registry-wide plan gate flagging any entry whose plan re-executes
  * an expensive (scan-bearing join/agg) subtree twice without an
  * intervening checkpoint barrier — the defect class behind r12's
  * graph_hits and sim_mutual_nn findings.
  */
class Round13Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("spearman decimal path: exact at 10^6 rows where 60000*sum_d2 " +
      "wraps int64 (reversed ranking => rho = -1, identity => +1)") {
    val n = 1000000L
    // reversed ranking: sum_d2 = (n^3 - n)/3 ~ 3.3e17 (fits the bigint
    // display cast), but 60000 * sum_d2 ~ 2e22 >> 2^63 — the exact
    // regime the decimal(38,0) accumulation exists for
    val ranks = spark.range(1, n + 1)
      .select(col("id").as("ra"), (lit(n + 1) - col("id")).as("rb"))
    val rev = operators.Analytics
      .spearmanFromRanks(ranks, col("ra"), col("rb")).collect()(0)
    val wantD2 = (BigInt(n) * BigInt(n) * BigInt(n) - BigInt(n)) / 3
    assert(rev.getLong(0) == n)
    assert(BigInt(rev.getLong(1)) == wantD2, "sum_d2 closed form")
    assert(rev.getLong(2) == -10000L, "reversed ranking is rho = -1 exactly")
    val ident = operators.Analytics
      .spearmanFromRanks(spark.range(1, n + 1)
        .select(col("id").as("ra"), col("id").as("rb")),
        col("ra"), col("rb")).collect()(0)
    assert(ident.getLong(1) == 0L && ident.getLong(2) == 10000L)
    // n = 1 guard: denominator would be 0; the vacuous rho = +1 comes
    // back instead of a null/exception divergence between engines
    val one = operators.Analytics
      .spearmanFromRanks(spark.range(1, 2)
        .select(col("id").as("ra"), col("id").as("rb")),
        col("ra"), col("rb")).collect()(0)
    assert(one.getLong(2) == 10000L)
  }

  test("mutual NN over the IVF tier: recombination referee from " +
      "sim_knn_join_ivf; overlap with the exact tier at recall") {
    val rows = SparkEntry.queries("sim_mutual_nn_ivf")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    for ((a, b, _, rab, rba) <- rows) {
      assert(a < b, "each mutual pair emitted once, a < b")
      assert(rab >= 1 && rab <= 3 && rba >= 1 && rba <= 3)
    }
    // referee: rebuild the mutual set by recombining the kNN table
    // in the JVM — same definition, independent mechanism
    val knn = SparkEntry.queries("sim_knn_join_ivf")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2)) ->
        (r.getLong(1), r.getDouble(3))).toMap
    val want = knn.keys.filter { case (q, nb) =>
      q < nb && knn.contains((nb, q))
    }.map { case (q, nb) =>
      (q, nb, knn((q, nb))._2, knn((q, nb))._1, knn((nb, q))._1)
    }.toSet
    assert(rows.toSet == want, "recombination referee")
    // the IVF tier must recover most of the exact tier's mutual pairs:
    // pair recall compounds the per-direction recall (~0.8^2), measured
    // 0.757 on the fixture — bound at 0.6 with noise headroom
    val exact = SparkEntry.queries("sim_mutual_nn")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = rows.map(r => (r._1, r._2)).toSet
    val recall = (exact & got).size.toDouble / exact.size
    assert(recall >= 0.6, s"mutual-pair recall vs exact tier = $recall")
  }

  test("langid eval: confusion matrix recombines from langId's own " +
      "output; marginals are lawful") {
    val rows = SparkEntry.queries("text_langid_eval")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    // referee: rebuild the confusion matrix from the per-doc entry
    val docs = SparkEntry.queries("text_lang_id")(spark, sf).collect()
      .map(r => (r.getString(1), r.getString(2)))
    val conf = docs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val byT = docs.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val byP = docs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val want = conf.toSeq.map { case ((t0, p0), n) =>
      (t0, p0, n, n * 10000 / byT(t0), n * 10000 / byP(p0))
    }.sortBy(x => (x._1, x._2))
    assert(rows.toSeq == want, "confusion referee")
    // each true language's recall cells floor-sum to ≤ 10000 and
    // within |preds| of it (flooring loses < 1 bp per cell)
    for ((t0, cells) <- rows.groupBy(_._1)) {
      val s = cells.map(_._4).sum
      assert(s <= 10000 && s > 10000 - cells.length, s"$t0 recall sums to $s")
    }
  }

  test("sequence pack: every chunk but the last carries exactly B " +
      "tokens; totals reconcile; sequential packer referee agrees") {
    val B = operators.Sampling.packChunkTokens
    val rows = SparkEntry.queries("pipeline_sequence_pack")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    assert(rows.map(_._1).toSeq == rows.indices.map(_.toLong),
      "chunk ids are dense from 0")
    for ((cid, nd, nf, nt, _, _) <- rows.init)
      assert(nt == B, s"chunk $cid carries $nt tokens, want $B")
    assert(rows.last._4 <= B && rows.last._4 > 0)
    for ((cid, nd, nf, _, _, _) <- rows) assert(nf <= nd, s"chunk $cid")
    // sequential referee: pack the collected corpus in doc order
    val docs = util.t(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1).length.toLong))
      .sortBy(_._1)
    val total = docs.map(_._2).sum
    assert(rows.map(_._4).sum == total, "token totals reconcile")
    var off = 0L
    val touch = scala.collection.mutable.Map
      .empty[Long, (Long, Long, Long, Long, Long)] // cid -> (nd, nf, nt, fdoc, ldoc)
    for ((id, n) <- docs) {
      val (s, e) = (off, off + n); off = e
      val (fc, lc) = (s / B, (e - 1) / B)
      for (c <- fc to lc) {
        val nt = math.min(e, (c + 1) * B) - math.max(s, c * B)
        val cur = touch.getOrElse(c, (0L, 0L, 0L, Long.MaxValue, Long.MinValue))
        touch(c) = (cur._1 + 1, cur._2 + (if (fc == lc) 1L else 0L),
          cur._3 + nt, math.min(cur._4, id), math.max(cur._5, id))
      }
    }
    val want = touch.toSeq.sortBy(_._1)
      .map { case (c, (nd, nf, nt, fd, ld)) => (c, nd, nf, nt, fd, ld) }
    assert(rows.toSeq == want, "sequential packer referee")
  }

  test("resource audit: heavy-tier panel covered, metrics lawful, and " +
      "no entry's shuffle state grows superlinearly in SF") {
    val rows = SparkEntry.queries("meta_resource_audit")(spark, sf).collect()
    val byName = rows.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4),
        r.getLong(5), r.getLong(6))).toMap
    assert(byName.keySet == Set("graph_hits", "graph_shortest_paths_frontier",
      "sim_knn_join_ivf", "sim_mutual_nn", "q103_abc_xyz"))
    for ((n, (lo, hi, ratioBp, superlinear, peak, spill)) <- byName) {
      assert(lo >= 0 && hi >= 0 && peak >= 0 && spill >= 0, n)
      assert(ratioBp == (if (lo > 0) hi * 10000L / lo else 0L), n)
      // the audit's verdict: nothing in the heavy tier may scale its
      // shuffled state superlinearly between the two fixture SFs
      assert(!superlinear,
        s"$n shuffle records grew ${ratioBp / 10000.0}x across a 10x SF step")
    }
    // the fixture tables really do differ ~10x, so a linear entry must
    // show materially more shuffle at the larger SF
    assert(byName.values.exists { case (lo, hi, _, _, _, _) => hi > lo },
      "audit measured no growth at all — probe wiring broken?")
  }

  test("e2e exactly-once chaos: compacted source -> stateful upsert -> " +
      "transactional sink; kill-mid-epoch restart is file-identical to " +
      "an uninterrupted run and both match the in-JVM referee") {
    import scala.jdk.CollectionConverters._
    def lines(out: String): Seq[String] =
      new java.io.File(out).listFiles().toSeq
        .filter(_.getName.startsWith("part-"))
        .flatMap(f => java.nio.file.Files.readAllLines(f.toPath).asScala)
        .sorted
    // ---- leg 1: FILE-IDENTITY of the torn-epoch replay on a FIXED
    // log. (On a GROWN log file-identity cannot hold by design: the
    // broker re-compacted, so the replayed epoch's survivor set
    // legitimately changed — that path is leg 2.)
    val (outA, ckA) = (util.scratchDir("eo_chaos_a"), util.scratchDir("eo_chaos_a_ck"))
    operators.StreamingOps.e2eUpsertRun(spark, outA, ckA, 20000)
    operators.StreamingOps.tearNewestCommit(ckA)
    operators.StreamingOps.e2eUpsertRun(spark, outA, ckA, 20000)
    // uninterrupted reference: one fresh run over the same 20k log
    val (outB, ckB) = (util.scratchDir("eo_chaos_b"), util.scratchDir("eo_chaos_b_ck"))
    operators.StreamingOps.e2eUpsertRun(spark, outB, ckB, 20000)
    val (got, want) = (lines(outA), lines(outB))
    assert(want.nonEmpty)
    assert(got == want,
      s"crashed+restarted sink diverges: ${got.length} vs ${want.length} lines; " +
        s"first diff: ${got.diff(want).headOption.orElse(want.diff(got).headOption)}")
    // ---- leg 2: CONVERGENCE through crash + growth + re-compaction
    // (the registry entry's own shape): drain 10k, tear the newest
    // commit, resume against the grown re-compacted 20k log. The
    // replayed epoch's contents legitimately differ — exactly-once
    // here means the converged snapshot equals the in-JVM referee:
    // survivor max-offset per key, tombstones (id % 11 == 5) retracted.
    val (outC, ckC) = (util.scratchDir("eo_chaos_c"), util.scratchDir("eo_chaos_c_ck"))
    operators.StreamingOps.e2eUpsertRun(spark, outC, ckC, 10000)
    operators.StreamingOps.tearNewestCommit(ckC)
    operators.StreamingOps.e2eUpsertRun(spark, outC, ckC, 20000)
    val surv = (0L until 20000L)
      .groupBy(id => ((id * 2654435761L) % 1000003L) % 101L)
      .view.mapValues(_.max).toMap
    val expect = surv.toSeq.collect {
      case (k, id) if id % 11 != 5 => (s"k$k", s"lbl${id % 5}@$id", id)
    }.sortBy(_._1)
    val snap = lines(outC).map(_.split(",", -1))
      .map(a => (a(0), a(1), a(2).toLong))
      .groupBy(_._1).view.mapValues(_.maxBy(_._3)).values
      .filter(_._2.nonEmpty).toSeq.sortBy(_._1)
    assert(snap == expect, "converged snapshot diverges from referee")
  }

  test("registry-wide: no batch entry re-executes an expensive " +
      "scan-bearing subtree twice without a reuse or checkpoint barrier") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    // the r12 defect class: graph_hits re-inlined its half-step
    // edge-join lineage ~2^6 times, sim_mutual_nn ran its kNN scan
    // twice — a DataFrame built from an expensive subtree referenced
    // more than once with no barrier between. The honest gate runs at
    // the PHYSICAL level: a duplicated LOGICAL subtree is often fine
    // because ReuseExchange collapses identical exchanges into one
    // executed stage — so we plan with AQE off (making ReusedExchange
    // placement static), never descend into a ReusedExchangeExec (its
    // subtree executes once by construction), and flag the duplicated
    // scan-bearing wide subtrees that remain: those really do run
    // twice. A localCheckpoint turns the subtree into an RDD scan
    // leaf, so fixed entries pass by construction.
    def scanLike(p: SparkPlan): Boolean = {
      val n = p.getClass.getSimpleName
      n.contains("FileSourceScan") || n.contains("BatchScan") ||
        n.contains("RowDataSourceScan")
    }
    def isWide(p: SparkPlan): Boolean = {
      val n = p.getClass.getSimpleName
      n.contains("Join") || n.contains("Aggregate") || n.contains("Window") ||
        n.contains("MapPartitions") || n.contains("SerializeFromObject")
    }
    // collect all subtrees WITHOUT descending through ReusedExchangeExec
    def subtrees(p: SparkPlan): Seq[SparkPlan] = p match {
      case _: ReusedExchangeExec => Seq.empty
      case _ => p +: p.children.flatMap(subtrees)
    }
    def hasScanAbove(p: SparkPlan): Boolean =
      subtrees(p).exists(scanLike) // scan reachable w/o crossing a reuse
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(_.startsWith("stream_"))
      // building meta_resource_audit EXECUTES its 10 heavy panel
      // measurements eagerly (the answer is a local relation of
      // listener totals — there is no deferred plan to inspect);
      // the audit's own spec covers it
      .filterNot(_ == "meta_resource_audit")
    // an ISOLATED session (own SQLConf, shared context/extensions):
    // flipping AQE on the shared TestSpark session races concurrently
    // running suites whose plan assertions assume AQE on — observed
    // once the gate window grew (q103's r17 scalar pull executes jobs
    // at construction time, lengthening the AQE-off span)
    val gateSpark = spark.newSession()
    gateSpark.conf.set("spark.sql.adaptive.enabled", "false")
    val offenders =
      names.flatMap { n =>
        val df =
          try SparkEntry.queries(n)(gateSpark, sf)
          catch { case e: Throwable => fail(s"entry $n failed to build: $e") }
        val plan = df.queryExecution.executedPlan
        val qual = subtrees(plan).filter(p =>
          isWide(p) && hasScanAbove(p))
        val dups = qual.groupBy(_.canonicalized).filter(_._2.size >= 2)
        if (dups.isEmpty) None
        else {
          // report the largest duplicated subtree only (children of a
          // duplicate necessarily duplicate too)
          val biggest = dups.values.map(_.head).maxBy(subtrees(_).size)
          Some(s"$n: ${dups.size} duplicated subtree group(s), largest = " +
            s"${biggest.nodeName} of ${subtrees(biggest).size} nodes")
        }
      }
    assert(offenders.isEmpty,
      "entries re-executing an expensive subtree (add a localCheckpoint " +
        "barrier or derive both references from one materialized frame):\n" +
        offenders.mkString("\n"))
  }
}
