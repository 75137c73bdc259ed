package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based guarantees (SURVEY.md §5.2 item 4): algebraic laws
  * the operators must satisfy for ANY input, not just the fixtures.
  * Raw scalacheck Gen with fixed seeds (scalatestplus is not in the
  * offline cache) — deterministic, reproducible samples.
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Draw `n` deterministic samples from `gen` and run `f` on each. */
  private def forAllN[T](gen: Gen[T], n: Int)(f: T => Unit): Unit =
    (0 until n).foreach { i =>
      f(gen.pureApply(Gen.Parameters.default, Seed(0xC0FFEE + i)))
    }

  // ---- PPM codec: decode ∘ encode = identity --------------------------
  val imgGen: Gen[functions.Ppm.Image] = for {
    w <- Gen.choose(1, 16)
    h <- Gen.choose(1, 16)
    px <- Gen.containerOfN[Array, Byte](w * h * 3, Gen.choose(Byte.MinValue, Byte.MaxValue))
  } yield functions.Ppm.Image(w, h, 255, px)

  test("PPM: decode(encode(img)) round-trips exactly") {
    forAllN(imgGen, 50) { img =>
      val back = functions.Ppm.decode(functions.Ppm.encode(img))
      assert(back.width == img.width && back.height == img.height)
      assert(java.util.Arrays.equals(back.pixels, img.pixels))
    }
  }

  test("PPM: downsample2x halves dimensions and keeps means in range") {
    forAllN(imgGen, 50) { img =>
      val half = functions.Ppm.downsample2x(img)
      assert(half.width == math.max(img.width / 2, 1))
      assert(half.height == math.max(img.height / 2, 1))
      val f = functions.Ppm.features(functions.Ppm.encode(half))
      assert(f.meanLuma >= 0 && f.meanLuma <= 255)
    }
  }

  // ---- WAV codec: decode ∘ encode = identity --------------------------
  val audioGen: Gen[functions.Wav.Audio] = for {
    rate <- Gen.oneOf(8000, 16000, 44100)
    n <- Gen.choose(1, 512)
    samples <- Gen.containerOfN[Array, Short](n, Gen.choose(Short.MinValue, Short.MaxValue))
  } yield functions.Wav.Audio(rate, samples)

  test("WAV: decode(encode(audio)) round-trips exactly") {
    forAllN(audioGen, 50) { a =>
      val back = functions.Wav.decode(functions.Wav.encode(a))
      assert(back.sampleRate == a.sampleRate)
      assert(java.util.Arrays.equals(back.samples, a.samples))
    }
  }

  // ---- UDAF buffer algebra: merge is associative + commutative --------
  val bufGen: Gen[(Long, Long)] = for {
    c <- Gen.choose(-1000000L, 1000000L)
    q <- Gen.choose(0L, 10000L)
  } yield (c, q)

  test("UDAF: weighted-avg merge is associative and commutative") {
    val agg = functions.Udfs.WeightedAvgPrice
    def buf(t: (Long, Long)) = functions.Udfs.WAvgBuf(t._1, t._2)
    forAllN(Gen.zip(bufGen, bufGen, bufGen), 100) { case (a0, b0, c0) =>
      val abC = agg.merge(agg.merge(buf(a0), buf(b0)), buf(c0))
      val aBc = agg.merge(buf(a0), agg.merge(buf(b0), buf(c0)))
      assert((abC.cents, abC.qty) == (aBc.cents, aBc.qty))
      val ab = agg.merge(buf(a0), buf(b0))
      val ba = agg.merge(buf(b0), buf(a0))
      assert((ab.cents, ab.qty) == (ba.cents, ba.qty))
    }
  }

  // ---- salted aggregation == direct aggregation for any batch ---------
  val rowsGen: Gen[List[(String, Double)]] = Gen.listOfN(200, for {
    k <- Gen.oneOf("a", "b", "c")
    v <- Gen.choose(-100000, 100000).map(_ / 100.0)
  } yield (k, v))

  test("salted two-stage aggregation equals direct aggregation on any input") {
    import spark.implicits._
    forAllN(rowsGen, 3) { rows =>
      val df = rows.toDF("k", "v").withColumn("id", monotonically_increasing_id())
      val direct = df.groupBy(col("k"))
        .agg(count(lit(1)).as("n"), sum(col("v").cast("decimal(22,8)")).cast("double").as("s"))
        .orderBy(col("k")).collect().toSeq
      val salted = df.withColumn("salt", pmod(xxhash64(col("id")), lit(8)))
        .groupBy(col("k"), col("salt"))
        .agg(count(lit(1)).as("pn"), sum(col("v").cast("decimal(22,8)")).as("ps"))
        .groupBy(col("k"))
        .agg(sum(col("pn")).as("n"), sum(col("ps")).cast("double").as("s"))
        .orderBy(col("k")).collect().toSeq
      assert(salted == direct)
    }
  }

  // ---- streaming latest-per-key == batch max_by -----------------------
  test("stream toTable converges to the batch latest-per-key for generated inputs") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // unique ts per (key) max so latest-per-key is unambiguous
    val recsGen: Gen[List[streaming.KStreams.Record]] = for {
      n <- Gen.choose(20, 60)
      offs <- Gen.pick(n, 0L until 100000L)
      ks <- Gen.listOfN(n, Gen.oneOf("u1", "u2", "u3", "u4"))
      vs <- Gen.listOfN(n, Gen.oneOf("click", "view", "purchase"))
    } yield ks.lazyZip(vs).lazyZip(offs).map { (k, v, off) =>
      streaming.KStreams.Record(k, v, new java.sql.Timestamp(1700000000000L + off))
    }.toList
    forAllN(recsGen, 3) { recs => // streaming runs cost seconds each
      val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[streaming.KStreams.Record]
      val name = "prop_latest_" + java.util.UUID.randomUUID.toString.replace("-", "")
      val q = streaming.KStreams.KStreamDS(mem.toDS()).toTable.toMemory(name)
      val (first, rest) = recs.splitAt(recs.length / 2)
      if (first.nonEmpty) { mem.addData(first); q.processAllAvailable() }
      if (rest.nonEmpty) { mem.addData(rest); q.processAllAvailable() }
      q.stop()
      val streamed = streaming.KStreams.snapshot(spark, name)
        .select("key", "value").collect().map(r => (r.getString(0), r.getString(1))).toSet
      val batch = recs.toDF("key", "value", "ts")
        .groupBy(col("key"))
        .agg(max_by(col("value"), col("ts")).as("value"))
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(streamed == batch)
    }
  }

  // ---- native as-of join: all 3 directions equal brute force ---------
  /** Random frames with small key/ts domains to force collisions,
    * duplicates, null keys/timestamps, and one-sided keys. */
  val asofGen: Gen[(List[(Option[Long], Option[Long])], List[(Long, Long, Long)])] = for {
    nl <- Gen.choose(0, 40)
    nr <- Gen.choose(0, 40)
    l <- Gen.listOfN(nl, for {
      k <- Gen.option(Gen.choose(0L, 4L))
      t <- Gen.option(Gen.choose(0L, 30L))
    } yield (k, t))
    r <- Gen.listOfN(nr, for {
      k <- Gen.choose(0L, 4L)
      t <- Gen.choose(0L, 30L)
      v <- Gen.choose(0L, 999L)
    } yield (k, t, v))
    // distinct (key, ts) on the right: as-of is only well-defined per
    // unique right timestamp (the builder's documented precondition)
  } yield (l, r.groupBy(x => (x._1, x._2)).map(_._2.head).toList)

  test("as-of join: backward/forward/nearest equal brute force on random frames") {
    import spark.implicits._
    forAllN(asofGen, 12) { case (lRows, rRows) =>
      val left = lRows.zipWithIndex
        .map { case ((k, t), i) => (i.toLong, k, t) }.toDF("lid", "k", "t")
      val right = rRows.toDF("rk", "rt", "rv")
      def brute(dir: String): Map[Long, (Long, Long)] =
        lRows.zipWithIndex.flatMap { case ((kOpt, tOpt), i) =>
          for {
            k <- kOpt; t <- tOpt
            cand = rRows.filter(_._1 == k)
            pick <- dir match {
              case "backward" => cand.filter(_._2 <= t)
                .sortBy(r => (-r._2, -r._3)).headOption
              case "forward" => cand.filter(_._2 >= t)
                .sortBy(r => (r._2, r._3)).headOption
              case "nearest" =>
                val b = cand.filter(_._2 <= t).sortBy(r => (-r._2, -r._3)).headOption
                val f = cand.filter(_._2 > t).sortBy(r => (r._2, r._3)).headOption
                (b, f) match {
                  case (Some(bb), Some(ff)) =>
                    if (t - bb._2 <= ff._2 - t) Some(bb) else Some(ff)
                  case (x, y) => x.orElse(y)
                }
            }
          } yield i.toLong -> (pick._2, pick._3)
        }.toMap
      for (dir <- Seq("backward", "forward", "nearest")) {
        val got = plans.AsOf.join(left, right, "k", "rk", "t", "rt", dir)
          .select(col("lid"), col("rt"), col("rv")).collect()
          .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
        assert(got == brute(dir), s"direction=$dir left=$lRows right=$rRows")
      }
    }
  }
}
