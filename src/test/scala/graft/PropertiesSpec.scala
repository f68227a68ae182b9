package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.prep.Prep
import graft.window.Windows

/** ScalaCheck generator-driven invariants (SURVEY.md §5) for the
  * ordering-sensitive operators. Driven manually (fixed seeds, N cases per
  * property) — the scalatest/scalacheck bridge artifact isn't in the
  * offline cache, and Spark jobs per case favor few, adversarial cases
  * over many anyway.
  */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def cases[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(42L + i)))

  test("property: downsample(k) preserves global mean on k-multiples") {
    val gen = for {
      n <- Gen.choose(20, 300)
      k <- Gen.choose(2, 10)
      vals <- Gen.listOfN(n, Gen.choose(-100.0, 100.0))
    } yield (k, vals)
    cases(gen, 5).foreach { case (k, vals0) =>
      val vals = vals0.take(vals0.size - vals0.size % k)
      val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("idx", "v")
      val downMean = Prep.downsample(df, "idx", k, Seq("v"))
        .agg(avg("v")).as[Double].head()
      assert(math.abs(downMean - vals.sum / vals.size) < 1e-9, s"k=$k n=${vals.size}")
    }
  }

  test("property: sliding window count = n/step - 1 (size=2*step), all windows full") {
    val gen = for {
      step <- Gen.choose(4, 40)
      n <- Gen.choose(100, 400)
    } yield (step, n)
    cases(gen, 5).foreach { case (step, n) =>
      val winSize = step * 2
      val df = (0 until n).map(i => (i.toLong, i.toDouble)).toDF("idx", "v")
      val wins = Windows.slidingWindows(df, "idx", "v", winSize, step)
      assert(wins.count() == math.max(n / step - 1, 0), s"step=$step n=$n")
      assert(wins.filter(size(col("values")) =!= winSize).count() == 0)
    }
  }

  test("property: unstack ∘ stack = identity for any channel count") {
    val gen = for {
      nc <- Gen.choose(2, 5)
      n <- Gen.choose(10, 60)
    } yield (nc, n)
    cases(gen, 4).foreach { case (nc, n) =>
      val cols = (0 until nc).map(c => s"c$c")
      val rows = (0 until n).map(i =>
        org.apache.spark.sql.Row.fromSeq(i.toLong +: (0 until nc).map(c => (i * nc + c).toDouble)))
      val schema = org.apache.spark.sql.types.StructType(
        org.apache.spark.sql.types.StructField("idx", org.apache.spark.sql.types.LongType) +:
          cols.map(c => org.apache.spark.sql.types.StructField(c, org.apache.spark.sql.types.DoubleType)))
      val df = spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
      val stacked = Prep.stackChannels(df, "idx", cols)
      val back = Prep.unstackChannels(stacked, "global_idx", "value", nc)
        .orderBy("idx").collect()
      assert(back.length == n)
      back.foreach { r =>
        val i = r.getLong(0)
        (0 until nc).foreach(c => assert(r.getDouble(c + 1) == (i * nc + c).toDouble))
      }
    }
  }

  test("property: duplicateClusters equals a local union-find on random graphs") {
    val gen = for {
      n <- Gen.choose(5, 60)          // node id space
      m <- Gen.choose(1, 80)          // edges (dups/self-loops filtered)
      edges <- Gen.listOfN(m, Gen.zip(Gen.choose(0L, n.toLong), Gen.choose(0L, n.toLong)))
    } yield edges.collect { case (a, b) if a != b => (math.min(a, b), math.max(a, b)) }.distinct
    cases(gen, 4).filter(_.nonEmpty).foreach { edges =>
      // local union-find reference
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expect = parent.keys.map(k => k -> find(k)).toMap
      val got = graft.ext.Dedup.duplicateClusters(edges.toDF("id1", "id2"))
        .as[(Long, Long)].collect().toMap
      assert(got == expect, s"edges=$edges")
    }
  }

  test("property: sessionize session count = 1 + gaps over threshold") {
    val gen = for {
      n <- Gen.choose(5, 120)
      gaps <- Gen.listOfN(n, Gen.choose(1L, 1000L))
      thr <- Gen.choose(100L, 900L)
    } yield (gaps, thr)
    cases(gen, 4).foreach { case (gaps, thr) =>
      val ts = gaps.scanLeft(0L)(_ + _)
      val df = ts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("idx", "ts")
      val sessions = Windows.sessionize(df, "idx", "ts", gap = thr, chunkSize = 16L)
        .orderBy("idx").select("session").as[Long].collect()
      assert(sessions.max + 1 == 1 + gaps.count(_ > thr), s"thr=$thr")
      // session ids are 0-based, contiguous, non-decreasing in idx order
      assert(sessions.head == 0L && sessions.distinct.length == sessions.max + 1)
      sessions.sliding(2).foreach(p => assert(p.length < 2 || p(0) <= p(1)))
    }
  }

  test("property: confusion counts always sum to the universe") {
    val gen = for {
      n <- Gen.choose(10, 80)
      pf <- Gen.choose(0.0, 1.0)
      lf <- Gen.choose(0.0, 1.0)
    } yield (n, pf, lf)
    cases(gen, 4).foreach { case (n, pf, lf) =>
      val pred = (0 until n).filter(i => (i * 2654435761L % 100) / 100.0 < pf)
        .map(_.toLong).toDF("idx")
      val label = (0 until n).filter(i => (i * 40503L % 100) / 100.0 < lf)
        .map(_.toLong).toDF("idx")
      val r = graft.eval.Eval.confusion(pred, label, "idx", n)
        .as[(Long, Long, Long, Long)].head()
      assert(r._1 + r._2 + r._3 + r._4 == n)
    }
  }

  test("property: asofJoin (keyed and bucketed-global) equals a naive greatest-t<=T lookup") {
    val gen = for {
      nl <- Gen.choose(30, 120)
      nr <- Gen.choose(1, 40)
      span <- Gen.choose(50, 2000)
      buckets <- Gen.choose(1, 40)
    } yield (nl, nr, span, buckets)
    cases(gen, 4).foreach { case (nl, nr, span, buckets) =>
      // deterministic pseudo-random times; right times deduped (contract)
      val lts = (0 until nl).map(i => (i.toLong, (i * 2654435761L % span)))
      val rts = (0 until nr).map(i => (i * 40503L % span))
        .distinct.map(t => (t, t * 0.5 + 1))
      val left = lts.toDF("id", "t")
      val right = rts.toDF("rt", "v")
      // naive reference, computed in plain Scala
      val sortedR = rts.sortBy(_._1)
      val expect = lts.map { case (id, t) =>
        val m = sortedR.takeWhile(_._1 <= t).lastOption
        (id, m.map(_._1), m.map(_._2))
      }.sortBy(_._1)
      val got = Windows.asofJoin(left, right, "t", "rt", Seq("v"),
          numBuckets = buckets)
        .select("id", "asof_ts", "asof_v").collect()
        .map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long]),
          Option(r.get(2)).map(_.asInstanceOf[Double])))
        .sortBy(_._1).toSeq
      assert(got == expect, s"nl=$nl nr=$nr span=$span buckets=$buckets")
      // keyed single-group form agrees too
      val gotK = Windows.asofJoin(left.withColumn("k", lit(1)),
          right.withColumn("k", lit(1)), "t", "rt", Seq("v"), partCols = Seq("k"))
        .select("id", "asof_ts", "asof_v").collect()
        .map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long]),
          Option(r.get(2)).map(_.asInstanceOf[Double])))
        .sortBy(_._1).toSeq
      assert(gotK == expect)
    }
  }

  test("property: intervalJoin equals the naive range predicate for random intervals") {
    val gen = for {
      nl <- Gen.choose(50, 200)
      ni <- Gen.choose(1, 25)
      span <- Gen.choose(100, 3000)
      w <- Gen.choose(1, 500)
    } yield (nl, ni, span, w)
    cases(gen, 4).foreach { case (nl, ni, span, w) =>
      val pts = (0 until nl).map(i => (i.toLong, i * 2654435761L % span))
      // mix of empty, short, and long intervals
      val ivals = (0 until ni).map { i =>
        val s = i * 40503L % span
        (i.toLong, s, s + (i * 7919L % (span / 2)) - 5)
      }
      val expect = (for {
        (id, t) <- pts; (iid, s, e) <- ivals if t >= s && t < e
      } yield (id, iid)).sorted
      val got = Windows.intervalJoin(pts.toDF("id", "t"),
          ivals.toDF("ival_id", "s", "e"), "t", "s", "e", bucketWidth = w)
        .select("id", "ival_id").as[(Long, Long)].collect().sorted.toSeq
      assert(got == expect, s"nl=$nl ni=$ni span=$span w=$w")
    }
  }

  test("property: chunkDedup equals a sequential first-occurrence scan") {
    val gen = for {
      nDocs <- Gen.choose(3, 20)
      k <- Gen.choose(1, 4)
      // tiny vocabulary so cross-doc chunk collisions are common
      texts <- Gen.listOfN(nDocs,
        Gen.choose(1, 12).flatMap(len =>
          Gen.listOfN(len, Gen.oneOf("a", "b", "c")).map(_.mkString(" "))))
    } yield (k, texts)
    cases(gen, 5).foreach { case (k, texts) =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      // reference: one sequential pass, first (doc, pos) owns a chunk
      val seen = scala.collection.mutable.Set[String]()
      val expect = docs.map { case (id, t) =>
        val chunks = t.split(" +").grouped(k).map(_.mkString(" ")).toSeq
        val kept = chunks.filter(c => seen.add(c))
        (id, kept.size.toLong, chunks.size.toLong, kept.mkString(" "))
      }
      val got = graft.ext.Dedup.chunkDedup(docs.toDF("doc_id", "text"), "doc_id", "text", k)
        .orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq
      assert(got == expect, s"k=$k texts=$texts")
    }
  }

  test("property: chunkDocuments covers every token; disjoint mode rebuilds the doc") {
    val gen = for {
      n <- Gen.choose(1, 60)
      toks <- Gen.listOfN(n, Gen.oneOf("aa", "bb", "cc", "dd"))
      chunkLen <- Gen.choose(1, 12)
      stride <- Gen.choose(1, chunkLen)
    } yield (toks, chunkLen, stride)
    cases(gen, 6).foreach { case (toks, chunkLen, stride) =>
      val docs = Seq((7L, toks.mkString(" "))).toDF("doc_id", "text")
      val got = graft.ext.TextAnalysis.chunkDocuments(
          docs, "doc_id", "text", chunkLen, stride, minChunk = 1)
        .orderBy("chunk_id")
        .select("chunk_id", "start_pos", "chunk_text")
        .as[(Long, Long, String)].collect().toSeq
      // chunk count and starts are pure stride arithmetic
      assert(got.map(_._2) == (0 until toks.size by stride).map(_.toLong))
      // with minChunk = 1 every token position is covered by ≥ 1 chunk
      val covered = got.flatMap { case (_, s, t) =>
        s.toInt until (s.toInt + t.split(" +").length) }.toSet
      assert(covered == toks.indices.toSet, s"L=$chunkLen s=$stride")
      // disjoint mode (stride = chunkLen) rebuilds the document exactly
      if (stride == chunkLen)
        assert(got.map(_._3).mkString(" ") == toks.mkString(" "))
    }
  }

  test("property: winnowFingerprints equals the sequential reference on random docs") {
    val M = 2147483647L
    // code-point fold — the engine's substr/ascii semantics (see the
    // EvalFunctionsSpec winnowing reference)
    def tokHash(t: String): Long =
      t.codePoints().toArray.foldLeft(0L)((a, cp) => (a * 31 + cp) % M)
    def winnow(ws: Seq[String], k: Int, w: Int): Set[(Long, Long)] = {
      if (ws.length < k) return Set.empty
      val th = ws.map(tokHash)
      val gh = (0 to ws.length - k).map(p =>
        (0 until k).foldLeft(0L)((a, j) => (a * 131 + th(p + j)) % M))
      val wd = math.min(w, gh.length)
      (0 to gh.length - wd).map { q =>
        val sl = gh.slice(q, q + wd)
        ((q + sl.lastIndexOf(sl.min)).toLong, sl.min)
      }.toSet
    }
    val gen = for {
      n <- Gen.choose(1, 40)
      // tiny vocabulary makes repeated grams (hash ties) common
      toks <- Gen.listOfN(n, Gen.oneOf("x", "y"))
      k <- Gen.choose(1, 5)
      w <- Gen.choose(1, 7)
    } yield (toks, k, w)
    cases(gen, 6).foreach { case (toks, k, w) =>
      val docs = Seq((3L, toks.mkString(" "))).toDF("doc_id", "text")
      val got = graft.ext.TextAnalysis.winnowFingerprints(docs, "doc_id", "text", k, w)
        .select("pos", "gram_hash").as[(Long, Long)].collect().toSet
      assert(got == winnow(toks, k, w), s"k=$k w=$w toks=$toks")
    }
  }

  test("property: winnowSpans equals a sequential matches→diagonal-islands reference") {
    val M = 2147483647L
    def tokHash(t: String): Long =
      t.codePoints().toArray.foldLeft(0L)((a, cp) => (a * 31 + cp) % M)
    def fps(ws: Seq[String], k: Int, w: Int): Set[(Long, Long)] = {
      if (ws.length < k) return Set.empty
      val th = ws.map(tokHash)
      val gh = (0 to ws.length - k).map(p =>
        (0 until k).foldLeft(0L)((a, j) => (a * 131 + th(p + j)) % M))
      val wd = math.min(w, gh.length)
      (0 to gh.length - wd).map { q =>
        val sl = gh.slice(q, q + wd)
        ((q + sl.lastIndexOf(sl.min)).toLong, sl.min)
      }.toSet
    }
    def refSpans(docs: Seq[(Long, String)], k: Int, w: Int,
                 minShared: Long): Set[(Long, Long, Long, Long, Long, Long, Long)] = {
      val byDoc = docs.map { case (id, t) => id -> fps(t.split(" +").toSeq, k, w) }.toMap
      val pairs = for {
        (i1, f1) <- byDoc.toSeq; (i2, f2) <- byDoc.toSeq if i1 < i2
        shared = f1.map(_._2).intersect(f2.map(_._2))
        if shared.size >= minShared
      } yield (i1, i2, shared)
      pairs.flatMap { case (i1, i2, shared) =>
        val matches = for {
          (p1, h1) <- byDoc(i1).toSeq if shared(h1)
          (p2, h2) <- byDoc(i2).toSeq if h2 == h1
        } yield (p1, p2)
        matches.groupBy { case (p1, p2) => p1 - p2 }.toSeq.flatMap { case (diag, ms) =>
          val ps = ms.map(_._1).distinct.sorted
          // islands with gap tolerance w
          val splits = ps.zip(0L +: ps).map { case (cur, prev) => cur - prev > w }
          val islands = ps.zip(splits.scanLeft(0) { (acc, s) => if (s) acc + 1 else acc }.tail)
            .groupBy(_._2).values.map(_.map(_._1))
          islands.map { island =>
            (i1, i2, island.min, island.max + k, island.min - diag,
              island.max + k - diag, island.size.toLong)
          }
        }
      }.toSet
    }
    val gen = for {
      runLen <- Gen.choose(8, 14)
      gapLen <- Gen.choose(6, 10)
      flip <- Gen.oneOf(true, false)
    } yield (runLen, gapLen, flip)
    cases(gen, 4).foreach { case (runLen, gapLen, flip) =>
      val run = (0 until runLen).map(i => s"r$i").mkString(" ")
      val run2 = (0 until runLen).map(i => s"s$i").mkString(" ")
      val fill1 = (0 until gapLen).map(i => s"x$i").mkString(" ")
      val fill2 = (0 until gapLen).map(i => s"y$i").mkString(" ")
      val docs = Seq(
        0L -> s"$run $fill1 $run2",
        1L -> (if (flip) s"$run $fill2 $run2" else s"$fill2 $run $run2"))
      val got = graft.ext.Dedup.winnowSpans(docs.toDF("doc_id", "text"),
          "doc_id", "text", k = 4, w = 5, minShared = 1L)
        .select("id1", "id2", "start1", "end1", "start2", "end2", "n_fingerprints")
        .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSet
      assert(got == refSpans(docs, 4, 5, 1L), s"case ($runLen, $gapLen, $flip)")
    }
  }

  test("property: bpeEncode subwords always concatenate back to the original words") {
    val word = Gen.choose(1, 8).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d")).map(_.mkString))
    val gen = for {
      nLearn <- Gen.choose(3, 10)
      learn <- Gen.listOfN(nLearn, word)
      nEnc <- Gen.choose(1, 6)
      enc <- Gen.listOfN(nEnc, word) // encode-side words may be unseen
      merges <- Gen.choose(1, 6)
    } yield (learn.mkString(" "), enc, merges)
    cases(gen, 5).foreach { case (learnText, encWords, numMerges) =>
      val merges = graft.ext.TextAnalysis.bpeLearn(
          Seq(learnText).toDF("text"), "text", numMerges)
        .orderBy("merge_rank").select("left", "right")
        .as[(String, String)].collect().toSeq
      val got = graft.ext.TextAnalysis.bpeEncode(
          Seq((1L, encWords.mkString(" "))).toDF("doc_id", "text"),
          "doc_id", "text", merges)
        .as[(Long, Seq[String])].collect().head._2
      // lossless segmentation: merges change the CUTS, never the text
      assert(got.mkString == encWords.mkString,
        s"subwords $got do not rebuild ${encWords.mkString(" ")} (merges $merges)")
    }
  }

  test("property: conversionFunnel counts never increase along the funnel") {
    val gen = for {
      nEvents <- Gen.choose(20, 120)
      events <- Gen.listOfN(nEvents, for {
        u <- Gen.choose(1L, 8L)
        t <- Gen.choose(0L, 500L)
        typ <- Gen.oneOf("A", "B", "C")
      } yield (u, t, typ))
      horizon <- Gen.oneOf(None, Some(50L), Some(200L))
    } yield (events, horizon)
    cases(gen, 5).foreach { case (events, horizon) =>
      val got = Windows.conversionFunnel(events.toDF("user_id", "t", "typ"),
          "user_id", "t", "typ", Seq("A", "B", "C"), horizon)
        .orderBy("step").as[(Int, String, Long)].collect().toSeq
      assert(got.map(_._1) == Seq(1, 2, 3))
      val counts = got.map(_._3)
      assert(counts.zip(counts.tail).forall { case (a, b) => b <= a },
        s"funnel grew: $counts (horizon=$horizon)")
      // a tighter horizon can only lose conversions
      if (horizon.contains(50L)) {
        val loose = Windows.conversionFunnel(events.toDF("user_id", "t", "typ"),
            "user_id", "t", "typ", Seq("A", "B", "C"), Some(200L))
          .orderBy("step").as[(Int, String, Long)].collect().map(_._3).toSeq
        assert(counts.zip(loose).forall { case (tight, l) => tight <= l },
          s"tight $counts > loose $loose")
      }
    }
  }

  test("property: retentionCohorts age-0 covers the cohort; no cell exceeds it") {
    val gen = for {
      n <- Gen.choose(10, 80)
      events <- Gen.listOfN(n, for {
        u <- Gen.choose(1L, 6L)
        t <- Gen.choose(0L, 300L)
      } yield (u, t))
    } yield events
    cases(gen, 5).foreach { events =>
      val got = Windows.retentionCohorts(events.toDF("user_id", "ts_sec"),
          "user_id", "ts_sec", bucket = 20L)
        .as[(Long, Long, Long, Double)].collect().toSeq
      val byCohort = got.groupBy(_._1)
      byCohort.foreach { case (c, cells) =>
        val base = cells.find(_._2 == 0L)
        assert(base.isDefined, s"cohort $c missing age 0")
        assert(cells.forall(_._3 <= base.get._3), s"cohort $c cell exceeds base")
        assert(cells.forall(r => r._4 > 0 && r._4 <= 1.0), s"cohort $c frac out of range")
        assert(base.get._4 == 1.0)
      }
      // every user appears in exactly one cohort's age-0 cell
      val totalBase = byCohort.values.map(_.find(_._2 == 0L).get._3).sum
      assert(totalBase == events.map(_._1).distinct.size)
    }
  }

  test("property: ngramNovelty fractions lie in [0,1] and cannot overlap") {
    val gen = for {
      nDocs <- Gen.choose(4, 15)
      texts <- Gen.listOfN(nDocs,
        Gen.choose(2, 10).flatMap(len =>
          Gen.listOfN(len, Gen.oneOf("x", "y", "z", "w")).map(_.mkString(" "))))
    } yield texts
    cases(gen, 5).foreach { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val rows = graft.ext.TextAnalysis.ngramNovelty(docs, "doc_id", "text",
          n = 2, boilerplateDf = 2)
        .as[(Long, Long, Double, Double)].collect()
      rows.foreach { case (id, n, novel, boiler) =>
        assert(n > 0)
        assert(novel >= 0 && novel <= 1 && boiler >= 0 && boiler <= 1, s"doc $id")
        // df = 1 (novel) and df >= 2 (boilerplate) partition the grams
        assert(math.abs(novel + boiler - 1.0) < 1e-6, s"doc $id: $novel + $boiler != 1")
      }
    }
  }
}
