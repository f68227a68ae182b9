package graft

import org.apache.spark.sql.functions._

import graft.window.Windows

/** Unit + property coverage for the ordering-sensitive window operators
  * (SURVEY.md §2.5). Fixtures are tiny; semantics are checked against the
  * reference's pandas/NumPy behavior (documented per test).
  */
class WindowsSpec extends SparkSpec {
  import spark.implicits._

  private def series(n: Int) =
    spark.range(n.toLong).select(col("id").as("idx"), (col("id") * 2).cast("double").as("v"))

  test("W1: sliding windows size 100 step 50 — count = n/50 - 1, ordered contents") {
    val n = 400
    val wins = Windows.slidingWindows(series(n), "idx", "v", 100, 50)
      .orderBy("window_id").collect()
    // reference: [data[i:i+100] for i in range(0, len-50, 50)] → n/50 - 1 full windows
    assert(wins.length == n / 50 - 1)
    val first = wins.head.getSeq[Double](wins.head.fieldIndex("values"))
    assert(first == (0 until 100).map(_ * 2.0))
    val second = wins(1).getSeq[Double](wins(1).fieldIndex("values"))
    assert(second.head == 100.0) // starts at idx 50 → value 100
  }

  test("W1: window count property across sizes") {
    for (n <- Seq(150, 1000, 1040)) {
      val cnt = Windows.slidingWindows(series(n), "idx", "v", 100, 50).count()
      assert(cnt == n / 50 - 1, s"n=$n")
    }
  }

  test("W3: de-overlap stride 2 keeps even window ids = chunk(100)") {
    val wins = Windows.slidingWindows(series(500), "idx", "v", 100, 50)
    val deo = Windows.deoverlap(wins, "window_id", 2).orderBy("window_id").collect()
    assert(deo.map(_.getLong(0)).toSeq == Seq(0L, 2L, 4L, 6L, 8L))
    // de-overlapped windows tile the series without gaps: starts 0,100,…,400
    val starts = deo.map(r => r.getSeq[Double](r.fieldIndex("values")).head)
    assert(starts.toSeq == Seq(0.0, 200.0, 400.0, 600.0, 800.0))
  }

  test("W6: rolling min emits null for the first w-1 rows (pandas parity)") {
    val df = Seq((0L, 5.0), (1L, 3.0), (2L, 4.0), (3L, 1.0)).toDF("idx", "v")
    val out = Windows.rollingMin(df, "idx", "v", 3).orderBy("idx")
      .select("rolling_min").collect().map(r => Option(r.get(0)))
    assert(out.toSeq == Seq(None, None, Some(3.0), Some(1.0)))
  }

  test("W8: repeat ×k produces contiguous sample_idx") {
    val out = Windows.repeatRows(Seq((0L, 1.0), (1L, 2.0)).toDF("idx", "v"), "idx", 3)
      .orderBy("sample_idx").select("sample_idx", "v").as[(Long, Double)].collect()
    assert(out.toSeq == Seq((0L, 1.0), (1L, 1.0), (2L, 1.0), (3L, 2.0), (4L, 2.0), (5L, 2.0)))
  }

  test("W9: first-over-threshold returns 0 sentinel when nothing exceeds") {
    val df = Seq((0L, "a", 1.0), (1L, "a", 9.0), (2L, "b", 1.0)).toDF("idx", "g", "v")
    val out = Windows.firstOverThreshold(df, "idx", col("v") > 5, Seq("g"))
      .orderBy("g").as[(String, Long)].collect()
    assert(out.toSeq == Seq(("a", 1L), ("b", 0L)))
  }

  test("W10: no-exceed group yields NO anomalies (reference 0-sentinel → empty set)") {
    val df = Seq((0L, "a", 1.0), (1L, "a", 9.0), (2L, "a", 1.0),
                 (0L, "b", 1.0), (1L, "b", 2.0)).toDF("idx", "g", "v")
    val out = Windows.untilFailure(df, "idx", col("v") > 5, Seq("g"))
      .orderBy("g", "idx").select("g", "anomaly").as[(String, Boolean)].collect()
    assert(out.toSeq == Seq(("a", false), ("a", true), ("a", true),
                            ("b", false), ("b", false)))
  }

  test("W11: target beyond last timestamp → first_idx = n, fraction 1.0") {
    val df = Seq((0L, 10L), (1L, 20L)).toDF("idx", "ts")
    val out = Windows.searchSorted(df, "idx", "ts", lit(99L))
      .as[(Long, Double)].head()
    assert(out == ((2L, 1.0)))
  }

  test("W12: islands groups adjacent indexes into [start, end+1) spans") {
    val df = Seq(1L, 2L, 3L, 7L, 8L, 12L).toDF("idx")
    val out = Windows.islands(df, "idx").orderBy("span_start")
      .as[(Long, Long)].collect()
    assert(out.toSeq == Seq((1L, 4L), (7L, 9L), (12L, 13L)))
  }

  test("W13: scalable cumsum equals sequential cumsum across bucket edges") {
    val vals = (0 until 250).map(i => (i.toLong, (i % 7).toDouble))
    val df = vals.toDF("idx", "v")
    val out = Windows.scalableCumSum(df, "idx", "v", bucketSize = 64)
      .orderBy("idx").select("cum").as[Double].collect()
    val expect = vals.map(_._2).scanLeft(0.0)(_ + _).tail
    out.zip(expect).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
  }

  test("W14: lag shift keeps first k values then shifts by k") {
    val df = (0 until 6).map(i => (i.toLong, i.toDouble)).toDF("idx", "v")
    val out = Windows.lagShift(df, "idx", "v", 2).orderBy("idx")
      .select("shifted").as[Double].collect()
    assert(out.toSeq == Seq(0.0, 1.0, 0.0, 1.0, 2.0, 3.0))
  }
}
