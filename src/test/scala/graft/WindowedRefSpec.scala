package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Windowed

/** Randomized reference checks for the windowed kernels' boundary
  * behavior — seeded fixtures, compared against straight-line Scala
  * recomputations. The oracled gate queries exercise these operators on
  * ONE fixture shape; these cases force the edges the fixture may never
  * hit: points exactly at interval start (inclusive) and end
  * (exclusive), intervals aligned to bucket boundaries, intervals
  * spanning many buckets, degenerate end <= start intervals, and
  * same-timestamp session tie-breaks.
  */
class WindowedRefSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  test("rangeJoin equals the naive cross filter on random boundary-heavy fixtures") {
    import s.implicits._
    val bucketUs = 10L
    for (seed <- Seq(1, 2, 3, 4)) {
      val rnd = new scala.util.Random(seed)
      // timestamps cluster on multiples of the bucket size so exact
      // boundary hits are common, not astronomically rare
      def t(): Long = rnd.nextInt(12) * bucketUs + (if (rnd.nextBoolean()) 0L else rnd.nextInt(10))
      val pts = (1 to 60).map(id => (id.toLong, rnd.nextInt(3).toLong, t()))
      val ivs = (1 to 25).map { iid =>
        val st = t()
        // include degenerate (len 0) and multi-bucket (len up to 35 us) spans
        (iid.toLong, rnd.nextInt(3).toLong, st, st + rnd.nextInt(36).toLong)
      }
      val pdf = pts.toDF("pid", "k", "us")
        .select(col("pid"), col("k"), timestamp_micros(col("us")).as("ts"))
      val idf = ivs.toDF("iid", "k", "sus", "eus")
        .select(col("iid"), col("k"), timestamp_micros(col("sus")).as("w_start"),
                timestamp_micros(col("eus")).as("w_end"))
      val got = Windowed.rangeJoin(pdf, idf, key = "k", ts = "ts",
          start = "w_start", end = "w_end", bucketUs = bucketUs)
        .select(col("pid"), col("iid"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = (for {
        (pid, pk, pus) <- pts
        (iid, ik, st, en) <- ivs
        if pk == ik && pus >= st && pus < en
      } yield (pid, iid)).toSet
      assert(got === want, s"seed=$seed")
    }
  }

  test("sessionized equals the naive gap scan, same-ts rows tie-break by id") {
    import s.implicits._
    val gapUs = 15L
    for (seed <- Seq(5, 6, 7)) {
      val rnd = new scala.util.Random(seed)
      // duplicate timestamps on purpose: the tie-break column decides order
      val evs = (1 to 50).map(id => (id.toLong, rnd.nextInt(3).toLong,
        rnd.nextInt(8) * gapUs + (if (rnd.nextBoolean()) 0L else rnd.nextInt(20))))
      val df = evs.toDF("id", "k", "us")
        .select(col("id"), col("k"), timestamp_micros(col("us")).as("ts"))
      val got = Windowed.sessionized(df, key = "k", ts = "ts",
          tieBreak = "id", gapUs = gapUs)
        .select(col("id"), col("session_seq"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val want = evs.groupBy(_._2).flatMap { case (_, g) =>
        val ordered = g.sortBy(e => (e._3, e._1))
        var seq = 0L
        var prev = Long.MinValue
        ordered.map { case (id, _, us) =>
          if (prev == Long.MinValue || us - prev > gapUs) seq += 1
          prev = us
          id -> seq
        }
      }
      assert(got === want, s"seed=$seed")
    }
  }
}
