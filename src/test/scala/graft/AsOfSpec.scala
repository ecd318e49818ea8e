package graft

import graft.operators.AsOf
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** As-of join semantics on a hand-built timeline with known answers. */
class AsOfSpec extends AnyFunSuite {
  lazy val spark = Tables.session(4)
  import spark.implicits._

  test("as-of picks the latest right row at or before each left ts") {
    val quotes = Seq( // key, ts, px
      ("A", 10L, 1.0), ("A", 20L, 2.0), ("A", 30L, 3.0),
      ("B", 15L, 9.0)).toDF("sym", "qts", "px")
    val trades = Seq( // key, ts, qty
      ("A", 5L, 100L),  // before any quote -> null
      ("A", 20L, 200L), // exactly at quote 20 -> 2.0 (>= semantics)
      ("A", 25L, 300L), // between 20 and 30 -> 2.0
      ("A", 99L, 400L), // after all -> 3.0
      ("B", 14L, 500L), // before B's quote -> null
      ("B", 16L, 600L)  // -> 9.0
    ).toDF("sym", "tts", "qty")
    val got = AsOf.join(trades, quotes, "sym", "sym", "tts", "qts")
      .select(col("sym"), col("tts"), col("qty"), col("payload.px").as("px"))
      .orderBy("sym", "tts")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(got.toSeq == Seq(
      ("A", 5L, None), ("A", 20L, Some(2.0)), ("A", 25L, Some(2.0)), ("A", 99L, Some(3.0)),
      ("B", 14L, None), ("B", 16L, Some(9.0))))
  }

  test("left rows survive for keys with no right rows at all") {
    val left = Seq(("Z", 1L, 1)).toDF("k", "t", "v")
    val right = Seq(("A", 1L, 2)).toDF("k", "t", "w")
    val got = AsOf.join(left, right, "k", "k", "t", "t").collect()
    assert(got.length == 1 && got.head.isNullAt(3))
  }

  test("forward as-of picks the earliest right row at or after each left ts") {
    val quotes = Seq(
      ("A", 10L, 1.0), ("A", 20L, 2.0), ("A", 30L, 3.0),
      ("B", 15L, 9.0)).toDF("sym", "qts", "px")
    val trades = Seq(
      ("A", 5L, 100L),  // next quote 10 -> 1.0
      ("A", 20L, 200L), // exactly at 20 -> 2.0 (>= semantics)
      ("A", 25L, 300L), // next is 30 -> 3.0
      ("A", 99L, 400L), // nothing after -> null
      ("B", 16L, 600L)  // nothing after -> null
    ).toDF("sym", "tts", "qty")
    val got = AsOf.joinForward(trades, quotes, "sym", "sym", "tts", "qts")
      .select(col("sym"), col("tts"), col("payload.px").as("px"))
      .orderBy("sym", "tts")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(got.toSeq == Seq(
      ("A", 5L, Some(1.0)), ("A", 20L, Some(2.0)), ("A", 25L, Some(3.0)),
      ("A", 99L, None), ("B", 16L, None)))
  }
}
