package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import scala.util.Random
import graft.operators.LogPipeline
import graft.pipeline.Dedup

/** Property-style invariants over seeded random inputs (SURVEY §5.2):
  * first-wins uniqueness (ST1), interval-join bound containment (J1),
  * set-size = distinct-count (A2), minhash self-similarity.
  */
class PropertySpec extends SparkSpecBase {
  import spark.implicits._

  private val rnd = new Random(42)

  private def randomEvents(n: Int, users: Int): Seq[(Long, Timestamp, Long, String)] =
    (1 to n).map { i =>
      (i.toLong,
        new Timestamp(1704067200000L + rnd.nextInt(1000000) * 1000L),
        rnd.nextInt(users).toLong,
        Seq("view", "click", "purchase")(rnd.nextInt(3)))
    }

  test("ST1: exactly one is_new=1 per user, on any input") {
    val ev = randomEvents(500, 37).toDF("event_id", "ts", "user_id", "event_type")
    val marked = LogPipeline.st1Transform(ev)
    val perUser = marked.groupBy("user_id").agg(sum("is_new").as("firsts"))
    assert(perUser.filter($"firsts" =!= 1L).count() == 0)
    assert(marked.count() == 500)
  }

  test("J1: every joined pair satisfies the interval bounds; none missed") {
    val o = (1 to 50).map(k => (k.toLong,
      new Timestamp(1704067200000L + rnd.nextInt(100000) * 1000L))).toDF("o_key", "o_ts")
    val l = (1 to 300).map { i => (rnd.nextInt(60).toLong,
      new Timestamp(1704067200000L + rnd.nextInt(200000) * 1000L), i.toLong)
    }.toDF("l_key", "l_ts", "l_id")
    val joined = o.join(l, $"l_key" === $"o_key" &&
      $"l_ts" >= $"o_ts" - expr("INTERVAL 30 SECONDS") &&
      $"l_ts" <= $"o_ts" + expr("INTERVAL 90 SECONDS"))
    val rows = joined.select($"o_ts", $"l_ts").as[(Timestamp, Timestamp)].collect()
    rows.foreach { case (ots, lts) =>
      val d = lts.getTime - ots.getTime
      assert(d >= -30000 && d <= 90000)
    }
    // exhaustive cross-check on the driver
    val om = o.as[(Long, Timestamp)].collect()
    val lm = l.as[(Long, Timestamp, Long)].collect()
    val expected = (for {
      (ok, ots) <- om; (lk, lts, _) <- lm
      if lk == ok && lts.getTime >= ots.getTime - 30000 && lts.getTime <= ots.getTime + 90000
    } yield 1).size
    assert(rows.length == expected)
  }

  test("A2: size(collect_set) == countDistinct on any grouping") {
    val df = (1 to 2000).map(_ => (rnd.nextInt(11), rnd.nextInt(97))).toDF("k", "u")
    val a = df.groupBy("k").agg(size(collect_set($"u")).cast("long").as("ct"))
    val b = df.groupBy("k").agg(countDistinct($"u").as("ct"))
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("prefix-filtered bag-Jaccard == exhaustive token join, random corpora with planted dups") {
    // vocabulary with a Zipf-ish head so hot tokens exercise the rarest-
    // first prefix ordering; planted mutations create J>=0.5 pairs
    def corpus(seed: Int): Seq[(Long, String, String)] = {
      val r = new Random(seed)
      def word() = if (r.nextInt(3) == 0) s"hot${r.nextInt(3)}" else s"w${r.nextInt(200)}"
      val base = (0 until 60).map { i =>
        (i.toLong, s"s${i % 3}", (0 until 8 + r.nextInt(20)).map(_ => word()).mkString(" "))
      }
      val mutated = (0 until 20).map { i =>
        val (id, src, text) = base(r.nextInt(base.length))
        val ws = text.split(" ").toSeq
        val drop = r.nextInt(1 + ws.length / 4)
        (100L + i, src, (ws.drop(drop) ++ Seq.fill(r.nextInt(3))(word())).mkString(" "))
      }
      base ++ mutated
    }
    Seq(7, 21, 99).foreach { seed =>
      val df = corpus(seed).toDF("doc_id", "source", "text")
      val fast = Dedup.ngramJaccardPrefixFrom(df).as[(Long, Long, Double)].collect().toSet
      val slow = Dedup.ngramJaccardExhaustiveFrom(df).as[(Long, Long, Double)].collect().toSet
      assert(fast == slow, s"seed=$seed prefix filter diverged:\n missing=${slow -- fast}\n extra=${fast -- slow}")
      assert(slow.nonEmpty, s"seed=$seed fixture planted no qualifying pairs")
    }
  }

  test("minhash: identical text → identical signature; est self-similarity 1") {
    val words = (1 to 40).map(i => s"w${rnd.nextInt(30)}").mkString(" ")
    val df = Seq((1L, words), (2L, words)).toDF("doc_id", "text")
    val sigs = df.select($"doc_id", Dedup.minhashSignature($"text").as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L).length == Dedup.NumHashes)
  }
}
