package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming._
import java.sql.Timestamp

/** Round-17 REPLAY-IDEMPOTENCE SWEEP over every transformWithState
  * processor. The r16 soak proved the defect class is real and
  * invisible to the batch hash gate (unique-id feeds never replay): a
  * re-delivered qualifying event re-entered BottomKProcessor's
  * ListState and took a second sample slot. r17 fixes the class
  * wholesale with [[graft.streaming.ReplayGuard]] — a per-key
  * high-water mark over event ids that drops re-delivered rows before
  * any fold — and this spec pins the property for all ten
  * UserEvent-keyed processors at once:
  *
  *  - FULL REPLAY: feeding the corpus twice must leave the memory
  *    sink byte-identical to feeding it once (a fully-replayed batch
  *    emits NOTHING — counters, rings, histograms, samples and
  *    leaderboards all unchanged).
  *  - OVERLAPPING REPLAY: a batch that re-delivers an already-
  *    committed prefix alongside new rows (the realistic at-least-once
  *    failure shape: a source resends from an older offset) must
  *    produce exactly the emissions of the clean, non-overlapping
  *    feed.
  *
  * Contract being exercised: event ids are a per-key-nondecreasing
  * delivery sequence (log offsets), so id ≤ mark ⟺ re-delivery. The
  * LSH index processor has its own replay pin in StreamingSpec
  * (membership by owner-min, no guard needed); the semantic-dedup
  * processor's state-level idempotence is pinned below. */
class Round17Spec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def withRocks[T](body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** 40 events, ids 1..40 in delivery (= event-time) order, 3 users,
    * mostly clicks (so the per-type processors see one deep key), one
    * view→purchase pair for the funnel, one 1000.0 spike so the
    * anomaly ring actually emits. */
  private lazy val feed: Seq[UserEvent] = (1L to 40L).map { i =>
    val typ = i match {
      case 33L => "view"
      case 36L => "purchase"
      case _ => "click"
    }
    val v = if (i == 40L) 1000.0 else i.toDouble
    UserEvent(i, ts(f"2024-01-01 00:${i}%02d:00"), i % 3 + 1, typ, v)
  }

  private var streamId = 900

  /** Run `build` over the given micro-batch sequence and return the
    * full memory-sink contents, canonically ordered. */
  private def runBatches(name: String, mode: String,
      build: Dataset[UserEvent] => DataFrame)(
      batches: Seq[Seq[UserEvent]]): Seq[String] = {
    streamId += 1
    val in = MemoryStream[UserEvent](spark, streamId)
    val q = build(in.toDS()).writeStream.format("memory").queryName(name)
      .outputMode(mode).start()
    batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
    q.stop()
    spark.table(name).collect().map(_.toString).sorted.toSeq
  }

  private val processors: Seq[(String, String, Dataset[UserEvent] => DataFrame)] = Seq(
    ("profile", "update", ds => Streams.userProfileTws(ds).toDF()),
    ("favorite", "update", ds => Streams.userFavoriteTws(ds).toDF()),
    ("funnel", "update", ds => Streams.funnelTws(ds).toDF()),
    ("anomaly", "append", ds => Streams.anomalyTws(ds).toDF()),
    ("topk", "update", ds => Streams.topKTws(ds).toDF()),
    ("bottomk", "update", ds => Streams.bottomKTws(ds).toDF()),
    ("quantile", "update", ds => Streams.quantileTws(ds).toDF()),
    ("ema", "update", ds => Streams.emaTws(ds).toDF()),
    ("drift", "update", ds => Streams.driftTws(ds).toDF()),
    ("idleevict", "append", ds => Streams.idleEvictTws(ds).toDF()))

  for ((name, mode, build) <- processors) {
    test(s"$name processor: full corpus replay emits nothing and changes no state") {
      withRocks {
        val once = runBatches(s"r17_${name}_once", mode, build)(Seq(feed))
        assert(once.nonEmpty, s"$name emitted nothing — the fixture has no signal")
        val replay = runBatches(s"r17_${name}_replay", mode, build)(Seq(feed, feed))
        assert(replay === once,
          s"$name is not replay-idempotent: a fully re-delivered batch changed the output")
      }
    }

    test(s"$name processor: an overlapping redelivery equals the clean feed") {
      withRocks {
        val (b1, b2) = feed.splitAt(25)
        val clean = runBatches(s"r17_${name}_clean", mode, build)(Seq(b1, b2))
        // batch 2 re-delivers all of batch 1 alongside the new rows —
        // the source-resent-from-an-old-offset shape
        val overlap = runBatches(s"r17_${name}_overlap", mode, build)(Seq(b1, feed))
        assert(overlap === clean,
          s"$name double-counted the re-delivered prefix of an overlapping batch")
      }
    }
  }

  test("semantic-dedup processor: replaying the corpus re-derives identical verdicts and grows no state") {
    withRocks {
      // two cells; vectors 2 and 3 are near-duplicates of vector 1
      // (cos = 1 on the shared direction), vector 10 is orthogonal
      val vecs = Seq(
        EmbRow(1L, 0, Array(1f, 0f, 0f)),
        EmbRow(2L, 0, Array(0.9f, 0.1f, 0f)),
        EmbRow(3L, 0, Array(1f, 0.05f, 0f)),
        EmbRow(10L, 1, Array(0f, 0f, 1f)),
        EmbRow(11L, 1, Array(0f, 0.1f, 0.99f)))
      streamId += 1
      val in = MemoryStream[EmbRow](spark, streamId)
      val q = Streams.semanticDedupTws(in.toDS()).toDF()
        .writeStream.format("memory").queryName("r17_sem_replay")
        .outputMode("append").start()
      in.addData(vecs: _*); q.processAllAvailable()
      val after1 = q.lastProgress.stateOperators.head.numRowsTotal
      val pass1 = spark.table("r17_sem_replay").collect().map(_.toString).sorted.toSeq
      in.addData(vecs: _*); q.processAllAvailable()
      val after2 = q.lastProgress.stateOperators.head.numRowsTotal
      q.stop()
      val all = spark.table("r17_sem_replay").collect().map(_.toString).toSeq
      // a re-seen id re-emits its verdict (append mode re-scores it
      // against the same smaller-id members) but must emit the SAME
      // verdict and must not rejoin the cell
      assert(all.sorted.distinct === pass1.distinct,
        "replay changed a semantic-dedup verdict")
      assert(after2 === after1,
        s"cell membership grew on replay ($after1 -> $after2)")
    }
  }
}
