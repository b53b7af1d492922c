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

  // ── cross-doc exact-substring dedup (Lee et al. 2022) ─────────────

  private def writeDocs(dir: String, docs: Seq[(Long, String)]): Unit =
    docs.map { case (id, t) => (id, t, "en", "fixture", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

  test("dedup_substring_spans cuts exactly the cross-doc duplicated run and preserves everything else") {
    val shared = (1 to 12).map(i => s"S$i").mkString(" ") // 12-token duplicated run
    val d1 = ((1 to 5).map(i => s"u$i") ++ Seq(shared) ++ (1 to 3).map(i => s"v$i")).mkString(" ")
    val d2 = ((1 to 2).map(i => s"w$i") ++ Seq(shared) ++ (1 to 6).map(i => s"x$i")).mkString(" ")
    val d3 = (1 to 20).map(i => s"z$i").mkString(" ") // no cross-doc content
    val dir = java.nio.file.Files.createTempDirectory("r17sub").toString
    writeDocs(dir, Seq((1L, d1), (2L, d2), (3L, d3)))
    val spans = graft.operators.DedupQueries6.queries("dedup_substring_spans")(spark, dir)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("span_start"),
        r.getAs[Long]("span_end"), r.getAs[Long]("span_tokens"))).toSeq
    // each sharing doc gets ONE maximal span covering exactly the
    // 12-token run (5 anchors merged); the unique doc gets none
    assert(spans === Seq((1L, 5L, 17L, 12L), (2L, 2L, 14L, 12L)),
      s"unexpected span map: $spans")
    // surgical removal: cut the span tokens, keep the rest in order
    def cut(text: String, s: Long, e: Long): String = {
      val t = text.split(" ")
      (t.take(s.toInt) ++ t.drop(e.toInt)).mkString(" ")
    }
    val cut1 = cut(d1, 5, 17)
    val cut2 = cut(d2, 2, 14)
    // non-duplicated content survives the cut verbatim
    assert(cut1 === ((1 to 5).map(i => s"u$i") ++ (1 to 3).map(i => s"v$i")).mkString(" "))
    assert(cut2 === ((1 to 2).map(i => s"w$i") ++ (1 to 6).map(i => s"x$i")).mkString(" "))
    // and the cut corpus has NO remaining cross-doc span of length ≥ 8
    val dir2 = java.nio.file.Files.createTempDirectory("r17sub2").toString
    writeDocs(dir2, Seq((1L, cut1), (2L, cut2), (3L, d3)))
    val residual = graft.operators.DedupQueries6
      .queries("dedup_substring_spans")(spark, dir2).count()
    assert(residual === 0L, "removal left a cross-doc duplicated span behind")
    // removal census agrees with the span map
    val census = graft.operators.DedupQueries6
      .queries("dedup_substring_removal")(spark, dir)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("dup_tokens"), r.getAs[Long]("kept_tokens"))).toSeq
    assert(census === Seq((1L, 20L, 12L, 8L), (2L, 20L, 12L, 8L)))
  }

  test("overlapping duplicated anchors merge into one maximal span, disjoint runs stay separate") {
    // doc 1 carries TWO duplicated runs separated by unique filler;
    // docs 2/3 each share one of them — the island merge must emit
    // two disjoint spans for doc 1, not one and not five
    val runA = (1 to 9).map(i => s"A$i").mkString(" ")  // 9 tokens → 2 anchors
    val runB = (1 to 8).map(i => s"B$i").mkString(" ")  // 8 tokens → 1 anchor
    val d1 = (Seq(runA) ++ (1 to 10).map(i => s"f$i") ++ Seq(runB)).mkString(" ")
    val d2 = (Seq(runA) ++ (1 to 8).map(i => s"g$i")).mkString(" ")
    val d3 = ((1 to 8).map(i => s"h$i") ++ Seq(runB)).mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("r17sub3").toString
    writeDocs(dir, Seq((1L, d1), (2L, d2), (3L, d3)))
    val spans = graft.operators.DedupQueries6.queries("dedup_substring_spans")(spark, dir)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("span_start"),
        r.getAs[Long]("span_end"))).toSeq
    assert(spans === Seq((1L, 0L, 9L), (1L, 19L, 27L), (2L, 0L, 9L), (3L, 8L, 16L)),
      s"unexpected span map: $spans")
  }

  // ── mGWS ops: same replay contract as the TWS processors ──────────

  test("userRunningProfile (mapGroupsWithState) ignores re-delivered ids") {
    import graft.streaming.{UserEvent, UserProfile}
    val mk = (i: Long) => UserEvent(i, ts(f"2024-01-01 00:${i}%02d:00"), 7, "click", i.toDouble)
    val all = (1L to 12L).map(mk)
    streamId += 1
    val in = MemoryStream[UserEvent](spark, streamId)
    val q = Streams.userRunningProfile(in.toDS())
      .writeStream.format("memory").queryName("r17_mgws_profile")
      .outputMode("update").start()
    in.addData(all: _*); q.processAllAvailable()
    // redeliver the whole feed plus two fresh events — only the fresh
    // ones may fold
    in.addData(all ++ Seq(mk(13L), mk(14L)): _*); q.processAllAvailable()
    q.stop()
    val last = spark.table("r17_mgws_profile")
      .as[UserProfile].collect().maxBy(_.n_events)
    assert(last === UserProfile(7L, 14L, (1L to 14L).map(_.toDouble).sum, "click"),
      s"replayed prefix double-counted: $last")
  }

  test("valueAlerts (flatMapGroupsWithState) fires no phantom alerts on replay") {
    import graft.streaming.{UserEvent, ValueAlert}
    val mk = (i: Long) => UserEvent(i, ts(f"2024-01-01 00:${i}%02d:00"), 9, "click", 60.0)
    streamId += 1
    val in = MemoryStream[UserEvent](spark, streamId)
    val q = graft.streaming.Streams.valueAlerts(in.toDS(), step = 100.0)
      .writeStream.format("memory").queryName("r17_mgws_alerts")
      .outputMode("append").start()
    in.addData(mk(1), mk(2)); q.processAllAvailable() // cum 120: one crossing
    val afterOnce = spark.table("r17_mgws_alerts").as[ValueAlert].collect().toSeq
    // full redelivery: cum must NOT climb to 240 and fire a phantom
    in.addData(mk(1), mk(2)); q.processAllAvailable()
    val afterReplay = spark.table("r17_mgws_alerts").as[ValueAlert].collect().toSeq
    // a fresh event still folds on top of the guarded state
    in.addData(mk(3)); q.processAllAvailable() // cum 180: no new crossing
    in.addData(mk(4)); q.processAllAvailable() // cum 240: crossing at 2
    q.stop()
    val fin = spark.table("r17_mgws_alerts").as[ValueAlert].collect().toSeq
    assert(afterOnce === Seq(ValueAlert(9, 1, 2)))
    assert(afterReplay === afterOnce, s"phantom alert on replay: $afterReplay")
    assert(fin.sortBy(_.threshold_multiple) ===
      Seq(ValueAlert(9, 1, 2), ValueAlert(9, 2, 4)), s"fresh events lost: $fin")
  }

  // ── persisted-index ANN round-trip (build-once / query-many) ──────

  test("sim_knn_ivf_persist: probe side scans only the probed buckets and never shuffles the index") {
    import org.apache.spark.sql.execution.FormattedMode
    // a serving deployment pins the bucketed layout on (the scan-only
    // auto-bucketed-scan heuristic would flatten it when no shuffle is
    // being avoided — but pruning IS the point here)
    val autoKey = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prevAuto = spark.conf.get(autoKey)
    spark.conf.set(autoKey, "false")
    try {
      val probe = graft.operators.SimilarityQueries2.ivfPersistProbe(spark, sf)
      val plan = probe.queryExecution.explainString(FormattedMode)
      // bucket pruning engaged: only NProbe-worth of the 8 cell
      // buckets is read (5 queries × 2 probes can touch ≤ 8 distinct
      // cells; on this corpus they collapse to a strict subset)
      val sel = "SelectedBucketsCount: (\\d+) out of 8".r
        .findFirstMatchIn(plan)
      assert(sel.isDefined, s"no bucket pruning in probe plan:\n$plan")
      assert(sel.get.group(1).toInt < 8,
        s"probe read every bucket — pruning vacuous:\n$plan")
      // the index side never moves: broadcast join, zero shuffle
      // exchanges anywhere in the probe fragment
      assert(plan.contains("BroadcastHashJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"),
        s"probe fragment shuffles the index:\n$plan")
      // and the served top-k equals the oracle-checked gate output
      val rows = graft.operators.SimilarityQueries2
        .queries("sim_knn_ivf_persist")(spark, sf).collect()
      assert(rows.length === 25) // 5 queries × top-5
      assert(rows.forall(_.getAs[Long]("vec_id") != -1L))
    } finally spark.conf.set(autoKey, prevAuto)
  }

  // ── unigram-LM tokenizer trainer (SentencePiece, Kudo 2018) ───────

  test("unigram trainer: segmentations reassemble their words, use only vocab pieces, and keep the char floor") {
    val vocab = graft.operators.TextQueries11
      .queries("text_unigram_vocab")(spark, sf)
      .collect().map(r => (r.getAs[String]("p"), r.getAs[Long]("c"))).toMap
    val segs = graft.operators.TextQueries11
      .queries("text_unigram_segment")(spark, sf)
      .collect().map(r => (r.getAs[String]("w"), r.getAs[Long]("k"),
        r.getAs[String]("seg"))).toSeq
    assert(segs.nonEmpty)
    segs.foreach { case (w, k, seg) =>
      val pieces = seg.split("\\|").toSeq
      assert(pieces.mkString("") === w, s"segmentation of '$w' does not reassemble: $seg")
      assert(pieces.size.toLong === k)
      assert(pieces.forall(p => p.length == 1 || vocab.contains(p)),
        s"'$w' uses a multi-char piece outside the pruned vocab: $seg")
    }
    // coverage floor: every character of the corpus words is representable
    val chars = segs.flatMap(_._1.toSeq).map(_.toString).toSet
    val vocabChars = vocab.keySet.filter(_.length == 1)
    assert(chars.subsetOf(vocabChars),
      s"missing character floor: ${chars.diff(vocabChars)}")
    // the EM actually induced subword structure: some word segments
    // with a multi-char piece, and coverage is visible in the curve
    assert(segs.exists(_._3.split("\\|").exists(_.length >= 2)),
      "no multi-char piece survived training — degenerate char-shatter")
    val curve = graft.operators.TextQueries11
      .queries("text_unigram_train")(spark, sf)
      .collect().map(r => (r.getAs[Long]("round"), r.getAs[Long]("n_multi"),
        r.getAs[Long]("cov_milli"))).toSeq
    assert(curve.map(_._1) === Seq(1L, 2L, 3L))
    assert(curve.forall(c => c._2 > 0 && c._3 > 0),
      s"training curve shows no multi-char coverage: $curve")
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
