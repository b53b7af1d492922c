package graft

import org.apache.spark.sql.functions._
import graft.sources.GraftAcid
import graft.streaming.{AnchorIndexProcessor, AnchorRow, TwsAnchorHit}

/** Round-19 pins, one per r18 verdict ask / ADVICE item:
  *
  *  - COMMIT ATOMICITY (ADVICE): `commit` now publishes via
  *    `Files.createLink` — atomic fail-if-exists AT THE SYSCALL. Two
  *    writers racing the SAME version concurrently: exactly one wins
  *    every iteration, the loser throws, and the winner's manifest
  *    bytes survive (the r18 `Files.move` shape had a check-then-act
  *    window where the loser silently overwrote the winner).
  *  - KEY CONTRACT (ADVICE): non-integral key types fail at create;
  *    NULL keys fail the write's stats pass — never silent truncation
  *    or an NPE-misclassified pruning range.
  *  - MERGE SOURCE UNIQUENESS (ask #6): duplicate source keys throw
  *    (the Delta/Iceberg multiple-matches contract); mergeLatest keeps
  *    accepting duplicate KEYS but rejects duplicate (key, seq) pairs.
  *  - STREAMING CDF TAIL (ask #1): a tailChanges restart resumes from
  *    the checkpointed manifest offset — commits landed before the
  *    stop are not re-emitted, commits after it are not lost.
  *  - OPTIMIZE ZORDER (ask #7): the maintenance commit is
  *    data-identical AND a filter on either clustered dimension reads
  *    fewer data files than the snapshot holds (footer-stat pruning).
  *  - ANCHOR >CAP BOUNDARY (ask #5): with the chunk cap lowered, a
  *    doc_id inversion across a chunk boundary claims silently (the
  *    documented cross-micro-batch degradation); within one chunk the
  *    same rows produce the batch-global-order hit.
  */
class Round19Spec extends SparkSuite {
  import spark.implicits._

  private def freshRoot(name: String): String = {
    val root = s"${sys.props("java.io.tmpdir")}/graft_acid_spec/$name"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    root
  }

  // ── commit: atomic fail-if-exists under true concurrency ──────────

  test("acid: concurrent same-version commits — exactly one winner, winner's bytes survive") {
    val root = freshRoot("race19")
    GraftAcid.create(spark, root, Seq((1L, "a")).toDF("k", "v"), "k", nFiles = 1)
    val m0 = GraftAcid.readManifest(root, 0)
    for (round <- 1 to 20) {
      val v = round // version being raced this iteration
      val barrier = new java.util.concurrent.CyclicBarrier(2)
      val outcomes = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val threads = Seq("A", "B").map { who =>
        new Thread(() => {
          barrier.await()
          try {
            GraftAcid.commit(root, m0.copy(version = v, op = s"writer$who"))
            outcomes.add(s"win:$who")
          } catch {
            case _: GraftAcid.CommitConflictException => outcomes.add(s"lose:$who")
          }
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      val res = { import scala.jdk.CollectionConverters._; outcomes.asScala.toSeq }
      assert(res.count(_.startsWith("win:")) === 1, s"round $round: $res")
      assert(res.count(_.startsWith("lose:")) === 1, s"round $round: $res")
      // the committed manifest is the WINNER's, intact — not the
      // loser's late overwrite
      val winner = res.find(_.startsWith("win:")).get.drop(4)
      assert(GraftAcid.readManifest(root, v).op === s"writer$winner")
    }
  }

  // ── key contract: integral type at create, non-null at write ──────

  test("acid: create rejects a non-integral key column") {
    val root = freshRoot("keytype")
    val df = Seq((1.5, "a")).toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      GraftAcid.create(spark, root, df, "k")
    }
    assert(e.getMessage.contains("integral"))
  }

  test("acid: a NULL key fails the write's stats pass, not a later merge") {
    val root = freshRoot("keynull")
    val df = Seq[(java.lang.Long, String)]((1L, "a"), (null, "b")).toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      GraftAcid.create(spark, root, df, "k")
    }
    assert(e.getMessage.contains("NULL"))
  }

  // ── merge source-key contracts ─────────────────────────────────────

  test("acid: merge rejects duplicate source keys; mergeLatest resolves them by seq") {
    val root = freshRoot("dupkeys")
    GraftAcid.create(spark, root,
      Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("k", "v", "seq"), "k", nFiles = 1)
    val dupSource = Seq((2L, "x", 30L), (2L, "y", 40L)).toDF("k", "v", "seq")
    val e = intercept[IllegalArgumentException] {
      GraftAcid.merge(spark, root, dupSource, "k")
    }
    assert(e.getMessage.contains("duplicate keys"))
    assert(GraftAcid.latestVersion(root) === 0) // nothing committed
    // mergeLatest accepts duplicate keys — highest seq wins
    GraftAcid.mergeLatest(spark, root, dupSource, "k", "seq")
    val row = GraftAcid.read(spark, root).filter($"k" === 2L).head()
    assert(row.getString(1) === "y" && row.getLong(2) === 40L)
    // ... but duplicate (key, seq) pairs make the winner arbitrary → reject
    val dupPair = Seq((2L, "p", 50L), (2L, "q", 50L)).toDF("k", "v", "seq")
    val e2 = intercept[IllegalArgumentException] {
      GraftAcid.mergeLatest(spark, root, dupPair, "k", "seq")
    }
    assert(e2.getMessage.contains("(k, seq)"))
  }

  // ── streaming CDF tail: checkpointed resume, no dup / no loss ─────

  test("acid: tailChanges restart resumes from the checkpoint — no duplicate, no lost commits") {
    val root = freshRoot("cdftail")
    val base = freshRoot("cdftail_work")
    GraftAcid.create(spark, root,
      (1L to 20L).map(k => (k, s"n$k", (k % 3).toInt)).toDF("k", "name", "grp"),
      "k", nFiles = 2)
    GraftAcid.delete(spark, root, col("grp") === 1) // v1
    GraftAcid.tailChanges(spark, root, s"$base/sink", s"$base/ck")
      .awaitTermination()
    def sinkByVersion(): Map[Int, Long] =
      spark.read.parquet(s"$base/sink").groupBy("commit_version").count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val after1 = sinkByVersion()
    assert(after1.keySet === Set(0, 1))
    assert(after1(0) === 20L) // v0: all-inserts
    assert(after1(1) === GraftAcid.commitChanges(spark, root, 1).count())
    // two more commits AFTER the first tail run stopped
    GraftAcid.merge(spark, root,
      Seq((2L, "upd", 9), (99L, "ins", 9)).toDF("k", "name", "grp"), "k") // v2
    GraftAcid.compact(spark, root) // v3 — data-identical: zero change rows
    GraftAcid.tailChanges(spark, root, s"$base/sink", s"$base/ck")
      .awaitTermination()
    val after2 = sinkByVersion()
    // v0/v1 counts UNCHANGED (not re-emitted), v2 present, v3 empty
    assert(after2.get(0) === after1.get(0) && after2.get(1) === after1.get(1))
    assert(after2.get(2) === Some(2L)) // one update + one insert
    assert(!after2.contains(3))
    // and the v2 change rows classify correctly
    val v2 = spark.read.parquet(s"$base/sink").filter($"commit_version" === 2)
      .select($"change_type", $"k").as[(String, Long)].collect().toSet
    assert(v2 === Set(("update", 2L), ("insert", 99L)))
  }

  // ── OPTIMIZE ZORDER: data identity + file pruning ─────────────────

  test("acid: optimizeZorder is data-identical and prunes files on both clustered dims") {
    val root = freshRoot("zorder19")
    // two independent dims: a filter on either should skip files
    val df = (0L until 4096L).map(i => (i, (i * 2654435761L) % 4096L, i % 7))
      .toDF("a", "b", "grp")
    GraftAcid.create(spark, root, df, "a", nFiles = 16)
    val before = GraftAcid.read(spark, root).agg(sum($"a"), sum($"b")).head()
    GraftAcid.optimizeZorder(spark, root, Seq("a", "b"), nFiles = 16)
    assert(GraftAcid.readManifest(root, 1).op === "optimize_zorder")
    val cur = GraftAcid.read(spark, root)
    val after = cur.agg(sum($"a"), sum($"b")).head()
    assert(after === before) // rewrite changed layout only
    val total = GraftAcid.readManifest(root, 1).files.size
    assert(total === 16)
    def filesTouched(pred: org.apache.spark.sql.Column): Long =
      cur.filter(pred).select(input_file_name()).distinct().count()
    // a 1/16 range slice on each dim: a z-layout with 8 bucket bits
    // across 2 dims keeps either dim's slice inside a minority of files
    assert(filesTouched($"a" >= 0L && $"a" < 256L) < total / 2)
    assert(filesTouched($"b" >= 0L && $"b" < 256L) < total / 2)
    // the pre-optimize layout (key-ranged on a) could NOT prune on b:
    val v0 = GraftAcid.read(spark, root, Some(0))
    assert(v0.filter($"b" >= 0L && $"b" < 256L)
      .select(input_file_name()).distinct().count() === 16L)
  }

  // ── RESTORE: metadata-only undo that moves the log forward ────────

  test("acid: restore re-commits the target's file list — zero data movement, undo stays readable") {
    val root = freshRoot("restore19")
    GraftAcid.create(spark, root,
      (1L to 30L).map(k => (k, (k % 3).toInt)).toDF("k", "grp"), "k", nFiles = 2)
    GraftAcid.delete(spark, root, col("grp") === 0)
    GraftAcid.restore(spark, root, 0)
    // latest state == v0, via v0's own immutable files (no rewrite)
    assert(GraftAcid.read(spark, root).count() === 30L)
    assert(GraftAcid.readManifest(root, 2).files ===
      GraftAcid.readManifest(root, 0).files)
    // the log moved FORWARD: the deleted state (v1) stays readable,
    // so the restore is itself undoable
    assert(GraftAcid.read(spark, root, Some(1)).count() === 20L)
    assert(GraftAcid.restore(spark, root, 1) === 3)
    assert(GraftAcid.read(spark, root).count() === 20L)
  }

  // ── TmpRoots: age-gated sibling sweep ──────────────────────────────

  test("tmp roots: stale same-prefix siblings are swept, fresh ones kept") {
    val parent = new java.io.File(
      s"${sys.props("java.io.tmpdir")}/graft_tmproots_spec")
    org.apache.commons.io.FileUtils.deleteQuietly(parent)
    val stale = new java.io.File(parent, "spec_app-OLD")
    val fresh = new java.io.File(parent, "spec_app-FRESH")
    val other = new java.io.File(parent, "otherprefix-OLD")
    Seq(stale, fresh, other).foreach(_.mkdirs())
    val threeHoursAgo = System.currentTimeMillis() - 3L * 3600 * 1000
    stale.setLastModified(threeHoursAgo)
    other.setLastModified(threeHoursAgo)
    TmpRoots.register(new java.io.File(parent, "spec_app-ME").getPath, "spec_")
    assert(!stale.exists(), "stale same-prefix sibling must be swept")
    assert(fresh.exists(), "fresh sibling must survive (live-JVM guard)")
    assert(other.exists(), "different-prefix entries are not ours to sweep")
  }

  // ── CDF across a schema-evolution commit ──────────────────────────

  test("acid: changes() across mergeEvolve sees updates in the NEW column (union-schema images)") {
    val root = freshRoot("cdfevo")
    GraftAcid.create(spark, root,
      Seq((1L, "a"), (2L, "b")).toDF("k", "v"), "k", nFiles = 1)
    // evolve: key 2 keeps v but gains tier — the OLD projection saw
    // identical (v) images and classified this "unchanged"
    GraftAcid.mergeEvolve(spark, root,
      Seq((2L, "b", "T1")).toDF("k", "v", "tier"), "k")
    val ch = GraftAcid.changes(spark, root, 0, 1)
      .select($"k", $"change_type", $"pre.tier".as("pre_tier"),
        $"post.tier".as("post_tier"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.getString(2)), Option(r.getString(3)))).toSet
    assert(ch === Set((2L, "update", None, Some("T1"))))
    // and a doubly-evolved diff in the OTHER direction (pre has the
    // column, post unchanged) stays symmetric: no spurious rows
    assert(GraftAcid.changes(spark, root, 1, 1).count() === 0L)
  }

  // ── AnchorIndexProcessor: the >cap chunk boundary, both sides ─────

  test("anchor fold: cross-chunk doc inversion degrades to cross-batch claim; within-cap is batch-global") {
    def run(rows: Seq[AnchorRow], cap: Int)
        : (Seq[TwsAnchorHit], Map[Long, Long]) = {
      val state = scala.collection.mutable.Map[Long, Long]()
      val hits = AnchorIndexProcessor.fold(rows.iterator, cap,
        k => state.getOrElse(k, Long.MaxValue),
        (k, v) => state(k) = v).toSeq
      (hits, state.toMap)
    }
    // doc 5 sees anchor key 100 in chunk 1; doc 3 (SMALLER id) sees the
    // same key in chunk 2 — the arrival-order inversion the boundary is
    // about. Key 7 pads chunk 1 to the cap.
    val rows = Seq(AnchorRow(5L, 0L, 100L), AnchorRow(9L, 0L, 7L),
      AnchorRow(3L, 0L, 100L))
    // cap=2 → [(5,100),(9,7)] then [(3,100)]: doc 5 claims first, doc 3
    // RE-CLAIMS silently (no retro-hit for doc 5) — exactly the
    // documented cross-micro-batch contract at a chunk boundary
    val (hitsSplit, stateSplit) = run(rows, cap = 2)
    assert(hitsSplit.isEmpty)
    assert(stateSplit(100L) === 3L) // ownership still converges to min doc
    // same rows inside ONE chunk: the sort restores (doc_id, pos) order
    // and doc 5's anchor emits against owner 3 — the batch oracle's rule
    val (hitsOne, stateOne) = run(rows, cap = 1 << 20)
    assert(hitsOne === Seq(TwsAnchorHit(5L, 0L, 3L)))
    assert(stateOne(100L) === 3L)
  }
}
