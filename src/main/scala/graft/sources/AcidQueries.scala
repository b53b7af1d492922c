package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.OracleParity._

/** Gate entries over [[GraftAcid]] — the ACID/time-travel coverage the
  * reference environment gets from a managed table format (the r17
  * verdict ask #3; the reference's own future-work DLQ/replay notes,
  * `/root/reference/README.md:215`, are its closest analogue of
  * reprocessable history).
  *
  * One deterministic commit chain per (session, dir), built once and
  * read by all four entries (the memoized-substrate discipline):
  *
  *  - v0 CREATE — the customer table, keyed by c_custkey, 8
  *    range-partitioned files.
  *  - v1 DELETE — `c_mktsegment = 'BUILDING'` (copy-on-write: only
  *    files holding a BUILDING row are rewritten).
  *  - v2 MERGE — source = every ORIGINAL customer with
  *    c_custkey % 7 = 0, acctbal bumped +100.00 (exact DECIMAL
  *    arithmetic) and segment re-labeled 'MERGED'. Keys deleted at v1
  *    re-enter as inserts; surviving keys are updated in place —
  *    both MERGE arms (matched-update, unmatched-insert) exercised.
  *  - v3 COMPACT — the v2 snapshot rewritten into 2 files;
  *    data-identical, so the v3 oracle equals the v2 state (which is
  *    exactly what makes compaction hash-gateable).
  *
  * Every oracle replays the chain's STATE ALGEBRA in SQL over the
  * original parquet (delete = filter; merge = anti-join ∪ source), so
  * a hash match proves the manifest log reconstructs each snapshot
  * bit-for-bit. Round18Spec separately pins the properties SQL can't
  * express: snapshot isolation under concurrent commits, optimistic-
  * concurrency conflicts, and merge's file-level pruning.
  */
object AcidQueries {
  type Q = (SparkSession, String) => DataFrame

  /** The merge source, shared by the chain builder and (in SQL) the
    * oracles: original customers with c_custkey % 7 = 0, +100.00. */
  private def mergeSource(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    customer(s, d).filter($"c_custkey" % 7 === 0)
      .select($"c_custkey", $"c_name", $"c_nationkey",
        (dec($"c_acctbal") + dec(lit(100.0))).cast("double").as("c_acctbal"),
        lit("MERGED").as("c_mktsegment"))
  }

  // All ensure* memos key on the shared SparkContext, NOT the calling
  // SparkSession (r20 optimization): the streaming gate entries each
  // run on an isolated CHILD session (StreamingQueries.streamSession),
  // so a session-keyed memo missed on every stream_acid_* invocation
  // and rebuilt the whole on-disk chain (create/delete/merge/compact,
  // ~30 jobs ≈ 2 s) per run. The chains live on disk under an
  // applicationId-stamped root — context-wide sharing is exactly their
  // isolation granularity; the builders' output is deterministic
  // (range-partitioned writes, fixed nFiles) regardless of which
  // session's conf builds first.
  private val chainMemo =
    new java.util.concurrent.ConcurrentHashMap[(org.apache.spark.SparkContext, String), String]()

  /** Build (once per context × dir) the v0→v3 chain; returns the table
    * root. Dir-keyed SHA suffix: same aliasing guard as the bucketed
    * warehouse (two sfDirs in one session get independent tables). */
  private[graft] def ensureChain(s: SparkSession, d: String): String =
    chainMemo.computeIfAbsent((s.sparkContext, d), { _ =>
      val sfx = java.security.MessageDigest.getInstance("SHA-256")
        .digest(d.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .take(8).map(b => f"$b%02x").mkString
      // applicationId rides the path (the stream_cdc_upsert guard):
      // two JVMs on one host (a Bench and a Verify run) must never
      // clobber each other's chains mid-read; TmpRoots deletes this
      // run's roots at JVM exit and sweeps >2h-stale siblings from
      // crashed runs (r18 ADVICE — prior runs' copies used to
      // accumulate under tmpdir forever)
      val root = graft.TmpRoots.register(
        s"${sys.props("java.io.tmpdir")}/graft_acid/" +
          s"cust_${sfx}_${s.sparkContext.applicationId}", "cust_")
      // always rebuild on first touch per (session, dir): a chain left
      // by an earlier run could predate the current chain semantics
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      GraftAcid.create(s, root, customer(s, d), "c_custkey")
      GraftAcid.delete(s, root, col("c_mktsegment") === "BUILDING")
      GraftAcid.merge(s, root, mergeSource(s, d), "c_custkey")
      GraftAcid.compact(s, root)
      root
    })

  private val evoMemo =
    new java.util.concurrent.ConcurrentHashMap[(org.apache.spark.SparkContext, String), String]()

  /** Separate table for the SCHEMA-EVOLUTION entry (its own root so
    * the main chain's pinned version numbers stay stable): v0 =
    * customer; v1 = mergeEvolve with a source carrying the NEW
    * `c_tier` column for every %5 key — untouched files are not
    * rewritten (evolution is metadata-only for them; the explicit-
    * schema scan null-fills), upserted rows carry the tier. */
  private[graft] def ensureEvo(s: SparkSession, d: String): String =
    evoMemo.computeIfAbsent((s.sparkContext, d), { _ =>
      import s.implicits._
      val sfx = java.security.MessageDigest.getInstance("SHA-256")
        .digest(d.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .take(8).map(b => f"$b%02x").mkString
      val root = graft.TmpRoots.register(
        s"${sys.props("java.io.tmpdir")}/graft_acid/" +
          s"evo_${sfx}_${s.sparkContext.applicationId}", "evo_")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      GraftAcid.create(s, root, customer(s, d), "c_custkey")
      val src = customer(s, d).filter($"c_custkey" % 5 === 0)
        .select($"c_custkey", $"c_name", $"c_nationkey", $"c_acctbal",
          lit("EVOLVED").as("c_mktsegment"),
          concat(lit("T"), ($"c_custkey" % 3).cast("string")).as("c_tier"))
      GraftAcid.mergeEvolve(s, root, src, "c_custkey")
      root
    })

  private val vacMemo =
    new java.util.concurrent.ConcurrentHashMap[(org.apache.spark.SparkContext, String), String]()

  /** Separate chain for the VACUUM entry (its own root — vacuuming the
    * shared chain would break src_time_travel's pinned v0/v1 reads):
    * the same v0 create → v1 delete → v2 merge algebra, then
    * `vacuum(retainFrom = 2)` — data files referenced only by v0/v1
    * are deleted and those manifests dropped, bounding the COW
    * format's storage to the retained history. Returns (root,
    * nDeleted). */
  private[graft] def ensureVacuum(s: SparkSession, d: String): String =
    vacMemo.computeIfAbsent((s.sparkContext, d), { _ =>
      val sfx = java.security.MessageDigest.getInstance("SHA-256")
        .digest(d.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .take(8).map(b => f"$b%02x").mkString
      val root = graft.TmpRoots.register(
        s"${sys.props("java.io.tmpdir")}/graft_acid/" +
          s"vac_${sfx}_${s.sparkContext.applicationId}", "vac_")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      GraftAcid.create(s, root, customer(s, d), "c_custkey")
      GraftAcid.delete(s, root, col("c_mktsegment") === "BUILDING")
      GraftAcid.merge(s, root, mergeSource(s, d), "c_custkey")
      val n = GraftAcid.vacuum(s, root, retainFrom = 2)
      require(n > 0, "vacuum should reclaim at least one v0/v1-only file")
      root
    })

  private val restoreMemo =
    new java.util.concurrent.ConcurrentHashMap[(org.apache.spark.SparkContext, String), String]()

  /** Chain for the RESTORE entry (own root — restoring the shared
    * chain would move its latest and break the entries pinned to it):
    * v0 create → v1 delete BUILDING → v2 restore(v0). Metadata-only
    * undo: v2's file list IS v0's. */
  private[graft] def ensureRestore(s: SparkSession, d: String): String =
    restoreMemo.computeIfAbsent((s.sparkContext, d), { _ =>
      val sfx = java.security.MessageDigest.getInstance("SHA-256")
        .digest(d.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .take(8).map(b => f"$b%02x").mkString
      val root = graft.TmpRoots.register(
        s"${sys.props("java.io.tmpdir")}/graft_acid/" +
          s"rest_${sfx}_${s.sparkContext.applicationId}", "rest_")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      GraftAcid.create(s, root, customer(s, d), "c_custkey")
      GraftAcid.delete(s, root, col("c_mktsegment") === "BUILDING")
      GraftAcid.restore(s, root, 0)
      root
    })

  private val zorderMemo =
    new java.util.concurrent.ConcurrentHashMap[(org.apache.spark.SparkContext, String), String]()

  /** Separate table for the OPTIMIZE-ZORDER entry: v0 = orders
    * (key o_orderkey, 8 key-range files); v1 = optimizeZorder over
    * (o_custkey, o_orderkey) — data-identical rewrite, files now
    * covering tight Z-curve spans so a filter on EITHER clustered
    * dimension prunes files (Round19Spec pins the pruned file count;
    * the hash gate pins data identity, the compact pattern). */
  private[graft] def ensureZorder(s: SparkSession, d: String): String =
    zorderMemo.computeIfAbsent((s.sparkContext, d), { _ =>
      import s.implicits._
      val sfx = java.security.MessageDigest.getInstance("SHA-256")
        .digest(d.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .take(8).map(b => f"$b%02x").mkString
      val root = graft.TmpRoots.register(
        s"${sys.props("java.io.tmpdir")}/graft_acid/" +
          s"zord_${sfx}_${s.sparkContext.applicationId}", "zord_")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      val src = orders(s, d).select($"o_orderkey", $"o_custkey",
        $"o_totalprice", $"o_orderpriority", $"o_orderstatus")
      GraftAcid.create(s, root, src, "o_orderkey")
      GraftAcid.optimizeZorder(s, root, Seq("o_custkey", "o_orderkey"))
      root
    })

  private val partMemo =
    new java.util.concurrent.ConcurrentHashMap[(org.apache.spark.SparkContext, String), String]()

  /** Table for the PARTITION-COLUMN entry (r19 verdict ask #4): orders
    * keyed by o_orderkey and PARTITIONED by o_month (yyyymm int — the
    * standard date-partition encoding), 14 files range-laid on
    * (month, key) so each file covers a tight month span ORTHOGONAL to
    * the key range. A month-filtered read opens only matching files
    * (Round20Spec pins the count via the manifest); merge prunes on
    * partition AND key range. */
  private[graft] def ensurePartitioned(s: SparkSession, d: String): String =
    partMemo.computeIfAbsent((s.sparkContext, d), { _ =>
      import s.implicits._
      val sfx = java.security.MessageDigest.getInstance("SHA-256")
        .digest(d.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .take(8).map(b => f"$b%02x").mkString
      val root = graft.TmpRoots.register(
        s"${sys.props("java.io.tmpdir")}/graft_acid/" +
          s"part_${sfx}_${s.sparkContext.applicationId}", "part_")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      val src = orders(s, d).select($"o_orderkey", $"o_custkey",
        $"o_totalprice", $"o_orderpriority",
        (year($"o_orderdate") * 100 + month($"o_orderdate"))
          .cast("long").as("o_month"))
      GraftAcid.createPartitioned(s, root, src, "o_orderkey", "o_month",
        nFiles = 14)
      root
    })

  /** v2-state rows in SQL (the oracle's merge algebra). */
  private val mergedStateSql =
    """cur AS (SELECT * FROM customer WHERE c_mktsegment <> 'BUILDING'),
      |src AS (SELECT c_custkey, c_name, c_nationkey,
      |          CAST(CAST(c_acctbal AS DECIMAL(18,2)) + 100.00 AS DOUBLE)
      |            AS c_acctbal,
      |          'MERGED' AS c_mktsegment
      |        FROM customer WHERE c_custkey % 7 = 0),
      |merged AS (
      |  SELECT * FROM cur WHERE c_custkey % 7 <> 0
      |  UNION ALL SELECT * FROM src)""".stripMargin

  val queries: Map[String, Q] = Map(
    // MERGE result, read back from the v2 snapshot: per-nation row
    // count and exact balance mass.
    "src_acid_merge" -> ((s, d) => {
      import s.implicits._
      val root = ensureChain(s, d)
      GraftAcid.read(s, root, Some(2))
        .groupBy($"c_nationkey")
        .agg(count(lit(1)).as("n_rows"), dsum($"c_acctbal").as("acct_sum"))
        .orderBy($"c_nationkey")
    }),

    // DELETE result, read back from the v1 snapshot: the BUILDING
    // segment is gone, every other segment's mass is untouched.
    "src_acid_delete" -> ((s, d) => {
      import s.implicits._
      val root = ensureChain(s, d)
      GraftAcid.read(s, root, Some(1))
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n_rows"), dsum($"c_acctbal").as("acct_sum"))
        .orderBy($"c_mktsegment")
    }),

    // TIME TRAVEL: one row per snapshot version — the whole history
    // remains readable after every later commit (v3 ≡ v2 is the
    // compaction-preserves-data proof, hash-gated).
    "src_time_travel" -> ((s, d) => {
      import s.implicits._
      val root = ensureChain(s, d)
      (0 to 3).map { v =>
        GraftAcid.read(s, root, Some(v))
          .agg(count(lit(1)).as("n_rows"), dsum($"c_acctbal").as("acct_sum"),
            min($"c_custkey").as("min_key"), max($"c_custkey").as("max_key"))
          .select(lit(v.toLong).as("version"), $"n_rows", $"acct_sum",
            $"min_key", $"max_key")
      }.reduce(_ unionByName _).orderBy($"version")
    }),

    // SCHEMA EVOLUTION: the post-evolution table grouped by the NEW
    // column — legacy rows (files never rewritten) read back with a
    // null tier via the explicit-schema scan; upserted rows carry it.
    "src_acid_evolution" -> ((s, d) => {
      import s.implicits._
      val root = ensureEvo(s, d)
      GraftAcid.read(s, root)
        .groupBy(coalesce($"c_tier", lit("legacy")).as("tier"))
        .agg(count(lit(1)).as("n_rows"), dsum($"c_acctbal").as("acct_sum"),
          countDistinct($"c_mktsegment").as("n_segments"))
        .orderBy($"tier")
    }),

    // CHANGE DATA FEED v0 → v2: per change class, the row count and
    // the pre/post balance mass — derived from the two immutable
    // snapshots by one full-outer key join (deletes = BUILDING rows
    // outside the merge source; updates = every %7 key, whether
    // re-inserted after the delete or updated in place; no inserts —
    // the merge source draws only existing keys).
    "src_acid_changes" -> ((s, d) => {
      import s.implicits._
      val root = ensureChain(s, d)
      GraftAcid.changes(s, root, 0, 2)
        .groupBy($"change_type")
        .agg(count(lit(1)).as("n_rows"),
          sum(coalesce($"pre.c_acctbal", lit(0.0)).cast("decimal(18,2)"))
            .cast("double").as("pre_sum"),
          sum(coalesce($"post.c_acctbal", lit(0.0)).cast("decimal(18,2)"))
            .cast("double").as("post_sum"))
        .orderBy($"change_type")
    }),

    // RESTORE — the undo verb (Delta RESTORE TABLE): the latest
    // snapshot after restore(v0) equals the ORIGINAL table exactly —
    // the delete is undone with ZERO data movement (v2's manifest
    // references v0's immutable files), and the deleted state (v1)
    // stays time-travel-readable because restore moves the log
    // forward instead of rewinding it.
    "src_acid_restore" -> ((s, d) => {
      import s.implicits._
      val root = ensureRestore(s, d)
      require(GraftAcid.readManifest(root,
        GraftAcid.latestVersion(root)).op == "restore_v0")
      GraftAcid.read(s, root)
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n_rows"), dsum($"c_acctbal").as("acct_sum"))
        .orderBy($"c_mktsegment")
    }),

    // DESCRIBE HISTORY over the shared chain's manifest log: one row
    // per commit with its operation and exact row count — read from
    // file-count-sized manifest metadata alone (the per-file stats the
    // manifests already carry), no data files opened. The oracle
    // replays each version's row count from the chain algebra.
    "src_acid_history" -> ((s, d) => {
      import s.implicits._
      val root = ensureChain(s, d)
      GraftAcid.history(s, root)
        .select($"version", $"op", $"n_rows")
        .orderBy($"version")
    }),

    // VACUUM — the retention end of the COW lifecycle: after
    // vacuum(retainFrom=2) on its own chain, v0/v1 time travel is GONE
    // BY DESIGN (manifests dropped, their exclusive data files deleted
    // — the standard retention contract) while the retained v2
    // snapshot still reads its full merged state. One row per version
    // with a readable flag; the only driver-side work is assembling
    // the 3-row panel from per-version distributed aggregates.
    "src_acid_vacuum" -> ((s, d) => {
      import s.implicits._
      val root = ensureVacuum(s, d)
      (0L to 2L).map { v =>
        scala.util.Try {
          val r = GraftAcid.read(s, root, Some(v.toInt))
            .agg(count(lit(1)).as("n"), dsum($"c_acctbal").as("m")).head()
          (v, true, r.getLong(0), r.getDouble(1))
        }.getOrElse((v, false, 0L, 0.0))
      }.toDF("version", "readable", "n_rows", "acct_sum")
        .orderBy($"version")
    }),

    // OPTIMIZE ZORDER as a manifest commit: the post-optimize snapshot
    // (v1) aggregated per priority equals the source orders exactly —
    // the rewrite changed only the LAYOUT (clustered z-spans; the
    // pruning effect is file-count-pinned in Round19Spec, since SQL
    // can't see files).
    "src_acid_zorder" -> ((s, d) => {
      import s.implicits._
      val root = ensureZorder(s, d)
      GraftAcid.read(s, root)
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n_rows"), dsum($"o_totalprice").as("sum_price"),
          countDistinct($"o_custkey").as("n_cust"),
          min($"o_orderkey").as("min_key"), max($"o_orderkey").as("max_key"))
        .orderBy($"o_orderpriority")
    }),

    // PARTITION-PRUNED READ over the partitioned orders table: the
    // 1996 months are read through readPartitionRange — manifest part
    // stats exclude every file whose month range can't overlap, the
    // precise filter lands on what remains (the standard prune-then-
    // filter contract), and the per-month rollup equals a plain SQL
    // filter over the source exactly. File-count pruning itself is
    // pinned in Round20Spec (SQL can't see files).
    "src_acid_partitioned" -> ((s, d) => {
      import s.implicits._
      val root = ensurePartitioned(s, d)
      GraftAcid.readPartitionRange(s, root, 199601L, 199612L)
        .filter($"o_month".between(199601L, 199612L))
        .groupBy($"o_month")
        .agg(count(lit(1)).as("n_rows"), dsum($"o_totalprice").as("sum_price"),
          min($"o_orderkey").as("min_key"), max($"o_orderkey").as("max_key"))
        .orderBy($"o_month")
    }),

    // COMPACTION: the latest snapshot (v3, two files) aggregated per
    // segment — equals the v2 state, proving the rewrite changed the
    // LAYOUT and nothing else.
    "src_acid_compact" -> ((s, d) => {
      import s.implicits._
      val root = ensureChain(s, d)
      GraftAcid.read(s, root)
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n_rows"), dsum($"c_acctbal").as("acct_sum"),
          countDistinct($"c_custkey").as("n_keys"))
        .orderBy($"c_mktsegment")
    })
  )

  val oracles: Map[String, String] = Map(
    "src_acid_merge" ->
      s"""WITH $mergedStateSql
         |SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS acct_sum
         |FROM merged GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,

    "src_acid_delete" ->
      """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS acct_sum
        |FROM customer WHERE c_mktsegment <> 'BUILDING'
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "src_time_travel" ->
      s"""WITH $mergedStateSql,
         |v0 AS (SELECT CAST(0 AS BIGINT) AS version,
         |  CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS acct_sum,
         |  MIN(c_custkey) AS min_key, MAX(c_custkey) AS max_key FROM customer),
         |v1 AS (SELECT CAST(1 AS BIGINT), CAST(count(*) AS BIGINT),
         |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE),
         |  MIN(c_custkey), MAX(c_custkey) FROM cur),
         |v23 AS (SELECT CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS acct_sum,
         |  MIN(c_custkey) AS min_key, MAX(c_custkey) AS max_key FROM merged)
         |SELECT * FROM v0 UNION ALL SELECT * FROM v1
         |UNION ALL SELECT CAST(2 AS BIGINT), n_rows, acct_sum, min_key, max_key FROM v23
         |UNION ALL SELECT CAST(3 AS BIGINT), n_rows, acct_sum, min_key, max_key FROM v23
         |ORDER BY version""".stripMargin,

    "src_acid_evolution" ->
      """WITH src AS (
        |  SELECT c_custkey, c_acctbal,
        |    'T' || CAST(c_custkey % 3 AS VARCHAR) AS c_tier,
        |    'EVOLVED' AS c_mktsegment
        |  FROM customer WHERE c_custkey % 5 = 0),
        |evolved AS (
        |  SELECT c_custkey, c_acctbal, CAST(NULL AS VARCHAR) AS c_tier,
        |    c_mktsegment
        |  FROM customer WHERE c_custkey % 5 <> 0
        |  UNION ALL SELECT * FROM src)
        |SELECT coalesce(c_tier, 'legacy') AS tier,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS acct_sum,
        |  CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS n_segments
        |FROM evolved GROUP BY 1 ORDER BY tier""".stripMargin,

    "src_acid_changes" ->
      s"""WITH $mergedStateSql,
         |cls AS (
         |  SELECT CASE WHEN b.c_custkey IS NULL THEN 'delete'
         |              WHEN a.c_custkey IS NULL THEN 'insert'
         |              WHEN a.c_name <> b.c_name
         |                OR a.c_nationkey <> b.c_nationkey
         |                OR a.c_acctbal <> b.c_acctbal
         |                OR a.c_mktsegment <> b.c_mktsegment THEN 'update'
         |              ELSE 'unchanged' END AS change_type,
         |    a.c_acctbal AS pre_bal, b.c_acctbal AS post_bal
         |  FROM customer a FULL OUTER JOIN merged b
         |    ON a.c_custkey = b.c_custkey)
         |SELECT change_type, CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(SUM(CAST(coalesce(pre_bal, 0) AS DECIMAL(18,2))) AS DOUBLE)
         |    AS pre_sum,
         |  CAST(SUM(CAST(coalesce(post_bal, 0) AS DECIMAL(18,2))) AS DOUBLE)
         |    AS post_sum
         |FROM cls WHERE change_type <> 'unchanged'
         |GROUP BY change_type ORDER BY change_type""".stripMargin,

    "src_acid_restore" ->
      """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS acct_sum
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "src_acid_history" ->
      s"""WITH $mergedStateSql,
         |n0 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM customer),
         |n1 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM cur),
         |n2 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM merged)
         |SELECT CAST(0 AS BIGINT) AS version, 'create' AS op, n AS n_rows FROM n0
         |UNION ALL SELECT CAST(1 AS BIGINT), 'delete', n FROM n1
         |UNION ALL SELECT CAST(2 AS BIGINT), 'merge', n FROM n2
         |UNION ALL SELECT CAST(3 AS BIGINT), 'compact', n FROM n2
         |ORDER BY version""".stripMargin,

    "src_acid_vacuum" ->
      s"""WITH $mergedStateSql,
         |agg AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS m
         |  FROM merged)
         |SELECT CAST(0 AS BIGINT) AS version, FALSE AS readable,
         |  CAST(0 AS BIGINT) AS n_rows, CAST(0 AS DOUBLE) AS acct_sum
         |UNION ALL SELECT CAST(1 AS BIGINT), FALSE, CAST(0 AS BIGINT),
         |  CAST(0 AS DOUBLE)
         |UNION ALL SELECT CAST(2 AS BIGINT), TRUE, n, m FROM agg
         |ORDER BY version""".stripMargin,

    "src_acid_zorder" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_cust,
        |  MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "src_acid_partitioned" ->
      """SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT)
        |    AS o_month,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
        |FROM orders
        |WHERE year(o_orderdate) * 100 + month(o_orderdate)
        |  BETWEEN 199601 AND 199612
        |GROUP BY 1 ORDER BY o_month""".stripMargin,

    "src_acid_compact" ->
      s"""WITH $mergedStateSql
         |SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS acct_sum,
         |  CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_keys
         |FROM merged GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin
  )
}
