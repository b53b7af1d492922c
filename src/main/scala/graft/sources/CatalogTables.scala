package graft.sources

import org.apache.spark.sql.SparkSession

/** Catalog registration + statistics for the testdata tables — the
  * statistics-driven-planning (CBO) path a 100 TB deployment uses.
  *
  * Everything else in this library reads parquet by path, which plans
  * join strategies from FILE SIZES and AQE runtime stats alone. A real
  * warehouse registers tables in a catalog and runs `ANALYZE TABLE ...
  * COMPUTE STATISTICS FOR ALL COLUMNS`, so the optimizer plans from
  * rowCount + per-column NDV/min/max BEFORE execution: filter
  * selectivity shrinks the estimated build side (file sizes can't —
  * without column stats a Filter's estimate equals its child's), join
  * reorder ranks by estimated cardinality, and broadcast decisions
  * come from estimated output rows rather than on-disk bytes. The
  * reference analogy is the D2 dimension lookup
  * (`/root/reference/README.md:13`) — the dim table a planner should
  * know is broadcastable by row count, not by compressed footprint.
  *
  * Tables are registered EXTERNAL (`USING parquet LOCATION ...`) so
  * the read-only testdata is never copied or touched; stats live in
  * the session catalog (shared app-wide, so registration is idempotent
  * and one ANALYZE serves every later query in the JVM).
  */
object CatalogTables {
  /** Core relational tables worth statistics at any scale. */
  val CoreTables: Seq[String] = Seq("region", "nation", "customer", "orders")

  /** Database name scoped to the sf dir (one catalog namespace per
    * scale factor; hyphens/slashes sanitized to identifier chars). */
  def dbFor(dir: String): String =
    "graft_cat_" + dir.replaceAll("[^A-Za-z0-9]", "_")

  /** Register `tables` from `dir` as external parquet tables and
    * ANALYZE full column statistics. Idempotent per (JVM, dir): the
    * external catalog is shared across cloned sessions, so later calls
    * see the tables and skip the ANALYZE. Returns the database name. */
  def ensure(s: SparkSession, dir: String,
      tables: Seq[String] = CoreTables): String = {
    val db = dbFor(dir)
    s.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    tables.foreach { t =>
      if (!s.catalog.tableExists(s"$db.$t")) {
        s.sql(s"CREATE TABLE IF NOT EXISTS $db.$t USING parquet LOCATION '$dir/$t.parquet'")
        s.sql(s"ANALYZE TABLE $db.$t COMPUTE STATISTICS FOR ALL COLUMNS")
      }
    }
    db
  }

  /** A child session with cost-based optimization enabled — join
    * estimates and reorder decisions come from the ANALYZEd catalog
    * stats. Isolated so the CBO flags never leak into the shared
    * session (same pattern as the streaming gates). */
  def cboSession(s: SparkSession): SparkSession = {
    val ss = s.newSession()
    ss.conf.set("spark.sql.cbo.enabled", "true")
    ss.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    ss
  }
}
