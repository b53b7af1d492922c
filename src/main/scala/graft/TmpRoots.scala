package graft

/** Hygiene for appId-stamped scratch roots under `java.io.tmpdir`
  * (r18 ADVICE: namespacing table roots by applicationId stopped
  * concurrent JVMs clobbering each other, but left every prior run's
  * directories behind — nothing ever reclaimed them).
  *
  * Two complementary mechanisms, both safe under concurrent JVMs:
  *
  *  1. SHUTDOWN HOOK — every root registered by THIS JVM is deleted at
  *     exit, so a normal Bench/Verify run leaves nothing behind.
  *  2. STALE-SIBLING SWEEP — at registration, sibling directories with
  *     the same name prefix but a DIFFERENT appId suffix are deleted
  *     iff their mtime is older than [[MaxAgeMs]] (crashed runs'
  *     leftovers). A live concurrent JVM's roots are necessarily
  *     younger than the age bar (a run lasts minutes), so the sweep
  *     can never race a sibling mid-read — the age gate preserves the
  *     exact isolation property the appId namespacing bought.
  */
object TmpRoots {
  /** Older than this ⇒ the owning run is long gone (runs last minutes;
    * the driver's whole round is hours but each JVM is short-lived). */
  private val MaxAgeMs = 2L * 3600 * 1000

  /** Heartbeat cadence — see [[touchAll]]. Far below [[MaxAgeMs]], so a
    * live root is always fresher than the sweep bar. */
  private val HeartbeatMs = 10L * 60 * 1000

  private val registered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Refresh every registered root's mtime to NOW (r19 ADVICE: a
    * directory's mtime does not tick when files change inside nested
    * subdirs, so a legitimately >2h-old JVM — a long soak or a bench on
    * a contended host — could have its LIVE scratch root swept by a
    * concurrent JVM's registration). The heartbeat makes the age gate a
    * LIVENESS gate: a root is stale only if its owner stopped touching
    * it. */
  private[graft] def touchAll(): Unit =
    registered.forEach { r =>
      val f = new java.io.File(r)
      if (f.exists()) f.setLastModified(System.currentTimeMillis())
    }

  private lazy val hookInstalled: Boolean = {
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      registered.forEach(r =>
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(r)))))
    val t = new java.util.Timer("graft-tmproots-heartbeat", true) // daemon
    t.schedule(new java.util.TimerTask { def run(): Unit = touchAll() },
      HeartbeatMs, HeartbeatMs)
    true
  }

  /** Register `root` (an appId-stamped scratch dir about to be created)
    * for deletion at JVM exit, and sweep stale siblings: entries of
    * `root`'s parent whose name starts with `prefix`, differ from
    * `root` itself, and are older than [[MaxAgeMs]]. Returns `root`
    * for call-site chaining. */
  def register(root: String, prefix: String): String = {
    hookInstalled
    if (registered.add(root)) {
      val f = new java.io.File(root)
      val siblings = Option(f.getParentFile).flatMap(p => Option(p.listFiles()))
        .getOrElse(Array.empty[java.io.File])
      val cutoff = System.currentTimeMillis() - MaxAgeMs
      siblings.foreach { s =>
        if (s.getName.startsWith(prefix) && s.getName != f.getName &&
            s.lastModified() < cutoff)
          org.apache.commons.io.FileUtils.deleteQuietly(s)
      }
    }
    root
  }
}
