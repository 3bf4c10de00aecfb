package graft.ops

/** Process-scoped /tmp artifact roots — the ONE copy of the path/cleanup
  * machinery every materialized-view family uses (graph backbone MV, IVF
  * index, NSW adjacency, near-dup pair graph, format side-files). Grew to
  * four per-module copies by round 12; a fix to one (symlink handling,
  * hook ordering) silently missed the others, so they now all call here.
  *
  * Path discipline: `tmpdir/<prefix>[_<keyhash>]_<nonce>` where
  *  - keyhash = 6 bytes of SHA-256 over the CANONICAL key path (when a
  *    key is given) — two datasets named `sf0.1` under different parents
  *    must not collide, and the hash keeps the path short;
  *  - nonce = pid + 8 UUID hex chars, constant per process — concurrent
  *    runs (bench + verify, parallel CI) each write their own artifact,
  *    an overwrite-refresh can never yank a directory out from under
  *    another PROCESS's reader, and the predictable-/tmp-path hijack
  *    surface on shared machines is closed.
  *
  * Registered roots are deleted by one JVM shutdown hook — artifacts live
  * exactly as long as the process that can read them. `path` (no
  * registration) exists for read-side root computation; WRITERS call
  * `register` before the first write.
  */
object ArtifactRoots {

  private lazy val nonce: String =
    java.lang.Long.toHexString(java.lang.ProcessHandle.current().pid()) + "-" +
      java.util.UUID.randomUUID().toString.take(8)

  private val written = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private lazy val cleanup: Thread = {
    val t = new Thread(() => written.forEach(delete(_)), "graft-artifact-cleanup")
    java.lang.Runtime.getRuntime.addShutdownHook(t)
    t
  }

  /** Deterministic per-(process, prefix, key) root under tmpdir; no
    * side effects — safe for readers resolving where a writer published.
    */
  def path(prefix: String, key: Option[String] = None): String = {
    val h = key.map { k =>
      val canon = new java.io.File(k).getCanonicalPath
      java.security.MessageDigest.getInstance("SHA-256")
        .digest(canon.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString + "_"
    }.getOrElse("")
    val tmp = System.getProperty("java.io.tmpdir", "/tmp").stripSuffix("/")
    s"$tmp/${prefix}_$h$nonce"
  }

  /** [[path]] + register the root for recursive deletion at JVM exit
    * (idempotent — same arguments always yield the same root).
    */
  def register(prefix: String, key: Option[String] = None): String = {
    val root = path(prefix, key)
    cleanup // ensure the hook is registered before the first write
    written.add(root)
    root
  }

  /** Recursive delete, shared by the shutdown hook and scratch probes
    * that must not leak /tmp state across runs.
    */
  def delete(root: String): Unit = {
    def rm(f: java.io.File): Unit = {
      val cs = f.listFiles(); if (cs != null) cs.foreach(rm); f.delete(): Unit
    }
    rm(new java.io.File(root))
  }
}
