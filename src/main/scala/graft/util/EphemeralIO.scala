package graft.util

/** Stage the harness's EPHEMERAL runtime I/O — shuffle local dirs, streaming
  * temp checkpoints, operator scratch — on a RAM-backed tmpfs when one is
  * available.
  *
  * Why: the bench/verify mains run on shared cloud boxes whose disks have
  * intermittent multi-minute throughput collapses (measured: 1.3 GB/s → 36
  * MB/s direct-write on the same box within 2 minutes; a gated query whose
  * shuffle normally takes 1 s stretched to 230 s in such a window — the
  * round-3 driver bench DNF'd exactly this way). None of that I/O needs
  * durability: shuffle files and temp checkpoints live and die inside one
  * JVM. Putting them on tmpfs removes the disk from the timed path entirely,
  * so an environmental dip can't masquerade as a plan regression.
  *
  * At cluster scale the same data goes to executor-local SSDs; this is a
  * local-mode harness choice, not an engine semantic. Durable outputs
  * (Verify's result parquet, Warehouse sinks) take explicit paths and are
  * untouched.
  */
object EphemeralIO {

  /** Create a per-process scratch root under /dev/shm and point
    * `java.io.tmpdir` at it (streaming temp checkpoints, Derby, operator
    * temp dirs all derive from it). Returns the directory to use for
    * `spark.local.dir`, or None when no writable tmpfs exists (caller keeps
    * Spark defaults). The root is removed on JVM exit; Spark's own shutdown
    * hooks delete its subdirs first and double-deletion is harmless.
    */
  def stage(tag: String): Option[String] = {
    val shm = new java.io.File("/dev/shm")
    if (!(shm.isDirectory && shm.canWrite)) None
    else {
      val root = new java.io.File(
        shm, s"graft-$tag-${ProcessHandle.current().pid()}")
      if (!root.mkdirs() && !root.isDirectory) None
      else {
        System.setProperty("java.io.tmpdir", root.getAbsolutePath)
        Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRec(root)))
        Some(root.getAbsolutePath)
      }
    }
  }

  private def deleteRec(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(deleteRec)
    f.delete()
    ()
  }
}
