package graft

import java.io.File

/** Shuffle/spill local-dir selection for the driver mains (guide §6 —
  * file layout; §2.1 — local disk bandwidth for shuffle files can be the
  * tighter limit).
  *
  * Mechanism, measured at local[32]/sf0.1: every map task of a tiny
  * pinned-width stage was paying a ~0.2-0.35 s constant, most of it
  * Shuffle Write Time — 32 concurrent writers creating and committing
  * small shuffle files on the disk-backed default tmp dir serialize in
  * the filesystem (the c8/c32 anti-scaling signature of r19's verdict:
  * at 8 cores the same stages cost 3× less per task). Pointing
  * `spark.local.dir` at a tmpfs mount removes the disk from that path:
  * doc_pagerank REPS=9 lo/median 3.62/4.04 → 2.91/3.13 s, and the
  * per-task shuffle-write constant collapses.
  *
  * Production posture: on a real cluster `spark.local.dir` is
  * provisioned to fast local disks (NVMe) by the cluster config — this
  * helper is the single-box equivalent and is parameterised, never
  * hard-coded: `SPARK_GRAFT_LOCAL_DIR=<path>` pins a dir,
  * `SPARK_GRAFT_LOCAL_DIR=default` disables the override entirely, unset
  * auto-selects `/dev/shm` only when it is writable with ≥16 GiB usable
  * (sf0.1 suite shuffle volume is a few hundred MB live; blocks are
  * freed per query by the ContextCleaner). Nothing here caches results:
  * shuffle files are per-query transients.
  *
  * Each JVM gets its own `pid-<pid>` subdirectory so a killed JVM's
  * leftovers (Spark's shutdown hook never ran) are identifiable: on
  * startup, sibling dirs whose pid is dead are purged — tmpfs leaks are
  * RAM leaks.
  */
object LocalDirs {

  private def deleteRecursively(f: File): Unit = {
    val fs = Option(f.listFiles()).getOrElse(Array.empty[File])
    fs.foreach(deleteRecursively)
    f.delete(): Unit
  }

  /** The local-dir override for a SparkSession builder, or None to keep
    * Spark's default resolution. */
  def resolve(): Option[String] = sys.env.get("SPARK_GRAFT_LOCAL_DIR") match {
    case Some("default") | Some("") => None
    case Some(dir) => Some(dir)
    case None =>
      val shm = new File("/dev/shm")
      if (!shm.isDirectory || !shm.canWrite ||
          shm.getUsableSpace < (16L << 30)) None
      else {
        val root = new File(shm, "graft-spark-local")
        root.mkdirs()
        for (d <- Option(root.listFiles()).getOrElse(Array.empty[File])) {
          val pid = d.getName.stripPrefix("pid-")
          if (d.getName.startsWith("pid-") && pid.nonEmpty &&
              pid.forall(_.isDigit) && !new File(s"/proc/$pid").exists())
            deleteRecursively(d)
        }
        val mine = new File(root, s"pid-${ProcessHandle.current().pid()}")
        mine.mkdirs()
        Some(mine.getAbsolutePath)
      }
  }

  /** Apply [[resolve]] to a builder. */
  def configure(b: org.apache.spark.sql.SparkSession.Builder)
      : org.apache.spark.sql.SparkSession.Builder =
    resolve().fold(b)(d => b.config("spark.local.dir", d))
}
