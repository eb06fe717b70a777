package graft

import org.apache.spark.sql.SparkSession

/** Canonical session factory: shuffle parallelism = cores (not the 200
  * default), AQE on, UTC, and — when available — a tmpfs scratch dir for
  * shuffle spills (local-mode shuffle writes otherwise bottleneck on the
  * system disk and flatten thread scaling; on a real cluster this maps to
  * NVMe-backed `spark.local.dir`). */
object GraftSession {

  def localDir: Option[String] = {
    val fromEnv = sys.env.get("SPARK_GRAFT_LOCAL_DIR")
    val shm = java.nio.file.Paths.get("/dev/shm")
    fromEnv.orElse {
      if (java.nio.file.Files.isWritable(shm)) Some("/dev/shm/spark-graft") else None
    }
  }

  def build(cpus: Int, appName: String = "graft"): SparkSession = {
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    localDir.foreach { d =>
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d))
      b.config("spark.local.dir", d)
    }
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
