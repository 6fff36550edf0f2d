package graft

import org.apache.spark.sql.SparkSession

/** Fixture staging through the Hadoop FileSystem API.
  *
  * Sample inputs for the scan_* keys are tiny literal fixtures that must
  * exist at a stable path for both Spark and the DuckDB oracle. They are
  * written through the *Hadoop* filesystem (not java.nio) so that on a
  * real cluster the bytes land on the cluster-visible default FS
  * (HDFS/S3A), readable by every executor; under local[*] the default FS
  * is file:// and the oracle reads the same local path. A driver-local
  * java.nio write would silently break on the first multi-node deploy.
  */
object Stage {
  def fs(s: SparkSession, path: String): org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(s.sparkContext.hadoopConfiguration)

  /** Overwrite `path` with `bytes` on the default Hadoop FS. */
  def write(s: SparkSession, path: String, bytes: Array[Byte]): String =
    synchronized {
      val p = new org.apache.hadoop.fs.Path(path)
      val out = fs(s, path).create(p, true)
      try out.write(bytes) finally out.close()
      path
    }

  /** Open `path` for writing on the default Hadoop FS (caller closes). */
  def create(s: SparkSession, path: String): java.io.OutputStream =
    fs(s, path).create(new org.apache.hadoop.fs.Path(path), true)

  def exists(s: SparkSession, path: String): Boolean =
    fs(s, path).exists(new org.apache.hadoop.fs.Path(path))

  /** Check-then-write under the staging lock: run `write` only if
    * `path/_SUCCESS` is absent, then return `path`. The lock closes the
    * race where two concurrently-invoked queries both see no marker and
    * overwrite the same /tmp twin mid-read. */
  def materializeOnce(s: SparkSession, path: String)(write: => Unit): String =
    synchronized {
      if (!exists(s, s"$path/_SUCCESS")) write
      path
    }
}
