package graft.sources

import java.io.File
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame
import scala.sys.process._
import scala.util.Try

/** COPY-based Postgres bulk load — the reference tool's actual ingest
  * mechanism (psql \copy), runnable in this offline image where no JDBC
  * jar resolves (SURVEY §7.5): it only needs the local Postgres 15
  * server binaries.
  *
  * Spark stages the DataFrame as CSV part files; each part streams
  * through `\copy` (CSV, NULL ''). Driver-side loop here; the 100 TB
  * variant runs the same COPY per partition via foreachPartition with a
  * pg connection per executor — same statement, different fan-out.
  */
final case class PgCopySink(sockDir: String, port: Int, db: String,
    table: String) extends Sink {
  override def write(df: DataFrame): Unit = {
    val tmp = Files.createTempDirectory("graft_pgcopy").toFile
    df.write.mode("overwrite")
      .option("header", "false").option("nullValue", "")
      .csv(tmp.getAbsolutePath)
    tmp.listFiles().filter(_.getName.endsWith(".csv")).sortBy(_.getName)
      .foreach { part =>
        val rc = Seq("psql", "-h", sockDir, "-p", port.toString, "-d", db,
          "-v", "ON_ERROR_STOP=1",
          "-c", s"""\\copy "$table" FROM '${part.getAbsolutePath}' WITH (FORMAT csv, NULL '')""").!
        require(rc == 0, s"psql \\copy failed (exit $rc) for $part")
      }
  }
}

/** Manages a throwaway local Postgres 15 instance on a unix socket
  * (no TCP). Every step is best-effort: `ensure()` returns false in
  * environments without the server binaries or su rights, and callers
  * fall back to the ParquetSink twin.
  */
object PgServer {
  val dataDir = "/tmp/graft_pgdata"
  val sockDir = "/tmp/graft_pgsock"
  val port = 54329
  val db = "postgres"

  private def run(cmd: Seq[String]): Int = Try(cmd.!).getOrElse(-1)

  private def su(script: String): Int =
    run(Seq("su", "postgres", "-s", "/bin/bash", "-c", s"cd /tmp && $script"))

  /** psql -Atc as the current user; Some(stdout) on success. */
  def psql(sql: String): Option[String] =
    Try(Seq("psql", "-h", sockDir, "-p", port.toString, "-d", db,
      "-v", "ON_ERROR_STOP=1", "-Atc", sql).!!.trim).toOption

  @volatile private var known = false

  /** Idempotently initdb + start + grant the current OS user a role. */
  def ensure(): Boolean = synchronized {
    if (known) return true
    val ok = Try {
      if (!Files.exists(Paths.get(s"$dataDir/PG_VERSION"))) {
        require(su(s"initdb -D $dataDir -E UTF8 --no-sync >/dev/null") == 0, "initdb")
      }
      Files.createDirectories(Paths.get(sockDir))
      run(Seq("chown", "postgres", sockDir))
      val running = su(s"pg_ctl -D $dataDir status >/dev/null") == 0
      if (!running) {
        require(su(s"pg_ctl -D $dataDir -o '-p $port -k $sockDir -c listen_addresses=' " +
          s"-l /tmp/graft_pg.log start >/dev/null") == 0, "pg_ctl start")
      }
      val me = System.getProperty("user.name", "root")
      su(s"""psql -h $sockDir -p $port -d postgres -tc "SELECT 1 FROM pg_roles WHERE rolname='$me'" | grep -q 1 """ +
        s"""|| psql -h $sockDir -p $port -d postgres -c 'CREATE ROLE "$me" LOGIN SUPERUSER'""")
      require(psql("SELECT 1").contains("1"), "psql as current user")
      true
    }.getOrElse(false)
    known = ok
    ok
  }
}
