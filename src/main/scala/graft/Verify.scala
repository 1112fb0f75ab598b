package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: comma-separated query names — dev-loop filter; the
    // driver always runs the full set (2 args).
    val only: Set[String] = if (args.length > 2) args(2).split(",").toSet else Set.empty
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true") // events.ts (Tables.events)
      // The driver hashes our parquet via pyarrow→pandas. INT96 (the
      // verified-green physical type for 187 r10 queries) reads there as
      // NAIVE timestamp[ns] — matching DuckDB's naive oracle strings.
      // TIMESTAMP_MICROS would read as tz-aware (`+00:00` suffix) and
      // mismatch every timestamp column, so pin INT96 explicitly; ns
      // safety is instead guaranteed by keeping every written timestamp
      // below 2262-04-11 (see EventQueries.ScdOpenEnd).
      .config("spark.sql.parquet.outputTimestampType", "INT96")
      .config("spark.ui.enabled", "false")
      // same local-fs treatment as Bench (NoCrcLocalFileSystem scaladoc);
      // checksum sidecars never reach the written bytes the driver hashes
      .config("spark.hadoop.fs.file.impl",
        if (sys.env.get("GRAFT_LOCAL_FS_CRC").contains("1"))
          classOf[org.apache.hadoop.fs.LocalFileSystem].getName
        else classOf[graft.sources.NoCrcLocalFileSystem].getName)
      // same artifact-isolation treatment as Bench (see Bench.scala): the
      // codegen cache is classloader-keyed and session clones (every
      // StreamingQuery) otherwise re-compile every generated class per run
      .config("spark.sql.artifact.isolation.enabled",
        sys.env.get("GRAFT_ARTIFACT_ISOLATION").contains("1").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.filter(kv => only.isEmpty || only(kv._1)).foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      finally spark.catalog.clearCache() // drop any per-query persists
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
