package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  /** Corpus gate (ADVICE r9): graft_tokenize emits overlapping CJK
    * bigrams for Han runs, but every DuckDB oracle tokenizes with the
    * plain whitespace fold — the 200+ corpus oracles are only valid
    * while documents.text carries no URO/ExtA characters. Asserted at
    * gate time over the gate's own corpus, instead of assumed.
    */
  def assertHanFree(spark: SparkSession, sfDir: String): Unit = {
    val hanDocs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(org.apache.spark.sql.functions.col("text")
        .rlike("[\\u3400-\\u4DBF\\u4E00-\\u9FFF]")).count()
    require(hanDocs == 0L,
      s"corpus gate: $hanDocs documents contain Han characters — the whitespace " +
        "$TOKS oracle macro no longer matches graft_tokenize on this corpus")
  }

  def main(args: Array[String]): Unit = {
    val (Array(sfDir, outDir), only) = (args.take(2), args.drop(2).toSet)
    val spark = GraftSession.get() // one tuned session config for all mains
    new java.io.File(outDir).mkdirs()
    assertHanFree(spark, sfDir)
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
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
