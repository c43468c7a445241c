package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** The serving layer's SQL surface (`publisher/` in the reference): the
  * dashboard queries arrive as SQL text over the stats tables. Here the
  * engine registers the warehouse tables as views and executes user SQL
  * through `spark.sql` — the whole MyBatis/ClickHouse layer collapses into
  * Catalyst (§3.3 of SURVEY.md).
  */
object Serving {

  private val AllTables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every warehouse table as a temp view for SQL access.
    * `events` goes through its normalizing loader (ns-long → µs timestamp)
    * so the SQL surface sees the same schema every engine query sees.
    *
    * Idempotent per data STATE, not just per dir: a view's parquet file
    * listing is pinned at registration, so a marker keyed on the dir alone
    * would leave the SQL surface permanently blind to files appended or
    * rewritten under the same path. The marker therefore carries a
    * signature of the ten tables' file sets (path + mtime + length — one
    * driver-side directory listing, no job); unchanged data skips the
    * full re-register + schema re-inference, changed data re-registers.
    */
  def registerViews(spark: SparkSession, dir: String): Unit = {
    val marker = "graft.serving.viewsDir"
    val state = s"$dir@${dirSignature(dir)}"
    if (!spark.conf.getOption(marker).contains(state)) {
      AllTables.foreach {
        case "events" => Tables.events(spark, dir).createOrReplaceTempView("events")
        case t        => Tables.table(spark, dir, t).createOrReplaceTempView(t)
      }
      spark.conf.set(marker, state)
    }
  }

  /** MD5 digest of the table files' (name, mtime, size) under `dir` — the
    * freshness check `registerViews` keys on. A table may be a single
    * parquet file or a directory of part-files; both are walked one level,
    * sorted for a deterministic listing. A full 128-bit digest, not
    * `String.hashCode`: a 32-bit hash collision (or a same-length rewrite
    * inside one mtime tick colliding with a stale 32-bit value) would
    * silently leave stale views — the exact failure this marker exists to
    * prevent.
    */
  private def dirSignature(dir: String): String = {
    val listing = AllTables.flatMap { t =>
      val f = new java.io.File(s"$dir/$t.parquet")
      val files = if (f.isDirectory) f.listFiles().toSeq else Seq(f)
      files.map(x => s"${x.getPath}:${x.lastModified}:${x.length}")
    }.sorted.mkString("|")
    java.security.MessageDigest.getInstance("MD5")
      .digest(listing.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
  }

  /** GMV-by-trademark serving query (`ProductStatsMapper.java:26`,
    * default limit 5 `SugarController.java:26`) — as literal SQL text, the
    * way the publisher issues it.
    */
  def sqlGmvByBrand(spark: SparkSession, dir: String, limit: Int = 5): DataFrame = {
    registerViews(spark, dir)
    spark.sql(
      s"""SELECT p_brand AS tm_name,
         |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS order_amount
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |GROUP BY p_brand
         |ORDER BY order_amount DESC, tm_name ASC
         |LIMIT $limit""".stripMargin)
  }

  /** U1 via SQL LATERAL VIEW (`KeywordStatsApp.java:55-61` registers the
    * tokenizer UDTF and uses `LATERAL TABLE(ik_analyze(...))`): the Spark
    * SQL rendering registers `split_words` and uses LATERAL VIEW explode.
    */
  def sqlKeywordLateralView(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    spark.udf.register("split_words",
      (s: String) => Option(s).map(_.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq)
        .getOrElse(Seq.empty[String]))
    spark.sql(
      """SELECT lang, word, COUNT(*) AS ct
        |FROM documents LATERAL VIEW explode(split_words(text)) w AS word
        |GROUP BY lang, word""".stripMargin)
  }

  /** The same LATERAL VIEW shape through the NATIVE `graft_tokenize`
    * kernel (registered by `GraftExtensions.injectFunction`) — identical
    * results to the UDF rendering, but the tokenizer runs codegen'd
    * instead of through a Scala UDF boundary. This is the form a user
    * should write at scale.
    */
  def sqlKeywordNative(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(
      """SELECT lang, word, COUNT(*) AS ct
        |FROM documents LATERAL VIEW explode(graft_tokenize(text)) w AS word
        |GROUP BY lang, word""".stripMargin)
  }
}
