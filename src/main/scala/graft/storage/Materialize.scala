package graft.storage

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared ensure-write machinery for per-corpus warehouse caches (the
  * materialized shingle store, the persisted IVF index, ...).
  *
  * The cache key hashes the corpus path AND the source table's file
  * inventory (name, length, mtime) AND a caller-supplied config string
  * (the constants baked into the cached data). A regenerated corpus or
  * a changed constant therefore produces a NEW cache directory instead
  * of silently serving stale data across JVM runs — the staleness mode
  * a bare path hash has.
  */
object Materialize {

  /** Cache tag for `table` under `t.dir` given `config` (constants the
    * cached content depends on — bake in everything that changes the
    * bytes).
    */
  def corpusTag(t: Tables, table: String, config: String): String = {
    val src = new java.io.File(t.dir, s"$table.parquet")
    val inventory = Option(src.listFiles())
      .map(_.sortBy(_.getName)
        .map(f => s"${f.getName}:${f.length}:${f.lastModified}").mkString(","))
      .getOrElse(s"${src.length}:${src.lastModified}") // single-file table
    val key = s"${t.dir}|$table|$inventory|$config"
    java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
  }

  /** Write `df` as parquet under the session warehouse at
    * `<prefix>_<tag>` unless already present; return the read-back
    * frame. `partitionCols` forwards to `partitionBy`.
    */
  def ensureParquet(spark: SparkSession, prefix: String, tag: String,
                    df: => DataFrame,
                    partitionCols: Seq[String] = Nil): DataFrame = {
    val dir = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
      s"${prefix}_$tag").toString
    if (!new java.io.File(dir, "_SUCCESS").exists()) {
      val w = df.write.mode("overwrite")
      (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
        .parquet(dir)
    }
    spark.read.parquet(dir)
  }
}
