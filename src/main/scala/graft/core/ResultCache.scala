package graft.core

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet-backed query-result cache (SURVEY.md §2.1 S5; reference:
  * `RedisDB.dump/load` `redisdb.py:60-81` + the read-first `'r'/'w'`
  * mode flags of its callers `stocks.py:123-126`, `crsp.py:450-461`
  * `cache_ret` pregeneration).
  *
  * The reference parquet-serializes DataFrames into Redis under a
  * composed key; here the materialization IS parquet under a cache root —
  * at cluster scale that's a shared object store prefix, and re-reads get
  * column pruning + predicate pushdown on the cached result for free
  * (a Redis blob would be opaque bytes).
  */
object ResultCache {

  /** Deterministic filesystem-safe key for (op, args). */
  def key(op: String, args: Seq[Any]): String = {
    val raw = op + "|" + args.mkString("|")
    val safe = op.replaceAll("[^A-Za-z0-9_-]", "_").take(40)
    f"$safe-${raw.hashCode & 0x7fffffff}%08x"
  }

  private def path(root: String, k: String): String = s"$root/$k.parquet"

  def exists(root: String, k: String): Boolean =
    Files.exists(Paths.get(path(root, k)))

  /** Read a cached result if present ('r' mode). */
  def load(spark: SparkSession, root: String, k: String): Option[DataFrame] =
    if (exists(root, k)) Some(spark.read.parquet(path(root, k))) else None

  /** (Re)write a result ('w' mode). */
  def dump(df: DataFrame, root: String, k: String): Unit =
    df.write.mode("overwrite").parquet(path(root, k))

  /** Read-first: return the cached result when present, else build,
    * materialize, and return the cached copy (so downstream consumers
    * scan parquet rather than recompute the lineage — the `cache_ret`
    * pattern).
    */
  def cached(spark: SparkSession, root: String, op: String, args: Seq[Any])
            (build: => DataFrame): DataFrame = {
    val k = key(op, args)
    load(spark, root, k).getOrElse {
      dump(build, root, k)
      spark.read.parquet(path(root, k))
    }
  }
}
