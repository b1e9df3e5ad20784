package graft.streaming

import org.apache.spark.sql.SparkSession

/** Shared zero-state probe for the parquet-backed streaming register
  * stores ([[StreamingIvf]], [[StreamingRangeJoin]], …): "no batch
  * recorded yet" is a NORMAL state every consumer must be able to read
  * as an empty table, but `spark.read.parquet` on an absent/empty
  * directory throws AnalysisException. One filesystem probe, through
  * the session's Hadoop conf so it works on any FileSystem impl (local,
  * HDFS, object store).
  */
object StreamingState {

  /** True iff `dir` exists and contains at least one data entry — a
    * `col=value` partition directory (which may well start with `_`,
    * e.g. `_batch_id=0`) or a part file. Only Spark's metadata
    * conventions are excluded: dot-hidden names and underscore names
    * WITHOUT a `=` (`_SUCCESS`, `_temporary`, `_metadata`).
    */
  def hasData(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).exists { s =>
      val n = s.getPath.getName
      !n.startsWith(".") && (n.contains("=") || !n.startsWith("_"))
    }
  }
}
