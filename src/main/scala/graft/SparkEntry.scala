package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.operators._
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    TextOps.wordcount(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    TextOps.queries ++ RelOps.queries ++ TpchOps.queries ++ MapReduce.queries ++
      TextAnalysis.queries ++ Dedup.queries ++ Similarity.queries ++
      Multimodal.queries ++ SqlSurface.queries ++ FuncOps.queries ++
      JoinOps.queries ++ PipelineOps.queries ++ ChangeOps.queries ++
      SaltedAgg.queries ++ graft.streaming.StreamOps.queries ++
      graft.sources.StorageOps.queries ++ graft.sources.AvroIO.queries ++
      TopKOps.queries ++
      Retrieval.queries ++ Governance.queries
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    TextOps.oracle ++ RelOps.oracle ++ TpchOps.oracle ++ MapReduce.oracle ++
      TextAnalysis.oracle ++ Dedup.oracle ++ Similarity.oracle ++
      Multimodal.oracle ++ SqlSurface.oracle ++ FuncOps.oracle ++
      JoinOps.oracle ++ PipelineOps.oracle ++ ChangeOps.oracle ++
      SaltedAgg.oracle ++ graft.streaming.StreamOps.oracle ++
      graft.sources.StorageOps.oracle ++ graft.sources.AvroIO.oracle ++
      TopKOps.oracle ++
      Retrieval.oracle ++ Governance.oracle
}
