package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.etl.WhoStarQueries
import graft.ml.Forecast
import graft.ops.{AsOf, Blocklist, Clustering, Dedup, EntityResolution, Graph, HeavyHitters, Incremental, LangId, LangModel, Mixing, Multimodal, Profile, Projection, RangeJoin, Retrieval, Sampling, Similarity, Sketch, Skew, Suffix, TextAnalysis, Tokenize, ZOrder}
import graft.queries.{Aggregates, EventAnalytics, Joins, PatternCompiler, Q, Relational, Shaping, TimeSeries, Windows}
import graft.streaming.Streams

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` / `oracleSql` are assembled from the per-module registries so
  * each module (relational parity, text ops, dedup, similarity, streaming,
  * ml) owns its own query list next to its implementation.
  */
object SparkEntry {

  /** All registered queries across modules. */
  def registry: Seq[Q] =
    Relational.all ++ Aggregates.all ++ Joins.all ++ Windows.all ++ Shaping.all ++
      TextAnalysis.all ++ Dedup.all ++ Similarity.all ++ Multimodal.all ++
      Streams.all ++ Forecast.all ++ Skew.all ++ AsOf.all ++ RangeJoin.all ++
      Profile.all ++ Sampling.all ++ Incremental.all ++ ZOrder.all ++ HeavyHitters.all ++
      EntityResolution.all ++ EventAnalytics.all ++ Graph.all ++ Sketch.all ++
      TimeSeries.all ++ WhoStarQueries.all ++ Tokenize.all ++ Retrieval.all ++
      Mixing.all ++ Suffix.all ++ PatternCompiler.all ++ LangId.all ++ LangModel.all ++
      Clustering.all ++ Blocklist.all ++ Projection.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * scan → join → agg → join → top-k (SURVEY.md §7 build order step 1).
    */
  def entry(spark: SparkSession): DataFrame =
    Relational.q04(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (sketch-based dedup, LSH ANN) → driver records a rows-only check;
    * those are covered by ScalaTest instead.
    */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
