package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table access for the driver-generated test tables.
  *
  * At cluster scale these reads become Iceberg/Parquet table scans; the
  * important property (kept here) is that every consumer selects only the
  * columns it needs so Parquet column pruning + predicate pushdown apply.
  */
object Tables {
  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings")
  def events(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "events")
  def part(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "part")
}
