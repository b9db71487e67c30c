package graft

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Cell

object SparkSpec {
  lazy val spark: SparkSession = GraftSession.local("4")
}

/** Shared local SparkSession for all suites. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.spark

  def cells(cs: Seq[Cell]): Dataset[Cell] = {
    import spark.implicits._
    spark.createDataset(cs)
  }

  /** (rowString, familyString, qualifierString, ts, valueString) tuples of a
    * resolved cell frame — convenient for assertions. */
  def collectCells(df: DataFrame): Set[(String, String, String, Long, String)] = {
    df.collect().map { r =>
      (new String(r.getAs[Array[Byte]]("row"), "UTF-8"),
        r.getAs[String]("family"),
        new String(r.getAs[Array[Byte]]("qualifier"), "UTF-8"),
        r.getAs[Long]("ts"),
        Option(r.getAs[Array[Byte]]("value")).map(new String(_, "UTF-8")).orNull)
    }.toSet
  }
}
