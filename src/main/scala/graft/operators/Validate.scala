package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.DataType

/** P8 — schema/column presence validation (`utils/tools.py:97-115`
  * `validate_dataframe`): assert required columns (and optionally their
  * types) before a pipeline stage, failing with the full list of
  * problems instead of a downstream resolution error. Purely a driver-
  * side schema check — zero data cost.
  */
object Validate {

  def requireColumns(df: DataFrame, required: Seq[String]): DataFrame = {
    val missing = required.filterNot(df.columns.contains)
    require(missing.isEmpty, s"missing required columns: ${missing.mkString(", ")}; " +
      s"present: ${df.columns.mkString(", ")}")
    df
  }

  def requireSchema(df: DataFrame, required: Map[String, DataType]): DataFrame = {
    val byName = df.schema.fields.map(f => f.name -> f.dataType).toMap
    val problems = required.toSeq.sortBy(_._1).flatMap { case (name, dt) =>
      byName.get(name) match {
        case None => Some(s"missing column $name: $dt")
        case Some(actual) if actual != dt => Some(s"column $name: expected $dt, got $actual")
        case _ => None
      }
    }
    require(problems.isEmpty, s"schema validation failed: ${problems.mkString("; ")}")
    df
  }
}
