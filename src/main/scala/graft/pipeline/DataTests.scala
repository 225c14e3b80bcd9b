package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** dbt generic data tests, compiled to violating-rows DataFrames
  * (pass = empty). Reference basis: `dbt test` is one of the commands
  * the operator shells out (`dbtoperator.py:334`); semantics are
  * dbt-core 1.9's four built-in generic tests.
  */
object DataTests {

  def unique(df: DataFrame, cols: Seq[String]): DataFrame =
    df.groupBy(cols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)

  def notNull(df: DataFrame, c: String): DataFrame =
    df.filter(col(c).isNull)

  def acceptedValues(df: DataFrame, c: String, values: Seq[String]): DataFrame =
    df.filter(!col(c).isin(values.map(lit): _*) || col(c).isNull)

  /** Orphaned foreign keys: child values absent from the parent.
    * Sides are aliased before the join — childCol and parentCol very
    * often share a name (customer_id ⇢ customer_id), which would make
    * the raw column references ambiguous.
    */
  def relationships(child: DataFrame, childCol: String,
                    parent: DataFrame, parentCol: String): DataFrame =
    child.select(col(childCol).as("__fk"))
      .filter(col("__fk").isNotNull).distinct()
      .join(parent.select(col(parentCol).as("__pk")),
        col("__fk") === col("__pk"), "left_anti")
      .select(col("__fk").as(childCol))

  /** Resolve a spec-level test against a runner's materialized state. */
  def violations(spark: SparkSession, runner: PipelineRunner,
                 t: DataTest): DataFrame = {
    def frame(name: String): DataFrame =
      if (runner.tableExists(name)) runner.readTable(name)
      else spark.table(name)
    t match {
      case DataTest.Unique(m, cols)        => unique(frame(m), cols)
      case DataTest.NotNull(m, c)          => notNull(frame(m), c)
      case DataTest.AcceptedValues(m, c, v) => acceptedValues(frame(m), c, v)
      case DataTest.Relationships(m, c, pm, pc) =>
        relationships(frame(m), c, frame(pm), pc)
    }
  }
}
