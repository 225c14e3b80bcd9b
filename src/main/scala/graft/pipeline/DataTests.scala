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

  /** Resolve a spec-level test against a runner's materialized state.
    * The test's config applies here: `where` filters the TESTED
    * model's rows before the test compiles (dbt injects the predicate
    * around the model relation; the relationships parent is NOT
    * filtered — a where must never manufacture orphans), and `limit`
    * caps the violating rows returned.
    */
  def violations(spark: SparkSession, runner: PipelineRunner,
                 t: DataTest): DataFrame = {
    // `tested` marks the CHILD role: `where` scopes the model under
    // test only, never a join partner — keyed per role, not by table
    // name, so a self-referential Relationships test (parentModel ==
    // model) still reads an unfiltered parent and a `where` can never
    // manufacture orphans
    def frame(name: String, tested: Boolean): DataFrame = {
      // testRelation: local table, else session view, else the
      // `--defer --state` environment's table (dbt test --defer)
      val df = runner.testRelation(name)
      if (tested) t.config.where.fold(df)(df.filter) else df
    }
    val viol = t match {
      case DataTest.Unique(m, cols, _) => unique(frame(m, true), cols)
      case DataTest.NotNull(m, c, _)   => notNull(frame(m, true), c)
      case DataTest.AcceptedValues(m, c, v, _) =>
        acceptedValues(frame(m, true), c, v)
      case DataTest.Relationships(m, c, pm, pc, _) =>
        relationships(frame(m, true), c, frame(pm, false), pc)
      case DataTest.Singular(name, sql, _) =>
        // a singular test owns its SQL (config.where is rejected at
        // construction), so every ref reads unfiltered
        Model.runSqlText(s"test_$name", sql,
          spark, t.refs.map(r => r -> frame(r, false)).toMap)
    }
    t.config.limit.fold(viol)(viol.limit)
  }
}
