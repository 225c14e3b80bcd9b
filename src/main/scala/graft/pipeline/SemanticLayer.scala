package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, countDistinct, expr}

/** dbt's semantic layer, validated AND natively queryable.
  *
  * dbt ≥1.6 projects carry `semantic_models:` and `metrics:` YAML
  * blocks (the MetricFlow spec; `dbtoperator.py:273` pins dbt 1.9.10,
  * which parses both into the manifest). dbt-core itself is
  * PARSE-ONLY — it validates the definitions and records them as
  * manifest nodes; query serving lives in MetricFlow. The engine
  * mirrors the parse/validate/manifest surface (see
  * [[PipelineProject]] / `PipelineRunner.writeManifest`) and
  * additionally compiles metric queries straight onto the DataFrame
  * API, so a metric is a runnable query here, not just metadata.
  *
  * Query semantics (the MetricFlow subset that is closed over ONE
  * semantic model — cross-model entity joins are rejected loudly,
  * never silently approximated):
  *
  *  - a SIMPLE metric is its measure's aggregation;
  *  - a RATIO metric is `CAST(numerator AS DOUBLE) /
  *    CAST(denominator AS DOUBLE)` over the group;
  *  - a DERIVED metric is its `expr` evaluated over its input
  *    metrics' values for the group.
  *
  * All requested metrics (and every measure they pull in
  * transitively) evaluate in ONE aggregation pass over the model —
  * one shuffle on the group-by dimensions, map-side partials; at
  * 100 TB the cost is the groupBy, independent of how many metrics
  * ride it.
  */
object SemanticLayer {

  private val Aggs = Set("sum", "count", "count_distinct", "avg",
    "min", "max")
  private val DimTypes = Set("categorical", "time")
  private val EntityTypes = Set("primary", "unique", "foreign", "natural")
  private val MetricTypes = Set("simple", "ratio", "derived")

  /** dbt parse-time validation: unique names, known enums, every
    * metric's measure/input references resolve. `modelNodes` is the
    * project's model/seed/snapshot name set (a semantic model over an
    * unknown node is the loud miss dbt raises); `resolve` maps a
    * `ref()`-style bare name onto the runner's canonical node name
    * (schema-qualified and versioned models — the runner passes its
    * own `resolveDep`).
    */
  def validate(spec: PipelineSpec, modelNodes: Set[String],
      resolve: String => String = identity): Unit = {
    val sms = spec.semanticModels
    sms.groupBy(_.name).foreach { case (n, ds) =>
      require(ds.size == 1, s"semantic model '$n' defined ${ds.size} times")
    }
    sms.foreach { sm =>
      require(modelNodes.contains(resolve(sm.modelRef)),
        s"semantic model ${sm.name}: model '${sm.modelRef}' is not a " +
          s"project node")
      sm.entities.foreach(e => require(EntityTypes.contains(e.entityType),
        s"semantic model ${sm.name}: entity ${e.name} has unknown " +
          s"type '${e.entityType}'"))
      sm.dimensions.foreach(d => require(DimTypes.contains(d.dimType),
        s"semantic model ${sm.name}: dimension ${d.name} has unknown " +
          s"type '${d.dimType}'"))
      sm.measures.foreach(m => require(Aggs.contains(m.agg),
        s"semantic model ${sm.name}: measure ${m.name} has unknown " +
          s"agg '${m.agg}'"))
      sm.aggTimeDimension.foreach(t =>
        require(sm.dimensions.exists(_.name == t),
          s"semantic model ${sm.name}: agg_time_dimension '$t' is not " +
            s"one of its dimensions"))
      (sm.entities.map(_.name) ++ sm.dimensions.map(_.name) ++
        sm.measures.map(_.name)).groupBy(identity).foreach {
        case (n, ds) => require(ds.size == 1,
          s"semantic model ${sm.name}: '$n' defined ${ds.size} times")
      }
    }
    // dbt requires measure names be unique ACROSS semantic models —
    // metrics reference measures by bare name
    val byMeasure = sms.flatMap(sm => sm.measures.map(_.name -> sm.name))
    byMeasure.groupBy(_._1).foreach { case (n, owners) =>
      require(owners.size == 1, s"measure '$n' defined in " +
        s"${owners.map(_._2).mkString(", ")} — measure names are global")
    }
    val measures = byMeasure.map(_._1).toSet
    val metricNames = spec.metrics.map(_.name)
    metricNames.groupBy(identity).foreach { case (n, ds) =>
      require(ds.size == 1, s"metric '$n' defined ${ds.size} times")
    }
    // a metric named like a dimension/entity would silently overwrite
    // that grouped column during query()'s withColumn staging — reject
    // the collision up front, for every semantic model (metrics are
    // global names; MetricFlow's namespace is shared the same way)
    sms.foreach { sm =>
      val grouped = (sm.dimensions.map(_.name) ++
        sm.entities.map(_.name)).toSet
      metricNames.filter(grouped.contains).foreach(n => sys.error(
        s"metric '$n' collides with a dimension/entity of semantic " +
          s"model ${sm.name} — a grouped query would overwrite the " +
          s"group-by column; rename one of them"))
    }
    val known = metricNames.toSet
    spec.metrics.foreach { m =>
      require(MetricTypes.contains(m.metricType),
        s"metric ${m.name}: unknown type '${m.metricType}'")
      m.metricType match {
        case "simple" =>
          val mm = m.measure.getOrElse(sys.error(
            s"metric ${m.name}: simple metric needs type_params.measure"))
          require(measures.contains(mm),
            s"metric ${m.name}: unknown measure '$mm'")
        case "ratio" =>
          Seq("numerator" -> m.numerator, "denominator" -> m.denominator)
            .foreach { case (k, v) =>
              val mm = v.getOrElse(sys.error(
                s"metric ${m.name}: ratio metric needs type_params.$k"))
              require(measures.contains(mm),
                s"metric ${m.name}: unknown measure '$mm' ($k)")
            }
        case "derived" =>
          require(m.expr.nonEmpty,
            s"metric ${m.name}: derived metric needs type_params.expr")
          require(m.inputMetrics.nonEmpty,
            s"metric ${m.name}: derived metric needs type_params.metrics")
          m.inputMetrics.foreach { in =>
            require(known.contains(in),
              s"metric ${m.name}: unknown input metric '$in'")
            require(spec.metrics.find(_.name == in)
                .exists(_.metricType != "derived"),
              s"metric ${m.name}: input '$in' is itself derived — " +
                s"nest simple/ratio metrics only")
          }
      }
    }
  }

  /** The semantic model a metric evaluates over. */
  private def owningModel(spec: PipelineSpec, m: MetricDef)
      : SemanticModelDef = {
    def ofMeasure(name: String): SemanticModelDef =
      spec.semanticModels.find(_.measures.exists(_.name == name))
        .getOrElse(sys.error(s"measure '$name' has no semantic model"))
    val sms = (m.metricType match {
      case "simple" => Seq(ofMeasure(m.measure.get))
      case "ratio" =>
        Seq(ofMeasure(m.numerator.get), ofMeasure(m.denominator.get))
      case "derived" => m.inputMetrics
        .map(in => spec.metrics.find(_.name == in).get)
        .map(owningModel(spec, _))
    }).distinct
    require(sms.size == 1,
      s"metric ${m.name} spans semantic models " +
        s"${sms.map(_.name).mkString(", ")} — cross-model metric joins " +
        s"are not supported; query per model")
    sms.head
  }

  /** Measures a metric pulls in, transitively. */
  private def measuresOf(spec: PipelineSpec, m: MetricDef): Seq[String] =
    m.metricType match {
      case "simple" => Seq(m.measure.get)
      case "ratio" => Seq(m.numerator.get, m.denominator.get)
      case "derived" => m.inputMetrics
        .flatMap(in => measuresOf(spec, spec.metrics.find(_.name == in).get))
    }

  /** Evaluate `metricNames` grouped by `groupBy` dimension/entity
    * names — MetricFlow's query surface over one semantic model.
    * `readModel` resolves the underlying model node to its
    * materialized rows (the runner passes `readTable`). Output: one
    * column per group-by (named after it), one per metric (named
    * after the metric, in request order).
    */
  def query(spec: PipelineSpec, readModel: String => DataFrame,
      metricNames: Seq[String], groupBy: Seq[String]): DataFrame = {
    require(metricNames.nonEmpty, "semantic query needs >= 1 metric")
    val metrics = metricNames.map(n => spec.metrics.find(_.name == n)
      .getOrElse(sys.error(s"unknown metric: $n")))
    val sms = metrics.map(owningModel(spec, _)).distinct
    require(sms.size == 1,
      s"metrics span semantic models ${sms.map(_.name).mkString(", ")} " +
        s"— query per model")
    val sm = sms.head

    val groupCols: Seq[Column] = groupBy.map { g =>
      sm.dimensions.find(_.name == g)
        .map(d => expr(d.expr.getOrElse(d.name)).as(d.name))
        .orElse(sm.entities.find(_.name == g)
          .map(e => expr(e.expr.getOrElse(e.name)).as(e.name)))
        .getOrElse(sys.error(
          s"'$g' is not a dimension or entity of ${sm.name} " +
            s"(dimensions: ${sm.dimensions.map(_.name).mkString(", ")}; " +
            s"entities: ${sm.entities.map(_.name).mkString(", ")})"))
    }

    val needed = metrics.flatMap(measuresOf(spec, _)).distinct
    def measureCol(name: String): String = s"__measure_$name"
    val aggCols = needed.map { n =>
      val m = sm.measures.find(_.name == n).get
      val e = expr(m.expr)
      (m.agg match {
        case "sum" => org.apache.spark.sql.functions.sum(e)
        case "count" => org.apache.spark.sql.functions.count(e)
        case "count_distinct" => countDistinct(e)
        case "avg" => org.apache.spark.sql.functions.avg(e)
        case "min" => org.apache.spark.sql.functions.min(e)
        case "max" => org.apache.spark.sql.functions.max(e)
      }).as(measureCol(n))
    }

    val base = readModel(sm.modelRef)
    val grouped =
      if (groupCols.isEmpty) base.agg(aggCols.head, aggCols.tail: _*)
      else base.groupBy(groupCols: _*).agg(aggCols.head, aggCols.tail: _*)

    // metric value columns: simple/ratio from measures; derived from
    // its input metrics' columns (inputs are simple/ratio — enforced
    // at validate — so one withColumn pass per metric resolves)
    def valueOf(m: MetricDef): Column =
      m.metricType match {
        case "simple" => col(measureCol(m.measure.get))
        case "ratio" =>
          col(measureCol(m.numerator.get)).cast("double") /
            col(measureCol(m.denominator.get)).cast("double")
        case "derived" => sys.error("derived resolved separately")
      }

    val withInputs = metrics.flatMap {
      case m if m.metricType == "derived" =>
        m.inputMetrics.map(in => spec.metrics.find(_.name == in).get)
      case _ => Nil
    }
    val nonDerived = (metrics.filter(_.metricType != "derived") ++
      withInputs).distinctBy(_.name)
    val staged = nonDerived.foldLeft(grouped)((df, m) =>
      df.withColumn(m.name, valueOf(m)))
    val complete = metrics.filter(_.metricType == "derived")
      .foldLeft(staged)((df, m) => df.withColumn(m.name, expr(m.expr.get)))

    complete.select((groupBy.map(col) ++ metricNames.map(col)): _*)
  }
}
