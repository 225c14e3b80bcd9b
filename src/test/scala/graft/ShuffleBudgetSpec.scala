package graft

import org.scalatest.funsuite.AnyFunSuite

/** Shuffle-budget regression gate (SURVEY §4): every registered query
  * key has a pinned maximum number of SHUFFLE exchanges
  * (hash/range/single-partition — broadcasts excluded: a broadcast
  * join degrading to SMJ shows up as a NEW shuffle, which is exactly
  * what this catches) in its initial physical plan at sf0.001.
  *
  * Cost note: keys that do eager driver-side work in their lambda
  * (BPE training rounds, pipeline-runner materializations) pay that
  * work here before the residual plan is inspected — the gate still
  * covers their final read plan, and the whole sweep runs in ~1 min
  * at sf0.001. If that ever grows unacceptable, exempt eager keys
  * explicitly rather than weakening the sweep.
  *
  * A failure here means an edit added an exchange somewhere — at
  * 100 TB an extra shuffle is the difference between a map-only stage
  * and re-clustering the corpus, so a regression must be a conscious,
  * reviewed decision: if the new shape is intended, update
  * `src/test/resources/shuffle_budget.tsv` (regenerate a line with
  * the printed actual count). New keys must be added to the file —
  * the test fails on unbudgeted keys with the measured count to
  * paste. Counts BELOW budget pass (improvements don't churn the
  * file; tighten opportunistically).
  */
class ShuffleBudgetSpec extends AnyFunSuite with SparkTestBase {

  private val exchange =
    "Exchange (hashpartitioning|rangepartitioning|SinglePartition)".r

  private lazy val budget: Map[String, Int] = {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/shuffle_budget.tsv"))
    try src.getLines().filter(_.nonEmpty).map { l =>
      val Array(k, v) = l.split("\t"); k -> v.toInt
    }.toMap
    finally src.close()
  }

  test("every query key stays within its pinned shuffle budget") {
    val over = scala.collection.mutable.Buffer.empty[String]
    val unbudgeted = scala.collection.mutable.Buffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val n = exchange.findAllIn(
        fn(spark, sf).queryExecution.executedPlan.toString).size
      budget.get(name) match {
        case None => unbudgeted += s"$name\t$n"
        case Some(b) if n > b => over += s"$name: $n exchanges > budget $b"
        case _ =>
      }
    }
    assert(unbudgeted.isEmpty,
      "keys missing from shuffle_budget.tsv — add these lines:\n" +
        unbudgeted.mkString("\n"))
    assert(over.isEmpty,
      "shuffle regressions (update the budget only if the new plan " +
        "shape is intended):\n" + over.mkString("\n"))
  }
}
