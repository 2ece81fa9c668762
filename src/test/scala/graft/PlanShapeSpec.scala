package graft

import graft.operators.AsOfJoin
import graft.pipeline.Curation
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.execution.window.WindowExec
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape assertions for the curation operators — the
  * properties that decide whether these plans survive a 100 TB corpus:
  * broadcast (never shuffle) the train side of decontamination, and no
  * unpartitioned window (single-task global sort) anywhere. */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def docsDF(n: Int) = {
    import spark.implicits._
    (0 until n).map(i =>
      (i.toLong, s"alpha beta gamma doc $i one two three four five", "en"))
      .toDF("doc_id", "text", "lang")
  }

  /** Executed plan nodes incl. inside AQE wrappers (pre-execution the
    * adaptive plan holds the initial physical plan). */
  private def nodes(df: DataFrame): Seq[SparkPlan] = {
    val root = df.queryExecution.executedPlan
    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan +: walk(a.executedPlan)
      case q: QueryStageExec => q +: walk(q.plan) // stage plans aren't children
      case _ => p +: p.children.flatMap(walk)
    }
    walk(root)
  }

  test("decontaminate: eval side broadcasts — no sort-merge join, no " +
      "shuffle of the train gram stream") {
    val df = Curation.decontaminate(docsDF(60))
    df.collect() // finalize any adaptive re-planning
    val ns = nodes(df)
    assert(ns.exists(_.isInstanceOf[BroadcastHashJoinExec]),
      "train-side gram join must be a broadcast hash join")
    assert(!ns.exists(_.isInstanceOf[SortMergeJoinExec]),
      "train-side gram join must be broadcast, not sort-merge")
    // the train branch must reach the join shuffle-free: every shuffle in
    // the plan belongs to the (small) eval branch or the final aggregation
    // of the (capped) join output — none may carry the raw gram column of
    // the un-aggregated train stream plus no eval column, which would mean
    // the full train gram set crossed an exchange before the join
    val trainShuffles = ns.collect { case s: ShuffleExchangeExec
      if s.child.schema.fieldNames.contains("gram") &&
        s.child.schema.fieldNames.contains("doc_id") &&
        !s.child.schema.fieldNames.exists(_.startsWith("eval")) &&
        // aggregation exchanges carry count buffers, not raw grams
        s.child.schema.fieldNames.length == 2 => s
    }
    assert(trainShuffles.isEmpty,
      s"train gram stream crossed an exchange: ${trainShuffles.mkString}")
  }

  test("packSequences and joinAsOf: every window is key-partitioned — " +
      "no single-task global sort") {
    import spark.implicits._
    val packed = Curation.packSequences(docsDF(100), seqLen = 16L)
    packed.collect()
    val pw = nodes(packed).collect { case w: WindowExec => w }
    assert(pw.nonEmpty && pw.forall(_.partitionSpec.nonEmpty),
      "packing window must be bucket-partitioned")

    val left = Seq((1L, 10L, 1L)).toDF("k", "ts", "id")
    val right = Seq((1L, 5L, 2L, 9L)).toDF("k", "ts", "id", "v")
    val joined = AsOfJoin.joinAsOf(left, right, "k", "ts", "id", Seq("v"))
    joined.collect()
    val aw = nodes(joined).collect { case w: WindowExec => w }
    assert(aw.nonEmpty && aw.forall(_.partitionSpec.nonEmpty),
      "as-of window must be key-partitioned")
  }

  test("intervalJoin: banded range join plans as an equi-join — never " +
      "BroadcastNestedLoopJoin/CartesianProduct") {
    import spark.implicits._
    val l = (0 until 500).map(i => (i.toLong % 7, i.toLong, i.toLong * 13 % 1000))
      .toDF("k", "lid", "lts")
    val r = (0 until 500).map(i => (i.toLong % 7, 1000L + i, i.toLong * 17 % 1000))
      .toDF("k", "rid", "rts")
    val joined = graft.operators.RangeJoin.intervalJoin(l, r, "lts", "rts",
      100L, Seq("k"))
    joined.collect()
    val ns = nodes(joined)
    val bad = ns.filter(p =>
      p.getClass.getSimpleName.contains("BroadcastNestedLoopJoin") ||
        p.getClass.getSimpleName.contains("CartesianProduct"))
    assert(bad.isEmpty, s"range join fell back to ${bad.map(_.nodeName)}")
    assert(ns.exists(p => p.isInstanceOf[BroadcastHashJoinExec] ||
      p.isInstanceOf[SortMergeJoinExec] ||
      p.getClass.getSimpleName.contains("ShuffledHashJoin")),
      "range join must plan as an equi-join on (bucket, keys)")
  }

  test("bloomPrunedJoin: the bloom filter is applied to the fact side " +
      "BELOW its exchange — pruned rows never shuffle") {
    import org.apache.spark.sql.functions.{col, concat, lit, pmod}
    // spark.range (not a local Seq): ConvertToLocalRelation would fold a
    // Filter over LocalRelation away and hide the shape under test
    val fact = spark.range(4000)
      .select(pmod(col("id"), lit(1000L)).as("fk"), col("id").as("payload"))
    val dim = spark.range(4000)
      .select((col("id") * 5L).as("dk"), concat(lit("d"), col("id")).as("name"))
    // keep the dim just over the broadcast-join path by disabling it: the
    // operator targets the too-big-to-broadcast regime
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = graft.operators.BloomJoin
        .bloomPrunedJoin(fact, dim, "fk", "dk", expectedItems = 4000)
      joined.collect()
      val ns = nodes(joined)
      // find the exchange whose subtree carries the fact payload: the
      // bloom-filter predicate (a FilterExec with a ScalaUDF) must sit
      // inside that subtree, i.e. the filter runs pre-shuffle
      val factExchanges = ns.collect { case s: ShuffleExchangeExec
        if s.child.schema.fieldNames.contains("payload") => s }
      assert(factExchanges.nonEmpty, "expected a shuffled fact side")
      factExchanges.foreach { ex =>
        val hasUdfFilter = ex.child.collect {
          case f: org.apache.spark.sql.execution.FilterExec
            if f.condition.toString.contains("UDF") => f
        }.nonEmpty
        assert(hasUdfFilter,
          s"bloom UDF filter must be below the fact exchange:\n${ex.child}")
      }
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("partitionBy(lang) layout: a lang-filtered read prunes to ONE " +
      "hive partition at planning time") {
    import org.apache.spark.sql.functions.{col, lit}
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft_prune").toString
    (0 until 300).map(i => (i.toLong, Seq("en", "de", "es")(i % 3), s"t$i"))
      .toDF("doc_id", "lang", "text")
      .write.mode("overwrite").partitionBy("lang").parquet(out)
    val read = spark.read.parquet(out).filter(col("lang") === lit("de"))
    read.collect()
    val scans = nodes(read).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
    assert(scans.nonEmpty)
    scans.foreach { f =>
      assert(f.partitionFilters.nonEmpty, "lang filter must prune partitions")
      assert(f.selectedPartitions.partitionCount == 1,
        s"expected 1 of 3 partitions, scanned ${f.selectedPartitions.partitionCount}")
    }
  }

  test("JL projection plans shuffle-free (row-local)") {
    import spark.implicits._
    val emb = (0 until 100)
      .map(i => (i.toLong, Seq.fill(64)(0.25f * (i % 7))))
      .toDF("vec_id", "embedding")
    val proj = graft.pipeline.Projection.projectQ8(emb)
    proj.collect()
    assert(!nodes(proj).exists(_.isInstanceOf[ShuffleExchangeExec]),
      "projection must not shuffle")
  }

  test("funnel stages: all three aggregations partition by user_id only " +
      "— no single-partition exchange") {
    val dir = "/root/testdata/sf0.001"
    val q = graft.SparkEntry.queries("q_pipe_funnel")(spark, dir)
    q.collect()
    val singles = nodes(q).collect { case s: ShuffleExchangeExec
      if s.outputPartitioning.numPartitions == 1 &&
        // the final 1-row stage-count crossJoin legitimately runs single;
        // only flag single-partition exchanges that carry per-user rows
        s.child.schema.fieldNames.contains("user_id") => s }
    assert(singles.isEmpty,
      s"per-user funnel stages must stay hash-partitioned: $singles")
  }

  test("q_arr_topk plans TakeOrderedAndProject — per-partition partials, " +
      "no global sort") {
    val q = graft.SparkEntry.queries("q_arr_topk")(spark, "/root/testdata/sf0.001")
    q.collect()
    val ns = nodes(q)
    assert(ns.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.TakeOrderedAndProjectExec]),
      "ORDER BY … LIMIT k over the exploded view must plan as TakeOrdered")
    assert(!ns.exists(_.isInstanceOf[org.apache.spark.sql.execution.SortExec]),
      "no global SortExec may appear for a top-k")
  }

  test("q_rel_q21 cascade: dims broadcast, no cartesian product, no " +
      "single-partition shuffle of per-order rows") {
    val q = graft.SparkEntry.queries("q_rel_q21")(spark, "/root/testdata/sf0.001")
    q.collect()
    val ns = nodes(q)
    assert(ns.count(_.isInstanceOf[BroadcastHashJoinExec]) >= 1,
      "supplier (and the filtered orders side at this SF) must broadcast")
    assert(!ns.exists(_.isInstanceOf[
      org.apache.spark.sql.execution.joins.CartesianProductExec]),
      "the decorrelated cascade must never plan a cartesian product")
    val singles = ns.collect { case s: ShuffleExchangeExec
      if s.outputPartitioning.numPartitions == 1 &&
        s.child.schema.fieldNames.contains("l_orderkey") => s }
    assert(singles.isEmpty,
      s"per-order aggregation must stay hash-partitioned: $singles")
  }

  test("bm25: every window is partitioned; no cartesian product; the " +
      "corpus token stream is query-vocab-filtered before its shuffle") {
    import spark.implicits._
    val docs = (0 until 40).map(i =>
      (i.toLong, s"alpha beta gamma delta doc$i one two three")).toDF("doc_id", "text")
    val q = graft.pipeline.TextOps.bm25Retrieve(docs, Seq(1 -> "alpha beta", 2 -> "gamma"))
    q.collect()
    val ns = nodes(q)
    assert(!ns.exists(_.isInstanceOf[
      org.apache.spark.sql.execution.joins.CartesianProductExec]))
    val unpartitioned = ns.collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w }
    assert(unpartitioned.isEmpty, "both top-k windows must be partitioned")
    // every shuffle carrying raw terms must carry ONLY query-vocab rows:
    // the (doc, term) stream joins the broadcast vocab before grouping,
    // so no exchange input holds the bare exploded term column alone
    // (the literal query set's own distinct also shuffles a bare term
    // column — it is driver-local data, recognizable by its
    // LocalTableScan leaf, and excluded here)
    def fromLiteral(p: SparkPlan): Boolean =
      p.collectLeaves().forall(
        _.isInstanceOf[org.apache.spark.sql.execution.LocalTableScanExec])
    val rawTermShuffles = ns.collect { case s: ShuffleExchangeExec
      if s.child.schema.fieldNames.sameElements(Array("term")) &&
        !fromLiteral(s.child) => s }
    assert(rawTermShuffles.isEmpty,
      s"corpus terms must be vocab-filtered before any exchange: $rawTermShuffles")
  }

  test("heavyHitters: the candidate-set recount join broadcasts — the " +
      "≤ partitions×capacity Misra–Gries survivors, never sort-merge") {
    // regression pin: the former .hint("broadcast") node was silently
    // dropped through the mapPartitions/toDF lineage (HintErrorLogger
    // warned and the broadcast was left to AQE); functions.broadcast
    // attaches to the join's immediate child and must stick
    val df = graft.pipeline.TextOps.heavyHitters(docsDF(60), k = 10)
    df.collect()
    val ns = nodes(df)
    assert(ns.exists(_.isInstanceOf[BroadcastHashJoinExec]),
      "candidate recount must be a broadcast hash join")
    assert(!ns.exists(_.isInstanceOf[SortMergeJoinExec]),
      "candidate recount must not fall back to sort-merge")
  }
}
