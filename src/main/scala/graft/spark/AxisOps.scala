package graft.spark

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Axis-wise array analytics that need more than a plain groupBy:
  * cumulative sums (a distributed prefix scan) and arg-extrema
  * (coordinate-returning reductions).
  *
  * Both read through the `chunked=true` DSv2 scan so the heavy phase is
  * organized per chunk; neither ever globally sorts the cell stream.
  */
object AxisOps {

  private def resolved(spark: SparkSession, root: String, dataset: String,
      variable: String, version: Option[Long]) = {
    val store = new SparkStore(spark, root)
    val vid = version.getOrElse {
      val vs = store.versions(dataset)
      require(vs.nonEmpty, s"dataset $dataset has no committed versions")
      vs.head._2
    }
    val meta = store.metadata(dataset, vid)
    val df = spark.read.format("graft")
      .option("root", root).option("dataset", dataset)
      .option("variable", variable).option("version", vid.toString)
      .option("chunked", "true").load()
    (meta, df)
  }

  /** Cumulative sum along `axis` (other coordinates fixed): output
    * (dims…, cum) with cum = Σ value over [0, d] on the axis.
    *
    * The classic TWO-PASS distributed prefix scan — a global
    * `Window.orderBy(axis)` would funnel every cell through ONE task:
    *  1. per-(other-coords, chunk) totals — map-side combinable, output
    *     is one row per chunk, tiny;
    *  2. exclusive prefix of those totals per other-coords line — a
    *     window over the CHUNK-TOTAL rows only (≤ #chunks per line);
    *  3. join the chunk offsets back and run the local cumsum inside
    *     each (other-coords, chunk) group.
    * Shuffled volume: cells once (to co-locate each line's chunk with its
    * offset) + two chunk-count-sized frames. No task ever holds more than
    * one chunk's cells. */
  def cumsumAxis(spark: SparkSession, root: String, dataset: String,
      variable: String, version: Option[Long] = None,
      axis: String): DataFrame = {
    val (meta, df) = resolved(spark, root, dataset, variable, version)
    val dims = meta.variables(variable).shape
    require(dims.contains(axis), s"variable $variable has no axis '$axis'")
    val others = dims.filterNot(_ == axis)
    val c = col(s"_chunk_$axis")
    val chunkTotals = df.groupBy((others.map(col) :+ c.as("ck")): _*)
      .agg(sum("value").as("t"))
    val offW = Window.partitionBy(others.map(col): _*).orderBy(col("ck"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = chunkTotals.withColumn("off",
      coalesce(sum("t").over(offW), lit(0L)))
      .select((others.map(col) :+ col("ck") :+ col("off")): _*)
    val inW = Window
      .partitionBy((others.map(col) :+ col("ck")): _*)
      .orderBy(col(axis))
      .rowsBetween(Window.unboundedPreceding, 0)
    df.withColumn("ck", c)
      .withColumn("local", sum("value").over(inW))
      .join(offsets, (others :+ "ck").toSeq)
      .select((dims.map(col) :+ (col("local") + col("off")).as("cum")): _*)
  }

  /** Linear upsampling (interpolation) along `axis` — the inverse of
    * `Coarsen`: output length (n−1)·k + 1, with
    * `out[q·k + r] = ⌊((k−r)·src[q] + r·src[q+1]) / k⌋` (endpoints exact,
    * interior points integer-floor interpolated — deterministic on any
    * engine, where float lerp would drift in the last ulp).
    *
    * The only cross-cell dependency is each cell's successor, which can
    * live in the NEXT chunk — solved like [[Stencil]]: the first cell of
    * every chunk also duplicates into its predecessor's group (a 1-cell
    * halo), `lead` then runs entirely inside each (other-coords, chunk)
    * group, and each group emits only the out-cells of the cells it owns.
    * One shuffle, group size ≤ chunkExtent + 1, no global sort. */
  def interpAxis(spark: SparkSession, root: String, dataset: String,
      variable: String, version: Option[Long] = None,
      axis: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val (meta, df) = resolved(spark, root, dataset, variable, version)
    val dims = meta.variables(variable).shape
    require(dims.contains(axis), s"variable $variable has no axis '$axis'")
    val others = dims.filterNot(_ == axis)
    val ext = meta.chunkDimensions(axis)
    val nChunks = (meta.dimensions(axis) + ext - 1) / ext
    val c = col(s"_chunk_$axis")
    val pos = col(axis) - c * ext
    val targets = array_compact(array(c, when(pos === 0 && c > 0, c - 1)))
    val tagged = df.select(
      (dims.map(col) :+ col("value") :+ c.as("own") :+
        explode(targets).as("tc")): _*)
    val w = Window
      .partitionBy((others.map(col) :+ col("tc")): _*)
      .orderBy(col(axis))
    val pairs = tagged
      .withColumn("vn", lead("value", 1).over(w))
      .filter(col("own") === col("tc"))
    val rs = array((0 until k).map(lit): _*)
    pairs
      .select((others.map(col) :+ col(axis) :+ col("value") :+ col("vn") :+
        explode(rs).as("r")): _*)
      .filter(col("vn").isNotNull || col("r") === 0)
      .select((others.map(col) :+
        (col(axis) * k + col("r")).as(axis) :+
        expr(s"((${k} - r) * value + r * coalesce(vn, value)) div $k")
          .as("value")): _*)
  }

  /** Forward-fill along `axis` (xarray `ffill`): each cell takes the
    * most recent non-fill value at or before it on its line; cells with
    * no predecessor stay at the variable's fill. Output (dims…, value,
    * filled).
    *
    * Same two-pass shape as [[cumsumAxis]] — a global
    * `Window.orderBy(axis)` would serialize each line through one task:
    *  1. within each (other-coords, chunk) group, `last(…, ignoreNulls)`
    *     over the chunk's own cells;
    *  2. per-chunk summaries (the line-segment's LAST non-fill value,
    *     one tiny row per chunk) get a carry-in via an ignore-nulls
    *     window over PRIOR chunks only — O(#chunks) rows;
    *  3. carry-ins join back and `coalesce(within, carry, fill)`.
    * Shuffle: cells once + two chunk-count-sized frames; no task holds
    * more than one chunk's cells. NaN fills are matched with isnan
    * (NaN ≠ NaN would otherwise never detect a fill cell). */
  def ffillAxis(spark: SparkSession, root: String, dataset: String,
      variable: String, version: Option[Long] = None,
      axis: String): DataFrame = {
    val (meta, df) = resolved(spark, root, dataset, variable, version)
    val dims = meta.variables(variable).shape
    require(dims.contains(axis), s"variable $variable has no axis '$axis'")
    val others = dims.filterNot(_ == axis)
    val c = col(s"_chunk_$axis")
    val fillV = meta.fill(variable)
    val isFillCell =
      if (fillV.isNaN) isnan(col("value").cast("double"))
      else col("value") === lit(fillV).cast(df.schema("value").dataType)
    val v0 = when(!isFillCell, col("value"))
    val wWithin = Window
      .partitionBy((others.map(col) :+ c): _*)
      .orderBy(col(axis))
      .rowsBetween(Window.unboundedPreceding, 0)
    val cells = df
      .withColumn("ck", c)
      .withColumn("within", last(v0, ignoreNulls = true).over(wWithin))
    val summaries = df
      .withColumn("ck", c)
      .groupBy((others.map(col) :+ col("ck")): _*)
      .agg(max(struct(
        coalesce(when(!isFillCell, col(axis)), lit(Long.MinValue)).as("at"),
        v0.as("v"))).as("s"))
    val wCarry = Window.partitionBy(others.map(col): _*).orderBy(col("ck"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carries = summaries
      .withColumn("carry", last(
        when(col("s.at") =!= Long.MinValue, col("s.v")), ignoreNulls = true)
        .over(wCarry))
      .select((others.map(col) :+ col("ck") :+ col("carry")): _*)
    cells.join(carries, (others :+ "ck").toSeq)
      .select((dims.map(col) :+ col("value") :+
        coalesce(col("within"), col("carry"),
          lit(fillV).cast(df.schema("value").dataType)).as("filled")): _*)
  }

  /** Label-based selection (xarray `sel(axis=slice(lo, hi))`): a 1-d
    * COORDINATE variable on `axis` holds the labels (monotone non-
    * decreasing along the axis — the same precondition xarray's slice
    * sel has); cells of `dataVar` whose label falls in [lo, hi) are
    * returned as (dims…, label, value).
    *
    * Two-phase, pruning-preserving: phase 1 scans ONLY the coordinate
    * variable (1-d — metadata-sized next to an N-d data variable) and
    * reduces the matching labels to [minIdx, maxIdx] — two longs to the
    * driver, like a centroid collect. Phase 2 slices the data variable
    * on that index range, so the data scan plans just the covering
    * chunks (the whole point: label predicates become index pruning,
    * not a full-scan filter), and joins the label back on the axis
    * coordinate — both sides ride the same chunk grid, so the join is
    * the exchange-free storage-partitioned shape when grids align. */
  def selByLabel(spark: SparkSession, root: String, dataset: String,
      dataVar: String, coordVar: String, axis: String,
      lo: Long, hi: Long, version: Option[Long] = None): DataFrame = {
    val (meta, coords) = resolved(spark, root, dataset, coordVar, version)
    require(meta.variables(coordVar).shape == Vector(axis),
      s"coordinate variable $coordVar must be 1-d on '$axis'")
    val hit = coords.filter(col("value") >= lo && col("value") < hi)
      .agg(min(col(axis)).as("lo"), max(col(axis)).as("hi"))
      .collect().head
    // No label in range: still return the documented (dims…, label,
    // value) SCHEMA (an all-columns-dropped emptyDataFrame would break
    // any caller that selects or unions on the result) — plan a 1-cell
    // probe slice purely for its schema and limit(0) it.
    val empty = hit.isNullAt(0)
    val (i0, i1) = if (empty) (0L, 1L) else (hit.getLong(0), hit.getLong(1) + 1)
    val store = new SparkStore(spark, root)
    val vid = version.getOrElse(store.versions(dataset).head._2)
    val dims = meta.variables(dataVar).shape
    val req = graft.core.Slice(
      dims.map(d => if (d == axis) i0 else 0L),
      dims.map(d => if (d == axis) i1 else if (empty) 1L else meta.dimensions(d)))
    val data = store.reader(dataset).onVersion(vid).exploded(dataVar, req)
    val labels = coords.filter(col(axis) >= i0 && col(axis) < i1)
      .select(col(axis), col("value").as("label"))
    val out = data.join(labels, axis)
      .select((dims.map(col) :+ col("label") :+ col("value")): _*)
    if (empty) out.limit(0) else out
  }

  /** First difference along `axis` (xarray `diff(dim)`): output
    * (dims…, diff) with diff[i] = v[i] − v[i−1], defined for axis
    * coordinate ≥ 1 (the first cell of each line has no predecessor and
    * is dropped, matching xarray's length-(n−1) result).
    *
    * The only cross-cell dependency is each cell's PREDECESSOR, which can
    * live in the previous chunk — the mirror of [[interpAxis]]'s
    * successor halo: the last cell of every chunk also duplicates into
    * its successor's group (a 1-cell halo), `lag` then runs entirely
    * inside each (other-coords, chunk) group, and each group emits only
    * the cells it owns. One shuffle, group size ≤ chunkExtent + 1, no
    * global sort — where a naive `Window.orderBy(axis)` would funnel
    * every line through one task. */
  def diffAxis(spark: SparkSession, root: String, dataset: String,
      variable: String, version: Option[Long] = None,
      axis: String): DataFrame = {
    val (meta, df) = resolved(spark, root, dataset, variable, version)
    val dims = meta.variables(variable).shape
    require(dims.contains(axis), s"variable $variable has no axis '$axis'")
    val others = dims.filterNot(_ == axis)
    val ext = meta.chunkDimensions(axis)
    val c = col(s"_chunk_$axis")
    val pos = col(axis) - c * ext
    // a chunk's LAST cell (pos == ext−1) also feeds the next chunk's lag;
    // the trailing overhang chunk's last cell never needs to (no successor)
    val targets = array_compact(array(c, when(pos === ext - 1, c + 1)))
    // ownership (own == tc) is re-derivable from the cell coordinate
    // (own = floor(axis / ext)), so it does NOT ride the exchange as an
    // extra column — the shuffle carries exactly dims + value + tc
    val tagged = df.select(
      (dims.map(col) :+ col("value") :+ explode(targets).as("tc")): _*)
    val w = Window
      .partitionBy((others.map(col) :+ col("tc")): _*)
      .orderBy(col(axis))
    tagged
      .withColumn("vp", lag("value", 1).over(w))
      .filter(col(axis) - col("tc") * ext >= 0 &&
        col(axis) - col("tc") * ext < ext && col("vp").isNotNull)
      .select((dims.map(col) :+ (col("value") - col("vp")).as("diff")): _*)
  }

  /** Exact interpolated quantiles along `axis`: each other-coords line
    * collapses to its p-quantiles (linear interpolation between order
    * statistics — the xarray/numpy `quantile(dim=…)` rule). Output
    * (others…, one column per requested p).
    *
    * Quarter-point fractions over integer cell values make the
    * interpolation EXACTLY representable in binary doubles, so results
    * hash-match any IEEE engine. Intentionally a plain per-line
    * `percentile` aggregate: a line must gather to one task (order
    * statistics don't decompose), so group size = the axis extent —
    * fine while one line fits a task; for monster axes the engine's
    * histogram-sketch quantiles (q_pipe_hist_quantiles) are the stated
    * scale path. */
  def quantileAxis(spark: SparkSession, root: String, dataset: String,
      variable: String, version: Option[Long] = None,
      axis: String, ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty, "at least one quantile fraction required")
    val (meta, df) = resolved(spark, root, dataset, variable, version)
    val dims = meta.variables(variable).shape
    require(dims.contains(axis), s"variable $variable has no axis '$axis'")
    val others = dims.filterNot(_ == axis)
    val grouped = if (others.isEmpty) df.groupBy()
      else df.groupBy(others.map(col): _*)
    val aggs = ps.map { p =>
      percentile(col("value"), lit(p))
        .as(s"q${(p * 100).round}")
    }
    grouped.agg(aggs.head, aggs.tail: _*)
  }

  /** Full reduction along `axis` (xarray `reduce(dim=…)` analog): each
    * other-coords line collapses to one row carrying sum/min/max/count of
    * the line's cells. Output dims are the surviving coordinates — the
    * result is an (N−1)-d array frame.
    *
    * Deliberately a plain `groupBy(others).agg(…)`: Catalyst plans this as
    * partial HashAggregate inside each chunk-aligned input partition
    * followed by a final aggregate over one row per (others, partition) —
    * i.e. the per-chunk pre-fold falls out of the engine's own two-phase
    * aggregation, with the shuffle carrying partials, never cells. */
  def reduceAxis(spark: SparkSession, root: String, dataset: String,
      variable: String, version: Option[Long] = None,
      axis: String): DataFrame = {
    val (meta, df) = resolved(spark, root, dataset, variable, version)
    val dims = meta.variables(variable).shape
    require(dims.contains(axis), s"variable $variable has no axis '$axis'")
    val others = dims.filterNot(_ == axis)
    val grouped = if (others.isEmpty) df.groupBy() else df.groupBy(others.map(col): _*)
    grouped.agg(
      sum("value").as("v_sum"),
      min("value").as("v_min"),
      max("value").as("v_max"),
      count("value").as("v_cnt"))
  }

  /** Arg-extremum along `axis`: for each other-coords line, the maximum
    * value and the SMALLEST axis coordinate attaining it (deterministic
    * tie-break). Per-chunk partials reduce each chunk's line segment to
    * one (max, argmax) pair — the final combine shuffles only those. */
  def argmaxAxis(spark: SparkSession, root: String, dataset: String,
      variable: String, version: Option[Long] = None,
      axis: String): DataFrame = {
    val (meta, df) = resolved(spark, root, dataset, variable, version)
    val dims = meta.variables(variable).shape
    require(dims.contains(axis), s"variable $variable has no axis '$axis'")
    val others = dims.filterNot(_ == axis)
    val c = col(s"_chunk_$axis")
    // struct ordering gives (max value, then min coord among maxes) via
    // max of (value, -coord); carried as (value, negCoord)
    val pair = struct(col("value"), (-col(axis)).as("nc"))
    val partial = df.groupBy((others.map(col) :+ c.as("ck")): _*)
      .agg(max(pair).as("p"))
    val grouped = if (others.isEmpty) partial.groupBy()
      else partial.groupBy(others.map(col): _*)
    grouped.agg(max(col("p")).as("p"))
      .select((others.map(col) :+ col("p.value").as("v_max") :+
        (-col("p.nc")).as(s"${axis}_argmax")): _*)
  }
}
