package graft.spark.source

import graft.spark.SparkStore
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** SQL maintenance surface (Spark 4 `ProcedureCatalog`):
  *
  * {{{
  * CALL graft.system.compact('climate')         -- checkpoint version id
  * CALL graft.system.expire_history('climate')  -- versions expired
  * CALL graft.system.vacuum()                   -- blobs reclaimed
  * }}}
  *
  * Each returns one `(value BIGINT)` row via a LocalScan — the full
  * compact → expire_history → vacuum maintenance cycle runnable from
  * pure SQL, like the porcelain on SparkStore it delegates to.
  */
private[source] final class MaintenanceProcedure(store: SparkStore,
    procName: String) extends UnboundProcedure {

  override def name: String = procName

  override def description: String = procName match {
    case "compact" =>
      "materialize the MVCC-resolved index as a checkpoint version"
    case "expire_history" =>
      "drop index partitions + manifests below the newest checkpoint"
    case "refresh_rollup" =>
      "advance (creating if absent) an incrementally-maintained coarsened " +
        "(sum, cnt) view of a variable; returns view versions committed"
    case "history" =>
      "list committed versions newest-first: (version, committed_ms, " +
        "is_checkpoint, n_variables)"
    case "clone" =>
      "zero-copy clone: manifests + index copied, chunk blobs shared; " +
        "returns versions cloned"
    case _ => "mark-and-sweep GC of unreferenced chunk blobs"
  }

  override def bind(inputType: StructType): BoundProcedure =
    new BoundProcedure {
      override def name: String = procName
      override def description: String = MaintenanceProcedure.this.description
      override def parameters: Array[ProcedureParameter] =
        if (procName == "vacuum")
          Array(ProcedureParameter.in("grace_ms", LongType)
            .defaultValue(SparkStore.VacuumGraceMs.toString)
            .comment("age a blob must reach before it is sweepable")
            .build())
        else if (procName == "refresh_rollup")
          Array(
            ProcedureParameter.in("src_dataset", StringType).build(),
            ProcedureParameter.in("src_variable", StringType).build(),
            ProcedureParameter.in("view_dataset", StringType).build(),
            ProcedureParameter.in("factors", StringType)
              .comment("per-axis pooling factors, 'dim:k[,dim:k…]' — " +
                "each k must divide its axis's chunk extent").build(),
            ProcedureParameter.in("checkpoint", StringType)
              .comment("streaming checkpoint dir carrying the resume " +
                "offset; reuse the same path on every refresh").build())
        else if (procName == "clone")
          Array(
            ProcedureParameter.in("src_dataset", StringType).build(),
            ProcedureParameter.in("dst_dataset", StringType).build())
        else Array(ProcedureParameter.in("dataset", StringType).build())
      // side-effecting by definition — never cache/reuse a result
      override def isDeterministic: Boolean = false
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        if (procName == "history") {
          val historyRows = store.history(input.getUTF8String(0).toString).map {
            case (vid, ts, ckpt, nVars) =>
              new GenericInternalRow(Array[Any](vid, ts,
                if (ckpt) 1L else 0L, nVars.toLong)): InternalRow
          }.toArray
          return java.util.List.of[Scan](new LocalScan {
            override def rows(): Array[InternalRow] = historyRows
            override def readSchema(): StructType = StructType(Seq(
              StructField("version", LongType, nullable = false),
              StructField("committed_ms", LongType, nullable = false),
              StructField("is_checkpoint", LongType, nullable = false),
              StructField("n_variables", LongType, nullable = false)))
            override def description(): String = "graft history"
          }).iterator()
        }
        val result: Long = procName match {
          case "compact" => store.compact(input.getUTF8String(0).toString)
          case "expire_history" =>
            store.expireHistory(input.getUTF8String(0).toString)
          case "clone" =>
            store.cloneDataset(input.getUTF8String(0).toString,
              input.getUTF8String(1).toString)
          case "refresh_rollup" =>
            val (src, srcVar, view) = (input.getUTF8String(0).toString,
              input.getUTF8String(1).toString, input.getUTF8String(2).toString)
            val factors = input.getUTF8String(3).toString.split(',')
              .map(_.split(':') match {
                case Array(d, k) => d.trim -> k.trim.toLong
                case bad => throw new IllegalArgumentException(
                  s"refresh_rollup: bad factors entry '${bad.mkString(":")}'" +
                    " — want dim:k[,dim:k…]")
              }).toMap
            val before =
              if (store.datasetExists(view)) store.versions(view).length else 0
            graft.streaming.Rollup.maintain(
              org.apache.spark.sql.SparkSession.active, store.root,
              src, srcVar, view, factors, input.getUTF8String(4).toString)
            (store.versions(view).length - before).toLong
          case _ => store.vacuum(graceMs = input.getLong(0))
        }
        java.util.List.of[Scan](new LocalScan {
          override def rows(): Array[InternalRow] =
            Array(new GenericInternalRow(Array[Any](result)))
          override def readSchema(): StructType =
            StructType(Seq(StructField("value", LongType, nullable = false)))
          override def description(): String = s"graft $procName result"
        }).iterator()
      }
    }
}

private[source] object MaintenanceProcedure {
  val Names: Seq[String] = Seq("compact", "expire_history", "vacuum",
    "refresh_rollup", "history", "clone")
}
