package graft.engine

import graft.core._
import graft.meta.DatasetMeta
import graft.store.{ChunkStore, Index}

/** Backend-agnostic read/write algorithms — the Scala analogs of the
  * reference's core dataflow (reference: src/io/mandoline/impl.clj:187-308,
  * src/io/mandoline.clj:223-270). These run wherever the caller is: on the
  * driver for small reads, inside executor tasks for the distributed path
  * (graft.spark).
  */
object Engine {

  final case class VariableReader(meta: DatasetMeta, varName: String,
      index: Index, chunkStore: ChunkStore)

  /** Base chunk for an update: current version's chunk if present, else the
    * parent's chunk merged onto a child-shaped fill slab (grow/shrink aware),
    * else fill (reference: impl.clj:232-244). */
  def getBaseChunk(myCurrentHash: Option[String], index: Index,
      parentIndex: Option[Index], store: ChunkStore, coord: Vector[Long]): Slab = {
    val meta = index.meta
    val varName = index.varName
    val dtype = meta.dtype(varName)
    val chunkSlice = meta.chunkSlice(varName, coord)
    myCurrentHash match {
      case Some(h) => hashToSlab(h, store, dtype, chunkSlice)
      case None =>
        val parentHash = parentIndex.flatMap(_.chunkAt(coord))
        (parentHash, parentIndex) match {
          case (Some(ph), Some(pi)) =>
            val parentSlice = pi.meta.chunkSlice(varName, coord)
            val base = blankSlab(meta, varName, dtype, chunkSlice)
            base.mergeFrom(hashToSlab(ph, store, dtype, parentSlice))
          case _ => blankSlab(meta, varName, dtype, chunkSlice)
        }
    }
  }

  /** chunk bytes → typed slab positioned at `slice`
    * (reference: impl.clj:215-219). */
  def hashToSlab(hash: String, store: ChunkStore, dtype: DType, slice: Slice): Slab =
    Slab(dtype, slice, store.readChunk(hash))

  /** Fill-valued slab for coordinates absent from the index
    * (reference: impl.clj:221-223). */
  def blankSlab(meta: DatasetMeta, varName: String, dtype: DType, slice: Slice): Slab =
    Slab.empty(dtype, slice, meta.fill(varName))

  /** Read-modify-write one chunk with CAS retry
    * (reference: impl.clj:246-278). `writtenChunks` dedups blob writes
    * within one logical write (reference: impl.clj:256-257; behavior pinned
    * by test/io/mandoline/impl_test.clj:17-39). */
  def updateChunk(index: Index, parentIndex: Option[Index], store: ChunkStore,
      coord: Vector[Long], slab: Slab,
      writtenChunks: java.util.Set[String]): String = {
    var myCurrentHash = index.chunkAtExact(coord)
    var done: Option[String] = None
    while (done.isEmpty) {
      val base = getBaseChunk(myCurrentHash, index, parentIndex, store, coord)
      base.mergeFrom(slab)
      val hash = base.contentHash
      val refCount = -1L // refcounting unimplemented, as in the reference (impl.clj:253-254)
      if (!writtenChunks.contains(hash) && !myCurrentHash.contains(hash)) {
        store.writeChunk(hash, refCount, base.bytes)
        writtenChunks.add(hash)
      }
      if (index.writeIndex(coord, myCurrentHash, hash)) done = Some(hash)
      else myCurrentHash = index.chunkAtExact(coord) // another writer won; re-merge
    }
    done.get
  }

  /** Write a sequence of slabs through an index
    * (reference: impl.clj:280-308). Parallelism here is the caller's
    * concern — the Spark path shreds and shuffles instead. */
  def writeVariable(store: ChunkStore, index: Index, parentIndex: Option[Index],
      slabs: IterableOnce[Slab]): Unit = {
    val meta = index.meta
    val grid = meta.chunkGridSlice(index.varName)
    val written = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    slabs.iterator.foreach { slab =>
      ChunkGrid.toChunkCoordinates(slab.slice, grid).foreach { coord =>
        updateChunk(index, parentIndex, store, coord, slab, written)
      }
    }
  }

  /** Per-chunk stream of a hyperslab at this reader's version, each chunk
    * clipped to the request (reference: src/io/mandoline.clj:223-258). */
  def stream(reader: VariableReader, request: Slice,
      checkBounds: Boolean = true): Iterator[Slab] = {
    val VariableReader(meta, varName, index, store) = reader
    val dtype = meta.dtype(varName)
    val varSlice = meta.varSlice(varName)
    require(request.nonEmpty, s"request slice is empty: $request")
    if (checkBounds && !request.isContainedIn(varSlice))
      throw new IndexOutOfBoundsException(
        s"Request slice $request crosses the variable's extent: $varSlice.")
    val grid = meta.chunkGridSlice(varName)
    // A STRIDED request stays first-class here (the reference deprecates
    // its strided path, slice.clj:81-102; we keep the semantics without
    // its per-point reads): toChunkCoordinates walks the stride lattice,
    // so chunks holding NO selected point are never fetched (a step
    // larger than the chunk extent skips whole chunks), and each fetched
    // chunk is clipped to the request's lattice (gather subset) instead
    // of the plain box intersection.
    ChunkGrid.toChunkCoordinates(request, grid).iterator.map { coord =>
      val chunkSlice = meta.chunkSlice(varName, coord)
      val slab = index.chunkAt(coord) match {
        case Some(h) => hashToSlab(h, store, dtype, chunkSlice)
        case None => blankSlab(meta, varName, dtype, chunkSlice)
      }
      if (request.stepIsOne) slab.intersectWith(request)
      else slab.subset(request.intersectLattice(slab.slice))
    }
  }

  /** Materialize one hyperslab (reference: src/io/mandoline.clj:260-270).
    * Instrumented like the reference's opt-in timers
    * (io/mandoline.clj:312-321). */
  def getSlice(reader: VariableReader, request: Slice,
      checkBounds: Boolean = true): Slab =
    graft.metrics.Instrument.timed("engine.getSlice") {
      val fill = reader.meta.fill(reader.varName)
      val response = Slab.empty(reader.meta.dtype(reader.varName), request, fill)
      stream(reader, request, checkBounds).foldLeft(response)(_.mergeFrom(_))
    }
}
