import org.apache.spark.sql.Dataset

/** Package-level helpers shared by every graft operator. */
package object graft {

  /** Fault-tolerant materialization switch for corpus-scale intermediates.
    *
    * `Dataset.localCheckpoint()` truncates lineage with NO recompute path:
    * the blocks live only in executor storage, so on a real cluster one
    * lost executor kills the job mid-run. That is acceptable on local[32]
    * and fatal at 100 TB. Every corpus-scale materialization in the
    * operators routes through this one switch:
    *
    *  - when a reliable checkpoint location is configured — either
    *    `SparkContext.setCheckpointDir` was called, or the conf key
    *    `spark.graft.checkpoint.dir` is set (we lazily install it as the
    *    context's checkpoint dir) — use reliable `Dataset.checkpoint()`:
    *    blocks land on fault-tolerant storage and lost executors recompute
    *    from there;
    *  - otherwise (local dev, bench) keep `localCheckpoint()`: identical
    *    cut-the-lineage semantics, no distributed-FS round trip.
    *
    * Both paths are eager, return the same rows ([[CheckpointSpec]] pins
    * this), and preserve the input's partitioning — callers that
    * repartition BEFORE checkpointing (e.g. the x18 label-propagation
    * loop) keep their co-location either way.
    *
    * Reliable mode persists the plan around the `checkpoint()` call:
    * eager `Dataset.checkpoint()` on an UNPERSISTED plan computes it
    * twice (the internal count job, then the checkpoint-write job
    * recomputes from scratch — the `RDD.checkpoint` scaladoc's own
    * warning), which would tax every iterative caller (PageRank ×10,
    * dup-cluster rounds, Lloyd ×3) ~2× per round whenever
    * `spark.graft.checkpoint.dir` is set. The checkpoint is taken
    * through a RE-PLANNED twin of the input (`ds.as(ds.encoder)` — a
    * fresh `QueryExecution` over the same logical plan): a caller that
    * already forced `ds.queryExecution.executedPlan` before calling
    * `ckpt` (e.g. a plan-capture probe) has memoized a physical plan
    * that predates the persist and contains no `InMemoryTableScan`, so
    * checkpointing `ds` itself would silently re-enable the
    * double-compute. Re-planning after `persist` guarantees the cache
    * substitution is seen regardless of the caller's planning history.
    * The cache is dropped as soon as the checkpoint files exist —
    * steady-state memory holds only the round in flight.
    */
  def ckpt[T](ds: Dataset[T]): Dataset[T] = {
    val sc = ds.sparkSession.sparkContext
    if (sc.getCheckpointDir.isEmpty)
      ds.sparkSession.conf.getOption("spark.graft.checkpoint.dir")
        .foreach(sc.setCheckpointDir)
    if (sc.getCheckpointDir.isDefined) {
      ds.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try ds.as[T](ds.encoder).checkpoint()
      finally ds.unpersist(blocking = false)
    } else ds.localCheckpoint()
  }

  /** `.ckpt()` postfix form of [[ckpt]] — in scope throughout `graft.*`
    * via this enclosing package object.
    */
  implicit class CkptOps[T](private val ds: Dataset[T]) extends AnyVal {
    def ckpt(): Dataset[T] = graft.ckpt(ds)
  }
}
