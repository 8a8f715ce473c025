package org.apache.spark

/** Test-only escape hatch: `SparkContext.setCheckpointDir` has no public
  * unsetter, but the backing field is `private[spark]`, so a one-liner in
  * this package can restore the pristine state. Lets [[graft.CheckpointSpec]]
  * exercise BOTH ckpt modes deterministically in any suite order, and —
  * crucially — undo the global flip afterwards so no later suite silently
  * inherits reliable (disk-writing) mode. Test classpath only.
  */
object GraftCheckpointTestHook {
  def clearCheckpointDir(sc: SparkContext): Unit = sc.checkpointDir = None
}
