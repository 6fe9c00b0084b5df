package graft.spark

import org.apache.spark.SparkContext

/** Shared checkpoint-dir policy for GraphX Pregel runs (connected
  * components in `kg.Canonicalize` and `ops.Dedup.connectedKeepers`).
  *
  * Pregel honors `spark.graphx.pregel.checkpointInterval` (read from
  * the SparkContext conf at context creation): every N iterations the
  * graph RDDs checkpoint, truncating an otherwise iteration-deep
  * lineage — on a billion-edge graph an executor loss late in CC would
  * replay every prior iteration. Checkpointing needs a directory; this
  * provides a LOCAL-MODE-ONLY temp fallback when the caller hasn't set
  * a durable one (kg.Main sets `<outDir>/_checkpoints`). On a cluster
  * a driver-local path is invisible to executors (each would write its
  * checkpoint parts to its own disk and the driver's listing would
  * come back empty mid-CC), so this fails fast with instructions
  * instead of half-checkpointing into a broken state.
  */
object GraphCheckpoint {
  def ensureDir(sc: SparkContext): Unit = {
    if (sc.getConf.getInt("spark.graphx.pregel.checkpointInterval", -1) > 0 &&
        sc.getCheckpointDir.isEmpty) {
      require(sc.isLocal,
        "spark.graphx.pregel.checkpointInterval is set but no checkpoint " +
          "dir is: call sc.setCheckpointDir with a SHARED path (kg.Main " +
          "sets <outDir>/_checkpoints) before running connected components " +
          "on a cluster")
      sc.setCheckpointDir(
        java.nio.file.Files.createTempDirectory("graft-cc-ckpt").toString)
    }
  }
}
