package graft.ops

import org.apache.spark.sql.Dataset

/** Lifecycle helper for operators that return localCheckpoint-materialized
  * frames (`TextAnalysis.unigramLogProb`, `Similarity.sq8TopK`): those
  * operators checkpoint their (small, O(docs) / O(queries×k)) result so
  * their large intermediate caches can unpersist before returning — but a
  * local checkpoint's executor blocks are NOT freed by `unpersist()`, so
  * a long-running session that calls such operators repeatedly would pin
  * every result until the JVM garbage-collects the dropped reference. */
object Checkpoints {

  /** Free the executor blocks behind a localCheckpoint-materialized frame.
    * Call when done with the result; the frame must NOT be evaluated
    * again afterwards. No-op for ordinary (non-checkpointed) frames. */
  def release(df: Dataset[_]): Unit =
    org.apache.spark.sql.GraftSql.freeLocalCheckpoint(df)
}
