package graft.functions

import graft.SparkSpec

/** Pins the measured release semantics of localCheckpoint blocks (r17
  * third review): `Dataset.unpersist` is a silent no-op on them — only
  * [[Checkpoints.unpersist]]'s direct RDD release frees the storage.
  * If a Spark upgrade ever changes this, the scaladoc contract (and the
  * codebase's release discipline) should be revisited — this spec is
  * the tripwire.
  */
class CheckpointsSpec extends SparkSpec {
  import spark.implicits._

  test("Dataset.unpersist is a no-op on localCheckpoint blocks; " +
      "Checkpoints.unpersist releases them; the strict matcher skips " +
      "frames that merely reference a shared checkpoint") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.size
    val df = (1 to 1000).toDF("x").localCheckpoint()
    assert(sc.getPersistentRDDs.size === before + 1)
    df.unpersist(true)
    assert(sc.getPersistentRDDs.size === before + 1,
      "Dataset.unpersist released checkpoint blocks — Spark semantics " +
        "changed; revisit the Checkpoints contract")
    // a frame that merely CONSUMES the checkpoint (a filter over it) is
    // not matched — the strictness that keeps shared working sets alive
    Checkpoints.unpersist(df.filter($"x" > 10))
    assert(sc.getPersistentRDDs.size === before + 1)
    // one Project over the checkpoint IS matched (the `.drop` shape) —
    // the hitsUntil cold-round-1 guard exists precisely because of this
    Checkpoints.unpersist(df.select($"x"))
    assert(sc.getPersistentRDDs.size === before,
      "Checkpoints.unpersist failed to release the checkpoint")
  }
}
