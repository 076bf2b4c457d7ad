package graft.ops

import graft.SparkSpec
import org.apache.spark.storage.StorageLevel

/** The scoped-release discipline for concurrent pipelines: a
  * [[Staged.scoped]] body releases exactly what it staged — never a
  * frame or checkpoint leaf owned by the global queues or by another
  * scope. The hazard this pins: two streaming monitors in one session,
  * where one epoch's global release could destroy the other's
  * in-flight checkpointed query sample between creation and
  * consumption (truncated lineage cannot recompute).
  */
class StagedScopeSpec extends SparkSpec {
  import spark.implicits._

  private def df(tag: Int) =
    (0 until 8).map(i => (i.toLong + tag, s"v$tag-$i")).toDF("id", "v")

  test("scoped releases its own persisted frames; global and outer frames survive") {
    Staged.release() // clean slate for the global queue
    val global = Staged(df(100))
    global.count()
    assert(global.storageLevel != StorageLevel.NONE)
    var inner: org.apache.spark.sql.DataFrame = null
    Staged.scoped {
      inner = Staged(df(200))
      inner.count()
      assert(inner.storageLevel != StorageLevel.NONE)
      // nested scope: releases only ITS frame, not the enclosing one's
      var nested: org.apache.spark.sql.DataFrame = null
      Staged.scoped {
        nested = Staged(df(300))
        nested.count()
      }
      assert(nested.storageLevel == StorageLevel.NONE,
        "a nested scope must release its own frame at its end")
      assert(inner.storageLevel != StorageLevel.NONE,
        "a nested scope must not release the enclosing scope's frame")
    }
    assert(inner.storageLevel == StorageLevel.NONE,
      "a scope must release its own frames at its end")
    assert(global.storageLevel != StorageLevel.NONE,
      "a scope must never drain the globally tracked queue")
    Staged.release()
    assert(global.storageLevel == StorageLevel.NONE)
  }

  test("a scope cannot destroy another pipeline's in-flight checkpointed result") {
    // pipeline A checkpoints a result leaf (global queue — A owns it)
    val sampleA = Staged.checkpointed(df(1).orderBy($"id").limit(4))
    assert(sampleA.count() == 4L)
    // pipeline B runs a full scoped epoch in between — the exact
    // interleaving that used to fail A with missing-checkpoint blocks
    Staged.scoped {
      val sampleB = Staged.checkpointed(df(2).orderBy($"id").limit(4))
      assert(sampleB.count() == 4L)
      Staged(df(3)).count()
    }
    // A's sample is still fully consumable after B's epoch released
    assert(sampleA.count() == 4L,
      "a scoped epoch must not release another pipeline's checkpoint")
    assert(sampleA.select($"id").as[Long].collect().sorted.length == 4)
    Staged.releaseAll() // A's owner cleans up
  }

  test("scoped releases on failure too, and restores the enclosing scope") {
    var inner: org.apache.spark.sql.DataFrame = null
    Staged.scoped {
      intercept[RuntimeException] {
        Staged.scoped {
          inner = Staged(df(400))
          inner.count()
          throw new RuntimeException("epoch failed")
        }
      }
      assert(inner.storageLevel == StorageLevel.NONE,
        "a failed scope must still release its frames")
      // the enclosing scope is restored: new frames land in IT, so
      // they release at the OUTER end, not in the global queue
      val outer = Staged(df(500))
      outer.count()
      inner = outer
    }
    assert(inner.storageLevel == StorageLevel.NONE,
      "after an inner scope exits, registration must return to the outer scope")
  }
}
