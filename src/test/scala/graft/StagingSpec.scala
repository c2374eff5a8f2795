package graft

import org.apache.spark.storage.StorageLevel

/** Lifecycle contract of the session-scoped staged-table registry: a
  * stage builds once, an evicted stage unpersists and rebuilds cleanly,
  * and pinned iterative-result RDDs release on demand — the hygiene
  * that keeps a long-lived multi-tenant session from accumulating
  * persisted storage (the round-14 verdict's "What's wrong #2"). */
class StagingSpec extends SparkSpec {
  import spark.implicits._

  test("stage: builder runs once per key, result persisted; evict " +
      "unpersists and a re-stage rebuilds") {
    var builds = 0
    def staged() = Staging.stage(spark, "spec:lifecycle") {
      builds += 1
      Seq(1, 2, 3).toDF("x")
    }
    val a = staged()
    assert(builds == 1)
    assert(a.storageLevel == StorageLevel.MEMORY_AND_DISK)
    assert(a.count() == 3)
    val b = staged()
    assert(builds == 1, "second stage call must hit the cache")
    assert(b eq a, "cache must return the SAME persisted frame")
    assert(Staging.stagedKeys(spark).contains("spec:lifecycle"))

    assert(Staging.evict(spark, "spec:lifecycle"))
    assert(a.storageLevel == StorageLevel.NONE, "evict must unpersist")
    assert(!Staging.stagedKeys(spark).contains("spec:lifecycle"))
    assert(!Staging.evict(spark, "spec:lifecycle"), "double-evict is false")

    val c = staged()
    assert(builds == 2, "post-evict stage must rebuild")
    assert(c.count() == 3)
    assert(Staging.evict(spark, "spec:lifecycle"))
  }

  test("evictSession drops every entry of the session") {
    Staging.stage(spark, "spec:a") { Seq(1).toDF("x") }
    Staging.stage(spark, "spec:b") { Seq(2).toDF("x") }
    val dropped = Staging.evictSession(spark)
    assert(dropped >= 2)
    assert(Staging.stagedKeys(spark).isEmpty)
  }

  test("a builder MAY stage a prerequisite key — nested acyclic " +
      "staging builds both and caches both") {
    var preBuilds = 0
    val out = Staging.stage(spark, "spec:nested:outer") {
      val pre = Staging.stage(spark, "spec:nested:pre") {
        preBuilds += 1; Seq(1, 2).toDF("x")
      }
      pre.withColumn("y", org.apache.spark.sql.functions.col("x") * 2)
    }
    assert(out.count() == 2)
    assert(preBuilds == 1)
    assert(Staging.stagedKeys(spark).contains("spec:nested:pre"))
    assert(Staging.stagedKeys(spark).contains("spec:nested:outer"))
    // the prerequisite serves later callers from cache
    Staging.stage(spark, "spec:nested:pre") { fail("must hit cache") }
    assert(preBuilds == 1)
    assert(Staging.evict(spark, "spec:nested:outer"))
    assert(Staging.evict(spark, "spec:nested:pre"))
  }

  test("a builder transitively staging its OWN key fails fast with " +
      "the key named (same-thread self-cycle)") {
    val e = intercept[IllegalStateException] {
      Staging.stage(spark, "spec:selfcycle") {
        Staging.stage(spark, "spec:selfcycle") { Seq(1).toDF("x") }
      }
    }
    assert(e.getMessage.contains("spec:selfcycle"))
    Staging.evict(spark, "spec:selfcycle")
  }

  test("evict racing an in-flight build does not orphan the built " +
      "frame: the evicted holder unpersists its own result on " +
      "completion") {
    import java.util.concurrent.{CountDownLatch, TimeUnit}
    val started = new CountDownLatch(1)
    val evicted = new CountDownLatch(1)
    @volatile var result: org.apache.spark.sql.DataFrame = null
    val t = new Thread(() => {
      result = Staging.stage(spark, "spec:evict-race") {
        started.countDown()
        assert(evicted.await(20, TimeUnit.SECONDS))
        Seq(1, 2, 3).toDF("x")
      }
    })
    t.start()
    assert(started.await(20, TimeUnit.SECONDS))
    // the entry exists (and is evictable) while its builder runs
    assert(Staging.evict(spark, "spec:evict-race"))
    assert(!Staging.stagedKeys(spark).contains("spec:evict-race"))
    evicted.countDown()
    t.join(60000)
    assert(!t.isAlive)
    assert(result != null, "the racing caller still gets its frame")
    assert(result.storageLevel == StorageLevel.NONE,
      "the frame persisted by a build that lost an evict race must be " +
        "unpersisted, not left as untracked storage")
  }

  test("cross-thread stage CYCLE fails fast (IllegalStateException) " +
      "instead of deadlocking on the holders' monitors") {
    import java.util.concurrent.{CountDownLatch, TimeUnit}
    val aIn = new CountDownLatch(1)
    val bIn = new CountDownLatch(1)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def worker(own: String, other: String,
        mine: CountDownLatch, theirs: CountDownLatch): Thread =
      new Thread(() => {
        try Staging.stage(spark, own) {
          mine.countDown()
          assert(theirs.await(20, TimeUnit.SECONDS))
          Staging.stage(spark, other) { Seq(1).toDF("x") }
        } catch { case t: Throwable => errs.add(t) }
      })
    val ta = worker("spec:cycle:A", "spec:cycle:B", aIn, bIn)
    val tb = worker("spec:cycle:B", "spec:cycle:A", bIn, aIn)
    ta.setDaemon(true); tb.setDaemon(true)
    ta.start(); tb.start()
    ta.join(60000); tb.join(60000)
    assert(!ta.isAlive && !tb.isAlive, "both threads must terminate")
    def cyclic(t: Throwable): Boolean =
      t.isInstanceOf[IllegalStateException] ||
        (t.getCause != null && cyclic(t.getCause))
    assert(!errs.isEmpty && errs.toArray(Array.empty[Throwable]).forall(cyclic),
      s"every failure must be the named cycle fail-fast, got: $errs")
    Staging.evict(spark, "spec:cycle:A")
    Staging.evict(spark, "spec:cycle:B")
  }

  test("pinScope: pins registered inside the scope release when it " +
      "closes (success AND failure); pins outside go to the session " +
      "registry as before") {
    def pinnedRdd() = {
      val r = sc.parallelize(1 to 10, 1)
      r.localCheckpoint(); r.count(); r
    }
    Staging.releasePinned(spark) // drain pins earlier suites registered
    val inScope = Staging.pinScope {
      val r = pinnedRdd()
      Staging.registerPinned(spark, r)
      assert(r.getStorageLevel != StorageLevel.NONE)
      r
    }
    assert(inScope.getStorageLevel == StorageLevel.NONE,
      "scope close must release the scope's pins")
    assert(Staging.releasePinned(spark) == 0,
      "scope pins must never land in the session registry")

    val failed = pinnedRdd()
    intercept[RuntimeException] {
      Staging.pinScope {
        Staging.registerPinned(spark, failed)
        sys.error("body fails")
      }
    }
    assert(failed.getStorageLevel == StorageLevel.NONE,
      "a failing scope still releases its pins")

    val outside = pinnedRdd()
    Staging.registerPinned(spark, outside)
    assert(Staging.releasePinned(spark) == 1,
      "outside a scope, registration reaches the session registry")
  }

  test("registerPinned/releasePinned free localCheckpointed storage") {
    val rdd = sc.parallelize(1 to 100, 2)
    rdd.localCheckpoint()
    rdd.count()
    assert(rdd.getStorageLevel != StorageLevel.NONE)
    Staging.registerPinned(spark, rdd)
    assert(Staging.releasePinned(spark) == 1)
    // RDD.unpersist resets the declared level synchronously (block
    // removal is async but irrelevant to the contract)
    assert(rdd.getStorageLevel == StorageLevel.NONE)
    assert(Staging.releasePinned(spark) == 0, "registry must be empty")
  }
}
