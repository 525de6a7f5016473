package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bytes-aware initial shuffle-partition rule
  * ([[GraftSession.sizedShufflePartitions]], r15 — the measured
  * shufflesweep100.json sizing rule applied to the engine session). The
  * cases anchor the two ends that matter: the committed bench basis at
  * sf0.1 must be UNCHANGED (per-core floor), and the 100x slice must size
  * into the measured sweet-spot band instead of the spilling core-count
  * default.
  */
class SizedPartitionsSpec extends AnyFunSuite {

  private val MB = 1024L * 1024

  test("sf0.1-sized input stays at the per-core floor — committed bench basis unchanged") {
    // /root/testdata/sf0.1 totals ~17.5 MB of parquet; even with the 4x
    // in-flight allowance that is under one 40 MB target partition
    assert(GraftSession.sizedShufflePartitions(18L * MB, 32) === 32)
    assert(GraftSession.sizedShufflePartitions(18L * MB, 4) === 4)
  }

  test("zero / missing input prices to the per-core floor") {
    assert(GraftSession.sizedShufflePartitions(0L, 32) === 32)
    assert(GraftSession.sizedShufflePartitions(-1L, 32) === 32)
  }

  test("the 100x slice sizes into the measured sweet-spot band") {
    // /tmp/graft_scale/x100 totals ~2.46 GB compressed; the rule must land
    // the initial count well above the spilling 32-partition default and
    // at-or-above the measured 128-partition optimum, leaving AQE to
    // coalesce the real shuffle back to ~40-64 MB partitions
    val p = GraftSession.sizedShufflePartitions(2458L * MB, 32)
    assert(p >= 128 && p <= 512, s"expected 100x slice in [128, 512], got $p")
    // t25's real shuffle there is ~5.5 GB: the sized count must leave
    // post-shuffle partitions AT or UNDER the 64 MB AQE advisory so
    // coalescing (which only merges down) can reach the sweet spot
    assert(5500L * MB / p <= 64L * MB)
  }

  test("monotonic in input bytes") {
    val pts = Seq(0L, 18L * MB, 500L * MB, 2458L * MB, 100L * 1024 * MB)
      .map(GraftSession.sizedShufflePartitions(_, 32))
    assert(pts === pts.sorted)
  }

  test("capped at 128 task waves per core") {
    // a petabyte-scale input must not explode the task count on a small
    // core budget — the cap trades partition size back up and the rule's
    // documented answer there is MORE EXECUTORS, whose cores re-raise it
    assert(GraftSession.sizedShufflePartitions(Long.MaxValue / 8, 32) === 32 * 128)
    assert(GraftSession.sizedShufflePartitions(Long.MaxValue / 8, 4) === 4 * 128)
    // exabyte inputs must SATURATE at the cap, never overflow into the
    // per-core floor (the worst answer in exactly the huge-input regime)
    assert(GraftSession.sizedShufflePartitions(Long.MaxValue, 32) === 32 * 128)
    assert(GraftSession.sizedShufflePartitions(Long.MaxValue / 2, 32) === 32 * 128)
  }

  test("rounds UP: one byte past a target boundary adds a partition") {
    val target = GraftSession.TargetShuffleBytesPerPartition
    val amp = GraftSession.InflightExpansionAllowance
    // cores=2 so neither the per-core floor (2) nor the waves cap (256)
    // masks the division
    assert(GraftSession.sizedShufflePartitions(target * 200 / amp, 2) === 200)
    assert(GraftSession.sizedShufflePartitions(target * 200 / amp + 1, 2) === 201)
  }

  test("dirBytes sums regular files recursively; missing dir prices as 0") {
    val dir = java.nio.file.Files.createTempDirectory("sized-spec")
    try {
      java.nio.file.Files.write(dir.resolve("a.parquet"), new Array[Byte](1000))
      val sub = java.nio.file.Files.createDirectory(dir.resolve("events.parquet"))
      java.nio.file.Files.write(sub.resolve("part-0"), new Array[Byte](500))
      assert(GraftSession.dirBytes(dir.toString) === 1500L)
      assert(GraftSession.dirBytes(dir.resolve("nope").toString) === 0L)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.delete)
    }
  }
}
