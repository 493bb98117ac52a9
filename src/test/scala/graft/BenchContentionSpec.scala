package graft

import org.scalatest.funsuite.AnyFunSuite

/** Unit-pins for the bench's contention arithmetic — the numbers that
  * decide whether a published min is trusted or retried. Pure math, no
  * Spark: feed synthetic /proc/stat and process-CPU deltas and assert
  * the co-tenant share comes out right. */
class BenchContentionSpec extends AnyFunSuite {

  // a 32-cpu host over a 1-second window: 3200 jiffies total (USER_HZ=100)
  private val T = 3200L

  test("quiet host, bench saturating all cores: other share ~0") {
    // busy = 3200 (all us); our process burned 32 cpu-seconds = 32e9 ns
    val f = Bench.otherCpuFrac((0L, 0L), (T, T), 0L, 32_000_000_000L)
    assert(f == 0.0, s"self-load must not read as contention, got $f")
  }

  test("co-tenant burning half the machine while we idle") {
    // busy = 1600 jiffies, none of them ours
    val f = Bench.otherCpuFrac((0L, 0L), (T, 1600L), 0L, 0L)
    assert(math.abs(f - 0.5) < 1e-9, s"expected 0.5, got $f")
  }

  test("mixed: we burn a quarter, co-tenants burn a quarter") {
    // busy = 1600; ours = 8 cpu-seconds = 800 jiffies-equivalent
    val f = Bench.otherCpuFrac((0L, 0L), (T, 1600L), 0L, 8_000_000_000L)
    assert(math.abs(f - 0.25) < 1e-9, s"expected 0.25, got $f")
  }

  test("clock skew floors at zero rather than going negative") {
    // our measured cpu exceeds the host busy total (sampling windows are
    // not atomic) — must clamp, not report negative contention
    val f = Bench.otherCpuFrac((0L, 0L), (T, 100L), 0L, 32_000_000_000L)
    assert(f == 0.0)
  }

  test("unreadable inputs report -1 (unknown), never a verdict") {
    assert(Bench.otherCpuFrac((-1L, -1L), (T, T), 0L, 1L) == -1.0)
    assert(Bench.otherCpuFrac((0L, 0L), (T, T), -1L, -1L) == -1.0)
    assert(Bench.otherCpuFrac((T, T), (T, T), 0L, 1L) == -1.0) // zero window
  }
}
