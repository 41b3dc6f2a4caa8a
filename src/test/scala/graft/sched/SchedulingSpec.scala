package graft.sched

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import java.time.{Clock, Duration, Instant, ZoneOffset}
import scala.util.Random

/** Property tests mirroring the reference's scheduling suite
  * (GompertzFunctionTests.scala:12-52, WorkQueuePrioritizerTests.scala:14-62)
  * plus resource-leasing semantics. Uses raw ScalaCheck Gen sampling (the
  * scalatest-scalacheck bridge artifact is not in the offline cache).
  */
class SchedulingSpec extends AnyFunSuite with Matchers {

  private def forAll[A](gen: Gen[A], trials: Int = 100)(f: A => Unit): Unit =
    (0 until trials).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }

  private val snapshotGen: Gen[QueueSnapshot] = for {
    name <- Gen.identifier.map(_.take(12))
    size <- Gen.chooseNum(1, 1000)
    ready <- Gen.chooseNum(1, size)
    rate <- Gen.oneOf(Gen.const(0.0), Gen.chooseNum(0.01, 50.0))
    idle <- Gen.chooseNum(0L, 100000L)
  } yield QueueSnapshot(name, size, ready, rate, Instant.ofEpochSecond(idle))

  // --- Sigmoid (reference property set) ---

  test("gompertz backoff is in (0, 1] for all valid inputs") {
    forAll(Gen.zip(Gen.chooseNum(0, 100000), Gen.chooseNum(0.001, 10.0), Gen.chooseNum(0.001, 100.0))) {
      case (secs, scale, delay) =>
        val p = Sigmoid.backoffFactor(secs, scale, delay)
        p should be > 0.0
        p should be <= 1.0
    }
  }

  test("gompertz backoff is monotonically non-decreasing in elapsed time") {
    forAll(Gen.zip(Gen.chooseNum(0, 10000), Gen.chooseNum(1, 10000))) { case (t1, dt) =>
      Sigmoid.backoffFactor(t1 + dt, 0.2, 5.0) should be >=
        Sigmoid.backoffFactor(t1, 0.2, 5.0)
    }
  }

  test("gompertz rejects invalid arguments") {
    an[IllegalArgumentException] should be thrownBy Sigmoid.backoffFactor(-1, 0.2, 5.0)
    an[IllegalArgumentException] should be thrownBy Sigmoid.gompertz(0.0, 1.0, 1.0, 1.0)
    an[IllegalArgumentException] should be thrownBy Sigmoid.gompertz(1.0, -1.0, 1.0, 1.0)
    an[IllegalArgumentException] should be thrownBy Sigmoid.gompertz(1.0, 1.0, 0.0, 1.0)
  }

  // --- Prioritizer (reference property set) ---

  test("prioritizer preserves the input multiset") {
    forAll(Gen.listOfN(20, snapshotGen)) { qs =>
      val out = WorkQueuePrioritizer.default(new Random(1)).prioritize(qs).toList
      out should contain theSameElementsAs qs
    }
  }

  test("prioritizer respects the first ordering globally") {
    forAll(Gen.listOfN(25, snapshotGen)) { qs =>
      val out = WorkQueuePrioritizer.default(new Random(7)).prioritize(qs).toVector
      out.sliding(2).foreach {
        case Vector(a, b) => ExpectedCompletionOrdering.compare(a, b) should be <= 0
        case _ =>
      }
    }
  }

  test("ties on the first ordering are broken by the second (idle minute)") {
    val base = Instant.parse("2026-01-01T00:00:00Z")
    // same completion estimate (ready/rate identical), different idle ages
    val qs = Seq(
      QueueSnapshot("young", 10, 10, 1.0, base.plusSeconds(3600)),
      QueueSnapshot("old", 10, 10, 1.0, base),
      QueueSnapshot("mid", 10, 10, 1.0, base.plusSeconds(1800)))
    val out = WorkQueuePrioritizer.default(new Random(3)).prioritize(qs).toList
    out.map(_.name) shouldBe List("old", "mid", "young")
  }

  test("zero-rate queues (nothing draining them) sort before queues with throughput") {
    // Reference semantics (PriorityOrdering.scala:17-25): estimated completion
    // DESC — the queue furthest from completion is served first, so a
    // zero-rate queue (estimate = ∞) outranks one that is already draining.
    val base = Instant.EPOCH
    val qs = Seq(
      QueueSnapshot("fast", 100, 100, 50.0, base),
      QueueSnapshot("stalled", 5, 5, 0.0, base))
    val out = WorkQueuePrioritizer.default(new Random(0)).prioritize(qs).toList
    out.head.name shouldBe "stalled"
  }

  // --- Resources ---

  test("concurrency resource caps holders at the limit with rollback-free release") {
    val pool = new ResourcePool(Seq(ConcurrencySpec("db", 2)))
    val l1 = pool.acquireAll(Seq("db")).toOption.get
    val l2 = pool.acquireAll(Seq("db")).toOption.get
    pool.acquireAll(Seq("db")).isLeft shouldBe true
    l1.release()
    pool.acquireAll(Seq("db")).isRight shouldBe true
    l2.release()
  }

  test("throttled resource: first token immediate, next only after release + rate") {
    val t0 = Instant.parse("2026-01-01T00:00:00Z")
    var now = t0
    val clock = new Clock {
      override def getZone = ZoneOffset.UTC
      override def withZone(z: java.time.ZoneId) = this
      override def instant(): Instant = now
    }
    val pool = new ResourcePool(Seq(ThrottledSpec("api", Duration.ofSeconds(30))), clock)
    val lease = pool.acquireAll(Seq("api")).toOption.get // immediate
    pool.acquireAll(Seq("api")).isLeft shouldBe true     // held
    lease.release()                                      // period starts NOW
    pool.acquireAll(Seq("api")).isLeft shouldBe true     // inside period
    now = t0.plusSeconds(31)
    pool.acquireAll(Seq("api")).isRight shouldBe true    // period elapsed
  }

  test("multi-resource acquisition rolls back on partial failure") {
    val pool = new ResourcePool(Seq(ConcurrencySpec("a", 1), ConcurrencySpec("b", 1)))
    val held = pool.acquireAll(Seq("b")).toOption.get
    // a acquired first (name order), then b fails → a must be rolled back
    pool.acquireAll(Seq("a", "b")).isLeft shouldBe true
    pool.acquireAll(Seq("a")).isRight shouldBe true
    held.release()
  }

  // --- Contention filter ---

  test("contention filter blocks inside min delay, admits probabilistically after") {
    val pool = new ResourcePool(Seq(ConcurrencySpec("x", 1)))
    val hold = pool.acquireAll(Seq("x")).toOption.get
    pool.acquireAll(Seq("x")) // records contention now
    val q = QueueSnapshot("q", 1, 1, 1.0, Instant.EPOCH, resources = Seq("x"))
    val f1 = new ContentionFilter(pool, Duration.ofSeconds(60), 0.2, new Random(1))
    f1.allows(q) shouldBe false // inside min delay
    // per-pass consistency: same pass, same answer
    f1.allows(q) shouldBe false
    hold.release()
    pool.clearContention("x")
    new ContentionFilter(pool, Duration.ofSeconds(60), 0.2).allows(q) shouldBe true
  }
}
