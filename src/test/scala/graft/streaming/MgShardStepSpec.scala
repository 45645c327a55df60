package graft.streaming

import org.apache.spark.api.java.Optional
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingOps.{MgState, TokShard}

/** Unit tests of the streaming Misra-Gries shard step against
  * TestGroupState: cross-batch accumulation, the capacity bound under
  * overflow, and replay determinism (iterator order independence).
  */
class MgShardStepSpec extends AnyFunSuite {

  private def fresh = TestGroupState.create[MgState](
    Optional.empty[MgState](), GroupStateTimeout.NoTimeout,
    1000L, Optional.empty[Long](), hasTimedOut = false)

  private def toks(ws: String*) = ws.map(TokShard(0L, _)).iterator

  test("exact regime: counts accumulate across batches") {
    val st = fresh
    StreamingOps.mgShardStep(0L, toks("a", "b", "a"), st, capacity = 8)
    val out = StreamingOps.mgShardStep(0L, toks("a", "c"), st, capacity = 8)
      .toSeq
    assert(out.map(h => h.token -> h.estCount) ==
      Seq("a" -> 3L, "b" -> 1L, "c" -> 1L),
      "capacity above vocab: exact counts, (est desc, token) order")
    assert(st.get == MgState(Map("a" -> 3L, "b" -> 1L, "c" -> 1L)))
  }

  test("overflow: summary stays within capacity, never overcounts, keeps the majority") {
    val st = fresh
    // a=6, then 4 distinct singletons through capacity 2
    val out = StreamingOps.mgShardStep(0L,
      toks("a", "a", "a", "a", "a", "a", "u1", "u2", "u3", "u4"),
      st, capacity = 2).toSeq
    assert(out.size <= 2)
    val est = out.map(h => h.token -> h.estCount).toMap
    assert(est.contains("a"), "the majority token must survive")
    assert(est("a") <= 6L, "never overcount")
    // N=10, k=2 -> bound floor(10/3)=3
    assert(6L - est("a") <= 3L, "undercount bounded by N/(k+1)")
  }

  test("eviction emits a zero-count tombstone; re-admission tracks again") {
    val st = fresh
    // batch 1: b and c tracked (capacity 2)
    StreamingOps.mgShardStep(0L, toks("b", "b", "c"), st, capacity = 2)
    // batch 2: a floods in — c (count 1) is evicted by the pivot rule
    val out2 = StreamingOps.mgShardStep(0L, toks("a", "a", "a", "a"), st,
      capacity = 2).toSeq
    val est2 = out2.map(h => h.token -> h.estCount).toMap
    assert(est2.get("c").contains(0L),
      s"the evicted token must emit an estCount=0 tombstone, got $out2")
    assert(!st.get.entries.contains("c"),
      "the tombstoned token is no longer in state")
    assert(out2.filter(_.estCount > 0L).size <= 2,
      "tombstones ride alongside the <=capacity live summary")
    // batch 3: c returns and is tracked again with a live estimate
    val out3 = StreamingOps.mgShardStep(0L, toks("c", "c", "c", "c", "c"),
      st, capacity = 2).toSeq
    assert(out3.exists(h => h.token == "c" && h.estCount > 0L),
      s"a re-admitted token emits live estimates again, got $out3")
  }

  test("replay determinism: batch fold is iterator-order independent") {
    val a = fresh
    StreamingOps.mgShardStep(0L, toks("x", "y", "x", "z", "y", "x"), a,
      capacity = 2)
    val b = fresh
    StreamingOps.mgShardStep(0L, toks("z", "x", "y", "x", "y", "x"), b,
      capacity = 2)
    assert(a.get == b.get,
      "pre-counted merge must not depend on micro-batch iterator order")
  }
}
