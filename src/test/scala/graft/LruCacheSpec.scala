package graft

import org.scalatest.funsuite.AnyFunSuite

class LruCacheSpec extends AnyFunSuite {

  test("evicts the least-recently-used entry at capacity, not everything") {
    val c = new LruCache[Int, String](3)
    c.put(1, "a"); c.put(2, "b"); c.put(3, "c")
    assert(c.get(1) == "a") // touch 1 -> 2 is now eldest
    c.put(4, "d")
    assert(c.size == 3)
    assert(c.get(2) == null, "LRU victim must be the untouched entry")
    assert(c.get(1) == "a" && c.get(3) == "c" && c.get(4) == "d")
  }

  test("get on a miss returns null and does not grow the map") {
    val c = new LruCache[String, String](2)
    assert(c.get("nope") == null && c.size == 0)
  }
}
