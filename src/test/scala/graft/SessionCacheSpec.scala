package graft

/** The EntryData fixture caches are keyed per SESSION (a process-unique
  * UUID held weakly on the session object): a cached localCheckpoint
  * frame must never be served to a different session — its blocks
  * belong to the session that pinned them — while repeat lookups from
  * the owning session must hit the cache (the whole point: the bench's
  * maintenance rows time their maintenance step, not the shared seed
  * rebuild). */
class SessionCacheSpec extends SparkSpec {

  test("fixture caches: same session hits, a second session gets its " +
      "own entry with identical content") {
    val dir = sf()
    val s1 = spark
    val a = EntryData.g25PrevLabels(s1, dir)
    val b = EntryData.g25PrevLabels(s1, dir)
    assert(a eq b, "same (session, dataset) must return the cached frame")
    val s2 = s1.newSession()
    val c = EntryData.g25PrevLabels(s2, dir)
    assert(!(c eq a),
      "a different session must never be served another session's frame")
    assert(c.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      a.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap,
      "both sessions compute the same labels")
    val d = EntryData.g25PrevLabels(s2, dir)
    assert(d eq c, "the second session's entry caches too")
  }
}
