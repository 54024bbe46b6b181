package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Formats

/** Pins the round-11 memo-keying contract: every per-(JVM, dataset)
  * memo (dedup pairs/labels, q15 revenue0, similarity index caches)
  * and every scratch path keys through `Formats.canonicalDir` /
  * `Formats.sanitize`, so two spellings of one dataset dir can never
  * split a memo (double-materialize) or a scratch path from its
  * memo entry.
  */
class CanonicalDirSpec extends AnyFunSuite {

  test("dir spellings collapse to one canonical key and scratch path") {
    val base = "/root/testdata/sf0.001"
    val spellings = Seq(
      s"$base/", s"$base/.", "/root/testdata/../testdata/sf0.001")
    spellings.foreach { s =>
      assert(Formats.canonicalDir(s) === Formats.canonicalDir(base), s)
      assert(Formats.sanitize(s) === Formats.sanitize(base), s)
      assert(Formats.tmp("x", s) === Formats.tmp("x", base), s)
    }
  }

  test("canonicalization is total on nonexistent paths") {
    // File.getCanonicalPath resolves lexically for paths that don't
    // exist — the memo key must still be stable, never throw
    val a = Formats.canonicalDir("/no/such/dir/")
    val b = Formats.canonicalDir("/no/such/dir")
    assert(a === b)
  }

  test("distinct dirs get distinct suffixes even when character sanitization collides") {
    // /a/b and /a_b both sanitize to a_b by character replacement
    // alone — without the appended canonical-path hash they would
    // share one scratch path / Derby DB / catalog suffix while every
    // canonicalDir-keyed memo believed it owned them separately.
    val pairs = Seq(
      ("/root/testdata/sf-1", "/root/testdata/sf_1"),
      ("/a/b", "/a_b"),
      ("/a/b", "/a/b/c"))
    pairs.foreach { case (x, y) =>
      assert(Formats.sanitize(x) !== Formats.sanitize(y), s"$x vs $y")
      assert(Formats.tmp("x", x) !== Formats.tmp("x", y), s"$x vs $y")
    }
  }
}
