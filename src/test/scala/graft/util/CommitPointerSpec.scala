package graft.util

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class CommitPointerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("liveDir is the flat dir until a first commit, then the committed version") {
    val tmp = java.nio.file.Files.createTempDirectory("cp").toString
    try {
      assert(CommitPointer.committedVersion(spark, tmp).isEmpty)
      assert(CommitPointer.liveDir(spark, tmp) == tmp)
      new java.io.File(CommitPointer.versionDir(tmp, 1)).mkdirs()
      CommitPointer.commit(spark, tmp, 1)
      assert(CommitPointer.committedVersion(spark, tmp).contains(1))
      assert(CommitPointer.liveDir(spark, tmp) == s"$tmp/_versions/v1")
      // re-commit OVERWRITES the pointer atomically (rename over existing)
      new java.io.File(CommitPointer.versionDir(tmp, 2)).mkdirs()
      CommitPointer.commit(spark, tmp, 2)
      assert(CommitPointer.committedVersion(spark, tmp).contains(2))
      // immutable markers: the new one exists, the PREVIOUS one is retained
      // (stale-listing fallback), anything older is lazily dropped
      assert(new java.io.File(s"$tmp/_versions/_commit_v2").exists())
      assert(new java.io.File(s"$tmp/_versions/_commit_v1").exists())
      new java.io.File(CommitPointer.versionDir(tmp, 3)).mkdirs()
      CommitPointer.commit(spark, tmp, 3)
      assert(new java.io.File(s"$tmp/_versions/_commit_v3").exists())
      assert(new java.io.File(s"$tmp/_versions/_commit_v2").exists())
      assert(!new java.io.File(s"$tmp/_versions/_commit_v1").exists())
    } finally graft.util.Fs.deleteTree(java.nio.file.Paths.get(tmp))
  }

  test("stale listing that misses the newest marker resolves the PREVIOUS " +
      "committed version — never the flat dir (object-store chaos case)") {
    val tmp = java.nio.file.Files.createTempDirectory("cp5").toString
    try {
      new java.io.File(CommitPointer.versionDir(tmp, 1)).mkdirs()
      CommitPointer.commit(spark, tmp, 1)
      new java.io.File(CommitPointer.versionDir(tmp, 2)).mkdirs()
      CommitPointer.commit(spark, tmp, 2)
      // simulate a lister whose view predates commit(2) completing: the v2
      // marker is absent from its listing. Deleting the marker file IS that
      // view — resolution must land on v1 (whose dir commit() also retained),
      // not fall through to the flat legacy dir.
      assert(new java.io.File(s"$tmp/_versions/_commit_v1").exists(),
        "commit must retain the previous marker for exactly this fallback")
      java.nio.file.Files.delete(
        java.nio.file.Paths.get(s"$tmp/_versions/_commit_v2"))
      assert(CommitPointer.committedVersion(spark, tmp).contains(1))
      assert(CommitPointer.liveDir(spark, tmp) == CommitPointer.versionDir(tmp, 1))
      assert(new java.io.File(CommitPointer.versionDir(tmp, 1)).exists(),
        "the previous generation dir must still be readable")
    } finally graft.util.Fs.deleteTree(java.nio.file.Paths.get(tmp))
  }

  test("dropStaleVersions keeps exactly the committed generation") {
    val tmp = java.nio.file.Files.createTempDirectory("cp2").toString
    try {
      Seq(1, 2, 3).foreach(v => new java.io.File(CommitPointer.versionDir(tmp, v)).mkdirs())
      CommitPointer.commit(spark, tmp, 2)
      CommitPointer.dropStaleVersions(spark, tmp)
      val left = new java.io.File(s"$tmp/_versions").listFiles().map(_.getName)
        .filterNot(_.startsWith(".")).toSet // drop local-FS .crc shadows
      assert(left == Set("v2", "_commit_v2"), s"got $left")
      // with no commit at all, EVERY version dir is uncommitted staging (the
      // flat dir is live) — a crashed first compaction's leftovers get dropped
      val tmp2 = java.nio.file.Files.createTempDirectory("cp3").toString
      try {
        new java.io.File(CommitPointer.versionDir(tmp2, 1)).mkdirs()
        CommitPointer.dropStaleVersions(spark, tmp2)
        assert(!new java.io.File(CommitPointer.versionDir(tmp2, 1)).exists())
      } finally graft.util.Fs.deleteTree(java.nio.file.Paths.get(tmp2))
    } finally graft.util.Fs.deleteTree(java.nio.file.Paths.get(tmp))
  }

  test("a corrupt pointer is rejected loudly, not silently treated as flat") {
    val tmp = java.nio.file.Files.createTempDirectory("cp4").toString
    try {
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$tmp/_commit"), "banana")
      val e = intercept[IllegalArgumentException] {
        CommitPointer.committedVersion(spark, tmp)
      }
      assert(e.getMessage.contains("corrupt commit pointer"))
    } finally graft.util.Fs.deleteTree(java.nio.file.Paths.get(tmp))
  }
}
