package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.{SparkSpec, Tables}
import graft.ext.Similarity

/** The version-pointer store's whole contract: snapshot isolation for
  * readers across appends/compactions (the property the rename-aside
  * swap cannot give), time travel, crash tolerance of a half-finished
  * publish, and vacuum that keeps exactly the retained versions.
  */
class VersionedFlatSpec extends SparkSpec {

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_vflat_$tag").toString

  private def frame(ids: Range): DataFrame = {
    import spark.implicits._
    ids.map(i => (i.toLong, s"v$i")).toDF("id", "s")
  }

  private def idSet(df: DataFrame): Set[Long] =
    df.select("id").collect().map(_.getLong(0)).toSet

  test("append publishes a new version; every older version stays " +
      "readable unchanged (time travel)") {
    val dir = tmp("tt")
    VersionedFlat.write(frame(0 until 10), dir)
    assert(VersionedFlat.currentVersion(dir) === 1)
    VersionedFlat.append(frame(10 until 25), dir)
    assert(VersionedFlat.currentVersion(dir) === 2)
    assert(idSet(VersionedFlat.read(spark, dir)) ===
      (0L until 25L).toSet)
    assert(idSet(VersionedFlat.readVersion(spark, dir, 1)) ===
      (0L until 10L).toSet,
      "version 1 must still serve exactly its own snapshot")
  }

  test("a reader's captured snapshot survives a concurrent compaction " +
      "(no rename-aside gap); compaction content-invariant, one file") {
    val dir = tmp("snap")
    VersionedFlat.write(frame(0 until 10), dir)
    VersionedFlat.append(frame(10 until 20), dir)
    // a long-running reader captures version 2 BEFORE the compaction
    val captured = VersionedFlat.read(spark, dir)
    VersionedFlat.compact(spark, dir)
    assert(VersionedFlat.currentVersion(dir) === 3)
    assert(idSet(captured) === (0L until 20L).toSet,
      "the pre-compaction snapshot must still collect after it")
    assert(idSet(VersionedFlat.read(spark, dir)) ===
      (0L until 20L).toSet, "compaction must not change content")
    val merged = new java.io.File(dir, "b-000003")
    assert(Option(merged.listFiles()).get
      .count(_.getName.startsWith("part-")) === 1,
      "the compacted version must hold one merged file")
  }

  test("a crashed publish (manifest written, CURRENT not swapped) is " +
      "invisible to readers and overwritten by the retry") {
    val dir = tmp("crash")
    VersionedFlat.write(frame(0 until 5), dir)
    // simulate the crash: batch + manifest for v2 exist, pointer not
    // moved — exactly the state after a writer died mid-append
    frame(5 until 9).write.mode("overwrite")
      .parquet(new java.io.File(dir, "b-000002").getPath)
    java.nio.file.Files.write(
      new java.io.File(dir, "manifest-000002").toPath,
      "b-000001\nb-000002\n".getBytes("UTF-8"))
    assert(VersionedFlat.currentVersion(dir) === 1)
    assert(idSet(VersionedFlat.read(spark, dir)) === (0L until 5L).toSet,
      "readers must still see version 1")
    // the retry admits a DIFFERENT batch under the same version number
    VersionedFlat.append(frame(5 until 8), dir)
    assert(VersionedFlat.currentVersion(dir) === 2)
    assert(idSet(VersionedFlat.read(spark, dir)) === (0L until 8L).toSet,
      "the retry must fully replace the crashed attempt's orphans")
  }

  test("vacuum keeps the retained versions' batches, drops the rest, " +
      "and time travel to a vacuumed version fails loudly") {
    val dir = tmp("vac")
    VersionedFlat.write(frame(0 until 4), dir)
    VersionedFlat.append(frame(4 until 8), dir)
    VersionedFlat.compact(spark, dir) // v3 = one merged batch
    VersionedFlat.vacuum(dir, retain = 1)
    assert(idSet(VersionedFlat.read(spark, dir)) === (0L until 8L).toSet,
      "the current version must be untouched by vacuum")
    val dirs = Option(new java.io.File(dir).listFiles())
      .get.filter(_.getName.startsWith("b-")).map(_.getName).toSet
    assert(dirs === Set("b-000003"),
      "only the retained version's batch dirs may survive")
    intercept[IllegalArgumentException] {
      VersionedFlat.readVersion(spark, dir, 1).collect()
    }
  }

  test("versioned IVF tombstones: purge publishes the excluded frame, " +
      "time travel still holds the bytes, vacuum erases them; " +
      "re-pending tombstones over purged rows are a no-op") {
    val e = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val idx = tmp("ivfverdel")
    IndexStore.writeIvfIndexVersioned(e,
      Similarity.firstIdCentroids(e, 16), idx)
    val dead = e.filter(col("vec_id") % 7 === 3)
      .select(col("vec_id").as("id"))
    IndexStore.deleteFromIvfIndexVersioned(dead, idx)
    def liveIds(): Set[Long] =
      idSet(IndexStore.readIvfIndexVersionedLive(spark, idx)._1)
    val masked = liveIds()
    assert(!masked.exists(_ % 7 == 3), "tombstones must mask serving")
    IndexStore.purgeIvfIndexVersioned(spark, idx)
    assert(liveIds() === masked, "purge must be serve-invariant")
    assert(!new java.io.File(s"$idx/dead.parquet").exists())
    // time travel is HONEST: version 1 still holds the dead bytes
    assert(idSet(IndexStore.readIvfIndexVersioned(spark, idx,
      asOf = 1)._1).exists(_ % 7 == 3))
    VersionedFlat.vacuum(s"$idx/enc", retain = 1)
    intercept[IllegalArgumentException] {
      IndexStore.readIvfIndexVersioned(spark, idx, asOf = 1)._1.collect()
    }
    // a crash between publish and tombstone-clear leaves pending
    // tombstones over already-purged rows — must be a no-op
    IndexStore.deleteFromIvfIndexVersioned(dead, idx)
    assert(liveIds() === masked)
  }

  test("law: any append/compact/vacuum sequence serves the model's " +
      "content, and every retained version time-travels exactly") {
    sealed trait Op
    final case class Append(n: Int) extends Op
    case object Compact extends Op
    final case class Vacuum(retain: Int) extends Op
    val opGen: Gen[Op] = Gen.frequency(
      (4, Gen.choose(1, 5).map(Append(_))),
      (2, Gen.const(Compact)),
      (1, Gen.choose(1, 3).map(Vacuum(_))))
    val opsGen = Gen.choose(1, 6).flatMap(Gen.listOfN(_, opGen))
    val p = Prop.forAll(opsGen) { ops =>
      val dir = tmp("law")
      var next = 0L
      def mk(n: Int): Seq[Long] = {
        val ids = next until (next + n); next += n; ids
      }
      import spark.implicits._
      def fr(ids: Seq[Long]): DataFrame =
        ids.map(i => (i, s"v$i")).toDF("id", "s")
      VersionedFlat.write(fr(mk(3)), dir)
      var versions = Vector((0L until 3L).toSet)
      var keepMin = 1
      ops.foreach {
        case Append(n) =>
          val ids = mk(n)
          VersionedFlat.append(fr(ids), dir)
          versions :+= (versions.last ++ ids)
        case Compact =>
          VersionedFlat.compact(spark, dir)
          versions :+= versions.last
        case Vacuum(r) =>
          VersionedFlat.vacuum(dir, r)
          keepMin = math.max(keepMin, versions.size - math.max(1, r) + 1)
      }
      idSet(VersionedFlat.read(spark, dir)) == versions.last &&
        (keepMin to versions.size).forall(v =>
          idSet(VersionedFlat.readVersion(spark, dir, v)) ==
            versions(v - 1))
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), p)
    assert(res.passed, res.status.toString)
  }
}
