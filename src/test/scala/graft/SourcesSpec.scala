package graft

import java.nio.file.Files
import graft.ddf.{DDF, DDFContext}

/** reference: bases/data_reader.py / data_saver.py — csv/json/parquet
  * round-trips through the cc.read.* / ddf.save.* surface */
class SourcesSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val cc = DDFContext(spark)
  private def tmp(name: String) =
    Files.createTempDirectory(s"graft_$name").toString + "/out"

  private def sample = DDF(Seq((1, "a", 1.5), (2, "b", 2.5), (3, "c", -1.0))
    .toDF("id", "s", "v"))

  test("parquet round-trip") {
    val p = tmp("parquet")
    sample.save.parquet(p)
    val back = cc.read.parquet(p)
    assert(back.toDF.orderBy($"id").collect().toSeq ==
      sample.toDF.orderBy($"id").collect().toSeq)
  }

  test("partitioned parquet write prunes directories on read") {
    val p = tmp("part_parquet")
    val docs = DDF(spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet"))
    docs.save.parquet(p, partitionBy = Seq("lang"))
    // hive-style layout on disk
    val dirs = new java.io.File(p).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs.exists(_.startsWith("lang=")), s"no lang= dirs in $dirs")
    // a lang filter becomes a PartitionFilter — pruned before IO,
    // never a post-scan Filter over all rows
    val back = cc.read.parquet(p).filter("lang == 'en'")
    val plan = back.toDF.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang") ||
      plan.contains("PartitionFilters: [(lang"),
      s"lang filter not pushed to partition pruning:\n$plan")
    // content round-trips (modulo column order: partition col moves)
    val full = cc.read.parquet(p)
    assert(full.countRows() == docs.countRows())
    assert(back.countRows() ==
      docs.filter("lang == 'en'").countRows())
  }

  test("clustered write: files cover disjoint key ranges, lossless") {
    val p = tmp("clustered")
    val li = DDF(spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet"))
    li.save.clustered(p, Seq("l_orderkey"), nFiles = 4)
    val files = new java.io.File(p).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.toString)
    assert(files.length >= 2, s"expected multiple files, got ${files.length}")
    // per-file key intervals must not interleave: that's what makes
    // parquet min/max stats prune whole files for range predicates
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(org.apache.spark.sql.functions.min($"l_orderkey"),
          org.apache.spark.sql.functions.max($"l_orderkey")).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) =>
        assert(hi <= lo2, s"file ranges interleave: $ranges")
      case _ =>
    }
    assert(spark.read.parquet(p).count() == li.countRows())
  }

  test("zorder write: bounds BOTH columns per file, lossless") {
    import org.apache.spark.sql.functions.{col, min, max}
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val n = li.count()
    def spans(path: String, c: String): Array[Double] = {
      val g = li.agg(min(col(c)), max(col(c))).head()
      val width = (g.getLong(1) - g.getLong(0)).toDouble
      new java.io.File(path).listFiles()
        .filter(_.getName.endsWith(".parquet")).map { f =>
          val r = spark.read.parquet(f.toString)
            .agg(min(col(c)), max(col(c))).head()
          (r.getLong(1) - r.getLong(0)) / width
        }
    }
    val zp = tmp("zorder")
    // through the fluent Save delegate (delegates to ZOrder.saveZOrdered)
    DDF(li).save.zordered(zp, "l_partkey", "l_suppkey", nFiles = 8)
    assert(spark.read.parquet(zp).count() == n) // lossless
    // lexicographic baseline: leading column tight, second unbounded
    val lp = tmp("lexorder")
    DDF(li).save.clustered(lp, Seq("l_partkey", "l_suppkey"), nFiles = 8)
    val (zPart, zSupp) = (spans(zp, "l_partkey"), spans(zp, "l_suppkey"))
    val lexSupp = spans(lp, "l_suppkey")
    // the z-order layout bounds BOTH dimensions for nearly every
    // file, so parquet min/max stats prune files for predicates on
    // EITHER column. "Nearly", twice over: (a) a contiguous z-range
    // that crosses a high interleaved-bit flip (a curve seam)
    // legitimately spans one dimension — at 8 files that is ~1 seam
    // file per column; (b) repartitionByRange draws its boundaries
    // from a SAMPLING job (Save.clustered documents the same), so
    // per-file spans jitter slightly run to run (~0.5 typical, up to
    // ~0.7 at an unlucky boundary). The gate pins the stable shape —
    // bounded average, at most one full-span seam file — not exact
    // spans. The lexicographic layout instead leaves the second
    // column unbounded in essentially every file.
    def ok(s: Array[Double]) =
      s.count(_ <= 0.8) >= s.length - 1 && s.sum / s.length <= 0.7
    assert(ok(zPart), s"zorder l_partkey spans: ${zPart.toSeq}")
    assert(ok(zSupp), s"zorder l_suppkey spans: ${zSupp.toSeq}")
    assert(lexSupp.count(_ > 0.9) >= 6,
      s"lexicographic baseline should leave l_suppkey unbounded: " +
        s"${lexSupp.toSeq}")
    assert(zSupp.sum / zSupp.length < lexSupp.sum / lexSupp.length / 1.4)
  }

  test("zorder interleave: known bit patterns") {
    import org.apache.spark.sql.functions.lit
    // identity scaling (lo=0, hi=2^16-1): x=0b1010, y=0b0110 ->
    // z interleaves to 0b01101100 = 108; plus a clamped negative
    val got = spark.range(1)
      .select(
        graft.operators.ZOrder.zValue2(lit(10L), 0, 65535,
          lit(6L), 0, 65535).as("z1"),
        graft.operators.ZOrder.zValue2(lit(-5L), 0, 65535,
          lit(0L), 0, 65535).as("z2"))
      .head()
    assert(got.getLong(0) == 108L)
    assert(got.getLong(1) == 0L) // clamps below lo
  }

  test("orc round-trip with partition pruning") {
    val p = tmp("orc")
    sample.save.orc(p)
    val back = cc.read.orc(p)
    assert(back.toDF.orderBy($"id").collect().toSeq ==
      sample.toDF.orderBy($"id").collect().toSeq)
    // partitioned layout prunes like parquet
    val p2 = tmp("orc_part")
    sample.save.orc(p2, partitionBy = Seq("s"))
    val pruned = cc.read.orc(p2).filter("s == 'a'")
    val plan = pruned.toDF.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(s") ||
      plan.contains("PartitionFilters: [(s"),
      s"s filter not pushed to partition pruning:\n$plan")
    assert(pruned.countRows() == 1)
  }

  test("text round-trip: line rows, wholetext, partitioned layout") {
    val p = tmp("text")
    val lines = DDF(Seq("alpha beta", "gamma", "delta eps").toDF("value"))
    lines.save.text(p)
    val back = cc.read.text(p)
    assert(back.toDF.as[String].collect().sorted ===
      Array("alpha beta", "delta eps", "gamma"))
    // wholetext = one row per FILE: rejoining its lines recovers a
    // whole written file (order within a file is preserved)
    val whole = cc.read.text(p, wholetext = true)
      .toDF.as[String].collect()
    assert(whole.flatMap(_.split("\n")).sorted ===
      Array("alpha beta", "delta eps", "gamma"))
    // text sink requires exactly one column; partitionBy splits it out
    val p2 = tmp("text_part")
    DDF(Seq(("a", "l1"), ("a", "l2"), ("b", "l3")).toDF("k", "value"))
      .save.text(p2, partitionBy = Seq("k"))
    val dirs = new java.io.File(p2).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs == Set("k=a", "k=b"))
    // the partition column comes back as a read-side column
    val back2 = cc.read.text(p2).toDF
    assert(back2.columns.toSet == Set("value", "k"))
    assert(back2.select("value").as[String].collect().sorted ===
      Array("l1", "l2", "l3"))
  }

  test("csv round-trip with header and schema") {
    val p = tmp("csv")
    sample.save.csv(p)
    val back = cc.read.csv(p, header = true,
      schema = Some(sample.schema))
    assert(back.toDF.orderBy($"id").collect().toSeq ==
      sample.toDF.orderBy($"id").collect().toSeq)
    // inferred-schema path
    val inferred = cc.read.csv(p, header = true)
    assert(inferred.countRows() == 3)
  }

  test("json round-trip") {
    val p = tmp("json")
    sample.save.json(p)
    val back = cc.read.json(p, schema = Some(sample.schema))
    assert(back.toDF.orderBy($"id").collect().toSeq ==
      sample.toDF.orderBy($"id").collect().toSeq)
  }

  test("parallelize splits into requested fragments") {
    val rows = (1 to 10).map(i => org.apache.spark.sql.Row(i))
    val d = cc.parallelize(rows,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.IntegerType))), nfrag = 4)
    assert(d.numOfPartitions() == 4 && d.countRows() == 10)
  }

  test("shard writer: exact file count, lossless, rerun-identical") {
    val docs = DDF(spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet"))
    def partFiles(p: String) = new java.io.File(p).listFiles()
      .filter(f => f.getName.startsWith("part-") &&
        f.getName.endsWith(".parquet"))
      .sortBy(_.getName).toSeq
    def shardContents(p: String): Seq[Seq[Long]] = partFiles(p).map(f =>
      spark.read.parquet(f.getPath).select($"doc_id").as[Long]
        .collect().toSeq)
    val (p1, p2) = (tmp("shards1"), tmp("shards2"))
    docs.save.shards(p1, "doc_id", nShards = 4, seed = 7L)
    docs.save.shards(p2, "doc_id", nShards = 4, seed = 7L)
    val (s1, s2) = (shardContents(p1), shardContents(p2))
    assert(s1.size == 4, s"expected 4 shards, got ${s1.size}")
    // lossless: shards partition the corpus exactly
    val n = docs.countRows()
    assert(s1.map(_.size).sum == n && s1.flatten.toSet.size == n.toInt)
    // deterministic: rerun gives identical membership AND in-shard
    // order (membership/order are pure functions of (seed, id))
    assert(s1 == s2)
    // mixed: no shard is a contiguous doc_id range (hash-shuffled)
    assert(s1.forall(s => s != s.sorted))
    // a different seed produces a different permutation
    val p3 = tmp("shards3")
    docs.save.shards(p3, "doc_id", nShards = 4, seed = 8L)
    assert(shardContents(p3) != s1)
  }

  test("pickle alias round-trips through parquet") {
    val p = tmp("pickle")
    sample.save.pickle(p)
    val back = cc.read.pickle(p)
    assert(back.toDF.orderBy($"id").collect().toSeq ==
      sample.toDF.orderBy($"id").collect().toSeq)
  }

  // fixture written from the same public ESRI/dBase specs the reader
  // implements — a real .shp/.dbf pair, byte-for-byte
  private def writeShpFixture(dir: String): (String, String) = {
    import java.nio.{ByteBuffer, ByteOrder}
    val polys = Seq(
      Array((0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)),
      Array((10.0, 10.0), (12.0, 10.0), (12.0, 12.0), (10.0, 12.0),
        (10.0, 10.0)))
    val contents = polys.map(v => 4 + 32 + 8 + 4 + 16 * v.length)
    val total = 100 + contents.map(_ + 8).sum
    val bb = ByteBuffer.allocate(total)
    bb.order(ByteOrder.BIG_ENDIAN)
    bb.putInt(0, 9994)
    bb.putInt(24, total / 2)
    bb.order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(28, 1000) // version
    bb.putInt(32, 5)    // polygon
    var off = 100
    polys.zip(contents).zipWithIndex.foreach { case ((verts, clen), i) =>
      bb.order(ByteOrder.BIG_ENDIAN)
      bb.putInt(off, i + 1)
      bb.putInt(off + 4, clen / 2)
      bb.order(ByteOrder.LITTLE_ENDIAN)
      val s = off + 8
      bb.putInt(s, 5)
      bb.putDouble(s + 4, verts.map(_._1).min)  // bbox
      bb.putDouble(s + 12, verts.map(_._2).min)
      bb.putDouble(s + 20, verts.map(_._1).max)
      bb.putDouble(s + 28, verts.map(_._2).max)
      bb.putInt(s + 36, 1)            // numParts
      bb.putInt(s + 40, verts.length) // numPoints
      bb.putInt(s + 44, 0)            // parts[0]
      verts.zipWithIndex.foreach { case ((x, y), j) =>
        bb.putDouble(s + 48 + 16 * j, x)
        bb.putDouble(s + 56 + 16 * j, y)
      }
      off = s + clen
    }
    val shp = s"$dir/test.shp"
    Files.write(java.nio.file.Paths.get(shp), bb.array())

    // .dbf: NAME (C,8), VAL (N,6)
    val nRec = 2; val recSize = 1 + 8 + 6
    val headerSize = 32 + 32 * 2 + 1
    val db = ByteBuffer.allocate(headerSize + nRec * recSize + 1)
    db.order(ByteOrder.LITTLE_ENDIAN)
    db.put(0, 0x03.toByte)
    db.putInt(4, nRec)
    db.putShort(8, headerSize.toShort)
    db.putShort(10, recSize.toShort)
    def field(o: Int, name: String, t: Char, len: Int): Unit = {
      name.getBytes("ASCII").zipWithIndex.foreach { case (b, i) =>
        db.put(o + i, b) }
      db.put(o + 11, t.toByte)
      db.put(o + 16, len.toByte)
    }
    field(32, "NAME", 'C', 8)
    field(64, "VAL", 'N', 6)
    db.put(96, 0x0d.toByte)
    def rec(o: Int, name: String, v: String): Unit = {
      db.put(o, ' '.toByte)
      (name.padTo(8, ' ') + v.reverse.padTo(6, ' ').reverse).getBytes("ASCII")
        .zipWithIndex.foreach { case (b, i) => db.put(o + 1 + i, b) }
    }
    rec(headerSize, "unit", "3.5")
    rec(headerSize + recSize, "far", "42")
    val dbf = s"$dir/test.dbf"
    Files.write(java.nio.file.Paths.get(dbf), db.array())
    (shp, dbf)
  }

  test("shapefile: parses polygons + dbf attributes, feeds geoWithin") {
    val dir = Files.createTempDirectory("graft_shp").toString
    val (shp, dbf) = writeShpFixture(dir)
    val polys = cc.read.shapefile(shp, Some(dbf)).toDF
    assert(polys.count() == 2)
    assert(polys.columns.toSeq ==
      Seq("gid", "part", "vertices", "NAME", "VAL"))
    val r1 = polys.filter($"gid" === 1).head()
    assert(r1.getAs[String]("NAME") == "unit" &&
      r1.getAs[Double]("VAL") == 3.5)
    assert(r1.getSeq[org.apache.spark.sql.Row](2).length == 5)
    // spatial join: point (1,1) falls in polygon 1 only
    val pts = Seq((100L, 1.0, 1.0), (101L, 11.0, 11.0), (102L, 50.0, 50.0))
      .toDF("pid", "x", "y")
    val joined = graft.operators.Geo.geoWithin(pts, polys, "x", "y",
      "vertices")
    val got = joined.select($"pid", $"NAME").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((100L, "unit"), (101L, "far")))
  }
}
