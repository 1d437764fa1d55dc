package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** reference: ddf_library/functions/geo/read_shapefile.py — the
  * reference parses .shp/.dbf with pyshp into an in-memory polygon
  * table. Clean-room equivalent implemented from the PUBLIC format
  * specs (ESRI Shapefile Technical Description, July 1998; dBase III
  * DBF layout), no third-party parser.
  *
  * A shapefile is a single small sidecar artifact (the polygon side of
  * geo_within is broadcast-small by design — see
  * [[graft.operators.Geo]]), so it is parsed on the driver and
  * parallelized; the POINT side of a spatial join is the 100 TB side
  * and never flows through here.
  *
  * Output: one row per shape part (polygon ring / polyline part /
  * point), columns `gid` (record number), `part`, `vertices`
  * array<struct<x,y>> — directly consumable by Geo.geoWithin — plus
  * one column per .dbf attribute (N/F numeric → double, else string).
  */
object Shapefile {

  private val vertexType = ArrayType(
    StructType(Seq(StructField("x", DoubleType, nullable = false),
      StructField("y", DoubleType, nullable = false))),
    containsNull = false)

  /** shape types we materialize: Point(1), PolyLine(3), Polygon(5) —
    * the types the reference's geo module handles. */
  def read(spark: SparkSession, shpPath: String,
           dbfPath: Option[String] = None): DataFrame = {
    val geo = readShp(shpPath)
    val (fields, byRecord) = dbfPath.map(readDbf)
      .getOrElse((Seq.empty[StructField], Map.empty[Int, Seq[Any]]))

    val schema = StructType(
      Seq(StructField("gid", IntegerType, nullable = false),
        StructField("part", IntegerType, nullable = false),
        StructField("vertices", vertexType, nullable = false)) ++ fields)

    val rows = geo.map { case (gid, part, verts) =>
      val attrVals = byRecord.getOrElse(gid, fields.map(_ => null))
      Row.fromSeq(Seq(gid, part, verts.map(p => Row(p._1, p._2))) ++ attrVals)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows,
        math.max(1, math.min(rows.size, spark.sparkContext.defaultParallelism))),
      schema)
  }

  /** (recordNumber, partIndex, vertices) triples from the main file. */
  private def readShp(path: String)
      : Seq[(Int, Int, Array[(Double, Double)])] = {
    val bytes = Files.readAllBytes(Paths.get(path))
    val bb = ByteBuffer.wrap(bytes)
    bb.order(ByteOrder.BIG_ENDIAN)
    require(bb.getInt(0) == 9994, s"$path: not a shapefile (bad file code)")
    val fileLenBytes = bb.getInt(24) * 2 // header stores 16-bit words
    val out = Seq.newBuilder[(Int, Int, Array[(Double, Double)])]
    var off = 100
    while (off + 8 <= fileLenBytes) {
      val recNum = bb.getInt(off)
      val contentBytes = bb.getInt(off + 4) * 2
      val s = off + 8
      bb.order(ByteOrder.LITTLE_ENDIAN)
      val shapeType = bb.getInt(s)
      shapeType match {
        case 0 => // null shape
        case 1 => // Point: x, y doubles
          out += ((recNum, 0,
            Array((bb.getDouble(s + 4), bb.getDouble(s + 12)))))
        case 3 | 5 => // PolyLine | Polygon: bbox, parts[], points[]
          val numParts = bb.getInt(s + 36)
          val numPoints = bb.getInt(s + 40)
          val partsOff = s + 44
          val pointsOff = partsOff + 4 * numParts
          val starts = Array.tabulate(numParts)(i => bb.getInt(partsOff + 4 * i))
          var p = 0
          while (p < numParts) {
            val end = if (p + 1 < numParts) starts(p + 1) else numPoints
            val verts = Array.tabulate(end - starts(p)) { i =>
              val o = pointsOff + 16 * (starts(p) + i)
              (bb.getDouble(o), bb.getDouble(o + 8))
            }
            out += ((recNum, p, verts))
            p += 1
          }
        case other =>
          sys.error(s"$path: unsupported shape type $other " +
            "(supported: Point=1, PolyLine=3, Polygon=5)")
      }
      bb.order(ByteOrder.BIG_ENDIAN)
      off = s + contentBytes
    }
    out.result()
  }

  /** dBase III attribute table: (schema fields, record# → values).
    * Record numbers are 1-based to match .shp record numbers. */
  private def readDbf(path: String)
      : (Seq[StructField], Map[Int, Seq[Any]]) = {
    val bytes = Files.readAllBytes(Paths.get(path))
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val nRecords = bb.getInt(4)
    val headerSize = bb.getShort(8) & 0xffff
    val recordSize = bb.getShort(10) & 0xffff
    // field descriptors: 32 bytes each, terminated by 0x0D
    var fo = 32
    val fields = Seq.newBuilder[(String, Char, Int)]
    while (bytes(fo) != 0x0d) {
      val name = new String(bytes, fo, 11, "ASCII").takeWhile(c => c != '\u0000' && c != ' ').trim
      val ftype = bytes(fo + 11).toChar
      val flen = bytes(fo + 16) & 0xff
      fields += ((name, ftype, flen))
      fo += 32
    }
    val fs = fields.result()
    val structFields = fs.map { case (name, ftype, _) =>
      StructField(name,
        if (ftype == 'N' || ftype == 'F') DoubleType else StringType)
    }
    val recs = (0 until nRecords).flatMap { r =>
      val ro = headerSize + r.toLong.toInt * recordSize
      if (bytes(ro) == '*') None // deleted record
      else {
        var co = ro + 1
        val vals = fs.map { case (_, ftype, flen) =>
          val raw = new String(bytes, co, flen, "ASCII").trim
          co += flen
          if (ftype == 'N' || ftype == 'F')
            if (raw.isEmpty) null else java.lang.Double.valueOf(raw)
          else if (raw.isEmpty) null else raw
        }
        Some((r + 1) -> (vals: Seq[Any]))
      }
    }.toMap
    (structFields, recs)
  }
}
