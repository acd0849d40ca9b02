package graft.sources.zarr

import java.nio.file.{Files, Paths}
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Read-only DSv2 source for consolidated Zarr v2 stores of 1-D arrays
  * sharing one record dimension — the reference's `xr.open_zarr` ingest
  * (`qaqc/dashboard.py:311`) as a native Spark table:
  *
  * {{{
  *   spark.read.format("zarr").load("/path/to/store.zarr")
  *   // options: dim=<record dimension>  (default: auto — the dimension
  *   //          shared by the most arrays)
  * }}}
  *
  * Scale design (the reason this is a DSv2 source and not a driver
  * loop):
  *  - **one InputPartition per chunk**: Zarr's chunking IS the split
  *    contract; a 100 TB store with 1M chunks plans 1M independent
  *    partitions, each reading only its own chunk files.
  *  - **time-chunk pruning → partition pruning**: filters on the record
  *    coordinate prune CHUNKS at planning time using per-chunk
  *    [min, max] bounds from one planning-time pass over the (tiny)
  *    coordinate array — the same layout-contract pruning as
  *    `TimeLayout.readSpan` (a two-day dashboard span over a year-long
  *    store touches ~0.5% of chunks). Filters stay in the post-scan
  *    plan (pruning is chunk-granular, never claimed exact).
  *  - **column pruning → array pruning**: unprojected arrays' chunk
  *    files are never opened (each column is its own file set — Zarr is
  *    columnar on disk).
  *
  * Chunk decode (zlib / gzip / blosc-lz4 / blosc-zlib / memcpy, byte
  * shuffle) and CF time units are [[ZarrMeta]]'s public-spec
  * implementations. Local filesystem paths (the reference mounts its
  * stores the same way); missing chunk files yield fill_value runs per
  * the Zarr spec.
  */
class ZarrDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "zarr"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ZarrTable.load(options).schema()

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    ZarrTable.load(new CaseInsensitiveStringMap(properties))
}

private[zarr] object ZarrTable {
  def load(options: CaseInsensitiveStringMap): ZarrTable = {
    val path = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("zarr: .load(path) is required"))
    val zmeta = Paths.get(path, ".zmetadata")
    require(Files.exists(zmeta),
      s"zarr: $path has no .zmetadata — only consolidated stores are " +
        "supported (zarr.consolidate_metadata in the writer)")
    val arrays = ZarrMeta.parseConsolidated(
      new String(Files.readAllBytes(zmeta), java.nio.charset.StandardCharsets.UTF_8))
    require(arrays.nonEmpty, s"zarr: $path holds no 1-D arrays")
    val dim = Option(options.get("dim")).getOrElse {
      // the record dimension: shared by the most arrays (ties → name asc)
      arrays.values.flatMap(_.dims).groupBy(identity)
        .map { case (d, g) => (d, g.size) }.toSeq
        .sortBy { case (d, n) => (-n, d) }
        .headOption.map(_._1).getOrElse(throw new IllegalArgumentException(
          s"zarr: no _ARRAY_DIMENSIONS attrs in $path; pass option(\"dim\", ...)"))
    }
    val cols = arrays.values.filter(_.dims == Seq(dim)).toSeq.sortBy { m =>
      (if (m.name == dim) 0 else 1, m.name) // coordinate column first
    }
    require(cols.nonEmpty, s"zarr: no arrays over dimension '$dim' in $path")
    val len = cols.head.shape
    cols.foreach(m => require(m.shape == len,
      s"zarr: array '${m.name}' has length ${m.shape} != $len of '$dim'"))
    // chunk UNIFORMITY is load-validated, not assumed: the reader maps
    // partition c to chunk file c of EVERY column, so a per-variable
    // chunk encoding (legal Zarr, xarray can write it) would silently
    // misalign rows — chunk 1 of a 200-chunked value against rows
    // 100-199 of a 100-chunked coordinate
    val chunk = cols.head.chunk
    cols.foreach(m => require(m.chunk == chunk,
      s"zarr: array '${m.name}' is chunked [${m.chunk}] but '$dim' is " +
        s"[$chunk] — per-variable chunking is not supported (rechunk " +
        "the store so arrays over the record dimension share one chunk size)"))
    new ZarrTable(path, dim, cols)
  }
}

private[zarr] class ZarrTable(path: String, dim: String,
                              cols: Seq[ZarrMeta.ArrayMeta])
    extends Table with SupportsRead {
  override def name(): String = s"zarr:$path"
  override def schema(): StructType =
    StructType(cols.map(m => StructField(m.name, m.sparkType, nullable = true)))
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ZarrScanBuilder(path, dim, cols,
      sortedCoord = options.getBoolean("sortedCoord", false))
}

private[zarr] class ZarrScanBuilder(path: String, dim: String,
                                    cols: Seq[ZarrMeta.ArrayMeta],
                                    sortedCoord: Boolean = false)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {

  private var required: Seq[ZarrMeta.ArrayMeta] = cols
  private var coordBounds: Option[(Double, Double)] = None

  override def pruneColumns(requiredSchema: StructType): Unit = {
    val names = requiredSchema.fieldNames.toSet
    required = cols.filter(m => names.contains(m.name))
  }

  /** Record-coordinate range filters prune chunks; EVERY filter is
    * returned as unhandled (pruning is chunk-granular — Spark re-applies
    * the exact predicate post scan, like parquet row-group skipping).
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val coord = cols.head // sorted coordinate-first
    var lo = Double.NegativeInfinity
    var hi = Double.PositiveInfinity
    def num(v: Any): Option[Double] = v match {
      case n: Number => Some(n.doubleValue())
      case t: java.sql.Timestamp =>
        Some(t.getTime * 1000.0 + (t.getNanos / 1000) % 1000)
      case i: java.time.Instant =>
        Some(i.getEpochSecond * 1e6 + i.getNano / 1000.0)
      case d: java.sql.Date => Some(d.getTime * 1000.0)
      case _ => None
    }
    filters.foreach {
      case GreaterThan(a, v) if a == coord.name => num(v).foreach(x => lo = math.max(lo, x))
      case GreaterThanOrEqual(a, v) if a == coord.name => num(v).foreach(x => lo = math.max(lo, x))
      case LessThan(a, v) if a == coord.name => num(v).foreach(x => hi = math.min(hi, x))
      case LessThanOrEqual(a, v) if a == coord.name => num(v).foreach(x => hi = math.min(hi, x))
      case EqualTo(a, v) if a == coord.name =>
        num(v).foreach { x => lo = math.max(lo, x); hi = math.min(hi, x) }
      case _ =>
    }
    if (lo > Double.NegativeInfinity || hi < Double.PositiveInfinity)
      coordBounds = Some((lo, hi))
    filters // all unhandled: exact filtering stays in the plan
  }

  override def pushedFilters(): Array[Filter] = Array.empty

  override def build(): Scan =
    new ZarrScan(path, required, cols.head, coordBounds, sortedCoord)
}

private[zarr] class ZarrScan(path: String, required: Seq[ZarrMeta.ArrayMeta],
                             coord: ZarrMeta.ArrayMeta,
                             coordBounds: Option[(Double, Double)],
                             sortedCoord: Boolean = false)
    extends Scan with Batch {

  override def readSchema(): StructType =
    StructType(required.map(m => StructField(m.name, m.sparkType, nullable = true)))

  override def toBatch: Batch = this

  override def description(): String = {
    val cb = coordBounds.map { case (l, h) => s", coordBounds=[$l,$h]" }.getOrElse("")
    s"zarr $path cols=${required.map(_.name).mkString(",")}$cb"
  }

  /** One partition per surviving chunk. Default pruning reads the
    * COORDINATE array once at planning: per chunk, decode and take
    * [min, max] — exact bounds with no sortedness assumption (the scan
    * is correct on unsorted coords; only pruning effectiveness needs
    * ordering). That is O(nChunks) driver-side chunk decodes — fine for
    * dashboards' per-instrument stores (thousands of chunks), a funnel
    * at a 1M-chunk 100 TB store: `option("sortedCoord", true)` declares
    * the record coordinate globally sorted (true of every reference
    * time series) and switches to an O(log nChunks) binary search over
    * chunk FIRST values. The option is a correctness contract — on an
    * unsorted coordinate it can prune matching chunks — so it is
    * opt-in, never inferred.
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val nChunks = coord.nChunks
    val keep: Seq[Long] = coordBounds match {
      case None => (0L until nChunks)
      case Some((lo, hi)) if sortedCoord && nChunks > 1 =>
        // first coordinate value of chunk c (None → fall through to the
        // exact full-scan pruning: a missing coordinate chunk OR a NaN
        // first value breaks the monotone first-value sequence the
        // search needs — NaN gap markers are legal in float coords)
        def firstVal(c: Long): Option[Double] =
          ZarrReader.readChunkBytes(path, coord, c)
            .map(bytes => coordPruneVals(bytes)(0))
            .filterNot(_.isNaN)
        val probed = scala.collection.mutable.HashMap.empty[Long, Option[Double]]
        def fv(c: Long): Option[Double] = probed.getOrElseUpdate(c, firstVal(c))
        // largest chunk whose first value ≤ bound (strict: < bound);
        // −1 if none
        def floorChunk(bound: Double, strict: Boolean): Option[Long] = {
          var loC = 0L; var hiC = nChunks - 1; var ans = -1L
          var broken = false
          while (loC <= hiC && !broken) {
            val mid = (loC + hiC) >>> 1
            fv(mid) match {
              case None => broken = true
              case Some(v) =>
                if (if (strict) v < bound else v <= bound) {
                  ans = mid; loC = mid + 1
                } else hiC = mid - 1
            }
          }
          if (broken) None else Some(ans)
        }
        // lower bound is a STRICT floor: with duplicate coordinate
        // values spanning a chunk boundary, the chunk BEFORE a first
        // value == lo can still end with rows == lo — a ≤-floor would
        // prune it. Chunk c < aStrict has firstVal(c+1) < lo, so its
        // last value < lo: safely pruned; c ≥ aStrict has
        // firstVal(c+1) ≥ lo and may intersect.
        (floorChunk(lo, strict = true), floorChunk(hi, strict = false)) match {
          case (Some(a), Some(b)) =>
            (math.max(a, 0L) to math.min(b, nChunks - 1))
          case _ => fullScanPrune(lo, hi, nChunks)
        }
      case Some((lo, hi)) => fullScanPrune(lo, hi, nChunks)
    }
    keep.map(c => ZarrInputPartition(path, c): InputPartition).toArray
  }

  /** Coordinate chunk values in PRUNING space: CF-time coords become
    * epoch micros — integral dtypes on the exact Long path (the reader's
    * ±1 µs int64-nanosecond lesson applies here too: a double-leg bound
    * could wrongly prune a chunk whose true max equals the filter value
    * exactly) — plain coords their raw values. Micros fit double's 2^53
    * exactly, so the Double pruning comparisons stay exact.
    */
  private def coordPruneVals(bytes: Array[Byte]): Array[Double] =
    if (coord.isCfTime) {
      val (perUnit, epoch) = ZarrMeta.cfTime(coord.units.get)
      if (coord.dtypeStr.contains("i"))
        ZarrMeta.longsOf(coord, bytes)
          .map(v => ZarrMeta.cfToMicrosLong(v, perUnit, epoch).toDouble)
      else ZarrMeta.doublesOf(coord, bytes)
        // NaN gap markers stay NaN (cfToMicros would map them to the
        // epoch): the min/max prune skips them naturally (comparisons
        // are false), the sorted path's firstVal rejects them
        .map(v => if (v.isNaN) Double.NaN
                  else ZarrMeta.cfToMicros(v, perUnit, epoch).toDouble)
    } else ZarrMeta.doublesOf(coord, bytes)

  private def fullScanPrune(lo: Double, hi: Double,
                            nChunks: Long): Seq[Long] = {
        (0L until nChunks).filter { c =>
          ZarrReader.readChunkBytes(path, coord, c) match {
            case None => coord.fillValue.exists { f =>
              val v = if (coord.isCfTime) {
                val (perUnit, epoch) = ZarrMeta.cfTime(coord.units.get)
                ZarrMeta.cfToMicros(f, perUnit, epoch).toDouble
              } else f
              v >= lo && v <= hi
            }
            case Some(bytes) =>
              val vals = coordPruneVals(bytes)
              val n = ZarrReader.rowsInChunk(coord, c)
              var mn = Double.PositiveInfinity
              var mx = Double.NegativeInfinity
              var i = 0
              while (i < n) {
                val v = vals(i)
                if (v < mn) mn = v
                if (v > mx) mx = v
                i += 1
              }
              mx >= lo && mn <= hi
          }
        }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    // coord rides along as the row-count witness: a fully-pruned
    // projection (count(*)) still needs rowsInChunk
    new ZarrReaderFactory(required, coord)
}

private[zarr] case class ZarrInputPartition(path: String, chunk: Long)
    extends InputPartition

private[zarr] class ZarrReaderFactory(required: Seq[ZarrMeta.ArrayMeta],
                                      rowMeta: ZarrMeta.ArrayMeta)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[ZarrInputPartition]
    new ZarrChunkReader(p.path, p.chunk, required, rowMeta)
  }
}

private[zarr] object ZarrReader {
  /** Chunk file bytes, or None for a missing chunk (fill_value run). */
  def readChunkBytes(path: String, meta: ZarrMeta.ArrayMeta,
                     chunk: Long): Option[Array[Byte]] = {
    val f = Paths.get(path, meta.name, chunk.toString)
    if (!Files.exists(f)) None
    else Some(ZarrMeta.decodeChunk(meta, Files.readAllBytes(f)))
  }

  /** Logical rows in chunk c (the LAST chunk is truncated to the array
    * length; on disk it is padded to the full chunk size).
    */
  def rowsInChunk(meta: ZarrMeta.ArrayMeta, chunk: Long): Int =
    math.min(meta.chunk.toLong, meta.shape - chunk * meta.chunk).toInt
}

/** Decodes each required array's chunk once, then iterates rows. Float
  * NaN values surface as null (the domain's missing-value convention —
  * zarr fill_value for float arrays is NaN, and xarray reads gaps the
  * same way); integral columns keep fill_value literally.
  */
private[zarr] class ZarrChunkReader(path: String, chunk: Long,
                                    required: Seq[ZarrMeta.ArrayMeta],
                                    rowMeta: ZarrMeta.ArrayMeta)
    extends PartitionReader[InternalRow] {

  private val nRows = ZarrReader.rowsInChunk(rowMeta, chunk)

  // per-column decoded payload: EVERY integral dtype rides the Long
  // path (int64 values past 2^53 — nanosecond timestamps, large ids —
  // corrupt silently through a double leg); floats ride doubles with
  // NaN → null at emit. `nulls` is non-null only for float CF time,
  // where a NaN gap marker must become a null timestamp (xarray's NaT),
  // not round(NaN)=0 = the epoch.
  private sealed trait Col
  private case object AllNull extends Col
  private final case class Doubles(v: Array[Double]) extends Col
  private final case class Longs(v: Array[Long],
                                 nulls: Array[Boolean]) extends Col

  private val columns: Array[Col] =
    required.map { m =>
      val bytes = ZarrReader.readChunkBytes(path, m, chunk)
      val integral = m.dtypeStr.stripPrefix("<").stripPrefix("|").head != 'f'
      if (m.isCfTime) {
        val (perUnit, epoch) = ZarrMeta.cfTime(m.units.get)
        bytes match {
          case Some(b) if integral =>
            Longs(ZarrMeta.longsOf(m, b)
              .map(v => ZarrMeta.cfToMicrosLong(v, perUnit, epoch)), null)
          case Some(b) =>
            val raw = ZarrMeta.doublesOf(m, b)
            val nulls = if (raw.exists(_.isNaN)) raw.map(_.isNaN) else null
            Longs(raw.map(v =>
              if (v.isNaN) 0L else ZarrMeta.cfToMicros(v, perUnit, epoch)),
              nulls)
          case None => m.fillValue match {
            case Some(f) if !f.isNaN =>
              Longs(Array.fill(nRows)(
                ZarrMeta.cfToMicros(f, perUnit, epoch)), null)
            case _ => AllNull // no fill, or NaN fill = missing timestamps
          }
        }
      } else if (integral) bytes match {
        case Some(b) => Longs(ZarrMeta.longsOf(m, b), null)
        case None => m.fillValue match {
          case Some(f) => Longs(Array.fill(nRows)(f.toLong), null)
          case None => AllNull
        }
      } else bytes match {
        case Some(b) => Doubles(ZarrMeta.doublesOf(m, b))
        case None => m.fillValue match {
          case Some(f) => Doubles(Array.fill[Double](nRows)(f))
          case None => AllNull
        }
      }
    }.toArray

  private var row = -1

  override def next(): Boolean = { row += 1; row < nRows }

  override def get(): InternalRow = {
    val out = new GenericInternalRow(required.length)
    var c = 0
    while (c < required.length) {
      columns(c) match {
        case AllNull => out.setNullAt(c)
        case Longs(vs, nulls) =>
          if (nulls != null && nulls(row)) out.setNullAt(c)
          else required(c).sparkType match {
            case TimestampType | LongType => out.setLong(c, vs(row))
            case IntegerType => out.setInt(c, vs(row).toInt)
            case ShortType => out.setShort(c, vs(row).toShort)
            case _ => out.update(c, vs(row))
          }
        case Doubles(ds) =>
          val v = ds(row)
          if (v.isNaN) out.setNullAt(c)
          else required(c).sparkType match {
            case DoubleType => out.setDouble(c, v)
            case FloatType => out.setFloat(c, v.toFloat)
            case _ => out.update(c, v)
          }
      }
      c += 1
    }
    out
  }

  override def close(): Unit = {}
}
