package graft.sources

import java.io.RandomAccessFile
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

/** Pure-JVM reader for the NetCDF classic formats (CDF-1 and the 64-bit
  * offset CDF-2 variant), written from the public Unidata classic format
  * specification. Closes the reference's `load_cf_area` IO gap
  * (`pyresample/utils/cf.py:413`) for the classic formats — no native
  * libs, so it works on every executor; HDF5-based NetCDF-4 is out of
  * scope (needs a full HDF5 reader).
  *
  * Reads the entire header eagerly (it is small by construction) and
  * variable data on demand via positioned reads. Data is returned as
  * `Array[Double]` regardless of the on-disk type — the engine's area /
  * coordinate inference consumes doubles everywhere, and 100 TB-scale
  * payload data enters Spark through parquet, not this path (classic
  * NetCDF caps a file at a few GB; this reader is for grid/area
  * metadata files, read driver-side or broadcast).
  */
object NetCdf3 {

  // nc_type tags (classic spec §"Data Types")
  private val NcByte = 1; private val NcChar = 2; private val NcShort = 3
  private val NcInt = 4; private val NcFloat = 5; private val NcDouble = 6
  // header list tags
  private val TagDim = 0x0A; private val TagVar = 0x0B; private val TagAttr = 0x0C

  /** A typed attribute value: `Left(string)` for NC_CHAR, `Right(doubles)`
    * for every numeric type (widened — CF attributes are consumed as
    * doubles or strings throughout). */
  type AttrValue = Either[String, Array[Double]]

  final case class NcDim(name: String, length: Int) { def isRecord: Boolean = length == 0 }

  final case class NcVar(
      name: String,
      dimIds: Seq[Int],
      attrs: Map[String, AttrValue],
      ncType: Int,
      vsize: Long,
      begin: Long) {
    def strAttr(k: String): Option[String] = attrs.get(k).flatMap(_.left.toOption)
    def numAttr(k: String): Option[Double] =
      attrs.get(k).flatMap(_.toOption).flatMap(_.headOption)
  }

  final class NcFile(
      val path: String,
      val version: Int,
      val numRecs: Int,
      val dims: IndexedSeq[NcDim],
      val globalAttrs: Map[String, AttrValue],
      val varList: Seq[NcVar]) { // file order — discovery iterates it

    val vars: Map[String, NcVar] = varList.map(v => v.name -> v).toMap

    /** Variable shape with the record dimension resolved to numRecs. */
    def shape(v: NcVar): Seq[Int] =
      v.dimIds.map(i => if (dims(i).isRecord) numRecs else dims(i).length)

    def dimNames(v: NcVar): Seq[String] = v.dimIds.map(dims(_).name)

    private def typeSize(t: Int): Int = t match {
      case NcByte | NcChar => 1
      case NcShort => 2
      case NcInt | NcFloat => 4
      case NcDouble => 8
      case other => throw new IllegalArgumentException(s"unknown nc_type $other")
    }

    private lazy val recordVars: Seq[NcVar] =
      vars.values.filter(v => v.dimIds.headOption.exists(dims(_).isRecord)).toSeq
    /** Bytes between consecutive records: sum of the record vars' padded
      * per-record slabs — except with exactly one record variable, whose
      * slab is NOT padded (classic spec, note on vsize). */
    private lazy val recStride: Long =
      if (recordVars.sizeIs == 1) {
        val v = recordVars.head
        v.dimIds.drop(1).map(dims(_).length.toLong).product * typeSize(v.ncType)
      } else recordVars.map(_.vsize).sum

    private def readRaw(raf: RandomAccessFile, off: Long, len: Int): ByteBuffer = {
      val arr = new Array[Byte](len)
      raf.seek(off)
      raf.readFully(arr)
      ByteBuffer.wrap(arr) // big-endian by default
    }

    private def decode(buf: ByteBuffer, t: Int, n: Int): Array[Double] = {
      val out = new Array[Double](n)
      var i = 0
      while (i < n) {
        out(i) = t match {
          case NcByte => buf.get().toDouble
          case NcChar => (buf.get() & 0xFF).toDouble
          case NcShort => buf.getShort().toDouble
          case NcInt => buf.getInt().toDouble
          case NcFloat => buf.getFloat().toDouble
          case NcDouble => buf.getDouble()
        }
        i += 1
      }
      out
    }

    /** Full variable contents, row-major, as doubles (record dimension
      * outermost, one slab per record). */
    def readDoubles(name: String): Array[Double] = {
      val v = vars.getOrElse(name,
        throw new NoSuchElementException(s"variable '$name' not in $path"))
      val isRec = v.dimIds.headOption.exists(dims(_).isRecord)
      val ts = typeSize(v.ncType)
      val raf = new RandomAccessFile(path, "r") // ONE handle for the whole read
      try {
        if (!isRec) {
          val n = v.dimIds.map(dims(_).length.toLong).product.toInt.max(1) // scalar: 1
          decode(readRaw(raf, v.begin, n * ts), v.ncType, n)
        } else {
          val perRec = v.dimIds.drop(1).map(dims(_).length.toLong).product.toInt.max(1)
          val out = new Array[Double](perRec * numRecs)
          var r = 0
          while (r < numRecs) {
            val buf = readRaw(raf, v.begin + r * recStride, perRec * ts)
            System.arraycopy(decode(buf, v.ncType, perRec), 0, out, r * perRec, perRec)
            r += 1
          }
          out
        }
      } finally raf.close()
    }
  }

  def read(path: String): NcFile = {
    val fileLen = new java.io.File(path).length()
    if (fileLen <= (1 << 20)) readHeader(path, Int.MaxValue)
    else
      try readHeader(path, 1 << 20) // 1 MB covers any sane header
      catch {
        // a truncated prefix can surface as underflow OR as an
        // out-of-range position() (padding skip past the limit) — retry
        // with the full file; a genuine parse error just reproduces
        case _: java.nio.BufferUnderflowException | _: IllegalArgumentException =>
          readHeader(path, Int.MaxValue)
      }
  }

  private def readHeader(path: String, maxPrefix: Int): NcFile = {
    val raf = new RandomAccessFile(path, "r")
    val headerBytes =
      try {
        // the header precedes all data; data begins at the smallest var
        // begin. Read a generous prefix; the caller retries with the full
        // file on underflow (pathologically wide headers).
        val len = math.min(raf.length(), maxPrefix.toLong).toInt
        val arr = new Array[Byte](len)
        raf.seek(0); raf.readFully(arr); arr
      } finally raf.close()
    val buf = ByteBuffer.wrap(headerBytes)

    // version sniff FIRST: a NetCDF-4 file is an HDF5 container (8-byte
    // signature \x89HDF\r\n\x1a\n) — point the user at the documented
    // conversion instead of a cryptic magic-mismatch (SURVEY §8: classic
    // is the offline ceiling; no trusted HDF5 fixture writer exists in
    // this environment to validate a reader against)
    if (headerBytes.length >= 8 && (headerBytes(0) & 0xFF) == 0x89 &&
      headerBytes(1) == 'H' && headerBytes(2) == 'D' && headerBytes(3) == 'F')
      throw new IllegalArgumentException(
        s"$path is NetCDF-4/HDF5; this engine reads the classic formats (CDF-1/2). " +
          "Convert once with `nccopy -k classic in.nc out.nc` (or " +
          "`ncks -3 in.nc out.nc`), or land bulk data as parquet.")
    val magic = new Array[Byte](3); buf.get(magic)
    require(new String(magic, StandardCharsets.US_ASCII) == "CDF",
      s"$path: not a NetCDF classic file (magic ${magic.toSeq})")
    val version = buf.get().toInt
    require(version == 1 || version == 2,
      if (version == 5)
        s"$path: CDF-5 (64-bit data, pnetcdf) unsupported — convert with `nccopy -k classic`"
      else s"$path: classic format version $version unsupported")

    val numRecs = buf.getInt() // 0xFFFFFFFF (STREAMING) reads as -1; reject
    require(numRecs >= 0, s"$path: STREAMING record count unsupported")

    def name(): String = {
      val n = buf.getInt()
      val bytes = new Array[Byte](n); buf.get(bytes)
      buf.position(buf.position() + ((4 - n % 4) % 4)) // name padding
      new String(bytes, StandardCharsets.UTF_8)
    }

    def attrList(): Map[String, AttrValue] = {
      val tag = buf.getInt(); val n = buf.getInt()
      if (tag == 0) { require(n == 0, s"$path: bad ABSENT attr list"); return Map.empty }
      require(tag == TagAttr, s"$path: expected NC_ATTRIBUTE tag, got $tag")
      (0 until n).map { _ =>
        val aname = name()
        val t = buf.getInt(); val nelems = buf.getInt()
        val value: AttrValue =
          if (t == NcChar) {
            val bytes = new Array[Byte](nelems); buf.get(bytes)
            buf.position(buf.position() + ((4 - nelems % 4) % 4))
            Left(new String(bytes, StandardCharsets.UTF_8))
          } else {
            val vals = new Array[Double](nelems)
            var i = 0
            while (i < nelems) {
              vals(i) = t match {
                case NcByte => buf.get().toDouble
                case NcShort => buf.getShort().toDouble
                case NcInt => buf.getInt().toDouble
                case NcFloat => buf.getFloat().toDouble
                case NcDouble => buf.getDouble()
                case other => throw new IllegalArgumentException(s"$path: bad attr type $other")
              }
              i += 1
            }
            val raw = nelems * (t match {
              case NcByte => 1; case NcShort => 2; case NcInt | NcFloat => 4; case NcDouble => 8
            })
            buf.position(buf.position() + ((4 - raw % 4) % 4))
            Right(vals)
          }
        aname -> value
      }.toMap
    }

    // dim_list
    val dims: IndexedSeq[NcDim] = {
      val tag = buf.getInt(); val n = buf.getInt()
      if (tag == 0) { require(n == 0); IndexedSeq.empty }
      else {
        require(tag == TagDim, s"$path: expected NC_DIMENSION tag, got $tag")
        (0 until n).map(_ => NcDim(name(), buf.getInt()))
      }
    }
    val gatts = attrList()
    // var_list
    val varSeq: Seq[NcVar] = {
      val tag = buf.getInt(); val n = buf.getInt()
      if (tag == 0) { require(n == 0); Seq.empty }
      else {
        require(tag == TagVar, s"$path: expected NC_VARIABLE tag, got $tag")
        (0 until n).map { _ =>
          val vname = name()
          val ndims = buf.getInt()
          val dimIds = (0 until ndims).map(_ => buf.getInt())
          val vatts = attrList()
          val ncType = buf.getInt()
          val vsize = buf.getInt().toLong & 0xFFFFFFFFL
          val begin = if (version == 1) buf.getInt().toLong & 0xFFFFFFFFL else buf.getLong()
          NcVar(vname, dimIds, vatts, ncType, vsize, begin)
        }
      }
    }
    new NcFile(path, version, numRecs, dims, gatts, varSeq)
  }
}
