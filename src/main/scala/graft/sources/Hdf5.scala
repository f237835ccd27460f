package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.Inflater

import scala.collection.mutable

/** Minimal pure-JVM HDF5 reader for the S3–S6 byte-parse boundary.
  *
  * The reference pipeline's entire input format is HDF5/NeXus
  * (`/root/reference/src/utilities.py:11-63` reads scalars, strings,
  * quantities-with-units and images out of `.nxs` files); no HDF5 library is
  * available in this build, so this implements the subset of the public HDF5
  * File Format Specification v3 that those reads touch:
  *
  *  - superblock v0 (old-style: v1 object headers, symbol-table groups) and
  *    v2/v3 (OHDR v2 object headers, compact link-message groups); dense
  *    groups (fractal-heap link storage, direct- and indirect-rooted, with
  *    the v2-B-tree name index, indirectly-accessed huge objects
  *    (v2-B-tree record types 1/2 — the only forms reachable through the
  *    fixed 8-byte link/attr heap IDs), dense attributes,
  *    and FILTERED heaps — direct blocks stored as compressed streams,
  *    decoded through the same six-filter chain as chunk data, honoring
  *    per-block/per-object filter masks for optional stages skipped at
  *    write time)
  *  - object header messages: dataspace (v1/v2, incl. maxdims), datatype
  *    (fixed-point and IEEE float in either byte order — big-endian
  *    conversion-tool outputs decode through an order-aware buffer —
  *    fixed string, vlen string; compound — v1/
  *    v2/v3 encodings — with scalar, vlen-string, nested-compound and
  *    array-typed members (nested ones flatten to dotted names, array
  *    ones — class-10 or v1 member dims — fold into trailing dims,
  *    h5py's structured-dtype view), surfacing each member as a
  *    `<path>/<member>` child
  *    node; enums over integer bases, read as the base type like h5py;
  *    array datatypes (class 10) over fixed/float bases, folded into
  *    trailing dims; scalar object references (class 7 rtype 0), read as
  *    the referenced object's path string; scalar dataset-region
  *    references (class 7 rtype 1, the ≤1.10 heap form), read as the
  *    target's path with the selection rendered into a
  *    `region_selection` attribute — the NeXus mask/ROI shape), data layout v3
  *    (compact, contiguous, chunked + v1 B-tree) and v4 (chunked with ALL
  *    FIVE index types: Single Chunk, Implicit, Fixed Array, Extensible
  *    Array — every addressing tier incl. paged data blocks with MSB-first
  *    page-init bitmasks, with H5VM_swizzle_coords chunk ordering when the
  *    unlimited dimension is not dim 0 — and v2 B-tree chunk records at
  *    any depth) plus
  *    virtual (VDS) storage assembled from sibling source files — regular
  *    and irregular hyperslab, point (v1 u32 and v2 variable-width
  *    HDF5 1.12+ encodings), strided, multi-block and ALL
  *    selections, plus count- and block-unlimited selections with
  *    printf-style `%b`/`%d` source-name substitution — filter
  *    pipelines (deflate; shuffle; fletcher32 in either order vs the
  *    compressor; HDF5Plugin LZ4 32004 via the lz4-java already on
  *    Spark's classpath; bitshuffle 32008 ± internal LZ4 — the Eiger
  *    default; zstd 32015), attributes (v1/v2/v3), header continuations
  *  - global heap collections (GCOL) for variable-length strings and
  *    virtual-storage mapping blocks
  *  - links: hard links may alias one object under many paths (every path
  *    gets a node); soft links resolve to alias nodes (chains + group
  *    targets included, dangling ones surface as marker nodes); external
  *    links — which real Eiger masters use to reach their data files —
  *    resolve through a caller-supplied `resolve: file -> bytes` callback
  *    (h5py-transparent: the target object or subtree grafts in at the
  *    link path), with cross-file cycles guarded; links whose target file
  *    or object cannot be resolved become explicit marker nodes carrying
  *    the target file/path — inspectable, never a silent hole; VDS source
  *    files resolve through the same callback with the same degrade
  *
  * Deliberately NOT supported (fails loudly, never silently misreads):
  * directly-accessed huge heap objects (v2-B-tree record types 3/4 —
  * they require ≥17-byte heap IDs, impossible for the fixed 8-byte
  * link/attr form, so no real file shape reaches them);
  * filters beyond the six above, and chains
  * stacking more than one compressor (per-stage sizes are only known for
  * one size-changing stage); non-IEEE numeric types (VAX byte order,
  * non-standard float widths);
  * EXTERNAL revised references (flags bit 0 — the blob embeds a
  * foreign filename) — scalar OBJECT references (rtype 0 AND the HDF5
  * 1.12 revised rtype 2 token form), REGION references (the ≤1.10
  * rtype 1 heap form AND the revised rtype 3 token form) and
  * ATTRIBUTE references (the revised rtype 4 H5R_ATTR form) ARE
  * supported, resolving to the referenced object's path (region forms
  * also render the `region_selection` attribute; the attribute form
  * renders the name into `referenced_attribute`), with null references
  * reading as '' and dangling addresses/heap handles surfacing a
  * marker attribute; reference ARRAYs fail loudly);
  * enums over non-integer bases;
  * overlapping multi-block selection unions (malformed — libhdf5
  * normalizes unions to disjoint blocks before serializing);
  * and virtual datasets over vlen-string, object-reference or
  * vlen-member-compound datatypes — their heap/address references are
  * not portable across files. Array-typed, compound-typed and
  * reference-typed ATTRIBUTES are skipped as opaque metadata (loud
  * failure is reserved for dataset datatypes, where data would be
  * misread). Small ARRAY-dataspace attributes (≤256 elements) decode
  * as comma-joined flat lists, the same rendering the synthetic `dims`
  * attr uses: numeric (the NeXus vector/offset shape) and string
  * (the NeXus `axes` name list, fixed-width or vlen elements).
  *
  * Everything here is driven by offsets into one in-memory byte array — the
  * files this parses are single instrument frames (MBs), read in parallel
  * one-per-task via `binaryFile`; the 100 TB scale dimension is the NUMBER
  * of files, which Spark distributes, not the size of any one file.
  */
object Hdf5 {

  private val UNDEF = -1L // 0xFFFF_FFFF_FFFF_FFFF unsigned

  /** Numeric ARRAY attributes decode up to this many elements (NeXus
    * vector/offset/axis attrs are 3–16; anything larger is data mislabeled
    * as metadata and skips like other opaque attribute types). */
  private val MaxAttrElems = 256L

  /** One dataset in the tree, decoded to the typed forms the pipeline reads
    * (scalar double / scalar string / numeric array) plus its attributes. */
  case class Node(
      path: String,
      dims: Seq[Long],
      scalarF64: Option[Double],
      scalarStr: Option[String],
      f32Data: Option[Array[Float]],
      f64Data: Option[Array[Double]],
      attrs: Map[String, String],
      // pending object-reference target (header address), resolved to a
      // path after the full walk — a dedicated field, NOT an attrs entry,
      // so a user attribute of any name can never collide with it
      refAddr: Option[Long] = None)

  // ------------------------------------------------------------- plumbing --

  private def bufAt(bytes: Array[Byte], addr: Long): ByteBuffer = {
    require(addr >= 0 && addr <= bytes.length, s"address $addr out of file bounds")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    bb.position(addr.toInt)
    bb
  }

  private def u8(bb: ByteBuffer): Int = bb.get() & 0xFF
  private def u16(bb: ByteBuffer): Int = bb.getShort() & 0xFFFF
  private def u32(bb: ByteBuffer): Long = bb.getInt() & 0xFFFFFFFFL
  private def u64(bb: ByteBuffer): Long = bb.getLong()

  private def take(bb: ByteBuffer, n: Int): Array[Byte] = {
    val out = new Array[Byte](n)
    bb.get(out)
    out
  }

  private def sig(bb: ByteBuffer, expect: String): Unit = {
    val got = new String(take(bb, expect.length), "ASCII")
    require(got == expect, s"expected '$expect' signature, got '$got'")
  }

  // ------------------------------------------------------------ datatypes --

  private sealed trait DType { def size: Int }
  private case class Fixed(size: Int, signed: Boolean,
      be: Boolean = false) extends DType
  private case class Flt(size: Int, be: Boolean = false) extends DType
  private case class Str(size: Int) extends DType
  private case object VlenStr extends DType { val size = 16 }
  /** Dataset-region reference (class 7, rtype 1, HDF5 ≤1.10 form): a
    * 12-byte (global-heap collection address, 1-based index) pair whose
    * heap object holds the target's object-header address plus a
    * serialized dataspace selection. Decodes to the target PATH (like
    * object references) with the selection rendered into the
    * `region_selection` attribute. */
  private case class RegionRef(size: Int) extends DType

  /** Object reference (class 7, rtype 0): an 8-byte object-header address
    * into THIS file, resolved post-walk to the referenced object's path. */
  private case class ObjRef(size: Int) extends DType

  /** Revised object reference (class 7, rtype 2, the HDF5 1.12+
    * H5T_STD_REF default — what next-generation NeXus writers emit). The
    * 18-byte disk element is a 2-byte encode header (ref-type byte,
    * flags byte) + 4-byte blob size + 12-byte global-heap blob ID
    * (libhdf5 H5T__ref_disk_write); the heap blob is the encoded
    * reference minus its header: 1-byte token size + the token, which
    * for files written by the native VOL connector is the 8-byte
    * little-endian object-header address (H5R__encode_obj_token /
    * H5VL_native_addr_to_token). Resolves post-walk to the referenced
    * object's path, exactly like rtype 0; a zero ref-type byte is the
    * null reference (H5T__ref_disk_isnull's test). External references
    * (flags bit 0: the blob embeds a foreign filename) fail loudly —
    * cross-file addresses are not resolvable from this file's bytes. */
  private case class ObjRef2(size: Int) extends DType

  /** Revised dataset-region reference (class 7, rtype 3, the HDF5 1.12+
    * H5R_DATASET_REGION2 form). Same 18-byte disk element as rtype 2
    * (H5T__ref_disk_write is reference-type-agnostic); the heap blob is
    * the encoded reference minus its 2-byte header, which for region
    * references is the token part (1-byte size + 8-byte LE address,
    * H5R__encode_obj_token) followed by the region part
    * (H5R__encode_region): 4-byte LE serialized-selection size + 4-byte
    * LE extent rank + the standard H5S selection serialization — the
    * SAME serialization the ≤1.10 rtype-1 heap object carries, so
    * parseSelection is shared. Decodes like rtype 1: target PATH plus
    * the `region_selection` rendering. Null/dangling/external handling
    * mirrors rtype 2. */
  private case class RegionRef2(size: Int) extends DType

  /** Revised attribute reference (class 7, rtype 4, the HDF5 1.12+
    * H5R_ATTR form). Same 18-byte disk element as rtype 2
    * (H5T__ref_disk_write is reference-type-agnostic); the heap blob is
    * the token part (1-byte size + 8-byte LE object-header address,
    * H5R__encode_obj_token) followed by the attribute-name part
    * (H5R__encode_string): 2-byte LE name length + the name bytes, no
    * terminator. Decodes to the OWNING object's path (resolved
    * post-walk like the other forms) with the attribute name rendered
    * into the `referenced_attribute` attribute — the attribute's value
    * itself already surfaces through the owner's normal attribute walk.
    * Null / dangling / external handling mirrors rtype 2. */
  private case class AttrRef2(size: Int) extends DType
  private case class Member(name: String, offset: Int, dt: DType)
  private case class Compound(size: Int, members: Seq[Member]) extends DType

  /** Array datatype (class 10): each dataspace element is a fixed-shape
    * array of the base type (NeXus per-point vectors/tensors). Reads fold
    * the array dims into trailing dataset dims, h5py's presentation. */
  private case class ArrayT(base: DType, adims: Seq[Int]) extends DType {
    def size: Int = base.size * adims.product
  }

  /** dataspace dims + datatype, with array-typed elements folded into
    * extra trailing dims over the base type. */
  private def normalizeArray(dims: Seq[Long], dt: DType): (Seq[Long], DType) =
    dt match {
      case a: ArrayT => (dims ++ a.adims.map(_.toLong), a.base)
      case _ => (dims, dt)
    }

  private def parseDatatype(bb: ByteBuffer): DType = {
    val b0 = u8(bb)
    val cls = b0 & 0x0F
    val version = (b0 >> 4) & 0x0F
    val bits = take(bb, 3)
    val size = u32(bb).toInt
    cls match {
      // classes 0/1 consume their property blocks (bit offset/precision,
      // + the float exponent/mantissa layout) so SEQUENTIAL parses —
      // compound members — stay position-correct
      case 0 =>
        bb.position(bb.position() + 4) // bit offset + precision
        Fixed(size, signed = (bits(0) & 0x08) != 0,
          be = (bits(0) & 0x01) != 0)
      case 1 =>
        // float byte order is bits 0 AND 6: 00 LE, 01 BE, 11 VAX.
        // UnsupportedOperationException (not require) for BOTH unsupported
        // shapes so a VAX-typed or f16/f128-typed ATTRIBUTE skips like
        // other unparseable attribute datatypes (datasets stay loud)
        if ((bits(0) & 0x40) != 0)
          throw new UnsupportedOperationException("VAX-order float not supported")
        if (size != 4 && size != 8)
          throw new UnsupportedOperationException(s"unsupported float width $size")
        bb.position(bb.position() + 12) // bit layout + exponent bias
        Flt(size, be = (bits(0) & 0x01) != 0)
      case 3 => Str(size)
      case 6 => // compound: the flat scalar-member shape NeXus tables use
        val nMembers = ((bits(1) & 0xFF) << 8) | (bits(0) & 0xFF)
        val members = (0 until nMembers).map { _ =>
          // member name: NUL-terminated; v1/v2 pad to a multiple of 8
          val start = bb.position()
          var end = start
          while (bb.get(end) != 0) end += 1
          val name = new String(bb.array(), start, end - start, "UTF-8")
          val nameLen = end - start + 1
          bb.position(start + (if (version < 3) (nameLen + 7) & ~7 else nameLen))
          // v1 members carry their own dims (predating class-10 array
          // datatypes): a scalar base + member dims is the old encoding
          // of an array member, normalized to ArrayT below
          var v1dims: Seq[Int] = Nil
          val offset = version match {
            case 1 =>
              val off = u32(bb).toInt
              val ndims = u8(bb)
              bb.position(bb.position() + 3 + 4 + 4) // resv + perm + resv
              val slots = (0 until 4).map(_ => u32(bb).toInt)
              v1dims = slots.take(ndims)
              off
            case 2 => u32(bb).toInt
            case 3 => // minimal bytes that can hold the compound's size
              val offBytes =
                math.max(1, (32 - Integer.numberOfLeadingZeros(size) + 7) / 8)
              readUIntN(bb, offBytes).toInt
            case v =>
              throw new UnsupportedOperationException(s"compound datatype v$v")
          }
          val mdt0 = parseDatatype(bb)
          val mdt =
            if (v1dims.isEmpty) mdt0
            else mdt0 match {
              case b @ (_: Fixed | _: Flt) => ArrayT(b, v1dims)
              case other => throw new UnsupportedOperationException(
                s"v1 array compound member '$name' over $other not supported")
            }
          mdt match {
            // ArrayT's base is already restricted to Fixed/Flt by the
            // class-10 parse and the v1 normalization above
            case _: Fixed | _: Flt | Str(_) | VlenStr | _: Compound |
                 _: ArrayT => ()
            case other => throw new UnsupportedOperationException(
              s"compound member '$name' type $other (flat scalar members only)")
          }
          Member(name, offset, mdt)
        }
        // nested compounds flatten to dotted member names with absolute
        // offsets (h5py's structured-dtype view of 'a.b'); the inner
        // compound arrived already flat from its own recursive parse
        val flat = members.flatMap {
          case Member(n, off, Compound(_, subs)) =>
            subs.map(s => Member(s"$n.${s.name}", off + s.offset, s.dt))
          case m => Seq(m)
        }
        flat.foreach(m => require(m.offset + m.dt.size <= size,
          s"compound member '${m.name}' overruns the ${size}-byte element"))
        Compound(size, flat)
      case 8 => // enum: reads as its base integer type (h5py semantics)
        val nMembers = ((bits(1) & 0xFF) << 8) | (bits(0) & 0xFF)
        val base = parseDatatype(bb)
        base match {
          case _: Fixed => ()
          case other => throw new UnsupportedOperationException(
            s"enum base type $other not supported")
        }
        // skip the name list (v1/v2: NUL-terminated padded to 8; v3: bare)
        // and the value list — values decode through the base type
        (0 until nMembers).foreach { _ =>
          val start = bb.position()
          var end = start
          while (bb.get(end) != 0) end += 1
          val nameLen = end - start + 1
          bb.position(start + (if (version < 3) (nameLen + 7) & ~7 else nameLen))
        }
        bb.position(bb.position() + nMembers * base.size)
        base
      case 9 =>
        // unsupported FEATURE (not a malformed file): vlen sequences are
        // skippable as attributes, loud as dataset types
        if ((bits(0) & 0x0F) != 1)
          throw new UnsupportedOperationException("only vlen STRINGS are supported")
        // consume the BASE datatype encoding that follows the vlen header
        // so sequential parses (compound members) stay position-correct
        parseDatatype(bb)
        VlenStr
      case 10 => // array: per-element fixed dims, then the base datatype
        val ndims = u8(bb)
        if (version == 2) bb.position(bb.position() + 3) // reserved
        val adims = (0 until ndims).map(_ => u32(bb).toInt)
        if (version == 2) bb.position(bb.position() + 4 * ndims) // permutation
        val base = parseDatatype(bb)
        base match {
          case _: Fixed | _: Flt => ()
          case other => throw new UnsupportedOperationException(
            s"array datatype over $other not supported")
        }
        require(size == base.size * adims.product,
          s"array datatype size $size != ${base.size}x${adims.mkString("x")}")
        ArrayT(base, adims)
      case 7 =>
        // reference: bits 0-3 = rtype. 0 (H5R_OBJECT, an 8-byte
        // object-header address into this file), 1 (H5R_DATASET_REGION,
        // a 12-byte global-heap handle whose heap object carries the
        // target address + a serialized selection), 2 (H5R_OBJECT2, the
        // HDF5 1.12 revised H5T_STD_REF object form — see ObjRef2),
        // 3 (H5R_DATASET_REGION2, the revised region form — see
        // RegionRef2) and 4 (H5R_ATTR, the revised attribute form —
        // see AttrRef2) are supported
        bits(0) & 0x0F match {
          case 0 =>
            require(size == 8, s"object reference size $size (8-byte offsets only)")
            ObjRef(size)
          case 1 =>
            require(size == 12,
              s"region reference size $size (8-byte address + 4-byte index only)")
            RegionRef(size)
          case 2 =>
            require(size == 18,
              s"revised object reference size $size (2-byte header + " +
                "4-byte blob size + 12-byte heap ID only)")
            ObjRef2(size)
          case 3 =>
            require(size == 18,
              s"revised region reference size $size (2-byte header + " +
                "4-byte blob size + 12-byte heap ID only)")
            RegionRef2(size)
          case 4 =>
            require(size == 18,
              s"revised attribute reference size $size (2-byte header + " +
                "4-byte blob size + 12-byte heap ID only)")
            AttrRef2(size)
          case rtype => throw new UnsupportedOperationException(
            s"reference datatype rtype $rtype not supported " +
              "(object rtype 0/2/3/4 and <=1.10 region rtype 1 only)")
        }
      case other =>
        throw new UnsupportedOperationException(s"datatype class $other not supported")
    }
  }

  /** Dataspace dims, maxdims (== dims when the file stores none), and
    * whether it is H5S_NULL (v2 type byte 2 — NO data elements on disk,
    * distinct from a rank-0 scalar). An unlimited maxdim is stored as
    * all-ones (`UNDEF`); callers use it to detect which dimension grows. */
  private def parseDataspaceFull(bb: ByteBuffer): (Seq[Long], Seq[Long], Boolean) = {
    val version = u8(bb)
    val rank = u8(bb)
    val flags = u8(bb)
    val isNull = version match {
      case 1 => bb.position(bb.position() + 5); false // reserved
      case 2 => u8(bb) == 2 // type: 0 scalar, 1 simple, 2 null
      case v => throw new UnsupportedOperationException(s"dataspace v$v")
    }
    val dims = (0 until rank).map(_ => u64(bb))
    // dims are unchecksummed in v1 headers: a corrupted dim must fail
    // loudly HERE, not wrap the element-count product to a small value
    // that downstream allocation guards would accept (a silently empty
    // or truncated read). After this check every consumer may trust
    // `dims.product` as a non-negative, non-wrapped Long.
    require(dims.forall(_ >= 0), s"negative dataspace dim in $dims")
    dims.foldLeft(1L) { (a, d) =>
      try math.multiplyExact(a, d)
      catch {
        case _: ArithmeticException => throw new IllegalArgumentException(
          s"dataspace dims $dims overflow the element count")
      }
    }
    val maxdims =
      if ((flags & 1) != 0) (0 until rank).map(_ => u64(bb)) else dims
    (dims, maxdims, isNull)
  }

  private def parseDataspace(bb: ByteBuffer): Seq[Long] = parseDataspaceFull(bb)._1

  // -------------------------------------------------------- object header --

  private case class Msg(mtype: Int, off: Int)

  /** Collect (type, body-offset) for every message, following continuations. */
  private def parseObjectHeader(bytes: Array[Byte], addr: Long): Seq[Msg] = {
    val isV2 = bytes.length >= addr + 4 &&
      new String(bytes.slice(addr.toInt, addr.toInt + 4), "ASCII") == "OHDR"
    if (isV2) parseOHv2(bytes, addr) else parseOHv1(bytes, bufAt(bytes, addr))
  }

  private def parseOHv1(bytes: Array[Byte], bb: ByteBuffer): Seq[Msg] = {
    val version = u8(bb)
    require(version == 1, s"object header v$version where v1 expected")
    u8(bb) // reserved
    val numMsgs = u16(bb)
    u32(bb) // reference count
    val blockSize = u32(bb)
    bb.position(bb.position() + 4) // pad to 8
    val msgs = mutable.ArrayBuffer.empty[Msg]
    // (start, size) blocks; continuations append more
    var blocks = List((bb.position().toLong, blockSize))
    while (msgs.size < numMsgs && blocks.nonEmpty) {
      val (start, size) = blocks.head
      blocks = blocks.tail
      val b = bufAt(bytes, start)
      val end = start + size
      while (msgs.size < numMsgs && b.position() + 8 <= end) {
        val t = u16(b)
        val sz = u16(b)
        u8(b); b.position(b.position() + 3) // flags + reserved
        val off = b.position()
        if (t == 0x10) { // continuation: u64 offset, u64 length
          val cb = bufAt(bytes, off.toLong)
          blocks = blocks :+ ((u64(cb), u64(cb)))
        } else msgs += Msg(t, off)
        b.position(off + sz)
      }
    }
    msgs.toSeq
  }

  private def parseOHv2(bytes: Array[Byte], addr: Long): Seq[Msg] = {
    val bb = bufAt(bytes, addr)
    sig(bb, "OHDR")
    require(u8(bb) == 2, "OHDR version must be 2")
    val flags = u8(bb)
    if ((flags & 0x20) != 0) bb.position(bb.position() + 16) // times
    if ((flags & 0x10) != 0) bb.position(bb.position() + 4) // phase change
    val chunkSize = (flags & 0x03) match {
      case 0 => u8(bb).toLong
      case 1 => u16(bb).toLong
      case 2 => u32(bb)
      case 3 => u64(bb)
    }
    val tracked = (flags & 0x04) != 0
    val msgs = mutable.ArrayBuffer.empty[Msg]
    var blocks = List((bb.position().toLong, chunkSize))
    while (blocks.nonEmpty) {
      val (start, size) = blocks.head
      blocks = blocks.tail
      val b = bufAt(bytes, start)
      val end = start + size
      var ok = true
      while (ok && b.position() + 4 <= end) {
        val t = u8(b)
        val sz = u16(b)
        u8(b) // flags
        if (tracked) u16(b)
        val off = b.position()
        if (off + sz > end) ok = false // gap/padding reached
        else {
          if (t == 0x10) {
            val cb = bufAt(bytes, off.toLong)
            val contAddr = u64(cb)
            val contLen = u64(cb)
            // OCHK continuation: 4-byte signature, checksum at the end
            blocks = blocks :+ ((contAddr + 4, contLen - 8))
          } else if (t != 0) msgs += Msg(t, off)
          b.position(off + sz)
        }
      }
    }
    msgs.toSeq
  }

  // ---------------------------------------------------------- group walks --

  private def heapString(bytes: Array[Byte], segAddr: Long, off: Long): String = {
    var i = (segAddr + off).toInt
    val sb = new StringBuilder
    while (bytes(i) != 0) { sb.append(bytes(i).toChar); i += 1 }
    sb.toString
  }

  /** A group entry. Soft links carry their in-file target path (resolved
    * to alias nodes after the walk); external links carry the target file
    * name + in-target object path, resolved through the caller's `resolve`
    * callback (marker nodes when unresolvable). */
  private sealed trait Link
  private case class HardLink(name: String, addr: Long) extends Link
  private case class SoftLink(name: String, target: String) extends Link
  private case class ExternalLink(name: String, file: String, objPath: String) extends Link

  /** Old-style group: symbol-table message -> B-tree v1 of SNOD nodes.
    * Symbolic entries (cache type 2) carry their target path's offset into
    * the local heap in the scratch area. */
  /** Dense link storage (Link Info message, 0x02): groups past the
    * compact-link threshold — e.g. an Eiger master whose data group holds
    * dozens of `data_00000N` external links — keep their link messages in a
    * fractal heap, name-indexed by a v2 B-tree of (hash, heap ID) records.
    * Enumeration walks the B-tree's records (the hash is ignored — we list,
    * never look up) and reads each link message straight out of the
    * heap — a single root direct block, or the doubling-table pyramid of
    * an indirect root at ANY depth (child indirect blocks recurse);
    * objects past the managed-size ceiling resolve through the
    * huge-object b-tree (filtered huge objects are each their own
    * filtered stream); filtered heaps decompress each direct block as
    * one stream, honoring per-block/per-object filter masks. Loud-fail
    * corners: tiny and directly-accessed-huge heap IDs (neither can
    * occur for link or attribute messages at these ID widths). */
  private def denseLinks(bytes: Array[Byte], off: Int): Seq[Link] = {
    val bb = bufAt(bytes, off.toLong)
    require(u8(bb) == 0, "link info version")
    val liFlags = u8(bb)
    if ((liFlags & 1) != 0) u64(bb) // max creation index
    val fheapAddr = u64(bb)
    val btreeAddr = u64(bb)
    if (fheapAddr == UNDEF || btreeAddr == UNDEF) return Nil // compact group
    val heap = fractalHeap(bytes, fheapAddr)

    // name-index v2 B-tree, type 5 = (name hash, heap ID), any depth
    val (_, _, recs) = btree2Records(bytes, btreeAddr, Set(5))
    recs.map { lb =>
      u32(lb) // name hash — enumeration doesn't need it
      val (buf, o) = heapObjectAt(bytes, heap, lb)
      linkChild(buf, o)
    }
  }

  /** Dense attribute storage (Attribute Info message, 0x15): objects past
    * the compact-attribute threshold keep their attribute messages in a
    * fractal heap, name-indexed by a v2 B-tree of type-8 records (8-byte
    * heap ID first, then message flags, creation order, name hash). Same
    * machinery as dense links. */
  private def denseAttrs(bytes: Array[Byte], off: Int): Seq[(String, String)] = {
    val bb = bufAt(bytes, off.toLong)
    require(u8(bb) == 0, "attribute info version")
    val aiFlags = u8(bb)
    if ((aiFlags & 1) != 0) u16(bb) // max creation index
    val fheapAddr = u64(bb)
    val btreeAddr = u64(bb)
    if (fheapAddr == UNDEF || btreeAddr == UNDEF) return Nil // compact
    val heap = fractalHeap(bytes, fheapAddr)
    val (_, _, recs) = btree2Records(bytes, btreeAddr, Set(8))
    recs.flatMap { rb =>
      val (buf, o) = heapObjectAt(bytes, heap, rb)
      parseAttribute(bytes, buf, o)
    }
  }

  /** `objectAt` maps a managed heap offset to (buffer, index): the file
    * bytes themselves for unfiltered heaps, or a decompressed direct-block
    * buffer for filtered heaps (where no file address exists for an
    * object — the block is one compressed stream on disk). `filters` is
    * the heap's pipeline; huge objects in a filtered heap are each their
    * own filtered stream. */
  private case class FHeap(objectAt: Long => (Array[Byte], Int), offSize: Int,
      lenSize: Int, heapIdLen: Int, hugeBtree: Long,
      filters: Seq[H5Filter] = Nil)

  /** Resolve an object ID from a fractal heap's huge-object v2 B-tree.
    * Link/attr heaps use the fixed 8-byte heap-ID form, too small to embed
    * an (address, length) pair, so libhdf5 always stores their huge
    * objects INDIRECTLY: record type 1 (address + length + ID, stored
    * bare) for unfiltered heaps, type 2 (address + filtered length +
    * filter mask + memory size + ID, one filtered stream per object) for
    * filtered ones — the ID field is what makes a record indirect; the
    * B-tree maps the sequential ID the heap ID carries to the object's
    * location. A nonzero per-object filter mask marks pipeline
    * stages skipped at write time (an optional filter that grew the
    * data) and disables exactly those stages, as on chunks. Types 3/4
    * (directly accessed — the heap ID itself carries address + length,
    * needing ≥17 ID bytes, and the record carries no ID field) stay
    * loud-fail via the expected-type check; see [[heapObjectAt]]. */
  private def hugeObjectAt(bytes: Array[Byte], heap: FHeap,
      id: Long): (Array[Byte], Int) = {
    require(heap.hugeBtree != UNDEF, "huge heap ID with no huge-object b-tree")
    val expected = if (heap.filters.isEmpty) 1 else 2
    val (_, _, recs) = btree2Records(bytes, heap.hugeBtree, Set(expected))
    recs.collectFirst(Function.unlift { rb =>
      if (expected == 1) {
        val a = u64(rb)
        u64(rb) // length — the stored messages are self-delimiting
        if (u64(rb) == id) Some((bytes, a.toInt)) else None
      } else {
        val a = u64(rb)
        val filtLen = u64(rb)
        val mask = u32(rb)
        val memSize = u64(rb)
        if (u64(rb) != id) None
        else {
          val active = heap.filters.zipWithIndex.collect {
            case (f, i) if (mask & (1L << i)) == 0 => f
          }
          Some((defilter(bytes.slice(a.toInt, (a + filtLen).toInt),
            memSize.toInt, active, 1), 0))
        }
      }
    }).getOrElse(
      throw new IllegalArgumentException(s"huge heap object $id not indexed"))
  }

  /** Read a (managed or huge) heap ID at the buffer position and return the
    * object's location as (buffer, index). */
  private def heapObjectAt(bytes: Array[Byte], heap: FHeap,
      rb: ByteBuffer): (Array[Byte], Int) = {
    val idFlags = u8(rb)
    require((idFlags & 0xC0) == 0, "fractal heap ID version")
    (idFlags >> 4) & 3 match {
      case 0 => // managed: offset into the heap's block space
        val objOff = readUIntN(rb, heap.offSize)
        readUIntN(rb, heap.lenSize) // length; stored messages self-delimit
        heap.objectAt(objOff)
      case 1 => // huge
        // libhdf5 embeds (address, length) in the heap ID itself —
        // "directly accessed", B-tree record types 3/4 — only when the ID
        // is wide enough (≥ 1+8+8 bytes unfiltered, ≥ 1+8+8+4+8
        // filtered). Link/attr heaps fix the ID at 8 bytes, so their huge
        // objects are always INDIRECT: the ID bytes hold a sequential
        // huge-object ID resolved through the type-1/2 B-tree.
        val directLen = 1 + 8 + 8 + (if (heap.filters.isEmpty) 0 else 4 + 8)
        require(heap.heapIdLen < directLen,
          s"directly-accessed huge heap ID (${heap.heapIdLen}-byte IDs)")
        hugeObjectAt(bytes, heap, readUIntN(rb, heap.heapIdLen - 1))
      case t =>
        throw new UnsupportedOperationException(s"tiny heap ID type $t")
    }
  }

  /** Fractal heap header -> heap-ID field widths and an offset→location
    * mapper. Root = one direct block (curRows 0), or a root indirect block
    * whose rows of width `tableWidth` point at direct blocks via the
    * doubling table (row sizes S, S, 2S, 4S, …), with child indirect
    * blocks recursing at any depth. FILTERED heaps (NeXus groups with
    * compressed link-name heaps): the header carries the pipeline and
    * each direct block is ONE filtered stream — decompressed through the
    * shared `defilter` chain and cached, objects then read out of the
    * decompressed buffer. Partially-applied filters (nonzero per-block
    * filter mask — an optional stage skipped at write time) disable
    * exactly the masked stages, as on chunks. */
  private def fractalHeap(bytes: Array[Byte], fheapAddr: Long): FHeap = {
    val hb = bufAt(bytes, fheapAddr)
    sig(hb, "FRHP")
    require(u8(hb) == 0, "fractal heap version")
    val heapIdLen = u16(hb)
    val filterLen = u16(hb)
    u8(hb) // heap flags (checksum bits affect only writes we don't do)
    val maxManSize = u32(hb)
    u64(hb) // next huge object id
    val hugeBtree = u64(hb)
    (0 until 10).foreach(_ => u64(hb)) // free/managed/iterator/tiny stats
    val tableWidth = u16(hb)
    val startBlockSize = u64(hb)
    val maxDirectSize = u64(hb)
    val maxHeapBits = u16(hb)
    u16(hb) // starting rows in root indirect block
    val rootAddr = u64(hb)
    val curRows = u16(hb)
    // filtered heap: filtered-root-direct-block size + filter mask +
    // the encoded Filter Pipeline message (H5HF__hdr_decode order)
    val (rootFilteredSize, rootFilterMask, filters) =
      if (filterLen == 0) (0L, 0L, Seq.empty[H5Filter])
      else {
        val sz = u64(hb)
        val mask = u32(hb)
        (sz, mask, parseFilters(bytes, hb.position()))
      }
    require(rootAddr != UNDEF, "fractal heap with no root block")
    val offSize = (maxHeapBits + 7) / 8
    val lenSize = math.min(offSize, (64 - java.lang.Long.numberOfLeadingZeros(
      math.max(maxManSize, 1L)) + 7) / 8)

    // decompress-once cache: a direct block is one filtered stream whose
    // unfiltered size is its doubling-table block size; a nonzero
    // per-block filter mask disables the stages an optional filter
    // skipped at write time (same semantics as chunk masks)
    val blockCache = mutable.Map.empty[Long, Array[Byte]]
    def directBlock(addr: Long, filtSize: Long, blockSize: Long,
        mask: Long): Array[Byte] =
      blockCache.getOrElseUpdate(addr, {
        require(filtSize > 0, "filtered direct block with no stored size")
        val active = filters.zipWithIndex.collect {
          case (f, i) if (mask & (1L << i)) == 0 => f
        }
        val out = defilter(bytes.slice(addr.toInt, (addr + filtSize).toInt),
          blockSize.toInt, active, 1)
        sig(bufAt(out, 0L), "FHDB")
        out
      })

    def log2(x: Long): Int = 63 - java.lang.Long.numberOfLeadingZeros(x)
    val objectAt: Long => (Array[Byte], Int) =
      if (curRows == 0) {
        if (filters.isEmpty) {
          sig(bufAt(bytes, rootAddr), "FHDB")
          off => (bytes, (rootAddr + off).toInt)
        } else {
          off => (directBlock(rootAddr, rootFilteredSize, startBlockSize,
            rootFilterMask), off.toInt)
        }
      } else {
        // Doubling-table pyramid, any depth. Rows 0..maxDirectRows-1 of an
        // indirect block hold direct blocks (sizes S, S, 2S, 4S, …); rows
        // past that hold CHILD indirect blocks. A child hanging off row u
        // spans rowSize(u) = S*2^(u-1) of heap offset space and restarts
        // the row sequence at S internally, so its row count solves
        // W*S*2^(n-1) = S*2^(u-1): n = u - log2(W) (libhdf5
        // H5HF_dtable_size_to_rows).
        val maxDirectRows = (log2(maxDirectSize) - log2(startBlockSize) + 2).toInt
        val log2W = 31 - Integer.numberOfLeadingZeros(tableWidth)
        def rowSize(r: Int): Long =
          if (r < 2) startBlockSize else startBlockSize << (r - 1)
        // entry = (address, filtered size, filter mask): filtered heaps
        // store (addr, size, mask) for DIRECT-block entries — child
        // indirect entries and unfiltered heaps store the address alone
        val entryCache = mutable.Map.empty[Long, IndexedSeq[(Long, Long, Long)]]
        def entries(ibAddr: Long, nrows: Int): IndexedSeq[(Long, Long, Long)] =
          entryCache.getOrElseUpdate(ibAddr, {
            val ib = bufAt(bytes, ibAddr)
            sig(ib, "FHIB")
            require(u8(ib) == 0, "fractal heap indirect block version")
            u64(ib) // heap header back-pointer
            readUIntN(ib, offSize) // block offset
            (0 until nrows * tableWidth).map { e =>
              val a = u64(ib)
              val (fsz, mask) =
                if (filters.nonEmpty && e / tableWidth < maxDirectRows)
                  (u64(ib), u32(ib))
                else (0L, 0L)
              (a, fsz, mask)
            }.toIndexedSeq
          })
        def locateIn(ibAddr: Long, ibStart: Long, nrows: Int,
            off: Long): (Array[Byte], Int) = {
          val addrs = entries(ibAddr, nrows)
          var r = 0
          var rowStart = ibStart
          while (rowStart + tableWidth * rowSize(r) <= off) {
            rowStart += tableWidth * rowSize(r); r += 1
          }
          require(r < nrows, s"heap offset $off beyond indirect-block rows")
          val idx = ((off - rowStart) / rowSize(r)).toInt
          val (addr, fsz, mask) = addrs(r * tableWidth + idx)
          require(addr != UNDEF, "object in unallocated fractal-heap block")
          val entryStart = rowStart + idx * rowSize(r)
          if (r >= maxDirectRows) locateIn(addr, entryStart, r - log2W, off)
          else if (filters.isEmpty) (bytes, (addr + (off - entryStart)).toInt)
          else (directBlock(addr, fsz, rowSize(r), mask),
            (off - entryStart).toInt)
        }
        off => locateIn(rootAddr, 0L, curRows, off)
      }
    FHeap(objectAt, offSize, lenSize, heapIdLen, hugeBtree, filters)
  }

  private def childrenV0(bytes: Array[Byte], stabOff: Int): Seq[Link] = {
    val bb = bufAt(bytes, stabOff.toLong)
    val btreeAddr = u64(bb)
    val heapAddr = u64(bb)
    val hb = bufAt(bytes, heapAddr)
    sig(hb, "HEAP")
    hb.position(hb.position() + 4) // version + reserved
    u64(hb) // data segment size
    u64(hb) // free list head
    val segAddr = u64(hb)

    def walkBtree(addr: Long): Seq[Long] = {
      val nb = bufAt(bytes, addr)
      sig(nb, "TREE")
      val nodeType = u8(nb)
      require(nodeType == 0, s"group B-tree expected, node type $nodeType")
      val level = u8(nb)
      val used = u16(nb)
      u64(nb); u64(nb) // siblings
      val kids = (0 until used).map { _ =>
        u64(nb) // key i (smallest name in child i — unused, SNODs are read whole)
        u64(nb) // child i
      }
      if (level == 0) kids else kids.flatMap(walkBtree)
    }

    walkBtree(btreeAddr).flatMap { snodAddr =>
      val sb = bufAt(bytes, snodAddr)
      sig(sb, "SNOD")
      u8(sb); u8(sb) // version + reserved
      val n = u16(sb)
      (0 until n).map { _ =>
        val nameOff = u64(sb)
        val ohAddr = u64(sb)
        val cacheType = u32(sb)
        u32(sb) // reserved
        val scratch = take(sb, 16)
        val name = heapString(bytes, segAddr, nameOff)
        if (cacheType == 2L) {
          val linkOff = ByteBuffer.wrap(scratch).order(ByteOrder.LITTLE_ENDIAN)
            .getInt & 0xFFFFFFFFL
          SoftLink(name, heapString(bytes, segAddr, linkOff))
        } else HardLink(name, ohAddr)
      }
    }
  }

  /** New-style compact group: link messages in the object header.
    * Types: 0 = hard, 1 = soft (length-prefixed target path), 64 =
    * external (version/flags byte + file name and object path, both
    * NUL-terminated). Anything else fails loudly. */
  private def linkChild(bytes: Array[Byte], off: Int): Link = {
    val bb = bufAt(bytes, off.toLong)
    val version = u8(bb)
    require(version == 1, s"link message v$version")
    val flags = u8(bb)
    val linkType = if ((flags & 0x08) != 0) u8(bb) else 0
    if ((flags & 0x04) != 0) u64(bb) // creation order
    if ((flags & 0x10) != 0) u8(bb) // charset
    val nameLen = (flags & 0x03) match {
      case 0 => u8(bb).toLong
      case 1 => u16(bb).toLong
      case 2 => u32(bb)
      case 3 => u64(bb)
    }
    val name = new String(take(bb, nameLen.toInt), "UTF-8")
    linkType match {
      case 0 => HardLink(name, u64(bb))
      case 1 =>
        val len = u16(bb)
        SoftLink(name, new String(take(bb, len), "UTF-8"))
      case 64 =>
        val len = u16(bb)
        val blob = take(bb, len)
        val body = blob.drop(1) // version/flags byte
        val nul = body.indexOf(0.toByte)
        val file =
          if (nul < 0) new String(body, "UTF-8")
          else new String(body, 0, nul, "UTF-8")
        val objPath =
          if (nul < 0) ""
          else new String(body.drop(nul + 1).takeWhile(_ != 0), "UTF-8")
        ExternalLink(name, file, objPath)
      case t =>
        throw new UnsupportedOperationException(s"link type $t not supported")
    }
  }

  // ------------------------------------------------------------ raw bytes --

  private def readContiguous(bytes: Array[Byte], off: Int): Option[Array[Byte]] = {
    val bb = bufAt(bytes, off.toLong)
    val addr = u64(bb)
    val size = u64(bb)
    if (addr == UNDEF) None
    else Some(bytes.slice(addr.toInt, (addr + size).toInt))
  }

  private def inflate(data: Array[Byte], outSize: Int): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(data)
    val out = new Array[Byte](outSize)
    var n = 0
    var stalled = false
    while (!stalled && !inf.finished() && n < outSize) {
      val k = inf.inflate(out, n, outSize - n)
      // a 0 return with exhausted input = truncated stream; without this
      // guard the loop would spin forever instead of failing
      if (k == 0 && (inf.needsInput() || inf.needsDictionary())) stalled = true
      n += k
    }
    inf.end()
    require(n == outSize,
      s"deflate stream produced $n of $outSize bytes (truncated or corrupt chunk)")
    out
  }

  // ------------------------------------------------------------- filters ---

  /** The filter pipeline entries this reader understands. Order matters:
    * filters were applied left-to-right on write, so decode folds right-to-
    * left. */
  private sealed trait H5Filter
  private case object Deflate extends H5Filter
  private case class Shuffle(esz: Int) extends H5Filter // id 2: byte transpose
  private case object Fletcher32 extends H5Filter // id 3: trailing checksum
  private case object Lz4 extends H5Filter // HDF5Plugin id 32004
  private case class Bitshuffle(blockElems: Int, lz4: Boolean) extends H5Filter // id 32008
  private case object Zstd extends H5Filter // HDF5Plugin id 32015: one raw frame

  /** Undo one chunk's filter chain (reverse of write order). The expected
    * size after undoing stage i is the stream size BEFORE stage i ran on
    * write: the unfiltered chunk plus 4 bytes for every fletcher32
    * checksum added by an earlier write stage — netCDF places fletcher32
    * BEFORE deflate, h5py after, and both orders are valid. */
  private def defilter(
      raw: Array[Byte], outSize: Int, filters: Seq[H5Filter],
      elemSize: Int): Array[Byte] = {
    // The per-stage target sizes below assume exactly one size-changing
    // compression stage (fletcher32's +4 per checksum is accounted for
    // separately). Two stacked compressors are legal HDF5 (e.g. deflate
    // then zstd) but the intermediate stream size between them is not
    // recorded anywhere in the file — reject the chain by name rather
    // than fail later with a misleading length error.
    val compressors = filters.collect {
      case Deflate => "deflate"
      case Lz4 => "lz4"
      case Zstd => "zstd"
      case Bitshuffle(_, true) => "bitshuffle+lz4"
    }
    require(compressors.size <= 1,
      s"filter chain stacks ${compressors.size} compressors " +
        s"(${compressors.mkString(" then ")}); only one compression " +
        "stage per chain is supported")
    val target = filters.indices.map(i =>
      outSize + 4 * filters.take(i).count(_ == Fletcher32))
    filters.indices.reverse.foldLeft(raw) { (data, i) =>
      filters(i) match {
        case Deflate => inflate(data, target(i))
        case Shuffle(esz) =>
          // libhdf5 trusts the filter's recorded element size (cd_values
          // 0) over the datatype's; 0 = not recorded, fall back
          unshuffle(data, if (esz > 0) esz else elemSize)
        case Fletcher32 => fletcherStrip(data)
        case Lz4 => lz4Defilter(data, target(i))
        case Bitshuffle(blockElems, lz4) =>
          bitshuffleDefilter(data, target(i), elemSize, blockElems, lz4)
        case Zstd =>
          val out = com.github.luben.zstd.Zstd.decompress(data, target(i))
          require(out.length == target(i),
            s"zstd filter produced ${out.length} of ${target(i)} bytes")
          out
      }
    }
  }

  /** Undo the byte-transpose shuffle (filter 2): the filtered stream holds
    * every element's byte 0, then every byte 1, ...; bytes past the last
    * whole element are stored unshuffled. */
  private[sources] def unshuffle(data: Array[Byte], elemSize: Int): Array[Byte] = {
    if (elemSize <= 1) return data
    val n = data.length / elemSize
    val out = new Array[Byte](data.length)
    var src = 0
    var j = 0
    while (j < elemSize) {
      var i = 0
      while (i < n) { out(i * elemSize + j) = data(src); src += 1; i += 1 }
      j += 1
    }
    System.arraycopy(data, n * elemSize, out, n * elemSize,
      data.length - n * elemSize)
    out
  }

  /** Verify and strip the trailing little-endian fletcher-32 checksum
    * (filter 3). A mismatch is data corruption — loud. */
  private[sources] def fletcherStrip(data: Array[Byte]): Array[Byte] = {
    require(data.length >= 4, "fletcher32 chunk shorter than its checksum")
    val payload = java.util.Arrays.copyOfRange(data, 0, data.length - 4)
    val stored = ByteBuffer.wrap(data, data.length - 4, 4)
      .order(ByteOrder.LITTLE_ENDIAN).getInt.toLong & 0xFFFFFFFFL
    val computed = fletcher32(payload)
    require(computed == stored,
      f"fletcher32 mismatch: computed $computed%08x != stored $stored%08x")
    payload
  }

  /** HDF5's modified fletcher-32 (the public H5checksum algorithm):
    * big-endian 16-bit words, 360-word overflow blocks, an odd trailing
    * byte as the word's high half, double end-fold. */
  private[sources] def fletcher32(data: Array[Byte]): Long = {
    var sum1 = 0L
    var sum2 = 0L
    var i = 0
    var words = data.length / 2
    while (words > 0) {
      var tlen = math.min(360, words)
      words -= tlen
      while (tlen > 0) {
        sum1 += (((data(i) & 0xFF) << 8) | (data(i + 1) & 0xFF)).toLong
        i += 2
        sum2 += sum1
        tlen -= 1
      }
      sum1 = (sum1 & 0xFFFF) + (sum1 >> 16)
      sum2 = (sum2 & 0xFFFF) + (sum2 >> 16)
    }
    if (data.length % 2 == 1) {
      sum1 += (data(i) & 0xFF).toLong << 8
      sum2 += sum1
      sum1 = (sum1 & 0xFFFF) + (sum1 >> 16)
      sum2 = (sum2 & 0xFFFF) + (sum2 >> 16)
    }
    sum1 = (sum1 & 0xFFFF) + (sum1 >> 16)
    sum2 = (sum2 & 0xFFFF) + (sum2 >> 16)
    ((sum2 & 0xFFFF) << 16) | (sum1 & 0xFFFF)
  }

  private lazy val lz4Dec = net.jpountz.lz4.LZ4Factory.fastestInstance().fastDecompressor()

  /** HDF5Plugin LZ4 filter (32004) stream: big-endian i64 total size,
    * big-endian i32 block size, then per block a big-endian i32 stored size
    * + payload (stored raw when the size equals the uncompressed size). */
  private[sources] def lz4Defilter(data: Array[Byte], outSize: Int): Array[Byte] = {
    val bb = ByteBuffer.wrap(data).order(ByteOrder.BIG_ENDIAN)
    val total = bb.getLong
    require(total == outSize, s"lz4 filter total $total != chunk $outSize")
    val blockSize = bb.getInt
    require(blockSize > 0, "lz4 filter block size must be positive")
    val out = new Array[Byte](outSize)
    var done = 0
    while (done < outSize) {
      val uncomp = math.min(blockSize, outSize - done)
      val csize = bb.getInt
      if (csize == uncomp) {
        bb.get(out, done, uncomp) // stored raw (lz4 would have expanded it)
      } else {
        val read = lz4Dec.decompress(data, bb.position(), out, done, uncomp)
        require(read == csize, s"lz4 block consumed $read of $csize bytes")
        bb.position(bb.position() + csize)
      }
      done += uncomp
    }
    out
  }

  /** Undo the bitshuffle bit transpose for one block of `nElems` elements.
    * Layout (scalar reference algorithm: byte-plane transpose, 8x8 bit
    * transpose, bit-row regroup): for byte j of the little-endian element,
    * for bit b (LSB first), a plane of nElems/8 bytes whose k-th byte packs
    * bit b of byte j of elements 8k..8k+7, element 8k+i at bit i. */
  private def unbitshuffle(
      data: Array[Byte], dataOff: Int, out: Array[Byte], outOff: Int,
      nElems: Int, elemSize: Int): Unit = {
    val packs = nElems / 8
    var j = 0
    while (j < elemSize) {
      var b = 0
      while (b < 8) {
        val planeOff = dataOff + (j * 8 + b) * packs
        var k = 0
        while (k < packs) {
          val v = data(planeOff + k)
          if (v != 0) {
            var i = 0
            while (i < 8) {
              if (((v >> i) & 1) != 0) {
                val p = outOff + (8 * k + i) * elemSize + j
                out(p) = (out(p) | (1 << b)).toByte
              }
              i += 1
            }
          }
          k += 1
        }
        b += 1
      }
      j += 1
    }
  }

  /** Bitshuffle filter (32008). With internal LZ4 (cd_values[4] == 2) the
    * stream is: big-endian u64 total bytes, big-endian u32 block size in
    * BYTES, then per block a big-endian u32 compressed size + LZ4 data.
    * Without compression the stream is the blocked bit transpose laid out
    * back to back (block size from cd_values). Blocks hold `blockElems`
    * elements; the final sub-block rounds the remainder down to a multiple
    * of 8 elements, and any last `n % 8` elements travel raw at the end. */
  private[sources] def bitshuffleDefilter(
      data: Array[Byte], outSize: Int, elemSize: Int, cdBlockElems: Int,
      lz4: Boolean): Array[Byte] = {
    val out = new Array[Byte](outSize)
    val totalElems = outSize / elemSize
    require(totalElems * elemSize == outSize, "chunk not a whole number of elements")

    if (lz4) {
      val bb = ByteBuffer.wrap(data).order(ByteOrder.BIG_ENDIAN)
      val total = bb.getLong
      require(total == outSize, s"bitshuffle total $total != chunk $outSize")
      val blockBytes = bb.getInt
      require(blockBytes > 0 && blockBytes % elemSize == 0, s"block bytes $blockBytes")
      val blockElems = blockBytes / elemSize
      // the library forces block sizes to multiples of 8 elements
      // (BSHUF_BLOCKED_MULT); anything else would silently zero each
      // block's trailing nElems % 8 elements in unbitshuffle
      require(blockElems % 8 == 0, s"bitshuffle block of $blockElems elements")
      var pos = 0
      def decodeBlock(nElems: Int): Unit = {
        val nBytes = nElems * elemSize
        val csize = bb.getInt
        val tmp = new Array[Byte](nBytes)
        val read = lz4Dec.decompress(data, bb.position(), tmp, 0, nBytes)
        require(read == csize, s"bitshuffle lz4 block consumed $read of $csize")
        bb.position(bb.position() + csize)
        unbitshuffle(tmp, 0, out, pos * elemSize, nElems, elemSize)
        pos += nElems
      }
      while (totalElems - pos >= blockElems) decodeBlock(blockElems)
      val sub = (totalElems - pos) & ~7
      if (sub > 0) decodeBlock(sub)
      if (pos < totalElems) bb.get(out, pos * elemSize, (totalElems - pos) * elemSize)
    } else {
      require(cdBlockElems > 0,
        "bitshuffle without internal lz4 needs an explicit block size " +
          "(cd_values[3]); the library default heuristic is not replicated")
      require(cdBlockElems % 8 == 0, s"bitshuffle block of $cdBlockElems elements")
      var pos = 0
      var off = 0
      def decodeBlock(nElems: Int): Unit = {
        unbitshuffle(data, off, out, pos * elemSize, nElems, elemSize)
        off += nElems * elemSize
        pos += nElems
      }
      while (totalElems - pos >= cdBlockElems) decodeBlock(cdBlockElems)
      val sub = (totalElems - pos) & ~7
      if (sub > 0) decodeBlock(sub)
      if (pos < totalElems)
        System.arraycopy(data, off, out, pos * elemSize, (totalElems - pos) * elemSize)
    }
    out
  }

  /** One stored chunk: grid offsets (elements), file address, stored byte
    * count, per-chunk filter mask (bit i set = filter i skipped). */
  private case class ChunkRef(
      offsets: Seq[Long], addr: Long, nbytes: Int, filterMask: Long)

  private def readUIntN(bb: ByteBuffer, n: Int): Long = {
    var v = 0L
    var i = 0
    while (i < n) { v |= (u8(bb).toLong << (8 * i)); i += 1 }
    v
  }

  /** Stitch decoded chunks into one row-major buffer, clipping padded edge
    * chunks; shared by the v1-B-tree and every v4 chunk-index path. */
  private def assembleChunks(
      bytes: Array[Byte], chunks: Seq[ChunkRef], dims: Seq[Long],
      chunkDims: Seq[Int], elemSize: Int, filters: Seq[H5Filter],
      dontFilterEdges: Boolean): Array[Byte] = {
    val rank = dims.length
    // Long math + single-buffer bound (as on the VDS path): Int overflow
    // on a corrupted dims product must not wrap to a small positive
    // allocation that the stitch loop then silently under-fills
    val totalL = dims.product * elemSize
    require(totalL >= 0 && totalL <= Int.MaxValue - 16,
      s"chunked dataset claims $totalL bytes (> single-buffer bound)")
    val total = totalL.toInt
    val out = new Array[Byte](total)
    val chunkBytes = chunkDims.product * elemSize

    def isEdge(offsets: Seq[Long]): Boolean =
      offsets.indices.exists(i => offsets(i) + chunkDims(i) > dims(i))

    chunks.foreach { c =>
      if (c.addr != UNDEF) {
        val raw0 = bytes.slice(c.addr.toInt, c.addr.toInt + c.nbytes)
        // per-chunk mask bit i set = pipeline filter i skipped for this chunk
        val active =
          if (dontFilterEdges && isEdge(c.offsets)) Nil
          else filters.zipWithIndex.collect {
            case (f, i) if (c.filterMask & (1L << i)) == 0 => f
          }
        val raw = defilter(raw0, chunkBytes, active, elemSize)
        val offsets = c.offsets.map(_.toInt)
        // supports rank 1 and 2 (scalars/vectors/images — the MOUSE surface)
        rank match {
          case 1 =>
            val n = math.min(chunkDims(0), (dims(0) - offsets(0)).toInt)
            System.arraycopy(raw, 0, out, offsets(0) * elemSize, n * elemSize)
          case 2 =>
            val h = math.min(chunkDims(0), (dims(0) - offsets(0)).toInt)
            val w = math.min(chunkDims(1), (dims(1) - offsets(1)).toInt)
            for (r <- 0 until h) {
              val src = r * chunkDims(1) * elemSize
              val dst = ((offsets(0) + r) * dims(1).toInt + offsets(1)) * elemSize
              System.arraycopy(raw, src, out, dst, w * elemSize)
            }
          case r =>
            throw new UnsupportedOperationException(s"chunked rank $r not supported")
        }
      }
    }
    out
  }

  /** Chunked layout v3: walk the v1 raw-data B-tree, inflate if filtered,
    * and stitch chunks into a row-major buffer. */
  private def readChunked(
      bytes: Array[Byte], off: Int, dims: Seq[Long], elemSize: Int,
      filters: Seq[H5Filter]): Option[Array[Byte]] = {
    val bb = bufAt(bytes, off.toLong)
    val ndims = u8(bb) // rank + 1
    val rank = ndims - 1
    require(rank == dims.length, s"chunk rank $rank != dataspace rank ${dims.length}")
    val btreeAddr = u64(bb)
    val chunkDims = (0 until rank).map(_ => u32(bb).toInt)
    u32(bb) // element size (trailing chunk dim)
    if (btreeAddr == UNDEF) return None

    val chunks = mutable.ArrayBuffer.empty[ChunkRef]
    def visit(addr: Long): Unit = {
      val nb = bufAt(bytes, addr)
      sig(nb, "TREE")
      require(u8(nb) == 1, "raw-data B-tree expected")
      val level = u8(nb)
      val used = u16(nb)
      u64(nb); u64(nb)
      (0 until used).foreach { _ =>
        val nbytes = u32(nb).toInt
        val mask = u32(nb)
        val offsets = (0 until rank).map(_ => u64(nb))
        u64(nb) // element offset
        val child = u64(nb)
        if (level > 0) visit(child)
        else chunks += ChunkRef(offsets, child, nbytes, mask)
      }
    }
    visit(btreeAddr)
    Some(assembleChunks(bytes, chunks.toSeq, dims, chunkDims, elemSize,
      filters, dontFilterEdges = false))
  }

  /** Chunked layout v4 (superblock v3 era — what recent libhdf5 writes and
    * Eiger detector files use): chunk dims stored in elements (no trailing
    * datatype-size dim), followed by one of five index types, all
    * supported: Single Chunk (1), Implicit (2), Fixed Array (3) for fixed
    * maximum dimensions; Extensible Array (4) for one unlimited dimension
    * (append-mode detector stacks); v2 B-tree (5), any depth, for
    * several, any depth. */
  private def readChunkedV4(
      bytes: Array[Byte], off: Int, dims: Seq[Long], maxdims: Seq[Long],
      elemSize: Int, filters: Seq[H5Filter]): Option[Array[Byte]] = {
    val bb = bufAt(bytes, off.toLong)
    val flags = u8(bb)
    val ndims = u8(bb) // rank + 1, as in v3
    val rank = ndims - 1
    require(rank == dims.length, s"chunk rank $rank != dataspace rank ${dims.length}")
    val encLen = u8(bb)
    val chunkDims = (0 until rank).map(_ => readUIntN(bb, encLen).toInt)
    val idxType = u8(bb)
    // overflow-safe: a corrupted chunk dim must not wrap the byte count
    // to a small positive value (Int products wrap silently)
    val chunkBytes = {
      val b = chunkDims.foldLeft(elemSize.toLong)((a, d) =>
        math.multiplyExact(a, d.toLong))
      require(b > 0 && b <= Int.MaxValue, s"chunk of $b bytes")
      b.toInt
    }
    val dontFilterEdges = (flags & 0x01) != 0

    // chunk-grid shape, row-major enumeration order. NOTE the grid-cell
    // count is NOT bounded by the file length in general: sparse chunked
    // datasets legally have millions of unwritten cells (addr UNDEF /
    // absent records) occupying zero file bytes — per-index-type bounds
    // live where a cell-count-sized materialization actually happens.
    val gridDims = dims.indices.map { i =>
      val g = (dims(i) + chunkDims(i) - 1) / chunkDims(i)
      require(g >= 0 && g <= Int.MaxValue, s"chunk grid dim $g")
      g.toInt
    }
    val nChunks = {
      val n = gridDims.foldLeft(1L)((a, g) => math.multiplyExact(a, g.toLong))
      require(n <= Int.MaxValue, s"$n chunk-grid cells")
      n.toInt
    }
    def gridOffsets(i: Int): Seq[Long] = {
      var rem = i
      val out = new Array[Long](rank)
      var d = rank - 1
      while (d >= 0) {
        out(d) = (rem % gridDims(d)).toLong * chunkDims(d)
        rem /= gridDims(d)
        d -= 1
      }
      out.toSeq
    }

    val chunks: Seq[ChunkRef] = idxType match {
      case 1 => // Single Chunk: the dataset is exactly one chunk
        val (nbytes, mask) =
          if ((flags & 0x02) != 0) (u64(bb).toInt, u32(bb)) // filtered: size+mask
          else (chunkBytes, 0L)
        val addr = u64(bb)
        if (addr == UNDEF) return None
        Seq(ChunkRef(Seq.fill(rank)(0L), addr, nbytes, mask))

      case 2 => // Implicit: unfiltered chunks laid contiguously in grid order
        val addr = u64(bb)
        if (addr == UNDEF) return None
        // implicit layout stores EVERY grid cell contiguously, so here —
        // and only here — the file's own length bounds the cell count
        require(nChunks.toLong * chunkBytes <= bytes.length,
          s"$nChunks implicit chunks of $chunkBytes bytes in a " +
            s"${bytes.length}-byte file")
        (0 until nChunks).map(i =>
          ChunkRef(gridOffsets(i), addr + i.toLong * chunkBytes, chunkBytes, 0L))

      case 3 => // Fixed Array: FAHD header -> FADB data block of elements
        u8(bb) // page bits (from the layout message; the header repeats it)
        val addr = u64(bb)
        if (addr == UNDEF) return None
        readFixedArray(bytes, addr, nChunks, chunkBytes).map { case (a, n, m) =>
          ChunkRef(Seq.empty, a, n, m)
        }.zipWithIndex.map { case (c, i) => c.copy(offsets = gridOffsets(i)) }

      case 4 => // Extensible Array: EAHD -> EAIB (+EASB/EADB) elements
        // libhdf5 swizzles chunk coordinates so the single unlimited
        // dimension becomes the SLOWEST-varying before linearizing
        // (H5Dearray.c H5D__earray_idx_* via H5VM_swizzle_coords): array
        // element i enumerates row-major over the grid with the unlimited
        // dimension moved to the front, and the coordinates swizzle back
        // for placement. When the unlimited dim IS dim 0 (the detector
        // append-mode stack), this degenerates to plain gridOffsets.
        val unlim = maxdims.indices.filter(maxdims(_) == UNDEF)
        require(unlim.size <= 1,
          s"extensible-array chunk index with ${unlim.size} unlimited " +
            "dimensions (libhdf5 uses a v2 B-tree index for more than one)")
        val u = unlim.headOption.getOrElse(0)
        val swizGrid = gridDims(u) +: (gridDims.take(u) ++ gridDims.drop(u + 1))
        def swizOffsets(i: Int): Seq[Long] = {
          var rem = i
          val sc = new Array[Int](rank)
          var d = rank - 1
          while (d >= 0) { sc(d) = rem % swizGrid(d); rem /= swizGrid(d); d -= 1 }
          val real = new Array[Long](rank)
          real(u) = sc(0).toLong * chunkDims(u)
          var j = 1
          var dd = 0
          while (dd < rank) {
            if (dd != u) { real(dd) = sc(j).toLong * chunkDims(dd); j += 1 }
            dd += 1
          }
          real.toSeq
        }
        bb.position(bb.position() + 5) // cparams: the header repeats them
        val addr = u64(bb)
        if (addr == UNDEF) return None
        readExtensibleArray(bytes, addr, nChunks, chunkBytes).zipWithIndex
          .collect { case ((a, n, m), i) if a != UNDEF =>
            ChunkRef(swizOffsets(i), a, n, m)
          }

      case 5 => // v2 B-tree: BTHD -> BTLF chunk records (scaled offsets)
        bb.position(bb.position() + 6) // node size(4) + split(1) + merge(1)
        val addr = u64(bb)
        if (addr == UNDEF) return None
        readBtreeV2Chunks(bytes, addr, rank, chunkDims, chunkBytes)

      case t =>
        throw new UnsupportedOperationException(s"v4 chunk index type $t unknown")
    }
    Some(assembleChunks(bytes, chunks, dims, chunkDims, elemSize,
      filters, dontFilterEdges))
  }

  /** Fixed Array chunk index: header (FAHD) + one non-paged data block
    * (FADB). Returns (address, stored bytes, filter mask) per chunk in
    * grid order. Client 0 = unfiltered elements (address only); client 1 =
    * filtered (address + stored size + mask). */
  private def readFixedArray(
      bytes: Array[Byte], addr: Long, nChunks: Int,
      chunkBytes: Int): Seq[(Long, Int, Long)] = {
    val hb = bufAt(bytes, addr)
    sig(hb, "FAHD")
    require(u8(hb) == 0, "fixed-array header version")
    val clientId = u8(hb)
    require(clientId == 0 || clientId == 1, s"fixed-array client $clientId")
    val entrySize = u8(hb)
    val pageBits = u8(hb)
    val maxEntries = u64(hb)
    val dbAddr = u64(hb)
    require(nChunks <= maxEntries, s"$nChunks chunks > $maxEntries entries")
    val npages = (maxEntries + (1L << pageBits) - 1) >> pageBits
    require(npages <= 1, "paged fixed-array index not supported")

    val db = bufAt(bytes, dbAddr)
    sig(db, "FADB")
    require(u8(db) == 0, "fixed-array data block version")
    require(u8(db) == clientId, "data block client mismatch")
    u64(db) // header address (back-pointer)
    (0 until nChunks).map { _ =>
      val a = u64(db)
      if (clientId == 0) (a, chunkBytes, 0L)
      else {
        val sz = readUIntN(db, entrySize - 12).toInt // entry = addr(8)+size+mask(4)
        val mask = u32(db)
        (a, sz, mask)
      }
    }
  }

  /** Extensible Array chunk index (v4 type 4) — what libhdf5 picks for ONE
    * unlimited dimension, i.e. every append-mode detector stack. Geometry
    * (public spec III.E + libhdf5 H5EA): the index block stores the first
    * `idxElems` elements inline, then addresses for the data blocks of the
    * first `2*log2(sblkMinPtrs)` super blocks, then super-block addresses.
    * Super block `u` holds `2^(u/2)` data blocks of `2^((u+1)/2)*dblkMin`
    * elements. Client 0 = address-only elements; client 1 = filtered
    * (address + stored size + mask). Data blocks wider than one page
    * (2^pageBits elements) are read page-wise with the owning super
    * block's page-init bitmask (uninitialized pages = fill). Returns
    * (addr, nbytes, mask) in linear chunk order; UNDEF addr =
    * unallocated chunk. */
  private def readExtensibleArray(
      bytes: Array[Byte], addr: Long, nChunks: Int,
      chunkBytes: Int): Seq[(Long, Int, Long)] = {
    val hb = bufAt(bytes, addr)
    sig(hb, "EAHD")
    require(u8(hb) == 0, "extensible-array header version")
    val clientId = u8(hb)
    require(clientId == 0 || clientId == 1, s"extensible-array client $clientId")
    val elemSize = u8(hb)
    val maxBits = u8(hb)
    val idxElems = u8(hb)
    val dblkMin = u8(hb)
    val sblkMinPtrs = u8(hb)
    val pageBits = u8(hb)
    hb.position(hb.position() + 48) // stats: 6 Length fields
    val iblkAddr = u64(hb)
    require(iblkAddr != UNDEF, "extensible array with no index block")

    val offSize = (maxBits + 7) / 8 // block-offset field width in EADB/EASB
    def log2(x: Int): Int = 31 - Integer.numberOfLeadingZeros(x)
    val nsblks = 1 + maxBits - log2(dblkMin)
    case class Sblk(ndblks: Int, dblkNelmts: Int, startIdx: Long, startDblk: Int)
    val sblkInfo = {
      var startIdx = 0L
      var startDblk = 0
      (0 until nsblks).map { u =>
        val s = Sblk(1 << (u / 2), (1 << ((u + 1) / 2)) * dblkMin,
          startIdx, startDblk)
        startIdx += s.ndblks.toLong * s.dblkNelmts
        startDblk += s.ndblks
        s
      }
    }
    val firstRealSblk = 2 * log2(sblkMinPtrs)
    val nIblkDblkAddrs = 2 * (sblkMinPtrs - 1)
    val nIblkSblkAddrs = nsblks - firstRealSblk

    def readElem(b: ByteBuffer): (Long, Int, Long) = {
      val a = u64(b)
      if (clientId == 0) (a, chunkBytes, 0L)
      else {
        val sz = readUIntN(b, elemSize - 12).toInt // addr(8)+size+mask(4)
        val mask = u32(b)
        (a, sz, mask)
      }
    }

    val ib = bufAt(bytes, iblkAddr)
    sig(ib, "EAIB")
    require(u8(ib) == 0, "extensible-array index block version")
    require(u8(ib) == clientId, "index block client mismatch")
    u64(ib) // header back-pointer
    val direct = (0 until idxElems).map(_ => readElem(ib))
    val dblkAddrs = (0 until nIblkDblkAddrs).map(_ => u64(ib))
    val sblkAddrs = (0 until nIblkSblkAddrs).map(_ => u64(ib))

    val pageN = 1 << pageBits
    val elemBytes = if (clientId == 0) 8 else elemSize

    // A data block wider than one page stores a 10+8+offSize-byte prefix
    // (checksummed), then bare pages of pageN elements + checksum each;
    // the OWNING super block says which pages are initialized. Narrow
    // blocks store their elements inline after the prefix.
    val dblkCache = mutable.Map.empty[Long, IndexedSeq[(Long, Int, Long)]]
    def dataBlockElems(dbAddr: Long, nelmts: Int,
        pageInit: Int => Boolean): IndexedSeq[(Long, Int, Long)] =
      dblkCache.getOrElseUpdate(dbAddr, {
        val db = bufAt(bytes, dbAddr)
        sig(db, "EADB")
        require(u8(db) == 0, "extensible-array data block version")
        require(u8(db) == clientId, "data block client mismatch")
        u64(db) // header back-pointer
        readUIntN(db, offSize) // block offset
        if (nelmts <= pageN) (0 until nelmts).map(_ => readElem(db)).toIndexedSeq
        else {
          val pagesBase = db.position().toLong + 4 // prefix checksum
          val pageStride = pageN.toLong * elemBytes + 4 // + page checksum
          (0 until nelmts).map { j =>
            val pg = j / pageN
            if (!pageInit(pg)) (UNDEF, 0, 0L) // uninitialized page = fill
            else readElem(bufAt(bytes,
              pagesBase + pg * pageStride + (j % pageN).toLong * elemBytes))
          }.toIndexedSeq
        }
      })

    // super block: page-init bitmasks (when its data blocks are paged),
    // then the data block addresses
    val sblkCache = mutable.Map.empty[Int, (IndexedSeq[Long], Int => Int => Boolean)]
    def superBlock(u: Int): (IndexedSeq[Long], Int => Int => Boolean) =
      sblkCache.getOrElseUpdate(u, {
        val sAddr = sblkAddrs(u - firstRealSblk)
        require(sAddr != UNDEF, s"unallocated super block $u")
        val sb = bufAt(bytes, sAddr)
        sig(sb, "EASB")
        require(u8(sb) == 0, "extensible-array super block version")
        require(u8(sb) == clientId, "super block client mismatch")
        u64(sb) // header back-pointer
        readUIntN(sb, offSize) // block offset
        val s = sblkInfo(u)
        val npages = if (s.dblkNelmts > pageN) s.dblkNelmts / pageN else 0
        val maskSize = (npages + 7) / 8
        val masks = (0 until s.ndblks).map(_ =>
          if (npages > 0) take(sb, maskSize) else Array.emptyByteArray)
        val addrs = (0 until s.ndblks).map(_ => u64(sb)).toIndexedSeq
        // bit order: libhdf5's H5VM_bit_get stores bit offset 0 in the
        // byte's HIGH bit (0x80 >> (off % 8)), i.e. MSB-first
        (addrs, d => pg => npages == 0 || (masks(d)(pg / 8) & (0x80 >> (pg % 8))) != 0)
      })

    (0 until nChunks).map { i =>
      if (i < idxElems) direct(i)
      else {
        val idx = (i - idxElems).toLong
        val u = sblkInfo.lastIndexWhere(_.startIdx <= idx)
        val s = sblkInfo(u)
        val dblk = ((idx - s.startIdx) / s.dblkNelmts).toInt
        val elem = ((idx - s.startIdx) % s.dblkNelmts).toInt
        val (dbAddr, pageInit) =
          if (u < firstRealSblk) {
            require(s.dblkNelmts <= pageN,
              "paged data block addressed from the index block")
            (dblkAddrs(s.startDblk + dblk), (_: Int) => true)
          } else {
            val (addrs, masks) = superBlock(u)
            (addrs(dblk), masks(dblk))
          }
        if (dbAddr == UNDEF) (UNDEF, 0, 0L) // unallocated block = fill value
        else dataBlockElems(dbAddr, s.dblkNelmts, pageInit)(elem)
      }
    }
  }

  /** Generic v2 B-tree walk: every record in the tree, any depth, as a
    * buffer positioned at the record's first byte. Internal (BTIN) nodes
    * store their records then `nrec+1` child pointers whose field widths
    * derive from the per-level maximum-records ladder (public H5B2
    * sizing: leaf capacity `(nodeSize-10)/recSize` bounds the pointer's
    * record-count width at every upper level; a total-count field rides
    * along when the child is itself internal). Returns (record type,
    * record size, records). */
  private def btree2Records(
      bytes: Array[Byte], addr: Long,
      expectTypes: Set[Int]): (Int, Int, Seq[ByteBuffer]) = {
    val hb = bufAt(bytes, addr)
    sig(hb, "BTHD")
    require(u8(hb) == 0, "v2 b-tree header version")
    val btype = u8(hb)
    require(expectTypes.contains(btype),
      s"v2 b-tree type $btype, expected one of $expectTypes")
    val nodeSize = u32(hb).toInt
    val recSize = u16(hb)
    val depth = u16(hb)
    u8(hb); u8(hb) // split / merge percents
    val rootAddr = u64(hb)
    val rootNrec = u16(hb)
    if (rootAddr == UNDEF) return (btype, recSize, Nil)

    def encSize(v: Long): Int = // bytes for v's bit length, min 1
      math.max(1, (71 - java.lang.Long.numberOfLeadingZeros(v)) / 8)
    val maxNrec = new Array[Long](depth + 1)
    val cumMax = new Array[Long](depth + 1)
    maxNrec(0) = (nodeSize - 10) / recSize // sig+ver+type (6) + csum (4)
    cumMax(0) = maxNrec(0)
    for (d <- 1 to depth) {
      val ptr = 8 + encSize(maxNrec(d - 1)) +
        (if (d > 1) encSize(cumMax(d - 1)) else 0)
      maxNrec(d) = (nodeSize - 10 - ptr) / (recSize + ptr)
      cumMax(d) = (maxNrec(d) + 1) * cumMax(d - 1) + maxNrec(d)
    }

    val out = mutable.ArrayBuffer.empty[ByteBuffer]
    def visitNode(nAddr: Long, nrec: Int, d: Int): Unit = {
      val b = bufAt(bytes, nAddr)
      sig(b, if (d == 0) "BTLF" else "BTIN")
      require(u8(b) == 0, "v2 b-tree node version")
      require(u8(b) == btype, "v2 b-tree node type mismatch")
      val recsStart = nAddr + 6
      if (d == 0)
        (0 until nrec).foreach(i => out += bufAt(bytes, recsStart + i.toLong * recSize))
      else {
        val pb = bufAt(bytes, recsStart + nrec.toLong * recSize)
        val nrecSize = encSize(maxNrec(d - 1))
        val totSize = if (d > 1) encSize(cumMax(d - 1)) else 0
        val children = (0 to nrec).map { _ =>
          val a = u64(pb)
          val cn = readUIntN(pb, nrecSize).toInt
          if (totSize > 0) readUIntN(pb, totSize)
          (a, cn)
        }
        // in-order: child 0, record 0, child 1, ... (order is cosmetic —
        // chunk assembly and link enumeration are both order-free)
        (0 to nrec).foreach { i =>
          visitNode(children(i)._1, children(i)._2, d - 1)
          if (i < nrec) out += bufAt(bytes, recsStart + i.toLong * recSize)
        }
      }
    }
    visitNode(rootAddr, rootNrec, depth)
    (btype, recSize, out.toSeq)
  }

  /** v2 B-tree chunk index (v4 type 5) — libhdf5's choice for >1 unlimited
    * dimension. Record type 10 = unfiltered (address + per-dim SCALED
    * offsets, 8 bytes each); type 11 = filtered (+ variable-width stored
    * size + mask). Any tree depth via [[btree2Records]]. */
  private def readBtreeV2Chunks(
      bytes: Array[Byte], addr: Long, rank: Int, chunkDims: Seq[Int],
      chunkBytes: Int): Seq[ChunkRef] = {
    val (btype, recSize, recs) = btree2Records(bytes, addr, Set(10, 11))
    val szLen = recSize - 12 - 8 * rank // addr(8) + mask(4) + offsets
    recs.map { lb =>
      val a = u64(lb)
      val (nbytes, mask) =
        if (btype == 10) (chunkBytes, 0L)
        else (readUIntN(lb, szLen).toInt, u32(lb))
      val scaled = (0 until rank).map(_ => u64(lb))
      ChunkRef(scaled.zip(chunkDims).map { case (s, c) => s * c }, a, nbytes, mask)
    }
  }

  // -------------------------------------------- virtual (VDS) storage ------

  /** A contiguous axis-aligned region: per-dim start + extent. */
  private[sources] final case class Slab(start: Seq[Long], count: Seq[Long])

  private def inBounds(slab: Slab, dims: Seq[Long], what: String): Unit = {
    require(slab.count.length == dims.length, s"$what selection rank")
    slab.start.indices.foreach { d =>
      require(slab.start(d) >= 0 && slab.start(d) + slab.count(d) <= dims(d),
        s"$what selection out of bounds in dim $d")
    }
  }

  /** Ordered contiguous pieces of one slab in the array's row-major element
    * space: the innermost extent, widened across trailing dimensions the
    * slab covers completely, so whole-row regions become single copies. */
  private[sources] def slabSpans(slab: Slab, dims: Seq[Long]): Iterator[(Long, Long)] = {
    val n = slab.count.product
    if (n == 0) return Iterator.empty
    var run = 1L
    var d = dims.length - 1
    while (d >= 0 && slab.start(d) == 0 && slab.count(d) == dims(d)) {
      run *= dims(d); d -= 1
    }
    if (d >= 0) run *= slab.count(d)
    val strd = dimStrides(dims)
    val step = run
    Iterator.iterate(0L)(_ + step).takeWhile(_ < n)
      .map(k => (slabOffset(k, slab, strd), step))
  }

  /** A dataspace selection. `spans(dims)` enumerates the selected elements
    * as ordered (element-offset, run-length) pieces of the dataset's
    * row-major element space — the order libhdf5's selection iterator
    * visits elements for I/O — so grafting SOURCE elements into a VIRTUAL
    * extent is a zip of two span streams regardless of the two selections'
    * shapes (or ranks: an Eiger [n,H,W] virtual stack fed by [H,W]
    * sources). */
  private[sources] sealed trait Sel {
    def numElems(dims: Seq[Long]): Long
    def spans(dims: Seq[Long]): Iterator[(Long, Long)]
    def validate(dims: Seq[Long], what: String): Unit
  }
  private[sources] case object AllSel extends Sel {
    def numElems(dims: Seq[Long]): Long = dims.product
    def spans(dims: Seq[Long]): Iterator[(Long, Long)] =
      if (dims.product == 0) Iterator.empty else Iterator((0L, dims.product))
    def validate(dims: Seq[Long], what: String): Unit = ()
  }
  private[sources] final case class SlabSel(start: Seq[Long], count: Seq[Long]) extends Sel {
    private def slab: Slab = Slab(start, count)
    def numElems(dims: Seq[Long]): Long = count.product
    def spans(dims: Seq[Long]): Iterator[(Long, Long)] = slabSpans(slab, dims)
    def validate(dims: Seq[Long], what: String): Unit = inBounds(slab, dims, what)
  }

  /** Regular hyperslab whose blocks are NOT mutually adjacent (stride >
    * block with count > 1 in some dim) — the multi-module detector
    * interleave shape. Row-major element order over a regular pattern is
    * the cartesian product of per-dim ascending coordinates, one
    * innermost block per span. */
  private[sources] final case class StridedSel(start: Seq[Long], stride: Seq[Long],
      count: Seq[Long], block: Seq[Long]) extends Sel {
    private def rank = start.length
    def numElems(dims: Seq[Long]): Long =
      (0 until rank).map(d => count(d) * block(d)).product
    def validate(dims: Seq[Long], what: String): Unit = {
      require(rank == dims.length, s"$what selection rank")
      (0 until rank).foreach { d =>
        // stride only means anything with >1 block; libhdf5 leaves the
        // default stride 1 on count-1 dims even when block > 1
        require(count(d) == 1 || stride(d) >= block(d),
          s"$what: overlapping hyperslab blocks in dim $d")
        val end = start(d) + (count(d) - 1) * stride(d) + block(d)
        require(start(d) >= 0 && end <= dims(d),
          s"$what selection out of bounds in dim $d")
      }
    }
    def spans(dims: Seq[Long]): Iterator[(Long, Long)] = {
      val strd = dimStrides(dims)
      val runLen = block(rank - 1)
      // mixed-radix run index: element coordinate per outer dim, block
      // index on the innermost (each innermost block is one contiguous run)
      val radices = (0 until rank - 1).map(d => count(d) * block(d)) :+
        count(rank - 1)
      val total = radices.product
      Iterator.iterate(0L)(_ + 1).takeWhile(_ < total).map { r =>
        var rem = r
        var off = 0L
        var d = rank - 1
        while (d >= 0) {
          val c = rem % radices(d); rem /= radices(d)
          val coord =
            if (d == rank - 1) start(d) + c * stride(d)
            else start(d) + (c / block(d)) * stride(d) + (c % block(d))
          off += coord * strd(d)
          d -= 1
        }
        (off, runLen)
      }
    }
  }

  /** Block-list selection with several DISJOINT blocks (how libhdf5
    * normalizes hyperslab unions). Row-major element order over a union
    * is ascending linear offset, so the per-block span streams merge by
    * offset — any box arrangement, stored in any order. Overlap (which a
    * well-formed file never stores) is detected during the merge and
    * fails loudly rather than risk a wrong element order. */
  private[sources] final case class MultiBlockSel(blocks: Seq[Slab]) extends Sel {
    def numElems(dims: Seq[Long]): Long = blocks.map(_.count.product).sum
    def validate(dims: Seq[Long], what: String): Unit = {
      blocks.foreach(inBounds(_, dims, what))
      // run the merge dry so an overlapping (malformed) union fails HERE,
      // with the source/virtual designation, not mid-copy
      try spans(dims).foreach(_ => ()) catch {
        case e: IllegalArgumentException =>
          throw new IllegalArgumentException(s"$what: ${e.getMessage}", e)
      }
    }
    def spans(dims: Seq[Long]): Iterator[(Long, Long)] = {
      type Stream = scala.collection.BufferedIterator[(Long, Long)]
      val pq = mutable.PriorityQueue.empty[Stream](
        Ordering.by[Stream, Long](_.head._1).reverse)
      blocks.foreach { b =>
        val it = slabSpans(b, dims).buffered
        if (it.hasNext) pq.enqueue(it)
      }
      var last = -1L // end of the previously emitted span
      Iterator.continually(()).takeWhile(_ => pq.nonEmpty).map { _ =>
        val it = pq.dequeue()
        val (off, len) = it.next()
        require(off >= last, "multi-block selection has overlapping blocks")
        last = off + len
        if (it.hasNext) pq.enqueue(it)
        (off, len)
      }
    }
  }

  /** Point selection: explicit coordinates, iterated in stored order
    * (h5py/libhdf5 I/O order for point selections). */
  private[sources] final case class PointSel(points: Seq[Seq[Long]]) extends Sel {
    def numElems(dims: Seq[Long]): Long = points.length.toLong
    def validate(dims: Seq[Long], what: String): Unit =
      points.foreach { p =>
        require(p.length == dims.length, s"$what selection rank")
        p.indices.foreach(d => require(p(d) >= 0 && p(d) < dims(d),
          s"$what point out of bounds in dim $d"))
      }
    def spans(dims: Seq[Long]): Iterator[(Long, Long)] = {
      val strd = dimStrides(dims)
      points.iterator.map(p => (p.indices.map(d => p(d) * strd(d)).sum, 1L))
    }
  }

  /** Regular hyperslab with H5S_UNLIMITED count along `unlimDim`: an
    * open-ended run of contiguous `block`-shaped slabs (stride == block,
    * already normalized per non-unlimited dim). This is what
    * `H5Pset_virtual` writes for printf-style / open-ended acquisitions;
    * the extent is only known once sources resolve, so `toSlab` clamps the
    * run to whatever fits the given dims (h5py's view of an unfilled VDS).
    */
  private[sources] final case class UnlimSel(
      start: Seq[Long], block: Seq[Long], unlimDim: Int) extends Sel {
    def blockElems: Long = block.product
    /** How many whole blocks fit inside `dims`. */
    def maxBlocks(dims: Seq[Long]): Long =
      ((dims(unlimDim) - start(unlimDim)) / block(unlimDim)).max(0L)
    /** The k-th block's slab (0-based). */
    def blockSlab(k: Long): Slab =
      Slab(start.updated(unlimDim, start(unlimDim) + k * block(unlimDim)), block)
    /** One contiguous slab covering the first n blocks. */
    def slabOf(n: Long): Slab =
      Slab(start, block.updated(unlimDim, n * block(unlimDim)))
    def toSlab(dims: Seq[Long]): Slab = slabOf(maxBlocks(dims))
    def numElems(dims: Seq[Long]): Long = toSlab(dims).count.product
    def spans(dims: Seq[Long]): Iterator[(Long, Long)] =
      slabSpans(toSlab(dims), dims)
    def validate(dims: Seq[Long], what: String): Unit =
      inBounds(toSlab(dims), dims, what)
  }

  /** Serialized dataspace selection (spec "Dataspace Selection" encoding,
    * as stored in the virtual storage heap block). Supported: ALL (3),
    * NONE (0, maps nothing -> None), point selections (1, v1 encoding),
    * and hyperslabs (2) — v1/v3 block lists (one block or any disjoint
    * union, merged to row-major order), v2/v3 regular hyperslabs whether
    * contiguous (stride == block, the Eiger data_0000NN stacking shape),
    * strided (gaps between blocks — module interleave), count-unlimited,
    * or block-unlimited ([[UnlimSel]], printf / open-ended mappings).
    * Overlapping unions and v2+ point encodings fail loudly. */
  private def parseSelection(vb: ByteBuffer, what: String): Option[Sel] = {
    // corrupted rank / entry-count fields must not drive pathological
    // allocations: HDF5 caps dataspace rank at 32 (H5S_MAX_RANK), and
    // every serialized block/point occupies at least one byte, so the
    // remaining message bytes bound any real entry count
    def checkRank(rank: Int): Int = {
      require(rank > 0 && rank <= 32, s"$what: dataspace rank $rank")
      rank
    }
    def checkCount(n: Long): Long = {
      require(n >= 0 && n <= vb.remaining(),
        s"$what: $n selection entries in a ${vb.remaining()}-byte tail")
      n
    }
    val stype = u32(vb)
    stype match {
      case 0 => // H5S_SEL_NONE
        u32(vb) // version
        vb.position(vb.position() + 8) // reserved
        None
      case 3 => // H5S_SEL_ALL
        require(u32(vb) == 1, s"$what: all-selection version")
        vb.position(vb.position() + 8) // reserved
        Some(AllSel)
      case 2 => // H5S_SEL_HYPERSLABS
        u32(vb) match {
          case 1 => // block list; u32 coords
            u32(vb) // reserved
            u32(vb) // length
            val rank = checkRank(u32(vb).toInt)
            val nblocks = checkCount(u32(vb))
            blockList(nblocks, rank, () => u32(vb), what)
          case 2 => // regular start/stride/count/block; u64 coords
            u8(vb) // flags (bit 0: regular — always set in v2)
            u32(vb) // length
            val rank = checkRank(u32(vb).toInt)
            regularSlab(vb, rank, 8, what)
          case 3 => // v3 (HDF5 1.12+): variable coordinate width
            val flags = u8(vb)
            val encSize = u8(vb)
            require(encSize == 2 || encSize == 4 || encSize == 8,
              s"$what: v3 selection encode size $encSize")
            val rank = checkRank(u32(vb).toInt)
            if ((flags & 1) != 0) regularSlab(vb, rank, encSize, what)
            else { // block list, like v1 but variable-width coords
              val nblocks = checkCount(readUIntN(vb, encSize))
              blockList(nblocks, rank, () => readUIntN(vb, encSize), what)
            }
          case v =>
            throw new UnsupportedOperationException(s"$what: hyperslab selection v$v")
        }
      case 1 => // H5S_SEL_POINTS
        u32(vb) match {
          case 1 => // u32 coords
            u32(vb) // reserved
            u32(vb) // length
            val rank = checkRank(u32(vb).toInt)
            val npoints = checkCount(u32(vb))
            val points = (0L until npoints).map(_ =>
              (0 until rank).map(_ => u32(vb)))
            if (points.isEmpty) None else Some(PointSel(points))
          case 2 => // HDF5 1.12+ (H5S__point_serialize): variable width
            val encSize = u8(vb)
            require(encSize == 2 || encSize == 4 || encSize == 8,
              s"$what: v2 point selection encode size $encSize")
            val rank = checkRank(u32(vb).toInt)
            val npoints = checkCount(readUIntN(vb, encSize))
            val points = (0L until npoints).map(_ =>
              (0 until rank).map(_ => readUIntN(vb, encSize)))
            if (points.isEmpty) None else Some(PointSel(points))
          case v => throw new UnsupportedOperationException(
            s"$what: point selection v$v")
        }
      case t =>
        throw new UnsupportedOperationException(s"$what: selection type $t")
    }
  }

  /** (start corner, opposite corner) pairs, block-major — one block is a
    * plain slab; several become a [[MultiBlockSel]] (any disjoint union). */
  private def blockList(
      nblocks: Long, rank: Int, coord: () => Long, what: String): Option[Sel] = {
    val blocks = (0L until nblocks).map { _ =>
      val start = (0 until rank).map(_ => coord())
      val end = (0 until rank).map(_ => coord())
      Slab(start, start.zip(end).map { case (s, e) => e - s + 1 })
    }
    blocks match {
      case Seq() => None
      case Seq(one) => Some(SlabSel(one.start, one.count))
      case many => Some(MultiBlockSel(many))
    }
  }

  /** Regular hyperslab info at `encSize` bytes per coordinate -> a
    * contiguous slab (count 1, or adjacent blocks via stride==block), a
    * [[StridedSel]] when blocks have gaps, or an [[UnlimSel]] when the
    * count is H5S_UNLIMITED.
    * Coordinates are INTERLEAVED per dimension — Start #1, Stride #1,
    * Count #1, Block #1, ... Start #n (format spec "Hyperslab Selection
    * Info" v2/v3; libhdf5 H5S__hyper_serialize) — not four grouped
    * arrays; the orders only coincide at rank 1.
    * An all-ones coordinate at the encode width is H5S_UNLIMITED. */
  private def regularSlab(
      vb: ByteBuffer, rank: Int, encSize: Int, what: String): Option[Sel] = {
    // H5S_UNLIMITED is HSIZE_UNDEF (2^64-1), which only fits an 8-byte
    // encode width — libhdf5 picks the width from the largest coordinate,
    // so at widths 2/4 an all-ones count is a LEGITIMATE value, not the
    // sentinel (Long.MinValue below can never match a decoded coordinate)
    val unlimited = if (encSize == 8) UNDEF else Long.MinValue
    val start, stride, count, block = Array.ofDim[Long](rank)
    for (d <- 0 until rank) {
      start(d) = readUIntN(vb, encSize)
      stride(d) = readUIntN(vb, encSize)
      count(d) = readUIntN(vb, encSize)
      block(d) = readUIntN(vb, encSize)
    }
    require((start ++ stride).forall(_ != unlimited),
      s"$what: H5S_UNLIMITED start/stride is invalid")
    // Contiguous extent per non-unlimited dim (count 1, or adjacent
    // blocks via stride==block).
    def ext(d: Int): Long =
      if (count(d) == 1L) block(d)
      else {
        require(stride(d) == block(d),
          s"$what: strided hyperslab is not one contiguous block")
        count(d) * block(d)
      }
    val unlimDims = (0 until rank).filter(d =>
      count(d) == unlimited || block(d) == unlimited)
    if (unlimDims.nonEmpty) {
      // H5S allows one unlimited dimension, as either an unlimited COUNT
      // of fixed blocks (what H5Pset_virtual writes for printf mappings;
      // growth unit = the block) or ONE unlimited-extent block (count 1;
      // growth unit = a single row of the pattern).
      require(unlimDims.size == 1,
        s"$what: ${unlimDims.size} unlimited dimensions (1 supported)")
      val ud = unlimDims.head
      val growUnit =
        if (count(ud) == unlimited) {
          require(block(ud) != unlimited,
            s"$what: unlimited count AND block in dim $ud")
          require(stride(ud) == block(ud),
            s"$what: unlimited selection with stride != block is not contiguous")
          block(ud)
        } else {
          require(count(ud) == 1,
            s"$what: unlimited block extent with count ${count(ud)} > 1")
          1L
        }
      val nb = (0 until rank).map(d => if (d == ud) growUnit else ext(d))
      Some(UnlimSel(start.toSeq, nb, ud))
    } else if ((0 until rank).forall(d => count(d) == 1L || stride(d) == block(d)))
      Some(SlabSel(start.toSeq, (0 until rank).map(ext)))
    else // gaps between blocks: the interleave/decimation shape
      Some(StridedSel(start.toSeq, stride.toSeq, count.toSeq, block.toSeq))
  }

  private[sources] def dimStrides(dims: Seq[Long]): Seq[Long] =
    dims.scanRight(1L)(_ * _).tail

  /** Linear element offset (row-major, full-array strides) of position `k`
    * within the slab's own row-major enumeration. */
  private def slabOffset(k: Long, slab: Slab, strd: Seq[Long]): Long = {
    var rem = k
    var off = 0L
    var d = slab.count.length - 1
    while (d >= 0) {
      val c = rem % slab.count(d)
      rem /= slab.count(d)
      off += (slab.start(d) + c) * strd(d)
      d -= 1
    }
    off
  }

  /** Zips two span streams, copying min-length contiguous pieces — the
    * general element-order graft between any two equal-count selections
    * (slab into slab, strided into blocks, points into anything, ...). */
  private[sources] def copySpans(src: Array[Byte], sit: Iterator[(Long, Long)],
      dst: Array[Byte], dit: Iterator[(Long, Long)], esz: Int): Unit = {
    var so = 0L; var sl = 0L
    var vo = 0L; var vl = 0L
    var more = true
    while (more) {
      if (sl == 0L) {
        if (sit.hasNext) { val p = sit.next(); so = p._1; sl = p._2 }
        else more = false
      }
      if (vl == 0L) {
        if (dit.hasNext) { val p = dit.next(); vo = p._1; vl = p._2 }
        else more = false
      }
      if (more && sl > 0L && vl > 0L) {
        val n = math.min(sl, vl)
        System.arraycopy(src, (so * esz).toInt, dst, (vo * esz).toInt,
          (n * esz).toInt)
        so += n; sl -= n; vo += n; vl -= n
      }
    }
  }

  /** printf-style block tokens in VDS source names: `%b` is the HDF5
    * `H5Pset_virtual` convention (0-based block index; we also accept a
    * zero-padded width like `%06b`, and the `%d` spelling detector file
    * naming schemes use), `%%` is a literal percent. libhdf5 only ever
    * substitutes `%b`, so a name whose ONLY tokens are `%d` might equally
    * be a literal file name containing a percent — for those names the
    * LITERAL file (libhdf5's own reading) takes priority and printf
    * substitution runs only when no literal file resolves (a `%b`
    * anywhere skips the literal probe: that spelling is unambiguous). */
  private val PrintfToken = "%%|%(0[0-9]+)?[bd]".r

  private def hasBlockPattern(s: String): Boolean =
    PrintfToken.findAllMatchIn(s).exists(_.matched != "%%")

  /** An unambiguous `%b` token (the only spelling libhdf5 substitutes). */
  private def hasBTok(s: String): Boolean =
    PrintfToken.findAllMatchIn(s)
      .exists(m => m.matched != "%%" && m.matched.endsWith("b"))

  /** `%%` -> literal percent for non-printf source names (any other %
    * token stays literal there). */
  private def unescapePercents(s: String): String = s.replace("%%", "%")

  /** Substitutes the 0-based block index into every printf token. */
  private def substBlock(s: String, k: Long): String =
    PrintfToken.replaceAllIn(s, m =>
      if (m.matched == "%%") "%"
      else {
        val width = Option(m.group(1)).map(_.toInt).getOrElse(0)
        val digits = k.toString
        ("0" * ((width - digits.length).max(0))) + digits
      })

  /** NUL-terminated string out of a heap-block buffer. */
  private def cstr(vb: ByteBuffer): String = {
    val arr = vb.array()
    val start = vb.position()
    var end = start
    while (arr(end) != 0) end += 1
    vb.position(end + 1)
    new String(arr, start, end - start, "UTF-8")
  }

  /** Virtual (VDS) layout — v4 layout class 3 pointing at a "virtual
    * storage" global heap block of (source file, source dataset, source
    * selection, virtual selection) mappings. Source files resolve through
    * the same callback as external links (sibling Eiger data_0000NN
    * files); each resolvable mapping grafts its source elements into the
    * virtual extent, and unmapped or unresolvable regions read as fill
    * (0), which is h5py's behavior the reference relies on
    * (`/root/reference/src/utilities.py:112-134` reads Eiger masters
    * transparently whether the frames arrive via external links or VDS).
    * Printf-style mappings (`data_%b.h5` + count-unlimited selection,
    * the open-ended-acquisition form `H5Pset_virtual` writes) resolve
    * block 0, 1, ... until the first missing file, clamped to the
    * virtual extent. Unlike h5py we also surface missing source files
    * in a `virtual_missing_sources` attribute so ingest can tell "short
    * stack" from "frames of zeros". A fully-unresolvable dataset keeps
    * NO data (marker semantics, like dangling external links). */
  private def readVirtual(
      bytes: Array[Byte], heapAddr: Long, heapIdx: Int,
      dims: Seq[Long], dt: DType,
      resolve: String => Option[Array[Byte]],
      openFiles: Set[String]): (Option[Array[Byte]], Map[String, String]) = {
    require(!dt.isInstanceOf[ArrayT],
      "array-typed virtual dataset not supported")
    // vlen-string elements are 16-byte global-heap REFERENCES into the
    // file that wrote them; grafting source-file bytes into this file's
    // buffer would later decode them against the MASTER's heap — wrong
    // strings or a decode failure, never detectable from the bytes alone.
    def heapRefs(t: DType): Boolean = t match {
      case VlenStr => true
      case _: ObjRef => true // object-header addresses: equally file-local
      case _: ObjRef2 => true // heap blob ID + address token: file-local
      case _: RegionRef => true // heap handle + target address: file-local
      case _: RegionRef2 => true // same revised heap-blob form: file-local
      case _: AttrRef2 => true // same revised heap-blob form: file-local
      case Compound(_, ms) => ms.exists(m => heapRefs(m.dt))
      case ArrayT(base, _) => heapRefs(base)
      case _ => false
    }
    if (heapRefs(dt)) throw new UnsupportedOperationException(
      "virtual dataset over vlen-string, object-reference (or vlen-member " +
        "compound) datatype: heap/address references are not portable across files")
    val blk = gcolObject(bytes, heapAddr, heapIdx).getOrElse(
      throw new IllegalArgumentException("virtual storage heap block missing"))
    val vb = ByteBuffer.wrap(blk).order(ByteOrder.LITTLE_ENDIAN)
    require(u8(vb) == 0, "virtual storage block version")
    val nEntries = u64(vb)
    val entries = (0L until nEntries).map { _ =>
      val file = cstr(vb)
      val dsPath = cstr(vb)
      val srcSel = parseSelection(vb, s"virtual source $file")
      val virtSel = parseSelection(vb, s"virtual extent for $file")
      (file, dsPath, srcSel, virtSel)
    }

    val esz = dt.size
    val totalBytes = dims.product * esz
    if (totalBytes > Int.MaxValue - 16) {
      // same degrade policy as oversized external-link targets: a scan
      // over millions of masters must survive one multi-GB stack — the
      // node stays present and inspectable, data reads via a chunk-range
      // path, never a task-aborting throw
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"virtual dataset is $totalBytes bytes (> single-buffer bound); " +
          "degrading to a marker node")
      return (None, Map("virtual_oversized" -> totalBytes.toString))
    }
    val out = new Array[Byte](totalBytes.toInt)
    val missing = mutable.LinkedHashSet.empty[String]
    var resolved = 0
    def readSource(file: String, dsPath: String)
        : Option[(Seq[Long], DType, Array[Byte])] = {
      val srcBytes =
        if (openFiles.contains(file)) None // cross-file cycle: degrade
        else resolve(file)
      val found = srcBytes.flatMap { sb =>
        val sink = mutable.Map.empty[String, (Seq[Long], DType, Array[Byte])]
        readGuarded(sb, resolve, openFiles + file, sink)
        sink.get(normalizePath(dsPath))
      }
      found.foreach { case (_, sdt, _) =>
        require(sdt == dt,
          s"virtual source $file:$dsPath datatype $sdt != virtual $dt")
      }
      found
    }
    entries.foreach { case (file, dsPath, srcSel, virtSel) =>
      // Literal (non-printf) resolution: the name is literal modulo the
      // %% escape, and an unresolvable one degrades to the marker like
      // any other missing source, never a file-aborting throw.
      def resolveLiteral(ss: Sel, vs: Sel): Unit = {
        val litFile = unescapePercents(file)
        readSource(litFile, unescapePercents(dsPath)) match {
          case None => missing += litFile
          case Some((sdims, _, sraw)) =>
            ss.validate(sdims, "source") // UnlimSel clamps to source
            val n = ss.numElems(sdims)
            val vspans = vs match {
              case u: UnlimSel =>
                // open-ended virtual extent, single concrete source:
                // the resolved source extent decides the block count
                // (h5py clamps an unfilled VDS the same way)
                u.validate(dims, "virtual extent")
                require(n % u.blockElems == 0,
                  s"virtual source $file: $n elements do not tile " +
                    s"${u.blockElems}-element unlimited blocks")
                require(n / u.blockElems <= u.maxBlocks(dims),
                  s"virtual source $file exceeds the virtual extent")
                slabSpans(u.slabOf(n / u.blockElems), dims)
              case s =>
                s.validate(dims, "virtual extent")
                require(n == s.numElems(dims),
                  s"virtual mapping: source $n != virtual " +
                    s"${s.numElems(dims)} elements")
                s.spans(dims)
            }
            copySpans(sraw, ss.spans(sdims), out, vspans, esz)
            resolved += 1
        }
      }
      (srcSel, virtSel) match {
        case (Some(ss), Some(vs)) =>
          require(file != ".",
            "virtual mapping with source file '.' (self) not supported")
          val printf = hasBlockPattern(file) || hasBlockPattern(dsPath)
          vs match {
            case u: UnlimSel if printf =>
              // libhdf5 only substitutes %b; a name whose only tokens are
              // %d may equally be a LITERAL name containing a percent
              // (accepting %d families is our deliberate extension for
              // detector-style numeric stacks). The literal file is what
              // libhdf5 itself would read, so for %d-only names LITERAL
              // resolution takes priority — substitution never shadows an
              // existing literal-%d file and only runs when none resolves.
              val dOnly = !hasBTok(file) && !hasBTok(dsPath)
              if (dOnly && readSource(unescapePercents(file),
                  unescapePercents(dsPath)).isDefined) {
                resolveLiteral(ss, u)
              } else {
                // printf-style open-ended mapping: substitute the block
                // index into the source name and resolve until the first
                // missing file (libhdf5's gap=0 iteration), clamped to the
                // virtual dataset's current extent. A short stack leaves
                // the remaining blocks as fill and surfaces the first
                // missing source.
                u.validate(dims, "virtual extent") // non-unlimited dims too
                val cap = u.maxBlocks(dims)
                var k = 0L
                var stop = false
                while (k < cap && !stop) {
                  val f = substBlock(file, k)
                  readSource(f, substBlock(dsPath, k)) match {
                    case None =>
                      // a %d-only family whose block 0 is missing has no
                      // resolvable reading at all — record the LITERAL
                      // name (libhdf5's view), never a fabricated one,
                      // and never un-record another mapping's miss
                      missing += (if (k == 0L && dOnly)
                        unescapePercents(file) else f)
                      stop = true
                    case Some((sdims, _, sraw)) =>
                      ss.validate(sdims, s"source $f")
                      require(ss.numElems(sdims) == u.blockElems,
                        s"virtual mapping: source $f ${ss.numElems(sdims)} " +
                          s"!= block ${u.blockElems} elements")
                      copySpans(sraw, ss.spans(sdims), out,
                        slabSpans(u.blockSlab(k), dims), esz)
                      resolved += 1
                  }
                  k += 1
                }
              }
            case _ =>
              // a %b/%d token WITHOUT an unlimited selection is not a
              // printf mapping (libhdf5 pairs them at creation time)
              resolveLiteral(ss, vs)
          }
        case _ => () // a NONE selection maps nothing
      }
    }
    val attrs =
      if (missing.isEmpty) Map.empty[String, String]
      else Map("virtual_missing_sources" -> missing.mkString(","))
    if (resolved == 0 && missing.nonEmpty) (None, attrs) else (Some(out), attrs)
  }

  // -------------------------------------------------------- value decode ---

  /** One object out of a global heap collection (GCOL), by 1-based index. */
  private def gcolObject(
      bytes: Array[Byte], collectionAddr: Long, index: Int): Option[Array[Byte]] = {
    if (collectionAddr == UNDEF || index == 0) return None
    val gb = bufAt(bytes, collectionAddr)
    sig(gb, "GCOL")
    gb.position(gb.position() + 4) // version + reserved
    val size = u64(gb)
    val end = collectionAddr + size
    while (gb.position() + 16 <= end) {
      val idx = u16(gb)
      u16(gb); u32(gb) // refcount + reserved
      val objSize = u64(gb)
      if (idx == index) return Some(take(gb, objSize.toInt))
      if (idx == 0) return None // free-space object: not found
      gb.position(gb.position() + ((objSize + 7) & ~7L).toInt)
    }
    None
  }

  private def gcolString(bytes: Array[Byte], ref: ByteBuffer): String = {
    val len = u32(ref).toInt
    val collectionAddr = u64(ref)
    val index = u32(ref).toInt
    gcolObject(bytes, collectionAddr, index)
      .map(o => new String(o, 0, math.min(len, o.length), "UTF-8"))
      .getOrElse("")
  }

  private def decodeString(bytes: Array[Byte], data: Array[Byte], dt: DType): String =
    dt match {
      case Str(_) =>
        val nul = data.indexOf(0.toByte)
        new String(data, 0, if (nul < 0) data.length else nul, "UTF-8")
      case VlenStr =>
        gcolString(bytes, ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN))
      case other => throw new IllegalStateException(s"not a string type: $other")
    }

  private def unsignedLongToDouble(v: Long): Double =
    if (v >= 0) v.toDouble else v.toDouble + 1.8446744073709552e19 // + 2^64

  /** Both decoders honor the datatype's recorded byte order by wrapping
    * the raw bytes in a buffer of that order — the sign/width logic is
    * order-agnostic. */
  private def byteOrderOf(dt: DType): ByteOrder = dt match {
    case Fixed(_, _, true) | Flt(_, true) => ByteOrder.BIG_ENDIAN
    case _ => ByteOrder.LITTLE_ENDIAN
  }

  private def decodeF64(data: Array[Byte], dt: DType, i: Int): Double = {
    val bb = ByteBuffer.wrap(data).order(byteOrderOf(dt))
    dt match {
      case Flt(4, _) => bb.getFloat(i * 4).toDouble
      case Flt(8, _) => bb.getDouble(i * 8)
      case Fixed(1, true, _) => bb.get(i).toDouble
      case Fixed(2, true, _) => bb.getShort(i * 2).toDouble
      case Fixed(4, true, _) => bb.getInt(i * 4).toDouble
      case Fixed(8, true, _) => bb.getLong(i * 8).toDouble
      case Fixed(1, false, _) => (bb.get(i) & 0xFF).toDouble
      case Fixed(2, false, _) => (bb.getShort(i * 2) & 0xFFFF).toDouble
      case Fixed(4, false, _) => (bb.getInt(i * 4) & 0xFFFFFFFFL).toDouble
      case Fixed(8, false, _) => unsignedLongToDouble(bb.getLong(i * 8))
      case other => throw new IllegalStateException(s"not numeric: $other")
    }
  }

  /** Bulk numeric decode: one buffer wrap and one datatype dispatch for
    * the whole array — the per-element form would allocate a ByteBuffer
    * per pixel on multi-megapixel frames. */
  private def decodeArrayF64(data: Array[Byte], dt: DType, n: Int): Array[Double] = {
    // a corrupted element count (dataspace dims live in the object
    // header, unchecksummed in v1) must not drive a pathological
    // allocation that takes down an executor: the buffer in hand bounds
    // the count — every caller sizes `data` from the file's own bytes
    require(n >= 0 && n.toLong * dt.size <= data.length,
      s"$n elements claimed but only ${data.length} data bytes")
    val bb = ByteBuffer.wrap(data).order(byteOrderOf(dt))
    val out = new Array[Double](n)
    var i = 0
    dt match {
      case Flt(4, _) =>
        val fb = bb.asFloatBuffer()
        while (i < n) { out(i) = fb.get(i).toDouble; i += 1 }
      case Flt(8, _) =>
        val db = bb.asDoubleBuffer()
        while (i < n) { out(i) = db.get(i); i += 1 }
      case Fixed(1, true, _) => while (i < n) { out(i) = data(i).toDouble; i += 1 }
      case Fixed(2, true, _) =>
        val sb = bb.asShortBuffer()
        while (i < n) { out(i) = sb.get(i).toDouble; i += 1 }
      case Fixed(4, true, _) =>
        val ib = bb.asIntBuffer()
        while (i < n) { out(i) = ib.get(i).toDouble; i += 1 }
      case Fixed(8, true, _) =>
        val lb = bb.asLongBuffer()
        while (i < n) { out(i) = lb.get(i).toDouble; i += 1 }
      case Fixed(1, false, _) => while (i < n) { out(i) = (data(i) & 0xFF).toDouble; i += 1 }
      case Fixed(2, false, _) =>
        val sb = bb.asShortBuffer()
        while (i < n) { out(i) = (sb.get(i) & 0xFFFF).toDouble; i += 1 }
      case Fixed(4, false, _) =>
        val ib = bb.asIntBuffer()
        while (i < n) { out(i) = (ib.get(i) & 0xFFFFFFFFL).toDouble; i += 1 }
      case Fixed(8, false, _) =>
        val lb = bb.asLongBuffer()
        while (i < n) { out(i) = unsignedLongToDouble(lb.get(i)); i += 1 }
      case other => throw new IllegalStateException(s"not numeric: $other")
    }
    out
  }

  // ----------------------------------------------------------- attributes --

  private def parseAttribute(bytes: Array[Byte], off: Int): Option[(String, String)] =
    parseAttribute(bytes, bytes, off)

  /** `buf` holds the attribute MESSAGE bytes (the file itself, or a
    * decompressed filtered-heap block); `bytes` stays the whole file —
    * vlen values dereference its global heap. */
  private def parseAttribute(bytes: Array[Byte], buf: Array[Byte],
      off: Int): Option[(String, String)] = {
    val bb = bufAt(buf, off.toLong)
    val version = u8(bb)
    require(version >= 1 && version <= 3, s"attribute message v$version")
    val flags = u8(bb) // v1: reserved (0); v2/3: flags (shared types unsupported)
    if (version > 1) require(flags == 0, "shared attribute datatypes not supported")
    val nameSize = u16(bb)
    val dtSize = u16(bb)
    val dsSize = u16(bb)
    if (version == 3) u8(bb) // name character-set encoding
    def padded(n: Int): Int = if (version == 1) (n + 7) & ~7 else n
    val nameStart = bb.position()
    val rawName = take(bb, nameSize)
    val nul = rawName.indexOf(0.toByte)
    val name = new String(rawName, 0, if (nul < 0) rawName.length else nul, "UTF-8")
    bb.position(nameStart + padded(nameSize))
    val dtStart = bb.position()
    // Attributes are opaque metadata for our reads: a datatype the parser
    // does not support (vlen, array-typed or nested compound members, ...)
    // skips the attribute like the compound skip below — loud failure is
    // reserved for DATASET datatypes, where data would be misread.
    val dt = try parseDatatype(bb) catch {
      case _: UnsupportedOperationException => return None
    }
    bb.position(dtStart + padded(dtSize))
    val dsStart = bb.position()
    val (dims, _, isNull) = parseDataspaceFull(bb)
    bb.position(dsStart + padded(dsSize))
    // Scalar attrs decode to their value; SMALL ARRAY attrs decode to a
    // comma-joined flat list — numeric (the NeXus `vector`/`offset`
    // shape on NXtransformations) and string (the NeXus `axes` name
    // list; fixed-width or vlen elements at the type's stride) — the
    // same rendering the synthetic `dims` attr already uses, so
    // consumers split on ','. A null dataspace or zero-size shape has
    // NO data bytes on disk — reading dt.size bytes would decode
    // padding as a value. Compound-typed attrs are opaque metadata for
    // our reads — skipped, not a file-aborting failure. Reference-typed
    // attrs are also skipped: attribute values surface as strings and
    // the address->path map is not available at attribute time.
    // Oversized arrays (> MaxAttrElems — a megabyte array attr is data
    // mislabeled as metadata) skip too.
    val n = dims.product
    val smallArray = n > 1 && n <= MaxAttrElems &&
      (dt.isInstanceOf[Fixed] || dt.isInstanceOf[Flt] ||
        dt.isInstanceOf[Str] || dt == VlenStr)
    if (isNull || dt.isInstanceOf[Compound] || dt.isInstanceOf[ArrayT] ||
      dt.isInstanceOf[ObjRef] || dt.isInstanceOf[ObjRef2] ||
      dt.isInstanceOf[RegionRef] || dt.isInstanceOf[RegionRef2] ||
      dt.isInstanceOf[AttrRef2] ||
      (n != 1 && !smallArray)) return None
    // the value bytes live inside this message: a corrupted datatype
    // size must not drive the allocation past the message's remaining
    // bytes (take allocates before the buffer read would throw)
    val need = dt.size.toLong * n
    require(need >= 0 && need <= bb.remaining(),
      s"attribute claims $need value bytes, ${bb.remaining()} in message")
    val data = take(bb, need.toInt)
    val value = dt match {
      case Str(_) | VlenStr if n > 1 =>
        (0 until n.toInt).map { k =>
          decodeString(bytes, java.util.Arrays.copyOfRange(
            data, k * dt.size, (k + 1) * dt.size), dt)
        }.mkString(",")
      case Str(_) | VlenStr => decodeString(bytes, data, dt)
      case _ if n == 1 => decodeF64(data, dt, 0).toString
      case _ => decodeArrayF64(data, dt, n.toInt).mkString(",")
    }
    Some(name -> value)
  }

  // ------------------------------------------------------------- the walk --

  /** "/a/./b/../c" -> "/a/c" — shared by soft-link and external-link object
    * paths. */
  private def normalizePath(p: String): String = {
    val out = p.split("/").filter(s => s.nonEmpty && s != ".")
      .foldLeft(List.empty[String]) {
        case (acc, "..") => if (acc.nonEmpty) acc.init else acc
        case (acc, seg) => acc :+ seg
      }
    "/" + out.mkString("/")
  }

  def read(bytes: Array[Byte]): Seq[Node] = read(bytes, _ => None)

  /** Parse with external-link resolution: `resolve` maps a link's target
    * file name (exactly as stored in the link message — typically a sibling
    * file name like `data_000001.h5`) to that file's bytes. The target
    * object — or, for a group target, its whole subtree — grafts in at the
    * link path, matching h5py's transparent traversal. A file already open
    * in the current cross-file chain is not re-entered (cycle guard), and
    * any link whose file or object cannot be resolved degrades to the
    * marker node, never an error. */
  def read(bytes: Array[Byte], resolve: String => Option[Array[Byte]]): Seq[Node] =
    readGuarded(bytes, resolve, Set.empty)

  /** `rawSink`, when non-null, collects every dataset's (dims, datatype,
    * raw bytes) by path — the virtual-storage reader uses it to pull a
    * SOURCE dataset's elements out of a sibling file with the same walk
    * that external links use (one code path, same cycle guard). */
  private def readGuarded(
      bytes: Array[Byte],
      resolve: String => Option[Array[Byte]],
      openFiles: Set[String],
      rawSink: mutable.Map[String, (Seq[Long], DType, Array[Byte])] = null)
      : Seq[Node] = {
    val bb = bufAt(bytes, 0L)
    val magic = take(bb, 8)
    require(magic.sameElements(Array(0x89, 'H', 'D', 'F', 0x0D, 0x0A, 0x1A, 0x0A)
      .map(_.toByte)), "not an HDF5 file")
    val version = u8(bb)
    val rootAddr = version match {
      case 0 =>
        val b = bufAt(bytes, 8L)
        u8(b); u8(b); u8(b); u8(b); u8(b) // versions
        require(u8(b) == 8 && u8(b) == 8, "only 8-byte offsets/lengths supported")
        u8(b); u16(b); u16(b); u32(b) // reserved, ks, flags
        u64(b); u64(b); u64(b); u64(b) // base, freespace, eof, driver
        u64(b) // root STE: link name offset
        u64(b) // root object header address
      case 2 | 3 =>
        val b = bufAt(bytes, 9L)
        require(u8(b) == 8 && u8(b) == 8, "only 8-byte offsets/lengths supported")
        u8(b) // flags
        u64(b); u64(b); u64(b) // base, extension, eof
        u64(b) // root object header address
      case v => throw new UnsupportedOperationException(s"superblock v$v")
    }

    val nodes = mutable.ArrayBuffer.empty[Node]
    // NeXus relies on hard links for aliases (the same object header
    // reachable under several paths), so every path gets a node; parsed
    // headers/datasets are cached by address, and an ancestor stack (not a
    // global visited set) guards against true cycles.
    val headerCache = mutable.Map.empty[Long, Seq[Msg]]
    val datasetCache =
      mutable.Map.empty[Long, (Node, (Seq[Long], DType, Option[Array[Byte]]))]
    val softLinks = mutable.ArrayBuffer.empty[(String, String)] // alias -> target
    // first path seen per object-header address — the canonical name an
    // object reference resolves to (libhdf5's H5Rget_name also returns
    // one arbitrary-but-stable path for a multiply-hard-linked object)
    val addrToPath = mutable.Map.empty[Long, String]

    def visit(addr: Long, path: String, ancestors: List[Long]): Unit = {
      if (addr == UNDEF || ancestors.contains(addr)) return
      addrToPath.getOrElseUpdate(addr, path)
      val msgs = headerCache.getOrElseUpdate(addr, parseObjectHeader(bytes, addr))
      val byType = msgs.groupBy(_.mtype)
      val links =
        byType.getOrElse(0x11, Nil).flatMap(m => childrenV0(bytes, m.off)) ++
          byType.getOrElse(0x06, Nil).map(m => linkChild(bytes, m.off)) ++
          byType.getOrElse(0x02, Nil).flatMap(m => denseLinks(bytes, m.off))
      if (links.nonEmpty || !byType.contains(0x03)) {
        links.foreach {
          case HardLink(name, child) => visit(child, s"$path/$name", addr :: ancestors)
          case SoftLink(name, target) => softLinks += ((s"$path/$name", target))
          case ExternalLink(name, file, objPath) =>
            val linkPath = s"$path/$name"
            val grafted: Seq[Node] =
              if (openFiles.contains(file)) Nil // cross-file cycle: stop here
              else resolve(file) match {
                case Some(targetBytes) =>
                  val target = normalizePath(objPath)
                  readGuarded(targetBytes, resolve, openFiles + file).collect {
                    case tn if tn.path == target => tn.copy(path = linkPath)
                    case tn if tn.path.startsWith(target + "/") =>
                      tn.copy(path = linkPath + tn.path.stripPrefix(target))
                  }
                case None => Nil
              }
            if (grafted.nonEmpty) nodes ++= grafted
            else // unresolvable (missing file/object, or a cycle) — surfaced
              // as an explicit marker node, never a silent hole
              nodes += Node(linkPath, Nil, None, None, None, None,
                Map("external_link_file" -> file, "external_link_path" -> objPath))
        }
      } else {
        val (node, rawInfo) = datasetCache.getOrElseUpdate(addr, {
          val (dims, maxdims, _) =
            parseDataspaceFull(bufAt(bytes, byType(0x01).head.off.toLong))
          val dt = parseDatatype(bufAt(bytes, byType(0x03).head.off.toLong))
          val filters = byType.get(0x0B).map(m => parseFilters(bytes, m.head.off))
            .getOrElse(Nil)
          val attrs = (byType.getOrElse(0x0C, Nil)
            .flatMap(m => parseAttribute(bytes, m.off)) ++
            byType.getOrElse(0x15, Nil).flatMap(m => denseAttrs(bytes, m.off))
            ).toMap
          val layOff = byType(0x08).head.off
          val lb = bufAt(bytes, layOff.toLong)
          val lver = u8(lb)
          val (raw, vattrs) =
            if (lver == 4 && u8(lb) == 3) // virtual storage: resolver needed
              readVirtual(bytes, u64(lb), u32(lb).toInt, dims, dt,
                resolve, openFiles)
            else
              (readLayout(bytes, layOff, dims, maxdims, dt, filters),
                Map.empty[String, String])
          // array-typed elements fold into trailing dims AFTER the layout
          // read (chunk geometry is in dataspace dims with whole-array
          // element size); everything downstream sees the base type
          val (ndims, ndt) = normalizeArray(dims, dt)
          (buildNode(bytes, path, ndims, ndt, raw, attrs ++ vattrs),
            (ndims, ndt, raw))
        })
        nodes += node.copy(path = path)
        rawInfo match {
          case (d, c: Compound, Some(r)) =>
            nodes ++= compoundChildren(bytes, path, d, c, r)
          case _ => ()
        }
        if (rawSink != null) rawInfo match {
          case (d, t, Some(r)) if !t.isInstanceOf[Compound] =>
            rawSink(path) = (d, t, r)
          case _ => ()
        }
      }
    }

    visit(rootAddr, "", Nil)

    // Resolve object-reference datasets to the referenced object's path,
    // now that every address has been walked (forward references are
    // legal). Runs BEFORE soft-link aliasing so alias copies inherit the
    // resolved value. A dangling address (never an object header we
    // visited) becomes a marker attribute — inspectable, never silent.
    var ri = 0
    while (ri < nodes.length) {
      val n = nodes(ri)
      n.refAddr.foreach { refAddr =>
        nodes(ri) = addrToPath.get(refAddr) match {
          case Some(p) =>
            n.copy(scalarStr = Some(if (p.isEmpty) "/" else p),
              refAddr = None)
          case None =>
            // the marker is deliberately a user-visible attrs entry; a
            // genuine user attribute under the same name must not be
            // silently overwritten — loud beats silent, as everywhere
            require(!n.attrs.contains("unresolved_object_ref"),
              s"user attribute 'unresolved_object_ref' collides with the " +
                s"dangling-reference marker at ${n.path}")
            n.copy(refAddr = None, attrs = n.attrs +
              ("unresolved_object_ref" -> refAddr.toString))
        }
      }
      ri += 1
    }

    // Resolve soft links to alias nodes. Targets may be absolute or
    // relative to the link's parent group and may point at groups (alias
    // the whole subtree) or chain through other soft links (multiple
    // passes); anything still dangling after the passes becomes an explicit
    // marker node — present, inspectable, never a silent hole.
    var pending = softLinks.toList.map { case (alias, target0) =>
      val target = if (target0.startsWith("/")) target0
        else alias.substring(0, alias.lastIndexOf('/') + 1) + target0
      (alias, normalizePath(target))
    }
    var pass = 0
    while (pending.nonEmpty && pass < 8) {
      val (resolvable, dangling) = pending.partition { case (_, target) =>
        nodes.exists(n => n.path == target || n.path.startsWith(target + "/"))
      }
      if (resolvable.isEmpty) { pass = 8 } // nothing left can resolve
      else {
        val aliases = resolvable.flatMap { case (alias, target) =>
          nodes.toList.collect {
            case n if n.path == target => n.copy(path = alias)
            case n if n.path.startsWith(target + "/") =>
              n.copy(path = alias + n.path.stripPrefix(target))
          }
        }
        nodes ++= aliases
        pending = dangling
        pass += 1
      }
    }
    pending.foreach { case (alias, target) =>
      nodes += Node(alias, Nil, None, None, None, None,
        Map("unresolved_soft_link" -> target))
    }
    nodes.toSeq
  }

  /** Parse the filter-pipeline message into the typed filter chain.
    * Supported: deflate (1), shuffle (2, element size from cd_values 0),
    * fletcher32 (3), HDF5Plugin LZ4 (32004), bitshuffle (32008 — the
    * Eiger detector default, cd_values = [major, minor, elem, block,
    * compression]), and Zstandard (32015). Anything else (szip, nbit,
    * scaleoffset, other plugins) fails loudly. */
  private def parseFilters(bytes: Array[Byte], off: Int): Seq[H5Filter] = {
    val bb = bufAt(bytes, off.toLong)
    val version = u8(bb)
    val nfilters = u8(bb)
    if (version == 1) bb.position(bb.position() + 6)
    (0 until nfilters).map { _ =>
      val id = u16(bb)
      val nameLen = if (version == 2 && id < 256) 0 else u16(bb)
      u16(bb) // flags
      val nvals = u16(bb)
      bb.position(bb.position() + nameLen)
      val values = (0 until nvals).map(_ => u32(bb))
      if (version == 1 && nvals % 2 == 1) bb.position(bb.position() + 4)
      id match {
        case 1 => Deflate
        case 2 => Shuffle(values.headOption.getOrElse(0L).toInt)
        case 3 => Fletcher32
        case 32004 => Lz4
        case 32008 =>
          val comp = values.lift(4).getOrElse(0L)
          require(comp == 0L || comp == 2L, s"bitshuffle compression mode $comp")
          Bitshuffle(values.lift(3).getOrElse(0L).toInt, lz4 = comp == 2L)
        case 32015 => Zstd
        case other => throw new UnsupportedOperationException(
          s"unsupported filter id $other " +
            "(deflate/shuffle/fletcher32/lz4/bitshuffle/zstd only)")
      }
    }
  }

  /** Largest CHUNKED-dataset materialization readLayout will attempt.
    * Instrument frames are MBs and the pipeline's biggest legitimate
    * reads (multi-hundred-frame image stacks) stay well under this. A
    * corrupted dims field claiming more must fail loudly BEFORE any
    * allocation — a sparse chunked extent cannot be bounded by the file
    * length (unwritten cells occupy zero bytes), so an explicit ceiling
    * is the only wrap-free guard there. Compact/contiguous layouts are
    * bounded by the file's own bytes instead (the data physically
    * exists), so a legitimate contiguous dataset above this ceiling
    * still reads. VDS keeps its own larger degrade-to-marker bound. */
  private val MaxDatasetBytes = 512L << 20

  private def readLayout(
      bytes: Array[Byte], off: Int, dims: Seq[Long], maxdims: Seq[Long],
      dt: DType, filters: Seq[H5Filter]): Option[Array[Byte]] = {
    val claim =
      try math.multiplyExact(dims.product, dt.size.toLong)
      catch {
        case _: ArithmeticException => throw new IllegalArgumentException(
          s"dataset byte count overflows ($dims x ${dt.size})")
      }
    val bb = bufAt(bytes, off.toLong)
    val version = u8(bb)
    require(version == 3 || version == 4, s"data layout v$version (v3/v4 supported)")
    u8(bb) match {
      case 0 => // compact: u16 size + inline data (u16 bounds the read)
        val size = u16(bb)
        // the u16 bounds the READ, but a corrupted dims field can still
        // claim billions of elements: downstream decoders take an Int
        // element count, so an unchecked claim would wrap through .toInt
        // and silently yield a truncated (or empty) array — the partial
        // read the caller cannot detect. Compact data must fit its own
        // inline size.
        require(claim <= size,
          s"compact dataset claims $claim bytes (> inline size $size)")
        Some(take(bb, size))
      case 1 =>
        // Contiguous data physically exists in the file, so the file's own
        // length is the natural allocation bound — the explicit ceiling
        // would wrongly reject a legitimate 512 MiB..2 GiB dataset.
        require(claim <= bytes.length,
          s"contiguous dataset claims $claim bytes (> file size ${bytes.length})")
        readContiguous(bytes, bb.position())
      case 2 =>
        // Chunked extents are SPARSE: unwritten cells occupy zero file
        // bytes, so the file length cannot bound the materialization and
        // the explicit ceiling is the only wrap-free guard.
        require(claim <= MaxDatasetBytes,
          s"chunked dataset claims $claim bytes (> $MaxDatasetBytes single-read bound)")
        if (version == 3) readChunked(bytes, bb.position(), dims, dt.size, filters)
        else readChunkedV4(bytes, bb.position(), dims, maxdims, dt.size, filters)
      case c => throw new UnsupportedOperationException(s"layout class $c")
    }
  }

  private def buildNode(
      bytes: Array[Byte], path: String, dims: Seq[Long], dt: DType,
      raw: Option[Array[Byte]], attrs: Map[String, String]): Node = {
    val elems = if (dims.isEmpty) 1L else dims.product
    val empty = Node(path, dims, None, None, None, None, attrs)
    raw match {
      case None => empty
      case Some(data) =>
        dt match {
          case Str(_) | VlenStr =>
            // silently keeping element 0 of an N-string dataset would be a
            // partial read the caller cannot detect — fail loudly instead
            if (elems > 1) throw new UnsupportedOperationException(
              s"string ARRAY dataset ($elems elements) not supported at $path")
            empty.copy(scalarStr = Some(decodeString(bytes, data.take(dt.size), dt)))
          case c: Compound =>
            // the members surface as CHILD nodes (compoundChildren); the
            // dataset node itself carries the member list for discovery
            empty.copy(attrs = attrs +
              ("compound_members" -> c.members.map(_.name).mkString(",")))
          case ObjRef(_) =>
            // scalar only, same policy as strings: silently keeping element
            // 0 of a reference ARRAY would be an undetectable partial read
            if (elems > 1) throw new UnsupportedOperationException(
              s"object-reference ARRAY dataset ($elems elements) not supported at $path")
            val addr = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN).getLong(0)
            if (addr == 0L || addr == UNDEF)
              empty.copy(scalarStr = Some("")) // null reference, h5py's None
            else // resolved to a path AFTER the walk (forward refs are legal)
              empty.copy(refAddr = Some(addr))
          case ObjRef2(_) =>
            // scalar only, same policy as rtype-0 object references
            if (elems > 1) throw new UnsupportedOperationException(
              s"object-reference ARRAY dataset ($elems elements) not supported at $path")
            ref2Blob(bytes, data, path, expectType = 2) match {
              case Ref2Null => empty.copy(scalarStr = Some(""))
              case Ref2Dangling(id) =>
                // dangling heap handle: same inspectable-marker policy
                // as rtype 1, under the object-reference marker name
                require(!attrs.contains("unresolved_object_ref"),
                  s"user attribute 'unresolved_object_ref' collides with " +
                    s"the dangling-reference marker at $path")
                empty.copy(attrs = attrs + ("unresolved_object_ref" -> id))
              case Ref2Blob(obj) =>
                // object blob = token part ONLY: 1-byte size + the token
                val (addr, consumed) = ref2Token(obj, path)
                require(consumed == obj.length,
                  s"revised object reference blob has ${obj.length - consumed} " +
                    s"trailing bytes at $path (token-only blobs expected)")
                if (addr == 0L || addr == UNDEF)
                  empty.copy(scalarStr = Some(""))
                else // resolved to a path AFTER the walk, like rtype 0
                  empty.copy(refAddr = Some(addr))
            }
          case RegionRef2(_) =>
            // scalar only, same policy as the other reference forms
            if (elems > 1) throw new UnsupportedOperationException(
              s"region-reference ARRAY dataset ($elems elements) not supported at $path")
            ref2Blob(bytes, data, path, expectType = 3) match {
              case Ref2Null => empty.copy(scalarStr = Some(""))
              case Ref2Dangling(id) =>
                require(!attrs.contains("unresolved_region_ref"),
                  s"user attribute 'unresolved_region_ref' collides with " +
                    s"the dangling-region-reference marker at $path")
                empty.copy(attrs = attrs + ("unresolved_region_ref" -> id))
              case Ref2Blob(obj) =>
                // region blob = token part + region part. Region part
                // (H5R__encode_region): 4-byte LE serialized-selection
                // size (a safety check libhdf5 writes but never reads —
                // WE check it), 4-byte LE extent rank, then the standard
                // H5S selection serialization shared with rtype 1.
                val (addr, consumed) = ref2Token(obj, path)
                require(obj.length >= consumed + 8,
                  s"revised region reference blob ${obj.length} bytes at " +
                    s"$path: no room for the region header after the token")
                val rb = ByteBuffer.wrap(obj, consumed, obj.length - consumed)
                  .order(ByteOrder.LITTLE_ENDIAN)
                val selSize = u32(rb)
                val rank = u32(rb)
                require(rank >= 1 && rank <= 32,
                  s"revised region reference extent rank $rank at $path")
                require(rb.remaining().toLong == selSize,
                  s"revised region reference selection claims $selSize bytes " +
                    s"but ${rb.remaining()} follow the region header at $path")
                val sel = parseSelection(rb, s"revised region reference at $path")
                require(!attrs.contains("region_selection"),
                  s"user attribute 'region_selection' collides with " +
                    s"the region-reference rendering at $path")
                if (addr == 0L || addr == UNDEF)
                  empty.copy(scalarStr = Some(""))
                else // target path resolves AFTER the walk, like rtype 1
                  empty.copy(refAddr = Some(addr), attrs = attrs +
                    ("region_selection" -> selSummary(sel)))
            }
          case AttrRef2(_) =>
            // scalar only, same policy as the other reference forms
            if (elems > 1) throw new UnsupportedOperationException(
              s"attribute-reference ARRAY dataset ($elems elements) not supported at $path")
            ref2Blob(bytes, data, path, expectType = 4) match {
              case Ref2Null => empty.copy(scalarStr = Some(""))
              case Ref2Dangling(id) =>
                require(!attrs.contains("unresolved_attr_ref"),
                  s"user attribute 'unresolved_attr_ref' collides with " +
                    s"the dangling-attribute-reference marker at $path")
                empty.copy(attrs = attrs + ("unresolved_attr_ref" -> id))
              case Ref2Blob(obj) =>
                // attribute blob = token part + name part
                // (H5R__encode_string): 2-byte LE length + the bytes —
                // any length/blob disagreement means the layout is not
                // what we think: loud, never a misread
                val (addr, consumed) = ref2Token(obj, path)
                require(obj.length >= consumed + 2,
                  s"revised attribute reference blob ${obj.length} bytes " +
                    s"at $path: no room for the name length after the token")
                val nameLen = ((obj(consumed) & 0xFF) |
                  ((obj(consumed + 1) & 0xFF) << 8))
                require(obj.length == consumed + 2 + nameLen,
                  s"revised attribute reference name claims $nameLen bytes " +
                    s"but ${obj.length - consumed - 2} follow at $path")
                val name = new String(obj, consumed + 2, nameLen,
                  java.nio.charset.StandardCharsets.UTF_8)
                require(!attrs.contains("referenced_attribute"),
                  s"user attribute 'referenced_attribute' collides with " +
                    s"the attribute-reference rendering at $path")
                if (addr == 0L || addr == UNDEF)
                  empty.copy(scalarStr = Some(""))
                else // owner path resolves AFTER the walk, like rtype 2
                  empty.copy(refAddr = Some(addr), attrs = attrs +
                    ("referenced_attribute" -> name))
            }
          case RegionRef(_) =>
            // scalar only, same policy as object references
            if (elems > 1) throw new UnsupportedOperationException(
              s"region-reference ARRAY dataset ($elems elements) not supported at $path")
            val hb = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
            val collectionAddr = hb.getLong(0)
            val index = hb.getInt(8)
            if (collectionAddr == 0L || collectionAddr == UNDEF || index == 0)
              empty.copy(scalarStr = Some("")) // null reference, h5py's None
            else gcolObject(bytes, collectionAddr, index) match {
              case None =>
                // collection exists but the object index does not — a
                // dangling handle gets the same inspectable-marker policy
                // as dangling object references, never a silent hole
                require(!attrs.contains("unresolved_region_ref"),
                  s"user attribute 'unresolved_region_ref' collides with " +
                    s"the dangling-region-reference marker at $path")
                empty.copy(attrs = attrs + ("unresolved_region_ref" ->
                  s"$collectionAddr/$index"))
              case Some(obj) =>
                // heap object = target object-header address + serialized
                // dataspace selection (libhdf5 H5R__encode_heap layout)
                require(obj.length >= 8,
                  s"region-reference heap object ${obj.length} bytes at $path")
                val ob = ByteBuffer.wrap(obj).order(ByteOrder.LITTLE_ENDIAN)
                val objAddr = ob.getLong()
                val sel = parseSelection(ob, s"region reference at $path")
                // same loud-collision policy as the dangling branch: a
                // legal user attribute literally named region_selection
                // must not be silently overwritten by our rendering
                require(!attrs.contains("region_selection"),
                  s"user attribute 'region_selection' collides with " +
                    s"the region-reference rendering at $path")
                // target path resolves AFTER the walk, like object refs;
                // the selection is rendered now, from this file's bytes
                empty.copy(refAddr = Some(objAddr), attrs = attrs +
                  ("region_selection" -> selSummary(sel)))
            }
          case _ if elems == 1 =>
            empty.copy(scalarF64 = Some(decodeF64(data, dt, 0)))
          case Flt(4, _) =>
            // f32 stays f32 (lossless); everything wider or integral goes
            // to f64 — int32/int64 sentinels like 0xFFFFFFFF exceed Float's
            // 24-bit mantissa and would silently round
            val arr = decodeArrayF64(data, dt, elems.toInt)
            val out = new Array[Float](arr.length)
            var i = 0
            while (i < out.length) { out(i) = arr(i).toFloat; i += 1 }
            empty.copy(f32Data = Some(out))
          case _ =>
            empty.copy(f64Data = Some(decodeArrayF64(data, dt, elems.toInt)))
        }
    }
  }

  /** Outcome of reading a revised (HDF5 1.12 H5T_STD_REF) reference's
    * 18-byte disk element: the null reference, a dangling global-heap
    * handle (rendered as an inspectable `addr/index` marker), or the
    * resolved heap blob (the encoded reference minus its 2-byte header —
    * token part, plus the region part for rtype 3). */
  private sealed trait Ref2Elem
  private case object Ref2Null extends Ref2Elem
  private case class Ref2Dangling(id: String) extends Ref2Elem
  private case class Ref2Blob(blob: Array[Byte]) extends Ref2Elem

  /** Shared element decode for the revised reference forms (rtype 2 and
    * 3 — H5T__ref_disk_write's layout is reference-type-agnostic):
    * 1-byte ref type + 1-byte flags + 4-byte blob size + 12-byte
    * global-heap blob ID. A zero ref-type byte is the null (never-
    * written) reference (H5T__ref_disk_isnull's test); external
    * references (flags bit 0: the blob embeds a foreign filename) fail
    * loudly — cross-file addresses are not resolvable from this file's
    * bytes. The blob size cross-checks the heap object length: any
    * disagreement means the layout is not what we think — loud, never a
    * misread. */
  private def ref2Blob(bytes: Array[Byte], data: Array[Byte], path: String,
      expectType: Int): Ref2Elem = {
    val eb = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    val refType = u8(eb)
    val refFlags = u8(eb)
    val blobSize = u32(eb)
    val collectionAddr = u64(eb)
    val index = u32(eb).toInt
    if (refType == 0) Ref2Null
    else {
      require(refType == expectType,
        s"revised reference element type byte $refType at $path does " +
          s"not match its rtype-$expectType dataset datatype")
      if ((refFlags & 0x1) != 0) throw new UnsupportedOperationException(
        s"external revised reference at $path (flags bit 0): the blob " +
          "embeds a foreign filename; cross-file addresses are not " +
          "resolvable from this file's bytes")
      require(refFlags == 0,
        s"revised reference flags $refFlags at $path (only the " +
          "external bit is defined; others indicate a misread)")
      if (collectionAddr == 0L || collectionAddr == UNDEF || index == 0)
        Ref2Null // null blob ID
      else gcolObject(bytes, collectionAddr, index) match {
        case None => Ref2Dangling(s"$collectionAddr/$index")
        case Some(obj) =>
          require(obj.length.toLong == blobSize,
            s"revised reference blob ${obj.length} bytes at $path, " +
              s"element header claims $blobSize")
          Ref2Blob(obj)
      }
    }
  }

  /** Token part of a revised reference blob (H5R__encode_obj_token):
    * 1-byte token size + the token, which for files written by the
    * native VOL connector is the 8-byte little-endian object-header
    * address (H5VL_native_addr_to_token). Returns (address, bytes
    * consumed). */
  private def ref2Token(obj: Array[Byte], path: String): (Long, Int) = {
    require(obj.length >= 1, s"empty revised reference blob at $path")
    val tokenSize = obj(0) & 0xFF
    require(tokenSize == 8 && obj.length >= 9,
      s"revised reference token size $tokenSize in a " +
        s"${obj.length}-byte blob at $path (8-byte native-VOL " +
        "address tokens only)")
    (ByteBuffer.wrap(obj, 1, 8).order(ByteOrder.LITTLE_ENDIAN).getLong, 9)
  }

  /** Deterministic, inspectable rendering of a region reference's
    * selection for the `region_selection` attribute. Slabs and disjoint
    * block unions render as half-open per-dim ranges (`start:end`, blocks
    * `;`-separated — the h5py-slice reading of the region); point and
    * strided selections summarize by shape rather than enumerate. */
  private def selSummary(sel: Option[Sel]): String = sel match {
    case None => "none"
    case Some(AllSel) => "all"
    case Some(SlabSel(start, count)) =>
      start.zip(count).map { case (s, c) => s"$s:${s + c}" }.mkString(",")
    case Some(MultiBlockSel(blocks)) =>
      blocks.map(b => b.start.zip(b.count)
        .map { case (s, c) => s"$s:${s + c}" }.mkString(",")).mkString(";")
    case Some(PointSel(points)) => s"points:${points.size}"
    case Some(StridedSel(start, stride, count, block)) =>
      s"strided:start=${start.mkString(",")};stride=${stride.mkString(",")};" +
        s"count=${count.mkString(",")};block=${block.mkString(",")}"
    case Some(u: UnlimSel) => "unlimited"
  }

  /** Flat compound dataset -> one child node per member (`<path>/<name>`),
    * the long-table form of h5py's structured array: numeric members of a
    * scalar dataset read as scalars, of an array dataset as f64 columns;
    * string members scalar-only (string ARRAYs fail loudly, same rule as
    * plain datasets). */
  private def compoundChildren(
      bytes: Array[Byte], path: String, dims: Seq[Long], cdt: Compound,
      raw: Array[Byte]): Seq[Node] = {
    // same allocation guard as decodeArrayF64, in LONG math BEFORE any
    // Int truncation (a product wrapping toInt would pass a small-value
    // check and silently truncate the member columns): the raw buffer
    // (sized from the file) must hold every row — dims.product is
    // wrap-free by parseDataspaceFull's validation
    val elemsL = if (dims.isEmpty) 1L else dims.product
    require(cdt.size > 0, s"compound row stride ${cdt.size}")
    require(math.multiplyExact(elemsL, cdt.size.toLong) <= raw.length,
      s"$elemsL compound rows claimed but only ${raw.length} data bytes")
    val elems = elemsL.toInt
    cdt.members.map { m =>
      val mpath = s"$path/${m.name}"
      def slice(k: Int): Array[Byte] = {
        val base = k * cdt.size + m.offset
        java.util.Arrays.copyOfRange(raw, base, base + m.dt.size)
      }
      m.dt match {
        case Str(_) | VlenStr => // vlen resolves through the global heap
          if (elems > 1) throw new UnsupportedOperationException(
            s"string ARRAY compound member not supported at $mpath")
          Node(mpath, dims, None, Some(decodeString(bytes, slice(0), m.dt)),
            None, None, Map.empty)
        case ArrayT(base, adims) =>
          // array member: each row carries a fixed-shape block; rows
          // concatenate to one f64 column with dims = dataset dims ++
          // member dims (h5py's structured-dtype view of a subarray
          // field). Each row's block is contiguous, so bulk-decode it —
          // one copy + one buffer wrap per ROW, not per element (same
          // rationale as decodeArrayF64's own doc)
          val per = adims.product
          // corrupted member dims must not drive a pathological
          // allocation (or a silent zero-pad from copyOfRange): the
          // member's block must fit its slot in the row stride
          require(per >= 0 && m.offset + per.toLong * base.size <= cdt.size,
            s"array member '${m.name}' claims $per x ${base.size} bytes " +
              s"at offset ${m.offset} in a ${cdt.size}-byte compound")
          val vals = new Array[Double](elems * per)
          var k = 0
          while (k < elems) {
            val at = k * cdt.size + m.offset
            val block = decodeArrayF64(
              java.util.Arrays.copyOfRange(raw, at, at + per * base.size),
              base, per)
            System.arraycopy(block, 0, vals, k * per, per)
            k += 1
          }
          Node(mpath, dims ++ adims.map(_.toLong), None, None, None,
            Some(vals), Map.empty)
        case mdt =>
          if (elems == 1)
            Node(mpath, dims, Some(decodeF64(slice(0), mdt, 0)),
              None, None, None, Map.empty)
          else
            Node(mpath, dims, None, None, None,
              Some(Array.tabulate(elems)(k => decodeF64(slice(k), mdt, 0))),
              Map.empty)
      }
    }
  }

  // --------------------------------------------------------- tree mapping --

  /** Map a parsed file onto the long-format tree-table contract
    * ([[graft.pipeline.TreeTable.TreeRow]]): one row per dataset with the
    * typed value columns and the `units` attribute the reference's
    * quantity reads expect. Array dims travel in attrs as "dims". */
  def toTreeRows(file: String, bytes: Array[Byte]): Seq[graft.pipeline.TreeTable.TreeRow] =
    toTreeRows(file, bytes, _ => None)

  def toTreeRows(
      file: String,
      bytes: Array[Byte],
      resolve: String => Option[Array[Byte]]): Seq[graft.pipeline.TreeTable.TreeRow] =
    read(bytes, resolve).map { n =>
      val withDims =
        if (n.dims.isEmpty) n.attrs
        else n.attrs + ("dims" -> n.dims.mkString(","))
      graft.pipeline.TreeTable.TreeRow(
        file = file,
        path = n.path,
        valueF64 = n.scalarF64,
        valueStr = n.scalarStr,
        valueArr = n.f32Data.orElse(n.f64Data.map(_.map(_.toFloat))),
        units = n.attrs.get("units"),
        attrs = withDims - "units")
    }
}
