package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.Inflater
import scala.collection.mutable.ArrayBuffer

/** Minimal from-scratch HDF5 reader — the data path behind NetCDF-4.
  *
  * The reference's PRIMARY data file is a NetCDF-4 GOES EXIS product
  * (reference goes_satellite_etl.py:133-388 reads
  * `test_downloads/OR_EXIS-L1b-SFXR_G18_*.nc` via the netCDF4
  * library), and NetCDF-4 is an HDF5 container. This object parses,
  * from the public HDF5 File Format Specification, exactly the
  * feature set those products (and netCDF-4 files generally) use:
  *
  *  - superblock v0 and v2/v3 (8-byte offsets/lengths)
  *  - object headers v1 (unsigned, 8-byte aligned messages) and v2
  *    (`OHDR`, with `OCHK` continuation blocks)
  *  - lookup3 checksums VERIFIED on every v2-era structure read
  *    (round 12): superblock v2/v3, OHDR/OCHK, v2 B-tree header/
  *    internal/leaf nodes, fractal heap header + direct blocks
  *    (whole-block, checksum field zeroed, when FRHP flags it),
  *    Fixed/Extensible Array headers and blocks — corrupted
  *    metadata is a precise error, never a misparse
  *  - old-style groups: symbol-table message → v1 B-tree (`TREE`
  *    type 0) → `SNOD` symbol nodes + local heap (`HEAP`) names
  *  - new-style dense groups: Link Info message → fractal heap
  *    (`FRHP`/`FHDB`/root-level `FHIB`) + v2 name B-tree
  *    (`BTHD`/`BTLF`/depth-1 `BTIN`) — the layout the GOES sample
  *    actually uses (creation-order tracking forces dense storage)
  *  - compact Link messages (small new-style groups)
  *  - datatypes: fixed-point (1/2/4/8 B, either endianness, signed
  *    or not), IEEE float (4/8 B), fixed-size strings,
  *    variable-length STRINGS (r13: class-9 descriptors resolved
  *    through `GCOL` global heap collections — the netCDF-4 string
  *    variable/attribute encoding; null descriptors read as empty),
  *    variable-length SEQUENCES with numeric bases (r15: ragged
  *    per-record vectors via [[readDoubleSeqs]]), COMPOUND
  *    datatypes v1-v3 (r15: per-member column reads via
  *    [[readCompoundDoubles]]/[[readCompoundStrings]]/
  *    [[readCompoundArrays]] — the table-shaped calibration/legend
  *    datasets), ENUMS over fixed-point bases (r15: values decode as
  *    the base everywhere, [[enumLabels]] carries the flag legend),
  *    and ARRAY datatypes v2/v3 — as compound members AND as
  *    standalone datasets (per-record fixed blocks via
  *    [[readArrayBlocks]])
  *  - dataspace v1/v2; layout v3 AND v4 compact / contiguous /
  *    chunked (v4 = libver-latest encodings)
  *  - chunk indexes: v1 B-tree (`TREE` type 1, any nesting level)
  *    plus the full v4 family — Single Chunk (filtered or not),
  *    Implicit, Fixed Array (`FAHD`/`FADB`, inline or paged data
  *    blocks, clients 0/1), Extensible Array (`EAHD`/`EAIB`/`EASB`/
  *    `EADB`, inline AND paged super-block data blocks with H5VM
  *    page-init bitmaps, any unlimited dimension via the swizzled
  *    chunk order — r13), and v2 B-tree records types 10/11; v4
  *    flag bit 0 (partial boundary chunks stored unfiltered) honored
  *  - filters: deflate (1), shuffle (2), fletcher32 (3) in any
  *    pipeline order, applied write-reverse on read; fletcher32
  *    checksums are VERIFIED (round 12) — a corrupt chunk is a
  *    precise error, not silently-wrong data
  *  - compact attribute messages v1/v3 (numeric + string values) —
  *    enough for `units` / `scale_factor` / `add_offset` /
  *    `_FillValue` — AND dense attribute storage (r15: Attribute
  *    Info message → fractal heap of serialized attribute messages
  *    indexed by a type-8 v2 name B-tree, the layout libver-latest
  *    switches to past ~8 attributes; reuses the dense-group
  *    structures verbatim)
  *  - SHARED messages (r19): committed targets (a message living in
  *    another object header — H5Tcommit named datatypes, and the
  *    v1/v2 record formats older files carry) and the SOHM table
  *    (superblock extension → Shared Message Table message → SMTB
  *    block → per-index fractal heaps holding the encoded message
  *    bodies; H5Pset_shared_mesg_nindexes files), resolved for
  *    header messages and dense-attribute records alike
  *  - OBJECT references (r19): class-7 values decode as the
  *    referenced header addresses and [[parse]] resolves attribute
  *    references to object paths — covering netCDF-4's
  *    DIMENSION_LIST (vlen of refs) and REFERENCE_LIST (compound
  *    with a ref member) dimension-scale machinery
  *
  * Out of scope, by design (throws with a precise message rather
  * than misreading): paged data blocks attached DIRECTLY to the EA
  * index block (no on-disk owner for their page-init bits; default
  * library geometry never produces them), virtual
  * storage (layout class 3), B-tree v2 depth > 1 and multi-level
  * indirect fractal-heap blocks (groups with ~100k+ links),
  * region references (dataspace-selection heap state), vlen
  * sequences over non-numeric non-reference bases,
  * enums over non-fixed-point bases, and mixed-compound /
  * non-reference vlen-sequence ATTRIBUTE values (names
  * parse, values stay empty).
  *
  * Scale shape: identical to [[NetCdf]] — one file is one task; the
  * byte array arrives via Spark's `binaryFile` source and is parsed
  * entirely executor-side with no driver involvement, so a 100 TB
  * archive of ~MB products parallelizes by file count.
  */
object Hdf5 {

  private val Undef = -1L // 0xffffffffffffffff as signed

  final case class Dtype(cls: Int, size: Int, littleEndian: Boolean,
                         signed: Boolean, vlenString: Boolean = false,
                         base: Option[Dtype] = None,
                         members: Seq[Member] = Seq.empty,
                         labels: Seq[(String, Double)] = Seq.empty,
                         arrayDims: Seq[Int] = Seq.empty)
  /** One compound-datatype member: name, byte offset within the
    * compound element, and the member's own datatype.
    */
  final case class Member(name: String, offset: Int, dtype: Dtype)
  /** One attribute: numeric values in `num` (array-datatype attrs
    * flatten row-major, the [[readDoubles]] convention), strings in
    * `str`, all-numeric COMPOUND attr values as per-member columns
    * in `fields` (r15), and multi-element vlen-string attrs as a
    * REAL sequence in `strs` (r15 — h5py exposes these as string
    * arrays; `str` keeps the ","-joined form for flat consumers) —
    * undecodable shapes keep the name with every payload slot empty.
    *
    * OBJECT-REFERENCE attrs (r19 — plain class-7 values and vlen
    * sequences over them, netCDF-4's DIMENSION_LIST): the referenced
    * header addresses land in `refAddrs` (and in `num` as exact
    * doubles), and [[parse]] resolves them to object PATHS in
    * `strs`/`str` once the whole file is walked. A compound's
    * reference MEMBERS (REFERENCE_LIST) stay raw addresses in
    * `fields` — a member column is numeric by shape.
    */
  final case class Attr(name: String, num: Seq[Double], str: String,
                        fields: Seq[(String, Seq[Double])] = Seq.empty,
                        strs: Seq[String] = Seq.empty,
                        refAddrs: Seq[Long] = Seq.empty)
  /** Version-4 chunked-layout index description (libver-latest files).
    * `flags` bit 0 = partial boundary chunks stored unfiltered; bit 1
    * = the Single Chunk is filtered (then `singleSize`/`singleMask`
    * carry its stored size and filter mask). `indexType` is the
    * spec's chunk-indexing-type code: 1 Single Chunk, 2 Implicit,
    * 3 Fixed Array, 4 Extensible Array, 5 v2 B-tree.
    */
  final case class V4Index(flags: Int, indexType: Int,
                           singleSize: Long, singleMask: Int)
  final case class Layout(kind: String, addr: Long, size: Long,
                          chunkDims: Seq[Int], compact: Array[Byte],
                          v4: Option[V4Index] = None)
  final case class Filter(id: Int, clientData: Seq[Int])
  final case class H5Var(name: String, dtype: Dtype, dims: Seq[Long],
                         layout: Layout, filters: Seq[Filter], attrs: Seq[Attr],
                         maxDims: Seq[Long] = Seq.empty) {
    def elemCount: Long = if (dims.isEmpty) 1L else dims.product
  }
  final case class H5File(vars: Seq[H5Var]) {
    def apply(name: String): H5Var = vars.find(_.name == name)
      .getOrElse(sys.error(s"no HDF5 dataset $name; have ${vars.map(_.name).sorted}"))
  }

  private final class Buf(val bytes: Array[Byte]) {
    def u8(p: Long): Int = bytes(p.toInt) & 0xff
    def u16(p: Long): Int = u8(p) | u8(p + 1) << 8
    def u32(p: Long): Long = u16(p).toLong | u16(p + 2).toLong << 16
    def u64(p: Long): Long = u32(p) | u32(p + 4) << 32
    def uN(p: Long, n: Int): Long = {
      var v = 0L; var i = 0
      while (i < n) { v |= (u8(p + i).toLong << (8 * i)); i += 1 }
      v
    }
    def slice(p: Long, n: Long): Array[Byte] =
      java.util.Arrays.copyOfRange(bytes, p.toInt, (p + n).toInt)
    def ascii(p: Long, n: Long): String =
      new String(slice(p, n), java.nio.charset.StandardCharsets.UTF_8)
    def cstr(p: Long): String = {
      var e = p
      while (u8(e) != 0) e += 1
      ascii(p, e - p)
    }
    def sig(p: Long, s: String): Boolean = ascii(p, 4) == s
    def requireSig(p: Long, s: String): Unit =
      require(sig(p, s), s"expected '$s' at offset $p, found '${ascii(p, 4)}'")
  }

  def isHdf5(bytes: Array[Byte]): Boolean =
    bytes.length > 8 && (bytes(0) & 0xff) == 0x89 && bytes(1) == 'H' &&
      bytes(2) == 'D' && bytes(3) == 'F'

  /** Parse the file: superblock → root group → one [[H5Var]] per
    * hard-linked dataset (sub-groups are descended recursively with
    * `/`-joined names, mirroring h5py's flat visit).
    */
  def parse(bytes: Array[Byte]): H5File = {
    val b = new Buf(bytes)
    val out = ArrayBuffer.empty[H5Var]
    val paths = scala.collection.mutable.Map.empty[Long, String]
    descend(b, rootAddress(b), "", out, ChecksumVerify, paths)
    // object-reference attrs resolve to PATHS once the whole tree is
    // walked (r19) — a reference may point at an object visited after
    // its referrer. Unresolvable addresses keep the "@<addr>" form
    // rather than failing the read: a dangling reference is the
    // referenced object's defect, not the referrer's.
    H5File(out.toSeq.map { v =>
      if (v.attrs.forall(_.refAddrs.isEmpty)) v
      else v.copy(attrs = v.attrs.map { a =>
        if (a.refAddrs.isEmpty) a
        else {
          val ps = a.refAddrs.map(ad => paths.getOrElse(ad, s"@$ad"))
          a.copy(strs = ps, str = ps.mkString(","))
        }
      })
    })
  }

  private def rootAddress(b: Buf): Long = {
    require(isHdf5(b.bytes), "not an HDF5 file")
    b.u8(8) match {
      case sbVer @ (0 | 1) =>
        require(b.u8(13) == 8 && b.u8(14) == 8,
          s"unsupported offset/length sizes ${b.u8(13)}/${b.u8(14)}")
        // fixed fields end at 24 (+4 for v1's indexed-storage K), then
        // base/freespace/eof/driver-info, then the root symbol-table
        // entry: (link name offset, object header address, ...)
        val fixed = if (sbVer == 0) 24 else 28
        b.u64(fixed + 32 + 8)
      case 2 | 3 =>
        require(b.u8(9) == 8 && b.u8(10) == 8,
          s"unsupported offset/length sizes ${b.u8(9)}/${b.u8(10)}")
        blockChecksum(b, 0, 44, "superblock") // v0/v1 carry none
        b.u64(12 + 24)
      case v => sys.error(s"unsupported HDF5 superblock version $v")
    }
  }

  /** Test seam: walk every reachable object header and REWRITE its
    * (OHDR chunk-0 / OCHK continuation) lookup3 checksum in place —
    * corruption specs patch header bytes deliberately, and without
    * this the checksum gate masks the parse error they target.
    */
  private[graft] def fixHeaderChecksums(bytes: Array[Byte]): Unit =
    descend(new Buf(bytes), rootAddress(new Buf(bytes)), "",
      ArrayBuffer.empty, ChecksumFix)

  // ---------------------------------------------------------------
  // object headers
  // ---------------------------------------------------------------

  /** Checksum handling mode for v2 object headers: verify on the
    * read path, rewrite under the [[fixHeaderChecksums]] test seam.
    */
  private final val ChecksumVerify = 0
  private final val ChecksumFix = 1

  /** Verify — or, in fix mode, rewrite — the lookup3 checksum stored
    * at `end` over the block `[start, end)`: the shared layout of
    * OHDR chunk 0, OCHK continuations, v2 B-tree nodes, fractal heap
    * header/indirect blocks, Fixed/Extensible Array blocks, and
    * superblock v2/v3.
    */
  private def blockChecksum(b: Buf, start: Long, end: Long, what: String,
                            mode: Int = ChecksumVerify): Unit = {
    val want = lookup3(b.bytes, start, (end - start).toInt).toLong & 0xffffffffL
    if (mode == ChecksumFix) {
      var i = 0
      while (i < 4) {
        b.bytes((end + i).toInt) = ((want >>> (8 * i)) & 0xff).toByte; i += 1
      }
    } else require(b.u32(end) == want,
      f"$what checksum mismatch at offset $start (stored 0x${b.u32(end)}%08x, computed 0x$want%08x)")
  }

  private def headerChecksum(b: Buf, start: Long, end: Long, mode: Int): Unit =
    blockChecksum(b, start, end, "object header", mode)

  /** Fixture seam: the checksum value the verifiers above expect for
    * a block's byte range — lets spec-built files carry REAL
    * checksums (the algorithm itself is pinned against library-
    * written bytes by the GOES pristine-no-op spec).
    */
  private[graft] def checksumOf(bytes: Array[Byte]): Long =
    lookup3(bytes, 0L, bytes.length).toLong & 0xffffffffL

  /** All (messageType, bodyOffset, bodySize) of an object header,
    * v1 or v2, with continuation blocks spliced in. v2 (`OHDR`)
    * chunk-0 and `OCHK` continuation checksums are verified (round
    * 12) — corrupted header metadata is a precise error, not a
    * misparse.
    */
  private def messages(b: Buf, addr: Long,
                       mode: Int = ChecksumVerify,
                       depth: Int = 0): Seq[(Int, Long, Int)] = {
    val out = ArrayBuffer.empty[(Int, Long, Int)]
    // a SHARED message (flags bit 1) stores a pointer record in place
    // of the body — resolve it here so every consumer sees the real
    // message bytes (r19: committed datatypes + SOHM heap messages).
    // In checksum-fix mode the walk only reads link topology, which is
    // never shareable — pass the raw record through untouched.
    def add(t: Int, body: Long, sz: Int, fl: Int): Unit =
      if ((fl & 0x02) != 0 && mode == ChecksumVerify) {
        val (ra, rl) = resolveShared(b, t, body, depth)
        out += ((t, ra, rl))
      } else out += ((t, body, sz))
    if (b.sig(addr, "OHDR")) {
      val flags = b.u8(addr + 5)
      var p = addr + 6
      if ((flags & 0x20) != 0) p += 16 // access/mod/change/birth times
      if ((flags & 0x10) != 0) p += 4  // phase-change limits
      val szLen = 1 << (flags & 0x3)
      val size = b.uN(p, szLen); p += szLen
      headerChecksum(b, addr, p + size, mode)
      val gap = if ((flags & 0x4) != 0) 6 else 4 // +2 creation order
      def scan(q0: Long, end: Long): Unit = {
        var q = q0
        while (q + gap <= end) {
          val t = b.u8(q); val sz = b.u16(q + 1)
          val body = q + gap
          if (t == 16) { // continuation: body = (addr, len); block has OCHK sig + trailing checksum
            val ca = b.u64(body); val cl = b.u64(body + 8)
            b.requireSig(ca, "OCHK")
            headerChecksum(b, ca, ca + cl - 4, mode)
            scan(ca + 4, ca + cl - 4)
          } else add(t, body, sz, b.u8(q + 3))
          q = body + sz
        }
      }
      scan(p, p + size)
    } else {
      val ver = b.u8(addr)
      require(ver == 1, s"unsupported object header version $ver at $addr")
      val hdrSize = b.u32(addr + 8)
      def scan(q0: Long, end: Long): Unit = {
        var q = q0
        while (q + 8 <= end) {
          val t = b.u16(q); val sz = b.u16(q + 2)
          if (t == 16) {
            val ca = b.u64(q + 8); val cl = b.u64(q + 16)
            scan(ca, ca + cl) // v1 continuations have no signature
          } else add(t, q + 8, sz, b.u8(q + 4))
          q += 8 + sz // v1 message bodies are already 8-byte-padded sizes
        }
      }
      scan(addr + 16, addr + 16 + hdrSize)
    }
    out.toSeq
  }

  // ---------------------------------------------------------------
  // shared messages (r19) — the two mechanisms the library writes:
  // a COMMITTED target (the message lives in another object header —
  // H5Tcommit's named datatypes, and the v1/v2 record format older
  // files carry) and the SOHM heap (H5Pset_shared_mesg_nindexes
  // files: the message body lives in a shared fractal heap indexed
  // by the superblock extension's Shared Message Table).
  // ---------------------------------------------------------------

  /** Resolve a shared-message record to the real (bodyOffset, size).
    * Record formats per the spec: v1 = version, type, 6 reserved,
    * header address; v2 = version, type, header address; v3 =
    * version, location type (1 = SOHM heap + 8-byte heap ID,
    * 2 = object header address).
    */
  private def resolveShared(b: Buf, msgType: Int, body: Long,
                            depth: Int): (Long, Int) = {
    require(depth < 4,
      s"shared message chain for type $msgType deeper than 4 — cyclic?")
    b.u8(body) match {
      case 1 => sharedFromHeader(b, msgType, b.u64(body + 8), depth)
      case 2 => sharedFromHeader(b, msgType, b.u64(body + 2), depth)
      case 3 => b.u8(body + 1) match {
        case 2 => sharedFromHeader(b, msgType, b.u64(body + 2), depth)
        case 1 => sohmHeapObject(b, msgType, body + 2)
        case t => sys.error(s"shared message v3 location type $t unsupported")
      }
      case v => sys.error(s"unsupported shared message version $v")
    }
  }

  /** A committed message: the target object header holds the real
    * message of the same type (a named datatype's header holds the
    * datatype message every referencing dataset shares).
    */
  private def sharedFromHeader(b: Buf, msgType: Int, addr: Long,
                               depth: Int): (Long, Int) =
    messages(b, addr, ChecksumVerify, depth + 1)
      .collectFirst { case (`msgType`, p, sz) => (p, sz) }
      .getOrElse(sys.error(
        s"shared message target header at $addr carries no type-$msgType message"))

  /** Fetch a shared message's bytes from the SOHM fractal heap whose
    * table index covers `msgType` — the heap object IS the encoded
    * message body. The type→flag mapping is the table's own
    * (dataspace/datatype/fill/pipeline/attribute are the shareable
    * five).
    */
  private def sohmHeapObject(b: Buf, msgType: Int, idAt: Long): (Long, Int) = {
    val typeFlag = msgType match {
      case 1 => 0x0001; case 3 => 0x0002; case 5 => 0x0004
      case 11 => 0x0008; case 12 => 0x0010
      case t => sys.error(s"message type $t is not SOHM-shareable")
    }
    val heapAddr = sohmIndexes(b).collectFirst {
      case (flags, heap) if (flags & typeFlag) != 0 => heap
    }.getOrElse(sys.error(
      s"no SOHM table index covers shared message type $msgType"))
    val heap = new FractalHeap(b, heapAddr)
    val (addr, len) = heap.get(b.slice(idAt, heap.idLen))
    (addr, len.toInt)
  }

  /** The SOHM table's (message-type-flags, fractal heap address) per
    * index, from the superblock extension's Shared Message Table
    * message (type 15) and the SMTB block it addresses. Empty when
    * the file carries no extension or no table.
    */
  private def sohmIndexes(b: Buf): Seq[(Int, Long)] = {
    if (b.u8(8) < 2) return Seq.empty // v0/v1 superblocks: no extension
    val ext = b.u64(20)
    if (ext == Undef) return Seq.empty
    messages(b, ext).collectFirst { case (15, p, _) =>
      val ver = b.u8(p)
      require(ver == 0, s"unsupported shared message table version $ver")
      val tableAddr = b.u64(p + 1)
      val n = b.u8(p + 9)
      b.requireSig(tableAddr, "SMTB")
      blockChecksum(b, tableAddr, tableAddr + 4 + 30L * n,
        "shared message table")
      (0 until n).map { i =>
        // per index: version 1, index type 1, message type flags 2,
        // min message size 4, list cutoff 2, btree cutoff 2,
        // number of messages 2, index address 8, heap address 8
        val q = tableAddr + 4 + 30L * i
        (b.u16(q + 2), b.u64(q + 22))
      }
    }.getOrElse(Seq.empty)
  }

  /** Descend one group object header, appending datasets to `out`.
    * In checksum-fix mode only headers are touched (dataset bodies
    * may hold the deliberately-corrupt bytes a spec plants).
    */
  private def descend(b: Buf, addr: Long, prefix: String,
                      out: ArrayBuffer[H5Var],
                      mode: Int = ChecksumVerify,
                      paths: scala.collection.mutable.Map[Long, String] =
                        scala.collection.mutable.Map.empty): Unit = {
    paths(addr) = prefix.stripSuffix("/")
    val msgs = messages(b, addr, mode)
    val links = ArrayBuffer.empty[(String, Long)]
    var isDataset = false
    msgs.foreach {
      case (6, p, sz) => // compact Link message
        parseLink(b, p).foreach(links += _)
      case (2, p, _) => // Link Info → dense storage
        val flags = b.u8(p + 1)
        var q = p + 2
        if ((flags & 0x1) != 0) q += 8 // max creation index
        val fheap = b.u64(q); val nameBt = b.u64(q + 8)
        if (fheap != Undef && nameBt != Undef)
          links ++= denseLinks(b, fheap, nameBt)
      case (17, p, _) => // v1 symbol table → old-style group
        links ++= symbolTableLinks(b, b.u64(p), b.u64(p + 8))
      case (8, _, _) => isDataset = true
      case _ => ()
    }
    if (isDataset) {
      if (mode == ChecksumVerify) out += buildVar(b, prefix.stripSuffix("/"), msgs)
    } else links.foreach { case (name, a) =>
      descend(b, a, s"$prefix$name/", out, mode, paths) }
  }

  /** Hard links only (soft/external links carry no object address). */
  private def parseLink(b: Buf, p0: Long): Option[(String, Long)] = {
    val flags = b.u8(p0 + 1)
    var p = p0 + 2
    var ltype = 0
    if ((flags & 0x8) != 0) { ltype = b.u8(p); p += 1 }
    if ((flags & 0x4) != 0) p += 8 // creation order
    if ((flags & 0x10) != 0) p += 1 // charset
    val lenSz = 1 << (flags & 0x3)
    val n = b.uN(p, lenSz); p += lenSz
    val name = b.ascii(p, n); p += n
    if (ltype == 0) Some((name, b.u64(p))) else None
  }

  private def buildVar(b: Buf, name: String, msgs: Seq[(Int, Long, Int)]): H5Var = {
    var dtype: Dtype = null
    var dims: Seq[Long] = Seq.empty
    var maxDims: Seq[Long] = Seq.empty
    var layout: Layout = null
    var filters: Seq[Filter] = Seq.empty
    val attrs = ArrayBuffer.empty[Attr]
    msgs.foreach {
      case (3, p, _) => dtype = parseDtype(b, p)
      case (1, p, _) => dims = parseDims(b, p); maxDims = parseMaxDims(b, p)
      case (8, p, _) => layout = parseLayout(b, p)
      case (11, p, _) => filters = parseFilters(b, p)
      case (12, p, sz) => parseAttr(b, p, sz).foreach(attrs += _)
      case (21, p, _) => attrs ++= denseAttrs(b, p)
      case _ => ()
    }
    require(dtype != null && layout != null, s"dataset $name missing datatype/layout")
    H5Var(name, dtype, dims, layout, filters, attrs.toSeq, maxDims)
  }

  /** Dense attribute storage (r15) — the libver-latest layout once a
    * variable crosses the compact-attribute threshold (default >8):
    * an Attribute Info message (type 21) points at a fractal heap of
    * serialized attribute messages indexed by a v2 name B-tree
    * (record type 8: heap ID, message flags, creation order, name
    * hash) — the SAME two structures dense groups already use, so
    * this reuses [[FractalHeap]] and [[btreeV2Records]] verbatim.
    * Iteration order follows the name index (hash order), matching
    * how the reader surfaces attrs as an unordered bag.
    */
  private def denseAttrs(b: Buf, p: Long): Seq[Attr] = {
    val flags = b.u8(p + 1)
    var q = p + 2
    if ((flags & 0x1) != 0) q += 2 // max creation index
    val fheapAddr = b.u64(q)
    val nameBtAddr = b.u64(q + 8)
    if (fheapAddr == Undef || nameBtAddr == Undef) return Seq.empty
    val heap = new FractalHeap(b, fheapAddr)
    val (recSize, recs) = btreeV2Records(b, nameBtAddr)
    require(recSize >= heap.idLen + 9,
      s"attribute name-index record size $recSize too small for " +
        s"heap ID ${heap.idLen} + flags/order/hash")
    recs.flatMap { r =>
      // the record's message-flags byte carries header-message flags;
      // only the SHARED bit (0x02) changes what the heap ID MEANS —
      // it indexes the SOHM fractal heap (where the encoded attribute
      // message lives) instead of this store's own heap (r19 — the
      // former precise rejection made real; a shared record in a file
      // with no SOHM table still errors precisely). Other bits
      // (constant 0x01, the fail-on-unknown family) describe handling
      // policy, not body layout, so the message still parses as a
      // plain attribute (r16, ADVICE).
      if ((b.u8(r + heap.idLen) & 0x02) != 0) {
        val (addr, len) = sohmHeapObject(b, 12, r)
        parseAttr(b, addr, len)
      } else {
        val (addr, len) = heap.get(b.slice(r, heap.idLen))
        parseAttr(b, addr, len.toInt)
      }
    }
  }

  // ---------------------------------------------------------------
  // old-style groups: v1 B-tree + SNOD + local heap
  // ---------------------------------------------------------------

  private def symbolTableLinks(b: Buf, btree: Long, heap: Long): Seq[(String, Long)] = {
    b.requireSig(heap, "HEAP")
    val heapData = b.u64(heap + 24)
    val out = ArrayBuffer.empty[(String, Long)]
    def snod(addr: Long): Unit = {
      b.requireSig(addr, "SNOD")
      val n = b.u16(addr + 6)
      var q = addr + 8
      var i = 0
      while (i < n) {
        out += ((b.cstr(heapData + b.u64(q)), b.u64(q + 8)))
        q += 40; i += 1
      }
    }
    def walk(addr: Long): Unit = {
      b.requireSig(addr, "TREE")
      val level = b.u8(addr + 5); val used = b.u16(addr + 6)
      var q = addr + 8 + 16 + 8 // siblings + key0
      var i = 0
      while (i < used) {
        val child = b.u64(q); q += 8 + 8 // child + next key
        if (level == 0) snod(child) else walk(child)
        i += 1
      }
    }
    walk(btree)
    out.toSeq
  }

  // ---------------------------------------------------------------
  // new-style dense groups: fractal heap + v2 B-tree
  // ---------------------------------------------------------------

  /** (heap-space offset → file address) map for a fractal heap whose
    * root is a direct block or a single-level indirect block. Each
    * `FHDB` self-describes its heap-space offset, so lookup is
    * greatest-offset-≤-target; objects never span blocks.
    */
  private final class FractalHeap(b: Buf, hdr: Long) {
    b.requireSig(hdr, "FRHP")
    val idLen: Int = b.u16(hdr + 5)
    private val ioFilterLen = b.u16(hdr + 7)
    private val flags = b.u8(hdr + 9)
    // fixed header: sig(4) ver(1) idLen(2) ioLen(2) flags(1) maxMan(4)
    // = 14 bytes, then twelve 8-byte statistics fields → width at +110
    private val width = b.u16(hdr + 110)
    private val startBlkSize = b.u64(hdr + 112)
    private val maxHeapBits = b.u16(hdr + 110 + 2 + 8 + 8) // after startBlk, maxDirect
    val offSz: Int = (maxHeapBits + 7) / 8
    val lenSz: Int = idLen - 1 - offSz
    private val rootBlk = b.u64(hdr + 128 + 2 + 2) // after maxHeapBits, startRows
    private val curRows = b.u16(hdr + 132 + 8)
    // filtered heap blocks are stored compressed — the raw block
    // parse AND the whole-block checksum rule below would both
    // misread them, so reject precisely (netCDF-4 link heaps are
    // unfiltered; this is a deep-corner libver feature)
    require(ioFilterLen == 0,
      s"fractal heap with an I/O filter pipeline unsupported ($ioFilterLen-byte filter info)")
    blockChecksum(b, hdr, hdr + 142, "fractal heap header")

    /** Direct blocks carry a checksum (flags bit 1) computed over the
      * WHOLE block with the checksum field itself zeroed — the row's
      * doubling-table size for indirect-pointed blocks, the starting
      * block size for a direct root.
      */
    private def verifyDirect(addr: Long, size: Long): Unit =
      if ((flags & 0x2) != 0) {
        val img = b.slice(addr, size)
        val cp = 4 + 1 + 8 + offSz
        val stored = (img(cp) & 0xffL) | (img(cp + 1) & 0xffL) << 8 |
          (img(cp + 2) & 0xffL) << 16 | (img(cp + 3) & 0xffL) << 24
        java.util.Arrays.fill(img, cp, cp + 4, 0.toByte)
        val want = lookup3(img, 0L, img.length).toLong & 0xffffffffL
        require(stored == want,
          f"fractal heap direct-block checksum mismatch at offset $addr (stored 0x$stored%08x, computed 0x$want%08x)")
      }

    private val blocks: Array[(Long, Long)] = { // (heapOff, fileAddr) sorted
      val dhdrOff = 4 + 1 + 8 // sig + version + heap-header address
      val acc = ArrayBuffer.empty[(Long, Long)]
      def direct(addr: Long, size: Long): Unit = {
        verifyDirect(addr, size)
        acc += ((b.uN(addr + dhdrOff, offSz), addr))
      }
      if (b.sig(rootBlk, "FHDB")) direct(rootBlk, startBlkSize)
      else {
        b.requireSig(rootBlk, "FHIB")
        var q = rootBlk + 4 + 1 + 8 + offSz
        // indirect block checksum: trailing field over the header +
        // the curRows*width direct-block entries (8 bytes each when
        // unfiltered, which the constructor guarantees)
        blockChecksum(b, rootBlk, q + curRows.toLong * width * 8,
          "fractal heap indirect block")
        var i = 0
        while (i < curRows * width) {
          val a = b.u64(q)
          if (a != Undef) {
            require(b.sig(a, "FHDB"),
              "multi-level indirect fractal-heap blocks unsupported (≫10⁵-link group)")
            val row = i / width
            direct(a, if (row < 2) startBlkSize else startBlkSize << (row - 1))
          }
          q += 8; i += 1
        }
      }
      acc.sortBy(_._1).toArray
    }

    def get(heapId: Array[Byte]): (Long, Long) = { // (fileAddr, len)
      // heap ID byte 0: bits 4-5 type (0 managed / 1 huge / 2 tiny),
      // bits 6-7 version. Only MANAGED ids carry the offset+length
      // layout decoded below — a HUGE id (an object past the heap's
      // max managed size, e.g. a long dense-attribute value) stores a
      // v2 B-tree key and a TINY id inlines the object bytes, so
      // decoding either as offset/length would silently read garbage.
      // Reject precisely (r16, ADVICE).
      require((heapId(0) & 0x30) == 0,
        f"huge/tiny fractal-heap object IDs unsupported (id type byte 0x${heapId(0) & 0xff}%02x)")
      require((heapId(0) & 0xc0) == 0,
        f"fractal-heap ID version ${(heapId(0) & 0xc0) >> 6} unsupported")
      val ib = new Buf(heapId)
      val off = ib.uN(1, offSz)
      val len = ib.uN(1 + offSz, lenSz)
      var i = blocks.length - 1
      while (i > 0 && blocks(i)._1 > off) i -= 1
      (blocks(i)._2 + (off - blocks(i)._1), len)
    }
  }

  /** Byte offsets of every record in a v2 B-tree (depth ≤ 1), plus
    * the record size from the header — shared by the dense-link name
    * index (record type 5) and v4 chunk indexes (types 10/11).
    */
  private def btreeV2Records(b: Buf, btreeAddr: Long): (Int, Seq[Long]) = {
    b.requireSig(btreeAddr, "BTHD")
    blockChecksum(b, btreeAddr, btreeAddr + 34, "v2 B-tree header")
    val nodeSize = b.u32(btreeAddr + 6)
    val recSize = b.u16(btreeAddr + 10)
    val depth = b.u16(btreeAddr + 12)
    val rootAddr = b.u64(btreeAddr + 16)
    val nrecRoot = b.u16(btreeAddr + 24)
    val leafMax = ((nodeSize - 10) / recSize).toInt
    def bytesFor(n: Int): Int = { var v = n; var c = 0; while (v > 0) { v >>= 8; c += 1 }; math.max(c, 1) }
    val recs = ArrayBuffer.empty[Long]
    def leaf(addr: Long, n: Int): Unit = {
      b.requireSig(addr, "BTLF")
      blockChecksum(b, addr, addr + 6 + n.toLong * recSize, "v2 B-tree leaf")
      var q = addr + 6
      var i = 0
      while (i < n) { recs += q; q += recSize; i += 1 }
    }
    if (depth == 0) leaf(rootAddr, nrecRoot)
    else {
      require(depth == 1, s"v2 B-tree depth $depth unsupported (≫10⁵-record index)")
      b.requireSig(rootAddr, "BTIN")
      val childNrecSz = bytesFor(leafMax)
      blockChecksum(b, rootAddr,
        rootAddr + 6 + nrecRoot.toLong * recSize +
          (nrecRoot + 1).toLong * (8 + childNrecSz), "v2 B-tree internal node")
      var q = rootAddr + 6
      // internal records are also real records
      val internal = ArrayBuffer.empty[Long]
      var i = 0
      while (i < nrecRoot) { internal += q; q += recSize; i += 1 }
      i = 0
      while (i <= nrecRoot) {
        val child = b.u64(q); q += 8
        val n = b.uN(q, childNrecSz).toInt; q += childNrecSz
        leaf(child, n)
        i += 1
      }
      recs ++= internal
    }
    (recSize, recs.toSeq)
  }

  private def denseLinks(b: Buf, fheapAddr: Long, btreeAddr: Long): Seq[(String, Long)] = {
    val heap = new FractalHeap(b, fheapAddr)
    val (recSize, recs) = btreeV2Records(b, btreeAddr)
    // name-index records are hash(4) + heap ID
    recs.flatMap { q =>
      val (addr, len) = heap.get(b.slice(q + 4, recSize - 4))
      // the heap object IS a serialized Link message
      parseLink(b, addr)
    }
  }

  // ---------------------------------------------------------------
  // messages: datatype / dataspace / layout / filters / attribute
  // ---------------------------------------------------------------

  private def parseDtype(b: Buf, p: Long): Dtype = parseDtypeSized(b, p)._1

  /** Parses a datatype message and also returns its ENCODED byte
    * length. The spec never records a nested datatype's length, yet
    * vlen properties embed the base datatype and compound properties
    * embed one datatype per member — walking past them requires
    * computing each class's fixed property size (fixed-point 4,
    * float 12, string 0, vlen 8+base, compound 8+Σmembers).
    */
  private def parseDtypeSized(b: Buf, p: Long): (Dtype, Long) = {
    val ver = b.u8(p) >> 4
    val cls = b.u8(p) & 0xf
    val bit0 = b.u8(p + 1)
    val size = b.u32(p + 4).toInt
    cls match {
      case 0 => (Dtype(0, size, (bit0 & 1) == 0, (bit0 & 0x8) != 0), 12L) // fixed-point
      case 1 => (Dtype(1, size, (bit0 & 1) == 0, signed = true), 20L)     // IEEE float
      case 3 => (Dtype(3, size, littleEndian = true, signed = false), 8L) // string
      case 6 => // compound: member list, layout differs by version
        require(ver >= 1 && ver <= 3,
          s"unsupported compound datatype version $ver")
        val nMembers = bit0 | (b.u8(p + 2) << 8)
        // v3 offsets use the minimum bytes that can encode the
        // compound's total size
        var offBytes = 1
        while ((1L << (8 * offBytes)) <= size) offBytes += 1
        var q = p + 8
        val ms = (0 until nMembers).map { _ =>
          val name = b.cstr(q)
          q += (if (ver == 3) name.length + 1L
                else ((name.length + 8L) / 8L) * 8L) // NUL + pad to 8
          val off = (if (ver == 3) b.uN(q, offBytes)
                     else b.u32(q)).toInt
          q += (if (ver == 3) offBytes.toLong else 4L)
          // v1 carries dimensionality info v2/v3 dropped: dim count,
          // 3 reserved, permutation, reserved, 4 dim sizes
          if (ver == 1) {
            require(b.u8(q) == 0,
              "array-valued compound member unsupported (scalar members only)")
            q += 28
          }
          val (mdt, mlen) = parseDtypeSized(b, q)
          q += mlen
          require(off + mdt.size <= size,
            s"compound member $name [$off, ${off + mdt.size}) overruns the $size-byte element")
          Member(name, off, mdt)
        }
        (Dtype(6, size, littleEndian = true, signed = false, members = ms), q - p)
      case 8 => // enumeration: base datatype + named values (netCDF-4
        // flag variables); reads decode as the base, labels carry the
        // name→value map for callers that want the legend
        val nVals = bit0 | (b.u8(p + 2) << 8)
        val (baseDt, baseLen) = parseDtypeSized(b, p + 8)
        require(baseDt.cls == 0,
          s"enum base class ${baseDt.cls} unsupported (fixed-point only)")
        var q = p + 8 + baseLen
        val names = (0 until nVals).map { _ =>
          val name = b.cstr(q)
          q += (if (ver == 3) name.length + 1L
                else ((name.length + 8L) / 8L) * 8L)
          name
        }
        val values = (0 until nVals).map { i =>
          readElem(b.bytes, q + i.toLong * baseDt.size, baseDt)
        }
        q += nVals.toLong * baseDt.size
        (Dtype(8, size, baseDt.littleEndian, baseDt.signed,
          base = Some(baseDt), labels = names.zip(values)), q - p)
      case 9 => // variable-length: bit-field bits 0-3 = 0 sequence / 1 string
        require(size == 16,
          s"unexpected vlen element size $size (length 4 + heap address 8 + index 4)")
        val (baseDt, baseLen) = parseDtypeSized(b, p + 8)
        if ((bit0 & 0xf) == 1)
          (Dtype(9, size, littleEndian = true, signed = false, vlenString = true),
            8L + baseLen)
        else
          (Dtype(9, size, littleEndian = true, signed = false, base = Some(baseDt)),
            8L + baseLen)
      case 10 => // array: fixed extra dims over a base — appears as
        // compound members (per-band fields); v2 carries reserved +
        // permutation words that v3 dropped
        val rank = b.u8(p + 8)
        val dimsAt = if (ver == 2) p + 12 else p + 9
        val dims = (0 until rank).map(i => b.u32(dimsAt + 4L * i).toInt)
        val baseAt = dimsAt + 4L * rank + (if (ver == 2) 4L * rank else 0L)
        val (baseDt, baseLen) = parseDtypeSized(b, baseAt)
        require(baseDt.cls == 0 || baseDt.cls == 1,
          s"array-datatype base class ${baseDt.cls} unsupported (numeric only)")
        require(dims.nonEmpty && dims.product.toLong * baseDt.size == size,
          s"array datatype size $size != ${dims.mkString("x")} × ${baseDt.size}")
        (Dtype(10, size, baseDt.littleEndian, baseDt.signed,
          base = Some(baseDt), arrayDims = dims), baseAt + baseLen - p)
      case 7 => // reference (r19): OBJECT references only — one 8-byte
        // object-header address per element, the machinery behind
        // netCDF-4's DIMENSION_LIST (vlen of refs) and REFERENCE_LIST
        // (compound with a ref member). Region references carry
        // dataspace-selection heap state a flat address cannot, and
        // reject precisely.
        require((bit0 & 0xf) == 0,
          s"region reference datatype unsupported (reference type ${bit0 & 0xf}; object references only)")
        require(size == 8, s"object reference size $size != 8 (one file address)")
        (Dtype(7, size, littleEndian = true, signed = false), 8L)
      case c => sys.error(s"unsupported HDF5 datatype class $c (region references and opaque out of scope)")
    }
  }

  private def parseDims(b: Buf, p: Long): Seq[Long] = {
    val ver = b.u8(p); val rank = b.u8(p + 1)
    val base = if (ver == 1) p + 8 else p + 4
    (0 until rank).map(i => b.u64(base + 8L * i))
  }

  /** Max dims when the dataspace carries them (flags bit 0) — `Undef`
    * marks an unlimited dimension (the Extensible Array trigger).
    */
  private def parseMaxDims(b: Buf, p: Long): Seq[Long] = {
    val ver = b.u8(p); val rank = b.u8(p + 1); val flags = b.u8(p + 2)
    if ((flags & 0x1) == 0) Seq.empty
    else {
      val base = (if (ver == 1) p + 8 else p + 4) + 8L * rank
      (0 until rank).map(i => b.u64(base + 8L * i))
    }
  }

  private def parseLayout(b: Buf, p: Long): Layout = {
    val ver = b.u8(p)
    require(ver == 3 || ver == 4,
      s"data layout version $ver unsupported (only v3 and v4 in scope)")
    b.u8(p + 1) match {
      case 0 =>
        val sz = b.u16(p + 2)
        Layout("compact", Undef, sz, Seq.empty, b.slice(p + 4, sz))
      case 1 =>
        Layout("contiguous", b.u64(p + 2), b.u64(p + 10), Seq.empty, null)
      case 2 if ver == 3 =>
        val rank = b.u8(p + 2) // rank includes the trailing element-size dim
        val addr = b.u64(p + 3)
        val cdims = (0 until rank).map(i => b.u32(p + 11 + 4L * i).toInt)
        Layout("chunked", addr, 0, cdims, null)
      case 2 => // v4 chunked (libver-latest): variable-width dims + index type
        val flags = b.u8(p + 2)
        val rank = b.u8(p + 3) // includes the trailing element-size dim (as v3)
        val encLen = b.u8(p + 4)
        require(encLen >= 1 && encLen <= 8, s"bad v4 chunk-dim width $encLen")
        val cdims = (0 until rank).map(i => b.uN(p + 5 + encLen.toLong * i, encLen).toInt)
        var q = p + 5 + encLen.toLong * rank
        val idxType = b.u8(q); q += 1
        var singleSize = 0L; var singleMask = 0
        idxType match {
          case 1 => // Single Chunk: filtered size + mask iff flags bit 1
            if ((flags & 0x2) != 0) {
              singleSize = b.u64(q); singleMask = b.u32(q + 8).toInt; q += 12
            }
          case 2 => () // Implicit: no index parameters
          case 3 => q += 1 // Fixed Array: page bits (re-read from FAHD)
          case 4 => q += 5 // Extensible Array: 5 creation-parameter bytes
          case 5 => q += 6 // v2 B-tree: node size(4) + split(1) + merge(1)
          case t => sys.error(s"unknown v4 chunk indexing type $t")
        }
        val addr = b.u64(q)
        Layout("chunked", addr, 0, cdims, null,
          Some(V4Index(flags, idxType, singleSize, singleMask)))
      case c => sys.error(
        s"unsupported data layout class $c (virtual storage out of scope)")
    }
  }

  private def parseFilters(b: Buf, p: Long): Seq[Filter] = {
    val ver = b.u8(p); val n = b.u8(p + 1)
    var q = if (ver == 1) p + 8 else p + 2
    (0 until n).map { _ =>
      val id = b.u16(q); val nameLen = b.u16(q + 2); val nCd = b.u16(q + 6)
      q += 8
      if (nameLen > 0) { q += nameLen; if (ver == 1 && nameLen % 8 != 0) q += 8 - nameLen % 8 }
      val cd = (0 until nCd).map(i => b.u32(q + 4L * i).toInt)
      q += 4L * nCd
      if (ver == 1 && nCd % 2 == 1) q += 4
      Filter(id, cd)
    }
  }

  private def parseAttr(b: Buf, p: Long, msgSize: Int): Option[Attr] = {
    val ver = b.u8(p)
    if (ver != 1 && ver != 3) return None
    val nameSz = b.u16(p + 2); val dtSz = b.u16(p + 4); val dsSz = b.u16(p + 6)
    def pad8(n: Int): Int = if (ver == 1) (n + 7) & ~7 else n
    var q = p + (if (ver == 1) 8 else 9)
    val name = b.cstr(q); q += pad8(nameSz)
    val dtP = q; q += pad8(dtSz)
    val dsP = q; q += pad8(dsSz)
    val dt =
      try parseDtype(b, dtP)
      catch { case _: RuntimeException => return Some(Attr(name, Seq.empty, "")) }
    val n = parseDims(b, dsP) match { case Nil => 1L; case d => d.product }
    // fixed-shape structured attr values decode (r15): all-numeric
    // compounds as per-member columns, numeric-base arrays flattened
    // row-major (the readDoubles convention — parseDtype already
    // rejects non-numeric array bases). Ragged (vlen-SEQUENCE) and
    // mixed compounds keep the name with empty payloads — the
    // precise-rejection-over-misread rule for shapes a flat Attr
    // cannot carry without losing boundaries
    if (dt.cls == 6) {
      // enum members (cls 8) decode as their fixed-point base through
      // readElem, same as the dataset compound path's member guard at
      // readCompound — parseDtype already rejects non-fixed-point
      // enum bases (r16, ADVICE: the attribute path was the one
      // consumer that left enum-over-int compounds named-but-empty)
      // reference members (cls 7, r19 — netCDF-4's REFERENCE_LIST
      // {dataset ref, dim index}) decode as exact address doubles
      // through readElem's 8-byte integer path
      if (dt.members.nonEmpty &&
          dt.members.forall(m =>
            m.dtype.cls == 0 || m.dtype.cls == 1 || m.dtype.cls == 8 ||
              m.dtype.cls == 7))
        return Some(Attr(name, Seq.empty, "", dt.members.map(m =>
          m.name -> (0L until n).map(i =>
            readElem(b.bytes, q + i * dt.size + m.offset, m.dtype)))))
      return Some(Attr(name, Seq.empty, ""))
    }
    if (dt.cls == 10) {
      val base = dt.base.get
      val k = dt.arrayDims.product
      return Some(Attr(name, (0L until n).flatMap(i => (0 until k).map(j =>
        readElem(b.bytes, q + i * dt.size + j.toLong * base.size, base))), ""))
    }
    if (dt.cls == 9 && dt.base.exists(_.cls == 7)) {
      // vlen OBJECT-REFERENCE sequences (r19 — netCDF-4's
      // DIMENSION_LIST): each 16-byte descriptor resolves against the
      // global heap to `len` consecutive 8-byte object addresses;
      // null descriptors (unwritten dims) contribute nothing
      val addrs = (0L until n).flatMap { i =>
        val p0 = q + i * dt.size
        val len = b.u32(p0); val addr = b.u64(p0 + 4)
        val idx = b.u32(p0 + 12).toInt
        if (addr == 0 || addr == Undef || len == 0) Seq.empty[Long]
        else {
          val (dataAt, objSize) = globalHeapObject(b, addr, idx)
          require(len * 8 <= objSize,
            s"vlen reference sequence of $len overruns its $objSize-byte heap object")
          (0L until len).map(j => b.u64(dataAt + 8 * j))
        }
      }
      return Some(Attr(name, addrs.map(_.toDouble), "", refAddrs = addrs))
    }
    if (dt.cls == 9 && !dt.vlenString)
      return Some(Attr(name, Seq.empty, ""))
    if (dt.cls == 9)
      // a multi-element vlen attribute stores n consecutive 16-byte
      // descriptors; resolve ALL of them (r14, ADVICE — reading only
      // the first silently dropped elements 2..n, against the
      // precise-rejection-over-misread rule), joined with "," so
      // element boundaries stay recoverable (r15, ADVICE — the bare
      // concatenation collapsed ["red","green","blue"] into an
      // unsplittable "redgreenblue"; h5py exposes these as string
      // arrays, and a flat Attr.str must at least preserve the cut
      // points)
      Some({
        val elems = (0L until n).map(i => vlenString(b, b, q + i * dt.size))
        Attr(name, Seq.empty, elems.mkString(","), strs = elems)
      })
    else if (dt.cls == 3) Some(Attr(name, Seq.empty, b.ascii(q, dt.size * n).takeWhile(_ != 0)))
    else if (dt.cls == 7) {
      // plain object-reference values (r19): exact addresses now,
      // paths resolved in [[parse]]'s whole-file pass
      val addrs = (0L until n).map(i => b.u64(q + i * dt.size))
      Some(Attr(name, addrs.map(_.toDouble), "", refAddrs = addrs))
    } else {
      val nums = (0L until n).map(i => readElem(b.bytes, q + i * dt.size, dt))
      Some(Attr(name, nums, ""))
    }
  }

  // ---------------------------------------------------------------
  // data
  // ---------------------------------------------------------------

  private def readElem(bytes: Array[Byte], p: Long, dt: Dtype): Double = {
    val bb = ByteBuffer.wrap(bytes, p.toInt, dt.size)
      .order(if (dt.littleEndian) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    dt.cls match {
      case 1 => if (dt.size == 4) bb.getFloat.toDouble else bb.getDouble
      case _ => dt.size match { // fixed-point & string bytes
        case 1 => if (dt.signed) bb.get.toDouble else (bb.get & 0xff).toDouble
        case 2 => if (dt.signed) bb.getShort.toDouble else (bb.getShort & 0xffff).toDouble
        case 4 => if (dt.signed) bb.getInt.toDouble else (bb.getInt.toLong & 0xffffffffL).toDouble
        case 8 => bb.getLong.toDouble
      }
    }
  }

  /** Bob Jenkins' lookup3 `hashlittle` with initval 0 — the checksum
    * the HDF5 format stores on v2 object headers, continuation
    * blocks, and the v2 index structures. Little-endian 12-byte
    * blocks through the mix rounds, cumulative tail, final
    * avalanche; a zero-length tail skips the final round (the
    * reference's `case 0: return c`).
    */
  private def lookup3(bytes: Array[Byte], off: Long, len: Int): Int = {
    def rot(x: Int, k: Int) = Integer.rotateLeft(x, k)
    var a = 0xdeadbeef + len; var b = a; var c = a
    var i = off.toInt
    var rem = len
    def k32(p: Int): Int = (bytes(p) & 0xff) | (bytes(p + 1) & 0xff) << 8 |
      (bytes(p + 2) & 0xff) << 16 | (bytes(p + 3) & 0xff) << 24
    while (rem > 12) {
      a += k32(i); b += k32(i + 4); c += k32(i + 8)
      a -= c; a ^= rot(c, 4); c += b
      b -= a; b ^= rot(a, 6); a += c
      c -= b; c ^= rot(b, 8); b += a
      a -= c; a ^= rot(c, 16); c += b
      b -= a; b ^= rot(a, 19); a += c
      c -= b; c ^= rot(b, 4); b += a
      i += 12; rem -= 12
    }
    if (rem == 0) return c
    if (rem >= 12) c += (bytes(i + 11) & 0xff) << 24
    if (rem >= 11) c += (bytes(i + 10) & 0xff) << 16
    if (rem >= 10) c += (bytes(i + 9) & 0xff) << 8
    if (rem >= 9) c += bytes(i + 8) & 0xff
    if (rem >= 8) b += (bytes(i + 7) & 0xff) << 24
    if (rem >= 7) b += (bytes(i + 6) & 0xff) << 16
    if (rem >= 6) b += (bytes(i + 5) & 0xff) << 8
    if (rem >= 5) b += bytes(i + 4) & 0xff
    if (rem >= 4) a += (bytes(i + 3) & 0xff) << 24
    if (rem >= 3) a += (bytes(i + 2) & 0xff) << 16
    if (rem >= 2) a += (bytes(i + 1) & 0xff) << 8
    a += bytes(i) & 0xff
    c ^= b; c -= rot(b, 14)
    a ^= c; a -= rot(c, 11)
    b ^= a; b -= rot(a, 25)
    c ^= b; c -= rot(b, 16)
    a ^= c; a -= rot(c, 4)
    b ^= a; b -= rot(a, 14)
    c ^= b; c -= rot(b, 24)
    c
  }

  /** HDF5's Fletcher-32 over the first `n` bytes: 16-bit big-endian
    * words accumulated into two mod-65535 sums with the reference
    * implementation's 360-word overflow-deferral blocks, a final
    * odd-byte term padded with a zero low byte, and double folding.
    */
  private def fletcher32(data: Array[Byte], n: Int): Long = {
    var sum1 = 0L; var sum2 = 0L
    var i = 0
    var words = n / 2
    while (words > 0) {
      var t = math.min(words, 360)
      words -= t
      while (t > 0) {
        sum1 += ((data(i) & 0xffL) << 8) | (data(i + 1) & 0xffL)
        sum2 += sum1
        i += 2; t -= 1
      }
      sum1 = (sum1 & 0xffff) + (sum1 >> 16)
      sum2 = (sum2 & 0xffff) + (sum2 >> 16)
    }
    if (n % 2 == 1) {
      sum1 += (data(n - 1) & 0xffL) << 8
      sum2 += sum1
      sum1 = (sum1 & 0xffff) + (sum1 >> 16)
      sum2 = (sum2 & 0xffff) + (sum2 >> 16)
    }
    sum1 = (sum1 & 0xffff) + (sum1 >> 16)
    sum2 = (sum2 & 0xffff) + (sum2 >> 16)
    (sum2 << 16) | sum1
  }

  private def defilter(raw: Array[Byte], filters: Seq[Filter], mask: Int): Array[Byte] = {
    // write order is pipeline order; decode applies the reverse, and
    // bit i of the chunk's filter mask means filter i was SKIPPED
    var data = raw
    filters.zipWithIndex.reverse.foreach {
      case (f, i) if (mask & (1 << i)) == 0 =>
        f.id match {
          case 1 => // deflate
            val inf = new Inflater()
            inf.setInput(data)
            val out = new java.io.ByteArrayOutputStream(data.length * 4)
            val tmp = new Array[Byte](8192)
            while (!inf.finished()) {
              val n = inf.inflate(tmp)
              if (n == 0 && inf.needsInput()) sys.error("truncated deflate chunk")
              out.write(tmp, 0, n)
            }
            inf.end()
            data = out.toByteArray
          case 2 => // shuffle: byte-plane transpose with element size cd(0)
            val es = f.clientData.head
            if (es > 1 && data.length % es == 0) {
              val n = data.length / es
              val out = new Array[Byte](data.length)
              var bIdx = 0
              while (bIdx < es) {
                var j = 0
                while (j < n) { out(j * es + bIdx) = data(bIdx * n + j); j += 1 }
                bIdx += 1
              }
              data = out
            }
          case 3 => // fletcher32: verify the appended 4-byte checksum, then strip
            require(data.length >= 4,
              s"fletcher32-filtered chunk of ${data.length} bytes cannot carry its checksum (corrupt size)")
            val n = data.length - 4
            val stored = (data(n) & 0xffL) | (data(n + 1) & 0xffL) << 8 |
              (data(n + 2) & 0xffL) << 16 | (data(n + 3) & 0xffL) << 24
            val sum = fletcher32(data, n)
            // the pre-1.6.3 library wrote the byte-swapped form; both
            // are accepted on read, like the reference implementation
            val swapped = java.lang.Integer.reverseBytes(sum.toInt).toLong & 0xffffffffL
            require(stored == sum || stored == swapped,
              f"fletcher32 mismatch: stored 0x$stored%08x, computed 0x$sum%08x (corrupt chunk)")
            data = java.util.Arrays.copyOfRange(data, 0, n)
          case id => sys.error(s"unsupported HDF5 filter $id (szip/nbit out of scope)")
        }
      case _ => ()
    }
    data
  }

  /** Raw element bytes of one dataset, row-major, fully assembled
    * from compact / contiguous / chunked storage. Unallocated chunks
    * (fill-value regions) read as zero bytes.
    */
  def readRaw(bytes: Array[Byte], v: H5Var): Array[Byte] = {
    val b = new Buf(bytes)
    val total = v.elemCount * v.dtype.size
    require(total <= Int.MaxValue, s"dataset ${v.name} too large for a single buffer")
    v.layout.kind match {
      case "compact" => v.layout.compact
      case "contiguous" =>
        if (v.layout.addr == Undef) new Array[Byte](total.toInt)
        else b.slice(v.layout.addr, total)
      case "chunked" =>
        val out = new Array[Byte](total.toInt)
        if (v.layout.addr == Undef) return out
        val rank = v.layout.chunkDims.length // = dataspace rank + 1 (elem-size dim)
        val dims = v.dims :+ v.dtype.size.toLong // element dims + byte dim, row-major
        val cdims = v.layout.chunkDims.map(_.toLong)
        // strides of the full array in bytes
        val strides = new Array[Long](rank)
        var s = 1L
        var i = rank - 1
        while (i >= 0) { strides(i) = s; s *= dims(i); i -= 1 }
        val chunkBytes = cdims.product

        // scatter one decoded chunk into `out` a contiguous row at a
        // time: the innermost chunk dim (the byte dim) is contiguous.
        // `offs` are element offsets (with the trailing byte-dim 0).
        def scatter(data: Array[Byte], offs: Seq[Long]): Unit = {
          val rowBytes = cdims(rank - 1)
          val nRows = (chunkBytes / rowBytes).toInt
          var r = 0
          while (r < nRows) {
            // decompose r into chunk-local coords over dims 0..rank-2
            var rem = r.toLong
            var dst = 0L
            var inBounds = true
            var d = rank - 2
            while (d >= 0) {
              val c = rem % cdims(d); rem /= cdims(d)
              val g = offs(d) + c
              if (g >= dims(d)) inBounds = false
              dst += g * strides(d)
              d -= 1
            }
            if (inBounds) {
              val copy = math.min(rowBytes, dims(rank - 1) - offs(rank - 1)).toInt
              val srcOff = r * rowBytes
              if (srcOff + copy <= data.length)
                System.arraycopy(data, srcOff.toInt, out, dst.toInt, copy)
            }
            r += 1
          }
        }

        // `stored < 0` means unfiltered-at-exact-chunk-size; flags
        // bit 0 (v4) stores partial boundary chunks unfiltered.
        def place(addr: Long, stored: Long, mask: Int, offs: Seq[Long],
                  edgeUnfiltered: Boolean): Unit = {
          val isPartial = (0 until rank - 1).exists(d => offs(d) + cdims(d) > dims(d))
          val raw = b.slice(addr, if (stored < 0) chunkBytes else stored)
          val data =
            if (stored < 0 || (edgeUnfiltered && isPartial)) raw
            else defilter(raw, v.filters, mask)
          scatter(data, offs)
        }

        def walkV1(addr: Long): Unit = {
          b.requireSig(addr, "TREE")
          require(b.u8(addr + 4) == 1, "not a raw-data chunk B-tree")
          val level = b.u8(addr + 5); val used = b.u16(addr + 6)
          var q = addr + 8 + 16
          // key = size(4) + mask(4) + one 8-byte offset per chunk dim
          // (chunk rank already includes the trailing element-size dim)
          var k = 0
          while (k < used) {
            val csize = b.u32(q); val mask = b.u32(q + 4).toInt
            val offs = (0 until rank).map(d => b.u64(q + 8 + 8L * d))
            q += 8 + 8L * rank
            val child = b.u64(q); q += 8
            if (level > 0) walkV1(child)
            else place(child, csize, mask, offs, edgeUnfiltered = false)
            k += 1
          }
        }

        // chunk-grid extents per dataspace dim; linear index is
        // row-major over the grid (slowest dim first) — the canonical
        // order of Implicit storage and Fixed Array entries. The grid
        // is sized by the MAX dims where defined (HDF5 linearizes all
        // non-B-tree v4 indexes over the max-extent chunk grid, so an
        // extendable-but-below-max dataset still addresses correctly);
        // an unlimited max (Undef) falls back to the current extent.
        def gridDims: Seq[Long] =
          (0 until rank - 1).map { d =>
            val extent =
              if (d < v.maxDims.length && v.maxDims(d) != Undef) v.maxDims(d)
              else dims(d)
            (extent + cdims(d) - 1) / cdims(d)
          }
        def gridOffs(linear: Long): Seq[Long] = {
          val g = gridDims
          val offs = new Array[Long](rank)
          var rem = linear
          var d = rank - 2
          while (d >= 0) { offs(d) = (rem % g(d)) * cdims(d); rem /= g(d); d -= 1 }
          require(rem == 0, s"chunk index $linear outside the ${g.mkString("x")} grid")
          offs.toSeq
        }

        /** Extensible-Array grid offsets with the unlimited dimension
          * `ud` SWIZZLED to the slowest position: libhdf5 linearizes
          * EA chunk indexes row-major over the swizzled grid
          * (H5Dearray's H5VM_swizzle_coords — swizzled pos 0 is dim
          * ud, positions 1..ud are dims 0..ud-1 shifted right, the
          * rest keep their place), so a column-extendable dataset
          * appends without renumbering existing chunks. Decompose
          * `linear` over the swizzled grid, then write each coord
          * back to its canonical dim. ud = 0 reduces to [[gridOffs]].
          */
        def gridOffsSwizzled(linear: Long, ud: Int): Seq[Long] = {
          val g = gridDims
          val n = rank - 1
          val order = ud +: (0 until n).filterNot(_ == ud)
          val coords = new Array[Long](n)
          var rem = linear
          var d = n - 1
          while (d >= 0) {
            val dim = order(d)
            coords(dim) = rem % g(dim); rem /= g(dim); d -= 1
          }
          require(rem == 0,
            s"chunk index $linear outside the swizzled ${g.mkString("x")} grid")
          (0 until rank).map(d => if (d < n) coords(d) * cdims(d) else 0L)
        }

        v.layout.v4 match {
          case None => walkV1(v.layout.addr)
          case Some(ix) =>
            val edgeUnfiltered = (ix.flags & 0x1) != 0 && v.filters.nonEmpty
            ix.indexType match {
              case 1 => // Single Chunk: layout address IS the chunk
                val filtered = (ix.flags & 0x2) != 0
                place(v.layout.addr,
                  if (filtered) ix.singleSize else -1L,
                  ix.singleMask, Seq.fill(rank)(0L), edgeUnfiltered)
              case 2 => // Implicit: unfiltered chunks, contiguous in grid order
                require(v.filters.isEmpty, "implicit chunk index with filters")
                val n = gridDims.product
                var c = 0L
                while (c < n) {
                  place(v.layout.addr + c * chunkBytes, -1L, 0, gridOffs(c),
                    edgeUnfiltered = false)
                  c += 1
                }
              case 3 => // Fixed Array
                readFixedArray(b, v.layout.addr).foreach {
                  case (linear, addr, stored, mask) =>
                    if (addr != Undef)
                      place(addr, stored, mask, gridOffs(linear), edgeUnfiltered)
                }
              case 5 => // v2 B-tree, record types 10/11
                val (recSize, recs) = btreeV2Records(b, v.layout.addr)
                // type 10: addr(8) + scaled offsets (8 × dataspace rank);
                // type 11 adds size(recSize-derived width) + mask(4)
                val nOffs = rank - 1
                val csLen = recSize - 8 - 8 * nOffs match {
                  case 0 => 0 // unfiltered record
                  case extra =>
                    require(extra > 4 && extra <= 12,
                      s"unrecognized v2 B-tree chunk record size $recSize for rank $nOffs")
                    extra - 4
                }
                recs.foreach { q =>
                  val addr = b.u64(q)
                  var p2 = q + 8
                  var stored = -1L; var mask = 0
                  if (csLen > 0) {
                    stored = b.uN(p2, csLen); p2 += csLen
                    mask = b.u32(p2).toInt; p2 += 4
                  }
                  val offs = (0 until nOffs).map(d => b.u64(p2 + 8L * d) * cdims(d)) :+ 0L
                  place(addr, stored, mask, offs, edgeUnfiltered)
                }
              case 4 => // Extensible Array (one unlimited dimension)
                // the EA linear order swizzles the unlimited dim to
                // position 0 (r13: full swizzle support — before, a
                // unlim-dim != 0 layout was a precise throw). An EA
                // index always has exactly one unlimited dim; a
                // degenerate all-bounded maxDims reads as dim 0.
                val unlim = v.maxDims.zipWithIndex.collect { case (Undef, d) => d }
                require(unlim.size <= 1,
                  s"extensible-array index with ${unlim.size} unlimited dims (${unlim.mkString(",")})")
                val ud = unlim.headOption.getOrElse(0)
                readExtensibleArray(b, v.layout.addr).foreach {
                  case (linear, addr, stored, mask) =>
                    if (addr != Undef)
                      place(addr, stored, mask,
                        if (ud == 0) gridOffs(linear)
                        else gridOffsSwizzled(linear, ud), edgeUnfiltered)
                }
              case t => sys.error(s"unknown v4 chunk indexing type $t")
            }
        }
        out
    }
  }

  /** Entries of a Fixed Array chunk index: (linear grid index, chunk
    * address, stored size or -1 for unfiltered, filter mask). Handles
    * both inline-element and paged data blocks; uninitialized pages
    * and undefined addresses are skipped by the caller (fill-value
    * regions). Client 0 = unfiltered (8-byte address elements);
    * client 1 = filtered (address + size + 4-byte mask).
    */
  private def readFixedArray(b: Buf, hdrAddr: Long): Seq[(Long, Long, Long, Int)] = {
    b.requireSig(hdrAddr, "FAHD")
    blockChecksum(b, hdrAddr, hdrAddr + 24, "Fixed Array header")
    val client = b.u8(hdrAddr + 5)
    val entrySize = b.u8(hdrAddr + 6)
    val pageBits = b.u8(hdrAddr + 7)
    val maxEntries = b.u64(hdrAddr + 8)
    val dblkAddr = b.u64(hdrAddr + 16)
    require(client == 0 || client == 1, s"unknown Fixed Array client $client")
    val csLen = if (client == 1) entrySize - 8 - 4 else 0
    require(if (client == 0) entrySize == 8 else csLen >= 1 && csLen <= 8,
      s"unexpected Fixed Array entry size $entrySize for client $client")
    val out = ArrayBuffer.empty[(Long, Long, Long, Int)]
    if (dblkAddr == Undef) return out.toSeq
    b.requireSig(dblkAddr, "FADB")
    def readElem(p: Long, linear: Long): Unit = {
      val addr = b.u64(p)
      if (client == 1)
        out += ((linear, addr, b.uN(p + 8, csLen), b.u32(p + 8 + csLen).toInt))
      else out += ((linear, addr, -1L, 0))
    }
    val pageElems = 1L << pageBits
    val body = dblkAddr + 4 + 1 + 1 + 8 // sig + version + client + header address
    if (maxEntries <= pageElems) {
      blockChecksum(b, dblkAddr, body + maxEntries * entrySize, "Fixed Array data block")
      var i = 0L
      while (i < maxEntries) { readElem(body + i * entrySize, i); i += 1 }
    } else {
      // paged: bitmap of initialized pages + checksum, then the pages
      // (each page = elements + 4-byte checksum) follow the block.
      // Bit order is H5VM MSB-first (r13 fix — the previous LSB-first
      // read was fixture-circular, never exercised by a real file)
      val nPages = (maxEntries + pageElems - 1) / pageElems
      val bitmapBytes = (nPages + 7) / 8
      blockChecksum(b, dblkAddr, body + bitmapBytes, "Fixed Array data block")
      var pageStart = body + bitmapBytes + 4
      var pg = 0L
      while (pg < nPages) {
        val inPage = math.min(pageElems, maxEntries - pg * pageElems)
        val initialized = bitGetMsb(b, body, pg)
        if (initialized) {
          blockChecksum(b, pageStart, pageStart + inPage * entrySize,
            "Fixed Array data block page")
          var i = 0L
          while (i < inPage) { readElem(pageStart + i * entrySize, pg * pageElems + i); i += 1 }
        }
        pageStart += inPage * entrySize + 4
        pg += 1
      }
    }
    out.toSeq
  }

  /** Entries of an Extensible Array chunk index, same tuple shape as
    * [[readFixedArray]]. Geometry per the public spec: the index
    * block (`EAIB`) holds the first `idxBlkElmts` elements inline,
    * then direct addresses for the data blocks of the first
    * `2*log2(supBlkMinPtrs)` super blocks, then super-block (`EASB`)
    * addresses; super block u holds 2^(u/2) data blocks (`EADB`) of
    * 2^((u+1)/2)*dataBlkMinElmts elements each. Undefined addresses
    * (not-yet-appended regions) are skipped. Paged data blocks
    * (element count beyond 2^maxDblkPageNelmtsBits — ≫10⁴ chunks per
    * block) are rejected precisely rather than misread.
    */
  private def readExtensibleArray(b: Buf, hdrAddr: Long): Seq[(Long, Long, Long, Int)] = {
    b.requireSig(hdrAddr, "EAHD")
    blockChecksum(b, hdrAddr, hdrAddr + 68, "Extensible Array header")
    val client = b.u8(hdrAddr + 5)
    val elemSize = b.u8(hdrAddr + 6)
    val maxBits = b.u8(hdrAddr + 7)
    val idxElmts = b.u8(hdrAddr + 8)
    val dblkMin = b.u8(hdrAddr + 9)
    val sblkMinPtrs = b.u8(hdrAddr + 10)
    val pageBits = b.u8(hdrAddr + 11)
    val idxBlkAddr = b.u64(hdrAddr + 12 + 48) // after the six 8-byte statistics
    require(client == 0 || client == 1, s"unknown Extensible Array client $client")
    val csLen = if (client == 1) elemSize - 8 - 4 else 0
    require(if (client == 0) elemSize == 8 else csLen >= 1 && csLen <= 8,
      s"unexpected Extensible Array element size $elemSize for client $client")
    require(Integer.bitCount(dblkMin) == 1 && Integer.bitCount(sblkMinPtrs) == 1,
      s"non-power-of-two Extensible Array geometry ($dblkMin/$sblkMinPtrs)")
    def log2(v: Int): Int = 31 - Integer.numberOfLeadingZeros(v)
    val nsblks = 1 + (maxBits - log2(dblkMin))
    val iblockNsblks = 2 * log2(sblkMinPtrs)
    val offSize = (maxBits + 7) / 8
    val pageElems = 1L << pageBits
    def ndblks(u: Int): Int = 1 << (u / 2)
    def dblkNelmts(u: Int): Long = (1L << ((u + 1) / 2)) * dblkMin
    val out = ArrayBuffer.empty[(Long, Long, Long, Int)]
    if (idxBlkAddr == Undef) return out.toSeq
    def readElem(p: Long, linear: Long): Unit = {
      val addr = b.u64(p)
      if (client == 1)
        out += ((linear, addr, b.uN(p + 8, csLen), b.u32(p + 8 + csLen).toInt))
      else out += ((linear, addr, -1L, 0))
    }
    def readDataBlock(addr: Long, start: Long, n: Long): Unit = {
      b.requireSig(addr, "EADB")
      var q = addr + 4 + 1 + 1 + 8 + offSize // sig, ver, client, hdr addr, block offset
      blockChecksum(b, addr, q + n * elemSize, "Extensible Array data block")
      var i = 0L
      while (i < n) { readElem(q, start + i); q += elemSize; i += 1 }
    }

    /** Paged data block (r13): when a block's element count exceeds
      * 2^pageBits, only the PREFIX (sig, version, client, header
      * address, block offset) plus its checksum is serialized at the
      * block address; the pages — each 2^pageBits elements followed
      * by a 4-byte checksum — are laid out contiguously right after
      * it (libhdf5 H5EAdblock/H5EAdblkpage). Which pages are
      * initialized is recorded in the OWNING SUPER BLOCK's page-init
      * bitmap, passed in here; uninitialized pages are fill-value
      * regions and are skipped unread (their bytes are garbage).
      * Geometry note: both n and 2^pageBits are powers of two (header
      * validation), so every page is full.
      */
    def readDataBlockPaged(addr: Long, start: Long, n: Long,
                           pageInit: Int => Boolean): Unit = {
      b.requireSig(addr, "EADB")
      val prefixEnd = addr + 4 + 1 + 1 + 8 + offSize
      blockChecksum(b, addr, prefixEnd, "Extensible Array data block")
      val pageSize = pageElems * elemSize + 4
      val nPages = (n / pageElems).toInt
      var pg = 0
      while (pg < nPages) {
        if (pageInit(pg)) {
          val pstart = prefixEnd + 4 + pg.toLong * pageSize
          blockChecksum(b, pstart, pstart + pageElems * elemSize,
            "Extensible Array data block page")
          var i = 0L
          var q = pstart
          while (i < pageElems) {
            readElem(q, start + pg.toLong * pageElems + i)
            q += elemSize; i += 1
          }
        }
        pg += 1
      }
    }
    b.requireSig(idxBlkAddr, "EAIB")
    val iblkEnd = idxBlkAddr + 14 + idxElmts.toLong * elemSize +
      (2L * (sblkMinPtrs - 1) + (nsblks - iblockNsblks)) * 8
    blockChecksum(b, idxBlkAddr, iblkEnd, "Extensible Array index block")
    var p = idxBlkAddr + 4 + 1 + 1 + 8
    var linear = 0L
    var i = 0
    while (i < idxElmts) { readElem(p, linear); p += elemSize; linear += 1; i += 1 }
    var u = 0
    while (u < iblockNsblks) { // direct data blocks, one list entry per block
      val n = dblkNelmts(u)
      var k = 0
      while (k < ndblks(u)) {
        val addr = b.u64(p); p += 8
        if (addr != Undef) {
          // a paged block's page-init bitmap lives in its owning
          // SUPER block; index-block-attached blocks have no such
          // owner, and libhdf5's default chunk-index geometry keeps
          // them well under a page — reject a pathological layout
          // precisely rather than guess page liveness
          require(n <= pageElems,
            s"paged index-block-attached Extensible Array data block ($n elements) unsupported")
          readDataBlock(addr, linear, n)
        }
        linear += n
        k += 1
      }
      u += 1
    }
    while (u < nsblks) { // super blocks
      val sbAddr = b.u64(p); p += 8
      val n = dblkNelmts(u)
      if (sbAddr != Undef) {
        b.requireSig(sbAddr, "EASB")
        var q = sbAddr + 4 + 1 + 1 + 8 + offSize
        // paged data blocks: the super block carries a page-init
        // bitmap (ndblks × pagesPerBlock bits, H5VM MSB-first order)
        // between the block offset and the data block addresses
        val paged = n > pageElems
        val pagesPerBlock = if (paged) (n / pageElems).toInt else 0
        val bitmapAt = q
        if (paged) q += (ndblks(u).toLong * pagesPerBlock + 7) / 8
        blockChecksum(b, sbAddr, q + ndblks(u).toLong * 8, "Extensible Array super block")
        var k = 0
        while (k < ndblks(u)) {
          val dbAddr = b.u64(q); q += 8
          if (dbAddr != Undef) {
            if (paged) {
              val base = k.toLong * pagesPerBlock
              readDataBlockPaged(dbAddr, linear + k * n, n,
                pg => bitGetMsb(b, bitmapAt, base + pg))
            } else readDataBlock(dbAddr, linear + k * n, n)
          }
          k += 1
        }
      }
      linear += ndblks(u).toLong * n
      u += 1
    }
    out.toSeq
  }

  /** One bit of an on-disk bitmap in libhdf5's H5VM order: bit
    * `offset` is `0x80 >> (offset % 8)` of byte `offset / 8` —
    * MSB-first within each byte (H5VMprivate.h's H5VM_bit_get, the
    * convention every page-init bitmap in the format uses).
    */
  private def bitGetMsb(b: Buf, base: Long, offset: Long): Boolean =
    (b.u8(base + offset / 8) & (0x80 >> (offset % 8).toInt)) != 0

  /** One object's (data offset, size) inside a global heap collection
    * (`GCOL` — where every variable-length value lives): header is
    * sig(4) + version(1) + 3 reserved + collection size(8), then
    * objects of index(2) + refcount(2) + 4 reserved + size(8) + data
    * padded to 8. Object index 0 is the free-space marker — walking
    * past it means the requested index is absent (precise error, not
    * garbage bytes).
    */
  private def globalHeapObject(b: Buf, collAddr: Long, idx: Int): (Long, Long) = {
    b.requireSig(collAddr, "GCOL")
    require(b.u8(collAddr + 4) == 1,
      s"unsupported global heap collection version ${b.u8(collAddr + 4)}")
    val end = collAddr + b.u64(collAddr + 8)
    var q = collAddr + 16
    while (q + 16 <= end) {
      val objIdx = b.u16(q)
      val objSize = b.u64(q + 8)
      if (objIdx == idx) return (q + 16, objSize)
      if (objIdx == 0) // free space runs to the collection end
        sys.error(s"global heap object $idx not found in collection at $collAddr")
      q += 16 + ((objSize + 7) & ~7L)
    }
    sys.error(s"global heap object $idx not found in collection at $collAddr")
  }

  /** Resolve one 16-byte variable-length descriptor (length u32,
    * collection address u64, object index u32) against its global
    * heap. A null descriptor (address 0 or undefined — an unwritten
    * element) is the empty string.
    */
  private def vlenString(b: Buf, desc: Buf, p: Long): String = {
    val len = desc.u32(p)
    val addr = desc.u64(p + 4)
    val idx = desc.u32(p + 12).toInt
    if (addr == 0 || addr == Undef || len == 0) ""
    else {
      val (dataAt, objSize) = globalHeapObject(b, addr, idx)
      new String(b.slice(dataAt, math.min(len, objSize)),
        java.nio.charset.StandardCharsets.UTF_8)
    }
  }

  /** Flattened numeric values of one dataset as doubles, row-major —
    * fixed-size strings yield per-byte code points (same convention
    * as [[NetCdf.readVarDoubles]]).
    */
  def readDoubles(bytes: Array[Byte], v: H5Var): Array[Double] = {
    require(v.dtype.cls != 9,
      s"${v.name} is variable-length — read it via readStrings/readDoubleSeqs")
    require(v.dtype.cls != 6,
      s"${v.name} is compound — read members via readCompoundDoubles")
    require(v.dtype.cls != 10,
      s"${v.name} is an array datatype — read per-record blocks via " +
        "readArrayBlocks")
    val raw = readRaw(bytes, v)
    val n = (raw.length / v.dtype.size).toInt
    val out = new Array[Double](n)
    var i = 0
    while (i < n) { out(i) = readElem(raw, i.toLong * v.dtype.size, v.dtype); i += 1 }
    out
  }

  /** Fixed-size-string dataset as one string per innermost row
    * (NUL-trimmed) — the shape of netCDF-4 `char x(n, strlen)` label
    * variables.
    */
  def readStrings(bytes: Array[Byte], v: H5Var): Array[String] = {
    require(v.dtype.cls == 3 || v.dtype.cls == 9,
      s"${v.name} is not a string/char dataset")
    if (v.dtype.cls == 9) {
      require(v.dtype.vlenString,
        s"${v.name} is a vlen SEQUENCE — read it via readDoubleSeqs")
      // variable-length: the dataset stores 16-byte descriptors; the
      // characters live in global heap collections
      val b = new Buf(bytes)
      val desc = new Buf(readRaw(bytes, v))
      val n = desc.bytes.length / v.dtype.size
      return Array.tabulate(n)(i => vlenString(b, desc, i.toLong * v.dtype.size))
    }
    val raw = readRaw(bytes, v)
    val rowLen = if (v.dtype.cls == 3 && v.dtype.size > 1) v.dtype.size
                 else v.dims.lastOption.getOrElse(1L).toInt * v.dtype.size
    val n = raw.length / rowLen
    (0 until n).map { i =>
      new String(raw, i * rowLen, rowLen, java.nio.charset.StandardCharsets.UTF_8)
        .takeWhile(_ != 0)
    }.toArray
  }

  /** Variable-length SEQUENCE dataset (datatype class 9, non-string,
    * numeric base): one `Array[Double]` per element — the ragged
    * per-record vectors netCDF-4 stores for, e.g., per-scan channel
    * lists. Each stored element is the same 16-byte descriptor the
    * vlen-string path resolves (length, global-heap collection
    * address, object index); the heap object holds `length`
    * base-type values. A null descriptor (the unwritten-element
    * convention) reads as an empty array; a heap object shorter than
    * its descriptor claims is a precise error, never a short read.
    */
  def readDoubleSeqs(bytes: Array[Byte], v: H5Var): Array[Array[Double]] = {
    require(v.dtype.cls == 9 && v.dtype.base.isDefined,
      s"${v.name} is not a variable-length sequence dataset")
    val base = v.dtype.base.get
    require(base.cls == 0 || base.cls == 1,
      s"${v.name}: vlen base class ${base.cls} unsupported (numeric bases only)")
    val b = new Buf(bytes)
    val desc = new Buf(readRaw(bytes, v))
    val n = desc.bytes.length / v.dtype.size
    Array.tabulate(n) { i =>
      val p = i.toLong * v.dtype.size
      val len = desc.u32(p)
      val addr = desc.u64(p + 4)
      val idx = desc.u32(p + 12).toInt
      if (addr == 0 || addr == Undef || len == 0) Array.empty[Double]
      else {
        val (dataAt, objSize) = globalHeapObject(b, addr, idx)
        require(objSize >= len * base.size,
          s"${v.name}[$i]: heap object holds $objSize bytes but the " +
            s"descriptor claims $len × ${base.size}-byte elements")
        Array.tabulate(len.toInt)(j =>
          readElem(bytes, dataAt + j.toLong * base.size, base))
      }
    }
  }

  /** Member names of a compound dataset, in declaration order. */
  def compoundMembers(v: H5Var): Seq[String] = {
    require(v.dtype.cls == 6, s"${v.name} is not a compound dataset")
    v.dtype.members.map(_.name)
  }

  private def compoundMember(v: H5Var, member: String): Member =
    v.dtype.members.find(_.name == member).getOrElse(sys.error(
      s"${v.name} has no member $member; have ${v.dtype.members.map(_.name).mkString(", ")}"))

  /** One numeric member column of a compound dataset, flattened
    * row-major — the table-shaped datasets (per-band calibration
    * records, DQF legend tables) netCDF-4 writes as compounds. The
    * stride is the compound element size; the member's own offset and
    * datatype decode each row's slot, so interleaved non-numeric
    * members are simply never touched.
    */
  def readCompoundDoubles(bytes: Array[Byte], v: H5Var, member: String): Array[Double] = {
    require(v.dtype.cls == 6, s"${v.name} is not a compound dataset")
    val m = compoundMember(v, member)
    require(m.dtype.cls == 0 || m.dtype.cls == 1 || m.dtype.cls == 8,
      s"${v.name}.$member is not numeric (class ${m.dtype.cls}) — " +
        "string members read via readCompoundStrings, array members " +
        "via readCompoundArrays")
    val raw = readRaw(bytes, v)
    val n = raw.length / v.dtype.size
    Array.tabulate(n)(i =>
      readElem(raw, i.toLong * v.dtype.size + m.offset, m.dtype))
  }

  /** One ARRAY-datatype member column of a compound dataset: each row
    * yields the member's fixed block, row-major over `arrayDims` —
    * the per-band / per-channel vectors netCDF-4 compounds carry.
    */
  def readCompoundArrays(bytes: Array[Byte], v: H5Var, member: String): Array[Array[Double]] = {
    require(v.dtype.cls == 6, s"${v.name} is not a compound dataset")
    val m = compoundMember(v, member)
    require(m.dtype.cls == 10,
      s"${v.name}.$member is not an array-datatype member (class ${m.dtype.cls})")
    val base = m.dtype.base.get
    val k = m.dtype.arrayDims.product
    val raw = readRaw(bytes, v)
    val n = raw.length / v.dtype.size
    Array.tabulate(n)(i => Array.tabulate(k)(j =>
      readElem(raw, i.toLong * v.dtype.size + m.offset + j.toLong * base.size, base)))
  }

  /** Standalone array-datatype dataset as one fixed block per record:
    * a dataset of shape (N,) over T[d₁,…,dₖ] reads as N blocks of
    * d₁·…·dₖ base values each — the same per-record block shape
    * [[readCompoundArrays]] returns for array MEMBERS, so per-band
    * calibration tables read identically whether they were written
    * as a bare array dataset or wrapped in a compound.
    */
  def readArrayBlocks(bytes: Array[Byte], v: H5Var): Array[Array[Double]] = {
    require(v.dtype.cls == 10,
      s"${v.name} is not an array-datatype dataset (class ${v.dtype.cls})")
    val base = v.dtype.base.get
    val k = v.dtype.arrayDims.product
    val raw = readRaw(bytes, v)
    val n = raw.length / v.dtype.size
    Array.tabulate(n)(i => Array.tabulate(k)(j =>
      readElem(raw, i.toLong * v.dtype.size + j.toLong * base.size, base)))
  }

  /** The name→value legend of an enum dataset (or enum compound
    * member datatype) — flag meanings travel with the data in
    * netCDF-4, and the values themselves read numerically through the
    * ordinary paths since an enum IS its fixed-point base.
    */
  def enumLabels(dt: Dtype): Seq[(String, Double)] = {
    require(dt.cls == 8, s"not an enum datatype (class ${dt.cls})")
    dt.labels
  }

  /** One fixed-size-string member column of a compound dataset,
    * NUL-trimmed per row.
    */
  def readCompoundStrings(bytes: Array[Byte], v: H5Var, member: String): Array[String] = {
    require(v.dtype.cls == 6, s"${v.name} is not a compound dataset")
    val m = compoundMember(v, member)
    require(m.dtype.cls == 3,
      s"${v.name}.$member is not a fixed-size string (class ${m.dtype.cls})")
    val raw = readRaw(bytes, v)
    val n = raw.length / v.dtype.size
    Array.tabulate(n) { i =>
      new String(raw, i * v.dtype.size + m.offset, m.dtype.size,
        java.nio.charset.StandardCharsets.UTF_8).takeWhile(_ != 0)
    }
  }
}
