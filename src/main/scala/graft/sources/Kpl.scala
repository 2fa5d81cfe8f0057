package graft.sources

/**
 * KPL record aggregation — the de-facto wire format every
 * high-throughput Kinesis deployment speaks. The Kinesis Producer
 * Library packs many user records into one Kinesis record to beat the
 * 1000 records/s/shard PutRecords ceiling, and every consumer that
 * doesn't de-aggregate reads protobuf blobs instead of user data — so
 * a Kinesis SOURCE without this is incomplete in exactly the way that
 * only shows up in production. Format (public, from the
 * awslabs/kinesis-aggregation spec and the KCL implementation):
 *
 *   magic 0xF3 0x89 0x9A 0xC2
 *   | protobuf AggregatedRecord
 *   | 16-byte MD5 of the protobuf bytes
 *
 *   message AggregatedRecord {
 *     repeated string partition_key_table    = 1;
 *     repeated string explicit_hash_key_table = 2;
 *     repeated Record records                = 3;
 *   }
 *   message Record {
 *     required uint64 partition_key_index    = 1;
 *     optional uint64 explicit_hash_key_index = 2;
 *     required bytes  data                   = 3;
 *   }
 *
 * The protobuf subset used (varint + length-delimited fields) is
 * hand-parsed — no protobuf dependency, and the MD5 trailer gates
 * every parse anyway.
 *
 * Detection follows the KCL contract: a record that lacks the magic
 * or whose MD5 trailer does not verify IS NOT an aggregate and passes
 * through untouched (ordinary producers may legitimately emit bytes
 * that start with anything, including the magic). A record whose MD5
 * DOES verify but whose protobuf is malformed or whose key indexes
 * dangle is corrupt beyond coincidence — that fails loudly rather
 * than silently dropping user data.
 *
 * [[aggregate]] is the producer side of the same format (usable ahead
 * of [[graft.streaming.KinesisSink]] to pack small records), which
 * also makes the round-trip property testable without AWS.
 */
object Kpl {

  val Magic: Array[Byte] =
    Array(0xF3, 0x89, 0x9A, 0xC2).map(_.toByte)

  private def md5(bytes: Array[Byte], from: Int, len: Int): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(bytes, from, len)
    md.digest()
  }

  // ---- minimal protobuf wire reader ------------------------------

  private final class Reader(buf: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end
    def varint(): Long = {
      var shift = 0; var out = 0L
      while (true) {
        require(pos < end, "varint runs past the buffer")
        val b = buf(pos); pos += 1
        out |= (b & 0x7FL) << shift
        if ((b & 0x80) == 0) return out
        shift += 7
        require(shift < 64, "varint too long")
      }
      out // unreachable
    }
    def lengthDelimited(): (Int, Int) = {
      // Length stays a Long until the bound check: a crafted MD5-valid
      // aggregate with a length near 2^31 must fail HERE (the
      // subtraction form cannot overflow), not truncate into a small
      // value or slip past an Int-overflowed `pos + len` and AIOOBE
      // later — "verified digest parses loudly or correctly" holds for
      // adversarial producers too.
      val len = varint()
      require(len >= 0L && len <= (end - pos).toLong,
        s"length-delimited field overruns (len=$len, remaining=${end - pos})")
      val at = pos; pos += len.toInt; (at, len.toInt)
    }
    def skip(wireType: Int): Unit = wireType match {
      case 0 => varint(); ()
      case 2 => lengthDelimited(); ()
      case 1 => require(pos + 8 <= end, "fixed64 overruns"); pos += 8
      case 5 => require(pos + 4 <= end, "fixed32 overruns"); pos += 4
      case t => throw new IllegalStateException(s"unsupported wire type $t")
    }
  }

  /** One de-aggregated user record: payload + the partition key the
    * producer assigned it (sub-records of one aggregate carry their
    * OWN keys — the aggregate's outer key is just shard routing). */
  final case class UserRecord(partitionKey: String, data: Array[Byte])

  /** KCL-contract detection + parse: None = not a KPL aggregate (no
    * magic or MD5 mismatch — pass the record through); Some = the
    * expanded user records, in producer order. A verified-MD5 payload
    * that fails to parse throws — that is corruption, not coincidence. */
  def deaggregate(record: Array[Byte]): Option[Seq[UserRecord]] = {
    if (record.length < Magic.length + 16) return None
    var i = 0
    while (i < Magic.length) {
      if (record(i) != Magic(i)) return None
      i += 1
    }
    val payloadLen = record.length - Magic.length - 16
    val digest = md5(record, Magic.length, payloadLen)
    val trailerAt = record.length - 16
    var j = 0
    while (j < 16) {
      if (digest(j) != record(trailerAt + j)) return None
      j += 1
    }
    val r = new Reader(record, Magic.length, trailerAt)
    val keys = Seq.newBuilder[String]
    val recs = Seq.newBuilder[(Long, Array[Byte])]
    while (r.hasMore) {
      val tag = r.varint()
      val (field, wire) = ((tag >> 3).toInt, (tag & 7).toInt)
      field match {
        case 1 =>
          val (at, len) = r.lengthDelimited()
          keys += new String(record, at, len, "UTF-8")
        case 3 =>
          val (at, len) = r.lengthDelimited()
          val rr = new Reader(record, at, at + len)
          var pki = -1L
          var data: Array[Byte] = null
          while (rr.hasMore) {
            val t = rr.varint()
            ((t >> 3).toInt, (t & 7).toInt) match {
              case (1, 0) => pki = rr.varint()
              case (3, 2) =>
                val (dAt, dLen) = rr.lengthDelimited()
                data = java.util.Arrays.copyOfRange(record, dAt, dAt + dLen)
              case (_, w) => rr.skip(w)
            }
          }
          require(pki >= 0 && data != null,
            "KPL Record missing partition_key_index or data")
          recs += ((pki, data))
        case _ => r.skip(wire)
      }
    }
    val keyTable = keys.result()
    Some(recs.result().map { case (pki, data) =>
      require(pki < keyTable.length,
        s"KPL partition_key_index $pki dangles (table has ${keyTable.length})")
      UserRecord(keyTable(pki.toInt), data)
    })
  }

  // ---- producer side ---------------------------------------------

  private def writeVarint(out: java.io.ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7FL) != 0) {
      out.write(((v & 0x7F) | 0x80).toInt); v >>>= 7
    }
    out.write(v.toInt)
  }

  private def writeField(out: java.io.ByteArrayOutputStream,
      field: Int, bytes: Array[Byte]): Unit = {
    writeVarint(out, (field << 3) | 2L)
    writeVarint(out, bytes.length.toLong)
    out.write(bytes, 0, bytes.length)
  }

  /** Pack user records into one KPL aggregate (distinct partition keys
    * dedup into the key table, exactly as the KPL does). */
  def aggregate(records: Seq[UserRecord]): Array[Byte] = {
    require(records.nonEmpty, "cannot aggregate zero records")
    val keyTable = records.map(_.partitionKey).distinct
    val keyIndex = keyTable.zipWithIndex.toMap
    val body = new java.io.ByteArrayOutputStream()
    keyTable.foreach(k => writeField(body, 1, k.getBytes("UTF-8")))
    records.foreach { ur =>
      val rec = new java.io.ByteArrayOutputStream()
      writeVarint(rec, (1 << 3) | 0L) // partition_key_index, varint
      writeVarint(rec, keyIndex(ur.partitionKey).toLong)
      writeField(rec, 3, ur.data)
      writeField(body, 3, rec.toByteArray)
    }
    val payload = body.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    out.write(Magic, 0, Magic.length)
    out.write(payload, 0, payload.length)
    val digest = md5(payload, 0, payload.length)
    out.write(digest, 0, digest.length)
    out.toByteArray
  }
}
