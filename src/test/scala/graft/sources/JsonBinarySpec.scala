package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** MySQL binary-JSON ("jsonb") decoding against hand-derived golden bytes:
  * each layout was struct-packed by hand from the json_binary.h layout
  * (count/size headers, fixed-width entries, inlined small scalars,
  * container-relative offsets), independently of the decoder under test.
  */
class JsonBinarySpec extends AnyFunSuite {

  private def unhex(s: String): Array[Byte] =
    s.replaceAll("\\s+", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  test("scalar roots") {
    assert(JsonBinary.text(Array.emptyByteArray) == "null")
    assert(JsonBinary.text(unhex("05 0700")) == "7")
    assert(JsonBinary.text(unhex("05 f9ff")) == "-7") // int16 is signed
    assert(JsonBinary.text(unhex("06 f9ff")) == "65529") // uint16 is not
    assert(JsonBinary.text(unhex("04 01")) == "true")
    assert(JsonBinary.text(unhex("0c 02 6869")) == "\"hi\"")
    // uint64 max renders unsigned
    assert(JsonBinary.text(unhex("0a ffffffffffffffff")) == "18446744073709551615")
    // int64 min stays signed
    assert(JsonBinary.text(unhex("09 0000000000000080")) == "-9223372036854775808")
  }

  test("small array with inlined scalars, string, double") {
    // [1,true,null,"hi",3.5]: header 4 + 5*3 = 19; "hi" at 19, 3.5 at 22
    val doc = unhex(
      "02" + // type: small array (offsets below are payload-relative)
        "0500 1e00" + // count=5 size=30
        "05 0100" + // int16 1 inlined
        "04 0100" + // true
        "04 0000" + // null
        "0c 1300" + // string @19
        "0b 1600" + // double @22
        "02 6869" + // varlen 2, "hi"
        "000000000000 0c40") // 3.5 LE
    assert(JsonBinary.text(doc) == "[1,true,null,\"hi\",3.5]")
  }

  test("small object with key directory") {
    // {"a":7,"bc":"x"}: header 4 + 2*4 + 2*3 = 18; keys at 18,19; value @21
    val doc = unhex(
      "00" + // type: small object
        "0200 1700" + // count=2 size=23
        "1200 0100" + // key0 @18 len1
        "1300 0200" + // key1 @19 len2
        "05 0700" + // value0: int16 7 inlined
        "0c 1500" + // value1: string @21
        "61" + "6263" + // "a","bc"
        "01 78") // varlen 1, "x"
    assert(JsonBinary.text(doc) == "{\"a\":7,\"bc\":\"x\"}")
  }

  test("nested container offsets are container-relative") {
    // {"n":[1,2]}: outer header 4+4+3=11, key "n" @11, inner array @12
    val doc = unhex(
      "00" + // type: small object
        "0100 1600" + // count=1 size=22
        "0b00 0100" + // key @11 len1
        "02 0c00" + // value: small array @12
        "6e" + // "n"
        "0200 0a00 05 0100 05 0200") // [1,2]
    assert(JsonBinary.text(doc) == "{\"n\":[1,2]}")
  }

  test("large object inlines int32 in its 4-byte slots") {
    // {"k":100000}: header 8 + 6 + 5 = 19; key "k" @19
    val doc = unhex(
      "01" + // type: large object
        "01000000 14000000" + // count=1 size=20
        "13000000 0100" + // key @19 len1
        "07 a0860100" + // int32 100000 inlined
        "6b")
    assert(JsonBinary.text(doc) == "{\"k\":100000}")
  }

  test("opaque decimal decodes through the row-image decimal codec") {
    // DECIMAL(4,2) 12.30: packed bytes (0x80|12, 30); opaque payload is
    // (field type 246, varlen 4, precision 4, scale 2, packed)
    assert(JsonBinary.text(unhex("0f f6 04 04 02 8c 1e")) == "12.30")
    // and an unsupported opaque type fails loudly, never silently corrupts
    val e = intercept[UnsupportedOperationException] {
      JsonBinary.text(unhex("0f 0a 01 00"))
    }
    assert(e.getMessage.contains("opaque field type 10"))
  }

  test("string escaping goes through the shared JSON escaper") {
    // key and value both need escaping: {"q\"":"a\nb"}
    // header 4+4+3=11, key @11 len 2, value @13
    val doc = unhex(
      "00" + // type: small object
        "0100 1100" +
        "0b00 0200" +
        "0c 0d00" +
        "7122" + // q"
        "03 610a62") // a\nb
    assert(JsonBinary.text(doc) == "{\"q\\\"\":\"a\\nb\"}")
  }
}
