// Native sub-byte packing kernels for the .aeqg serializer.
//
// Packs int4/int2 tensors (held in int8 containers) into dense bytes and
// back. Layout matches the Python reference
// (algorithms/uniform/quant_numerics.py pack_subbyte): little-nibble-first —
// element i lands in byte i/per_byte at bit (i % per_byte) * bits.
//
// Exposed with C linkage for ctypes (utils/native_packing.py).

#include <cstdint>
#include <cstring>

extern "C" {

// n = number of logical elements; dst must hold ceil(n/2) bytes.
void aeqt_pack_int4(const int8_t* src, uint8_t* dst, int64_t n) {
  int64_t i = 0;
  int64_t pairs = n / 2;
  for (int64_t p = 0; p < pairs; ++p, i += 2) {
    uint8_t lo = static_cast<uint8_t>(src[i]) & 0x0F;
    uint8_t hi = static_cast<uint8_t>(src[i + 1]) & 0x0F;
    dst[p] = static_cast<uint8_t>(lo | (hi << 4));
  }
  if (n & 1) {
    dst[pairs] = static_cast<uint8_t>(src[n - 1]) & 0x0F;
  }
}

void aeqt_unpack_int4(const uint8_t* src, int8_t* dst, int64_t n) {
  int64_t i = 0;
  int64_t pairs = n / 2;
  for (int64_t p = 0; p < pairs; ++p, i += 2) {
    int8_t lo = static_cast<int8_t>(src[p] & 0x0F);
    int8_t hi = static_cast<int8_t>(src[p] >> 4);
    // Sign-extend 4-bit two's complement.
    dst[i] = static_cast<int8_t>((lo ^ 8) - 8);
    dst[i + 1] = static_cast<int8_t>((hi ^ 8) - 8);
  }
  if (n & 1) {
    int8_t lo = static_cast<int8_t>(src[pairs] & 0x0F);
    dst[n - 1] = static_cast<int8_t>((lo ^ 8) - 8);
  }
}

// dst must hold ceil(n/4) bytes.
void aeqt_pack_int2(const int8_t* src, uint8_t* dst, int64_t n) {
  int64_t nbytes = (n + 3) / 4;
  for (int64_t b = 0; b < nbytes; ++b) {
    uint8_t acc = 0;
    for (int j = 0; j < 4; ++j) {
      int64_t i = b * 4 + j;
      if (i < n) {
        acc |= (static_cast<uint8_t>(src[i]) & 0x03) << (2 * j);
      }
    }
    dst[b] = acc;
  }
}

void aeqt_unpack_int2(const uint8_t* src, int8_t* dst, int64_t n) {
  for (int64_t i = 0; i < n; ++i) {
    int8_t v = static_cast<int8_t>((src[i / 4] >> (2 * (i % 4))) & 0x03);
    dst[i] = static_cast<int8_t>((v ^ 2) - 2);
  }
}

}  // extern "C"
