// Minimal RGBA8 -> PNG encoder (filter-0 scanlines, single IDAT, zlib).
// Shared by the async file sink (framesink.cpp) and the HTTP live-view
// server (httpview.cpp).
#pragma once

#include <cstdint>
#include <vector>

#include <zlib.h>

namespace pngenc {

inline void put_be32(std::vector<uint8_t>& out, uint32_t v) {
  out.push_back(uint8_t(v >> 24));
  out.push_back(uint8_t(v >> 16));
  out.push_back(uint8_t(v >> 8));
  out.push_back(uint8_t(v));
}

inline void put_chunk(std::vector<uint8_t>& out, const char tag[4],
                      const uint8_t* data, size_t n) {
  put_be32(out, uint32_t(n));
  size_t tag_off = out.size();
  out.insert(out.end(), tag, tag + 4);
  if (n) out.insert(out.end(), data, data + n);
  uLong crc = crc32(0L, out.data() + tag_off, uInt(4 + n));
  put_be32(out, uint32_t(crc));
}

inline std::vector<uint8_t> encode_png(const uint8_t* rgba, int w, int h) {
  std::vector<uint8_t> raw;
  raw.reserve(size_t(h) * (1 + size_t(w) * 4));
  for (int y = 0; y < h; y++) {
    raw.push_back(0);  // filter: none
    raw.insert(raw.end(), rgba + size_t(y) * w * 4,
               rgba + size_t(y + 1) * w * 4);
  }
  uLongf bound = compressBound(uLong(raw.size()));
  std::vector<uint8_t> compressed(bound);
  compress2(compressed.data(), &bound, raw.data(), uLong(raw.size()), 6);
  compressed.resize(bound);

  std::vector<uint8_t> out;
  static const uint8_t sig[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'};
  out.insert(out.end(), sig, sig + 8);
  uint8_t ihdr[13];
  ihdr[0] = uint8_t(w >> 24); ihdr[1] = uint8_t(w >> 16);
  ihdr[2] = uint8_t(w >> 8);  ihdr[3] = uint8_t(w);
  ihdr[4] = uint8_t(h >> 24); ihdr[5] = uint8_t(h >> 16);
  ihdr[6] = uint8_t(h >> 8);  ihdr[7] = uint8_t(h);
  ihdr[8] = 8;   // bit depth
  ihdr[9] = 6;   // RGBA
  ihdr[10] = ihdr[11] = ihdr[12] = 0;
  put_chunk(out, "IHDR", ihdr, 13);
  put_chunk(out, "IDAT", compressed.data(), compressed.size());
  put_chunk(out, "IEND", nullptr, 0);
  return out;
}

}  // namespace pngenc
