// ctypes-facing wrapper around jpeg_encode.h (the dependency-free baseline
// JPEG encoder).  Python preallocates an output buffer (w*h*4 + 4096 is
// always enough for baseline 4:2:0 — worst case is far below the raw size)
// and gets the encoded length back; see utils/jpeg.py.

#include <cstdint>
#include <cstring>

#include "jpeg_encode.h"

extern "C" {

// Encode RGBA -> JPEG into out (capacity out_cap).  Returns the number of
// bytes written, or -(needed) when out_cap is too small (call again with a
// bigger buffer), or 0 on bad arguments.  ``threads`` > 1 row-stripes the
// entropy coding over worker threads (restart-marker bands — see
// jpeg_encode.h); <= 1 is the bit-identical single-threaded stream.
long jpg_encode_mt(const uint8_t* rgba, int w, int h, int quality,
                   int threads, uint8_t* out, long out_cap) {
  if (!rgba || !out || w <= 0 || h <= 0 || w > 0xFFFF || h > 0xFFFF) return 0;
  std::vector<uint8_t> data = jpegenc::encode_jpeg(rgba, w, h, quality,
                                                   threads);
  if (long(data.size()) > out_cap) return -long(data.size());
  std::memcpy(out, data.data(), data.size());
  return long(data.size());
}

long jpg_encode(const uint8_t* rgba, int w, int h, int quality, uint8_t* out,
                long out_cap) {
  return jpg_encode_mt(rgba, w, h, quality, 1, out, out_cap);
}

}  // extern "C"
