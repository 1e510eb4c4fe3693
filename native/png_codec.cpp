// Native PNG codec + preprocessing for the serving IO path.
//
// The reference decodes/encodes on the host per request through
// cv2.imdecode / imencode inside each Flask worker (SwinIR
// model_serving.py:228-252). This library provides the same host-side
// stage for the TPU engine without the Python/GIL overhead:
//   - PNG decode (zlib inflate + per-row unfilter, 8-bit RGB/RGBA/gray)
//   - PNG encode (filter 0 + zlib deflate)
//   - fused uint8 -> float32 [0,1] normalize with optional bottom/right
//     edge padding (the pad-to-multiple step), so the array handed to
//     device transfer is already model-shaped.
//
// Exposed as a plain C ABI for ctypes (core/io_native.py).

#include <zlib.h>

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Reader {
  const uint8_t* p;
  size_t n;
  size_t off = 0;
  bool ok = true;

  uint32_t u32() {
    if (off + 4 > n) { ok = false; return 0; }
    uint32_t v = (uint32_t(p[off]) << 24) | (uint32_t(p[off + 1]) << 16) |
                 (uint32_t(p[off + 2]) << 8) | uint32_t(p[off + 3]);
    off += 4;
    return v;
  }
};

inline uint8_t paeth(int a, int b, int c) {
  int pa = b - c, pb = a - c, pc = pa + pb;
  pa = pa < 0 ? -pa : pa;
  pb = pb < 0 ? -pb : pb;
  pc = pc < 0 ? -pc : pc;
  if (pa <= pb && pa <= pc) return uint8_t(a);
  if (pb <= pc) return uint8_t(b);
  return uint8_t(c);
}

bool inflate_all(const uint8_t* src, size_t n, std::vector<uint8_t>* out) {
  z_stream zs;
  std::memset(&zs, 0, sizeof(zs));
  if (inflateInit(&zs) != Z_OK) return false;
  zs.next_in = const_cast<uint8_t*>(src);
  zs.avail_in = static_cast<uInt>(n);
  zs.next_out = out->data();
  zs.avail_out = static_cast<uInt>(out->size());
  int rc = inflate(&zs, Z_FINISH);
  inflateEnd(&zs);
  return rc == Z_STREAM_END || (rc == Z_OK && zs.avail_out == 0);
}

}  // namespace

extern "C" {

// Parse header only: fills w, h, channels. Returns 0 on success.
int png_probe(const uint8_t* data, size_t n, uint32_t* w, uint32_t* h,
              uint32_t* channels) {
  static const uint8_t kSig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  if (n < 33 || std::memcmp(data, kSig, 8) != 0) return -1;
  Reader r{data, n, 8};
  uint32_t len = r.u32();
  uint32_t type = r.u32();
  if (!r.ok || len != 13 || type != 0x49484452 /*IHDR*/) return -2;
  *w = r.u32();
  *h = r.u32();
  uint8_t depth = data[r.off++];
  uint8_t color = data[r.off++];
  uint8_t compression = data[r.off++];
  uint8_t filter = data[r.off++];
  uint8_t interlace = data[r.off++];
  if (depth != 8) return -3;  // 8-bit only
  switch (color) {
    case 0: *channels = 1; break;
    case 2: *channels = 3; break;
    case 4: *channels = 2; break;
    case 6: *channels = 4; break;
    default: return -4;  // palette unsupported
  }
  // Adam7 interlacing stores scanlines in pass order; the sequential
  // unfilter below would silently corrupt it. Reject so callers fall back
  // to PIL. Same for unknown compression/filter methods.
  if (compression != 0 || filter != 0 || interlace != 0) return -7;
  return 0;
}

// Decode into caller-allocated out (h*w*channels bytes). Returns 0 on ok.
int png_decode(const uint8_t* data, size_t n, uint8_t* out) {
  uint32_t w, h, ch;
  int rc = png_probe(data, n, &w, &h, &ch);
  if (rc != 0) return rc;

  // gather IDAT payload
  std::vector<uint8_t> idat;
  Reader r{data, n, 8};
  while (r.off + 8 <= n) {
    uint32_t len = r.u32();
    uint32_t type = r.u32();
    if (!r.ok || r.off + len + 4 > n) return -5;
    if (type == 0x49444154 /*IDAT*/) {
      idat.insert(idat.end(), data + r.off, data + r.off + len);
    }
    if (type == 0x49454E44 /*IEND*/) break;
    r.off += len + 4;  // skip payload + crc
  }
  if (idat.empty()) return -6;

  const size_t stride = size_t(w) * ch;
  std::vector<uint8_t> raw((stride + 1) * h);
  if (!inflate_all(idat.data(), idat.size(), &raw)) return -7;

  // unfilter row by row
  std::vector<uint8_t> prev(stride, 0);
  for (uint32_t y = 0; y < h; ++y) {
    const uint8_t* src = raw.data() + y * (stride + 1);
    uint8_t filter = src[0];
    const uint8_t* cur_in = src + 1;
    uint8_t* dst = out + y * stride;
    switch (filter) {
      case 0:
        std::memcpy(dst, cur_in, stride);
        break;
      case 1:
        for (size_t i = 0; i < stride; ++i)
          dst[i] = uint8_t(cur_in[i] + (i >= ch ? dst[i - ch] : 0));
        break;
      case 2:
        for (size_t i = 0; i < stride; ++i)
          dst[i] = uint8_t(cur_in[i] + prev[i]);
        break;
      case 3:
        for (size_t i = 0; i < stride; ++i) {
          int left = i >= ch ? dst[i - ch] : 0;
          dst[i] = uint8_t(cur_in[i] + ((left + prev[i]) >> 1));
        }
        break;
      case 4:
        for (size_t i = 0; i < stride; ++i) {
          int left = i >= ch ? dst[i - ch] : 0;
          int ul = i >= ch ? prev[i - ch] : 0;
          dst[i] = uint8_t(cur_in[i] + paeth(left, prev[i], ul));
        }
        break;
      default:
        return -8;
    }
    std::memcpy(prev.data(), dst, stride);
  }
  return 0;
}

// Encode RGB/gray 8-bit rows (filter 0). Returns payload size or <0.
// out must have capacity cap; call with cap==0 to get a size upper bound.
long png_encode(const uint8_t* img, uint32_t w, uint32_t h, uint32_t ch,
                int level, uint8_t* out, size_t cap) {
  const size_t stride = size_t(w) * ch;
  const size_t raw_size = (stride + 1) * h;
  uLongf bound = compressBound(static_cast<uLong>(raw_size));
  size_t need = 8 + 25 + (12 + bound) + 12;
  if (cap == 0) return static_cast<long>(need);  // size query: img unused
  if (cap < need) return -1;

  std::vector<uint8_t> raw(raw_size);
  for (uint32_t y = 0; y < h; ++y) {
    raw[y * (stride + 1)] = 0;
    std::memcpy(raw.data() + y * (stride + 1) + 1, img + y * stride, stride);
  }

  std::vector<uint8_t> z(bound);
  uLongf zlen = bound;
  if (compress2(z.data(), &zlen, raw.data(),
                static_cast<uLong>(raw.size()), level) != Z_OK)
    return -2;

  uint8_t* p = out;
  auto put32 = [&p](uint32_t v) {
    p[0] = uint8_t(v >> 24); p[1] = uint8_t(v >> 16);
    p[2] = uint8_t(v >> 8); p[3] = uint8_t(v);
    p += 4;
  };
  auto chunk = [&](const char* type, const uint8_t* payload, uint32_t len) {
    put32(len);
    std::memcpy(p, type, 4);
    uint8_t* crc_start = p;
    p += 4;
    if (len) std::memcpy(p, payload, len);
    p += len;
    uLong crc = crc32(0, crc_start, 4 + len);
    put32(static_cast<uint32_t>(crc));
  };

  static const uint8_t kSig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  std::memcpy(p, kSig, 8);
  p += 8;
  uint8_t ihdr[13];
  ihdr[0] = uint8_t(w >> 24); ihdr[1] = uint8_t(w >> 16);
  ihdr[2] = uint8_t(w >> 8); ihdr[3] = uint8_t(w);
  ihdr[4] = uint8_t(h >> 24); ihdr[5] = uint8_t(h >> 16);
  ihdr[6] = uint8_t(h >> 8); ihdr[7] = uint8_t(h);
  ihdr[8] = 8;  // bit depth
  ihdr[9] = ch == 1 ? 0 : (ch == 3 ? 2 : (ch == 4 ? 6 : 0));
  ihdr[10] = ihdr[11] = ihdr[12] = 0;
  chunk("IHDR", ihdr, 13);
  chunk("IDAT", z.data(), static_cast<uint32_t>(zlen));
  chunk("IEND", nullptr, 0);
  return static_cast<long>(p - out);
}

// Fused uint8 HWC -> float32 [0,1] with bottom/right zero pad to
// (out_h, out_w). out must hold out_h*out_w*ch floats.
void u8_to_f32_pad(const uint8_t* img, uint32_t h, uint32_t w, uint32_t ch,
                   uint32_t out_h, uint32_t out_w, float* out) {
  const float k = 1.0f / 255.0f;
  for (uint32_t y = 0; y < out_h; ++y) {
    float* row = out + size_t(y) * out_w * ch;
    if (y < h) {
      const uint8_t* src = img + size_t(y) * w * ch;
      size_t ncopy = size_t(w) * ch;
      for (size_t i = 0; i < ncopy; ++i) row[i] = src[i] * k;
      std::memset(row + ncopy, 0, (size_t(out_w) - w) * ch * sizeof(float));
    } else {
      std::memset(row, 0, size_t(out_w) * ch * sizeof(float));
    }
  }
}

}  // extern "C"
