// Native I/O codec engine — the framework's C++ runtime component.
//
// The reference's entire I/O stack is native (Rust serde + csv + rmp,
// src/input.rs / src/output.rs). This library is the counterpart for the
// hot array-serialisation paths, where pure Python is orders of magnitude
// too slow for production grids (a 256³ CSV is 16.7M records):
//
//   * PlainRecord CSV:  headerless "i,j,k,data" rows (src/output.rs:148-165)
//   * MessagePack:      rmp-serde compact Array3 layout [1,[x,y,z],[data...]]
//
// Float text formatting uses std::to_chars (shortest round-trip, the same
// guarantee Rust's ryu gives the reference). Exposed as a plain C ABI for
// ctypes; buffers are malloc'd here and freed via wafer_free.

#include <charconv>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <cstdio>
#include <vector>

extern "C" {

void wafer_free(void* p) { free(p); }

// --------------------------------------------------------------------------
// CSV encode: data (row-major, nx*ny*nz doubles) -> "i,j,k,v\n" text
// Returns malloc'd buffer, length in *out_len. Caller frees.
// --------------------------------------------------------------------------
char* wafer_csv_encode(const double* data, int64_t nx, int64_t ny, int64_t nz,
                       int64_t* out_len) {
  const int64_t n = nx * ny * nz;
  // worst case per row: 3×20-digit indices + 24-char double + 3 commas + \n
  size_t cap = static_cast<size_t>(n) * 96 + 64;
  char* buf = static_cast<char*>(malloc(cap));
  if (!buf) return nullptr;
  char* p = buf;
  int64_t idx = 0;
  for (int64_t i = 0; i < nx; ++i) {
    for (int64_t j = 0; j < ny; ++j) {
      for (int64_t k = 0; k < nz; ++k, ++idx) {
        p = p + snprintf(p, 64, "%lld,%lld,%lld,", (long long)i, (long long)j,
                         (long long)k);
        double v = data[idx];
        auto res = std::to_chars(p, p + 32, v);
        p = res.ptr;
        // match Python repr: integral floats print as "1.0", not "1"
        bool has_dot = false;
        for (char* q = res.ptr - 1; q >= buf && *q != ','; --q) {
          if (*q == '.' || *q == 'e' || *q == 'E' || *q == 'n' || *q == 'i') {
            has_dot = true;
            break;
          }
        }
        if (!has_dot) {
          *p++ = '.';
          *p++ = '0';
        }
        *p++ = '\n';
      }
    }
  }
  *out_len = p - buf;
  return buf;
}

// --------------------------------------------------------------------------
// CSV decode: parse "i,j,k,v" rows; dims inferred from max indices
// (reference: src/input.rs:607-662). Values are returned in file order with
// their indices so Python can scatter them (sparse-tolerant, like serde).
// Returns 0 on success.
// --------------------------------------------------------------------------
int wafer_csv_decode(const char* text, int64_t len, int64_t** out_ijk,
                     double** out_vals, int64_t* out_n) {
  std::vector<int64_t> ijk;
  std::vector<double> vals;
  ijk.reserve(1 << 20);
  vals.reserve(1 << 20);
  const char* p = text;
  const char* end = text + len;
  while (p < end) {
    // skip blank lines
    if (*p == '\n' || *p == '\r') {
      ++p;
      continue;
    }
    int64_t f[3];
    for (int c = 0; c < 3; ++c) {
      int64_t v = 0;
      auto res = std::from_chars(p, end, v);
      if (res.ec != std::errc() || res.ptr >= end || *res.ptr != ',') return 1;
      f[c] = v;
      p = res.ptr + 1;
    }
    double v = 0;
    auto res = std::from_chars(p, end, v);
    if (res.ec != std::errc()) return 1;
    p = res.ptr;
    while (p < end && *p != '\n') ++p;  // tolerate \r / trailing fields
    if (p < end) ++p;
    ijk.push_back(f[0]);
    ijk.push_back(f[1]);
    ijk.push_back(f[2]);
    vals.push_back(v);
  }
  const int64_t n = static_cast<int64_t>(vals.size());
  int64_t* pijk = static_cast<int64_t*>(malloc(sizeof(int64_t) * 3 * n));
  double* pv = static_cast<double*>(malloc(sizeof(double) * n));
  if ((!pijk || !pv) && n > 0) return 2;
  memcpy(pijk, ijk.data(), sizeof(int64_t) * 3 * n);
  memcpy(pv, vals.data(), sizeof(double) * n);
  *out_ijk = pijk;
  *out_vals = pv;
  *out_n = n;
  return 0;
}

// --------------------------------------------------------------------------
// MessagePack encode: [1, [nx, ny, nz], [f64 ...]] (rmp-serde compact)
// --------------------------------------------------------------------------
static char* mp_write_uint(char* p, uint64_t v) {
  if (v < 128) {
    *p++ = static_cast<char>(v);
  } else if (v < 65536) {
    *p++ = static_cast<char>(0xcd);
    *p++ = static_cast<char>(v >> 8);
    *p++ = static_cast<char>(v & 0xff);
  } else {
    *p++ = static_cast<char>(0xce);
    for (int s = 24; s >= 0; s -= 8) *p++ = static_cast<char>((v >> s) & 0xff);
  }
  return p;
}

static char* mp_write_arrhdr(char* p, uint64_t n) {
  if (n < 16) {
    *p++ = static_cast<char>(0x90 | n);
  } else if (n < 65536) {
    *p++ = static_cast<char>(0xdc);
    *p++ = static_cast<char>(n >> 8);
    *p++ = static_cast<char>(n & 0xff);
  } else {
    *p++ = static_cast<char>(0xdd);
    for (int s = 24; s >= 0; s -= 8) *p++ = static_cast<char>((n >> s) & 0xff);
  }
  return p;
}

char* wafer_mpk_encode(const double* data, int64_t nx, int64_t ny, int64_t nz,
                       int64_t* out_len) {
  const int64_t n = nx * ny * nz;
  size_t cap = static_cast<size_t>(n) * 9 + 64;
  char* buf = static_cast<char*>(malloc(cap));
  if (!buf) return nullptr;
  char* p = buf;
  p = mp_write_arrhdr(p, 3);           // [v, dim, data]
  p = mp_write_uint(p, 1);             // v = 1
  p = mp_write_arrhdr(p, 3);           // dim
  p = mp_write_uint(p, nx);
  p = mp_write_uint(p, ny);
  p = mp_write_uint(p, nz);
  p = mp_write_arrhdr(p, n);           // data
  for (int64_t i = 0; i < n; ++i) {
    *p++ = static_cast<char>(0xcb);    // float64
    uint64_t bits;
    memcpy(&bits, &data[i], 8);
    for (int s = 56; s >= 0; s -= 8) *p++ = static_cast<char>((bits >> s) & 0xff);
  }
  *out_len = p - buf;
  return buf;
}

// --------------------------------------------------------------------------
// MessagePack decode for the same layout. Also accepts f32 and ints in the
// data array. Returns 0 on success.
// --------------------------------------------------------------------------
struct MpReader {
  const uint8_t* p;
  const uint8_t* end;
  bool fail = false;

  uint64_t be(int n) {
    uint64_t v = 0;
    if (p + n > end) {
      fail = true;
      return 0;
    }
    for (int i = 0; i < n; ++i) v = (v << 8) | *p++;
    return v;
  }

  int64_t read_int() {
    if (p >= end) {
      fail = true;
      return 0;
    }
    uint8_t t = *p++;
    if (t < 0x80) return t;
    if (t >= 0xe0) return static_cast<int8_t>(t);
    switch (t) {
      case 0xcc: return be(1);
      case 0xcd: return be(2);
      case 0xce: return be(4);
      case 0xcf: return be(8);
      case 0xd0: return static_cast<int8_t>(be(1));
      case 0xd1: return static_cast<int16_t>(be(2));
      case 0xd2: return static_cast<int32_t>(be(4));
      case 0xd3: return static_cast<int64_t>(be(8));
      default: fail = true; return 0;
    }
  }

  int64_t read_arrhdr() {
    if (p >= end) {
      fail = true;
      return -1;
    }
    uint8_t t = *p++;
    if ((t & 0xf0) == 0x90) return t & 0x0f;
    if (t == 0xdc) return be(2);
    if (t == 0xdd) return be(4);
    fail = true;
    return -1;
  }

  double read_num() {
    if (p >= end) {
      fail = true;
      return 0;
    }
    uint8_t t = *p;
    if (t == 0xcb) {
      ++p;
      uint64_t bits = be(8);
      double v;
      memcpy(&v, &bits, 8);
      return v;
    }
    if (t == 0xca) {
      ++p;
      uint32_t bits = static_cast<uint32_t>(be(4));
      float v;
      memcpy(&v, &bits, 4);
      return v;
    }
    return static_cast<double>(read_int());
  }
};

int wafer_mpk_decode(const uint8_t* blob, int64_t len, int64_t* dims,
                     double** out_vals, int64_t* out_n) {
  MpReader r{blob, blob + len};
  int64_t outer = r.read_arrhdr();
  if (r.fail || outer != 3) return 1;
  r.read_int();  // version
  int64_t nd = r.read_arrhdr();
  if (r.fail || nd != 3) return 1;
  for (int i = 0; i < 3; ++i) dims[i] = r.read_int();
  int64_t n = r.read_arrhdr();
  if (r.fail || n < 0 || n != dims[0] * dims[1] * dims[2]) return 1;
  double* vals = static_cast<double*>(malloc(sizeof(double) * n));
  if (!vals && n > 0) return 2;
  for (int64_t i = 0; i < n; ++i) vals[i] = r.read_num();
  if (r.fail) {
    free(vals);
    return 1;
  }
  *out_vals = vals;
  *out_n = n;
  return 0;
}

}  // extern "C"
