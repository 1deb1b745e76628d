// Fast point-cloud text parser (native runtime component).
//
// The reference library is C++ end-to-end; its cloud IO is an ifstream
// double-extraction loop (reference tst/point2point.cpp:125-138) that is the
// host-side bottleneck for large scans. This parser memory-maps the file and
// hand-rolls float parsing (~20-50x faster than iostream/np.loadtxt),
// exposed through a C ABI for ctypes (no pybind11 in the image).
//
// Format: whitespace-separated rows `x y z [extra ...]` — the first three
// columns of every row are kept, the rest skipped (matching the reference
// loader's discard of r g b columns).

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <cerrno>
#include <cmath>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

inline const char* skip_space(const char* p, const char* end) {
  while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) ++p;
  return p;
}

// Minimal fast double parser: sign, integer, fraction, exponent.
inline const char* parse_double(const char* p, const char* end, double* out) {
  p = skip_space(p, end);
  if (p >= end) return nullptr;
  bool neg = false;
  if (*p == '-') { neg = true; ++p; }
  else if (*p == '+') { ++p; }
  double val = 0.0;
  bool any = false;
  while (p < end && *p >= '0' && *p <= '9') {
    val = val * 10.0 + (*p - '0');
    ++p; any = true;
  }
  if (p < end && *p == '.') {
    ++p;
    double frac = 0.1;
    while (p < end && *p >= '0' && *p <= '9') {
      val += (*p - '0') * frac;
      frac *= 0.1;
      ++p; any = true;
    }
  }
  if (!any) return nullptr;
  if (p < end && (*p == 'e' || *p == 'E')) {
    ++p;
    bool eneg = false;
    if (p < end && (*p == '-' || *p == '+')) { eneg = (*p == '-'); ++p; }
    int ev = 0;
    while (p < end && *p >= '0' && *p <= '9') { ev = ev * 10 + (*p - '0'); ++p; }
    val *= pow(10.0, eneg ? -ev : ev);
  }
  *out = neg ? -val : val;
  return p;
}

}  // namespace

extern "C" {

// Parse `path`; returns a malloc'd row-major (n, 3) double buffer (caller
// frees with moptimizer_free). n_points receives the row count; returns
// nullptr on error.
double* moptimizer_load_txt_cloud(const char* path, int64_t* n_points) {
  *n_points = 0;
  int fd = open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0 || st.st_size == 0) {
    close(fd);
    return nullptr;
  }
  const char* base =
      static_cast<const char*>(mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0));
  close(fd);
  if (base == MAP_FAILED) return nullptr;
  const char* p = base;
  const char* end = base + st.st_size;

  int64_t cap = 1 << 16;
  int64_t n = 0;
  double* buf = static_cast<double*>(malloc(cap * 3 * sizeof(double)));
  if (!buf) {
    munmap(const_cast<char*>(base), st.st_size);
    return nullptr;
  }

  while (p < end) {
    double x, y, z;
    const char* q = parse_double(p, end, &x);
    if (q) q = parse_double(q, end, &y);
    if (q) q = parse_double(q, end, &z);
    if (q) {
      if (n == cap) {
        cap *= 2;
        double* nb = static_cast<double*>(realloc(buf, cap * 3 * sizeof(double)));
        if (!nb) {
          free(buf);
          munmap(const_cast<char*>(base), st.st_size);
          return nullptr;
        }
        buf = nb;
      }
      buf[3 * n + 0] = x;
      buf[3 * n + 1] = y;
      buf[3 * n + 2] = z;
      ++n;
      p = q;
    }
    // skip to next line (drop any extra columns)
    while (p < end && *p != '\n') ++p;
    if (p < end) ++p;
  }
  munmap(const_cast<char*>(base), st.st_size);
  *n_points = n;
  return buf;
}

void moptimizer_free(double* ptr) { free(ptr); }

}  // extern "C"
