// pmf_tpu native ingest runtime.
//
// The reference's data loader is single-threaded pandas read_csv
// (/root/reference/src/data/load_data.py:93-105).  This library is the
// TPU framework's host-side ingest path: a multithreaded CSV parser that
// extracts (u, i, rating) triples straight into flat buffers, plus an
// LSD radix argsort used to build the dual-sorted COO layout without the
// O(n log n) comparison sorts on the critical path.
//
// Exposed via a C ABI for ctypes (no pybind11 in this environment).

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Triple {
  int32_t u;
  int32_t i;
  float x;
};

// Parse one CSV line: pick fields ucol/icol/rcol (0-based, comma-separated,
// no quoted-comma support needed for the numeric interaction files).
inline bool parse_line(const char* p, const char* end, int ucol, int icol,
                       int rcol, Triple* out) {
  int field = 0;
  long long vals[3] = {-1, -1, -1};
  double rval = 0.0;
  bool have_r = false;
  int maxcol = std::max(ucol, std::max(icol, rcol));
  while (p < end && field <= maxcol) {
    const char* fstart = p;
    while (p < end && *p != ',' && *p != '\n' && *p != '\r') ++p;
    if (field == ucol || field == icol) {
      long long v = 0;
      bool neg = false;
      const char* q = fstart;
      if (q < p && *q == '-') { neg = true; ++q; }
      for (; q < p; ++q) {
        if (*q < '0' || *q > '9') return false;
        v = v * 10 + (*q - '0');
      }
      if (fstart == p) return false;
      vals[field == ucol ? 0 : 1] = neg ? -v : v;
    } else if (field == rcol) {
      char buf[64];
      size_t n = std::min<size_t>(p - fstart, 63);
      memcpy(buf, fstart, n);
      buf[n] = 0;
      char* endp = nullptr;
      rval = strtod(buf, &endp);
      if (endp == buf) return false;
      have_r = true;
    }
    if (p < end && *p == ',') ++p;
    ++field;
  }
  if (vals[0] < 0 || vals[1] < 0 || !have_r) return false;
  out->u = static_cast<int32_t>(vals[0]);
  out->i = static_cast<int32_t>(vals[1]);
  out->x = static_cast<float>(rval);
  return true;
}

}  // namespace

extern "C" {

// Parse `path`, extracting columns (ucol, icol, rcol) from each data row
// (the first row is assumed to be a header and is skipped).  Allocates
// *u/*i/*x with malloc; caller frees via pmf_free.  Returns row count,
// or -1 on I/O error.
int64_t pmf_parse_csv(const char* path, int ucol, int icol, int rcol,
                      int n_threads, int32_t** out_u, int32_t** out_i,
                      float** out_x) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<char> buf(size);
  if (size > 0 && fread(buf.data(), 1, size, f) != static_cast<size_t>(size)) {
    fclose(f);
    return -1;
  }
  fclose(f);
  const char* data = buf.data();
  const char* end = data + size;

  // Skip header line.
  const char* body = static_cast<const char*>(memchr(data, '\n', size));
  body = body ? body + 1 : end;

  if (n_threads <= 0) n_threads = std::thread::hardware_concurrency();
  n_threads = std::max(1, std::min(n_threads, 64));

  // Split into ranges at line boundaries.
  std::vector<const char*> starts(n_threads + 1);
  starts[0] = body;
  starts[n_threads] = end;
  for (int t = 1; t < n_threads; ++t) {
    const char* p = body + (end - body) * t / n_threads;
    while (p < end && *p != '\n') ++p;
    starts[t] = p < end ? p + 1 : end;
  }

  std::vector<std::vector<Triple>> results(n_threads);
  std::vector<std::thread> threads;
  for (int t = 0; t < n_threads; ++t) {
    threads.emplace_back([&, t] {
      const char* p = starts[t];
      const char* stop = starts[t + 1];
      auto& out = results[t];
      out.reserve((stop - p) / 16 + 1);
      while (p < stop) {
        const char* nl = static_cast<const char*>(memchr(p, '\n', stop - p));
        const char* line_end = nl ? nl : stop;
        Triple tr;
        if (parse_line(p, line_end, ucol, icol, rcol, &tr)) out.push_back(tr);
        p = nl ? nl + 1 : stop;
      }
    });
  }
  for (auto& th : threads) th.join();

  int64_t total = 0;
  for (auto& r : results) total += static_cast<int64_t>(r.size());
  *out_u = static_cast<int32_t*>(malloc(total * sizeof(int32_t)));
  *out_i = static_cast<int32_t*>(malloc(total * sizeof(int32_t)));
  *out_x = static_cast<float*>(malloc(total * sizeof(float)));
  int64_t off = 0;
  for (auto& r : results) {
    for (auto& tr : r) {
      (*out_u)[off] = tr.u;
      (*out_i)[off] = tr.i;
      (*out_x)[off] = tr.x;
      ++off;
    }
  }
  return total;
}

void pmf_free(void* p) { free(p); }

// Stable LSD radix argsort of non-negative int32 keys: fills perm such
// that keys[perm] is ascending; also fills counts[k] for k in [0, n_keys).
void pmf_radix_argsort(const int32_t* keys, int64_t n, int32_t n_keys,
                       int64_t* perm, int64_t* counts) {
  if (counts) memset(counts, 0, sizeof(int64_t) * n_keys);
  std::vector<int64_t> tmp(n);
  for (int64_t r = 0; r < n; ++r) tmp[r] = r;
  std::vector<int64_t> next(n);
  constexpr int kBits = 11;
  constexpr int kBuckets = 1 << kBits;
  int passes = 0;
  while ((int64_t(1) << (passes * kBits)) < n_keys) ++passes;
  if (passes == 0) passes = 1;
  std::vector<int64_t> hist(kBuckets);
  for (int pass = 0; pass < passes; ++pass) {
    int shift = pass * kBits;
    std::fill(hist.begin(), hist.end(), 0);
    for (int64_t r = 0; r < n; ++r) ++hist[(keys[tmp[r]] >> shift) & (kBuckets - 1)];
    int64_t sum = 0;
    for (int b = 0; b < kBuckets; ++b) {
      int64_t h = hist[b];
      hist[b] = sum;
      sum += h;
    }
    for (int64_t r = 0; r < n; ++r) {
      int b = (keys[tmp[r]] >> shift) & (kBuckets - 1);
      next[hist[b]++] = tmp[r];
    }
    std::swap(tmp, next);
  }
  memcpy(perm, tmp.data(), sizeof(int64_t) * n);
  if (counts) {
    for (int64_t r = 0; r < n; ++r) {
      int32_t k = keys[r];
      if (k >= 0 && k < n_keys) ++counts[k];
    }
  }
}

// Fused edge scatter for the blocked layout build (pmf_tpu/data/blocked
// .py:_build_pass).  One sequential pass over sort-ordered edges derives
// each edge's final chunk slot from the tile run table and writes the
// packed local indices and the f32 payload directly — replacing ~15
// full-array numpy passes (the s/o/x permutes by `order`, repeat/arange
// rank bookkeeping, div/mod temporaries, and two fancy-index scatters)
// on the single-core build host.
//
//   order[e]            original index of the e-th edge in sort order
//   tile_starts[t]      first sorted-edge index of tile t (ascending)
//   chunk_base[t]       index of tile t's first real chunk
//   slot_of_chunk[c]    final chunk slot of real chunk c
//   x64 / x32           exactly one non-null payload pointer
//
// packed is pre-filled with pad_packed and fx with zeros (padding slots).
void pmf_scatter_edges(const int32_t* s, const int32_t* o,
                       const double* x64, const float* x32,
                       const int64_t* order, int64_t n,
                       const int64_t* tile_starts, int64_t n_tiles,
                       const int64_t* chunk_base,
                       const int64_t* slot_of_chunk,
                       int32_t bs_self, int32_t bs_other, int32_t C,
                       int32_t pad_packed, int64_t total_slots,
                       int32_t* packed, float* fx) {
  std::fill(packed, packed + total_slots, pad_packed);
  memset(fx, 0, sizeof(float) * total_slots);
  int64_t tile = 0;
  for (int64_t e = 0; e < n; ++e) {
    while (tile + 1 < n_tiles && e >= tile_starts[tile + 1]) ++tile;
    int64_t rank = e - tile_starts[tile];
    int64_t chunk = chunk_base[tile] + rank / C;
    int64_t slot = slot_of_chunk[chunk] * C + rank % C;
    int64_t j = order[e];
    packed[slot] = ((s[j] % bs_self) << 16) | (o[j] % bs_other);
    fx[slot] = x64 ? static_cast<float>(x64[j]) : x32[j];
  }
}

}  // extern "C"
