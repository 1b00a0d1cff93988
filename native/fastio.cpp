// fastio — multithreaded float-token parser for the reference text format.
//
// The reference's data-distribution phase is dominated by rank 0 parsing the
// whole matrix file one fscanf("%f%*c") call at a time
// (parallel_cg.c:100-108, initialize() at parallel_cg.c:147-168): 15.7 s at
// n=8192 for the p2p arm (BASELINE.md). This library replaces that with a
// single fread of the file followed by a chunk-parallel scan: each thread
// tokenizes a whitespace-aligned slice of the buffer with strtof. Tolerant of
// separator noise (BOMs, CRLF, the reference's %*c behavior) — anything that
// is not the start of a float token is skipped.
//
// Exported C ABI (consumed by tpucg/io/_native.py via ctypes):
//   long long fastio_count_floats(const char* path);
//     -> number of float tokens, or -1 if the file cannot be read.
//   long long fastio_parse_floats(const char* path, float* out, long long cap);
//     -> number of floats written (at most cap), or -1 on read failure.
//   long long fastio_parse_floats_range(const char* path, long long skip,
//                                       float* out, long long count);
//     -> parse tokens [skip, skip+count) only — the host-sharded loading
//        primitive: each shard reads its own row block instead of rank 0
//        materializing the whole matrix (the reference's scalability
//        ceiling, parallel_cg.c:100-108). Returns floats written or -1.
//
// Build: make -C native   (g++ -O3 -shared -fPIC, pthreads)

#include <charconv>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct Buffer {
  const char* data = nullptr;
  size_t len = 0;
  void* map_base = nullptr;
  size_t map_len = 0;
  ~Buffer() {
    if (map_base) munmap(map_base, map_len);
  }
};

// mmap the file read-only: repeated shard reads of the same matrix file share
// the OS page cache instead of each call malloc+fread-ing the whole file
// (host-sharded loading calls this once per shard).
bool read_all(const char* path, Buffer* buf) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return false;
  struct stat st;
  if (fstat(fd, &st) != 0) { close(fd); return false; }
  size_t size = static_cast<size_t>(st.st_size);
  if (size == 0) {
    close(fd);
    buf->data = "";
    buf->len = 0;
    return true;
  }
  void* base = mmap(nullptr, size, PROT_READ, MAP_PRIVATE, fd, 0);
  close(fd);
  if (base == MAP_FAILED) return false;
  buf->map_base = base;
  buf->map_len = size;
  buf->data = static_cast<const char*>(base);
  buf->len = size;
  return true;
}

inline bool is_token_char(char c) {
  // Digits, signs, decimal point, exponent markers, and the letters of
  // inf/infinity/nan (any case) — so chunk boundaries never split a token.
  switch (c) {
    case '+': case '-': case '.':
    case 'e': case 'E':
    case 'i': case 'I': case 'n': case 'N': case 'f': case 'F':
    case 'a': case 'A': case 't': case 'T': case 'y': case 'Y':
      return true;
    default:
      return c >= '0' && c <= '9';
  }
}

inline bool is_token_start(char c) {
  // The reference's fscanf("%f") accepts inf/nan (signed or bare); starting
  // a parse attempt at 'i'/'n' lets from_chars handle them (a failed attempt
  // just advances one byte).
  return (c >= '0' && c <= '9') || c == '+' || c == '-' || c == '.' ||
         c == 'i' || c == 'I' || c == 'n' || c == 'N';
}

// Tokenize [begin, end): std::from_chars at every token start (~5-10x faster
// than strtof, locale-independent), emit into out (if non-null, up to cap),
// return the number of tokens. Chunk boundaries are pre-aligned so no token
// straddles them.
int64_t scan(const char* begin, const char* end, float* out, int64_t cap) {
  int64_t count = 0;
  const char* p = begin;
  while (p < end) {
    if (!is_token_start(*p)) { ++p; continue; }
    const char* q = (*p == '+') ? p + 1 : p;  // from_chars rejects leading '+'
    float v = 0.0f;
    auto res = std::from_chars(q, end, v);
    if (res.ptr == q) { ++p; continue; }  // lone '+'/'-'/'.'
    if (res.ec == std::errc::result_out_of_range) {
      // Saturating semantics for huge exponents. Copy the FULL token (the
      // mmap'd buffer has no trailing NUL for strtof to stop at; a fixed
      // 64-byte buffer would drop the exponent of long tokens and parse
      // 0.000...01e400 as 0 instead of inf).
      std::string tok(q, res.ptr);
      v = std::strtof(tok.c_str(), nullptr);
    }
    if (out) {
      if (count >= cap) break;
      out[count] = v;
    }
    ++count;
    p = res.ptr;
  }
  return count;
}

// Split [0, len) into nthreads chunks whose boundaries fall on separator
// characters, so every float token lives wholly inside one chunk.
std::vector<size_t> chunk_bounds(const char* data, size_t len, int nthreads) {
  std::vector<size_t> bounds;
  bounds.push_back(0);
  for (int t = 1; t < nthreads; ++t) {
    size_t pos = len * static_cast<size_t>(t) / nthreads;
    while (pos < len && is_token_char(data[pos])) ++pos;
    if (pos <= bounds.back()) pos = bounds.back();
    bounds.push_back(pos);
  }
  bounds.push_back(len);
  return bounds;
}

int pick_threads(size_t len) {
  if (len < (1u << 20)) return 1;  // small files: threading overhead dominates
  unsigned hw = std::thread::hardware_concurrency();
  int t = hw ? static_cast<int>(hw) : 4;
  if (t > 16) t = 16;
  return t;
}

// Parallel count of float tokens per chunk.
std::vector<int64_t> count_chunks(const char* data,
                                  const std::vector<size_t>& bounds) {
  int n = static_cast<int>(bounds.size()) - 1;
  std::vector<int64_t> counts(n, 0);
  if (n == 1) {
    counts[0] = scan(data, data + bounds[1], nullptr, 0);
    return counts;
  }
  std::vector<std::thread> threads;
  threads.reserve(n);
  for (int t = 0; t < n; ++t) {
    threads.emplace_back([&, t] {
      counts[t] = scan(data + bounds[t], data + bounds[t + 1], nullptr, 0);
    });
  }
  for (auto& th : threads) th.join();
  return counts;
}

// Like scan(), but skip the first `skip` tokens of the range without storing.
int64_t scan_skip(const char* begin, const char* end, int64_t skip,
                  float* out, int64_t cap) {
  int64_t seen = 0, written = 0;
  const char* p = begin;
  while (p < end && written < cap) {
    if (!is_token_start(*p)) { ++p; continue; }
    const char* q = (*p == '+') ? p + 1 : p;
    float v = 0.0f;
    auto res = std::from_chars(q, end, v);
    if (res.ptr == q) { ++p; continue; }
    if (res.ec == std::errc::result_out_of_range) {
      std::string tok(q, res.ptr);  // see scan(): full-token copy
      v = std::strtof(tok.c_str(), nullptr);
    }
    if (seen >= skip) out[written++] = v;
    ++seen;
    p = res.ptr;
  }
  return written;
}

}  // namespace

extern "C" {

long long fastio_parse_floats_range(const char* path, long long skip,
                                    float* out, long long count) {
  if (skip < 0 || count < 0) return -1;
  Buffer buf;
  if (!read_all(path, &buf)) return -1;
  auto bounds = chunk_bounds(buf.data, buf.len, pick_threads(buf.len));
  int n = static_cast<int>(bounds.size()) - 1;
  auto counts = count_chunks(buf.data, bounds);
  std::vector<int64_t> cum(n + 1, 0);
  for (int t = 0; t < n; ++t) cum[t + 1] = cum[t] + counts[t];

  int64_t lo = skip, hi = skip + count;
  std::vector<std::thread> threads;
  std::vector<int64_t> written(n, 0);
  for (int t = 0; t < n; ++t) {
    if (cum[t + 1] <= lo || cum[t] >= hi) continue;  // chunk outside range
    int64_t local_skip = std::max<int64_t>(0, lo - cum[t]);
    int64_t first_global = cum[t] + local_skip;
    int64_t take = std::min<int64_t>(cum[t + 1], hi) - first_global;
    float* dst = out + (first_global - lo);
    threads.emplace_back([&, t, local_skip, take, dst] {
      written[t] = scan_skip(buf.data + bounds[t], buf.data + bounds[t + 1],
                             local_skip, dst, take);
    });
  }
  for (auto& th : threads) th.join();
  int64_t total = 0;
  for (int64_t w : written) total += w;
  return total;
}

long long fastio_count_floats(const char* path) {
  Buffer buf;
  if (!read_all(path, &buf)) return -1;
  auto bounds = chunk_bounds(buf.data, buf.len, pick_threads(buf.len));
  auto counts = count_chunks(buf.data, bounds);
  int64_t total = 0;
  for (int64_t c : counts) total += c;
  return total;
}

long long fastio_parse_floats(const char* path, float* out, long long cap) {
  Buffer buf;
  if (!read_all(path, &buf)) return -1;
  auto bounds = chunk_bounds(buf.data, buf.len, pick_threads(buf.len));
  int n = static_cast<int>(bounds.size()) - 1;
  if (n == 1) return scan(buf.data, buf.data + buf.len, out, cap);

  // Pass 1: per-chunk counts -> output offsets. Pass 2: parallel conversion.
  auto counts = count_chunks(buf.data, bounds);
  std::vector<int64_t> offsets(n + 1, 0);
  for (int t = 0; t < n; ++t) offsets[t + 1] = offsets[t] + counts[t];

  std::vector<std::thread> threads;
  threads.reserve(n);
  for (int t = 0; t < n; ++t) {
    threads.emplace_back([&, t] {
      int64_t off = offsets[t];
      if (off >= cap) return;
      scan(buf.data + bounds[t], buf.data + bounds[t + 1], out + off,
           std::min<int64_t>(counts[t], cap - off));
    });
  }
  for (auto& th : threads) th.join();
  int64_t total = offsets[n];
  return total < cap ? total : cap;
}

}  // extern "C"
