// Native data-plane helpers for the host input pipeline.
//
// The hot loop of the loader is gather-memcpy: B per-sample buffers (views
// into mmap'd tar shards) are packed into one contiguous batch array per
// field. Python/numpy does this one sample at a time holding the GIL;
// this extension does it with a thread pool (TPU hosts have ~100 cores),
// called through ctypes with the GIL released.
//
// Also provides a tar-header walker so shard indexing needs no per-member
// Python work (ustar/GNU format, as written by Python's tarfile and the
// reference's webdataset shards).
//
// Build: g++ -O3 -shared -fPIC -pthread -o libfastpack.so _fastpack.cpp
// (done on demand by theia_tpu/data/fastpack.py).

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// Parallel gather: dst[i*itemsize : (i+1)*itemsize] = srcs[i][0:itemsize].
// Returns 0 on success.
int fp_gather(char* dst, const char** srcs, int64_t n, int64_t itemsize,
              int nthreads) {
  if (n <= 0) return 0;
  if (nthreads <= 1 || n == 1) {
    for (int64_t i = 0; i < n; ++i)
      std::memcpy(dst + i * itemsize, srcs[i], itemsize);
    return 0;
  }
  std::atomic<int64_t> next(0);
  auto work = [&]() {
    while (true) {
      int64_t i = next.fetch_add(1);
      if (i >= n) break;
      std::memcpy(dst + i * itemsize, srcs[i], itemsize);
    }
  };
  int nt = nthreads < (int)n ? nthreads : (int)n;
  std::vector<std::thread> threads;
  threads.reserve(nt - 1);
  for (int t = 0; t < nt - 1; ++t) threads.emplace_back(work);
  work();
  for (auto& th : threads) th.join();
  return 0;
}

// Walk tar headers in `buf` (whole shard, mmap'd). For each regular file
// member, write (header_offset, data_offset, size) into `out` (3 int64 per
// member, capacity `cap` members). Returns member count, or -1 on a
// malformed header, or -(needed) if cap is too small.
int64_t fp_tar_index(const char* buf, int64_t len, int64_t* out, int64_t cap) {
  int64_t pos = 0, count = 0;
  while (pos + 512 <= len) {
    const char* hdr = buf + pos;
    bool empty = true;
    for (int i = 0; i < 512; ++i)
      if (hdr[i] != 0) { empty = false; break; }
    if (empty) break;  // end-of-archive blocks
    // size field: octal at offset 124, 12 bytes (or base-256 GNU extension)
    int64_t size = 0;
    const unsigned char* sz = (const unsigned char*)hdr + 124;
    if (sz[0] & 0x80) {
      for (int i = 1; i < 12; ++i) size = (size << 8) | sz[i];
    } else {
      for (int i = 0; i < 12; ++i) {
        unsigned char c = sz[i];
        if (c == ' ' || c == 0) continue;
        if (c < '0' || c > '7') return -1;
        size = size * 8 + (c - '0');
      }
    }
    char typeflag = hdr[156];
    int64_t data = pos + 512;
    int64_t padded = (size + 511) & ~int64_t(511);
    if (typeflag == '0' || typeflag == 0) {  // regular file
      if (count >= cap) return -(count + 1);
      out[count * 3 + 0] = pos;
      out[count * 3 + 1] = data;
      out[count * 3 + 2] = size;
      ++count;
    }
    pos = data + padded;
  }
  return count;
}

}  // extern "C"
