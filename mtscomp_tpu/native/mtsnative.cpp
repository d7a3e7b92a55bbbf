// libmtsnative: first-party native runtime for mtscomp_tpu.
//
// Batch zlib deflate/inflate with a C++ worker-thread pool. This replaces
// the reference's Python ThreadPool driving zlib one chunk per call
// (reference behavior: mtscomp.py:399-423, 645-650) with a native batch
// loop: Python hands over N chunk buffers in one FFI call and worker
// threads stream through them with zero GIL involvement.
//
// The produced streams are byte-identical to CPython's zlib.compress()
// defaults (same zlib, Z_DEFAULT_COMPRESSION, 15-bit window).

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

#include <zlib.h>

extern "C" {

size_t mts_deflate_bound(size_t n) { return compressBound(n); }

// Compress n buffers. out_len[i] receives the produced size.
// Returns 0 on success, nonzero on the first error encountered.
int mts_deflate_batch(int n, const uint8_t** in, const size_t* in_len,
                      uint8_t** out, size_t* out_cap, size_t* out_len,
                      int n_threads) {
  if (n <= 0) return 0;
  if (n_threads < 1) n_threads = 1;
  std::atomic<int> next{0};
  std::atomic<int> err{0};
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n || err.load()) return;
      uLongf dest_len = static_cast<uLongf>(out_cap[i]);
      int rc = compress2(out[i], &dest_len, in[i],
                         static_cast<uLong>(in_len[i]),
                         Z_DEFAULT_COMPRESSION);
      if (rc != Z_OK) { err.store(rc ? rc : -1); return; }
      out_len[i] = static_cast<size_t>(dest_len);
    }
  };
  int t = n_threads < n ? n_threads : n;
  if (t <= 1) { worker(); return err.load(); }
  std::vector<std::thread> threads;
  threads.reserve(t);
  for (int k = 0; k < t; ++k) threads.emplace_back(worker);
  for (auto& th : threads) th.join();
  return err.load();
}

// Decompress n buffers into exact-size outputs (sizes known from the
// chunk geometry). Returns 0 on success.
int mts_inflate_batch(int n, const uint8_t** in, const size_t* in_len,
                      uint8_t** out, const size_t* out_size, int n_threads) {
  if (n <= 0) return 0;
  if (n_threads < 1) n_threads = 1;
  std::atomic<int> next{0};
  std::atomic<int> err{0};
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n || err.load()) return;
      uLongf dest_len = static_cast<uLongf>(out_size[i]);
      int rc = uncompress(out[i], &dest_len, in[i],
                          static_cast<uLong>(in_len[i]));
      if (rc != Z_OK || dest_len != static_cast<uLongf>(out_size[i])) {
        err.store(rc ? rc : -1);
        return;
      }
    }
  };
  int t = n_threads < n ? n_threads : n;
  if (t <= 1) { worker(); return err.load(); }
  std::vector<std::thread> threads;
  threads.reserve(t);
  for (int k = 0; k < t; ++k) threads.emplace_back(worker);
  for (auto& th : threads) th.join();
  return err.load();
}

}  // extern "C"
