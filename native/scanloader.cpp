// scanloader: native batched .npy scan loading for the SLAM data path.
//
// The reference loads each scan with np.load per file inside the SLAM loop
// (`slam_offline.py:346`, `mainn.py:278` — disk IO per scan on the hot
// thread).  This loader parses the numpy v1/v2 header directly, reads the
// (N, 3) float64 payload, converts to float32 and pads into a caller-owned
// (T, n_max, 3) buffer — multi-threaded across files, zero Python per-file
// overhead.  The collated buffer is what `jax.device_put` ships to the TPU.
//
// Only little-endian '<f8' C-order 2-D arrays are handled (the acquisition
// format written by `read_lidar.py:132-143`); anything else returns an error
// so Python can fall back.
//
// Build: g++ -O3 -std=c++17 -shared -fPIC scanloader.cpp -o libscanloader.so -lpthread

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

// returns rows on success, -1 on failure; fills dst[0..n_max*3) padded with 0
int load_one(const char* path, float* dst, int n_max) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  unsigned char magic[8];
  if (fread(magic, 1, 8, f) != 8 || memcmp(magic, "\x93NUMPY", 6) != 0) {
    fclose(f);
    return -1;
  }
  int major = magic[6];
  uint32_t header_len = 0;
  if (major == 1) {
    unsigned char hl[2];
    if (fread(hl, 1, 2, f) != 2) { fclose(f); return -1; }
    header_len = hl[0] | (hl[1] << 8);
  } else {
    unsigned char hl[4];
    if (fread(hl, 1, 4, f) != 4) { fclose(f); return -1; }
    header_len = hl[0] | (hl[1] << 8) | (hl[2] << 16) | (hl[3] << 24);
  }
  std::string header(header_len, 0);
  if (fread(header.data(), 1, header_len, f) != header_len) { fclose(f); return -1; }

  if (header.find("'descr': '<f8'") == std::string::npos ||
      header.find("'fortran_order': False") == std::string::npos) {
    fclose(f);
    return -1;
  }
  auto sp = header.find("'shape': (");
  if (sp == std::string::npos) { fclose(f); return -1; }
  long rows = 0, cols = 0;
  if (sscanf(header.c_str() + sp, "'shape': (%ld, %ld)", &rows, &cols) != 2 || cols != 3) {
    fclose(f);
    return -1;
  }

  std::vector<double> raw(rows * 3);
  size_t want = (size_t)rows * 3;
  if (fread(raw.data(), sizeof(double), want, f) != want) { fclose(f); return -1; }
  fclose(f);

  memset(dst, 0, sizeof(float) * (size_t)n_max * 3);
  long keep = rows < n_max ? rows : n_max;
  for (long i = 0; i < keep * 3; i++) dst[i] = (float)raw[i];
  return (int)rows;
}

}  // namespace

extern "C" {

// paths: array of T C-strings.  out: (T * n_max * 3) float32.  counts: (T,)
// int32 (rows per file; -1 on per-file failure).  Returns number of failures.
int sl_load_batch(const char** paths, int t, int n_max, float* out, int32_t* counts, int n_threads) {
  if (n_threads < 1) n_threads = 1;
  std::vector<std::thread> workers;
  std::vector<int> failures(n_threads, 0);
  for (int w = 0; w < n_threads; w++) {
    workers.emplace_back([&, w] {
      for (int i = w; i < t; i += n_threads) {
        int rows = load_one(paths[i], out + (size_t)i * n_max * 3, n_max);
        counts[i] = rows;
        if (rows < 0) failures[w]++;
      }
    });
  }
  for (auto& th : workers) th.join();
  int total = 0;
  for (int v : failures) total += v;
  return total;
}

}  // extern "C"
