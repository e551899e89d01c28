// motionio: native data-plane for the motion training input pipeline.
//
// The reference delegates its input pipeline to torch DataLoader worker
// processes (text2motion/tools/train.py:159-176). Here the per-batch hot
// path — .npy decode, random crop/zero-pad to max_len, and feat_bias
// z-normalization — runs in C++ threads (no GIL, no worker processes),
// writing straight into a caller-provided pinned buffer that jax.device_put
// ships to the TPU.
//
// C ABI only (consumed via ctypes): no C++ types cross the boundary.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libmotionio.so motionio.cc -lpthread

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// minimal .npy (v1.0/2.0) reader for C-order float32/float64 2-D arrays
// ---------------------------------------------------------------------------

struct NpyArray {
  std::vector<float> data;  // converted to f32
  int64_t rows = 0;
  int64_t cols = 0;
};

bool parse_header(const std::string& header, std::string* descr,
                  bool* fortran, int64_t* rows, int64_t* cols) {
  // descr
  size_t dp = header.find("'descr'");
  if (dp == std::string::npos) return false;
  size_t q1 = header.find('\'', header.find(':', dp));
  size_t q2 = header.find('\'', q1 + 1);
  *descr = header.substr(q1 + 1, q2 - q1 - 1);

  *fortran = header.find("'fortran_order': True") != std::string::npos;

  size_t sp = header.find("'shape'");
  if (sp == std::string::npos) return false;
  size_t o = header.find('(', sp);
  size_t c = header.find(')', o);
  std::string shape = header.substr(o + 1, c - o - 1);
  long long r = 0, k = 0;
  int n = sscanf(shape.c_str(), "%lld, %lld", &r, &k);
  if (n == 1) {  // 1-D array -> treat as [rows, 1]
    *rows = r;
    *cols = 1;
    return true;
  }
  if (n != 2) return false;
  *rows = r;
  *cols = k;
  return true;
}

bool load_npy(const char* path, NpyArray* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  unsigned char magic[8];
  if (fread(magic, 1, 8, f) != 8 || memcmp(magic, "\x93NUMPY", 6) != 0) {
    fclose(f);
    return false;
  }
  int major = magic[6];
  uint32_t header_len = 0;
  if (major == 1) {
    unsigned char b[2];
    if (fread(b, 1, 2, f) != 2) { fclose(f); return false; }
    header_len = b[0] | (b[1] << 8);
  } else {
    unsigned char b[4];
    if (fread(b, 1, 4, f) != 4) { fclose(f); return false; }
    header_len = b[0] | (b[1] << 8) | (b[2] << 16) | (b[3] << 24);
  }
  std::string header(header_len, '\0');
  if (fread(&header[0], 1, header_len, f) != header_len) {
    fclose(f);
    return false;
  }
  std::string descr;
  bool fortran = false;
  if (!parse_header(header, &descr, &fortran, &out->rows, &out->cols) ||
      fortran) {
    fclose(f);
    return false;
  }
  size_t count = static_cast<size_t>(out->rows) * out->cols;
  out->data.resize(count);
  bool ok = true;
  if (descr == "<f4") {
    ok = fread(out->data.data(), 4, count, f) == count;
  } else if (descr == "<f8") {
    std::vector<double> tmp(count);
    ok = fread(tmp.data(), 8, count, f) == count;
    if (ok) {
      for (size_t i = 0; i < count; ++i)
        out->data[i] = static_cast<float>(tmp[i]);
    }
  } else {
    ok = false;
  }
  fclose(f);
  return ok;
}

// xorshift128+ (deterministic per-sample cropping)
struct Rng {
  uint64_t s0, s1;
  explicit Rng(uint64_t seed) {
    s0 = seed * 0x9E3779B97F4A7C15ull + 1;
    s1 = (seed ^ 0xDEADBEEFCAFEBABEull) * 0xBF58476D1CE4E5B9ull + 1;
  }
  uint64_t next() {
    uint64_t x = s0, y = s1;
    s0 = y;
    x ^= x << 23;
    s1 = x ^ y ^ (x >> 17) ^ (y >> 26);
    return s1 + y;
  }
  int64_t uniform(int64_t n) { return n > 0 ? (int64_t)(next() % n) : 0; }
};

struct Registry {
  std::vector<NpyArray> motions;
};

}  // namespace

extern "C" {

// Opaque dataset handle: load motion files once, serve batches forever.
void* motionio_create() { return new Registry(); }

void motionio_destroy(void* h) { delete static_cast<Registry*>(h); }

// Load one .npy motion file; returns its index, or -1 on failure.
int64_t motionio_add_file(void* h, const char* path) {
  auto* reg = static_cast<Registry*>(h);
  NpyArray arr;
  if (!load_npy(path, &arr)) return -1;
  reg->motions.push_back(std::move(arr));
  return static_cast<int64_t>(reg->motions.size()) - 1;
}

// Register an in-memory [rows, cols] f32 motion (for data not on disk).
int64_t motionio_add_array(void* h, const float* data, int64_t rows,
                           int64_t cols) {
  auto* reg = static_cast<Registry*>(h);
  NpyArray arr;
  arr.rows = rows;
  arr.cols = cols;
  arr.data.assign(data, data + rows * cols);
  reg->motions.push_back(std::move(arr));
  return static_cast<int64_t>(reg->motions.size()) - 1;
}

int64_t motionio_num_items(void* h) {
  return static_cast<Registry*>(h)->motions.size();
}

int64_t motionio_item_rows(void* h, int64_t idx) {
  auto* reg = static_cast<Registry*>(h);
  if (idx < 0 || idx >= (int64_t)reg->motions.size()) return -1;
  return reg->motions[idx].rows;
}

// Assemble a training batch:
//   indices[B]   items to draw
//   max_len      crop/pad target length
//   mean/std[D]  normalization (z-norm with feat_bias pre-applied)
//   seed         deterministic crop randomness
//   out[B*max_len*D], out_lengths[B]
// Multithreaded over batch rows. Returns 0 on success.
//
// Padding rows are normalized zeros, i.e. (0 - mean)/std: the reference
// (datasets1/dataset1.py:134-141) zero-pads FIRST and normalizes the whole
// [max_len, D] window, so padding is -mean/std, not 0.
// Error codes: -1 bad index, -2 feature-dim mismatch (an item's cols
// differs from the caller's `dim` — the caller allocates `out` as
// [batch, max_len, dim], so a mismatch would read/write out of bounds).
int motionio_assemble_batch(void* h, const int64_t* indices, int64_t batch,
                            int64_t max_len, int64_t dim, const float* mean,
                            const float* std, uint64_t seed, float* out,
                            int32_t* out_lengths, int num_threads) {
  auto* reg = static_cast<Registry*>(h);
  const int64_t n_items = reg->motions.size();
  for (int64_t b = 0; b < batch; ++b) {
    if (indices[b] < 0 || indices[b] >= n_items) return -1;
    if (reg->motions[indices[b]].cols != dim) return -2;
  }
  const int64_t D = dim;
  std::vector<float> pad_row(D);
  for (int64_t d = 0; d < D; ++d) pad_row[d] = (0.0f - mean[d]) / std[d];

  std::atomic<int64_t> next(0);
  auto worker = [&]() {
    for (;;) {
      int64_t b = next.fetch_add(1);
      if (b >= batch) return;
      const NpyArray& m = reg->motions[indices[b]];
      float* dst = out + b * max_len * D;
      Rng rng(seed * 1000003ull + static_cast<uint64_t>(b));
      int64_t len = m.rows;
      int64_t start = 0;
      if (len >= max_len) {
        start = rng.uniform(len - max_len + 1);
        len = max_len;
      }
      out_lengths[b] = static_cast<int32_t>(len);
      const float* src = m.data.data() + start * D;
      for (int64_t t = 0; t < len; ++t) {
        const float* row = src + t * D;
        float* drow = dst + t * D;
        for (int64_t d = 0; d < D; ++d) {
          drow[d] = (row[d] - mean[d]) / std[d];
        }
      }
      for (int64_t t = len; t < max_len; ++t) {
        memcpy(dst + t * D, pad_row.data(), sizeof(float) * D);
      }
    }
  };

  int nt = num_threads > 0 ? num_threads : 4;
  if (nt == 1 || batch == 1) {
    worker();
  } else {
    std::vector<std::thread> threads;
    threads.reserve(nt);
    for (int i = 0; i < nt; ++i) threads.emplace_back(worker);
    for (auto& t : threads) t.join();
  }
  return 0;
}

}  // extern "C"
