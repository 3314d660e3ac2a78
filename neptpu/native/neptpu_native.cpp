// neptpu native runtime: host-side data-path kernels.
//
// The TPU compute path is JAX/XLA/Pallas; this library covers the runtime
// around it — deterministic gallery generation and gallery-data IO — in C++
// (the role UMFPACK/FFTW-style native libraries play under the reference;
// SURVEY.md §2.8).  Exposed with a plain C ABI and loaded via ctypes; every
// entry point has a pure-Python fallback so the framework works unbuilt.
//
// Build: `make -C neptpu/native` (produces libneptpu_native.so).
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {

// --- Middle Square Weyl Sequence RNG (Widynski, arXiv 1704.00358) ---------
// Exact 128-bit semantics of the reference gallery RNG
// (reference basic_random_examples.jl:71-128).

typedef unsigned __int128 u128;

struct MSWSState {
  u128 x, w, s;
};

static void msws_init(MSWSState* st, u128 seed) {
  const u128 base = (((u128)0x9ef09a97ac0f9ecaULL) << 64) | (u128)0xef01c4f2db0958c9ULL;
  st->s = (seed << 1) + base;
  st->x = (((u128)0x1de568e1a1ca1b59ULL) << 64) | (u128)0x3cbf13f7407cf43eULL;
  st->w = (((u128)0xd4ac5c288559e14aULL) << 64) | (u128)0x5fafc1b7df9f9e0eULL;
}

static uint64_t msws_int(MSWSState* st) {
  st->x *= st->x;
  st->w += st->s;
  st->x += st->w;
  st->x = (st->x >> 64) | (st->x << 64);
  return (uint64_t)st->x;
}

static double msws_float(MSWSState* st) {
  return (double)msws_int(st) / (double)UINT64_MAX;
}

// Fill an n x m matrix (column-major order of generation, row-major output
// buffer out[r*m + c]) with 1 - 2*u like the reference's gen_rng_mat.
void msws_gen_mat(uint64_t seed, int64_t n, int64_t m, double* out) {
  MSWSState st;
  msws_init(&st, (u128)seed);
  for (int64_t c = 0; c < m; ++c)
    for (int64_t r = 0; r < n; ++r)
      out[r * m + c] = 1.0 - 2.0 * msws_float(&st);
}

// Raw integer stream (for the sparse-matrix draws driven from Python).
void msws_gen_ints(uint64_t seed, int64_t count, uint64_t* out) {
  MSWSState st;
  msws_init(&st, (u128)seed);
  for (int64_t i = 0; i < count; ++i) out[i] = msws_int(&st);
}

// --- gallery text serialization reader ------------------------------------
// Format (reference src/utils/Serialization.jl): nrows, ncols, then nnz row
// indices (1-based), nnz col indices, nnz float values, one token per line.
// Returns nnz, or -1 on error.  Caller passes capacity; call first with
// rows=NULL to query sizes via out_dims.
int64_t read_sparse_matrix_text(const char* path, int64_t* out_dims,
                                int64_t capacity, int64_t* rows,
                                int64_t* cols, double* vals) {
  FILE* f = fopen(path, "r");
  if (!f) return -1;
  // count tokens by streaming
  long long m = 0, n = 0;
  if (fscanf(f, "%lld %lld", &m, &n) != 2) {
    fclose(f);
    return -1;
  }
  out_dims[0] = m;
  out_dims[1] = n;
  if (rows == nullptr) {
    // count remaining tokens
    int64_t count = 0;
    double tmp;
    while (fscanf(f, "%lf", &tmp) == 1) count++;
    fclose(f);
    out_dims[2] = count / 3;
    return count / 3;
  }
  int64_t nnz = out_dims[2];
  if (nnz > capacity) {
    fclose(f);
    return -1;
  }
  for (int64_t i = 0; i < nnz; ++i) {
    long long v;
    if (fscanf(f, "%lld", &v) != 1) { fclose(f); return -1; }
    rows[i] = v - 1;
  }
  for (int64_t i = 0; i < nnz; ++i) {
    long long v;
    if (fscanf(f, "%lld", &v) != 1) { fclose(f); return -1; }
    cols[i] = v - 1;
  }
  for (int64_t i = 0; i < nnz; ++i) {
    if (fscanf(f, "%lf", &vals[i]) != 1) { fclose(f); return -1; }
  }
  fclose(f);
  return nnz;
}

// --- aligned-pattern scatter ----------------------------------------------
// pos[i] = index of key a in sorted pkeys (binary search); the hot step of
// SparseTermBank.from_matrices for very large operand sets.
void searchsorted_i64(const int64_t* pkeys, int64_t np_, const int64_t* akeys,
                      int64_t na, int64_t* pos) {
  for (int64_t i = 0; i < na; ++i) {
    int64_t lo = 0, hi = np_;
    const int64_t key = akeys[i];
    while (lo < hi) {
      int64_t mid = (lo + hi) / 2;
      if (pkeys[mid] < key) lo = mid + 1; else hi = mid;
    }
    pos[i] = lo;
  }
}

}  // extern "C"
