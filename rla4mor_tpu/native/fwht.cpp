// Host-side fast Walsh-Hadamard transform (ffht replacement).
//
// Native rebuild of the reference's CPU FWHT stack: the numba-JIT radix-2
// butterflies (reference rla/srht.py:14-97) and the optional ffht C
// extension (reference rla/srht.py:11-12,125-130). Used for host-resident
// oracle paths; the TPU path lives in rla4mor_tpu/ops (XLA/Pallas).
//
// Layout: row-major (rows, n) with the transform along the last axis,
// n = 2^d. In-place, unnormalized (caller scales by 2^{-d/2}).
//
// Build: g++ -O3 -march=native -fopenmp -shared -fPIC fwht.cpp -o libfwht.so

#include <cstdint>
#include <cstddef>

#if defined(_OPENMP)
#include <omp.h>
#endif

namespace {

template <typename T>
void fht_row(T* a, std::int64_t n) {
  // radix-2 in-place butterfly, log2(n) passes over the row; the first
  // passes are cache-resident, larger strides stream.
  for (std::int64_t h = 1; h < n; h <<= 1) {
    for (std::int64_t i = 0; i < n; i += h << 1) {
      T* lo = a + i;
      T* hi = a + i + h;
      for (std::int64_t j = 0; j < h; ++j) {
        T x = lo[j];
        T y = hi[j];
        lo[j] = x + y;
        hi[j] = x - y;
      }
    }
  }
}

template <typename T>
void fht_2d(T* a, std::int64_t rows, std::int64_t n, int n_threads) {
#if defined(_OPENMP)
  if (n_threads > 0) omp_set_num_threads(n_threads);
#pragma omp parallel for schedule(static)
#endif
  for (std::int64_t r = 0; r < rows; ++r) {
    fht_row(a + r * n, n);
  }
}

}  // namespace

extern "C" {

void fht_f64(double* a, std::int64_t rows, std::int64_t n, int n_threads) {
  fht_2d(a, rows, n, n_threads);
}

void fht_f32(float* a, std::int64_t rows, std::int64_t n, int n_threads) {
  fht_2d(a, rows, n, n_threads);
}

}  // extern "C"
