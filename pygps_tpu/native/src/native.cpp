// pygps_tpu native runtime ops (C++, OpenMP-threaded, ctypes ABI).
//
// The reference is pure Python (SURVEY.md §2.1: its only native code is
// numpy's vendored BLAS/LAPACK).  The TPU compute path here is JAX/XLA/
// Pallas; this library covers the *host-side* runtime work that would
// otherwise serialize on the Python interpreter:
//
//   * csr_row_normalize / csr_spmm  — sparse label-distribution
//     propagation for the graph-kernel subsystem (dense adjacency is
//     O(N²) memory; real graph datasets are sparse)
//   * bin_counts                     — LSH bin → per-graph count
//     accumulation (the propagation kernel's scatter-add hot loop)
//   * load_f32 / load_f64_as_f32     — mmap'ed binary matrix reader with
//     on-the-fly down-conversion (feeds device buffers without a Python
//     copy)
//   * shuffled_indices               — splitmix64-keyed minibatch
//     permutation generator (host-side data loader companion)
//
// Built with: g++ -O3 -fPIC -shared -fopenmp (see pygps_tpu/native/__init__.py).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cmath>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

extern "C" {

// Row-normalize a CSR matrix in place (transition operator for label
// propagation: T = D^-1 A).
void csr_row_normalize(const int64_t* indptr, float* data, int64_t n) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n; ++i) {
        double s = 0.0;
        for (int64_t k = indptr[i]; k < indptr[i + 1]; ++k) s += data[k];
        if (s > 1e-12) {
            const float inv = (float)(1.0 / s);
            for (int64_t k = indptr[i]; k < indptr[i + 1]; ++k)
                data[k] *= inv;
        }
    }
}

// P_out = T P_in  for CSR T (n x n) and dense P (n x C), row-major.
void csr_spmm(const int64_t* indptr, const int32_t* indices,
              const float* data, const float* p_in, float* p_out,
              int64_t n, int64_t C) {
#pragma omp parallel for schedule(dynamic, 64)
    for (int64_t i = 0; i < n; ++i) {
        float* out = p_out + i * C;
        for (int64_t c = 0; c < C; ++c) out[c] = 0.0f;
        for (int64_t k = indptr[i]; k < indptr[i + 1]; ++k) {
            const float w = data[k];
            const float* row = p_in + (int64_t)indices[k] * C;
            for (int64_t c = 0; c < C; ++c) out[c] += w * row[c];
        }
    }
}

// out[g, bins[i]] += 1 for each node i of graph gr_id[i].
void bin_counts(const int64_t* bins, const int32_t* gr_id, double* out,
                int64_t n, int64_t G, int64_t nbins) {
    (void)G;
    for (int64_t i = 0; i < n; ++i) {
        const int64_t b = bins[i];
        if (b >= 0 && b < nbins) out[(int64_t)gr_id[i] * nbins + b] += 1.0;
    }
}

// K += M M^T for M (G x nbins) row-major, double.  Small G: plain loops.
void gram_accumulate(const double* M, double* K, int64_t G, int64_t nbins) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < G; ++i) {
        for (int64_t j = 0; j <= i; ++j) {
            double s = 0.0;
            const double* a = M + i * nbins;
            const double* b = M + j * nbins;
            for (int64_t k = 0; k < nbins; ++k) s += a[k] * b[k];
            K[i * G + j] += s;
            if (i != j) K[j * G + i] += s;
        }
    }
}

// mmap'ed raw-binary reads. Returns 0 on success.
int load_f32(const char* path, float* out, int64_t count, int64_t offset_bytes) {
    int fd = open(path, O_RDONLY);
    if (fd < 0) return -1;
    struct stat st;
    if (fstat(fd, &st) != 0) { close(fd); return -2; }
    const int64_t need = offset_bytes + count * (int64_t)sizeof(float);
    if (st.st_size < need) { close(fd); return -3; }
    void* m = mmap(nullptr, (size_t)need, PROT_READ, MAP_PRIVATE, fd, 0);
    if (m == MAP_FAILED) { close(fd); return -4; }
    madvise(m, (size_t)need, MADV_SEQUENTIAL);
    memcpy(out, (const char*)m + offset_bytes, count * sizeof(float));
    munmap(m, (size_t)need);
    close(fd);
    return 0;
}

int load_f64_as_f32(const char* path, float* out, int64_t count,
                    int64_t offset_bytes) {
    int fd = open(path, O_RDONLY);
    if (fd < 0) return -1;
    struct stat st;
    if (fstat(fd, &st) != 0) { close(fd); return -2; }
    const int64_t need = offset_bytes + count * (int64_t)sizeof(double);
    if (st.st_size < need) { close(fd); return -3; }
    void* m = mmap(nullptr, (size_t)need, PROT_READ, MAP_PRIVATE, fd, 0);
    if (m == MAP_FAILED) { close(fd); return -4; }
    madvise(m, (size_t)need, MADV_SEQUENTIAL);
    const double* src = (const double*)((const char*)m + offset_bytes);
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < count; ++i) out[i] = (float)src[i];
    munmap(m, (size_t)need);
    close(fd);
    return 0;
}

// splitmix64-based Fisher-Yates permutation of [0, n).
static inline uint64_t splitmix64(uint64_t* s) {
    uint64_t z = (*s += 0x9e3779b97f4a7c15ULL);
    z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ULL;
    z = (z ^ (z >> 27)) * 0x94d049bb133111ebULL;
    return z ^ (z >> 31);
}

void shuffled_indices(int64_t* out, int64_t n, uint64_t seed) {
    for (int64_t i = 0; i < n; ++i) out[i] = i;
    uint64_t s = seed;
    for (int64_t i = n - 1; i > 0; --i) {
        const int64_t j = (int64_t)(splitmix64(&s) % (uint64_t)(i + 1));
        const int64_t t = out[i];
        out[i] = out[j];
        out[j] = t;
    }
}

}  // extern "C"
