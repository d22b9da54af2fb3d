// Native host-side genotype kernels (C++17, std::thread work pool).
//
// TPU-native replacement for the reference's Cython/OpenMP host kernels
// (/root/reference/neural_admixture/src/utils_c/utils.pyx:43-68 BED decode)
// and the packing half of its CUDA pack2bit extension
// (/root/reference/neural_admixture/src/utils_c/pack2bit.cu:10-36): on TPU
// the packed buffer is produced on the host and shipped to HBM once, and
// unpacking happens inside the XLA/Pallas compute graph.
//
// Parallelism is a plain std::thread + atomic work-stealing chunk pool
// rather than OpenMP: identical throughput for these memory-bound loops,
// no libgomp dependency, and ThreadSanitizer can instrument it fully
// (tools/run_tsan.sh keeps the kernels race-checked; the reference's
// OpenMP loops are only race-free by construction, SURVEY.md section 5).
//
// Layouts:
//   bed:    SNP-major, (M, nbytes) with nbytes = ceil(N/4); 2-bit PLINK
//           codes per sample, little-endian within each byte.
//   geno:   sample-major dosages, (N, M) uint8, 3 = missing.
//   packed: sample-major 2-bit dosages, (N, W) uint8, W = m_pad/4; genotype
//           j of a row lives at bits [2*(j%4)] of byte j/4; padding columns
//           (>= M) are genotype 0.
//
// Build: g++ -O3 -march=native -pthread -shared -fPIC (see build.py).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

static const uint8_t LUT[4] = {2, 3, 1, 0};  // PLINK code -> dosage

namespace {

unsigned pool_size() {
    unsigned hw = std::thread::hardware_concurrency();
    return hw ? hw : 4;
}

// Run fn(begin, end) over [0, total) in dynamic chunks on a thread pool.
template <typename F>
void parallel_chunks(int64_t total, int64_t chunk, F&& fn) {
    const unsigned n_threads =
        static_cast<unsigned>(std::min<int64_t>(pool_size(),
                                                (total + chunk - 1) / chunk));
    if (n_threads <= 1) {
        if (total > 0) fn(static_cast<int64_t>(0), total);
        return;
    }
    std::atomic<int64_t> next{0};
    auto worker = [&]() {
        while (true) {
            const int64_t begin = next.fetch_add(chunk);
            if (begin >= total) break;
            fn(begin, std::min(begin + chunk, total));
        }
    };
    std::vector<std::thread> threads;
    threads.reserve(n_threads);
    for (unsigned t = 0; t < n_threads; ++t) threads.emplace_back(worker);
    for (auto& t : threads) t.join();
}

}  // namespace

extern "C" {

// Decode BED bytes to a dense (N, M) dosage matrix.
// Cache-blocked transpose; parallel over sample blocks (disjoint rows).
void na_decode_bed(const uint8_t* bed, int64_t M, int64_t nbytes, int64_t N,
                   uint8_t* geno) {
    const int64_t MT = 1024, NT = 4096;
    parallel_chunks(N, NT, [=](int64_t n0, int64_t n1) {
        for (int64_t m0 = 0; m0 < M; m0 += MT) {
            const int64_t m1 = std::min(m0 + MT, M);
            for (int64_t m = m0; m < m1; ++m) {
                const uint8_t* brow = bed + m * nbytes;
                for (int64_t n = n0; n < n1; ++n) {
                    const uint8_t code = (brow[n >> 2] >> (2 * (n & 3))) & 3;
                    geno[n * M + m] = LUT[code];
                }
            }
        }
    });
}

// Decode BED bytes straight into the sample-major 2-bit packed layout,
// never materializing the (N, M) uint8 matrix. Output must be zeroed
// (padding columns stay genotype 0). W = output row width in bytes.
void na_bed_to_packed(const uint8_t* bed, int64_t M, int64_t nbytes,
                      int64_t N, int64_t W, uint8_t* packed) {
    const int64_t MT = 2048, NT = 4096;
    parallel_chunks(N, NT, [=](int64_t n0, int64_t n1) {
        for (int64_t m0 = 0; m0 < M; m0 += MT) {
            const int64_t m1 = std::min(m0 + MT, M);
            for (int64_t m = m0; m < m1; ++m) {
                const uint8_t* brow = bed + m * nbytes;
                const int64_t ob = m >> 2;
                const int shift = 2 * (m & 3);
                for (int64_t n = n0; n < n1; ++n) {
                    const uint8_t code = (brow[n >> 2] >> (2 * (n & 3))) & 3;
                    packed[n * W + ob] |=
                        static_cast<uint8_t>(LUT[code] << shift);
                }
            }
        }
    });
}

// Pack a dense (N, M) dosage matrix into (N, W) 2-bit rows (W >= ceil(M/4);
// output must be zeroed).
void na_pack_2bit(const uint8_t* geno, int64_t N, int64_t M, int64_t W,
                  uint8_t* packed) {
    parallel_chunks(N, 256, [=](int64_t n0, int64_t n1) {
        for (int64_t n = n0; n < n1; ++n) {
            const uint8_t* grow = geno + n * M;
            uint8_t* prow = packed + n * W;
            for (int64_t m = 0; m < M; ++m) {
                prow[m >> 2] |=
                    static_cast<uint8_t>((grow[m] & 3) << (2 * (m & 3)));
            }
        }
    });
}

// Masked binomial log-likelihood, double precision, per-chunk partials
// combined under a mutex-free atomic scheme (each chunk adds to its own
// slot) -- same semantics as the reference evaluator (utils.pyx:17-40).
// G: (N, M) uint8; P: (M, K) double; Q: (N, K) double.
double na_loglikelihood(const uint8_t* G, const double* P, const double* Q,
                        int64_t N, int64_t M, int64_t K, double eps) {
    const int64_t MT = 256;
    const int64_t n_chunks = (M + MT - 1) / MT;
    std::vector<double> partials(static_cast<size_t>(n_chunks), 0.0);
    parallel_chunks(M, MT, [&, G, P, Q, N, M, K, eps](int64_t j0, int64_t j1) {
        double local = 0.0;
        for (int64_t j = j0; j < j1; ++j) {
            const double* p = P + j * K;
            for (int64_t i = 0; i < N; ++i) {
                const uint8_t g = G[i * M + j];
                if (g != 3) {
                    const double* q = Q + i * K;
                    double rec = 0.0;
                    for (int64_t k = 0; k < K; ++k) rec += q[k] * p[k];
                    rec = std::max(eps, std::min(rec, 1.0 - eps));
                    double gd = static_cast<double>(g);
                    gd = std::max(eps, std::min(gd, 2.0 - eps));
                    local += gd * std::log(rec) + (2.0 - gd) * std::log1p(-rec);
                }
            }
        }
        partials[static_cast<size_t>(j0 / MT)] = local;
    });
    double logl = 0.0;
    for (double v : partials) logl += v;
    return logl;
}

}  // extern "C"
