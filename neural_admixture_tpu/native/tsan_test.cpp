// ThreadSanitizer harness for the OpenMP host kernels (SURVEY.md section 5:
// the reference relies on by-construction race freedom of its prange loops;
// here we actually check it). Built and run by tools/run_tsan.sh with
// -fsanitize=thread; exits non-zero if TSAN reports a race.
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <vector>

extern "C" {
void na_decode_bed(const uint8_t*, int64_t, int64_t, int64_t, uint8_t*);
void na_bed_to_packed(const uint8_t*, int64_t, int64_t, int64_t, int64_t,
                      uint8_t*);
void na_pack_2bit(const uint8_t*, int64_t, int64_t, int64_t, uint8_t*);
double na_loglikelihood(const uint8_t*, const double*, const double*, int64_t,
                        int64_t, int64_t, double);
}

int main() {
    const int64_t N = 1031, M = 4097, K = 5;
    const int64_t nbytes = (N + 3) / 4;
    const int64_t W = ((M + 2047) / 2048 * 2048) / 4;

    std::vector<uint8_t> bed(M * nbytes);
    for (size_t i = 0; i < bed.size(); ++i) bed[i] = (uint8_t)(i * 2654435761u);

    std::vector<uint8_t> geno(N * M);
    na_decode_bed(bed.data(), M, nbytes, N, geno.data());

    std::vector<uint8_t> packed(N * W, 0);
    na_bed_to_packed(bed.data(), M, nbytes, N, W, packed.data());

    std::vector<uint8_t> packed2(N * W, 0);
    na_pack_2bit(geno.data(), N, M, W, packed2.data());
    for (int64_t i = 0; i < N * W; ++i) {
        if (packed[i] != packed2[i]) {
            std::fprintf(stderr, "packed mismatch at %lld\n", (long long)i);
            return 2;
        }
    }

    std::vector<double> P(M * K, 0.4), Q(N * K, 1.0 / K);
    double ll = na_loglikelihood(geno.data(), P.data(), Q.data(), N, M, K,
                                 1e-6);
    std::printf("tsan harness ok, loglik=%f\n", ll);
    return 0;
}
