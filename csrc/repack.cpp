// Native checkpoint repacker: AWQ/GPTQ int32-nibble unpacking and the
// TPU i8pair superblock packing (the host-side analogue of the
// reference's gptq_shuffle / weight re-permutation at load,
// csrc/quantization/gptq/q_gemm.cu:729-862). These loops dominate
// multi-GB quantized checkpoint ingestion; OpenMP-parallel C++ runs
// them at memory bandwidth where the numpy fallback materializes
// several temporaries per tensor.
//
// Build: g++ -O3 -shared -fPIC -fopenmp csrc/repack.cpp -o <out>.so
#include <cstdint>

extern "C" {

// AWQ: in [rows, cols_packed] int32; nibble position p holds logical
// element AWQ_PACK_ORDER[p] (csrc/quantization/awq/dequantize.cuh).
// out [rows, cols_packed * 8] uint8.
void awq_unpack(const uint32_t* in, uint8_t* out, int64_t rows,
                int64_t cols_packed) {
    static const int order[8] = {0, 2, 4, 6, 1, 3, 5, 7};
#pragma omp parallel for schedule(static)
    for (int64_t r = 0; r < rows; ++r) {
        const uint32_t* src = in + r * cols_packed;
        uint8_t* dst = out + r * cols_packed * 8;
        for (int64_t c = 0; c < cols_packed; ++c) {
            uint32_t v = src[c];
            uint8_t* o = dst + c * 8;
            for (int p = 0; p < 8; ++p) {
                o[order[p]] = (v >> (4 * p)) & 0xF;
            }
        }
    }
}

// GPTQ: in [rows_packed, cols] int32, 8 sequential nibbles along axis
// 0 (LSB first). out [rows_packed * 8, cols] uint8.
void gptq_unpack_axis0(const uint32_t* in, uint8_t* out,
                       int64_t rows_packed, int64_t cols) {
#pragma omp parallel for schedule(static)
    for (int64_t rp = 0; rp < rows_packed; ++rp) {
        const uint32_t* src = in + rp * cols;
        for (int p = 0; p < 8; ++p) {
            uint8_t* dst = out + (rp * 8 + p) * cols;
            for (int64_t c = 0; c < cols; ++c) {
                dst[c] = (src[c] >> (4 * p)) & 0xF;
            }
        }
    }
}

// i8pair superblock packing (ops/quant_formats.py pack_i8pair): within
// each 256-row superblock, byte row sb*128+t = q[sb*256+t] in the low
// nibble and q[sb*256+128+t] in the high nibble. q [k, n] uint8
// (k % 256 == 0) -> out [k/2, n] int8.
void pack_i8pair(const uint8_t* q, int8_t* out, int64_t k, int64_t n) {
    int64_t n_sb = k / 256;
#pragma omp parallel for schedule(static) collapse(2)
    for (int64_t sb = 0; sb < n_sb; ++sb) {
        for (int64_t t = 0; t < 128; ++t) {
            const uint8_t* lo = q + (sb * 256 + t) * n;
            const uint8_t* hi = q + (sb * 256 + 128 + t) * n;
            int8_t* dst = out + (sb * 128 + t) * n;
            for (int64_t c = 0; c < n; ++c) {
                dst[c] = (int8_t)((lo[c] & 0xF) | ((hi[c] & 0xF) << 4));
            }
        }
    }
}

}  // extern "C"
