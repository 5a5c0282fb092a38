// Native repack engine: GGUF wire blocks -> QTensor structure-of-arrays.
//
// Host-side counterpart of llama_kotlin_tpu/quant/repack.py: the bit
// manipulation for multi-gigabyte model loads is the CPU hot loop of the
// loader (the reference's analogue is the repack machinery in
// ggml/src/ggml-aarch64.c:339 plus the mmap'd tensor walk of
// llm_load_tensors).  Exposed as a plain C ABI consumed via ctypes;
// layouts must match repack.py bit-for-bit (validated by
// tests/test_native.py).
//
// Build: cc -O3 -shared -fPIC -o liblktpu_native.so repack.cpp (see
// llama_kotlin_tpu/native.py:_build(); -march=native where available).

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// f16 (IEEE binary16) -> f32, matching numpy's conversion
static inline float f16_to_f32(uint16_t h) {
    uint32_t sign = (uint32_t)(h & 0x8000u) << 16;
    uint32_t em = h & 0x7FFFu;
    uint32_t out;
    if (em >= 0x7C00u) {               // inf/nan
        out = sign | 0x7F800000u | ((em & 0x3FFu) << 13);
    } else if (em >= 0x0400u) {        // normal
        out = sign | ((em + (112u << 10)) << 13);
    } else if (em != 0) {              // subnormal
        uint32_t m = em;
        int shift = 0;
        while (!(m & 0x0400u)) { m <<= 1; shift++; }
        m &= 0x03FFu;
        out = sign | ((113u - shift) << 23) | (m << 13);
    } else {
        out = sign;                    // +-0
    }
    float f;
    std::memcpy(&f, &out, sizeof(f));
    return f;
}

// ---------------------------------------------------------------------------
// plane packers (SPAN = 256 elements)
// ---------------------------------------------------------------------------

// pack 4-bit codes [k_pad] -> bytes [k_pad/2]: byte j of span s holds
// elem 256s+j (lo) and 256s+128+j (hi)
static void pack4_row(const uint8_t* codes, uint8_t* out, int64_t k_pad) {
    for (int64_t s = 0; s < k_pad / 256; ++s) {
        const uint8_t* c = codes + s * 256;
        uint8_t* o = out + s * 128;
        for (int j = 0; j < 128; ++j)
            o[j] = (uint8_t)(c[j] | (c[128 + j] << 4));
    }
}

static void pack2_row(const uint8_t* codes, uint8_t* out, int64_t k_pad) {
    for (int64_t s = 0; s < k_pad / 256; ++s) {
        const uint8_t* c = codes + s * 256;
        uint8_t* o = out + s * 64;
        for (int j = 0; j < 64; ++j)
            o[j] = (uint8_t)(c[j] | (c[64 + j] << 2) | (c[128 + j] << 4) |
                             (c[192 + j] << 6));
    }
}

// ---------------------------------------------------------------------------
// per-format repack (row-major [n, k]; k % block == 0; k_pad % 256 == 0)
// outputs are caller-allocated and zero-initialised (padding stays zero)
// ---------------------------------------------------------------------------

// Q8_0: 34B block = f16 d + 32 int8 -> codes i8 [n,k_pad], d f32 [n,k_pad/32]
void repack_q8_0(const uint8_t* src, int64_t n, int64_t k, int64_t k_pad,
                 int8_t* codes, float* d_out) {
    const int64_t nb = k / 32;
    for (int64_t r = 0; r < n; ++r) {
        const uint8_t* row = src + r * nb * 34;
        for (int64_t b = 0; b < nb; ++b) {
            const uint8_t* blk = row + b * 34;
            uint16_t d16;
            std::memcpy(&d16, blk, 2);
            d_out[r * (k_pad / 32) + b] = f16_to_f32(d16);
            std::memcpy(codes + r * k_pad + b * 32, blk + 2, 32);
        }
    }
}

// Q4_0: 18B block -> u4 codes plane-packed [n,k_pad/2], d f32 [n,k_pad/32]
void repack_q4_0(const uint8_t* src, int64_t n, int64_t k, int64_t k_pad,
                 uint8_t* packed, float* d_out) {
    const int64_t nb = k / 32;
    // per-thread row buffer (RAII: no leak on thread exit)
    static thread_local std::vector<uint8_t> rowvec;
    for (int64_t r = 0; r < n; ++r) {
        const uint8_t* row = src + r * nb * 18;
        if ((int64_t)rowvec.size() < k_pad) rowvec.resize(k_pad);
        uint8_t* rowbuf = rowvec.data();
        std::memset(rowbuf, 0, (size_t)k_pad);
        for (int64_t b = 0; b < nb; ++b) {
            const uint8_t* blk = row + b * 18;
            uint16_t d16;
            std::memcpy(&d16, blk, 2);
            d_out[r * (k_pad / 32) + b] = f16_to_f32(d16);
            const uint8_t* qs = blk + 2;
            uint8_t* dst = rowbuf + b * 32;
            for (int j = 0; j < 16; ++j) {
                dst[j] = (uint8_t)(qs[j] & 0x0F);
                dst[16 + j] = (uint8_t)(qs[j] >> 4);
            }
        }
        pack4_row(rowbuf, packed + r * (k_pad / 2), k_pad);
    }
}

// Q4_K: 144B superblock -> u4 plane-packed codes, sc/mn u8 [n,k_pad/32],
// d/dmin f32 [n,k_pad/256]
void repack_q4_k(const uint8_t* src, int64_t n, int64_t k, int64_t k_pad,
                 uint8_t* packed, uint8_t* sc_out, uint8_t* mn_out,
                 float* d_out, float* dmin_out) {
    const int64_t nsb = k / 256;
    static thread_local std::vector<uint8_t> rowvec2;
    if ((int64_t)rowvec2.size() < k_pad) rowvec2.resize(k_pad);
    uint8_t* rowbuf = rowvec2.data();
    for (int64_t r = 0; r < n; ++r) {
        const uint8_t* row = src + r * nsb * 144;
        std::memset(rowbuf, 0, (size_t)k_pad);
        for (int64_t b = 0; b < nsb; ++b) {
            const uint8_t* blk = row + b * 144;
            uint16_t d16, m16;
            std::memcpy(&d16, blk, 2);
            std::memcpy(&m16, blk + 2, 2);
            d_out[r * (k_pad / 256) + b] = f16_to_f32(d16);
            dmin_out[r * (k_pad / 256) + b] = f16_to_f32(m16);
            const uint8_t* scales = blk + 4;
            uint8_t* sc = sc_out + r * (k_pad / 32) + b * 8;
            uint8_t* mn = mn_out + r * (k_pad / 32) + b * 8;
            for (int j = 0; j < 8; ++j) {
                if (j < 4) {
                    sc[j] = (uint8_t)(scales[j] & 63);
                    mn[j] = (uint8_t)(scales[j + 4] & 63);
                } else {
                    sc[j] = (uint8_t)((scales[j + 4] & 0x0F) | ((scales[j - 4] >> 6) << 4));
                    mn[j] = (uint8_t)((scales[j + 4] >> 4) | ((scales[j] >> 6) << 4));
                }
            }
            const uint8_t* qs = blk + 16;
            uint8_t* dst = rowbuf + b * 256;
            for (int j = 0; j < 4; ++j) {
                const uint8_t* chunk = qs + 32 * j;
                for (int l = 0; l < 32; ++l) {
                    dst[64 * j + l] = (uint8_t)(chunk[l] & 0x0F);
                    dst[64 * j + 32 + l] = (uint8_t)(chunk[l] >> 4);
                }
            }
        }
        pack4_row(rowbuf, packed + r * (k_pad / 2), k_pad);
    }
}

// Q6_K: 210B superblock -> i8 codes [n,k_pad], sc i8 [n,k_pad/16],
// d f32 [n,k_pad/256]
void repack_q6_k(const uint8_t* src, int64_t n, int64_t k, int64_t k_pad,
                 int8_t* codes, int8_t* sc_out, float* d_out) {
    const int64_t nsb = k / 256;
    for (int64_t r = 0; r < n; ++r) {
        const uint8_t* row = src + r * nsb * 210;
        for (int64_t b = 0; b < nsb; ++b) {
            const uint8_t* blk = row + b * 210;
            const uint8_t* ql = blk;
            const uint8_t* qh = blk + 128;
            const int8_t* scales = (const int8_t*)(blk + 192);
            uint16_t d16;
            std::memcpy(&d16, blk + 208, 2);
            d_out[r * (k_pad / 256) + b] = f16_to_f32(d16);
            std::memcpy(sc_out + r * (k_pad / 16) + b * 16, scales, 16);
            int8_t* dst = codes + r * k_pad + b * 256;
            for (int half = 0; half < 2; ++half) {
                const uint8_t* lql = ql + 64 * half;
                const uint8_t* lqh = qh + 32 * half;
                int8_t* d2 = dst + 128 * half;
                for (int l = 0; l < 32; ++l) {
                    d2[l] = (int8_t)(((lql[l] & 0x0F) | ((lqh[l] & 0x03) << 4)) - 32);
                    d2[32 + l] = (int8_t)(((lql[32 + l] & 0x0F) | (((lqh[l] >> 2) & 0x03) << 4)) - 32);
                    d2[64 + l] = (int8_t)(((lql[l] >> 4) | (((lqh[l] >> 4) & 0x03) << 4)) - 32);
                    d2[96 + l] = (int8_t)(((lql[32 + l] >> 4) | (((lqh[l] >> 6) & 0x03) << 4)) - 32);
                }
            }
        }
    }
}

}  // extern "C"
