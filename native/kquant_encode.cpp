// K-quant encoders (Q2_K..Q6_K), threaded C++ core.
//
// The vectorised-numpy encoders in quant/numpy_ref.py are algorithmically
// fine but temporary-bound (~40 MB/s of weights): ~2 hours to quantize an
// 8B model.  This file implements the SAME search semantics (the
// re-derived weighted scale search / ALS described there — candidate
// inverse scales for symmetric groups, 8-round alternating assignment +
// weighted least squares for asymmetric groups) as straightforward scalar
// C++ over superblocks, threaded across superblock ranges.  ~100x faster;
// the quantize tool (tools/quantize.py) picks it up automatically via
// llama_kotlin_tpu/native.py and falls back to numpy when unavailable.
//
// Output wire layouts are byte-identical to the numpy encoders' (and the
// reference formats they implement); encodings may differ in rounding on
// ties, which is allowed — quality is gated by
// tests/test_quant_formats.py::test_kquant_quality_not_worse_than_reference
// and cross-checked against the numpy encoder in tests/test_native.py.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <algorithm>
#include <thread>
#include <vector>

namespace {

constexpr int QK_K = 256;

// f32 -> IEEE binary16 bits, round-to-nearest-even (matches numpy astype)
static inline uint16_t f32_to_f16(float f) {
    uint32_t x;
    std::memcpy(&x, &f, 4);
    uint32_t sign = (x >> 16) & 0x8000u;
    int32_t  exp  = (int32_t)((x >> 23) & 0xFF) - 127 + 15;
    uint32_t man  = x & 0x7FFFFFu;
    if (((x >> 23) & 0xFF) == 0xFF) {               // inf/nan
        return (uint16_t)(sign | 0x7C00u | (man ? 0x200u : 0));
    }
    if (exp >= 0x1F) return (uint16_t)(sign | 0x7C00u);   // overflow -> inf
    if (exp <= 0) {                                  // subnormal / zero
        if (exp < -10) return (uint16_t)sign;
        man |= 0x800000u;
        int shift = 14 - exp;
        uint32_t q = man >> shift;
        uint32_t rem = man & ((1u << shift) - 1);
        uint32_t half = 1u << (shift - 1);
        if (rem > half || (rem == half && (q & 1))) q++;
        return (uint16_t)(sign | q);
    }
    uint32_t q = man >> 13;
    uint32_t rem = man & 0x1FFFu;
    uint16_t h = (uint16_t)(sign | ((uint32_t)exp << 10) | q);
    if (rem > 0x1000u || (rem == 0x1000u && (h & 1))) h++;
    return h;
}

static inline int nearest_int(float x) { return (int)nearbyintf(x); }

// signed value with the largest magnitude
static inline float signed_extreme(const float *x, int n) {
    float best = 0.0f, besta = -1.0f;
    for (int i = 0; i < n; i++) {
        float a = std::fabs(x[i]);
        if (a > besta) { besta = a; best = x[i]; }
    }
    return best;
}

// symmetric weighted scale search (numpy _make_q_symmetric):
// x ~ scale * L, L in [-nmax, nmax-1]; w = x^2.
static float make_q_symmetric(const float *x, int n, int nmax, int32_t *L) {
    float smax = signed_extreme(x, n);
    float amax = std::fabs(smax);
    if (amax < 1e-30f) { std::fill(L, L + n, 0); return 0.0f; }
    float best_score = -1.0f;
    int32_t cand[32];  // n <= 32 for every K-quant group
    for (int k = -9; k <= 9; k++) {
        float iscale = -(nmax + 0.1f * k) / smax;
        float sumlx = 0, suml2 = 0;
        for (int i = 0; i < n; i++) {
            int l = std::clamp(nearest_int(iscale * x[i]), -nmax, nmax - 1);
            cand[i] = l;
            float w = x[i] * x[i];
            sumlx += w * x[i] * l;
            suml2 += w * (float)l * l;
        }
        float score = suml2 > 0 ? sumlx * sumlx / suml2 : -1.0f;
        if (score > best_score) {
            best_score = score;
            std::copy(cand, cand + n, L);
        }
    }
    float sumlx = 0, suml2 = 0;
    for (int i = 0; i < n; i++) {
        float w = x[i] * x[i];
        sumlx += w * x[i] * L[i];
        suml2 += w * (float)L[i] * L[i];
    }
    return suml2 > 0 ? sumlx / suml2 : 0.0f;
}

// asymmetric weighted ALS (numpy _make_q_asymmetric): x ~ scale*L + mn,
// mn <= 0; returns scale and minus_min = -mn >= 0.  L in [0, nmax].
static void make_q_asymmetric(const float *x, int n, int nmax,
                              int32_t *L, float *scale_out, float *mmin_out) {
    float amean = 0;
    for (int i = 0; i < n; i++) amean += std::fabs(x[i]);
    amean /= n;
    float w[32];  // n <= 32 for every K-quant group
    for (int i = 0; i < n; i++) w[i] = std::sqrt(std::fabs(x[i]) + amean);
    float mn = 0.0f, mx = x[0];
    for (int i = 0; i < n; i++) { mn = std::min(mn, x[i]); mx = std::max(mx, x[i]); }
    float mn0 = mn;
    float scale = (mx - mn) / nmax;
    float safe = scale <= 0 ? 1.0f : scale;
    float best_err = INFINITY, best_scale = 0.0f, best_min = 0.0f;
    int32_t cand[32];
    std::fill(L, L + n, 0);
    for (int it = 0; it < 8; it++) {
        float sw = 0, sl = 0, sx = 0, sll = 0, slx = 0;
        for (int i = 0; i < n; i++) {
            int l = std::clamp(nearest_int((x[i] - mn) / safe), 0, nmax);
            cand[i] = l;
            sw += w[i]; sl += w[i] * l; sx += w[i] * x[i];
            sll += w[i] * (float)l * l; slx += w[i] * l * x[i];
        }
        float det = sw * sll - sl * sl;
        if (std::fabs(det) <= 1e-30f) continue;
        float ns = (sw * slx - sl * sx) / det;
        float nm = std::min((sll * sx - sl * slx) / det, 0.0f);
        float err = 0;
        for (int i = 0; i < n; i++) {
            float e = ns * cand[i] + nm - x[i];
            err += w[i] * e * e;
        }
        if (err < best_err) {
            best_err = err; best_scale = ns; best_min = nm;
            std::copy(cand, cand + n, L);
            scale = ns; mn = nm; safe = scale <= 0 ? 1.0f : scale;
        }
    }
    if (mx - mn0 < 1e-30f) {  // flat group (numpy edge-case semantics)
        best_scale = 0.0f;
        best_min = std::min(mn, 0.0f);
        std::fill(L, L + n, 0);
    }
    *scale_out = best_scale;
    *mmin_out = -best_min;
}

// (8 scales, 8 mins) 6-bit each -> 12 bytes (pack_scale_min_k4)
static void pack_scales_k4(const uint8_t *sc, const uint8_t *mn, uint8_t *out) {
    for (int j = 0; j < 4; j++) {
        out[j]     = (uint8_t)((sc[j] & 63) | ((sc[j + 4] >> 4) << 6));
        out[j + 4] = (uint8_t)((mn[j] & 63) | ((mn[j + 4] >> 4) << 6));
        out[j + 8] = (uint8_t)((sc[j + 4] & 0x0F) | ((mn[j + 4] & 0x0F) << 4));
    }
}

// shared Q4_K/Q5_K scale path (numpy _encode_k45)
static void encode_k45(const float *xb, int nmax, uint8_t *Lq,
                       uint8_t *ls, uint8_t *lm, float *d, float *dmin) {
    int32_t L[QK_K];
    float scales[8], mins[8];
    for (int g = 0; g < 8; g++)
        make_q_asymmetric(xb + 32 * g, 32, nmax, L + 32 * g,
                          &scales[g], &mins[g]);
    float max_s = 0, max_m = 0;
    for (int g = 0; g < 8; g++) {
        max_s = std::max(max_s, scales[g]);
        max_m = std::max(max_m, mins[g]);
    }
    float inv_s = max_s > 0 ? 63.0f / max_s : 0.0f;
    float inv_m = max_m > 0 ? 63.0f / max_m : 0.0f;
    *d = max_s / 63.0f;
    *dmin = max_m / 63.0f;
    for (int g = 0; g < 8; g++) {
        ls[g] = (uint8_t)std::clamp(nearest_int(inv_s * scales[g]), 0, 63);
        lm[g] = (uint8_t)std::clamp(nearest_int(inv_m * mins[g]), 0, 63);
        float eff_s = *d * ls[g];
        float eff_m = *dmin * lm[g];
        float safe = eff_s == 0 ? 1.0f : eff_s;
        for (int i = 0; i < 32; i++) {
            int l = std::clamp(nearest_int((xb[32 * g + i] + eff_m) / safe), 0, nmax);
            Lq[32 * g + i] = eff_s == 0 ? 0 : (uint8_t)l;
        }
    }
}

static void encode_q4_k_block(const float *xb, uint8_t *out) {
    uint8_t L[QK_K], ls[8], lm[8];
    float d, dmin;
    encode_k45(xb, 15, L, ls, lm, &d, &dmin);
    uint16_t d16 = f32_to_f16(d), m16 = f32_to_f16(dmin);
    std::memcpy(out, &d16, 2);
    std::memcpy(out + 2, &m16, 2);
    pack_scales_k4(ls, lm, out + 4);
    for (int j = 0; j < 4; j++)
        for (int i = 0; i < 32; i++)
            out[16 + 32 * j + i] =
                (uint8_t)(L[64 * j + i] | (L[64 * j + 32 + i] << 4));
}

static void encode_q5_k_block(const float *xb, uint8_t *out) {
    uint8_t L[QK_K], ls[8], lm[8];
    float d, dmin;
    encode_k45(xb, 31, L, ls, lm, &d, &dmin);
    uint16_t d16 = f32_to_f16(d), m16 = f32_to_f16(dmin);
    std::memcpy(out, &d16, 2);
    std::memcpy(out + 2, &m16, 2);
    pack_scales_k4(ls, lm, out + 4);
    uint8_t *qh = out + 16, *ql = out + 48;
    std::memset(qh, 0, 32);
    for (int j = 0; j < 4; j++)
        for (int i = 0; i < 32; i++) {
            uint8_t lo = L[64 * j + i], hi = L[64 * j + 32 + i];
            ql[32 * j + i] = (uint8_t)((lo & 0x0F) | ((hi & 0x0F) << 4));
            qh[i] |= (uint8_t)((((lo >> 4) & 1) << (2 * j))
                               | (((hi >> 4) & 1) << (2 * j + 1)));
        }
}

static void encode_q6_k_block(const float *xb, uint8_t *out) {
    int32_t L[QK_K];
    float scales[16];
    for (int g = 0; g < 16; g++)
        scales[g] = make_q_symmetric(xb + 16 * g, 16, 32, L + 16 * g);
    float smax = signed_extreme(scales, 16);
    float d = 0.0f;
    int8_t ls[16] = {0};
    if (std::fabs(smax) >= 1e-30f) {
        float iscale = -128.0f / smax;
        d = 1.0f / iscale;
        for (int g = 0; g < 16; g++)
            ls[g] = (int8_t)std::clamp(nearest_int(iscale * scales[g]), -128, 127);
    }
    uint8_t Lq[QK_K];
    for (int g = 0; g < 16; g++) {
        float eff = d * ls[g];
        float safe = eff == 0 ? 1.0f : eff;
        for (int i = 0; i < 16; i++) {
            int l = std::clamp(nearest_int(xb[16 * g + i] / safe), -32, 31);
            Lq[16 * g + i] = (uint8_t)((eff == 0 ? 0 : l) + 32);
        }
    }
    uint8_t *ql = out, *qh = out + 128;
    std::memset(qh, 0, 64);
    for (int n = 0; n < 2; n++) {
        const uint8_t *q1 = Lq + 128 * n, *q2 = q1 + 32, *q3 = q1 + 64, *q4 = q1 + 96;
        for (int i = 0; i < 32; i++) {
            ql[64 * n + i]      = (uint8_t)((q1[i] & 0x0F) | ((q3[i] & 0x0F) << 4));
            ql[64 * n + 32 + i] = (uint8_t)((q2[i] & 0x0F) | ((q4[i] & 0x0F) << 4));
            qh[32 * n + i] = (uint8_t)((q1[i] >> 4) | ((q2[i] >> 4) << 2)
                                       | ((q3[i] >> 4) << 4) | ((q4[i] >> 4) << 6));
        }
    }
    std::memcpy(out + 192, ls, 16);
    uint16_t d16 = f32_to_f16(d);
    std::memcpy(out + 208, &d16, 2);
}

static void encode_q3_k_block(const float *xb, uint8_t *out) {
    int32_t L[QK_K];
    float scales[16];
    for (int g = 0; g < 16; g++)
        scales[g] = make_q_symmetric(xb + 16 * g, 16, 4, L + 16 * g);
    float smax = signed_extreme(scales, 16);
    float d = 0.0f;
    int8_t ls[16] = {0};
    if (std::fabs(smax) >= 1e-30f) {
        float iscale = -32.0f / smax;
        d = 1.0f / iscale;
        for (int g = 0; g < 16; g++)
            ls[g] = (int8_t)std::clamp(nearest_int(iscale * scales[g]), -32, 31);
    }
    uint8_t Lq[QK_K];
    for (int g = 0; g < 16; g++) {
        float eff = d * ls[g];
        float safe = eff == 0 ? 1.0f : eff;
        for (int i = 0; i < 16; i++) {
            int l = std::clamp(nearest_int(xb[16 * g + i] / safe), -4, 3);
            Lq[16 * g + i] = (uint8_t)((eff == 0 ? 0 : l) + 4);
        }
    }
    uint8_t *hmask = out, *qs = out + 32;
    std::memset(hmask, 0, 32);
    std::memset(qs, 0, 64);
    int m = 1;
    for (int n = 0; n < 2; n++)
        for (int shift = 0; shift < 8; shift += 2) {
            const uint8_t *row = Lq + 128 * n + (shift / 2) * 32;
            for (int i = 0; i < 32; i++) {
                qs[32 * n + i] |= (uint8_t)((row[i] & 3) << shift);
                if ((row[i] >> 2) & 1) hmask[i] |= (uint8_t)m;
            }
            m <<= 1;
        }
    // pack_q3k_scales: 16 signed 6-bit (value+32) -> 12 bytes
    uint8_t u[16], *sc = out + 96;
    for (int g = 0; g < 16; g++) u[g] = (uint8_t)(ls[g] + 32);
    for (int j = 0; j < 4; j++) {
        sc[j]     = (uint8_t)((u[j] & 0x0F) | ((u[j + 8] & 0x0F) << 4));
        sc[j + 4] = (uint8_t)((u[j + 4] & 0x0F) | ((u[j + 12] & 0x0F) << 4));
        sc[j + 8] = (uint8_t)(((u[j] >> 4) & 3) | (((u[j + 4] >> 4) & 3) << 2)
                              | (((u[j + 8] >> 4) & 3) << 4)
                              | (((u[j + 12] >> 4) & 3) << 6));
    }
    uint16_t d16 = f32_to_f16(d);
    std::memcpy(out + 108, &d16, 2);
}

static void encode_q2_k_block(const float *xb, uint8_t *out) {
    int32_t L[QK_K];
    float scales[16], mins[16];
    for (int g = 0; g < 16; g++)
        make_q_asymmetric(xb + 16 * g, 16, 3, L + 16 * g, &scales[g], &mins[g]);
    float max_s = 0, max_m = 0;
    for (int g = 0; g < 16; g++) {
        max_s = std::max(max_s, scales[g]);
        max_m = std::max(max_m, mins[g]);
    }
    float inv_s = max_s > 0 ? 15.0f / max_s : 0.0f;
    float inv_m = max_m > 0 ? 15.0f / max_m : 0.0f;
    float d = max_s / 15.0f, dmin = max_m / 15.0f;
    uint8_t Lq[QK_K];
    for (int g = 0; g < 16; g++) {
        uint8_t s4 = (uint8_t)std::clamp(nearest_int(inv_s * scales[g]), 0, 15);
        uint8_t m4 = (uint8_t)std::clamp(nearest_int(inv_m * mins[g]), 0, 15);
        out[g] = (uint8_t)(s4 | (m4 << 4));
        float eff_s = d * s4, eff_m = dmin * m4;
        float safe = eff_s == 0 ? 1.0f : eff_s;
        for (int i = 0; i < 16; i++) {
            int l = std::clamp(nearest_int((xb[16 * g + i] + eff_m) / safe), 0, 3);
            Lq[16 * g + i] = eff_s == 0 ? 0 : (uint8_t)l;
        }
    }
    uint8_t *qs = out + 16;
    std::memset(qs, 0, 64);
    for (int n = 0; n < 2; n++)
        for (int shift = 0; shift < 8; shift += 2) {
            const uint8_t *row = Lq + 128 * n + (shift / 2) * 32;
            for (int i = 0; i < 32; i++)
                qs[32 * n + i] |= (uint8_t)(row[i] << shift);
        }
    uint16_t d16 = f32_to_f16(d), m16 = f32_to_f16(dmin);
    std::memcpy(out + 80, &d16, 2);
    std::memcpy(out + 82, &m16, 2);
}

using block_fn = void (*)(const float *, uint8_t *);

struct Spec { block_fn fn; int bytes; };

static bool spec_for(int tag, Spec *s) {
    switch (tag) {
        case 2: *s = {encode_q2_k_block, 84}; return true;
        case 3: *s = {encode_q3_k_block, 110}; return true;
        case 4: *s = {encode_q4_k_block, 144}; return true;
        case 5: *s = {encode_q5_k_block, 176}; return true;
        case 6: *s = {encode_q6_k_block, 210}; return true;
    }
    return false;
}

}  // namespace

extern "C" {

// x: n_sb * 256 floats; out: n_sb * block_bytes(tag).  tag = 2..6 for
// Q2_K..Q6_K.  Returns block bytes, or 0 for an unknown tag.
int lk_encode_kquant(int tag, const float *x, uint8_t *out, int64_t n_sb,
                     int n_threads) {
    Spec s;
    if (!spec_for(tag, &s)) return 0;
    if (n_threads < 1) n_threads = 1;
    int nt = (int)std::min<int64_t>(n_threads, std::max<int64_t>(n_sb, 1));
    auto work = [&](int64_t lo, int64_t hi) {
        for (int64_t b = lo; b < hi; b++)
            s.fn(x + b * QK_K, out + b * s.bytes);
    };
    if (nt <= 1) {
        work(0, n_sb);
    } else {
        std::vector<std::thread> th;
        int64_t per = (n_sb + nt - 1) / nt;
        for (int t = 0; t < nt; t++) {
            int64_t lo = t * per, hi = std::min<int64_t>(n_sb, lo + per);
            if (lo >= hi) break;
            th.emplace_back(work, lo, hi);
        }
        for (auto &t : th) t.join();
    }
    return s.bytes;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// IQ4 encoders (nearest non-linear level; same semantics as quant/iq.py)
// ---------------------------------------------------------------------------

namespace {

// kvalues_iq4nl non-linear grid (wire-format constant shared by every
// compatible codec, cf. quant/iq.py KVALUES_IQ4NL)
static const int8_t IQ4NL_K[16] = {-127, -104, -83, -65, -49, -35, -22, -10,
                                   1, 13, 25, 38, 53, 69, 89, 113};

static inline uint8_t iq4_nearest(float v) {
    float best = 1e30f;
    uint8_t bi = 0;
    for (int i = 0; i < 16; i++) {
        float d = std::fabs(v - (float)IQ4NL_K[i]);
        if (d < best) { best = d; bi = (uint8_t)i; }
    }
    return bi;
}

// block_iq4_nl: 32 elements -> 18 bytes (f16 d + 16 packed nibbles)
static void encode_iq4_nl_block(const float *xb, uint8_t *out) {
    float amax = 0;
    for (int i = 0; i < 32; i++) amax = std::max(amax, std::fabs(xb[i]));
    float d = amax / 127.0f;
    float dd = d == 0 ? 1.0f : d;
    uint16_t d16 = f32_to_f16(d);
    std::memcpy(out, &d16, 2);
    for (int i = 0; i < 16; i++) {
        uint8_t lo = iq4_nearest(xb[i] / dd);
        uint8_t hi = iq4_nearest(xb[16 + i] / dd);
        out[2 + i] = (uint8_t)(lo | (hi << 4));
    }
}

// block_iq4_xs: 256 elements -> 136 bytes (f16 d, u16 scales_h, 4B
// scales_l, 128B packed nibbles); per-32 6-bit sub-scales over the grid
static void encode_iq4_xs_block(const float *xb, uint8_t *out) {
    float dg[8];
    float dmax = 0;
    for (int g = 0; g < 8; g++) {
        float amax = 0;
        for (int i = 0; i < 32; i++) amax = std::max(amax, std::fabs(xb[32 * g + i]));
        dg[g] = amax / 127.0f;
        dmax = std::max(dmax, dg[g]);
    }
    float d = dmax / 31.0f;
    float dd = d == 0 ? 1.0f : d;
    uint16_t d16 = f32_to_f16(d);
    std::memcpy(out, &d16, 2);
    uint16_t sh = 0;
    uint8_t sl[4] = {0, 0, 0, 0};
    int ls[8];
    for (int g = 0; g < 8; g++) {
        int l = std::clamp((int)nearbyintf(dg[g] / dd), 1, 31) + 32;  // 0..63
        ls[g] = l;
        sh |= (uint16_t)(((l >> 4) & 3) << (2 * g));
        if (g % 2 == 0) sl[g / 2] |= (uint8_t)(l & 0xF);
        else            sl[g / 2] |= (uint8_t)((l & 0xF) << 4);
    }
    std::memcpy(out + 2, &sh, 2);
    std::memcpy(out + 4, sl, 4);
    for (int g = 0; g < 8; g++) {
        float dl = d * (ls[g] - 32);
        float sd = dl == 0 ? 1.0f : dl;
        for (int i = 0; i < 16; i++) {
            uint8_t lo = iq4_nearest(xb[32 * g + i] / sd);
            uint8_t hi = iq4_nearest(xb[32 * g + 16 + i] / sd);
            out[8 + 16 * g + i] = (uint8_t)(lo | (hi << 4));
        }
    }
}

}  // namespace

extern "C" {

// tag 0 = IQ4_NL (32-elem blocks, 18B), 1 = IQ4_XS (256-elem, 136B).
// n_blk counts blocks of the tag's block size.  Returns block bytes.
int lk_encode_iq4(int tag, const float *x, uint8_t *out, int64_t n_blk,
                  int n_threads) {
    const int elems = tag == 0 ? 32 : QK_K;
    const int bytes = tag == 0 ? 18 : 136;
    auto fn = tag == 0 ? encode_iq4_nl_block : encode_iq4_xs_block;
    if (tag != 0 && tag != 1) return 0;
    if (n_threads < 1) n_threads = 1;
    int nt = (int)std::min<int64_t>(n_threads, std::max<int64_t>(n_blk, 1));
    auto work = [&](int64_t lo, int64_t hi) {
        for (int64_t b = lo; b < hi; b++)
            fn(x + b * elems, out + b * bytes);
    };
    if (nt <= 1) {
        work(0, n_blk);
    } else {
        std::vector<std::thread> th;
        int64_t per = (n_blk + nt - 1) / nt;
        for (int t = 0; t < nt; t++) {
            int64_t lo = t * per, hi = std::min<int64_t>(n_blk, lo + per);
            if (lo >= hi) break;
            th.emplace_back(work, lo, hi);
        }
        for (auto &t : th) t.join();
    }
    return bytes;
}

}  // extern "C"
