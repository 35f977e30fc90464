// Native runtime library for mayamatchmovesolver_tpu.
//
// C++ counterpart of the reference's native image/distortion engine
// (ref: lib/cppbind/mmlens/src/distortion_process.rs:26-70 rayon
// scanline-parallel ST-map computation; tools/lensdistortion CLI;
// lib/rust/mmimage EXR write): a thread-pooled ST-map generator for the
// 3DE classic and radial-deg4 lens models plus an uncompressed
// scanline EXR writer.  Exposed with a plain C ABI for ctypes binding
// (mayamatchmovesolver_tpu/native.py).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

struct CameraPars {
    double fbw_cm;
    double fbh_cm;
    double lco_x_cm;
    double lco_y_cm;
    double pixel_aspect;
};

struct Vec2 {
    double x;
    double y;
};

// ---------------------------------------------------------------------------
// 3DE classic LD model (degree-2 anamorphic + degree-4 radial mixed).
// Same published math the reference wraps via ldpk
// (ref: distortion_structs.h Distortion3deClassic).
struct Classic {
    double ld, sq, cx, cy, qu;

    Vec2 undistort(Vec2 p) const {
        const double cxx = ld / sq;
        const double cxy = (ld + cx) / sq;
        const double cyx = ld + cy;
        const double cyy = ld;
        const double qs = qu / sq;
        const double x2 = p.x * p.x, y2 = p.y * p.y;
        const double x4 = x2 * x2, y4 = y2 * y2, xy2 = x2 * y2;
        return Vec2{
            p.x * (1.0 + cxx * x2 + cxy * y2 + qs * x4 + 2.0 * qs * xy2 +
                   qs * y4),
            p.y * (1.0 + cyx * x2 + cyy * y2 + qu * x4 + 2.0 * qu * xy2 +
                   qu * y4)};
    }
};

// 3DE4 Radial Standard Degree 4 with decentering + cylindric bending
// (ref: distortion_structs.h Distortion3deRadialStdDeg4).
struct RadialDeg4 {
    double c2, u2, v2, c4, u4, v4, phi_deg, bending;

    void cylindric(double m[4]) const {
        const double q = std::sqrt(1.0 + bending);
        const double c = std::cos(phi_deg * M_PI / 180.0);
        const double s = std::sin(phi_deg * M_PI / 180.0);
        m[0] = c * c * q + s * s / q;
        m[1] = (q - 1.0 / q) * c * s;
        m[2] = m[1];
        m[3] = c * c / q + s * s * q;
    }

    Vec2 core(Vec2 p) const {
        const double x = p.x, y = p.y;
        const double x2 = x * x, y2 = y * y, xy = x * y;
        const double r2 = x2 + y2, r4 = r2 * r2;
        const double radial = 1.0 + c2 * r2 + c4 * r4;
        return Vec2{
            x * radial + (r2 + 2.0 * x2) * (u2 + u4 * r2) +
                2.0 * xy * (v2 + v4 * r2),
            y * radial + (r2 + 2.0 * y2) * (v2 + v4 * r2) +
                2.0 * xy * (u2 + u4 * r2)};
    }

    Vec2 undistort(Vec2 p) const {
        double m[4];
        cylindric(m);
        const Vec2 q = core(p);
        return Vec2{m[0] * q.x + m[1] * q.y, m[2] * q.x + m[3] * q.y};
    }
};

// Fixed-point inversion (distort direction), identical scheme to the
// ldpk map_inverse loop the reference relies on.
template <class Model>
Vec2 fixed_point_inverse(const Model& model, Vec2 q, int iterations) {
    Vec2 f0 = model.undistort(q);
    Vec2 p{q.x - (f0.x - q.x), q.y - (f0.y - q.y)};
    for (int i = 0; i < iterations; ++i) {
        Vec2 f = model.undistort(p);
        p.x += q.x - f.x;
        p.y += q.y - f.y;
    }
    return p;
}

// For RadialDeg4 the distort direction inverts the cylindric matrix
// first (ref: Distortion3deRadialStdDeg4::map_inverse).
Vec2 radial_distort(const RadialDeg4& model, Vec2 q, int iterations) {
    double m[4];
    model.cylindric(m);
    const double det = m[0] * m[3] - m[1] * m[2];
    const double inv[4] = {m[3] / det, -m[1] / det, -m[2] / det,
                           m[0] / det};
    Vec2 target{inv[0] * q.x + inv[1] * q.y, inv[2] * q.x + inv[3] * q.y};
    // Invert only the polynomial core.
    Vec2 f0 = model.core(target);
    Vec2 p{target.x - (f0.x - target.x), target.y - (f0.y - target.y)};
    for (int i = 0; i < iterations; ++i) {
        Vec2 f = model.core(p);
        p.x += target.x - f.x;
        p.y += target.y - f.y;
    }
    return p;
}

// 3DE4 Anamorphic Standard Degree 4 with lens rotation + squeeze x/y
// (+ optional rescale), matching the JAX implementation in
// models/tde.py (ref: distortion_structs.h
// Distortion3deAnamorphicStdDeg4[Rescaled]).
struct AnamorphicDeg4 {
    double cx02, cy02, cx22, cy22;
    double cx04, cy04, cx24, cy24, cx44, cy44;
    double rotation_deg, squeeze_x, squeeze_y;
    double pixel_aspect;
    double rescale;  // 1.0 = plain (non-rescaled) variant

    struct Mat2 {
        double m00, m01, m10, m11;
        Vec2 apply(Vec2 p) const {
            return Vec2{m00 * p.x + m01 * p.y, m10 * p.x + m11 * p.y};
        }
        Mat2 inverse() const {
            const double det = m00 * m11 - m01 * m10;
            return Mat2{m11 / det, -m01 / det, -m10 / det, m00 / det};
        }
        Mat2 mul(const Mat2& o) const {
            return Mat2{m00 * o.m00 + m01 * o.m10,
                        m00 * o.m01 + m01 * o.m11,
                        m10 * o.m00 + m11 * o.m10,
                        m10 * o.m01 + m11 * o.m11};
        }
    };

    // A = R(rot) @ Sx @ Sy [@ Rescale] @ Pa ;  B = Pa [@ Rescale] @ R.
    void matrices(Mat2* a, Mat2* b) const {
        const double c = std::cos(rotation_deg * M_PI / 180.0);
        const double s = std::sin(rotation_deg * M_PI / 180.0);
        const Mat2 rot{c, -s, s, c};
        const Mat2 sx{squeeze_x, 0.0, 0.0, 1.0};
        const Mat2 sy{1.0, 0.0, 0.0, squeeze_y};
        const Mat2 pa{pixel_aspect, 0.0, 0.0, 1.0};
        const Mat2 rs{rescale, 0.0, 0.0, 1.0};
        *a = rot.mul(sx).mul(sy).mul(rs).mul(pa);
        *b = pa.mul(rs).mul(rot);
    }

    Vec2 core(Vec2 p) const {
        const double x = p.x, y = p.y;
        const double x2 = x * x, y2 = y * y;
        const double r2 = x2 + y2, r4 = r2 * r2;
        const double safe_r2 = std::max(r2, 1e-30);
        const double cos2 = (x2 - y2) / safe_r2;
        const double cos4 = 2.0 * cos2 * cos2 - 1.0;
        const double fx = 1.0 + cx02 * r2 + cx04 * r4 +
                          cos2 * (cx22 * r2 + cx24 * r4) +
                          cos4 * cx44 * r4;
        const double fy = 1.0 + cy02 * r2 + cy04 * r4 +
                          cos2 * (cy22 * r2 + cy24 * r4) +
                          cos4 * cy44 * r4;
        return Vec2{x * fx, y * fy};
    }

    Vec2 undistort(Vec2 p) const {
        Mat2 a, b;
        matrices(&a, &b);
        return a.apply(core(b.inverse().apply(p)));
    }

    Vec2 distort(Vec2 q, int iterations) const {
        Mat2 a, b;
        matrices(&a, &b);
        const Vec2 target = a.inverse().apply(q);
        Vec2 f0 = core(target);
        Vec2 p{target.x - (f0.x - target.x), target.y - (f0.y - target.y)};
        for (int i = 0; i < iterations; ++i) {
            Vec2 f = core(p);
            p.x += target.x - f.x;
            p.y += target.y - f.y;
        }
        return b.apply(p);
    }
};

inline Vec2 unit_to_dn(const CameraPars& cam, double radius, Vec2 u) {
    return Vec2{((u.x - 0.5) * cam.fbw_cm - cam.lco_x_cm) / radius,
                ((u.y - 0.5) * cam.fbh_cm - cam.lco_y_cm) / radius};
}

inline Vec2 dn_to_unit(const CameraPars& cam, double radius, Vec2 p) {
    return Vec2{(p.x * radius + cam.fbw_cm * 0.5 + cam.lco_x_cm) / cam.fbw_cm,
                (p.y * radius + cam.fbh_cm * 0.5 + cam.lco_y_cm) / cam.fbh_cm};
}

// Scanline-chunked multithreaded map computation (the rayon
// equivalent; ref: distortion_process.rs:57-120 disjoint chunks).
template <class Fn>
void parallel_rows(int height, int n_threads, Fn fn) {
    if (n_threads <= 0) {
        n_threads = static_cast<int>(
            std::max(1u, std::thread::hardware_concurrency()));
    }
    std::atomic<int> next_row{0};
    auto worker = [&]() {
        for (;;) {
            int y = next_row.fetch_add(4);
            if (y >= height) return;
            int end = std::min(y + 4, height);
            for (int row = y; row < end; ++row) fn(row);
        }
    };
    std::vector<std::thread> threads;
    for (int i = 0; i < n_threads; ++i) threads.emplace_back(worker);
    for (auto& t : threads) t.join();
}

template <class Model, class DistortFn>
void stmap_impl(const Model& model, DistortFn distort_fn,
                const CameraPars& cam, int width, int height,
                int direction, int n_threads, float* out_rgba) {
    const double radius =
        std::sqrt(cam.fbw_cm * cam.fbw_cm + cam.fbh_cm * cam.fbh_cm) / 2.0;
    parallel_rows(height, n_threads, [&](int row) {
        float* dst = out_rgba + static_cast<size_t>(row) * width * 4;
        const double y_unit = (row + 0.5) / height;
        for (int col = 0; col < width; ++col) {
            const double x_unit = (col + 0.5) / width;
            Vec2 dn = unit_to_dn(cam, radius, Vec2{x_unit, y_unit});
            Vec2 out_dn = direction == 0 ? model.undistort(dn)
                                         : distort_fn(model, dn);
            Vec2 out_unit = dn_to_unit(cam, radius, out_dn);
            dst[col * 4 + 0] = static_cast<float>(out_unit.x);
            dst[col * 4 + 1] = static_cast<float>(out_unit.y);
            dst[col * 4 + 2] = 0.0f;
            dst[col * 4 + 3] = 1.0f;
        }
    });
}

// ---------------------------------------------------------------------------
// PIZ Huffman codec (OpenEXR ImfHuf.cpp semantics) — the hot half of
// the PIZ pipeline; the wavelet/bitmap stages stay NumPy-vectorized in
// io/_piz.py.  Bit-level layout identical to the Python implementation
// (io/_piz.py) and the published format: 20-byte header
// [im, iM, tableLength, nBits, 0], 6-bit packed code-length table with
// zero-run codes 59-63, canonical codes, run-length pseudo-symbol iM.

namespace huf {

constexpr int ENCBITS = 16;
constexpr int DECBITS = 14;
constexpr int ENCSIZE = (1 << ENCBITS) + 1;
constexpr int DECSIZE = 1 << DECBITS;
constexpr int DECMASK = DECSIZE - 1;
constexpr int SHORT_ZEROCODE_RUN = 59;
constexpr int LONG_ZEROCODE_RUN = 63;
constexpr int SHORTEST_LONG_RUN = 2 + LONG_ZEROCODE_RUN - SHORT_ZEROCODE_RUN;
constexpr int LONGEST_LONG_RUN = 255 + SHORTEST_LONG_RUN;

inline int code_len(uint64_t packed) { return int(packed & 63); }
inline uint64_t code_bits(uint64_t packed) { return packed >> 6; }

void canonical_code_table(std::vector<uint64_t>& hcode) {
    uint64_t n[59] = {0};
    for (int i = 0; i < ENCSIZE; ++i) n[hcode[i] & 63] += 1;
    uint64_t c = 0;
    for (int i = 58; i > 0; --i) {
        uint64_t nc = (c + n[i]) >> 1;
        n[i] = c;
        c = nc;
    }
    for (int i = 0; i < ENCSIZE; ++i) {
        uint64_t l = hcode[i] & 63;
        if (l > 0) hcode[i] = l | (n[l]++ << 6);
    }
}

struct BitWriter {
    std::vector<uint8_t> out;
    uint64_t c = 0;
    int lc = 0;
    void write(int nbits, uint64_t v) {
        c = (c << nbits) | (v & ((1ull << nbits) - 1));
        lc += nbits;
        while (lc >= 8) {
            lc -= 8;
            out.push_back(uint8_t((c >> lc) & 0xFF));
        }
        c &= (1ull << lc) - 1;
    }
    void write_code(uint64_t packed) {
        write(code_len(packed), code_bits(packed));
    }
    void flush() {
        if (lc) out.push_back(uint8_t((c << (8 - lc)) & 0xFF));
    }
};

struct BitReader {
    const uint8_t* data;
    long len;
    long pos = 0;
    uint64_t c = 0;
    int lc = 0;
    bool fail = false;
    uint64_t read(int nbits) {
        while (lc < nbits) {
            if (pos >= len) {
                fail = true;
                return 0;
            }
            c = (c << 8) | data[pos++];
            lc += 8;
        }
        lc -= nbits;
        uint64_t v = (c >> lc) & ((1ull << nbits) - 1);
        c &= (1ull << lc) - 1;
        return v;
    }
};

// Build canonical code lengths via the reference's heap merge with
// chained symbol lists (ImfHuf hufBuildEncTable semantics).
bool build_enc_table(std::vector<uint64_t>& freq, int& im, int& iM,
                     std::vector<uint64_t>& hcode) {
    im = 0;
    while (im < ENCSIZE && !freq[im]) ++im;
    if (im == ENCSIZE) {
        im = 0;
        freq[0] = 1;
    }
    iM = ENCSIZE - 1;
    while (iM > 0 && !freq[iM]) --iM;
    iM = std::min(iM + 1, ENCSIZE - 1);
    freq[iM] += 1;  // run-length pseudo-symbol

    using Node = std::pair<uint64_t, int>;  // (freq, symbol)
    std::vector<Node> heap;
    std::vector<int> hlink(ENCSIZE);
    for (int i = im; i <= iM; ++i) {
        if (freq[i]) {
            heap.emplace_back(freq[i], i);
            hlink[i] = i;
        }
    }
    auto cmp = [](const Node& a, const Node& b) { return a > b; };
    std::make_heap(heap.begin(), heap.end(), cmp);
    std::vector<uint64_t> scode(ENCSIZE, 0);
    while (heap.size() > 1) {
        std::pop_heap(heap.begin(), heap.end(), cmp);
        Node mm = heap.back();
        heap.pop_back();
        std::pop_heap(heap.begin(), heap.end(), cmp);
        Node m = heap.back();
        heap.pop_back();
        heap.emplace_back(m.first + mm.first, m.second);
        std::push_heap(heap.begin(), heap.end(), cmp);
        for (int j = m.second;; j = hlink[j]) {
            if (++scode[j] > 58) return false;
            if (hlink[j] == j) {
                hlink[j] = mm.second;
                break;
            }
        }
        for (int j = mm.second;; j = hlink[j]) {
            if (++scode[j] > 58) return false;
            if (hlink[j] == j) break;
        }
    }
    canonical_code_table(scode);
    hcode = std::move(scode);
    return true;
}

void pack_enc_table(const std::vector<uint64_t>& hcode, int im, int iM,
                    BitWriter& w) {
    int i = im;
    while (i <= iM) {
        int l = code_len(hcode[i]);
        if (l == 0) {
            int zerun = 1;
            while (i + zerun <= iM && zerun < LONGEST_LONG_RUN &&
                   code_len(hcode[i + zerun]) == 0) {
                ++zerun;
            }
            if (zerun >= SHORTEST_LONG_RUN) {
                w.write(6, LONG_ZEROCODE_RUN);
                w.write(8, zerun - SHORTEST_LONG_RUN);
            } else if (zerun >= 2) {
                w.write(6, SHORT_ZEROCODE_RUN + zerun - 2);
            } else {
                w.write(6, 0);
                zerun = 1;
            }
            i += zerun;
        } else {
            w.write(6, uint64_t(l));
            ++i;
        }
    }
    w.flush();
}

bool unpack_enc_table(BitReader& r, int im, int iM,
                      std::vector<uint64_t>& hcode) {
    hcode.assign(ENCSIZE, 0);
    int i = im;
    while (i <= iM) {
        uint64_t l = r.read(6);
        if (r.fail) return false;
        if (l == LONG_ZEROCODE_RUN) {
            long zerun = long(r.read(8)) + SHORTEST_LONG_RUN;
            if (r.fail || i + zerun > iM + 1) return false;
            i += zerun;
        } else if (l >= SHORT_ZEROCODE_RUN) {
            long zerun = l - SHORT_ZEROCODE_RUN + 2;
            if (i + zerun > iM + 1) return false;
            i += zerun;
        } else {
            hcode[i++] = l;
        }
    }
    canonical_code_table(hcode);
    return true;
}

struct DecEntry {
    int len = 0;
    int lit = 0;
    std::vector<int> longs;
};

bool build_dec_table(const std::vector<uint64_t>& hcode, int im, int iM,
                     std::vector<DecEntry>& dec) {
    dec.assign(DECSIZE, DecEntry{});
    for (int sym = im; sym <= iM; ++sym) {
        int l = code_len(hcode[sym]);
        uint64_t code = code_bits(hcode[sym]);
        if (l == 0) continue;
        if (code >> l) return false;
        if (l > DECBITS) {
            DecEntry& e = dec[code >> (l - DECBITS)];
            if (e.len) return false;
            e.longs.push_back(sym);
        } else {
            uint64_t base = code << (DECBITS - l);
            for (uint64_t k = 0; k < (1ull << (DECBITS - l)); ++k) {
                DecEntry& e = dec[base + k];
                if (e.len || !e.longs.empty()) return false;
                e.len = l;
                e.lit = sym;
            }
        }
    }
    return true;
}

long encode(const std::vector<uint64_t>& hcode, const uint16_t* in,
            long n, int rlc, BitWriter& w) {
    auto send = [&](int sym, int run) {
        uint64_t packed = hcode[sym];
        int sl = code_len(packed);
        int rl = code_len(hcode[rlc]);
        if (run && sl + rl + 8 < sl * (run + 1)) {
            w.write_code(packed);
            w.write_code(hcode[rlc]);
            w.write(8, uint64_t(run));
        } else {
            for (int k = 0; k <= run; ++k) w.write_code(packed);
        }
    };
    if (n == 0) return 0;
    int s = in[0];
    int run = 0;
    for (long i = 1; i < n; ++i) {
        if (in[i] == s && run < 255) {
            ++run;
        } else {
            send(s, run);
            s = in[i];
            run = 0;
        }
    }
    send(s, run);
    return long(w.out.size()) * 8 + w.lc;
}

// Decode nbits of Huffman data into exactly n_out symbols.
bool decode(const std::vector<uint64_t>& hcode,
            const std::vector<DecEntry>& dec, const uint8_t* in,
            long nbits, int rlc, uint16_t* out, long n_out) {
    long oi = 0;
    uint64_t c = 0;
    int lc = 0;
    const long n_bytes = (nbits + 7) / 8;
    long pos = 0;

    auto emit = [&](int sym) -> bool {
        if (sym == rlc) {
            if (lc < 8) {
                if (pos >= n_bytes) return false;
                c = (c << 8) | in[pos++];
                lc += 8;
            }
            lc -= 8;
            int cs = int((c >> lc) & 0xFF);
            c &= (1ull << lc) - 1;
            if (oi == 0 || oi + cs > n_out) return false;
            uint16_t prev = out[oi - 1];
            for (int k = 0; k < cs; ++k) out[oi++] = prev;
        } else {
            if (oi >= n_out) return false;
            out[oi++] = uint16_t(sym);
        }
        return true;
    };

    while (pos < n_bytes) {
        c = (c << 8) | in[pos++];
        lc += 8;
        while (lc >= DECBITS) {
            const DecEntry& e = dec[(c >> (lc - DECBITS)) & DECMASK];
            if (e.len) {
                lc -= e.len;
                c &= (1ull << lc) - 1;
                if (!emit(e.lit)) return false;
            } else {
                if (e.longs.empty()) return false;
                bool matched = false;
                for (int sym : e.longs) {
                    int l = code_len(hcode[sym]);
                    while (lc < l && pos < n_bytes) {
                        c = (c << 8) | in[pos++];
                        lc += 8;
                    }
                    if (lc >= l &&
                        code_bits(hcode[sym]) ==
                            ((c >> (lc - l)) & ((1ull << l) - 1))) {
                        lc -= l;
                        c &= (1ull << lc) - 1;
                        if (!emit(sym)) return false;
                        matched = true;
                        break;
                    }
                }
                if (!matched) return false;
            }
        }
    }
    int pad = int((8 - nbits) & 7);
    c >>= pad;
    lc -= pad;
    while (lc > 0) {
        const DecEntry& e = dec[(c << (DECBITS - lc)) & DECMASK];
        if (e.len && e.len <= lc) {
            lc -= e.len;
            c &= (1ull << lc) - 1;
            if (!emit(e.lit)) return false;
        } else {
            return false;
        }
    }
    return oi == n_out;
}

inline void put_u32(std::vector<uint8_t>& v, uint32_t x) {
    v.push_back(x & 0xFF);
    v.push_back((x >> 8) & 0xFF);
    v.push_back((x >> 16) & 0xFF);
    v.push_back((x >> 24) & 0xFF);
}

inline uint32_t get_u32(const uint8_t* p) {
    return uint32_t(p[0]) | (uint32_t(p[1]) << 8) |
           (uint32_t(p[2]) << 16) | (uint32_t(p[3]) << 24);
}

}  // namespace huf

}  // namespace

extern "C" {

// PIZ Huffman compress: writes [im iM tableLength nBits 0][table][bits]
// into out (capacity out_cap); returns payload length or -1.
long mmtpu_huf_compress(const uint16_t* data, long n, uint8_t* out,
                        long out_cap) {
    if (n == 0) return 0;
    std::vector<uint64_t> freq(huf::ENCSIZE, 0);
    for (long i = 0; i < n; ++i) freq[data[i]] += 1;
    int im = 0, iM = 0;
    std::vector<uint64_t> hcode;
    if (!huf::build_enc_table(freq, im, iM, hcode)) return -1;
    huf::BitWriter table;
    huf::pack_enc_table(hcode, im, iM, table);
    huf::BitWriter bits;
    long nbits = huf::encode(hcode, data, n, iM, bits);
    bits.flush();
    std::vector<uint8_t> blob;
    huf::put_u32(blob, uint32_t(im));
    huf::put_u32(blob, uint32_t(iM));
    huf::put_u32(blob, uint32_t(table.out.size()));
    huf::put_u32(blob, uint32_t(nbits));
    huf::put_u32(blob, 0);
    blob.insert(blob.end(), table.out.begin(), table.out.end());
    blob.insert(blob.end(), bits.out.begin(), bits.out.end());
    if (long(blob.size()) > out_cap) return -1;
    std::memcpy(out, blob.data(), blob.size());
    return long(blob.size());
}

// PIZ Huffman uncompress; returns 0 on success.
int mmtpu_huf_uncompress(const uint8_t* blob, long blob_len,
                         uint16_t* out, long n_out) {
    if (n_out == 0) return 0;
    if (blob_len < 20) return 1;
    int im = int(huf::get_u32(blob));
    int iM = int(huf::get_u32(blob + 4));
    long nbits = long(huf::get_u32(blob + 12));
    if (im < 0 || im >= huf::ENCSIZE || iM < 0 || iM >= huf::ENCSIZE)
        return 2;
    huf::BitReader r{blob + 20, blob_len - 20};
    std::vector<uint64_t> hcode;
    if (!huf::unpack_enc_table(r, im, iM, hcode)) return 3;
    std::vector<huf::DecEntry> dec;
    if (!huf::build_dec_table(hcode, im, iM, dec)) return 4;
    long table_bytes = r.pos;  // bytes consumed by the table reader
    const uint8_t* bits = blob + 20 + table_bytes;
    long bits_len = blob_len - 20 - table_bytes;
    if ((nbits + 7) / 8 > bits_len) return 5;
    if (!huf::decode(hcode, dec, bits, nbits, iM, out, n_out)) return 6;
    return 0;
}

// lens5: [distortion, anamorphic_squeeze, curvature_x, curvature_y,
//         quartic]; cam5: [fbw_cm, fbh_cm, lco_x_cm, lco_y_cm,
//         pixel_aspect]; direction: 0=undistort 1=distort.
void mmtpu_stmap_classic(const double* lens5, const double* cam5,
                         int width, int height, int direction,
                         int n_threads, float* out_rgba) {
    Classic model{lens5[0], lens5[1], lens5[2], lens5[3], lens5[4]};
    CameraPars cam{cam5[0], cam5[1], cam5[2], cam5[3], cam5[4]};
    stmap_impl(
        model,
        [](const Classic& m, Vec2 q) {
            return fixed_point_inverse(m, q, 20);
        },
        cam, width, height, direction, n_threads, out_rgba);
}

// lens8: [c2, u2, v2, c4, u4, v4, phi_deg, bending].
void mmtpu_stmap_radial_deg4(const double* lens8, const double* cam5,
                             int width, int height, int direction,
                             int n_threads, float* out_rgba) {
    RadialDeg4 model{lens8[0], lens8[1], lens8[2], lens8[3],
                     lens8[4], lens8[5], lens8[6], lens8[7]};
    CameraPars cam{cam5[0], cam5[1], cam5[2], cam5[3], cam5[4]};
    stmap_impl(
        model,
        [](const RadialDeg4& m, Vec2 q) {
            return radial_distort(m, q, 20);
        },
        cam, width, height, direction, n_threads, out_rgba);
}

// lens14: [cx02, cy02, cx22, cy22, cx04, cy04, cx24, cy24, cx44, cy44,
//          rotation_deg, squeeze_x, squeeze_y, rescale] — pass
// rescale=1 for the non-rescaled variant.  Pixel aspect comes from
// cam5[4] (the anamorphic extender chain consumes it; ref:
// distortion_structs.h Distortion3deAnamorphicStdDeg4).
void mmtpu_stmap_anamorphic_deg4(const double* lens14, const double* cam5,
                                 int width, int height, int direction,
                                 int n_threads, float* out_rgba) {
    AnamorphicDeg4 model{lens14[0], lens14[1], lens14[2], lens14[3],
                         lens14[4], lens14[5], lens14[6], lens14[7],
                         lens14[8], lens14[9], lens14[10], lens14[11],
                         lens14[12], cam5[4], lens14[13]};
    CameraPars cam{cam5[0], cam5[1], cam5[2], cam5[3], cam5[4]};
    stmap_impl(
        model,
        [](const AnamorphicDeg4& m, Vec2 q) { return m.distort(q, 20); },
        cam, width, height, direction, n_threads, out_rgba);
}

// Minimal uncompressed scanline EXR writer (RGBA float32), mirroring
// lib/rust/mmimage write (ref: lib/rust/mmimage/src/lib.rs:142).
// Returns 0 on success.
int mmtpu_exr_write_rgba(const char* path, const float* rgba, int width,
                         int height) {
    FILE* f = std::fopen(path, "wb");
    if (!f) return 1;

    auto put = [&](const void* data, size_t n) {
        std::fwrite(data, 1, n, f);
    };
    auto put_i32 = [&](int32_t v) { put(&v, 4); };
    auto put_u64 = [&](uint64_t v) { put(&v, 8); };
    auto put_str = [&](const char* s) { put(s, std::strlen(s) + 1); };

    const unsigned char magic[] = {0x76, 0x2f, 0x31, 0x01};
    put(magic, 4);
    put_i32(2);  // version

    // channels attribute: A, B, G, R float32.
    std::string chlist;
    const char* names[] = {"A", "B", "G", "R"};
    for (const char* n : names) {
        chlist += n;
        chlist.push_back('\0');
        const int32_t ptype = 2;  // FLOAT
        chlist.append(reinterpret_cast<const char*>(&ptype), 4);
        chlist.append(4, '\0');  // pLinear + reserved
        const int32_t one = 1;
        chlist.append(reinterpret_cast<const char*>(&one), 4);
        chlist.append(reinterpret_cast<const char*>(&one), 4);
    }
    chlist.push_back('\0');

    auto put_attr = [&](const char* name, const char* type,
                        const std::string& payload) {
        put_str(name);
        put_str(type);
        put_i32(static_cast<int32_t>(payload.size()));
        put(payload.data(), payload.size());
    };

    int32_t box[4] = {0, 0, width - 1, height - 1};
    std::string box_s(reinterpret_cast<char*>(box), 16);
    const unsigned char comp = 0;  // NO_COMPRESSION
    const unsigned char line_order = 0;
    float paspect = 1.0f, swc[2] = {0.0f, 0.0f}, sww = 1.0f;

    put_attr("channels", "chlist", chlist);
    put_attr("compression", "compression",
             std::string(reinterpret_cast<const char*>(&comp), 1));
    put_attr("dataWindow", "box2i", box_s);
    put_attr("displayWindow", "box2i", box_s);
    put_attr("lineOrder", "lineOrder",
             std::string(reinterpret_cast<const char*>(&line_order), 1));
    put_attr("pixelAspectRatio", "float",
             std::string(reinterpret_cast<char*>(&paspect), 4));
    put_attr("screenWindowCenter", "v2f",
             std::string(reinterpret_cast<char*>(swc), 8));
    put_attr("screenWindowWidth", "float",
             std::string(reinterpret_cast<char*>(&sww), 4));
    std::fputc(0, f);  // end of header

    const uint64_t table_pos = std::ftell(f);
    const uint64_t first_chunk = table_pos + 8ull * height;
    const uint64_t bytes_per_line = 4ull * 4ull * width;
    for (int y = 0; y < height; ++y) {
        put_u64(first_chunk + y * (8 + bytes_per_line));
    }
    std::vector<float> line(4 * width);
    for (int y = 0; y < height; ++y) {
        put_i32(y);
        put_i32(static_cast<int32_t>(bytes_per_line));
        const float* src = rgba + static_cast<size_t>(y) * width * 4;
        // Channel-planar per scanline, alphabetical: A, B, G, R.
        for (int c = 0; c < 4; ++c) {
            static const int swizzle[4] = {3, 2, 1, 0};  // A B G R
            for (int x = 0; x < width; ++x) {
                line[c * width + x] = src[x * 4 + swizzle[c]];
            }
        }
        put(line.data(), bytes_per_line * 1);
    }
    std::fclose(f);
    return 0;
}

int mmtpu_version() { return 1; }

}  // extern "C"
