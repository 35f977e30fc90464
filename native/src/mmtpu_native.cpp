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

}  // namespace

extern "C" {

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
