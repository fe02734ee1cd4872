// Oriented-box geometry for the native tracker cores.
//
// Mirrors the device kernels: wrap_angle / obb_corners
// (boxmot_tpu/ops/geometry.py:99-132), rotated IoU via convex polygon
// clipping (ops/rotated_iou.py — here a scalar Sutherland-Hodgman
// instead of the fixed-shape device formulation), and the 4-candidate
// OBB measurement alignment (motion/kalman.align_obb_to_ref).

#ifndef BOXMOT_OBB_COMMON_HPP
#define BOXMOT_OBB_COMMON_HPP

#include <algorithm>
#include <cmath>
#include <vector>

namespace boxmot {

inline float wrap_angle(float a) {
    // wrap to [-pi, pi) — matches ops/geometry.wrap_angle
    const float two_pi = 2.0f * static_cast<float>(M_PI);
    return a - two_pi * std::floor((a + static_cast<float>(M_PI)) / two_pi);
}

// (cx, cy, w, h, angle) -> 4 corners, cv2.boxPoints order
inline void obb_corners(const float* b, float out[4][2]) {
    float ca = std::cos(b[4]), sa = std::sin(b[4]);
    float hw = b[2] / 2.0f, hh = b[3] / 2.0f;
    const float lx[4] = {-hw, -hw, hw, hw};
    const float ly[4] = {hh, -hh, -hh, hh};
    for (int i = 0; i < 4; ++i) {
        out[i][0] = b[0] + lx[i] * ca - ly[i] * sa;
        out[i][1] = b[1] + lx[i] * sa + ly[i] * ca;
    }
}

// convex polygon intersection area of two rotated rects
inline float rotated_inter_area(const float* a, const float* b) {
    float ca[4][2], cb[4][2];
    obb_corners(a, ca);
    obb_corners(b, cb);
    std::vector<std::pair<float, float>> poly;
    poly.reserve(8);
    for (int i = 0; i < 4; ++i) poly.emplace_back(ca[i][0], ca[i][1]);
    // clip by each edge of b; b's corners wind clockwise in image coords
    // (y down), which is positive-cross winding in (x, y) math
    for (int e = 0; e < 4 && !poly.empty(); ++e) {
        float x1 = cb[e][0], y1 = cb[e][1];
        float x2 = cb[(e + 1) % 4][0], y2 = cb[(e + 1) % 4][1];
        float ex = x2 - x1, ey = y2 - y1;
        std::vector<std::pair<float, float>> next;
        next.reserve(poly.size() + 4);
        size_t m = poly.size();
        for (size_t i = 0; i < m; ++i) {
            auto [px, py] = poly[i];
            auto [qx, qy] = poly[(i + 1) % m];
            float dp = ex * (py - y1) - ey * (px - x1);
            float dq = ex * (qy - y1) - ey * (qx - x1);
            bool pin = dp >= 0.0f, qin = dq >= 0.0f;
            if (pin) next.emplace_back(px, py);
            if (pin != qin) {
                float t = dp / (dp - dq);
                next.emplace_back(px + t * (qx - px), py + t * (qy - py));
            }
        }
        poly = std::move(next);
    }
    if (poly.size() < 3) return 0.0f;
    double area = 0.0;
    for (size_t i = 0; i < poly.size(); ++i) {
        auto [px, py] = poly[i];
        auto [qx, qy] = poly[(i + 1) % poly.size()];
        area += static_cast<double>(px) * qy - static_cast<double>(qx) * py;
    }
    return static_cast<float>(std::abs(area) / 2.0);
}

inline float iou_obb(const float* a, const float* b) {
    float inter = rotated_inter_area(a, b);
    float ua = a[2] * a[3] + b[2] * b[3] - inter;
    return inter / std::max(ua, 1e-12f);
}

// Resolve the 4-way rotated-rect parameterization against a reference
// state (kalman.align_obb_to_ref: minimize |wrapped angle delta| +
// size_weight * log-size difference).  meas/ref: [cx, cy, w, h, theta].
inline void align_obb_to_ref(const float* meas, const float* ref, float* out,
                             float size_weight = 0.05f) {
    const float eps = 1e-6f;
    float w = std::max(meas[2], eps), h = std::max(meas[3], eps);
    float ref_w = std::max(ref[2], eps), ref_h = std::max(ref[3], eps);
    float th = meas[4], ref_th = ref[4];
    const float cw[4] = {w, w, h, h};
    const float ch[4] = {h, h, w, w};
    const float pi = static_cast<float>(M_PI);
    const float ct[4] = {th, th + pi, th + pi / 2, th - pi / 2};
    int best = 0;
    float best_cost = 1e30f, best_t = 0.0f;
    for (int k = 0; k < 4; ++k) {
        float aligned = ref_th + wrap_angle(ct[k] - ref_th);
        float cost = std::abs(aligned - ref_th) +
                     size_weight * (std::abs(std::log(cw[k] / ref_w)) +
                                    std::abs(std::log(ch[k] / ref_h)));
        if (cost < best_cost) {
            best_cost = cost;
            best = k;
            best_t = aligned;
        }
    }
    out[0] = meas[0];
    out[1] = meas[1];
    out[2] = cw[best];
    out[3] = ch[best];
    out[4] = best_t;
}

// Resolve the OBB parameterization ambiguity in XYSR measurement space
// (kalman.align_obb_xysr): candidates (r, th), (r, th+pi),
// (1/r, th+pi/2), (1/r, th-pi/2).  z/ref: [cx, cy, s, r, theta].
inline void align_obb_xysr(const float* z, const float* ref, float* out,
                           float size_weight = 0.05f) {
    const float eps = 1e-6f;
    float r = std::max(z[3], eps);
    float th = wrap_angle(z[4]);
    float ref_r = std::max(ref[3], eps);
    float ref_th = ref[4];
    const float pi = static_cast<float>(M_PI);
    const float cr[4] = {r, r, 1.0f / r, 1.0f / r};
    const float ct[4] = {th, th + pi, th + pi / 2, th - pi / 2};
    int best = 0;
    float best_cost = 1e30f, best_t = 0.0f;
    for (int k = 0; k < 4; ++k) {
        float aligned = ref_th + wrap_angle(ct[k] - ref_th);
        float cost = std::abs(aligned - ref_th) +
                     size_weight * std::abs(std::log(cr[k] / ref_r));
        if (cost < best_cost) {
            best_cost = cost;
            best = k;
            best_t = aligned;
        }
    }
    out[0] = z[0];
    out[1] = z[1];
    out[2] = std::max(z[2], eps);
    out[3] = std::max(cr[best], eps);
    out[4] = best_t;
}

// (cx, cy, w, h, theta) -> XYSR measurement [cx, cy, s, r, theta]
// (geometry.obb2xysr)
inline void obb_to_xysr(const float* b, float* z) {
    float w = std::max(b[2], 1e-6f);
    float h = std::max(b[3], 1e-6f);
    z[0] = b[0];
    z[1] = b[1];
    z[2] = w * h;
    z[3] = w / h;
    z[4] = b[4];
}

// XYSR(+theta) state -> (cx, cy, w, h, theta) (geometry.xysr2obb)
inline void xysr_to_obb(const float* s, float* box) {
    float w = std::sqrt(std::max(s[2] * s[3], 1e-12f));
    float h = s[2] / std::max(w, 1e-6f);
    box[0] = s[0];
    box[1] = s[1];
    box[2] = w;
    box[3] = h;
    box[4] = s[4];
}

}  // namespace boxmot

#endif  // BOXMOT_OBB_COMMON_HPP
