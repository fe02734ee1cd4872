// ECC camera-motion compensation on the CPU.
//
// Mirror of the device estimator in boxmot_tpu/motion/cmc.py
// (ecc_align: fixed-iteration Gauss-Newton on the Enhanced Correlation
// Coefficient, Evangelidis & Psarakis PAMI 2008) and of the reference's
// native CMC (boxmot/native/cpp/trackers/botsort/src/cmc.cpp, which
// wraps cv2-style findTransformECC): BGR->gray with OpenCV weights,
// half-pixel bilinear downscale, translation or euclidean warp.  The
// returned 2x3 warp maps previous-frame coordinates to current-frame
// coordinates with the translation rescaled to full resolution.

#ifndef BOXMOT_ECC_CMC_HPP
#define BOXMOT_ECC_CMC_HPP

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

namespace boxmot {

struct Warp2x3 {
    // row-major [[a, b, tx], [c, d, ty]]
    float m[6] = {1, 0, 0, 0, 1, 0};
    bool identity() const {
        return m[0] == 1 && m[1] == 0 && m[2] == 0 && m[3] == 0 && m[4] == 1 && m[5] == 0;
    }
};

class EccCmc {
  public:
    // mode: 0 = translation (reference default), 1 = euclidean
    explicit EccCmc(int mode = 0, int max_iter = 50, float scale = 0.15f)
        : mode_(mode), max_iter_(max_iter), scale_(scale) {}

    void reset() { prev_.clear(); }

    // img: (H, W, 3) BGR uint8.  Returns the prev->curr warp; identity
    // on the first frame (mirrors motion/cmc.py ECC.apply).
    Warp2x3 apply(const uint8_t* img, int64_t H, int64_t W) {
        Warp2x3 out;
        if (!img || H <= 0 || W <= 0) return out;
        int gh = std::max(static_cast<int>(H * scale_), 8);
        int gw = std::max(static_cast<int>(W * scale_), 8);
        std::vector<float> curr = gray_downscale(img, H, W, gh, gw);
        if (prev_.empty() || prev_h_ != gh || prev_w_ != gw) {
            prev_ = std::move(curr);
            prev_h_ = gh;
            prev_w_ = gw;
            return out;
        }
        out = align(prev_, curr, gh, gw);
        prev_ = std::move(curr);
        // rescale the translation to full resolution
        out.m[2] /= scale_;
        out.m[5] /= scale_;
        return out;
    }

  private:
    static float sample(const std::vector<float>& im, int h, int w, float y, float x) {
        y = std::min(std::max(y, 0.0f), static_cast<float>(h) - 1.001f);
        x = std::min(std::max(x, 0.0f), static_cast<float>(w) - 1.001f);
        int y0 = static_cast<int>(y), x0 = static_cast<int>(x);
        float wy = y - y0, wx = x - x0;
        const float* r0 = im.data() + static_cast<size_t>(y0) * w;
        const float* r1 = r0 + w;
        return r0[x0] * (1 - wy) * (1 - wx) + r0[x0 + 1] * (1 - wy) * wx +
               r1[x0] * wy * (1 - wx) + r1[x0 + 1] * wy * wx;
    }

    // BGR->gray (cv2 weights) then bilinear resize with half-pixel
    // centers (matches jax.image.resize linear)
    static std::vector<float> gray_downscale(const uint8_t* img, int64_t H, int64_t W,
                                             int gh, int gw) {
        std::vector<float> gray(static_cast<size_t>(H) * W);
        for (int64_t i = 0; i < H * W; ++i) {
            const uint8_t* p = img + i * 3;
            gray[static_cast<size_t>(i)] = 0.114f * p[0] + 0.587f * p[1] + 0.299f * p[2];
        }
        std::vector<float> out(static_cast<size_t>(gh) * gw);
        float sy = static_cast<float>(H) / gh;
        float sx = static_cast<float>(W) / gw;
        for (int i = 0; i < gh; ++i) {
            float y = (i + 0.5f) * sy - 0.5f;
            for (int j = 0; j < gw; ++j) {
                float x = (j + 0.5f) * sx - 0.5f;
                out[static_cast<size_t>(i) * gw + j] = sample(
                    gray, static_cast<int>(H), static_cast<int>(W),
                    std::max(y, 0.0f), std::max(x, 0.0f));
            }
        }
        return out;
    }

    Warp2x3 align(const std::vector<float>& prev, const std::vector<float>& curr,
                  int h, int w) const {
        const int64_t n = static_cast<int64_t>(h) * w;
        // template zero-mean
        double tsum = 0.0;
        for (float v : prev) tsum += v;
        const float tmean = static_cast<float>(tsum / n);
        // gradients of curr (central differences, zero borders)
        std::vector<float> gx(static_cast<size_t>(n), 0.0f), gy(static_cast<size_t>(n), 0.0f);
        for (int i = 0; i < h; ++i)
            for (int j = 1; j < w - 1; ++j)
                gx[static_cast<size_t>(i) * w + j] =
                    (curr[static_cast<size_t>(i) * w + j + 1] -
                     curr[static_cast<size_t>(i) * w + j - 1]) / 2.0f;
        for (int i = 1; i < h - 1; ++i)
            for (int j = 0; j < w; ++j)
                gy[static_cast<size_t>(i) * w + j] =
                    (curr[static_cast<size_t>((i + 1)) * w + j] -
                     curr[static_cast<size_t>((i - 1)) * w + j]) / 2.0f;

        const int np = mode_ == 0 ? 2 : 3;
        double p[3] = {0, 0, 0};
        std::vector<float> iw(static_cast<size_t>(n)), J(static_cast<size_t>(n) * np);
        for (int it = 0; it < max_iter_; ++it) {
            // warp grid + sample curr and its gradients
            double isum = 0.0;
            for (int i = 0; i < h; ++i) {
                for (int j = 0; j < w; ++j) {
                    float wys, wxs;
                    if (mode_ == 0) {
                        wxs = j + static_cast<float>(p[0]);
                        wys = i + static_cast<float>(p[1]);
                    } else {
                        float c = std::cos(static_cast<float>(p[0]));
                        float s = std::sin(static_cast<float>(p[0]));
                        wxs = c * j - s * i + static_cast<float>(p[1]);
                        wys = s * j + c * i + static_cast<float>(p[2]);
                    }
                    size_t idx = static_cast<size_t>(i) * w + j;
                    iw[idx] = sample(curr, h, w, wys, wxs);
                    isum += iw[idx];
                    float gxw = sample(gx, h, w, wys, wxs);
                    float gyw = sample(gy, h, w, wys, wxs);
                    if (mode_ == 0) {
                        J[idx * 2 + 0] = gxw;
                        J[idx * 2 + 1] = gyw;
                    } else {
                        float c = std::cos(static_cast<float>(p[0]));
                        float s = std::sin(static_cast<float>(p[0]));
                        J[idx * 3 + 0] = gxw * (-s * j - c * i) + gyw * (c * j - s * i);
                        J[idx * 3 + 1] = gxw;
                        J[idx * 3 + 2] = gyw;
                    }
                }
            }
            const float imean = static_cast<float>(isum / n);
            // normal equations (ECC update, cmc.py:106-117)
            double C[9] = {0}, Gi[3] = {0}, Gt[3] = {0}, ii = 0.0, ti = 0.0;
            for (int64_t k = 0; k < n; ++k) {
                float izm = iw[static_cast<size_t>(k)] - imean;
                float t = prev[static_cast<size_t>(k)] - tmean;
                ii += static_cast<double>(izm) * izm;
                ti += static_cast<double>(t) * izm;
                const float* Jk = &J[static_cast<size_t>(k) * np];
                for (int a = 0; a < np; ++a) {
                    Gi[a] += static_cast<double>(Jk[a]) * izm;
                    Gt[a] += static_cast<double>(Jk[a]) * t;
                    for (int b = 0; b <= a; ++b)
                        C[a * 3 + b] += static_cast<double>(Jk[a]) * Jk[b];
                }
            }
            for (int a = 0; a < np; ++a) {
                for (int b = a + 1; b < np; ++b) C[a * 3 + b] = C[b * 3 + a];
                C[a * 3 + a] += 1e-6;
            }
            double Cinv[9];
            invert(C, Cinv, np);
            double CiGi[3] = {0};
            matvec(Cinv, Gi, CiGi, np);
            double num = ii, den = ti;
            for (int a = 0; a < np; ++a) {
                num -= Gi[a] * CiGi[a];
                den -= Gt[a] * CiGi[a];
            }
            if (std::abs(den) < 1e-12) den = 1e-12;
            double lam = num / den;
            // dp = Cinv @ J^T (lam * t - izm)
            double rhs[3] = {0};
            for (int64_t k = 0; k < n; ++k) {
                float izm = iw[static_cast<size_t>(k)] - imean;
                float t = prev[static_cast<size_t>(k)] - tmean;
                double err = lam * t - izm;
                const float* Jk = &J[static_cast<size_t>(k) * np];
                for (int a = 0; a < np; ++a) rhs[a] += Jk[a] * err;
            }
            double dp[3] = {0};
            matvec(Cinv, rhs, dp, np);
            for (int a = 0; a < np; ++a) p[a] += dp[a];
        }
        Warp2x3 out;
        if (mode_ == 0) {
            out.m[2] = static_cast<float>(p[0]);
            out.m[5] = static_cast<float>(p[1]);
        } else {
            float c = std::cos(static_cast<float>(p[0]));
            float s = std::sin(static_cast<float>(p[0]));
            out.m[0] = c;
            out.m[1] = -s;
            out.m[2] = static_cast<float>(p[1]);
            out.m[3] = s;
            out.m[4] = c;
            out.m[5] = static_cast<float>(p[2]);
        }
        return out;
    }

    static void invert(const double* C, double* out, int np) {
        if (np == 2) {
            double det = C[0] * C[4] - C[1] * C[3];
            if (std::abs(det) < 1e-18) det = 1e-18;
            out[0] = C[4] / det;
            out[1] = -C[1] / det;
            out[3] = -C[3] / det;
            out[4] = C[0] / det;
        } else {
            double a = C[0], b = C[1], c = C[2];
            double d = C[3], e = C[4], f = C[5];
            double g = C[6], hh = C[7], i = C[8];
            double A = e * i - f * hh, B = -(d * i - f * g), Cc = d * hh - e * g;
            double det = a * A + b * B + c * Cc;
            if (std::abs(det) < 1e-18) det = 1e-18;
            out[0] = A / det;
            out[1] = (c * hh - b * i) / det;
            out[2] = (b * f - c * e) / det;
            out[3] = B / det;
            out[4] = (a * i - c * g) / det;
            out[5] = (c * d - a * f) / det;
            out[6] = Cc / det;
            out[7] = (b * g - a * hh) / det;
            out[8] = (a * e - b * d) / det;
        }
    }

    static void matvec(const double* M, const double* v, double* out, int np) {
        for (int a = 0; a < np; ++a) {
            out[a] = 0.0;
            for (int b = 0; b < np; ++b) out[a] += M[a * 3 + b] * v[b];
        }
    }

    int mode_;
    int max_iter_;
    float scale_;
    std::vector<float> prev_;
    int prev_h_ = 0, prev_w_ = 0;
};

}  // namespace boxmot

#endif  // BOXMOT_ECC_CMC_HPP
