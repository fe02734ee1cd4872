// Constant-velocity Kalman banks over flat slot arrays, float32.
//
// Numerics mirror boxmot_tpu/motion/kalman.py exactly (Joseph-form
// update, clamped unrolled Cholesky) so CPU slot banks reproduce the
// device programs bit-for-bit up to FMA reassociation.  The reference
// equivalents are boxmot/motion/kalman_filters/{base,xyah,xysr}.py.

#ifndef BOXMOT_KALMAN_BANK_HPP
#define BOXMOT_KALMAN_BANK_HPP

#include <algorithm>
#include <cmath>
#include <cstring>

namespace boxmot {

// Cholesky-based inverse of a small PSD matrix (mirrors
// kalman.inv_psd_small: clamped sqrt plays the jitter-repair role).
template <int D>
inline void inv_psd(const float S[D][D], float Sinv[D][D]) {
    float L[D][D] = {};
    for (int i = 0; i < D; ++i) {
        for (int j = 0; j <= i; ++j) {
            float s = S[i][j];
            for (int k = 0; k < j; ++k) s -= L[i][k] * L[j][k];
            if (i == j)
                L[i][j] = std::sqrt(std::max(s, 1e-9f));
            else
                L[i][j] = s / L[j][j];
        }
    }
    // M = L^-1 by forward substitution.
    float M[D][D] = {};
    for (int i = 0; i < D; ++i) {
        M[i][i] = 1.0f / L[i][i];
        for (int j = 0; j < i; ++j) {
            float s = L[i][j] * M[j][j];
            for (int k = j + 1; k < i; ++k) s += L[i][k] * M[k][j];
            M[i][j] = -s / L[i][i];
        }
    }
    // Sinv = M^T M.
    for (int a = 0; a < D; ++a)
        for (int b = 0; b < D; ++b) {
            float s = 0.0f;
            for (int k = std::max(a, b); k < D; ++k) s += M[k][a] * M[k][b];
            Sinv[a][b] = s;
        }
}

// One constant-velocity filter layout: state [z..., vel...] with
// H = [I 0] and diagonal noise; DZ measurement dims, DX state dims.
// Noise callbacks are provided by the concrete layout structs below.
template <class Layout>
struct KalmanBank {
    static constexpr int DZ = Layout::DZ;
    static constexpr int DX = Layout::DX;
    Layout layout;

    explicit KalmanBank(Layout l = Layout()) : layout(l) {}

    // mean: (DX,), cov: (DX*DX,) row-major — one slot.
    void initiate(const float* z, float* mean, float* cov) const {
        for (int i = 0; i < DZ; ++i) mean[i] = z[i];
        for (int i = DZ; i < DX; ++i) mean[i] = 0.0f;
        layout.enforce(mean);
        float std[DX];
        layout.init_std(z, std);
        std::memset(cov, 0, sizeof(float) * DX * DX);
        for (int i = 0; i < DX; ++i) cov[i * DX + i] = std[i] * std[i];
    }

    void predict(float* mean, float* cov) const {
        float q[DX];
        layout.process_std(mean, q);
        // mean' = F mean with F = [[I, I], [0, I]] pattern from layout.
        float nm[DX];
        layout.apply_motion(mean, nm);
        // cov' = F P F^T + diag(q^2) computed via the same sparse F.
        float FP[DX][DX];
        for (int c = 0; c < DX; ++c) {
            float col[DX];
            for (int r = 0; r < DX; ++r) col[r] = cov[r * DX + c];
            float out[DX];
            layout.apply_motion(col, out);
            for (int r = 0; r < DX; ++r) FP[r][c] = out[r];
        }
        float NP[DX][DX];
        for (int r = 0; r < DX; ++r) {
            float row[DX];
            for (int c = 0; c < DX; ++c) row[c] = FP[r][c];
            float out[DX];
            layout.apply_motion(row, out);
            for (int c = 0; c < DX; ++c) NP[r][c] = out[c];
        }
        for (int r = 0; r < DX; ++r)
            for (int c = 0; c < DX; ++c) cov[r * DX + c] = NP[r][c];
        for (int i = 0; i < DX; ++i) cov[i * DX + i] += q[i] * q[i];
        for (int i = 0; i < DX; ++i) mean[i] = nm[i];
        layout.enforce(mean);
    }

    // Joseph-form update (kalman.update); conf feeds NSA when enabled.
    // gain_scale scales the MEAN update only (OccluTrack abnormal-motion
    // suppression — the covariance still contracts normally, matching
    // kalman.update's gain_scale parameter).
    void update(float* mean, float* cov, const float* z, float conf = 0.0f,
                float gain_scale = 1.0f) const {
        float r_std[DZ];
        layout.meas_std(mean, r_std);
        if (layout.nsa()) {
            for (int i = 0; i < DZ; ++i) r_std[i] *= (1.0f - conf);
        }
        float r_var[DZ];
        for (int i = 0; i < DZ; ++i) r_var[i] = r_std[i] * r_std[i];

        float S[DZ][DZ];
        for (int a = 0; a < DZ; ++a)
            for (int b = 0; b < DZ; ++b) S[a][b] = cov[a * DX + b];
        for (int i = 0; i < DZ; ++i) S[i][i] += r_var[i];
        float Sinv[DZ][DZ];
        inv_psd<DZ>(S, Sinv);

        // gain[a][z] = sum_d P[a][d] Sinv[d][z], d < DZ
        float gain[DX][DZ];
        for (int a = 0; a < DX; ++a)
            for (int zc = 0; zc < DZ; ++zc) {
                float s = 0.0f;
                for (int d = 0; d < DZ; ++d) s += cov[a * DX + d] * Sinv[d][zc];
                gain[a][zc] = s;
            }

        float innov[DZ];
        for (int i = 0; i < DZ; ++i) innov[i] = z[i] - mean[i];
        for (int a = 0; a < DX; ++a) {
            float s = 0.0f;
            for (int zc = 0; zc < DZ; ++zc) s += innov[zc] * gain[a][zc];
            mean[a] += s * gain_scale;
        }

        // Joseph: P = A P A^T + gain diag(r_var) gain^T, A = I - [gain 0].
        float A[DX][DX] = {};
        for (int i = 0; i < DX; ++i) A[i][i] = 1.0f;
        for (int a = 0; a < DX; ++a)
            for (int zc = 0; zc < DZ; ++zc) A[a][zc] -= gain[a][zc];
        float AP[DX][DX];
        for (int a = 0; a < DX; ++a)
            for (int c = 0; c < DX; ++c) {
                float s = 0.0f;
                for (int b = 0; b < DX; ++b) s += A[a][b] * cov[b * DX + c];
                AP[a][c] = s;
            }
        for (int a = 0; a < DX; ++a)
            for (int b = 0; b < DX; ++b) {
                float s = 0.0f;
                for (int c = 0; c < DX; ++c) s += AP[a][c] * A[b][c];
                for (int zc = 0; zc < DZ; ++zc)
                    s += gain[a][zc] * r_var[zc] * gain[b][zc];
                cov[a * DX + b] = s;
            }
        layout.enforce(mean);
    }
};

// [cx, cy, a=w/h, h] + velocities — ByteTrack / StrongSort lineage
// (mirrors kalman.make_xyah_layout).
struct XyahLayout {
    static constexpr int DZ = 4;
    static constexpr int DX = 8;
    float swp = 1.0f / 20.0f;
    float swv = 1.0f / 160.0f;

    bool nsa() const { return false; }

    void apply_motion(const float* x, float* out) const {
        for (int i = 0; i < 4; ++i) out[i] = x[i] + x[i + 4];
        for (int i = 4; i < 8; ++i) out[i] = x[i];
    }

    void init_std(const float* z, float* std) const {
        float h = z[3];
        std[0] = 2 * swp * h;
        std[1] = 2 * swp * h;
        std[2] = 1e-2f;
        std[3] = 2 * swp * h;
        std[4] = 10 * swv * h;
        std[5] = 10 * swv * h;
        std[6] = 1e-5f;
        std[7] = 10 * swv * h;
    }

    void process_std(const float* mean, float* std) const {
        float h = mean[3];
        std[0] = swp * h;
        std[1] = swp * h;
        std[2] = 1e-2f;
        std[3] = swp * h;
        std[4] = swv * h;
        std[5] = swv * h;
        std[6] = 1e-5f;
        std[7] = swv * h;
    }

    void meas_std(const float* mean, float* std) const {
        float h = mean[3];
        std[0] = swp * h;
        std[1] = swp * h;
        std[2] = 1e-1f;
        std[3] = swp * h;
    }

    void enforce(float* mean) const {
        mean[2] = std::max(mean[2], 1e-4f);
        mean[3] = std::max(mean[3], 1e-4f);
    }
};

// [cx, cy, w, h] + velocities — BotSort / ByteTrack-OBB lineage
// (mirrors kalman.make_xywh_layout, obb=False).
struct XywhLayout {
    static constexpr int DZ = 4;
    static constexpr int DX = 8;
    float swp = 1.0f / 20.0f;
    float swv = 1.0f / 160.0f;

    bool nsa() const { return false; }

    void apply_motion(const float* x, float* out) const {
        for (int i = 0; i < 4; ++i) out[i] = x[i] + x[i + 4];
        for (int i = 4; i < 8; ++i) out[i] = x[i];
    }

    void init_std(const float* z, float* std) const {
        float w = z[2], h = z[3];
        std[0] = 2 * swp * w;
        std[1] = 2 * swp * h;
        std[2] = 2 * swp * w;
        std[3] = 2 * swp * h;
        std[4] = 10 * swv * w;
        std[5] = 10 * swv * h;
        std[6] = 10 * swv * w;
        std[7] = 10 * swv * h;
    }

    void process_std(const float* mean, float* std) const {
        float w = mean[2], h = mean[3];
        std[0] = swp * w;
        std[1] = swp * h;
        std[2] = swp * w;
        std[3] = swp * h;
        std[4] = swv * w;
        std[5] = swv * h;
        std[6] = swv * w;
        std[7] = swv * h;
    }

    void meas_std(const float* mean, float* std) const {
        float w = mean[2], h = mean[3];
        std[0] = swp * w;
        std[1] = swp * h;
        std[2] = swp * w;
        std[3] = swp * h;
    }

    void enforce(float* mean) const {
        mean[2] = std::max(mean[2], 1e-4f);
        mean[3] = std::max(mean[3], 1e-4f);
    }
};

// [cx, cy, w, h, theta] + velocities — ByteTrack-OBB / BotSort-OBB
// (mirrors kalman.make_xywh_layout, obb=True).  Angle wrapping is done
// by the caller via obb_common.wrap_angle in enforce-equivalent spots;
// here only w/h are clamped (matching the jnp enforce's clamp +
// wrap — wrap handled below through the wrap hook).
struct XywhObbLayout {
    static constexpr int DZ = 5;
    static constexpr int DX = 10;
    float swp = 1.0f / 20.0f;
    float swv = 1.0f / 160.0f;

    bool nsa() const { return false; }

    void apply_motion(const float* x, float* out) const {
        for (int i = 0; i < 5; ++i) out[i] = x[i] + x[i + 5];
        for (int i = 5; i < 10; ++i) out[i] = x[i];
    }

    void init_std(const float* z, float* std) const {
        float w = z[2], h = z[3];
        std[0] = 2 * swp * w;
        std[1] = 2 * swp * h;
        std[2] = 2 * swp * w;
        std[3] = 2 * swp * h;
        std[4] = 1e-2f;
        std[5] = 10 * swv * w;
        std[6] = 10 * swv * h;
        std[7] = 10 * swv * w;
        std[8] = 10 * swv * h;
        std[9] = 1e-5f;
    }

    void process_std(const float* mean, float* std) const {
        float w = mean[2], h = mean[3];
        std[0] = swp * w;
        std[1] = swp * h;
        std[2] = swp * w;
        std[3] = swp * h;
        std[4] = 1e-2f;
        std[5] = swv * w;
        std[6] = swv * h;
        std[7] = swv * w;
        std[8] = swv * h;
        std[9] = 1e-5f;
    }

    void meas_std(const float* mean, float* std) const {
        float w = mean[2], h = mean[3];
        std[0] = swp * w;
        std[1] = swp * h;
        std[2] = swp * w;
        std[3] = swp * h;
        std[4] = 1e-1f;
    }

    void enforce(float* mean) const {
        mean[2] = std::max(mean[2], 1e-4f);
        mean[3] = std::max(mean[3], 1e-4f);
        // angle wrap to [-pi, pi) (ops/geometry.wrap_angle)
        const float pi = 3.14159265358979323846f;
        mean[4] = mean[4] - 2.0f * pi * std::floor((mean[4] + pi) / (2.0f * pi));
    }
};

// [cx, cy, s=area, r=aspect] + (vx, vy, vs) — OC-SORT's 7-D filter with
// constant noise (mirrors kalman.make_xysr_layout, obb=False).
struct XysrLayout {
    static constexpr int DZ = 4;
    static constexpr int DX = 7;
    float q_xy = 0.01f;   // q_xy_scaling
    float q_s = 0.0001f;  // q_s_scaling

    bool nsa() const { return false; }

    void apply_motion(const float* x, float* out) const {
        out[0] = x[0] + x[4];
        out[1] = x[1] + x[5];
        out[2] = x[2] + x[6];
        out[3] = x[3];
        out[4] = x[4];
        out[5] = x[5];
        out[6] = x[6];
    }

    void init_std(const float*, float* std) const {
        const float p0[7] = {10.f, 10.f, 10.f, 10.f, 10000.f, 10000.f, 10000.f};
        for (int i = 0; i < 7; ++i) std[i] = std::sqrt(p0[i]);
    }

    void process_std(const float*, float* std) const {
        float q[7] = {1.f, 1.f, 1.f, 1.f, q_xy, q_xy, q_s};
        for (int i = 0; i < 7; ++i) std[i] = std::sqrt(q[i]);
    }

    void meas_std(const float*, float* std) const {
        const float r[4] = {1.f, 1.f, 10.f, 10.f};
        for (int i = 0; i < 4; ++i) std[i] = std::sqrt(r[i]);
    }

    void enforce(float* mean) const {
        mean[2] = std::max(mean[2], 1e-6f);
        mean[3] = std::max(mean[3], 1e-6f);
    }
};

// [cx, cy, s=area, r=aspect, theta] + (vx, vy, vs, vtheta) — OC-SORT's
// 9-D OBB filter (mirrors kalman.make_xysr_layout, obb=True; q_a takes
// q_s's value as the reference passes Q_a_scaling=Q_s_scaling).
struct XysrObbLayout {
    static constexpr int DZ = 5;
    static constexpr int DX = 9;
    float q_xy = 0.01f;
    float q_s = 0.0001f;

    bool nsa() const { return false; }

    void apply_motion(const float* x, float* out) const {
        out[0] = x[0] + x[5];
        out[1] = x[1] + x[6];
        out[2] = x[2] + x[7];
        out[3] = x[3];
        out[4] = x[4] + x[8];
        for (int i = 5; i < 9; ++i) out[i] = x[i];
    }

    void init_std(const float*, float* std) const {
        for (int i = 0; i < 5; ++i) std[i] = std::sqrt(10.0f);
        for (int i = 5; i < 9; ++i) std[i] = std::sqrt(10000.0f);
    }

    void process_std(const float*, float* std) const {
        for (int i = 0; i < 5; ++i) std[i] = 1.0f;
        std[5] = std::sqrt(q_xy);
        std[6] = std::sqrt(q_xy);
        std[7] = std::sqrt(q_s);
        std[8] = std::sqrt(q_s);  // q_a = q_s (reference quirk)
    }

    void meas_std(const float*, float* std) const {
        const float r[5] = {1.f, 1.f, 10.f, 10.f, 10.f};
        for (int i = 0; i < 5; ++i) std[i] = std::sqrt(r[i]);
    }

    void enforce(float* mean) const {
        mean[2] = std::max(mean[2], 1e-6f);
        mean[3] = std::max(mean[3], 1e-6f);
        const float pi = 3.14159265358979323846f;
        mean[4] = mean[4] - 2.0f * pi * std::floor((mean[4] + pi) / (2.0f * pi));
    }
};

// [x, y, s=area, c=confidence, r=aspect] + (vx, vy, vs, vc) — the
// score-aware HybridSort filter (mirrors kalman.make_xyscr_layout).
struct XyscrLayout {
    static constexpr int DZ = 5;
    static constexpr int DX = 9;

    bool nsa() const { return false; }

    void apply_motion(const float* x, float* out) const {
        out[0] = x[0] + x[5];
        out[1] = x[1] + x[6];
        out[2] = x[2] + x[7];
        out[3] = x[3] + x[8];
        out[4] = x[4];
        for (int i = 5; i < 9; ++i) out[i] = x[i];
    }

    void init_std(const float*, float* std) const {
        for (int i = 0; i < 5; ++i) std[i] = std::sqrt(10.0f);
        for (int i = 5; i < 9; ++i) std[i] = std::sqrt(10000.0f);
    }

    void process_std(const float*, float* std) const {
        const float q[9] = {1.f, 1.f, 1.f, 1.f, 1.f, 0.01f, 0.01f, 1e-4f, 1e-4f};
        for (int i = 0; i < 9; ++i) std[i] = std::sqrt(q[i]);
    }

    void meas_std(const float*, float* std) const {
        const float r[5] = {1.f, 1.f, 10.f, 10.f, 10.f};
        for (int i = 0; i < 5; ++i) std[i] = std::sqrt(r[i]);
    }

    void enforce(float* mean) const {
        mean[2] = std::max(mean[2], 1e-6f);
        mean[4] = std::max(mean[4], 1e-6f);
    }
};

// [x, y, h, r=w/h] + velocities with BoostTrack's constant noise policy
// (mirrors kalman.make_xyhr_layout, obb=False).
struct XyhrLayout {
    static constexpr int DZ = 4;
    static constexpr int DX = 8;

    bool nsa() const { return false; }

    void apply_motion(const float* x, float* out) const {
        for (int i = 0; i < 4; ++i) out[i] = x[i] + x[i + 4];
        for (int i = 4; i < 8; ++i) out[i] = x[i];
    }

    void init_std(const float*, float* std) const {
        for (int i = 0; i < 4; ++i) std[i] = std::sqrt(10.0f);
        for (int i = 4; i < 8; ++i) std[i] = std::sqrt(10000.0f);
    }

    void process_std(const float*, float* std) const {
        for (int i = 0; i < 4; ++i) std[i] = 1.0f;
        for (int i = 4; i < 8; ++i) std[i] = std::sqrt(0.01f);
    }

    void meas_std(const float*, float* std) const {
        const float r[4] = {1.f, 1.f, 10.f, 0.01f};
        for (int i = 0; i < 4; ++i) std[i] = std::sqrt(r[i]);
    }

    void enforce(float* mean) const {
        mean[2] = std::max(mean[2], 1e-4f);
        mean[3] = std::max(mean[3], 1e-4f);
    }
};

}  // namespace boxmot

#endif  // BOXMOT_KALMAN_BANK_HPP
