// StrongSort as a fixed-capacity slot bank on the CPU.
//
// Step-for-step mirror of the device program in
// boxmot_tpu/trackers/strongsort.py (strongsort_step) in its no-model
// configuration: the DeepSORT lineage with the NSA Kalman filter,
// Mahalanobis-gated matching for confirmed tracks, the IoU pass for
// tentative / just-missed tracks, tentative->confirmed lifecycle, and
// camera-motion compensation.  Without a ReID model the reference feeds
// all-ones embeddings, so every bank feature is the same unit vector
// and the appearance cost is exactly 0 wherever the bank is non-empty —
// the native core therefore tracks only the bank COUNT.  Reference:
// boxmot/trackers/bbox/strongsort/ (sort/tracker.py,
// sort/linear_assignment.py, strongsort_kf.py).

#ifndef BOXMOT_STRONGSORT_BANK_HPP
#define BOXMOT_STRONGSORT_BANK_HPP

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#include "ecc_cmc.hpp"
#include "kalman_bank.hpp"
#include "slot_common.hpp"

namespace boxmot {

// XYAH layout with NSA measurement-noise scaling (strongsort_kf project:
// R *= (1 - conf)^2)
struct XyahNsaLayout : XyahLayout {
    bool nsa() const { return true; }
};

struct StrongSortConfig {
    float min_conf = 0.1f;
    float max_cos_dist = 0.2f;
    float max_iou_dist = 0.7f;
    int max_age = 30;
    int n_init = 3;
    float mc_lambda = 0.98f;
    float std_weight_position = 1.0f / 20.0f;
    float std_weight_velocity = 1.0f / 160.0f;
    bool use_cmc = true;
    int cmc_max_iter = 50;
    float cmc_scale = 0.15f;
    bool cmc_euclidean = false;
    int capacity = 256;

    static StrongSortConfig from_string(const char* s) {
        auto kv = parse_config(s);
        StrongSortConfig c;
        c.min_conf = static_cast<float>(cfg_get(kv, "min_conf", c.min_conf));
        c.max_cos_dist = static_cast<float>(cfg_get(kv, "max_cos_dist", c.max_cos_dist));
        c.max_iou_dist = static_cast<float>(cfg_get(kv, "max_iou_dist", c.max_iou_dist));
        c.max_age = static_cast<int>(cfg_get(kv, "max_age", c.max_age));
        c.n_init = static_cast<int>(cfg_get(kv, "n_init", c.n_init));
        c.mc_lambda = static_cast<float>(cfg_get(kv, "mc_lambda", c.mc_lambda));
        c.std_weight_position =
            static_cast<float>(cfg_get(kv, "std_weight_position", c.std_weight_position));
        c.std_weight_velocity =
            static_cast<float>(cfg_get(kv, "std_weight_velocity", c.std_weight_velocity));
        c.use_cmc = cfg_get(kv, "use_cmc", 1.0) != 0.0;
        c.cmc_max_iter = static_cast<int>(cfg_get(kv, "cmc_max_iter", c.cmc_max_iter));
        c.cmc_scale = static_cast<float>(cfg_get(kv, "cmc_scale", c.cmc_scale));
        c.cmc_euclidean = cfg_get(kv, "cmc_euclidean", 0.0) != 0.0;
        c.capacity = static_cast<int>(cfg_get(kv, "capacity", c.capacity));
        return c;
    }
};

class StrongSortCore {
  public:
    static constexpr int DX = 8;
    static constexpr float kInf = 1e5f;
    static constexpr float kChi2_4 = 9.4877f;
    enum Status : int32_t { kEmpty = 0, kTentative = 1, kConfirmed = 2 };

    explicit StrongSortCore(const StrongSortConfig& cfg)
        : cfg_(cfg),
          cmc_(cfg.cmc_euclidean ? 1 : 0, cfg.cmc_max_iter, cfg.cmc_scale) {
        XyahNsaLayout layout;
        layout.swp = cfg.std_weight_position;
        layout.swv = cfg.std_weight_velocity;
        kf_ = KalmanBank<XyahNsaLayout>(layout);
        reset();
    }

    void reset() {
        const size_t K = static_cast<size_t>(cfg_.capacity);
        mean_.assign(K * DX, 0.0f);
        cov_.assign(K * DX * DX, 0.0f);
        status_.assign(K, kEmpty);
        hits_.assign(K, 0);
        age_.assign(K, 0);
        tsu_.assign(K, 0);
        tid_.assign(K, 0);
        conf_.assign(K, 0.0f);
        cls_.assign(K, 0.0f);
        det_ind_.assign(K, 0.0f);
        bank_count_.assign(K, 0);
        cmc_.reset();
        frame_count_ = 0;
        next_id_ = 1;
    }

    int64_t step(const float* dets, int64_t n, float* out) {
        return step_warp(dets, n, Warp2x3(), out);
    }

    int64_t step_img(const float* dets, int64_t n, const uint8_t* img, int64_t H,
                     int64_t W, float* out) {
        Warp2x3 warp;
        if (cfg_.use_cmc && img) warp = cmc_.apply(img, H, W);
        return step_warp(dets, n, warp, out);
    }

    int64_t step_warp(const float* dets, int64_t n, const Warp2x3& warp, float* out) {
        const int K = cfg_.capacity;
        ++frame_count_;

        std::vector<char> valid(static_cast<size_t>(n), 0);
        std::vector<float> det_z(static_cast<size_t>(n) * 4);
        for (int64_t j = 0; j < n; ++j) {
            valid[static_cast<size_t>(j)] = dets[j * 6 + 4] >= cfg_.min_conf;
            xyxy_to_xyah(&dets[j * 6], &det_z[static_cast<size_t>(j) * 4]);
        }

        // camera update: warp state box corners, rebuild xyah
        // (track.py:137-147)
        if (!warp.identity()) {
            const float a = warp.m[0], b = warp.m[1], tx = warp.m[2];
            const float c = warp.m[3], d = warp.m[4], ty = warp.m[5];
            for (int i = 0; i < K; ++i) {
                if (status_[i] == kEmpty) continue;
                float* m = &mean_[static_cast<size_t>(i) * DX];
                float box[4];
                xyah_to_xyxy(m, box);
                float p1x = a * box[0] + b * box[1] + tx;
                float p1y = c * box[0] + d * box[1] + ty;
                float p2x = a * box[2] + b * box[3] + tx;
                float p2y = c * box[2] + d * box[3] + ty;
                float w = p2x - p1x, h = p2y - p1y;
                m[0] = p1x + w / 2.0f;
                m[1] = p1y + h / 2.0f;
                m[2] = w / std::max(h, 1e-6f);
                m[3] = h;
            }
        }

        std::vector<char> confirmed0(static_cast<size_t>(K), 0),
            tentative0(static_cast<size_t>(K), 0), alive(static_cast<size_t>(K), 0);
        for (int i = 0; i < K; ++i) {
            alive[i] = status_[i] != kEmpty;
            confirmed0[i] = status_[i] == kConfirmed;
            tentative0[i] = status_[i] == kTentative;
            if (!alive[i]) continue;
            kf_.predict(&mean_[static_cast<size_t>(i) * DX],
                        &cov_[static_cast<size_t>(i) * DX * DX]);
            age_[i] += 1;
            tsu_[i] += 1;
        }

        // pass 1: confirmed tracks — no-model appearance cost is 0 where
        // the bank has entries, INF otherwise; fused with the Mahalanobis
        // gate (linear_assignment.py:14-198)
        std::vector<double> cost1(static_cast<size_t>(K) * static_cast<size_t>(n), 0.0);
        for (int i = 0; i < K; ++i) {
            if (!confirmed0[i]) continue;
            float gate[256];  // per-det Mahalanobis, chunked below
            for (int64_t j0 = 0; j0 < n; j0 += 256) {
                int64_t cnt = std::min<int64_t>(256, n - j0);
                gating_distance(i, &det_z[static_cast<size_t>(j0) * 4], cnt, gate);
                for (int64_t j = 0; j < cnt; ++j) {
                    float app = bank_count_[i] > 0 ? 0.0f : kInf;
                    float g = gate[j];
                    float v = g > kChi2_4 ? kInf : app;
                    v = cfg_.mc_lambda * v + (1.0f - cfg_.mc_lambda) * g;
                    v = std::min(v, cfg_.max_cos_dist + 1e-5f);
                    cost1[static_cast<size_t>(i) * n + (j0 + j)] = v;
                }
            }
        }
        std::vector<int32_t> r2c1 =
            full_assignment(cost1, K, n, confirmed0, valid);
        std::vector<char> m1(static_cast<size_t>(K), 0), dm(static_cast<size_t>(n), 0);
        for (int i = 0; i < K; ++i) {
            int32_t j = r2c1[i];
            if (j < 0 || cost1[static_cast<size_t>(i) * n + j] > cfg_.max_cos_dist)
                continue;
            m1[i] = 1;
            dm[static_cast<size_t>(j)] = 1;
        }

        // pass 2: tentative + confirmed-missed-one-frame, IoU
        std::vector<char> rows2(static_cast<size_t>(K), 0), cols2(static_cast<size_t>(n), 0);
        for (int i = 0; i < K; ++i)
            rows2[i] = alive[i] && (tentative0[i] || (confirmed0[i] && !m1[i] && tsu_[i] == 1));
        for (int64_t j = 0; j < n; ++j)
            cols2[static_cast<size_t>(j)] = valid[static_cast<size_t>(j)] && !dm[static_cast<size_t>(j)];
        std::vector<double> cost2(static_cast<size_t>(K) * static_cast<size_t>(n), 0.0);
        for (int i = 0; i < K; ++i) {
            if (!rows2[i]) continue;
            float box[4];
            xyah_to_xyxy(&mean_[static_cast<size_t>(i) * DX], box);
            for (int64_t j = 0; j < n; ++j) {
                float v = tsu_[i] > 1 ? kInf : 1.0f - iou_xyxy(box, &dets[j * 6]);
                cost2[static_cast<size_t>(i) * n + j] =
                    std::min(v, cfg_.max_iou_dist + 1e-5f);
            }
        }
        std::vector<int32_t> r2c2 = full_assignment(cost2, K, n, rows2, cols2);
        std::vector<char> m2(static_cast<size_t>(K), 0);
        for (int i = 0; i < K; ++i) {
            int32_t j = r2c2[i];
            if (j < 0 || cost2[static_cast<size_t>(i) * n + j] > cfg_.max_iou_dist)
                continue;
            m2[i] = 1;
            dm[static_cast<size_t>(j)] = 1;
        }

        // NSA KF update + lifecycle
        for (int i = 0; i < K; ++i) {
            int32_t j = m1[i] ? r2c1[i] : (m2[i] ? r2c2[i] : -1);
            if (j < 0) continue;
            float c = dets[static_cast<int64_t>(j) * 6 + 4];
            kf_.update(&mean_[static_cast<size_t>(i) * DX],
                       &cov_[static_cast<size_t>(i) * DX * DX],
                       &det_z[static_cast<size_t>(j) * 4], c);
            hits_[i] += 1;
            tsu_[i] = 0;
            conf_[i] = c;
            cls_[i] = dets[static_cast<int64_t>(j) * 6 + 5];
            det_ind_[i] = static_cast<float>(j);
            if (status_[i] == kTentative && hits_[i] >= cfg_.n_init)
                status_[i] = kConfirmed;
        }

        // mark_missed (track.py:189-194)
        for (int i = 0; i < K; ++i) {
            if (!alive[i] || m1[i] || m2[i]) continue;
            if (status_[i] == kTentative) status_[i] = kEmpty;
            else if (status_[i] == kConfirmed && tsu_[i] > cfg_.max_age)
                status_[i] = kEmpty;
        }

        // new tracks
        int free_cursor = 0;
        for (int64_t j = 0; j < n; ++j) {
            if (!valid[static_cast<size_t>(j)] || dm[static_cast<size_t>(j)]) continue;
            while (free_cursor < K && status_[free_cursor] != kEmpty) ++free_cursor;
            if (free_cursor >= K) break;
            int i = free_cursor++;
            kf_.initiate(&det_z[static_cast<size_t>(j) * 4],
                         &mean_[static_cast<size_t>(i) * DX],
                         &cov_[static_cast<size_t>(i) * DX * DX]);
            status_[i] = kTentative;
            tid_[i] = next_id_++;
            conf_[i] = dets[j * 6 + 4];
            cls_[i] = dets[j * 6 + 5];
            det_ind_[i] = static_cast<float>(j);
            hits_[i] = 1;
            age_[i] = 1;
            tsu_[i] = 0;
            bank_count_[i] = 0;
        }

        // appearance bank partial_fit: confirmed tracks gain one sample
        // each frame, others are purged (tracker.py:97-107)
        for (int i = 0; i < K; ++i)
            bank_count_[i] = status_[i] == kConfirmed ? bank_count_[i] + 1 : 0;

        int64_t m_out = 0;
        for (int i = 0; i < K; ++i) {
            if (status_[i] != kConfirmed || tsu_[i] >= 1) continue;
            float* row = out + m_out * 8;
            xyah_to_xyxy(&mean_[static_cast<size_t>(i) * DX], row);
            row[4] = static_cast<float>(tid_[i]);
            row[5] = conf_[i];
            row[6] = cls_[i];
            row[7] = det_ind_[i];
            ++m_out;
        }
        return m_out;
    }

    int capacity() const { return cfg_.capacity; }
    // id the next created track will carry in the output rows
    int64_t next_track_id() const { return next_id_; }

  private:
    // Mahalanobis distance of measurements to the projected state
    // (kalman.gating_distance; NSA scaling absent — no conf here)
    void gating_distance(int i, const float* zs, int64_t cnt, float* out_d) const {
        const float* m = &mean_[static_cast<size_t>(i) * DX];
        const float* P = &cov_[static_cast<size_t>(i) * DX * DX];
        float r_std[4];
        kf_.layout.meas_std(m, r_std);
        float S[4][4];
        for (int a = 0; a < 4; ++a)
            for (int b = 0; b < 4; ++b) S[a][b] = P[a * DX + b];
        for (int a = 0; a < 4; ++a) S[a][a] += r_std[a] * r_std[a];
        float Sinv[4][4];
        inv_psd<4>(S, Sinv);
        for (int64_t j = 0; j < cnt; ++j) {
            const float* z = zs + j * 4;
            float d[4];
            for (int a = 0; a < 4; ++a) d[a] = z[a] - m[a];
            float acc = 0.0f;
            for (int a = 0; a < 4; ++a)
                for (int b = 0; b < 4; ++b) acc += d[a] * Sinv[a][b] * d[b];
            out_d[j] = acc;
        }
    }

    static void xyah_to_xyxy(const float* s, float* box) {
        float w = s[2] * s[3];
        box[0] = s[0] - w / 2.0f;
        box[1] = s[1] - s[3] / 2.0f;
        box[2] = s[0] + w / 2.0f;
        box[3] = s[1] + s[3] / 2.0f;
    }

    static void xyxy_to_xyah(const float* b, float* z) {
        float w = b[2] - b[0];
        float h = b[3] - b[1];
        z[0] = b[0] + w / 2.0f;
        z[1] = b[1] + h / 2.0f;
        z[2] = w / (h > 0.0f ? h : 1e-12f);
        z[3] = h;
    }

    StrongSortConfig cfg_;
    EccCmc cmc_;
    KalmanBank<XyahNsaLayout> kf_{XyahNsaLayout()};
    std::vector<float> mean_, cov_, conf_, cls_, det_ind_;
    std::vector<int32_t> status_, hits_, age_, tsu_, tid_, bank_count_;
    int32_t frame_count_ = 0;
    int32_t next_id_ = 1;
};

}  // namespace boxmot

#endif  // BOXMOT_STRONGSORT_BANK_HPP
