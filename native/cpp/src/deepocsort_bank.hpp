// DeepOcSort as a fixed-capacity slot bank on the CPU.
//
// Step-for-step mirror of the device program in
// boxmot_tpu/trackers/deepocsort.py (deepocsort_step) in its no-model
// configuration: OC-SORT association plus camera-motion compensation of
// the KF state / frozen snapshot / observation boxes, and the adaptive
// embedding weighting evaluated on the reference's all-ones embeddings
// (no ReID model -> unit features, cosine similarity exactly 1 where
// IoU > 0 — aw_max_metric then reduces to a unique-candidate bonus).
// Reference: boxmot/trackers/bbox/deepocsort/deepocsort.py:1-492.

#ifndef BOXMOT_DEEPOCSORT_BANK_HPP
#define BOXMOT_DEEPOCSORT_BANK_HPP

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#include "ecc_cmc.hpp"
#include "kalman_bank.hpp"
#include "slot_common.hpp"

namespace boxmot {

struct DeepOcSortConfig {
    float det_thresh = 0.3f;
    int max_age = 30;
    int min_hits = 3;
    float iou_threshold = 0.3f;
    int delta_t = 3;
    float inertia = 0.2f;
    float w_association_emb = 0.5f;
    float aw_param = 0.5f;
    bool embedding_off = false;
    bool aw_off = false;
    bool cmc_off = false;
    float q_xy_scaling = 0.01f;
    float q_s_scaling = 0.0001f;
    int cmc_max_iter = 50;
    float cmc_scale = 0.15f;
    bool cmc_euclidean = false;
    int capacity = 256;

    static DeepOcSortConfig from_string(const char* s) {
        auto kv = parse_config(s);
        DeepOcSortConfig c;
        c.det_thresh = static_cast<float>(cfg_get(kv, "det_thresh", c.det_thresh));
        c.max_age = static_cast<int>(cfg_get(kv, "max_age", c.max_age));
        c.min_hits = static_cast<int>(cfg_get(kv, "min_hits", c.min_hits));
        c.iou_threshold = static_cast<float>(cfg_get(kv, "iou_threshold", c.iou_threshold));
        c.delta_t = static_cast<int>(cfg_get(kv, "delta_t", c.delta_t));
        c.inertia = static_cast<float>(cfg_get(kv, "inertia", c.inertia));
        c.w_association_emb =
            static_cast<float>(cfg_get(kv, "w_association_emb", c.w_association_emb));
        c.aw_param = static_cast<float>(cfg_get(kv, "aw_param", c.aw_param));
        c.embedding_off = cfg_get(kv, "embedding_off", 0.0) != 0.0;
        c.aw_off = cfg_get(kv, "aw_off", 0.0) != 0.0;
        c.cmc_off = cfg_get(kv, "cmc_off", 0.0) != 0.0;
        c.q_xy_scaling = static_cast<float>(cfg_get(kv, "q_xy_scaling", c.q_xy_scaling));
        c.q_s_scaling = static_cast<float>(cfg_get(kv, "q_s_scaling", c.q_s_scaling));
        c.cmc_max_iter = static_cast<int>(cfg_get(kv, "cmc_max_iter", c.cmc_max_iter));
        c.cmc_scale = static_cast<float>(cfg_get(kv, "cmc_scale", c.cmc_scale));
        c.cmc_euclidean = cfg_get(kv, "cmc_euclidean", 0.0) != 0.0;
        c.capacity = static_cast<int>(cfg_get(kv, "capacity", c.capacity));
        return c;
    }
};

class DeepOcSortCore {
  public:
    static constexpr int DX = 7;

    explicit DeepOcSortCore(const DeepOcSortConfig& cfg)
        : cfg_(cfg),
          cmc_(cfg.cmc_euclidean ? 1 : 0, cfg.cmc_max_iter, cfg.cmc_scale) {
        XysrLayout layout;
        layout.q_xy = cfg.q_xy_scaling;
        layout.q_s = cfg.q_s_scaling;
        kf_ = KalmanBank<XysrLayout>(layout);
        reset();
    }

    void reset() {
        const size_t K = static_cast<size_t>(cfg_.capacity);
        const size_t R = static_cast<size_t>(cfg_.delta_t);
        mean_.assign(K * DX, 0.0f);
        cov_.assign(K * DX * DX, 0.0f);
        frozen_mean_.assign(K * DX, 0.0f);
        frozen_cov_.assign(K * DX * DX, 0.0f);
        active_.assign(K, 0);
        age_.assign(K, 0);
        tsu_.assign(K, 0);
        hits_.assign(K, 0);
        hit_streak_.assign(K, 0);
        tid_.assign(K, 0);
        conf_.assign(K, 0.0f);
        cls_.assign(K, 0.0f);
        det_ind_.assign(K, 0.0f);
        last_obs_.assign(K * 5, -1.0f);
        has_obs_.assign(K, 0);
        obs_ring_.assign(K * R * 5, -1.0f);
        ring_age_.assign(K * R, -1);
        velocity_.assign(K * 2, 0.0f);
        observed_.assign(K, 0);
        last_meas_.assign(K * 4, 0.0f);
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
        if (!cfg_.cmc_off && img) warp = cmc_.apply(img, H, W);
        return step_warp(dets, n, warp, out);
    }

    int64_t step_warp(const float* dets, int64_t n, const Warp2x3& warp, float* out) {
        const int K = cfg_.capacity;
        const int R = cfg_.delta_t;
        const int32_t frame = ++frame_count_;

        std::vector<char> first(static_cast<size_t>(n), 0);
        std::vector<float> det_meas(static_cast<size_t>(n) * 4);
        for (int64_t j = 0; j < n; ++j) {
            first[static_cast<size_t>(j)] = dets[j * 6 + 4] > cfg_.det_thresh;
            xyxy_to_xysr(&dets[j * 6], &det_meas[static_cast<size_t>(j) * 4]);
        }

        // --- CMC before predict: warp observations, KF + frozen states
        // (apply_affine_correction, reference deepocsort.py:351-355)
        if (!warp.identity()) {
            const float a = warp.m[0], b = warp.m[1], tx = warp.m[2];
            const float c = warp.m[3], d = warp.m[4], ty = warp.m[5];
            auto warp_pt = [&](float& x, float& y, bool translate) {
                float nx = a * x + b * y + (translate ? tx : 0.0f);
                float ny = c * x + d * y + (translate ? ty : 0.0f);
                x = nx;
                y = ny;
            };
            for (int i = 0; i < K; ++i) {
                if (!active_[i]) continue;
                if (has_obs_[i]) {
                    float* lo = &last_obs_[static_cast<size_t>(i) * 5];
                    warp_pt(lo[0], lo[1], true);
                    warp_pt(lo[2], lo[3], true);
                }
                for (int r = 0; r < R; ++r) {
                    if (ring_age_[static_cast<size_t>(i) * R + r] < 0) continue;
                    float* ob = &obs_ring_[(static_cast<size_t>(i) * R + r) * 5];
                    warp_pt(ob[0], ob[1], true);
                    warp_pt(ob[2], ob[3], true);
                }
                warp_state(&mean_[static_cast<size_t>(i) * DX],
                           &cov_[static_cast<size_t>(i) * DX * DX], warp);
                warp_state(&frozen_mean_[static_cast<size_t>(i) * DX],
                           &frozen_cov_[static_cast<size_t>(i) * DX * DX], warp);
            }
        }

        std::vector<char> prev_observed = observed_, prev_has_obs = has_obs_;
        for (int i = 0; i < K; ++i) {
            if (!active_[i]) continue;
            float* m = &mean_[static_cast<size_t>(i) * DX];
            if (m[6] + m[2] <= 0.0f) m[6] = 0.0f;
            kf_.predict(m, &cov_[static_cast<size_t>(i) * DX * DX]);
            age_[i] += 1;
            if (tsu_[i] > 0) hit_streak_[i] = 0;
            tsu_[i] += 1;
        }

        std::vector<float> k_obs(static_cast<size_t>(K) * 5);
        for (int i = 0; i < K; ++i) {
            const float* chosen = &last_obs_[static_cast<size_t>(i) * 5];
            for (int d = 0; d < R; ++d) {
                int target = age_[i] - (R - d);
                if (target < 0) continue;
                int slot = target % R;
                if (ring_age_[static_cast<size_t>(i) * R + slot] == target) {
                    chosen = &obs_ring_[(static_cast<size_t>(i) * R + slot) * 5];
                    break;
                }
            }
            std::memcpy(&k_obs[static_cast<size_t>(i) * 5], chosen, sizeof(float) * 5);
        }

        std::vector<float> trk_box(static_cast<size_t>(K) * 4);
        for (int i = 0; i < K; ++i)
            xysr_to_xyxy(&mean_[static_cast<size_t>(i) * DX],
                         &trk_box[static_cast<size_t>(i) * 4]);
        std::vector<float> iou1(static_cast<size_t>(K) * static_cast<size_t>(n), 0.0f);
        for (int i = 0; i < K; ++i) {
            if (!active_[i]) continue;
            for (int64_t j = 0; j < n; ++j)
                iou1[static_cast<size_t>(i) * n + j] =
                    iou_xyxy(&trk_box[static_cast<size_t>(i) * 4], &dets[j * 6]);
        }

        std::vector<int32_t> r2c1 = associate_pass1(iou1, k_obs, dets, n, first);
        std::vector<char> matched(static_cast<size_t>(K), 0), dm(static_cast<size_t>(n), 0);
        std::vector<int32_t> det_col(static_cast<size_t>(K), -1);
        for (int i = 0; i < K; ++i) {
            if (r2c1[i] < 0) continue;
            matched[i] = 1;
            det_col[i] = r2c1[i];
            dm[static_cast<size_t>(r2c1[i])] = 1;
        }

        // OCR (iou only vs last observations)
        {
            std::vector<char> rows3(static_cast<size_t>(K), 0), cols3(static_cast<size_t>(n), 0);
            for (int i = 0; i < K; ++i) rows3[i] = active_[i] && !matched[i];
            for (int64_t j = 0; j < n; ++j)
                cols3[static_cast<size_t>(j)] =
                    first[static_cast<size_t>(j)] && !dm[static_cast<size_t>(j)];
            std::vector<float> iou3(static_cast<size_t>(K) * static_cast<size_t>(n), 0.0f);
            float best = -1.0f;
            for (int i = 0; i < K; ++i) {
                if (!rows3[i]) continue;
                for (int64_t j = 0; j < n; ++j) {
                    float v = iou_xyxy(&last_obs_[static_cast<size_t>(i) * 5], &dets[j * 6]);
                    iou3[static_cast<size_t>(i) * n + j] = v;
                    if (cols3[static_cast<size_t>(j)]) best = std::max(best, v);
                }
            }
            if (best > cfg_.iou_threshold) {
                std::vector<double> cost(static_cast<size_t>(K) * static_cast<size_t>(n));
                for (size_t idx = 0; idx < cost.size(); ++idx)
                    cost[idx] = -static_cast<double>(iou3[idx]);
                std::vector<int32_t> r2c3 = full_assignment(cost, K, n, rows3, cols3);
                for (int i = 0; i < K; ++i) {
                    int32_t j = r2c3[i];
                    if (j < 0 || iou3[static_cast<size_t>(i) * n + j] < cfg_.iou_threshold)
                        continue;
                    matched[i] = 1;
                    det_col[i] = j;
                    dm[static_cast<size_t>(j)] = 1;
                }
            }
        }

        // ORU + regular update + bookkeeping (identical to the OC-SORT core)
        for (int i = 0; i < K; ++i) {
            if (!matched[i]) continue;
            int32_t j = det_col[i];
            const float* z2 = &det_meas[static_cast<size_t>(j) * 4];
            float* m = &mean_[static_cast<size_t>(i) * DX];
            float* P = &cov_[static_cast<size_t>(i) * DX * DX];
            bool rejoin = !prev_observed[i] && prev_has_obs[i] && tsu_[i] > 1;
            if (rejoin) {
                std::memcpy(m, &frozen_mean_[static_cast<size_t>(i) * DX],
                            sizeof(float) * DX);
                std::memcpy(P, &frozen_cov_[static_cast<size_t>(i) * DX * DX],
                            sizeof(float) * DX * DX);
                const float* m1 = &last_meas_[static_cast<size_t>(i) * 4];
                int gap = tsu_[i];
                float w1 = std::sqrt(std::max(m1[2] * m1[3], 1e-12f));
                float h1 = std::sqrt(std::max(m1[2] / std::max(m1[3], 1e-12f), 1e-12f));
                float w2 = std::sqrt(std::max(z2[2] * z2[3], 1e-12f));
                float h2 = std::sqrt(std::max(z2[2] / std::max(z2[3], 1e-12f), 1e-12f));
                float gapf = std::max(static_cast<float>(gap), 1.0f);
                float dx = (z2[0] - m1[0]) / gapf;
                float dy = (z2[1] - m1[1]) / gapf;
                float dw = (w2 - w1) / gapf;
                float dh = (h2 - h1) / gapf;
                for (int s = 1; s <= gap; ++s) {
                    if (s > 1) kf_.predict(m, P);
                    float fs = static_cast<float>(s);
                    float wi = w1 + fs * dw;
                    float hi = h1 + fs * dh;
                    float zi[4] = {m1[0] + fs * dx, m1[1] + fs * dy,
                                   std::max(wi * hi, 1e-6f),
                                   std::max(wi / std::max(hi, 1e-12f), 1e-6f)};
                    kf_.update(m, P, zi);
                }
            }
            kf_.update(m, P, z2);

            if (prev_has_obs[i]) {
                const float* ko = &k_obs[static_cast<size_t>(i) * 5];
                float fcx = (ko[0] + ko[2]) / 2.0f, fcy = (ko[1] + ko[3]) / 2.0f;
                float tcx = (dets[static_cast<int64_t>(j) * 6 + 0] +
                             dets[static_cast<int64_t>(j) * 6 + 2]) / 2.0f;
                float tcy = (dets[static_cast<int64_t>(j) * 6 + 1] +
                             dets[static_cast<int64_t>(j) * 6 + 3]) / 2.0f;
                float ddx = tcx - fcx, ddy = tcy - fcy;
                float norm = std::sqrt(ddx * ddx + ddy * ddy) + 1e-6f;
                velocity_[static_cast<size_t>(i) * 2 + 0] = ddy / norm;
                velocity_[static_cast<size_t>(i) * 2 + 1] = ddx / norm;
            }

            float obs[5] = {dets[static_cast<int64_t>(j) * 6 + 0],
                            dets[static_cast<int64_t>(j) * 6 + 1],
                            dets[static_cast<int64_t>(j) * 6 + 2],
                            dets[static_cast<int64_t>(j) * 6 + 3],
                            dets[static_cast<int64_t>(j) * 6 + 4]};
            std::memcpy(&last_obs_[static_cast<size_t>(i) * 5], obs, sizeof(obs));
            int slot = age_[i] % R;
            std::memcpy(&obs_ring_[(static_cast<size_t>(i) * R + slot) * 5], obs,
                        sizeof(obs));
            ring_age_[static_cast<size_t>(i) * R + slot] = age_[i];
            std::memcpy(&last_meas_[static_cast<size_t>(i) * 4], z2, sizeof(float) * 4);
            has_obs_[i] = 1;
            hits_[i] += 1;
            hit_streak_[i] += 1;
            conf_[i] = dets[static_cast<int64_t>(j) * 6 + 4];
            cls_[i] = dets[static_cast<int64_t>(j) * 6 + 5];
            det_ind_[i] = static_cast<float>(j);
            tsu_[i] = 0;
        }

        for (int i = 0; i < K; ++i) {
            if (!active_[i]) continue;
            if (!matched[i] && prev_observed[i]) {
                std::memcpy(&frozen_mean_[static_cast<size_t>(i) * DX],
                            &mean_[static_cast<size_t>(i) * DX], sizeof(float) * DX);
                std::memcpy(&frozen_cov_[static_cast<size_t>(i) * DX * DX],
                            &cov_[static_cast<size_t>(i) * DX * DX],
                            sizeof(float) * DX * DX);
            }
            observed_[i] = matched[i];
        }

        int free_cursor = 0;
        for (int64_t j = 0; j < n; ++j) {
            if (!first[static_cast<size_t>(j)] || dm[static_cast<size_t>(j)]) continue;
            while (free_cursor < K && active_[free_cursor]) ++free_cursor;
            if (free_cursor >= K) break;
            int i = free_cursor++;
            kf_.initiate(&det_meas[static_cast<size_t>(j) * 4],
                         &mean_[static_cast<size_t>(i) * DX],
                         &cov_[static_cast<size_t>(i) * DX * DX]);
            active_[i] = 1;
            tid_[i] = next_id_++;
            conf_[i] = dets[j * 6 + 4];
            cls_[i] = dets[j * 6 + 5];
            det_ind_[i] = static_cast<float>(j);
            age_[i] = 0;
            tsu_[i] = 0;
            hits_[i] = 0;
            hit_streak_[i] = 0;
            has_obs_[i] = 0;
            observed_[i] = 0;
            velocity_[static_cast<size_t>(i) * 2 + 0] = 0.0f;
            velocity_[static_cast<size_t>(i) * 2 + 1] = 0.0f;
            for (int c = 0; c < 5; ++c) last_obs_[static_cast<size_t>(i) * 5 + c] = -1.0f;
            for (int r = 0; r < R; ++r) ring_age_[static_cast<size_t>(i) * R + r] = -1;
        }

        int64_t m_out = 0;
        for (int i = 0; i < K; ++i) {
            if (active_[i] && tsu_[i] > cfg_.max_age) active_[i] = 0;
            if (!active_[i] || tsu_[i] >= 1) continue;
            if (hit_streak_[i] < cfg_.min_hits && frame > cfg_.min_hits) continue;
            float* row = out + m_out * 8;
            if (has_obs_[i]) {
                std::memcpy(row, &last_obs_[static_cast<size_t>(i) * 5], sizeof(float) * 4);
            } else {
                xysr_to_xyxy(&mean_[static_cast<size_t>(i) * DX], row);
            }
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
    // apply_affine_correction (xysr.py:312-336): rotate position and
    // position-velocity, translate position; s/r untouched
    static void warp_state(float* m, float* P, const Warp2x3& w) {
        const float a = w.m[0], b = w.m[1], tx = w.m[2];
        const float c = w.m[3], d = w.m[4], ty = w.m[5];
        float px = a * m[0] + b * m[1] + tx;
        float py = c * m[0] + d * m[1] + ty;
        float vx = a * m[4] + b * m[5];
        float vy = c * m[4] + d * m[5];
        m[0] = px; m[1] = py; m[4] = vx; m[5] = vy;
        if (a == 1.0f && b == 0.0f && c == 0.0f && d == 1.0f) return;
        // cov' = T cov T^T with R blocks at (0,1) and (4,5)
        float TP[DX][DX];
        for (int col = 0; col < DX; ++col) {
            float x0 = P[0 * DX + col], y0 = P[1 * DX + col];
            float x4 = P[4 * DX + col], y4 = P[5 * DX + col];
            for (int r = 0; r < DX; ++r) TP[r][col] = P[r * DX + col];
            TP[0][col] = a * x0 + b * y0;
            TP[1][col] = c * x0 + d * y0;
            TP[4][col] = a * x4 + b * y4;
            TP[5][col] = c * x4 + d * y4;
        }
        for (int row = 0; row < DX; ++row) {
            float x0 = TP[row][0], y0 = TP[row][1];
            float x4 = TP[row][4], y4 = TP[row][5];
            for (int col = 0; col < DX; ++col) P[row * DX + col] = TP[row][col];
            P[row * DX + 0] = a * x0 + b * y0;
            P[row * DX + 1] = c * x0 + d * y0;
            P[row * DX + 4] = a * x4 + b * y4;
            P[row * DX + 5] = c * x4 + d * y4;
        }
    }

    std::vector<int32_t> associate_pass1(const std::vector<float>& iou1,
                                         const std::vector<float>& k_obs,
                                         const float* dets, int64_t n,
                                         const std::vector<char>& cols) const {
        const int K = cfg_.capacity;
        std::vector<int32_t> result(static_cast<size_t>(K), -1);
        std::vector<int> row_cnt(static_cast<size_t>(K), 0), col_cnt(static_cast<size_t>(n), 0);
        std::vector<int32_t> row_cand(static_cast<size_t>(K), -1);
        for (int i = 0; i < K; ++i) {
            if (!active_[i]) continue;
            for (int64_t j = 0; j < n; ++j) {
                if (!cols[static_cast<size_t>(j)]) continue;
                if (iou1[static_cast<size_t>(i) * n + j] > cfg_.iou_threshold) {
                    row_cnt[i] += 1;
                    col_cnt[static_cast<size_t>(j)] += 1;
                    row_cand[i] = static_cast<int32_t>(j);
                }
            }
        }
        int max_row = 0, max_col = 0;
        for (int i = 0; i < K; ++i) max_row = std::max(max_row, row_cnt[i]);
        for (int64_t j = 0; j < n; ++j) max_col = std::max(max_col, col_cnt[static_cast<size_t>(j)]);
        if (max_row == 1 && max_col == 1) {
            for (int i = 0; i < K; ++i)
                if (row_cnt[i] == 1) result[i] = row_cand[i];
            return result;
        }

        // no-model embeddings are all-ones: cosine similarity is exactly
        // 1 wherever IoU > 0 (emb_cost zeroed at iou <= 0); the adaptive
        // weighting then reduces to a unique-candidate bonus
        std::vector<float> emb(static_cast<size_t>(K) * static_cast<size_t>(n), 0.0f);
        if (!cfg_.embedding_off) {
            for (int i = 0; i < K; ++i) {
                if (!active_[i]) continue;
                for (int64_t j = 0; j < n; ++j)
                    emb[static_cast<size_t>(i) * n + j] =
                        iou1[static_cast<size_t>(i) * n + j] > 0.0f ? 1.0f : 0.0f;
            }
            if (cfg_.aw_off) {
                for (float& v : emb) v *= cfg_.w_association_emb;
            } else {
                // aw_max_metric with constant sims: weight 1 when a
                // row/col has exactly one valid candidate, else 0
                std::vector<int> rc(static_cast<size_t>(K), 0), cc(static_cast<size_t>(n), 0);
                for (int i = 0; i < K; ++i) {
                    if (!active_[i]) continue;
                    for (int64_t j = 0; j < n; ++j)
                        if (cols[static_cast<size_t>(j)] &&
                            emb[static_cast<size_t>(i) * n + j] > 0.0f) {
                            rc[i] += 1;
                            cc[static_cast<size_t>(j)] += 1;
                        }
                }
                for (int i = 0; i < K; ++i)
                    for (int64_t j = 0; j < n; ++j) {
                        float rw = rc[i] == 1 ? 1.0f : 0.0f;
                        float cw = cc[static_cast<size_t>(j)] == 1 ? 1.0f : 0.0f;
                        emb[static_cast<size_t>(i) * n + j] *=
                            cfg_.w_association_emb * rw * cw;
                    }
            }
        }

        std::vector<double> cost(static_cast<size_t>(K) * static_cast<size_t>(n), 0.0);
        for (int i = 0; i < K; ++i) {
            if (!active_[i]) continue;
            const float* ko = &k_obs[static_cast<size_t>(i) * 5];
            float vy = velocity_[static_cast<size_t>(i) * 2 + 0];
            float vx = velocity_[static_cast<size_t>(i) * 2 + 1];
            bool valid_vel = ko[4] >= 0.0f;
            float fcx = (ko[0] + ko[2]) / 2.0f, fcy = (ko[1] + ko[3]) / 2.0f;
            for (int64_t j = 0; j < n; ++j) {
                float angle_cost = 0.0f;
                if (valid_vel) {
                    float tcx = (dets[j * 6 + 0] + dets[j * 6 + 2]) / 2.0f;
                    float tcy = (dets[j * 6 + 1] + dets[j * 6 + 3]) / 2.0f;
                    float ddx = tcx - fcx, ddy = tcy - fcy;
                    float norm = std::sqrt(ddx * ddx + ddy * ddy) + 1e-6f;
                    float cosv = std::min(
                        1.0f, std::max(-1.0f, vx * (ddx / norm) + vy * (ddy / norm)));
                    float diff_angle =
                        (static_cast<float>(M_PI) / 2.0f - std::abs(std::acos(cosv))) /
                        static_cast<float>(M_PI);
                    angle_cost = diff_angle * cfg_.inertia * dets[j * 6 + 4];
                }
                cost[static_cast<size_t>(i) * n + j] =
                    -(static_cast<double>(iou1[static_cast<size_t>(i) * n + j]) +
                      angle_cost + emb[static_cast<size_t>(i) * n + j]);
            }
        }
        std::vector<char> rows(active_);
        std::vector<int32_t> r2c = full_assignment(cost, K, n, rows, cols);
        for (int i = 0; i < K; ++i) {
            int32_t j = r2c[i];
            if (j >= 0 && iou1[static_cast<size_t>(i) * n + j] >= cfg_.iou_threshold)
                result[i] = j;
        }
        return result;
    }

    static void xyxy_to_xysr(const float* b, float* z) {
        float w = b[2] - b[0];
        float h = b[3] - b[1];
        z[0] = b[0] + w / 2.0f;
        z[1] = b[1] + h / 2.0f;
        z[2] = std::max(w * h, 1e-6f);
        z[3] = std::max(w / (h + 1e-6f), 1e-6f);
    }

    static void xysr_to_xyxy(const float* s, float* box) {
        float w = std::sqrt(std::max(s[2] * s[3], 0.0f));
        float h = s[2] / std::max(w, 1e-12f);
        box[0] = s[0] - w / 2.0f;
        box[1] = s[1] - h / 2.0f;
        box[2] = s[0] + w / 2.0f;
        box[3] = s[1] + h / 2.0f;
    }

    DeepOcSortConfig cfg_;
    EccCmc cmc_;
    KalmanBank<XysrLayout> kf_{XysrLayout()};
    std::vector<float> mean_, cov_, frozen_mean_, frozen_cov_;
    std::vector<float> conf_, cls_, det_ind_, last_obs_, obs_ring_, velocity_, last_meas_;
    std::vector<int32_t> age_, tsu_, hits_, hit_streak_, tid_, ring_age_;
    std::vector<char> active_, has_obs_, observed_;
    int32_t frame_count_ = 0;
    int32_t next_id_ = 1;
};

}  // namespace boxmot

#endif  // BOXMOT_DEEPOCSORT_BANK_HPP
